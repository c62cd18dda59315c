package graft

import org.apache.spark.sql.functions._

/** Cross-format agreement and failure-mode tests for the batch source
  * formats (ORC/CSV/JSON) plus the stream-static enrichment row: the three
  * text/columnar copies of the same lineitem slice must agree cell-exactly
  * with the parquet original, FAILFAST must actually fail on a malformed
  * row (not silently null it), and the streamed broadcast enrichment must
  * equal its batch-join equivalent.
  */
class FormatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def registry = SparkEntry.queries

  test("ORC, CSV and JSON copies agree with the parquet original") {
    val want = Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") % 7 === 0)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("long").as("l_quantity"),
        round(col("l_extendedprice") * 100).cast("long").as("price_cents"))
      .collect().map(_.toSeq).toSet
    // the registered rows aggregate; here compare the raw round-trips so a
    // compensating aggregation error can't hide a cell-level drift
    val root = graft.pipeline.Scratch.dir("formats_spec")
    val src = Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") % 7 === 0)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("long").as("l_quantity"),
        round(col("l_extendedprice") * 100).cast("long").as("price_cents"))
    src.write.orc(s"$root/orc")
    src.write.option("header", "true").csv(s"$root/csv")
    src.write.json(s"$root/json")
    val schema = src.schema
    val orc = spark.read.orc(s"$root/orc").collect().map(_.toSeq).toSet
    val csv = spark.read.schema(schema).option("header", "true")
      .option("mode", "FAILFAST").csv(s"$root/csv")
      .collect().map(_.toSeq).toSet
    val json = spark.read.schema(schema).option("mode", "FAILFAST")
      .json(s"$root/json").collect().map(_.toSeq).toSet
    assert(orc === want)
    assert(csv === want)
    assert(json === want)
  }

  test("Avro container round-trip agrees cell-exactly with the parquet original") {
    val want = Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") % 7 === 0)
      .select(col("l_orderkey").cast("long"), col("l_returnflag"),
        col("l_linestatus"), col("l_quantity").cast("long"),
        round(col("l_extendedprice") * 100).cast("long"))
      .collect().map(_.toSeq).toSet
    val path = graft.sources.Formats.avroFixtureFor(spark, dir)
    val got = graft.sources.Formats.readAvroSlice(spark, path)
      .collect().map(_.toSeq).toSet
    assert(got === want)
    // the distributed write produced real Avro object-container files
    // (magic "Obj"), one per non-empty input partition
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.nonEmpty)
    val magic = new Array[Byte](4)
    val in = new java.io.FileInputStream(files.head)
    try in.read(magic) finally in.close()
    assert(magic.toSeq === Seq[Byte]('O', 'b', 'j', 1))
  }

  test("FAILFAST fails loudly on a malformed row instead of nulling it") {
    val root = graft.pipeline.Scratch.dir("formats_failfast")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    java.nio.file.Files.write(java.nio.file.Paths.get(root, "bad.json"),
      "{\"l_orderkey\": \"not-a-number\", \"l_quantity\": 1}\n".getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("l_orderkey",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("l_quantity",
        org.apache.spark.sql.types.LongType)))
    val ex = intercept[Exception] {
      spark.read.schema(schema).option("mode", "FAILFAST")
        .json(root).collect()
    }
    assert(ex.getMessage != null)
    // PERMISSIVE (the default) would have nulled the cell silently — pin
    // the contrast so the FAILFAST choice in Formats stays meaningful
    val permissive = spark.read.schema(schema).option("mode", "PERMISSIVE")
      .json(root).collect()
    assert(permissive.length == 1 && permissive(0).isNullAt(0))
  }

  test("stream-static broadcast enrichment equals the batch join") {
    val got = registry("stream_static_join_equiv")(spark, dir)
      .collect().map(_.toSeq)
    val want = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "view", "purchase"))
      .join(Tables.customer(spark, dir),
        col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"),
        col("c_mktsegment").as("segment"),
        col("c_nationkey").cast("long").as("nation_key"))
      .orderBy("event_id")
      .collect().map(_.toSeq)
    assert(got.length === want.length)
    assert(got.toSeq === want.toSeq)
  }
}
