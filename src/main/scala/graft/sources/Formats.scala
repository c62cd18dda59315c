package graft.sources

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch source formats beyond parquet: ORC and CSV round-trips through
  * Spark's built-in readers, oracled against the SAME aggregation over the
  * original parquet — proving the format paths preserve values exactly.
  *
  * Scale notes (100 TB): ORC is a first-class columnar format in Spark —
  * predicate pushdown, column pruning, and vectorized reads all apply, so
  * an ORC lake runs the same plans as a parquet one (the q_orc_source scan
  * shows PushedFilters/ReadSchema like any parquet scan). CSV is the
  * interchange/landing format: schema is declared (never inferred — a
  * 100 TB inference pass reads the data twice), the reader prunes columns
  * at parse time, and values that must survive the text round-trip
  * losslessly travel as INTEGERS (cents), never as float text — the same
  * exact-arithmetic doctrine as the rest of the registry. FAILFAST mode:
  * a malformed row fails the job instead of silently nulling columns.
  *
  * The fixture (one ORC + one CSV copy of a deterministic lineitem slice)
  * is written once per SF dir and cached, so the registered rows time the
  * READ path, not the one-time conversion.
  */
object Formats {

  private val fixtures =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String, String)]()

  private val csvSchema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_quantity", LongType),
    StructField("price_cents", LongType)))

  private def fixtureFor(spark: SparkSession,
      dir: String): (String, String, String) =
    fixtures.computeIfAbsent(dir, _ => {
      val slice = Tables.lineitem(spark, dir)
        .filter(col("l_orderkey") % 7 === 0)
        .select(col("l_orderkey"), col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast("long").as("l_quantity"),
          round(col("l_extendedprice") * 100).cast("long").as("price_cents"))
      val root = graft.pipeline.Scratch.dir("formats")
      val orcPath = s"$root/lineitem_orc"
      val csvPath = s"$root/lineitem_csv"
      val jsonPath = s"$root/lineitem_json"
      slice.write.orc(orcPath)
      slice.write.option("header", "true").csv(csvPath)
      slice.write.json(jsonPath)
      (orcPath, csvPath, jsonPath)
    })

  val all: Seq[QueryDef] = Seq(
    // ORC scan with a pushed filter + pruned columns, aggregated exactly;
    // the oracle computes the identical aggregate from the parquet
    // original — any value drift through the ORC writer/reader fails the
    // hash.
    QueryDef(
      "q_orc_source",
      (sp, dir) => {
        val (orcPath, _, _) = fixtureFor(sp, dir)
        sp.read.orc(orcPath)
          .filter(col("l_quantity") >= 10)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("l_quantity")).cast("long").as("sum_qty"),
            sum(col("price_cents")).cast("long").as("sum_cents"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(
        """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
          |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
          |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
          |         AS sum_cents
          |FROM lineitem
          |WHERE l_orderkey % 7 = 0 AND CAST(l_quantity AS BIGINT) >= 10
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    ),
    // CSV with declared schema + FAILFAST: integer-only payload columns
    // survive the text round-trip bit-exactly.
    QueryDef(
      "q_csv_source",
      (sp, dir) => {
        val (_, csvPath, _) = fixtureFor(sp, dir)
        sp.read.schema(csvSchema)
          .option("header", "true").option("mode", "FAILFAST")
          .csv(csvPath)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("price_cents")).cast("long").as("sum_cents"),
            min(col("l_orderkey")).as("min_key"),
            max(col("l_orderkey")).as("max_key"))
          .orderBy("l_returnflag")
      },
      Some(
        """SELECT l_returnflag, count(*) AS n_rows,
          |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
          |         AS sum_cents,
          |       CAST(min(l_orderkey) AS BIGINT) AS min_key,
          |       CAST(max(l_orderkey) AS BIGINT) AS max_key
          |FROM lineitem
          |WHERE l_orderkey % 7 = 0
          |GROUP BY 1 ORDER BY 1""".stripMargin),
    ),
    // JSON-lines batch read with the SAME declared schema + FAILFAST: the
    // landing/interchange format read as a batch source (integer payload
    // columns survive the text round-trip bit-exactly; completes the
    // parquet/ORC/CSV/JSON source-format family). Grouped per (flag,
    // status) with a min/max key envelope so a row lost or mangled by the
    // JSON reader shifts the aggregate.
    QueryDef(
      "q_json_source",
      (sp, dir) => {
        val (_, _, jsonPath) = fixtureFor(sp, dir)
        sp.read.schema(csvSchema).option("mode", "FAILFAST")
          .json(jsonPath)
          .filter(col("l_quantity") <= 40)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("l_quantity")).cast("long").as("sum_qty"),
            sum(col("price_cents")).cast("long").as("sum_cents"),
            min(col("l_orderkey")).as("min_key"),
            max(col("l_orderkey")).as("max_key"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(
        """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
          |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
          |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
          |         AS sum_cents,
          |       CAST(min(l_orderkey) AS BIGINT) AS min_key,
          |       CAST(max(l_orderkey) AS BIGINT) AS max_key
          |FROM lineitem
          |WHERE l_orderkey % 7 = 0 AND CAST(l_quantity AS BIGINT) <= 40
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    ),
  )
}
