package graft

import graft.pipeline.Dag
import org.apache.spark.sql.functions._

class DagSpec extends SparkSpec {
  import spark.implicits._

  private def syntheticEvents = Seq(
    (1L, "2024-01-01T00:00:00", 10L, "click", 5.0, "{}"),
    (2L, "2024-01-05T00:00:00", 11L, "view", 7.0, "{}"),
    (3L, "2024-02-01T00:00:00", 10L, "error", 9.0, "{}"),
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    .withColumn("ts", col("ts").cast("timestamp"))

  test("topoOrder respects dependencies and detects cycles") {
    val r = new Dag.Registry()
      .register(Dag.Model("c", Seq("b"), (_, d) => d("b")))
      .register(Dag.Model("a", Nil, (sp, _) => sp.range(1).toDF()))
      .register(Dag.Model("b", Seq("a"), (_, d) => d("a")))
    val order = r.topoOrder
    assert(order.indexOf("a") < order.indexOf("b"))
    assert(order.indexOf("b") < order.indexOf("c"))

    val cyclic = new Dag.Registry()
      .register(Dag.Model("x", Seq("y"), (_, d) => d("y")))
      .register(Dag.Model("y", Seq("x"), (_, d) => d("x")))
    assertThrows[IllegalArgumentException](cyclic.topoOrder)
  }

  test("iot pipeline builds all medallion layers and registers views") {
    val built = Dag.iotPipeline(_ => syntheticEvents).run(spark)
    assert(built.keySet == Set("bronze.events", "silver.events",
      "gold.dim_users", "gold.dim_date", "gold.fact_events"))
    assert(built("silver.events").count() == 2) // 'error' dropped
    assert(built("gold.dim_users").count() == 2)
    // views queryable through the SQL surface with layer_name convention
    assert(spark.sql("SELECT count(*) FROM gold_fact_events").head().getLong(0) == 2)
  }

  test("table materialization writes parquet and reads it back") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dag").toString
    val built = Dag.iotPipeline(_ => syntheticEvents).run(spark, Some(dir))
    assert(new java.io.File(s"$dir/gold/dim_users").exists())
    assert(built("gold.dim_users").count() == 2)
  }

  test("incremental append materialization only ingests rows past the watermark") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-inc").toString
    val path = s"$dir/inc_model"
    val inc = Dag.Incremental("ts")
    // first run: full build
    val day1 = Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("id", "ts", "v")
    assert(Dag.runIncremental(spark, day1, path, inc).count() == 2)
    // second run sees old + new source rows; only ts>20 appends
    val day2 = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
      .toDF("id", "ts", "v")
    val after = Dag.runIncremental(spark, day2, path, inc)
    assert(after.count() == 3)
    // re-running the same source is a no-op (watermark already at 30)
    assert(Dag.runIncremental(spark, day2, path, inc).count() == 3)
  }

  test("incremental unique_key materialization upserts the latest version") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-inc2").toString
    val path = s"$dir/inc_upsert"
    val inc = Dag.Incremental("ts", uniqueKey = Some(Seq("id")))
    val day1 = Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("id", "ts", "v")
    Dag.runIncremental(spark, day1, path, inc)
    // id=1 updated at ts=25, id=3 new — id=1's old version must be replaced
    val day2 = Seq((1L, 25L, "a2"), (3L, 30L, "c")).toDF("id", "ts", "v")
    val after = Dag.runIncremental(spark, day2, path, inc)
      .select("id", "ts", "v").as[(Long, Long, String)].collect().toSet
    assert(after == Set((1L, 25L, "a2"), (2L, 20L, "b"), (3L, 30L, "c")))
    // idempotent re-run
    val again = Dag.runIncremental(spark, day2, path, inc)
      .select("id", "ts", "v").as[(Long, Long, String)].collect().toSet
    assert(again == after)
  }

}
