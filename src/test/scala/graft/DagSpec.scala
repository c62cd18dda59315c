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

}
