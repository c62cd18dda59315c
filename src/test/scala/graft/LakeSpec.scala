package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Lake

class LakeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-lake").toString

  private def sample = Seq(
    (1L, "click", "2024-01-01", 1.0), (2L, "view", "2024-01-01", 2.0),
    (3L, "click", "2024-01-02", 3.0), (4L, "purchase", "2024-01-02", 4.0),
  ).toDF("event_id", "event_type", "day", "value")

  test("partitioned write prunes non-matching partitions at planning time") {
    val dir = tmp()
    Lake.writePartitioned(sample, dir, "event_type")
    val scan = Lake.readPartitioned(spark, dir).filter(col("event_type") === "click")
    assert(scan.count() == 2)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    // data filter must NOT appear as a post-scan filter — pruning happens
    // before I/O, and only the matching directory is listed
    val scanned = scan.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(scanned.contains("event_type=click")
      || plan.contains("(event_type#"), plan)
  }

  test("bucketed tables join without any shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = (1L to 1000L).map(i => (i % 100, i)).toDF("k", "v")
      val dims = (0L until 100L).map(i => (i, s"name$i")).toDF("k", "name")
      Lake.writeBucketed(facts, "lake_facts", "k", 8)
      Lake.writeBucketed(dims, "lake_dims", "k", 8)
      val joined = spark.table("lake_facts")
        .join(spark.table("lake_dims"), "k")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS lake_facts")
      spark.sql("DROP TABLE IF EXISTS lake_dims")
    }
  }

  test("bucketed groupBy on the bucket key aggregates without a shuffle") {
    try {
      val facts = (1L to 1000L).map(i => (i % 100, i)).toDF("k", "v")
      Lake.writeBucketed(facts, "lake_agg", "k", 8)
      val agg = spark.table("lake_agg").groupBy("k").agg(sum("v").as("s"))
      assert(agg.count() == 100)
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed aggregation must not shuffle:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS lake_agg")
  }

  test("schema evolution: mergeSchema unions old and new column sets") {
    val dir = tmp()
    Seq((1L, "a")).toDF("id", "old_col").write.parquet(s"$dir/p=1")
    Seq((2L, 3.5)).toDF("id", "new_col").write.parquet(s"$dir/p=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "old_col", "new_col", "p"))
    val rows = merged.orderBy("id")
      .select("id", "old_col", "new_col")
      .collect()
    assert(rows(0).getAs[String]("old_col") == "a" && rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).getAs[Double]("new_col") == 3.5)
  }

  test("csv, json, and orc round-trip the same rows") {
    val df = sample
    for (fmt <- Seq("csv", "json", "orc")) {
      val dir = tmp()
      Lake.write(df, dir, fmt)
      val back = Lake.read(spark, dir, fmt,
        schema = if (fmt == "orc") None else Some(df.schema))
      assert(back.select(df.columns.map(col): _*).collect().toSet
        == df.collect().toSet, s"$fmt roundtrip")
    }
  }
}
