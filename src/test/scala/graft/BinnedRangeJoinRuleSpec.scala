package graft

import org.apache.spark.sql.functions._

import graft.plans.BinnedRangeJoinRule

class BinnedRangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[A](width: Long)(body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BinnedRangeJoinRule
    spark.conf.set(BinnedRangeJoinRule.WidthKey, width.toString)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == BinnedRangeJoinRule)
      spark.conf.unset(BinnedRangeJoinRule.WidthKey)
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  private def points = (0L to 300L).map(t => (t, s"p$t")).toDF("t", "pname")
  private def intervals = Seq((10L, 30L, "i1"), (25L, 26L, "i2"),
    (250L, 900L, "i3"), (60L, 59L, "i4") /* reversed → empty */ )
    .toDF("lo", "hi", "ivl")

  test("rule rewrites a band join to an equi-join and keeps the answer") {
    val expected = points.join(intervals,
        col("t") >= col("lo") && col("t") <= col("hi"))
      .select("ivl", "t").collect().toSet
    withRule(width = 16L) {
      val q = points.join(intervals,
        col("t") >= col("lo") && col("t") <= col("hi"))
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"band join should have been binned:\n$plan")
      assert(q.select("ivl", "t").collect().toSet == expected)
      assert(q.columns.toSeq == Seq("t", "pname", "lo", "hi", "ivl"),
        "rewrite must preserve the original output columns")
    }
  }

  test("rule handles flipped operand order and strict bounds") {
    withRule(width = 16L) {
      val q = points.join(intervals,
        col("lo") <= col("t") && col("t") < col("hi"))
      assert(!q.queryExecution.executedPlan.toString.contains("NestedLoop"))
      val expected = points.join(intervals,
        col("t") >= col("lo") && col("t") < col("hi"))
      assert(q.select("ivl", "t").collect().toSet
        == expected.select("ivl", "t").collect().toSet)
    }
  }

  test("rule leaves joins alone when the width conf is unset") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BinnedRangeJoinRule
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = points.join(intervals,
        col("t") >= col("lo") && col("t") <= col("hi"))
      assert(q.queryExecution.executedPlan.toString.contains("NestedLoop")
        || q.queryExecution.executedPlan.toString.contains("Cartesian"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == BinnedRangeJoinRule)
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("malformed bin width disables the rewrite instead of failing queries") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BinnedRangeJoinRule
    spark.conf.set(BinnedRangeJoinRule.WidthKey, "not-a-number")
    try {
      // every query in the session passes through the rule — a bad conf
      // must not throw from inside the optimizer
      assert(spark.range(5).count() == 5L)
      val q = points.join(intervals,
        col("t") >= col("lo") && col("t") <= col("hi"))
      assert(q.select("ivl").distinct().count() == 3L) // plain plan, right answer
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == BinnedRangeJoinRule)
      spark.conf.unset(BinnedRangeJoinRule.WidthKey)
    }
  }

  test("rule does not fire on equi-joins or non-integral bands") {
    withRule(width = 16L) {
      val eq = points.join(intervals, col("t") === col("lo"))
      assert(eq.count() == 4) // unchanged semantics (i4 lo=60 matches t=60)
      val d1 = points.withColumn("td", col("t").cast("double"))
      val d2 = intervals.withColumn("lod", col("lo").cast("double"))
        .withColumn("hid", col("hi").cast("double"))
      val dbl = d1.join(d2, col("td") >= col("lod") && col("td") <= col("hid"))
      // double band: rule must not touch it (falls back to nested loop)
      assert(dbl.queryExecution.executedPlan.toString.contains("NestedLoop")
        || dbl.queryExecution.executedPlan.toString.contains("Cartesian"))
    }
  }
}
