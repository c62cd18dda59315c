package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.plans.{MvDef, MvRewriteRule}
import graft.sources.Lake

class MvRewriteRuleSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-mvrw").toString

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ MvRewriteRule
    try body
    finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == MvRewriteRule)
      MvRewriteRule.clear()
    }
  }

  private def scans(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.collectLeaves().mkString("\n")

  test("fresh view answers the aggregate; staleness falls back; refresh resumes") {
    withRule {
      val src = tmp() + "/src"
      val view = tmp() + "/view"
      val rows = (1L to 300L).map(i => (i % 7, i))
      Lake.writeVersioned(spark, rows.toDF("k", "v").repartition(4), src)
      Lake.refreshIncremental(spark, src, view, keys = Seq("k"),
        sumCols = Seq("v"), countCol = "n_rows")
      MvRewriteRule.register(MvDef(src, view, Seq("k"), Seq("v"), "n_rows"))

      def q() = Lake.readVersioned(spark, src).groupBy("k")
        .agg(count(lit(1)).as("n"), sum("v").as("s")).orderBy("k")
      def expected(rs: Seq[(Long, Long)]) = rs.groupBy(_._1).toSeq
        .map { case (k, g) => (k, g.size.toLong, g.map(_._2).sum) }
        .sortBy(_._1)

      // fresh: the plan reads the VIEW, never the source's data files
      val fresh = q()
      assert(scans(fresh).contains("/view"), scans(fresh))
      assert(!scans(fresh).contains("/src"), scans(fresh))
      assert(fresh.as[(Long, Long, Long)].collect().toSeq == expected(rows))

      // stale: an un-folded source append must KILL the rewrite — a
      // wrong answer here is the whole reason the freshness gate exists
      val more = (301L to 340L).map(i => (i % 7, i))
      Lake.appendVersioned(spark, more.toDF("k", "v").coalesce(1), src)
      val stale = q()
      assert(scans(stale).contains("/src"), scans(stale))
      assert(stale.as[(Long, Long, Long)].collect().toSeq
        == expected(rows ++ more))

      // refresh folds the append; the rewrite resumes
      Lake.refreshIncremental(spark, src, view, keys = Seq("k"),
        sumCols = Seq("v"), countCol = "n_rows")
      val again = q()
      assert(scans(again).contains("/view"), scans(again))
      assert(again.as[(Long, Long, Long)].collect().toSeq
        == expected(rows ++ more))
    }
  }

  test("non-equivalent shapes never rewrite") {
    withRule {
      val src = tmp() + "/src"
      val view = tmp() + "/view"
      val rows = (1L to 100L).map(i => (i % 5, i))
      Lake.writeVersioned(spark, rows.toDF("k", "v"), src)
      Lake.refreshIncremental(spark, src, view, keys = Seq("k"),
        sumCols = Seq("v"), countCol = "n_rows")
      MvRewriteRule.register(MvDef(src, view, Seq("k"), Seq("v"), "n_rows"))

      // a filter between scan and aggregate changes the group contents
      val filtered = Lake.readVersioned(spark, src).filter(col("v") > 50L)
        .groupBy("k").agg(count(lit(1)).as("n"))
      assert(scans(filtered).contains("/src"), scans(filtered))
      assert(filtered.orderBy("k").as[(Long, Long)].collect().toSeq
        == rows.filter(_._2 > 50L).groupBy(_._1).toSeq
          .map { case (k, g) => (k, g.size.toLong) }.sortBy(_._1))

      // an aggregate the view doesn't store (max) must not rewrite
      val maxq = Lake.readVersioned(spark, src).groupBy("k")
        .agg(max("v").as("m"))
      assert(scans(maxq).contains("/src"), scans(maxq))

      // different grouping keys must not rewrite
      val othergrp = Lake.readVersioned(spark, src).groupBy("v")
        .agg(count(lit(1)).as("n"))
      assert(scans(othergrp).contains("/src"), scans(othergrp))

      // a TIME-TRAVEL read of an older version must not rewrite: the
      // view answers for the head, not for history
      Lake.appendVersioned(spark,
        Seq((0L, 1000L)).toDF("k", "v").coalesce(1), src)
      Lake.refreshIncremental(spark, src, view, keys = Seq("k"),
        sumCols = Seq("v"), countCol = "n_rows")
      val old = Lake.readVersioned(spark, src, Some(1L)).groupBy("k")
        .agg(count(lit(1)).as("n"), sum("v").as("s"))
      assert(scans(old).contains("/src"), scans(old))
      assert(old.agg(sum("n")).as[Long].head() == 100L)
    }
  }
}
