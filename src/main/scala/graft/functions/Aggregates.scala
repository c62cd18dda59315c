package graft.functions

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Custom aggregation surface (SURVEY.md §2.9: the reference has no UDAFs —
  * these exist for the tier-C pipeline and demonstrate the engine's
  * extension points).
  */
object Aggregates {

  /** Exact weighted average via integer cents: (Σ value_cents·w, Σ w) —
    * order-independent (integer adds commute), so results are identical
    * across partitionings and cluster sizes. A double-accumulating version
    * would drift at 1000 executors.
    */
  final case class WAvgBuf(var sumCents: Long, var sumW: Long)

  class WeightedAvgCents extends Aggregator[(Double, Long), WAvgBuf, Double] {
    override def zero: WAvgBuf = WAvgBuf(0L, 0L)
    override def reduce(b: WAvgBuf, a: (Double, Long)): WAvgBuf = {
      b.sumCents += math.round(a._1 * 100) * a._2
      b.sumW += a._2
      b
    }
    override def merge(x: WAvgBuf, y: WAvgBuf): WAvgBuf =
      WAvgBuf(x.sumCents + y.sumCents, x.sumW + y.sumW)
    override def finish(b: WAvgBuf): Double =
      if (b.sumW == 0) Double.NaN else b.sumCents.toDouble / b.sumW / 100.0
    override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** DataFrame-facing weighted average: value (money double), weight (long). */
  def weighted_avg_cents(value: Column, weight: Column): Column =
    udaf(new WeightedAvgCents).apply(value, weight)

  /** Salted two-phase aggregation for skewed keys: groupBy(keys, salt) for
    * the partial, then groupBy(keys) to combine. Correct for ALGEBRAIC
    * aggregates (sum/count/min/max — supplied as (partial, combine) pairs
    * with matching output names). A hot key's partial work spreads over
    * `saltBuckets` reducers instead of one.
    *
    * Note Spark's own two-phase HashAggregate already handles MAP-side
    * combining; salting targets the case where one REDUCER key is still
    * too hot (e.g. 10% of 100 TB under a single group value).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int)(
      partials: Seq[(Column, String)], finals: Seq[(Column, String)]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)))
    val stage1 = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partials.head._1.as(partials.head._2),
        partials.tail.map(p => p._1.as(p._2)): _*)
    stage1
      .groupBy(keys.map(col): _*)
      .agg(finals.head._1.as(finals.head._2),
        finals.tail.map(p => p._1.as(p._2)): _*)
  }

  val all: Seq[QueryDef] = Seq(
    // typed Aggregator (UDAF surface): exact weighted average — oracle is
    // plain integer arithmetic, so the custom aggregate is fully checked
    QueryDef(
      "q_weighted_avg",
      (sp, dir) =>
        Tables.lineitem(sp, dir)
          .groupBy("l_returnflag")
          .agg(
            weighted_avg_cents(col("l_extendedprice"), col("l_quantity").cast("long"))
              .as("wavg_price"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      Some(
        """SELECT l_returnflag,
          |       sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(l_quantity AS BIGINT))
          |         * 1.0 / sum(CAST(l_quantity AS BIGINT)) / 100.0 AS wavg_price,
          |       count(*) AS n
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    ),
    // salted two-phase aggregation — same RESULT as the plain groupBy (the
    // oracle is the unsalted SQL), different plan shape for hot keys
    QueryDef(
      "q_salted_totals",
      (sp, dir) =>
        saltedAgg(
          Tables.events(sp, dir)
            .withColumn("cents", round(col("value") * 100).cast("long")),
          Seq("event_type"), saltBuckets = 8)(
          partials = Seq((sum(col("cents")), "partial_cents"), (count(lit(1)), "partial_n")),
          finals = Seq((sum(col("partial_cents")), "total_cents"), (sum(col("partial_n")), "n")))
          .orderBy("event_type"),
      Some(
        """SELECT event_type,
          |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
          |       count(*) AS n
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
    ),
  )
}
