package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, attach the most recent right
  * row with `rightTs <= leftTs` for the same key — the standard
  * event-attribution / point-in-time-lookup operator. The reference engine
  * has no such operator (SURVEY §2.3: only equi-joins exist,
  * fact_iot_events.sql:23-24); this is a tier-C extension.
  *
  * Scale design: Spark has no native as-of join, and the naive
  * `l JOIN r ON l.key = r.key AND r.ts <= l.ts` + max() explodes
  * quadratically per key. Instead: tag both sides, UNION, and sweep each
  * key's timeline once with `last(_, ignoreNulls)` over an
  * unbounded-preceding row frame. Cost = ONE shuffle on the key (same as
  * any equi-join) + a per-key sort — no row explosion at any key
  * cardinality, so the plan survives 100 TB as long as single keys fit a
  * partition (salt upstream if one key dominates).
  *
  * Right rows sort BEFORE left rows at equal timestamps (tag 0 < 1), so a
  * right row at exactly leftTs matches (inclusive as-of, same as DuckDB's
  * `ASOF JOIN ... ON l.ts >= r.ts` which the oracle uses).
  *
  * Requires (key, ts) unique on the right (dedupe first — true of any
  * point-in-time dimension); ties would otherwise be window-order
  * dependent.
  */
object AsofJoin {

  /** @param leftTs/rightTs  event-time columns (same type both sides)
    * @param payload         right columns to carry onto matching left rows
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val ts = "__asof_ts"
    val tag = "__asof_tag"

    val taggedRight = right.select(
      Seq(col(key), col(rightTs).as(ts), lit(0).as(tag)) ++
        payload.map(col) ++
        leftCols.filterNot(_ == key).map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      Seq(col(key), col(leftTs).as(ts), lit(1).as(tag)) ++
        payload.map(c => lit(null).as(c)) ++
        leftCols.filterNot(_ == key).map(col): _*)

    val sweep = Window
      .partitionBy(key)
      .orderBy(col(ts), col(tag))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled: Column => Column = c => last(c, ignoreNulls = true).over(sweep)

    taggedRight
      .unionByName(taggedLeft)
      .select(
        Seq(col(key), col(ts), col(tag)) ++
          payload.map(c => filled(col(c)).as(c)) ++
          leftCols.filterNot(_ == key).map(col): _*)
      .filter(col(tag) === 1)
      .drop(tag, ts)
      .select(leftCols.map(col) ++ payload.map(col): _*)
  }
}
