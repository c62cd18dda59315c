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
  * The payload is carried as ONE struct column filled by a single
  * `last(_, ignoreNulls)` — every matched left row gets all payload
  * columns from the SAME right row, and a legitimately-NULL payload value
  * inside a matched row stays NULL (a per-column fill would reach past it
  * to an older right row and stitch columns from different rows —
  * diverging from real ASOF semantics).
  *
  * Preconditions: (key, ts) unique on the right (dedupe first — true of
  * any point-in-time dimension; ties would otherwise be window-order
  * dependent), and non-NULL join keys (NULL keys share a window partition
  * and would match each other, unlike an equi-join — filter them upstream
  * if the key is nullable).
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
    val pay = "__asof_payload"

    val taggedRight = right.select(
      Seq(col(key), col(rightTs).as(ts), lit(0).as(tag),
        struct(payload.map(col): _*).as(pay)) ++
        leftCols.filterNot(_ == key).map(c => lit(null).as(c)): _*)
    val payType = taggedRight.schema(pay).dataType
    val taggedLeft = left.select(
      Seq(col(key), col(leftTs).as(ts), lit(1).as(tag),
        lit(null).cast(payType).as(pay)) ++
        leftCols.filterNot(_ == key).map(col): _*)

    val sweep = Window
      .partitionBy(key)
      .orderBy(col(ts), col(tag))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedRight
      .unionByName(taggedLeft)
      .select(
        Seq(col(key), col(ts), col(tag)) ++
          Seq(last(col(pay), ignoreNulls = true).over(sweep).as(pay)) ++
          leftCols.filterNot(_ == key).map(col): _*)
      .filter(col(tag) === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col(s"$pay.$c").as(c)): _*)
  }
}
