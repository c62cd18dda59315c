package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC → SCD Type 1 staging (tier B — README_DBT.md:163-169, 242-244):
  * Debezium-shaped change events (`_op` ∈ c/u/d, `_commit_ts`) collapsed to
  * current state: latest event per key wins, soft-deleted keys drop out.
  *
  * Scale notes: one shuffle on the business key (the window partition);
  * ties broken deterministically by (commit_ts, op) so replays converge.
  * For continuous ingestion the same transform runs per micro-batch via
  * foreachBatch + MERGE into the target table.
  */
object Cdc {

  /** Collapse a CDC event batch to SCD1 current state.
    * @param keyCols   business key columns
    * @param tsCol     commit-timestamp column (latest wins)
    * @param opCol     operation column: 'c'reate / 'u'pdate / 'd'elete
    */
  def scd1(events: DataFrame, keyCols: Seq[String],
      tsCol: String = "_commit_ts", opCol: String = "_op"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).desc, col(opCol).desc)
    events
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .filter(col(opCol) =!= "d") // soft-delete: latest op is delete → key gone
      .drop("_rn", opCol)
  }

  /** Merge a CDC batch into an existing SCD1 state table: union the state
    * (as synthetic oldest 'u' events) with the new batch, re-collapse.
    * Idempotent: applying the same batch twice yields the same state.
    */
  def merge(state: DataFrame, batch: DataFrame, keyCols: Seq[String],
      tsCol: String = "_commit_ts", opCol: String = "_op"): DataFrame = {
    val stateAsEvents = state
      .withColumn(opCol, lit("u"))
    scd1(stateAsEvents.unionByName(batch, allowMissingColumns = true), keyCols, tsCol, opCol)
  }

  /** CDC events → SCD Type 2 history (the dbt `snapshot` shape): one row
    * per key VERSION with `valid_from`/`valid_to` interval columns and an
    * `is_current` flag. Each event opens a version at its commit ts; the
    * next event on the same key closes it (delete events close the
    * previous version without opening one). Pure window arithmetic — one
    * shuffle on the business key, deterministic under replay (same tie
    * order as scd1), and REBUILDABLE: applying it to the full event log
    * always yields the same history, so incremental maintenance can
    * always fall back to recompute.
    */
  def scd2(events: DataFrame, keyCols: Seq[String],
      tsCol: String = "_commit_ts", opCol: String = "_op"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col(opCol).asc)
    events
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .filter(col(opCol) =!= "d") // a delete closes; it is not a version
      .withColumn("is_current", col("valid_to").isNull)
      .drop(opCol)
  }

  /** Merge a CDC batch into an existing SCD2 history: reopen the stored
    * versions as events at their original `valid_from`, re-emit every
    * closed interval's upper bound as a synthetic delete (so versions
    * that were closed by a delete — a GAP with no successor version —
    * stay closed instead of silently reopening), add the new batch, and
    * recompute the window. Non-delete ops are normalized to 'u' before a
    * (key, ts, op) dedup — create/update both just open a version, and
    * without the normalization a re-merge would pair history's reopened
    * 'u' with the batch's original 'c' at the same timestamp and emit a
    * spurious zero-length version. Same-timestamp close+open pairs stay
    * distinct ('d' vs 'u') and deterministically ordered.
    */
  def scd2Merge(history: DataFrame, batch: DataFrame, keyCols: Seq[String],
      tsCol: String = "_commit_ts", opCol: String = "_op"): DataFrame = {
    val asEvents = history
      .withColumn(tsCol, col("valid_from"))
      .withColumn(opCol, lit("u"))
      .drop("valid_from", "valid_to", "is_current")
    val closures = history
      .filter(col("valid_to").isNotNull)
      .withColumn(tsCol, col("valid_to"))
      .withColumn(opCol, lit("d"))
      .drop("valid_from", "valid_to", "is_current")
    val unioned = asEvents.unionByName(closures)
      .unionByName(batch, allowMissingColumns = true)
      .withColumn(opCol, when(col(opCol) === "d", "d").otherwise("u"))
      .dropDuplicates(keyCols ++ Seq(tsCol, opCol))
    scd2(unioned, keyCols, tsCol, opCol)
  }
}
