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
}
