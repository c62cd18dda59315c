package graft.dq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DLT-style expectations (tier B — README_DBT.md:236-239:
  * `CONSTRAINT valid_x EXPECT (cond) ON VIOLATION DROP ROW`): named row
  * predicates with a violation policy, plus a quarantine side-output so
  * dropped rows are never silently lost.
  *
  * One pass over the data per materialized branch; the predicate work is
  * plain codegen'd expressions, so at 100 TB this costs a scan, not a
  * shuffle.
  */
object Expectations {

  sealed trait Policy
  /** Keep violating rows, count them (DLT `EXPECT`). */
  case object Warn extends Policy
  /** Drop violating rows (DLT `ON VIOLATION DROP ROW`). */
  case object Drop extends Policy
  /** Abort the pipeline if any row violates (DLT `ON VIOLATION FAIL UPDATE`). */
  case object Fail extends Policy

  final case class Expectation(name: String, condition: Column, policy: Policy)

  /** `violationCounts` is LAZY: the count is an EAGER aggregation job over
    * the input, and a caller that only wants `retained` (the common DROP
    * pipeline shape) should not pay it — it runs on first access and is
    * memoized. With a `Fail` expectation the count is forced inside
    * `apply` regardless (the fail-on-violation contract needs it). A
    * caller consuming BOTH the counts and the frames should persist the
    * input first (the [[graft.stream.Ingest]] quarantine pipeline does),
    * or the lazy count is a second scan.
    */
  final class Result(
      val retained: DataFrame,
      val quarantined: DataFrame,
      countsThunk: () => Map[String, Long]) {
    lazy val violationCounts: Map[String, Long] = countsThunk()
  }

  /** Apply expectations: returns retained rows, quarantined rows (tagged
    * with the names of the expectations they failed), and per-expectation
    * violation counts (lazy — see [[Result]]). `Fail` expectations throw
    * on first violation (counted inside apply).
    */
  def apply(df: DataFrame, expectations: Seq[Expectation]): Result = {
    require(expectations.nonEmpty, "no expectations given")
    val failedArray = array(expectations.map(e =>
      when(!coalesce(e.condition, lit(false)), lit(e.name))): _*)
    val tagged = df.withColumn("_failed_expectations",
      filter(failedArray, c => c.isNotNull))

    def computeCounts(): Map[String, Long] = {
      val counts: Map[String, Long] = tagged
        .select(explode(col("_failed_expectations")).as("e"))
        .groupBy("e").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      expectations.map(e => e.name -> counts.getOrElse(e.name, 0L)).toMap
    }

    val dropNames = expectations.filter(_.policy == Drop).map(_.name)
    val dropped: Column =
      if (dropNames.isEmpty) lit(false)
      else exists(col("_failed_expectations"), c => c.isInCollection(dropNames))
    val retained = tagged.filter(!dropped).drop("_failed_expectations")
    val quarantined = tagged.filter(dropped)

    if (expectations.exists(_.policy == Fail)) {
      // Fail demands the count NOW — one pass, memoized into the result
      val counts = computeCounts()
      expectations.filter(_.policy == Fail).foreach { e =>
        val n = counts(e.name)
        if (n > 0) throw new IllegalStateException(
          s"expectation '${e.name}' failed for $n rows (ON VIOLATION FAIL)")
      }
      new Result(retained, quarantined, () => counts)
    } else new Result(retained, quarantined, () => computeCounts())
  }
}
