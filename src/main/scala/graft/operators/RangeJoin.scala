package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned (bucketed) range join: `points.value BETWEEN intervals.lo AND
  * intervals.hi` executed as an EQUI-join on fixed-width bins instead of a
  * nested-loop.
  *
  * OSS Spark has no range-join optimization: an inequality-only join
  * condition always plans BroadcastNestedLoopJoin (fine for a tiny side,
  * see OperatorQueries.q_range_band_join) or CartesianProduct — O(n·m)
  * when BOTH sides are large. The standard fix (what Databricks' range
  * join hint does under the hood) is binning: quantize the range
  * dimension into width-w buckets, explode each interval onto every bin
  * it overlaps, equi-join point-bin to interval-bin (shuffle hash / sort
  * merge — Spark's scalable join machinery), and re-check the exact
  * predicate. Cost: O(n + m·avg_bins_per_interval) shuffled rows, so it
  * survives two 100 TB sides as long as `binWidth` is chosen near the
  * median interval length (≈1-2 bins per interval).
  */
object RangeJoin {

  /** @param points    side with a scalar column `v` (INTEGRAL type — the
    *                  range dimension is quantized with exact integer
    *                  arithmetic, like BinnedRangeJoinRule; a double
    *                  `floor(v / w)` could place a point and an interval
    *                  bound in different bins for values beyond ~2^53 and
    *                  silently DROP true matches, which the post-join band
    *                  filter cannot recover)
    * @param intervals side with `lo`/`hi` columns (inclusive bounds,
    *                  integral)
    * @param binWidth  quantization width in the range dimension's units
    * @param keys      extra equi-join keys (joined alongside the bin, so
    *                  the shuffle co-partitions on (key, bin))
    */
  def binned(
      points: DataFrame,
      intervals: DataFrame,
      v: String,
      lo: String,
      hi: String,
      binWidth: Long,
      keys: Seq[String] = Nil,
  ): DataFrame = {
    // floor division on longs: subtract the (always-nonnegative) pmod so
    // the dividend is an exact multiple, then `div` — exact at any
    // magnitude and floor-consistent for negatives on both sides
    def bin(c: String): Column = expr(
      s"(CAST($c AS BIGINT) - pmod(CAST($c AS BIGINT), CAST($binWidth AS BIGINT)))" +
        s" div CAST($binWidth AS BIGINT)")
    val pBin = points.withColumn("__bin", bin(v))
    val iBin = intervals.withColumn(
      "__bin",
      explode(sequence(bin(lo), bin(hi))))
    pBin
      .join(iBin, "__bin" +: keys)
      .filter(col(v) >= col(lo) && col(v) <= col(hi))
      .drop("__bin")
  }
}
