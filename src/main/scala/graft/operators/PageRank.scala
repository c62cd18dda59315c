package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank power iteration in INTEGER FIXED-POINT.
  *
  * Ranks live as longs at scale 1e9 (initial mass 1.0 → 1000000000);
  * damping 0.85 is applied as `(85 * x) div 100` and each neighbor
  * contribution as `r div deg` — every operation is long arithmetic, so
  * partial sums commute and the result after any fixed number of rounds
  * is BIT-EXACT regardless of engine, partitioning or shuffle order
  * (floating-point PageRank differs run-to-run in the last ulp because
  * shuffle order changes the summation order). That exactness is what
  * lets a SQL engine replay the same iteration and hash-match
  * (`doc_pagerank`'s DuckDB oracle).
  *
  * Scale shape: each round is one equi-join of edges with the current
  * ranks on src (both sides shuffle-partitioned on src; the degree side
  * is computed once and reuses that partitioning) plus one aggregation
  * shuffle on dst — the standard distributed power-iteration plan, linear
  * in |E| per round. Rounds are unrolled into one lazy plan here because
  * the registered query runs 3 of them; a deep iteration should
  * localCheckpoint between rounds exactly like [[ConnectedComponents]]
  * does, to keep lineage flat.
  *
  * Overflow headroom: total scaled mass is N·1e9 and a node's rank is at
  * most the damped total, so the 85·Σ intermediate stays below 2^63 for
  * any corpus under ~10^8 sampled nodes; shrink the scale for bigger
  * graphs.
  *
  * @param nodes one column `id`; every vertex, including isolated ones
  * @param edges columns `src`, `dst`; must already be SYMMETRIZED
  * @param rounds number of power iterations (fixed, not to convergence)
  */
object PageRank {
  val Scale: Long = 1000000000L

  def apply(nodes: DataFrame, edges: DataFrame, rounds: Int): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    var rank = nodes.select(col("id"), lit(Scale).as("r"))
    for (_ <- 1 to rounds) {
      val in = edges
        .join(rank.withColumnRenamed("id", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("inr"))
      rank = nodes
        .join(in.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"), expr(
          "CAST(150000000 AS BIGINT) + " +
            "(CAST(85 AS BIGINT) * coalesce(inr, CAST(0 AS BIGINT))) div 100")
          .as("r"))
    }
    rank
  }
}
