package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph/order primitives shared by the query registry and
  * the property specs (factored in r14 so the randomized brute-force
  * equivalence tests exercise the exact production code paths).
  */
object Graph {

  /** Triangle count over a DISTINCT undirected edge set given in
    * id-canonical form (columns `a` < `b`), via DEGREE ORIENTATION: each
    * edge points low→high degree (ties: low→high id), which bounds every
    * out-degree by √(2m) — the lever that survives skewed graphs, where
    * id orientation puts d²/2 wedges on a celebrity node. The orientation
    * is a TOTAL order, so each triangle holds exactly one node with two
    * out-edges into it: counted once, no per-wedge dedup. Two equi-joins
    * (wedge build on src, closing left-semi probe in id space); never a
    * cartesian.
    *
    * @return 1-row DataFrame (n_edges, n_nodes, n_triangles)
    */
  def triangleCount(pairsIn: DataFrame): DataFrame = {
    // persist with no unpersist is deliberate: the returned frame is
    // lazy, so the cache must outlive this call; per-invocation entries
    // are edge-set-sized and LRU-evicted (same lifecycle as minhashDedup's
    // fingerprint persist)
    val pairs = pairsIn.select("a", "b").persist()
    val deg = pairs.select(col("a").as("n"))
      .unionAll(pairs.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // a < b always, so on a degree tie the edge keeps a as source
    val aWins = col("da") < col("db") || (col("da") === col("db"))
    val e = pairs
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      .select(when(aWins, col("a")).otherwise(col("b")).as("src"),
        when(aWins, col("b")).otherwise(col("a")).as("dst"))
    val wedges = e.as("x").join(e.as("y"),
        col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
      .select(col("x.dst").as("v"), col("y.dst").as("w"))
    val closed = wedges.join(
      pairs.select(col("a").as("v"), col("b").as("w")),
      Seq("v", "w"), "leftsemi")
    pairs.select(count(lit(1)).as("n_edges"))
      .crossJoin(deg.select(count(lit(1)).as("n_nodes")))
      .crossJoin(closed.select(count(lit(1)).as("n_triangles")))
  }

  /** 3-D Pareto skyline (minimize `cents`, maximize `sz` and `q`) via
    * BNL with bucket pruning — the d>2 shape the 2-D sort-sweep cannot
    * express. Three exact stages: a per-price-bucket 2-D pareto sweep
    * (partitioned window, parallel across buckets), a broadcast anti-join
    * removing every row dominated from a strictly-cheaper bucket (any
    * such dominator is itself dominated-or-equal to a bucket pareto
    * point, which is strictly cheaper by bucket construction), then an
    * exact block-nested-loop among the survivors — sound because every
    * dominated row has an UNDOMINATED dominator and undominated rows are
    * never pruned. Survivors are persisted: they feed BOTH sides of the
    * final BNL.
    *
    * Input columns: `id`, `cents`, `sz`, `q`. Output: the skyline rows
    * (same columns, minus the internal bucket).
    */
  def skyline3d(dIn: DataFrame, bucketWidth: Long = 10000L): DataFrame = {
    val d = dIn.withColumn("b", expr(s"cents div $bucketWidth"))
    val sweep = org.apache.spark.sql.expressions.Window
      .partitionBy("b").orderBy(col("sz").desc)
      .rangeBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val tie = org.apache.spark.sql.expressions.Window.partitionBy("b", "sz")
    val pareto = d
      .withColumn("mxq_strict", max(col("q")).over(sweep))
      .withColumn("mxq_tie", max(col("q")).over(tie))
      .filter(col("q") > coalesce(col("mxq_strict"), lit(-1L)) &&
        col("q") === col("mxq_tie"))
      .select(col("b").as("sb"), col("sz").as("ssz"), col("q").as("sq"))
    val survivors = d.join(broadcast(pareto),
      col("sb") < col("b") && col("ssz") >= col("sz") &&
        col("sq") >= col("q"), "left_anti").persist()
    val s2 = survivors.select(col("cents").as("c2"),
      col("sz").as("z2"), col("q").as("q2"))
    survivors.join(broadcast(s2),
      col("c2") <= col("cents") && col("z2") >= col("sz") &&
        col("q2") >= col("q") &&
        (col("c2") < col("cents") || col("z2") > col("sz") ||
          col("q2") > col("q")), "left_anti")
      .select("id", "cents", "sz", "q")
  }

  /** SYNCHRONOUS label propagation (community detection), `rounds` fixed
    * iterations: every node starts as its own label; each round every
    * node adopts the most frequent label among its neighbors, ties
    * broken by SMALLEST label — the deterministic variant (classic async
    * LPA is order-dependent and un-oracle-able). Isolated nodes keep
    * their own label.
    *
    * Scale shape: one round = one equi-join of the edge list against the
    * label frame (shuffle on the join key) + one (node, label)-grain hash
    * aggregate + one node-grain argmax via `max(struct(count, -label))`
    * — an AGGREGATE, deliberately not a window over node partitions, so
    * a celebrity node costs a skewed group, not a single-task sort.
    * State per round is one row per node; lineage is cut per round
    * (localCheckpoint, the [[ConnectedComponents]]/[[PageRank]]
    * discipline) so the plan stays round-sized instead of growing
    * exponentially.
    *
    * @param nodes one `id` column; @param edges SYMMETRIC (src, dst)
    * @return (id, lab) — the community label after `rounds`
    */
  def labelPropagation(nodes: DataFrame, edges: DataFrame,
      rounds: Int): DataFrame = {
    var labels = nodes.select(col("id"), col("id").as("lab"))
    for (r <- 1 to rounds) {
      val freq = edges
        .join(labels.select(col("id").as("dst"), col("lab")), "dst")
        .groupBy(col("src").as("id"), col("lab"))
        .agg(count(lit(1)).as("c"))
      val best = freq.groupBy("id")
        .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("b"))
        .select(col("id"), (-col("b.nl")).as("newlab"))
      labels = labels.join(best, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("newlab"), col("lab")).as("lab"))
      // cut lineage BETWEEN rounds only: the last round stays a plan (one
      // round deep — fine), so callers and PlanSpec see the round's real
      // shape instead of a Scan ExistingRDD, and the final materialization
      // is saved
      if (r < rounds) labels = labels.localCheckpoint()
    }
    labels
  }
}
