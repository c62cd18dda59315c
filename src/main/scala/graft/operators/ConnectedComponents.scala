package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components via min-label propagation — the end-state of every
  * near-dup dedup pipeline: pairwise matches (MinHash/SimHash/Jaccard
  * edges) collapse into duplicate CLUSTERS, and each cluster keeps one
  * representative (the min doc id).
  *
  * Algorithm: every vertex starts labeled with its own id; each round,
  * every vertex takes the min of its label and its neighbors' labels;
  * fixpoint = min reachable id per component. The fixpoint is unique, so
  * the result is deterministic regardless of execution/iteration order —
  * which is what makes it oracle-checkable (DuckDB recursive CTE computes
  * the same min-reachable-id).
  *
  * Scale notes: each round is one shuffle join (edges ⋈ labels, grouped
  * min) — rounds = graph diameter, and near-dup graphs are
  * shallow (dup clusters are cliques-ish, diameter ≲ 3). Lineage is cut
  * every round with localCheckpoint, otherwise the iterated plan grows
  * unboundedly. For adversarially deep graphs (long chains) swap the loop
  * body for the large-star/small-star rounds of Kiveris et al.,
  * "Connected Components in MapReduce and Beyond" (SoCC'14) — same
  * per-round shuffle cost, O(log²) rounds guaranteed.
  */
object ConnectedComponents {

  /** @param vertices one column `id` (LongType)
    * @param edges    columns `src`, `dst` (LongType, undirected)
    * @param loopPartitions shuffle width for the per-round join/agg; the
    *   loop body repartitions by `id` so the groupBy REUSES that
    *   partitioning (one shuffle, `loopPartitions` tasks per round).
    *   Size it to the graph, not the cluster default: per-round task-
    *   scheduling overhead dominates on small/medium graphs, and a
    *   near-dup graph is orders of magnitude smaller than its corpus.
    * @return (id, component) where component = min id reachable from id
    */
  def apply(vertices: DataFrame, edges: DataFrame, maxIters: Int = 25,
      loopPartitions: Option[Int] = None): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
    sym.count() // materialize once; reused every round

    var labels = vertices.select(col("id"), col("id").as("comp"))
    // Labels only ever decrease, so sum(comp) strictly decreases until the
    // fixpoint — an O(1)-output scan of the already-materialized checkpoint
    // detects convergence without the extra old-vs-new join a per-row
    // comparison would cost (2 jobs/round → 1 job + 1 cheap scan).
    var prevSum = Long.MaxValue
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val nbrMin = sym
        .join(labels, sym("dst") === labels("id"))
        .select(sym("src").as("id"), col("comp"))
      val unioned = labels.select(col("id"), col("comp")).union(nbrMin)
      val next = loopPartitions
        .map(n => unioned.repartition(n, col("id")))
        .getOrElse(unioned)
        .groupBy("id")
        .agg(min("comp").as("comp"))
        .localCheckpoint() // cut the iterated lineage (eager)
      val s = next.agg(sum("comp")).first().getLong(0)
      converged = s == prevSum
      prevSum = s
      labels = next
      iter += 1
    }
    sym.unpersist()
    labels
  }
}
