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
    * @param localEdgeThreshold when the (already-materialized) symmetrized
    *   edge count is at or below this, the component labels are computed
    *   with driver-side union-find over the collected edge list and
    *   broadcast-joined back onto the (still distributed) vertex set —
    *   the same small-side-goes-local reasoning as a broadcast hash join.
    *   An iterative job per graph-diameter round costs several driver
    *   round-trips of plan analysis + codegen + task scheduling; for a
    *   graph whose EDGES fit comfortably on the driver (near-dup pair
    *   graphs are ~orders of magnitude smaller than their corpus) that
    *   fixed overhead dwarfs the actual work. 4M edges ≈ 64 MB collected
    *   — safely under any real driver budget; set to 0 to force the
    *   distributed loop. The vertex set is never collected, so isolated-
    *   vertex-heavy corpora stay distributed.
    * @return (id, component) where component = min id reachable from id
    */
  def apply(vertices: DataFrame, edges: DataFrame, maxIters: Int = 25,
      loopPartitions: Option[Int] = None,
      localEdgeThreshold: Long = 4L * 1000 * 1000): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
    val nEdges = sym.count() // materialize once; reused every round

    if (nEdges <= localEdgeThreshold) {
      val labels = localUnionFind(sym)
      sym.unpersist()
      val spark = vertices.sparkSession
      import spark.implicits._
      val labelDf = labels.toSeq.toDF("id", "comp")
      // broadcast the (small) non-trivial labels; everything else is its
      // own component — vertices themselves never leave the executors
      return vertices.select(col("id"))
        .join(org.apache.spark.sql.functions.broadcast(labelDf), Seq("id"), "left")
        .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
    }

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
      // LAZY checkpoint: the convergence-check aggregate below is the
      // action that materializes it, so each round is ONE job (an eager
      // checkpoint + separate agg scan was two) while the next round's
      // plan still starts from the checkpointed RDD, not grown lineage.
      val next = loopPartitions
        .map(n => unioned.repartition(n, col("id")))
        .getOrElse(unioned)
        .groupBy("id")
        .agg(min("comp").as("comp"))
        .localCheckpoint(false)
      // sum is NULL on an empty vertex set — treat as converged-at-zero
      val row = next.agg(sum("comp")).first()
      val s = if (row.isNullAt(0)) 0L else row.getLong(0)
      converged = s == prevSum
      prevSum = s
      labels = next
      iter += 1
    }
    sym.unpersist()
    if (!converged) {
      // exiting via the cap means labels are NOT the fixpoint — wrong
      // components. Refuse to return silently-wrong data; callers with a
      // deep graph should use `alternating` (O(log²) rounds).
      throw new IllegalStateException(
        s"ConnectedComponents did not converge within $maxIters rounds " +
          "(graph diameter exceeds the cap); use " +
          "ConnectedComponents.alternating for deep graphs")
    }
    labels
  }

  /** Driver union-find with min-root union: roots are always the minimum
    * id of their set, so `find(v)` at the fixpoint equals the min
    * reachable id — identical semantics to the distributed loop (and to
    * the DuckDB recursive-CTE oracle). Path-halving keeps it near-linear.
    */
  private def localUnionFind(sym: DataFrame): collection.Map[Long, Long] = {
    val parent = collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var v = x
      while (parent.getOrElse(v, v) != v) {
        val p = parent(v)
        val gp = parent.getOrElse(p, p)
        parent(v) = gp // path halving
        v = gp
      }
      v
    }
    sym.select(col("src"), col("dst")).collect().foreach { r =>
      val (a, b) = (find(r.getLong(0)), find(r.getLong(1)))
      if (a != b) {
        // min root wins — keeps the invariant root == min(set)
        if (a < b) parent(b) = a else parent(a) = b
      }
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  /** The alternating large-star/small-star algorithm (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14) — the scale
    * path for graphs whose DIAMETER is large (long chains), where plain
    * min-label propagation needs diameter rounds. Each round is a
    * groupBy + join over the edge list; convergence in O(log² n) rounds
    * regardless of diameter. Use `apply` for shallow near-dup graphs
    * (fewer, cheaper rounds); use this when the graph shape is unknown.
    *
    * large-star: every node points its LARGER neighbors at the minimum of
    * its closed neighborhood; small-star: same for smaller-or-equal
    * neighbors. The fixpoint is a star forest rooted at component minima.
    */
  def alternating(vertices: DataFrame, edges: DataFrame,
      maxRounds: Int = 30): DataFrame = {
    def sym(e: DataFrame): DataFrame =
      e.union(e.select(col("dst").as("src"), col("src").as("dst")))

    // m(u) = min of u's closed neighborhood over the symmetrized edges
    def neighborhoodMin(nbr: DataFrame): DataFrame =
      nbr.groupBy("src").agg(least(col("src"), min(col("dst"))).as("m"))

    def largeStar(e: DataFrame): DataFrame = {
      val nbr = sym(e)
      nbr.join(neighborhoodMin(nbr), "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      val nbr = sym(e).filter(col("dst") <= col("src"))
      val withMin = nbr
        .groupBy("src").agg(least(col("src"), min(col("dst"))).as("m"))
      nbr.join(withMin, "src")
        .select(
          when(col("dst") === col("m"), col("src")).otherwise(col("dst")).as("src"),
          col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }

    def checksum(e: DataFrame): (Long, Long, Long) = {
      val r = e.agg(count(lit(1)), sum(col("src")),
        sum(pmod(xxhash64(col("src"), col("dst")), lit(1000000007L)))).first()
      (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }

    var e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct().localCheckpoint()
    var prev = (-1L, -1L, -1L)
    var round = 0
    var cur = checksum(e)
    while (cur != prev && round < maxRounds) {
      prev = cur
      e = smallStar(largeStar(e)).localCheckpoint()
      cur = checksum(e)
      round += 1
    }
    if (cur != prev) {
      throw new IllegalStateException(
        s"ConnectedComponents.alternating did not converge within " +
          s"$maxRounds rounds — raise maxRounds (O(log² n) expected)")
    }
    // fixpoint is a star forest: members point at their root; roots and
    // isolated vertices label themselves
    vertices.select(col("id"))
      .join(e.select(col("src").as("id"), col("dst").as("comp")), Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }
}
