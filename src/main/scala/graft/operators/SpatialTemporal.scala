package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spatial, temporal-interval, and iterative-graph operators (round 15):
  * the three classic shapes a warehouse meets past plain joins/windows —
  * radius neighbor search, overlapping-interval coalescing, and BFS
  * reachability — each expressed in the form that survives 100 TB.
  *
  *  - `q_grid_neighbor_join`: a radius self-join decomposed into a grid
  *    EQUI-join (cell size = radius, 3x3 stencil) + exact distance
  *    filter. The naive form is a quadratic cross join; the grid form
  *    shuffles on bounded cell keys and its cost is output-proportional
  *    (pair density), the standard spatial-join decomposition.
  *  - `q_interval_merge`: gaps-and-islands over RANGES (running max of
  *    interval end vs next start) — one shuffle on the partition key,
  *    then pure window work; the overlap-coalescing complement of the
  *    gap-based `q_sessionize`.
  *  - `q_bfs_reach`: breadth-first reachability with a bounded hop
  *    count — per hop one distributed hash join frontier⋈edges plus an
  *    anti-join against the visited set (first-reach ≡ min-hop, so no
  *    per-path state ever exists). The oracle replays it as a
  *    WITH RECURSIVE min-hop query.
  *
  * Determinism: coordinates are synthesized from keys by pure integer
  * arithmetic (multiply/mod in BIGINT — identical in Spark and DuckDB),
  * distances compared as exact integer squares; interval islands order
  * by a fully deterministic key; BFS levels are set-valued. No float
  * ever crosses an engine boundary.
  */
object SpatialTemporal {

  val all: Seq[QueryDef] = Seq(

    // ---- grid-bucketed radius self-join over synthetic points: each
    //      customer gets an integer point in a 100k x 100k space via
    //      multiplicative hashing; cell = coord / 2000 (= radius), the
    //      probe side explodes its 3x3 neighbor stencil, and the join is
    //      a pure EQUI-join on (cell_x, cell_y). Each ordered pair (a,b)
    //      is found exactly once (a's stencil covers b's cell), so the
    //      per-point neighbor count needs no dedup. Broadcast never
    //      applies (both sides are the corpus) — this is the shape whose
    //      shuffle is uniform by construction (hashed coords). ----
    QueryDef(
      "q_grid_neighbor_join",
      (sp, dir) => {
        val cell = 2000L
        val r2 = cell * cell // radius == cell size: stencil is sufficient
        // md5-derived scatter (the doc_rolling_fp cross-engine idiom): a
        // multiplicative key*prime mod M lays points on a 1-D lattice
        // (first cut measured ZERO neighbor pairs at the gate SF); md5
        // gives uniform scatter and is bit-identical in both engines
        def coord(salt: String) = pmod(
          conv(substring(md5(concat(col("c_custkey").cast("string"),
            lit(salt))), 1, 12), 16, 10).cast("long"), lit(100000L))
        val pts = Tables.customer(sp, dir).select(
          col("c_custkey").cast("long").as("k"),
          coord("x").as("px"), coord("y").as("py"))
        val build = pts.select(col("k").as("bk"), col("px").as("bx"),
          col("py").as("by_"), floor(col("px") / cell).as("cx"),
          floor(col("py") / cell).as("cy"))
        val stencil = array((for { dx <- -1 to 1; dy <- -1 to 1 } yield
          struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
        val probe = pts
          .select(col("k"), col("px"), col("py"), explode(stencil).as("o"))
          .select(col("k"), col("px"), col("py"),
            (floor(col("px") / cell) + col("o.dx")).as("cx"),
            (floor(col("py") / cell) + col("o.dy")).as("cy"))
        val d2 = (col("px") - col("bx")) * (col("px") - col("bx")) +
          (col("py") - col("by_")) * (col("py") - col("by_"))
        probe.join(build, Seq("cx", "cy"))
          .filter(col("bk") =!= col("k") && d2 <= lit(r2))
          .groupBy(col("k").as("c_custkey"))
          .agg(count(lit(1)).as("n_neighbors"), min(d2).as("min_d2"))
          .orderBy("c_custkey")
      },
      Some(
        """WITH p AS (
          |  SELECT CAST(c_custkey AS BIGINT) AS k,
          |         CAST(list_sum(list_transform(generate_series(1, 12),
          |           i -> (strpos('0123456789abcdef',
          |                   substr(md5(CAST(c_custkey AS VARCHAR) || 'x'), i, 1)) - 1)
          |                * (CAST(1 AS BIGINT) << (4 * (12 - i))))) AS BIGINT)
          |           % 100000 AS px,
          |         CAST(list_sum(list_transform(generate_series(1, 12),
          |           i -> (strpos('0123456789abcdef',
          |                   substr(md5(CAST(c_custkey AS VARCHAR) || 'y'), i, 1)) - 1)
          |                * (CAST(1 AS BIGINT) << (4 * (12 - i))))) AS BIGINT)
          |           % 100000 AS py
          |  FROM customer),
          |o AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),
          |                            (0,1),(1,-1),(1,0),(1,1)) t(dx, dy)),
          |probe AS (
          |  SELECT k, px, py, px // 2000 + dx AS cx, py // 2000 + dy AS cy
          |  FROM p, o),
          |b AS (SELECT k AS bk, px AS bx, py AS by_,
          |             px // 2000 AS cx, py // 2000 AS cy FROM p)
          |SELECT probe.k AS c_custkey,
          |       count(*) AS n_neighbors,
          |       min((px - bx) * (px - bx) + (py - by_) * (py - by_)) AS min_d2
          |FROM probe JOIN b USING (cx, cy)
          |WHERE bk <> k
          |  AND (px - bx) * (px - bx) + (py - by_) * (py - by_) <= 4000000
          |GROUP BY 1 ORDER BY c_custkey""".stripMargin),
    ),

    // ---- overlapping-interval coalescing: lineitem [shipdate,
    //      receiptdate] spans per supplier merge into islands via the
    //      running-max-of-end vs next-start flag. The window orders by a
    //      FULLY deterministic key (ship, receipt, orderkey, linenumber)
    //      so tie rows see identical preceding maxima in both engines.
    //      One shuffle on suppkey; everything after is narrow. ----
    QueryDef(
      "q_interval_merge",
      (sp, dir) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_receiptdate"),
            col("l_orderkey"), col("l_linenumber"))
        val prevMax = max(col("l_receiptdate"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1))
        // the reduced schema carries no receiptdate — synthesize a
        // deterministic 0..24-day transit from the line's keys (pure
        // integer arithmetic, identical in the oracle)
        Tables.lineitem(sp, dir)
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            to_date(col("l_shipdate")).as("l_shipdate"),
            date_add(to_date(col("l_shipdate")),
              ((col("l_orderkey") * 7 + col("l_linenumber") * 11) % 25)
                .cast("int")).as("l_receiptdate"))
          .withColumn("is_new",
            when(prevMax.isNull || col("l_shipdate") > prevMax, 1L)
              .otherwise(0L))
          .withColumn("island", sum(col("is_new"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("l_suppkey", "island")
          .agg(min(col("l_shipdate")).as("span_start"),
            max(col("l_receiptdate")).as("span_end"),
            count(lit(1)).as("n_spans"))
          .groupBy("l_suppkey")
          .agg(count(lit(1)).as("n_islands"),
            sum(datediff(col("span_end"), col("span_start")) + 1)
              .as("covered_days"),
            max(col("n_spans")).as("max_merged"))
          .orderBy("l_suppkey")
      },
      Some(
        """WITH li AS (
          |  SELECT l_suppkey, l_orderkey, l_linenumber,
          |         CAST(l_shipdate AS DATE) AS l_shipdate,
          |         CAST(l_shipdate AS DATE)
          |           + CAST((l_orderkey * 7 + l_linenumber * 11) % 25
          |                  AS INTEGER) AS l_receiptdate
          |  FROM lineitem),
          |f AS (
          |  SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate, l_receiptdate,
          |         CASE WHEN max(l_receiptdate) OVER
          |                (PARTITION BY l_suppkey
          |                 ORDER BY l_shipdate, l_receiptdate, l_orderkey, l_linenumber
          |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
          |                OR l_shipdate > max(l_receiptdate) OVER
          |                (PARTITION BY l_suppkey
          |                 ORDER BY l_shipdate, l_receiptdate, l_orderkey, l_linenumber
          |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          |              THEN 1 ELSE 0 END AS is_new
          |  FROM li),
          |isl AS (
          |  SELECT l_suppkey, l_shipdate, l_receiptdate,
          |         CAST(sum(is_new) OVER
          |           (PARTITION BY l_suppkey
          |            ORDER BY l_shipdate, l_receiptdate, l_orderkey, l_linenumber
          |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          |           AS island
          |  FROM f),
          |spans AS (
          |  SELECT l_suppkey, island,
          |         min(l_shipdate) AS span_start,
          |         max(l_receiptdate) AS span_end,
          |         count(*) AS n_spans
          |  FROM isl GROUP BY 1, 2)
          |SELECT l_suppkey,
          |       CAST(count(*) AS BIGINT) AS n_islands,
          |       CAST(sum(date_diff('day', span_start, span_end) + 1) AS BIGINT)
          |         AS covered_days,
          |       CAST(max(n_spans) AS BIGINT) AS max_merged
          |FROM spans GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin),
    ),

    // ---- bounded BFS reachability over the bipartite part—supplier
    //      graph (distinct lineitem (partkey, suppkey) pairs as edges;
    //      the reduced schema's partsupp). Seeds = parts with key % 100
    //      = 0; 6 hops (the maxHops constant below — the oracle's
    //      WHERE b.hop < 6 must move with it). Each hop is ONE
    //      distributed equi-join frontier ⋈
    //      edges + an anti-join against visited — the set-at-a-time BFS
    //      whose state is node-bounded (never path-bounded). Each level
    //      localCheckpoints (lineage cut, the CC idiom). Output is the
    //      (hop, node_type) histogram — fixed-size at any scale. ----
    QueryDef(
      "q_bfs_reach",
      (sp, dir) => {
        // qty=1 lines only: the full bipartite graph is near-complete
        // (saturates in 2 hops); the sparse slice (part-degree ~1.3)
        // produces a genuine multi-level frontier expansion
        val edges = Tables.lineitem(sp, dir)
          .filter(col("l_quantity") <= 1)
          .select(col("l_partkey").cast("long").as("p"),
            col("l_suppkey").cast("long").as("s"))
          .distinct().persist()
        edges.count() // materialize once; probed every hop
        val seeds = edges.select(col("p")).distinct()
          .filter(col("p") % 100 === 0)
          .select(lit("P").as("typ"), col("p").as("id"))
        // localCheckpoint (the ConnectedComponents idiom) — persist()
        // alone truncates EXECUTION but not the analyzed plan, and
        // next_h's plan references the visited set twice (via the
        // anti-join): without a lineage cut at each LEVEL the plan is
        // O(2^hops) and analysis OOMs the driver before any data moves.
        // Only the LEVELS are checkpointed: levels are disjoint by
        // construction (the anti-join), so `visited` stays a flat union
        // of already-materialized level scans — linear plan growth, and
        // none of the old per-hop eager re-checkpoints of the whole
        // visited set (which re-wrote all prior levels every hop). No
        // per-hop emptiness probe: this graph's frontier is alive through
        // every bounded hop (one histogram row per hop), so a probe is a
        // pure extra action — a caller walking a deeper graph would add
        // one when dead frontiers are plausible.
        val seedLevel = seeds.withColumn("hop", lit(0L)).localCheckpoint(true)
        var levels = List(seedLevel)
        var frontier = seedLevel
        val maxHops = 6
        var h = 1
        while (h <= maxHops) {
          val visited = levels.reduce(_ union _)
          // bipartite: a P-frontier expands over p->s, an S-frontier over
          // s->p; both legs run (one is empty each level by parity)
          val viaP = frontier.filter(col("typ") === "P")
            .join(edges, col("id") === col("p"))
            .select(lit("S").as("typ"), col("s").as("id"))
          val viaS = frontier.filter(col("typ") === "S")
            .join(edges, col("id") === col("s"))
            .select(lit("P").as("typ"), col("p").as("id"))
          val next = viaP.union(viaS).distinct()
            .join(visited, Seq("typ", "id"), "left_anti")
            .withColumn("hop", lit(h.toLong)).localCheckpoint(true)
          levels = next :: levels
          frontier = next
          h += 1
        }
        edges.unpersist(false)
        levels.reduce(_ union _)
          .groupBy(col("hop"), col("typ").as("node_type"))
          .agg(count(lit(1)).as("n_nodes"))
          .orderBy("hop", "node_type")
      },
      Some(
        """WITH RECURSIVE e AS (
          |  SELECT DISTINCT CAST(l_partkey AS BIGINT) AS p,
          |                  CAST(l_suppkey AS BIGINT) AS s
          |  FROM lineitem WHERE l_quantity <= 1),
          |bfs(typ, id, hop) AS (
          |  SELECT 'P', p, 0 FROM (SELECT DISTINCT p FROM e WHERE p % 100 = 0)
          |  UNION
          |  SELECT CASE WHEN b.typ = 'P' THEN 'S' ELSE 'P' END,
          |         CASE WHEN b.typ = 'P' THEN e.s ELSE e.p END,
          |         b.hop + 1
          |  FROM bfs b JOIN e
          |    ON (b.typ = 'P' AND e.p = b.id) OR (b.typ = 'S' AND e.s = b.id)
          |  WHERE b.hop < 6),
          |m AS (SELECT typ, id, min(hop) AS hop FROM bfs GROUP BY typ, id)
          |SELECT CAST(hop AS BIGINT) AS hop, typ AS node_type,
          |       count(*) AS n_nodes
          |FROM m GROUP BY 1, 2 ORDER BY hop, node_type""".stripMargin),
    ),
  )
}
