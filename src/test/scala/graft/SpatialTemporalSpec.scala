package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** From-first-principles references for the spatial/temporal/graph rows
  * (`operators/SpatialTemporal.scala`) and the Gopher repetition rules
  * (`ext/TextAnalysis.scala` doc_gopher_rules): each registry query on
  * sf0.001 against an independent brute-force recompute in plain Scala —
  * O(n²) neighbor scan, sequential interval sweep, queue BFS, and direct
  * substring counting — so the distributed decomposition (grid stencil,
  * running-max islands, set-at-a-time frontier, in-row array folds) is
  * pinned to the naive semantics it replaces.
  */
class SpatialTemporalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def coord(k: Long, salt: String): Long =
    java.lang.Long.parseLong(md5hex(s"$k$salt").take(12), 16) % 100000L

  test("q_grid_neighbor_join == O(n^2) brute-force radius scan") {
    val keys = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").cast("long")).collect().map(_.getLong(0))
    val pts = keys.map(k => (k, coord(k, "x"), coord(k, "y")))
    val r2 = 2000L * 2000L
    val expected = pts.flatMap { case (k, x, y) =>
      val near = pts.filter { case (bk, bx, by) =>
        bk != k && (x - bx) * (x - bx) + (y - by) * (y - by) <= r2
      }
      if (near.isEmpty) None
      else Some(k -> (near.length.toLong, near.map { case (_, bx, by) =>
        (x - bx) * (x - bx) + (y - by) * (y - by)
      }.min))
    }.toMap
    val got = q("q_grid_neighbor_join").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
    assert(got.nonEmpty, "fixture produced zero neighbor pairs — scatter broken")
  }

  test("q_interval_merge == sequential sweep over sorted spans") {
    val rows = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_suppkey").cast("long"), col("l_orderkey").cast("long"),
        col("l_linenumber").cast("long"), to_date(col("l_shipdate")).as("d"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDate(3).toLocalDate))
    val expected = rows.groupBy(_._1).map { case (supp, ls) =>
      val spans = ls.map { case (_, ok, ln, ship) =>
        (ship, ship.plusDays((ok * 7 + ln * 11) % 25), ok, ln)
      }.sortBy(t => (t._1.toEpochDay, t._2.toEpochDay, t._3, t._4))
      // sweep: extend the open island while next.start <= max(end) so far
      var islands = List.empty[(java.time.LocalDate, java.time.LocalDate, Long)]
      for ((s, e, _, _) <- spans) islands match {
        case (is, ie, n) :: tail if !s.isAfter(ie) =>
          islands = (is, Seq(ie, e).max(Ordering.by((d: java.time.LocalDate) => d.toEpochDay)), n + 1) :: tail
        case _ => islands = (s, e, 1L) :: islands
      }
      val covered = islands.map { case (s, e, _) => e.toEpochDay - s.toEpochDay + 1 }.sum
      supp -> (islands.length.toLong, covered, islands.map(_._3).max)
    }
    val got = q("q_interval_merge").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
    // the sweep must actually merge somewhere, or the row tests nothing
    assert(got.values.exists(_._3 > 1), "no supplier ever merged two spans")
  }

  test("q_bfs_reach == queue BFS over the bipartite slice") {
    val edges = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") <= 1)
      .select(col("l_partkey").cast("long"), col("l_suppkey").cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val bySupp = edges.groupBy(_._2).map { case (s, es) => s -> es.map(_._1) }
    val byPart = edges.groupBy(_._1).map { case (p, es) => p -> es.map(_._2) }
    val hops = scala.collection.mutable.Map.empty[(String, Long), Long]
    var frontier: Set[(String, Long)] =
      edges.map(_._1).distinct.filter(_ % 100 == 0).map(p => ("P", p)).toSet
    frontier.foreach(hops(_) = 0L)
    for (h <- 1 to 6) {
      val next = frontier.flatMap {
        case ("P", p) => byPart.getOrElse(p, Array.empty[Long]).map(s => ("S", s))
        case (_, s)   => bySupp.getOrElse(s, Array.empty[Long]).map(p => ("P", p))
      }.filterNot(hops.contains)
      next.foreach(hops(_) = h.toLong)
      frontier = next
    }
    val expected = hops.toSeq.groupBy { case ((t, _), h) => (h, t) }
      .map { case (k, vs) => k -> vs.size.toLong }
    val got = q("q_bfs_reach").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    assert(expected.keys.map(_._1).max >= 2L,
      "graph saturated in one hop — slice not sparse enough to test BFS")
  }

  test("doc_gopher_rules == direct substring counting per document") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.flatMap { case (id, text) =>
      val toks = text.split(" ", -1)
      if (toks.length < 5) None
      else {
        val nChars = text.length.toLong
        val g2 = toks.sliding(2).map(_.mkString(" ")).toSeq
        val g5 = toks.sliding(5).map(_.mkString(" ")).toSeq
        val counts2 = g2.groupBy(identity).map { case (g, o) => g -> o.size }
        val topCnt = counts2.values.max
        // tie-break: max gram string among the max-count grams (both engines)
        val topGram = counts2.filter(_._2 == topCnt).keys.max
        val dup5Chars = g5.map(g =>
          if (g5.count(_ == g) > 1) g.length.toLong else 0L).sum
        val top2Micro = 1000000L * topCnt * topGram.length / nChars
        val dup5Micro = 1000000L * dup5Chars / nChars
        val verdict =
          if (top2Micro < 200000 && dup5Micro < 150000) "KEEP" else "DROP"
        Some(id -> (top2Micro, dup5Micro, verdict))
      }
    }.toMap
    val got = q("doc_gopher_rules").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got == expected)
    assert(got.values.exists(_._3 == "DROP") && got.values.exists(_._3 == "KEEP"),
      "fixture exercises only one verdict")
  }
}
