package graft

import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def trades = Seq(
    // key, ts, trade_id
    ("A", 10L, 1L), ("A", 25L, 2L), ("A", 30L, 3L), ("B", 5L, 4L),
  ).toDF("sym", "t", "trade_id")

  private def quotes = Seq(
    // key, ts, px  — unique (key, ts)
    ("A", 8L, 100.0), ("A", 25L, 101.0), ("A", 40L, 102.0), ("C", 1L, 9.0),
  ).toDF("sym", "t", "px")
    .withColumn("qt", col("t"))

  private def joined =
    AsofJoin(trades, quotes, "sym", "t", "t", Seq("px", "qt"))
      .collect()
      .map(r => r.getLong(2) -> (Option(r.get(3)), Option(r.get(4))))
      .toMap

  test("asof join picks the latest right row at-or-before each left ts") {
    assert(joined(1L) == (Some(100.0), Some(8L)))  // 8 <= 10 < 25
    assert(joined(3L) == (Some(101.0), Some(25L))) // 25 <= 30 < 40
  }

  test("asof join is inclusive at equal timestamps") {
    assert(joined(2L) == (Some(101.0), Some(25L))) // quote AT 25 matches
  }

  test("asof join yields nulls when no right row precedes") {
    assert(joined(4L) == (None, None)) // key B has no quotes at all
  }

  test("asof join fills payload atomically: NULL payload values stay NULL") {
    // quote at t=20 has a NULL px — a matched left row must report that
    // NULL, not reach back to the older t=8 quote (row integrity)
    val quotesWithNull = Seq(
      ("A", 8L, Some(100.0), 8L), ("A", 20L, None, 20L),
    ).toDF("sym", "t", "px", "qt")
    val out = AsofJoin(
      Seq(("A", 22L, 1L)).toDF("sym", "t", "trade_id"),
      quotesWithNull, "sym", "t", "t", Seq("px", "qt"))
      .head()
    assert(out.getAs[Long]("qt") == 20L, "must match the t=20 row")
    assert(out.isNullAt(out.fieldIndex("px")),
      "NULL payload inside the matched row must stay NULL")
  }

  test("asof join keeps every left row exactly once") {
    val out = AsofJoin(trades, quotes, "sym", "t", "t", Seq("px"))
    assert(out.count() == 4)
    assert(out.columns.toSeq == Seq("sym", "t", "trade_id", "px"))
  }

  test("asof join plan is a single shuffle on the key (no join explosion)") {
    val out = AsofJoin(trades, quotes, "sym", "t", "t", Seq("px"))
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("Join"), "as-of must not use a join operator")
    // one Exchange for the union'd window sweep (plus nothing per side)
    val nExchanges = "Exchange hashpartitioning".r
      .findAllIn(physical).size
    assert(nExchanges == 1, s"expected 1 shuffle, plan:\n$physical")
  }

  test("binned range join matches brute force and avoids nested-loop plans") {
    val points = (0L to 200L).map(t => (t % 3, t)).toDF("k", "t")
    val intervals = Seq((0L, 10L, 30L, "i1"), (1L, 25L, 26L, "i2"),
      (0L, 190L, 500L, "i3"), (2L, 60L, 59L, "i4") /* empty range */ )
      .toDF("k", "lo", "hi", "ivl")

    val got = graft.operators.RangeJoin
      .binned(points, intervals, "t", "lo", "hi", binWidth = 16L, keys = Seq("k"))
      .select("ivl", "t")
    val brute = points.join(intervals, Seq("k"))
      .filter(col("t") >= col("lo") && col("t") <= col("hi"))
      .select("ivl", "t")
    assert(got.collect().toSet == brute.collect().toSet)
    assert(got.collect().nonEmpty)

    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"binned range join must plan as an equi-join, got:\n$plan")
  }

  test("connected components labels chains, cliques, and isolated vertices") {
    // chain 1-2-3-4-5 (diameter > 1 round), clique {10,11,12}, isolated 99
    val vertices = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L, 99L).toDF("id")
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (5L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("src", "dst")
    val got = graft.operators.ConnectedComponents(vertices, edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 99L -> 99L))
  }

  test("connected components: empty vertex set returns empty, no NPE") {
    val vertices = Seq.empty[Long].toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(graft.operators.ConnectedComponents(vertices, edges).count() == 0L)
  }

  test("binned range join is exact at magnitudes beyond double precision") {
    // 2^53 + small offsets: floor(v/w) in doubles would collapse
    // neighbouring values into the same rounded quotient
    val base = 1L << 53
    val points = Seq((0L, base + 1L), (0L, base + 3L)).toDF("k", "t")
    val intervals = Seq((0L, base + 2L, base + 5L, "i1")).toDF("k", "lo", "hi", "ivl")
    val got = graft.operators.RangeJoin
      .binned(points, intervals, "t", "lo", "hi", binWidth = 2L, keys = Seq("k"))
      .select("t").as[Long].collect().toSet
    assert(got == Set(base + 3L), s"got $got")
  }

  test("salted join equals the plain join and spreads a hot key") {
    // 1000 rows of one hot key + 100 spread rows
    val big = ((1 to 1000).map(_ => 7L) ++ (1L to 100L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val dim = (1L to 100L).map(i => (i, s"d$i")).toDF("k", "name")
    val salted = graft.operators.SaltedJoin(big, dim, "k", salts = 8)
    val plain = big.join(dim, "k")
    assert(salted.count() == plain.count())
    assert(salted.select("k", "v", "name").collect().toSet
      == plain.select("k", "v", "name").collect().toSet)
    // the hot key's rows must land in >1 salt bucket
    val spread = big.filter(col("k") === 7L)
      .withColumn("__salt", pmod(xxhash64(big.columns.map(col): _*), lit(8L)))
      .select("__salt").distinct().count()
    assert(spread > 1, "hot key must scatter across salts")
  }

  test("identical shuffles are planned once and reused (ReusedExchange)") {
    val facts = (1L to 5000L).map(i => (i % 40, i)).toDF("k", "v")
    val byKey = facts.groupBy("k").agg(sum("v").as("s"))
    // two consumers of the SAME aggregate → the shuffle must appear once
    val q = byKey.filter(col("s") > 100).union(byKey.filter(col("s") <= 100))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") ||
      "Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected the shuffle to be planned once:\n$plan")
  }

  test("AQE splits a skewed join partition at runtime") {
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 80% of the big side lands on key 0 → one fat shuffle partition
      val big = spark.range(0, 200000)
        .select(when(col("id") % 5 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
          col("id").as("v"))
      val other = spark.range(0, 200000).select(col("id").as("k"))
      val joined = big.join(other, "k")
      // run THIS dataset's query execution (count() would plan a new one)
      joined.collect()
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE should mark the skewed join:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("stratified sample keeps fractions and is deterministic under a seed") {
    val docs = (1L to 2000L).map(i => (i, if (i % 4 == 0) "rare" else "common"))
      .toDF("doc_id", "source")
    val fractions = Map("common" -> 0.2, "rare" -> 1.0)
    def run() = docs.stat.sampleBy("source", fractions, seed = 42L)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val got = run()
    assert(got("rare") == 500L, "fraction-1.0 stratum must be kept whole")
    assert(math.abs(got("common") - 300.0) < 90.0, s"~20% of 1500, got $got")
    assert(run() == got, "same seed must give the same sample")
  }

  test("range band join broadcasts the bands side") {
    val facts = (1 to 100).map(i => (i.toLong, i * 10.0)).toDF("id", "v")
    val bands = Seq(("lo", 0.0, 500.0), ("hi", 500.0, 1e9))
      .toDF("band", "lo", "hi")
    val out = facts.join(broadcast(bands),
      col("v") >= col("lo") && col("v") < col("hi"))
    assert(out.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    val counts = out.groupBy("band").count().as[(String, Long)].collect().toMap
    assert(counts == Map("lo" -> 49L, "hi" -> 51L))
  }

  test("fixed-point PageRank matches hand-computed longs on a star graph") {
    // star: center 0 — leaves 1,2,3; node 4 isolated. Symmetrized edges.
    val nodes = Seq(0L, 1L, 2L, 3L, 4L).toDF("id")
    val half = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val edges = half.union(half.select(col("dst").as("src"), col("src").as("dst")))
    val got = graft.operators.PageRank(nodes, edges, rounds = 2)
      .as[(Long, Long)].collect().toMap
    // round 1 from r=1e9: center gets 3 leaf contributions of r/1 each;
    // leaves get r/3 = 333333333 (floor); isolated keeps the base term.
    //   r1(0) = 150000000 + 85*3000000000/100 = 2700000000
    //   r1(leaf) = 150000000 + 85*333333333/100 = 433333333 (floor)
    //   r1(4) = 150000000
    // round 2: center sums 3×(433333333 div 1); each leaf gets
    // 2700000000 div 3 = 900000000.
    //   r2(0) = 150000000 + 85*1299999999/100 = 1254999999 (floor)
    //   r2(leaf) = 150000000 + 85*900000000/100 = 915000000
    val expected = Map(0L -> 1254999999L, 1L -> 915000000L,
      2L -> 915000000L, 3L -> 915000000L, 4L -> 150000000L)
    assert(got == expected)
  }
}
