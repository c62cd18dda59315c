package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based equivalence: each dedicated operator against a
  * brute-force reference on randomized inputs (deterministic seeds).
  * Catches the edge geometry — empty sides, timestamp ties, reversed
  * intervals, bin-boundary values — that hand-picked fixtures miss.
  */
class OperatorPropertiesSpec extends SparkSpec {
  import spark.implicits._

  import graft.operators.{AsofJoin, RangeJoin, SaltedJoin}

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default.withSize(40), Seed(seed))

  private val keyGen = Gen.chooseNum(0L, 3L)
  private val tsGen = Gen.chooseNum(0L, 60L)

  test("asof join == argmax brute force on random event sets") {
    val pairGen = Gen.listOf(Gen.zip(keyGen, tsGen))
    for (round <- 1 to 8) {
      val ls = sample(pairGen, round)
      val rsRaw = sample(pairGen, round + 100)
      val rs = rsRaw.distinct // unique (k, ts), as the operator requires
      if (ls.nonEmpty) {
        val left = ls.zipWithIndex
          .map { case ((k, t), i) => (k, t, i.toLong) }.toDF("k", "t", "lid")
        val right = rs.zipWithIndex
          .map { case ((k, t), i) => (k, t, i.toLong + 1000) }
          .toDF("k", "t", "rid")

        val got = AsofJoin(left, right, "k", "t", "t", Seq("rid"))
          .select("lid", "rid")
          .as[(Long, Option[Long])].collect().toMap

        val expected = ls.zipWithIndex.map { case ((k, t), i) =>
          val candidates = rs.zipWithIndex
            .filter { case ((rk, rt), _) => rk == k && rt <= t }
          i.toLong -> (if (candidates.isEmpty) None
                       else Some(candidates.maxBy(_._1._2)._2.toLong + 1000))
        }.toMap
        assert(got == expected, s"seed $round: $ls vs $rs")
      }
    }
  }

  test("binned range join == brute force for every bin width") {
    val pGen = Gen.listOf(Gen.zip(keyGen, tsGen))
    val iGen = Gen.listOf(Gen.zip(keyGen, tsGen, Gen.chooseNum(-5L, 20L)))
    for (round <- 1 to 8) {
      val ps = sample(pGen, round)
      val ivs = sample(iGen, round + 200)
      val width = 1L + round * 3
      if (ps.nonEmpty && ivs.nonEmpty) {
        val points = ps.zipWithIndex
          .map { case ((k, t), i) => (k, t, i.toLong) }.toDF("k", "t", "pid")
        val intervals = ivs.zipWithIndex
          .map { case ((k, lo, len), i) => (k, lo, lo + len, i.toLong) }
          .toDF("k", "lo", "hi", "iid") // len<0 → reversed interval
        val got = RangeJoin
          .binned(points, intervals, "t", "lo", "hi", width, Seq("k"))
          .select("pid", "iid").as[(Long, Long)].collect().toSet
        val expected = points.join(intervals, Seq("k"))
          .filter(col("t") >= col("lo") && col("t") <= col("hi"))
          .select("pid", "iid").as[(Long, Long)].collect().toSet
        assert(got == expected, s"seed $round width $width")
      }
    }
  }

  test("alternating large/small-star CC == min-label propagation on random graphs") {
    val nodeGen = Gen.chooseNum(0L, 30L)
    val edgeGen = Gen.listOf(Gen.zip(nodeGen, nodeGen))
    for (round <- 1 to 6) {
      val es = sample(edgeGen, round + 300)
      val vs = (0L to 30L)
      val vertices = vs.toDF("id")
      val edges = es.toDF("src", "dst")
      val viaPropagation = graft.operators.ConnectedComponents(vertices, edges)
        .as[(Long, Long)].collect().toMap
      val viaStars = graft.operators.ConnectedComponents
        .alternating(vertices, edges)
        .as[(Long, Long)].collect().toMap
      assert(viaStars == viaPropagation, s"seed ${round + 300}: $es")
    }
  }

  test("union-find fast path == distributed min-label loop on random graphs") {
    val nodeGen = Gen.chooseNum(0L, 30L)
    val edgeGen = Gen.listOf(Gen.zip(nodeGen, nodeGen))
    for (round <- 1 to 4) {
      val es = sample(edgeGen, round + 700)
      val vertices = (0L to 30L).toDF("id")
      val edges = es.toDF("src", "dst")
      // default threshold → driver union-find; threshold 0 → loop
      val viaUnionFind = graft.operators.ConnectedComponents(vertices, edges)
        .as[(Long, Long)].collect().toMap
      val viaLoop = graft.operators.ConnectedComponents(vertices, edges,
        localEdgeThreshold = 0L)
        .as[(Long, Long)].collect().toMap
      assert(viaUnionFind == viaLoop, s"seed ${round + 700}: $es")
    }
    // degenerate geometry: no edges (all isolated), and the empty graph
    val isolated = (0L to 5L).toDF("id")
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(graft.operators.ConnectedComponents(isolated, noEdges)
      .as[(Long, Long)].collect().toMap == (0L to 5L).map(v => v -> v).toMap)
    assert(graft.operators.ConnectedComponents(
      Seq.empty[Long].toDF("id"), noEdges).count() == 0)
    assert(graft.operators.ConnectedComponents(
      Seq.empty[Long].toDF("id"), noEdges, localEdgeThreshold = 0L).count() == 0)
  }

  test("alternating CC handles a long chain (large diameter)") {
    val n = 40L
    val vertices = (0L to n).toDF("id")
    val chain = (0L until n).map(i => (i, i + 1)).toDF("src", "dst")
    val got = graft.operators.ConnectedComponents.alternating(vertices, chain)
      .as[(Long, Long)].collect().toMap
    assert(got == (0L to n).map(_ -> 0L).toMap)
  }

  test("salted join == plain join for any salt count") {
    val rowsGen = Gen.listOf(Gen.zip(keyGen, Gen.chooseNum(0L, 100L)))
    for (round <- 1 to 8) {
      val rows = sample(rowsGen, round)
      val salts = 1 + round % 7
      if (rows.nonEmpty) {
        val big = rows.zipWithIndex
          .map { case ((k, v), i) => (k, v, i.toLong) }.toDF("k", "v", "rid")
        val dim = (0L to 3L).map(k => (k, s"d$k")).toDF("k", "name")
        val got = SaltedJoin(big, dim, "k", salts)
          .select("rid", "name").as[(Long, String)].collect().toSet
        val expected = big.join(dim, "k")
          .select("rid", "name").as[(Long, String)].collect().toSet
        assert(got == expected, s"seed $round salts $salts")
      }
    }
  }

  test("native quantize == Spark round-then-cast over random floats") {
    // SignedProjectionBucket.quantize must replicate Spark's
    // Round(double)+CAST(BIGINT) exactly — a one-unit divergence flips an
    // LSH projection sign and breaks the ann_lsh_md5 cross-engine oracle.
    // Mix magnitudes so both the BigDecimal tie path and large values are
    // exercised; include exact negative .5 ties explicitly.
    val gen = Gen.oneOf(
      Gen.chooseNum(-1f, 1f),
      Gen.chooseNum(-1000f, 1000f),
      Gen.chooseNum(-0.01f, 0.01f))
    val xs = (0 until 8).flatMap(r =>
      sample(Gen.listOfN(200, gen), 7000 + r)) ++
      Seq(0.0005f, -0.0005f, 2.5e-4f, -2.5e-4f, Float.MinPositiveValue,
        -Float.MinPositiveValue, 0f)
    val sparkSide = xs.toDF("x")
      .select(expr("CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)"))
      .collect().map(_.getLong(0))
    val native = xs.map(
      graft.functions.SignedProjectionBucket.quantize(_, 1000))
    assert(sparkSide.toSeq == native)
  }

  test("schema evolution == in-memory model on random add/rename/widen histories") {
    // model: every row remembers its values by LOGICAL column name at
    // write time; the unified read must equal the model projected onto
    // the final logical schema (renames re-key history, adds null-fill,
    // int->long widening changes no value)
    import graft.sources.Lake
    val colPool = Vector("a", "b", "c", "d", "e")
    for (round <- 1 to 6) {
      val rnd = new scala.util.Random(round * 7919L)
      val dir = java.nio.file.Files
        .createTempDirectory(s"evoprop$round").toString + "/t"
      // logical schema state: logical name -> generation it appeared in
      var logical = Vector("id", "a") // id is the row key, a the v1 payload
      // declared type per payload column; int columns may WIDEN to long
      var types = Map("id" -> "long", "a" -> "int")
      var model = Vector.empty[Map[String, Long]] // logical name -> value
      var nextId = 0L
      var gen = 0
      while (gen < 4) {
        gen += 1
        // mutate schema after v1: maybe rename one payload column, maybe
        // widen an int column, maybe add a fresh one (names never reused —
        // retirement is permanent)
        var renames = Map.empty[String, String]
        if (gen > 1 && rnd.nextBoolean()) {
          val from = logical.drop(1)(rnd.nextInt(logical.size - 1))
          val to = from + s"_r$gen"
          renames = Map(from -> to)
          // re-key HISTORY: old rows' values now live under the new name
          model = model.map(m => m.get(from).fold(m)(v => m - from + (to -> v)))
          logical = logical.map(c => if (c == from) to else c)
          types = types - from + (to -> types(from))
        }
        if (gen > 1 && rnd.nextBoolean()) {
          val ints = logical.filter(c => types(c) == "int")
          if (ints.nonEmpty)
            types += ints(rnd.nextInt(ints.size)) -> "long"
        }
        if (logical.size - 1 < colPool.size && rnd.nextBoolean()) {
          val fresh = colPool(logical.size - 1) + s"_g$gen"
          logical = logical :+ fresh
          types += fresh -> (if (rnd.nextBoolean()) "int" else "long")
        }
        val rows = (0 until (1 + rnd.nextInt(4))).map { _ =>
          val id = nextId; nextId += 1
          logical.map(c => c -> (if (c == "id") id else rnd.nextLong(1000L)))
            .toMap
        }
        model = model ++ rows
        val df = rows.map(r => org.apache.spark.sql.Row.fromSeq(
          logical.map(c =>
            if (types(c) == "int") r(c).toInt else r(c))))
        val schema = org.apache.spark.sql.types.StructType(logical.map(c =>
          org.apache.spark.sql.types.StructField(c,
            if (types(c) == "int") org.apache.spark.sql.types.IntegerType
            else org.apache.spark.sql.types.LongType)))
        Lake.writeEvolving(spark,
          spark.createDataFrame(
            spark.sparkContext.parallelize(df, 1), schema),
          dir, renames)
      }
      val got = Lake.readEvolving(spark, dir).orderBy("id").collect()
        .map(r => logical.map(c =>
          if (r.isNullAt(r.fieldIndex(c))) None
          else Some(r.getAs[Number](r.fieldIndex(c)).longValue)))
        .toSeq
      val want = model.sortBy(_("id"))
        .map(m => logical.map(m.get))
      assert(got == want, s"round $round diverged from the model")
    }
  }

  test("degree-oriented triangle count == brute-force triple enumeration") {
    import graft.operators.Graph
    val edgeGen = Gen.listOf(Gen.zip(Gen.chooseNum(0L, 11L), Gen.chooseNum(0L, 11L)))
    for (round <- 1 to 8) {
      // random undirected edges in id-canonical (a < b) distinct form —
      // small id domain forces heavy degree skew and plenty of ties
      val edges = sample(edgeGen, round * 31L)
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      if (edges.nonEmpty) {
        val df = edges.toDF("a", "b")
        val Array(nE, nN, nT) =
          Graph.triangleCount(df).as[(Long, Long, Long)].head() match {
            case (e, n, t) => Array(e, n, t)
          }
        val es = edges.toSet
        val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
        val want = (for {
          i <- nodes; j <- nodes if i < j; k <- nodes if j < k
          if es((i, j)) && es((j, k)) && es((i, k))
        } yield 1).size.toLong
        assert(nE == edges.size && nN == nodes.size,
          s"round $round: edges/nodes $nE/$nN vs ${edges.size}/${nodes.size}")
        assert(nT == want, s"round $round: $nT triangles, brute force $want")
      }
    }
  }

  test("synchronous label propagation == brute-force round simulation") {
    import graft.operators.Graph
    val edgeGen = Gen.listOf(Gen.zip(Gen.chooseNum(0L, 11L), Gen.chooseNum(0L, 11L)))
    for (round <- 1 to 6) {
      val edges = sample(edgeGen, round * 53L)
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      val nodes = (0L to 11L).toSeq
      val sym = edges ++ edges.map(_.swap)
      val rounds = 3
      // brute-force synchronous simulation: most frequent neighbor label,
      // ties to the SMALLEST label; isolated nodes keep their own
      var model = nodes.map(n => n -> n).toMap
      for (_ <- 1 to rounds) {
        val next = nodes.map { n =>
          val neigh = sym.collect { case (s, d) if s == n => model(d) }
          if (neigh.isEmpty) n -> model(n)
          else {
            val freq = neigh.groupBy(identity).map { case (l, xs) => (l, xs.size) }
            val bestCount = freq.values.max
            n -> freq.collect { case (l, c) if c == bestCount => l }.min
          }
        }.toMap
        model = next
      }
      val got = Graph.labelPropagation(
        nodes.toDF("id"),
        if (sym.isEmpty) Seq.empty[(Long, Long)].toDF("src", "dst")
        else sym.toDF("src", "dst"),
        rounds)
        .as[(Long, Long)].collect().toMap
      assert(got == model, s"round $round: $got vs model $model")
    }
  }

  test("bucket-pruned 3-D skyline == brute-force dominance filter") {
    import graft.operators.Graph
    val rowGen = Gen.listOf(Gen.zip(
      Gen.chooseNum(0L, 30000L), Gen.chooseNum(0L, 6L), Gen.chooseNum(0L, 6L)))
    for (round <- 1 to 8) {
      // small sz/q domains force equal-coordinate ties (incomparable
      // duplicates must BOTH survive); cents spans several buckets
      val rows = sample(rowGen, round * 17L).zipWithIndex
        .map { case ((c, z, q), i) => (i.toLong, c, z, q) }
      if (rows.nonEmpty) {
        val got = Graph.skyline3d(rows.toDF("id", "cents", "sz", "q"))
          .select("id").as[Long].collect().toSet
        val want = rows.filter { case (_, c, z, q) =>
          !rows.exists { case (_, c2, z2, q2) =>
            c2 <= c && z2 >= z && q2 >= q && (c2 < c || z2 > z || q2 > q)
          }
        }.map(_._1).toSet
        assert(got == want,
          s"round $round: skyline ${got.toSeq.sorted} vs ${want.toSeq.sorted}")
      }
    }
  }
}
