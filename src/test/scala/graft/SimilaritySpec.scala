package graft

import graft.ext.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine matches hand-computed values") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 0.0f), Array(1.0f, 1.0f), 1.0 / math.sqrt(2)),
      (Array(1.0f, 2.0f), Array(-1.0f, -2.0f), -1.0),
    ).toDF("a", "b", "expected")
    val bad = df.filter(abs(Similarity.cosine(col("a"), col("b")) - col("expected")) > 1e-12)
    assert(bad.isEmpty)
  }

  // Two tight clusters around orthogonal directions + noise dimension.
  private def clustered = {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 40).map { i =>
      val centre = if (i % 2 == 0) Array(10f, 0f, 0f, 0f) else Array(0f, 10f, 0f, 0f)
      val v = centre.map(c => c + rnd.nextFloat() * 0.5f)
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("brute-force topK ranks same-cluster vectors first") {
    val emb = clustered
    val top = Similarity.topK(emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding", 5)
      .select("vec_id").as[Long].collect()
    assert(top.forall(_ % 2 == 0)) // all neighbours from the even cluster
  }

  test("LSH topK achieves high recall vs brute force on clustered data") {
    val emb = clustered
    val queries = emb.filter(col("vec_id") < 4)
    val exact = Similarity.topK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5, nBits = 8)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall too low")
  }

  test("lsh signatures are deterministic across evaluations") {
    val emb = clustered
    val s1 = emb.select(col("vec_id"), Similarity.lshSignature(col("embedding"), 12).as("sig"))
      .as[(Long, Long)].collect().toMap
    val s2 = emb.select(col("vec_id"), Similarity.lshSignature(col("embedding"), 12).as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(s1 == s2)
  }

  test("semDedup marks everything but one keeper per pure cluster as dup") {
    // `clustered` alternates two orthogonal directions, so centroids
    // 0..6 (ceil(sqrt(40)) = 7) split by parity and every cluster is
    // direction-pure: within a cluster all pairwise cosines are ~1
    // (>= 0.3), across directions ~0 — so each nonempty cluster keeps
    // exactly its min-id member and marks the rest duplicates.
    val stats = Similarity.semDedup(clustered)
      .as[(Long, Long, Long)].collect()
    assert(stats.map(_._2).sum == 40) // every vector lands in a cluster
    stats.foreach { case (cid, nVecs, nDups) =>
      assert(nDups == nVecs - 1, s"cluster $cid: $nDups dups of $nVecs")
    }
    // clusters are direction-pure: even centroids hold even vec counts
    // on both sides, so at least the two directions stay separated
    assert(stats.length >= 2 && stats.length <= 7)
  }

  test("corr_stats aggregate equals the declarative quantized sums exactly") {
    // the emb_corr_matrix row rides CorrSufficientStats; this pins the
    // native update/merge loop (incl. half-away-from-zero quantization,
    // triangle layout, lazy allocation, partial merge across partitions)
    // bit-equal to the posexplode + hash-aggregate formulation of the
    // same integers — negative values exercise the rounding tie rule
    val emb = clustered.select(col("vec_id"),
      transform(col("embedding"), x => x * 0.013f - lit(0.031f)).as("embedding"))
      .repartition(5) // several partitions → real partial merges
    val s = emb.agg(graft.functions.SketchFunctions
        .corr_stats(col("embedding"), 10000).as("s"))
      .head.getSeq[Long](0)
    val d = s(1).toInt
    assert(d == 4 && s(0) == 40)
    val q = (x: org.apache.spark.sql.Column) =>
      round(x.cast("double") * 10000).cast("long")
    val ex = emb.select(col("embedding"),
        posexplode(col("embedding")).as(Seq("pi", "xi")))
      .select(col("pi"), q(col("xi")).as("qi"),
        posexplode(col("embedding")).as(Seq("pj", "xj")))
      .select(col("pi"), col("pj"), col("qi"), q(col("xj")).as("qj"))
    val dims = ex.filter(col("pi") === col("pj")).groupBy("pi")
      .agg(sum("qi").as("sx"), sum(col("qi") * col("qi")).as("sxx"))
      .orderBy("pi").as[(Int, Long, Long)].collect()
    dims.zipWithIndex.foreach { case ((_, sx, sxx), i) =>
      assert(s(2 + i) == sx, s"sx($i): ${s(2 + i)} != $sx")
      assert(s(2 + d + i) == sxx, s"sxx($i): ${s(2 + d + i)} != $sxx")
    }
    val pairs = ex.filter(col("pi") < col("pj")).groupBy("pi", "pj")
      .agg(sum(col("qi") * col("qj")).as("sxy"))
      .orderBy("pi", "pj").as[(Int, Int, Long)].collect()
    pairs.foreach { case (i, j, sxy) =>
      val idx = 2 + 2 * d + i * d - i * (i + 1) / 2 + (j - i - 1)
      assert(s(idx) == sxy, s"sxy($i,$j): ${s(idx)} != $sxy")
    }
  }
}
