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
}
