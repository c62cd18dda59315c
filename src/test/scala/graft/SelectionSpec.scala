package graft

import graft.ext.Selection
import org.apache.spark.sql.functions._

/** Brute-force references for the data-selection operators: DSIR weights
  * recomputed in plain Scala from first principles (hash → bucket counts →
  * smoothed log-ratio → integer micro-sum), RRF recomputed from the two
  * independent rankings.
  */
class SelectionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("featureBucket lands in [0, n) and is stable") {
    import spark.implicits._
    val out = Seq("spark", "join", "filter", "the", "zebra")
      .toDF("tok")
      .select(Selection.featureBucket(col("tok"), 64).as("b"))
      .collect().map(_.getLong(0))
    assert(out.forall(b => b >= 0 && b < 64))
    // stability pin: md5 is fixed forever, so these buckets are constants
    val again = Seq("spark", "join", "filter", "the", "zebra")
      .toDF("tok")
      .select(Selection.featureBucket(col("tok"), 64).as("b"))
      .collect().map(_.getLong(0))
    assert(out.sameElements(again))
  }

  test("dsirWeights equals the from-first-principles reference") {
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // reference: bucket via the same md5-prefix hash
    def bucket(tok: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      (java.lang.Long.parseLong(hex, 16) % 64).toInt
    }
    val counts = docs.map { case (id, text) =>
      id -> text.split(" ", -1).map(bucket).groupBy(identity)
        .map { case (b, xs) => b -> xs.length.toLong }
    }
    val (tgt, raw) = counts.partition(_._1 % 97 == 0)
    def bucketTotals(m: Map[Long, Map[Int, Long]]): Map[Int, Long] =
      m.values.flatten.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sum }
    val (ct, cs) = (bucketTotals(tgt), bucketTotals(raw))
    val nt = ct.values.sum.toDouble
    val ns = cs.values.sum.toDouble
    val lwq = (0 until 64).map { b =>
      val v = (math.log((ct.getOrElse(b, 0L) + 1.0) / (nt + 64.0)) -
        math.log((cs.getOrElse(b, 0L) + 1.0) / (ns + 64.0))) * 1000000.0
      b -> java.math.BigDecimal.valueOf(v)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    }.toMap
    val want = raw.map { case (id, bc) =>
      id -> (bc.values.sum, bc.map { case (b, c) => c * lwq(b) }.sum)
    }
    val got = Selection.dsirWeights(Tables.documents(spark, dir))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet === want.keySet)
    for ((id, (nTok, micro)) <- want) {
      val (gTok, gMicro, gLogw) = got(id)
      assert(gTok === nTok, s"doc $id n_tok")
      assert(gMicro === micro, s"doc $id score_micro")
      assert(gLogw === micro / 1000000.0, s"doc $id dsir_logw")
    }
    // sanity: the weights discriminate (not all equal) at fixture scale
    assert(got.values.map(_._2).toSet.size > 1)
  }

  test("hybridRrf equals RRF recomputed from the two rankings") {
    val terms = Seq("spark", "join", "filter")
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    val bmTop = ext.TextAnalysis.bm25(docs, terms)
      .select("doc_id", "bm25_r").orderBy(col("bm25_r").desc, col("doc_id"))
      .limit(20).collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_vec"))
    val cosTop = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"),
        ext.Similarity.cosine(col("embedding"), col("q_vec")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(20)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    val want = (bmTop.keySet ++ cosTop.keySet).toSeq.map { id =>
      val rrf = bmTop.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        cosTop.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (id, bmTop.getOrElse(id, 0L), cosTop.getOrElse(id, 0L), rrf)
    }.sortBy(t => (-t._4, t._1)).take(10).zipWithIndex
      .map { case ((id, ra, rb, rrf), i) => (i + 1L, id, ra, rb, rrf) }
    val got = Selection.hybridRrf(docs, emb, terms).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq === want.toSeq)
    // both legs must actually contribute to the fused list
    assert(got.exists(_._3 > 0) && got.exists(_._4 > 0))
  }
}
