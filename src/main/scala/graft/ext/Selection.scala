package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-SELECTION operators for a training-data pipeline: importance
  * weighting of raw corpus documents against a small target distribution
  * (the DSIR recipe — Xie et al. 2023, "Data Selection for Language Models
  * via Importance Resampling": hashed n-gram bag-of-features LMs for
  * target and raw, per-doc log importance weight = Σ count·(ln p_target −
  * ln p_raw)), and hybrid retrieval via reciprocal-rank fusion (Cormack et
  * al. 2009) of a BM25 keyword ranking with an embedding-cosine ranking.
  *
  * Scale design (100 TB): DSIR's feature space is a FIXED 64-bucket hash
  * table, so both LMs reduce to 64-row aggregates that broadcast; the
  * corpus pays ONE tokenize pass into a persisted (doc, bucket, count)
  * table (≤ 64 rows/doc — this is the table a real pipeline materializes
  * once and reuses across target distributions), and scoring is a
  * broadcast join + per-doc sum with map-side partials. RRF fuses two
  * ALREADY-TRUNCATED top-k lists (each produced by its own scale path:
  * TakeOrderedAndProject for BM25, brute/IVF top-k for vectors), so the
  * fusion join is k-row-sized no matter the corpus.
  *
  * Cross-engine doctrine: feature hashing is md5-based (identical in both
  * engines, the doc_rolling_fp pattern); the only float math is the 64
  * per-BUCKET weights, each quantized to integer micro-units once —
  * per-doc scores are then EXACT integer sums (no corpus-sized float
  * accumulation anywhere, unlike a naive Σ ln p implementation), and the
  * final double is one exact-operand division. RRF terms are 1/(60+rank)
  * over exact integer ranks — IEEE-identical cross-engine.
  */
object Selection {

  /** md5-derived feature bucket in [0, nBuckets): first 12 hex chars of
    * md5(token) parsed as an integer (< 2^48, exact) mod nBuckets — the
    * cross-engine hash pattern proven in doc_rolling_fp/dedup_minhash_md5.
    */
  def featureBucket(tok: Column, nBuckets: Int): Column =
    pmod(conv(substring(md5(tok), 1, 12), 16, 10).cast("long"),
      lit(nBuckets.toLong))

  /** DSIR importance weights: per-document log importance weight of the
    * RAW slice (doc_id % 97 != 0) against the TARGET slice (doc_id % 97
    * == 0 — the same held-out-benchmark convention as doc_decontam /
    * emb_decontam). Laplace-smoothed unigram bucket LMs; returns
    * (doc_id, n_tok, score_micro, dsir_logw) per raw doc.
    */
  def dsirWeights(docs: DataFrame, nBuckets: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    val isTarget = col("doc_id") % 97 === 0
    // ONE corpus tokenize pass into the compact (doc, bucket, count)
    // feature table; persisted because target LM, raw LM, totals, and the
    // scoring join all consume it (the simhash `groups` discipline — at
    // 100 TB this is the materialized feature table). Persist with no
    // unpersist is deliberate (the Graph.triangleCount lifecycle): the
    // returned frame is lazy, so the cache must outlive this call;
    // entries are (doc, bucket≤64)-grain and LRU-evicted, so repeated
    // bench invocations are bounded by the storage pool, not the count.
    val dbc = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), featureBucket(col("tok"), nBuckets).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .persist()
    val tb = dbc.filter(isTarget).groupBy("b").agg(sum("c").as("ct"))
    val sb = dbc.filter(!isTarget).groupBy("b").agg(sum("c").as("cs"))
    val tot = dbc.filter(isTarget).agg(sum("c").as("nt"))
      .crossJoin(dbc.filter(!isTarget).agg(sum("c").as("ns")))
    // 64 per-bucket weights, each quantized ONCE to integer micro-units:
    // the per-doc accumulation below is then exact integer arithmetic —
    // the ln last-ulp hazard is confined to 64 constants instead of a
    // corpus-sized float sum (same literals both engines, never pre-folded)
    val w = spark.range(0, nBuckets.toLong).toDF("b")
      .join(tb, Seq("b"), "left").join(sb, Seq("b"), "left").crossJoin(tot)
      .select(col("b"),
        round((log((coalesce(col("ct"), lit(0L)) + lit(1.0)) /
                   (col("nt") + lit(nBuckets.toDouble))) -
               log((coalesce(col("cs"), lit(0L)) + lit(1.0)) /
                   (col("ns") + lit(nBuckets.toDouble)))) * lit(1000000.0))
          .cast("long").as("lwq"))
    dbc.filter(!isTarget)
      .join(broadcast(w), Seq("b"))
      .groupBy("doc_id")
      .agg(sum(col("c")).cast("long").as("n_tok"),
        sum(col("c") * col("lwq")).cast("long").as("score_micro"))
      // one exact-operand division → bit-identical cross-engine; 0 micro
      // → +0.0 in both (integer zero has no sign bit)
      .withColumn("dsir_logw", col("score_micro") / lit(1000000.0))
      .orderBy("doc_id")
  }

  /** Reciprocal-rank fusion of a BM25 keyword ranking and an embedding-
    * cosine ranking (doc i's vector is embeddings.vec_id = i — the fixture
    * convention). Each list is truncated to `kTrunc` by its OWN scale path
    * (TakeOrderedAndProject / brute top-k with the query broadcast) before
    * the k-row fusion join; rrf = 1/(60+rank_bm25) + 1/(60+rank_cos) with
    * absent ranks contributing 0.
    */
  def hybridRrf(docs: DataFrame, emb: DataFrame, terms: Seq[String],
      queryVecId: Long = 0L, kTrunc: Int = 20, kOut: Int = 10): DataFrame = {
    // BM25 leg: rank on the ROUNDED score (raw ln-derived doubles can
    // differ in the last ulp cross-engine; bm25_r at 4dp + doc_id ties is
    // the deterministic key — the doc_bm25 doctrine)
    val bmTop = TextAnalysis.bm25(docs, terms)
      .select(col("doc_id"), col("bm25_r"))
      .orderBy(col("bm25_r").desc, col("doc_id"))
      .limit(kTrunc)
    val rankA = bmTop.withColumn("rank_a",
      row_number().over(Window.orderBy(col("bm25_r").desc, col("doc_id")))
        .cast("long"))
    // cosine leg: raw-double ranking with vec_id ties — bit-identical
    // cross-engine (the ann_topk doctrine: both engines fold the same
    // element sequence)
    val q = emb.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_vec"))
    val cosTop = emb.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        Similarity.cosine(col("embedding"), col("q_vec")).as("cos"))
      .orderBy(col("cos").desc, col("doc_id"))
      .limit(kTrunc)
    val rankB = cosTop.withColumn("rank_b",
      row_number().over(Window.orderBy(col("cos").desc, col("doc_id")))
        .cast("long"))
    val fused = rankA.select("doc_id", "rank_a")
      .join(rankB.select("doc_id", "rank_b"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("rank_a"), lit(0L)).as("rank_bm25"),
        coalesce(col("rank_b"), lit(0L)).as("rank_cos"),
        (coalesce(lit(1.0) / (lit(60) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("rank_b")), lit(0.0))).as("rrf"))
    fused
      .withColumn("fused_rank",
        row_number().over(Window.orderBy(col("rrf").desc, col("doc_id")))
          .cast("long"))
      .filter(col("fused_rank") <= kOut)
      .select("fused_rank", "doc_id", "rank_bm25", "rank_cos", "rrf")
      .orderBy("fused_rank")
  }

  /** 12-hex-char md5 prefix parsed as a BIGINT in DuckDB (exact, < 2^48)
    * — the doc_rolling_fp idiom. */
  private def md5Int12Sql(expr: String): String =
    s"""CAST(list_sum(list_transform(generate_series(1, 12),
       |           i -> (strpos('0123456789abcdef', substr(md5($expr), i, 1)) - 1)
       |                * (CAST(1 AS BIGINT) << (4 * (12 - i))))) AS BIGINT)""".stripMargin

  private val cosSql =
    """list_sum(list_transform(list_zip(CAST(e.embedding AS DOUBLE[]), q.qe),
      |             z -> z[1] * z[2]))
      |           / (sqrt(list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x * x)))
      |              * sqrt(list_sum(list_transform(q.qe, x -> x * x))))""".stripMargin

  val all: Seq[QueryDef] = Seq(
    // DSIR importance weights over the documents corpus: target = the
    // doc_id % 97 benchmark slice, raw = everything else.
    QueryDef(
      "doc_dsir_weight",
      (sp, dir) => dsirWeights(Tables.documents(sp, dir)),
      Some(
        s"""WITH toks AS (
           |  SELECT doc_id, ${md5Int12Sql("tok")} % 64 AS b
           |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           |        FROM documents)),
           |dbc AS (SELECT doc_id, b, count(*) AS c FROM toks GROUP BY 1, 2),
           |tb AS (SELECT b, sum(c) AS ct FROM dbc WHERE doc_id % 97 = 0 GROUP BY b),
           |sb AS (SELECT b, sum(c) AS cs FROM dbc WHERE doc_id % 97 <> 0 GROUP BY b),
           |tot AS (SELECT (SELECT sum(c) FROM dbc WHERE doc_id % 97 = 0) AS nt,
           |               (SELECT sum(c) FROM dbc WHERE doc_id % 97 <> 0) AS ns),
           |w AS (
           |  SELECT gs.b,
           |         CAST(round((ln((coalesce(ct, 0) + 1.0) / (nt + 64.0))
           |                   - ln((coalesce(cs, 0) + 1.0) / (ns + 64.0)))
           |                    * 1000000.0) AS BIGINT) AS lwq
           |  FROM (SELECT unnest(generate_series(0, 63)) AS b) gs
           |  LEFT JOIN tb ON tb.b = gs.b
           |  LEFT JOIN sb ON sb.b = gs.b
           |  CROSS JOIN tot)
           |SELECT d.doc_id, CAST(sum(d.c) AS BIGINT) AS n_tok,
           |       CAST(sum(d.c * w.lwq) AS BIGINT) AS score_micro,
           |       CAST(sum(d.c * w.lwq) AS BIGINT) / 1000000.0 AS dsir_logw
           |FROM dbc d JOIN w ON w.b = d.b
           |WHERE d.doc_id % 97 <> 0
           |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin),
    ),
    // Hybrid retrieval: RRF of BM25 ('spark','join','filter' — the
    // doc_bm25 query) with cosine-to-vector-0.
    QueryDef(
      "doc_hybrid_rrf",
      (sp, dir) => hybridRrf(Tables.documents(sp, dir),
        Tables.embeddings(sp, dir), Seq("spark", "join", "filter")),
      Some(
        s"""WITH f AS (
           |  SELECT doc_id,
           |         len(string_split(text, ' ')) AS dl,
           |         len(list_filter(string_split(text, ' '), x -> x = 'spark')) AS tf_spark,
           |         len(list_filter(string_split(text, ' '), x -> x = 'join')) AS tf_join,
           |         len(list_filter(string_split(text, ' '), x -> x = 'filter')) AS tf_filter
           |  FROM documents),
           |s AS (
           |  SELECT count(*) AS n_docs, sum(dl) AS sum_dl,
           |         sum(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS df_spark,
           |         sum(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END) AS df_join,
           |         sum(CASE WHEN tf_filter > 0 THEN 1 ELSE 0 END) AS df_filter
           |  FROM f),
           |bm AS (
           |  SELECT doc_id,
           |         round(
           |           ln(1.0 + (n_docs - df_spark + 0.5) / (df_spark + 0.5)) *
           |             (tf_spark * 2.2) /
           |             (tf_spark + 1.2 * (0.25 + 0.75 * (dl / (sum_dl * 1.0 / n_docs)))) +
           |           ln(1.0 + (n_docs - df_join + 0.5) / (df_join + 0.5)) *
           |             (tf_join * 2.2) /
           |             (tf_join + 1.2 * (0.25 + 0.75 * (dl / (sum_dl * 1.0 / n_docs)))) +
           |           ln(1.0 + (n_docs - df_filter + 0.5) / (df_filter + 0.5)) *
           |             (tf_filter * 2.2) /
           |             (tf_filter + 1.2 * (0.25 + 0.75 * (dl / (sum_dl * 1.0 / n_docs)))), 4)
           |           + 0.0 AS bm25_r
           |  FROM f, s
           |  WHERE tf_spark > 0 OR tf_join > 0 OR tf_filter > 0),
           |ra AS (
           |  SELECT doc_id,
           |         row_number() OVER (ORDER BY bm25_r DESC, doc_id) AS rank_a
           |  FROM bm ORDER BY bm25_r DESC, doc_id LIMIT 20),
           |rb AS (
           |  SELECT e.vec_id AS doc_id,
           |         row_number() OVER (ORDER BY $cosSql DESC, e.vec_id) AS rank_b
           |  FROM embeddings e,
           |       (SELECT CAST(embedding AS DOUBLE[]) qe
           |        FROM embeddings WHERE vec_id = 0) q
           |  WHERE e.vec_id <> 0
           |  ORDER BY $cosSql DESC, e.vec_id LIMIT 20),
           |fused AS (
           |  SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id,
           |         CAST(coalesce(rank_a, 0) AS BIGINT) AS rank_bm25,
           |         CAST(coalesce(rank_b, 0) AS BIGINT) AS rank_cos,
           |         coalesce(CAST(1 AS DOUBLE) / (60 + rank_a), 0.0)
           |           + coalesce(CAST(1 AS DOUBLE) / (60 + rank_b), 0.0) AS rrf
           |  FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id)
           |SELECT CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT)
           |         AS fused_rank,
           |       doc_id, rank_bm25, rank_cos, rrf
           |FROM fused
           |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin),
    ),
  )
}
