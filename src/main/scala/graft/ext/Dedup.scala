package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline (tier C):
  * exact (hash-groupBy), MinHash+LSH banding, SimHash, n-gram Jaccard.
  *
  * Scale design (100 TB):
  *  - exact dedup shuffles a 16-byte md5, never the document body;
  *  - MinHash: per-row signature computation is narrow (no shuffle); the
  *    only shuffle is the (band, bandHash) bucket join, whose keys are
  *    uniform by construction (hash values) → no skew;
  *  - candidate verification joins the (small) candidate-pair set back to
  *    the shingle sets — proportional to candidates, not to |corpus|²;
  *  - SimHash chunk-banding finds hamming<=k pairs without an all-pairs
  *    scan (pigeonhole: any pair within k=3 of 64 bits shares one of 4
  *    16-bit chunks exactly).
  */
object Dedup {

  /** Exact dedup: group on md5(text). Returns one row per distinct content
    * with the representative (min) doc_id and the copy count.
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies", "fp")

  /** MinHash signature of a shingle array: k independent min-hashes via
    * seeded xxhash64.
    *
    * Built as a SINGLE traversal of the shingle array (fold with a k-lane
    * accumulator). Higher-order functions are interpreted (no codegen), and
    * Catalyst's projection collapse inlines the shingle expression into
    * every consumer — a per-lane `transform` would re-evaluate the shingle
    * array k times (observed: minutes/row at k=64). The fold keeps it
    * linear: one pass, k hashes + k mins per element.
    */
  def minhashSig(shingleCol: Column, k: Int): Column =
    aggregate(
      shingleCol,
      array_repeat(lit(Long.MaxValue), k),
      (acc, s) => zip_with(acc,
        transform(sequence(lit(0), lit(k - 1)), i => xxhash64(s, i)),
        (a, b) => least(a, b)),
    )

  /** LSH banding: explode the signature into (band, bandHash) keys.
    * Equal bandHash in any band → candidate pair.
    */
  def lshBands(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"), xxhash64(slice(sig, b * rows + 1, lit(rows))).as("band_hash")))

  /** Full MinHash/LSH near-dup pipeline: returns candidate pairs with their
    * EXACT shingle-set Jaccard, filtered at `threshold`.
    * k = bands*rowsPerBand signature length; with 8 bands × 8 rows the
    * S-curve midpoint sits near j ≈ (1/8)^(1/8) ≈ 0.77 — deliberately high
    * because this corpus is globally similar (tiny shared vocabulary), so a
    * looser curve would flood the verification join with candidates.
    */
  def minhashDedup(docs: DataFrame, n: Int = 3, bands: Int = 8,
      rowsPerBand: Int = 8, threshold: Double = 0.7): DataFrame = {
    val withShingles = docs
      .select(col("doc_id"), array_distinct(TextAnalysis.shingles(col("text"), n)).as("sh"))
      .filter(size(col("sh")) > 0)
    val sigs = withShingles
      .select(col("doc_id"), col("sh"),
        lshBands(minhashSig(col("sh"), bands * rowsPerBand), bands, rowsPerBand).as("bands"))
    val buckets = sigs
      .select(col("doc_id"), explode(col("bands")).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.band_hash").as("band_hash"))
    val candidates = buckets.as("x")
      .join(buckets.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    val sh = withShingles
    candidates
      .join(sh.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), Seq("a_id"))
      .join(sh.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), Seq("b_id"))
      .withColumn("n_inter", size(array_intersect(col("a_sh"), col("b_sh"))))
      .withColumn("jaccard",
        col("n_inter") * 1.0 / (size(col("a_sh")) + size(col("b_sh")) - col("n_inter")))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** 64-bit SimHash over word n-gram hashes: bit j of the signature is the
    * majority vote of bit j across all shingle hashes. Single traversal
    * (same interpreted-eval reasoning as [[minhashSig]]): fold the shingles
    * into 64 per-bit counters, then assemble the fingerprint.
    */
  def simhash(shingleCol: Column): Column = {
    val bitCounts = aggregate(
      shingleCol,
      array_repeat(lit(0L), 64),
      (acc, s) => {
        val h = xxhash64(s)
        zip_with(acc, sequence(lit(0), lit(63)),
          (c, j) => c + call_function("shiftright", h, j.cast("int")).bitwiseAND(1L))
      },
    )
    val nsh = size(shingleCol)
    aggregate(
      zip_with(bitCounts, sequence(lit(0), lit(63)),
        (c, j) => when(c * 2 > nsh, call_function("shiftleft", lit(1L), j.cast("int"))).otherwise(0L)),
      lit(0L),
      (acc, v) => acc + v,
    )
  }

  /** SimHash near-dup pairs with hamming distance <= maxDist, found by
    * banding the 64-bit fingerprint into 4 exact-match 16-bit chunks
    * (complete for maxDist <= 3 by pigeonhole).
    */
  def simhashDedup(docs: DataFrame, n: Int = 3, maxDist: Int = 3): DataFrame = {
    val fps = docs
      .select(col("doc_id"), TextAnalysis.shingles(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), simhash(col("sh")).as("fp"))
    val chunks = fps.select(col("doc_id"), col("fp"),
        explode(transform(sequence(lit(0), lit(3)),
          c => struct(c.as("chunk"),
            call_function("shiftright", col("fp"), c.cast("int") * 16).bitwiseAND(0xFFFFL).as("chunk_val")))).as("c"))
      .select(col("doc_id"), col("fp"), col("c.chunk").as("chunk"), col("c.chunk_val").as("chunk_val"))
    chunks.as("x")
      .join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") &&
          col("x.chunk_val") === col("y.chunk_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        col("x.fp").as("a_fp"), col("y.fp").as("b_fp"))
      .distinct()
      .withColumn("hamming", bit_count(col("a_fp").bitwiseXOR(col("b_fp"))))
      .filter(col("hamming") <= maxDist)
      .select("a_id", "b_id", "hamming")
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "dedup_exact",
      (sp, dir) => exact(Tables.documents(sp, dir)).orderBy("doc_id"),
      Some(
        """SELECT min(doc_id) AS doc_id, count(*) AS n_copies, md5(text) AS fp
          |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin),
    ),
    // Word-SET Jaccard over a deterministic doc sample — oracle-checkable
    // twin of the shingle-set verification step (exact integer set sizes,
    // exact-division ratio).
    QueryDef(
      "dedup_ngram_jaccard",
      (sp, dir) => {
        val s = Tables.documents(sp, dir)
          .filter(col("doc_id") % 50 === 0)
          .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("w"))
        s.as("a").join(s.as("b"), col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
            size(array_intersect(col("a.w"), col("b.w"))).as("n_inter"),
            size(col("a.w")).as("n_a"), size(col("b.w")).as("n_b"))
          .withColumn("jaccard",
            col("n_inter") * 1.0 / (col("n_a") + col("n_b") - col("n_inter")))
          .select("a_id", "b_id", "n_inter", "jaccard")
          .orderBy("a_id", "b_id")
      },
      Some(
        """WITH s AS (
          |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS w
          |  FROM documents WHERE doc_id % 50 = 0)
          |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          |       len(list_intersect(a.w, b.w)) AS n_inter,
          |       len(list_intersect(a.w, b.w)) * 1.0
          |         / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) AS jaccard
          |FROM s a, s b WHERE a.doc_id < b.doc_id
          |ORDER BY a_id, b_id""".stripMargin),
    ),
    QueryDef(
      "dedup_minhash",
      (sp, dir) =>
        minhashDedup(Tables.documents(sp, dir)).orderBy("a_id", "b_id"),
      None, // xxhash64-based LSH; verified by ScalaTest with planted dups
    ),
    QueryDef(
      "dedup_simhash",
      (sp, dir) =>
        simhashDedup(Tables.documents(sp, dir)).orderBy("a_id", "b_id"),
      None, // xxhash64-based; verified by ScalaTest with planted dups
    ),
  )
}
