package graft

import graft.ext.{Dedup, TextAnalysis}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** The native expressions must reproduce the HOF formulations EXACTLY —
  * they are drop-in hot-path replacements, and dedup output must not
  * depend on which implementation a plan picked.
  */
class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "a b"),                 // shorter than shingle width
    (4L, "x y z x y z x y z"),   // repeated shingles (distinct matters)
    (5L, ""),
  ).toDF("doc_id", "text")

  test("word_shingles == HOF shingles (ordered, with duplicates)") {
    val cmp = docs.select(
      TextFunctions.word_shingles(col("text"), 3).as("native"),
      TextAnalysis.shingles(col("text"), 3).as("hof"))
    assert(cmp.filter(col("native") =!= col("hof")).isEmpty)
  }

  test("word_shingles distinct == array_distinct(HOF shingles)") {
    val cmp = docs.select(
      TextFunctions.word_shingles(col("text"), 3, distinct = true).as("native"),
      array_distinct(TextAnalysis.shingles(col("text"), 3)).as("hof"))
    assert(cmp.filter(col("native") =!= col("hof")).isEmpty)
  }

  test("char_ngrams == HOF trigramsOf") {
    val cmp = docs.select(
      TextFunctions.char_ngrams(col("text"), 3).as("native"),
      TextAnalysis.trigramsOf(col("text")).as("hof"))
    assert(cmp.filter(col("native") =!= col("hof")).isEmpty)
  }

  test("minhash_sig == HOF minhashSig") {
    val sh = docs.select(col("doc_id"),
      TextFunctions.word_shingles(col("text"), 2, distinct = true).as("sh"))
    val cmp = sh.select(
      TextFunctions.minhash_sig(col("sh"), 64).as("native"),
      Dedup.minhashSig(col("sh"), 64).as("hof"))
    assert(cmp.filter(col("native") =!= col("hof")).isEmpty)
  }

  test("simhash64 == HOF simhash") {
    val sh = docs.filter(length(col("text")) > 3).select(col("doc_id"),
      TextFunctions.word_shingles(col("text"), 2).as("sh"))
    val cmp = sh.select(
      TextFunctions.simhash64(col("sh")).as("native"),
      Dedup.simhash(col("sh")).as("hof"))
    assert(cmp.filter(col("native") =!= col("hof")).isEmpty)
  }

  test("signature chain codegens (no CodegenFallback stage break)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    // generate() throws on Janino failure — guards the generated call sites
    val s = BoundReference(0, StringType, nullable = false)
    val sh = graft.functions.WordShingles(s, 2, distinct = true)
    val proj = GenerateUnsafeProjection.generate(Seq(
      graft.functions.MinHashSignature(sh, 8),
      graft.functions.SimHash64(sh),
      graft.functions.CharNGrams(s, 3)))
    val out = proj(InternalRow(UTF8String.fromString("a b c a b")))
    assert(out.getArray(0).numElements() == 8)
    assert(out.getArray(2).numElements() > 0)
    // and the whole dedup signature projection stays in a fused stage
    // (range source: a local relation would be constant-folded before
    // planning and never produce a codegen stage at all)
    val range = spark.range(50).select(col("id").as("doc_id"),
      concat_ws(" ", lit("alpha beta"), col("id").cast("string"),
        lit("gamma delta")).as("text"))
    val df = range.select(col("doc_id"),
      TextFunctions.minhash_sig(
        TextFunctions.word_shingles(col("text"), 3, distinct = true), 64).as("sig"),
      TextFunctions.simhash64(TextFunctions.word_shingles(col("text"), 3)).as("fp"))
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("*("), // "*(n)" marks a WholeStageCodegen span
      s"signature projection fell out of codegen:\n${executed.take(600)}")
  }

  test("near-dup docs differ in few simhash bits, unrelated in many") {
    val sh = docs.filter(col("doc_id") <= 2).select(col("doc_id"),
      TextFunctions.simhash64(TextFunctions.word_shingles(col("text"), 3)).as("fp"))
      .as[(Long, Long)].collect().toMap
    val hamming = java.lang.Long.bitCount(sh(1L) ^ sh(2L))
    assert(hamming <= 16, s"near-dups should be close, hamming=$hamming")
  }

  test("word_shingle_hashes == xxhash64 over word_shingles (both modes)") {
    for (distinct <- Seq(false, true)) {
      val df = docs.select(
        TextFunctions.word_shingle_hashes(col("text"), 3, distinct).as("native"),
        transform(TextFunctions.word_shingles(col("text"), 3, distinct),
          s => xxhash64(s)).as("hof"))
      assert(df.filter(col("native") =!= col("hof")).isEmpty,
        s"distinct=$distinct")
    }
  }

  test("minhash_md5_lanes == per-lane min of md5(lane:shingle) strings") {
    // the Catalyst chain the cross-engine queries previously exploded:
    // lane element i must equal min(md5(concat_ws(":", i, sh)))
    val k = 16
    val sh = TextFunctions.word_shingles(col("text"), 3, distinct = true)
    val hof = transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(sh, s => md5(concat_ws(":", i, s)))))
    val df = docs.filter(size(split(col("text"), " ")) >= 3).select(
      TextFunctions.minhash_md5_lanes(sh, k).as("native"), hof.as("hof"))
    assert(df.filter(col("native") =!= col("hof")).isEmpty)
    // doc shorter than the shingle width → empty array, not nulls
    val short = Seq("a b").toDF("text")
      .select(TextFunctions.minhash_md5_lanes(
        TextFunctions.word_shingles(col("text"), 3, distinct = true), k).as("m"))
      .as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("simhash_md5_chunks == exploded md5 majority-vote chunk chain") {
    val sh = TextFunctions.word_shingles(col("text"), 3, distinct = true)
    // the vote chain the cross-engine query previously ran through two
    // hash aggregates: ±1 per (bit, shingle) on the first md5 hex digit,
    // strict-majority bit, chunks of 4 bits
    val hof = array((0 until 4).map { c =>
      (0 until 4).map { j =>
        val k = c * 4 + j
        val votes = aggregate(sh, lit(0L), (a, s) =>
          a + when(substring(md5(concat_ws(":", lit(k), s)), 1, 1)
            .isin("0", "1", "2", "3", "4", "5", "6", "7"), 1L).otherwise(-1L))
        when(votes > 0, lit(1L << j)).otherwise(0L)
      }.reduce(_ + _)
    }: _*)
    val df = docs.filter(size(split(col("text"), " ")) >= 3).select(
      TextFunctions.simhash_md5_chunks(sh, 16, 4).as("native"), hof.as("hof"))
    assert(df.filter(col("native") =!= col("hof")).isEmpty)
  }

  test("intersect_count == size(array_intersect) on randomized long/string arrays") {
    val rnd = new scala.util.Random(4242)
    // duplicates and nulls included: the contract is exact equivalence
    // with the composed form, which dedups the left side and keeps null
    // once when both sides carry one
    def longArr() = Array.fill(rnd.nextInt(12))(
      if (rnd.nextInt(8) == 0) null
      else java.lang.Long.valueOf(rnd.nextLong(6L)))
    def strArr() = Array.fill(rnd.nextInt(12))(
      if (rnd.nextInt(8) == 0) null else s"w${rnd.nextInt(6)}")
    val rows = (1 to 200).map(_ =>
      org.apache.spark.sql.Row(longArr().toSeq, longArr().toSeq,
        strArr().toSeq, strArr().toSeq))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("la",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = true)),
      org.apache.spark.sql.types.StructField("lb",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = true)),
      org.apache.spark.sql.types.StructField("sa",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, containsNull = true)),
      org.apache.spark.sql.types.StructField("sb",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, containsNull = true))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val checked = df.select(
      TextFunctions.intersect_count(col("la"), col("lb")).as("nl"),
      size(array_intersect(col("la"), col("lb"))).as("el"),
      TextFunctions.intersect_count(col("sa"), col("sb")).as("ns"),
      size(array_intersect(col("sa"), col("sb"))).as("es"))
    assert(checked.filter(col("nl") =!= col("el") || col("ns") =!= col("es"))
      .isEmpty)
    // null ARRAY propagates null
    val nullArr = df.limit(1).select(
      TextFunctions.intersect_count(lit(null).cast("array<bigint>"),
        col("lb")).as("n")).collect()
    assert(nullArr.head.isNullAt(0))
  }

  test("nfc_normalize composes decomposed sequences, passes NFC through") {
    val cases = Seq(
      (1L, "e\u0301", "\u00E9"),                 // combining acute composes
      (2L, "A\u030A", "\u00C5"),                 // combining ring composes
      (3L, "\u1100\u1161\u11A8", "\uAC01"),      // Hangul jamo compose
      (4L, "\u00E9", "\u00E9"),                  // already NFC: untouched
      (5L, "plain ascii", "plain ascii"),        // fast path
      (6L, "mix e\u0301 end", "mix \u00E9 end"), // mid-string
      (7L, "", ""),
    ).toDF("id", "raw", "want")
    val got = cases.select(col("id"),
      TextFunctions.nfc_normalize(col("raw")).as("got"), col("want"))
      .as[(Long, String, String)].collect()
    got.foreach { case (id, g, w) => assert(g == w,
      s"case $id: ${g.map(_.toInt.toHexString)} != ${w.map(_.toInt.toHexString)}") }
    // null propagates
    assert(cases.limit(1).select(
      TextFunctions.nfc_normalize(lit(null).cast("string")).as("n"))
      .collect().head.isNullAt(0))
  }
}
