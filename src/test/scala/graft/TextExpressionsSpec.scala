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

  test("near-dup docs differ in few simhash bits, unrelated in many") {
    val sh = docs.filter(col("doc_id") <= 2).select(col("doc_id"),
      TextFunctions.simhash64(TextFunctions.word_shingles(col("text"), 3)).as("fp"))
      .as[(Long, Long)].collect().toMap
    val hamming = java.lang.Long.bitCount(sh(1L) ^ sh(2L))
    assert(hamming <= 16, s"near-dups should be close, hamming=$hamming")
  }
}
