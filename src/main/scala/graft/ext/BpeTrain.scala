package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", ACL'16): learn the top-N
  * symbol-pair merges from a corpus.
  *
  * Scale design (100 TB): classic BPE never iterates over the corpus — it
  * iterates over the WORD-FREQUENCY TABLE. The single corpus-sized pass is
  * the word count (map-side combinable, one shuffle); every merge round
  * then runs on the vocabulary table, which is orders of magnitude smaller
  * than the corpus at any scale (vocab grows ~sub-linearly in corpus
  * size). Per round: a declarative pair-count aggregate (adjacent-pair
  * explode weighted by word frequency, one small shuffle), a 1-row argmax
  * collect, and a narrow typed rewrite of the symbol arrays —
  * `mapPartitions`-style imperative code only where the logic (leftmost
  * non-overlapping pair substitution) is genuinely sequential per row.
  * Lineage is cut per round like the ConnectedComponents loop.
  */
object BpeTrain {

  final case class Merge(rank: Int, left: String, right: String, pair_count: Long)

  /** End-of-word marker, so merges can't cross word boundaries and the
    * learned units distinguish suffixes ("est</w>") from infixes.
    */
  val EndOfWord = "</w>"

  /** Leftmost non-overlapping substitution of the pair (a,b) → a+b. */
  private[graft] def mergePair(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Learn `nMerges` merges. Deterministic: pair-count ties break on the
    * (left, right) symbol pair lexicographically.
    *
    * When the word-frequency table fits the driver (`localVocabThreshold`
    * distinct words — vocabularies are small by construction even for
    * 100 TB corpora, and every production BPE trainer iterates over a
    * collected word-count dict), the merge rounds run locally: the only
    * corpus-sized work is the distributed word count. A vocabulary above
    * the threshold takes the distributed per-round path below — same
    * counts, same tie-breaks, pay the per-round scheduling only when the
    * data actually demands it (mirrors ConnectedComponents' size-routed
    * fast path).
    */
  def learnMerges(docs: DataFrame, nMerges: Int,
      localVocabThreshold: Long = 1000000): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // THE corpus pass: word frequencies (everything after this touches
    // only the vocab table)
    val wordFreq = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .persist()

    if (wordFreq.count() <= localVocabThreshold) {
      val words = wordFreq.as[(String, Long)].collect()
      wordFreq.unpersist()
      return localLoop(words, nMerges)
    }

    val vocab0 = wordFreq
      .as[(String, Long)]
      .map { case (w, n) => (w.map(_.toString) :+ EndOfWord, n) }
      .toDF("syms", "n")

    var vocab = vocab0.localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var rank = 0
    while (rank < nMerges) {
      val top = vocab
        // fully-merged single-symbol words have no pairs; sequence(1,0)
        // would DESCEND ([1,0]) and element_at(syms, 2) would throw
        .filter(size(col("syms")) >= 2)
        .select(col("n"), explode(
          transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("a"),
              element_at(col("syms"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("n").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) { rank = nMerges } // degenerate corpus: no pairs left
      else {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(rank + 1, a, b, cnt)
        vocab = vocab.as[(Seq[String], Long)]
          .map { case (syms, n) => (mergePair(syms, a, b), n) }
          .toDF("syms", "n")
          .localCheckpoint() // cut the per-round lineage, as in the CC loop
        rank += 1
      }
    }
    merges.toSeq
  }

  /** Driver-side merge rounds over a collected word-count dict — same
    * counting convention (every adjacent occurrence, weighted by word
    * frequency) and tie order as the distributed path.
    */
  private def localLoop(words: Array[(String, Long)], nMerges: Int): Seq[Merge] = {
    var vocab: Array[(Seq[String], Long)] = words.map { case (w, c) =>
      ((w.map(_.toString) :+ EndOfWord): Seq[String], c)
    }
    val out = scala.collection.mutable.ArrayBuffer[Merge]()
    var rank = 0
    while (rank < nMerges) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (counts.isEmpty) { rank = nMerges }
      else {
        val ((a, b), cnt) = counts.minBy { case ((x, y), n) => (-n, x, y) }
        out += Merge(rank + 1, a, b, cnt)
        vocab = vocab.map { case (syms, c) => (mergePair(syms, a, b), c) }
        rank += 1
      }
    }
    out.toSeq
  }

  val all: Seq[QueryDef] = Seq(
    // Tokenizer training demo: top-12 merges over the document corpus.
    // Engine-loop output (each round's argmax feeds the next rewrite) —
    // not expressible as one SQL query, so rows-only; BpeSpec verifies
    // the merge sequence against an independent single-machine trainer.
    QueryDef(
      "bpe_merges",
      (sp, dir) => {
        import sp.implicits._
        learnMerges(Tables.documents(sp, dir), 12)
          .toDF().orderBy("rank")
      },
      None,
    ),
  )
}
