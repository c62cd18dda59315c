package graft

import graft.ext.BpeTrain
import java.util.regex.Pattern

/** BPE trainer vs an INDEPENDENT single-machine reference: the reference
  * counts pairs with a plain Map and applies merges by regex substitution
  * over space-joined symbols (leftmost non-overlapping, symbol-boundary
  * guarded) — no code shared with the distributed path beyond the spec of
  * the algorithm.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def refBpe(words: Map[String, Long], nMerges: Int)
      : Seq[(String, String, Long)] = {
    var vocab: Seq[(String, Long)] = words.toSeq.map { case (w, c) =>
      ((w.map(_.toString) :+ BpeTrain.EndOfWord).mkString(" "), c)
    }
    val out = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    for (_ <- 1 to nMerges) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((sent, c) <- vocab) {
        val syms = sent.split(" ")
        for (i <- 0 until syms.length - 1)
          counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      }
      if (counts.nonEmpty) {
        // max count, ties broken lexicographically on (left, right)
        val ((a, b), c) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
        out += ((a, b, c))
        val re = "(?<=^|\\s)" + Pattern.quote(a) + " " + Pattern.quote(b) + "(?=$|\\s)"
        vocab = vocab.map { case (sent, n) =>
          (sent.replaceAll(re, java.util.regex.Matcher.quoteReplacement(a + b)), n)
        }
      }
    }
    out.toSeq
  }

  test("distributed BPE training matches the independent reference trainer") {
    val text = Seq.fill(5)("low").mkString(" ") + " " +
      Seq.fill(2)("lower").mkString(" ") + " " +
      Seq.fill(6)("newest").mkString(" ") + " " +
      Seq.fill(3)("widest").mkString(" ")
    val docs = Seq((1L, text, "en", "srcA", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = BpeTrain.learnMerges(docs, 8)
      .map(m => (m.left, m.right, m.pair_count))
    val words = text.split(" ").groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val expected = refBpe(words, 8)
    assert(got == expected, s"\ngot:      $got\nexpected: $expected")
    // merge frequencies can never increase (a new pair is a sub-occurrence
    // of something that already existed when the earlier max was chosen)
    assert(got.map(_._3).sliding(2).forall(p => p.head >= p.last))
    // the classic suffix unit for this corpus must be learned
    assert(got.map(m => m._1 + m._2).contains("est</w>") ||
      got.exists(m => (m._1 + m._2).endsWith("</w>") && (m._1 + m._2).contains("est")))
  }

  test("local and distributed training paths learn identical merges") {
    val text = "ab ab ab abc abc bc bc bc bc cab"
    val docs = Seq((1L, text, "en", "srcA", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val local = BpeTrain.learnMerges(docs, 6)
    val dist = BpeTrain.learnMerges(docs, 6, localVocabThreshold = 0)
    assert(local == dist)
  }

  test("batched distributed rounds equal the sequential loop on random corpora") {
    // Small alphabet + repeated words force exactly the hazards batching
    // must survive: count ties (lexicographic order), overlapping pairs
    // (aa in aaa), and new pairs created mid-batch that outrank later
    // snapshot candidates.
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 12) {
      val alpha = "ab" + ("cde".take(rnd.nextInt(3)))
      val words = Seq.fill(3 + rnd.nextInt(8)) {
        Seq.fill(1 + rnd.nextInt(6))(alpha(rnd.nextInt(alpha.length))).mkString
      }
      val text = Seq.fill(40)(words(rnd.nextInt(words.length))).mkString(" ")
      val docs = Seq((1L, text, "en", "srcA", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val n = 5 + rnd.nextInt(10)
      val local = BpeTrain.learnMerges(docs, n) // sequential driver loop
      val dist = BpeTrain.learnMerges(docs, n, localVocabThreshold = 0)
      assert(local == dist, s"trial $trial (text=$text, n=$n)")
    }
  }

  test("mergePair substitutes leftmost non-overlapping occurrences") {
    assert(BpeTrain.mergePair(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(BpeTrain.mergePair(Seq("x", "a", "b", "a", "b"), "a", "b") ==
      Seq("x", "ab", "ab"))
    assert(BpeTrain.mergePair(Seq("a"), "a", "a") == Seq("a"))
  }
}
