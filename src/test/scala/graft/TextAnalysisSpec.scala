package graft

import graft.ext.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("shingles produce n-grams in order, empty below n tokens") {
    val df = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextAnalysis.shingles(col("text"), 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("a b c", "b c d"))
    assert(out(2L) == Seq.empty)
  }

  test("quality features are exact on a known document") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityFeatures(df).head()
    assert(r.getAs[Int]("n_tokens") == 6)
    assert(r.getAs[Int]("n_uniq_tokens") == 5) // 'the' twice
    assert(r.getAs[Int]("n_stopwords") == 3)   // the, on, the
    assert(math.abs(r.getAs[Double]("uniq_ratio") - 5.0 / 6) < 1e-12)
    assert(math.abs(r.getAs[Double]("avg_word_len") - 17.0 / 6) < 1e-12)
  }

  test("language ID learns separable trigram profiles") {
    // Two synthetic "languages" with disjoint character inventories.
    val aWords = Seq("aaab", "aabb", "abba", "baab", "abab", "bbaa")
    val bWords = Seq("xxxy", "xyyx", "yxxy", "xyxy", "yyxx", "xxyy")
    val rnd = new scala.util.Random(3)
    def doc(words: Seq[String]) = (0 until 30).map(_ => words(rnd.nextInt(words.size))).mkString(" ")
    val docs = ((0 until 20).map(i => (i.toLong, doc(aWords), "aa")) ++
      (20 until 40).map(i => (i.toLong, doc(bWords), "bb")))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langId(docs)
    val acc = out.filter(col("lang") === col("predicted_lang")).count().toDouble / out.count()
    assert(acc == 1.0, s"accuracy $acc on fully separable languages")
  }

  test("rolling fingerprint: equal for equal token streams, whitespace-stable tokens") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b d")).toDF("doc_id", "text")
    val fp = df.select(col("doc_id"), TextAnalysis.rollingFingerprint(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
    assert(fp.values.forall(v => v >= 0 && v < 1000000007L))
  }

  test("bm25 ranks higher-tf docs first at equal length, drops non-matches") {
    // Same doc length (4 tokens) so the length normalization cancels:
    // ranking must follow term frequency; doc 4 matches nothing.
    val docs = Seq(
      (1L, "spark spark spark pad"),
      (2L, "spark spark pad pad"),
      (3L, "spark pad pad pad"),
      (4L, "pad pad pad pad"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, Seq("spark"))
      .select("doc_id").as[Long].collect()
    assert(out.toSeq == Seq(1L, 2L, 3L))
  }

  test("bm25 penalizes long documents at equal term frequency") {
    val docs = Seq(
      (1L, "spark pad"),
      (2L, "spark pad pad pad pad pad pad pad"),
    ).toDF("doc_id", "text")
    val r = TextAnalysis.bm25(docs, Seq("spark"))
      .select("doc_id", "bm25_r").as[(Long, Double)].collect().toMap
    assert(r(1L) > r(2L))
  }

  test("quality filter attributes drops to the FIRST failing rule") {
    // the shipped corpus only ever trips the uniq rule, so each rule
    // path (and the rule ORDER) is pinned here on planted docs
    val pad = (1 to 50).map(i => s"w$i").mkString(" ") // 50 uniq tokens
    val docs = Seq(
      // 5 tokens < 10 AND uniq would fail too → must attribute to len
      (1L, "a a a a a", "s1"),
      (2L, pad, "s1"), // kept
      // 30 tokens, 3 distinct: uniq 3*10 < 30*3
      (3L, (1 to 30).map(i => Seq("x", "y", "z")(i % 3)).mkString(" "), "s1"),
      // stopword-soup: 12 tokens, all stopwords, uniq 10*10 >= 12*3 ok
      (4L, "the a of and to in is on for with the a", "s2"),
      // repetitious BUT uniq-passing: 12 tokens, 4 distinct (4*10 >= 12*3)
      // → grams 10, distinct 4 → (10-4)*2 > 10 fails the rep rule
      (5L, "p q r s p q r s p q r s", "s2"),
    ).map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("qf").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("doc_quality_filter")(spark, dir)
      .select("source", "n_docs", "n_kept", "n_drop_len", "n_drop_uniq",
        "n_drop_stop", "n_drop_rep")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("s1", 3L, 1L, 1L, 1L, 0L, 0L),
      ("s2", 2L, 0L, 0L, 0L, 1L, 1L)))
  }

  test("bloom decontam (prescreen + exact verify) equals the exact pipeline") {
    // the bloom prescreen has no false negatives and the exact-verify
    // stage strips its false positives, so the two-stage pipeline must
    // reproduce the exact contamination set bit-for-bit — a bloom that
    // drops a contaminated doc OR a verify that lets an FP through both
    // surface here (and in the DuckDB oracle hash)
    val dir = "/root/testdata/sf0.001"
    val bloom = SparkEntry.queries("doc_bloom_decontam")(spark, dir)
      .as[(Long, Long)].collect().toMap
    val exact = SparkEntry.queries("doc_decontam")(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(bloom == exact)
  }

  test("crossOverlap counts shared distinct 3-grams with exact jaccard") {
    // srcA docs carry 2 distinct grams ("a b c", "b c d"); srcB carries
    // "b c d" and "x y z" → 1 shared gram, jaccard = 1/(2+2-1).
    val docs = Seq(
      (1L, "a b c d", "srcA"),
      (2L, "a b c", "srcA"), // duplicate gram within source collapses
      (3L, "b c d", "srcB"),
      (4L, "x y z", "srcB"),
      (5L, "q r", "srcC"), // too short for a 3-gram → absent entirely
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.crossOverlap(docs)
      .as[(String, String, Long, Double)].collect()
    assert(out.toSeq == Seq(("srcA", "srcB", 1L, 1.0 / 3.0)))
  }

  test("htmlStrip drops code blocks, flattens tags, decodes entities amp-last") {
    val cases = Seq(
      // script/style CONTENT must vanish, not just the tags
      (1L, "<p>keep</p><script type=\"x\">var leak = 1;</script><div>this</div>",
        "keep this"),
      (2L, "<style>body { color: red }</style><b>bold</b>", "bold"),
      // entity decode: amp LAST, so &amp;lt; yields literal "&lt;"
      (3L, "a&nbsp;b &lt;tag&gt; &quot;q&quot; &#39;s&#39; x&amp;y &amp;lt;",
        "a b <tag> \"q\" 's' x&y &lt;"),
      // whitespace squeeze spans newlines/tabs and trims the ends
      (4L, "  <h1>T</h1>\n\n<p>a\t\tb</p>  ", "T a b"),
      // self-closing + attributes with > inside quotes are NOT parsed
      // (regex contract: tag ends at the first '>'), deterministic both
      // engines — pin the behavior so nobody "fixes" one side only
      (5L, "<br/><img src=\"x.png\" alt=\"y\"/>z", "z"),
    ).toDF("id", "html", "want")
    val got = cases.select(col("id"),
      TextAnalysis.htmlStrip(col("html")).as("got"), col("want"))
      .as[(Long, String, String)].collect()
    got.foreach { case (id, g, w) => assert(g == w, s"case $id: '$g' != '$w'") }
  }

  test("substringSpanDedup strips long repeats, keeps short collisions, merges islands") {
    // doc 1 owns everything (first in corpus order). doc 2 repeats a
    // 25-token passage from doc 1 (above the threshold → stripped) AND a
    // 5-token idiom (below → kept). doc 3 repeats nothing.
    val passage = (1 to 25).map(i => s"p$i").mkString(" ")
    val idiom = "as a matter of fact"
    val docs = Seq(
      (1L, s"$passage $idiom"),
      (2L, s"lead in words here $passage middle filler tokens $idiom tail"),
      (3L, "completely unrelated text with no repeats at all"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.substringSpanDedup(docs, window = 5, minSpan = 20)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // owner untouched
    assert(out(1L)._2 == 0L && out(1L)._3 == 0L)
    // doc 2: exactly one stripped span of the 25 passage tokens; the
    // 5-token idiom survives (window-grain dedup would have stripped it)
    val (n2, rm2, sp2, text2) = out(2L)
    assert(sp2 == 1L, s"expected 1 stripped span, got $sp2")
    assert(rm2 == 25L, s"expected the 25-token passage stripped, got $rm2")
    assert(text2.contains(idiom), s"idiom must survive the threshold: $text2")
    assert(!text2.contains("p1 p2"), s"passage must strip: $text2")
    assert(n2 - rm2 == text2.split(" ").length)
    // doc 3 untouched
    assert(out(3L)._2 == 0L && out(3L)._3 == 0L)
    // island MERGE: two overlapping repeated windows inside one doc form
    // ONE maximal span, counted once
    val passage2 = (1 to 30).map(i => s"q$i").mkString(" ")
    val selfDup = Seq(
      (1L, passage2),
      (2L, s"x y z $passage2 w"),
    ).toDF("doc_id", "text")
    val m = TextAnalysis.substringSpanDedup(selfDup, window = 5, minSpan = 20)
      .filter(col("doc_id") === 2L).collect().head
    assert(m.getLong(3) == 1L && m.getLong(2) == 30L,
      s"30 consecutive duplicated tokens must merge to one span: $m")
  }

  test("canonicalizeUrl normalizes spelling without merging resources") {
    val cases = Seq(
      // case + www + default port + tracking + fragment all collapse
      (1L, "HTTP://WWW.Example.COM:80/a/?id=1&utm_source=feed#top",
        "http://example.com/a?id=1"),
      (2L, "http://example.com/a?id=1", "http://example.com/a?id=1"),
      // https default port strips; http's :80 rule must NOT fire on https
      (3L, "HTTPS://example.com:443/a", "https://example.com/a"),
      // non-default port is identity-bearing
      (4L, "http://example.com:8080/a", "http://example.com:8080/a"),
      // scheme is preserved: http and https stay distinct
      (5L, "https://example.com/a?id=1", "https://example.com/a?id=1"),
      // tracking param in the MIDDLE and LAST position both drop
      (6L, "http://example.com/p?a=1&utm_x=9&b=2&gclid=g", "http://example.com/p?a=1&b=2"),
      // all params tracking → query dropped entirely
      (7L, "http://example.com/p?utm_a=1&fbclid=f", "http://example.com/p"),
      // root path: trailing slash drops, no query
      (8L, "http://Example.com/", "http://example.com"),
      // utm-LIKE but not tracking (no underscore match) is kept
      (9L, "http://example.com/p?utmx=1", "http://example.com/p?utmx=1"),
    ).toDF("id", "raw", "want")
    val got = cases.select(col("id"),
      TextAnalysis.canonicalizeUrl(col("raw")).as("got"), col("want"))
      .as[(Long, String, String)].collect()
    got.foreach { case (id, g, w) => assert(g == w, s"case $id: '$g' != '$w'") }
  }
}
