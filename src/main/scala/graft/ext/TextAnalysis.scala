package graft.ext

import graft.{QueryDef, Tables}
import graft.functions.Canon.roundCanon
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline (SURVEY.md §2.11
  * tier C): tokenization, quality scoring, stopword ratios, language-ID,
  * document fingerprinting. Everything is per-row narrow work (no shuffle
  * except final aggregates) built from codegen'd `functions._` — at 100 TB
  * these run at scan speed with full column pruning.
  *
  * Determinism contract with the DuckDB oracle: token counts and ratio
  * denominators are exact integers; ratios are single double divisions of
  * identical integers (bit-identical across engines); fingerprints use md5
  * (identical algorithm in both engines).
  */
object TextAnalysis {

  /** HTML/markup strip — the first cleaning pass a web-crawl corpus needs
    * before any tokenize/dedup/quality stage: drop script/style blocks
    * wholesale (their CONTENT is code, not prose — tag-stripping alone
    * would leak it into the text), flatten remaining tags to spaces,
    * decode the six ubiquitous entities (amp LAST, so `&amp;lt;` decodes
    * to the literal `&lt;` and not twice), then squeeze whitespace. Pure
    * narrow codegen'd string work — scan speed at any scale, and every
    * step is the same RE2-compatible regex in the DuckDB oracle.
    */
  def htmlStrip(html: Column): Column = {
    val noBlocks = regexp_replace(html,
      "(?s)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]+>", " ")
    val ent = replace(replace(replace(replace(replace(replace(noTags,
      lit("&nbsp;"), lit(" ")), lit("&lt;"), lit("<")),
      lit("&gt;"), lit(">")), lit("&quot;"), lit("\"")),
      lit("&#39;"), lit("'")), lit("&amp;"), lit("&"))
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** Whitespace tokenization (single-space split, matching the corpus). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles (n >= 1); empty array when the doc is shorter
    * than n tokens. Used by fuzzy dedup (Dedup.scala) as well.
    */
  def shingles(text: Column, n: Int): Column = {
    val w = tokens(text)
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k)): _*)))
      .otherwise(array())
  }

  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Stopword count via a higher-order filter over the token array. */
  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isInCollection(Stopwords)))

  /** Simple quality features: exact integer counts + exact-division ratios
    * (length/punct/stopword heuristics a pretraining pipeline filters on).
    */
  def qualityFeatures(df: DataFrame): DataFrame = {
    val w = tokens(col("text"))
    df.withColumn("n_tokens", size(w))
      .withColumn("n_uniq_tokens", size(array_distinct(w)))
      .withColumn("n_spaces", length(col("text")) - length(regexp_replace(col("text"), " ", "")))
      .withColumn("n_vowels", length(col("text")) - length(regexp_replace(col("text"), "[aeiou]", "")))
      .withColumn("n_stopwords", stopwordCount(col("text")))
      .withColumn("uniq_ratio", col("n_uniq_tokens") * 1.0 / col("n_tokens"))
      .withColumn("stopword_ratio", col("n_stopwords") * 1.0 / col("n_tokens"))
      .withColumn("avg_word_len",
        (length(col("text")) - col("n_spaces")) * 1.0 / col("n_tokens"))
  }

  /** Language ID by character-trigram profiles LEARNED FROM THE CORPUS
    * (per-lang top-k trigram sets), then each doc scored by overlap. Fully
    * distributed: one explode+count per profile build (tiny result,
    * broadcast back), one narrow pass to score. On synthetic word-soup text
    * the signal is weak — the mechanism is what's exercised (ScalaTest
    * checks it beats random on separable fixtures).
    */
  def trigramsOf(text: Column): Column =
    when(length(text) >= 3,
      array_distinct(transform(sequence(lit(1), length(text) - 2),
        i => text.substr(i, lit(3)))))
      .otherwise(array())

  def langId(docsIn: DataFrame, topK: Int = 40): DataFrame = {
    // trigram generation is CPU-bound narrow work — spread it (a single
    // local parquet file = single partition otherwise) and use the native
    // CharNGrams expression (the interpreted substr transform dominated)
    val docs = docsIn.repartition(docsIn.sparkSession.sparkContext.defaultParallelism)
    def tris(c: Column) = graft.functions.TextFunctions.char_ngrams(c, 3)
    val tri = docs
      .select(col("lang"), explode(tris(col("text"))).as("tri"))
      .groupBy("lang", "tri").count()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("count").desc, col("tri"))
    val profiles = tri
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .groupBy("lang").agg(collect_set(col("tri")).as("profile"))
      .withColumnRenamed("lang", "profile_lang")
    docs
      .withColumn("doc_tris", tris(col("text")))
      .crossJoin(broadcast(profiles))
      .withColumn("score", graft.functions.TextFunctions
        .intersect_count(col("doc_tris"), col("profile")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("profile_lang"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("profile_lang").as("predicted_lang"),
        col("score"))
  }

  /** Rolling polynomial fingerprint over tokens (Rabin-Karp style), exact
    * long arithmetic — used as a cheap content signature that is stable
    * under formatting-only changes (tokenization normalizes whitespace).
    *
    * Token hash = first 12 hex chars of md5 parsed as an integer (< 2^48),
    * mod 1e9+7 — the cross-engine pattern proven in doc_winnow_fp /
    * dedup_minhash_md5: md5 is identical in both engines, so the whole
    * rolling polynomial is DuckDB-expressible (list_reduce fold) and the
    * query is fully oracled. Every intermediate stays < 2^51, so ANSI
    * overflow checking (Spark 4 default) never trips.
    */
  def rollingFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(
        acc * lit(1000003L) +
          pmod(conv(substring(md5(t), 1, 12), 16, 10).cast("long"),
            lit(1000000007L)),
        lit(1000000007L)))

  /** BM25 relevance scoring of every matching doc against a keyword
    * query (Robertson/Sparck Jones probabilistic weighting; k1=1.2,
    * b=0.75). Two scan-speed passes: per-doc term frequencies via
    * `size(w) - size(array_remove(w, t))` (codegen'd builtins — no
    * lambda, no explode), then ONE single-row corpus-stats aggregate
    * (N, Σdl, per-term df — a few bytes, broadcast back) feeding a
    * narrow scoring projection. Constants appear as the same literals
    * the SQL oracle uses (never pre-folded in Scala: 1.2+1 != literal
    * 2.2 in binary); all other inputs are exact integers and the
    * expression trees associate identically, so the ROUNDED score is
    * deterministic cross-engine and the doc_id tie-break makes any
    * top-N cut of the returned ordering exact.
    */
  def bm25(docs: DataFrame, terms: Seq[String]): DataFrame = {
    val w = tokens(col("text"))
    def tfCol(t: String) = size(w) - size(array_remove(w, t))
    val tf = docs.select(
      Seq(col("doc_id"), size(w).as("dl")) ++
        terms.map(t => tfCol(t).as(s"tf_$t")): _*)
    val stats = tf.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl").cast("long")).as("sum_dl") +:
        terms.map(t =>
          sum((col(s"tf_$t") > 0).cast("long")).as(s"df_$t")): _*)
    val avgdl = col("sum_dl") * lit(1.0) / col("n_docs")
    def term(t: String): Column =
      log(lit(1.0) + (col("n_docs") - col(s"df_$t") + lit(0.5)) /
          (col(s"df_$t") + lit(0.5))) *
        (col(s"tf_$t") * lit(2.2)) /
        (col(s"tf_$t") + lit(1.2) *
          (lit(0.25) + lit(0.75) * (col("dl") / avgdl)))
    tf.crossJoin(broadcast(stats))
      .filter(terms.map(t => col(s"tf_$t") > 0).reduce(_ || _))
      .select(Seq(col("doc_id")) ++ terms.map(t => col(s"tf_$t")) ++
        Seq(roundCanon(terms.map(term).reduce(_ + _), 4).as("bm25_r")): _*)
      .orderBy(col("bm25_r").desc, col("doc_id"))
  }

  /** Cross-source contamination matrix: for every source pair, count +
    * Jaccard of SHARED distinct word-3-grams — the overlap audit run
    * between corpus slices before mixing (the corpus-level sibling of
    * doc_decontam's doc-vs-bench check). Grams travel as xxhash64 longs
    * built in the same single native pass as the shingles (8 B primitive
    * keys — the output is COUNTS, which equal the string-keyed counts
    * modulo 2^-64 collisions, the accepted hashed-dedup doctrine); the
    * shuffle is the distinct (source, gram) set — linear in corpus
    * tokens — and the join fan-out per gram is bounded by the number of
    * sources carrying it, never by corpus size, so the pair space stays
    * |S|²-bounded while docs grow. Per-source totals are a tiny
    * broadcast aggregate.
    */
  def crossOverlap(docs: DataFrame): DataFrame = {
    val grams = docs
      // cheap raw-text guard + repartition before the heavy shingle
      // projection (single-split local parquet; cluster no-op)
      .filter(size(split(col("text"), " ")) >= 3)
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("source"),
        explode(graft.functions.TextFunctions
          .word_shingle_hashes(col("text"), 3, distinct = true)).as("gh"))
      .distinct()
      .persist() // both sides of the pair join + per-source counts
    val counts = grams.groupBy("source").agg(count(lit(1)).as("n_sh"))
    grams.as("x")
      .join(grams.as("y"),
        col("x.gh") === col("y.gh") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(counts.select(col("source").as("src_a"),
        col("n_sh").as("n_a"))), Seq("src_a"))
      .join(broadcast(counts.select(col("source").as("src_b"),
        col("n_sh").as("n_b"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_shared"),
        (col("n_shared") /
          (col("n_a") + col("n_b") - col("n_shared")).cast("double"))
          .as("jaccard"))
      .orderBy("src_a", "src_b")
  }

  /** Corpus-wide BOILERPLATE SPAN REMOVAL — the C4/CCNet pass that strips
    * spans repeated across many documents (nav bars, cookie banners,
    * license footers) while `doc_cross_overlap` only MEASURES them. A
    * token is removed iff any corpus-frequent trigram span covers it:
    * trigram spans are hashed (md5 — fixed-width shuffle keys, never span
    * text), spans whose DOCUMENT frequency reaches `minDf` are
    * boilerplate (C4's rule is the same shape: an absolute occurrence
    * count, three in the original paper — production calibrates per
    * corpus), and covered token positions are subtracted from each
    * document before reassembly.
    *
    * Scale shape: three token-grain shuffles (gram df count, covered-
    * position distinct, final per-doc reassembly) over md5/int keys; the
    * boilerplate gram table is vocabulary-sized and the join back is an
    * equi-join on the hash. The gram frame is persisted across its two
    * consumers (df count + join back) — at fixture scale trivially, at
    * 100 TB the same two-pass either persists to fast storage or
    * recomputes the narrow gram projection (a map-only pass) — and
    * unpersisted before return. Document bodies cross the shuffle exactly
    * once, at the final doc-grain reassembly, which is the pass that
    * writes the stripped corpus anyway.
    */
  def boilerplateStrip(docs: DataFrame, minDf: Long = 5L): DataFrame = {
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    // (doc, 1-based start, gram xxhash64) for every trigram span. The gram
    // key never leaves the pipeline (grouping/equality only), so the
    // 8-byte xxhash64 long replaces the old 32-char md5 string: the hash
    // itself is ~3× cheaper per gram and every downstream shuffle/agg
    // keys on a fixed 8-byte word instead of a 32-byte string.
    val grams = toks.filter(size(col("toks")) >= 3)
      // per-token hash once, then the gram key hashes three fixed-width
      // longs — avoids re-concatenating (and re-hashing) the span text at
      // every position
      .select(col("doc_id"),
        expr("transform(toks, t -> xxhash64(t))").as("th"))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(1, size(th) - 2), i -> xxhash64(" +
          "element_at(th, i), element_at(th, i + 1), element_at(th, i + 2)))"))
        .as(Seq("p0", "gh")))
      .select(col("doc_id"), (col("p0") + 1).as("s"), col("gh"))
      .persist()
    try {
      val boiler = grams.groupBy("gh")
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") >= lit(minDf))
        .select("gh")
      // covered token positions AS A PER-DOC ARRAY: start s covers s, s+1,
      // s+2; collect_set dedups starts, the array transform expands them,
      // array_distinct collapses overlaps. One doc-grain shuffle replaces
      // the old global (doc, pos)-grain distinct PLUS the token-grain
      // join + collect_list reassembly — document bodies now cross no
      // shuffle at all (guide §2.3/§2.4): the strip below runs inside the
      // scan's own partitions.
      val rmpos = grams.join(boiler, "gh")
        .groupBy("doc_id")
        .agg(collect_set(col("s")).as("starts"))
        .select(col("doc_id"), expr(
          "array_distinct(flatten(transform(starts, " +
            "s -> sequence(s, s + 2))))").as("rmpos"))
      val out = toks.join(rmpos, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tok"),
          coalesce(size(col("rmpos")), lit(0)).cast("long").as("n_removed"),
          // kept tokens in position order: filter-with-index preserves the
          // array's own order, so no sort is needed
          when(col("rmpos").isNull, concat_ws(" ", col("toks")))
            .otherwise(concat_ws(" ", expr(
              "filter(toks, (w, i) -> NOT array_contains(rmpos, i + 1))")))
            .as("stripped"))
        .orderBy("doc_id")
      // materialize before unpersisting the gram frame the plan feeds on;
      // at real scale this eager executor-local materialization is a
      // durable write of the stripped corpus (the pass's output anyway)
      out.localCheckpoint(true)
    } finally { grams.unpersist(); () }
  }

  /** Corpus-wide EXACT-SUBSTRING DEDUP with keep-first semantics — the
    * Lee et al. ("Deduplicating Training Data Makes Language Models
    * Better", ACL'22) pass at window grain: every repeated 5-token window
    * keeps its FIRST occurrence in corpus order (doc_id, then position)
    * and strips every other one, including later repeats inside the same
    * document. This differs from [[boilerplateStrip]] on both axes:
    * threshold (any repeat, not a df cutoff) and semantics (one survivor
    * kept, not all occurrences removed). Ownership is a min(struct)
    * aggregate per window hash — never a window function over gram
    * partitions — so a hot gram costs a skewed group, not a single-task
    * sort; everything else follows boilerplateStrip's shuffle discipline
    * (md5 keys, covered-position distinct, one doc-grain reassembly).
    */
  def substringDedup(docs: DataFrame, window: Int = 5): DataFrame = {
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    // gram keys are grouping-only (never output): xxhash64 longs, not md5
    // strings — cheaper to compute and 8-byte shuffle keys (see
    // boilerplateStrip)
    val gramHash = (0 until window)
      .map(k => s"element_at(th, i + $k)")
      .mkString("xxhash64(", ", ", ")")
    val grams = toks.filter(size(col("toks")) >= window)
      // per-token hash once, gram key over fixed-width longs (see
      // boilerplateStrip)
      .select(col("doc_id"),
        expr("transform(toks, t -> xxhash64(t))").as("th"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, size(th) - ${window - 1}), " +
          s"i -> $gramHash)")).as(Seq("p0", "gh")))
      .select(col("doc_id"), (col("p0") + 1).as("s"), col("gh"))
      .persist()
    try {
      // first occurrence per repeated gram, by (doc_id, s) — an aggregate,
      // broadcast back via the equi-join below
      val own = grams.groupBy("gh")
        .agg(min(struct(col("doc_id"), col("s"))).as("o"),
          count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .select(col("gh"), col("o.doc_id").as("odoc"), col("o.s").as("os"))
      // covered positions per doc as an array (same shape as
      // boilerplateStrip): one doc-grain shuffle, bodies never shuffled
      val rmpos = grams.join(own, "gh")
        .filter(!(col("doc_id") === col("odoc") && col("s") === col("os")))
        .groupBy("doc_id")
        .agg(collect_set(col("s")).as("starts"))
        .select(col("doc_id"), expr(
          "array_distinct(flatten(transform(starts, " +
            s"s -> sequence(s, s + ${window - 1}))))").as("rmpos"))
      val out = toks.join(rmpos, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tok"),
          coalesce(size(col("rmpos")), lit(0)).cast("long").as("n_removed"),
          when(col("rmpos").isNull, concat_ws(" ", col("toks")))
            .otherwise(concat_ws(" ", expr(
              "filter(toks, (w, i) -> NOT array_contains(rmpos, i + 1))")))
            .as("deduped"))
        .orderBy("doc_id")
      // guards the unpersist below (the plan feeds on the gram frame); at
      // real scale the equivalent is a durable write of the deduped corpus
      out.localCheckpoint(true)
    } finally { grams.unpersist(); () }
  }

  /** MAXIMAL-SPAN exact-substring dedup — [[substringDedup]] upgraded to
    * Lee et al.'s actual semantics (ACL'22 §3: remove maximal repeated
    * substrings of ≥ 50 tokens; suffix-array grain): fixed 5-token
    * windows DETECT repeats, but adjacent/overlapping duplicated windows
    * then MERGE into maximal covered spans and only spans of at least
    * `minSpan` tokens are stripped. The difference is corpus quality:
    * plain window-grain dedup strips every idiomatic 5-gram collision
    * (the length-5 islands in this corpus), while the thresholded pass
    * keeps them and removes only genuinely duplicated passages.
    *
    * Scale shape: the detect half is [[substringDedup]]'s verbatim
    * (md5 gram keys, min(struct) ownership aggregate — never a window
    * over GRAM partitions, whose heavy hitters are corpus-hot). The
    * merge half runs windows partitioned BY DOCUMENT ordered by start —
    * bounded by tokens-per-document, the same grain the reassembly
    * already groups on — using the classic interval-merge: cumulative
    * max of span ends marks island breaks, a running sum numbers the
    * islands, and one aggregate per (doc, island) yields the maximal
    * span. Output adds `n_spans` (stripped spans per doc) so the span
    * STRUCTURE is driver-hashed, not just the surviving text.
    */
  def substringSpanDedup(docs: DataFrame, window: Int = 5,
      minSpan: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    // grouping-only gram keys: xxhash64 longs over per-token hashes (see
    // boilerplateStrip)
    val gramHash = (0 until window)
      .map(k => s"element_at(th, i + $k)")
      .mkString("xxhash64(", ", ", ")")
    val grams = toks.filter(size(col("toks")) >= window)
      .select(col("doc_id"),
        expr("transform(toks, t -> xxhash64(t))").as("th"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, size(th) - ${window - 1}), " +
          s"i -> $gramHash)")).as(Seq("p0", "gh")))
      .select(col("doc_id"), (col("p0") + 1).as("s"), col("gh"))
      .persist()
    try {
      val own = grams.groupBy("gh")
        .agg(min(struct(col("doc_id"), col("s"))).as("o"),
          count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .select(col("gh"), col("o.doc_id").as("odoc"), col("o.s").as("os"))
      val dupStarts = grams.join(own, "gh")
        .filter(!(col("doc_id") === col("odoc") && col("s") === col("os")))
        .select("doc_id", "s").distinct()
      // interval merge over [s, s+w-1] per document: break where a start
      // clears the running max end by more than adjacency
      val byDoc = W.partitionBy("doc_id").orderBy("s")
      val spans = dupStarts
        .withColumn("prev_end", max(col("s") + lit(window - 1))
          .over(byDoc.rowsBetween(W.unboundedPreceding, -1)))
        .withColumn("brk",
          when(col("prev_end").isNull ||
            col("s") > col("prev_end") + 1, 1L).otherwise(0L))
        .withColumn("isle", sum(col("brk"))
          .over(byDoc.rowsBetween(W.unboundedPreceding, 0)))
        .groupBy("doc_id", "isle")
        .agg(min(col("s")).as("a"), (max(col("s")) + lit(window - 1)).as("b"))
        .filter(col("b") - col("a") + lit(1) >= minSpan)
        .persist()
      try {
        // spans are disjoint by construction (interval merge), so the
        // per-doc covered-position array needs no distinct; one doc-grain
        // aggregate carries both the positions and the span count, and
        // the reassembly below is array-native (bodies never shuffled)
        val rmpos = spans
          .groupBy("doc_id")
          .agg(collect_list(struct(col("a"), col("b"))).as("sp"))
          .select(col("doc_id"),
            expr("flatten(transform(sp, x -> sequence(x.a, x.b)))")
              .as("rmpos"),
            size(col("sp")).cast("long").as("n_spans"))
        val out = toks.join(rmpos, Seq("doc_id"), "left_outer")
          .select(col("doc_id"),
            size(col("toks")).cast("long").as("n_tok"),
            coalesce(size(col("rmpos")), lit(0)).cast("long").as("n_removed"),
            coalesce(col("n_spans"), lit(0L)).as("n_spans"),
            when(col("rmpos").isNull, concat_ws(" ", col("toks")))
              .otherwise(concat_ws(" ", expr(
                "filter(toks, (w, i) -> NOT array_contains(rmpos, i + 1))")))
              .as("deduped"))
          .orderBy("doc_id")
        // durable-write equivalent at scale; guards both unpersists
        out.localCheckpoint(true)
      } finally { spans.unpersist(); () }
    } finally { grams.unpersist(); () }
  }

  /** URL canonicalization — the normalization pass a crawl-dedup pipeline
    * runs before URL-level dedup (the same spelling of a page arrives as
    * `HTTP://WWW.Example.COM:80/a/?id=1&utm_source=feed#top` and
    * `http://example.com/a?id=1`). Canonical form: scheme + host
    * lowercased, leading `www.` dropped, default port stripped (`:80` for
    * http, `:443` for https — a NON-default port is identity-bearing and
    * kept), fragment removed, tracking params removed (`utm_*`, `fbclid`,
    * `gclid`), trailing path slashes dropped, empty query dropped. The
    * scheme itself is preserved: http vs https are different resources,
    * only the SPELLING is normalized. Pure RE2-compatible regexp work —
    * whole-stage-codegen'd, linear scan speed at any corpus size.
    */
  def canonicalizeUrl(u: Column): Column = {
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort =
      lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host0 = regexp_replace(hostPort, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val rest = regexp_replace(
      regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", ""), "#.*$", "")
    val path = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    // &-prefix trick: every param (incl. the first) is preceded by `&`, so
    // one global pattern removes tracking params at any position; the
    // leading `&` of the first survivor (or of an emptied query) strips off
    val query = regexp_replace(
      regexp_replace(concat(lit("&"), regexp_extract(rest, "\\?(.*)$", 1)),
        "&(utm_[a-z0-9_]+|fbclid|gclid)=[^&]*", ""),
      "^&", "")
    concat(scheme, lit("://"), host, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "doc_token_stats",
      (sp, dir) =>
        Tables.documents(sp, dir)
          .select(col("lang"), size(tokens(col("text"))).as("n_tok"),
            col("n_chars"))
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tok").cast("long")).as("total_tokens"),
            (sum(col("n_tok").cast("long")) / count(lit(1))).as("avg_tokens"),
            sum(col("n_chars")).as("total_chars"),
          )
          .orderBy("lang"),
      Some(
        """SELECT lang, count(*) AS n_docs,
          |       CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS total_tokens,
          |       sum(CAST(len(string_split(text, ' ')) AS BIGINT)) / count(*) AS avg_tokens,
          |       CAST(sum(n_chars) AS BIGINT) AS total_chars
          |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
    ),
    QueryDef(
      "doc_quality",
      (sp, dir) =>
        qualityFeatures(Tables.documents(sp, dir))
          .select("doc_id", "n_tokens", "n_uniq_tokens", "n_vowels",
            "n_stopwords", "uniq_ratio", "stopword_ratio", "avg_word_len")
          .orderBy("doc_id"),
      Some(
        """WITH f AS (
          |  SELECT doc_id,
          |         len(string_split(text, ' ')) AS n_tokens,
          |         len(list_distinct(string_split(text, ' '))) AS n_uniq_tokens,
          |         length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS n_vowels,
          |         len(list_filter(string_split(text, ' '),
          |             t -> list_contains(['the','a','of','and','to','in','is','on','for','with'], t))) AS n_stopwords,
          |         length(text) - length(replace(text, ' ', '')) AS n_spaces,
          |         length(text) AS n_len
          |  FROM documents)
          |SELECT doc_id, n_tokens, n_uniq_tokens, n_vowels, n_stopwords,
          |       n_uniq_tokens * 1.0 / n_tokens AS uniq_ratio,
          |       n_stopwords * 1.0 / n_tokens AS stopword_ratio,
          |       (n_len - n_spaces) * 1.0 / n_tokens AS avg_word_len
          |FROM f ORDER BY doc_id""".stripMargin),
    ),
    // ---- Bloom-filter decontamination: the SCALE PATH beside
    //      doc_decontam's exact broadcast. The exact variant ships the
    //      benchmark's full gram set to every executor — fine while the
    //      bench fits memory, impossible when the held-out set is itself
    //      huge. Spark's native BloomFilterAggregate compresses the bench
    //      grams into a fixed 10 KB bitset (built distributed, merged on
    //      the driver, broadcast as ONE value), and the training pass
    //      probes it at scan speed. Bloom guarantees NO false negatives —
    //      every truly contaminated doc is flagged — with a bounded
    //      false-positive surplus the pipeline resolves by an EXACT
    //      RECHECK of the tiny flagged slice. The registered query runs
    //      that full two-stage pipeline (prescreen → exact verify on the
    //      candidates only), so its output is the exact contamination
    //      set and the DuckDB oracle hash-checks it: a bloom false
    //      NEGATIVE (a dropped contaminated doc — the bug class the
    //      filter must never have) breaks the hash, while false
    //      positives only cost verify work, never rows. The engine-
    //      specific bit layout stays out of the output entirely.
    QueryDef(
      "doc_bloom_decontam",
      (sp, dir) => {
        def gramHashes(docs: DataFrame) = docs
          .filter(size(split(col("text"), " ")) >= 3)
          .repartition(sp.sparkContext.defaultParallelism)
          .select(col("doc_id"), explode(graft.functions.TextFunctions
            .word_shingle_hashes(col("text"), 3, distinct = true)).as("gh"))
        val doc = Tables.documents(sp, dir)
        // the merged filter is ~10 KB: collected ONCE to the driver and
        // shipped as a constant — the same driver-resident broadcast
        // Spark's own InjectRuntimeFilter uses (might_contain requires a
        // constant/scalar-subquery filter side by design)
        val bfBytes = gramHashes(doc.filter(col("doc_id") % 97 === 0))
          .agg(graft.functions.TextFunctions
            .bloom_filter_agg(col("gh"), 10000L, 81920L).as("bf"))
          .head().getAs[Array[Byte]]("bf")
        // stage 1 — bloom prescreen at scan speed: candidate docs only
        val candidates = gramHashes(doc.filter(col("doc_id") % 97 =!= 0))
          .filter(graft.functions.TextFunctions
            .might_contain(lit(bfBytes), col("gh")))
          .select("doc_id").distinct()
        // stage 2 — exact verify, restricted to the candidate slice (at
        // scale this is the point: the expensive gram join runs over the
        // bloom-surviving fraction, not the corpus). Grams stay the native
        // 64-bit shingle hashes end-to-end (grouping-only keys — the old
        // md5-string re-shingle of both slices is gone).
        val bench = gramHashes(doc.filter(col("doc_id") % 97 === 0))
          .select(col("gh").as("bh")).distinct()
        gramHashes(doc.filter(col("doc_id") % 97 =!= 0)
            .join(candidates, Seq("doc_id"), "left_semi"))
          .join(broadcast(bench), col("gh") === col("bh"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shared"))
          .orderBy("doc_id")
      },
      Some(
        """WITH t AS (
          |  SELECT doc_id, string_split(text, ' ') AS toks
          |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
          |g AS (
          |  SELECT DISTINCT doc_id,
          |         md5(array_to_string(toks[idx : idx + 2], ' ')) AS gh
          |  FROM t, unnest(generate_series(1, len(toks) - 2)) AS u(idx)),
          |bench AS (SELECT DISTINCT gh FROM g WHERE doc_id % 97 = 0)
          |SELECT g.doc_id, count(*) AS n_shared
          |FROM g JOIN bench USING (gh)
          |WHERE g.doc_id % 97 <> 0
          |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin),
    ),
    QueryDef(
      "doc_fingerprint",
      (sp, dir) =>
        Tables.documents(sp, dir)
          .select(col("doc_id"), md5(col("text")).as("fp"),
            array_min(transform(tokens(col("text")), t => md5(t))).as("min_token_fp"))
          .orderBy("doc_id"),
      Some(
        """SELECT doc_id, md5(text) AS fp,
          |       list_min(list_transform(string_split(text, ' '), t -> md5(t))) AS min_token_fp
          |FROM documents ORDER BY doc_id""".stripMargin),
    ),
    QueryDef(
      "doc_lang_id",
      (sp, dir) => langId(Tables.documents(sp, dir)).orderBy("doc_id"),
      // The full learn-then-classify pipeline IS SQL-expressible: distinct
      // char-trigrams per doc (substr grid), doc-frequency counts → top-40
      // profile per lang (row_number with the same count-desc/tri
      // tie-break), overlap scores via join, argmax with the same
      // score-desc/lang tie-break. Docs shorter than 3 chars keep score 0
      // against every profile, exactly like the Spark cross join.
      Some(
        """WITH d AS (SELECT doc_id, lang, text FROM documents),
          |idx AS (SELECT doc_id, lang, text,
          |               unnest(generate_series(1, len(text) - 2)) AS i
          |        FROM d WHERE len(text) >= 3),
          |dtri AS (SELECT DISTINCT doc_id, lang, substr(text, i, 3) AS tri
          |         FROM idx),
          |cnt AS (SELECT lang, tri, count(*) AS c FROM dtri GROUP BY lang, tri),
          |prof AS (SELECT lang AS profile_lang, tri
          |         FROM (SELECT lang, tri,
          |                      row_number() OVER (PARTITION BY lang
          |                        ORDER BY c DESC, tri) AS rn
          |               FROM cnt)
          |         WHERE rn <= 40),
          |langs AS (SELECT DISTINCT profile_lang FROM prof),
          |ov AS (SELECT dt.doc_id, p.profile_lang, count(*) AS score
          |       FROM dtri dt JOIN prof p ON dt.tri = p.tri
          |       GROUP BY dt.doc_id, p.profile_lang),
          |allpairs AS (SELECT d.doc_id, d.lang, l.profile_lang,
          |                    coalesce(ov.score, 0) AS score
          |             FROM d CROSS JOIN langs l
          |             LEFT JOIN ov ON ov.doc_id = d.doc_id
          |                         AND ov.profile_lang = l.profile_lang),
          |best AS (SELECT doc_id, lang, profile_lang AS predicted_lang, score,
          |                row_number() OVER (PARTITION BY doc_id
          |                  ORDER BY score DESC, profile_lang) AS rn
          |         FROM allpairs)
          |SELECT doc_id, lang, predicted_lang,
          |       CAST(score AS INTEGER) AS score
          |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin),
    ),
    QueryDef(
      "doc_rolling_fp",
      (sp, dir) =>
        Tables.documents(sp, dir)
          .select(col("doc_id"), rollingFingerprint(col("text")).as("rfp"))
          .orderBy("doc_id"),
      // DuckDB twin of the fold: md5-hex token hash (12 hex chars parsed
      // via integer bit-shifts — no FP), list_reduce with a prepended 0
      // accumulator replicating the left fold exactly.
      Some(
        """SELECT doc_id,
          |       list_reduce(
          |         list_prepend(CAST(0 AS BIGINT),
          |           list_transform(string_split(text, ' '),
          |             t -> CAST(list_sum(list_transform(generate_series(1, 12),
          |                    i -> (strpos('0123456789abcdef', substr(md5(t), i, 1)) - 1)
          |                         * (CAST(1 AS BIGINT) << (4 * (12 - i))))) AS BIGINT)
          |                  % 1000000007)),
          |         (acc, h) -> (acc * 1000003 + h) % 1000000007) AS rfp
          |FROM documents ORDER BY doc_id""".stripMargin),
    ),

    // ---- benchmark decontamination: flag training docs sharing any word
    //      3-gram with the held-out benchmark set (doc_id % 97 == 0).
    //      At 100 TB the benchmark gram set is tiny by construction →
    //      broadcast hash join against the training gram stream; grams
    //      travel as fixed-width md5 hashes, never the raw text. ----
    QueryDef(
      "doc_decontam",
      (sp, dir) => {
        // native shingles (codegen) after a cheap raw-text guard +
        // repartition — the single-split local parquet otherwise runs the
        // whole gram build on one core (no-op on a many-split cluster).
        // The benchmark set is ~1% of docs by construction, so its gram
        // table is built from THAT slice directly (tiny scan) rather than
        // by filtering a materialized full gram table — the training leg
        // then runs as one fused scan→explode→join→agg pass, nothing
        // cached, nothing computed twice.
        // grouping-only gram keys: the native 64-bit shingle hashes skip
        // materializing gram strings and the md5 per gram — 8-byte join
        // keys instead of 32-char strings (the key never leaves the
        // pipeline; only the per-doc overlap count is output)
        def grams(docs: DataFrame) = docs
          .filter(size(split(col("text"), " ")) >= 3)
          .repartition(sp.sparkContext.defaultParallelism)
          .select(col("doc_id"), explode(graft.functions.TextFunctions
            .word_shingle_hashes(col("text"), 3, distinct = true)).as("gh"))
        val doc = Tables.documents(sp, dir)
        val bench = grams(doc.filter(col("doc_id") % 97 === 0))
          .select(col("gh").as("bh")).distinct()
        grams(doc.filter(col("doc_id") % 97 =!= 0))
          .join(broadcast(bench), col("gh") === col("bh"))
          // (doc_id, gh) is already distinct upstream → plain count
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shared"))
          .orderBy("doc_id")
      },
      Some(
        """WITH t AS (
          |  SELECT doc_id, string_split(text, ' ') AS toks
          |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
          |g AS (
          |  SELECT DISTINCT doc_id,
          |         md5(array_to_string(toks[idx : idx + 2], ' ')) AS gh
          |  FROM t, unnest(generate_series(1, len(toks) - 2)) AS u(idx)),
          |bench AS (SELECT DISTINCT gh FROM g WHERE doc_id % 97 = 0)
          |SELECT g.doc_id, count(*) AS n_shared
          |FROM g JOIN bench USING (gh)
          |WHERE g.doc_id % 97 <> 0
          |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin),
    ),

    // ---- repetition scoring: duplicate word-3-gram fraction per doc —
    //      the standard "repetitious text" quality signal. Pure narrow
    //      per-row work (array ops inside the row), no shuffle at all. ----
    QueryDef(
      "doc_repetition",
      (sp, dir) =>
        Tables.documents(sp, dir)
          // cheap raw guard (≙ size(gs) > 0) keeps the heavy shingle
          // expression out of the pushed-down filter; repartition spreads
          // the single local split (cluster no-op); native shingles codegen
          .filter(size(split(col("text"), " ")) >= 3)
          .repartition(sp.sparkContext.defaultParallelism)
          .select(col("doc_id"),
            graft.functions.TextFunctions.word_shingles(col("text"), 3).as("gs"))
          .select(col("doc_id"),
            size(col("gs")).cast("long").as("n_grams"),
            size(array_distinct(col("gs"))).cast("long").as("n_distinct"))
          // exact-int numerator / double denominator: bit-identical ratio
          .withColumn("rep_ratio",
            (col("n_grams") - col("n_distinct")) / col("n_grams").cast("double"))
          .orderBy("doc_id"),
      Some(
        """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
          |g AS (
          |  SELECT doc_id,
          |         list_transform(generate_series(1, len(toks) - 2),
          |           i -> array_to_string(toks[i : i + 2], ' ')) AS gs
          |  FROM t WHERE len(toks) >= 3)
          |SELECT doc_id,
          |       CAST(len(gs) AS BIGINT) AS n_grams,
          |       CAST(len(list_distinct(gs)) AS BIGINT) AS n_distinct,
          |       (len(gs) - len(list_distinct(gs))) / CAST(len(gs) AS DOUBLE) AS rep_ratio
          |FROM g ORDER BY doc_id""".stripMargin),
    ),

    // ---- PII redaction: the scrubbing pass every training corpus takes
    //      before release — emails and IPv4s replaced by typed tags via
    //      regexp_replace (narrow, codegen'd, scan-speed at any size).
    //      The synthetic corpus carries no organic PII, so the fixture is
    //      PLANTED deterministically from doc_id (the PNG/WAV/GIF
    //      pattern): every doc gains one email, every third an IP. Both
    //      the match counts and an md5 over the scrubbed text are oracled
    //      — DuckDB must agree on the regex semantics (RE2-safe pattern:
    //      no backrefs/lookaround) AND the byte-exact redacted output. ----
    QueryDef(
      "doc_pii_scrub",
      (sp, dir) => {
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
        val withPii = Tables.documents(sp, dir)
          .select(col("doc_id"), col("source"),
            concat_ws(" ", col("text"),
              concat(lit("user"), col("doc_id").cast("string"), lit("@example.com")),
              when(col("doc_id") % 3 === 0,
                concat(lit("from 10.0."), (col("doc_id") % 256).cast("string"),
                  lit("."), (col("doc_id") % 100).cast("string")))
                .otherwise(lit("")))
              .as("text"))
        withPii
          .withColumn("n_emails", regexp_count(col("text"), lit(emailRe)))
          .withColumn("n_ips", regexp_count(col("text"), lit(ipRe)))
          .withColumn("scrubbed", regexp_replace(
            regexp_replace(col("text"), emailRe, "<EMAIL>"), ipRe, "<IP>"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_emails")).cast("long").as("n_emails"),
            sum(col("n_ips")).cast("long").as("n_ips"),
            min(md5(col("scrubbed"))).as("scrub_md5"))
          .orderBy("source")
      },
      Some(
        """WITH p AS (
          |  SELECT doc_id, source,
          |         concat_ws(' ', text,
          |                   'user' || doc_id || '@example.com',
          |                   CASE WHEN doc_id % 3 = 0
          |                        THEN 'from 10.0.' || doc_id % 256 || '.' || doc_id % 100
          |                        ELSE '' END) AS text
          |  FROM documents),
          |s AS (
          |  SELECT source,
          |         len(regexp_extract_all(text,
          |             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
          |         len(regexp_extract_all(text,
          |             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ips,
          |         regexp_replace(regexp_replace(text,
          |             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
          |             '<EMAIL>', 'g'),
          |             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
          |             '<IP>', 'g') AS scrubbed
          |  FROM p)
          |SELECT source, count(*) AS n_docs,
          |       CAST(sum(n_emails) AS BIGINT) AS n_emails,
          |       CAST(sum(n_ips) AS BIGINT) AS n_ips,
          |       min(md5(scrubbed)) AS scrub_md5
          |FROM s GROUP BY source ORDER BY source""".stripMargin),
    ),

    // ---- quality-filter chain: the C4/Gopher-style keep/drop pass a
    //      pretraining corpus takes after feature extraction, with
    //      FIRST-FAILING-RULE drop attribution (fixed rule order: length
    //      → uniq ratio → stopword ratio → 3-gram repetition) so the
    //      per-source report explains WHERE the corpus is losing mass.
    //      Every threshold is compared in INTEGER form (n_uniq*10 >=
    //      n_tokens*3, never uniq_ratio >= 0.3): no float boundary can
    //      disagree between engines, so the counts are exact. One narrow
    //      scan-speed pass + one tiny groupBy(source). ----
    QueryDef(
      "doc_quality_filter",
      (sp, dir) => {
        val w = tokens(col("text"))
        val gs = graft.functions.TextFunctions.word_shingles(col("text"), 3)
        val feat = Tables.documents(sp, dir)
          .repartition(sp.sparkContext.defaultParallelism)
          .select(col("source"), col("n_chars"),
            size(w).as("n_tok"),
            size(array_distinct(w)).as("n_uniq"),
            size(filter(w, t => t.isInCollection(Stopwords))).as("n_stop"),
            size(gs).as("n_grams"),
            size(array_distinct(gs)).as("n_dist_grams"))
        val verdict = when(col("n_tok") < 10 || col("n_tok") > 1000, "len")
          .when(col("n_uniq") * 10 < col("n_tok") * 3, "uniq")
          .when(col("n_stop") * 10 > col("n_tok") * 6, "stop")
          .when((col("n_grams") - col("n_dist_grams")) * 2 > col("n_grams"), "rep")
          .otherwise("kept")
        feat.withColumn("verdict", verdict)
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum((col("verdict") === "kept").cast("long")).as("n_kept"),
            sum(when(col("verdict") === "kept", col("n_chars"))
              .otherwise(lit(0L))).as("kept_chars"),
            sum((col("verdict") === "len").cast("long")).as("n_drop_len"),
            sum((col("verdict") === "uniq").cast("long")).as("n_drop_uniq"),
            sum((col("verdict") === "stop").cast("long")).as("n_drop_stop"),
            sum((col("verdict") === "rep").cast("long")).as("n_drop_rep"))
          .orderBy("source")
      },
      Some(
        """WITH f AS (
          |  SELECT source, n_chars,
          |         len(string_split(text, ' ')) AS n_tok,
          |         len(list_distinct(string_split(text, ' '))) AS n_uniq,
          |         len(list_filter(string_split(text, ' '),
          |             t -> list_contains(['the','a','of','and','to','in','is','on','for','with'], t))) AS n_stop,
          |         greatest(len(string_split(text, ' ')) - 2, 0) AS n_grams,
          |         CASE WHEN len(string_split(text, ' ')) >= 3 THEN
          |           len(list_distinct(list_transform(
          |             generate_series(1, len(string_split(text, ' ')) - 2),
          |             i -> array_to_string(string_split(text, ' ')[i : i + 2], ' '))))
          |         ELSE 0 END AS n_dist_grams
          |  FROM documents),
          |v AS (
          |  SELECT source, n_chars,
          |         CASE WHEN n_tok < 10 OR n_tok > 1000 THEN 'len'
          |              WHEN n_uniq * 10 < n_tok * 3 THEN 'uniq'
          |              WHEN n_stop * 10 > n_tok * 6 THEN 'stop'
          |              WHEN (n_grams - n_dist_grams) * 2 > n_grams THEN 'rep'
          |              ELSE 'kept' END AS verdict
          |  FROM f)
          |SELECT source, count(*) AS n_docs,
          |       CAST(sum(CASE WHEN verdict = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
          |       CAST(sum(CASE WHEN verdict = 'kept' THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
          |       CAST(sum(CASE WHEN verdict = 'len' THEN 1 ELSE 0 END) AS BIGINT) AS n_drop_len,
          |       CAST(sum(CASE WHEN verdict = 'uniq' THEN 1 ELSE 0 END) AS BIGINT) AS n_drop_uniq,
          |       CAST(sum(CASE WHEN verdict = 'stop' THEN 1 ELSE 0 END) AS BIGINT) AS n_drop_stop,
          |       CAST(sum(CASE WHEN verdict = 'rep' THEN 1 ELSE 0 END) AS BIGINT) AS n_drop_rep
          |FROM v GROUP BY source ORDER BY source""".stripMargin),
    ),

    // ---- BM25 keyword search (see [[bm25]]): rounded-score ranking
    //      with doc_id tie-break → the top-20 cut is deterministic
    //      cross-engine; orderBy+limit plans as TakeOrderedAndProject
    //      (per-partition heaps, no global sort). ----
    QueryDef(
      "doc_bm25",
      (sp, dir) =>
        bm25(Tables.documents(sp, dir), Seq("spark", "join", "filter"))
          .limit(20),
      Some(
        """WITH f AS (
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
          |  FROM f)
          |SELECT doc_id, tf_spark, tf_join, tf_filter,
          |       round(
          |         ln(1.0 + (n_docs - df_spark + 0.5) / (df_spark + 0.5)) *
          |           (tf_spark * 2.2) /
          |           (tf_spark + 1.2 * (0.25 + 0.75 * (dl / (sum_dl * 1.0 / n_docs)))) +
          |         ln(1.0 + (n_docs - df_join + 0.5) / (df_join + 0.5)) *
          |           (tf_join * 2.2) /
          |           (tf_join + 1.2 * (0.25 + 0.75 * (dl / (sum_dl * 1.0 / n_docs)))) +
          |         ln(1.0 + (n_docs - df_filter + 0.5) / (df_filter + 0.5)) *
          |           (tf_filter * 2.2) /
          |           (tf_filter + 1.2 * (0.25 + 0.75 * (dl / (sum_dl * 1.0 / n_docs)))), 4) + 0.0
          |         AS bm25_r
          |FROM f, s
          |WHERE tf_spark > 0 OR tf_join > 0 OR tf_filter > 0
          |ORDER BY bm25_r DESC, doc_id LIMIT 20""".stripMargin),
    ),

    // ---- cross-source contamination matrix (see [[crossOverlap]]). ----
    QueryDef(
      "doc_cross_overlap",
      (sp, dir) => crossOverlap(Tables.documents(sp, dir)),
      Some(
        """WITH t AS (
          |  SELECT source, string_split(text, ' ') AS toks
          |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
          |g AS (
          |  SELECT DISTINCT source,
          |         md5(array_to_string(toks[idx : idx + 2], ' ')) AS gh
          |  FROM t, unnest(generate_series(1, len(toks) - 2)) AS u(idx)),
          |c AS (SELECT source, count(*) AS n_sh FROM g GROUP BY 1)
          |SELECT x.source AS src_a, y.source AS src_b,
          |       count(*) AS n_shared,
          |       count(*) / CAST(ca.n_sh + cb.n_sh - count(*) AS DOUBLE) AS jaccard
          |FROM g x
          |JOIN g y ON x.gh = y.gh AND x.source < y.source
          |JOIN c ca ON ca.source = x.source
          |JOIN c cb ON cb.source = y.source
          |GROUP BY x.source, y.source, ca.n_sh, cb.n_sh
          |ORDER BY 1, 2""".stripMargin),
    ),

    // ---- corpus-wide boilerplate span REMOVAL (see [[boilerplateStrip]]):
    //      the C4/CCNet strip pass doc_cross_overlap only measures. The
    //      hash covers the full stripped text of every document, so a
    //      mis-marked position, an off-by-one span cover, or a reassembly
    //      order bug all fail loudly. ----
    QueryDef(
      "doc_boilerplate_strip",
      (sp, dir) => boilerplateStrip(Tables.documents(sp, dir)),
      Some(
        """WITH t AS (
          |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
          |g AS (
          |  SELECT doc_id, idx AS s,
          |         md5(array_to_string(toks[idx : idx + 2], ' ')) AS gh
          |  FROM t, unnest(generate_series(1, len(toks) - 2)) AS u(idx)
          |  WHERE len(toks) >= 3),
          |b AS (SELECT gh FROM g GROUP BY gh
          |      HAVING count(DISTINCT doc_id) >= 5),
          |bad AS (
          |  SELECT DISTINCT g.doc_id, g.s + k.k AS pos
          |  FROM g JOIN b USING (gh), (VALUES (0), (1), (2)) k(k)),
          |tok AS (
          |  SELECT doc_id, idx AS pos, toks[idx] AS w
          |  FROM t, unnest(generate_series(1, len(toks))) AS u(idx))
          |SELECT tok.doc_id,
          |       CAST(count(*) AS BIGINT) AS n_tok,
          |       CAST(sum(CASE WHEN bad.pos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
          |       coalesce(array_to_string(
          |         list(tok.w ORDER BY tok.pos) FILTER (WHERE bad.pos IS NULL),
          |         ' '), '') AS stripped
          |FROM tok
          |LEFT JOIN bad ON bad.doc_id = tok.doc_id AND bad.pos = tok.pos
          |GROUP BY tok.doc_id
          |ORDER BY tok.doc_id""".stripMargin),
    ),

    // ---- exact-substring dedup, keep-first (see [[substringDedup]]):
    //      Lee et al. ACL'22 at 5-token window grain. The oracle ranks
    //      each gram's occurrences by (doc_id, s) and strips rank > 1;
    //      the hash covers the full deduped text, so a survivor stripped,
    //      a repeat kept, or first-occurrence order broken all fail. ----
    QueryDef(
      "doc_substring_dedup",
      (sp, dir) => substringDedup(Tables.documents(sp, dir)),
      Some(
        """WITH t AS (
          |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
          |g AS (
          |  SELECT doc_id, idx AS s,
          |         md5(array_to_string(toks[idx : idx + 4], ' ')) AS gh
          |  FROM t, unnest(generate_series(1, len(toks) - 4)) AS u(idx)
          |  WHERE len(toks) >= 5),
          |o AS (
          |  SELECT doc_id, s,
          |         row_number() OVER (PARTITION BY gh ORDER BY doc_id, s) AS rn,
          |         count(*) OVER (PARTITION BY gh) AS n
          |  FROM g),
          |bad AS (
          |  SELECT DISTINCT doc_id, s + k.k AS pos
          |  FROM o, (VALUES (0), (1), (2), (3), (4)) k(k)
          |  WHERE n > 1 AND rn > 1),
          |tok AS (
          |  SELECT doc_id, idx AS pos, toks[idx] AS w
          |  FROM t, unnest(generate_series(1, len(toks))) AS u(idx))
          |SELECT tok.doc_id,
          |       CAST(count(*) AS BIGINT) AS n_tok,
          |       CAST(sum(CASE WHEN bad.pos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
          |       coalesce(array_to_string(
          |         list(tok.w ORDER BY tok.pos) FILTER (WHERE bad.pos IS NULL),
          |         ' '), '') AS deduped
          |FROM tok
          |LEFT JOIN bad ON bad.doc_id = tok.doc_id AND bad.pos = tok.pos
          |GROUP BY tok.doc_id
          |ORDER BY tok.doc_id""".stripMargin),
    ),

    // ---- MAXIMAL-SPAN substring dedup (see [[substringSpanDedup]]):
    //      Lee et al.'s ≥-threshold semantics — duplicated windows merge
    //      into maximal spans (interval merge per document) and only
    //      spans ≥ 20 tokens strip; the length-5 idiomatic collisions
    //      the window-grain pass removes stay IN the corpus here. The
    //      oracle replays ownership, the gaps-and-islands merge
    //      (cumulative-max break detection), the threshold, and the
    //      reassembly; n_spans hashes the span structure itself. A
    //      mis-merged island, an off-by-one span end, or a threshold
    //      applied to starts instead of covered tokens all break it. ----
    QueryDef(
      "doc_substring_spans",
      (sp, dir) => substringSpanDedup(Tables.documents(sp, dir)),
      Some(
        """WITH t AS (
          |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
          |g AS (
          |  SELECT doc_id, idx AS s,
          |         md5(array_to_string(toks[idx : idx + 4], ' ')) AS gh
          |  FROM t, unnest(generate_series(1, len(toks) - 4)) AS u(idx)
          |  WHERE len(toks) >= 5),
          |o AS (
          |  SELECT doc_id, s,
          |         row_number() OVER (PARTITION BY gh ORDER BY doc_id, s) AS rn,
          |         count(*) OVER (PARTITION BY gh) AS n
          |  FROM g),
          |ds AS (SELECT DISTINCT doc_id, s FROM o WHERE n > 1 AND rn > 1),
          |isl AS (
          |  SELECT doc_id, s,
          |         CASE WHEN s > coalesce(max(s + 4) OVER (
          |                PARTITION BY doc_id ORDER BY s
          |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
          |              -1) + 1
          |              THEN 1 ELSE 0 END AS brk
          |  FROM ds),
          |isl2 AS (
          |  SELECT doc_id, s,
          |         sum(brk) OVER (PARTITION BY doc_id ORDER BY s
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isle
          |  FROM isl),
          |sp AS (
          |  SELECT doc_id, isle, min(s) AS a, max(s) + 4 AS b
          |  FROM isl2 GROUP BY 1, 2
          |  HAVING max(s) + 4 - min(s) + 1 >= 20),
          |bad AS (SELECT DISTINCT doc_id, u.pos
          |        FROM sp, unnest(generate_series(a, b)) AS u(pos)),
          |nsp AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans
          |        FROM sp GROUP BY 1),
          |tok AS (
          |  SELECT doc_id, idx AS pos, toks[idx] AS w
          |  FROM t, unnest(generate_series(1, len(toks))) AS u(idx)),
          |agg AS (
          |  SELECT tok.doc_id,
          |         CAST(count(*) AS BIGINT) AS n_tok,
          |         CAST(sum(CASE WHEN bad.pos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
          |         coalesce(array_to_string(
          |           list(tok.w ORDER BY tok.pos) FILTER (WHERE bad.pos IS NULL),
          |           ' '), '') AS deduped
          |  FROM tok
          |  LEFT JOIN bad ON bad.doc_id = tok.doc_id AND bad.pos = tok.pos
          |  GROUP BY tok.doc_id)
          |SELECT agg.doc_id, agg.n_tok, agg.n_removed,
          |       coalesce(nsp.n_spans, 0) AS n_spans, agg.deduped
          |FROM agg LEFT JOIN nsp ON nsp.doc_id = agg.doc_id
          |ORDER BY agg.doc_id""".stripMargin),
    ),

    // ---- n-gram LM quality scoring (the CCNet/KenLM filter shape): a
    //      word-BIGRAM model with add-1 smoothing is trained on the
    //      corpus in two count aggregations, then every document is
    //      scored by its cross-entropy under that model — high = unlike
    //      the corpus (noise/boilerplate candidates), the standard
    //      perplexity-bucket signal for pretraining filtration. Scale
    //      shape: one token shuffle (doc-partitioned lead window), two
    //      vocabulary-sized count tables on the join side, and a scalar
    //      vocab size riding a broadcast cross join — the corpus is
    //      never re-read per doc. ln is the one non-bit-reproducible
    //      step across engines, so the output rounds to 4 decimals and
    //      orders on the unique doc_id (§verify float-determinism
    //      contract).
    QueryDef(
      "doc_lm_score",
      (sp, dir) => {
        import org.apache.spark.sql.expressions.Window
        val tok = Tables.documents(sp, dir)
          .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        val byDoc = Window.partitionBy("doc_id").orderBy("pos")
        val big = tok
          .withColumn("w2", lead(col("w"), 1).over(byDoc))
          .filter(col("w2").isNotNull)
          .select("doc_id", "w", "w2")
        val bigCnt = big.groupBy("w", "w2").agg(count(lit(1)).as("cb"))
        val preCnt = big.groupBy("w").agg(count(lit(1)).as("cp"))
        val vocab = tok.agg(countDistinct(col("w")).as("vv"))
        big.join(bigCnt, Seq("w", "w2"))
          .join(preCnt, Seq("w"))
          .crossJoin(broadcast(vocab))
          .withColumn("lp", log((col("cb") + lit(1.0)) / (col("cp") + col("vv"))))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            roundCanon(-avg(col("lp")), 4).as("cross_entropy"))
          .orderBy("doc_id")
      },
      Some(
        """WITH tok AS (
          |  SELECT doc_id, unnest(l) AS w,
          |         unnest(range(1, len(l) + 1)) AS pos
          |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)),
          |big AS (
          |  SELECT * FROM (
          |    SELECT doc_id, w, lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
          |    FROM tok)
          |  WHERE w2 IS NOT NULL),
          |bc AS (SELECT w, w2, count(*) AS cb FROM big GROUP BY 1, 2),
          |pc AS (SELECT w, count(*) AS cp FROM big GROUP BY 1),
          |v AS (SELECT count(DISTINCT w) AS vv FROM tok)
          |SELECT b.doc_id, count(*) AS n_bigrams,
          |       round(-avg(ln((bc.cb + 1.0) / (pc.cp + v.vv))), 4) + 0.0 AS cross_entropy
          |FROM big b
          |JOIN bc ON b.w = bc.w AND b.w2 = bc.w2
          |JOIN pc ON b.w = pc.w
          |CROSS JOIN v
          |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin),
    ),

    // ---- URL-level dedup: canonicalize crawl URLs, then group identical
    //      canonical forms. The fixture builds a deterministic MESSY url
    //      per doc (case-varied scheme/host, www prefix, default port,
    //      tracking params, fragment, trailing slash — all keyed off
    //      doc_id residues) over a shared base key (doc_id % 500), so
    //      ~500 canonical pages each arrive under many raw spellings; the
    //      protocol (http/https) derives from the BASE key, because
    //      canonicalization must never merge across protocols. The oracle
    //      rebuilds the same messy string and replays the same RE2
    //      pipeline — the canonical string itself is the group key, so
    //      content (not just counts) is verified. groupBy canonical_url
    //      shuffles one short string per doc; at crawl scale this is the
    //      standard first dedup stage (exact-URL) before content dedup. ----
    QueryDef(
      "doc_url_dedup",
      (sp, dir) => {
        val base = col("doc_id") % 500
        val proto = when(base % 2 === 0, lit("http")).otherwise(lit("https"))
        val schemeStr = when(col("doc_id") % 2 === 0, upper(proto)).otherwise(proto)
        val hostStr = when(col("doc_id") % 3 === 0, lit("Example.COM"))
          .when(col("doc_id") % 3 === 1, lit("www.example.com"))
          .otherwise(lit("example.com"))
        val portStr = when(col("doc_id") % 5 === 0,
          when(proto === "http", lit(":80")).otherwise(lit(":443"))).otherwise(lit(""))
        val pathStr = concat(lit("/catalog/item-"), base,
          when(col("doc_id") % 6 === 0, lit("/")).otherwise(lit("")))
        val queryStr = concat(lit("?id="), base,
          when(col("doc_id") % 2 === 0, lit("&utm_source=feed&utm_campaign=c1"))
            .otherwise(lit("")),
          when(col("doc_id") % 7 === 0, lit("&gclid=g123")).otherwise(lit("")))
        val fragStr = when(col("doc_id") % 3 === 0, lit("#frag")).otherwise(lit(""))
        val url = concat(schemeStr, lit("://"), hostStr, portStr, pathStr,
          queryStr, fragStr)
        Tables.documents(sp, dir)
          .select(col("doc_id"), url.as("raw_url"))
          .select(col("doc_id"), col("raw_url"),
            canonicalizeUrl(col("raw_url")).as("canonical_url"))
          .groupBy("canonical_url")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("raw_url")).as("n_spellings"),
            min(col("doc_id")).as("keep_doc"))
          .orderBy("canonical_url")
      },
      Some(
        """WITH u AS (
          |  SELECT doc_id,
          |    (CASE WHEN doc_id % 2 = 0
          |          THEN upper(CASE WHEN (doc_id % 500) % 2 = 0 THEN 'http' ELSE 'https' END)
          |          ELSE CASE WHEN (doc_id % 500) % 2 = 0 THEN 'http' ELSE 'https' END END)
          |    || '://'
          |    || (CASE WHEN doc_id % 3 = 0 THEN 'Example.COM'
          |             WHEN doc_id % 3 = 1 THEN 'www.example.com'
          |             ELSE 'example.com' END)
          |    || (CASE WHEN doc_id % 5 = 0
          |             THEN CASE WHEN (doc_id % 500) % 2 = 0 THEN ':80' ELSE ':443' END
          |             ELSE '' END)
          |    || '/catalog/item-' || (doc_id % 500)
          |    || (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END)
          |    || '?id=' || (doc_id % 500)
          |    || (CASE WHEN doc_id % 2 = 0 THEN '&utm_source=feed&utm_campaign=c1' ELSE '' END)
          |    || (CASE WHEN doc_id % 7 = 0 THEN '&gclid=g123' ELSE '' END)
          |    || (CASE WHEN doc_id % 3 = 0 THEN '#frag' ELSE '' END) AS raw_url
          |  FROM documents),
          |c AS (
          |  SELECT doc_id, raw_url,
          |    lower(regexp_extract(raw_url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
          |    || '://'
          |    || (CASE
          |          WHEN lower(regexp_extract(raw_url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) = 'http'
          |          THEN regexp_replace(regexp_replace(lower(regexp_extract(raw_url,
          |                 '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), '^www\.', ''), ':80$', '')
          |          WHEN lower(regexp_extract(raw_url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) = 'https'
          |          THEN regexp_replace(regexp_replace(lower(regexp_extract(raw_url,
          |                 '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), '^www\.', ''), ':443$', '')
          |          ELSE regexp_replace(lower(regexp_extract(raw_url,
          |                 '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), '^www\.', '')
          |        END)
          |    || regexp_replace(regexp_extract(
          |         regexp_replace(regexp_replace(raw_url,
          |           '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''), '#.*$', ''),
          |         '^([^?]*)', 1), '/+$', '')
          |    || (CASE WHEN regexp_replace(regexp_replace(
          |               '&' || regexp_extract(regexp_replace(regexp_replace(raw_url,
          |                 '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''), '#.*$', ''),
          |                 '\?(.*)$', 1),
          |               '&(utm_[a-z0-9_]+|fbclid|gclid)=[^&]*', '', 'g'), '^&', '') = ''
          |             THEN ''
          |             ELSE '?' || regexp_replace(regexp_replace(
          |               '&' || regexp_extract(regexp_replace(regexp_replace(raw_url,
          |                 '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''), '#.*$', ''),
          |                 '\?(.*)$', 1),
          |               '&(utm_[a-z0-9_]+|fbclid|gclid)=[^&]*', '', 'g'), '^&', '')
          |        END) AS canonical_url
          |  FROM u)
          |SELECT canonical_url, count(*) AS n_docs,
          |       count(DISTINCT raw_url) AS n_spellings,
          |       min(doc_id) AS keep_doc
          |FROM c GROUP BY canonical_url ORDER BY canonical_url""".stripMargin),
    ),

    // ---- Unicode NFC normalization: the canonical-composition pass that
    //      runs BEFORE any fingerprinting (composed U+00E9 and decomposed
    //      e+U+0301 are different byte strings — every dedup hash
    //      diverges on them unless spelling is canonicalized). The
    //      fixture appends a deterministic suffix per doc_id % 4: three
    //      decomposed classes (combining acute, combining ring, Hangul
    //      jamo — each COMPOSES under NFC) and one already-composed
    //      control (must pass through untouched, exercising the
    //      isNormalized zero-allocation fast path). Spark side runs the
    //      native [[graft.functions.NfcNormalize]] expression; the
    //      oracle replays with DuckDB's nfc_normalize — two independent
    //      Unicode implementations pinned equal on content (min/max of
    //      the normalized strings cross the compare, not just counts).
    //      Per-class aggregate output: 4 rows at any corpus size. ----
    QueryDef(
      "doc_nfc_normalize",
      (sp, dir) => {
        // escape sequences, not glyphs (an editor could silently
        // re-compose pasted text): cases 0-2 are DECOMPOSED (e + combining
        // acute, A + combining ring, Hangul jamo), case 3 the composed
        // control U+00E9
        val suffix = when(col("doc_id") % 4 === 0, lit("e\u0301"))
          .when(col("doc_id") % 4 === 1, lit("A\u030A"))
          .when(col("doc_id") % 4 === 2, lit("\u1100\u1161\u11A8"))
          .otherwise(lit("\u00E9"))
        val raw = concat(substring(col("text"), 1, 24), lit(" "), suffix)
        Tables.documents(sp, dir)
          .select((col("doc_id") % 4).as("case_id"), raw.as("raw"))
          .select(col("case_id"), col("raw"),
            graft.functions.TextFunctions.nfc_normalize(col("raw")).as("norm"))
          .groupBy("case_id")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("norm") =!= col("raw"), 1L).otherwise(0L))
              .as("n_changed"),
            sum(length(col("raw"))).as("cp_before"),
            sum(length(col("norm"))).as("cp_after"),
            min(col("norm")).as("sample_norm"))
          .orderBy("case_id")
      },
      Some(
        """WITH d AS (
          |  SELECT doc_id % 4 AS case_id,
          |         substr(text, 1, 24) || ' ' ||
          |         (CASE WHEN doc_id % 4 = 0 THEN 'e' || chr(769)
          |               WHEN doc_id % 4 = 1 THEN 'A' || chr(778)
          |               WHEN doc_id % 4 = 2 THEN chr(4352) || chr(4449) || chr(4520)
          |               ELSE chr(233) END) AS raw
          |  FROM documents),
          |n AS (SELECT case_id, raw, nfc_normalize(raw) AS norm FROM d)
          |SELECT case_id, count(*) AS n_docs,
          |       CAST(sum(CASE WHEN norm <> raw THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
          |       CAST(sum(length(raw)) AS BIGINT) AS cp_before,
          |       CAST(sum(length(norm)) AS BIGINT) AS cp_after,
          |       min(norm) AS sample_norm
          |FROM n GROUP BY case_id ORDER BY case_id""".stripMargin),
    ),

    // ---- Domain blocklist filter: drop crawl docs whose host falls
    //      under a blocked REGISTRABLE DOMAIN — subdomain-suffix
    //      semantics ("tracker-net.com" blocks "cdn.tracker-net.com"
    //      too), the standard crawl-exclusion rule. Scale shape: each
    //      host expands to its label-suffix tails (bounded fan-out =
    //      label count, ≤4 here) and the verdict is an EQUI-join of
    //      suffixes against the broadcast blocklist — linear in corpus
    //      and correct for a MILLION-domain blocklist, where the naive
    //      `endswith any` predicate is a non-equi scan per domain. (For
    //      a literal handful of domains, `arrays_overlap` against a lit
    //      array is narrower still — the join path is registered because
    //      it is the production shape.) The oracle replays suffix
    //      expansion with DuckDB list slicing and verifies per-host
    //      verdicts AND which domain matched, not just counts. ----
    QueryDef(
      "doc_domain_filter",
      (sp, dir) => {
        val hosts = Seq("news.example.org", "cdn.tracker-net.com",
          "blog.example.org", "tracker-net.com", "shop.goodsite.io",
          "a.b.spamfarm.net", "docs.goodsite.io", "spamfarm.net")
        val blocked = Seq("tracker-net.com", "spamfarm.net")
        val host = element_at(
          array(hosts.map(lit): _*), (col("doc_id") % 8).cast("int") + 1)
        val docs = Tables.documents(sp, dir)
          .select(col("doc_id"), host.as("host"),
            split(host, "\\.").as("labels"))
        val suffixes = docs.select(col("doc_id"), col("host"),
          explode(transform(sequence(lit(1), size(col("labels"))),
            i => concat_ws(".", slice(col("labels"), i,
              size(col("labels")) - i + 1)))).as("suffix"))
        val bl = sp.createDataFrame(
          blocked.map(Tuple1(_))).toDF("domain")
        val hits = suffixes
          .join(broadcast(bl), col("suffix") === col("domain"))
          .groupBy("doc_id").agg(min(col("domain")).as("blocked_by"))
        docs.join(hits, Seq("doc_id"), "left")
          .groupBy(col("host"),
            when(col("blocked_by").isNotNull, "BLOCKED")
              .otherwise("KEPT").as("verdict"),
            coalesce(col("blocked_by"), lit("")).as("blocked_by"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("host")
      },
      Some(
        """WITH d AS (
          |  SELECT doc_id,
          |         (['news.example.org', 'cdn.tracker-net.com',
          |           'blog.example.org', 'tracker-net.com', 'shop.goodsite.io',
          |           'a.b.spamfarm.net', 'docs.goodsite.io', 'spamfarm.net'])
          |           [CAST(doc_id % 8 AS INTEGER) + 1] AS host
          |  FROM documents),
          |s AS (
          |  SELECT doc_id, host,
          |         array_to_string(string_split(host, '.')[i:], '.') AS suffix
          |  FROM d, (SELECT unnest(generate_series(1, 4)) AS i)
          |  WHERE i <= len(string_split(host, '.'))),
          |hits AS (
          |  SELECT doc_id, min(b.domain) AS blocked_by
          |  FROM s JOIN (SELECT unnest(['tracker-net.com', 'spamfarm.net']) AS domain) b
          |    ON s.suffix = b.domain
          |  GROUP BY doc_id)
          |SELECT d.host,
          |       CASE WHEN h.blocked_by IS NOT NULL THEN 'BLOCKED' ELSE 'KEPT' END AS verdict,
          |       COALESCE(h.blocked_by, '') AS blocked_by,
          |       count(*) AS n_docs
          |FROM d LEFT JOIN hits h ON d.doc_id = h.doc_id
          |GROUP BY 1, 2, 3 ORDER BY host""".stripMargin),
    ),

    // ---- Gopher-style repetition rules: the char-WEIGHTED quality
    //      signals (Rae et al. 2021 §A1.1) that complement the count
    //      fraction in doc_repetition — (a) fraction of characters
    //      inside occurrences of the single most common word 2-gram,
    //      (b) fraction of characters inside duplicated word 5-grams
    //      (each occurrence counted, the paper's definition), and the
    //      keep/drop verdict at the conventional 0.20 / 0.15 cut-offs.
    //      Everything is computed INSIDE the row with higher-order
    //      array functions — O(tokens²) per doc with bounded doc size,
    //      zero shuffle, scan speed at 100 TB (vs the explode+groupBy
    //      shape whose gram shuffle carries the whole corpus). The
    //      fractions leave the row as exact integer micro-units:
    //      floor(1e6·a/b) with a,b exact ints, b ≤ doc length — a single
    //      double division whose rational value sits ≥ 1/b from any
    //      integer, so truncation lands identically to DuckDB's BIGINT
    //      `//` and the hash compare is trivially exact. Ties
    //      for the top 2-gram resolve (count, then gram string) max —
    //      mirrored in the oracle via the same two-pass max. ----
    QueryDef(
      "doc_gopher_rules",
      (sp, dir) => {
        val g2 = graft.functions.TextFunctions.word_shingles(col("text"), 2)
        val g5 = graft.functions.TextFunctions.word_shingles(col("text"), 5)
        def cntIn(arr: Column, g: Column) = size(filter(arr, x => x === g))
        Tables.documents(sp, dir)
          .filter(size(split(col("text"), " ")) >= 5)
          .repartition(sp.sparkContext.defaultParallelism)
          .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
            g2.as("g2"), g5.as("g5"))
          .withColumn("top2_cnt",
            array_max(transform(array_distinct(col("g2")),
              g => cntIn(col("g2"), g))).cast("long"))
          .withColumn("top2_gram",
            array_max(filter(array_distinct(col("g2")),
              g => cntIn(col("g2"), g) === col("top2_cnt"))))
          .withColumn("dup5_chars",
            aggregate(col("g5"), lit(0L), (acc, g) =>
              acc + when(cntIn(col("g5"), g) > 1,
                length(g).cast("long")).otherwise(0L)))
          .select(col("doc_id"),
            (lit(1000000L) * col("top2_cnt") * length(col("top2_gram")) /
              col("n_chars")).cast("long").as("top2_micro"),
            (lit(1000000L) * col("dup5_chars") / col("n_chars"))
              .cast("long").as("dup5_micro"))
          .withColumn("verdict",
            when(col("top2_micro") < 200000 && col("dup5_micro") < 150000,
              "KEEP").otherwise("DROP"))
          .orderBy("doc_id")
      },
      Some(
        """WITH t AS (
          |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
          |         string_split(text, ' ') AS toks
          |  FROM documents WHERE len(string_split(text, ' ')) >= 5),
          |g AS (
          |  SELECT doc_id, n_chars,
          |         list_transform(generate_series(1, len(toks) - 1),
          |           i -> array_to_string(toks[i : i + 1], ' ')) AS g2,
          |         list_transform(generate_series(1, len(toks) - 4),
          |           i -> array_to_string(toks[i : i + 4], ' ')) AS g5
          |  FROM t),
          |c AS (
          |  SELECT doc_id, n_chars, g2, g5,
          |         list_max(list_transform(list_distinct(g2),
          |           x -> len(list_filter(g2, y -> y = x)))) AS top2_cnt
          |  FROM g),
          |m AS (
          |  SELECT doc_id, n_chars,
          |         CAST(top2_cnt AS BIGINT) AS top2_cnt,
          |         list_max(list_filter(list_distinct(g2),
          |           x -> len(list_filter(g2, y -> y = x)) = top2_cnt)) AS top2_gram,
          |         CAST(COALESCE(list_sum(list_transform(g5, x ->
          |           CASE WHEN len(list_filter(g5, y -> y = x)) > 1
          |                THEN CAST(length(x) AS BIGINT) ELSE 0 END)), 0)
          |           AS BIGINT) AS dup5_chars
          |  FROM c)
          |SELECT doc_id,
          |       (1000000 * top2_cnt * CAST(length(top2_gram) AS BIGINT))
          |         // n_chars AS top2_micro,
          |       (1000000 * dup5_chars) // n_chars AS dup5_micro,
          |       CASE WHEN (1000000 * top2_cnt * CAST(length(top2_gram) AS BIGINT))
          |                   // n_chars < 200000
          |              AND (1000000 * dup5_chars) // n_chars < 150000
          |            THEN 'KEEP' ELSE 'DROP' END AS verdict
          |FROM m ORDER BY doc_id""".stripMargin),
    ),

    // ---- HEAPS'-LAW vocabulary growth: distinct-token counts at four
    //      NESTED corpus prefixes (doc_id quartiles by max id) — the
    //      diversity/saturation diagnostic a curation pipeline reads
    //      before committing a corpus: a healthy mixed corpus keeps
    //      adding vocabulary (V ∝ n^β, β≈0.5); a near-duplicate-heavy or
    //      template-heavy one flattens early. One tokenize pass, one
    //      shuffle at TOKEN grain carrying four boolean membership flags
    //      (max-combined map-side), then a 4-row rollup — never four
    //      corpus scans, and the prefix sets are NESTED by construction
    //      so the growth curve is monotone. All counts integer. ----
    QueryDef(
      "doc_heaps_growth",
      (sp, dir) => {
        val docs = Tables.documents(sp, dir)
        val hi = docs.agg(max(col("doc_id"))).head().getLong(0)
        val cuts = Seq(1L, 2L, 3L, 4L).map(q => (hi + 1) * q / 4)
        val toks = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok") =!= "")
        // per token: the SMALLEST prefix containing it (min doc_id decides)
        val perTok = toks.groupBy("tok")
          .agg(min(col("doc_id")).as("first_doc"))
        val perPrefix = perTok
          .select(when(col("first_doc") < cuts(0), 1L)
            .when(col("first_doc") < cuts(1), 2L)
            .when(col("first_doc") < cuts(2), 3L)
            .otherwise(4L).as("q"))
          .groupBy("q").agg(count(lit(1)).as("new_vocab"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy("q").rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val tokCounts = toks
          .select(when(col("doc_id") < cuts(0), 1L)
            .when(col("doc_id") < cuts(1), 2L)
            .when(col("doc_id") < cuts(2), 3L)
            .otherwise(4L).as("q"))
          .groupBy("q").agg(count(lit(1)).as("toks_in_q"))
        perPrefix.join(tokCounts, Seq("q"), "full")
          .select(col("q"),
            coalesce(col("new_vocab"), lit(0L)).as("new_vocab"),
            coalesce(col("toks_in_q"), lit(0L)).as("toks_in_q"))
          .withColumn("vocab_cum", sum(col("new_vocab")).over(w))
          .withColumn("tokens_cum", sum(col("toks_in_q")).over(w))
          .select(col("q"), col("tokens_cum").cast("long").as("n_tokens"),
            col("vocab_cum").cast("long").as("n_vocab"))
          .orderBy("q")
      },
      Some(
        """WITH hi AS (SELECT max(doc_id) AS h FROM documents),
          |t AS (
          |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          |  FROM documents),
          |tf AS (SELECT doc_id, tok FROM t WHERE tok <> ''),
          |q AS (
          |  SELECT tf.doc_id, tf.tok,
          |         CASE WHEN tf.doc_id < (h + 1) * 1 // 4 THEN 1
          |              WHEN tf.doc_id < (h + 1) * 2 // 4 THEN 2
          |              WHEN tf.doc_id < (h + 1) * 3 // 4 THEN 3
          |              ELSE 4 END AS q
          |  FROM tf CROSS JOIN hi),
          |v AS (SELECT min(q) AS q FROM q GROUP BY tok),
          |nv AS (SELECT q, CAST(count(*) AS BIGINT) AS new_vocab
          |       FROM v GROUP BY 1),
          |tc AS (SELECT q, CAST(count(*) AS BIGINT) AS toks_in_q
          |       FROM q GROUP BY 1),
          |g AS (SELECT gs.q, COALESCE(nv.new_vocab, 0) AS new_vocab,
          |             COALESCE(tc.toks_in_q, 0) AS toks_in_q
          |      FROM (VALUES (1), (2), (3), (4)) gs(q)
          |      LEFT JOIN nv USING (q) LEFT JOIN tc USING (q)
          |      WHERE COALESCE(nv.new_vocab, 0) + COALESCE(tc.toks_in_q, 0)
          |            > 0)
          |SELECT CAST(q AS BIGINT) AS q,
          |       CAST(sum(toks_in_q) OVER (ORDER BY q) AS BIGINT)
          |         AS n_tokens,
          |       CAST(sum(new_vocab) OVER (ORDER BY q) AS BIGINT)
          |         AS n_vocab
          |FROM g ORDER BY q""".stripMargin),
    ),
  )
}
