package graft

import graft.ext.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // Distinct base docs + one exact copy + one near-copy (one word changed)
  // + one unrelated doc. Words drawn from disjoint vocabularies so the
  // unrelated pairs have jaccard ≈ 0.
  private val base =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima " +
      "mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray yankee zulu"
  private val nearCopy = base.replace("oscar", "OSCAR9")
  private val unrelated =
    "uno dos tres cuatro cinco seis siete ocho nueve diez once doce trece " +
      "catorce quince dieciseis diecisiete dieciocho diecinueve veinte ventiuno ventidos ventitres venticuatro venticinco ventiseis"

  private def docs = Seq(
    (0L, base), (1L, base), (2L, nearCopy), (3L, unrelated),
  ).toDF("doc_id", "text")

  test("lsh bucket stats expose oversized buckets before capping") {
    import spark.implicits._
    // 60 identical docs → every band hashes them into one bucket of 60
    val clones = (0L until 60L).map(i => (i, base)).toDF("doc_id", "text")
    val stats = Dedup.lshBucketStats(clones, maxBucket = 50).collect()(0)
    assert(stats.getAs[Long]("max_bucket_size") == 60L)
    assert(stats.getAs[Long]("n_oversized") > 0L)
    assert(stats.getAs[Long]("capped_rows") ==
      stats.getAs[Long]("n_oversized") * 10L) // 60 - 50 per oversized bucket
  }

  test("exact dedup groups identical content and keeps min doc_id") {
    val d = Dedup.exact(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(0L -> 2L, 2L -> 1L, 3L -> 1L)) // doc 1 collapsed into doc 0
  }

  test("minhash finds exact and near dup pairs, not unrelated ones") {
    val pairs = Dedup.minhashDedup(docs, threshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L))) // exact copy
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L))) // near copy
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated never pairs
  }

  test("minhash jaccard estimate is exact-verified (no false accepts)") {
    val out = Dedup.minhashDedup(docs, threshold = 0.5).collect()
    out.foreach { r =>
      assert(r.getAs[Double]("jaccard") >= 0.5)
    }
  }

  test("simhash finds near-dup pairs within hamming distance") {
    val pairs = Dedup.simhashDedup(docs, maxDist = 8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash of identical content is identical; unrelated differs") {
    val fps = docs.select(col("doc_id"),
        Dedup.simhash(TextAnalysis.shingles(col("text"), 3)).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fps(0L) == fps(1L))
    assert(fps(0L) != fps(3L))
  }

  test("dedup is idempotent (property): dedup(dedup(x)) == dedup(x)") {
    val once = Dedup.exact(docs)
    val kept = docs.join(once.select("doc_id"), Seq("doc_id"), "left_semi")
    val twice = Dedup.exact(kept)
    assert(twice.count() == once.count())
    assert(twice.filter(col("n_copies") > 1).isEmpty)
  }

  test("incremental screen flags a batch doc that duplicates the index") {
    // doc 27 (batch: % 20 == 7) clones index doc 3's text verbatim →
    // every lane minimum collides (best_est = 1.0); doc 7 (also batch)
    // has disjoint vocabulary → no candidates, absent from the output
    val txt3 = (1 to 40).map(i => s"w${i % 13}").mkString(" ")
    val planted = Seq(
      (3L, txt3, "en", "s1", txt3.length.toLong),
      (4L, (1 to 40).map(i => s"v${i % 11}").mkString(" "), "en", "s1", 0L),
      (27L, txt3, "en", "s2", txt3.length.toLong),
      (7L, (1 to 40).map(i => s"zz$i").mkString(" "), "en", "s2", 0L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("inc").toString
    planted.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("dedup_incremental")(spark, dir)
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, e) => id -> ((n, e)) }.toMap
    assert(out.keySet == Set(27L))
    assert(out(27L) == ((1L, 1.0)))
  }

  test("admitting a batch grows the index; screens equal a direct rebuild") {
    import graft.operators.{OperatorQueries => OQ}
    val dir = "/root/testdata/sf0.001"
    val t = java.nio.file.Files.createTempDirectory("admit").toString
    // the SAME predicate the screen uses — a re-tuned production batch
    // class must not silently diverge from what this test indexes
    val batchPred = OQ.incrementalBatchPred
    // day 1: index everything except the batch and the % 20 == 3 class
    // (tomorrow's intake); day 2: admit that class via APPEND
    val day2 = !batchPred && col("doc_id") % 20 === 3
    OQ.buildSignatureIndexAt(spark, dir, !batchPred && col("doc_id") % 20 =!= 3,
      s"$t/ix")
    val before = OQ.screenAgainstIndex(spark, dir, s"$t/ix")
      .collect().map(_.toString).toSeq
    OQ.admitBatchToIndex(spark, dir, day2, s"$t/ix")
    val after = OQ.screenAgainstIndex(spark, dir, s"$t/ix")
      .collect().map(_.toString).toSeq
    // the grown index must screen EXACTLY like one built over the union
    // directly — append + manifest refresh loses nothing, and the stale-
    // manifest guard accepted the appended files
    OQ.buildSignatureIndexAt(spark, dir, !batchPred, s"$t/direct")
    val direct = OQ.screenAgainstIndex(spark, dir, s"$t/direct")
      .collect().map(_.toString).toSeq
    assert(after == direct, "grown index diverges from a direct rebuild")
    // and admitting can only ADD candidates
    assert(after.size >= before.size)
    // the graceful degradation path (probe cap exceeded → one narrow full
    // scan, no driver-side probe collect) is result-identical
    val fullScan = OQ.screenAgainstIndex(spark, dir, s"$t/ix", maxProbes = 0L)
      .collect().map(_.toString).toSeq
    assert(fullScan == after, "full-scan screen diverges from pruned screen")
  }

  test("entity resolution resolves typo variants to their original record") {
    // The DuckDB oracle proves Spark == DuckDB; this proves the resolution
    // is SEMANTICALLY right: every variant record lands in its original's
    // entity, entity sizes are exactly the fixture's 1/2/3-record design
    // (md5-derived names keep unrelated records apart), and the 3-record
    // entities prove transitive closure through the chain.
    val dir = "/root/testdata/sf0.001"
    val out = graft.ext.Dedup.all.find(_.name == "dedup_entity_resolution").get
      .fn(spark, dir)
      .as[(Long, Long)].collect()
    val keys = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").cast("long")).as[Long].collect()
    val n4 = keys.count(_ % 4 == 0) // carries a z-variant
    val n8 = keys.count(_ % 8 == 0) // carries a y-variant too (3 records)
    assert(out.length == keys.length + n4 + n8)
    // every variant (+1e9 / +2e9 ids) resolves to its original's entity
    out.filter(_._1 >= 1000000000L).foreach { case (rec, ent) =>
      assert(ent == rec % 1000000000L, s"variant $rec resolved to $ent")
    }
    val sizes = out.groupBy(_._2).map(_._2.length).groupBy(identity)
      .map { case (k, v) => k -> v.size }
    assert(sizes == Map(1 -> (keys.length - n4), 2 -> (n4 - n8), 3 -> n8),
      s"entity sizes: $sizes")
  }
}
