package graft

import graft.ext.Similarity
import graft.functions.{Aggregates, SketchFunctions, TextFunctions}
import org.apache.spark.sql.functions._

class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  test("weighted_avg_cents computes the exact weighted mean") {
    val df = Seq(("a", 10.00, 1L), ("a", 20.00, 3L), ("b", 5.50, 2L))
      .toDF("k", "v", "w")
    val out = df.groupBy("k")
      .agg(Aggregates.weighted_avg_cents(col("v"), col("w")).as("wavg"))
      .as[(String, Double)].collect().toMap
    assert(out("a") == 17.5) // (1000*1 + 2000*3)/4/100
    assert(out("b") == 5.5)
  }

  test("weighted_avg_cents is partition-order independent") {
    val rows = (1 to 1000).map(i => ("k", i * 0.01, (i % 7 + 1).toLong))
    val a = rows.toDF("k", "v", "w").repartition(1)
      .groupBy("k").agg(Aggregates.weighted_avg_cents(col("v"), col("w"))).head().getDouble(1)
    val b = rows.reverse.toDF("k", "v", "w").repartition(13)
      .groupBy("k").agg(Aggregates.weighted_avg_cents(col("v"), col("w"))).head().getDouble(1)
    assert(a == b) // exact, not approximately
  }

  test("saltedAgg equals plain groupBy") {
    val df = Seq(("x", 1L), ("x", 2L), ("y", 10L), ("x", 3L)).toDF("k", "v")
    val salted = Aggregates.saltedAgg(df, Seq("k"), 4)(
      partials = Seq((sum(col("v")), "pv"), (count(lit(1)), "pn")),
      finals = Seq((sum(col("pv")), "total"), (sum(col("pn")), "n")))
      .as[(String, Long, Long)].collect().toSet
    assert(salted == Set(("x", 6L, 3L), ("y", 10L, 1L)))
  }

  test("minhash_union sketch estimates jaccard within tolerance") {
    // two groups sharing exactly half their shingle vocabulary
    val common = (1 to 60).map(i => s"c$i w$i t$i")
    val onlyA = (1 to 60).map(i => s"a$i x$i y$i")
    val onlyB = (1 to 60).map(i => s"b$i u$i v$i")
    val docs = (common ++ onlyA).map(("A", _)) ++ (common ++ onlyB).map(("B", _))
    val df = docs.toDF("grp", "text")
    val sketches = df.select(col("grp"),
        TextFunctions.minhash_sig(
          TextFunctions.word_shingles(col("text"), 3, distinct = true), 256).as("sig"))
      .groupBy("grp")
      .agg(SketchFunctions.minhash_union(col("sig"), 256).as("sketch"))
    val est = sketches.as("a").join(sketches.as("b"), col("a.grp") < col("b.grp"))
      .select(SketchFunctions.sketch_jaccard(col("a.sketch"), col("b.sketch")))
      .head().getDouble(0)
    // true jaccard = 60 / 180 = 1/3; 256 lanes → stderr ≈ sqrt(j(1-j)/256) ≈ 0.03
    assert(math.abs(est - 1.0 / 3) < 0.1, s"estimate $est far from 1/3")
  }

  test("minhash_union sketch merges across partitions consistently") {
    val docs = (1 to 200).map(i => ("g", s"w$i x$i y$i z$i"))
    def sketchOf(parts: Int) =
      docs.toDF("grp", "text").repartition(parts)
        .select(col("grp"), TextFunctions.minhash_sig(
          TextFunctions.word_shingles(col("text"), 2, distinct = true), 64).as("sig"))
        .groupBy("grp").agg(SketchFunctions.minhash_union(col("sig"), 64).as("sk"))
        .select("sk").as[Seq[Long]].head()
    assert(sketchOf(1) == sketchOf(16)) // mergeable: partitioning-invariant
  }

  test("IVF topK achieves reasonable recall vs brute force on clustered data") {
    val rnd = new scala.util.Random(19)
    val emb = (0 until 120).map { i =>
      val centre = Array.tabulate(8)(d => if (d == i % 4) 10f else 0f)
      (i.toLong, centre.map(c => c + rnd.nextFloat() * 0.5f))
    }.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 4)
    val exact = Similarity.topK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
      nCentroids = 8, nProbe = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    // k-means-refined codebook (2 Lloyd's rounds) must beat the old
    // unrefined-seed threshold of 0.7
    assert(recall >= 0.85, s"IVF recall $recall too low")
  }
}
