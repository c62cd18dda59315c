package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for round-3 hot queries (not part of the contract). */
object DebugPerf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id) s").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[debug] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // --- CC pipeline phases ---
    val docs = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("n_chars"),
        array_distinct(split(col("text"), " ")).as("w"))
      .persist()
    t("docs materialize")(docs.count())
    val edges = graft.ext.Dedup
      .jaccardSelfJoinExact(docs.select("doc_id", "w"), 9, 10)
      .select("src", "dst").persist()
    t("edge build (prefix filter)")(println("edges=" + edges.count()))
    val comps = t("CC loop")(
      graft.operators.ConnectedComponents(docs.select(col("doc_id").as("id")), edges,
        loopPartitions = Some(8)))
    t("CC output count")(comps.count())
    t("CC loop #2 (warm)")(
      graft.operators.ConnectedComponents(docs.select(col("doc_id").as("id")), edges,
        loopPartitions = Some(8)).count())

    // inline copy of the CC loop with per-round timing
    {
      val vertices = docs.select(col("doc_id").as("id"))
      val sym = edges.select(col("src"), col("dst"))
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().persist()
      t("sym materialize")(sym.count())
      var labels = vertices.select(col("id"), col("id").as("comp"))
      var prevSum = Long.MaxValue
      var converged = false
      var iter = 0
      while (!converged && iter < 25) {
        val nbrMin = sym.join(labels, sym("dst") === labels("id"))
          .select(sym("src").as("id"), col("comp"))
        val next = labels.select(col("id"), col("comp")).union(nbrMin)
          .repartition(8, col("id"))
          .groupBy("id").agg(min("comp").as("comp"))
          .localCheckpoint(false)
        val s = t(s"round $iter")(next.agg(sum("comp")).first().getLong(0))
        converged = s == prevSum
        prevSum = s
        labels = next
        iter += 1
      }
      println(s"[debug] rounds=$iter")
    }

    // full registered queries, cold then warm
    t("dedup_clusters full #1")(
      SparkEntry.queries("dedup_clusters")(spark, sfDir).count())
    t("dedup_clusters full #2")(
      SparkEntry.queries("dedup_clusters")(spark, sfDir).count())
    t("q_dedup_retain full")(
      SparkEntry.queries("q_dedup_retain")(spark, sfDir).count())

    // --- IVF phases ---
    val emb = Tables.embeddings(spark, sfDir)
    t("emb count")(println("emb=" + emb.count() +
      " dim=" + emb.selectExpr("size(embedding)").first().getInt(0)))
    t("ivf full (0 rounds, cold)")(
      graft.ext.Similarity.ivfTopK(emb, emb.filter(col("vec_id") % 100 === 0),
        "vec_id", "embedding", 5, refineRounds = 0).count())
    t("ivf full (2 rounds, warm c)")(
      graft.ext.Similarity.ivfTopK(emb, emb.filter(col("vec_id") % 100 === 0),
        "vec_id", "embedding", 5).count())
    t("ivf full (2 rounds, again)")(
      graft.ext.Similarity.ivfTopK(emb, emb.filter(col("vec_id") % 100 === 0),
        "vec_id", "embedding", 5).count())
    spark.stop()
  }
}
