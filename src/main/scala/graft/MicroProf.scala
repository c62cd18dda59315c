package graft

import org.apache.spark.sql.SparkSession

/** Round-21 scratch micro-benchmark (not part of the driver contract):
  * floor costs of the primitive operations the lake/stream rows compose —
  * tiny parquet write jobs, scan jobs, broadcast joins, json reads — so
  * per-commit overhead is attributable to named pieces.
  */
object MicroProf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    sys.env.get("GRAFT_PROF_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String, reps: Int = 5)(body: Int => Unit): Unit = {
      val times = (0 until reps).map { i =>
        val t0 = System.nanoTime()
        body(i)
        (System.nanoTime() - t0) / 1e6
      }
      println(f"[micro] $name%-36s " +
        times.map(v => f"$v%7.1f").mkString(" ") + " ms")
    }
    val base = java.nio.file.Files.createTempDirectory("microprof_").toString
    spark.range(1000).selectExpr("sum(id)").collect()
    t("noop-job 1 task", 8)(_ => spark.range(0, 10, 1, 1).collect())
    t("noop-job 4 tasks", 8)(_ => spark.range(0, 10, 1, 4).collect())
    t("noop-job 8 tasks", 8)(_ => spark.range(0, 10, 1, 8).collect())
    t("noop-job 32 tasks", 8)(_ => spark.range(0, 10, 1, 32).collect())
    t("noop-job collect")(_ => spark.range(10).collect())
    t("write 1-file parquet (10 rows)")(i =>
      spark.range(10).coalesce(1).write.parquet(s"$base/w1_$i"))
    t("write 8-file parquet (10 rows)")(i =>
      spark.range(10).repartition(8).write.parquet(s"$base/w8_$i"))
    t("write 32-file parquet (100k rows)")(i =>
      spark.range(100000).repartition(32).write.parquet(s"$base/w32_$i"))
    t("read 1-file parquet count")(i =>
      spark.read.parquet(s"$base/w1_$i").count())
    t("read 8-file parquet count")(i =>
      spark.read.parquet(s"$base/w8_$i").count())
    val ev = Tables.events(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1"))
    t("events count (150k rows)")(_ => ev.count())
    t("events groupBy user count")(_ =>
      ev.groupBy("user_id").count().count())
    t("broadcast join tiny")(i => {
      val d = spark.range(100).withColumnRenamed("id", "k")
      spark.range(1000).withColumnRenamed("id", "k")
        .join(org.apache.spark.sql.functions.broadcast(d), Seq("k"))
        .count()
    })
    // boilerplateStrip leg attribution (sf0.1 documents)
    locally {
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(spark, sys.env.getOrElse(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
      val toks = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      val grams = toks.filter(size(col("toks")) >= 3)
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(1, size(toks) - 2), " +
            "i -> md5(concat_ws(' ', slice(toks, i, 3))))")).as(Seq("p0", "gh")))
        .select(col("doc_id"), (col("p0") + 1).as("s"), col("gh"))
        .persist()
      t("bp: grams materialize", 3)(_ => grams.count())
      val boiler = grams.groupBy("gh")
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") >= lit(5L)).select("gh")
      val removed = grams.join(boiler, "gh")
        .select(col("doc_id"),
          explode(sequence(col("s"), col("s") + lit(2))).as("pos"))
        .distinct().withColumn("rm", lit(1))
      t("bp: removed distinct", 3)(_ => removed.count())
      val tok = toks
        .select(col("doc_id"), posexplode(col("toks")).as(Seq("p0", "w")))
        .select(col("doc_id"), (col("p0") + 1).as("pos"), col("w"))
      t("bp: tok explode count", 3)(_ => tok.count())
      val out = tok.join(removed, Seq("doc_id", "pos"), "left_outer")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"),
          sum(when(col("rm").isNotNull, 1L).otherwise(0L)).as("n_removed"),
          concat_ws(" ", expr(
            "transform(array_sort(collect_list(" +
              "CASE WHEN rm IS NULL THEN struct(pos, w) END)), x -> x.w)"))
            .as("stripped"))
        .orderBy("doc_id")
      t("bp: full reassembly", 3)(_ => out.count())
      t("bp: whole operator", 3)(_ =>
        graft.ext.TextAnalysis.boilerplateStrip(docs).count())
      grams.unpersist()
    }
    t("json write+read (1500 rows)")(i => {
      spark.range(1500).selectExpr("id", "id * 2 AS v")
        .coalesce(1).write.json(s"$base/j_$i")
      spark.read.schema("id LONG, v LONG").json(s"$base/j_$i").count()
    })
    spark.stop()
  }
}
