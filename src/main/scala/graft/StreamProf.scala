package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Scratch profiler for the round-21 optimization pass (not part of the
  * driver contract). Runs named registry queries under the Bench session
  * shape and prints every StreamingQueryProgress duration breakdown —
  * triggerExecution split into addBatch / getBatch / latestOffset /
  * queryPlanning / walCommit / commitOffsets / stateStore metrics — so the
  * per-micro-batch fixed costs of the stream family are measurable instead
  * of guessed (guide §1).
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.StreamProf q1 q2 ..."
  */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    // A/B harness for candidate session configs: GRAFT_PROF_CONF is a
    // semicolon-separated k=v list applied on top of the Bench shape.
    sys.env.get("GRAFT_PROF_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id) s").collect()
    Seq("region", "orders", "lineitem", "documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    Tables.events(spark, sfDir).count()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[prof-batch] id=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs} " +
          s"stateOps=${p.stateOperators.length}" +
          p.stateOperators.zipWithIndex.map { case (s, i) =>
            s" st$i(commit=${s.commitTimeMs} rows=${s.numRowsTotal} " +
              s"mem=${s.memoryUsedBytes})"
          }.mkString)
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    args.foreach { q =>
      println(s"[prof-query] >>> $q")
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      println(f"[prof-query] <<< $q ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
