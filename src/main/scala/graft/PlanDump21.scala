package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Round-21 plan-evidence dumper: writes `.explain("formatted")` of named
  * registry queries to `<outDir>/<name>_<tag>.txt`, under the same session
  * shape as the bench (local[cpus], shuffle.partitions=cpus). Usage:
  *   sbt "runMain graft.PlanDump21 <outDir> <tag> q1 q2 ..."
  */
object PlanDump21 {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    args.drop(2).foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${q}_$tag.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] wrote $outDir/${q}_$tag.txt")
    }
    spark.stop()
  }
}
