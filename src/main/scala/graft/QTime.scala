package graft
import org.apache.spark.sql.SparkSession
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    args.drop(1).foreach { q =>
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      println(f"[qtime] $q ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
