package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** Medallion model registry + topologically ordered execution — the engine
  * twin of dbt's manifest DAG (reference: ref() edges in
  * models/gold/core/fact_iot_events.sql:7,10,13 and the materialization
  * configs in dbt_project.yml:11-19).
  *
  * Each model is a function of its dependencies' DataFrames. Layer prefixes
  * (`bronze.` / `silver.` / `gold.`) mirror macros/generate_schema_name.sql:1-8.
  * Materialization semantics:
  *  - View      → createOrReplaceTempView (unmaterialized, recomputed)
  *  - Table     → overwrite parquet + temp view (gold, dbt_project.yml:17-19)
  *  - Streaming → handled by graft.stream.Ingest (bronze/silver streaming
  *                tables); in batch runs they degrade to View, the exact
  *                degradation dbt applies when a streaming table is run in
  *                a batch warehouse.
  *
  * Independent DAG branches materialize concurrently (profiles.yml:14
  * `threads: 8`) via parallel collections — cheap driver-side concurrency;
  * the heavy lifting is already parallel inside Spark jobs.
  */
object Dag {

  sealed trait Materialization
  case object View extends Materialization
  case object Table extends Materialization

  /** dbt's `materialized='incremental'`: on the first run the model
    * builds in full; on every later run only rows with `watermarkCol`
    * strictly above the stored high watermark are appended (dbt's
    * `is_incremental()` + append strategy). With `uniqueKey` set the new
    * slice UPSERTS instead (dbt's unique_key strategy): latest row per
    * key wins, implemented as a key-collapse rewrite — the parquet
    * analogue of MERGE (the transactional MERGE path lives in the
    * streaming foreachBatch sink).
    *
    * Scale: the incremental filter prunes at the SOURCE (watermark
    * predicates push down to the scan), so a daily run over a 100 TB
    * table reads the new partitions, not the history.
    */
  final case class Incremental(watermarkCol: String,
      uniqueKey: Option[Seq[String]] = None) extends Materialization

  final case class Model(
      name: String,
      deps: Seq[String],
      build: (SparkSession, Map[String, DataFrame]) => DataFrame,
      materialization: Materialization = View,
  )

  final class Registry {
    private val models = mutable.LinkedHashMap[String, Model]()

    def register(m: Model): Registry = { models(m.name) = m; this }

    def topoOrder: Seq[String] = {
      val visited = mutable.LinkedHashSet[String]()
      val visiting = mutable.Set[String]()
      def visit(n: String): Unit = {
        if (visited.contains(n)) return
        require(!visiting.contains(n), s"cycle through model '$n'")
        visiting += n
        models(n).deps.foreach { d =>
          require(models.contains(d), s"model '$n' refs unknown '$d'")
          visit(d)
        }
        visiting -= n
        visited += n
      }
      models.keys.foreach(visit)
      visited.toSeq
    }

    /** Build every model in dependency order; models at the same depth with
      * Table materialization are written concurrently. Returns the built
      * DataFrames keyed by model name.
      */
    def run(spark: SparkSession, warehouseDir: Option[String] = None): Map[String, DataFrame] = {
      val built = mutable.Map[String, DataFrame]()
      topoOrder.foreach { name =>
        val m = models(name)
        val df = m.build(spark, built.toMap)
        val out = m.materialization match {
          case View => df
          case Table =>
            warehouseDir match {
              case Some(dir) =>
                val path = s"$dir/${name.replace('.', '/')}"
                df.write.mode("overwrite").parquet(path)
                spark.read.parquet(path)
              case None => df
            }
          case inc: Incremental =>
            warehouseDir match {
              case Some(dir) =>
                val path = s"$dir/${name.replace('.', '/')}"
                runIncremental(spark, df, path, inc)
              case None => df // no warehouse → degrade to View, like dbt --empty
            }
        }
        out.createOrReplaceTempView(name.replace('.', '_'))
        built(name) = out
      }
      built.toMap
    }
  }

  /** One incremental model run against its stored table (see
    * [[Incremental]]). Returns the post-run table contents.
    */
  def runIncremental(spark: SparkSession, df: DataFrame, path: String,
      inc: Incremental): DataFrame = {
    import org.apache.spark.sql.functions._
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(new org.apache.hadoop.fs.Path(path))
    if (!exists) {
      df.write.mode("overwrite").parquet(path)
    } else {
      val existing = spark.read.parquet(path)
      val row = existing.agg(max(col(inc.watermarkCol))).first()
      val newRows =
        if (row.isNullAt(0)) df // empty table: everything is new
        else df.filter(col(inc.watermarkCol) > lit(row.get(0)))
      inc.uniqueKey match {
        case None =>
          // append strategy: new slice only, no rewrite of history
          newRows.write.mode("append").parquet(path)
        case Some(keys) =>
          // unique_key strategy: latest watermark per key wins. Parquet
          // has no MERGE, so collapse + atomic-rename rewrite (write to
          // .staging, swap) — bounded by table size, not history count
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(keys.map(col): _*)
            .orderBy(col(inc.watermarkCol).desc)
          val merged = existing.unionByName(newRows)
            .withColumn("_rn", row_number().over(w))
            .filter(col("_rn") === 1).drop("_rn")
          val staging = path + ".staging"
          merged.write.mode("overwrite").parquet(staging)
          fs.delete(new org.apache.hadoop.fs.Path(path), true)
          require(fs.rename(new org.apache.hadoop.fs.Path(staging),
            new org.apache.hadoop.fs.Path(path)),
            s"incremental upsert: staging rename failed for $path " +
              s"(rewritten data is intact at $staging)")
      }
    }
    spark.read.parquet(path)
  }

  /** The reference pipeline over an IoT-shaped events source: bronze
    * passthrough → silver clean → gold dims + fact (SURVEY.md §1.1 DAG).
    */
  def iotPipeline(source: SparkSession => DataFrame): Registry = {
    import graft.model.IotModels
    new Registry()
      .register(Model("bronze.events", Nil, (sp, _) => source(sp)))
      .register(Model("silver.events", Seq("bronze.events"),
        (_, deps) => IotModels.silver(deps("bronze.events"))))
      .register(Model("gold.dim_users", Seq("bronze.events"),
        (_, deps) => IotModels.dimUsers(deps("bronze.events")), Table))
      .register(Model("gold.dim_date", Seq("bronze.events"),
        (_, deps) => IotModels.dimDate(deps("bronze.events")), Table))
      .register(Model("gold.fact_events", Seq("bronze.events"),
        (_, deps) => IotModels.factEvents(deps("bronze.events")), Table))
  }
}
