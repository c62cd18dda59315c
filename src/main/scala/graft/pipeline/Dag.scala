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
        }
        out.createOrReplaceTempView(name.replace('.', '_'))
        built(name) = out
      }
      built.toMap
    }
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
