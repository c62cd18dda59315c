package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are registered per-module as `QueryDef`s (Spark impl + DuckDB
  * oracle with identical output column names and total ordering).
  */
object SparkEntry {

  private def registry: Seq[QueryDef] =
    graft.model.IotModels.all ++
      graft.dq.Checks.all ++
      graft.relational.Relational.all ++
      graft.relational.Relational2.all ++
      graft.relational.Relational3.all ++
      graft.relational.Relational4.all ++
      graft.relational.Relational5.all ++
      graft.relational.Analytics.all ++
      graft.ext.TextAnalysis.all ++
      graft.ext.PipelineOps.all ++
      graft.ext.BpeTrain.all ++
      graft.ext.Dedup.all ++
      graft.ext.Similarity.all ++
      graft.ext.Selection.all ++
      graft.ext.Multimodal.all ++
      graft.sources.Formats.all ++
      graft.functions.Aggregates.all ++
      graft.pipeline.PipelineQueries.all ++
      graft.operators.OperatorQueries.all ++
      graft.operators.SpatialTemporal.all ++
      graft.stream.StreamQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.model.IotModels.factEvents(
      Tables.events(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
