package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical-layout writers for the lake: these choices, not query code,
  * decide whether a 100 TB table is scannable. The reference's lake is
  * managed tables behind dbt materializations (SURVEY §2.1 A4-A6); here
  * the same surfaces are explicit so layout is a first-class, testable
  * decision.
  *
  * - Hive-style partition columns → partition PRUNING: a filter on the
  *   partition column skips whole directories at planning time, before
  *   any I/O. Choose low-cardinality, always-filtered columns (event
  *   date, event type), never high-cardinality keys (one dir per user
  *   would melt the namenode/listing).
  * - Bucketing → shuffle-FREE joins/aggregations: two tables bucketed on
  *   the same key into the same bucket count co-locate their keys at
  *   write time, so join/groupBy on that key needs no Exchange at read
  *   time. This is THE lever for a fact-fact join that would otherwise
  *   shuffle 100 TB every run: pay the shuffle once at ingest.
  */
object Lake {

  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucketed managed table (bucketBy requires saveAsTable). `sortBy` the
    * same key so merge-style reads stream in key order.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Interchange formats: same DataFrame surface, different cost profile —
    * columnar+stats (parquet/orc) for the lake, line formats (csv/json)
    * for ingest/egress edges only.
    */
  def write(df: DataFrame, path: String, format: String): Unit =
    df.write.mode(SaveMode.Overwrite).format(format)
      .option("header", "true").save(path)

  def read(spark: SparkSession, path: String, format: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read.format(format).option("header", "true")
    schema.fold(r.option("inferSchema", "true"))(r.schema).load(path)
  }
}
