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

  /** Small-file compaction — the OPTIMIZE equivalent for plain parquet
    * dirs. Streaming sinks and incremental appends accrete one file per
    * micro-batch/run; at 100 TB that is a week-one pathology (every scan
    * pays per-file open + listing, and the driver's file index bloats).
    * `compact` rewrites a directory into ceil(bytes / targetFileBytes)
    * files via `coalesce` (NARROW — no shuffle; compaction moves bytes,
    * it should never pay an exchange) and swaps it in with the same
    * staging-rename protocol as Dag.runIncremental, so readers see either
    * the old layout or the new one, never a mix. Hive-partitioned tables
    * are compacted per LEAF dir, preserving the partition layout and its
    * pruning.
    *
    * A dir carrying a `_spark_metadata` streaming-sink log is refused
    * unless `dropStreamingMetadata = true`: readers of such dirs trust
    * the log, not the listing, and would miss the compacted files. With
    * the flag, the log is removed and the dir becomes a plain parquet
    * table (do this only on a sink that has stopped appending).
    *
    * @return (filesBefore, filesAfter) across all compacted leaves
    */
  /** Versioned table writes with time-travel reads — the snapshot half of
    * the Delta behaviors this lake reproduces (compaction and data
    * skipping being the others). Each write lands in its own `v=<n>`
    * directory; readers resolve through a pointer file written with the
    * same tmp-write + atomic-rename protocol as the other swaps, so a
    * reader sees the previous complete version or the new complete
    * version, never a partial write. Old versions stay readable
    * (`readVersioned(path, Some(n))`) until `vacuum` reclaims them —
    * exactly the retention contract that makes concurrent long scans safe
    * at 100 TB: a reader planned against v(n) keeps its file list valid
    * while writers publish v(n+1).
    */
  def writeVersioned(spark: SparkSession, df: DataFrame, path: String): Long = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(hp)
    val next = listVersions(spark, path).lastOption.getOrElse(0L) + 1
    df.write.mode(SaveMode.ErrorIfExists).parquet(s"$path/v=$next")
    val tmp = new org.apache.hadoop.fs.Path(path, "_graft_latest.tmp")
    val ptr = new org.apache.hadoop.fs.Path(path, "_graft_latest")
    val out = fs.create(tmp, true)
    out.write(next.toString.getBytes("UTF-8"))
    out.close()
    fs.delete(ptr, false)
    require(fs.rename(tmp, ptr), s"versioned write: pointer swap failed at $path")
    next
  }

  def listVersions(spark: SparkSession, path: String): Seq[Long] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hp)) Seq.empty
    else fs.listStatus(hp).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong).sorted
  }

  def readVersioned(spark: SparkSession, path: String,
      version: Option[Long] = None): DataFrame = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = version.getOrElse {
      val ptr = new org.apache.hadoop.fs.Path(path, "_graft_latest")
      require(fs.exists(ptr), s"no _graft_latest pointer under $path")
      val in = fs.open(ptr)
      val s = scala.io.Source.fromInputStream(in).mkString.trim
      in.close()
      s.toLong
    }
    require(fs.exists(new org.apache.hadoop.fs.Path(path, s"v=$v")),
      s"version $v does not exist under $path (have: ${listVersions(spark, path).mkString(",")})")
    spark.read.parquet(s"$path/v=$v")
  }

  /** Remove versions older than the newest `keepLast` (the published
    * pointer target is always kept). Returns the removed version numbers.
    */
  def vacuum(spark: SparkSession, path: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, "vacuum must keep at least the latest version")
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all = listVersions(spark, path)
    val current = readVersionPointer(fs, path)
    val drop = all.dropRight(keepLast).filterNot(current.contains)
    drop.foreach(v =>
      fs.delete(new org.apache.hadoop.fs.Path(path, s"v=$v"), true))
    drop
  }

  private def readVersionPointer(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Option[Long] = {
    val ptr = new org.apache.hadoop.fs.Path(path, "_graft_latest")
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      val s = scala.io.Source.fromInputStream(in).mkString.trim
      in.close()
      Some(s.toLong)
    }
  }

  /** File-level min/max data skipping — the manifest half of what Delta/
    * Iceberg call data skipping, for plain parquet dirs. Parquet row-group
    * stats already prune WITHIN a file, but the scan still pays listing +
    * footer I/O per file; at 100 TB / ~128 MB files that is ~800k footer
    * reads per query. A manifest of per-FILE min/max lets the driver drop
    * files before the scan is even planned, the same planning-time lever
    * as partition pruning but on any column with write-time locality
    * (event time in an append-only lake being the canonical one).
    *
    * `writeStats` computes per-file min/max for `statsCols` in ONE
    * distributed pass (groupBy input_file_name) and stores them as JSON
    * under `_graft_stats/` — an underscore dir, invisible to parquet
    * discovery, co-versioned with the data it describes (re-run after
    * compact/append; `readSkipping` refuses a stale manifest).
    *
    * `readSkipping` filters the manifest with `keep` (build it with
    * [[skipRange]]) and hands Spark only the surviving files. The collect
    * is METADATA-proportional — one short string per file, the same
    * driver-side planning cost Delta pays — never data-proportional.
    *
    * Skipping is only sound for predicates that can never match a row the
    * stats bounds exclude: [[skipRange]] range predicates are (nulls make
    * them false, and an all-null file has null min/max → dropped; a file
    * mixing nulls and values keeps correct non-null bounds).
    */
  def writeStats(spark: SparkSession, path: String, statsCols: Seq[String]): Long = {
    import org.apache.spark.sql.functions._
    require(statsCols.nonEmpty, "writeStats needs at least one column")
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    val stats = spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
    val out = s"$path/_graft_stats"
    stats.coalesce(1).write.mode(SaveMode.Overwrite).json(out)
    spark.read.json(out).count()
  }

  /** Manifest predicate: file may contain rows with `c` in [lo, hi]. */
  def skipRange(c: String, lo: org.apache.spark.sql.Column,
      hi: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.col
    col(s"max_$c") >= lo && col(s"min_$c") <= hi
  }

  def readSkipping(spark: SparkSession, path: String,
      keep: org.apache.spark.sql.Column): DataFrame = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifestDir = new org.apache.hadoop.fs.Path(path, "_graft_stats")
    require(fs.exists(manifestDir), s"no _graft_stats manifest under $path")
    val manifest = spark.read.json(manifestDir.toString)
    // stale-manifest guard: every CURRENT data file must be covered, or a
    // skip could silently drop rows written after the manifest
    val current = fs.listStatus(hp).filter(s => s.isFile &&
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      .map(_.getPath.toUri.getPath).toSet
    val listed = manifest.select("file").collect()
      .map(r => new java.net.URI(r.getString(0)).getPath).toSet
    require(current.subsetOf(listed),
      s"stale _graft_stats manifest under $path: " +
        s"${(current -- listed).size} data file(s) not covered - re-run writeStats")
    val files = manifest.filter(keep).select("file").collect().map(_.getString(0))
    if (files.isEmpty) spark.read.parquet(path).limit(0)
    else spark.read.parquet(files.toIndexedSeq: _*)
  }

  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L << 20,
      dropStreamingMetadata: Boolean = false): (Long, Long) = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = new org.apache.hadoop.fs.Path(path, "_spark_metadata")
    if (fs.exists(meta)) {
      require(dropStreamingMetadata,
        s"$path carries a _spark_metadata streaming-sink log; compacting " +
          "under it would hide files from log-trusting readers. Stop the " +
          "sink and pass dropStreamingMetadata = true to freeze the dir " +
          "into a plain parquet table first.")
      fs.delete(meta, true)
    }
    val children = fs.listStatus(hp)
    val leafDirs = children.filter(s => s.isDirectory &&
      s.getPath.getName.contains("="))
    if (leafDirs.nonEmpty) {
      // hive-partitioned: recurse per partition dir (partition columns
      // live in the PATH, so each leaf compacts independently)
      leafDirs.map(d => compact(spark, d.getPath.toString, targetFileBytes))
        .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    } else {
      val dataFiles = children.filter(s => s.isFile &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      val nBefore = dataFiles.length.toLong
      val totalBytes = dataFiles.map(_.getLen).sum
      val nOut = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes)
      if (nBefore <= nOut) (nBefore, nBefore) // already compact: no rewrite
      else {
        val staging = new org.apache.hadoop.fs.Path(path + ".compacting")
        spark.read.parquet(path)
          .coalesce(nOut.toInt)
          .write.mode(SaveMode.Overwrite).parquet(staging.toString)
        fs.delete(hp, true)
        require(fs.rename(staging, hp),
          s"compaction: staging rename failed for $path " +
            s"(rewritten data is intact at $staging)")
        val nAfter = fs.listStatus(hp).count(s => s.isFile &&
          !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
        (nBefore, nAfter.toLong)
      }
    }
  }
}
