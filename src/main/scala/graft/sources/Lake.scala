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

  /** Phase timer for the optimization rounds: wraps the commit-path
    * phases (discovery join, rewrite, footer reads, manifest publish)
    * and prints wall times when `-Dgraft.lake.prof` is set. Inert (no
    * timestamp read) when the property is absent, so production paths
    * pay one branch.
    */
  @inline private def prof[A](name: String)(body: => A): A =
    if (!profEnabled) body
    else {
      val t0 = System.nanoTime()
      val r = body
      println(f"[lake-prof] $name%-28s ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
      r
    }
  private val profEnabled = sys.props.contains("graft.lake.prof") ||
    sys.env.contains("GRAFT_LAKE_PROF")

  /** Target rows per data file for SIZE-ADAPTIVE commit writes (guide §6:
    * files in the 128 MB – 1 GB band; at the lake's ~30–100 B rows, 4 Mi
    * rows ≈ 128–400 MB). A rewrite commit whose expected output is far
    * below this coalesces to ceil(rows / target) files instead of
    * inheriting one file per upstream task — the per-file open + footer +
    * manifest-entry cost is what melts small-commit paths (a streaming MV
    * fold otherwise publishes ~10 KB-sized files per micro-batch, and
    * every later scan pays per-file overhead). The SAME rule derives many
    * files for a big rewrite, so it is scale-adaptive, not a local-mode
    * constant; override via GRAFT_TARGET_FILE_ROWS. Tables carrying a
    * `_graft_stats` manifest are exempt — their file boundaries encode
    * clustering (z-order, range cells) that a coalesce would smear.
    */
  private val targetCommitFileRows: Long =
    sys.env.get("GRAFT_TARGET_FILE_ROWS").map(_.trim.toLong)
      .getOrElse(4L * 1024 * 1024)

  /** ceil(estRows / target) as a coalesce width — never below 1. Callers
    * apply it only when the estimate is sound and the layout is free-form
    * (no stats manifest).
    */
  private def commitFileParts(estRows: Long): Int =
    math.max(1L, (estRows + targetCommitFileRows - 1) / targetCommitFileRows)
      .min(Int.MaxValue.toLong).toInt

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

  /** RAW MEDIA ingestion — Spark's bundled `binaryFile` source: one row
    * per file with (path, modificationTime, length, content). This is the
    * edge where image/audio/video corpora ENTER the lake; downstream
    * everything flows as binary columns + typed metadata
    * ([[graft.ext.Multimodal]]). Two scale levers matter at the edge:
    * `pathGlobFilter` prunes non-media files at LISTING time (before any
    * read), and `maxBytesPerFile` is deliberately not exposed — media
    * files are atomic, a partial JPEG is garbage. Blob-dominated rows
    * mean the FIRST thing after ingestion should be writing
    * length/type metadata columns so later planning never touches
    * `content` (mediaSchema's n_bytes pattern).
    */
  def readBinaryFiles(spark: SparkSession, path: String,
      glob: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
    glob.fold(r)(g => r.option("pathGlobFilter", g)).load(path)
  }

  /** Small-file compaction — the OPTIMIZE equivalent for plain parquet
    * dirs. Streaming sinks and incremental appends accrete one file per
    * micro-batch/run; at 100 TB that is a week-one pathology (every scan
    * pays per-file open + listing, and the driver's file index bloats).
    * `compact` rewrites a directory into ceil(bytes / targetFileBytes)
    * files via `coalesce` (NARROW — no shuffle; compaction moves bytes,
    * it should never pay an exchange) and publishes via RENAME-ASIDE:
    * old dir → dot-prefixed aside, staging → dir, aside deleted last.
    * A reader never sees a MIX of layouts, and a crash at any step leaves
    * a complete copy on disk (the next compact call restores a stranded
    * aside). The one residual window — the instant between the two
    * renames — can surface to a concurrent lister as a briefly missing
    * dir, never as partial data; plain-FS dir swaps cannot close it
    * without a pointer indirection (that is what [[writeVersioned]] is
    * for). An existing `_graft_stats` manifest is regenerated after the
    * rewrite (the old one described the old files). Hive-partitioned
    * tables are compacted per LEAF dir, preserving the partition layout
    * and its pruning.
    *
    * A dir carrying a `_spark_metadata` streaming-sink log is refused
    * unless `dropStreamingMetadata = true`: readers of such dirs trust
    * the log, not the listing, and would miss the compacted files. With
    * the flag, the log is removed and the dir becomes a plain parquet
    * table (do this only on a sink that has stopped appending).
    *
    * @return (filesBefore, filesAfter) across all compacted leaves
    */
  /** Versioned table writes with time-travel reads — the commit half of
    * the Delta behaviors this lake reproduces (compaction and data
    * skipping being the others).
    *
    * A VERSION IS A MANIFEST OF FILE REFERENCES: `_graft_versions/v=N.json`
    * records the version's schema plus `{path, n_rows}` file references —
    * exactly the Delta/Iceberg log shape, including the log-vs-checkpoint
    * split: a snapshot publish writes a FULL manifest, while the
    * file-granular commits ([[appendVersioned]], [[deleteWhere]],
    * [[optimizeVersioned]]) write DELTA manifests recording only the
    * added/removed references against a base version, so commit metadata
    * is O(changed files) — an append to an 800k-file table writes a few
    * KB, never an ~80 MB file-list rewrite. Chains self-checkpoint at a
    * bounded depth, and [[vacuum]] materializes any retained manifest
    * whose chain passes through a dropped version, so resolution is
    * always a bounded number of metadata-sized reads and never dangles.
    * Files UNCHANGED between versions are carried BY REFERENCE (the same
    * physical file appears in many resolved manifests), which is what
    * makes the file-granular operations scale: an append links every
    * prior file and writes O(batch); a delete rewrites ONLY the files
    * containing matching rows and links the rest, so a handful-of-rows
    * takedown on a 100 TB table costs a few file rewrites + a few KB of
    * metadata, not a corpus copy. Per-file `n_rows` rides in the manifest
    * (read from parquet FOOTERS at commit time — metadata I/O), so
    * version row counts and delete audits resolve without scanning data.
    *
    * Publish protocol, in load-bearing order: data files first (orphans a
    * crash leaves behind are invisible — no manifest references them),
    * then the version manifest (tmp-write + rename with a
    * rename-to-existing guard against concurrent publishers), then the
    * `_graft_latest` pointer via FileContext.rename(OVERWRITE) — one
    * atomic swap, so a reader sees the previous complete version or the
    * new complete version, never a partial write. Old versions stay
    * readable (`readVersioned(path, Some(n))`) until [[vacuum]] reclaims
    * the files no retained version references — the retention contract
    * that makes concurrent long scans safe at 100 TB: a reader planned
    * against v(n) keeps a valid file list while writers publish v(n+1).
    *
    * Pre-manifest layouts (bare `v=N` dirs) upgrade in place: the first
    * write backfills manifests from the existing dirs' footers. Once a
    * table is versioned, read it through [[readVersioned]] (or
    * [[readSkipping]]/[[readProbed]], which resolve the manifest) — a
    * plain recursive parquet read would see retired files.
    *
    * `writeVersioned` publishes `df` as a full new snapshot (its contract
    * is "this frame IS the new table"); the file-granular commits are
    * [[appendVersioned]] (insert), [[deleteWhere]] (delete),
    * [[mergeInto]] (upsert) and [[optimizeVersioned]] (maintenance).
    */
  def writeVersioned(spark: SparkSession, df: DataFrame, path: String,
      streamBatchId: Option[Long] = None): Long = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(hp)
    require(readSchemaManifests(spark, path).isEmpty,
      s"$path is a schema-evolving table; append via writeEvolving (delete " +
        "via deleteWhere) - writeVersioned would bypass the schema chain")
    // a full-snapshot overwrite of a column-mapped table would publish a
    // manifest WITHOUT the colmap, silently discarding the rename for a
    // caller still holding stale/physical names — refuse like every other
    // physical-schema op; materializeMapping first makes the logical names
    // physical, after which a snapshot is unambiguous again
    requireNoColMap(spark, fs, path, "writeVersioned")
    ensureVersionManifests(spark, path)
    // when a constraint gate will read the batch before the write does,
    // persist it so the caller's (possibly expensive) plan runs once
    val dfG = applyGeneratedTo(spark, path, df, "writeVersioned")
    val cs = checkConstraints(spark, path)
    val batch = if (cs.nonEmpty) dfG.persist() else dfG
    try {
      if (cs.nonEmpty)
        enforceConstraintsOn(spark, batch, cs, s"writeVersioned($path)")
      // snapshot dir is a namespace; the commit number continues the
      // manifest chain contiguously (base+1) so every commit type
      // contends on the same next number — the linearization the rename
      // guard needs
      val (dataDir, entries) = writeClaimedDir(spark, fs, path, batch)
      val ms = if (fs.exists(versionsDir(path))) manifestVersions(fs, path) else Nil
      val next = if (ms.nonEmpty) ms.last + 1 else dataDir
      reenforceIfChanged(spark, fs, path, cs, entries, batch.schema.toDDL,
        s"writeVersioned($path)")
      writeVersionManifest(spark, fs, path, next, batch.schema.toDDL, entries,
        streamBatchId = streamBatchId, op = Some("snapshot"))
      writeVersionPointer(spark, fs, path, next)
      next
    } finally { if (cs.nonEmpty) batch.unpersist(); () }
  }

  /** O(batch) versioned APPEND: write only `df`'s files, publish a manifest
    * referencing every prior file + the new ones. The commit cost is the
    * batch plus a few KB of metadata — flat in table size, which is the
    * property that lets a daily intake commit to a 100 TB table without
    * touching it. Schema must match the table exactly (appends are not
    * schema evolution — that is [[writeEvolving]]).
    *
    * CONCURRENT appends REBASE instead of failing: appends commute (each
    * only ADDS files), so the loser of the manifest-publish race re-reads
    * the new latest version, re-checks the schema against it, and
    * republishes its delta against that base — the data files, already on
    * disk, are never rewritten. This is Delta's optimistic-concurrency
    * behavior for AddFile-only commits. The linearization point is the
    * manifest rename: manifest numbers contend on max(published)+1, so
    * sibling commits against one base are impossible — the second writer
    * always observes the first's manifest and chains behind it.
    * NON-commuting commits ([[deleteWhere]]/[[mergeInto]]/
    * [[optimizeVersioned]] — their removals depend on the base file set)
    * keep the fail-loudly contract.
    */
  def appendVersioned(spark: SparkSession, df: DataFrame, path: String,
      streamBatchId: Option[Long] = None): Long = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // continuous-streaming idempotence gate: a micro-batch REPLAY (crash
    // after a data write, before the checkpoint commit) finds its batch
    // id already in a manifest and no-ops BEFORE writing a byte; the
    // crashed attempt's files sit in an unpublished claimed dir that no
    // reader ever sees and vacuum's grace window reclaims
    streamBatchId.foreach { bid =>
      if (streamBatchCommitted(spark, path, bid)) {
        val ptr = readVersionPointer(fs, path)
          .orElse(manifestVersions(fs, path).lastOption)
        return ptr.getOrElse(sys.error(
          s"batch $bid recorded but no versions under $path"))
      }
    }
    // GENERATED specs make the gate run a validation aggregate over the
    // batch before writeClaimedDir evaluates the caller's plan a second
    // time — persist around both so a possibly-expensive upstream plan
    // runs once (the same rationale as the constraints persist below;
    // persist is lazy, so a no-spec table pays nothing here)
    val genSpecs = generatedColumns(spark, path)
    val dfIn = if (genSpecs.nonEmpty) df.persist() else df
    try appendVersionedImpl(spark, dfIn, path, streamBatchId, genSpecs)
    finally { if (genSpecs.nonEmpty) dfIn.unpersist(); () }
  }

  private def appendVersionedImpl(spark: SparkSession, df: DataFrame,
      path: String, streamBatchId: Option[Long],
      genSpecs: Seq[(String, String)]): Long = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // GENERATED columns first: compute the ones the batch omits, validate
    // the ones it carries — before any schema logic, so an omitted
    // generated column never masquerades as schema drift
    val dfG = applyGeneratedTo(spark, path, df, "appendVersioned")
    // COLUMN-MAPPED table: the batch arrives in LOGICAL names and is
    // translated ONCE to the frozen physical names, before any schema
    // logic — the drift checks below then compare physical-vs-physical,
    // and the published delta INHERITS the base's colmap (manifest
    // resolution rule), so a concurrent rename rebases cleanly.
    val headCm = colMapAtHead(spark, fs, path)
    val dfP =
      if (headCm.isEmpty) dfG
      else {
        val logical = headCm.map(_._1)
        require(dfG.schema.fields.map(_.name).toSeq == logical,
          s"appendVersioned($path): column-mapped table expects logical " +
            s"columns (${logical.mkString(", ")}); frame has " +
            s"(${dfG.schema.fieldNames.mkString(", ")})")
        dfG.select(headCm.map { case (l, p) =>
          org.apache.spark.sql.functions.col(l).as(p) }: _*)
      }
    // SCHEMA EVOLUTION IS NOT A REFUSAL: a 24/7 stream appending through
    // this path must survive upstream column drift. Three cases:
    //   1. evolving table, batch matches the current LOGICAL schema →
    //      plain delta append below (no new chain entry — per-batch
    //      chain growth would pile thousands of identical versions).
    //   2. evolving table, batch schema DRIFTED → the drift publishes the
    //      next schema-chain entry WITH the commit (writeEvolving, which
    //      validates the drift is additive/widening and stamps the
    //      version delta with this batch id).
    //   3. PLAIN versioned table, batch schema drifted → the chain is
    //      bootstrapped (v1 = the table's current schema, declared from
    //      the manifest DDL — no file reads) and the batch lands as
    //      schema v2 via writeEvolving. Invalid drift (dropped column,
    //      narrowing) still refuses, loudly, inside writeEvolving.
    val priors = readSchemaManifests(spark, path)
    def batchFields = dfP.schema.fields
      .map(f => f.name -> f.dataType.catalogString).toSeq
    // writeEvolving returns the SCHEMA version; this method's contract is
    // the TABLE version — re-read it after an evolving delegation
    def latestTableVersion(): Long = readVersionPointer(fs, path)
      .orElse(manifestVersions(fs, path).lastOption)
      .getOrElse(sys.error(s"no versions under $path"))
    if (priors.nonEmpty) {
      if (batchFields != logicalSchema(priors)) {
        if (fs.exists(versionsDir(path))) {
          writeEvolving(spark, df, path, streamBatchId = streamBatchId)
          return latestTableVersion()
        } else {
          // evolving-but-unversioned: land the drifted batch, then adopt
          // ALL files (batch included) as version 1 carrying this batch id
          writeEvolving(spark, df, path)
          bootstrapRootVersion(spark, fs, path, streamBatchId)
          return 1L
        }
      }
      if (!fs.exists(versionsDir(path)))
        // evolving-but-unversioned, same schema: adopt the existing files
        // as version 1 so this and every later batch gets a version
        // manifest + the replay gate
        bootstrapRootVersion(spark, fs, path)
    }
    ensureVersionManifests(spark, path)
    val versions = listVersions(spark, path)
    if (versions.isEmpty) return writeVersioned(spark, df, path, streamBatchId)
    if (priors.isEmpty) {
      val curDdl = readRawManifest(spark, fs, path,
        manifestVersions(fs, path).last).get.schemaDdl
      val cur = org.apache.spark.sql.types.StructType.fromDDL(curDdl)
        .fields.map(f => f.name -> f.dataType.catalogString).toSeq
      if (batchFields != cur) {
        // a column-mapped table cannot drift into the evolving chain: the
        // chain's fold logic knows nothing of the physical-name map
        require(headCm.isEmpty,
          s"appendVersioned($path): schema drift on a column-mapped table " +
            "is not supported - materializeMapping first")
        // constraint gate BEFORE the chain bootstrap: writeEvolving would
        // refuse a constrained table anyway, but only after the chain
        // manifest existed — leaving the forbidden constrained+evolving
        // state on disk for every later operation to trip over
        require(checkConstraints(spark, path).isEmpty,
          s"$path carries CHECK constraints; a schema-drifting append " +
            "would bypass their enforcement - drop them first")
        require(generatedColumns(spark, path).isEmpty,
          s"$path carries GENERATED columns; a schema-drifting append " +
            "would bypass their derivation - drop them first")
        // drift gate BEFORE the chain bootstrap, same reason as the
        // constraint gate above: writeEvolving would refuse an invalid
        // drift (dropped / narrowed column) anyway, but only after the v1
        // chain manifest existed — permanently flipping the plain table
        // into evolving mode (writeVersioned thereafter refuses). Validate
        // against the CURRENT schema first so a refusal leaves no state.
        cur.foreach { case (name, tpe) =>
          require(batchFields.exists(_._1 == name),
            s"column '$name' is missing from the appended frame; dropping " +
              "columns is not supported - carry it (null-filled if needed)")
          val newTpe = batchFields.find(_._1 == name).get._2
          require(newTpe == tpe || widens(tpe, newTpe),
            s"column '$name' changes type $tpe -> $newTpe; only lossless " +
              "widening (tinyint<smallint<int<bigint, float<double) is " +
              "supported")
        }
        bootstrapSchemaChain(fs, new org.apache.hadoop.fs.Path(path), cur)
        writeEvolving(spark, df, path, streamBatchId = streamBatchId)
        return latestTableVersion()
      }
    }
    def schemaCheck(baseDdl: String): Unit = {
      val prior = org.apache.spark.sql.types.StructType.fromDDL(baseDdl)
      require(dfP.schema.fields.map(f =>
          (f.name, f.dataType.catalogString)).toSeq ==
          prior.fields.map(f => (f.name, f.dataType.catalogString)).toSeq,
        s"appendVersioned schema mismatch: table has ${prior.toDDL}, " +
          s"frame has ${dfP.schema.toDDL}")
    }
    // constraints gate BEFORE any write: a violating batch refuses with
    // nothing on disk, not even an unpublished claimed dir. The batch is
    // persisted around gate + write so the caller's (possibly expensive)
    // plan runs once, not twice.
    val cs = checkConstraints(spark, path)
    val batch = if (cs.nonEmpty) dfP.persist() else dfP
    val fresh =
      try {
        if (cs.nonEmpty)
          enforceConstraintsOn(spark, batch, cs, s"appendVersioned($path)")
        // phase 1 — write the batch ONCE into a uniquely-claimed dir (see
        // writeClaimedDir for the claim protocol and why the dir number
        // is a namespace, not the commit number)
        writeClaimedDir(spark, fs, path, batch)._2
      } finally { if (cs.nonEmpty) batch.unpersist(); () }
    var attempts = 0
    // phase 2 — publish the delta manifest, REBASING on conflict: the
    // base is re-read each attempt, so after losing a race the commit
    // chains behind the winner instead of forking a sibling lineage
    attempts = 0
    while (true) {
      attempts += 1
      require(attempts <= MaxCommitRetries,
        s"appendVersioned: lost the manifest race under $path " +
          s"$MaxCommitRetries times (livelock? raise MaxCommitRetries)")
      // the base is the NEWEST MANIFEST, never the pointer: the pointer
      // can lag a concurrent commit (it is written after the manifest),
      // and chaining a delta onto a lagging base would silently drop the
      // newer commit's files from this lineage
      val published = manifestVersions(fs, path)
      val v0 = published.last
      val raw0 = readRawManifest(spark, fs, path, v0).getOrElse(
        sys.error(s"version $v0 has no manifest under $path"))
      schemaCheck(raw0.schemaDdl) // a concurrent evolve/merge may have changed it
      // a constraint may have landed since the gate: re-enforce the NEW
      // ones against the written batch files before publishing
      reenforceIfChanged(spark, fs, path, cs, fresh, raw0.schemaDdl,
        s"appendVersioned($path)")
      // mirror for GENERATED columns: a spec declared since the gate gets
      // validated against the written batch files before the manifest
      // rename (addGeneratedColumn requires the column to exist in the
      // table schema and schemaCheck above proved the batch carries it —
      // only the gate's validation predates the spec)
      val freshGen = generatedColumns(spark, path).filterNot(genSpecs.contains)
      if (freshGen.nonEmpty && fresh.nonEmpty) {
        val root = rootPath(fs, new org.apache.hadoop.fs.Path(path))
        validateGeneratedOn(spark,
          readSomeFiles(spark, fs, path,
            fresh.map(e => resolveRef(root, e._1)), raw0.schemaDdl),
          freshGen, s"appendVersioned($path) post-gate spec")
      }
      val next = v0 + 1
      try {
        writeVersionDelta(spark, fs, path, next, raw0.schemaDdl,
          base = v0, add = fresh, remove = Seq.empty,
          streamBatchId = streamBatchId, op = Some("append"))
        writeVersionPointer(spark, fs, path, next)
        // keep an existing skipping manifest live over the appended files
        // (the deleteWhere/merge/optimize invariant — appends are exactly
        // the commits that degrade probe pruning, so leaving the manifest
        // stale here would make every post-append readSkipping refuse):
        // O(batch) — stats are computed for the fresh files only
        val statsDir = new org.apache.hadoop.fs.Path(path, "_graft_stats")
        if (fs.exists(statsDir)) {
          val tracked = spark.read.json(statsDir.toString).schema.fieldNames
            .toSeq.filter(_.startsWith("min_")).map(_.stripPrefix("min_"))
          if (tracked.nonEmpty) appendStats(spark, path, tracked)
        }
        refreshBloomIndexes(spark, fs, path)
        // table-level auto-compaction (see setAutoOptimize): runs AFTER
        // this commit published, in its own maintenance commit — the
        // append's version contract is unchanged
        autoOptimizePolicy(fs, path).foreach { case (limit, target) =>
          maybeAutoOptimize(spark, fs, path, limit, target)
        }
        return next
      } catch {
        case _: IllegalArgumentException
            if fs.exists(versionManifestFile(path, next)) =>
          () // manifest race lost: re-read the new base and rebase
      }
    }
    sys.error("unreachable")
  }

  def listVersions(spark: SparkSession, path: String): Seq[Long] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hp)) Seq.empty
    // once a table carries version manifests they are AUTHORITATIVE: a
    // v= dir may outlive its version (vacuum keeps files a newer manifest
    // still references), so dir presence no longer implies existence
    else if (fs.exists(versionsDir(path))) manifestVersions(fs, path)
    else dirVersions(fs, hp)
  }

  def readVersioned(spark: SparkSession, path: String,
      version: Option[Long] = None): DataFrame = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = version.orElse(readVersionPointer(fs, path)).getOrElse {
      // pointer momentarily absent (e.g. a non-atomic FS mid-publish):
      // the newest published version is by construction the latest
      val vs = listVersions(spark, path)
      require(vs.nonEmpty, s"no versions under $path")
      vs.last
    }
    if (fs.exists(versionsDir(path))) {
      val m = readVersionManifest(spark, fs, path, v)
      require(m.isDefined,
        s"version $v does not exist under $path (have: " +
          s"${listVersions(spark, path).mkString(",")})")
      readManifestFiles(spark, fs, path, m.get)
    } else {
      require(fs.exists(new org.apache.hadoop.fs.Path(path, s"v=$v")),
        s"version $v does not exist under $path (have: " +
          s"${listVersions(spark, path).mkString(",")})")
      spark.read.parquet(s"$path/v=$v")
    }
  }

  /** TIMESTAMP time travel — `readVersioned` resolved by commit time: the
    * NEWEST version whose commit timestamp is ≤ `asOfMillis` (the Delta
    * `TIMESTAMP AS OF` contract). Version manifests are stamped at
    * publish, vacuum's checkpoint materialization preserves the original
    * stamp, and resolution is a metadata-only walk over the manifest
    * headers — no data I/O until the returned frame is acted on.
    *
    * Versions written before timestamps existed sort BEFORE every stamped
    * one (they are genuinely older — stamping began when this table's
    * first stamped commit landed), so mixed-era tables resolve sanely.
    * An `asOfMillis` before the first commit is refused loudly: there was
    * no table then, and silently returning the oldest version would
    * invent history.
    */
  def readVersionedAsOf(spark: SparkSession, path: String,
      asOfMillis: Long): DataFrame =
    readVersioned(spark, path, Some(versionAsOf(spark, path, asOfMillis)))

  /** The version number `asOfMillis` resolves to (see
    * [[readVersionedAsOf]]); public so callers can log/audit which
    * version a timestamp query actually read.
    */
  def versionAsOf(spark: SparkSession, path: String,
      asOfMillis: Long): Long = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(versionsDir(path)),
      s"$path has no _graft_versions manifests - timestamp travel needs " +
        "manifest commit stamps (write through the versioned API first)")
    val stamped = manifestVersions(fs, path).map(v =>
      v -> readRawManifest(spark, fs, path, v).flatMap(_.ts).getOrElse(0L))
    require(stamped.nonEmpty, s"no versions under $path")
    val eligible = stamped.filter(_._2 <= asOfMillis).map(_._1)
    require(eligible.nonEmpty,
      s"no version of $path committed at or before $asOfMillis " +
        s"(earliest commit: ${stamped.map(_._2).min})")
    eligible.max
  }

  /** (version, commit epoch-millis, operation) per retained version,
    * ascending — the DESCRIBE HISTORY surface. ts is 0 and op "unknown"
    * for manifests written before those fields existed; vacuum's
    * checkpoint materialization preserves both.
    */
  def versionHistory(spark: SparkSession,
      path: String): Seq[(Long, Long, String)] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(versionsDir(path))) Seq.empty
    else manifestVersions(fs, path).map { v =>
      val raw = readRawManifest(spark, fs, path, v)
      (v, raw.flatMap(_.ts).getOrElse(0L),
        raw.flatMap(_.op).getOrElse("unknown"))
    }
  }

  /** CATALOG/SQL NAMING for Lake tables — the analog of the reference's
    * schema grants + named dbt models (`01-setup-sp-permissions.sql:5-12`,
    * `macros/generate_schema_name.sql:1-8`): register `name` as a SQL
    * view over the table at `path`, so `spark.sql("… FROM name …")` works
    * against versioned/evolving/plain Lake tables alike. Resolution
    * picks the strongest table shape: version manifests (current
    * published version, or `version` for a named time-travel view) →
    * schema chain → plain parquet dir. Re-registering replaces the view.
    *
    * The view captures the MANIFEST RESOLUTION at registration time (a
    * Spark temp view holds the logical plan): re-register after commits
    * to expose a newer version. That is deliberate — a named snapshot is
    * what SQL consumers want mid-session; a production metastore binding
    * would re-resolve per query.
    */
  def registerTable(spark: SparkSession, name: String, path: String,
      version: Option[Long] = None): Unit = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val df =
      if (fs.exists(versionsDir(path))) readVersioned(spark, path, version)
      else {
        require(version.isEmpty,
          s"$path carries no version manifests; cannot register version $version")
        if (readSchemaManifests(spark, path).nonEmpty) readEvolving(spark, path)
        else spark.read.parquet(path)
      }
    df.createOrReplaceTempView(name)
  }

  /** Row-reorganizing maintenance ops whose commits preserve the row
    * multiset exactly — a change feed skips them (Delta marks the same
    * commits `dataChange=false` and `table_changes` omits them).
    */
  private val ReorgOps = Set("optimize", "zorder", "rerange", "purge")

  /** CHANGE DATA FEED over the delta-manifest chain (Delta's
    * `table_changes(t, startingVersion, endingVersion)` shape, derived
    * entirely from the manifests already on disk — nothing extra is
    * written at commit time). Emits every row-level change committed in
    * versions `fromVersion..toVersion` INCLUSIVE, as the table's columns
    * plus:
    *   - `_change_type`  — `"insert"` (row added by the commit) or
    *     `"delete"` (row removed). File-granular manifests carry no
    *     row-level update lineage, so an update surfaces as
    *     delete(preimage) + insert(postimage) — RETRACTION semantics,
    *     which is exactly what incremental downstream maintenance needs:
    *     an aggregate applies inserts with weight +1 and deletes with
    *     weight −1 and lands on the same state as a full recompute.
    *   - `_commit_version` — the version that committed the change.
    *   - `_commit_timestamp` — the commit wall-clock (null for manifests
    *     predating timestamps).
    *
    * Cost ∝ CHANGED files only: each commit contributes exactly its
    * manifest's add/remove file lists; files carried between versions by
    * reference are NEVER opened (the property that makes an incremental
    * refresh against a 100 TB table read megabytes, not the table).
    * Maintenance commits ([[ReorgOps]]) rewrite files without changing
    * rows and are skipped whole. Snapshot commits (writeVersioned /
    * restore) diff their resolved file set against the previous
    * version's — re-carried files drop out of the diff, so even a
    * restore feeds only what actually changed.
    *
    * The range must lie within vacuum retention: a removed file whose
    * last referencing manifest was vacuumed is gone, and the read fails
    * loudly rather than fabricating an empty delete.
    */
  def readChangeFeed(spark: SparkSession, path: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions.{lit, timestamp_millis}
    require(fromVersion <= toVersion,
      s"readChangeFeed: fromVersion $fromVersion > toVersion $toVersion")
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    requireNoColMap(spark, fs, path, "readChangeFeed")  // feed rows would expose
    // physical names, and deltas across a rename version would mix eras
    ensureVersionManifests(spark, path)
    require(fs.exists(versionsDir(path)), s"no versions under $path")
    val all = manifestVersions(fs, path)
    val inRange = all.filter(v => v >= fromVersion && v <= toVersion)
    // a version vacuumed out of the requested range must REFUSE, never be
    // silently omitted — an incremental consumer that missed a commit's
    // changes would diverge from the table forever
    val missing = (fromVersion to toVersion).toSet -- inRange.toSet
    require(missing.isEmpty,
      s"readChangeFeed: version(s) ${missing.toSeq.sorted.take(5).mkString(",")}" +
        s" in [$fromVersion,$toVersion] have no manifest under $path — " +
        "vacuumed past retention; recompute downstream state in full")
    val root = rootPath(fs, hp)
    // the dv set live at a commit's PREDECESSOR — what the commit's
    // removed files must be read through (their tombstoned rows were
    // retracted by the dvDelete commit that wrote them; re-emitting them
    // as this commit's deletes would double-retract downstream state)
    def dvsAtPrev(v: Long): Seq[DvEntry] =
      readVersionManifest(spark, fs, path, v - 1) match {
        case Some(m) => m.dvs
        case None =>
          // predecessor vacuumed: its sidecar coverage is unknowable. A
          // table with NO dv trace anywhere proceeds (nothing to apply);
          // any surviving trace refuses, like every other read past the
          // vacuum horizon.
          val trace = manifestVersions(fs, path).exists(w =>
            readRawManifest(spark, fs, path, w).exists(r =>
              r.dv.nonEmpty || r.dvAdd.nonEmpty))
          require(!trace,
            s"readChangeFeed: version ${v - 1} (predecessor of commit $v," +
              s" which removes files) has no manifest under $path and the" +
              " table carries deletion-vector history — vacuumed past" +
              " retention; recompute downstream state in full")
          Nil
      }
    // a stand-in manifest carrying only what readFilesWithDv consults
    def dvView(ddl: String, dvs: Seq[DvEntry]) =
      VersionManifest(0L, ddl, Nil, dvs)
    def tombFrame(dvs: Seq[DvEntry]): DataFrame = spark.read
      .parquet(qualifyForRead(fs, dvs.map(d => resolveRef(root, d.dv))): _*)
      .select(org.apache.spark.sql.functions.col("file"),
        org.apache.spark.sql.functions.col("pos"))
    val parts: Seq[DataFrame] = inRange.flatMap { v =>
      val raw = readRawManifest(spark, fs, path, v).getOrElse(
        sys.error(s"version $v has no manifest under $path"))
      def stamp(df: DataFrame, changeType: String): DataFrame =
        df.withColumn("_change_type", lit(changeType))
          .withColumn("_commit_version", lit(v))
          .withColumn("_commit_timestamp", raw.ts
            .map(t => timestamp_millis(lit(t)))
            .getOrElse(lit(null).cast("timestamp")))
      def tag(files: Seq[String], changeType: String,
          dvs: Seq[DvEntry]): Option[DataFrame] =
        if (files.isEmpty) None
        else Some(stamp(
          readFilesWithDv(spark, fs, path, dvView(raw.schemaDdl, dvs),
            files.map(f => resolveRef(root, f))), changeType))
      // rows of `files` AT the tombstoned positions in `positions` — the
      // dv-delete preimages; cost ∝ covered files + KB-sized sidecars
      def rowsAt(files: Seq[String], positions: DataFrame,
          changeType: String): Option[DataFrame] =
        if (files.isEmpty) None
        else {
          import org.apache.spark.sql.functions.broadcast
          val scanned = readFilesWithDvTagged(spark, fs, path,
            dvView(raw.schemaDdl, Nil), files.map(f => resolveRef(root, f)))
          Some(stamp(scanned.join(broadcast(positions),
              scanned(DvSrcFileCol) === positions("file") &&
                scanned(DvPosCol) === positions("pos"),
              "left_semi")
            .drop(DvSrcFileCol, DvPosCol), changeType))
        }
      if (raw.op.exists(ReorgOps)) Seq.empty
      else if (raw.op.contains("dvdelete") && raw.files.isEmpty) {
        // merge-on-read delete: the commit's payload is its sidecars;
        // the deleted rows are the covered files' rows at the tombstoned
        // positions (reading only files this commit touched — the feed's
        // cost contract). A vacuum-MATERIALIZED dvdelete is a full
        // manifest carrying the resolved dv set, not a dvAdd — it falls
        // through to the snapshot branch below, whose carried-file
        // tombstone diff against v-1 reconstructs exactly these deletes.
        // Positions already tombstoned at v-1 are SUBTRACTED first: two
        // racing dvDeletes with overlapping predicates may legally
        // repeat a (file, pos) (each anti-joined only its own base), and
        // re-emitting the shared row would retract it twice downstream.
        val mine = tombFrame(raw.dvAdd).distinct()
        val prevDvs = dvsAtPrev(v)
        val fresh =
          if (prevDvs.isEmpty) mine
          else mine.except(tombFrame(prevDvs))
        rowsAt(raw.dvAdd.flatMap(_.files).distinct, fresh, "delete").toSeq
      }
      else raw.files match {
        case None =>
          val prevDvs =
            if (raw.remove.isEmpty) Nil
            else dvsAtPrev(v)
          tag(raw.add.map(_._1), "insert", Nil).toSeq ++
            tag(raw.remove, "delete", prevDvs).toSeq
        case Some(cur) =>
          // full-snapshot manifest: the change set is the file diff vs
          // the previous version. All-inserts ONLY for the table's
          // GENUINE first commit (v=1 — prior state empty); a full
          // manifest at the vacuum horizon (v>1, a materialized
          // delta) must not be re-fed as whole-table inserts, so it
          // diffs against v-1 and fails loudly if v-1 is gone.
          if (v == 1L) tag(cur.map(_._1), "insert", raw.dv).toSeq
          else {
            val prevM = readVersionManifest(spark, fs, path, v - 1)
              .getOrElse(sys.error(
                s"readChangeFeed: version ${v - 1} (predecessor of " +
                  s"snapshot commit $v) has no manifest under $path — " +
                  "range reaches past vacuum retention"))
            val prevSet = prevM.entries.map(_._1).toSet
            val curSet = cur.map(_._1).toSet
            val fileParts =
              tag(cur.map(_._1).filterNot(prevSet), "insert", raw.dv).toSeq ++
                tag(prevM.entries.map(_._1).filterNot(curSet), "delete",
                  prevM.dvs).toSeq
            // carried files whose TOMBSTONE set changed (a restore across
            // a dvDelete/purge boundary): positions tombstoned before but
            // not after came BACK (insert); newly tombstoned ones are
            // deletes. File-diff alone cannot see either.
            val carried = prevSet.intersect(curSet)
            def carriedTombs(dvs: Seq[DvEntry]): Option[DataFrame] = {
              val ds = dvs.filter(_.files.exists(carried))
              if (ds.isEmpty) None
              else Some(tombFrame(ds).filter(
                org.apache.spark.sql.functions.col("file")
                  .isin(carried.toSeq: _*)))
            }
            // short-circuit the common checkpoint shape (depth-cap or
            // vacuum materialization of a non-dv commit): identical dv
            // sets on both sides diff to nothing — decided from metadata
            // already in hand, no covered-file I/O
            val dvParts =
              if (prevM.dvs.toSet == raw.dv.toSet) Seq.empty
              else (carriedTombs(prevM.dvs), carriedTombs(raw.dv)) match {
                case (None, None) => Seq.empty
                case (p, c) =>
                  val empty = tombFrame(
                    (prevM.dvs ++ raw.dv).take(1)).limit(0)
                  // SET semantics: racing dvDeletes may duplicate a
                  // (file, pos) across sidecars — multiset exceptAll
                  // would turn "two copies minus one" into a phantom
                  // insert for a row that is still tombstoned
                  val pT = p.getOrElse(empty).distinct()
                  val cT = c.getOrElse(empty).distinct()
                  val coveredFiles = (prevM.dvs ++ raw.dv)
                    .flatMap(_.files).distinct.filter(carried)
                  rowsAt(coveredFiles, pT.except(cT), "insert").toSeq ++
                    rowsAt(coveredFiles, cT.except(pT), "delete").toSeq
              }
            fileParts ++ dvParts
          }
      }
    }
    if (parts.isEmpty) {
      val v = all.lastOption.getOrElse(
        sys.error(s"no versions under $path"))
      val ddl = readRawManifest(spark, fs, path, v).get.schemaDdl
      val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
        .add("_change_type", "string").add("_commit_version", "bigint")
        .add("_commit_timestamp", "timestamp")
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else parts.reduce(_.unionByName(_))
  }

  /** CHANGE-FEED → FILE-STREAM BRIDGE: export every not-yet-exported
    * commit's change rows as immutable JSON files under `landing`, in
    * commit order with distinct mod-times, so a Structured Streaming file
    * source (`readStream.json(landing)`) replays the table's history as
    * micro-batches — the Delta-CDF-as-a-stream composition every
    * production incremental pipeline runs (the reference's
    * `STREAM(ref(...))` at `silver_iot_events.sql:11` is this pattern on
    * Databricks). Spark's file source is the one streaming source whose
    * offset/commit logs give exactly-once replay for free, so the bridge
    * rides it instead of a bespoke DSv2 source.
    *
    * Contract:
    *   - RESUMABLE + IDEMPOTENT: exported versions are encoded in the
    *     file names (`cdf-v00003-*.json`) and each version's publish is
    *     sealed by a `_cdf-v00003.done` completion marker written after
    *     its last part rename (the `_` prefix hides it from Spark's file
    *     sources). A re-call exports only commits that landed since the
    *     last SEALED version, never rewrites a sealed file (the
    *     file-stream immutability contract), and re-exports a version
    *     whose publish crashed mid-rename (data files without a marker)
    *     after cleaning its partial parts — the rewrite is
    *     byte-deterministic, so an exactly-once consumer is unharmed.
    *     Call it after each producer commit (or on a timer) and the
    *     consumer stream sees an unbounded, ordered feed.
    *   - cost per call ∝ the NEW commits' CHANGED files only (the
    *     [[readChangeFeed]] guarantee) — flat in table size.
    *   - `_commit_timestamp` is DROPPED (wall-clock — a replayed export
    *     must be byte-deterministic); `_change_type` (+1/−1 retraction
    *     weights downstream) and `_commit_version` ride along.
    *   - `mtimeOrder = true` (default) separates versions by >1 s of
    *     mod-time so coarse-mtime filesystems preserve commit order for
    *     ORDER-SENSITIVE consumers. That costs ~1.1 s per version — an
    *     18-minute pure-sleep tax on a 1,000-commit backfill — so
    *     `mtimeOrder = false` skips every sleep for ORDER-INSENSITIVE
    *     consumers: the commit version already rides IN the rows
    *     (`_commit_version`) and in the file names, so any fold that is
    *     commutative over commits (a ±1 retraction-weight aggregate) or
    *     that resolves order from the data (argmax by `_commit_version`)
    *     replays exactly even when micro-batches interleave versions.
    *   - `keys` nonEmpty switches to the KEYED feed
    *     ([[readChangeFeedKeyed]]): update pre/post classification,
    *     carried file-rewrite pairs dropped — the export a key-driven
    *     consumer (SCD1 fold, notification fan-out) wants.
    *   - `format` "json" (default — human-greppable, the fixture
    *     landings' convention) or "parquet" (the 100 TB choice: ~3x
    *     fewer bytes, column pruning at the consumer's scan; the file
    *     stream source reads either). A landing is ONE format for its
    *     lifetime — mixing would break the consumer's schema contract,
    *     so a resume call refuses a format switch loudly.
    *
    * @return the newest exported version (head, or `upTo` if lower)
    */
  def exportChangeFeedLanding(spark: SparkSession, path: String,
      landing: String, upTo: Option[Long] = None,
      filesPerVersion: Int = 2, keys: Seq[String] = Nil,
      format: String = "json", mtimeOrder: Boolean = true): Long = {
    require(format == "json" || format == "parquet",
      s"exportChangeFeedLanding: format must be json or parquet, got $format")
    val lp = new org.apache.hadoop.fs.Path(landing)
    val fs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(lp)
    ensureVersionManifests(spark, path)
    val tfs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = manifestVersions(tfs, path)
    require(versions.nonEmpty, s"exportChangeFeedLanding: no versions under $path")
    val head = upTo.map(u => math.min(u, versions.last)).getOrElse(versions.last)
    val namePat = "cdf-v(\\d+)-.*\\.(json|parquet)".r
    val markerPat = "_cdf-v(\\d+)\\.done".r
    val names = fs.listStatus(lp).toSeq.map(_.getPath.getName)
    val published = names.collect { case namePat(v, fmt) => (v.toLong, fmt) }
    published.map(_._2).distinct.foreach(f0 =>
      require(f0 == format,
        s"exportChangeFeedLanding($landing): landing holds $f0 files; a " +
          s"$format resume would hand the consumer a mixed-schema dir — " +
          "one landing, one format"))
    // A version counts EXPORTED only when its completion marker exists —
    // the marker is written AFTER the last part rename, so a crash
    // mid-publish leaves data files without a marker, never the reverse.
    // Marker names lead with `_`, which Spark's file sources filter out,
    // so the consumer stream never sees them. Partial (marker-less)
    // versions are cleaned and re-exported below: the rewrite is
    // byte-deterministic BY CONSTRUCTION — rows are hash-partitioned
    // into filesPerVersion parts on their own values and sorted within
    // each part (coalesce alone re-cuts boundaries by file-listing
    // order, which Spark does NOT fix across JVMs), so a consumer that
    // already ingested a partial file by name re-reads nothing and
    // loses nothing.
    val exported = names.collect { case markerPat(v) => v.toLong }
    val partial = published.map(_._1).distinct.filterNot(exported.contains)
    partial.foreach { v =>
      names.collect { case n @ namePat(pv, _) if pv.toLong == v => n }
        .foreach(n => fs.delete(new org.apache.hadoop.fs.Path(lp, n), false))
    }
    val start = if (exported.isEmpty) versions.head else exported.max + 1
    val todo = (versions.filter(v => v >= start && v <= head) ++
      partial.filter(_ <= head)).distinct.sorted
    // ZERO-SLEEP LANE, FUSED: with no mtime-order contract the versions
    // need no wall-clock separation, so exporting them one job per
    // version pays (versions − 1) avoidable job launches + stage writes.
    // One pass reads the whole todo range, tags every row with the SAME
    // part index the per-version path computes — HashPartitioning's
    // pmod(murmur3(sortCols), filesPerVersion), available as the SQL
    // hash() — and writes all (version, part) groups in a single
    // dynamic-partitioned job. Per-file rows and order are therefore
    // byte-identical to the per-version path (same membership rule, same
    // within-part sort, same writer); ExportFusionSpec pins that.
    if (!mtimeOrder && todo.size > 1) {
      fusedExport(spark, path, landing, fs, lp, todo, filesPerVersion,
        keys, format)
      return head
    }
    todo.zipWithIndex.foreach { case (v, i) =>
      // mtime separation: from prior landing files always, and between
      // sibling versions in one call (first version of a fresh landing
      // needs none — nothing precedes it); skipped entirely for
      // order-insensitive consumers (see the mtimeOrder contract above)
      if (mtimeOrder && (i > 0 || exported.nonEmpty || partial.nonEmpty))
        Thread.sleep(1100)
      val stage = new org.apache.hadoop.fs.Path(landing, s".stage-v$v")
      val feed =
        if (keys.isEmpty) readChangeFeed(spark, path, v, v)
        else readChangeFeedKeyed(spark, path, v, v, keys)
      // deterministic part assignment + in-file order: a crashed publish
      // is cleaned and re-exported, and a consumer may have ingested a
      // partial part BY NAME before the crash — the re-cut must
      // reproduce those bytes exactly. Hash partitioning on the row's
      // own values and a total sort within each part are pure functions
      // of the data; coalesce's boundaries follow file-listing order,
      // which can drift across JVMs/filesystems.
      val bare = feed.drop("_commit_timestamp")
      val sortCols = bare.columns.sorted.map(org.apache.spark.sql.functions.col(_))
      val w = bare
        .repartition(filesPerVersion, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
        .write.mode("overwrite")
      if (format == "json") w.json(stage.toString)
      else w.parquet(stage.toString)
      // SORT BY NAME before indexing: listStatus order is filesystem-
      // dependent (RawLocalFileSystem delegates to File.list, unsorted),
      // and the landing index j decides which rows a consumer already
      // ingested under cdf-vN-j — an unsorted re-cut could swap the two
      // parts' contents under their names. The part-NNNNN prefix IS the
      // deterministic hash-partition id, so name order = partition order.
      fs.listStatus(stage)
        .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
        .sortBy(_.getPath.getName)
        .zipWithIndex.foreach { case (f, j) =>
          require(fs.rename(f.getPath,
            new org.apache.hadoop.fs.Path(landing, f"cdf-v$v%05d-$j.$format")),
            s"exportChangeFeedLanding: rename failed for v$v part $j")
        }
      fs.delete(stage, true)
      // completion marker LAST: publish is now detectably atomic — a
      // crash between renames leaves no marker and the next call
      // re-exports the version instead of silently skipping its
      // remaining parts (the old resume compared nothing and lost rows)
      fs.create(new org.apache.hadoop.fs.Path(lp, f"_cdf-v$v%05d.done"),
        true).close()
    }
    head
  }

  /** One-job export of every pending version (zero-sleep lane only — the
    * mtime-order contract needs per-version wall-clock separation, which
    * forces the loop). Rows are tagged with `_graft_p =
    * pmod(hash(sortCols…), filesPerVersion)` — exactly the part index
    * HashPartitioning assigns in the per-version path — and written with
    * dynamic partitioning on (version, part); each group lands whole in
    * one task, so the rename pass below finds exactly one file per
    * (version, part). Markers are written ascending AFTER all renames:
    * a crash mid-publish leaves marker-less versions that the next call
    * cleans and re-exports, same as the per-version path.
    */
  private def fusedExport(spark: SparkSession, path: String,
      landing: String, fs: org.apache.hadoop.fs.FileSystem,
      lp: org.apache.hadoop.fs.Path, todo: Seq[Long], filesPerVersion: Int,
      keys: Seq[String], format: String): Unit = {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    val feedAll =
      (if (keys.isEmpty) readChangeFeed(spark, path, todo.min, todo.max)
       else readChangeFeedKeyed(spark, path, todo.min, todo.max, keys))
        .filter(col("_commit_version").isin(todo: _*))
        .drop("_commit_timestamp")
    val sortCols = feedAll.columns.sorted
    val stage = new org.apache.hadoop.fs.Path(landing, ".stage-fused")
    val staged = feedAll
      .withColumn("_graft_v", col("_commit_version"))
      .withColumn("_graft_p",
        pmod(hash(sortCols.map(col): _*), lit(filesPerVersion)))
      .repartition(col("_graft_v"), col("_graft_p"))
      .sortWithinPartitions(
        (Seq("_graft_v", "_graft_p") ++ sortCols).map(col): _*)
      .write.mode("overwrite").partitionBy("_graft_v", "_graft_p")
    if (format == "json") staged.json(stage.toString)
    else staged.parquet(stage.toString)
    val vDirPat = "_graft_v=(\\d+)".r
    val pDirPat = "_graft_p=(\\d+)".r
    fs.listStatus(stage).filter(_.isDirectory).foreach { vd =>
      val v = vd.getPath.getName match {
        case vDirPat(x) => x.toLong
        case other => sys.error(s"fusedExport: unexpected stage dir $other")
      }
      fs.listStatus(vd.getPath).filter(_.isDirectory).foreach { pd =>
        val p = pd.getPath.getName match {
          case pDirPat(x) => x.toInt
          case other => sys.error(s"fusedExport: unexpected part dir $other")
        }
        val parts = fs.listStatus(pd.getPath)
          .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
        require(parts.length == 1,
          s"fusedExport: (v$v, p$p) produced ${parts.length} files — the " +
            "(version, part) repartition should land each group whole")
        require(fs.rename(parts.head.getPath,
          new org.apache.hadoop.fs.Path(landing, f"cdf-v$v%05d-$p.$format")),
          s"fusedExport: rename failed for v$v part $p")
      }
    }
    fs.delete(stage, true)
    // markers ascending, after every part is in place (an empty delta
    // version has no stage dir but still seals its marker)
    todo.foreach { v =>
      fs.create(new org.apache.hadoop.fs.Path(lp, f"_cdf-v$v%05d.done"),
        true).close()
    }
  }

  /** INCREMENTAL MATERIALIZED-VIEW MAINTENANCE over the change feed —
    * the reference's "automatic incremental refresh"
    * (README_DBT.md:32,102-103) as a first-class operator. The view at
    * `viewPath` is the distributive aggregate
    * {{{ SELECT keys…, count(*) AS countCol, sum(c) AS c  -- c ∈ sumCols
    *     FROM readVersioned(sourcePath) GROUP BY keys… }}}
    * maintained as a versioned Lake table. Every refresh commit is
    * stamped (streamBatchId channel) with the SOURCE version it folded
    * up to — the watermark rides the commit ATOMICALLY, so a crashed
    * refresh retries idempotently: either the commit landed (watermark
    * advanced, re-refresh no-ops) or it didn't (nothing was applied,
    * the same window recomputes).
    *
    * Refresh cost ∝ CHANGED data + CHANGED keys, never the source:
    * [[readChangeFeed]] opens only each commit's add/remove files, the
    * per-key delta aggregates map-side (insert +1 / delete −1 retraction
    * weights), and the view update lands as ONE file-granular [[mergeCdc]]
    * commit rewriting only the view files that hold changed keys — keys
    * whose count reaches zero are deleted from the view. First call (no
    * view yet) materializes the full aggregate once.
    *
    * @return (view version, source version the view now reflects)
    */
  /** [[readChangeFeed]] with UPDATE classification — Delta CDF's four
    * `_change_type` values for KEY-UNIQUE tables (the merge-maintained
    * shape): within each commit, a delete and an insert sharing `keys`
    * are an update and re-emit as `update_preimage` / `update_postimage`;
    * unpaired rows stay `insert` / `delete`. File-granular manifests
    * carry no row lineage, so the pairing is BY KEY — on a table with
    * duplicate keys the pairing would be ambiguous and this form must
    * not be used (the raw retraction feed stays correct there).
    *
    * CARRIED rows are no-ops, matching Delta's `table_changes`: a file
    * rewrite re-emits every unchanged row it carried as a delete+insert
    * pair with IDENTICAL payloads — emitting those as update pre/post
    * images would show key-driven consumers (notification, propagation)
    * a phantom update for every carried row. Pairs whose pre and post
    * payloads are null-safely equal are filtered out entirely; the
    * retraction fold is unchanged (an identical ±1 pair nets zero).
    *
    * One self-join of the feed per call, on (commit, keys) — cost ∝ the
    * feed, which is ∝ changed files.
    */
  def readChangeFeedKeyed(spark: SparkSession, path: String,
      fromVersion: Long, toVersion: Long,
      keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, struct, when}
    require(keys.nonEmpty, "readChangeFeedKeyed needs key columns")
    val feed = readChangeFeed(spark, path, fromVersion, toVersion)
    val metaCols = Set("_change_type", "_commit_version", "_commit_timestamp")
    val payload = feed.columns.filterNot(c => metaCols(c) || keys.contains(c))
    // keys-only table: a pair is by definition carried (identical rows)
    def payloadStruct =
      if (payload.isEmpty) lit(0) else struct(payload.map(col): _*)
    val joinCols = "_commit_version" +: keys
    val dels = feed.filter(col("_change_type") === "delete")
    val ins = feed.filter(col("_change_type") === "insert")
    val paired = dels
      .select(joinCols.map(col) :+ payloadStruct.as("_graft_pre"): _*)
      .distinct()
      .join(ins.select(joinCols.map(col) :+ payloadStruct.as("_graft_post"): _*)
        .distinct(), joinCols.toSeq)
      .select(joinCols.map(col) :+
        (col("_graft_pre") <=> col("_graft_post")).as("_graft_carried"): _*)
    feed.join(paired, joinCols.toSeq, "left_outer")
      .filter(col("_graft_carried").isNull || !col("_graft_carried"))
      .withColumn("_change_type",
        when(col("_graft_carried").isNull, col("_change_type"))
          .when(col("_change_type") === "delete", lit("update_preimage"))
          .otherwise(lit("update_postimage")))
      .drop("_graft_carried")
  }

  /** SCD2 HISTORY from the change feed — dbt-snapshot semantics over a
    * versioned table, with the COMMIT VERSION as the validity axis
    * (deterministic, unlike wall-clock commit times): every row version
    * the table ever held in `fromVersion..toVersion` yields
    * `(payload…, valid_from_version, valid_to_version, is_current)`,
    * where valid_to −1 means still current.
    *
    * Mechanics, all ∝ the feed (changed files, never the table):
    * file-rewrite noise — carried rows a merge/delete re-emitted as
    * identical delete+insert pairs — cancels by NET WEIGHT per
    * (commit, payload) first, so only true value changes open or close
    * intervals; an interval's close is the first cancelling commit after
    * its open (payload-matched with a NULL-SAFE join, so null-bearing
    * payloads pair correctly); a payload re-appearing later opens a
    * fresh interval.
    */
  def scd2FromFeed(spark: SparkSession, path: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, min, sum, when}
    val feed = readChangeFeed(spark, path, fromVersion, toVersion)
    val payload = feed.columns.filterNot(Set("_change_type",
      "_commit_version", "_commit_timestamp")).toSeq
    val w = when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L))
    val net = feed
      .groupBy(("_commit_version" +: payload).map(col): _*)
      .agg(sum(w).as("_net")).filter(col("_net") =!= 0L)
    val opens = net.filter(col("_net") > 0).select(payload.map(col) :+
      col("_commit_version").as("valid_from_version"): _*).as("o")
    val closes = net.filter(col("_net") < 0).select(payload.map(col) :+
      col("_commit_version").as("_close_v"): _*).as("c")
    val cond = payload.map(p => col(s"o.$p") <=> col(s"c.$p")).reduce(_ && _)
    opens.join(closes, cond, "left_outer")
      .groupBy(payload.map(p => col(s"o.$p").as(p)) :+
        col("o.valid_from_version").as("valid_from_version"): _*)
      .agg(min(when(col("c._close_v") > col("o.valid_from_version"),
        col("c._close_v"))).as("_vt"))
      .select(payload.map(col) ++ Seq(
        col("valid_from_version"),
        coalesce(col("_vt"), lit(-1L)).as("valid_to_version"),
        col("_vt").isNull.cast("int").as("is_current")): _*)
  }

  /** `forceFull = true` recomputes the view from the current source
    * snapshot instead of folding the feed — the recovery path when the
    * feed window was vacuumed past retention (readChangeFeed refuses) or
    * after changing the aggregate definition.
    *
    * Key columns must be NON-NULL in the source: SQL join semantics never
    * match null keys (the same rule as Delta MERGE), so a null-key group
    * would re-insert instead of update on every fold. Coalesce nulls to a
    * sentinel upstream if the domain needs them. Aggregates are limited
    * to count + sums because those are the retraction-foldable ones;
    * min/max need a recompute on delete (use forceFull or a full view).
    */
  def refreshIncremental(spark: SparkSession, sourcePath: String,
      viewPath: String, keys: Seq[String],
      sumCols: Seq[String] = Seq.empty,
      countCol: String = "n_rows",
      forceFull: Boolean = false): (Long, Long) = {
    import org.apache.spark.sql.functions.{coalesce, col, count, lit, sum, when}
    require(keys.nonEmpty, "refreshIncremental needs at least one key column")
    val sfs = new org.apache.hadoop.fs.Path(sourcePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(sfs.exists(versionsDir(sourcePath)),
      s"$sourcePath is not a versioned table (refresh tracks its versions)")
    val srcHead = readVersionPointer(sfs, sourcePath)
      .orElse(manifestVersions(sfs, sourcePath).lastOption)
      .getOrElse(sys.error(s"no versions under $sourcePath"))
    val vfs = new org.apache.hadoop.fs.Path(viewPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (forceFull || !vfs.exists(versionsDir(viewPath))) {
      val full = readVersioned(spark, sourcePath, Some(srcHead))
        .groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as(countCol),
          sumCols.map(c => sum(col(c)).as(c)): _*)
      return (writeVersioned(spark, full, viewPath,
        streamBatchId = Some(srcHead)), srcHead)
    }
    val viewHead = readVersionPointer(vfs, viewPath)
      .orElse(manifestVersions(vfs, viewPath).lastOption)
      .getOrElse(sys.error(s"no versions under $viewPath"))
    val w = readRawManifest(spark, vfs, viewPath, viewHead)
      .flatMap(_.streamBatchId).getOrElse(sys.error(
        s"$viewPath's latest commit carries no source watermark — " +
          "not a refresh-maintained view"))
    if (w >= srcHead) return (viewHead, w) // nothing new to fold
    val sign = when(col("_change_type") === "insert", lit(1L))
      .otherwise(lit(-1L))
    val deltaAggs = sum(sign).as("_graft_dn") +:
      sumCols.map(c => sum(col(c) * sign).as(s"_graft_d_$c"))
    val delta = readChangeFeed(spark, sourcePath, w + 1, srcHead)
      .groupBy(keys.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
    val view = readVersioned(spark, viewPath, Some(viewHead))
    val viewTypes = view.schema.map(f => f.name -> f.dataType).toMap
    val merged = delta.join(view, keys, "left_outer")
      .select((keys.map(col) :+
        (coalesce(col(countCol), lit(0L)) + col("_graft_dn")).as(countCol))
        ++ sumCols.map(c =>
          // Both sides need the coalesce: sum(c * sign) over a fold window
          // where every changed row for the key has NULL in c is NULL, and
          // view.c + NULL would overwrite the key's accumulated sum with
          // NULL (silently rebasing it to 0 on the NEXT fold).
          (coalesce(col(c), lit(0).cast(viewTypes(c))) +
            coalesce(col(s"_graft_d_$c"), lit(0).cast(viewTypes(c))))
            .cast(viewTypes(c)).as(c)): _*)
    val (v, _) = mergeCdc(spark, viewPath, merged, keys,
      deleteWhen = col(countCol) <= 0L, streamBatchId = Some(srcHead))
    (v, srcHead)
  }

  /** STREAMING incremental MV maintenance — [[refreshIncremental]]'s
    * continuous sibling and the composition r18's verdict flagged as the
    * unjoined halves: the change feed arrives as a STREAM (the
    * [[exportChangeFeedLanding]] bridge), and each `foreachBatch`
    * micro-batch folds its retraction-weighted per-key delta into the
    * versioned view with ONE [[mergeCdc]] commit. The reference's
    * "automatic incremental refresh" (README_DBT.md:32,102-103) run
    * continuously instead of on demand.
    *
    * Exactly-once rides the commit ATOMICALLY: every fold commit is
    * stamped (streamBatchId channel) with the micro-batch id, so a
    * foreachBatch REPLAY after a crash (offsets logged, sink work maybe
    * done, checkpoint commit missing — Spark's documented replay window)
    * sees `stamp >= batchId` and no-ops instead of double-folding. The
    * batch's feed rows must arrive in commit order ACROSS batches (the
    * landing's mtimeOrder contract): deletes retract state that earlier
    * batches inserted, and the ≤0 delete rule makes the fold
    * order-sensitive by design (the production shape — a zero-count key
    * leaves the view). For the zero-sleep export lane (`mtimeOrder =
    * false`, versions free to interleave across micro-batches) pass
    * `retainNonPositive = true`: the fold keeps transiently-negative
    * counts in the view instead of deleting at ≤0 — per-key addition is
    * commutative, so ANY arrival order lands on the same net state — and
    * the reader filters `countCol > 0` (or a final compaction drops
    * zeros). With the delete rule, a delete arriving BEFORE its insert
    * would drop the key at count −1 and LOSE the retraction; the next
    * insert would then land on 0 instead of net.
    *
    * Cost per micro-batch ∝ the batch + the view files holding changed
    * keys ([[mergeCdc]]'s file-granular discipline) — never the source.
    *
    * @return the view version now current
    */
  def foldFeedBatchIntoAggView(batch: DataFrame, viewPath: String,
      batchId: Long, keys: Seq[String], sumCols: Seq[String] = Seq.empty,
      countCol: String = "n_rows",
      retainNonPositive: Boolean = false): Long = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, sum, when}
    require(keys.nonEmpty, "foldFeedBatchIntoAggView needs key columns")
    require(batchId >= 0 && batchId < DimStampBase,
      s"fact-channel batch id $batchId collides with the dim stamp " +
        s"channel (ids must be < $DimStampBase)")
    val spark = batch.sparkSession
    val vfs = new org.apache.hadoop.fs.Path(viewPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = vfs.exists(versionsDir(viewPath))
    if (exists) {
      val head = readVersionPointer(vfs, viewPath)
        .orElse(manifestVersions(vfs, viewPath).lastOption)
        .getOrElse(sys.error(s"no versions under $viewPath"))
      // replay guard compares ONLY against the FACT channel's latest
      // stamp: the head commit may be a dim-side fold (stamped at
      // 1e6+bid), and comparing a small fact batch id against a dim
      // stamp would silently no-op every fact fold that follows a dim
      // fold — dropping fact data in exactly the "continuous fact-side
      // fold between dim refreshes" pattern the docs advertise.
      val (factStamp, anyStamp) =
        latestStampInChannel(spark, vfs, viewPath, _ < DimStampBase)
      if (!anyStamp) sys.error(
        s"$viewPath carries no batch stamp in any commit — " +
          "not a stream-maintained view")
      if (factStamp.exists(_ >= batchId))
        return head // replayed batch: idempotent no-op
    }
    val sign = when(col("_change_type") === "insert", lit(1L))
      .otherwise(lit(-1L))
    val deltaAggs = sum(sign).as("_graft_dn") +:
      sumCols.map(c => sum(col(c) * sign).as(s"_graft_d_$c"))
    val delta = batch.groupBy(keys.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
    if (!exists) {
      val initAll = delta.select((keys.map(col) :+
        col("_graft_dn").as(countCol)) ++
        sumCols.map(c => col(s"_graft_d_$c").as(c)): _*)
      // order-insensitive lane: a first batch that is all-deletes must
      // SEED the view with its negative balance, not drop it
      val init = if (retainNonPositive) initAll
        else initAll.filter(col(countCol) > 0L)
      return writeVersioned(spark, init, viewPath,
        streamBatchId = Some(batchId))
    }
    val view = readVersioned(spark, viewPath)
    val viewTypes = view.schema.map(f => f.name -> f.dataType).toMap
    val merged = delta.join(view, keys, "left_outer")
      .select((keys.map(col) :+
        (coalesce(col(countCol), lit(0L)) + col("_graft_dn")).as(countCol))
        ++ sumCols.map(c =>
          // same two-sided coalesce rule as refreshIncremental: a batch
          // whose every changed row has NULL in c must not rebase the
          // key's accumulated sum
          (coalesce(col(c), lit(0).cast(viewTypes(c))) +
            coalesce(col(s"_graft_d_$c"), lit(0).cast(viewTypes(c))))
            .cast(viewTypes(c)).as(c)): _*)
    val deleteRule = if (retainNonPositive) lit(false)
      else col(countCol) <= 0L
    val (v, _) = mergeCdc(spark, viewPath, merged, keys,
      deleteWhen = deleteRule, streamBatchId = Some(batchId))
    v
  }

  /** The boundary between the two stamp channels packed into the one
    * `streamBatchId` slot a manifest carries: FACT-side folds stamp the
    * raw micro-batch id (required < 1e6) and DIM-side folds stamp
    * `1e6 + id`. A replay guard must compare a batch id ONLY against
    * stamps from its OWN channel — the head commit may belong to the
    * other drain, and a cross-channel compare either silently no-ops
    * real work (fact id vs dim stamp) or misses a replay (dim tag vs
    * fact stamp).
    */
  private[graft] val DimStampBase = 1000000L

  /** The view's latest stamp WITHIN a channel, walking commits head →
    * tail until one matches `inChannel` — the replay-guard primitive for
    * custom foreachBatch folds (e.g. the dim-side join-view maintenance
    * in StreamQueries): skip the fold when the channel's latest stamp
    * already covers the batch id. There is deliberately NO head-only
    * variant — comparing against whatever stamp happens to sit at the
    * head is exactly the cross-channel bug this replaced (a foreign
    * channel's big stamp silently no-ops real work; a replay hides
    * behind a foreign commit and double-applies). Cost ∝ commits since
    * the channel's last fold (manifests are small JSON; in an
    * alternating fold the walk is 1–2 reads).
    */
  def lastStreamBatchStampInChannel(spark: SparkSession, path: String,
      inChannel: Long => Boolean): Option[Long] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(versionsDir(path))) return None
    latestStampInChannel(spark, fs, path, inChannel)._1
  }

  /** (latest stamp satisfying `inChannel`, whether ANY commit in the
    * walked history carried a stamp at all). The second element lets
    * [[foldFeedBatchIntoAggView]] keep refusing to fold into a view no
    * stream ever maintained, without mistaking "head is the other
    * channel's commit" for "not stream-maintained".
    */
  private def latestStampInChannel(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String,
      inChannel: Long => Boolean): (Option[Long], Boolean) = {
    var anyStamp = false
    val it = manifestVersions(fs, path).sorted.reverseIterator
    while (it.hasNext) {
      readRawManifest(spark, fs, path, it.next())
        .flatMap(_.streamBatchId) match {
        case Some(s) =>
          anyStamp = true
          if (inChannel(s)) return (Some(s), true)
        case None => ()
      }
    }
    (None, anyStamp)
  }

  /** CONSUMER-CHECKPOINT-AWARE landing retention — the cleanup that
    * bounds an [[exportChangeFeedLanding]] landing (r18's verdict: "the
    * landing appends forever"). A version's data files are reclaimable
    * once the consumer's checkpoint PROVES it ingested them: the file
    * source's offset log (`sources/0/<batch>`) names every file each
    * batch read, and `commits/<batch>` seals the batches that finished.
    * A SEALED landing version whose every present part appears in a
    * committed batch is pruned; its `_cdf-v*.done` marker STAYS — the
    * marker carries the producer's resume watermark (versions must never
    * re-export) and costs zero bytes of data. Exactly-once is unharmed:
    * the file source never re-lists a deleted path, and replay of a
    * committed batch reads from the checkpoint, not the landing.
    *
    * Multi-consumer landings pass EVERY consumer's checkpoint in ONE
    * call: a version is reclaimed only when ALL of them have committed
    * every one of its parts — true intersection semantics. (Calling the
    * single-checkpoint form once per consumer would be a UNION: pruning
    * against consumer A's checkpoint deletes versions consumer B has not
    * yet read — the r19 advisor's data-loss finding.) A checkpoint that
    * has not committed anything yet vetoes all pruning. A consumer ADDED
    * after a prune must not start from the landing's beginning — gate it
    * with [[requireLandingIntact]] before its first drain.
    *
    * @return (versions pruned, data files deleted)
    */
  def pruneChangeFeedLanding(spark: SparkSession, landing: String,
      checkpointDir: String): (Long, Long) =
    pruneChangeFeedLanding(spark, landing, Seq(checkpointDir))

  def pruneChangeFeedLanding(spark: SparkSession, landing: String,
      checkpointDirs: Seq[String]): (Long, Long) = {
    require(checkpointDirs.nonEmpty,
      "pruneChangeFeedLanding: need at least one consumer checkpoint")
    val lp = new org.apache.hadoop.fs.Path(landing)
    val fs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val namePat = "cdf-v(\\d+)-.*\\.(json|parquet)".r
    val markerPat = "_cdf-v(\\d+)\\.done".r
    val names = fs.listStatus(lp).toSeq.map(_.getPath.getName)
    val sealedVs = names.collect { case markerPat(v) => v.toLong }.toSet
    // the file-name sets each consumer's checkpoint PROVES ingested;
    // None = that consumer committed nothing yet, which vetoes pruning
    val perConsumer = checkpointDirs.map(d => committedLandingFiles(spark, d))
    if (perConsumer.exists(_.isEmpty)) return (0L, 0L)
    val committed = perConsumer.flatten.reduce(_ intersect _)
    val prunable = names.collect { case n @ namePat(v, _) => (v.toLong, n) }
      .groupBy(_._1)
      .filter { case (v, parts) =>
        sealedVs(v) && parts.forall(p => committed(p._2)) }
    var nFiles = 0L
    prunable.toSeq.sortBy(_._1).foreach { case (v, parts) =>
      // tombstone BEFORE the deletes: [[requireLandingIntact]] must
      // distinguish "pruned after consumers passed it" from "sealed with
      // a legitimately empty delta" (an empty feed writes zero part files
      // but still seals its .done marker) — absence of data alone cannot.
      // Ordering is load-bearing (r20 advisor): a crash BETWEEN the
      // deletes and a trailing tombstone create would leave a gutted
      // version that reads as a harmless empty delta, silently admitting
      // a fresh consumer to a partial history. Tombstone-first fails the
      // other way — a crash before any delete leaves an intact version
      // marked pruned, which refuses fresh consumers (safe) and is
      // finished by the next prune call.
      fs.create(new org.apache.hadoop.fs.Path(lp, f"_cdf-v$v%05d.pruned"),
        true).close()
      parts.foreach { case (_, n) =>
        if (fs.delete(new org.apache.hadoop.fs.Path(lp, n), false))
          nFiles += 1
      }
    }
    (prunable.size.toLong, nFiles)
  }

  /** The landing file names one consumer's checkpoint PROVES ingested:
    * the file source's offset log (`sources/0/<batch>`) names every file
    * each batch read, gated on the batches `commits/` sealed. None when
    * the checkpoint has no committed batch at all (a brand-new consumer
    * must veto pruning, not permit everything).
    */
  private def committedLandingFiles(spark: SparkSession,
      checkpointDir: String): Option[Set[String]] = {
    val cp = new org.apache.hadoop.fs.Path(checkpointDir)
    val cfs = cp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commitsDir = new org.apache.hadoop.fs.Path(cp, "commits")
    val srcDir = new org.apache.hadoop.fs.Path(cp, "sources/0")
    if (!cfs.exists(commitsDir) || !cfs.exists(srcDir)) return None
    def numeric(n: String): Option[Long] =
      scala.util.Try(n.stripSuffix(".compact").toLong).toOption
    val lastCommit = cfs.listStatus(commitsDir).toSeq
      .flatMap(s => numeric(s.getPath.getName))
      .sorted.lastOption.getOrElse(return None)
    // batch logs (and their periodic `.compact` rollups) are `v1` + one
    // JSON FileEntry per line; path + batchId are all we need and a
    // per-line targeted extract avoids a JSON dependency. Entries are
    // gated on THEIR OWN batchId ≤ the last sealed commit — a compact
    // file can carry a logged-but-uncommitted trailing batch.
    val entry = "\"path\":\"([^\"]+)\".*\"batchId\":(\\d+)".r.unanchored
    Some(cfs.listStatus(srcDir).toSeq
      .filter(s => numeric(s.getPath.getName).isDefined)
      .flatMap { s =>
        val in = cfs.open(s.getPath)
        val lines =
          try scala.io.Source.fromInputStream(in, "UTF-8")
            .getLines().toList
          finally in.close()
        lines.collect {
          case entry(p, bid) if bid.toLong <= lastCommit =>
            new org.apache.hadoop.fs.Path(new java.net.URI(p)).getName
        }
      }.toSet)
  }

  /** Gate for a consumer STARTING FRESH on a landing: refuses loudly if
    * any sealed version's data files were already reclaimed by
    * [[pruneChangeFeedLanding]] — a new consumer with an empty
    * checkpoint would silently fold a PARTIAL history (the pruned
    * versions' rows are gone from disk; only their `_cdf-v*.done`
    * markers remain as the producer's resume watermark). Existing
    * consumers resuming from their own checkpoint are unaffected — they
    * replay from the checkpoint, not the landing. Recovery for a late
    * consumer: export a fresh landing from the source table (or start
    * it from a snapshot + the surviving feed tail).
    */
  def requireLandingIntact(spark: SparkSession, landing: String): Unit = {
    val lp = new org.apache.hadoop.fs.Path(landing)
    val fs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prunedPat = "_cdf-v(\\d+)\\.pruned".r
    // the prune's own tombstones are the evidence — a sealed version with
    // zero data files may simply have had an EMPTY delta (an empty feed
    // writes no part files), which a fresh consumer can skip harmlessly
    val gutted = fs.listStatus(lp).toSeq.map(_.getPath.getName)
      .collect { case prunedPat(v) => v.toLong }.sorted
    require(gutted.isEmpty,
      s"landing $landing is not intact from the start: version(s) " +
        s"${gutted.mkString(", ")} were pruned after earlier consumers " +
        "passed them — a fresh consumer would fold a partial history. " +
        "Export a new landing from the source table instead.")
  }

  // The join-view watermark packs BOTH source versions into the one
  // streamBatchId slot a manifest carries: fact*1e6 + dim. Versions are
  // commit ordinals (a table gains a few per refresh cycle), so the 1e6
  // radix holds for ~1e6 dim commits and ~9e12 fact commits; the encode
  // refuses loudly past that rather than aliasing two states.
  private def encodeJoinWatermark(f: Long, d: Long): Long = {
    require(d >= 0 && d < 1000000L && f >= 0 && f < 9000000000000L,
      s"join-view watermark out of range: fact=$f dim=$d")
    f * 1000000L + d
  }

  /** Incremental maintenance of a JOIN view — the delta-join algebra
    * [[refreshIncremental]] (aggregate-only) cannot express. The view is
    *   SELECT groupKeys, count, sums FROM fact JOIN dim USING (joinKeys)
    * and BOTH sources may change between refreshes. The fold applies the
    * sequential decomposition
    *   V(F', D') − V(F, D) = ΔF ⋈ D  +  F' ⋈ ΔD
    * (fact changes join the dim AT ITS LAST-FOLDED version; dim changes
    * join the fact at its NEW head), with every feed row weighted ±1 by
    * change type — updates are delete+insert pairs, so a dim attribute
    * move RETRACTS the old group and inserts the new one, and carried
    * (identical) pairs net zero. Cost ∝ changed files on each source
    * plus ONE join per changed side — never the view, never both
    * corpora; at 100 TB the fact feed reads megabytes and the dim
    * snapshot broadcast-joins it.
    *
    * Same contracts as refreshIncremental: non-null keys, count+sum
    * aggregates only (retraction-foldable), groups folding to count ≤ 0
    * are deleted. Fact and dim must not share non-join column names.
    */
  def refreshJoinIncremental(spark: SparkSession, factPath: String,
      dimPath: String, viewPath: String, joinKeys: Seq[String],
      groupKeys: Seq[String], sumCols: Seq[String] = Seq.empty,
      countCol: String = "n_rows"): (Long, Long, Long) = {
    import org.apache.spark.sql.functions.{coalesce, col, count, lit, sum, when}
    require(joinKeys.nonEmpty && groupKeys.nonEmpty,
      "refreshJoinIncremental needs join and group keys")
    def head(p: String): Long = {
      val fs = new org.apache.hadoop.fs.Path(p)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      require(fs.exists(versionsDir(p)), s"$p is not a versioned table")
      readVersionPointer(fs, p).orElse(manifestVersions(fs, p).lastOption)
        .getOrElse(sys.error(s"no versions under $p"))
    }
    val (fHead, dHead) = (head(factPath), head(dimPath))
    val vfs = new org.apache.hadoop.fs.Path(viewPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!vfs.exists(versionsDir(viewPath))) {
      val full = readVersioned(spark, factPath, Some(fHead))
        .join(readVersioned(spark, dimPath, Some(dHead)), joinKeys)
        .groupBy(groupKeys.map(col): _*)
        .agg(count(lit(1)).as(countCol),
          sumCols.map(c => sum(col(c)).as(c)): _*)
      return (writeVersioned(spark, full, viewPath,
        streamBatchId = Some(encodeJoinWatermark(fHead, dHead))),
        fHead, dHead)
    }
    val viewHead = readVersionPointer(vfs, viewPath)
      .orElse(manifestVersions(vfs, viewPath).lastOption)
      .getOrElse(sys.error(s"no versions under $viewPath"))
    val w = readRawManifest(spark, vfs, viewPath, viewHead)
      .flatMap(_.streamBatchId).getOrElse(sys.error(
        s"$viewPath's latest commit carries no source watermark — " +
          "not a refresh-maintained join view"))
    val (fW, dW) = (w / 1000000L, w % 1000000L)
    if (fHead <= fW && dHead <= dW) return (viewHead, fW, dW)
    val sign = when(col("_change_type") === "insert", lit(1L))
      .otherwise(lit(-1L))
    val meta = Seq("_change_type", "_commit_version", "_commit_timestamp")
    val picked = (groupKeys ++ sumCols :+ "_graft_w").map(col)
    val fPiece =
      if (fHead > fW)
        Some(readChangeFeed(spark, factPath, fW + 1, fHead)
          .withColumn("_graft_w", sign).drop(meta: _*)
          .join(readVersioned(spark, dimPath, Some(dW)), joinKeys)
          .select(picked: _*))
      else None
    val dPiece =
      if (dHead > dW)
        Some(readVersioned(spark, factPath, Some(fHead))
          .join(readChangeFeed(spark, dimPath, dW + 1, dHead)
            .withColumn("_graft_w", sign).drop(meta: _*), joinKeys)
          .select(picked: _*))
      else None
    val deltaAggs = sum(col("_graft_w")).as("_graft_dn") +:
      sumCols.map(c => sum(col(c) * col("_graft_w")).as(s"_graft_d_$c"))
    val delta = Seq(fPiece, dPiece).flatten.reduce(_.unionByName(_))
      .groupBy(groupKeys.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
    val view = readVersioned(spark, viewPath, Some(viewHead))
    val viewTypes = view.schema.map(f => f.name -> f.dataType).toMap
    val merged = delta.join(view, groupKeys, "left_outer")
      .select((groupKeys.map(col) :+
        (coalesce(col(countCol), lit(0L)) + col("_graft_dn")).as(countCol))
        ++ sumCols.map(c =>
          (coalesce(col(c), lit(0).cast(viewTypes(c))) +
            coalesce(col(s"_graft_d_$c"), lit(0).cast(viewTypes(c))))
            .cast(viewTypes(c)).as(c)): _*)
    val (v, _) = mergeCdc(spark, viewPath, merged, groupKeys,
      deleteWhen = col(countCol) <= 0L,
      streamBatchId = Some(encodeJoinWatermark(fHead, dHead)))
    (v, fHead, dHead)
  }

  /** SHALLOW CLONE (Delta `CREATE TABLE … SHALLOW CLONE` semantics): a
    * ZERO-COPY table whose v1 manifest references the source head's data
    * files — no bytes move, so cloning a 100 TB table is a metadata
    * write. References are stored as RELATIVE paths with `..` traversal
    * (manifests are relative so tables survive relocation; the clone's
    * resolve `root/../src/file` normalizes in Hadoop paths), and the
    * isolation properties fall out of the existing machinery:
    *  - writes on the clone (append/delete/merge) add files under the
    *    CLONE's root and drop source references from its manifests — the
    *    source never observes them;
    *  - vacuum on the clone reclaims only files under the clone's root
    *    (its orphan listing never walks the source), matching Delta's
    *    rule that external files are never deleted through a clone.
    * The one contract the caller owns, as in Delta: do not vacuum the
    * SOURCE past versions the clone still references. Tables with live
    * deletion vectors refuse (purge first) — a cloned sidecar reference
    * would couple the clone to source tombstones the source may purge.
    */
  def shallowClone(spark: SparkSession, srcPath: String,
      dstPath: String): Long = {
    val shp = new org.apache.hadoop.fs.Path(srcPath)
    val sfs = shp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(sfs.exists(versionsDir(srcPath)),
      s"$srcPath is not a versioned table")
    val head = readVersionPointer(sfs, srcPath)
      .orElse(manifestVersions(sfs, srcPath).lastOption)
      .getOrElse(sys.error(s"no versions under $srcPath"))
    val m = readVersionManifest(spark, sfs, srcPath, head).getOrElse(
      sys.error(s"version $head has no manifest under $srcPath"))
    require(m.dvs.isEmpty, s"shallowClone: $srcPath@v$head carries live " +
      "deletion vectors — purgeDeletes the source first")
    val dhp = new org.apache.hadoop.fs.Path(dstPath)
    val dfs = dhp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!dfs.exists(versionsDir(dstPath)),
      s"$dstPath is already a versioned table")
    // `../` references relativize scheme-less PATHS and later resolve
    // against the CLONE's filesystem — across filesystems (s3a→hdfs,
    // cross-bucket) they would point at nonexistent files and fail only
    // at first read. Refuse loudly at clone time instead.
    require(sfs.getUri == dfs.getUri,
      s"shallowClone: source and destination live on different " +
        s"filesystems (${sfs.getUri} vs ${dfs.getUri}); relative " +
        "references cannot cross them - deep-copy instead")
    val rel = java.nio.file.Paths.get(rootPath(dfs, dhp))
      .relativize(java.nio.file.Paths.get(rootPath(sfs, shp))).toString
    writeVersionManifest(spark, dfs, dstPath, 1L, m.schemaDdl,
      m.entries.map { case (f, n) => (s"$rel/$f", n) }, op = Some("clone"),
      colmap = m.colmap)
    writeVersionPointer(spark, dfs, dstPath, 1L)
    1L
  }

  /** METADATA-ONLY column rename (Delta's column-mapping rename): publish a
    * new version whose manifest carries a logical→physical name map — not
    * one data file is touched, so a rename on a 100 TB table is a KB-sized
    * commit. Reads of the new version resolve through the map (one alias
    * projection Catalyst folds into the scan); time travel to a
    * pre-rename version returns THAT version's names, because each
    * manifest carries its own map. The manifest's `schema` field keeps
    * describing the PHYSICAL file schema, so every internal scan path
    * stays byte-identical.
    *
    * Physical names are FROZEN at first mapping: a second rename re-maps
    * logical names onto the same physical columns (Delta freezes physical
    * ids the same way). Operations that scan or rewrite by physical
    * column names refuse on mapped tables ([[requireNoColMap]]);
    * [[materializeMapping]] rewrites once under the logical names and
    * clears the map.
    *
    * @return the published version
    */
  def renameColumns(spark: SparkSession, path: String,
      renames: Map[String, String]): Long = {
    require(renames.nonEmpty, "renameColumns: empty rename set")
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(readSchemaManifests(spark, path).isEmpty,
      s"$path is a schema-evolving table; rename through writeEvolving's " +
        "renames parameter instead")
    ensureVersionManifests(spark, path)
    if (!fs.exists(versionsDir(path))) bootstrapRootVersion(spark, fs, path)
    val v0 = readVersionPointer(fs, path)
      .getOrElse(manifestVersions(fs, path).last)
    val m0 = readVersionManifest(spark, fs, path, v0).getOrElse(
      sys.error(s"version $v0 has no manifest under $path"))
    val cm0: Seq[(String, String)] =
      if (m0.colmap.nonEmpty) m0.colmap
      else org.apache.spark.sql.types.StructType.fromDDL(m0.schemaDdl)
        .fields.toSeq.map(f => (f.name, f.name))
    val logical0 = cm0.map(_._1)
    requireNoMaintenanceArtifacts(spark, fs, path, "renameColumns")
    renames.foreach { case (from, to) =>
      require(logical0.contains(from),
        s"renameColumns: '$from' is not a column of $path@v$v0 " +
          s"(have: ${logical0.mkString(", ")})")
      require(from != to, s"renameColumns: '$from' -> '$to' is a no-op")
    }
    val cm1 = cm0.map { case (l, p) => (renames.getOrElse(l, l), p) }
    require(cm1.map(_._1).distinct.length == cm1.length,
      s"renameColumns: resulting schema has duplicate column names " +
        s"(${cm1.map(_._1).mkString(", ")})")
    val next = v0 + 1
    writeVersionDelta(spark, fs, path, next, m0.schemaDdl,
      base = v0, add = Nil, remove = Nil, op = Some("rename"),
      colmap = cm1)
    writeVersionPointer(spark, fs, path, next)
    next
  }

  /** METADATA-ONLY column drop: publish a new version whose column map no
    * longer carries the dropped logical columns — the physical data stays
    * in the files untouched (time travel before the drop still reads it),
    * and because the manifest's physical `schema` shrinks with the map,
    * post-drop scans never even READ the dropped column (column pruning
    * at the manifest, not just the reader). [[vacuum]]-of-versions never
    * reclaims the bytes (the files are shared with pre-drop versions);
    * [[materializeMapping]] is the rewrite that physically sheds them.
    *
    * @return the published version
    */
  def dropColumns(spark: SparkSession, path: String,
      cols: Seq[String]): Long = {
    require(cols.nonEmpty, "dropColumns: empty column set")
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(readSchemaManifests(spark, path).isEmpty,
      s"$path is a schema-evolving table; evolving drops are refused by " +
        "design (writeEvolving's carry-or-rename contract)")
    ensureVersionManifests(spark, path)
    if (!fs.exists(versionsDir(path))) bootstrapRootVersion(spark, fs, path)
    val v0 = readVersionPointer(fs, path)
      .getOrElse(manifestVersions(fs, path).last)
    val m0 = readVersionManifest(spark, fs, path, v0).getOrElse(
      sys.error(s"version $v0 has no manifest under $path"))
    val phys = org.apache.spark.sql.types.StructType.fromDDL(m0.schemaDdl)
    val cm0: Seq[(String, String)] =
      if (m0.colmap.nonEmpty) m0.colmap
      else phys.fields.toSeq.map(f => (f.name, f.name))
    requireNoMaintenanceArtifacts(spark, fs, path, "dropColumns")
    cols.foreach(c => require(cm0.exists(_._1 == c),
      s"dropColumns: '$c' is not a column of $path@v$v0 " +
        s"(have: ${cm0.map(_._1).mkString(", ")})"))
    val cm1 = cm0.filterNot(e => cols.contains(e._1))
    require(cm1.nonEmpty, s"dropColumns: cannot drop every column of $path")
    val keepPhys = cm1.map(_._2).toSet
    val ddl1 = org.apache.spark.sql.types.StructType(
      phys.fields.filter(f => keepPhys(f.name))).toDDL
    val next = v0 + 1
    writeVersionDelta(spark, fs, path, next, ddl1,
      base = v0, add = Nil, remove = Nil, op = Some("drop"),
      colmap = cm1)
    writeVersionPointer(spark, fs, path, next)
    next
  }

  /** Rewrite a column-mapped table ONCE under its logical names and clear
    * the map (the purgeDeletes analog for column mapping): after this,
    * physical == logical again and every physical-name operation
    * (delete/merge/optimize/stats/…) works. Cost ∝ table bytes — the
    * deliberate, explicit price; the rename/drop commits themselves stay
    * metadata-only.
    *
    * @return (published version, files rewritten); (current, 0) when the
    *         table carries no mapping
    */
  def materializeMapping(spark: SparkSession, path: String): (Long, Long) = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v0 = readVersionPointer(fs, path)
      .getOrElse(manifestVersions(fs, path).last)
    val m0 = readVersionManifest(spark, fs, path, v0).getOrElse(
      sys.error(s"version $v0 has no manifest under $path"))
    if (m0.colmap.isEmpty) return (v0, 0L)
    val logical = readManifestFiles(spark, fs, path, m0)
    val (_, entries) = writeClaimedDir(spark, fs, path, logical)
    val next = v0 + 1
    writeVersionManifest(spark, fs, path, next, logical.schema.toDDL,
      entries, op = Some("remap"))
    writeVersionPointer(spark, fs, path, next)
    (next, entries.size.toLong)
  }

  /** Delta's `GENERATE symlink_format_manifest` analog — EXTERNAL-ENGINE
    * interop: write `_symlink_format_manifest/manifest`, one absolute
    * qualified data-file URI per line for the CURRENT version, so engines
    * that speak plain parquet + a file listing (Trino/Presto/Athena/Hive
    * via SymlinkTextInputFormat) read the versioned table WITHOUT
    * understanding its manifests. Metadata-only: cost ∝ live-file count,
    * never bytes; atomic tmp+rename publish; re-export after a commit
    * overwrites (like Delta, the export is a SNAPSHOT — stale until
    * regenerated, which is the documented contract of the feature).
    *
    * Refusals keep the external read HONEST: live deletion vectors
    * (an external engine cannot apply tombstones — purge first) and
    * column mappings (it would read physical names — materialize first)
    * refuse loudly.
    *
    * @return number of files listed
    */
  def exportSymlinkManifest(spark: SparkSession, path: String): Long = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(versionsDir(path)),
      s"$path carries no _graft_versions manifests - nothing to export")
    val v0 = readVersionPointer(fs, path)
      .getOrElse(manifestVersions(fs, path).last)
    val m0 = readVersionManifest(spark, fs, path, v0).getOrElse(
      sys.error(s"version $v0 has no manifest under $path"))
    require(m0.dvs.isEmpty,
      s"exportSymlinkManifest($path): table carries live deletion " +
        "vectors; an external engine cannot apply tombstones - " +
        "purgeDeletes first")
    require(m0.colmap.isEmpty,
      s"exportSymlinkManifest($path): table carries a column mapping; " +
        "an external engine would read physical names - " +
        "materializeMapping first")
    val root = rootPath(fs, hp)
    val uris = m0.entries.map(e => fs.makeQualified(
      new org.apache.hadoop.fs.Path(resolveRef(root, e._1))).toString)
    val dir = new org.apache.hadoop.fs.Path(path, "_symlink_format_manifest")
    fs.mkdirs(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir,
      s".manifest.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val dst = new org.apache.hadoop.fs.Path(dir, "manifest")
    val out = fs.create(tmp, true)
    out.write((uris.mkString("\n") + "\n").getBytes("UTF-8"))
    out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, fs.getConf)
      .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    uris.size.toLong
  }

  /** TIME-based retention vacuum — `VACUUM … RETAIN n HOURS` semantics on
    * the commit stamps: keep every version committed within `retainMs` of
    * now (and always the newest), drop the rest, then reclaim files and
    * orphans exactly like [[vacuum]]. Pre-timestamp manifests count as
    * infinitely old.
    */
  def vacuumOlderThan(spark: SparkSession, path: String, retainMs: Long,
      orphanGraceMs: Long = 86400000L): Seq[Long] = {
    val hist = versionHistory(spark, path)
    if (hist.isEmpty) return Seq.empty
    val cutoff = System.currentTimeMillis() - retainMs
    val keep = math.max(1, hist.count(_._2 >= cutoff))
    vacuum(spark, path, keep, orphanGraceMs)
  }

  /** TAKEDOWN / right-to-be-forgotten delete: publish a new version
    * retaining only rows NOT matching `pred`, rewriting ONLY the files
    * that contain matching rows — untouched files are carried into the new
    * version BY REFERENCE (same path, same bytes). Matching files are
    * found with one COLUMN-PRUNED pass (parquet reads just `pred`'s
    * columns), optionally narrowed first by the `_graft_stats` manifest:
    * pass `filePrune` (built with [[skipRange]]) and files whose stats
    * provably exclude every matching row are never opened — the same
    * superset contract as [[readSkipping]]'s `keep`. Delete cost therefore
    * scales with MATCHED files, not table size.
    *
    * Composition: readers planned against the old version keep a valid
    * file list, the delete is time-travel AUDITABLE (`readVersioned(v0)`
    * shows exactly what was removed; `removed` itself is computed from the
    * manifests' per-file n_rows — metadata, no counting scan), and
    * [[vacuum]] is the separate, deliberate step that makes it PHYSICAL —
    * until vacuum runs the bytes still exist, which is what a compliance
    * pipeline wants: audit first, destroy second.
    *
    * Works on any table shape: versioned tables delete in place; a plain
    * or schema-evolving table is BOOTSTRAPPED (current files become
    * version 1) and the delete publishes version 2 — evolved tables
    * resolve through their schema manifests on every read and rewrite,
    * and the rewritten files carry the latest logical schema (the same
    * invariant as [[compact]] on an evolved table).
    *
    * Isolation: by default a delete that loses the commit race REBASES
    * over disjoint winners (see [[publishNonCommuting]]) — rows APPENDED
    * concurrently that match `pred` survive, because the delete applies
    * to the data it read. That is WEAKER than Delta's WriteSerializable,
    * which raises ConcurrentAppendException when a winner's added files
    * match the delete's read predicate. For compliance/takedown deletes
    * pass `strict = true`: after a rebased publish the winner-added files
    * still live at the head are re-checked against `pred`, and any
    * matching rows trigger another delete pass — the returned version is
    * guaranteed to hold NO row matching `pred` among data visible when it
    * published (bounded by MaxCommitRetries, then refuses loudly).
    *
    * @return (published version, rows removed); no matching rows →
    *         (current version, 0) with nothing written
    */
  def deleteWhere(spark: SparkSession, path: String,
      pred: org.apache.spark.sql.Column,
      filePrune: Option[org.apache.spark.sql.Column] = None,
      strict: Boolean = false): (Long, Long) = {
    import org.apache.spark.sql.functions.{coalesce, col, input_file_name, lit}
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    ensureVersionManifests(spark, path)
    if (!fs.exists(versionsDir(path))) bootstrapRootVersion(spark, fs, path)
    requireNoColMap(spark, fs, path, "deleteWhere")  // pred names logical columns; the COW
    // rewrite would also persist physical names under a stale map
    val root = rootPath(fs, hp)
    val statsDir = new org.apache.hadoop.fs.Path(path, "_graft_stats")
    // one base→publish delete pass; returns (base read, version published,
    // rows removed) — published == base means nothing matched
    def onePass(): (Long, Long, Long) = {
      val v0 = readVersionPointer(fs, path).getOrElse {
        val vs = listVersions(spark, path)
        require(vs.nonEmpty, s"no versions under $path")
        vs.last
      }
      val m0 = readVersionManifest(spark, fs, path, v0).getOrElse(
        sys.error(s"version $v0 has no manifest under $path"))
      val abs0 = m0.entries.map(e => resolveRef(root, e._1))
      // files whose stats bounds exclude every matching row are not even
      // OPENED; files the stats manifest does not cover stay candidates
      val candidates: Seq[String] = filePrune match {
        case Some(keep) if fs.exists(statsDir) =>
          pruneCandidatesWithStats(spark, statsDir, keep, abs0)
        case _ => abs0
      }
      // ONE column-pruned discovery pass: which candidate files hold a
      // matching row? Parquet reads only pred's columns; nothing is
      // written. Under live DELETION VECTORS the pass reads THROUGH the
      // tombstones (a file whose only matches are already dv-deleted must
      // not be rewritten), via the scan-stage _metadata tag — the raw
      // input_file_name shortcut stays for the common dv-free table
      // because it also serves schema-evolving reads, which have no
      // _metadata contract.
      val matched: Set[String] =
        if (candidates.isEmpty) Set.empty
        else if (m0.dvs.nonEmpty)
          readFilesWithDvTagged(spark, fs, path, m0, candidates)
            .filter(pred).select(col(DvSrcFileCol)).distinct()
            .collect().map(r => resolveRef(root, r.getString(0))).toSet
        else readSomeFiles(spark, fs, path, candidates, m0.schemaDdl)
          .filter(pred).select(input_file_name().as("f")).distinct()
          .collect().map(r => new java.net.URI(r.getString(0)).getPath).toSet
      if (matched.isEmpty) return (v0, v0, 0L)
      // SQL DELETE semantics: remove rows where pred is TRUE; a null
      // predicate KEEPS the row (a bare !pred would silently delete it).
      // The rewrite lands in a claimed namespace dir; the COMMIT number is
      // exactly base+1 — see the contiguity note below. The rewrite also
      // reads through any live tombstones, so it PURGES them for the
      // matched files (their dv coverage drops with the remove) instead
      // of resurrecting dv-deleted rows.
      val matchedEntries = m0.entries.filter(e => matched(resolveRef(root, e._1)))
      // size-adaptive rewrite (same rule as mergeInto): the survivors are
      // bounded by the matched files' manifest row counts, so shape the
      // output file count from that bound instead of one-file-per-task.
      // Stats-manifest tables keep natural boundaries (clustering).
      val survivors = readFilesWithDv(spark, fs, path, m0, matched.toSeq)
        .filter(!coalesce(pred, lit(false)))
      val (_, rewritten) = writeClaimedDir(spark, fs, path,
        if (fs.exists(statsDir)) survivors
        else survivors.coalesce(commitFileParts(matchedEntries.map(_._2).sum)))
      // an evolved rewrite lands latest-LOGICAL-schema files (compact's
      // invariant); the manifest schema follows
      val ddl =
        if (readSchemaManifests(spark, path).nonEmpty) logicalDdl(spark, path)
        else m0.schemaDdl
      // O(changed-files) delta commit with disjoint-set conflict handling:
      // a concurrent commit that touched NONE of our matched files (append,
      // disjoint delete) rebases this delete behind it; a commit that
      // removed one of them refuses loudly (our rewrite would resurrect
      // rows it dropped) — see publishNonCommuting
      val next = publishNonCommuting(spark, fs, path, v0, ddl,
        add = rewritten, remove = matchedEntries.map(_._1), op = "delete")
      // keep an existing skipping manifest live: the rewritten files gain
      // stats rows incrementally (O(rewritten), not a corpus re-scan)
      if (fs.exists(statsDir)) {
        val tracked = spark.read.json(statsDir.toString).schema.fieldNames
          .toSeq.filter(_.startsWith("min_")).map(_.stripPrefix("min_"))
        if (tracked.nonEmpty) appendStats(spark, path, tracked)
      }
      refreshBloomIndexes(spark, fs, path)
      // metadata-only audit count from the manifests' per-file n_rows: rows
      // in the matched (resolved-source) files minus rows in their rewrites
      // — never a dir-listing guess, never a counting scan. Rows a prior
      // dvDelete already tombstoned in the matched files vanish from the
      // rewrite too but were deleted by THAT commit, not this one: their
      // count (one read of the KB-sized sidecars) comes off the audit.
      val matchedRel = matchedEntries.map(_._1).toSet
      val priorTombs =
        if (!m0.dvs.exists(_.files.exists(matchedRel))) 0L
        else liveTombstones(spark, fs, root, m0.dvs, matchedRel.toSeq).count()
      val removed = matchedEntries.map(_._2).sum -
        rewritten.map(_._2).sum - priorTombs
      (v0, next, removed)
    }
    var (v0, next, total) = onePass()
    if (!strict) return (next, total)
    var guard = 0
    // strict re-check loop: a rebased publish (next > v0 + 1) means winner
    // commits landed between our read and our commit — re-check THEIR
    // added files (only those still live at the head; cost ∝ winner adds,
    // never the table) and delete again if any row matches
    while (next > v0 + 1) {
      guard += 1
      require(guard <= MaxCommitRetries,
        s"deleteWhere(strict): concurrent appends kept matching the " +
          s"predicate under $path $MaxCommitRetries times; quiesce " +
          "writers or retry")
      val live = readVersionManifest(spark, fs, path, next).getOrElse(
        sys.error(s"version $next has no manifest under $path"))
      val liveFiles = live.entries.map(_._1).toSet
      val winnerAdds = ((v0 + 1) until next).flatMap(w =>
        readRawManifest(spark, fs, path, w).toSeq.flatMap(_.add.map(_._1)))
        .distinct.filter(liveFiles)
      if (winnerAdds.isEmpty) return (next, total)
      val anyMatch = winnerAdds.nonEmpty && !readSomeFiles(spark, fs, path,
        winnerAdds.map(f => resolveRef(root, f)), live.schemaDdl).filter(pred).isEmpty
      if (!anyMatch) return (next, total)
      val r = onePass()
      v0 = r._1; next = r._2; total += r._3
    }
    (next, total)
  }

  /** MERGE-ON-READ delete (Delta's deletion-vector path): instead of
    * rewriting every file that holds a matching row ([[deleteWhere]]'s
    * copy-on-write), the commit writes a TOMBSTONE sidecar — `(file,
    * row-position)` pairs, found in one column-pruned discovery pass —
    * and publishes a delta manifest whose only payload is the sidecar
    * reference. Reads ([[readVersioned]], time travel, the change feed)
    * apply the tombstones as an anti-join confined to the covered files.
    * This is the takedown-latency lever at 100 TB: deleting a handful of
    * rows costs one narrow discovery scan plus KILOBYTES of writes,
    * where copy-on-write re-writes every touched gigabyte — at the price
    * of a per-read anti-join until [[purgeDeletes]] (or a compaction /
    * clustering rewrite of the covered files) materializes the deletes.
    * Use copy-on-write for big sweeps, DVs for small urgent ones.
    *
    * Semantics, all pinned in DeletionVectorSpec:
    *  - SQL DELETE null handling (a NULL predicate keeps the row);
    *  - successive dvDeletes UNION (earlier sidecars are never rewritten);
    *  - already-tombstoned rows are skipped at discovery, so re-running a
    *    predicate publishes nothing (returns the current version, 0);
    *  - time travel to a pre-delete version still sees the rows (each
    *    manifest resolves its OWN live sidecar set);
    *  - the commit REBASES over concurrent appends (it touches no files)
    *    and refuses when a winner rewrote a covered file — positions
    *    don't survive a rewrite (see publishNonCommuting's dv checks);
    *  - like non-strict [[deleteWhere]], rows in files appended AFTER the
    *    discovery pass are not re-screened (pass `strict` there for that).
    *
    * Schema-evolving tables refuse (their reads resolve through the
    * column-mapping projection, which has no `_metadata` contract);
    * copy-on-write [[deleteWhere]] covers them.
    *
    * @return (published version, rows tombstoned); (current, 0) when
    *         nothing matched — no commit published
    */
  def deleteWhereDv(spark: SparkSession, path: String,
      pred: org.apache.spark.sql.Column,
      filePrune: Option[org.apache.spark.sql.Column] = None): (Long, Long) = {
    import org.apache.spark.sql.functions.col
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(readSchemaManifests(spark, path).isEmpty,
      s"$path is a schema-evolving table; deletion vectors need the " +
        "fixed-schema read path - use the copy-on-write deleteWhere")
    ensureVersionManifests(spark, path)
    if (!fs.exists(versionsDir(path))) bootstrapRootVersion(spark, fs, path)
    requireNoColMap(spark, fs, path, "deleteWhereDv")
    val root = rootPath(fs, hp)
    val statsDir = new org.apache.hadoop.fs.Path(path, "_graft_stats")
    val v0 = readVersionPointer(fs, path).getOrElse {
      val vs = listVersions(spark, path)
      require(vs.nonEmpty, s"no versions under $path")
      vs.last
    }
    val m0 = readVersionManifest(spark, fs, path, v0).getOrElse(
      sys.error(s"version $v0 has no manifest under $path"))
    // Shallow-clone guard (the mirror of shallowClone's DV refusal): an
    // external `../src` entry cannot be keyed table-relatively by
    // relDataPathCol — the sidecar would record the SOURCE-absolute path,
    // readers would re-prefix the clone root via resolveRef, the
    // covered-set match would miss, and the tombstoned rows would
    // silently reappear. Copy-on-write deleteWhere handles clones: it
    // rewrites matched files under the clone's own root.
    require(!m0.entries.exists(e => isExternalRef(e._1)),
      s"$path@v$v0 holds shallow-clone external references; deletion " +
        "vectors key files table-relatively and cannot cover them - use " +
        "the copy-on-write deleteWhere (it localizes matched files)")
    val abs0 = m0.entries.map(e => resolveRef(root, e._1))
    val candidates: Seq[String] = filePrune match {
      case Some(keep) if fs.exists(statsDir) =>
        pruneCandidatesWithStats(spark, statsDir, keep, abs0)
      case _ => abs0
    }
    if (candidates.isEmpty) return (v0, 0L)
    // ONE discovery pass, reading THROUGH the live tombstones: rows an
    // earlier dvDelete already deleted can't be re-tombstoned, so
    // re-running a predicate is a clean no-op
    val positions = readFilesWithDvTagged(spark, fs, path, m0, candidates)
      .filter(pred)
      .select(col(DvSrcFileCol).as("file"), col(DvPosCol).as("pos"))
    // tombstones are metadata-sized (a DV delete is the SMALL-delete
    // path); one sidecar file keeps the manifest entry single
    val (claimedDir, written) = writeClaimedDir(spark, fs, path,
      positions.coalesce(1))
    val nDel = written.map(_._2).sum
    if (nDel == 0L) {
      // nothing matched: reclaim the WHOLE claimed dir (sidecar, claim
      // marker, _SUCCESS) and publish nothing — a repeated no-op
      // predicate must not burn a version-number namespace per call or
      // leave crumb dirs for vacuum's grace reclaim to chew through
      fs.delete(new org.apache.hadoop.fs.Path(path, s"v=$claimedDir"), true)
      return (v0, 0L)
    }
    // covered-file list: path strings only to the driver (the engine's
    // metadata-transfer rule), bounded by the candidate file count
    val covered = spark.read
      .parquet(qualifyForRead(fs, written.map(e => resolveRef(root, e._1))): _*)
      .select("file").distinct().collect().map(_.getString(0)).toSeq
    val next = publishNonCommuting(spark, fs, path, v0, m0.schemaDdl,
      add = Nil, remove = Nil, op = "dvdelete",
      dvAdd = written.map(e => DvEntry(e._1, e._2, covered)),
      readSet = covered.toSet)
    (next, nDel)
  }

  /** Materialize a table's deletion vectors: rewrite the covered files
    * without their tombstoned rows and retire both the files and the
    * sidecars in one commit (`op = "purge"` — row-multiset preserving,
    * so the change feed skips it like any reorg). Cost ∝ covered-file
    * bytes, never the table. After a full purge every read is
    * sidecar-free again; [[vacuum]] reclaims the retired sidecars once
    * no retained version references them. A nonzero
    * `minDeletedFraction` purges SELECTIVELY: only files whose live
    * tombstones exceed that share of their rows are rewritten, the rest
    * keep their merge-on-read sidecars — the rewrite-amplification
    * guard for lightly-tombstoned big files.
    *
    * @return (published version, covered files rewritten); (current, 0)
    *         when nothing crosses the threshold
    */
  def purgeDeletes(spark: SparkSession, path: String,
      minDeletedFraction: Double = 0.0): (Long, Long) = {
    require(minDeletedFraction >= 0.0 && minDeletedFraction <= 1.0,
      s"minDeletedFraction must be in [0,1], got $minDeletedFraction")
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    requireNoColMap(spark, fs, path, "purgeDeletes")
    ensureVersionManifests(spark, path)
    val v0 = readVersionPointer(fs, path).getOrElse {
      val vs = listVersions(spark, path)
      require(vs.nonEmpty, s"no versions under $path")
      vs.last
    }
    val m0 = readVersionManifest(spark, fs, path, v0).getOrElse(
      sys.error(s"version $v0 has no manifest under $path"))
    if (m0.dvs.isEmpty) return (v0, 0L)
    val root = rootPath(fs, hp)
    val covered = m0.dvs.flatMap(_.files).distinct
    // SELECTIVE purge (Databricks' auto-purge threshold shape): with a
    // nonzero fraction, only files whose live-tombstone share crosses it
    // are rewritten — a 1-GB file with one tombstone keeps its sidecar
    // instead of paying a gigabyte of rewrite for 100 bytes of logical
    // change. The per-file counts come from the KB-sized sidecars
    // (distinct — racing overlaps), row totals from the manifest; only
    // path strings + counts reach the driver.
    val dvdRel =
      if (minDeletedFraction <= 0.0) covered
      else {
        val nRows = m0.entries.toMap
        val perFile = liveTombstones(spark, fs, root, m0.dvs, covered)
          .groupBy("file").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        covered.filter(f => nRows.get(f).exists(n =>
          n > 0 && perFile.getOrElse(f, 0L).toDouble / n >= minDeletedFraction))
      }
    if (dvdRel.isEmpty) return (v0, 0L)
    val (_, rewritten) = writeClaimedDir(spark, fs, path,
      readFilesWithDv(spark, fs, path, m0,
        dvdRel.map(f => resolveRef(root, f))))
    val next = publishNonCommuting(spark, fs, path, v0, m0.schemaDdl,
      add = rewritten, remove = dvdRel, op = "purge",
      readSet = dvdRel.toSet)
    // keep an existing skipping manifest live over the purged rewrites
    val statsDir = new org.apache.hadoop.fs.Path(path, "_graft_stats")
    if (fs.exists(statsDir)) {
      val tracked = spark.read.json(statsDir.toString).schema.fieldNames
        .toSeq.filter(_.startsWith("min_")).map(_.stripPrefix("min_"))
      if (tracked.nonEmpty) appendStats(spark, path, tracked)
    }
    refreshBloomIndexes(spark, fs, path)
    (next, dvdRel.size.toLong)
  }

  /** METADATA-ONLY row count — `SELECT count(*)` answered from the
    * version manifest's per-file `n_rows` (read from parquet footers at
    * commit time) minus the live tombstones, without scanning a byte of
    * data. At 100 TB this is the difference between an instant answer
    * and a full-corpus pass; Delta/Iceberg answer the same query from
    * their stats the same way. The tombstone correction reads only the
    * KB-sized sidecars (their recorded `nDel` goes stale when a rewrite
    * trims an entry's coverage, so the live positions are counted, not
    * trusted from the audit field). Exactness is spec-pinned against a
    * full scan across dvDelete/COW-delete/purge/append sequences.
    */
  def rowCount(spark: SparkSession, path: String,
      version: Option[Long] = None): Long = {
    import org.apache.spark.sql.functions.col
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(versionsDir(path)),
      s"$path carries no version manifests - metadata counts need the " +
        "versioned write path")
    val v = version.orElse(readVersionPointer(fs, path)).getOrElse {
      val vs = manifestVersions(fs, path)
      require(vs.nonEmpty, s"no versions under $path")
      vs.last
    }
    val m = readVersionManifest(spark, fs, path, v).getOrElse(
      sys.error(s"version $v does not exist under $path"))
    val physical = m.entries.map(_._2).sum
    if (m.dvs.isEmpty) physical
    else physical - liveTombstones(spark, fs, rootPath(fs, hp), m.dvs,
      m.dvs.flatMap(_.files).distinct).count()
  }

  /** DISTINCT live tombstone positions in `dvs`, restricted to `files`
    * (table-relative). Two RACING dvDeletes with overlapping predicates
    * each anti-join only their own base's tombstones, so one row can
    * legally appear in two sidecars — reads are anti-joins (idempotent
    * under duplicates), but every COUNTING or DIFFING consumer must see
    * a set, not the multiset.
    */
  private def liveTombstones(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, root: String,
      dvs: Seq[DvEntry], files: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.read
      .parquet(qualifyForRead(fs, dvs.map(d => resolveRef(root, d.dv))): _*)
      .filter(col("file").isin(files: _*))
      .select("file", "pos").distinct()
  }

  /** The live deletion-vector sidecars at `version` (default: current):
    * (sidecar path, tombstones written at its commit, covered data
    * files). Empty for a DV-free table — the audit/test surface.
    */
  def deletionVectors(spark: SparkSession, path: String,
      version: Option[Long] = None): Seq[(String, Long, Seq[String])] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(versionsDir(path))) return Seq.empty
    val v = version.orElse(readVersionPointer(fs, path)).getOrElse {
      val vs = manifestVersions(fs, path)
      require(vs.nonEmpty, s"no versions under $path")
      vs.last
    }
    readVersionManifest(spark, fs, path, v).toSeq
      .flatMap(_.dvs.map(d => (d.dv, d.nDel, d.files)))
  }

  /** Refusal gate for paths not yet deletion-vector-aware: a raw file
    * read under live tombstones would resurrect deleted rows — refusing
    * loudly beats silently wrong (the vacuum-horizon contract).
    */
  private def requireNoDvs(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String,
      opName: String): Unit =
    if (fs.exists(versionsDir(path))) {
      val v = readVersionPointer(fs, path)
        .orElse(manifestVersions(fs, path).lastOption)
      val dvs = v.flatMap(readVersionManifest(spark, fs, path, _))
        .map(_.dvs).getOrElse(Nil)
      require(dvs.isEmpty,
        s"$opName($path): table carries live deletion vectors " +
          s"(${dvs.map(_.nDel).sum} tombstones); run purgeDeletes first " +
          "or read via readVersioned")
    }

  /** File-granular MERGE (upsert) — Delta's `MERGE … WHEN MATCHED THEN
    * UPDATE SET * WHEN NOT MATCHED THEN INSERT *`, published as a new
    * version: rows whose key appears in `source` are REPLACED by the
    * source row, unmatched target rows are carried (by reference wherever
    * their whole FILE holds no matched key), and source rows with new
    * keys are inserted. Only files CONTAINING a matched key are rewritten
    * — discovery is one column-pruned semi-join pass, narrowed first by
    * `filePrune` against `_graft_stats` when given (the [[deleteWhere]]
    * contract) — so a daily upsert batch against a 100 TB table rewrites
    * the few files it touches plus one O(changed-files) delta manifest.
    *
    * `source` must be unique on `keyCols` (refused otherwise — with
    * duplicate keys "the" replacement row is undefined; Delta errors on
    * multi-matches the same way) and must match the table schema exactly.
    * This is the versioned-lake form of the reference's dbt
    * `unique_key` incremental materialization ([[graft.pipeline.Dag]]
    * runs the same semantics as a whole-table overwrite).
    *
    * @return (published version, (rows updated, rows inserted)); counts
    *         come from manifest n_rows + one source count (no table
    *         scan), exact when the TARGET is key-unique too — the normal
    *         state of an upsert-maintained table (a dup-keyed target
    *         still merges correctly; only the update/insert split blurs)
    */
  def mergeInto(spark: SparkSession, path: String, source: DataFrame,
      keyCols: Seq[String],
      filePrune: Option[org.apache.spark.sql.Column] = None,
      maxBroadcastKeys: Long = 1000000L): (Long, (Long, Long)) = {
    // the colmap guard must precede the schema compare: on a mapped table
    // the physical-vs-logical mismatch message would mislead (mergeImpl's
    // own guard would also catch it, but only after this check)
    requireNoColMap(spark,
      new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      path, "mergeInto")
    // exact-schema contract for the plain upsert (the CDC form allows
    // extra source columns because the delete flag rides there)
    val priorDdl = currentSchemaDdl(spark, path)
    priorDdl.foreach { ddl =>
      val prior = org.apache.spark.sql.types.StructType.fromDDL(ddl)
      require(source.schema.fields.map(f =>
          (f.name, f.dataType.catalogString)).toSeq ==
          prior.fields.map(f => (f.name, f.dataType.catalogString)).toSeq,
        s"mergeInto schema mismatch: table has ${prior.toDDL}, " +
          s"source has ${source.schema.toDDL}")
    }
    val (v, (upd, ins, _)) = mergeImpl(spark, path, source, keyCols,
      deleteWhen = None, filePrune, maxBroadcastKeys)
    (v, (upd, ins))
  }

  /** MERGE with CONDITIONAL CLAUSES — the Delta `WHEN MATCHED AND cond
    * THEN DELETE / WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN
    * INSERT *` form, so a Debezium-shaped CDC feed (rows flagged
    * `_is_deleted`, reference README_DBT.md:243) applies in ONE
    * file-granular commit instead of mergeInto + deleteWhere (two
    * versions, two discovery passes, two rewrite generations).
    *
    * `deleteWhen` is evaluated per SOURCE row: matching target rows of a
    * delete-flagged source row are removed; delete-flagged rows whose key
    * matches nothing are no-ops (Delta's WHEN MATCHED semantics — a
    * delete for an absent key inserts nothing); unflagged rows upsert
    * exactly like [[mergeInto]]. The source may carry EXTRA columns (the
    * flag itself) beyond the table schema — they are dropped at write;
    * it must still contain every table column at its exact type and be
    * unique on `keyCols` across the whole batch (a key that both deletes
    * and updates in one batch has no defined outcome).
    *
    * @return (published version, (target rows updated, source rows
    *         inserted, target rows deleted)); counts come from the
    *         discovery pass's per-arm tallies (column-pruned, matched
    *         files only — never a table scan)
    */
  def mergeCdc(spark: SparkSession, path: String, source: DataFrame,
      keyCols: Seq[String], deleteWhen: org.apache.spark.sql.Column,
      filePrune: Option[org.apache.spark.sql.Column] = None,
      maxBroadcastKeys: Long = 1000000L,
      streamBatchId: Option[Long] = None): (Long, (Long, Long, Long)) =
    mergeImpl(spark, path, source, keyCols, Some(deleteWhen), filePrune,
      maxBroadcastKeys, streamBatchId)

  /** The table's current schema DDL if it is already versioned/evolved/
    * readable — None only when nothing exists yet to compare against.
    */
  private def currentSchemaDdl(spark: SparkSession,
      path: String): Option[String] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hp)) None
    else if (fs.exists(versionsDir(path))) {
      val v = readVersionPointer(fs, path).orElse(
        manifestVersions(fs, path).lastOption)
      v.flatMap(readRawManifest(spark, fs, path, _)).map(_.schemaDdl)
    } else if (readSchemaManifests(spark, path).nonEmpty)
      Some(logicalDdl(spark, path))
    else if (listDataFiles(fs, hp).nonEmpty)
      Some(spark.read.parquet(path).schema.toDDL)
    else None
  }

  /** Broadcast the merge probe only when it is PROVABLY small: an
    * explicit hint bypasses AQE's size protection, and a backfill-sized
    * source (hundreds of millions of keys) must degrade to a shuffle
    * join, not OOM the broadcast. nSrc is exact and already paid for.
    */
  private def hintedProbe(df: DataFrame, nSrc: Long,
      maxBroadcastKeys: Long): DataFrame =
    if (nSrc <= maxBroadcastKeys)
      org.apache.spark.sql.functions.broadcast(df) else df

  /** The merge DISCOVERY join exactly as [[mergeInto]] plans it (current
    * version's files ⋈ source keys), exposed package-private so PlanSpec
    * can pin the join strategy on the real code path: hinted broadcast
    * under the size guard, planner/AQE's free choice above it.
    */
  private[graft] def mergeDiscoveryFrame(spark: SparkSession, path: String,
      source: DataFrame, keyCols: Seq[String],
      maxBroadcastKeys: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, input_file_name}
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v0 = readVersionPointer(fs, path).getOrElse(
      manifestVersions(fs, path).last)
    val m0 = readVersionManifest(spark, fs, path, v0).get
    val root = rootPath(fs, hp)
    val probe = hintedProbe(source.select(keyCols.map(col): _*),
      source.count(), maxBroadcastKeys)
    readSomeFiles(spark, fs, path, m0.entries.map(e => resolveRef(root, e._1)),
      m0.schemaDdl)
      .withColumn("_graft_file", input_file_name())
      .select((keyCols.map(col) :+ col("_graft_file")): _*)
      .join(probe, keyCols, "inner")
  }

  private def mergeImpl(spark: SparkSession, path: String, source: DataFrame,
      keyCols: Seq[String],
      deleteWhen: Option[org.apache.spark.sql.Column],
      filePrune: Option[org.apache.spark.sql.Column],
      maxBroadcastKeys: Long,
      streamBatchId: Option[Long] = None): (Long, (Long, Long, Long)) = {
    import org.apache.spark.sql.functions.{coalesce, col, count, input_file_name, lit, sum, when}
    require(keyCols.nonEmpty, "mergeInto needs at least one key column")
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    requireNoColMap(spark, fs, path, "mergeInto")
    // generated columns: a merge source must carry complete rows and its
    // derived values must MATCH — one aggregate gate, nothing published
    // on violation (computeAbsent=false: an upsert that omitted the
    // column would need per-branch computation; refuse instead)
    applyGeneratedTo(spark, path, source, "mergeInto", computeAbsent = false)
    ensureVersionManifests(spark, path)
    requireNoDvs(spark, fs, path, "mergeInto")
    if (!fs.exists(versionsDir(path))) bootstrapRootVersion(spark, fs, path)
    val v0 = readVersionPointer(fs, path).getOrElse {
      val vs = listVersions(spark, path)
      require(vs.nonEmpty, s"no versions under $path")
      vs.last
    }
    val m0 = readVersionManifest(spark, fs, path, v0).getOrElse(
      sys.error(s"version $v0 has no manifest under $path"))
    val prior = org.apache.spark.sql.types.StructType.fromDDL(m0.schemaDdl)
    prior.fields.foreach { f =>
      require(source.schema.fields.exists(s => s.name == f.name &&
          s.dataType.catalogString == f.dataType.catalogString),
        s"merge source is missing table column ${f.name}: " +
          s"${f.dataType.catalogString} (table ${prior.toDDL})")
    }
    // caller-supplied source may be expensive; persist for the guard +
    // counts + the joins below, released even when a require throws
    val src = source.persist()
    try {
      val delFlag = deleteWhen.map(c => coalesce(c, lit(false)))
        .getOrElse(lit(false))
      // ONE pass over the persisted source computes the multi-match guard
      // (a key mapping to two source rows has no defined outcome — Delta
      // errors the same way), the row count, and the delete-arm count.
      // These were three separate actions (guard isEmpty / count /
      // filter.count); each action re-launches a job over the source, and
      // on a micro-batch fold the per-job overhead dwarfed the data.
      val guardRow = prof("merge:src-stats")(src
        .groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("_graft_n"),
          sum(when(delFlag, lit(1L)).otherwise(lit(0L))).as("_graft_ndel"))
        .agg(sum(col("_graft_n")), org.apache.spark.sql.functions
          .max(col("_graft_n")), sum(col("_graft_ndel")))
        .head())
      val nSrc = if (guardRow.isNullAt(0)) 0L else guardRow.getLong(0)
      require(guardRow.isNullAt(1) || guardRow.getLong(1) <= 1L,
        s"mergeInto source is not unique on (${keyCols.mkString(",")})")
      val nDel =
        if (deleteWhen.isEmpty || guardRow.isNullAt(2)) 0L
        else guardRow.getLong(2)
      val nUp = nSrc - nDel
      val probe = hintedProbe(src.select(
        (keyCols.map(col) :+ delFlag.as("_graft_del")): _*),
        nSrc, maxBroadcastKeys)
      val root = rootPath(fs, hp)
      val abs0 = m0.entries.map(e => resolveRef(root, e._1))
      val statsDir = new org.apache.hadoop.fs.Path(path, "_graft_stats")
      val candidates: Seq[String] = filePrune match {
        case Some(keep) if fs.exists(statsDir) =>
          pruneCandidatesWithStats(spark, statsDir, keep, abs0)
        case _ => abs0
      }
      // ONE column-pruned discovery pass: which files hold a matched key,
      // and how many target rows does each merge arm touch? (file name
      // bound AT THE SCAN — after the join the row has two sources and
      // input_file_name is undefined)
      val fileArms: Seq[(String, Long, Long)] = prof("merge:discovery")(
        if (candidates.isEmpty) Seq.empty
        else readSomeFiles(spark, fs, path, candidates, m0.schemaDdl)
          .withColumn("_graft_file", input_file_name())
          .select((keyCols.map(col) :+ col("_graft_file")): _*)
          .join(probe, keyCols, "inner")
          .groupBy(col("_graft_file"))
          .agg(
            sum(when(col("_graft_del"), lit(0L)).otherwise(lit(1L)))
              .as("n_upd"),
            sum(when(col("_graft_del"), lit(1L)).otherwise(lit(0L)))
              .as("n_del"))
          .collect().toSeq.map(r => (
            new java.net.URI(r.getString(0)).getPath,
            r.getLong(1), r.getLong(2))))
      val matched: Set[String] = fileArms.map(_._1).toSet
      // target-row tallies per arm, exact whatever the target's key shape
      val updated = fileArms.map(_._2).sum
      val deleted = fileArms.map(_._3).sum
      if (matched.isEmpty && nUp == 0L) return (v0, (0L, 0L, 0L))
      // constraints apply to the rows ENTERING the table (the upsert
      // arm); carried rows were validated when they entered, delete rows
      // remove data
      val cs0 = checkConstraints(spark, path)
      if (nUp > 0L && cs0.nonEmpty)
        enforceConstraintsOn(spark,
          src.filter(!delFlag).select(prior.fieldNames.map(col): _*),
          cs0, s"mergeInto($path)")
      // rewrite = unmatched rows of matched files + every UPSERT source
      // row (updated keys replace, new keys insert; delete-flagged rows
      // contribute removals only) — one write into a claimed namespace
      // dir; the commit number is base+1 (contiguity — see deleteWhere)
      val keptOld = readSomeFiles(spark, fs, path, matched.toSeq, m0.schemaDdl)
        .join(probe, keyCols, "left_anti")
        .select(prior.fieldNames.map(col): _*)
      val matchedEntries = m0.entries.filter(e => matched(resolveRef(root, e._1)))
      // size-adaptive output: the rewrite's row count is KNOWN before the
      // write (matched files' manifest n_rows minus replaced/deleted rows
      // plus the upsert arm) — shape the file count to the data instead of
      // inheriting ~one tiny file per upstream task. Stats-manifest tables
      // keep their natural boundaries (file-level clustering).
      val rewriteAll = keptOld.unionByName(
        src.filter(!delFlag).select(prior.fieldNames.map(col): _*))
      val estRows =
        matchedEntries.map(_._2).sum - updated - deleted + (nSrc - nDel)
      val rewriteDf =
        if (fs.exists(statsDir)) rewriteAll
        else rewriteAll.coalesce(commitFileParts(estRows))
      val (_, rewritten) =
        prof("merge:rewrite")(writeClaimedDir(spark, fs, path, rewriteDf))
      // a constraint may have landed since the gate: re-enforce the NEW
      // ones against the upsert arm (src is persisted — one cheap pass)
      val csNow = checkConstraints(spark, path).filterNot(cs0.contains)
      if (nUp > 0L && csNow.nonEmpty)
        enforceConstraintsOn(spark,
          src.filter(!delFlag).select(prior.fieldNames.map(col): _*),
          csNow, s"mergeInto($path)")
      // MERGE deliberately keeps the strict publish (no disjoint-set
      // rebase): its match/insert split was computed against the WHOLE
      // key set of the base version, so even a file-disjoint concurrent
      // append can invalidate it (an appended row carrying a source key
      // should have been an UPDATE — rebasing would silently insert a
      // duplicate). Delta draws the same line: ConcurrentAppendException
      // for merges that read the table, rebase only for blind appends.
      val next = v0 + 1
      prof("merge:manifest")(writeVersionDelta(spark, fs, path, next,
        m0.schemaDdl,
        base = v0, add = rewritten, remove = matchedEntries.map(_._1),
        streamBatchId = streamBatchId, op = Some("merge")))
      writeVersionPointer(spark, fs, path, next)
      prof("merge:stats")(if (fs.exists(statsDir)) {
        val tracked = spark.read.json(statsDir.toString).schema.fieldNames.toSeq
          .filter(_.startsWith("min_")).map(_.stripPrefix("min_"))
        if (tracked.nonEmpty) appendStats(spark, path, tracked)
      })
      prof("merge:bloom")(refreshBloomIndexes(spark, fs, path))
      // inserted = upsert rows whose key matched nothing; with a
      // key-unique target (the normal state of a merge-maintained table)
      // `updated` counts exactly the matched upsert keys, so the split is
      // exact — a dup-keyed target still merges correctly, only the
      // update/insert split blurs (deleted stays exact: it tallies
      // target rows directly)
      (next, (updated, nUp - updated, deleted))
    } finally { src.unpersist(); () }
  }

  /** Make a STREAM-WRITTEN table versioned — the commit half of the
    * reference's streaming-table shape (`bronze_iot_events.sql:1-6` is a
    * Delta streaming table: every drain lands in a transaction log with
    * time travel for free). Our streaming sinks write flat parquet files
    * at the table root plus a `_spark_metadata` sink log; this publishes
    * every ROOT-LEVEL data file not yet referenced by any retained
    * version manifest as one `appendVersioned`-style delta commit —
    * METADATA-ONLY (files are adopted by reference, never moved), so the
    * per-drain commit cost is O(new files) exactly like the stats append.
    *
    * Idempotence is by FILE DIFF, which is strictly stronger than
    * batch-id dedup: a re-drain that adds no files publishes no version;
    * a crash between drain and commit self-heals (the next commit adopts
    * both drains' files); calling it twice is a no-op. Root-level only is
    * load-bearing: files under `v=N` dirs belong to versioned REWRITES
    * (delete/merge/optimize) — a crash-orphaned rewrite dir must never be
    * adopted as streamed data (vacuum reclaims it instead).
    *
    * After the first commit the table is a first-class versioned Lake
    * table: `readVersioned`/time travel/`deleteWhere`/`mergeInto`/
    * `optimizeVersioned`/`vacuum` all work with NO bootstrap step. The
    * `_spark_metadata` log keeps serving the SINK's exactly-once
    * bookkeeping, but versioned readers resolve manifests (explicit file
    * lists never consult the sink log), so the two metadata systems no
    * longer conflict — batch consumers of a versioned streamed table
    * should read through [[readVersioned]], not a raw dir scan.
    *
    * For CONTINUOUS (foreachBatch) deployments pass the micro-batch's
    * `streamBatchId`: it is recorded in the version manifest, and a
    * replayed batch (crash after the data write, before the checkpoint
    * commit) is detected via [[streamBatchCommitted]] BEFORE writing —
    * exactly-once at the version level, surviving vacuum's checkpoint
    * materialization.
    *
    * @return the published version, or None when no new files exist (or
    *         this batch id already committed)
    */
  def commitStreamVersion(spark: SparkSession, path: String,
      streamBatchId: Option[Long] = None): Option[Long] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hp)) return None
    requireNoColMap(spark, fs, path, "commitStreamVersion")
    require(generatedColumns(spark, path).isEmpty,
      s"commitStreamVersion($path): table declares GENERATED columns; " +
        "adopted stream files were written outside the derivation gate - " +
        "append through appendVersioned, or drop the generated spec")
    require(readSchemaManifests(spark, path).isEmpty,
      s"$path is a schema-evolving table; streamed commits assume the " +
        "sink's fixed schema (evolve via writeEvolving, not a stream)")
    if (streamBatchId.exists(streamBatchCommitted(spark, path, _)))
      return None
    // when the dir carries a `_spark_metadata` sink log, adopt ONLY files
    // the SINK COMMITTED: a sink batch that crashed mid-write leaves
    // unlogged part files at the root, and adopting them would surface
    // rows the sink itself will re-write on replay (duplicates). The log
    // is the sink's exactly-once source of truth; the manifest diff
    // layers version-level idempotence on top of it.
    val logged: Option[Set[String]] = sinkLoggedFiles(fs, path)
    def rootFiles(): Seq[String] = fs.listStatus(hp).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(_.getPath.toUri.getPath)
      .filter(f => logged.forall(_.contains(f)))
    if (!fs.exists(versionsDir(path))) {
      // first commit: version 1 is EXACTLY the sink-committed root files
      // (not a blind dir listing — see the sink-log note above)
      val rf = rootFiles()
      if (rf.isEmpty) return None
      val ddl = spark.read.parquet(qualifyForRead(fs, rf): _*).schema.toDDL
      if (checkConstraints(spark, path).nonEmpty)
        enforceConstraints(spark, path,
          spark.read.parquet(qualifyForRead(fs, rf): _*),
          s"commitStreamVersion($path)")
      writeVersionManifest(spark, fs, path, 1L, ddl,
        fileEntries(spark, fs, path, rf), streamBatchId = streamBatchId,
        op = Some("stream-adopt"))
      writeVersionPointer(spark, fs, path, 1L)
      return Some(1L)
    }
    // every file ANY retained version references is already owned —
    // including files a delete RETIRED but vacuum still retains, which a
    // naive current-version diff would wrongly re-adopt (resurrecting
    // deleted rows on the next drain)
    val known: Set[String] = manifestVersions(fs, path).flatMap(v =>
      readVersionManifest(spark, fs, path, v).toSeq.flatMap(_.entries.map(_._1)))
      .toSet
    val root = rootPath(fs, hp)
    val fresh = rootFiles().map(_.stripPrefix(root + "/")).filterNot(known)
    if (fresh.isEmpty) return None
    // base on the newest MANIFEST and publish at base+1 — the contiguity
    // contract every delta commit follows (see deleteWhere)
    val vs = manifestVersions(fs, path)
    require(vs.nonEmpty, s"no versions under $path")
    val v0 = vs.last
    val raw0 = readRawManifest(spark, fs, path, v0).getOrElse(
      sys.error(s"version $v0 has no manifest under $path"))
    if (checkConstraints(spark, path).nonEmpty)
      enforceConstraints(spark, path,
        spark.read.parquet(
          qualifyForRead(fs, fresh.map(r => resolveRef(root, r))): _*),
        s"commitStreamVersion($path)")
    val entries = fileEntries(spark, fs, path, fresh.map(r => resolveRef(root, r)))
    val next = v0 + 1
    writeVersionDelta(spark, fs, path, next, raw0.schemaDdl,
      base = v0, add = entries, remove = Seq.empty,
      streamBatchId = streamBatchId, op = Some("stream-adopt"))
    writeVersionPointer(spark, fs, path, next)
    // a drained sink accretes one file set per drain — exactly the
    // auto-compaction target case (see setAutoOptimize); folded originals
    // stay on disk for log-trusting readers until vacuum, like every
    // optimizeVersioned commit
    autoOptimizePolicy(fs, path).foreach { case (limit, target) =>
      maybeAutoOptimize(spark, fs, path, limit, target)
    }
    Some(next)
  }

  /** Files the `_spark_metadata` streaming-sink log has COMMITTED
    * (absolute scheme-less paths), or None when the dir carries no sink
    * log. Log batch files are JSON-lines — a version header then one
    * SinkFileStatus object per line; `.compact` files use the same
    * format. Metadata-sized driver read, Jackson-parsed like the version
    * manifests.
    */
  private def sinkLoggedFiles(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Option[Set[String]] = {
    val logDir = new org.apache.hadoop.fs.Path(path, "_spark_metadata")
    if (!fs.exists(logDir)) None
    else {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      Some(fs.listStatus(logDir).toSeq
        .filter(s => s.isFile && !s.getPath.getName.startsWith(".") &&
          !s.getPath.getName.startsWith("_"))
        .flatMap { st =>
          val in = fs.open(st.getPath)
          val txt =
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          txt.linesIterator.filter(_.startsWith("{")).flatMap { line =>
            try {
              val n = m.readTree(line)
              val act = Option(n.get("action")).map(_.asText).getOrElse("add")
              if (act == "delete") None
              else Option(n.get("path")).map(p =>
                new java.net.URI(p.asText).getPath)
            } catch { case _: Exception => None }
          }.toSeq
        }.toSet)
    }
  }

  /** Has a version carrying this stream batch id already been published?
    * O(retained versions) driver-side metadata reads — the replay check
    * for continuous-mode [[commitStreamVersion]] callers.
    */
  def streamBatchCommitted(spark: SparkSession, path: String,
      batchId: Long): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(versionsDir(path)) && manifestVersions(fs, path).exists(v =>
      readRawManifest(spark, fs, path, v).flatMap(_.streamBatchId)
        .contains(batchId))
  }

  /** RESTORE — Delta's `RESTORE TABLE … TO VERSION AS OF v`: publish
    * version `v`'s file list as a NEW version (metadata-only — files are
    * re-referenced, never copied), so the table's latest state becomes
    * the old state while the full history, including the versions being
    * rolled back, stays time-travelable until vacuum. Published at
    * base+1 with the rename guard like every commit, op "restore".
    *
    * @return the new version number
    */
  def restoreVersion(spark: SparkSession, path: String, v: Long): Long = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(versionsDir(path)),
      s"$path carries no _graft_versions manifests - nothing to restore")
    val m = readVersionManifest(spark, fs, path, v).getOrElse(
      sys.error(s"version $v does not exist under $path (have: " +
        s"${manifestVersions(fs, path).mkString(",")})"))
    val v0 = manifestVersions(fs, path).last
    if (v == v0) return v0 // restoring the latest is a no-op
    // a version published BEFORE addGeneratedColumn/addCheckConstraint may
    // hold rows the current specs reject; re-publishing it at head would
    // break the invariant every write path enforces (no commit publishes a
    // violating row), so validate the restored data first — one
    // column-pruned aggregate per artifact kind, zero cost when the table
    // declares neither (the common case)
    val gens = generatedColumns(spark, path)
    if (gens.nonEmpty)
      validateGeneratedOn(spark, readVersioned(spark, path, Some(v)), gens,
        s"restoreVersion($path, v=$v)")
    val resCs = checkConstraints(spark, path)
    if (resCs.nonEmpty)
      enforceConstraintsOn(spark, readVersioned(spark, path, Some(v)), resCs,
        s"restoreVersion($path, v=$v)")
    val next = v0 + 1
    // the restored version's live deletion vectors travel with it — a
    // restore to a pre-purge version re-applies that version's sidecars —
    // and so does its column mapping (restoring past a rename restores
    // that version's own logical names)
    writeVersionManifest(spark, fs, path, next, m.schemaDdl, m.entries,
      op = Some("restore"), dv = m.dvs, colmap = m.colmap)
    writeVersionPointer(spark, fs, path, next)
    next
  }

  /** CHECK CONSTRAINTS for versioned tables — Delta's `ALTER TABLE ADD
    * CONSTRAINT` semantics: a named SQL predicate every row entering the
    * table must satisfy, from this commit on. Adding a constraint
    * VALIDATES EXISTING DATA first (one column-pruned pass — refusing a
    * constraint the table already violates is the honest contract);
    * thereafter every [[appendVersioned]]/[[writeVersioned]]/
    * [[mergeInto]]/[[mergeCdc]]-upsert batch and every
    * [[commitStreamVersion]] adoption is checked in ONE extra narrow
    * pass (all constraints folded into a single aggregate — cost is one
    * scan of the BATCH, never the table) and a violating commit is
    * refused loudly with per-constraint counts before any manifest
    * publishes. SQL CHECK null semantics: a row violates only when the
    * predicate is definitively FALSE; NULL passes (use an explicit
    * `IS NOT NULL` constraint for null rejection).
    *
    * Constraints live as one JSON file per name under
    * `_graft_constraints/` (tmp-write + rename, duplicate names
    * refused), so they survive restarts and travel with the table.
    */
  def addCheckConstraint(spark: SparkSession, path: String, name: String,
      sqlExpr: String): Unit = {
    import org.apache.spark.sql.functions.expr
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_'),
      s"constraint name '$name' must be [A-Za-z0-9_]+")
    // schema-evolving tables are refused: writeEvolving bypasses the
    // versioned-commit gates, and a rename could silently detach the
    // constraint from the column it was written against — an unenforced
    // constraint is worse than none
    require(readSchemaManifests(spark, path).isEmpty,
      s"$path is a schema-evolving table; CHECK constraints require the " +
        "fixed-schema versioned write path")
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    requireNoColMap(spark, fs, path, "addCheckConstraint")
    // fail fast on unparseable SQL before publishing anything
    readVersioned(spark, path).filter(expr(sqlExpr)).limit(0).count()
    // PUBLISH FIRST, validate second, roll back on failure: once the
    // constraint file lands every new commit's gate enforces it, so the
    // existing-data scan (which reads the table as of AFTER the publish)
    // races no one — a validate-then-publish order would let a commit
    // slip violating rows in during the seconds the scan takes. The cost
    // of this order is transient: until validation finishes, concurrent
    // valid commits are gated by a constraint that may yet be rolled
    // back (they simply pass it), and a violating concurrent commit is
    // correctly refused.
    val dir = new org.apache.hadoop.fs.Path(path, "_graft_constraints")
    fs.mkdirs(dir)
    val dst = new org.apache.hadoop.fs.Path(dir, s"$name.json")
    require(!fs.exists(dst),
      s"constraint '$name' already exists on $path (drop it first)")
    val tmp = new org.apache.hadoop.fs.Path(dir, s".$name.tmp")
    val out = fs.create(tmp, true)
    out.write(
      s"""{"name":${jsonStr(name)},"expr":${jsonStr(sqlExpr)}}"""
        .getBytes("UTF-8"))
    out.close()
    require(fs.rename(tmp, dst),
      s"constraint '$name' already exists on $path (concurrent writer?)")
    // post-publish cross-check against a concurrent writeEvolving: both
    // sides re-check the other's artifact after publishing their own, and
    // the CONSTRAINT side yields (rolls back) — whoever publishes second
    // must observe the first, so the forbidden constrained-evolving state
    // cannot persist (writeEvolving's v1 publish runs the mirror check)
    if (readSchemaManifests(spark, path).nonEmpty) {
      fs.delete(dst, false)
      sys.error(s"$path started schema evolution concurrently; " +
        "constraint rolled back - constraints require the fixed-schema path")
    }
    try
      enforceConstraintsOn(spark, readVersioned(spark, path),
        Seq(name -> sqlExpr),
        s"addCheckConstraint($name) on existing data of $path")
    catch {
      case e: Throwable =>
        fs.delete(dst, false) // roll back: an invalid constraint never sticks
        throw e
    }
  }

  // ======================================================================
  // GENERATED COLUMNS — Delta's `GENERATED ALWAYS AS (expr)`: a column
  // declared as a deterministic function of the row's OTHER columns.
  // Append-path batches may OMIT the column (the engine computes it) or
  // carry it (the engine VALIDATES it matches, one aggregate pass — the
  // CHECK-constraint cost shape); either way no commit can publish a row
  // where column ≠ expr. The spec lives as `_graft_generated/<name>.json`
  // (tmp+rename, like constraints), added against EXISTING data with a
  // validate-or-rollback pass. The 100 TB point is partition-prune
  // synergy: a stats manifest over a generated day/bucket column prunes
  // scans while writers never hand-maintain the derivation.
  // ======================================================================

  /** Declare `name` (already in the table schema) as GENERATED ALWAYS AS
    * `sqlExpr`. Refuses: evolving tables, column mappings, a type
    * mismatch between the expression and the declared column, and
    * existing rows that violate the derivation (validated in one pass,
    * spec rolled back on failure — an invalid spec never sticks).
    */
  def addGeneratedColumn(spark: SparkSession, path: String, name: String,
      sqlExpr: String): Unit = {
    import org.apache.spark.sql.functions.expr
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_'),
      s"generated column name '$name' must be [A-Za-z0-9_]+")
    require(readSchemaManifests(spark, path).isEmpty,
      s"$path is a schema-evolving table; generated columns require the " +
        "fixed-schema versioned write path")
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    requireNoColMap(spark, fs, path, "addGeneratedColumn")
    val cur = readVersioned(spark, path)
    require(cur.schema.fieldNames.contains(name),
      s"addGeneratedColumn($path): '$name' is not a column of the table " +
        s"(have: ${cur.schema.fieldNames.mkString(", ")})")
    val declared = cur.schema(name).dataType.catalogString
    val computed = cur.select(expr(sqlExpr).as(name))
      .schema.head.dataType.catalogString
    require(computed == declared,
      s"addGeneratedColumn($path): expression type $computed does not " +
        s"match declared column type $declared")
    val dir = new org.apache.hadoop.fs.Path(path, "_graft_generated")
    fs.mkdirs(dir)
    val dst = new org.apache.hadoop.fs.Path(dir, s"$name.json")
    require(!fs.exists(dst),
      s"generated column '$name' already declared on $path (drop it first)")
    val tmp = new org.apache.hadoop.fs.Path(dir, s".$name.tmp")
    val out = fs.create(tmp, true)
    out.write(
      s"""{"name":${jsonStr(name)},"expr":${jsonStr(sqlExpr)}}"""
        .getBytes("UTF-8"))
    out.close()
    require(fs.rename(tmp, dst),
      s"generated column '$name' already declared on $path (concurrent writer?)")
    // validate EXISTING data after publish (the addCheckConstraint order:
    // once the spec is visible every new commit enforces it, so the scan
    // races no one); roll back on violation
    try validateGeneratedOn(spark, cur, Seq(name -> sqlExpr),
      s"addGeneratedColumn($name) on existing data of $path")
    catch {
      case e: Throwable =>
        fs.delete(dst, false)
        throw e
    }
  }

  def dropGeneratedColumn(spark: SparkSession, path: String,
      name: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(
      new org.apache.hadoop.fs.Path(path, s"_graft_generated/$name.json"),
      false)
  }

  /** The table's (column, sql) generated-column specs, name-ascending. */
  def generatedColumns(spark: SparkSession,
      path: String): Seq[(String, String)] = {
    val dir = new org.apache.hadoop.fs.Path(path, "_graft_generated")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      fs.listStatus(dir).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".json") &&
          !s.getPath.getName.startsWith("."))
        .map { st =>
          val in = fs.open(st.getPath)
          val txt =
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          val n = m.readTree(txt)
          (n.get("name").asText, n.get("expr").asText)
        }.sortBy(_._1)
    }
  }

  /** One aggregate pass refusing any row where a generated column's
    * stored value differs (null-safely) from its derivation.
    */
  private def validateGeneratedOn(spark: SparkSession, incoming: DataFrame,
      specs: Seq[(String, String)], what: String): Unit = {
    import org.apache.spark.sql.functions.{col, expr, sum, when, lit}
    val aggs = specs.map { case (n, e) =>
      sum(when(!(col(n) <=> expr(e)), 1L).otherwise(0L)).as(n)
    }
    val row = incoming.agg(aggs.head, aggs.tail: _*).head()
    val bad = specs.indices.map(i => specs(i)._1 -> (
      if (row.isNullAt(i)) 0L else row.getLong(i))).filter(_._2 > 0)
    require(bad.isEmpty,
      s"GENERATED column violation in $what: " +
        bad.map { case (n, c) => s"$n ($c rows)" }.mkString(", ") +
        " - commit refused, nothing published")
  }

  /** Apply the table's generated-column specs to an incoming batch:
    * COMPUTE columns the batch omits, VALIDATE ones it carries, and
    * return the frame in the table's column order (compute appends at
    * the end, which the exact-schema append contract would refuse).
    * No specs → the batch passes through untouched.
    */
  private def applyGeneratedTo(spark: SparkSession, path: String,
      df: DataFrame, what: String, computeAbsent: Boolean = true): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val specs = generatedColumns(spark, path)
    if (specs.isEmpty) return df
    var out = df
    val toValidate = scala.collection.mutable.ListBuffer.empty[(String, String)]
    specs.foreach { case (n, e) =>
      if (!out.columns.contains(n)) {
        require(computeAbsent,
          s"$what($path): source omits generated column '$n'; this path " +
            "requires complete rows - compute it upstream")
        out = out.withColumn(n, expr(e))
      } else toValidate += (n -> e)
    }
    if (toValidate.nonEmpty)
      validateGeneratedOn(spark, out, toValidate.toSeq, what)
    // restore the table's column order when the schemas now agree as SETS
    currentSchemaDdl(spark, path).foreach { ddl =>
      val tableCols = org.apache.spark.sql.types.StructType.fromDDL(ddl)
        .fieldNames.toSeq
      if (out.columns.toSeq != tableCols &&
        out.columns.toSet == tableCols.toSet)
        out = out.select(tableCols.map(col): _*)
    }
    out
  }

  def dropCheckConstraint(spark: SparkSession, path: String,
      name: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(
      new org.apache.hadoop.fs.Path(path, s"_graft_constraints/$name.json"),
      false)
  }

  /** The table's (name, sql) CHECK constraints, name-ascending. */
  def checkConstraints(spark: SparkSession,
      path: String): Seq[(String, String)] = {
    val dir = new org.apache.hadoop.fs.Path(path, "_graft_constraints")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      fs.listStatus(dir).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".json") &&
          !s.getPath.getName.startsWith("."))
        .map { st =>
          val in = fs.open(st.getPath)
          val txt =
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          val n = m.readTree(txt)
          (n.get("name").asText, n.get("expr").asText)
        }.sortBy(_._1)
    }
  }

  /** Refuse `incoming` unless every row satisfies every constraint — ONE
    * aggregate pass whatever the constraint count (a violation is
    * `NOT coalesce(expr, true)`: SQL CHECK lets NULL pass).
    */
  private def enforceConstraints(spark: SparkSession, path: String,
      incoming: DataFrame, what: String): Unit = {
    val cs = checkConstraints(spark, path)
    if (cs.nonEmpty) enforceConstraintsOn(spark, incoming, cs, what)
  }

  /** Re-enforce constraints that appeared AFTER a commit's gate read,
    * against the batch's already-written files — closing the
    * add-constraint-vs-commit race from the commit side: the publish
    * attempt re-reads the constraint set, and any constraint that landed
    * since the gate gets enforced in one column-pruned pass over the
    * BATCH files before the manifest rename. A constraint landing after
    * our rename is covered from the ADD side instead: its existing-data
    * scan reads the table as of after its own publish, which includes
    * us. (The residual is the pair of metadata ops between this re-read
    * and the rename — the same local-FS window the schema-manifest
    * guards document; HDFS/object-store renames close it.)
    */
  private def reenforceIfChanged(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String,
      gateCs: Seq[(String, String)], entries: Seq[(String, Long)],
      schemaDdl: String, what: String): Unit = {
    val fresh = checkConstraints(spark, path).filterNot(gateCs.contains)
    if (fresh.nonEmpty && entries.nonEmpty) {
      val root = rootPath(fs, new org.apache.hadoop.fs.Path(path))
      enforceConstraintsOn(spark,
        readSomeFiles(spark, fs, path,
          entries.map(e => resolveRef(root, e._1)), schemaDdl),
        fresh, what)
    }
  }

  private def enforceConstraintsOn(spark: SparkSession, incoming: DataFrame,
      cs: Seq[(String, String)], what: String): Unit = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit, sum, when}
    val aggs = cs.map { case (n, e) =>
      sum(when(!coalesce(expr(e), lit(true)), 1L).otherwise(0L)).as(n)
    }
    val row = incoming.agg(aggs.head, aggs.tail: _*).head()
    val bad = cs.indices.map(i => cs(i)._1 -> (
      if (row.isNullAt(i)) 0L else row.getLong(i))).filter(_._2 > 0)
    require(bad.isEmpty,
      s"CHECK constraint violation in $what: " +
        bad.map { case (n, c) => s"$n ($c rows)" }.mkString(", ") +
        " - commit refused, nothing published")
  }

  /** Remove versions older than the newest `keepLast` (the published
    * pointer target is always kept), then delete only the data files NO
    * retained version references — shared files survive, which is what
    * file-granular commits require. Returns the removed version numbers.
    */
  def vacuum(spark: SparkSession, path: String, keepLast: Int,
      orphanGraceMs: Long = 86400000L): Seq[Long] = {
    require(keepLast >= 1, "vacuum must keep at least the latest version")
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all = listVersions(spark, path)
    val current = readVersionPointer(fs, path)
    val drop = all.dropRight(keepLast).filterNot(current.contains)
    if (!fs.exists(versionsDir(path))) {
      // pre-manifest layout: a version owns its dir outright
      drop.foreach(v =>
        fs.delete(new org.apache.hadoop.fs.Path(path, s"v=$v"), true))
      return drop
    }
    val retained = all.filterNot(drop.contains)
    // deletion-vector sidecars are references like any data file: a
    // retained version that still applies a sidecar must keep it on disk
    val referenced = retained.flatMap(v =>
      readVersionManifest(spark, fs, path, v).toSeq.flatMap(m =>
        m.entries.map(_._1) ++ m.dvs.map(_.dv)))
      .toSet ++
      // staged-but-unpublished WAP batches are LIVE ROOTS: their files
      // have no manifest yet by design, and the orphan-grace sweep must
      // not mistake a long-pending audit for a crashed commit — abort,
      // not age, is what reclaims staged work
      stagedReferencedFiles(spark, fs, path)
    // a retained DELTA manifest may resolve through a version being
    // dropped: materialize it to a full checkpoint FIRST (metadata-only
    // atomic swap), so no chain ever dangles. Ascending order: once an
    // older retained version is full, newer chains stop at it.
    val dropSet = drop.toSet
    def chainHitsDropped(v: Long): Boolean = {
      var cur = readRawManifest(spark, fs, path, v)
      while (cur.exists(_.files.isEmpty)) {
        val b = cur.get.base.get
        if (dropSet(b)) return true
        cur = readRawManifest(spark, fs, path, b)
      }
      false
    }
    retained.foreach { v =>
      if (chainHitsDropped(v)) {
        val m = readVersionManifest(spark, fs, path, v).getOrElse(
          sys.error(s"version $v has no manifest under $path"))
        // carry the ORIGINAL commit ts and stream batch id into the
        // checkpoint: asOf resolution and batch-replay idempotence must
        // behave identically before and after a vacuum
        val orig = readRawManifest(spark, fs, path, v)
        writeVersionManifest(spark, fs, path, v, m.schemaDdl, m.entries,
          replace = true, ts = orig.flatMap(_.ts),
          streamBatchId = orig.flatMap(_.streamBatchId),
          op = orig.flatMap(_.op), dv = m.dvs, colmap = m.colmap)
      }
    }
    val root = rootPath(fs, hp)
    // resolve every dropped version BEFORE deleting any manifest — a
    // dropped delta may resolve through another dropped version's file
    val droppedEntries: Seq[(Long, Seq[String])] = drop.map(v =>
      v -> readVersionManifest(spark, fs, path, v).toSeq
        .flatMap(m => m.entries.map(_._1) ++ m.dvs.map(_.dv)))
    droppedEntries.foreach { case (v, rels) =>
      // external (shallow-clone) references are dropped from the
      // manifests but their files belong to the SOURCE table — never
      // physically deleted through the clone (Delta's clone rule)
      rels.filterNot(referenced).filterNot(isExternalRef).foreach(rel =>
        fs.delete(new org.apache.hadoop.fs.Path(resolveRef(root, rel)), false))
      fs.delete(versionManifestFile(path, v), false)
    }
    // reclaim CRASH ORPHANS — unreferenced files in v= dirs, gated by an
    // MTIME GRACE window (Delta VACUUM's model): a file no retained
    // manifest references is either a crashed commit's leavings (its
    // writer died before publishing) or a LIVE commit's work in progress
    // (its writer will publish soon). Version numbers cannot tell the two
    // apart once data-dir numbers and manifest numbers decouple (a rebase
    // can publish manifest v=7 over dir v=5, and concurrent manifests can
    // catch up past a live writer's dir), so the discriminator is AGE:
    // a live commit publishes within minutes, a crashed one never does —
    // files older than `orphanGraceMs` (default 24 h) with no reference
    // are dead. Root-level files are NEVER touched here: on a streamed
    // table they may be drained-but-not-yet-committed batches
    // ([[commitStreamVersion]] adopts them).
    val now = System.currentTimeMillis()
    def expired(st: org.apache.hadoop.fs.FileStatus): Boolean =
      st.getModificationTime + orphanGraceMs <= now
    fs.listStatus(hp).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .foreach { d =>
        listDataFiles(fs, d.getPath)
          .filterNot(f => referenced(f.stripPrefix(root + "/")))
          .map(f => fs.getFileStatus(new org.apache.hadoop.fs.Path(f)))
          .filter(expired)
          .foreach(st => fs.delete(st.getPath, false))
      }
    // reclaim SINK-CRASH leftovers at the table ROOT, only when a
    // `_spark_metadata` sink log exists to adjudicate: a root file that
    // is UNLOGGED (the sink never committed it — its batch died mid-write
    // and was rewritten on replay under a new name), UNREFERENCED by any
    // retained manifest, and past the grace window will never be adopted
    // ([[commitStreamVersion]] adopts only logged files when a log
    // exists). Without a sink log, root files are left strictly alone —
    // they may be drained batches awaiting adoption.
    sinkLoggedFiles(fs, path).foreach { logged =>
      fs.listStatus(hp).toSeq
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith("."))
        .filter(expired)
        .filter { s =>
          val p = s.getPath.toUri.getPath
          !logged(p) && !referenced(p.stripPrefix(root + "/"))
        }
        .foreach(s => fs.delete(s.getPath, false))
    }
    // fold away v= dirs with no data files left, under the same grace:
    // a raw-empty dir deletes immediately; a dir holding only expired
    // crumbs (claim markers, _SUCCESS, stale _temporary) deletes with
    // them; a dir with any RECENT entry is a live writer's workspace and
    // survives untouched
    fs.listStatus(hp).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .foreach { d =>
        val crumbs = fs.listStatus(d.getPath).toSeq
        if (crumbs.isEmpty ||
            (listDataFiles(fs, d.getPath).isEmpty && crumbs.forall(expired)))
          fs.delete(d.getPath, true)
      }
    drop
  }

  /** OPTIMIZE for versioned tables — small-file compaction published as a
    * NEW VERSION, never an in-place rewrite (shared files are immutable;
    * that is why [[compact]]/[[rerange]] refuse versioned tables). Files
    * smaller than half the target are bin-packed into ~targetFileBytes
    * rewrites; every already-compact file carries into the new version BY
    * REFERENCE. Cost is therefore ∝ SMALL-FILE bytes, not table size —
    * after a year of O(batch) [[appendVersioned]] commits, the periodic
    * optimize pays only for the accreted tail, exactly Delta's OPTIMIZE
    * shape. Readers are never disturbed: old versions keep their file
    * lists, [[vacuum]] later reclaims the folded originals.
    *
    * @return (new version, files folded); ((current, 0)) when fewer than
    *         two small files exist — nothing to fold, nothing published
    */
  def optimizeVersioned(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L << 20): (Long, Long) = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    ensureVersionManifests(spark, path)
    requireNoColMap(spark, fs, path, "optimizeVersioned")
    val v0 = readVersionPointer(fs, path).getOrElse {
      val vs = listVersions(spark, path)
      require(vs.nonEmpty, s"no versions under $path")
      vs.last
    }
    val m0 = readVersionManifest(spark, fs, path, v0).getOrElse(
      sys.error(s"version $v0 has no manifest under $path"))
    val root = rootPath(fs, hp)
    val sized = m0.entries.map { e =>
      (e, fs.getFileStatus(new org.apache.hadoop.fs.Path(resolveRef(root, e._1))).getLen)
    }
    val small = sized.filter(_._2 < targetFileBytes / 2)
    if (small.size <= 1) return (v0, 0L)
    val smallBytes = small.map(_._2).sum
    val nOut = math.max(1L,
      (smallBytes + targetFileBytes - 1) / targetFileBytes).toInt
    // fold dir is a claimed namespace; the commit number is base+1 (the
    // non-commuting contiguity contract — see deleteWhere)
    // reading THROUGH any live deletion vectors makes the fold double as
    // a purge for the folded files: tombstoned rows drop from the
    // rewrite, and the files' dv coverage drops with the remove
    val (_, folded) = writeClaimedDir(spark, fs, path,
      readFilesWithDv(spark, fs, path, m0,
        small.map(e => resolveRef(root, e._1._1)))
        .coalesce(nOut)) // NARROW: compaction moves bytes, never an exchange
    val ddl =
      if (readSchemaManifests(spark, path).nonEmpty) logicalDdl(spark, path)
      else m0.schemaDdl
    // disjoint-set commit: maintenance must not starve under a steady
    // append stream — concurrent appends rebase this fold behind them
    val next = publishNonCommuting(spark, fs, path, v0, ddl,
      add = folded, remove = small.map(_._1._1), op = "optimize")
    // keep an existing skipping manifest live over the folded files
    val statsDir = new org.apache.hadoop.fs.Path(path, "_graft_stats")
    if (fs.exists(statsDir)) {
      val tracked = spark.read.json(statsDir.toString).schema.fieldNames.toSeq
        .filter(_.startsWith("min_")).map(_.stripPrefix("min_"))
      if (tracked.nonEmpty) appendStats(spark, path, tracked)
    }
    refreshBloomIndexes(spark, fs, path)
    (next, small.size.toLong)
  }

  /** AUTO-COMPACTION policy — the reference's "automatic maintenance"
    * posture (README_DBT.md:32,102-103) made a TABLE property instead of
    * an external scheduler: once set, every [[appendVersioned]] commit
    * checks the live small-file count afterwards and, when it crosses
    * `smallFileLimit`, folds the accreted tail with [[optimizeVersioned]]
    * in a separate maintenance commit (op = "optimize", so change-feed
    * readers still see it as an invisible reorg and incremental views
    * are undisturbed). The count early-exits at the limit, so a steady
    * append stream pays O(limit) driver-side file stats per commit; the
    * fold itself costs ∝ small-file bytes (optimizeVersioned's
    * contract). Under a steady stream the live file count is therefore
    * bounded by ~(smallFileLimit + compact-file count) instead of
    * growing one file per batch forever. A concurrent appender losing
    * the maintenance race simply rebases (disjoint-set commits); the
    * policy is re-checked on its own next append.
    */
  def setAutoOptimize(spark: SparkSession, path: String,
      smallFileLimit: Int = 16, targetFileBytes: Long = 128L << 20): Unit = {
    require(smallFileLimit >= 2,
      s"smallFileLimit must be >= 2, got $smallFileLimit")
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(hp, "_graft_policy")
    fs.mkdirs(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir, ".auto_optimize.json.tmp")
    val dst = new org.apache.hadoop.fs.Path(dir, "auto_optimize.json")
    val out = fs.create(tmp, true)
    out.write(
      s"""{"smallFileLimit":$smallFileLimit,"targetFileBytes":$targetFileBytes}"""
        .getBytes("UTF-8"))
    out.close()
    fs.delete(dst, false)
    require(fs.rename(tmp, dst), s"failed to publish auto-optimize policy at $dst")
  }

  def clearAutoOptimize(spark: SparkSession, path: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(hp, "_graft_policy/auto_optimize.json"),
      false)
    ()
  }

  private[graft] def autoOptimizePolicy(
      fs: org.apache.hadoop.fs.FileSystem,
      path: String): Option[(Int, Long)] = {
    val f = new org.apache.hadoop.fs.Path(path, "_graft_policy/auto_optimize.json")
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
      Some((n.get("smallFileLimit").asInt, n.get("targetFileBytes").asLong))
    }
  }

  /** Post-commit policy check: count live files under target/2, stopping
    * as soon as the limit is reached (an append-heavy table stats at most
    * `limit` files before deciding), and fold when at/over it. A file
    * vacuumed between the manifest read and the stat is simply skipped.
    * At warehouse scale the byte sizes would ride in the manifest itself;
    * the trigger rule and the bound are the same either way.
    */
  private def maybeAutoOptimize(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String,
      limit: Int, target: Long): Unit = {
    // COLUMN-MAPPED tables skip auto-compaction SILENTLY rather than let
    // optimizeVersioned's refusal throw INSIDE a caller's publish loop:
    // appendVersioned catches IllegalArgumentException-with-manifest-
    // present as a lost manifest race and would re-publish the same batch
    // on every retry — a duplicate-rows corruption, not just a failure.
    // The policy is file-size-based and resumes the moment the map is
    // materialized away.
    if (colMapAtHead(spark, fs, path).nonEmpty) return
    val head = readVersionPointer(fs, path)
      .orElse(manifestVersions(fs, path).lastOption)
    val entries = head
      .flatMap(readVersionManifest(spark, fs, path, _))
      .map(_.entries).getOrElse(Seq.empty)
    val root = rootPath(fs, new org.apache.hadoop.fs.Path(path))
    var small = 0
    val it = entries.iterator
    while (small < limit && it.hasNext) {
      val e = it.next()
      val len =
        try fs.getFileStatus(
          new org.apache.hadoop.fs.Path(resolveRef(root, e._1))).getLen
        catch { case _: java.io.FileNotFoundException => Long.MaxValue }
      if (len < target / 2) small += 1
    }
    if (small >= limit) { optimizeVersioned(spark, path, target); () }
  }

  /** Sort-order OPTIMIZE for VERSIONED tables — the [[rerange]] analog
    * published as a new version instead of an in-place dir swap (shared
    * files are immutable). Interleaved [[appendVersioned]] batches each
    * span the whole key range, so probe/range pruning on `c` degrades
    * permanently as a versioned table accretes — the exact decay
    * [[rerange]] fixes for plain tables, which until now had no versioned
    * counterpart ([[optimizeVersioned]] bin-packs but never re-sorts).
    * This rewrites the CURRENT file set range-clustered on `c` (one range
    * exchange, ~targetFileRows rows per file) and publishes it as a full
    * checkpoint manifest — a full manifest, not a delta, because the
    * commit replaces every reference anyway (a delta would be checkpoint-
    * sized). Old versions keep their file lists and stay time-travelable;
    * [[vacuum]] later reclaims the superseded originals; the `_graft_stats`
    * manifest gains rows for the new files so probe pruning is restored
    * immediately. Row counts come from manifest n_rows — no counting scan.
    *
    * Cost is ∝ CURRENT table bytes (every live row is rewritten once) —
    * run it as periodic housekeeping after enough appends have degraded
    * pruning, exactly like Delta's OPTIMIZE ZORDER.
    *
    * @return (published version, data files after the rewrite)
    */
  def rerangeVersioned(spark: SparkSession, path: String, c: String,
      targetFileRows: Long): (Long, Long) = {
    import org.apache.spark.sql.functions.col
    require(targetFileRows > 0, "targetFileRows must be positive")
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    requireNoColMap(spark, fs, path, "rerangeVersioned")
    require(fs.exists(versionsDir(path)),
      s"$path carries no _graft_versions manifests; use rerange (in-place " +
        "dir swap) for plain tables")
    val v0 = readVersionPointer(fs, path).getOrElse {
      val vs = manifestVersions(fs, path)
      require(vs.nonEmpty, s"no versions under $path")
      vs.last
    }
    val m0 = readVersionManifest(spark, fs, path, v0).getOrElse(
      sys.error(s"version $v0 has no manifest under $path"))
    if (m0.entries.isEmpty) return (v0, 0L)
    val nRows = m0.entries.map(_._2).sum
    val nOut = math.max(1L, (nRows + targetFileRows - 1) / targetFileRows)
    // rewrite dir is a claimed namespace; the commit number is base+1
    // (the non-commuting contiguity contract — see deleteWhere)
    val (_, rewritten) = writeClaimedDir(spark, fs, path,
      readManifestFiles(spark, fs, path, m0)
        .repartitionByRange(nOut.toInt, col(c)))
    val ddl =
      if (readSchemaManifests(spark, path).nonEmpty) logicalDdl(spark, path)
      else m0.schemaDdl
    // checkpoint-form commit with disjoint-set rebase: a concurrent
    // append's files ride into the new manifest un-reorganized (row-
    // correct; the next pass organizes them)
    val next = publishNonCommuting(spark, fs, path, v0, ddl,
      add = rewritten, remove = m0.entries.map(_._1), op = "rerange",
      full = true)
    // the re-range key ALWAYS ends up tracked (rerange's contract): with c
    // already tracked this is an O(new files) append; a manifest not yet
    // tracking c (or absent) rebuilds in full — same cost class as the
    // rewrite that just ran
    val statsDir = new org.apache.hadoop.fs.Path(path, "_graft_stats")
    val statsCols: Seq[String] =
      if (!fs.exists(statsDir)) Seq(c)
      else (spark.read.json(statsDir.toString).schema.fieldNames.toSeq
        .filter(_.startsWith("min_")).map(_.stripPrefix("min_")) :+ c).distinct
    if (fs.exists(statsDir)) appendStats(spark, path, statsCols)
    else writeStats(spark, path, statsCols)
    refreshBloomIndexes(spark, fs, path)
    (next, rewritten.size.toLong)
  }

  private def readVersionPointer(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Option[Long] = {
    val ptr = new org.apache.hadoop.fs.Path(path, "_graft_latest")
    if (!fs.exists(ptr)) None
    else
      // the pointer is a HINT, not the truth (manifests are authoritative
      // and every caller falls back to max(manifest)): a read that races
      // a concurrent swap (local-FS ChecksumFs renames data+crc as two
      // ops) degrades to the fallback instead of failing the caller
      try {
        val in = fs.open(ptr)
        val s = try scala.io.Source.fromInputStream(in).mkString.trim
                finally in.close()
        Some(s.toLong)
      } catch {
        case _: java.io.IOException | _: NumberFormatException => None
      }
  }

  /** Publish a NON-COMMUTING commit (one that removes files) with
    * DISJOINT-SET conflict detection — Delta's WriteSerializable rule
    * instead of refuse-on-any-race. The commit's add/remove sets were
    * computed against base `v0`; if another commit wins the version
    * number, the winner chain `v0+1..head` is inspected:
    *
    *   - every winner is a DELTA that removed NO file this commit removes
    *     and left the schema unchanged → the two commits touch disjoint
    *     file sets, so they COMMUTE at file granularity; REBASE: republish
    *     the same add/remove against the new head (data files already on
    *     disk are never rewritten). This is what lets maintenance
    *     (optimize/zorder/rerange) and takedown deletes land under a
    *     steady append stream instead of starving.
    *   - a winner removed one of OUR removed files (our rewrite is stale —
    *     rewriting it would resurrect rows the winner dropped), replaced
    *     the table wholesale (snapshot commit), or changed the schema →
    *     REFUSE loudly; the caller must recompute against the new state.
    *
    * Semantics note: rows APPENDED by a winner that would have matched a
    * rebased delete's predicate are NOT deleted — the delete applies to
    * the data it read. This is WEAKER than Delta's WriteSerializable,
    * which raises ConcurrentAppendException when a winner's added files
    * match a DELETE's read predicate; [[deleteWhere]]'s `strict` flag
    * restores that guarantee by re-checking winner-added files and
    * re-deleting. A reorg rebased over an append leaves the appended
    * files unorganized but carried — row-correct, organized on the next
    * maintenance pass.
    *
    * `full = true` publishes checkpoint-form manifests (zorder/rerange
    * replace ~every reference, so a delta would be checkpoint-sized with
    * none of the O(1)-resolution benefit); the rebase then resolves the
    * new head and applies the same set algebra.
    */
  private def publishNonCommuting(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String, v0: Long,
      schemaDdl: String, add: Seq[(String, Long)], remove: Seq[String],
      op: String, full: Boolean = false,
      dvAdd: Seq[DvEntry] = Nil, readSet: Set[String] = Set.empty,
      streamBatchId: Option[Long] = None): Long = {
    val ourRemove = remove.toSet
    var base = v0
    var attempts = 0
    while (true) {
      attempts += 1
      require(attempts <= MaxCommitRetries,
        s"$op: lost the manifest race under $path $MaxCommitRetries " +
          "times (livelock? raise MaxCommitRetries)")
      val next = base + 1
      try {
        if (full) {
          val resolved = readVersionManifest(spark, fs, path, base)
            .getOrElse(sys.error(s"version $base has no manifest under $path"))
          writeVersionManifest(spark, fs, path, next, schemaDdl,
            resolved.entries.filterNot(e => ourRemove(e._1)) ++ add,
            op = Some(op), dv = applyDvDelta(resolved.dvs, ourRemove, dvAdd),
            streamBatchId = streamBatchId)
        } else
          writeVersionDelta(spark, fs, path, next, schemaDdl,
            base = base, add = add, remove = remove, op = Some(op),
            dvAdd = dvAdd, streamBatchId = streamBatchId)
        writeVersionPointer(spark, fs, path, next)
        return next
      } catch {
        case _: IllegalArgumentException
            if fs.exists(versionManifestFile(path, next)) =>
          val head = manifestVersions(fs, path).last
          ((base + 1) to head).foreach { w =>
            val raw = readRawManifest(spark, fs, path, w).getOrElse(
              sys.error(s"version $w vanished under $path mid-rebase"))
            require(raw.base.isDefined,
              s"$op($path): version $next already published — concurrent " +
                s"SNAPSHOT commit $w replaced the table; recompute " +
                "against the new state")
            require(raw.schemaDdl == schemaDdl,
              s"$op($path): version $next already published — concurrent " +
                s"commit $w changed the table schema; recompute against " +
                "the new state")
            val overlap = raw.remove.toSet.intersect(ourRemove)
            require(overlap.isEmpty,
              s"$op($path): version $next already published — concurrent " +
                s"commit $w removed file(s) this commit also rewrites " +
                s"(${overlap.take(3).mkString(", ")}); recompute against " +
                "the current version")
            // deletion-vector disjointness, both directions. A winner that
            // REWROTE a file we tombstoned would resurrect our deleted
            // rows (positions don't survive a rewrite); a winner that
            // TOMBSTONED a file we are removing wrote positions into a
            // file our rewrite is about to retire — its deletes would
            // silently evaporate.
            val dvHit = raw.remove.toSet.intersect(readSet)
            require(dvHit.isEmpty,
              s"$op($path): version $next already published — concurrent " +
                s"commit $w rewrote file(s) this commit tombstones " +
                s"(${dvHit.take(3).mkString(", ")}); recompute against " +
                "the current version")
            val dvLoss = raw.dvAdd.flatMap(_.files).toSet.intersect(ourRemove)
            require(dvLoss.isEmpty,
              s"$op($path): version $next already published — concurrent " +
                s"commit $w added deletion vectors on file(s) this commit " +
                s"rewrites (${dvLoss.take(3).mkString(", ")}); recompute " +
                "against the current version")
          }
          base = head // all winners file-disjoint: rebase and retry
      }
    }
    sys.error("unreachable")
  }

  private def writeVersionPointer(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String, v: Long): Unit = {
    // MONOTONIC advance: with concurrent appends the loser republishes at
    // a higher number after the winner — a stale writer must never swing
    // the pointer backwards over a commit it never saw. (Check-then-swap
    // has a residual window; a lagging pointer is self-healing — readers
    // fall back to max(manifest) and the next commit re-advances it.)
    if (readVersionPointer(fs, path).exists(_ >= v)) return
    // tmp name is PER-WRITER unique: a shared tmp path under concurrent
    // commits lets writer B overwrite the tmp writer A is mid-renaming —
    // the crc/data tear the concurrent-append spec caught
    val tmp = new org.apache.hadoop.fs.Path(path,
      s"._graft_latest.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val ptr = new org.apache.hadoop.fs.Path(path, "_graft_latest")
    val out = fs.create(tmp, true)
    out.write(v.toString.getBytes("UTF-8"))
    out.close()
    // atomic replace: FileContext.rename(OVERWRITE) swaps the pointer in
    // one operation, so a concurrent reader never observes a missing
    // pointer (a delete-then-rename window would throw transiently —
    // readers also fall back to max(listVersions) as a belt-and-braces)
    org.apache.hadoop.fs.FileContext.getFileContext(
        ptr.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, ptr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  // ---------- version-manifest plumbing ----------
  //
  // Two manifest shapes, exactly Delta's log-vs-checkpoint split:
  //   FULL  {"version","schema","depth":0,"files":[{path,n_rows}...]}
  //   DELTA {"version","schema","depth","base","add":[...],"remove":[...]}
  // A delta records only what the commit CHANGED, so an O(batch) append
  // to an 800k-file table writes a few KB of metadata, not an ~80 MB
  // file-list rewrite. Readers resolve the chain delta→…→full; chains are
  // DEPTH-CAPPED (a commit that would exceed MaxChainDepth writes a full
  // manifest instead — the self-checkpointing that bounds resolution to
  // O(MaxChainDepth) metadata reads). vacuum materializes any retained
  // manifest whose chain passes through a dropped version before dropping
  // it, so resolution never dangles.

  /** One DELETION-VECTOR sidecar reference in a manifest: `dv` is the
    * tombstone parquet's table-relative path (rows `(file string, pos
    * long)` — data-file-relative-path + row position), `nDel` the
    * tombstone count WRITTEN AT COMMIT (audit metadata; coverage trimming
    * never recomputes it), and `files` the data files the tombstones
    * target. Reads apply the UNION of all live entries' tombstones, so a
    * second dvDelete never rewrites an earlier entry's file. An entry's
    * coverage shrinks as later commits remove/rewrite its target files
    * (the rewrite drops the tombstoned rows physically), and the entry
    * drops out of the manifest once nothing it covers is live.
    */
  private[sources] case class DvEntry(dv: String, nDel: Long,
      files: Seq[String])

  /** `colmap` — the COLUMN MAPPING (Delta's column-mapping analog): ordered
    * (logical name, physical name) pairs covering the version's whole
    * logical column set. `schemaDdl` always describes the PHYSICAL file
    * schema (what a parquet scan of the entries resolves by name), so
    * every internal scan path stays correct unchanged; the logical
    * projection is applied once at the read surface. Empty = identity
    * (no rename/drop ever committed) — the legacy form.
    */
  private case class VersionManifest(version: Long, schemaDdl: String,
      entries: Seq[(String, Long)], dvs: Seq[DvEntry] = Nil,
      colmap: Seq[(String, String)] = Nil)

  /** Raw on-disk form: full (files defined) or delta (base defined).
    * `ts` is the commit wall-clock (epoch millis), stamped at publish and
    * PRESERVED by vacuum's materialization rewrite; None only for
    * manifests written before timestamps existed.
    */
  private case class RawManifest(version: Long, schemaDdl: String,
      depth: Long, files: Option[Seq[(String, Long)]], base: Option[Long],
      add: Seq[(String, Long)], remove: Seq[String], ts: Option[Long],
      streamBatchId: Option[Long], op: Option[String],
      dv: Seq[DvEntry] = Nil, dvAdd: Seq[DvEntry] = Nil,
      colmap: Seq[(String, String)] = Nil)

  private val MaxChainDepth = 32L

  /** Bound on optimistic-concurrency retries in [[appendVersioned]] —
    * losing 20 straight manifest races means pathological contention, not
    * bad luck; fail loudly rather than spin.
    */
  private val MaxCommitRetries = 20

  /** Claim a fresh `v=N` data dir and write `df` into it; every commit's
    * data write goes through here. The dir NUMBER is a NAMESPACE, not the
    * commit number (a rebased commit may publish manifest v=7 over files
    * living in dir v=5 — manifests reference files by path, so nothing
    * requires the two to agree, and vacuum's orphan reclaim is
    * reference+grace-based). The claim is a create-no-overwrite marker
    * file, NOT the data write itself: DataFrameWriter's ErrorIfExists
    * check runs at job submit, so two simultaneous writers could both
    * pass it and interleave their task files in one dir — the marker's
    * exclusive create closes that window to a single metadata op (atomic
    * on HDFS/object stores; microseconds on local FS). A loser retries
    * with a fresh number; the frame is written exactly once, into a dir
    * only this writer owns.
    *
    * @return (claimed dir number, the written files' manifest entries)
    */
  private def writeClaimedDir(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String,
      df: DataFrame): (Long, Seq[(String, Long)]) = {
    var attempts = 0
    while (true) {
      attempts += 1
      require(attempts <= MaxCommitRetries,
        s"could not claim a data dir under $path after " +
          s"$MaxCommitRetries attempts")
      val d = nextVersion(fs, path)
      val dirPath = new org.apache.hadoop.fs.Path(path, s"v=$d")
      val claimed =
        try {
          fs.create(new org.apache.hadoop.fs.Path(dirPath, "._graft_claim"),
            false).close()
          true
        } catch { case _: java.io.IOException => false }
      if (claimed) {
        // Append, not ErrorIfExists: the dir exists now (it holds our
        // claim marker) and is exclusively ours
        prof("claimed:write")(
          df.write.mode(SaveMode.Append).parquet(dirPath.toString))
        return (d, prof("claimed:footers")(
          fileEntries(spark, fs, path, listDataFiles(fs, dirPath))))
      }
    }
    sys.error("unreachable")
  }

  private def versionsDir(path: String) =
    new org.apache.hadoop.fs.Path(path, "_graft_versions")

  private def versionManifestFile(path: String, v: Long) =
    new org.apache.hadoop.fs.Path(path, s"_graft_versions/v=$v.json")

  /** The table root as a scheme-less absolute path — the base every
    * manifest-relative file reference resolves against (manifests store
    * RELATIVE paths so a table survives relocation).
    */
  private def rootPath(fs: org.apache.hadoop.fs.FileSystem,
      hp: org.apache.hadoop.fs.Path): String =
    fs.makeQualified(hp).toUri.getPath

  /** Resolve a manifest-relative reference against the table root,
    * NORMALIZING `..` traversal (a shallow clone's external references
    * into its source): readers tolerate `root/../src/file`, but the
    * string-comparison sites (delete/merge matched-file sets, census
    * diffs) compare against Spark's NORMALIZED input_file_name output
    * and must see the canonical form. Plain entries resolve by
    * concatenation, exactly as before.
    */
  private def resolveRef(root: String, rel: String): String =
    if (rel.contains(".."))
      java.nio.file.Paths.get(root, rel).normalize().toString
    else root + "/" + rel

  /** An entry that points OUTSIDE the table root — a shallow clone's
    * reference into its source. Such files are never physically deleted
    * through THIS table (Delta's clone rule: vacuum reclaims only files
    * the table owns); dropping the reference from the manifests is the
    * whole cleanup.
    */
  private def isExternalRef(rel: String): Boolean =
    rel.startsWith("../") || rel.contains("/../")

  private def manifestVersions(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Seq[Long] =
    fs.listStatus(versionsDir(path)).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v=") && n.endsWith(".json"))
      .map(_.stripPrefix("v=").stripSuffix(".json").toLong).sorted

  private def dirVersions(fs: org.apache.hadoop.fs.FileSystem,
      hp: org.apache.hadoop.fs.Path): Seq[Long] =
    fs.listStatus(hp).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong).sorted

  /** Next unused version number: above every manifest AND every v= dir, so
    * a crash-orphaned dir (data written, manifest never published) is
    * skipped over, never collided with.
    */
  private def nextVersion(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Long = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val ms =
      if (fs.exists(versionsDir(path))) manifestVersions(fs, path) else Nil
    ((ms ++ dirVersions(fs, hp)) :+ 0L).max + 1
  }

  /** {relative path, footer row count} for a batch of just-written files —
    * per-file n_rows comes from parquet FOOTERS (metadata I/O, no scan).
    */
  private def fileEntries(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String,
      files: Seq[String]): Seq[(String, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = rootPath(fs, new org.apache.hadoop.fs.Path(path))
    files.map { abs =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(abs), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      val n = try r.getRecordCount finally r.close()
      (abs.stripPrefix(root + "/"), n)
    }
  }

  private def entriesJson(entries: Seq[(String, Long)]): String =
    entries.map { case (rel, n) =>
      s"""{"path":${jsonStr(rel)},"n_rows":$n}""" }.mkString("[", ",", "]")

  private def writeManifestFile(fs: org.apache.hadoop.fs.FileSystem,
      path: String, v: Long, body: String, replace: Boolean): Unit = {
    fs.mkdirs(versionsDir(path))
    // tmp name is PER-WRITER unique (same reason as the version pointer):
    // two writers racing to one version number with a SHARED tmp path let
    // writer B overwrite the tmp writer A is mid-renaming — a torn
    // data/crc pair that surfaces as a ChecksumException to READERS of
    // the version A published
    val tmp = new org.apache.hadoop.fs.Path(path,
      s"_graft_versions/.v=$v.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val dst = versionManifestFile(path, v)
    val out = fs.create(tmp, true)
    out.write(body.getBytes("UTF-8"))
    out.close()
    if (replace) {
      // materialization rewrite (vacuum): atomic swap over the existing file
      org.apache.hadoop.fs.FileContext.getFileContext(
          dst.toUri, fs.getConf)
        .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } else {
      // same concurrent-publish guard as the schema manifests: two writers
      // racing to one version number must fail loudly, not clobber
      def lost(): Nothing = {
        fs.delete(tmp, false)
        throw new IllegalArgumentException(
          s"version $v already published under $path (concurrent writer?)")
      }
      if (fs.exists(dst)) lost()
      if (!fs.rename(tmp, dst)) lost()
    }
  }

  /** Publish a FULL (checkpoint) manifest: the complete file list. `ts`
    * defaults to now; vacuum's materialization passes the ORIGINAL commit
    * time through so `asOf` resolution survives checkpointing.
    */
  private def dvJson(dvs: Seq[DvEntry]): String =
    dvs.map(d =>
      s"""{"path":${jsonStr(d.dv)},"n_del":${d.nDel},""" +
        s""""files":${d.files.map(jsonStr).mkString("[", ",", "]")}}""")
      .mkString("[", ",", "]")

  private def colmapJson(cm: Seq[(String, String)]): String =
    cm.map { case (l, p) =>
      s"""{"logical":${jsonStr(l)},"physical":${jsonStr(p)}}"""
    }.mkString("[", ",", "]")

  private def writeVersionManifest(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String, v: Long,
      schemaDdl: String, entries: Seq[(String, Long)],
      replace: Boolean = false, ts: Option[Long] = None,
      streamBatchId: Option[Long] = None,
      op: Option[String] = None, dv: Seq[DvEntry] = Nil,
      colmap: Seq[(String, String)] = Nil): Unit = {
    // a fresh commit stamps now; a materialization rewrite (replace)
    // carries the original ts through — or keeps having NONE for
    // pre-timestamp manifests (stamping those "now" would teleport an old
    // version to the present under asOf resolution)
    val tsField = (if (replace) ts
                   else ts.orElse(Some(System.currentTimeMillis())))
      .map(t => s""""ts":$t,""").getOrElse("")
    val bidField = streamBatchId
      .map(b => s""""streamBatchId":$b,""").getOrElse("")
    val opField = op.map(o => s""""op":${jsonStr(o)},""").getOrElse("")
    val dvField = if (dv.isEmpty) "" else s""""dv":${dvJson(dv)},"""
    val cmField =
      if (colmap.isEmpty) "" else s""""colmap":${colmapJson(colmap)},"""
    writeManifestFile(fs, path, v,
      s"""{"version":$v,$tsField$bidField$opField$dvField$cmField""" +
        s""""schema":${jsonStr(schemaDdl)},""" +
        s""""depth":0,"files":${entriesJson(entries)}}""",
      replace)
  }

  /** Publish an O(changed-files) DELTA manifest against `base` — or, when
    * the chain would exceed [[MaxChainDepth]], a full checkpoint built by
    * resolving base and applying the change (the caller passes `resolved`
    * lazily so the common case never materializes it).
    */
  private def writeVersionDelta(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String, v: Long,
      schemaDdl: String, base: Long, add: Seq[(String, Long)],
      remove: Seq[String], streamBatchId: Option[Long] = None,
      op: Option[String] = None, dvAdd: Seq[DvEntry] = Nil,
      colmap: Seq[(String, String)] = Nil): Unit = {
    val parentDepth = readRawManifest(spark, fs, path, base)
      .map(_.depth).getOrElse(
        sys.error(s"delta base version $base has no manifest under $path"))
    if (parentDepth + 1 > MaxChainDepth) {
      val resolved = readVersionManifest(spark, fs, path, base).get
      val rm = remove.toSet
      writeVersionManifest(spark, fs, path, v, schemaDdl,
        resolved.entries.filterNot(e => rm(e._1)) ++ add,
        streamBatchId = streamBatchId, op = op,
        dv = applyDvDelta(resolved.dvs, rm, dvAdd),
        // a checkpoint never inherits: materialize the effective mapping
        colmap = if (colmap.nonEmpty) colmap else resolved.colmap)
    } else {
      val removeJson = remove.map(jsonStr).mkString("[", ",", "]")
      val bidField = streamBatchId
        .map(b => s""""streamBatchId":$b,""").getOrElse("")
      val opField = op.map(o => s""""op":${jsonStr(o)},""").getOrElse("")
      val dvField = if (dvAdd.isEmpty) "" else s""""dvAdd":${dvJson(dvAdd)},"""
      val cmField =
        if (colmap.isEmpty) "" else s""""colmap":${colmapJson(colmap)},"""
      writeManifestFile(fs, path, v,
        s"""{"version":$v,"ts":${System.currentTimeMillis()},$bidField""" +
          s"""$opField$dvField$cmField"schema":${jsonStr(schemaDdl)},""" +
          s""""depth":${parentDepth + 1},"base":$base,""" +
          s""""add":${entriesJson(add)},"remove":$removeJson}""",
        replace = false)
    }
  }

  /** Fold one commit's dv change into a base's live dv set: removing a
    * data file trims it from every entry's coverage (its rewrite dropped
    * the tombstoned rows physically, or its remover's rewrite refused to
    * race us — see publishNonCommuting's dv checks), entries left
    * covering nothing drop out, and the commit's own dvAdd appends.
    */
  private def applyDvDelta(baseDvs: Seq[DvEntry], removed: Set[String],
      dvAdd: Seq[DvEntry]): Seq[DvEntry] =
    baseDvs.map(d => d.copy(files = d.files.filterNot(removed)))
      .filter(_.files.nonEmpty) ++ dvAdd

  private def readRawManifest(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String,
      v: Long): Option[RawManifest] = {
    val f = versionManifestFile(path, v)
    if (!fs.exists(f)) None
    else {
      // manifests are KB-sized single JSON objects: parse on the driver in
      // one stream read instead of launching a Spark job per manifest —
      // every commit reads its base and vacuum walks O(retained × chain)
      // manifests, so a per-read job would turn metadata housekeeping into
      // a job storm (jackson-databind ships with Spark core)
      val in = fs.open(f)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
      def opt(name: String) = Option(n.get(name)).filterNot(_.isNull)
      def pairs(name: String): Seq[(String, Long)] =
        opt(name).fold(Seq.empty[(String, Long)])(a =>
          (0 until a.size).map(i =>
            (a.get(i).get("path").asText, a.get(i).get("n_rows").asLong)))
      def dvEntries(name: String): Seq[DvEntry] =
        opt(name).fold(Seq.empty[DvEntry])(a =>
          (0 until a.size).map { i =>
            val e = a.get(i)
            val fl = e.get("files")
            DvEntry(e.get("path").asText, e.get("n_del").asLong,
              (0 until fl.size).map(fl.get(_).asText))
          })
      val colmap = opt("colmap").fold(Seq.empty[(String, String)])(a =>
        (0 until a.size).map(i =>
          (a.get(i).get("logical").asText, a.get(i).get("physical").asText)))
      Some(RawManifest(n.get("version").asLong, n.get("schema").asText,
        opt("depth").fold(0L)(_.asLong),
        opt("files").map(_ => pairs("files")),
        opt("base").map(_.asLong),
        pairs("add"),
        opt("remove").fold(Seq.empty[String])(a =>
          (0 until a.size).map(a.get(_).asText)),
        opt("ts").map(_.asLong),
        opt("streamBatchId").map(_.asLong),
        opt("op").map(_.asText),
        dv = dvEntries("dv"), dvAdd = dvEntries("dvAdd"),
        colmap = colmap))
    }
  }

  /** Resolve a version's COMPLETE manifest, walking the delta chain back
    * to its checkpoint. Bounded by [[MaxChainDepth]] metadata-sized reads.
    */
  private def readVersionManifest(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String,
      v: Long): Option[VersionManifest] =
    readRawManifest(spark, fs, path, v).map { raw =>
      raw.files match {
        case Some(entries) =>
          VersionManifest(raw.version, raw.schemaDdl, entries, raw.dv,
            raw.colmap)
        case None =>
          val base = readVersionManifest(spark, fs, path, raw.base.get)
            .getOrElse(sys.error(
              s"version ${raw.version} under $path resolves through " +
                s"missing base ${raw.base.get} - manifest chain broken"))
          val rm = raw.remove.toSet
          // a delta that carries no colmap INHERITS its base's: the mapping
          // covers the full column set whenever active, so "explicitly
          // empty" never occurs on deltas — only a full checkpoint
          // (materializeMapping) clears it. Inheritance means a delta
          // writer that forgot to thread the map cannot silently strip it.
          VersionManifest(raw.version, raw.schemaDdl,
            base.entries.filterNot(e => rm(e._1)) ++ raw.add,
            applyDvDelta(base.dvs, rm, raw.dvAdd),
            if (raw.colmap.nonEmpty) raw.colmap else base.colmap)
      }
    }

  /** Read a version's file set. Empty manifests reconstruct their schema
    * from the recorded DDL; evolved tables resolve through the schema
    * chain (returning the latest LOGICAL schema — time travel rewinds
    * DATA, the column mapping stays current).
    */
  private def readManifestFiles(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String,
      m: VersionManifest): DataFrame = {
    val root = rootPath(fs, new org.apache.hadoop.fs.Path(path))
    applyColMap(readFilesWithDv(spark, fs, path, m,
      m.entries.map(e => resolveRef(root, e._1))), m.colmap)
  }

  /** Project a physically-named scan to the version's LOGICAL column set —
    * the single point where a column mapping becomes visible. One
    * zero-cost alias projection (names only, Catalyst folds it into the
    * scan), applied per version so time travel across a rename returns
    * each version's own names.
    */
  private def applyColMap(df: DataFrame,
      colmap: Seq[(String, String)]): DataFrame =
    if (colmap.isEmpty) df
    else df.select(colmap.map { case (l, p) =>
      org.apache.spark.sql.functions.col(p).as(l) }: _*)

  /** The HEAD version's column mapping (empty when none / not versioned) —
    * the guard probe for operations that scan or rewrite physical files.
    */
  private def colMapAtHead(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      path: String): Seq[(String, String)] =
    if (!fs.exists(versionsDir(path))) Nil
    else manifestVersions(fs, path).lastOption.map { last =>
      val v = readVersionPointer(fs, path).getOrElse(last)
      readVersionManifest(spark, fs, path, v).map(_.colmap).getOrElse(Nil)
    }.getOrElse(Nil)

  /** Refusal for operations whose scans/rewrites/predicates would bypass
    * the logical-name projection (the [[requireNoDvs]] discipline):
    * running them against physical names would either fail confusingly or
    * silently expose/persist the wrong column names. The escape hatch is
    * [[materializeMapping]] — rewrite once under logical names, then every
    * operation works again.
    */
  private def requireNoColMap(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String,
      opName: String): Unit = {
    val cm = colMapAtHead(spark, fs, path)
    require(cm.isEmpty,
      s"$opName($path): table carries a column mapping (renamed/dropped " +
        "columns); this operation works on physical file columns and " +
        "would bypass the logical projection - materializeMapping first")
  }

  /** Rename/drop refuse while column-keyed maintenance artifacts exist:
    * a skipping-stats manifest, bloom indexes, or CHECK constraints are
    * all written against the pre-rename names, and appendVersioned
    * auto-refreshes stats/bloom after every commit — a silently
    * stale-keyed artifact (or a guard throw inside the append's publish
    * loop) is exactly the failure mode this forbids. Drop them, rename,
    * rebuild under the new names.
    */
  private def requireNoMaintenanceArtifacts(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String,
      opName: String): Unit = {
    require(!fs.exists(new org.apache.hadoop.fs.Path(path, "_graft_stats")),
      s"$opName($path): a data-skipping stats manifest exists and is " +
        "keyed by the current column names - delete _graft_stats first " +
        "and rebuild it (writeStats) after")
    require(!fs.exists(new org.apache.hadoop.fs.Path(path, "_graft_bloom")),
      s"$opName($path): bloom indexes exist and are keyed by the current " +
        "column names - drop _graft_bloom first and rebuild after")
    require(checkConstraints(spark, path).isEmpty,
      s"$opName($path): CHECK constraints reference the current column " +
        "names - drop them first and re-add against the new names")
    require(generatedColumns(spark, path).isEmpty,
      s"$opName($path): GENERATED column specs reference the current " +
        "column names - drop them first and re-declare after")
  }

  /** Read a subset of a manifest's data files MERGE-ON-READ: files no dv
    * entry covers scan clean; covered files scan with `_metadata`
    * row-position columns and anti-join the union of live tombstones.
    * The split keeps the DV cost confined to the files that actually
    * carry deletes — on a 100 TB table with a handful of takedown
    * tombstones, every other file's scan is byte-identical to the
    * DV-free plan. The tombstone side rides a broadcast while the
    * manifest's total tombstone count (metadata — no data read) stays
    * under ~4M positions; past that it falls back to a shuffle
    * anti-join on (file, pos).
    */
  private def readFilesWithDv(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String,
      m: VersionManifest, files: Seq[String]): DataFrame =
    if (m.dvs.isEmpty) readSomeFiles(spark, fs, path, files, m.schemaDdl)
    else readFilesWithDvTagged(spark, fs, path, m, files)
      .drop(DvSrcFileCol, DvPosCol)

  /** [[readFilesWithDv]] with the surviving rows tagged by their source
    * data file (table-relative path, [[DvSrcFileCol]]) and row position
    * ([[DvPosCol]]) — both derived from `_metadata` AT SCAN, so unlike
    * `input_file_name()` they stay correct through the anti-join and any
    * downstream join.
    */
  private def readFilesWithDvTagged(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String,
      m: VersionManifest, files: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    val root = rootPath(fs, new org.apache.hadoop.fs.Path(path))
    val covered: Set[String] =
      m.dvs.flatMap(_.files).map(f => resolveRef(root, f)).toSet
    val (dvd, clean) = files.partition(covered)
    def tagged(fl: Seq[String]) =
      if (fl.isEmpty)
        readSomeFiles(spark, fs, path, fl, m.schemaDdl)
          .withColumn(DvSrcFileCol, lit(null).cast("string"))
          .withColumn(DvPosCol, lit(null).cast("bigint"))
      else
        readSomeFiles(spark, fs, path, fl, m.schemaDdl)
          .withColumn(DvSrcFileCol,
            relDataPathCol(col("_metadata.file_path"), root))
          .withColumn(DvPosCol, col("_metadata.row_index"))
    if (dvd.isEmpty) return tagged(files)
    val tombRaw = spark.read
      .parquet(qualifyForRead(fs, m.dvs.map(d => resolveRef(root, d.dv))): _*)
      .select(col("file"), col("pos"))
    val tomb =
      if (m.dvs.map(_.nDel).sum <= DvBroadcastPositions) broadcast(tombRaw)
      else tombRaw
    val scanned = tagged(dvd)
    val alive = scanned.join(tomb,
        scanned(DvSrcFileCol) === tomb("file") &&
          scanned(DvPosCol) === tomb("pos"),
        "left_anti")
    if (clean.isEmpty) alive else tagged(clean).unionByName(alive)
  }

  private val DvSrcFileCol = "_graft_src_file"
  private val DvPosCol = "_graft_src_pos"

  // 1M (file, pos) rows ≈ 60 MB serialized — the comfortable broadcast
  // ceiling; a bigger live tombstone set (the signal the table is overdue
  // for purgeDeletes) falls back to a shuffle anti-join on the covered
  // files only
  private val DvBroadcastPositions = 1L << 20

  /** Normalize an absolute file-path column (`input_file_name` /
    * `_metadata.file_path` form: scheme-qualified, percent-encoded) to
    * the TABLE-RELATIVE identity tombstones are keyed by — the Column
    * twin of the driver-side `URI.getPath.stripPrefix(root)`, sharing
    * [[pruneCandidatesWithStats]]'s decode contract.
    */
  private def relDataPathCol(c: org.apache.spark.sql.Column,
      root: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{regexp_replace, url_decode}
    regexp_replace(
      url_decode(regexp_replace(
        regexp_replace(c, "^[a-zA-Z][a-zA-Z0-9+.-]*:(//[^/]*)?", ""),
        "\\+", "%2B")),
      "^" + java.util.regex.Pattern.quote(root + "/"), "")
  }

  /** Internal identity form of file paths is SCHEME-LESS (URI.getPath —
    * what input_file_name/stats manifests normalize to), but a path handed
    * to `spark.read` must carry its scheme/authority back: a scheme-less
    * path resolves against the DEFAULT filesystem, which is wrong whenever
    * the table lives elsewhere (s3a table under an hdfs defaultFS). The
    * table's own FileSystem re-qualifies; already-qualified paths pass
    * through unchanged.
    */
  private def qualifyForRead(fs: org.apache.hadoop.fs.FileSystem,
      files: Seq[String]): Seq[String] =
    files.toIndexedSeq.map(f =>
      fs.makeQualified(new org.apache.hadoop.fs.Path(f)).toString)

  private def readSomeFiles(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String,
      files: Seq[String], schemaDdl: String): DataFrame =
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))
    else if (readSchemaManifests(spark, path).nonEmpty)
      evolvedRead(spark, path, Some(files))
    else spark.read.parquet(qualifyForRead(fs, files): _*)

  /** Upgrade a pre-manifest versioned layout in place: every bare `v=N`
    * dir gets a manifest built from its own files' footers. No-op for
    * manifested or unversioned tables.
    */
  private def ensureVersionManifests(spark: SparkSession,
      path: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hp) || fs.exists(versionsDir(path))) return
    dirVersions(fs, hp).foreach { v =>
      val vd = new org.apache.hadoop.fs.Path(path, s"v=$v")
      val files = listDataFiles(fs, vd)
      val ddl = spark.read.parquet(vd.toString).schema.toDDL
      writeVersionManifest(spark, fs, path, v, ddl,
        fileEntries(spark, fs, path, files))
    }
  }

  /** Version a plain (or schema-evolving) table in place: the current data
    * files become version 1 by reference — a metadata-only commit, no data
    * is moved or rewritten.
    */
  private def bootstrapRootVersion(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String,
      streamBatchId: Option[Long] = None): Unit = {
    val hp = new org.apache.hadoop.fs.Path(path)
    // hive-partitioned layouts are refused: version manifests read files
    // EXPLICITLY (no basePath — see readFileSubset), so partition-dir
    // columns would silently vanish from every versioned read and from
    // the delete rewrite. Partitioned tables delete per leaf dir.
    require(!fs.listStatus(hp).exists(s => s.isDirectory &&
        s.getPath.getName.contains("=") && !s.getPath.getName.startsWith("_")),
      s"$path is hive-partitioned; version/delete each leaf partition dir " +
        "instead (partition values live in the PATH and would be lost by " +
        "a file-reference read)")
    val files = listDataFiles(fs, hp)
    require(files.nonEmpty, s"no versions and no data files under $path")
    val ddl =
      if (readSchemaManifests(spark, path).nonEmpty) logicalDdl(spark, path)
      else spark.read.parquet(path).schema.toDDL
    writeVersionManifest(spark, fs, path, 1L, ddl,
      fileEntries(spark, fs, path, files), streamBatchId = streamBatchId,
      op = Some("bootstrap"))
    writeVersionPointer(spark, fs, path, 1L)
  }

  /** The latest LOGICAL schema of an evolved table as DDL. */
  private def logicalDdl(spark: SparkSession, path: String): String =
    org.apache.spark.sql.types.StructType(
      logicalSchema(readSchemaManifests(spark, path)).map { case (n, t) =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.DataType.fromDDL(t))
      }).toDDL

  /** SCHEMA EVOLUTION for plain-parquet lake tables — the versioned-schema
    * half of what Delta/Iceberg column mapping does, on an explicit
    * manifest under `_graft_schema/`.
    *
    * Why not `mergeSchema`? Two reasons, both scale-fatal. (1) COST:
    * mergeSchema derives the union schema by reading EVERY file footer at
    * planning time — at 100 TB / ~128 MB files that is ~800k footer reads
    * before the first byte of data; the manifest is one metadata-sized
    * read. (2) SEMANTICS: a RENAME is invisible to footer merging — it
    * looks like one dropped + one added column and comes back as two
    * half-null columns; only a declared rename can fold the old physical
    * name into the new logical one.
    *
    * `writeEvolving` publishes schema version N+1 (the appended frame's
    * logical schema + its declared old→new renames relative to version N)
    * and THEN appends the data files. Manifest-first is the load-bearing
    * order: a crash between the two steps leaves a declared-but-empty
    * version — reads stay exactly correct — whereas data-first would leave
    * files no schema version describes. Each manifest is written via the
    * same tmp-write + atomic-rename protocol as the version pointer.
    *
    * `readEvolving` builds the UNIFIED PHYSICAL schema (every column name
    * any version ever wrote) from the manifests and hands it to the
    * parquet reader explicitly — per file, absent columns resolve by name
    * to null, so no footer sweep happens — then folds each recorded rename
    * with coalesce(new, cast(old)) and returns the LATEST version's
    * logical column set. Added columns read null for files written before
    * them; renamed columns carry old-file values under the new name.
    *
    * Scope: column ADDS, RENAMES, and lossless type WIDENING
    * (tinyint<smallint<int<bigint, float<double): the unified read
    * requests the WIDEST type any version declared and the parquet
    * vectorized reader up-casts older narrower eras natively — no file
    * rewrite, no footer sweep. Narrowing and cross-family changes are
    * refused at write time (they need per-file cast planning and can
    * corrupt), as are silent column drops; refusing is the honest
    * contract.
    */
  def writeEvolving(spark: SparkSession, df: DataFrame, path: String,
      renames: Map[String, String] = Map.empty,
      streamBatchId: Option[Long] = None): Long = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // deletion vectors and schema evolution are mutually exclusive: the
    // evolved read path resolves through the column-mapping projection,
    // which cannot also attach the scan-stage _metadata position columns
    // the tombstone anti-join needs — drifting a dv'd table would leave
    // its reads broken. Purge first; the refusal mirrors deleteWhereDv's.
    requireNoDvs(spark, fs, path, "writeEvolving")
    requireNoColMap(spark, fs, path, "writeEvolving")
    require(generatedColumns(spark, path).isEmpty,
      s"$path declares GENERATED columns; schema evolution would bypass " +
        "their derivation - drop them first")
    // the constraint contract is two-sided: addCheckConstraint refuses
    // evolving tables, and a table that gained constraints while plain
    // refuses to start evolving. The guards are check-then-act, so a
    // CONCURRENT pair could pass both — the post-publish cross-checks
    // (below, and in addCheckConstraint) resolve that race: each side
    // re-checks the other's artifact after publishing its own and the
    // detected loser rolls back, so the forbidden constrained-evolving
    // state never persists
    require(checkConstraints(spark, path).isEmpty,
      s"$path carries CHECK constraints; schema evolution would bypass " +
        "their enforcement - drop them first")
    val prior = readSchemaManifests(spark, path)
    val next = prior.lastOption.map(_.version + 1).getOrElse(1L)
    val newFields = df.schema.fields.map(f => f.name -> f.dataType.catalogString)
    if (prior.isEmpty) {
      require(renames.isEmpty, "first write cannot declare renames")
    } else {
      val prevLogical = logicalSchema(prior)
      renames.foreach { case (from, to) =>
        require(prevLogical.exists(_._1 == from),
          s"rename source '$from' not in schema v${prior.last.version}")
        require(newFields.exists(_._1 == to),
          s"rename target '$to' not in the appended frame")
        require(!newFields.exists(_._1 == from),
          s"rename source '$from' still present in the appended frame")
        // a rename target must be a NEW physical name: renaming onto a name
        // some earlier version already wrote would make the fold silently
        // merge two unrelated columns (live collision) or mix physical
        // parquet types under one entry (dead collision)
        require(!physicalSchema(prior).exists(_._1 == to),
          s"rename target '$to' was already written by an earlier version " +
            "and cannot be reused as a rename target")
      }
      // every physical name ever written stays RESERVED: a column silently
      // dropped (just omitted from a later frame) could later be re-added
      // with another type — the physical-union read schema keeps its old
      // entry, so pre-drop files' values would resurrect under the logical
      // column. Drops must be declared as what they are not supported —
      // refuse the omission loudly.
      prevLogical.map(_._1).filterNot(renames.contains).foreach { name =>
        require(newFields.exists(_._1 == name),
          s"column '$name' (schema v${prior.last.version}) is missing from " +
            "the appended frame; dropping columns is not supported - carry " +
            "it (null-filled if needed) or declare a rename")
      }
      // same-name columns may keep their type or WIDEN it along a lossless
      // chain (tinyint<smallint<int<bigint, float<double): the reader
      // hands the parquet scan the WIDEST recorded type and the vectorized
      // reader up-casts older-era files natively, so no value can be lost
      // or changed. Anything else — narrowing, cross-family, string/date —
      // is refused: it would need per-file cast planning and can corrupt.
      // (A renamed column may change type freely because the reader casts
      // the fold explicitly.)
      val priorTypes = physicalSchema(prior).toMap
      newFields.filterNot(f => renames.valuesIterator.contains(f._1)).foreach {
        case (name, tpe) => priorTypes.get(name).foreach(old =>
          require(old == tpe || widens(old, tpe),
            s"column '$name' changes type $old -> $tpe; only lossless " +
              "widening (tinyint<smallint<int<bigint, float<double) is " +
              "supported"))
      }
      // retirement is PERMANENT: a name ever used as a rename source may
      // not return — the physical union keeps its original entry and the
      // fold would silently swallow the new column's data into the rename
      // target (old files' nulls win nothing, new files' values vanish)
      val retired = (prior.flatMap(_.renames.map(_._1)) ++ renames.keys).toSet
      newFields.map(_._1).find(retired).foreach(name =>
        throw new IllegalArgumentException(
          s"column name '$name' was retired by an earlier rename and " +
            "cannot be reused"))
    }
    fs.mkdirs(new org.apache.hadoop.fs.Path(hp, "_graft_schema"))
    val fieldsJson = newFields.map { case (n, t) =>
      s"""{"name":${jsonStr(n)},"type":${jsonStr(t)}}""" }.mkString("[", ",", "]")
    val renamesJson = renames.toSeq.sortBy(_._1).map { case (f, t) =>
      s"""{"from":${jsonStr(f)},"to":${jsonStr(t)}}""" }.mkString("[", ",", "]")
    val tmp = new org.apache.hadoop.fs.Path(hp, s"_graft_schema/.v=$next.tmp")
    val dst = new org.apache.hadoop.fs.Path(hp, s"_graft_schema/v=$next.json")
    val out = fs.create(tmp, true)
    out.write(
      s"""{"version":$next,"fields":$fieldsJson,"renames":$renamesJson}"""
        .getBytes("UTF-8"))
    out.close()
    // Concurrent-publish guard: two writers racing to the same next
    // version must fail loudly, not silently clobber each other's schema.
    // On HDFS-like filesystems rename-to-existing fails by contract; on
    // the LOCAL filesystem it silently replaces (POSIX rename), so the
    // explicit exists-check below carries the guard there — a residual
    // check-then-rename window remains on local FS (single-writer is the
    // local contract; production object stores/HDFS give the atomic form).
    require(!fs.exists(dst),
      s"writeEvolving: schema version $next already published under $path " +
        "(concurrent writer?) - re-read schemaVersions and retry")
    require(fs.rename(tmp, dst),
      s"writeEvolving: schema version $next already published under $path " +
        "(concurrent writer?) - re-read schemaVersions and retry")
    // mirror of addCheckConstraint's post-publish cross-check: if this is
    // the FIRST schema version and a constraint landed concurrently (its
    // gate read ran before our manifest), the EVOLUTION side rolls back —
    // no data has been written yet, so deleting our own v=1 manifest is a
    // clean abort, and one of the two racing sides always yields
    if (next == 1L && checkConstraints(spark, path).nonEmpty) {
      fs.delete(dst, false)
      sys.error(s"$path gained CHECK constraints concurrently; schema " +
        "evolution rolled back - drop the constraints first")
    }
    // a deleteWhere may have versioned this table: the append then also
    // publishes a version manifest (prior files by reference + the new
    // files) so version-resolving readers see the appended rows
    val versioned = fs.exists(versionsDir(path))
    val before: Set[String] =
      if (versioned) listDataFiles(fs, hp).toSet else Set.empty
    df.write.mode(SaveMode.Append).parquet(path)
    if (versioned) {
      val v0 = manifestVersions(fs, path).last
      val freshFiles = listDataFiles(fs, hp).filterNot(before)
      val nextV = v0 + 1
      val ddl = org.apache.spark.sql.types.StructType(newFields.map {
        case (n, t) => org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.DataType.fromDDL(t))
      }).toDDL
      writeVersionDelta(spark, fs, path, nextV, ddl,
        base = v0, add = fileEntries(spark, fs, path, freshFiles),
        remove = Seq.empty, streamBatchId = streamBatchId,
        op = Some("evolve-append"))
      writeVersionPointer(spark, fs, path, nextV)
      // keep an existing skipping manifest live over the appended files
      // (appendVersioned's invariant — without this a DRIFTED append
      // leaves the manifest stale and every later readSkipping refuses
      // until a full writeStats): O(batch), tracked columns only — the
      // drift is additive, so old tracked columns exist in the new files
      val statsDir = new org.apache.hadoop.fs.Path(path, "_graft_stats")
      if (fs.exists(statsDir)) {
        val tracked = spark.read.json(statsDir.toString).schema.fieldNames
          .toSeq.filter(_.startsWith("min_")).map(_.stripPrefix("min_"))
        if (tracked.nonEmpty) appendStats(spark, path, tracked)
      }
      refreshBloomIndexes(spark, fs, path)
    }
    next
  }

  /** Declare an existing PLAIN table's schema as chain version 1 — the
    * bridge that lets [[appendVersioned]] accept a drifted batch on a
    * table that never evolved before: v1 is written from the version
    * manifest's DDL (no file reads), then the drifted batch publishes v2
    * through [[writeEvolving]]'s normal validation.
    */
  private def bootstrapSchemaChain(fs: org.apache.hadoop.fs.FileSystem,
      hp: org.apache.hadoop.fs.Path, fields: Seq[(String, String)]): Unit = {
    fs.mkdirs(new org.apache.hadoop.fs.Path(hp, "_graft_schema"))
    val fieldsJson = fields.map { case (n, t) =>
      s"""{"name":${jsonStr(n)},"type":${jsonStr(t)}}""" }.mkString("[", ",", "]")
    val tmp = new org.apache.hadoop.fs.Path(hp, "_graft_schema/.v=1.tmp")
    val dst = new org.apache.hadoop.fs.Path(hp, "_graft_schema/v=1.json")
    val out = fs.create(tmp, true)
    out.write(
      s"""{"version":1,"fields":$fieldsJson,"renames":[]}""".getBytes("UTF-8"))
    out.close()
    require(!fs.exists(dst) && fs.rename(tmp, dst),
      s"schema chain already bootstrapped under $hp (concurrent writer?)")
  }

  def readEvolving(spark: SparkSession, path: String): DataFrame = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a deleteWhere bootstraps version manifests onto an evolved table;
    // from then on the published version's file list is the table (a
    // recursive dir read would see retired pre-delete files)
    if (fs.exists(versionsDir(path))) readVersioned(spark, path)
    else evolvedRead(spark, path, None)
  }

  /** [[readEvolving]] over the whole table or a pruned file subset.
    * No basePath: evolved tables are unpartitioned by contract (compact's
    * guard), and a basePath over a post-delete `v=N` rewrite dir would
    * hallucinate a `v` partition column.
    */
  private def evolvedRead(spark: SparkSession, path: String,
      files: Option[Seq[String]]): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col}
    val versions = readSchemaManifests(spark, path)
    require(versions.nonEmpty, s"no _graft_schema manifests under $path")
    val physical = org.apache.spark.sql.types.StructType(
      physicalSchema(versions).map { case (n, t) =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.DataType.fromDDL(t))
      })
    val tableFs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val reader = spark.read.schema(physical)
    var df = files.fold(reader.parquet(path))(fs =>
      reader.parquet(qualifyForRead(tableFs, fs): _*))
    // fold renames in version order so CHAINS (a->b in v2, b->c in v3)
    // carry v1 values through; the target type comes from the version
    // that DECLARED the rename — the latest schema may have renamed it on
    versions.foreach { v =>
      val vTypes = v.fields.toMap
      v.renames.foreach { case (from, to) =>
        df = df.withColumn(to,
          coalesce(col(to), col(from).cast(vTypes(to)))).drop(from)
      }
    }
    // cast to the LATEST declared type: a rename fold lands at its
    // declare-time type, which a later version may have widened (the
    // cast is a no-op wherever the physical read is already widest)
    df.select(logicalSchema(versions)
      .map { case (n, t) => col(n).cast(t).as(n) }: _*)
  }

  def schemaVersions(spark: SparkSession, path: String): Seq[Long] =
    readSchemaManifests(spark, path).map(_.version)

  private case class SchemaVersion(version: Long,
      fields: Seq[(String, String)], renames: Seq[(String, String)])

  /** All schema manifests, version-ascending. Metadata-sized driver read. */
  private def readSchemaManifests(spark: SparkSession,
      path: String): Seq[SchemaVersion] = {
    val dir = new org.apache.hadoop.fs.Path(path, "_graft_schema")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else {
      val files = fs.listStatus(dir).toSeq.map(_.getPath)
        .filter(p => p.getName.startsWith("v=") && p.getName.endsWith(".json"))
      if (files.isEmpty) Seq.empty
      else {
        import org.apache.spark.sql.types._
        val schema = StructType(Seq(
          StructField("version", LongType),
          StructField("fields", ArrayType(StructType(Seq(
            StructField("name", StringType), StructField("type", StringType))))),
          StructField("renames", ArrayType(StructType(Seq(
            StructField("from", StringType), StructField("to", StringType)))))))
        spark.read.schema(schema).json(files.map(_.toString): _*)
          .collect().toSeq
          .map { r =>
            def pairs(i: Int) = r.getSeq[org.apache.spark.sql.Row](i)
              .map(p => (p.getString(0), p.getString(1)))
            SchemaVersion(r.getLong(0), pairs(1), pairs(2))
          }
          .sortBy(_.version)
      }
    }
  }

  /** Lossless widening chains. The parquet vectorized reader up-casts a
    * narrower physical type to the requested wider one natively, which is
    * what lets the unified read use ONE schema over mixed-width eras.
    */
  private def widens(old: String, nw: String): Boolean = {
    val ints = Seq("tinyint", "smallint", "int", "bigint")
    val floats = Seq("float", "double")
    def wider(chain: Seq[String]) = {
      val (a, b) = (chain.indexOf(old), chain.indexOf(nw))
      a >= 0 && b > a
    }
    wider(ints) || wider(floats)
  }

  /** Every physical column any version wrote (first-appearance order), at
    * the WIDEST type any version declared for it — the read schema that
    * makes old files resolvable without footers, with older narrower eras
    * up-cast by the parquet reader itself.
    */
  private def physicalSchema(
      versions: Seq[SchemaVersion]): Seq[(String, String)] =
    versions.flatMap(_.fields).foldLeft(Vector.empty[(String, String)]) {
      case (acc, (n, t)) => acc.indexWhere(_._1 == n) match {
        case -1 => acc :+ (n -> t)
        case i => if (widens(acc(i)._2, t)) acc.updated(i, n -> t) else acc
      }
    }

  /** The LATEST version's column set in its declared order. */
  private def logicalSchema(
      versions: Seq[SchemaVersion]): Seq[(String, String)] =
    versions.last.fields

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

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
    // n_rows per file rides along: summing the manifest answers COUNT(*)
    // from metadata alone — the planning-time cardinality LSH/IVF
    // auto-sizing needs, without a corpus scan (r5 verdict item 8)
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    // an evolved table must resolve through its schema manifests (a plain
    // parquet read over mixed-schema files binds one footer's schema and
    // silently drops the other eras' columns); a VERSIONED table must
    // resolve through its version manifest (a recursive read would scan
    // retired files) — readVersioned composes both
    val hp0 = new org.apache.hadoop.fs.Path(path)
    val fs0 = hp0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    requireNoColMap(spark, fs0, path, "writeStats")
    val source =
      if (fs0.exists(versionsDir(path))) readVersioned(spark, path)
      else if (readSchemaManifests(spark, path).nonEmpty)
        readEvolving(spark, path)
      else spark.read.parquet(path)
    val stats = source
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(path, "._graft_stats.rebuild")
    fs.delete(staging, true)
    stats.coalesce(1).write.mode(SaveMode.Overwrite).json(staging.toString)
    val out = new org.apache.hadoop.fs.Path(path, "_graft_stats")
    publishManifest(fs, staging, out, path)
    spark.read.json(out.toString).count()
  }

  /** Publish a staged manifest dir via RENAME-ASIDE (compact's protocol,
    * not delete-then-rename): both complete manifests exist until the new
    * one is in place, so the no-manifest window shrinks to the instant
    * between the two renames, and a crash leaves the aside copy on disk.
    * The manifest is derived data — a reader hitting that instant gets
    * validatedManifest's clear require, and re-running writeStats fully
    * repairs; nothing is ever silently wrong, only loudly absent.
    */
  private def publishManifest(fs: org.apache.hadoop.fs.FileSystem,
      staging: org.apache.hadoop.fs.Path, out: org.apache.hadoop.fs.Path,
      path: String): Unit = {
    val aside = new org.apache.hadoop.fs.Path(path, "._graft_stats.old")
    fs.delete(aside, true)
    if (fs.exists(out)) require(fs.rename(out, aside),
      s"manifest publish: could not move $out aside")
    if (!fs.rename(staging, out)) {
      if (fs.exists(aside)) fs.rename(aside, out) // roll back
      sys.error(s"manifest publish: staging rename failed under $path " +
        "(previous manifest restored)")
    }
    fs.delete(aside, true)
    ()
  }

  /** INCREMENTAL stats append — the O(batch) complement of [[writeStats]]
    * for append-only tables: compute per-file min/max/n_rows for ONLY the
    * data files the manifest does not cover yet (scanning just those
    * files) and publish old + new manifest rows together. The manifest
    * stays a single metadata-sized JSON file, rewritten via a tmp dir +
    * rename so a reader never sees a partial manifest. This is what keeps
    * an admit loop batch-proportional: full `writeStats` re-scans the
    * corpus on every append, which at 100 TB turns each day's intake into
    * a full-table statistics job.
    *
    * @return number of newly covered files; when the existing manifest
    *         cannot be appended to (older layout, missing columns) the
    *         call falls back to a FULL [[writeStats]] rebuild and returns
    *         that total manifest row count instead
    */
  def appendStats(spark: SparkSession, path: String,
      statsCols: Seq[String]): Long = {
    import org.apache.spark.sql.functions._
    require(statsCols.nonEmpty, "appendStats needs at least one column")
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    requireNoColMap(spark, fs, path, "appendStats")
    val manifestDir = new org.apache.hadoop.fs.Path(path, "_graft_stats")
    if (!fs.exists(manifestDir)) return writeStats(spark, path, statsCols)
    val manifest = spark.read.json(manifestDir.toString)
    // append rows for EVERY column the manifest tracks, not just the ones
    // this caller asked about — selecting a subset would silently drop the
    // other columns' bounds from the merged manifest (a Z-ordered table
    // tracks several). A manifest from an older layout (missing n_rows,
    // or not covering the requested columns) rebuilds in full instead.
    val tracked = manifest.schema.fieldNames.toSeq
      .filter(_.startsWith("min_")).map(_.stripPrefix("min_"))
    val appendCols =
      if (statsCols.forall(tracked.contains) &&
          manifest.schema.fieldNames.contains("n_rows")) tracked
      else return writeStats(spark, path, statsCols)
    val covered = manifest.select("file").collect()
      .map(r => new java.net.URI(r.getString(0)).getPath).toSet
    val fresh = currentDataFiles(spark, fs, hp, path).filterNot(covered)
    if (fresh.isEmpty) return 0L
    val aggs = appendCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    // scan ONLY the fresh files — evolved tables resolve through the
    // schema manifests like every other subset read
    val freshStats = readFileSubset(spark, path, fresh)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
    // the manifest is a DIRECTORY of json files: an append ADDS one
    // metadata-sized file rather than rewriting the whole manifest — at
    // ~800k data files a merged rewrite is ~100 MB of json churn per
    // admit, where this is a few KB; readers (spark.read.json over the
    // dir) see the union either way, and each added file lands via one
    // atomic rename (a reader never sees partial rows)
    val staging = new org.apache.hadoop.fs.Path(path, "._graft_stats.append")
    fs.delete(staging, true)
    freshStats.coalesce(1).write.mode(SaveMode.Overwrite).json(staging.toString)
    val parts = fs.listStatus(staging).filter(f =>
      f.isFile && f.getPath.getName.startsWith("part-"))
    parts.zipWithIndex.foreach { case (p, i) =>
      val dst = new org.apache.hadoop.fs.Path(manifestDir,
        s"append-${System.nanoTime()}-$i.json")
      require(fs.rename(p.getPath, dst),
        s"appendStats: could not add manifest file under $path")
    }
    fs.delete(staging, true)
    // SELF-FOLDING: past the threshold the accreted append files fold
    // back to one (metadata-only, identical pruning) — the same
    // automatic-maintenance posture setAutoOptimize gives data files,
    // applied to the metadata itself. Amortized O(1): one fold per
    // ~threshold appends, and each fold reads only the manifest.
    if (manifestFileCount(fs, manifestDir) > ManifestFoldThreshold)
      compactStats(spark, path)
    fresh.size.toLong
  }

  /** Append-manifest files before a fold is triggered. 64 keeps the
    * per-read listing trivial while folding often enough that a fold
    * never reads more than ~64 KB-sized files.
    */
  private val ManifestFoldThreshold = 64

  private def manifestFileCount(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Int =
    fs.listStatus(dir).count(f => f.isFile &&
      !f.getPath.getName.startsWith(".") &&
      !f.getPath.getName.startsWith("_"))

  /** METADATA-ONLY stats-manifest compaction: fold the `append-*.json`
    * files [[appendStats]] accretes (one per admit — deliberately, to keep
    * each admit O(batch)) back into ONE manifest file. After 10k admits
    * every screen's `spark.read.json(_graft_stats)` pays a 10k-file
    * listing; this folds them reading only the manifest itself — never
    * data — and publishes via the same staged-write + rename-aside swap as
    * [[writeStats]], with bit-identical pruning decisions before and
    * after. ([[writeStats]] also yields a single file but at corpus-scan
    * cost; [[rerange]] folds as a side effect of its writeStats rebuild
    * but rewrites the data too. This is the pure-housekeeping form: run it
    * periodically the way Delta checkpoints its log.)
    *
    * @return (manifest files before, after) — (n, n) when already compact
    */
  def compactStats(spark: SparkSession, path: String): (Long, Long) = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifestDir = new org.apache.hadoop.fs.Path(path, "_graft_stats")
    require(fs.exists(manifestDir), s"no _graft_stats manifest under $path")
    def manifestFiles() = fs.listStatus(manifestDir).count(f =>
      f.isFile && !f.getPath.getName.startsWith(".") &&
        !f.getPath.getName.startsWith("_"))
    val nBefore = manifestFiles().toLong
    val manifest = spark.read.json(manifestDir.toString)
    // drop rows for files no longer ON DISK (vacuumed / compacted away):
    // current readers already ignore them, but without this the manifest
    // grows forever under a delete/merge-heavy table. Files merely
    // RETIRED (still on disk for time travel) keep their rows — harmless,
    // and a restored version could need them again. The filter runs
    // DISTRIBUTIVELY (broadcast semi-join against the on-disk file list):
    // at ~800k files a driver-side collect of the whole manifest is
    // ~100 MB of Row objects for a housekeeping call; only the final
    // coalesce(1) write stays single-task by design.
    val onDisk = listDataFiles(fs, hp)
    // manifest `file` values carry whatever scheme input_file_name gave
    // them; the on-disk list is scheme-less — strip "scheme:[//authority]"
    // to compare in the scheme-less identity form used everywhere else
    val normFile = org.apache.spark.sql.functions.regexp_replace(
      org.apache.spark.sql.functions.col("file"),
      "^[a-zA-Z][a-zA-Z0-9+.-]*:(//[^/]*)?", "")
    val onDiskDf = spark.createDataset(onDisk.toIndexedSeq)(
      org.apache.spark.sql.Encoders.STRING).toDF("_graft_on_disk")
    val kept = manifest.join(
      org.apache.spark.sql.functions.broadcast(onDiskDf),
      normFile === org.apache.spark.sql.functions.col("_graft_on_disk"),
      "leftsemi")
    val dead = manifest.count() - kept.count()
    if (nBefore <= 1 && dead == 0L) return (nBefore, nBefore)
    val staging = new org.apache.hadoop.fs.Path(path, "._graft_stats.rebuild")
    fs.delete(staging, true)
    kept.coalesce(1).write.mode(SaveMode.Overwrite).json(staging.toString)
    publishManifest(fs, staging, manifestDir, path)
    (nBefore, manifestFiles().toLong)
  }

  /** Table row count from the `_graft_stats` manifest, if one exists, is
    * fresh (covers every current data file), and carries `n_rows` — a
    * METADATA-sized read replacing a full-corpus COUNT(*) scan. None →
    * caller must count (see [[CorpusStats.rowCount]] for the memoizing
    * wrapper).
    */
  def rowCountFromManifest(spark: SparkSession, path: String): Option[Long] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifestDir = new org.apache.hadoop.fs.Path(path, "_graft_stats")
    if (!fs.exists(manifestDir)) None
    else {
      val manifest = spark.read.json(manifestDir.toString)
      if (!manifest.schema.fieldNames.contains("n_rows")) None // pre-n_rows manifest
      else {
        // manifest rows are metadata-sized (one per file): resolve on the
        // driver, summing only files that still exist (a manifest may
        // carry rows for since-compacted files; counting them would
        // overstate, and a file NOT covered at all means stale → None)
        val current = currentDataFiles(spark, fs, hp, path).toSet
        // toMap dedupes by file: concurrent appendStats can double-cover
        // a file and a duplicate row must not double-count it
        val rows = manifest.select("file", "n_rows").collect()
          .map(r => (new java.net.URI(r.getString(0)).getPath, r.getLong(1)))
          .toMap
        if (!current.subsetOf(rows.keySet)) None
        else Some(rows.collect { case (f, n) if current(f) => n }.sum)
      }
    }
  }

  /** Manifest predicate: file may contain rows with `c` in [lo, hi]. */
  def skipRange(c: String, lo: org.apache.spark.sql.Column,
      hi: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.col
    col(s"max_$c") >= lo && col(s"min_$c") <= hi
  }

  def readSkipping(spark: SparkSession, path: String,
      keep: org.apache.spark.sql.Column): DataFrame = {
    requireNoDvs(spark,
      new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      path, "readSkipping")
    val (manifest, current) = validatedManifest(spark, path)
    // intersect with the CURRENT file set: a versioned table's stats
    // manifest may still carry rows for files a delete retired — reading
    // one would resurrect deleted rows. DISTINCT because concurrent
    // appendStats calls can double-cover a file — a duplicate manifest
    // row must never become a double data read
    val files = manifest.filter(keep).select("file").distinct().collect()
      .map(r => new java.net.URI(r.getString(0)).getPath)
      .filter(current).distinct
    readFileSubset(spark, path, files.toIndexedSeq)
  }

  // ======================================================================
  // WRITE-AUDIT-PUBLISH (WAP) staging — the reference's expectations
  // posture (`EXPECT … ON VIOLATION`, README_DBT.md:236-239) married to
  // the versioned commit protocol: land a batch's data files WITHOUT
  // publishing them, audit the staged snapshot (arbitrary caller checks
  // over [[readStaged]] plus the table's own CHECK constraints at
  // publish), then either fold the batch into a real commit
  // ([[publishStaged]] — append-commuting, rebases over concurrent
  // winners like every AddFile-only commit) or [[abortStaged]] with zero
  // trace. No reader ever sees unaudited rows: staged files live in a
  // claimed `v=N` data dir no manifest references, exactly where a
  // mid-commit writer's files live — invisible by construction.
  //
  // 100 TB posture: staging costs the batch write + a KB marker; audit
  // reads ONLY the staged files (plus whatever table slices the caller's
  // checks join against); publish is an O(batch) delta manifest. The
  // staged marker makes the batch a LIVE ROOT for [[vacuum]]'s orphan
  // sweep — staged work survives housekeeping until published or
  // aborted, and an abort (not a grace-window guess) is what reclaims it.
  // ======================================================================

  private def stagedDir(path: String) =
    new org.apache.hadoop.fs.Path(path, "_graft_staged")

  private def stagedMarker(path: String, id: String) = {
    require(id.matches("stage[0-9]+"), s"malformed stage id '$id'")
    new org.apache.hadoop.fs.Path(path, s"_graft_staged/$id.json")
  }

  /** Stage an append: write the batch's files into a claimed data dir and
    * record them in a `_graft_staged/<id>.json` marker — no manifest, no
    * pointer move, no reader impact. Schema must match the table exactly
    * (staging is append staging; drift goes through [[writeEvolving]]).
    * Works on any table shape — plain/evolving tables are bootstrapped to
    * versioned first, same as [[deleteWhere]].
    *
    * @return the stage id to audit/publish/abort with
    */
  def stageAppend(spark: SparkSession, df: DataFrame, path: String): String = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    requireNoColMap(spark, fs, path, "stageAppend")
    fs.mkdirs(hp)
    ensureVersionManifests(spark, path)
    if (!fs.exists(versionsDir(path))) bootstrapRootVersion(spark, fs, path)
    val dfG = applyGeneratedTo(spark, path, df, "stageAppend")
    val curDdl = readRawManifest(spark, fs, path,
      manifestVersions(fs, path).last).get.schemaDdl
    val cur = org.apache.spark.sql.types.StructType.fromDDL(curDdl)
    require(dfG.schema.fields.map(f => (f.name, f.dataType.catalogString)).toSeq
        == cur.fields.map(f => (f.name, f.dataType.catalogString)).toSeq,
      s"stageAppend schema mismatch: table has $curDdl, " +
        s"frame has ${dfG.schema.toDDL}")
    val (d, entries) = writeClaimedDir(spark, fs, path, dfG)
    val id = s"stage$d"
    fs.mkdirs(stagedDir(path))
    // atomic marker publish (tmp + rename): a reader of _graft_staged
    // never sees a partial marker, and vacuum's live-root scan sees the
    // files as referenced from the instant the marker exists
    val tmp = new org.apache.hadoop.fs.Path(path, s"_graft_staged/.$id.tmp")
    val out = fs.create(tmp, true)
    out.write(
      (s"""{"stage":${jsonStr(id)},"ts":${System.currentTimeMillis()},""" +
        s""""schema":${jsonStr(curDdl)},"files":${entriesJson(entries)}}""")
        .getBytes("UTF-8"))
    out.close()
    require(fs.rename(tmp, stagedMarker(path, id)),
      s"stageAppend: could not publish staged marker for $id under $path")
    id
  }

  /** Stage ids currently awaiting audit/publish/abort, oldest first. */
  def listStaged(spark: SparkSession, path: String): Seq[String] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(stagedDir(path))) Seq.empty
    else fs.listStatus(stagedDir(path)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".json") &&
        !s.getPath.getName.startsWith("."))
      .map(_.getPath.getName.stripSuffix(".json")).sorted
  }

  /** Parse a staged marker: (schema ddl at staging time, file entries). */
  private def readStagedEntries(fs: org.apache.hadoop.fs.FileSystem,
      path: String, id: String): (String, Seq[(String, Long)]) = {
    val f = stagedMarker(path, id)
    require(fs.exists(f), s"no staged batch '$id' under $path")
    readMarkerFile(fs, f)
  }

  private def readMarkerFile(fs: org.apache.hadoop.fs.FileSystem,
      f: org.apache.hadoop.fs.Path): (String, Seq[(String, Long)]) = {
    val in = fs.open(f)
    val txt = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
    val entries = n.get("files").elements()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (entries.hasNext) {
      val e = entries.next()
      buf += ((e.get("path").asText, e.get("n_rows").asLong))
    }
    (n.get("schema").asText, buf.toSeq)
  }

  /** The staged batch's rows alone — the audit target for checks that
    * validate the INCOMING data (null rates, domains, dedup against the
    * published table).
    */
  def readStagedBatch(spark: SparkSession, path: String,
      id: String): DataFrame = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (_, entries) = readStagedEntries(fs, path, id)
    val root = rootPath(fs, hp)
    readFileSubset(spark, path, entries.map(e => resolveRef(root, e._1)))
  }

  /** The WOULD-BE table after publish: current snapshot ∪ staged batch —
    * the audit target for whole-table invariants (uniqueness, referential
    * integrity, aggregate drift).
    */
  def readStaged(spark: SparkSession, path: String, id: String): DataFrame =
    readVersioned(spark, path).unionByName(readStagedBatch(spark, path, id))

  private def claimedMarker(path: String, id: String) =
    new org.apache.hadoop.fs.Path(path, s"_graft_staged/.$id.publishing")

  /** Fold an audited staged batch into a real commit. Refuses loudly when
    * the table's schema changed since staging (the audit ran against a
    * stale shape — restage), or when the staged rows violate the table's
    * CHECK constraints (the built-in floor under any caller-side audit;
    * the stage SURVIVES a refusal for inspection/abort). Concurrent
    * commits rebase exactly like [[appendVersioned]] — the staged files
    * are already on disk and are never rewritten.
    *
    * DOUBLE-PUBLISH safety: the marker is CLAIMED by an atomic rename
    * before anything else, so exactly one of two concurrent publishes of
    * the same stage folds it — the loser gets the no-staged-batch
    * refusal instead of silently duplicating every staged row. A refusal
    * (schema drift, constraints) renames the claim back; a crash between
    * manifest publish and claim cleanup is recovered on the next call by
    * checking whether the head manifest already holds the claim's
    * entries (done → just clean up; not → publish from the claim).
    *
    * `streamBatchId` rides the commit like [[appendVersioned]]'s replay
    * gate: a replayed micro-batch whose id is already in a manifest
    * no-ops (aborting its redundant re-stage if one exists) — the
    * exactly-once contract for foreachBatch WAP pipelines.
    */
  def publishStaged(spark: SparkSession, path: String, id: String,
      streamBatchId: Option[Long] = None): Long = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def headVersion(): Long = readVersionPointer(fs, path).getOrElse(
      manifestVersions(fs, path).last)
    streamBatchId.foreach { bid =>
      if (streamBatchCommitted(spark, path, bid)) {
        // replayed micro-batch: its rows are already published — the
        // replay's redundant re-stage (if any) is aborted, not folded
        if (fs.exists(stagedMarker(path, id))) abortStaged(spark, path, id)
        return headVersion()
      }
    }
    val claimed = claimedMarker(path, id)
    // ChecksumFileSystem throws (rather than returning false) when the
    // source vanished — same meaning here: someone else claimed it
    val claimWon =
      try fs.rename(stagedMarker(path, id), claimed)
      catch { case _: java.io.FileNotFoundException => false }
    if (!claimWon) {
      // no live marker. A leftover claim whose entries all made it into
      // the head manifest is a COMPLETED publish that died before
      // cleanup — reconcile it. Any other claim is either an IN-FLIGHT
      // concurrent publish (auto-resuming would fold the files twice) or
      // a crash before the manifest landed; the two are indistinguishable
      // from here, so refuse loudly — [[recoverStagedPublish]] is the
      // operator's explicit I-know-the-publisher-is-dead lever.
      require(fs.exists(claimed),
        s"no staged batch '$id' under $path (already published/aborted, " +
          "or a concurrent publish claimed it)")
      val (_, entries) = readMarkerFile(fs, claimed)
      val headEntries = readVersionManifest(spark, fs, path, headVersion())
        .map(_.entries.map(_._1).toSet).getOrElse(Set.empty)
      if (entries.forall(e => headEntries(e._1))) {
        fs.delete(claimed, false)
        return headVersion()
      }
      throw new IllegalArgumentException(
        s"stage '$id' under $path is claimed by another publish — " +
          "in flight (wait for it), or crashed before its manifest " +
          "landed (recoverStagedPublish to hand the stage back)")
    }
    val (stagedDdl, entries) = readMarkerFile(fs, claimed)
    val root = rootPath(fs, hp)
    def unclaim(): Unit = { fs.rename(claimed, stagedMarker(path, id)); () }
    // Unclaim ONLY on failures provably BEFORE any manifest write (stale
    // schema, constraint refusal, head read) — those hand the stage back
    // for inspection/abort. Any exception escaping publishNonCommuting is
    // treated as POST-claim: the manifest may already have landed (e.g. a
    // version-pointer IO failure after the manifest wrote), and unclaiming
    // then lets a retried publishStaged read the new manifest as head and
    // fold the same entries TWICE. Even a genuinely-pre-publish loss (race
    // beyond retries) conservatively leaves the claim: the reconcile path
    // above detects a completed publish by head inclusion, and
    // [[recoverStagedPublish]] is the explicit hand-back lever.
    val (v0, curDdl) =
      try {
        val v0 = headVersion()
        val curDdl = readRawManifest(spark, fs, path,
          manifestVersions(fs, path).last).get.schemaDdl
        require(curDdl == stagedDdl,
          s"publishStaged($id): table schema changed since staging " +
            s"(staged against $stagedDdl, table now $curDdl) - the audit " +
            "validated a stale shape; abort and restage")
        val cs = checkConstraints(spark, path)
        if (cs.nonEmpty)
          enforceConstraintsOn(spark,
            readFileSubset(spark, path, entries.map(e => resolveRef(root, e._1))),
            cs, s"publishStaged($path, $id)")
        // generated columns declared AFTER staging get the same
        // publish-time re-validation as constraints: the staged files
        // were written before the derivation existed, so a violating
        // stage must unclaim (back to staged for abort), never fold in
        val gs = generatedColumns(spark, path)
        if (gs.nonEmpty)
          validateGeneratedOn(spark,
            readFileSubset(spark, path, entries.map(e => resolveRef(root, e._1))),
            gs, s"publishStaged($path, $id)")
        (v0, curDdl)
      } catch { case e: Throwable => unclaim(); throw e }
    val next = publishNonCommuting(spark, fs, path, v0, curDdl,
      add = entries, remove = Nil, op = "wap",
      streamBatchId = streamBatchId)
    // same keep-alive invariants as every other committing path
    val statsDir = new org.apache.hadoop.fs.Path(path, "_graft_stats")
    if (fs.exists(statsDir)) {
      val tracked = spark.read.json(statsDir.toString).schema.fieldNames
        .toSeq.filter(_.startsWith("min_")).map(_.stripPrefix("min_"))
      if (tracked.nonEmpty) appendStats(spark, path, tracked)
    }
    refreshBloomIndexes(spark, fs, path)
    fs.delete(claimed, false)
    next
  }

  /** Hand a claimed-but-unpublished stage back to the staged state — the
    * explicit recovery for a publisher that died AFTER claiming and
    * BEFORE its manifest landed. Refuses when the claim's entries are
    * already at the head (that publish completed — call
    * [[publishStaged]], which reconciles it) and when no claim exists.
    * Only invoke once the claiming publisher is known dead: unclaiming
    * under a live one re-opens the double-publish window this protocol
    * closes.
    */
  def recoverStagedPublish(spark: SparkSession, path: String,
      id: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val claimed = claimedMarker(path, id)
    require(fs.exists(claimed), s"no claimed publish of '$id' under $path")
    val (_, entries) = readMarkerFile(fs, claimed)
    val head = readVersionPointer(fs, path).getOrElse(
      manifestVersions(fs, path).last)
    val headEntries = readVersionManifest(spark, fs, path, head)
      .map(_.entries.map(_._1).toSet).getOrElse(Set.empty)
    require(!entries.forall(e => headEntries(e._1)),
      s"claimed publish of '$id' under $path COMPLETED (its files are " +
        "at the head) - publishStaged reconciles it; recovering would " +
        "fold the files twice")
    require(fs.rename(claimed, stagedMarker(path, id)),
      s"could not hand stage '$id' back under $path")
    ()
  }

  /** Discard a staged batch: delete its marker and its data files (and
    * the claimed dir when nothing else landed there). The published table
    * is untouched at every point of a stage/abort pair.
    */
  def abortStaged(spark: SparkSession, path: String, id: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (_, entries) = readStagedEntries(fs, path, id)
    val root = rootPath(fs, hp)
    entries.foreach(e =>
      fs.delete(new org.apache.hadoop.fs.Path(resolveRef(root, e._1)), false))
    // the claimed dir is exclusively this stage's namespace (the claim
    // marker won it); reclaim it outright
    fs.delete(new org.apache.hadoop.fs.Path(path,
      s"v=${id.stripPrefix("stage")}"), true)
    fs.delete(stagedMarker(path, id), false)
    ()
  }

  /** Metadata gate for [[graft.plans.MvRewriteRule]]: Some(current data
    * files of `sourcePath`, absolute scheme-less) iff `viewPath` is a
    * refresh-maintained view of `sourcePath` whose WATERMARK covers the
    * source head — i.e. answering from the view is provably equivalent to
    * aggregating the source right now. None on any doubt (missing view,
    * stale watermark, unversioned source): the rule then leaves the plan
    * alone, which is always correct.
    */
  def mvRewriteInfo(spark: SparkSession, sourcePath: String,
      viewPath: String): Option[Set[String]] =
    try {
      val shp = new org.apache.hadoop.fs.Path(sourcePath)
      val sfs = shp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!sfs.exists(versionsDir(sourcePath))) return None
      val head = readVersionPointer(sfs, sourcePath)
        .orElse(manifestVersions(sfs, sourcePath).lastOption)
        .getOrElse(return None)
      val vfs = new org.apache.hadoop.fs.Path(viewPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!vfs.exists(versionsDir(viewPath))) return None
      val viewHead = readVersionPointer(vfs, viewPath)
        .orElse(manifestVersions(vfs, viewPath).lastOption)
        .getOrElse(return None)
      val watermark = readRawManifest(spark, vfs, viewPath, viewHead)
        .flatMap(_.streamBatchId).getOrElse(return None)
      if (watermark < head) None
      else Some(currentDataFiles(spark, sfs, shp, sourcePath).toSet)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Relative paths every live staged marker references — vacuum's extra
    * live roots (staged work must survive housekeeping until published
    * or aborted; see [[stageAppend]]).
    */
  private def stagedReferencedFiles(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String): Set[String] = {
    if (!fs.exists(stagedDir(path))) return Set.empty
    // unclaimed markers AND in-flight/crashed publish claims
    // (.stageN.publishing): a claim's files must stay live until the
    // recovery path reconciles it
    fs.listStatus(stagedDir(path)).toSeq
      .filter(s => s.isFile && (s.getPath.getName.endsWith(".json") ||
        s.getPath.getName.endsWith(".publishing")))
      .flatMap(s => readMarkerFile(fs, s.getPath)._2.map(_._1)).toSet
  }

  /** The CURRENT data files of a table: the published version manifest's
    * file list when the table is versioned (files retired by deletes are
    * invisible even while vacuum-retained on disk), the recursive dir
    * listing otherwise.
    */
  private def currentDataFiles(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, hp: org.apache.hadoop.fs.Path,
      path: String): Seq[String] =
    if (!fs.exists(versionsDir(path))) listDataFiles(fs, hp)
    else {
      val v = readVersionPointer(fs, path).getOrElse {
        val vs = manifestVersions(fs, path)
        require(vs.nonEmpty, s"no versions under $path")
        vs.last
      }
      val m = readVersionManifest(spark, fs, path, v).getOrElse(
        sys.error(s"version $v has no manifest under $path"))
      val root = rootPath(fs, hp)
      m.entries.map(e => resolveRef(root, e._1))
    }

  /** Load the `_graft_stats` manifest with the stale-manifest guard: every
    * CURRENT data file must be covered, or a skip could silently drop rows
    * written after the manifest. The listing is RECURSIVE so
    * hive-partitioned layouts (data files one level down in day=… dirs)
    * are guarded too — a top-level-only list would come back empty there
    * and pass the subset check vacuously. Returns the manifest plus the
    * current-file set (callers must intersect their file picks with it —
    * covered-but-retired files would resurrect deleted rows).
    */
  private def validatedManifest(spark: SparkSession,
      path: String): (DataFrame, Set[String]) = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifestDir = new org.apache.hadoop.fs.Path(path, "_graft_stats")
    require(fs.exists(manifestDir), s"no _graft_stats manifest under $path")
    val manifest = spark.read.json(manifestDir.toString)
    val current = currentDataFiles(spark, fs, hp, path).toSet
    val listed = manifest.select("file").collect()
      .map(r => new java.net.URI(r.getString(0)).getPath).toSet
    require(current.subsetOf(listed),
      s"stale _graft_stats manifest under $path: " +
        s"${(current -- listed).size} data file(s) not covered - re-run writeStats")
    (manifest, current)
  }

  /** Narrow a commit's candidate file list with the `_graft_stats`
    * manifest, DISTRIBUTIVELY — the same broadcast-join shape as
    * [[compactStats]]: per-file keep verdicts are computed in the cluster
    * and only the candidate PATH strings come back to the driver, never
    * the manifest's stats rows (at ~800k files those are ~100 MB of Row
    * objects; the path list is the same metadata the version manifest
    * already put on the driver). Contracts preserved from the filter
    * form: a file with no stats row stays a candidate (superset rule),
    * and duplicate rows from concurrent appendStats keep the file if ANY
    * row keeps it.
    */
  private[graft] def pruneCandidatesWithStats(spark: SparkSession,
      statsDir: org.apache.hadoop.fs.Path,
      keep: org.apache.spark.sql.Column,
      abs0: Seq[String]): Seq[String] = {
    import org.apache.spark.sql.functions.{broadcast, col, lit, max, regexp_replace, url_decode, when}
    val stats = spark.read.json(statsDir.toString)
    // scheme-strip AND percent-decode, mirroring java.net.URI.getPath on
    // the candidate side: input_file_name URL-encodes spaces etc., and an
    // undecoded mismatch silently loses pruning for those files (kept via
    // the superset rule — correct, but the skip quietly degrades).
    // Literal '+' is protected first: url_decode is form-decoding ('+' →
    // space), but URI paths only escape via '%'.
    val normFile = url_decode(regexp_replace(
      regexp_replace(col("file"), "^[a-zA-Z][a-zA-Z0-9+.-]*:(//[^/]*)?", ""),
      "\\+", "%2B"))
    val verdicts = stats
      .select(normFile.as("_graft_file"),
        when(keep, lit(1)).otherwise(lit(0)).as("_graft_keep"))
      .groupBy("_graft_file").agg(max(col("_graft_keep")).as("_graft_keep"))
    val entries = spark.createDataset(abs0.toIndexedSeq)(
      org.apache.spark.sql.Encoders.STRING).toDF("_graft_path")
    entries
      .join(broadcast(verdicts),
        col("_graft_path") === col("_graft_file"), "left_outer")
      .filter(col("_graft_keep").isNull || col("_graft_keep") === 1)
      .select("_graft_path").collect().map(_.getString(0)).toIndexedSeq
  }

  /** basePath keeps partition-dir columns in the schema when reading a
    * file subset, so the skipped read matches the unskipped one exactly.
    * An EVOLVED table's subset resolves through the schema manifests
    * (plain parquet reads over mixed-schema files silently drop columns).
    *
    * HEAD-ONLY CONTRACT: `files` must come from the table's CURRENT
    * version — the column mapping applied below is the head's, and a
    * file list from another version could carry a different era's
    * physical schema under the head's logical names. All callers
    * (skipping, probe pruning, bloom lookup, publishStaged) derive their
    * lists from head manifests; a time-travel subset read would need the
    * version's own manifest colmap threaded through instead.
    */
  private def readFileSubset(spark: SparkSession, path: String,
      files: Seq[String]): DataFrame = {
    val evolved = readSchemaManifests(spark, path).nonEmpty
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versioned = fs.exists(versionsDir(path))
    if (files.isEmpty) {
      val full = if (versioned) readVersioned(spark, path)
                 else if (evolved) readEvolving(spark, path)
                 else spark.read.parquet(path)
      full.limit(0)
    } else if (evolved) evolvedRead(spark, path, Some(files))
    // versioned tables are unpartitioned (our writers): no basePath, which
    // over `v=N` rewrite dirs would hallucinate a `v` partition column;
    // a column-mapped table's subset reads project to logical names like
    // any full read (skipping/probe/lookup callers see the same schema)
    else if (versioned) applyColMap(
      spark.read.parquet(qualifyForRead(fs, files): _*),
      colMapAtHead(spark, fs, path))
    else spark.read.option("basePath", path)
      .parquet(qualifyForRead(fs, files): _*)
  }

  /** PROBE-SET data skipping — the equality-lookup complement of
    * [[skipRange]]. Given the distinct join-key values of a (bounded)
    * probe side, keep only files whose [min_c, max_c] stats can contain at
    * least one probe; every dropped file provably holds no matching row,
    * so an equi-join against the probed read is identical to one against
    * the full table.
    *
    * This is what makes a signature-index screen BATCH-proportional
    * instead of corpus-proportional when the table is range-laid-out on
    * `c` (see [[graft.operators.OperatorQueries]] `dedup_incremental`):
    * with files range-split on `c` at a fixed target size, one probe can
    * land in at most ~1 file, so I/O is bounded by min(|probes|, |files|)
    * × fileSize — flat in corpus size once files outnumber probes. For a
    * probe set that OUTNUMBERS the files (a full day's intake), pruning
    * degrades gracefully to the full narrow scan — never worse than
    * unpruned, never a shuffle.
    *
    * Driver cost is metadata-proportional: one manifest row per file, one
    * binary search per file over the sorted probes.
    *
    * Probes and stats bounds are compared as STRINGS: sound for string
    * keys (the md5 signature case this serves) and for any key whose
    * lexicographic order matches its value order (zero-padded fixed
    * width); raw numeric keys should go through [[skipRange]], which
    * compares in the column's own type.
    *
    * @return (files kept, total data files in the manifest)
    */
  def probeDataFiles(spark: SparkSession, path: String, c: String,
      probes: Seq[String]): (Seq[String], Int) = {
    import org.apache.spark.sql.functions.col
    val (manifest, current) = validatedManifest(spark, path)
    // string comparison on numeric bounds would order "100" < "20" and
    // prune WRONG files — refuse instead of silently losing rows
    require(manifest.schema(s"min_$c").dataType ==
        org.apache.spark.sql.types.StringType,
      s"probeDataFiles($c): stats bounds are numeric; lexicographic probe " +
        "pruning would be unsound - use skipRange, or zero-pad the key")
    // current-file intersection: covered-but-retired rows must not count
    // as prunable candidates, let alone be read
    val rows = manifest.select(col("file"),
      col(s"min_$c").cast("string"), col(s"max_$c").cast("string")).collect()
      .filter(r => current(new java.net.URI(r.getString(0)).getPath))
    val sorted = probes.distinct.sorted.toIndexedSeq
    // any probe in [lo, hi]? binary-search the first probe >= lo
    def anyIn(lo: String, hi: String): Boolean = {
      var l = 0; var r = sorted.length
      while (l < r) { val m = (l + r) >>> 1; if (sorted(m) < lo) l = m + 1 else r = m }
      l < sorted.length && sorted(l) <= hi
    }
    // all-null files have null stats bounds: no row there can equal a
    // probe. distinct on the kept PATHS: concurrent appendStats can
    // double-cover a file, and a duplicate pick must not double-read
    val kept = rows.toSeq
      .filter(r => !r.isNullAt(1) && anyIn(r.getString(1), r.getString(2)))
      .map(_.getString(0)).distinct
    (kept, rows.map(_.getString(0)).distinct.length)
  }

  def readProbed(spark: SparkSession, path: String, c: String,
      probes: Seq[String]): DataFrame = {
    requireNoDvs(spark,
      new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      path, "readProbed")
    readFileSubset(spark, path, probeDataFiles(spark, path, c, probes)._1)
  }

  // ======================================================================
  // BLOOM-FILTER SKIPPING INDEX — the high-cardinality complement of the
  // `_graft_stats` min/max manifest. Min/max bounds prune range and
  // low-cardinality equality predicates, but on a HASH-clustered or
  // unsorted layout every file's [min, max] spans the whole key domain
  // and an equality probe skips nothing. A per-file Bloom filter answers
  // "could this file hold key k?" regardless of layout: false positives
  // only (a kept file may be empty of matches — the residual filter
  // drops its rows), never false negatives (a dropped file provably
  // holds no probe), so a bloom-pruned read + equality filter is
  // IDENTICAL to the full scan + filter. This is Delta/Iceberg's bloom
  // column index re-expressed over the same sidecar-manifest mechanics
  // as _graft_stats: JSON rows (one per data file) under
  // `_graft_bloom/<col>/`, base64-serialized org.apache.spark.util
  // .sketch.BloomFilter built by Spark's own BloomFilterAggregate
  // (xxhash64-keyed — the exact sketch InjectRuntimeFilter uses).
  //
  // 100 TB posture: the index is built DISTRIBUTIVELY (one groupBy
  // input_file_name over the table — each task sketches its own file;
  // only the serialized filters cross the shuffle, ~bits/8 bytes per
  // file), maintained INCREMENTALLY (appendBloomIndex sketches only
  // manifest-uncovered files, keeping a daily admit O(batch)), and
  // probed DISTRIBUTIVELY (the manifest is read as a DataFrame; per-file
  // maybe-verdicts are computed in the cluster via BloomMightContainAny
  // and only kept PATH strings reach the driver — at ~800k files the
  // blooms are GBs, the paths are the same metadata the version manifest
  // already holds). Probe sets above `maxProbes` degrade gracefully to
  // the unpruned read — never worse than no index, never a failure.
  // ======================================================================

  private def bloomDir(path: String, c: String) = {
    // the manifest dir name IS the column name (auto-refresh recovers the
    // column from the dir listing) — so restrict to identifier chars
    // instead of lossily sanitizing
    require(c.matches("[A-Za-z0-9_]+"),
      s"bloom index column '$c' must be [A-Za-z0-9_]+")
    new org.apache.hadoop.fs.Path(path, s"_graft_bloom/$c")
  }

  /** Keep every existing bloom index live across a commit — the bloom
    * sibling of the appendStats keep-alive hooks: O(fresh files) per
    * indexed column, no-op without an index. Same invariant: commits
    * that add files are exactly the ones that would otherwise flip
    * [[bloomProbeFiles]]'s stale guard into refusing every read.
    */
  private def refreshBloomIndexes(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(path, "_graft_bloom")
    if (!fs.exists(root)) return
    fs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName)
      .foreach(c => appendBloomIndex(spark, path, c))
  }

  /** numBits for a target false-positive rate at `n` expected items. */
  private def bloomBits(n: Long, fpp: Double): Long = {
    val ln2 = math.log(2)
    math.max(64L, math.ceil(-n * math.log(fpp) / (ln2 * ln2)).toLong)
  }

  /** Per-file bloom sketch rows for `files` of table `path`: one row per
    * data file with the base64 filter over xxhash64(`c`). NULL keys are
    * not sketched (an equality probe never matches NULL), matching the
    * stats manifest's all-null convention.
    */
  private def bloomRows(spark: SparkSession, path: String, c: String,
      files: Seq[String], expectedPerFile: Long, fpp: Double): DataFrame = {
    import org.apache.spark.sql.functions.{base64, col, input_file_name, when, xxhash64}
    // null keys are skipped via a null hash (the aggregate ignores nulls),
    // NOT by pre-filtering rows: an all-null file must still emit its
    // manifest row (null bloom → provably probe-free → prunable), or the
    // stale-coverage guard would refuse the table forever
    readFileSubset(spark, path, files)
      .groupBy(input_file_name().as("file"))
      .agg(base64(graft.functions.TextFunctions.bloom_filter_agg(
        when(col(c).isNotNull, xxhash64(col(c))), expectedPerFile,
        bloomBits(expectedPerFile, fpp))).as("bloom_b64"))
  }

  /** FULL bloom-index (re)build for column `c`: sketch every current data
    * file and publish the manifest via the staged-write + rename-aside
    * swap (readers never see a partial manifest). Returns files covered.
    */
  def writeBloomIndex(spark: SparkSession, path: String, c: String,
      expectedPerFile: Long = 100000L, fpp: Double = 0.01): Long = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    requireNoColMap(spark, fs, path, "writeBloomIndex")
    val files = currentDataFiles(spark, fs, hp, path)
    val out = bloomDir(path, c)
    val staging = new org.apache.hadoop.fs.Path(path, s"._graft_bloom_build_${c}")
    fs.delete(staging, true)
    bloomRows(spark, path, c, files, expectedPerFile, fpp)
      .coalesce(1).write.mode(SaveMode.Overwrite).json(staging.toString)
    fs.mkdirs(out.getParent)
    publishManifest(fs, staging, out, path)
    files.size.toLong
  }

  /** INCREMENTAL bloom-index maintenance — the O(batch) complement of
    * [[writeBloomIndex]] for append-only tables: sketch ONLY the data
    * files the index does not cover yet and add their rows as one more
    * manifest json file (atomic rename; readers see the union). Falls
    * back to a full rebuild when no index exists.
    *
    * @return newly covered files
    */
  def appendBloomIndex(spark: SparkSession, path: String, c: String,
      expectedPerFile: Long = 100000L, fpp: Double = 0.01): Long = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    requireNoColMap(spark, fs, path, "appendBloomIndex")
    val out = bloomDir(path, c)
    if (!fs.exists(out)) return writeBloomIndex(spark, path, c, expectedPerFile, fpp)
    val covered = spark.read.json(out.toString).select("file").collect()
      .map(r => new java.net.URI(r.getString(0)).getPath).toSet
    val fresh = currentDataFiles(spark, fs, hp, path).filterNot(covered)
    if (fresh.isEmpty) return 0L
    val staging = new org.apache.hadoop.fs.Path(path, s"._graft_bloom_append_${c}")
    fs.delete(staging, true)
    bloomRows(spark, path, c, fresh, expectedPerFile, fpp)
      .coalesce(1).write.mode(SaveMode.Overwrite).json(staging.toString)
    val parts = fs.listStatus(staging).filter(f =>
      f.isFile && f.getPath.getName.startsWith("part-"))
    parts.zipWithIndex.foreach { case (p, i) =>
      val dst = new org.apache.hadoop.fs.Path(out,
        s"append-${System.nanoTime()}-$i.json")
      require(fs.rename(p.getPath, dst),
        s"appendBloomIndex: could not add manifest file under $path")
    }
    fs.delete(staging, true)
    // self-folding past the threshold — see appendStats' note
    if (manifestFileCount(fs, out) > ManifestFoldThreshold)
      compactBloomIndex(spark, path, c)
    fresh.size.toLong
  }

  /** METADATA-ONLY bloom-manifest compaction — [[compactStats]]' sibling
    * for `_graft_bloom/<c>`: fold the `append-*.json` files the
    * incremental maintenance accretes (one per commit, deliberately)
    * back into ONE manifest file, dropping rows for data files no longer
    * ON DISK (vacuumed away — probes already ignore them via the
    * current-file intersection, but under a delete/merge-heavy table the
    * manifest would otherwise grow forever). Retired-but-on-disk files
    * keep their rows (a restore could need them). Reads only the
    * manifest, never data; publishes via the staged-write + rename-aside
    * swap. @return (manifest files before, after)
    */
  def compactBloomIndex(spark: SparkSession, path: String,
      c: String): (Long, Long) = {
    import org.apache.spark.sql.functions.{broadcast, col, regexp_replace, url_decode}
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = bloomDir(path, c)
    require(fs.exists(out), s"no _graft_bloom/$c index under $path")
    def manifestFiles() = fs.listStatus(out).count(f =>
      f.isFile && !f.getPath.getName.startsWith(".") &&
        !f.getPath.getName.startsWith("_"))
    val nBefore = manifestFiles().toLong
    val manifest = spark.read.json(out.toString)
    val onDisk = listDataFiles(fs, hp)
    val normFile = url_decode(regexp_replace(col("file"),
      "^[a-zA-Z][a-zA-Z0-9+.-]*:(//[^/]*)?", ""))
    val onDiskDf = spark.createDataset(onDisk.toIndexedSeq)(
      org.apache.spark.sql.Encoders.STRING).toDF("_graft_on_disk")
    val kept = manifest.join(broadcast(onDiskDf),
      normFile === col("_graft_on_disk"), "leftsemi")
    val dead = manifest.count() - kept.count()
    if (nBefore <= 1 && dead == 0L) return (nBefore, nBefore)
    val staging = new org.apache.hadoop.fs.Path(path, s"._graft_bloom_fold_$c")
    fs.delete(staging, true)
    kept.coalesce(1).write.mode(SaveMode.Overwrite).json(staging.toString)
    publishManifest(fs, staging, out, path)
    (nBefore, manifestFiles().toLong)
  }

  /** Bloom-prune the current file set of `path` against a bounded probe
    * column (single-column DataFrame of the indexed key's type). Returns
    * (files kept, total current files); kept == total when the probe set
    * exceeds `maxProbes` (graceful degrade — pruning is an optimization,
    * a huge probe side just means the full narrow scan was the right
    * plan anyway). Stale index (a current file not covered) REFUSES
    * loudly rather than silently dropping its rows — same posture as
    * [[readSkipping]]'s validatedManifest; re-run [[appendBloomIndex]]
    * to repair.
    */
  def bloomProbeFiles(spark: SparkSession, path: String, c: String,
      probes: DataFrame, maxProbes: Int = 100000): (Seq[String], Int) = {
    import org.apache.spark.sql.functions.{col, unbase64, xxhash64}
    require(probes.columns.length == 1,
      s"bloomProbeFiles($c): probe side must be a single key column")
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = bloomDir(path, c)
    require(fs.exists(out), s"no _graft_bloom/$c index under $path")
    val manifest = spark.read.json(out.toString)
    val current = currentDataFiles(spark, fs, hp, path)
    val coveredSet = manifest.select("file").collect()
      .map(r => new java.net.URI(r.getString(0)).getPath).toSet
    require(current.forall(coveredSet),
      s"stale _graft_bloom/$c index under $path: " +
        s"${current.count(f => !coveredSet(f))} data file(s) not covered " +
        "- run appendBloomIndex")
    // xxhash64 the probes through Spark itself so the key hashing is
    // byte-identical to what bloom_filter_agg saw at build time, whatever
    // the key's type. Bounded collect: maxProbes+1 rows tell us whether
    // the cap was crossed without materializing an unbounded set.
    val hashes = probes.na.drop().distinct().limit(maxProbes + 1)
      .select(xxhash64(col(probes.columns.head)).as("h"))
      .collect().map(_.getLong(0))
    if (hashes.length > maxProbes) return (current, current.size)
    // degenerate manifest: every covered file was all-null (json drops
    // null fields, so the column may not even infer) → nothing can match
    if (!manifest.schema.fieldNames.contains("bloom_b64"))
      return (Seq.empty, current.size)
    // per-file maybe-verdicts in the cluster; only kept paths come back
    val kept = manifest
      .filter(graft.functions.TextFunctions.bloom_might_contain_any(
        unbase64(col("bloom_b64")), hashes))
      .select("file").distinct().collect()
      .map(r => new java.net.URI(r.getString(0)).getPath)
    val currentSet = current.toSet
    (kept.filter(currentSet).distinct.toIndexedSeq, current.size)
  }

  /** Bloom-pruned point-lookup read: only files whose bloom may contain a
    * probe are opened. The caller still applies the equality filter — the
    * pruned read is a SUPERSET of the matching rows (false positives keep
    * whole files), exactly like every other skipping read here.
    */
  def readBloomSkipping(spark: SparkSession, path: String, c: String,
      probes: DataFrame, maxProbes: Int = 100000): DataFrame = {
    requireNoDvs(spark,
      new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      path, "readBloomSkipping")
    readFileSubset(spark, path,
      bloomProbeFiles(spark, path, c, probes, maxProbes)._1)
  }

  /** Point-lookup file pruning composing EVERY skipping index the table
    * carries on `c`: `_graft_stats` min/max bounds (tight on range/
    * z-ordered layouts, blind on hash layouts) ∩ `_graft_bloom`
    * membership (tight on any layout, modulo false positives). Each
    * prune is a SUPERSET of the files holding matches, so the
    * intersection still is — the two indexes' strengths compose instead
    * of competing, and a table that carries both gets the min of either
    * read. A stats manifest with NUMERIC bounds (where lexicographic
    * probe comparison would be unsound — [[probeDataFiles]] refuses it)
    * silently contributes nothing; a probe set past `maxProbes` likewise
    * degrades that index to no-prune. Refuses only when NO index exists.
    *
    * @return (files kept, total current files)
    */
  def lookupFiles(spark: SparkSession, path: String, c: String,
      probes: DataFrame, maxProbes: Int = 100000): (Seq[String], Int) = {
    import org.apache.spark.sql.functions.col
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasBloom = fs.exists(bloomDir(path, c))
    val hasStats = fs.exists(new org.apache.hadoop.fs.Path(path, "_graft_stats"))
    require(hasBloom || hasStats,
      s"lookupFiles($c): no _graft_stats or _graft_bloom index under $path")
    var kept: Option[Set[String]] = None
    var total = -1
    if (hasBloom) {
      val (k, t) = bloomProbeFiles(spark, path, c, probes, maxProbes)
      kept = Some(k.toSet); total = t
    }
    if (hasStats) {
      val strs = probes.na.drop().distinct().limit(maxProbes + 1)
        .select(col(probes.columns.head).cast("string"))
        .collect().map(_.getString(0)).toIndexedSeq
      if (strs.length <= maxProbes) {
        try {
          val (k0, t) = probeDataFiles(spark, path, c, strs)
          // stats manifest rows carry input_file_name's scheme; the bloom
          // prune is already in scheme-less URI.getPath form — intersect
          // in the scheme-less identity used everywhere else
          val k = k0.map(f => new java.net.URI(f).getPath)
          total = t
          kept = Some(kept.fold(k.toSet)(_ intersect k.toSet))
        } catch {
          // numeric stats bounds: lexicographic probing unsound — this
          // index contributes nothing, the bloom (if any) already did
          case _: IllegalArgumentException if kept.nonEmpty => ()
        }
      }
    }
    val current = currentDataFiles(spark, fs, hp, path)
    val currentTotal = if (total >= 0) total else current.size
    // every present index declined (probe cap): graceful degrade to the
    // full narrow scan — same contract as bloomProbeFiles past its cap
    (kept.map(_.toSeq.sorted).getOrElse(current), currentTotal)
  }

  /** Point-lookup read over [[lookupFiles]]' composed prune — the caller
    * still applies the equality filter (superset contract, as with every
    * skipping read here).
    */
  def readLookup(spark: SparkSession, path: String, c: String,
      probes: DataFrame, maxProbes: Int = 100000): DataFrame = {
    requireNoDvs(spark,
      new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      path, "readLookup")
    readFileSubset(spark, path,
      lookupFiles(spark, path, c, probes, maxProbes)._1)
  }

  /** MULTI-COLUMN point-lookup pruning: every probe column prunes
    * independently through whatever per-column sidecar indexes it
    * carries (stats bounds ∩ bloom membership, via [[lookupFiles]]), and
    * the verdicts AND together — a file survives only if EVERY indexed
    * column says "maybe". Sound for conjunctive lookups because a row
    * matching (c1 = v1 AND c2 = v2) puts v1 in the file's c1 values and
    * v2 in its c2 values, so each per-column prune independently keeps
    * that file; the intersection of supersets is a superset. Tuple-set
    * probes (rows of (v1, v2) pairs) stay sound for the same reason —
    * each column's prune uses the column's VALUE SET, which can only keep
    * more files than the exact tuple semantics would. On a bloom-only
    * table, a probe column with no bloom sidecar is skipped (at least one
    * column must carry an index); on a STATS-bearing table every probe
    * column is treated as stats-indexed, and a column the manifest does
    * not track fails LOUDLY — a silently unindexed column must never
    * masquerade as a no-prune verdict. A column past the probe cap
    * degrades to no-prune, weakening but never breaking the
    * intersection. @return (files kept, total current files)
    */
  def lookupFilesMulti(spark: SparkSession, path: String,
      probes: DataFrame, maxProbes: Int = 100000): (Seq[String], Int) = {
    require(probes.columns.nonEmpty, "lookupFilesMulti: no probe columns")
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasStats = fs.exists(new org.apache.hadoop.fs.Path(path, "_graft_stats"))
    val indexed = probes.columns.filter(c =>
      fs.exists(bloomDir(path, c)) || hasStats)
    require(indexed.nonEmpty,
      s"lookupFilesMulti: no _graft_stats or _graft_bloom index on any of " +
        s"(${probes.columns.mkString(", ")}) under $path")
    var kept: Option[Set[String]] = None
    var total = -1
    indexed.foreach { c =>
      // a stats manifest not tracking c, or numeric-bounds refusal with
      // no bloom, surfaces as lookupFiles' own loud failure — a silently
      // unindexed column must not masquerade as a no-prune verdict
      val (k, t) = lookupFiles(spark, path, c, probes.select(c), maxProbes)
      total = t
      kept = Some(kept.fold(k.toSet)(_ intersect k.toSet))
    }
    (kept.get.toSeq.sorted, total)
  }

  /** Multi-column point-lookup read over [[lookupFilesMulti]]'s
    * intersected prune (superset contract; caller applies the filters).
    */
  def readLookupMulti(spark: SparkSession, path: String,
      probes: DataFrame, maxProbes: Int = 100000): DataFrame = {
    requireNoDvs(spark,
      new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      path, "readLookupMulti")
    readFileSubset(spark, path,
      lookupFilesMulti(spark, path, probes, maxProbes)._1)
  }

  /** All parquet data files under `dir`, recursing through partition dirs;
    * underscore/dot metadata names are skipped at every level.
    */
  private def listDataFiles(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Seq[String] =
    fs.listStatus(dir).toSeq
      .filterNot(s => s.getPath.getName.startsWith("_") ||
        s.getPath.getName.startsWith("."))
      .flatMap {
        case d if d.isDirectory => listDataFiles(fs, d.getPath)
        case f => Seq(f.getPath.toUri.getPath)
      }

  /** Z-ORDER clustered write — the multi-column locality lever behind
    * Delta's `OPTIMIZE ZORDER BY`, for plain parquet + the `_graft_stats`
    * manifest. Range layout gives ONE column tight per-file min/max
    * bounds; any second column's bounds span the whole domain and its
    * predicates skip nothing. Interleaving the bits of per-column rank
    * buckets (the Z-curve) makes file-contiguous z-ranges map to small
    * HYPER-RECTANGLES in value space, so every clustered column gets
    * usable bounds — with k columns each file's side shrinks ~2^(bits/k),
    * the classic trade against single-column layout.
    *
    * Mechanics, all scale-safe: one aggregate for per-column min/max
    * (bounded: 2k scalars), a NARROW map computing bucket =
    * floor((x−min)/(max−min+1) · 2^bits) per column and OR-ing shifted
    * bits together (pure codegen arithmetic — no window, no rank shuffle,
    * which is how this stays one exchange end-to-end), then ONE
    * repartitionByRange on the z-value and a stats manifest over the
    * clustered columns. Numeric/date columns only (dates cluster by
    * epoch day).
    */
  def zorderWrite(spark: SparkSession, df: DataFrame, path: String,
      clusterCols: Seq[String], nFiles: Int, bitsPerCol: Int = 8): Unit = {
    df.withColumn("_graft_z", zValueColumn(df, clusterCols, bitsPerCol))
      .repartitionByRange(nFiles, org.apache.spark.sql.functions.col("_graft_z"))
      .drop("_graft_z")
      .write.mode(SaveMode.Overwrite).parquet(path)
    writeStats(spark, path, clusterCols)
    ()
  }

  /** The interleaved-bits z-value for `df`'s rows over `clusterCols` —
    * shared by [[zorderWrite]] (plain tables) and [[zorderVersioned]]
    * (versioned tables). One bounded aggregate for per-column min/max,
    * then pure codegen arithmetic; no window, no rank shuffle.
    */
  private def zValueColumn(df: DataFrame, clusterCols: Seq[String],
      bitsPerCol: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(clusterCols.size >= 2, "zorder needs >= 2 columns (else use range)")
    require(clusterCols.size * bitsPerCol <= 62, "z-value must fit a long")
    def asNum(c: String) = df.schema(c).dataType match {
      case org.apache.spark.sql.types.DateType =>
        datediff(col(c), lit("1970-01-01").cast("date")).cast("double")
      case _: org.apache.spark.sql.types.NumericType => col(c).cast("double")
      case t => throw new IllegalArgumentException(
        s"zorder column $c: unsupported type $t")
    }
    val boundAggs = clusterCols.flatMap(c => Seq(min(asNum(c)), max(asNum(c))))
    val bounds = df.agg(boundAggs.head, boundAggs.tail: _*).head()
    val nBuckets = 1L << bitsPerCol
    val buckets = clusterCols.zipWithIndex.map { case (c, i) =>
      val (lo, hi) = (bounds.getDouble(2 * i), bounds.getDouble(2 * i + 1))
      // +1 on the span keeps the max value inside the top bucket
      val b = floor((asNum(c) - lit(lo)) / lit(hi - lo + 1) * lit(nBuckets))
        .cast("long")
      least(greatest(b, lit(0L)), lit(nBuckets - 1))
    }
    // bit interleave: output bit (j*k + i) takes bit j of column i
    (0 until bitsPerCol).flatMap { j =>
      buckets.zipWithIndex.map { case (b, i) =>
        shiftleft(shiftright(b, j).bitwiseAND(lit(1L)),
          j * clusterCols.size + i)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** OPTIMIZE ZORDER for VERSIONED tables — the multi-column sibling of
    * [[rerangeVersioned]] (which restores ONE column's locality): the
    * current file set is rewritten clustered along the z-curve over
    * `clusterCols` and published as a checkpoint version, so EVERY
    * clustered column regains usable per-file min/max bounds in
    * `_graft_stats`. Old versions keep their file lists (time travel
    * intact); [[vacuum]] later reclaims the superseded originals. Cost ∝
    * current table bytes — periodic housekeeping, exactly Delta's
    * `OPTIMIZE ZORDER BY` shape.
    *
    * @return (published version, data files after the rewrite)
    */
  def zorderVersioned(spark: SparkSession, path: String,
      clusterCols: Seq[String], targetFileRows: Long,
      bitsPerCol: Int = 8): (Long, Long) = {
    import org.apache.spark.sql.functions.col
    require(targetFileRows > 0, "targetFileRows must be positive")
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    requireNoColMap(spark, fs, path, "zorderVersioned")
    require(fs.exists(versionsDir(path)),
      s"$path carries no _graft_versions manifests; use zorderWrite for " +
        "plain tables")
    val v0 = readVersionPointer(fs, path).getOrElse {
      val vs = manifestVersions(fs, path)
      require(vs.nonEmpty, s"no versions under $path")
      vs.last
    }
    val m0 = readVersionManifest(spark, fs, path, v0).getOrElse(
      sys.error(s"version $v0 has no manifest under $path"))
    if (m0.entries.isEmpty) return (v0, 0L)
    val nRows = m0.entries.map(_._2).sum
    val nOut = math.max(1L, (nRows + targetFileRows - 1) / targetFileRows)
    val cur = readManifestFiles(spark, fs, path, m0)
    val (_, rewritten) = writeClaimedDir(spark, fs, path,
      cur.withColumn("_graft_z", zValueColumn(cur, clusterCols, bitsPerCol))
        .repartitionByRange(nOut.toInt, col("_graft_z"))
        .drop("_graft_z"))
    val ddl =
      if (readSchemaManifests(spark, path).nonEmpty) logicalDdl(spark, path)
      else m0.schemaDdl
    // checkpoint-form commit with disjoint-set rebase (see rerange note)
    val next = publishNonCommuting(spark, fs, path, v0, ddl,
      add = rewritten, remove = m0.entries.map(_._1), op = "zorder",
      full = true)
    // every clustered column ends up tracked, like rerange's contract
    val statsDir = new org.apache.hadoop.fs.Path(path, "_graft_stats")
    val statsCols: Seq[String] =
      if (!fs.exists(statsDir)) clusterCols
      else (spark.read.json(statsDir.toString).schema.fieldNames.toSeq
        .filter(_.startsWith("min_")).map(_.stripPrefix("min_")) ++
        clusterCols).distinct
    if (fs.exists(statsDir)) appendStats(spark, path, statsCols)
    else writeStats(spark, path, statsCols)
    refreshBloomIndexes(spark, fs, path)
    (next, rewritten.size.toLong)
  }

  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L << 20,
      dropStreamingMetadata: Boolean = false): (Long, Long) = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    requireNoColMap(spark, fs, path, "compact")
    recoverAside(fs, hp) // finish a publish a prior crash left half-done
    // a versioned table's v= dirs are not partitions and its files are
    // shared across version manifests: a dir rewrite would corrupt every
    // manifest. Maintenance on versioned tables = publish a new version.
    require(!fs.exists(versionsDir(path)),
      s"$path carries _graft_versions manifests; use optimizeVersioned " +
        "(small files fold into a NEW version, shared files stay " +
        "immutable) and vacuum old versions instead of an in-place rewrite")
    val meta = new org.apache.hadoop.fs.Path(path, "_spark_metadata")
    if (fs.exists(meta)) {
      require(dropStreamingMetadata,
        s"$path carries a _spark_metadata streaming-sink log; compacting " +
          "under it would hide files from log-trusting readers. Stop the " +
          "sink and pass dropStreamingMetadata = true to freeze the dir " +
          "into a plain parquet table first.")
      fs.delete(meta, true)
    }
    // the rewrite drops the _graft_stats manifest (it describes the OLD
    // files); remember its columns so a fresh one is published after
    val statsDir = new org.apache.hadoop.fs.Path(hp, "_graft_stats")
    val statsCols: Seq[String] =
      if (!fs.exists(statsDir)) Seq.empty
      else spark.read.json(statsDir.toString).schema.fieldNames.toSeq
        .filter(_.startsWith("min_")).map(_.stripPrefix("min_"))
    // an EVOLVED table's files carry DIFFERENT physical schemas: the
    // rewrite must read through the manifests (a plain parquet read binds
    // one footer's schema and silently drops other eras' columns) and the
    // manifest chain must ride into the rewritten table — it stays valid
    // over the uniform files (retired physical names read as all-null, so
    // the rename folds are no-ops and the logical schema is unchanged)
    val evolved = readSchemaManifests(spark, path).nonEmpty
    val children = fs.listStatus(hp)
    val leafDirs = children.filter(s => s.isDirectory &&
      s.getPath.getName.contains("=") && !s.getPath.getName.startsWith("_"))
    require(!evolved || leafDirs.isEmpty,
      s"$path mixes hive partition dirs with _graft_schema evolution; " +
        "evolved tables are unpartitioned (writeEvolving)")
    val result = if (leafDirs.nonEmpty) {
      // hive-partitioned: recurse per partition dir (partition columns
      // live in the PATH, so each leaf compacts independently)
      if (statsCols.nonEmpty) fs.delete(statsDir, true)
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
        // staging/aside live as DOT-PREFIXED siblings: Spark's file index
        // ignores them, so a concurrent scan of the parent table can never
        // discover a half-written "day=X.compacting" as a partition
        val staging = stagingPath(hp)
        val source = if (evolved) readEvolving(spark, path)
                     else spark.read.parquet(path)
        source
          .coalesce(nOut.toInt)
          .write.mode(SaveMode.Overwrite).parquet(staging.toString)
        // the schema-manifest chain publishes WITH the rewrite (one swap,
        // no window where the table exists without its manifests); the
        // rewritten files carry the latest LOGICAL schema, under which
        // the old chain still reads correctly (see note above)
        // a failed/partial copy must abort BEFORE the rename-aside publish:
        // publishing without the chain leaves a table readEvolving refuses
        // (or plain reads silently bind one era's footer schema)
        if (evolved) require(org.apache.hadoop.fs.FileUtil.copy(fs,
          new org.apache.hadoop.fs.Path(hp, "_graft_schema"), fs,
          new org.apache.hadoop.fs.Path(staging, "_graft_schema"),
          false, spark.sparkContext.hadoopConfiguration),
          s"compact: could not stage _graft_schema for $path (table unchanged)")
        // publish via RENAME-ASIDE, not delete-then-rename: both complete
        // copies exist until the new one is in place, so a crash at any
        // step leaves a complete dir on disk (recoverAside above renames
        // a stranded .old back in). The old-dir-missing window shrinks to
        // the instant between the two renames and is never data loss.
        val aside = asidePath(hp)
        fs.delete(aside, true)
        require(fs.rename(hp, aside),
          s"compaction: could not move $path aside (table unchanged)")
        if (!fs.rename(staging, hp)) {
          fs.rename(aside, hp) // roll back: old layout returns intact
          sys.error(s"compaction: staging rename failed for $path " +
            s"(original layout restored; rewrite left at $staging)")
        }
        fs.delete(aside, true)
        val nAfter = fs.listStatus(hp).count(s => s.isFile &&
          !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
        (nBefore, nAfter.toLong)
      }
    }
    if (statsCols.nonEmpty) writeStats(spark, path, statsCols)
    result
  }

  /** RE-RANGE maintenance — the OPTIMIZE analog for range-laid tables
    * (single-column sibling of [[zorderWrite]], publish protocol of
    * [[compact]]). Appends land as files spanning the whole key range, so
    * probe/range pruning degrades as a table accretes (each appended file
    * overlaps every probe); re-ranging rewrites the table ordered by `c`
    * at a fixed rows-per-file target and republishes the stats manifest,
    * restoring tight per-file bounds. Reads stay correct throughout —
    * pruning quality, not correctness, is what decays — so this can run
    * as periodic housekeeping exactly like Delta's OPTIMIZE. One range
    * exchange; publish via the same crash-safe rename-aside as compact.
    */
  def rerange(spark: SparkSession, path: String, c: String,
      targetFileRows: Long): (Long, Long) = {
    import org.apache.spark.sql.functions.col
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverAside(fs, hp)
    require(!fs.exists(versionsDir(path)),
      s"$path carries _graft_versions manifests; re-range by publishing a " +
        "rewritten version (writeVersioned, or optimizeVersioned for " +
        "small-file folding) instead of rewriting shared files in place")
    // same refusals as compact: a streaming-sink log would be wiped by the
    // swap (its readers trust the log, not the listing), and a rewrite of
    // a hive-partitioned layout would FLATTEN it (partition values live in
    // the path; rerange per leaf dir instead)
    require(!fs.exists(new org.apache.hadoop.fs.Path(path, "_spark_metadata")),
      s"$path carries a _spark_metadata streaming-sink log; stop the sink " +
        "and freeze it via compact(dropStreamingMetadata = true) first")
    require(!fs.listStatus(hp).exists(s => s.isDirectory &&
        s.getPath.getName.contains("=") && !s.getPath.getName.startsWith("_")),
      s"$path is hive-partitioned; rerange each leaf partition dir instead " +
        "(a whole-table rewrite would flatten the partition layout)")
    // evolved tables re-range through the manifests, exactly like compact:
    // the rewrite lands uniform latest-logical-schema files and the chain
    // rides into staging so one rename publishes data + manifests together
    val evolved = readSchemaManifests(spark, path).nonEmpty
    def source = if (evolved) readEvolving(spark, path)
                 else spark.read.parquet(path)
    val statsDir = new org.apache.hadoop.fs.Path(hp, "_graft_stats")
    // the re-range key ALWAYS ends up tracked: re-ranging exists to restore
    // probe pruning on `c`, so a pre-existing manifest that happens not to
    // track c must gain its bounds, not silently keep lacking them
    val statsCols: Seq[String] =
      if (!fs.exists(statsDir)) Seq(c)
      else (spark.read.json(statsDir.toString).schema.fieldNames.toSeq
        .filter(_.startsWith("min_")).map(_.stripPrefix("min_")) :+ c).distinct
    val nBefore = listDataFiles(fs, hp).size.toLong
    val nOut = math.max(1L,
      (source.count() + targetFileRows - 1) / targetFileRows)
    val staging = stagingPath(hp)
    source
      .repartitionByRange(nOut.toInt, col(c))
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)
    if (evolved) require(org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(hp, "_graft_schema"), fs,
      new org.apache.hadoop.fs.Path(staging, "_graft_schema"),
      false, spark.sparkContext.hadoopConfiguration),
      s"rerange: could not stage _graft_schema for $path (table unchanged)")
    val aside = asidePath(hp)
    fs.delete(aside, true)
    require(fs.rename(hp, aside), s"rerange: could not move $path aside")
    if (!fs.rename(staging, hp)) {
      fs.rename(aside, hp)
      sys.error(s"rerange: staging rename failed for $path (restored)")
    }
    fs.delete(aside, true)
    writeStats(spark, path, statsCols)
    (nBefore, listDataFiles(fs, hp).size.toLong)
  }

  /** If a crash stranded the table at `<path>.old` (between compact's two
    * renames), restore it; a stale staging dir is cleaned opportunistically.
    */
  private def stagingPath(hp: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(hp.getParent, s".${hp.getName}.compacting")

  private def asidePath(hp: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(hp.getParent, s".${hp.getName}.old")

  private def recoverAside(fs: org.apache.hadoop.fs.FileSystem,
      hp: org.apache.hadoop.fs.Path): Unit = {
    val aside = asidePath(hp)
    if (!fs.exists(hp) && fs.exists(aside)) {
      fs.rename(aside, hp)
      fs.delete(stagingPath(hp), true)
    }
  }
}
