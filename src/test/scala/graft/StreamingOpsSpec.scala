package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.stream.StreamAggs

class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("session windows close at the gap and match the batch sessionization") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val streamDf = mem.toDF().toDF("ts", "user_id", "value")
    val q = StreamAggs.sessionize(streamDf)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append()).start()

    // user 1: two events 10 min apart (one session), then one 2h later
    // (new session); user 2: single event
    mem.addData(
      (ts("2024-01-01 10:00:00"), 1L, 1.0),
      (ts("2024-01-01 10:10:00"), 1L, 2.0),
      (ts("2024-01-01 12:30:00"), 1L, 4.0),
      (ts("2024-01-01 10:00:00"), 2L, 8.0))
    q.processAllAvailable()
    // push the watermark past every session end + gap
    mem.addData((ts("2024-01-02 00:00:00"), 9L, 0.0))
    q.processAllAvailable()

    val got = spark.table("sessions_out")
      .filter(col("user_id") < 9)
      .select("user_id", "n_events", "session_cents")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 300L), (1L, 1L, 400L), (2L, 1L, 800L)))

    // batch twin: same frame through the same function
    val batch = StreamAggs.sessionize(
      Seq((ts("2024-01-01 10:00:00"), 1L, 1.0),
        (ts("2024-01-01 10:10:00"), 1L, 2.0),
        (ts("2024-01-01 12:30:00"), 1L, 4.0),
        (ts("2024-01-01 10:00:00"), 2L, 8.0))
        .toDF("ts", "user_id", "value"))
      .select("user_id", "n_events", "session_cents")
      .as[(Long, Long, Long)].collect().toSet
    assert(batch == got)
    q.stop()
  }

  test("flatMapGroupsWithState sessionizer matches session_window output") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val q = StreamAggs.sessionizeExplicit(mem.toDF().toDF("ts", "user_id", "value"))
      .toDF().writeStream.format("memory").queryName("explicit_sessions")
      .outputMode(OutputMode.Append()).start()

    // same fixture as the session_window test: user 1 gets two sessions
    // (10:00+10:10, then 12:30), user 2 one; second batch only advances
    // the watermark, so the 12:30 session must close via the EVENT-TIME
    // TIMEOUT path (no further events for user 1), not a gap-exceeding row
    mem.addData(
      (ts("2024-01-01 10:00:00"), 1L, 1.0),
      (ts("2024-01-01 10:10:00"), 1L, 2.0),
      (ts("2024-01-01 12:30:00"), 1L, 4.0),
      (ts("2024-01-01 10:00:00"), 2L, 8.0))
    q.processAllAvailable()
    mem.addData((ts("2024-01-02 00:00:00"), 9L, 0.0))
    q.processAllAvailable()
    mem.addData((ts("2024-01-03 00:00:00"), 9L, 0.0)) // flush user 9 too
    q.processAllAvailable()

    val got = spark.table("explicit_sessions")
      .filter(col("user_id") < 9)
      .select("user_id", "session_start", "session_end", "n_events", "session_cents")
      .as[(Long, Timestamp, Timestamp, Long, Long)].collect().toSet
    // the declarative twin on the same frame, batch mode
    val want = StreamAggs.sessionize(
      Seq((ts("2024-01-01 10:00:00"), 1L, 1.0),
        (ts("2024-01-01 10:10:00"), 1L, 2.0),
        (ts("2024-01-01 12:30:00"), 1L, 4.0),
        (ts("2024-01-01 10:00:00"), 2L, 8.0))
        .toDF("ts", "user_id", "value"))
      .select("user_id", "session_start", "session_end", "n_events", "session_cents")
      .as[(Long, Timestamp, Timestamp, Long, Long)].collect().toSet
    assert(got == want)
    q.stop()
  }

  test("stream-stream interval join attributes purchases to in-window views") {
    implicit val sqlCtx = spark.sqlContext
    val vMem = MemoryStream[(Long, Timestamp)]
    val pMem = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamAggs.purchaseViewJoin(
      vMem.toDF().toDF("user_id", "view_ts"),
      pMem.toDF().toDF("purchase_id", "user_id", "purchase_ts"))
    val q = joined.writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append()).start()

    vMem.addData((1L, ts("2024-01-01 10:00:00")), // in window for p100
      (1L, ts("2024-01-01 08:00:00")), // too old for p100
      (2L, ts("2024-01-01 10:20:00"))) // other user
    pMem.addData((100L, 1L, ts("2024-01-01 10:30:00")),
      (200L, 3L, ts("2024-01-01 10:30:00"))) // user 3 has no views
    q.processAllAvailable()
    // advance both watermarks so the left-outer null for p200 is emitted
    vMem.addData((9L, ts("2024-01-02 00:00:00")))
    pMem.addData((999L, 9L, ts("2024-01-02 00:00:00")))
    q.processAllAvailable()

    val got = spark.table("attr_out")
      .filter(col("purchase_id") < 999)
      .select("purchase_id", "view_ts")
      .as[(Long, Option[Timestamp])].collect().toSet
    assert(got == Set(
      (100L, Some(ts("2024-01-01 10:00:00"))),
      (200L, None)))
    q.stop()
  }

  test("stream anti composition and rightOuter complete the join family") {
    implicit val sqlCtx = spark.sqlContext
    // anti = leftOuter + IS NULL filter (Spark has no native stream-stream
    // leftAnti): a matched purchase must NOT appear, an unmatched one
    // emits exactly once when the watermark proves no view can arrive
    val vMem = MemoryStream[(Long, Timestamp)]
    val pMem = MemoryStream[(Long, Long, Timestamp)]
    val anti = StreamAggs.purchaseViewJoin(
      vMem.toDF().toDF("user_id", "view_ts"),
      pMem.toDF().toDF("purchase_id", "user_id", "purchase_ts"),
      joinType = "leftOuter")
      .filter(col("view_ts").isNull)
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"))
    val q = anti.writeStream.format("memory").queryName("anti_out")
      .outputMode(OutputMode.Append()).start()
    vMem.addData((1L, ts("2024-01-01 10:00:00")))   // matches p100
    pMem.addData((100L, 1L, ts("2024-01-01 10:30:00")),
      (200L, 3L, ts("2024-01-01 10:30:00")))        // user 3: no views
    q.processAllAvailable()
    vMem.addData((9L, ts("2024-01-02 00:00:00")))   // advance watermarks
    pMem.addData((999L, 9L, ts("2024-01-02 00:00:00")))
    q.processAllAvailable()
    val got = spark.table("anti_out").filter(col("purchase_id") < 999)
      .select("purchase_id").as[Long].collect().toSet
    assert(got == Set(200L), s"anti must pass ONLY the no-view purchase: $got")
    q.stop()

    // rightOuter: matched pair emits as inner; an unmatched VIEW emits
    // purchase-NULL-padded on watermark eviction, keeping its identity
    // via the coalesce'd user_id
    val vMem2 = MemoryStream[(Long, Timestamp)]
    val pMem2 = MemoryStream[(Long, Long, Timestamp)]
    val ro = StreamAggs.purchaseViewJoin(
      vMem2.toDF().toDF("user_id", "view_ts"),
      pMem2.toDF().toDF("purchase_id", "user_id", "purchase_ts"),
      joinType = "rightOuter")
    val q2 = ro.writeStream.format("memory").queryName("ro_out")
      .outputMode(OutputMode.Append()).start()
    vMem2.addData((1L, ts("2024-01-01 10:00:00")),  // matches p100
      (5L, ts("2024-01-01 10:10:00")))              // user 5: no purchase
    pMem2.addData((100L, 1L, ts("2024-01-01 10:30:00")))
    q2.processAllAvailable()
    vMem2.addData((9L, ts("2024-01-02 00:00:00")))
    pMem2.addData((999L, 9L, ts("2024-01-02 00:00:00")))
    q2.processAllAvailable()
    val got2 = spark.table("ro_out")
      .filter(col("user_id") =!= 9L)
      .select("purchase_id", "user_id", "view_ts")
      .as[(Option[Long], Long, Option[Timestamp])].collect().toSet
    assert(got2 == Set(
      (Some(100L), 1L, Some(ts("2024-01-01 10:00:00"))),
      (None, 5L, Some(ts("2024-01-01 10:10:00")))),
      s"rightOuter must carry the matched pair + the NULL-padded view: $got2")
    q2.stop()
  }

  test("foreachBatch splits each micro-batch into retained + quarantine sinks") {
    import graft.dq.Expectations
    implicit val sqlCtx = spark.sqlContext
    val retained = scala.collection.mutable.ArrayBuffer[Long]()
    val quarantined = scala.collection.mutable.ArrayBuffer[Long]()
    val mem = MemoryStream[(Long, Double)]
    val q = mem.toDF().toDF("event_id", "value")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val r = Expectations(batch,
          Seq(Expectations.Expectation("pos_value", col("value") >= 0,
            Expectations.Drop)))
        retained ++= r.retained.select("event_id")
          .collect().map(_.getLong(0))
        quarantined ++= r.quarantined.select("event_id")
          .collect().map(_.getLong(0))
        ()
      }
      .start()
    mem.addData((1L, 1.0), (2L, -5.0), (3L, 2.0))
    q.processAllAvailable()
    mem.addData((4L, -1.0))
    q.processAllAvailable()
    assert(retained.sorted.toSeq == Seq(1L, 3L))
    assert(quarantined.sorted.toSeq == Seq(2L, 4L))
    q.stop()
  }

  test("transformWithState device health matches the mapGroupsWithState fold") {
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[StreamAggs.DeviceReading]
      val q = StreamAggs.deviceHealthTws(mem.toDS())
        .writeStream.format("memory").queryName("tws_out")
        .outputMode(OutputMode.Update()).start()
      def r(d: String, t: String, f: String) =
        StreamAggs.DeviceReading(d, ts(t), f, 1.0)
      mem.addData(
        r("d1", "2024-01-01 10:00:00", "good"),
        r("d1", "2024-01-01 10:01:00", "suspect"),
        r("d2", "2024-01-01 10:00:00", "suspect"))
      q.processAllAvailable()
      mem.addData(r("d1", "2024-01-01 10:02:00", "suspect"))
      q.processAllAvailable()
      q.stop()
      // latest state per device (Update mode emits one row per batch)
      val byDevice = spark.table("tws_out")
        .orderBy(col("n_total"))
        .collect()
        .map(x => x.getAs[String]("device_id") ->
          (x.getAs[Long]("n_total"), x.getAs[Long]("n_suspect"),
            x.getAs[Long]("suspect_streak")))
        .toMap // last write wins = highest n_total
      assert(byDevice("d1") == ((3L, 2L, 2L)))
      assert(byDevice("d2") == ((1L, 1L, 1L)))
    } finally saved match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None    => spark.conf.unset(providerKey)
    }
  }

  test("transformWithState TTL: state survives inside the horizon, expires beyond it") {
    // AvailableNow restarts over ONE checkpoint, never processAllAvailable:
    // processing-time TTL schedules continuous eviction micro-batches
    // under the ASAP trigger (the deviceHealth NoTimeout busy-loop,
    // observed as a hang here too); bounded drains terminate by contract
    // and the wall clock elapses BETWEEN runs, which is exactly the
    // horizon TTL measures (state lifetime spans restarts).
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val root = java.nio.file.Files.createTempDirectory("graft-ttl")
      .toFile.getAbsolutePath
    val landing = s"$root/landing"; new java.io.File(landing).mkdirs()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.StringType)))
    def land(name: String, keys: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(landing, name),
        keys.map(k => s"""{"k":"$k"}""").mkString("\n").getBytes("UTF-8"))
    def sinkRows(): Int =
      try spark.read.parquet(s"$root/sink").collect().length
      catch { case _: Throwable => 0 }
    // The 15 s horizon dwarfs query-restart overhead (checkpoint reload +
    // RocksDB reopen measured at 2-5 s — a 4 s horizon expired state
    // before the inside-horizon batch even processed).
    // STOP-BOUNDED drain, never awaitTermination: processing-time TTL
    // keeps scheduling state-maintenance micro-batches even under
    // AvailableNow (observed: thousands of empty batches), so we poll the
    // sink for the emissions this batch must produce and stop the query —
    // the empty maintenance batches emit nothing, so the counts are exact.
    def drain(expectRows: Int): Unit = {
      import spark.implicits._
      val in = spark.readStream.schema(schema).json(landing)
        .select(col("k")).as[String]
      val q = StreamAggs.ttlCounts(in, ttlMs = 15000L)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamAggs.KeyCount], _: Long) =>
          b.write.mode("append").parquet(s"$root/sink"); ()
        }
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      val deadline = System.currentTimeMillis() + 90000
      while (System.currentTimeMillis() < deadline && q.isActive &&
        sinkRows() < expectRows) Thread.sleep(200)
      q.stop()
      assert(sinkRows() >= expectRows,
        s"drain timed out at ${sinkRows()}/$expectRows emissions")
    }
    try {
      land("b1.json", Seq("a", "a", "b"))
      drain(2) // a->2, b->1
      land("b2.json", Seq("b"))
      drain(3) // inside the horizon: b->2 (state alive across restart)
      Thread.sleep(16500) // beyond the horizon: both entries expire
      land("b3.json", Seq("a", "b"))
      drain(5) // a->1, b->1 (TTL reclaimed; without TTL: a->3, b->3)
      val rows = spark.read.parquet(s"$root/sink")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(rows.count { case (k, n) => k == "b" && n == 2L } == 1,
        s"inside-horizon continuation missing: $rows")
      assert(rows.count { case (k, n) => k == "a" && n == 1L } == 1 &&
        rows.count { case (k, n) => k == "b" && n == 1L } == 2,
        s"TTL expiry missing (counts continued past the horizon): $rows")
      assert(!rows.exists(_._2 >= 3L), s"state never expired: $rows")
    } finally saved match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None    => spark.conf.unset(providerKey)
    }
  }

  test("foreachBatch MERGE upsert: versioned commit, idempotent re-drain + replay") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import graft.stream.Upsert
    val dir = Files.createTempDirectory("graft-upsert").toFile.getAbsolutePath
    val landing = s"$dir/landing"; val state = s"$dir/state"; val ckpt = s"$dir/ckpt"
    new java.io.File(landing).mkdirs()
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", LongType),
      StructField("_op", StringType), StructField("_commit_ts", StringType)))
    def writeBatch(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(landing, name), lines.mkString("\n").getBytes)
    def cur = Upsert.readState(spark, state).get
      .select("k", "v").as[(String, Long)].collect().toSet

    writeBatch("b1.json", Seq(
      """{"k":"k1","v":1,"_op":"c","_commit_ts":"2024-01-01T10:00:00"}""",
      """{"k":"k2","v":2,"_op":"c","_commit_ts":"2024-01-01T10:00:01"}"""))
    Upsert.runUpsertPipeline(spark, landing, schema, state, ckpt, Seq("k"))
    assert(cur == Set(("k1", 1L), ("k2", 2L)))
    val v1 = Upsert.currentVersion(state)

    // re-drain with no new input: checkpoint replays nothing, state version
    // unchanged — the exactly-once re-drain guarantee
    Upsert.runUpsertPipeline(spark, landing, schema, state, ckpt, Seq("k"))
    assert(Upsert.currentVersion(state) == v1)
    assert(cur == Set(("k1", 1L), ("k2", 2L)))

    // batch 2: update k1, soft-delete k2, create k3 → MERGE semantics
    writeBatch("b2.json", Seq(
      """{"k":"k1","v":10,"_op":"u","_commit_ts":"2024-01-01T11:00:00"}""",
      """{"k":"k2","v":0,"_op":"d","_commit_ts":"2024-01-01T11:00:01"}""",
      """{"k":"k3","v":3,"_op":"c","_commit_ts":"2024-01-01T11:00:02"}"""))
    Upsert.runUpsertPipeline(spark, landing, schema, state, ckpt, Seq("k"))
    assert(cur == Set(("k1", 10L), ("k3", 3L)))

    // at-least-once replay of an already-applied batch converges to the
    // same state (Cdc.merge idempotence) — exactly-once EFFECT
    val replay = spark.read.schema(schema).json(s"$landing/b2.json")
    Upsert.mergeBatch(spark, state, replay, batchId = 99L, keyCols = Seq("k"))
    assert(cur == Set(("k1", 10L), ("k3", 3L)))
  }

  test("foldFeedBatchIntoAggView: batch-stamp replay no-ops, retractions delete at zero") {
    import java.nio.file.Files
    import graft.sources.Lake
    val view = Files.createTempDirectory("graft-mvfold").toFile
      .getAbsolutePath + "/view"
    def feed(rows: (Long, Long, String)*) =
      rows.toSeq.toDF("user_id", "cents", "_change_type")
    def cur = Lake.readVersioned(spark, view)
      .select("user_id", "n_events", "cents")
      .as[(Long, Long, Long)].collect().toSet

    // batch 0 bootstraps the view from inserts
    Lake.foldFeedBatchIntoAggView(
      feed((1L, 10L, "insert"), (1L, 20L, "insert"), (2L, 5L, "insert")),
      view, 0L, keys = Seq("user_id"), sumCols = Seq("cents"),
      countCol = "n_events")
    assert(cur == Set((1L, 2L, 30L), (2L, 1L, 5L)))

    // batch 1: a COW delete retracts one of user 1's rows and ALL of
    // user 2's — user 2 reaches zero and leaves the view
    Lake.foldFeedBatchIntoAggView(
      feed((1L, 10L, "delete"), (2L, 5L, "delete")),
      view, 1L, keys = Seq("user_id"), sumCols = Seq("cents"),
      countCol = "n_events")
    assert(cur == Set((1L, 1L, 20L)))
    val v1 = Lake.listVersions(spark, view).last

    // foreachBatch REPLAY of batch 1 (the documented crash window:
    // offsets logged, commit missing): stamp >= batchId → no-op, no
    // double retraction, no new version
    Lake.foldFeedBatchIntoAggView(
      feed((1L, 10L, "delete"), (2L, 5L, "delete")),
      view, 1L, keys = Seq("user_id"), sumCols = Seq("cents"),
      countCol = "n_events")
    assert(cur == Set((1L, 1L, 20L)))
    assert(Lake.listVersions(spark, view).last == v1,
      "replayed batch published a new view version")

    // a LATER batch still folds (the stamp gate is >=, not ==)
    Lake.foldFeedBatchIntoAggView(
      feed((3L, 7L, "insert")),
      view, 2L, keys = Seq("user_id"), sumCols = Seq("cents"),
      countCol = "n_events")
    assert(cur == Set((1L, 1L, 20L), (3L, 1L, 7L)))
  }

  test("dimFoldBatch: moves re-key counts, retirements drop rows, replay no-ops") {
    import java.nio.file.Files
    import graft.sources.Lake
    val view = Files.createTempDirectory("graft-dimfold").toFile
      .getAbsolutePath + "/view"
    // a (user, segment)-grain join view maintained by the fact fold
    Lake.foldFeedBatchIntoAggView(
      Seq((1L, "S0", 10L, "insert"), (1L, "S0", 20L, "insert"),
        (2L, "S1", 5L, "insert"), (3L, "S2", 7L, "insert"))
        .toDF("user_id", "segment", "cents", "_change_type"),
      view, 0L, keys = Seq("user_id", "segment"), sumCols = Seq("cents"),
      countCol = "n_events")
    def cur = Lake.readVersioned(spark, view)
      .select("user_id", "segment", "n_events", "cents")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(cur == Set((1L, "S0", 2L, 30L), (2L, "S1", 1L, 5L),
      (3L, "S2", 1L, 7L)))
    // dim batch: user 1 moves S0→S9 (counts must ride), user 3 retires,
    // user 4 is a plain insert (ignored by contract — no fact history)
    def dimBatch = Seq(
      (1L, "S0", "update_preimage"), (1L, "S9", "update_postimage"),
      (3L, "S2", "delete"), (4L, "S1", "insert"))
      .toDF("user_id", "segment", "_change_type")
    graft.stream.StreamQueries.dimFoldBatch(dimBatch, view, 0L)
    assert(cur == Set((1L, "S9", 2L, 30L), (2L, "S1", 1L, 5L)),
      s"move/retire fold wrong: $cur")
    val v1 = Lake.listVersions(spark, view).last
    // foreachBatch replay of the same dim batch: stamp covers it → no-op
    graft.stream.StreamQueries.dimFoldBatch(dimBatch, view, 0L)
    assert(cur == Set((1L, "S9", 2L, 30L), (2L, "S1", 1L, 5L)))
    assert(Lake.listVersions(spark, view).last == v1,
      "replayed dim batch published a new version")
  }

  test("interleaved fact/dim folds: replay guards compare per stamp channel") {
    // The r19 advisor's finding: with ONE shared stamp channel, a dim
    // fold's 1e6+bid stamp at the view head made every later fact fold
    // (small batchId) read stamp >= batchId and silently no-op — dropping
    // fact data in exactly the "continuous fact-side fold between dim
    // refreshes" pattern the docs advertise. The guards now walk back to
    // the latest stamp IN THEIR OWN channel (Lake.DimStampBase boundary).
    import java.nio.file.Files
    import graft.sources.Lake
    val view = Files.createTempDirectory("graft-chanfold").toFile
      .getAbsolutePath + "/view"
    def factFold(bid: Long, rows: (Long, String, Long, String)*): Unit =
      Lake.foldFeedBatchIntoAggView(
        rows.toSeq.toDF("user_id", "segment", "cents", "_change_type"),
        view, bid, keys = Seq("user_id", "segment"),
        sumCols = Seq("cents"), countCol = "n_events")
    def cur = Lake.readVersioned(spark, view)
      .select("user_id", "segment", "n_events", "cents")
      .as[(Long, String, Long, Long)].collect().toSet

    factFold(0L, (1L, "S0", 10L, "insert"), (2L, "S1", 5L, "insert"))
    // dim fold between fact batches: user 1 moves S0→S9 (stamp 1e6+0)
    graft.stream.StreamQueries.dimFoldBatch(
      Seq((1L, "S0", "update_preimage"), (1L, "S9", "update_postimage"))
        .toDF("user_id", "segment", "_change_type"), view, 0L)
    assert(cur == Set((1L, "S9", 1L, 10L), (2L, "S1", 1L, 5L)))

    // the fact fold AFTER the dim fold must APPLY (head stamp is the dim
    // channel's 1e6 — the pre-fix guard no-opped here and lost the batch)
    factFold(1L, (2L, "S1", 7L, "insert"))
    assert(cur == Set((1L, "S9", 1L, 10L), (2L, "S1", 2L, 12L)),
      s"fact fold after a dim fold was dropped: $cur")

    // fact REPLAY of batch 1 still no-ops (fact-channel stamp covers it)
    val vAfterFact = Lake.listVersions(spark, view).last
    factFold(1L, (2L, "S1", 7L, "insert"))
    assert(cur == Set((1L, "S9", 1L, 10L), (2L, "S1", 2L, 12L)))
    assert(Lake.listVersions(spark, view).last == vAfterFact,
      "replayed fact batch folded twice")

    // dim REPLAY after an intervening fact fold no-ops too: the head is
    // now a fact-channel stamp, and a head-only compare would MISS the
    // replay and re-apply the move's re-key against the current view
    val vAfterAll = Lake.listVersions(spark, view).last
    graft.stream.StreamQueries.dimFoldBatch(
      Seq((1L, "S0", "update_preimage"), (1L, "S9", "update_postimage"))
        .toDF("user_id", "segment", "_change_type"), view, 0L)
    assert(cur == Set((1L, "S9", 1L, 10L), (2L, "S1", 2L, 12L)))
    assert(Lake.listVersions(spark, view).last == vAfterAll,
      "replayed dim batch folded twice")
  }

  test("foldFeedBatchIntoAggView(retainNonPositive): delete-before-insert commutes") {
    // The zero-sleep export lane's contract: with versions free to
    // interleave, a retraction can precede its insert. The ≤0-delete fold
    // would drop the key at −1 and LOSE the balance; retainNonPositive
    // keeps it so per-key addition commutes to the same net state.
    import java.nio.file.Files
    import graft.sources.Lake
    val view = Files.createTempDirectory("graft-npfold").toFile
      .getAbsolutePath + "/view"
    def fold(bid: Long, rows: (Long, Long, String)*): Unit =
      Lake.foldFeedBatchIntoAggView(
        rows.toSeq.toDF("user_id", "cents", "_change_type"),
        view, bid, keys = Seq("user_id"), sumCols = Seq("cents"),
        countCol = "n_events", retainNonPositive = true)
    def cur = Lake.readVersioned(spark, view)
      .select("user_id", "n_events", "cents")
      .as[(Long, Long, Long)].collect().toSet
    // deletes arrive FIRST (interleaved order): negative balance is seeded
    fold(0L, (1L, 10L, "delete"), (2L, 5L, "delete"))
    assert(cur == Set((1L, -1L, -10L), (2L, -1L, -5L)))
    // inserts arrive later: user 1 nets to +1 row, user 2 to exactly zero
    fold(1L, (1L, 10L, "insert"), (1L, 20L, "insert"), (2L, 5L, "insert"))
    assert(cur == Set((1L, 1L, 20L), (2L, 0L, 0L)),
      s"commutative fold lost a retraction: $cur")
  }

  test("streaming CDC dedup: latest wins, deletes drop, both late contracts pinned") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, String, Timestamp)]
    val q = StreamAggs
      .cdcLatestExplicit(mem.toDF().toDF("k", "v", "_op", "_commit_ts"))
      .toDF().writeStream.format("memory").queryName("cdc_dedup_out")
      .outputMode(OutputMode.Append()).start()

    // k1 created then updated; k2 created then soft-deleted; k3 created.
    // Duplicate k1 update replayed in-batch to exercise the fold.
    val fixture = Seq(
      ("k1", 1L, "c", ts("2024-01-01 10:00:00")),
      ("k1", 10L, "u", ts("2024-01-01 11:00:00")),
      ("k1", 10L, "u", ts("2024-01-01 11:00:00")),
      ("k2", 2L, "c", ts("2024-01-01 10:30:00")),
      ("k2", 0L, "d", ts("2024-01-01 11:30:00")),
      ("k3", 3L, "c", ts("2024-01-01 10:15:00")))
    mem.addData(fixture: _*)
    q.processAllAvailable()
    // sentinel advances the watermark past every key's last commit → the
    // event-time timeout flushes each key exactly once
    mem.addData(("z", 0L, "c", ts("2024-01-02 00:00:00")))
    q.processAllAvailable()
    val gen1 = spark.table("cdc_dedup_out").filter(col("k") =!= "z")
      .select("k", "v").as[(String, Long)].collect().toSet
    assert(gen1 == Set(("k1", 10L), ("k3", 3L)),
      "latest record wins; soft-deleted key emits nothing")

    // stream ≡ batch: the same events through Cdc.scd1 (the batch
    // ROW_NUMBER dedup this operator runs continuously)
    val batch = graft.model.Cdc.scd1(
      fixture.toDF("k", "v", "_op", "_commit_ts")
        // scd1 keeps duplicates distinct under row_number; drop the
        // replayed row the same way any batch CDC reader would
        .distinct(),
      Seq("k"))
      .select("k", "v").as[(String, Long)].collect().toSet
    assert(batch == gen1, "streaming output must equal batch scd1")

    // contract (a): an event OLDER than the watermark is dropped — the
    // flushed record stands
    mem.addData(("k1", 99L, "u", ts("2024-01-01 10:30:00")))
    q.processAllAvailable()
    assert(spark.table("cdc_dedup_out").filter(col("k") === "k1").count() == 1,
      "stale late duplicate must not re-emit")

    // contract (b): a key RETURNING with a fresh commit starts a new
    // generation — downstream consumes the output as upserts by key
    mem.addData(("k1", 77L, "u", ts("2024-01-02 01:00:00")))
    q.processAllAvailable()
    mem.addData(("z", 0L, "c", ts("2024-01-03 00:00:00")))
    q.processAllAvailable()
    val k1 = spark.table("cdc_dedup_out").filter(col("k") === "k1")
      .select("v").as[Long].collect().toSeq.sorted
    assert(k1 == Seq(10L, 77L), "returning key appends a second generation")
    q.stop()
  }

  test("cdcLatestExplicit on RocksDB state: fold, mid-drain kill, resume exact") {
    // r18 #7 / r19 #2: at 100 TB the CDC latest-wins fold is exactly the
    // operator whose state outgrows executor heap — its disk-backed-state
    // claim needs RocksDB coverage incl. a kill+resume (state reloads
    // from the checkpoint's RocksDB snapshot, not from heap).
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val root = java.nio.file.Files.createTempDirectory("graft-rockscdc")
      .toFile.getAbsolutePath
    val landing = s"$root/landing"; new java.io.File(landing).mkdirs()
    // explicit mtimes: the file source batches by MODIFICATION TIME, and
    // four files landed in the same millisecond drain in arbitrary order
    // — the sentinel first, whose watermark then drops every data row
    var mt = System.currentTimeMillis() - 60000L
    def land(name: String, rows: Seq[String]): Unit = {
      java.nio.file.Files.write(java.nio.file.Paths.get(landing, name),
        rows.mkString("\n").getBytes("UTF-8"))
      mt += 2000L
      assert(new java.io.File(landing, name).setLastModified(mt))
    }
    // three data files + a far-future sentinel that flushes every key's
    // event-time timeout during the final no-data batch
    land("b1.json", Seq(
      """{"k":"k1","v":1,"_op":"c","_commit_ts":"2024-01-01T10:00:00"}""",
      """{"k":"k2","v":2,"_op":"c","_commit_ts":"2024-01-01T10:30:00"}"""))
    land("b2.json", Seq(
      """{"k":"k1","v":10,"_op":"u","_commit_ts":"2024-01-01T11:00:00"}""",
      """{"k":"k3","v":3,"_op":"c","_commit_ts":"2024-01-01T10:15:00"}"""))
    land("b3.json", Seq(
      """{"k":"k2","v":0,"_op":"d","_commit_ts":"2024-01-01T11:30:00"}"""))
    land("b4.json", Seq(
      """{"k":"zz","v":0,"_op":"c","_commit_ts":"2024-02-01T00:00:00"}"""))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_op",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_commit_ts",
        org.apache.spark.sql.types.StringType)))
    def start() = StreamAggs.cdcLatestExplicit(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .json(landing)
        .withColumn("_commit_ts", col("_commit_ts").cast("timestamp")))
      .toDF()
      .writeStream.format("parquet").option("path", s"$root/sink")
      .option("checkpointLocation", s"$root/ckpt").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      // kill after the FIRST committed micro-batch (the crash window:
      // offsets logged, RocksDB snapshot at batch 0, no final commit)
      val q = start()
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (!q.recentProgress.exists(_.numInputRows > 0) &&
        System.nanoTime() < deadline) Thread.sleep(25)
      q.stop()
      assert(q.recentProgress.nonEmpty, "first drain never committed")
      // resume from the checkpoint: RocksDB state reloads, the remaining
      // files fold, the sentinel's watermark flushes every key
      val q2 = start()
      q2.awaitTermination()
      val got = spark.read.parquet(s"$root/sink")
        .filter(col("k") =!= "zz")
        .select("k", "v").as[(String, Long)].collect().toSet
      assert(got == Set(("k1", 10L), ("k3", 3L)),
        s"RocksDB-backed fold after kill+resume diverged: $got")
    } finally saved match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None    => spark.conf.unset(providerKey)
    }
  }

  test("stream_cdf_scd1 row is provider-agnostic: RocksDB run equals default") {
    // the registered keyed-feed SCD1 drain, executed end-to-end under
    // RocksDB and compared set-exact against the default-provider run
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(providerKey)
    val sf = "/root/testdata/sf0.001"
    val base = graft.SparkEntry.queries("stream_cdf_scd1")(spark, sf)
      .select("k", "v").as[(String, Long)].collect().toSet
    assert(base.nonEmpty)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rocks = graft.SparkEntry.queries("stream_cdf_scd1")(spark, sf)
        .select("k", "v").as[(String, Long)].collect().toSet
      assert(rocks == base,
        s"RocksDB SCD1 diverged: only-default=${base.diff(rocks).take(5)} " +
          s"only-rocks=${rocks.diff(base).take(5)}")
    } finally saved match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None    => spark.conf.unset(providerKey)
    }
  }

  test("dimFoldBatch(backfillFrom): post-snapshot inserts adopt fact history; replay no-ops") {
    import java.nio.file.Files
    import graft.sources.Lake
    val view = Files.createTempDirectory("graft-bffold").toFile
      .getAbsolutePath + "/view"
    // fact-side fold against a dim that lacks user 4 entirely
    Lake.foldFeedBatchIntoAggView(
      Seq((1L, "S0", 10L, "insert"), (2L, "S1", 5L, "insert"))
        .toDF("user_id", "segment", "cents", "_change_type"),
      view, 0L, keys = Seq("user_id", "segment"), sumCols = Seq("cents"),
      countCol = "n_events")
    def cur = Lake.readVersioned(spark, view)
      .select("user_id", "segment", "n_events", "cents")
      .as[(Long, String, Long, Long)].collect().toSet
    // user 4's fact history, invisible to the view so far
    val fact = Seq((1L, 10L), (2L, 5L), (4L, 7L), (4L, 9L))
      .toDF("user_id", "cents")
    // dim batch: v1-snapshot insert for user 1 (must NO-OP — it is the
    // bootstrap, not a new member) and a v2 insert for user 4 (backfills)
    val batch = Seq((1L, "S0", "insert", 1L), (4L, "S1", "insert", 2L))
      .toDF("user_id", "segment", "_change_type", "_commit_version")
    graft.stream.StreamQueries.dimFoldBatch(batch, view, 0L,
      backfillFrom = Some(fact))
    assert(cur == Set((1L, "S0", 1L, 10L), (2L, "S1", 1L, 5L),
      (4L, "S1", 2L, 16L)), s"backfill fold wrong: $cur")
    // replay of the same dim batch no-ops (dim-channel stamp covers it)
    val v1 = Lake.listVersions(spark, view).last
    graft.stream.StreamQueries.dimFoldBatch(batch, view, 0L,
      backfillFrom = Some(fact))
    assert(cur == Set((1L, "S0", 1L, 10L), (2L, "S1", 1L, 5L),
      (4L, "S1", 2L, 16L)))
    assert(Lake.listVersions(spark, view).last == v1,
      "replayed backfill batch published a new version")
  }

  test("dropDuplicatesWithinWatermark dedups replays inside the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val q = StreamAggs
      .dedupWithinWatermark(mem.toDF().toDF("event_id", "ts", "value"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()

    mem.addData((1L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, ts("2024-01-01 10:01:00"), 2.0))
    q.processAllAvailable()
    // replay event 1 in a later micro-batch, still within the horizon
    mem.addData((1L, ts("2024-01-01 10:02:00"), 1.0),
      (3L, ts("2024-01-01 10:03:00"), 3.0))
    q.processAllAvailable()

    val ids = spark.table("dedup_out").select("event_id")
      .as[Long].collect().toSeq.sorted
    assert(ids == Seq(1L, 2L, 3L), "replayed event_id 1 must be dropped")
    q.stop()
  }

  test("mid-drain kill + checkpoint resume lands on the exact batch answer") {
    // The crash-recovery differential behind stream_restart_equiv: the
    // registered row is hash-exact WHEREVER the stop lands (including
    // after the drain already finished), so this spec holds the evidence
    // that the MID-DRAIN case — stop after ≥1 committed batch with work
    // remaining — is the one actually exercised: retry with a fresh
    // checkpoint until the stop beats the drain, then assert the resumed
    // sink equals the distinct set with no dups and no losses.
    import java.nio.file.{Files, Paths}
    val root0 = Files.createTempDirectory("graft-restart").toString
    val landing = s"$root0/landing"; new java.io.File(landing).mkdirs()
    // 12 one-row files at 1 file/trigger → 12 micro-batches; files 9..11
    // replay events 0..2 byte-identically (the dedup must drop them
    // ACROSS the kill: state for the originals is restored from the
    // checkpoint, not rebuilt from the already-committed sink)
    def row(i: Long) =
      s"""{"event_id":$i,"ts":"2024-01-01 10:${"%02d".format(i)}:00.000000",""" +
        s""""user_id":${100 + i},"value":$i.5}"""
    (0L to 8L).foreach(i =>
      Files.write(Paths.get(landing, s"f$i.json"), row(i).getBytes("UTF-8")))
    (0L to 2L).foreach(i =>
      Files.write(Paths.get(landing, s"g$i.json"), row(i).getBytes("UTF-8")))
    val expected = (0L to 8L).toSeq
    val midDrain = (1 to 5).exists { attempt =>
      val root = s"$root0/a$attempt"
      val committed = graft.stream.StreamQueries
        .runKilledThenResumedDedup(spark, landing, root)
      val got = spark.read.parquet(s"$root/sink")
        .select("event_id").as[Long].collect().toSeq.sorted
      assert(got == expected,
        s"attempt $attempt (stopped at $committed rows): resumed sink " +
          s"diverged — got $got")
      committed > 0 && committed < expected.size
    }
    assert(midDrain,
      "5 attempts never stopped mid-drain (first batch committed, work " +
        "remaining) — the kill raced the 12-batch drain and lost every time")
  }

  test("WAP-gated stream: no version ever held an unaudited row; quarantine exact") {
    import graft.sources.Lake
    // run the WAP-gated drain end-to-end on the smallest SF, rooted here
    val sfDir = "/root/testdata/sf0.001"
    val landing = graft.stream.StreamQueries.prebuildLanding(spark, sfDir)
    val root = java.nio.file.Files.createTempDirectory("graft-swap").toString
    graft.stream.StreamQueries.runWapGatedDrain(spark, landing, root).count()
    val table = s"$root/curated"
    val quarantine = s"$root/quarantine"
    val bad = lower(trim(col("quality_flag"))) =!= "good" &&
      lower(trim(col("quality_flag"))) =!= "suspect"
    // the gate's whole point: walk EVERY published version — none may
    // contain a row failing the expectation, not even transiently
    val versions = Lake.listVersions(spark, table)
    assert(versions.size >= 2, s"expected multiple micro-batch commits, got $versions")
    versions.foreach { v =>
      assert(Lake.readVersioned(spark, table, Some(v)).filter(bad).isEmpty,
        s"version $v holds an unaudited row")
    }
    // quarantine holds exactly the 'bad'-flag rows of the landing data
    val nBad = Tables.events(spark, sfDir)
      .filter(col("event_id") % 4 === 3).count()
    assert(spark.read.parquet(quarantine).count() == nBad)
    // and nothing was lost: published ∪ quarantine == full landing
    assert(Lake.readVersioned(spark, table).count() +
      spark.read.parquet(quarantine).count()
      == Tables.events(spark, sfDir).count())
    // no stage left dangling after the drain
    assert(Lake.listStaged(spark, table).isEmpty)
  }

  test("transformWithState ADDITIVE state evolution: old checkpoint, new encoder") {
    // The first processor upgrade every real pipeline hits: a field is
    // added to the state case class and the query restarts over the OLD
    // checkpoint. Spark 4 supports this when state rides the Avro
    // encoding (the UnsafeRow default is layout-frozen): the added field
    // must be nullable (Option), old entries read it as None, and the
    // upgraded processor writes the extended shape thereafter. This is
    // the upgrade path for DeviceIdleProcessor/TtlCountProcessor state
    // (IdleState/KeyCount) — proven here on a V1→V2 count-state pair so
    // the production classes keep their registered-row shapes.
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val encKey = "spark.sql.streaming.stateStore.encodingFormat"
    val saved = Seq(provKey, encKey).map(k => k -> spark.conf.getOption(k))
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(encKey, "avro")
    val root = java.nio.file.Files.createTempDirectory("graft-evo")
      .toFile.getAbsolutePath
    val landing = s"$root/landing"; new java.io.File(landing).mkdirs()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.StringType)))
    def land(name: String, keys: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(landing, name),
        keys.map(k => s"""{"k":"$k"}""").mkString("\n").getBytes("UTF-8"))
    def drain(proc: org.apache.spark.sql.streaming.StatefulProcessor[
        String, String, EvoOut]): Unit = {
      import spark.implicits._
      val in = spark.readStream.schema(schema).json(landing)
        .select(col("k")).as[String]
      val q = in.groupByKey(identity)
        .transformWithState(proc,
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Update())
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[EvoOut], _: Long) =>
          b.write.mode("append").parquet(s"$root/sink"); ()
        }
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def rows(): Set[(String, Long, Long)] = {
      import spark.implicits._
      spark.read.parquet(s"$root/sink")
        .as[EvoOut].collect().map(o => (o.key, o.n, o.marker)).toSet
    }
    try {
      land("b1.json", Seq("a", "a", "b"))
      drain(new EvoProcessorV1) // V1 state: (n); a->2, b->1
      assert(rows() == Set(("a", 2L, -1L), ("b", 1L, -1L)))
      land("b2.json", Seq("a"))
      drain(new EvoProcessorV2) // SAME checkpoint, state now (n, last_len)
      // the count CONTINUED (a->3: V1 state decoded under the V2 schema)
      // and the added field read as None for the pre-upgrade entry
      assert(rows().contains(("a", 3L, -1L)),
        s"V1 state lost or the added field misread: ${rows()}")
      land("b3.json", Seq("a"))
      drain(new EvoProcessorV2)
      // the extended shape persisted: this batch sees Some(1) from b2
      assert(rows().contains(("a", 4L, 1L)),
        s"V2-written field did not round-trip: ${rows()}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}

// State-evolution fixtures (top-level: stable Encoders.product derivation).
// V2 extends V1 by a NULLABLE field — the additive-evolution contract.
final case class EvoCountV1(n: Long)
final case class EvoCountV2(n: Long, last_len: Option[Long])
final case class EvoOut(key: String, n: Long, marker: Long)

class EvoProcessorV1
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, String, EvoOut] {
  import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig, ValueState}
  @transient private var state: ValueState[EvoCountV1] = _
  override def init(outputMode: OM, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[EvoCountV1](
      "cnt", org.apache.spark.sql.Encoders.product[EvoCountV1],
      TTLConfig.NONE)
  override def handleInputRows(key: String, rows: Iterator[String],
      tv: org.apache.spark.sql.streaming.TimerValues): Iterator[EvoOut] = {
    val prev = Option(state.get()).getOrElse(EvoCountV1(0L))
    val next = EvoCountV1(prev.n + rows.size)
    state.update(next)
    Iterator.single(EvoOut(key, next.n, -1L))
  }
}

class EvoProcessorV2
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, String, EvoOut] {
  import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig, ValueState}
  @transient private var state: ValueState[EvoCountV2] = _
  override def init(outputMode: OM, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[EvoCountV2](
      "cnt", org.apache.spark.sql.Encoders.product[EvoCountV2],
      TTLConfig.NONE)
  override def handleInputRows(key: String, rows: Iterator[String],
      tv: org.apache.spark.sql.streaming.TimerValues): Iterator[EvoOut] = {
    val prev = Option(state.get()).getOrElse(EvoCountV2(0L, None))
    val n = prev.n + rows.size
    // marker surfaces what the PREVIOUS state carried in the added field
    val out = EvoOut(key, n, prev.last_len.getOrElse(-1L))
    state.update(EvoCountV2(n, Some(key.length.toLong)))
    Iterator.single(out)
  }
}
