package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming aggregations beyond the reference's stateless silver (tier B:
  * hourly/daily metrics, README_DBT.md:203-204; device health with custom
  * state via mapGroupsWithState).
  */
object StreamAggs {

  /** Event-time hourly metrics with a watermark: late rows beyond
    * `lateness` are dropped and state for closed windows is reclaimed —
    * the knob that keeps state bounded on an unbounded 100 TB/day stream.
    * Works identically on a batch DataFrame (watermark is a no-op there),
    * which is how the equivalence test pins the semantics.
    */
  def hourlyMetrics(events: DataFrame, tsCol: String = "timestamp",
      lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), "1 hour").as("w"), col("sensor_type"))
      .agg(count(lit(1)).as("n_events"),
        avg(col("value")).as("avg_value"),
        max(col("value")).as("max_value"))
      .select(col("w.start").as("hour_start"), col("sensor_type"),
        col("n_events"), col("avg_value"), col("max_value"))

  /** Gap-based session windows over event time — the streaming twin of the
    * batch q_sessionize query (lag + running-sum there; native
    * `session_window` + watermark here). State per open session only;
    * the watermark closes sessions `gap` after their last event and
    * reclaims their state, keeping the store bounded on an unbounded
    * stream.
    */
  def sessionize(events: DataFrame, tsCol: String = "ts",
      gap: String = "30 minutes", lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("session_cents"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("session_cents"))

  /** Stream-stream interval join: purchases matched to the same user's
    * views within the preceding hour (the streaming twin of
    * q_range_interval_join). Both sides carry watermarks and the join
    * condition bounds view-time relative to purchase-time, so Spark can
    * compute how long to buffer each side and evict state — unbounded
    * state otherwise.
    */
  def purchaseViewJoin(views: DataFrame, purchases: DataFrame,
      joinType: String = "leftOuter", viewLateness: String = "1 hour",
      purchaseLateness: String = "2 hours"): DataFrame = {
    val v = views.withWatermark("view_ts", viewLateness)
    val p = purchases.withWatermark("purchase_ts", purchaseLateness)
    val joined = p.join(
      v,
      p("user_id") === v("user_id") &&
        v("view_ts") >= p("purchase_ts") - expr("INTERVAL 1 HOUR") &&
        v("view_ts") <= p("purchase_ts"),
      joinType)
    // leftSemi exposes only the left side's columns (the join is a
    // filter, not a widening); the other types carry the view timestamp,
    // with coalesce keeping the VIEW's identity on fullOuter's
    // unmatched-view rows (p.user_id is NULL there) — for inner/leftOuter
    // the purchase side is never null, so it is exactly p("user_id")
    if (joinType == "leftSemi")
      joined.select(p("purchase_id"), p("user_id"), p("purchase_ts"))
    else joined.select(p("purchase_id"),
      coalesce(p("user_id"), v("user_id")).as("user_id"),
      p("purchase_ts"), v("view_ts"))
  }

  /** Streaming exact dedup with bounded state: duplicates arriving within
    * the watermark horizon are dropped, and key-state older than the
    * horizon is reclaimed — `dropDuplicates` alone would grow state
    * forever on an unbounded stream.
    */
  def dedupWithinWatermark(events: DataFrame, tsCol: String = "ts",
      horizon: String = "1 hour", keys: Seq[String] = Seq("event_id")): DataFrame =
    events
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** One CDC change event (the [[graft.model.Cdc]] shape) and the current
    * record [[cdcLatestExplicit]] emits per key.
    */
  final case class CdcEvent(k: String, v: Long, _op: String,
      _commit_ts: java.sql.Timestamp)
  final case class CdcCurrent(k: String, v: Long,
      _commit_ts: java.sql.Timestamp)
  /** Per-key state for [[cdcLatestExplicit]]: the current winning record
    * (public: the state encoder's generated code calls the constructor).
    * `ts` is epoch MICROseconds (r14, was millis): real CDC feeds carry
    * sub-millisecond commit density, and a millis-truncated state made
    * distinct commits TIE — the fold then picked the winner by arrival
    * order instead of commit order.
    */
  final case class CdcBest(ts: Long, op: String, v: Long)

  private def tsMicros(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000

  private def microsTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** CONTINUOUS CDC dedup — the streaming form of
    * [[graft.model.Cdc.scd1]]'s ROW_NUMBER latest-record-wins
    * (README_DBT.md:242-244 run forever instead of per rebuild). Per
    * business key the state holds ONLY the current winning record, folded
    * with scd1's exact tie order (commit_ts desc, then op desc — so
    * replays and cross-engine reruns converge), and the record is emitted
    * via APPEND when the event-time watermark passes the key's last
    * commit — the moment no on-time event can change the answer. A key
    * whose latest op is a soft delete emits nothing. State is one small
    * row per live key, reclaimed at flush — the property that lets this
    * run unbounded where batch scd1 re-shuffles the full history.
    *
    * Two late-arrival contracts, both pinned in StreamingOpsSpec:
    *  - an event OLDER than the watermark is dropped by the watermark
    *    filter: the flushed record stands (at-most-once per generation);
    *  - a key RETURNING with a fresh commit after its flush starts a new
    *    generation — a second emission for the same key — so downstream
    *    consumes this output as UPSERTS by key, the contract every CDC
    *    MERGE sink already has ([[Upsert.mergeBatch]]).
    */
  def cdcLatestExplicit(events: DataFrame,
      lateness: String = "1 hour"): Dataset[CdcCurrent] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("_commit_ts", lateness)
      .select(col("k"), col("v").cast("long").as("v"), col("_op"),
        col("_commit_ts"))
      .as[CdcEvent]
      .groupByKey(_.k)
      .flatMapGroupsWithState[CdcBest, CdcCurrent](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key, rows, state) =>
          if (state.hasTimedOut) {
            // watermark passed the key's last commit: flush + reclaim
            val out = state.getOption.filter(_.op != "d")
              .map(b => CdcCurrent(key, b.v, microsTs(b.ts)))
              .iterator
            state.remove()
            out
          } else {
            var best = state.getOption
            rows.foreach { e =>
              val c = CdcBest(tsMicros(e._commit_ts), e._op, e.v)
              val keep = best.exists(b =>
                b.ts > c.ts || (b.ts == c.ts && b.op >= c.op))
              if (!keep) best = Some(c)
            }
            best.foreach { b =>
              state.update(b)
              // fire as soon as the watermark passes the winning commit
              // (timeouts are millis — round the micros commit UP); the
              // +1 guard keeps the timestamp strictly ahead of a
              // watermark that has already caught up to it
              state.setTimeoutTimestamp(
                math.max(math.floorDiv(b.ts + 999, 1000L),
                  state.getCurrentWatermarkMs() + 1))
            }
            Iterator.empty
          }
      }
  }

  /** Spark 4 transformWithState version of the device-health processor —
    * the successor API to mapGroupsWithState: typed ValueState handles,
    * TTL support, timers, and a RocksDB-backed store
    * (`spark.sql.streaming.stateStore.providerClass` must be the RocksDB
    * provider). Same fold as deviceHealth below, so the spec can assert
    * both APIs produce identical health trajectories.
    */
  class DeviceHealthProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, DeviceReading, DeviceHealth] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig, ValueState}
    @transient private var state: ValueState[DeviceHealth] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[DeviceHealth](
        "health",
        org.apache.spark.sql.Encoders.product[DeviceHealth],
        TTLConfig.NONE)

    override def handleInputRows(deviceId: String,
        rows: Iterator[DeviceReading],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[DeviceHealth] = {
      val prev = Option(state.get()).getOrElse(DeviceHealth(deviceId, 0L, 0L, 0L, 1.0))
      val next = foldReadings(prev, rows)
      state.update(next)
      Iterator.single(next)
    }
  }

  def deviceHealthTws(readings: Dataset[DeviceReading]): Dataset[DeviceHealth] = {
    import readings.sparkSession.implicits._
    readings
      .groupByKey(_.device_id)
      .transformWithState(new DeviceHealthProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** Idle-tracking state for [[DeviceIdleProcessor]] (`last_ms` epoch). */
  final case class IdleState(n_total: Long, last_ms: Long)
  final case class DeviceStatus(device_id: String, n_total: Long,
      last_ms: Long, status: String)

  /** transformWithState EVENT-TIME TIMER exercise (`stream_tws_timer_equiv`):
    * per device, every input batch re-arms one timer at the device's last
    * reading + `timeoutMs`; when the watermark passes it (the device went
    * silent) the timer FIRES and emits a final DEGRADED record from state.
    * A later reading supersedes a premature mid-stream fire (its ACTIVE
    * emission carries a higher batch id), so the last-emission-per-device
    * answer equals the pure event-time condition the oracle replays:
    * DEGRADED iff quantize(last + timeout) < final watermark.
    *
    * Timers are quantized UP to MINUTE grain and the row's sentinel
    * watermark sits MID-minute, so no timer can ever land on the eviction
    * boundary — whether Spark fires `<` or `<=` the watermark is
    * unobservable, and the oracle's `<` is exact by construction.
    */
  class DeviceIdleProcessor(timeoutMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, DeviceReading, DeviceStatus] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig, ValueState}
    @transient private var state: ValueState[IdleState] = _

    private def quantizeUp(ts: Long): Long = ((ts + 59999L) / 60000L) * 60000L

    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[IdleState](
        "idle", org.apache.spark.sql.Encoders.product[IdleState],
        TTLConfig.NONE)

    override def handleInputRows(deviceId: String,
        rows: Iterator[DeviceReading],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[DeviceStatus] = {
      val prev = Option(state.get()).getOrElse(IdleState(0L, Long.MinValue))
      var n = prev.n_total
      var last = prev.last_ms
      rows.foreach { r =>
        n += 1
        last = math.max(last, r.timestamp.getTime)
      }
      state.update(IdleState(n, last))
      // RE-ARM: exactly one live timer per device — drop stale ones, then
      // register at the new idle deadline (fired timers self-delete, so
      // listTimers is only ever 0- or 1-element)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(quantizeUp(last + timeoutMs))
      Iterator.single(DeviceStatus(deviceId, n, last, "ACTIVE"))
    }

    override def handleExpiredTimer(deviceId: String,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[DeviceStatus] = {
      // state outlives the fire: a reading arriving later re-activates the
      // device (and re-arms); until then the DEGRADED emission is final
      Option(state.get()) match {
        case Some(s) =>
          Iterator.single(DeviceStatus(deviceId, s.n_total, s.last_ms,
            "DEGRADED"))
        case None => Iterator.empty
      }
    }
  }

  /** transformWithState TTL exercise: a per-key running count whose
    * ValueState expires `ttlMs` after its last write (processing-time
    * TTL — Spark reclaims the entry without any timer or tombstone from
    * us). The 100 TB posture TTL exists for: keyed state on an unbounded
    * key domain (device ids, session ids) must self-reclaim, or the
    * store grows with every key ever seen. Deterministic assertions live
    * in StreamingOpsSpec (TTL is wall-clock — a driver oracle would
    * race), which proves both arms: a write inside the TTL horizon
    * continues the count, one beyond it starts over.
    */
  final case class KeyCount(key: String, n: Long)
  class TtlCountProcessor(ttlMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, String, KeyCount] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig, ValueState}
    @transient private var state: ValueState[Long] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Long](
        "cnt", org.apache.spark.sql.Encoders.scalaLong,
        TTLConfig(java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(key: String, rows: Iterator[String],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[KeyCount] = {
      val prev = if (state.exists()) state.get() else 0L
      val next = prev + rows.size
      state.update(next)
      Iterator.single(KeyCount(key, next))
    }
  }

  def ttlCounts(keys: Dataset[String], ttlMs: Long): Dataset[KeyCount] = {
    import keys.sparkSession.implicits._
    keys.groupByKey(identity)
      .transformWithState(new TtlCountProcessor(ttlMs),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        OutputMode.Update())
  }

  def deviceIdleTws(readings: Dataset[DeviceReading],
      timeoutMs: Long): Dataset[DeviceStatus] = {
    import readings.sparkSession.implicits._
    readings
      .groupByKey(_.device_id)
      .transformWithState(new DeviceIdleProcessor(timeoutMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Update())
  }

  /** Shared per-batch fold: event-ordered suspect-streak + health score. */
  private[stream] def foldReadings(prev: DeviceHealth,
      rows: Iterator[DeviceReading]): DeviceHealth = {
    val sorted = rows.toSeq.sortBy(_.timestamp.getTime)
    var nTotal = prev.n_total
    var nSuspect = prev.n_suspect
    var streak = prev.suspect_streak
    sorted.foreach { r =>
      nTotal += 1
      if (r.quality_flag.trim.equalsIgnoreCase("suspect")) {
        nSuspect += 1; streak += 1
      } else streak = 0
    }
    val score =
      if (nTotal == 0) 1.0
      else 1.0 - (nSuspect.toDouble / nTotal) - math.min(0.5, streak * 0.1)
    DeviceHealth(prev.device_id, nTotal, nSuspect, streak, math.max(0.0, score))
  }

  /** Per-device health state for mapGroupsWithState. */
  final case class DeviceReading(device_id: String, timestamp: java.sql.Timestamp,
      quality_flag: String, value: Double)
  final case class DeviceHealth(device_id: String, n_total: Long, n_suspect: Long,
      suspect_streak: Long, health_score: Double)

  /** Custom per-key state: running suspect-reading streaks and a health
    * score per device (the README's "device health scores",
    * README_DBT.md:199) via mapGroupsWithState. NoTimeout: with a timeout
    * configured, the default ASAP trigger schedules continuous empty
    * micro-batches to re-check timers — a busy loop committing state files
    * (observed in tests); device TTL belongs in a downstream compaction.
    */
  def deviceHealth(readings: Dataset[DeviceReading]): Dataset[DeviceHealth] = {
    import readings.sparkSession.implicits._
    readings
      .groupByKey(_.device_id)
      .mapGroupsWithState[DeviceHealth, DeviceHealth](GroupStateTimeout.NoTimeout) {
        (deviceId: String, rows: Iterator[DeviceReading], state: GroupState[DeviceHealth]) =>
          val prev = state.getOption.getOrElse(DeviceHealth(deviceId, 0L, 0L, 0L, 1.0))
          val next = foldReadings(prev, rows) // same fold as transformWithState
          state.update(next)
          next
      }
  }

  /** Open-session accumulator for [[sessionizeExplicit]] (epoch millis). */
  final case class SessionAcc(start: Long, end: Long, n: Long, cents: Long)
  final case class StreamSession(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, session_cents: Long)

  /** Gap sessionization with EXPLICIT state — the flatMapGroupsWithState
    * form of [[sessionize]], for when per-session logic outgrows what
    * `session_window` can express (custom folds, multi-record emission).
    * Emits zero or more CLOSED sessions per key per trigger — the
    * flatMap output shape mapGroupsWithState cannot produce — and holds
    * ONLY the open session in state (one small row per active user, not
    * per event). Sessions close two ways: a new event lands beyond the
    * gap (closed session emitted in the same trigger), or the event-time
    * timeout fires when the watermark passes `end + gap` — so an idle
    * key's last session still flushes and its state is reclaimed without
    * the key ever returning. Output matches [[sessionize]] row-for-row
    * (session_end = last event + gap), which the spec pins.
    */
  def sessionizeExplicit(events: DataFrame, gapMinutes: Int = 30,
      lateness: String = "1 hour"): Dataset[StreamSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    def closed(user: Long, s: SessionAcc) = StreamSession(user,
      new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end + gapMs),
      s.n, s.cents)
    events
      .withWatermark("ts", lateness)
      .select(col("user_id").cast("long"), col("ts"),
        round(col("value") * 100).cast("long"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionAcc, StreamSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, rows, state) =>
          if (state.hasTimedOut) {
            // watermark passed end + gap with no new events: flush + drop
            val out = state.getOption.map(closed(user, _)).iterator
            state.remove()
            out
          } else {
            // rows within a trigger arrive unordered — sort before folding
            val sorted = rows.map(r => (r._2.getTime, r._3)).toIndexedSeq.sortBy(_._1)
            val flushed = List.newBuilder[StreamSession]
            var cur = state.getOption
            sorted.foreach { case (t, c) =>
              cur = cur match {
                case Some(s) if t - s.end > gapMs =>
                  flushed += closed(user, s)
                  Some(SessionAcc(t, t, 1L, c))
                case Some(s) =>
                  Some(SessionAcc(s.start, math.max(s.end, t), s.n + 1L, s.cents + c))
                case None => Some(SessionAcc(t, t, 1L, c))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            flushed.result().iterator
          }
      }
  }
}
