package graft

import graft.dq.Expectations
import graft.model.Cdc
import graft.stream.StreamAggs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class TierBSpec extends SparkSpec {
  import spark.implicits._

  // ---- Expectations (DLT EXPECT ... ON VIOLATION) ----

  private def readings = Seq(
    ("d1", "good", 20.0),
    ("d2", "bad", -5.0),
    ("d3", "good", 999.0),
    ("d4", null.asInstanceOf[String], 10.0),
  ).toDF("device_id", "quality_flag", "value")

  test("expectations: drop quarantines violating rows with reasons") {
    val res = Expectations(readings, Seq(
      Expectations.Expectation("valid_flag",
        col("quality_flag").isin("good", "suspect"), Expectations.Drop),
      Expectations.Expectation("valid_range",
        col("value").between(-100, 100), Expectations.Warn),
    ))
    assert(res.retained.count() == 2) // d1, d3 keep (d3 warns but stays)
    assert(res.violationCounts == Map("valid_flag" -> 2L, "valid_range" -> 1L))
    val qReasons = res.quarantined
      .select(col("device_id"), col("_failed_expectations"))
      .as[(String, Seq[String])].collect().toMap
    assert(qReasons("d2") == Seq("valid_flag"))
    assert(qReasons("d4") == Seq("valid_flag")) // null condition counts as violated
  }

  test("expectations: fail policy aborts on violation") {
    val ex = intercept[IllegalStateException] {
      Expectations(readings, Seq(
        Expectations.Expectation("no_negatives", col("value") >= 0, Expectations.Fail)))
    }
    assert(ex.getMessage.contains("no_negatives"))
  }

  test("expectations: counts are lazy without Fail, memoized on access") {
    // a column that detonates on EVALUATION: if apply() ran the count job
    // eagerly, constructing the result would already throw
    val boom = udf((i: Long) =>
      if (i >= 0) throw new RuntimeException("boom") else i)
    val lazyDf = spark.range(3).select(boom(col("id")).as("value"))
    val r = Expectations(lazyDf, Seq(
      Expectations.Expectation("pos", col("value") >= 0, Expectations.Drop)))
    // apply returned without touching a row; forcing the counts is what
    // finally evaluates the input and trips the detonator
    intercept[Exception](r.violationCounts)
    // and on a sane input the lazily-computed counts are correct and
    // stable across accesses (memoized, not recomputed per call)
    val ok = Expectations(readings, Seq(
      Expectations.Expectation("valid_flag",
        col("quality_flag").isin("good", "suspect"), Expectations.Drop)))
    assert(ok.retained.count() == 2)
    assert(ok.violationCounts == Map("valid_flag" -> 2L))
    assert(ok.violationCounts eq ok.violationCounts) // same memoized map
  }

  // ---- CDC → SCD1 ----

  private def cdcBatch = Seq(
    ("k1", "v1", 1L, "c"),
    ("k1", "v2", 2L, "u"),
    ("k2", "w1", 1L, "c"),
    ("k2", "w2", 3L, "d"),
    ("k3", "x1", 5L, "c"),
  ).toDF("key", "payload", "_commit_ts", "_op")

  test("scd1 keeps latest non-deleted row per key") {
    val state = Cdc.scd1(cdcBatch, Seq("key"))
    val m = state.select("key", "payload").as[(String, String)].collect().toMap
    assert(m == Map("k1" -> "v2", "k3" -> "x1")) // k2 soft-deleted
  }

  test("scd1 merge is idempotent and applies updates") {
    val state0 = Cdc.scd1(cdcBatch, Seq("key"))
    val batch2 = Seq(
      ("k1", "v3", 10L, "u"),
      ("k4", "y1", 11L, "c"),
      ("k3", "x1", 12L, "d"),
    ).toDF("key", "payload", "_commit_ts", "_op")
    val state1 = Cdc.merge(state0, batch2, Seq("key"))
    val m = state1.select("key", "payload").as[(String, String)].collect().toMap
    assert(m == Map("k1" -> "v3", "k4" -> "y1"))
    val state2 = Cdc.merge(state1, batch2, Seq("key"))
    assert(state2.select("key", "payload").as[(String, String)].collect().toMap == m)
  }

  test("scd2 builds version intervals; deletes close without opening") {
    val hist = Cdc.scd2(cdcBatch, Seq("key"))
      .select("key", "payload", "valid_from", "valid_to", "is_current")
      .as[(String, String, Long, Option[Long], Boolean)]
      .collect().toSet
    assert(hist == Set(
      ("k1", "v1", 1L, Some(2L), false),
      ("k1", "v2", 2L, None, true),
      ("k2", "w1", 1L, Some(3L), false), // closed by the delete, no successor
      ("k3", "x1", 5L, None, true),
    ))
  }

  test("scd2 merge == full-log rebuild, keeps delete gaps, idempotent") {
    val hist0 = Cdc.scd2(cdcBatch, Seq("key"))
    val batch2 = Seq(
      ("k1", "v3", 10L, "u"),
      ("k2", "w3", 12L, "c"), // key resurrected after its delete gap
    ).toDF("key", "payload", "_commit_ts", "_op")
    val merged = Cdc.scd2Merge(hist0, batch2, Seq("key"))
    val rebuilt = Cdc.scd2(cdcBatch.unionByName(batch2), Seq("key"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("key", "payload", "valid_from", "valid_to", "is_current")
        .as[(String, String, Long, Option[Long], Boolean)].collect().toSet
    assert(canon(merged) == canon(rebuilt))
    // the delete gap survived: w1 closed at 3, w3 opens at 12
    assert(canon(merged).contains(("k2", "w1", 1L, Some(3L), false)))
    assert(canon(merged).contains(("k2", "w3", 12L, None, true)))
    assert(canon(Cdc.scd2Merge(merged, batch2, Seq("key"))) == canon(merged))
  }

  // ---- Streaming aggregations ----

  test("hourly metrics with watermark: streaming result == batch result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val streamDf = mem.toDF().toDF("timestamp", "sensor_type", "value")
    val q = StreamAggs.hourlyMetrics(streamDf)
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData((ts("2024-01-01 10:05:00"), "temperature", 20.0),
      (ts("2024-01-01 10:55:00"), "temperature", 30.0),
      (ts("2024-01-01 11:10:00"), "pressure", 1000.0))
    q.processAllAvailable()
    // advance watermark far enough to close the 10:00 and 11:00 windows
    mem.addData((ts("2024-01-01 15:00:00"), "temperature", 25.0))
    q.processAllAvailable()
    val streamed = spark.table("hourly_out")
    val batch = StreamAggs.hourlyMetrics(
      Seq((ts("2024-01-01 10:05:00"), "temperature", 20.0),
        (ts("2024-01-01 10:55:00"), "temperature", 30.0),
        (ts("2024-01-01 11:10:00"), "pressure", 1000.0),
        (ts("2024-01-01 15:00:00"), "temperature", 25.0))
        .toDF("timestamp", "sensor_type", "value"))
    // closed windows must agree with batch exactly
    val closed = batch.filter(col("hour_start") < ts("2024-01-01 12:00:00"))
    assert(closed.exceptAll(streamed).isEmpty,
      "closed streaming windows must equal batch computation")
    val t10 = streamed.filter(col("hour_start") === ts("2024-01-01 10:00:00"))
      .select("n_events", "avg_value").as[(Long, Double)].collect()
    assert(t10.sameElements(Array((2L, 25.0))))
    q.stop()
  }

  test("stream-static broadcast join enriches streaming rows") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("l1", "Berlin"), ("l2", "Tokyo")).toDF("location_id", "city")
    val mem = MemoryStream[(String, Double)]
    val joined = mem.toDF().toDF("location_id", "value")
      .join(broadcast(dim), Seq("location_id"), "left_outer")
    val q = joined.writeStream.format("memory").queryName("enriched_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    mem.addData(("l1", 1.0), ("l3", 2.0))
    q.processAllAvailable()
    val rows = spark.table("enriched_out")
      .select("location_id", "city").as[(String, Option[String])].collect().toMap
    assert(rows("l1").contains("Berlin"))
    assert(rows("l3").isEmpty) // unmatched streaming row keeps null city
    q.stop()
  }

  test("deviceHealth mapGroupsWithState tracks suspect streaks across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamAggs.DeviceReading]
    val q = StreamAggs.deviceHealth(mem.toDS())
      .writeStream.format("memory").queryName("health_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
      .start()
    def r(d: String, t: String, f: String) =
      StreamAggs.DeviceReading(d, java.sql.Timestamp.valueOf(t), f, 1.0)
    mem.addData(r("d1", "2024-01-01 10:00:00", "good"),
      r("d1", "2024-01-01 10:01:00", "suspect"))
    q.processAllAvailable()
    mem.addData(r("d1", "2024-01-01 10:02:00", "suspect"))
    q.processAllAvailable()
    val rows = spark.table("health_out")
      .orderBy(col("n_total"))
      .as[StreamAggs.DeviceHealth].collect()
    val last = rows.last
    assert(last.n_total == 3 && last.n_suspect == 2 && last.suspect_streak == 2)
    assert(last.health_score < 1.0)
    q.stop()
  }
}
