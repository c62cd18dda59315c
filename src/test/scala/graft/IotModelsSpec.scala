package graft

import graft.model.IotModels
import org.apache.spark.sql.functions._

class IotModelsSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    // event_id, ts, user_id, event_type, value, props
    (1L, "2024-01-01T00:00:00", 10L, "click", 5.0, """{"k": 1}"""),
    (2L, "2024-01-01T01:00:00", 10L, "error", 9.0, """{"k": 2}"""),
    (3L, "2024-01-02T00:00:00", 11L, " Click ", 7.0, """{"k": 3}"""), // dirty-but-accepted
    (4L, "2024-01-02T05:00:00", 11L, "bogus", 1.0, """{"k": 4}"""),  // rejected
    (5L, "2024-02-01T00:00:00", 10L, "view", 3.0, """{"k": 5}"""),
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    .withColumn("ts", col("ts").cast("timestamp"))

  test("silver keeps normalized-accepted rows but projects the RAW value (hazard 3)") {
    val silver = IotModels.silver(events)
    val rows = silver.select("event_id", "event_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.keySet == Set(1L, 3L, 5L))
    assert(rows(3L) == " Click ") // raw spelling survives, like ' Good ' in the reference
  }

  test("silver is a subset of bronze (property)") {
    assert(IotModels.silver(events).count() <= events.count())
    assert(IotModels.silver(events)
      .join(events.select("event_id"), Seq("event_id"), "left_anti").isEmpty)
  }

  test("dim_date is unique on event_date and parts are consistent") {
    val d = IotModels.dimDate(events)
    assert(d.count() == d.select("event_date").distinct().count())
    assert(d.filter(year(col("event_date")) =!= col("yr")).isEmpty)
    assert(d.filter(month(col("event_date")) =!= col("mo")).isEmpty)
    assert(d.filter(dayofmonth(col("event_date")) =!= col("dy")).isEmpty)
  }

  test("fact avg_value lies within silver min/max (property)") {
    val silver = IotModels.silver(events)
    val (mn, mx) = silver.agg(min("value"), max("value")).as[(Double, Double)].head()
    val bad = IotModels.factEvents(events)
      .filter(col("avg_value") < mn || col("avg_value") > mx)
    assert(bad.isEmpty)
  }

  test("fact groups join to the right calendar parts") {
    val f = IotModels.factEvents(events).filter(col("user_id") === 10L && col("event_type") === "view")
    val row = f.select("yr", "mo", "avg_value").head()
    assert(row.getInt(0) == 2024 && row.getInt(1) == 2 && row.getDouble(2) == 3.0)
  }
}
