package graft

import graft.schema.Typed
import org.apache.spark.sql.functions._

class TypedSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("typed silver matches the DataFrame silver exactly") {
    val typed = Typed.silver(Typed.events(spark, dir))
      .select("event_id", "event_date", "user_id", "event_type", "value")
    val untyped = graft.model.IotModels.silver(Tables.events(spark, dir))
      .select("event_id", "event_date", "user_id", "event_type", "value")
    assert(typed.exceptAll(untyped).isEmpty && untyped.exceptAll(typed).isEmpty)
  }

  test("typed groupByKey stats equal the DataFrame aggregation") {
    val typed = Typed.userDailyStats(Typed.silver(Typed.events(spark, dir)))
      .select("user_id", "event_date", "n_events", "total_cents")
    val untyped = graft.model.IotModels.silver(Tables.events(spark, dir))
      .groupBy("user_id", "event_date")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("total_cents"))
      .select("user_id", "event_date", "n_events", "total_cents")
    assert(typed.exceptAll(untyped).isEmpty && untyped.exceptAll(typed).isEmpty)
  }
}
