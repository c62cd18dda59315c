package graft.schema

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed Dataset surface (SURVEY.md §1.2 "optional Dataset[IotEvent] typed
  * view of silver for compile-time safety"): case-class encoders over the
  * engine's tables, with the silver transform expressed as typed
  * operations. DataFrames remain the engine's universal currency; this
  * layer exists where compile-time field checks pay for themselves (library
  * consumers writing business logic against a fixed schema).
  *
  * The typed filter/map here compile to the same deserialize→filter→
  * serialize plan Catalyst gives any typed pipeline — fine for business
  * logic, but the DataFrame column forms stay preferable in hot paths
  * (no object materialization).
  */
object Typed {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  final case class CleanEvent(event_id: Long, event_date: java.sql.Date,
      user_id: Long, event_type: String, value: Double)

  final case class UserDailyStat(user_id: Long, event_date: java.sql.Date,
      n_events: Long, total_cents: Long)

  /** Typed view over the events table (ns timestamp already normalized by
    * Tables.events).
    */
  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    graft.Tables.events(spark, dir).as[Event]
  }

  private val accepted = graft.model.IotModels.AcceptedEventTypes.toSet

  /** Silver as typed operations: the same semantics as IotModels.silver
    * (normalized filter, raw projection) with compile-time field access.
    */
  def silver(ds: Dataset[Event]): Dataset[CleanEvent] = {
    import ds.sparkSession.implicits._
    ds.filter(e => accepted.contains(e.event_type.trim.toLowerCase))
      .map(e => CleanEvent(e.event_id,
        new java.sql.Date(e.ts.getTime - math.floorMod(e.ts.getTime, 86400000L)),
        e.user_id, e.event_type, e.value))
  }

  /** Typed groupByKey aggregation: per-user-per-day stats with exact cents. */
  def userDailyStats(ds: Dataset[CleanEvent]): Dataset[UserDailyStat] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(e => (e.user_id, e.event_date.toString))
      .mapGroups { (key: (Long, String), rows: Iterator[CleanEvent]) =>
        var n = 0L
        var cents = 0L
        rows.foreach { e => n += 1; cents += math.round(e.value * 100) }
        UserDailyStat(key._1, java.sql.Date.valueOf(key._2), n, cents)
      }
  }
}
