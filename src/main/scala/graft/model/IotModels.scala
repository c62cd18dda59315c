package graft.model

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-parity medallion models, re-expressed over the driver's `events`
  * table (role mapping in FIXTURES.md §B: user_id→location_id-like key,
  * event_type→sensor_type-like enum, ts→timestamp, value→value).
  *
  * Reference semantics (cited into /root/reference, read-only):
  *  - silver projection/cast/filter: models/silver/iot_events/silver_iot_events.sql:13-22
  *    (column projection, `cast(timestamp as timestamp)`, normalized IN-list
  *    filter `lower(trim(quality_flag)) in (...)`).
  *  - dim_locations GROUP BY-as-DISTINCT: models/gold/core/dim_locations.sql:9-12
  *  - dim_date DISTINCT over derived date parts: models/gold/core/dim_date.sql:8-15
  *    (normalized to `.distinct()` — the raw SQL is invalid under strict
  *    analysis, see SURVEY.md §7.4 hazard 1).
  *  - fact: left-outer joins + multi-key avg aggregate:
  *    models/gold/core/fact_iot_events.sql:15-25.
  *
  * All plans are shuffle-minimal by construction: silver is a stateless
  * project+filter (pushed to the parquet scan); dim_date is tiny and is
  * broadcast into the fact join; the fact aggregation is a single hash
  * aggregate with map-side partial aggregation.
  */
object IotModels {

  /** Event types the silver layer admits (≡ quality_flag ∈ {good,suspect}).
    * 'error' rows are filtered out, mirroring the reference's quality gate.
    */
  val AcceptedEventTypes: Seq[String] = Seq("click", "view", "purchase", "signup")

  /** Silver: projection + cast + normalized IN-list filter (A8–A10).
    * Keeps the raw `event_type` in the output while filtering on the
    * normalized form — faithful to the reference's asymmetry
    * (silver_iot_events.sql:18 vs :22, SURVEY.md §7.4 hazard 3).
    */
  def silver(events: DataFrame): DataFrame =
    events
      .select(
        col("event_id"),
        col("user_id"),
        col("ts").cast("timestamp").as("ts"),
        to_date(col("ts")).as("event_date"),
        col("event_type"),
        col("value"),
        col("props"),
      )
      .filter(lower(trim(col("event_type"))).isin(AcceptedEventTypes: _*))

  /** dim_users ≡ dim_locations (GROUP BY as DISTINCT, A15). */
  def dimUsers(events: DataFrame): DataFrame =
    events.select("user_id").distinct()

  /** dim_date: DISTINCT over derived date parts (A16, normalized form). */
  def dimDate(events: DataFrame): DataFrame =
    events
      .select(
        to_date(col("ts")).as("event_date"),
        year(to_date(col("ts"))).as("yr"),
        month(to_date(col("ts"))).as("mo"),
        dayofmonth(to_date(col("ts"))).as("dy"),
      )
      .distinct()

  /** Fact: silver ⟕ dim_date on the derived date key (expression-key join,
    * A13) then a multi-key hash aggregate with AVG (A14). dim_date is tiny
    * (≤ a few thousand rows at any sf) → explicit broadcast, so the only
    * shuffle in the whole plan is the final aggregation exchange. At 100 TB
    * the same shape holds: the dim side stays calendar-sized.
    */
  def factEvents(events: DataFrame): DataFrame = {
    val s = silver(events)
    val d = dimDate(events).select("event_date", "yr", "mo")
    s.join(broadcast(d), Seq("event_date"), "left_outer")
      .groupBy(col("user_id"), col("event_type"), col("yr"), col("mo"))
      .agg(
        // avg from exact cents: integer sums are order-independent, and the
        // long/long/100.0 double quotient is bit-identical across engines —
        // round(avg(double)) would flip at .xxxx5 boundaries.
        (sum(round(col("value") * 100).cast("long")) / count(lit(1)) / 100.0)
          .as("avg_value"),
        count(lit(1)).as("n_events"),
      )
  }

  private val acceptedSqlList = AcceptedEventTypes.map(s => s"'$s'").mkString(", ")

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "silver_events",
      (sp, dir) =>
        silver(Tables.events(sp, dir))
          .select("event_id", "user_id", "event_date", "event_type", "value")
          .orderBy("event_id"),
      Some(
        s"""SELECT event_id, user_id, CAST(ts AS DATE) AS event_date, event_type, value
           |FROM events
           |WHERE lower(trim(event_type)) IN ($acceptedSqlList)
           |ORDER BY event_id""".stripMargin),
    ),
    QueryDef(
      "dim_users",
      (sp, dir) => dimUsers(Tables.events(sp, dir)).orderBy("user_id"),
      Some("SELECT DISTINCT user_id FROM events ORDER BY user_id"),
    ),
    QueryDef(
      "dim_date",
      (sp, dir) => dimDate(Tables.events(sp, dir)).orderBy("event_date"),
      Some(
        """SELECT DISTINCT CAST(ts AS DATE) AS event_date,
          |       year(CAST(ts AS DATE)) AS yr,
          |       month(CAST(ts AS DATE)) AS mo,
          |       day(CAST(ts AS DATE)) AS dy
          |FROM events
          |ORDER BY event_date""".stripMargin),
    ),
    QueryDef(
      "fact_events",
      (sp, dir) =>
        factEvents(Tables.events(sp, dir))
          .orderBy("user_id", "event_type", "yr", "mo"),
      Some(
        s"""WITH silver AS (
           |  SELECT user_id, CAST(ts AS DATE) AS event_date, event_type, value
           |  FROM events
           |  WHERE lower(trim(event_type)) IN ($acceptedSqlList)
           |), dim_date AS (
           |  SELECT DISTINCT CAST(ts AS DATE) AS event_date,
           |         year(CAST(ts AS DATE)) AS yr, month(CAST(ts AS DATE)) AS mo
           |  FROM events
           |)
           |SELECT s.user_id, s.event_type, d.yr, d.mo,
           |       sum(CAST(round(s.value * 100) AS BIGINT)) / count(*) / 100.0 AS avg_value,
           |       count(*) AS n_events
           |FROM silver s LEFT JOIN dim_date d ON s.event_date = d.event_date
           |GROUP BY s.user_id, s.event_type, d.yr, d.mo
           |ORDER BY s.user_id, s.event_type, d.yr, d.mo""".stripMargin),
    ),
    // HAVING-on-aggregate pattern (A11/A17), non-empty variant: per-user
    // totals above a threshold. Money sums go through exact cents (BIGINT)
    // to stay bit-identical across engines regardless of summation order.
    QueryDef(
      "user_totals",
      (sp, dir) =>
        Tables.events(sp, dir)
          .groupBy("user_id")
          .agg(
            (sum(round(col("value") * 100).cast("long")) / 100.0).as("total_value"),
            count(lit(1)).as("n"),
          )
          .filter(col("total_value") > 1000.0)
          .orderBy("user_id"),
      Some(
        """SELECT user_id,
          |       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value,
          |       count(*) AS n
          |FROM events
          |GROUP BY user_id
          |HAVING sum(CAST(round(value * 100) AS BIGINT)) / 100.0 > 1000.0
          |ORDER BY user_id""".stripMargin),
    ),
  )
}
