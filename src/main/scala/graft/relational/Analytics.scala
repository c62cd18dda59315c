package graft.relational

import graft.{QueryDef, Tables}
import graft.functions.Canon.roundCanon
import org.apache.spark.sql.functions._

/** Product-analytics shapes over the event stream plus an exact-arithmetic
  * embedding reduction: funnel conversion (first-touch ordering between
  * event types), cohort retention (first-seen cohort × week offset), and
  * per-label embedding centroids in integer units.
  *
  * Scale notes (100 TB): funnel and cohort both reduce events to one row
  * per user FIRST (min-timestamp aggregate — map-side combinable), so the
  * wide join carries |users|, not |events|; retention counts distinct
  * users per (cohort, week) after that reduction. The centroid build is a
  * single two-phase aggregate over fixed-width element_at projections —
  * no explode, no shuffle of the vectors themselves, and integer-unit
  * sums keep it bit-exact at any partitioning (double sums would not be).
  */
object Analytics {

  val all: Seq[QueryDef] = Seq(

    // ---- funnel: of users whose first view happened on day D, how many
    //      purchased at-or-after that first view. ----
    QueryDef(
      "q_funnel_conversion",
      (sp, dir) => {
        val ev = Tables.events(sp, dir)
        val firstView = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("first_view"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("p_ts"))
        firstView.join(purchases, Seq("user_id"), "left")
          .groupBy(col("user_id"), col("first_view"))
          .agg(max(when(col("p_ts") >= col("first_view"), 1).otherwise(0))
            .as("converted"))
          .groupBy(to_date(col("first_view")).as("cohort_date"))
          .agg(count(lit(1)).as("n_viewers"),
            sum("converted").cast("long").as("n_converted"))
          .withColumn("conversion",
            roundCanon(col("n_converted") * 1.0 / col("n_viewers"), 4))
          .orderBy("cohort_date")
      },
      Some(
        """WITH fv AS (
          |  SELECT user_id, min(ts) AS first_view
          |  FROM events WHERE event_type = 'view' GROUP BY 1),
          |u AS (
          |  SELECT fv.user_id, fv.first_view,
          |         max(CASE WHEN p.ts >= fv.first_view THEN 1 ELSE 0 END)
          |           AS converted
          |  FROM fv LEFT JOIN events p
          |    ON p.user_id = fv.user_id AND p.event_type = 'purchase'
          |  GROUP BY 1, 2)
          |SELECT CAST(first_view AS DATE) AS cohort_date,
          |       count(*) AS n_viewers,
          |       CAST(sum(converted) AS BIGINT) AS n_converted,
          |       round(sum(converted) * 1.0 / count(*), 4) + 0.0 AS conversion
          |FROM u GROUP BY 1 ORDER BY cohort_date""".stripMargin),
    ),

    // ---- cohort retention: users bucketed by first-seen date, activity
    //      counted per whole-week offset from their cohort day. ----
    QueryDef(
      "q_cohort_retention",
      (sp, dir) => {
        val ev = Tables.events(sp, dir)
          .select(col("user_id"), to_date(col("ts")).as("d"))
        val cohort = ev.groupBy("user_id").agg(min("d").as("cohort_date"))
        ev.join(cohort, Seq("user_id"))
          .withColumn("week_offset",
            expr("datediff(d, cohort_date) div 7"))
          .groupBy("cohort_date", "week_offset")
          .agg(count_distinct(col("user_id")).cast("long").as("n_active"))
          .orderBy("cohort_date", "week_offset")
      },
      Some(
        """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
          |c AS (SELECT user_id, min(d) AS cohort_date FROM e GROUP BY 1)
          |SELECT c.cohort_date,
          |       date_diff('day', c.cohort_date, e.d) // 7 AS week_offset,
          |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
          |FROM e JOIN c ON c.user_id = e.user_id
          |GROUP BY 1, 2 ORDER BY cohort_date, week_offset""".stripMargin),
    ),

    // ---- per-label centroid in integer units (first 4 dims): the class
    //      prototype build behind IVF/classification, with order-
    //      independent integer sums instead of order-dependent double
    //      accumulation. ----
    QueryDef(
      "emb_label_centroid",
      (sp, dir) => {
        def units(i: Int) =
          sum(round(element_at(col("embedding"), i).cast("double") * 10000)
            .cast("long")).cast("long")
        Tables.embeddings(sp, dir)
          .groupBy("label")
          .agg(count(lit(1)).as("n_vecs"),
            units(1).as("c0_units"), units(2).as("c1_units"),
            units(3).as("c2_units"), units(4).as("c3_units"))
          .withColumn("c0_mean", col("c0_units") / col("n_vecs") / 10000.0)
          .orderBy("label")
      },
      Some(
        """SELECT label, count(*) AS n_vecs,
          |       CAST(sum(CAST(round(CAST(embedding[1] AS DOUBLE) * 10000) AS BIGINT)) AS BIGINT) AS c0_units,
          |       CAST(sum(CAST(round(CAST(embedding[2] AS DOUBLE) * 10000) AS BIGINT)) AS BIGINT) AS c1_units,
          |       CAST(sum(CAST(round(CAST(embedding[3] AS DOUBLE) * 10000) AS BIGINT)) AS BIGINT) AS c2_units,
          |       CAST(sum(CAST(round(CAST(embedding[4] AS DOUBLE) * 10000) AS BIGINT)) AS BIGINT) AS c3_units,
          |       CAST(sum(CAST(round(CAST(embedding[1] AS DOUBLE) * 10000) AS BIGINT)) AS BIGINT)
          |         / count(*) / 10000.0 AS c0_mean
          |FROM embeddings GROUP BY label ORDER BY label""".stripMargin),
    ),

    // ---- grouped OLS trend via EXACT integer normal equations: the
    //      per-group model-fit shape (one tiny regression per group,
    //      computed distributively from sufficient statistics — the
    //      groupBy carries five integer sums per group, never rows).
    //      slope = num/den with num = n·Σxy − Σx·Σy and den = n·Σx² −
    //      (Σx)², both BIGINT-exact, so the cross-engine hash cannot
    //      drift on double summation order; x is CENTERED (days since
    //      Jan-1) to keep the products far from int64 overflow at scale.
    //      Consumers divide; the row ships the exact fraction. ----
    QueryDef(
      "q_regression_exact",
      (sp, dir) => {
        val d = Tables.events(sp, dir)
          .select(col("event_type"),
            datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
              .cast("long").as("x"),
            round(col("value") * 100).cast("long").as("y"))
        d.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .select(col("event_type"), col("n"),
            (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
            (col("n") * col("sxx") - col("sx") * col("sx")).as("slope_den"))
          .orderBy("event_type")
      },
      Some(
        """WITH d AS (
          |  SELECT event_type,
          |         CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
          |         CAST(round(value * 100) AS BIGINT) AS y
          |  FROM events),
          |s AS (
          |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
          |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          |         CAST(sum(x * y) AS BIGINT) AS sxy,
          |         CAST(sum(x * x) AS BIGINT) AS sxx
          |  FROM d GROUP BY event_type)
          |SELECT event_type, n,
          |       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
          |       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den
          |FROM s ORDER BY event_type""".stripMargin),
    ),
  )
}
