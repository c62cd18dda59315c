package graft.relational

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second tranche of the relational surface: analytic windows (lag/lead/
  * rank/ntile/first-last), CUBE grouping sets, full-outer joins, bag set
  * ops, date arithmetic, string functions, percentiles, conditional
  * aggregation — the long tail of SURVEY.md §2.3–§2.6 "free from built-ins"
  * coverage, each pinned to a DuckDB oracle.
  *
  * Determinism rules as in Relational: total ORDER BY everywhere, exact
  * integer arithmetic for anything summed, window orderings carry unique
  * tie-breakers.
  */
object Relational2 {

  private def centsSum(c: Column): Column = sum(round(c * 100).cast("long"))

  val all: Seq[QueryDef] = Seq(

    // ---- analytic windows: lag/lead over per-user event sequences ----
    QueryDef(
      "q_lag_lead",
      (sp, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        Tables.events(sp, dir)
          .withColumn("cents", round(col("value") * 100).cast("long"))
          .select(col("event_id"), col("user_id"),
            lag(col("cents"), 1).over(w).as("prev_cents"),
            lead(col("cents"), 1).over(w).as("next_cents"),
            (col("cents") - coalesce(lag(col("cents"), 1).over(w), lit(0L))).as("delta_cents"))
          .orderBy("event_id")
      },
      Some(
        """SELECT event_id, user_id,
          |       lag(cents, 1) OVER w AS prev_cents,
          |       lead(cents, 1) OVER w AS next_cents,
          |       cents - coalesce(lag(cents, 1) OVER w, 0) AS delta_cents
          |FROM (SELECT event_id, user_id, CAST(round(value * 100) AS BIGINT) AS cents FROM events)
          |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
          |ORDER BY event_id""".stripMargin),
    ),

    // ---- rank / dense_rank / ntile over order totals per customer ----
    QueryDef(
      "q_rank_orders",
      (sp, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(sp, dir)
          .select(col("o_custkey"), col("o_orderkey"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            ntile(4).over(w).as("quartile"))
          .filter(col("rnk") <= 3)
          .orderBy("o_custkey", "rnk", "o_orderkey")
      },
      Some(
        """SELECT o_custkey, o_orderkey, rnk, drnk, quartile FROM (
          |  SELECT o_custkey, o_orderkey,
          |         rank() OVER w AS rnk,
          |         dense_rank() OVER w AS drnk,
          |         ntile(4) OVER w AS quartile
          |  FROM orders
          |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey))
          |WHERE rnk <= 3
          |ORDER BY o_custkey, rnk, o_orderkey""".stripMargin),
    ),

    // ---- first/last value over frames ----
    QueryDef(
      "q_first_last",
      (sp, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.orders(sp, dir)
          .select(col("o_custkey"),
            first(col("o_orderkey")).over(w).as("first_order"),
            last(col("o_orderkey")).over(w).as("last_order"))
          .distinct()
          .orderBy("o_custkey")
      },
      Some(
        """SELECT DISTINCT o_custkey,
          |       first_value(o_orderkey) OVER w AS first_order,
          |       last_value(o_orderkey) OVER w AS last_order
          |FROM orders
          |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
          |ORDER BY o_custkey""".stripMargin),
    ),

    // ---- CUBE grouping sets ----
    QueryDef(
      "q_cube_orders",
      (sp, dir) =>
        Tables.orders(sp, dir)
          .cube("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"),
            centsSum(col("o_totalprice")).as("total_cents"))
          .orderBy(col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first),
      Some(
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
          |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
          |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
          |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin),
    ),

    // ---- full outer join: users seen in events vs customers ----
    QueryDef(
      "q_full_outer",
      (sp, dir) => {
        val eventUsers = Tables.events(sp, dir)
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
        val custs = Tables.customer(sp, dir)
          .filter(col("c_custkey") <= 200)
          .select(col("c_custkey"), col("c_mktsegment"))
        eventUsers.join(custs, col("user_id") === col("c_custkey"), "full_outer")
          .select(
            coalesce(col("user_id"), col("c_custkey")).as("id"),
            col("n_events"), col("c_mktsegment"))
          .orderBy("id")
      },
      Some(
        """SELECT coalesce(e.user_id, c.c_custkey) AS id, e.n_events, c.c_mktsegment
          |FROM (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id) e
          |FULL OUTER JOIN (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey <= 200) c
          |  ON e.user_id = c.c_custkey
          |ORDER BY id""".stripMargin),
    ),

    // ---- bag semantics: UNION ALL + EXCEPT ALL ----
    QueryDef(
      "q_union_except_all",
      (sp, dir) => {
        val o = Tables.orders(sp, dir)
        val a = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
        val b = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
        a.unionAll(b).exceptAll(b)
          .groupBy("o_custkey").agg(count(lit(1)).as("n"))
          .orderBy("o_custkey")
      },
      Some(
        """SELECT o_custkey, count(*) AS n FROM (
          |  SELECT o_custkey FROM (
          |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
          |    UNION ALL
          |    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
          |  EXCEPT ALL
          |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
          |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin),
    ),

    // ---- date arithmetic: ship delay days, ISO weekday buckets ----
    QueryDef(
      "q_date_arith",
      (sp, dir) => {
        val li = Tables.lineitem(sp, dir).select("l_orderkey", "l_shipdate")
        val o = Tables.orders(sp, dir).select("o_orderkey", "o_orderdate")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .select(
            datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))).as("delay_days"),
            (weekday(to_date(col("l_shipdate"))) + 1).as("iso_dow"))
          .groupBy("iso_dow")
          .agg(count(lit(1)).as("n"),
            sum(col("delay_days").cast("long")).as("total_delay"),
            max(col("delay_days")).as("max_delay"))
          .orderBy("iso_dow")
      },
      Some(
        """SELECT isodow(CAST(l_shipdate AS DATE)) AS iso_dow, count(*) AS n,
          |       CAST(sum(CAST(datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS BIGINT)) AS BIGINT) AS total_delay,
          |       max(datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS max_delay
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |GROUP BY isodow(CAST(l_shipdate AS DATE)) ORDER BY iso_dow""".stripMargin),
    ),

    // ---- string functions: LIKE, substr, concat, replace, lpad ----
    QueryDef(
      "q_string_funcs",
      (sp, dir) =>
        Tables.part(sp, dir)
          .filter(col("p_name").like("%gold%") || col("p_type").like("PROMO%"))
          .select(
            col("p_partkey"),
            upper(substring(col("p_brand"), 1, 5)).as("brand5"),
            concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
            regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
            lpad(col("p_size").cast("string"), 4, "0").as("size_padded"))
          .orderBy("p_partkey"),
      Some(
        """SELECT p_partkey,
          |       upper(substring(p_brand, 1, 5)) AS brand5,
          |       concat_ws('|', p_brand, p_type) AS brand_type,
          |       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
          |       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
          |FROM part
          |WHERE p_name LIKE '%gold%' OR p_type LIKE 'PROMO%'
          |ORDER BY p_partkey""".stripMargin),
    ),

    // ---- approx percentile, DRIVER-CHECKED against the exact ones: the
    //      approx sketch's pick is engine-defined (DuckDB's quantile
    //      interpolates differently), but the plan can BRACKET it between
    //      the exact p45/p55 (Spark's exact `percentile` over integer
    //      cents) and emit a flag the oracle pins — a sketch gone wrong
    //      fails the hash gate, not just a unit test. min/max stay
    //      exact-valued columns. ----
    QueryDef(
      "q_percentiles",
      (sp, dir) =>
        Tables.orders(sp, dir)
          .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
          .groupBy("o_orderstatus")
          .agg(
            percentile_approx(col("cents"), lit(0.5), lit(1000000)).as("p50a"),
            percentile(col("cents"), lit(0.45)).as("lo"),
            percentile(col("cents"), lit(0.55)).as("hi"),
            min(col("cents")).as("min_cents"),
            max(col("cents")).as("max_cents"))
          .select(col("o_orderstatus"),
            (col("p50a") >= col("lo") && col("p50a") <= col("hi"))
              .cast("int").as("p50_ok"),
            col("min_cents"), col("max_cents"))
          .orderBy("o_orderstatus"),
      Some(
        """SELECT o_orderstatus, 1 AS p50_ok,
          |       min(CAST(round(o_totalprice * 100) AS BIGINT)) AS min_cents,
          |       max(CAST(round(o_totalprice * 100) AS BIGINT)) AS max_cents
          |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
    ),

    // ---- median via exact interpolation (oracled) ----
    QueryDef(
      "q_median",
      (sp, dir) =>
        Tables.orders(sp, dir)
          .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
          .groupBy("o_orderstatus")
          .agg(median(col("cents")).as("median_cents"), count(lit(1)).as("n"))
          .orderBy("o_orderstatus"),
      Some(
        """SELECT o_orderstatus,
          |       median(CAST(round(o_totalprice * 100) AS BIGINT)) AS median_cents,
          |       count(*) AS n
          |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
    ),

    // ---- conditional aggregation: count_if / sum(CASE) / avg over filter ----
    QueryDef(
      "q_conditional_agg",
      (sp, dir) =>
        Tables.lineitem(sp, dir)
          .groupBy("l_returnflag")
          .agg(
            count_if(col("l_discount") > 0.05).as("n_discounted"),
            sum(when(col("l_tax") > 0.04, col("l_quantity").cast("long")).otherwise(0L))
              .as("taxed_qty"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      Some(
        """SELECT l_returnflag,
          |       count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
          |       CAST(sum(CASE WHEN l_tax > 0.04 THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS taxed_qty,
          |       count(*) AS n
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    ),

    // ---- sessionization: gap-based session ids via lag + running sum,
    //      then per-session rollup (the canonical event-stream pattern) ----
    QueryDef(
      "q_sessionize",
      (sp, dir) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        val runsum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(sp, dir)
          .withColumn("epoch_s", unix_timestamp(col("ts")))
          .withColumn("gap_s", col("epoch_s") - lag(col("epoch_s"), 1).over(byUser))
          .withColumn("is_break",
            when(col("gap_s").isNull || col("gap_s") > 1800, 1L).otherwise(0L))
          .withColumn("session_num", sum(col("is_break")).over(runsum))
          .groupBy("user_id", "session_num")
          .agg(count(lit(1)).as("n_events"),
            min(col("event_id")).as("first_event"),
            max(col("event_id")).as("last_event"),
            sum(round(col("value") * 100).cast("long")).as("session_cents"))
          .orderBy("user_id", "session_num")
      },
      Some(
        """WITH e AS (
          |  SELECT user_id, event_id, value,
          |         CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
          |  FROM events),
          |flags AS (
          |  SELECT *, CASE WHEN epoch_s - lag(epoch_s, 1) OVER w IS NULL
          |                   OR epoch_s - lag(epoch_s, 1) OVER w > 1800
          |                 THEN 1 ELSE 0 END AS is_break
          |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
          |sessions AS (
          |  SELECT *, CAST(sum(is_break) OVER (PARTITION BY user_id ORDER BY event_id
          |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_num
          |  FROM flags)
          |SELECT user_id, session_num, count(*) AS n_events,
          |       min(event_id) AS first_event, max(event_id) AS last_event,
          |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS session_cents
          |FROM sessions GROUP BY user_id, session_num
          |ORDER BY user_id, session_num""".stripMargin),
    ),

    // ---- approx distinct (HLL) beside the exact count: the scale path for
    //      COUNT(DISTINCT). The raw sketch value is engine-specific, so it
    //      cannot appear in a hash-compared column — instead the row
    //      carries the exact count (independently recomputed by the
    //      oracle) plus `sketch_ok`, the IN-ENGINE assertion that the HLL
    //      estimate landed within 3× its configured rsd (0.05) of the
    //      exact value. The oracle emits TRUE for that column: if Spark's
    //      sketch ever drifts out of bound, the boolean flips and the
    //      hash gate fails — the sketch error is checked on every
    //      correctness run, not just in ScalaTest. ----
    QueryDef(
      "q_approx_distinct",
      (sp, dir) =>
        Tables.lineitem(sp, dir)
          .groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_partkey")).as("exact_parts"),
            approx_count_distinct(col("l_partkey"), 0.05).as("approx_parts"))
          .select(col("l_returnflag"), col("exact_parts"),
            (abs(col("approx_parts") - col("exact_parts")) <=
              col("exact_parts") * 0.15).as("sketch_ok"))
          .orderBy("l_returnflag"),
      Some(
        """SELECT l_returnflag,
          |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
          |       TRUE AS sketch_ok
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    ),

    // ---- COUNT-MIN SKETCH beside the exact heavy-hitter counts — the
    //      streaming-frequency sketch family (CMS is mergeable: per-
    //      partition sketches OR together, fixed width×depth bytes cross
    //      the shuffle regardless of corpus size). CMS only ever
    //      OVER-estimates, so the in-plan check pins est ≥ exact AND
    //      est ≤ exact + εN (ε = 0.005, N = corpus size) — exact
    //      integers, engine-independent, like q_approx_distinct's flag.
    //      The raw sketch bytes stay out of the hash-compared output. ----
    QueryDef(
      "q_count_min",
      (sp, dir) => {
        val ev = Tables.events(sp, dir)
        val sketch = ev.select(col("event_type")).stat
          .countMinSketch("event_type", eps = 0.005, confidence = 0.99,
            seed = 42)
        val n = sketch.totalCount()
        val est = udf((t: String) => sketch.estimateCount(t))
        ev.groupBy("event_type")
          .agg(count(lit(1)).as("exact_n"))
          .withColumn("est_n", est(col("event_type")))
          .select(col("event_type"), col("exact_n"),
            (col("est_n") >= col("exact_n") &&
              col("est_n") <= col("exact_n") + lit((0.005 * n).toLong))
              .as("cms_ok"))
          .orderBy("event_type")
      },
      Some(
        """SELECT event_type, CAST(count(*) AS BIGINT) AS exact_n,
          |       TRUE AS cms_ok
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
    ),
  )
}
