package graft.relational

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General relational surface: the join/aggregate/window/set-op zoo that the
  * reference gets for free from Databricks SQL and that our engine exposes
  * via the Dataset DSL (SURVEY.md §2.3–§2.5 "available as built-ins" rows,
  * tier B patterns from README_DBT.md:158-249).
  *
  * Scale notes (100 TB design):
  *  - dims (region/nation/supplier/part at TPC-H ratios) are broadcast
  *    explicitly — no shuffle on the fact side for dim joins.
  *  - fact-fact joins (orders⋈lineitem) shuffle on the join key once; the
  *    subsequent aggregate reuses that partitioning when keyed on the same
  *    column, so Catalyst plans a single exchange.
  *  - money sums go through exact cents (BIGINT) — order-independent and
  *    bit-identical across engines AND across cluster sizes; double sums
  *    would differ run-to-run at 1000 executors.
  */
object Relational {

  /** Exact money aggregation: per-row round to cents (deterministic double
    * op), sum as long. round(x*100) is HALF_UP in Spark and half-away in
    * DuckDB — identical for the positive 2-decimal money in this data.
    */
  private def centsSum(c: Column): Column = sum(round(c * 100).cast("long"))
  private def asMoney(c: Column): Column = (c / 100.0)

  /** Exact average: integer sum / count / 100 — the double quotient of
    * identical integers is bit-identical across engines and cluster sizes;
    * `round(avg(double))` flips at .xxxx5 boundaries (seen at sf0.01).
    */
  private def centsAvg(c: Column): Column =
    (centsSum(c) / count(lit(1)) / 100.0)

  val all: Seq[QueryDef] = Seq(

    // ---- TPC-H Q1 shape: scan+filter+multi-agg (A14 writ large) ----
    QueryDef(
      "q1_agg",
      (sp, dir) =>
        Tables.lineitem(sp, dir)
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(col("l_quantity").cast("long")).as("sum_qty"),
            asMoney(centsSum(col("l_extendedprice"))).as("sum_base_price"),
            asMoney(centsSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
              .as("sum_disc_price"),
            (sum(col("l_quantity").cast("long")) / count(lit(1))).as("avg_qty"),
            centsAvg(col("l_extendedprice")).as("avg_price"),
            count(lit(1)).as("count_order"),
          )
          .orderBy("l_returnflag", "l_linestatus"),
      Some(
        """SELECT l_returnflag, l_linestatus,
          |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
          |       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
          |       sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT)) / 100.0 AS sum_disc_price,
          |       sum(CAST(l_quantity AS BIGINT)) / count(*) AS avg_qty,
          |       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / count(*) / 100.0 AS avg_price,
          |       count(*) AS count_order
          |FROM lineitem
          |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
          |GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    ),

    // ---- TPC-H Q3 shape: fact⋈fact join + filtered dims + top-k ----
    QueryDef(
      "q3_shipping",
      (sp, dir) => {
        val cust = Tables.customer(sp, dir)
          .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val ord = Tables.orders(sp, dir)
          .filter(to_date(col("o_orderdate")) < lit("1998-01-01").cast("date"))
          .select("o_orderkey", "o_custkey", "o_orderdate")
        val li = Tables.lineitem(sp, dir)
          .select("l_orderkey", "l_extendedprice", "l_discount")
        // customer is 1/10 the size of orders and the planner's size
        // estimate picks the broadcast by itself at this SF — no hard hint:
        // customer is SF-proportional (not a true dim), and a forced
        // broadcast would bypass AQE's oversized-broadcast demotion at
        // 100×. The only shuffle is orders⋈lineitem on the orderkey.
        li.join(ord.join(cust, col("o_custkey") === col("c_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderkey"), to_date(col("o_orderdate")).as("order_date"))
          .agg(asMoney(centsSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some(
        """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
          |       sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT)) / 100.0 AS revenue
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |WHERE c_mktsegment = 'BUILDING'
          |  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
          |GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
          |ORDER BY revenue DESC, o_orderkey
          |LIMIT 10""".stripMargin),
    ),

    // ---- TPC-H Q5 shape: snowflake join through two broadcast dims ----
    QueryDef(
      "q5_nation_revenue",
      (sp, dir) => {
        val cust = Tables.customer(sp, dir).select("c_custkey", "c_nationkey")
        val nat = Tables.nation(sp, dir)
        val reg = Tables.region(sp, dir)
        val ord = Tables.orders(sp, dir).select("o_orderkey", "o_custkey")
        val li = Tables.lineitem(sp, dir)
          .select("l_orderkey", "l_extendedprice", "l_discount")
        // hints only on the TRUE dims (nation 25 rows, region 5 — constant
        // at every SF); customer grows with SF, so its broadcast is left to
        // the planner's size estimate (chosen here, demotable at scale)
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            asMoney(centsSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
              .as("revenue"),
            count(lit(1)).as("n_items"),
          )
          .orderBy("r_name", "n_name")
      },
      Some(
        """SELECT r_name, n_name,
          |       sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT)) / 100.0 AS revenue,
          |       count(*) AS n_items
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY r_name, n_name
          |ORDER BY r_name, n_name""".stripMargin),
    ),

    // ---- window: latest row per key — the tier-B CDC/SCD1 dedup pattern
    //      (README_DBT.md:242-244, ROW_NUMBER() OVER (... ORDER BY ts DESC)) ----
    QueryDef(
      "q_latest_order",
      (sp, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        Tables.orders(sp, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey"),
            to_date(col("o_orderdate")).as("order_date"),
            col("o_totalprice"))
          .orderBy("o_custkey")
      },
      Some(
        """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice
          |FROM (
          |  SELECT *, row_number() OVER (
          |    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          |  FROM orders)
          |WHERE rn = 1
          |ORDER BY o_custkey""".stripMargin),
    ),

    // ---- window: running total per key (frame-based window agg) ----
    QueryDef(
      "q_running_total",
      (sp, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(sp, dir)
          .withColumn("cents", round(col("value") * 100).cast("long"))
          .select(col("event_id"), col("user_id"),
            asMoney(sum(col("cents")).over(w)).as("running_value"))
          .orderBy("event_id")
      },
      Some(
        """SELECT event_id, user_id,
          |       sum(CAST(round(value * 100) AS BIGINT)) OVER (
          |         PARTITION BY user_id ORDER BY event_id
          |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running_value
          |FROM events
          |ORDER BY event_id""".stripMargin),
    ),

    // ---- sort + limit (top-k) ----
    QueryDef(
      "q_topk_orders",
      (sp, dir) =>
        Tables.orders(sp, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20),
      Some(
        """SELECT o_orderkey, o_custkey, o_totalprice
          |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin),
    ),

    // ---- set ops: INTERSECT ----
    QueryDef(
      "q_custs_both_status",
      (sp, dir) => {
        val o = Tables.orders(sp, dir)
        o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
          .intersect(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
          .orderBy("o_custkey")
      },
      Some(
        """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
          |INTERSECT
          |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
          |ORDER BY o_custkey""".stripMargin),
    ),

    // ---- anti join (NOT EXISTS): customers without orders ----
    QueryDef(
      "q_custs_no_orders",
      (sp, dir) =>
        Tables.customer(sp, dir)
          .join(Tables.orders(sp, dir),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey"),
      Some(
        """SELECT c_custkey, c_name FROM customer
          |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
          |ORDER BY c_custkey""".stripMargin),
    ),

    // ---- semi join (EXISTS) + aggregate ----
    QueryDef(
      "q_urgent_customers",
      (sp, dir) => {
        val urgent = Tables.orders(sp, dir)
          .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
        Tables.customer(sp, dir)
          .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_customers"))
          .orderBy("c_mktsegment")
      },
      Some(
        """SELECT c_mktsegment, count(*) AS n_customers FROM customer
          |WHERE EXISTS (SELECT 1 FROM orders
          |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
    ),

    // ---- ROLLUP (grouping sets; tier-B hourly/daily rollups pattern) ----
    QueryDef(
      "q_rollup_lineitem",
      (sp, dir) =>
        Tables.lineitem(sp, dir)
          .rollup("l_returnflag", "l_linestatus")
          .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first),
      Some(
        """SELECT l_returnflag, l_linestatus,
          |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, count(*) AS n
          |FROM lineitem
          |GROUP BY ROLLUP (l_returnflag, l_linestatus)
          |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin),
    ),

    // ---- CASE arithmetic (tier-B "severity weights", README_DBT.md:195-199) ----
    QueryDef(
      "q_priority_weight",
      (sp, dir) =>
        Tables.orders(sp, dir)
          .groupBy("o_orderstatus")
          .agg(
            sum(when(col("o_orderpriority") === "1-URGENT", 2L)
              .when(col("o_orderpriority") === "2-HIGH", 1L)
              .otherwise(0L)).as("weight"),
            count(lit(1)).as("n_orders"),
          )
          .orderBy("o_orderstatus"),
      Some(
        """SELECT o_orderstatus,
          |       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 2
          |                WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS weight,
          |       count(*) AS n_orders
          |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
    ),

    // ---- time bucketing: hourly aggregate (tier-B agg_hourly_device_metrics,
    //      README_DBT.md:203) ----
    QueryDef(
      "q_hourly_events",
      (sp, dir) =>
        Tables.events(sp, dir)
          .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            centsAvg(col("value")).as("avg_value"))
          .orderBy("hour", "event_type"),
      Some(
        """SELECT date_trunc('hour', ts) AS hour, event_type,
          |       count(*) AS n,
          |       sum(CAST(round(value * 100) AS BIGINT)) / count(*) / 100.0 AS avg_value
          |FROM events GROUP BY date_trunc('hour', ts), event_type
          |ORDER BY hour, event_type""".stripMargin),
    ),

    // ---- exact distinct aggregation (daily active users) ----
    QueryDef(
      "q_daily_active_users",
      (sp, dir) =>
        Tables.events(sp, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(countDistinct(col("user_id")).as("n_users"),
            count(lit(1)).as("n_events"))
          .orderBy("day"),
      Some(
        """SELECT CAST(ts AS DATE) AS day,
          |       count(DISTINCT user_id) AS n_users, count(*) AS n_events
          |FROM events GROUP BY CAST(ts AS DATE) ORDER BY day""".stripMargin),
    ),

    // ---- JSON props extraction (tier-C multimodal props column;
    //      from_json on the engine side, SURVEY.md §2.11) ----
    QueryDef(
      "q_json_props",
      (sp, dir) =>
        Tables.events(sp, dir)
          .withColumn("k", from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k"))
          .groupBy("event_type")
          .agg((sum(col("k").cast("long")) / count(col("k"))).as("avg_k"),
            sum(col("k").cast("long")).as("sum_k"),
            count(col("k")).as("n_k"))
          .orderBy("event_type"),
      Some(
        """SELECT event_type,
          |       sum(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) / count(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) AS avg_k,
          |       CAST(sum(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) AS BIGINT) AS sum_k,
          |       count(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) AS n_k
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
    ),

    // ---- SQL entry path: the engine's spark.sql surface with GROUP BY
    //      ordinal (A17, tests/pos_sensor_values.sql:5 `group by 1`) ----
    QueryDef(
      "q_sql_ordinal",
      (sp, dir) => {
        Tables.part(sp, dir).createOrReplaceTempView("part")
        sp.sql(
          """SELECT p_brand, sum(CAST(round(p_retailprice * 100) AS BIGINT)) / count(*) / 100.0 AS avg_price,
            |       count(*) AS n_parts
            |FROM part GROUP BY 1 ORDER BY 1""".stripMargin)
      },
      Some(
        """SELECT p_brand, sum(CAST(round(p_retailprice * 100) AS BIGINT)) / count(*) / 100.0 AS avg_price,
          |       count(*) AS n_parts
          |FROM part GROUP BY 1 ORDER BY 1""".stripMargin),
    ),
  )
}
