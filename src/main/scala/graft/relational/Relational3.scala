package graft.relational

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Third tranche: pivot, correlated-style aggregates, array aggregation,
  * explode/unnest, regexp extraction — closing out the built-in surface a
  * reference user could reach through Databricks SQL.
  */
object Relational3 {

  val all: Seq[QueryDef] = Seq(

    // ---- pivot (explicit value list → stable output columns) ----
    QueryDef(
      "q_pivot_events",
      (sp, dir) => {
        val p = Tables.events(sp, dir)
          .groupBy("user_id")
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
        p.select(col("user_id") +:
            Seq("click", "error", "purchase", "signup", "view")
              .map(c => coalesce(col(c), lit(0L)).as(c)): _*)
          .orderBy("user_id")
      },
      Some(
        """SELECT user_id,
          |       count(*) FILTER (WHERE event_type = 'click') AS click,
          |       count(*) FILTER (WHERE event_type = 'error') AS error,
          |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
          |       count(*) FILTER (WHERE event_type = 'signup') AS signup,
          |       count(*) FILTER (WHERE event_type = 'view') AS view
          |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
    ),

    // ---- correlated-aggregate shape: rows above their group's average ----
    QueryDef(
      "q_above_segment_avg",
      (sp, dir) => {
        val c = Tables.customer(sp, dir)
        val segAvg = c.groupBy("c_mktsegment")
          .agg((sum(round(col("c_acctbal") * 100).cast("long")) / count(lit(1)))
            .as("avg_cents"))
        c.join(broadcast(segAvg), Seq("c_mktsegment"))
          .filter(round(col("c_acctbal") * 100).cast("long") > col("avg_cents"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_above"),
            max(col("c_acctbal")).as("max_bal"))
          .orderBy("c_mktsegment")
      },
      Some(
        """WITH seg AS (
          |  SELECT c_mktsegment,
          |         sum(CAST(round(c_acctbal * 100) AS BIGINT)) / count(*) AS avg_cents
          |  FROM customer GROUP BY c_mktsegment)
          |SELECT c.c_mktsegment, count(*) AS n_above, max(c.c_acctbal) AS max_bal
          |FROM customer c JOIN seg ON c.c_mktsegment = seg.c_mktsegment
          |WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) > seg.avg_cents
          |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin),
    ),

    // ---- array aggregation: sorted distinct set per group ----
    QueryDef(
      "q_collect_types",
      (sp, dir) =>
        Tables.events(sp, dir)
          .groupBy("user_id")
          // array_join: the driver's pandas compare can't sort/hash array
          // cells, so dump the collect_set as a canonical CSV string.
          .agg(array_join(sort_array(collect_set(col("event_type"))), ",").as("types"),
            count(lit(1)).as("n"))
          .orderBy("user_id"),
      Some(
        """SELECT user_id, array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types, count(*) AS n
          |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
    ),

    // ---- ORDERED string aggregation (LISTAGG / string_agg ... ORDER BY):
    //      per order-priority, the top-5 customers by total price as one
    //      deterministic CSV. The rank cap bounds the string at any
    //      corpus size (an unbounded group listagg is a driver/row-size
    //      hazard at 100 TB); Spark has no ordered string_agg, so the
    //      order is carried explicitly — collect (rn, key) structs,
    //      array_sort (struct ordering = rn first), project, join. ----
    QueryDef(
      "q_string_agg",
      (sp, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderpriority")
          .orderBy(col("price_cents").desc, col("o_custkey"))
        Tables.orders(sp, dir)
          .groupBy("o_orderpriority", "o_custkey")
          .agg(sum(round(col("o_totalprice") * 100).cast("long"))
            .as("price_cents"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .groupBy("o_orderpriority")
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("rn"),
              col("o_custkey").cast("string").as("ck")))),
            x => x.getField("ck")), ",").as("top_custs"),
            sum("price_cents").as("top5_cents"))
          .orderBy("o_orderpriority")
      },
      Some(
        """WITH t AS (
          |  SELECT o_orderpriority, o_custkey,
          |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
          |              AS BIGINT) AS price_cents
          |  FROM orders GROUP BY 1, 2),
          |r AS (
          |  SELECT *, row_number() OVER (PARTITION BY o_orderpriority
          |           ORDER BY price_cents DESC, o_custkey) AS rn
          |  FROM t)
          |SELECT o_orderpriority,
          |       string_agg(CAST(o_custkey AS VARCHAR), ',' ORDER BY rn)
          |         AS top_custs,
          |       CAST(sum(price_cents) AS BIGINT) AS top5_cents
          |FROM r WHERE rn <= 5
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
    ),

    // ---- FUNCTIONAL-DEPENDENCY profiler (the data-profiling check that
    //      proposes constraints): for each candidate FD X → Y, count the
    //      X-keys carrying more than one distinct Y — 0 means the FD
    //      holds and can be promoted to a constraint. One hash aggregate
    //      per FD at (X)-grain, map-side partials, output one row per
    //      candidate: a profiler shape that stays flat at any corpus.
    //      Candidates chosen so the gate exercises BOTH verdicts:
    //      c_nationkey → nation name holds by construction; user_id →
    //      event_type is false (users emit many types). ----
    QueryDef(
      "dq_fd_profile",
      (sp, dir) => {
        def fd(name: String, grouped: DataFrame) = grouped
          .agg(count(lit(1)).as("n_keys"),
            sum(when(col("n_y") > 1, 1L).otherwise(0L)).as("n_violating"))
          .select(lit(name).as("fd"), col("n_keys"), col("n_violating"),
            when(col("n_violating") === 0, "HOLDS").otherwise("VIOLATED")
              .as("verdict"))
        val custNation = Tables.customer(sp, dir)
          .join(Tables.nation(sp, dir),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_nationkey")
          .agg(countDistinct(col("n_name")).as("n_y"))
        val userType = Tables.events(sp, dir)
          .groupBy("user_id")
          .agg(countDistinct(col("event_type")).as("n_y"))
        val orderCust = Tables.orders(sp, dir)
          .groupBy("o_orderkey")
          .agg(countDistinct(col("o_custkey")).as("n_y"))
        fd("c_nationkey->n_name", custNation)
          .unionByName(fd("o_orderkey->o_custkey", orderCust))
          .unionByName(fd("user_id->event_type", userType))
          .orderBy("fd")
      },
      Some(
        """WITH a AS (
          |  SELECT c_nationkey, count(DISTINCT n_name) AS n_y
          |  FROM customer JOIN nation ON c_nationkey = n_nationkey
          |  GROUP BY 1),
          |b AS (
          |  SELECT o_orderkey, count(DISTINCT o_custkey) AS n_y
          |  FROM orders GROUP BY 1),
          |c AS (
          |  SELECT user_id, count(DISTINCT event_type) AS n_y
          |  FROM events GROUP BY 1)
          |SELECT 'c_nationkey->n_name' AS fd, count(*) AS n_keys,
          |       CAST(sum(CASE WHEN n_y > 1 THEN 1 ELSE 0 END) AS BIGINT)
          |         AS n_violating,
          |       CASE WHEN sum(CASE WHEN n_y > 1 THEN 1 ELSE 0 END) = 0
          |            THEN 'HOLDS' ELSE 'VIOLATED' END AS verdict
          |FROM a
          |UNION ALL
          |SELECT 'o_orderkey->o_custkey', count(*),
          |       CAST(sum(CASE WHEN n_y > 1 THEN 1 ELSE 0 END) AS BIGINT),
          |       CASE WHEN sum(CASE WHEN n_y > 1 THEN 1 ELSE 0 END) = 0
          |            THEN 'HOLDS' ELSE 'VIOLATED' END
          |FROM b
          |UNION ALL
          |SELECT 'user_id->event_type', count(*),
          |       CAST(sum(CASE WHEN n_y > 1 THEN 1 ELSE 0 END) AS BIGINT),
          |       CASE WHEN sum(CASE WHEN n_y > 1 THEN 1 ELSE 0 END) = 0
          |            THEN 'HOLDS' ELSE 'VIOLATED' END
          |FROM c
          |ORDER BY fd""".stripMargin),
    ),

    // ---- OHLC RESAMPLING (time-series bars): per (event_type, 6-hour
    //      bucket) the open/high/low/close of the value stream — the
    //      downsampling shape every metrics/market pipeline runs. ONE
    //      hash aggregate at bucket grain (map-side partials; never a
    //      window over the raw stream, which would single-task hot
    //      buckets at 100 TB). Open/close pick the value at the
    //      earliest/latest (ts, event_id) — the tie-break rides a
    //      ZERO-PADDED string key (lexicographic = numeric for padded
    //      non-negatives), because min_by/arg_min over a composite is
    //      engine-specific while string ordering is not, and epoch_us ×
    //      1e6 + event_id overflows int64. ----
    QueryDef(
      "q_ohlc_bars",
      (sp, dir) => {
        val ev = Tables.events(sp, dir)
        val cents = round(col("value") * 100).cast("long")
        val key = concat(
          lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
          lpad(col("event_id").cast("string"), 20, "0"))
        ev.select(col("event_type"),
            expr("unix_micros(ts) div 21600000000").as("bucket"),
            cents.as("cents"), key.as("k"))
          .groupBy("event_type", "bucket")
          .agg(min_by(col("cents"), col("k")).as("open_cents"),
            max(col("cents")).as("high_cents"),
            min(col("cents")).as("low_cents"),
            max_by(col("cents"), col("k")).as("close_cents"),
            count(lit(1)).as("n_events"))
          .withColumn("bucket_start",
            timestamp_micros(col("bucket") * lit(21600000000L)))
          .select("event_type", "bucket_start", "open_cents", "high_cents",
            "low_cents", "close_cents", "n_events")
          .orderBy("event_type", "bucket_start")
      },
      Some(
        """WITH e AS (
          |  SELECT event_type,
          |         epoch_us(ts) // 21600000000 AS bucket,
          |         CAST(round(value * 100) AS BIGINT) AS cents,
          |         lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
          |           || lpad(CAST(event_id AS VARCHAR), 20, '0') AS k
          |  FROM events)
          |SELECT event_type,
          |       make_timestamp(bucket * 21600000000) AS bucket_start,
          |       CAST(arg_min(cents, k) AS BIGINT) AS open_cents,
          |       CAST(max(cents) AS BIGINT) AS high_cents,
          |       CAST(min(cents) AS BIGINT) AS low_cents,
          |       CAST(arg_max(cents, k) AS BIGINT) AS close_cents,
          |       count(*) AS n_events
          |FROM e GROUP BY 1, 2
          |ORDER BY event_type, bucket_start""".stripMargin),
    ),

    // ---- EXACT WEIGHTED MEDIAN per group (lower weighted median: the
    //      smallest value whose cumulative weight reaches half the
    //      total — percentile_cont has no weighted form in either
    //      engine, so the operator is built from first principles).
    //      Values collapse to (group, value)-grain with summed weights
    //      FIRST, so the cumulative window walks distinct values — both
    //      deterministic (no tie-order dependence) and skew-proof (the
    //      window partition is value-distinct-bounded, not row-bounded,
    //      at 100 TB). All integer: cents values, integer weights,
    //      2·cum ≥ total comparison — no float crosses the compare. ----
    QueryDef(
      "q_weighted_median",
      (sp, dir) => {
        val d = Tables.events(sp, dir)
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("cents"),
            (col("user_id") % 10 + 1).cast("long").as("w"))
          .groupBy("event_type", "cents")
          .agg(sum("w").as("w"))
        val win = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("cents")
        val tot = d.groupBy("event_type").agg(sum("w").as("tw"))
        d.withColumn("cw", sum("w").over(win))
          .join(broadcast(tot), Seq("event_type"))
          .filter(col("cw") * 2 >= col("tw"))
          .groupBy("event_type")
          .agg(min("cents").as("wmedian_cents"))
          .join(broadcast(tot), Seq("event_type"))
          .select(col("event_type"), col("wmedian_cents"),
            col("tw").as("total_weight"))
          .orderBy("event_type")
      },
      Some(
        """WITH d AS (
          |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
          |         CAST(sum(user_id % 10 + 1) AS BIGINT) AS w
          |  FROM events GROUP BY 1, 2),
          |c AS (
          |  SELECT event_type, cents, w,
          |         sum(w) OVER (PARTITION BY event_type ORDER BY cents
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
          |         sum(w) OVER (PARTITION BY event_type) AS tw
          |  FROM d)
          |SELECT event_type,
          |       CAST(min(cents) FILTER (WHERE cw * 2 >= tw) AS BIGINT)
          |         AS wmedian_cents,
          |       CAST(max(tw) AS BIGINT) AS total_weight
          |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin),
    ),

    // ---- explode/unnest: global top-20 tokens across the corpus ----
    QueryDef(
      "q_top_tokens",
      (sp, dir) =>
        Tables.documents(sp, dir)
          .select(explode(split(col("text"), " ")).as("token"))
          .groupBy("token")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token"))
          .limit(20),
      Some(
        """SELECT token, count(*) AS n
          |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
          |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin),
    ),

    // ---- regexp_extract_all over text ----
    QueryDef(
      "q_regexp_extract",
      (sp, dir) =>
        Tables.documents(sp, dir)
          .select(col("doc_id"),
            size(regexp_extract_all(col("text"), lit("[aeiou][a-z]{3,}"), lit(0)))
              .as("n_vowel_words"),
            regexp_extract(col("text"), "[aeiou][a-z]{3,}", 0).as("first_vowel_word"))
          .orderBy("doc_id"),
      Some(
        """SELECT doc_id,
          |       len(regexp_extract_all(text, '[aeiou][a-z]{3,}')) AS n_vowel_words,
          |       coalesce(regexp_extract(text, '[aeiou][a-z]{3,}'), '') AS first_vowel_word
          |FROM documents ORDER BY doc_id""".stripMargin),
    ),

    // ---- TPC-H Q4 shape: correlated EXISTS with an extra non-equi
    //      predicate — planned as a left-semi join on the equi key with
    //      the range condition folded into the join, so the fact side is
    //      never materialized against more than its matching order. ----
    QueryDef(
      "q4_late_orders",
      (sp, dir) => {
        val o = Tables.orders(sp, dir)
        val l = Tables.lineitem(sp, dir)
        o.join(l,
          o("o_orderkey") === l("l_orderkey") &&
            l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 30 DAYS"),
          "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_late"))
          .orderBy("o_orderpriority")
      },
      Some(
        """SELECT o_orderpriority, count(*) AS n_late
          |FROM orders o
          |WHERE EXISTS (SELECT 1 FROM lineitem l
          |              WHERE l.l_orderkey = o.o_orderkey
          |                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
    ),

    // ---- null-aware NOT IN: Spark must plan the null-aware anti join
    //      (a NULL in the subquery would empty the result under 3-valued
    //      logic — the classic NOT IN trap, handled identically by both
    //      engines via the IS NOT NULL guard). ----
    QueryDef(
      "q_not_in_buyers",
      (sp, dir) => {
        Tables.customer(sp, dir).createOrReplaceTempView("customer_ni")
        Tables.events(sp, dir).createOrReplaceTempView("events_ni")
        sp.sql(
          """SELECT c_nationkey, count(*) AS n_non_buyers
            |FROM customer_ni
            |WHERE c_custkey NOT IN (
            |  SELECT user_id FROM events_ni
            |  WHERE event_type = 'purchase' AND user_id IS NOT NULL)
            |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
      },
      Some(
        """SELECT c_nationkey, count(*) AS n_non_buyers
          |FROM customer
          |WHERE c_custkey NOT IN (
          |  SELECT user_id FROM events
          |  WHERE event_type = 'purchase' AND user_id IS NOT NULL)
          |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
    ),

    // ---- TPC-H Q18 shape (large-volume customers): semi-join against a
    //      HAVING aggregate, then a 3-way join + re-aggregation + top-k.
    //      The HAVING side aggregates BEFORE joining (the small surviving
    //      key set then semi-filters the fact scan), and the final top-k
    //      is TakeOrderedAndProject — no global sort at any size. ----
    QueryDef(
      "q18_big_orders",
      (sp, dir) => {
        val li = Tables.lineitem(sp, dir)
        val bigOrders = li.groupBy("l_orderkey")
          .agg(sum(col("l_quantity").cast("long")).as("qty"))
          .filter(col("qty") > 150L)
          .select(col("l_orderkey"))
        Tables.orders(sp, dir)
          .join(bigOrders, col("o_orderkey") === bigOrders("l_orderkey"), "left_semi")
          .join(Tables.customer(sp, dir),
            col("o_custkey") === col("c_custkey"))
          .join(li, col("o_orderkey") === li("l_orderkey"))
          .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"))
          .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_totalprice"), col("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some(
        """SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice,
          |       CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
          |FROM orders o
          |JOIN customer c ON o.o_custkey = c.c_custkey
          |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
          |WHERE o.o_orderkey IN (
          |  SELECT l_orderkey FROM lineitem
          |  GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS BIGINT)) > 150)
          |GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
          |ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100""".stripMargin),
    ),
  )
}
