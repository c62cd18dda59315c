package graft.relational

import graft.{QueryDef, Tables}
import graft.functions.Canon.roundCanon
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Fifth tranche: the TPC-H shapes that need partsupp in the full schema,
  * re-expressed over the reduced star schema with lineitem as the
  * part-supplier bridge — Q2 (decorrelated scalar-min subquery), Q8
  * (conditional market-share ratio), Q9 (profit with an integer cost
  * model), Q11 (per-group HAVING against a global scalar), Q20 (semi-join
  * on a grouped-HAVING subquery), Q21 (semi + anti join on the same fact).
  *
  * Scale notes (100 TB): the fact is shuffled at most once per query on
  * its natural key; every dimension (part 1e2..1e6 rows, supplier,
  * nation, region) broadcasts; scalar "subqueries" decorrelate into
  * broadcast joins (min-per-group, global total) instead of per-row
  * re-evaluation; Q21's EXISTS/NOT EXISTS become leftsemi/leftanti joins
  * on (orderkey) — the one shape that genuinely needs two passes over the
  * fact, both pre-shrunk to DISTINCT (orderkey, suppkey) pairs.
  *
  * Money stays integer-cents on both engines (see BASELINE.md / the
  * determinism rules in SURVEY §7): sums are exact longs, ratios are
  * exact-int divisions materialized as doubles at the end.
  */
object Relational5 {

  private def centsSum(c: Column): Column = sum(round(c * 100).cast("long"))
  private def asMoney(c: Column): Column = c / 100.0
  private def revCents: Column =
    round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("long")

  val all: Seq[QueryDef] = Seq(

    // ---- Q2 shape: best offer per part — a correlated scalar-min
    //      subquery DECORRELATED into min-per-group + equality join
    //      (Catalyst plans the same rewrite for correlated scalars; here
    //      it is explicit and the per-part min table broadcasts). ----
    QueryDef(
      "q2_min_cost_supp",
      (sp, dir) => {
        import org.apache.spark.sql.expressions.Window
        val offers = Tables.lineitem(sp, dir)
          .select(col("l_partkey"), col("l_suppkey"),
            round(col("l_extendedprice") * 100).cast("long").as("price_c"))
          .groupBy("l_partkey", "l_suppkey")
          .agg(min("price_c").as("supp_price_c"))
        // best-per-part via ONE window min over the already-reduced offers
        // (r14: the min-per-group + equality-join formulation consumed the
        // offers subtree twice and re-shuffled BOTH join sides on
        // (partkey, price) — 4 exchanges and the worst non-payload ×10
        // flagship ratio, 2.7). The window costs one exchange on
        // l_partkey, leaves offers partitioned on l_partkey for the part
        // join to reuse, and never joins the fact against itself. Same
        // decorrelated-scalar-min semantics, ties all kept.
        val best = offers
          .withColumn("best_price_c",
            min(col("supp_price_c")).over(Window.partitionBy(col("l_partkey"))))
          .filter(col("supp_price_c") === col("best_price_c"))
        val partDim = Tables.part(sp, dir)
          .filter(col("p_size") < 25)
          .select("p_partkey", "p_name")
        val suppDim = Tables.supplier(sp, dir)
          .select("s_suppkey", "s_name", "s_nationkey")
          .join(broadcast(Tables.nation(sp, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(sp, dir)
            .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name").as("supp_nation"))
        best
          .join(partDim, col("l_partkey") === col("p_partkey"))
          .join(suppDim, col("l_suppkey") === col("s_suppkey"))
          .select(col("p_partkey"), col("p_name"), col("s_name"),
            col("supp_nation"), asMoney(col("supp_price_c")).as("best_price"))
          .orderBy("p_partkey", "s_name")
      },
      Some(
        """WITH offers AS (
          |  SELECT l_partkey, l_suppkey,
          |         min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS supp_price_c
          |  FROM lineitem GROUP BY 1, 2),
          |best AS (SELECT l_partkey, min(supp_price_c) AS best_price_c
          |         FROM offers GROUP BY 1)
          |SELECT p.p_partkey, p.p_name, s.s_name, n.n_name AS supp_nation,
          |       o.supp_price_c / 100.0 AS best_price
          |FROM offers o
          |JOIN best b ON b.l_partkey = o.l_partkey
          |           AND o.supp_price_c = b.best_price_c
          |JOIN part p ON p.p_partkey = o.l_partkey AND p.p_size < 25
          |JOIN supplier s ON s.s_suppkey = o.l_suppkey
          |JOIN nation n ON n.n_nationkey = s.s_nationkey
          |JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
          |ORDER BY p_partkey, s_name""".stripMargin),
    ),

    // ---- Q8 shape: market share of one supplier nation inside one
    //      customer region, per order year — conditional-sum ratio over
    //      exact cents; numerator and denominator exposed so the ratio's
    //      provenance is in the output. ----
    QueryDef(
      "q8_market_share",
      (sp, dir) => {
        val nat = Tables.nation(sp, dir)
        val custRegion = Tables.customer(sp, dir).select("c_custkey", "c_nationkey")
          .join(broadcast(nat.select("n_nationkey", "n_regionkey")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(sp, dir)
            .filter(col("r_name") === "AMERICA")),
            col("n_regionkey") === col("r_regionkey"))
          .select("c_custkey")
        val supp = Tables.supplier(sp, dir).select("s_suppkey", "s_nationkey")
          .join(broadcast(nat.select(col("n_nationkey").as("sn_key"), col("n_name"))),
            col("s_nationkey") === col("sn_key"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val ord = Tables.orders(sp, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).as("o_year"))
        Tables.lineitem(sp, dir)
          .select(col("l_orderkey"), col("l_suppkey"), revCents.as("rev_c"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(custRegion, col("o_custkey") === col("c_custkey"), "leftsemi")
          .join(supp, col("l_suppkey") === col("s_suppkey"))
          .groupBy("o_year")
          .agg(
            sum(when(col("supp_nation") === "NATION_3", col("rev_c"))
              .otherwise(0L)).as("nation_rev_c"),
            sum(col("rev_c")).as("total_rev_c"))
          .select(col("o_year"),
            asMoney(col("nation_rev_c")).as("nation_rev"),
            asMoney(col("total_rev_c")).as("total_rev"),
            roundCanon(col("nation_rev_c") * 1.0 / col("total_rev_c"), 4).as("share"))
          .orderBy("o_year")
      },
      Some(
        """WITH cr AS (
          |  SELECT c_custkey FROM customer
          |  JOIN nation ON n_nationkey = c_nationkey
          |  JOIN region ON r_regionkey = n_regionkey AND r_name = 'AMERICA'),
          |sn AS (SELECT s_suppkey, n_name AS supp_nation FROM supplier
          |       JOIN nation ON n_nationkey = s_nationkey)
          |SELECT year(o_orderdate) AS o_year,
          |       CAST(sum(CASE WHEN supp_nation = 'NATION_3'
          |                THEN CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
          |                ELSE 0 END) AS BIGINT) / 100.0 AS nation_rev,
          |       CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))
          |            AS BIGINT) / 100.0 AS total_rev,
          |       round(sum(CASE WHEN supp_nation = 'NATION_3'
          |                 THEN CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
          |                 ELSE 0 END) * 1.0
          |             / sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)),
          |             4) + 0.0 AS share
          |FROM lineitem
          |JOIN orders ON o_orderkey = l_orderkey
          |JOIN sn ON s_suppkey = l_suppkey
          |WHERE o_custkey IN (SELECT c_custkey FROM cr)
          |GROUP BY 1 ORDER BY o_year""".stripMargin),
    ),

    // ---- Q9 shape: profit per supplier nation per order year with an
    //      integer cost model (20% of retail × quantity, exact via
    //      integer div — both engines floor positive quotients). ----
    QueryDef(
      "q9_profit",
      (sp, dir) => {
        val partDim = Tables.part(sp, dir)
          .filter(col("p_name").contains("widget"))
          .select(col("p_partkey"),
            round(col("p_retailprice") * 100).cast("long").as("retail_c"))
        val supp = Tables.supplier(sp, dir).select("s_suppkey", "s_nationkey")
          .join(broadcast(Tables.nation(sp, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("nation"))
        val ord = Tables.orders(sp, dir)
          .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
        Tables.lineitem(sp, dir)
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            revCents.as("rev_c"), round(col("l_quantity")).cast("long").as("qty_l"))
          .join(partDim, col("l_partkey") === col("p_partkey"))
          .join(supp, col("l_suppkey") === col("s_suppkey"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .withColumn("profit_c", col("rev_c") - expr("(retail_c * qty_l) div 5"))
          .groupBy("nation", "o_year")
          .agg(asMoney(sum(col("profit_c"))).as("profit"))
          .orderBy("nation", "o_year")
      },
      Some(
        """SELECT n_name AS nation, year(o_orderdate) AS o_year,
          |       CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
          |                - (CAST(round(p_retailprice * 100) AS BIGINT)
          |                   * CAST(round(l_quantity) AS BIGINT)) // 5) AS BIGINT)
          |         / 100.0 AS profit
          |FROM lineitem
          |JOIN part ON p_partkey = l_partkey AND p_name LIKE '%widget%'
          |JOIN supplier ON s_suppkey = l_suppkey
          |JOIN nation ON n_nationkey = s_nationkey
          |JOIN orders ON o_orderkey = l_orderkey
          |GROUP BY 1, 2 ORDER BY nation, o_year""".stripMargin),
    ),

    // ---- Q11 shape: per-part value from one region's suppliers, kept
    //      only when above a fraction of the GLOBAL total — the global
    //      scalar decorrelates into a 1-row broadcast cross join, and the
    //      fraction compare stays in integers (value*1000 > total). ----
    QueryDef(
      "q11_important_parts",
      (sp, dir) => {
        val supp = Tables.supplier(sp, dir).select("s_suppkey", "s_nationkey")
          .join(broadcast(Tables.nation(sp, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(sp, dir)
            .filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select("s_suppkey")
        val value = Tables.lineitem(sp, dir)
          .select(col("l_partkey"), col("l_suppkey"), revCents.as("rev_c"))
          .join(supp, col("l_suppkey") === col("s_suppkey"), "leftsemi")
          .groupBy("l_partkey")
          .agg(sum("rev_c").as("value_c"))
        val total = value.agg(sum("value_c").as("total_c"))
        value.crossJoin(broadcast(total))
          .filter(col("value_c") * 1000 > col("total_c"))
          .select(col("l_partkey").as("p_partkey"),
            asMoney(col("value_c")).as("value"))
          .orderBy(col("value").desc, col("p_partkey"))
      },
      Some(
        """WITH rs AS (
          |  SELECT s_suppkey FROM supplier
          |  JOIN nation ON n_nationkey = s_nationkey
          |  JOIN region ON r_regionkey = n_regionkey AND r_name = 'ASIA'),
          |v AS (SELECT l_partkey,
          |             sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))
          |               AS value_c
          |      FROM lineitem WHERE l_suppkey IN (SELECT s_suppkey FROM rs)
          |      GROUP BY 1)
          |SELECT l_partkey AS p_partkey, CAST(value_c AS BIGINT) / 100.0 AS value
          |FROM v WHERE value_c * 1000 > (SELECT sum(value_c) FROM v)
          |ORDER BY value DESC, p_partkey""".stripMargin),
    ),

    // ---- Q12 shape: shipping-priority audit — conditional counts per
    //      category (late vs on-time split by order priority class), the
    //      two-level CASE aggregation. One fact shuffle on the group key;
    //      the CASE arithmetic is map-side. ----
    QueryDef(
      "q12_priority_audit",
      (sp, dir) => {
        val ord = Tables.orders(sp, dir)
          .select(col("o_orderkey"), col("o_orderpriority"))
        val highPri = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        Tables.lineitem(sp, dir)
          .select(col("l_orderkey"), col("l_returnflag"),
            year(col("l_shipdate")).as("ship_year"))
          .filter(col("ship_year") === 1997)
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_returnflag")
          .agg(
            sum(when(highPri, 1L).otherwise(0L)).cast("long").as("high_line_count"),
            sum(when(!highPri, 1L).otherwise(0L)).cast("long").as("low_line_count"))
          .orderBy("l_returnflag")
      },
      Some(
        """SELECT l_returnflag,
          |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
          |                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
          |FROM lineitem
          |JOIN orders ON o_orderkey = l_orderkey
          |WHERE year(l_shipdate) = 1997
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    ),

    // ---- Q20 shape: suppliers that shipped a LOT of some focus part —
    //      a semi-join chain through a grouped-HAVING subquery, ending in
    //      the supplier dim filtered to one region. ----
    QueryDef(
      "q20_part_suppliers",
      (sp, dir) => {
        val focusParts = Tables.part(sp, dir)
          .filter(col("p_name").startsWith("small"))
          .select("p_partkey")
        val bigShippers = Tables.lineitem(sp, dir)
          .select(col("l_partkey"), col("l_suppkey"),
            round(col("l_quantity")).cast("long").as("qty_l"))
          .join(focusParts, col("l_partkey") === col("p_partkey"), "leftsemi")
          .groupBy("l_suppkey", "l_partkey")
          .agg(sum("qty_l").as("total_qty"))
          .filter(col("total_qty") > 100)
          .select("l_suppkey").distinct()
        Tables.supplier(sp, dir)
          .join(bigShippers, col("s_suppkey") === col("l_suppkey"), "leftsemi")
          .join(broadcast(Tables.nation(sp, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_name"), col("n_name").as("nation"), col("s_acctbal"))
          .orderBy("s_name")
      },
      Some(
        """SELECT s_name, n_name AS nation, s_acctbal
          |FROM supplier
          |JOIN nation ON n_nationkey = s_nationkey
          |WHERE s_suppkey IN (
          |  SELECT l_suppkey FROM lineitem
          |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          |  GROUP BY l_suppkey, l_partkey
          |  HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 100)
          |ORDER BY s_name""".stripMargin),
    ),

    // ---- Q21 shape: suppliers who kept multi-supplier orders waiting —
    //      late (ship > order date + 1 year) line in an order that has
    //      OTHER suppliers (EXISTS → leftsemi) none of whom were late
    //      (NOT EXISTS → leftanti). Both passes run over pre-shrunk
    //      DISTINCT (orderkey, suppkey) pair sets, not raw lineitem. ----
    QueryDef(
      "q21_waiting_supp",
      (sp, dir) => {
        val li = Tables.lineitem(sp, dir)
        val pairs = li.select(col("l_orderkey"), col("l_suppkey")).distinct()
        val ord = Tables.orders(sp, dir).select("o_orderkey", "o_orderdate")
        // persist: consumed by the semi leg, the anti leg's build side and
        // the final aggregate — self-joins recompute upstream otherwise
        val late = li
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 365 DAYS"))
          .select(col("l_orderkey"), col("l_suppkey")).distinct()
          .persist()
        late.as("l1")
          .join(pairs.as("p2"),
            col("l1.l_orderkey") === col("p2.l_orderkey") &&
              col("l1.l_suppkey") =!= col("p2.l_suppkey"), "leftsemi")
          .join(late.select(col("l_orderkey").as("a_orderkey"),
            col("l_suppkey").as("a_suppkey")),
            col("l1.l_orderkey") === col("a_orderkey") &&
              col("l1.l_suppkey") =!= col("a_suppkey"), "leftanti")
          .groupBy(col("l1.l_suppkey").as("l_suppkey"))
          .agg(count(lit(1)).as("numwait"))
          .join(Tables.supplier(sp, dir).select("s_suppkey", "s_name"),
            col("l_suppkey") === col("s_suppkey"))
          .select("s_name", "numwait")
          .orderBy(col("numwait").desc, col("s_name"))
      },
      Some(
        """WITH pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
          |late AS (
          |  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
          |  JOIN orders ON o_orderkey = l_orderkey
          |  WHERE l_shipdate > o_orderdate + INTERVAL 365 DAY)
          |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
          |FROM late l1
          |JOIN supplier ON s_suppkey = l1.l_suppkey
          |WHERE EXISTS (SELECT 1 FROM pairs p WHERE p.l_orderkey = l1.l_orderkey
          |                AND p.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM late l3 WHERE l3.l_orderkey = l1.l_orderkey
          |                    AND l3.l_suppkey <> l1.l_suppkey)
          |GROUP BY s_name
          |ORDER BY numwait DESC, s_name""".stripMargin),
    ),

    // ---- UNPIVOT (melt): wide order measures to (key, metric, val) long
    //      form — the inverse of q_pivot_events, via the native Unpivot
    //      plan node (one narrow Expand, no shuffle, no join). Long form
    //      is the feature-store/metrics-export shape every training
    //      pipeline hits. Oracle is the portable UNION ALL. ----
    QueryDef(
      "q_unpivot",
      (sp, dir) =>
        Tables.orders(sp, dir)
          .filter(col("o_orderkey") % 50 === 0)
          .select(col("o_orderkey"),
            col("o_totalprice").as("total_price"),
            col("o_custkey").cast("double").as("cust_key"),
            unix_date(col("o_orderdate").cast("date")).cast("double")
              .as("order_day"))
          .unpivot(
            Array(col("o_orderkey")),
            Array(col("total_price"), col("cust_key"), col("order_day")),
            "metric", "val")
          .orderBy("o_orderkey", "metric"),
      Some(
        """SELECT o_orderkey, metric, val FROM (
          |  SELECT o_orderkey, 'total_price' AS metric, o_totalprice AS val
          |  FROM orders WHERE o_orderkey % 50 = 0
          |  UNION ALL
          |  SELECT o_orderkey, 'cust_key', CAST(o_custkey AS DOUBLE)
          |  FROM orders WHERE o_orderkey % 50 = 0
          |  UNION ALL
          |  SELECT o_orderkey, 'order_day',
          |         CAST(datediff('day', DATE '1970-01-01',
          |                       CAST(o_orderdate AS DATE)) AS DOUBLE)
          |  FROM orders WHERE o_orderkey % 50 = 0)
          |ORDER BY o_orderkey, metric""".stripMargin),
    ),

    // ---- exponential time-decay aggregate: per-user engagement where
    //      each event counts half as much every 7 days of age (the
    //      recency weighting recommendation/engagement pipelines run).
    //      The "now" anchor is the corpus max — a 1-row aggregate on a
    //      broadcast (the q6_forecast scalar shape), then ONE grouped
    //      pass with the weight in codegen arithmetic. Seconds truncate
    //      identically on both engines; the ln-free pow rounds at 4. ----
    QueryDef(
      "q_decay_engagement",
      (sp, dir) => {
        val ev = Tables.events(sp, dir)
        val anchor = ev.agg(max(unix_timestamp(col("ts"))).as("mx"))
        ev.crossJoin(broadcast(anchor))
          .withColumn("w",
            pow(lit(0.5),
              (col("mx") - unix_timestamp(col("ts"))) / lit(604800.0)))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            roundCanon(sum(col("w") * col("value")), 4).as("decayed_value"))
          .orderBy("user_id")
      },
      Some(
        """WITH m AS (
          |  SELECT max(CAST(floor(epoch(ts)) AS BIGINT)) AS mx FROM events)
          |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
          |       round(sum(power(0.5,
          |         (m.mx - CAST(floor(epoch(ts)) AS BIGINT)) / 604800.0)
          |         * value), 4) + 0.0 AS decayed_value
          |FROM events, m
          |GROUP BY user_id ORDER BY user_id""".stripMargin),
    ),

    // ---- NTILE quartiles: customers bucketed by account balance (the
    //      cohort/quantile-binning window). The global-order window is
    //      the semantic; at 100 TB the same binning runs via
    //      approx-quantile cutoffs (q_percentiles' path) instead of a
    //      single-partition sort. Ties broken on c_custkey so both
    //      engines assign identical buckets. ----
    QueryDef(
      "q_ntile",
      (sp, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.orderBy(col("c_acctbal").desc, col("c_custkey"))
        Tables.customer(sp, dir)
          .withColumn("quartile", ntile(4).over(w))
          .groupBy("quartile")
          .agg(count(lit(1)).as("n_custs"),
            roundCanon(min(col("c_acctbal")), 2).as("min_bal"),
            roundCanon(max(col("c_acctbal")), 2).as("max_bal"))
          .orderBy("quartile")
      },
      Some(
        """SELECT quartile, CAST(count(*) AS BIGINT) AS n_custs,
          |       round(min(c_acctbal), 2) + 0.0 AS min_bal,
          |       round(max(c_acctbal), 2) + 0.0 AS max_bal
          |FROM (SELECT c_acctbal,
          |             ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey)
          |               AS quartile
          |      FROM customer)
          |GROUP BY quartile ORDER BY quartile""".stripMargin),
    ),
  )
}
