package graft.relational

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Fourth tranche: the remaining classic TPC-H shapes expressible over the
  * reduced star schema — disjunctive pushdown (Q19), correlated per-group
  * averages (Q17), aggregate-of-aggregate distributions (Q13), scalar
  * subquery on an aggregate (Q15/Q22), distinct-count with an anti-join
  * exclusion (Q16), nation-pair trade flows (Q7), and the two small
  * filter-sum shapes (Q6/Q14). The reference's Databricks SQL surface
  * (README_DBT.md:158-206 aggregate/fact patterns) reaches all of these
  * through plain SELECTs; each is written Spark-first: broadcast dims,
  * single fact shuffle, integer-cents money so the DuckDB oracle is
  * bit-exact.
  *
  * Scale notes (100 TB): every query here touches lineitem exactly once,
  * keeps filters on the scan (pushdown-eligible predicates on plain
  * columns where possible), broadcasts every dimension, and aggregates
  * two-phase. No self-joins of the fact, no windows over the whole fact
  * except where the shape demands a per-key window (none here).
  */
object Relational4 {

  private def centsSum(c: Column): Column = sum(round(c * 100).cast("long"))
  private def asMoney(c: Column): Column = c / 100.0
  /** revenue = extendedprice * (1 - discount), rounded to cents per item. */
  private def revCents: Column =
    round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("long")

  val all: Seq[QueryDef] = Seq(

    // ---- Q6: forecast revenue — pure filter + sum, the canonical
    //      pushdown/scan-bound shape ----
    QueryDef(
      "q6_forecast",
      (sp, dir) =>
        Tables.lineitem(sp, dir)
          .filter(year(col("l_shipdate")) === 1996 &&
            round(col("l_discount") * 100).cast("int").between(5, 7) &&
            col("l_quantity") < 24)
          .agg(
            asMoney(centsSum(col("l_extendedprice") * col("l_discount")))
              .as("revenue"),
            count(lit(1)).as("n_items")),
      Some(
        """SELECT sum(CAST(round((l_extendedprice * l_discount) * 100) AS BIGINT)) / 100.0 AS revenue,
          |       count(*) AS n_items
          |FROM lineitem
          |WHERE year(l_shipdate) = 1996
          |  AND CAST(round(l_discount * 100) AS INT) BETWEEN 5 AND 7
          |  AND l_quantity < 24""".stripMargin),
    ),

    // ---- Q7: trade volume between nation pairs by ship year.
    //      Fact joins orders once, both nation lookups broadcast. ----
    QueryDef(
      "q7_nation_trade",
      (sp, dir) => {
        val nat = Tables.nation(sp, dir).select("n_nationkey", "n_name")
        val cust = Tables.customer(sp, dir).select("c_custkey", "c_nationkey")
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name").as("cust_nation"))
        val supp = Tables.supplier(sp, dir).select("s_suppkey", "s_nationkey")
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val ord = Tables.orders(sp, dir).select("o_orderkey", "o_custkey")
        Tables.lineitem(sp, dir)
          .select(col("l_orderkey"), col("l_suppkey"),
            year(col("l_shipdate")).as("l_year"),
            col("l_extendedprice"), col("l_discount"))
          .filter(col("l_year").between(1996, 1997))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(supp, col("l_suppkey") === col("s_suppkey"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy("supp_nation", "cust_nation", "l_year")
          .agg(asMoney(centsSum(
            col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some(
        """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
          |       year(l_shipdate) AS l_year,
          |       sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT)) / 100.0 AS revenue
          |FROM lineitem
          |JOIN orders   ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN nation cn ON c_nationkey = cn.n_nationkey
          |JOIN nation sn ON s_nationkey = sn.n_nationkey
          |WHERE year(l_shipdate) BETWEEN 1996 AND 1997
          |  AND sn.n_name <> cn.n_name
          |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),
    ),

    // ---- Q10: returned-item customer ranking (top 20 by lost revenue) ----
    QueryDef(
      "q10_returned_custs",
      (sp, dir) => {
        val cust = Tables.customer(sp, dir)
          .select("c_custkey", "c_name", "c_nationkey")
        val nat = Tables.nation(sp, dir).select("n_nationkey", "n_name")
        val ord = Tables.orders(sp, dir)
          .select("o_orderkey", "o_custkey", "o_orderdate")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
            col("o_orderdate") < lit("1996-07-01").cast("timestamp_ntz"))
        Tables.lineitem(sp, dir)
          .filter(col("l_returnflag") === "R")
          .select("l_orderkey", "l_extendedprice", "l_discount")
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "n_name")
          .agg(centsSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("rev_cents"))
          // order by the exact integer cents: a double-revenue sort key
          // would still tie-break identically, but integers make the
          // top-20 cutoff provably engine-independent
          .orderBy(col("rev_cents").desc, col("c_custkey"))
          .limit(20)
          .select(col("c_custkey"), col("c_name"), col("n_name"),
            asMoney(col("rev_cents")).as("revenue"))
      },
      Some(
        """SELECT c_custkey, c_name, n_name,
          |       rev_cents / 100.0 AS revenue
          |FROM (
          |  SELECT c_custkey, c_name, n_name,
          |         sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT)) AS rev_cents
          |  FROM lineitem
          |  JOIN orders   ON l_orderkey = o_orderkey
          |  JOIN customer ON o_custkey = c_custkey
          |  JOIN nation   ON c_nationkey = n_nationkey
          |  WHERE l_returnflag = 'R'
          |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |    AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
          |  GROUP BY c_custkey, c_name, n_name)
          |ORDER BY rev_cents DESC, c_custkey LIMIT 20""".stripMargin),
    ),

    // ---- Q13: customer order-count distribution (agg of agg over a
    //      filtered LEFT join — customers with zero orders count too) ----
    QueryDef(
      "q13_custdist",
      (sp, dir) => {
        val ord = Tables.orders(sp, dir)
          .select("o_orderkey", "o_custkey", "o_orderpriority")
          // the ON-clause filter of Q13: restrict orders BEFORE the left
          // join so non-matching customers keep their NULL (zero count)
          .filter(!col("o_orderpriority").startsWith("4-"))
        Tables.customer(sp, dir).select("c_custkey")
          .join(ord, col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some(
        """SELECT c_count, count(*) AS custdist
          |FROM (
          |  SELECT c_custkey, count(o_orderkey) AS c_count
          |  FROM customer
          |  LEFT JOIN orders ON c_custkey = o_custkey
          |    AND o_orderpriority NOT LIKE '4-%'
          |  GROUP BY c_custkey)
          |GROUP BY c_count
          |ORDER BY custdist DESC, c_count DESC""".stripMargin),
    ),

    // ---- Q14: promo revenue share in a month — conditional-sum ratio
    //      over a broadcast part join ----
    QueryDef(
      "q14_promo_share",
      (sp, dir) => {
        val part = Tables.part(sp, dir).select("p_partkey", "p_type")
        Tables.lineitem(sp, dir)
          .filter(col("l_shipdate") >= lit("1996-04-01").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1996-05-01").cast("timestamp_ntz"))
          .select("l_partkey", "l_extendedprice", "l_discount")
          .join(part, col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type") === "ECONOMY", revCents).otherwise(lit(0L)))
              .as("promo_cents"),
            sum(revCents).as("total_cents"))
          .select(
            (lit(100.0) * col("promo_cents") / col("total_cents"))
              .as("promo_pct"),
            asMoney(col("promo_cents")).as("promo_revenue"),
            asMoney(col("total_cents")).as("total_revenue"))
      },
      Some(
        """SELECT 100.0 * promo_cents / total_cents AS promo_pct,
          |       promo_cents / 100.0 AS promo_revenue,
          |       total_cents / 100.0 AS total_revenue
          |FROM (
          |  SELECT CAST(sum(CASE WHEN p_type = 'ECONOMY'
          |               THEN CAST(round((l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT)
          |               ELSE 0 END) AS BIGINT) AS promo_cents,
          |         CAST(sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS total_cents
          |  FROM lineitem JOIN part ON l_partkey = p_partkey
          |  WHERE l_shipdate >= TIMESTAMP '1996-04-01 00:00:00'
          |    AND l_shipdate <  TIMESTAMP '1996-05-01 00:00:00')""".stripMargin),
    ),

    // ---- Q15: top supplier(s) by quarterly revenue — scalar subquery on
    //      an aggregate (revenue = max(revenue)) ----
    QueryDef(
      "q15_top_supplier",
      (sp, dir) => {
        val rev = Tables.lineitem(sp, dir)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp_ntz"))
          .groupBy("l_suppkey")
          .agg(centsSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("rev_cents"))
        // scalar max as a 1-row broadcast cross join: no second scan of
        // the fact, no unpartitioned window over the supplier aggregate
        val mx = rev.agg(max("rev_cents").as("max_cents"))
        val supp = Tables.supplier(sp, dir).select("s_suppkey", "s_name")
        rev.join(broadcast(mx), col("rev_cents") === col("max_cents"))
          .join(supp, col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            asMoney(col("rev_cents")).as("total_revenue"))
          .orderBy("s_suppkey")
      },
      Some(
        """WITH rev AS (
          |  SELECT l_suppkey,
          |         sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT)) AS rev_cents
          |  FROM lineitem
          |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
          |  GROUP BY l_suppkey)
          |SELECT s_suppkey, s_name, rev_cents / 100.0 AS total_revenue
          |FROM rev JOIN supplier ON l_suppkey = s_suppkey
          |WHERE rev_cents = (SELECT max(rev_cents) FROM rev)
          |ORDER BY s_suppkey""".stripMargin),
    ),

    // ---- Q16: supplier diversity per part profile — count(DISTINCT)
    //      after an anti-join exclusion list ----
    QueryDef(
      "q16_supp_counts",
      (sp, dir) => {
        val part = Tables.part(sp, dir)
          .filter(col("p_brand") =!= "Brand#5" &&
            col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35, 40, 45))
          .select("p_partkey", "p_brand", "p_type", "p_size")
        // "complaints" analog: suppliers in the red are excluded
        val excluded = Tables.supplier(sp, dir)
          .filter(col("s_acctbal") < 0).select("s_suppkey")
        Tables.lineitem(sp, dir).select("l_partkey", "l_suppkey")
          .join(excluded,
            col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(part, col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
            col("p_size"))
      },
      Some(
        """SELECT p_brand, p_type, p_size,
          |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
          |FROM lineitem
          |JOIN part ON l_partkey = p_partkey
          |WHERE p_brand <> 'Brand#5'
          |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45)
          |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
          |GROUP BY p_brand, p_type, p_size
          |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin),
    ),

    // ---- Q17: small-quantity order revenue — correlated per-part average
    //      (quantity < 20% of the part's mean quantity) ----
    QueryDef(
      "q17_small_qty",
      (sp, dir) => {
        val li = Tables.lineitem(sp, dir)
          .select(col("l_partkey"),
            round(col("l_quantity")).cast("long").as("ql"),
            col("l_extendedprice"))
        val perPart = li.groupBy(col("l_partkey").as("pk"))
          .agg(sum(col("ql")).as("sum_q"), count(lit(1)).as("cnt"))
        val brandParts = Tables.part(sp, dir)
          .filter(col("p_brand") === "Brand#3" && col("p_type") === "SMALL")
          .select("p_partkey")
        li.join(brandParts, col("l_partkey") === col("p_partkey"))
          // qty < 0.2 * (sum_q/cnt)  ⇔  5·qty·cnt < sum_q  (exact integers)
          .join(perPart, col("l_partkey") === col("pk"))
          .filter(col("ql") * lit(5L) * col("cnt") < col("sum_q"))
          .agg(
            (centsSum(col("l_extendedprice")) / 100.0 / 7.0).as("avg_yearly"),
            count(lit(1)).as("n_items"))
      },
      Some(
        """WITH pp AS (
          |  SELECT l_partkey AS pk,
          |         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_q,
          |         count(*) AS cnt
          |  FROM lineitem GROUP BY l_partkey)
          |SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 / 7.0 AS avg_yearly,
          |       count(*) AS n_items
          |FROM lineitem
          |JOIN part ON l_partkey = p_partkey
          |JOIN pp   ON l_partkey = pk
          |WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
          |  AND CAST(round(l_quantity) AS BIGINT) * 5 * cnt < sum_q""".stripMargin),
    ),

    // ---- Q19: three-branch disjunctive predicate over a part join ----
    QueryDef(
      "q19_disjunctive",
      (sp, dir) => {
        val part = Tables.part(sp, dir)
          .select("p_partkey", "p_brand", "p_size")
        val qty = round(col("l_quantity")).cast("long")
        Tables.lineitem(sp, dir)
          .select(col("l_partkey"), col("l_quantity"),
            col("l_extendedprice"), col("l_discount"))
          .join(part, col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
              qty.between(1, 11)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
              qty.between(10, 20)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
              qty.between(20, 30)))
          .agg(
            asMoney(centsSum(
              col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
              .as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some(
        """SELECT sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT)) / 100.0 AS revenue,
          |       count(*) AS n_items
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
          |       AND CAST(round(l_quantity) AS BIGINT) BETWEEN 1 AND 11)
          |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
          |       AND CAST(round(l_quantity) AS BIGINT) BETWEEN 10 AND 20)
          |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
          |       AND CAST(round(l_quantity) AS BIGINT) BETWEEN 20 AND 30)""".stripMargin),
    ),

    // ---- Q22: well-funded idle customers by country code — scalar
    //      average threshold + NOT EXISTS anti-join ----
    QueryDef(
      "q22_idle_custs",
      (sp, dir) => {
        val cust = Tables.customer(sp, dir)
          .select(col("c_custkey"),
            round(col("c_acctbal") * 100).cast("long").as("bal_cents"),
            pmod(col("c_nationkey"), lit(5)).cast("int").as("cntrycode"))
        // global mean of positive balances, kept as (sum, count) so the
        // threshold compare is pure integer math: bal·n > sum
        val thr = cust.filter(col("bal_cents") > 0)
          .agg(sum("bal_cents").as("pos_sum"), count(lit(1)).as("pos_n"))
        val ord = Tables.orders(sp, dir).select("o_custkey")
        cust
          .crossJoin(broadcast(thr))
          .filter(col("bal_cents") * col("pos_n") > col("pos_sum"))
          .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("cntrycode")
          .agg(count(lit(1)).as("numcust"),
            asMoney(sum(col("bal_cents"))).as("totacctbal"))
          .orderBy("cntrycode")
      },
      Some(
        """WITH c AS (
          |  SELECT c_custkey,
          |         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
          |         CAST(c_nationkey % 5 AS INT) AS cntrycode
          |  FROM customer),
          |thr AS (
          |  SELECT CAST(sum(bal_cents) AS BIGINT) AS pos_sum, count(*) AS pos_n
          |  FROM c WHERE bal_cents > 0)
          |SELECT cntrycode, count(*) AS numcust,
          |       CAST(sum(bal_cents) AS BIGINT) / 100.0 AS totacctbal
          |FROM c, thr
          |WHERE bal_cents * pos_n > pos_sum
          |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
          |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin),
    ),
  )
}
