package graft.dq

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality operators (SURVEY.md §2.7, A25–A28), recreated as engine
  * functions that return the VIOLATING rows — a check passes iff its
  * DataFrame is empty, mirroring dbt's `SELECT count(*) FROM (violations)`
  * contract (reference: models/silver/iot_events/iot_events_models.yml:7-32,
  * models/gold/core/_gold_core_models.yml:7-23, tests/pos_sensor_values.sql:1-6).
  *
  * All checks are single-pass scans or single hash aggregates — at 100 TB
  * each is one job with predicate/column pushdown into the parquet scan.
  */
object Checks {

  /** A25 `not_null`: rows where any of the columns is null. */
  def notNull(df: DataFrame, cols: Seq[String]): DataFrame =
    df.filter(cols.map(c => col(c).isNull).reduce(_ || _))

  /** A26 `unique`: key values appearing more than once. */
  def unique(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("n_dup"))
      .filter(col("n_dup") > 1)

  /** A27 `accepted_values`: non-null values outside the accepted set. */
  def acceptedValues(df: DataFrame, c: String, accepted: Seq[String]): DataFrame =
    df.filter(col(c).isNotNull && !col(c).isin(accepted: _*))

  /** A28 singular test: caller supplies the violating-rows query. */
  def singular(violations: DataFrame): DataFrame = violations

  /** dbt's 4th generic test, `relationships` (referential integrity):
    * child rows whose NON-NULL foreign key has no match in the parent — a
    * left-anti join, which Spark plans as a broadcast-anti when the
    * parent's key set is small and a shuffled anti otherwise (never a
    * full materialized join: anti joins short-circuit per probe).
    * NULL child keys are excluded, matching dbt's relationships test
    * exactly (nullability is `not_null`'s job, not this check's).
    */
  def relationships(child: DataFrame, fk: String,
      parent: DataFrame, pk: String): DataFrame =
    child.filter(col(fk).isNotNull)
      .join(parent.select(col(pk)), child(fk) === parent(pk), "left_anti")

  /** Run a set of named checks; returns (name, violationCount). */
  def run(checks: Seq[(String, DataFrame)]): Seq[(String, Long)] =
    checks.map { case (n, df) => n -> df.count() }

  sealed trait Freshness
  case object Fresh extends Freshness
  case object Warn extends Freshness
  case object Error extends Freshness

  /** `dbt source freshness`: how stale is the newest row of a source?
    * One max() aggregate — a single O(1)-output scan (and a metadata-only
    * pushdown when the source is parquet with column statistics). `asOf`
    * is an explicit parameter, not wall-clock: freshness evaluation must
    * be reproducible in tests and backfills.
    *
    * @return (status, lag) — lag is None on an EMPTY source, which
    *         reports Error (an empty source is maximally stale; dbt
    *         reports "no rows" as a failure too)
    */
  def freshness(df: DataFrame, tsCol: String, asOf: java.time.Instant,
      warnAfter: java.time.Duration, errorAfter: java.time.Duration)
      : (Freshness, Option[java.time.Duration]) = {
    require(!errorAfter.minus(warnAfter).isNegative,
      "errorAfter must be >= warnAfter")
    val row = df.agg(max(col(tsCol).cast("timestamp"))).first()
    if (row.isNullAt(0)) (Error, None)
    else {
      val newest = row.getTimestamp(0).toInstant
      val lag = java.time.Duration.between(newest, asOf)
      val status =
        if (lag.compareTo(errorAfter) > 0) Error
        else if (lag.compareTo(warnAfter) > 0) Warn
        else Fresh
      (status, Some(lag))
    }
  }

  private def acceptedList(vs: Seq[String]): String =
    vs.map(s => s"'$s'").mkString(", ")

  // The accepted event_type domain EXCLUDES 'error' so the check is
  // exercised on real violations in the driver data (cf. the reference's
  // quality_flag accepted_values, iot_events_models.yml:28-32).
  private val okTypes = Seq("click", "view", "purchase", "signup")

  /** Table profiler: per-column row/null/distinct counts and min/max —
    * the lakehouse data-profiling report (what dbt docs / Delta's column
    * stats surface). One melt (`stack`) to (column, value-as-string)
    * rows and ONE hash aggregate: a single shuffle whose width is
    * |columns| × |table|, with tiny output — at 100 TB this is one scan
    * regardless of column count, vs the per-column-scan loop a naive
    * profiler runs. Values profile as strings so one output schema fits
    * every column; only integer/string columns are profiled here because
    * float→string formatting is engine-specific (doubles would break the
    * exact oracle; their profile belongs to a numeric-stats variant).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val stackArgs = cols.map(c => s"'$c', CAST(`$c` AS STRING)").mkString(", ")
    df.selectExpr(s"stack(${cols.length}, $stackArgs) AS (column_name, v)")
      .groupBy("column_name")
      .agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("v"))).as("n_nulls"),
        countDistinct(col("v")).as("n_distinct"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))
      .orderBy("column_name")
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "dq_table_profile",
      (sp, dir) =>
        profile(Tables.events(sp, dir),
          Seq("event_id", "user_id", "event_type", "props")),
      Some(
        """WITH m AS (
          |  SELECT 'event_id' AS column_name, CAST(event_id AS VARCHAR) AS v FROM events
          |  UNION ALL SELECT 'event_type', event_type FROM events
          |  UNION ALL SELECT 'props', props FROM events
          |  UNION ALL SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events)
          |SELECT column_name, count(*) AS n_rows,
          |       count(*) - count(v) AS n_nulls,
          |       count(DISTINCT v) AS n_distinct,
          |       min(v) AS min_v, max(v) AS max_v
          |FROM m GROUP BY column_name ORDER BY column_name""".stripMargin),
    ),
    QueryDef(
      "dq_not_null",
      (sp, dir) =>
        notNull(Tables.events(sp, dir), Seq("event_id", "user_id", "event_type"))
          .select("event_id", "user_id", "event_type")
          .orderBy("event_id"),
      Some(
        """SELECT event_id, user_id, event_type FROM events
          |WHERE event_id IS NULL OR user_id IS NULL OR event_type IS NULL
          |ORDER BY event_id""".stripMargin),
    ),
    QueryDef(
      "dq_unique",
      (sp, dir) =>
        unique(Tables.documents(sp, dir), Seq("doc_id")).orderBy("doc_id"),
      Some(
        """SELECT doc_id, count(*) AS n_dup FROM documents
          |GROUP BY doc_id HAVING count(*) > 1 ORDER BY doc_id""".stripMargin),
    ),
    QueryDef(
      "dq_accepted_values",
      (sp, dir) =>
        acceptedValues(Tables.events(sp, dir), "event_type", okTypes)
          .groupBy("event_type").agg(count(lit(1)).as("n_bad"))
          .orderBy("event_type"),
      Some(
        s"""SELECT event_type, count(*) AS n_bad FROM events
           |WHERE event_type IS NOT NULL
           |  AND event_type NOT IN (${acceptedList(okTypes)})
           |GROUP BY event_type ORDER BY event_type""".stripMargin),
    ),
    // A28/A11/A17: the reference's singular test verbatim — devices whose
    // value sum is negative (tests/pos_sensor_values.sql:1-6). HAVING binds
    // the aggregate, sidestepping the alias-shadowing hazard (SURVEY §7.4.2).
    QueryDef(
      "dq_pos_values",
      (sp, dir) =>
        Tables.events(sp, dir)
          .groupBy("user_id")
          .agg(sum(round(col("value") * 100).cast("long")).as("total_cents"))
          .filter(col("total_cents") < 0L)
          .orderBy("user_id"),
      Some(
        """SELECT user_id, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
          |FROM events GROUP BY user_id
          |HAVING sum(CAST(round(value * 100) AS BIGINT)) < 0
          |ORDER BY user_id""".stripMargin),
    ),

    // dbt `relationships` test against a deliberately-shrunk parent (the
    // driver data has intact FKs, so check lineitem.l_partkey against the
    // even-keyed half of part): violations = odd partkeys, summarized as
    // orphan counts.
    QueryDef(
      "dq_relationships",
      (sp, dir) => {
        val parent = Tables.part(sp, dir).filter(col("p_partkey") % 2 === 0)
        relationships(Tables.lineitem(sp, dir), "l_partkey", parent, "p_partkey")
          .groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("n_orphan_rows"))
          .orderBy(col("n_orphan_rows").desc, col("l_partkey"))
          .limit(10)
      },
      Some(
        """SELECT l_partkey, count(*) AS n_orphan_rows
          |FROM lineitem l
          |WHERE l.l_partkey IS NOT NULL
          |  AND NOT EXISTS (SELECT 1 FROM part p
          |                  WHERE p.p_partkey = l.l_partkey
          |                    AND p.p_partkey % 2 = 0)
          |GROUP BY l_partkey
          |ORDER BY n_orphan_rows DESC, l_partkey LIMIT 10""".stripMargin),
    ),

    // ---- per-group 3σ outlier detection in EXACT integer arithmetic:
    //      (x−μ)² > 9σ² cross-multiplied to (n·x − Σx)² > 9·(n·Σx² −
    //      (Σx)²), so the verdict never touches a double — partition-
    //      and engine-independent, no tolerance games (a double z-score
    //      near the boundary could flip between engines). DIVISION-FREE
    //      on both sides too: DuckDB's `/` is float division and
    //      9·n·(…)/n at these magnitudes exceeds 2^53 exactness. Two
    //      passes (tiny per-group stats broadcast back). The squared
    //      terms run in 128-bit exact arithmetic on BOTH sides —
    //      decimal(38,0) here, HUGEINT in the oracle — because int64
    //      blows at (n·x)² once n·x ≳ 3e9 (≈3e5 rows/group at ~1e4-cent
    //      values), and Spark (non-ANSI) would WRAP silently where
    //      DuckDB raises; 128-bit holds to ~1e18 cents·rows (1e36
    //      squared < 1e38), far past any per-group cardinality. ----
    QueryDef(
      "dq_outliers",
      (sp, dir) => {
        import org.apache.spark.sql.types.DecimalType
        val dec = (c: Column) => c.cast(DecimalType(38, 0))
        val d = Tables.events(sp, dir)
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("x"))
        val s = d.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"),
            sum(col("x") * col("x")).as("sxx"))
        val dev = dec(col("n")) * dec(col("x")) - dec(col("sx"))
        d.join(broadcast(s), "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"),
            sum(when(dev * dev > dec(lit(9L)) *
              (dec(col("n")) * dec(col("sxx")) - dec(col("sx")) * dec(col("sx"))), 1L)
              .otherwise(0L)).as("n_outliers"))
          .orderBy("event_type")
      },
      Some(
        """WITH d AS (
          |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x
          |  FROM events),
          |s AS (
          |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
          |         CAST(sum(x) AS BIGINT) AS sx,
          |         CAST(sum(x * x) AS BIGINT) AS sxx
          |  FROM d GROUP BY event_type)
          |SELECT d.event_type,
          |       CAST(count(*) AS BIGINT) AS n_rows,
          |       CAST(sum(CASE WHEN (CAST(s.n AS HUGEINT) * d.x - s.sx)
          |                       * (CAST(s.n AS HUGEINT) * d.x - s.sx)
          |                  > 9 * (CAST(s.n AS HUGEINT) * s.sxx - CAST(s.sx AS HUGEINT) * s.sx)
          |             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
          |FROM d JOIN s ON d.event_type = s.event_type
          |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin),
    ),

    // ---- k-anonymity with a generalization ladder (privacy suppression —
    //      the release gate a curation pipeline runs before publishing
    //      per-user records). Quasi-identifier at L0 = (nation, segment,
    //      5000-unit balance band); equivalence classes smaller than k=8
    //      escalate to the COARSER L1 = (region, segment, 10000-unit band)
    //      — local recoding: L1 classes form over the ESCALATED rows only
    //      (rows already k-anonymous at L0 keep their finer QI) — and
    //      rows still exposed at L1 are fully suppressed. Balance bands
    //      use the exact-cents idiom (round→long) then one IEEE floor-
    //      division, identical on both engines. Group sizes are computed
    //      as hash AGGREGATES broadcast back (≤ |QI-combo| rows — a few
    //      hundred at L0 — at ANY corpus size), not windows: a window over a
    //      low-cardinality QI partition would single-task the largest
    //      class at 100 TB, while the aggregate partials map-side and the
    //      broadcast join keeps the verdict pass embarrassingly parallel. ----
    QueryDef(
      "dq_k_anonymity",
      (sp, dir) => kAnonLadder(sp, dir)
        .select("c_custkey", "anon_level", "qi_geo", "qi_seg", "qi_band",
          "group_n")
        .orderBy("c_custkey"),
      Some(
        """WITH c AS (
          |  SELECT c_custkey, c_mktsegment AS seg,
          |         CAST(c_nationkey AS BIGINT) AS nat,
          |         CAST(n_regionkey AS BIGINT) AS reg,
          |         CAST(FLOOR(CAST(round(c_acctbal * 100) AS BIGINT) / 500000.0) AS BIGINT) AS b1,
          |         CAST(FLOOR(CAST(round(c_acctbal * 100) AS BIGINT) / 1000000.0) AS BIGINT) AS b2
          |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
          |w0 AS (SELECT *, count(*) OVER (PARTITION BY nat, seg, b1) AS n0 FROM c),
          |e AS (SELECT *, count(*) OVER (PARTITION BY reg, seg, b2) AS n1
          |      FROM w0 WHERE n0 < 8)
          |SELECT c_custkey, 'L0' AS anon_level, 'N' || nat AS qi_geo,
          |       seg AS qi_seg, 'K1:' || b1 AS qi_band,
          |       CAST(n0 AS BIGINT) AS group_n
          |FROM w0 WHERE n0 >= 8
          |UNION ALL
          |SELECT c_custkey, 'L1', 'R' || reg, seg, 'K2:' || b2, CAST(n1 AS BIGINT)
          |FROM e WHERE n1 >= 8
          |UNION ALL
          |SELECT c_custkey, 'SUPPRESSED', NULL, NULL, NULL, NULL
          |FROM e WHERE n1 < 8
          |ORDER BY c_custkey""".stripMargin),
    ),

    // ---- l-diversity over the SAME released classes (k-anonymity's
    //      necessary companion: a k-anonymous class whose members all
    //      share one sensitive value still leaks it — homogeneity
    //      attack). Per released equivalence class, count DISTINCT
    //      values of the sensitive attribute and verdict RELEASE only
    //      when >= l = 7; the ladder, classes, and group sizes are the
    //      shared [[kAnonLadder]], so the two gates can never drift
    //      apart. The sensitive attribute is key-derived (custkey % 10 —
    //      this testdata carries no non-QI payload column), chosen so
    //      the sf0.01 gate exercises BOTH verdicts at BOTH ladder levels
    //      (19/49 L0 and 26/28 L1 classes pass at l=7). Output is one
    //      row per CLASS — aggregate-sized (QI-combo-bounded), tiny at
    //      any corpus. ----
    QueryDef(
      "dq_l_diversity",
      (sp, dir) => kAnonLadder(sp, dir)
        .filter(col("anon_level") =!= "SUPPRESSED")
        .groupBy("anon_level", "qi_geo", "qi_seg", "qi_band")
        .agg(count(lit(1)).as("n_members"),
          countDistinct(col("sens")).as("n_sensitive"))
        .withColumn("verdict",
          when(col("n_sensitive") >= 7, "RELEASE").otherwise("SUPPRESS"))
        .orderBy("anon_level", "qi_geo", "qi_seg", "qi_band"),
      Some(
        """WITH c AS (
          |  SELECT c_custkey, c_custkey % 10 AS sens, c_mktsegment AS seg,
          |         CAST(c_nationkey AS BIGINT) AS nat,
          |         CAST(n_regionkey AS BIGINT) AS reg,
          |         CAST(FLOOR(CAST(round(c_acctbal * 100) AS BIGINT) / 500000.0) AS BIGINT) AS b1,
          |         CAST(FLOOR(CAST(round(c_acctbal * 100) AS BIGINT) / 1000000.0) AS BIGINT) AS b2
          |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
          |w0 AS (SELECT *, count(*) OVER (PARTITION BY nat, seg, b1) AS n0 FROM c),
          |e AS (SELECT *, count(*) OVER (PARTITION BY reg, seg, b2) AS n1
          |      FROM w0 WHERE n0 < 8),
          |cls AS (
          |  SELECT 'L0' AS anon_level, 'N' || nat AS qi_geo, seg AS qi_seg,
          |         'K1:' || b1 AS qi_band, CAST(count(*) AS BIGINT) AS n_members,
          |         CAST(count(DISTINCT sens) AS BIGINT) AS n_sensitive
          |  FROM w0 WHERE n0 >= 8 GROUP BY nat, seg, b1
          |  UNION ALL
          |  SELECT 'L1', 'R' || reg, seg, 'K2:' || b2,
          |         CAST(count(*) AS BIGINT), CAST(count(DISTINCT sens) AS BIGINT)
          |  FROM e WHERE n1 >= 8 GROUP BY reg, seg, b2)
          |SELECT anon_level, qi_geo, qi_seg, qi_band, n_members, n_sensitive,
          |       CASE WHEN n_sensitive >= 7 THEN 'RELEASE' ELSE 'SUPPRESS' END AS verdict
          |FROM cls
          |ORDER BY anon_level, qi_geo, qi_seg, qi_band""".stripMargin),
    ),

    // PSI drift monitor — see [[psiDrift]] for the design notes.
    QueryDef("dq_psi_drift", (sp, dir) => psiDrift(sp, dir),
      Some(psiDriftOracle)),

    // ---- seasonal anomaly detection: per-(type, hour-of-day) baseline,
    //      flag (type, day, hour) buckets deviating > 3σ — the volume
    //      monitor a pipeline runs on arrival counts ("did 3 AM traffic
    //      triple?"). The baseline is SEASONAL (each hour-of-day compared
    //      only to itself across days), so diurnal shape never
    //      false-positives. The verdict reuses dq_outliers' exact
    //      cross-multiplied test — (n·x − Σx)² > 9·(n·Σx² − (Σx)²) in
    //      decimal(38,0)/HUGEINT, no double ever compared. Shuffle
    //      carries one row per (type, day, hour) after the map-side
    //      count partial — day-bounded at any corpus; the baseline
    //      stats are (type, hour)-bounded and broadcast back. Fixture
    //      injection (the dq_psi_drift recipe): the 2024-01-10 03:00
    //      bucket's count ×4 on both engines, so the gate exercises the
    //      ANOMALY verdict at every SF while ordinary buckets stay
    //      inside 3σ. ----
    QueryDef(
      "dq_seasonal_anomaly",
      (sp, dir) => {
        import org.apache.spark.sql.types.DecimalType
        val dec = (c: Column) => c.cast(DecimalType(38, 0))
        val injected = col("hr") === 3L &&
          col("day") === lit("2024-01-10").cast("date")
        val b = Tables.events(sp, dir)
          .select(col("event_type"), to_date(col("ts")).as("day"),
            hour(col("ts")).cast("long").as("hr"))
          .groupBy("event_type", "day", "hr")
          .agg(count(lit(1)).as("raw_n"))
          .withColumn("x",
            col("raw_n") * when(injected, 4L).otherwise(1L))
        val s = b.groupBy("event_type", "hr")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"),
            sum(col("x") * col("x")).as("sxx"))
        val dev = dec(col("n")) * dec(col("x")) - dec(col("sx"))
        b.join(broadcast(s), Seq("event_type", "hr"))
          .filter(dev * dev > dec(lit(9L)) *
            (dec(col("n")) * dec(col("sxx")) - dec(col("sx")) * dec(col("sx"))))
          .select(col("event_type"), col("day"), col("hr"),
            col("x").as("n_events"))
          .orderBy("event_type", "day", "hr")
      },
      Some(
        """WITH b AS (
          |  SELECT event_type, CAST(ts AS DATE) AS day,
          |         CAST(hour(ts) AS BIGINT) AS hr,
          |         CAST(count(*) AS BIGINT) AS raw_n
          |  FROM events GROUP BY 1, 2, 3),
          |i AS (
          |  SELECT event_type, day, hr,
          |         raw_n * CASE WHEN hr = 3 AND day = DATE '2024-01-10'
          |                      THEN 4 ELSE 1 END AS x
          |  FROM b),
          |s AS (
          |  SELECT event_type, hr, CAST(count(*) AS BIGINT) AS n,
          |         CAST(sum(x) AS BIGINT) AS sx,
          |         CAST(sum(x * x) AS BIGINT) AS sxx
          |  FROM i GROUP BY 1, 2)
          |SELECT i.event_type, i.day, i.hr, CAST(i.x AS BIGINT) AS n_events
          |FROM i JOIN s USING (event_type, hr)
          |WHERE (CAST(s.n AS HUGEINT) * i.x - s.sx)
          |      * (CAST(s.n AS HUGEINT) * i.x - s.sx)
          |      > 9 * (CAST(s.n AS HUGEINT) * s.sxx
          |             - CAST(s.sx AS HUGEINT) * s.sx)
          |ORDER BY event_type, day, hr""".stripMargin),
    ),

    // ---- BENFORD'S-LAW first-digit gate — the classic fraud /
    //      fabricated-data screen on monetary amounts: the leading digit
    //      of naturally-occurring multi-magnitude amounts follows
    //      P(d) = log10(1 + 1/d). Observed per-digit counts compare
    //      against the NINE precomputed ppm literals (identical on both
    //      engines — no log evaluated at query time, so no float ever
    //      crosses the engine boundary); the deviation n_d·1e6 − N·exp
    //      and the 20000-ppm (2-percentage-point) flag threshold are
    //      pure BIGINT. One map-side-combined 9-group aggregate —
    //      shuffle carries 9 rows at any corpus size. TPC-H prices span
    //      ~1 decade (Benford needs several), so FLAG verdicts are
    //      expected on this data — the gate's arithmetic, not the
    //      distribution, is what the oracle pins. ----
    QueryDef(
      "dq_benford",
      (sp, dir) => {
        val benford = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
          66947L, 57992L, 51153L, 45757L)
        val exp = benford.zipWithIndex
          .map { case (p, i) => ((i + 1).toLong, p) }
          .foldLeft(lit(0L)) { case (acc, (d, p)) =>
            when(col("digit") === d, lit(p)).otherwise(acc) }
        val digits = Tables.lineitem(sp, dir)
          .select(round(col("l_extendedprice") * 100).cast("long").as("cents"))
          .filter(col("cents") >= 1L)
          .select(substring(col("cents").cast("string"), 1, 1)
            .cast("long").as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n"))
        val total = digits.agg(sum(col("n")).as("total"))
        digits.crossJoin(broadcast(total))
          .withColumn("exp_ppm", exp)
          .withColumn("dev_ppm_x_n",
            col("n") * lit(1000000L) - col("total") * col("exp_ppm"))
          .withColumn("verdict",
            when(abs(col("dev_ppm_x_n")) > col("total") * lit(20000L),
              "FLAG").otherwise("PASS"))
          .select(col("digit"), col("n"), col("exp_ppm"),
            col("dev_ppm_x_n"), col("verdict"))
          .orderBy("digit")
      },
      Some(
        """WITH d AS (
          |  SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100)
          |           AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
          |  FROM lineitem
          |  WHERE CAST(round(l_extendedprice * 100) AS BIGINT) >= 1),
          |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
          |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
          |e AS (SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
          |        (4, 96910), (5, 79181), (6, 66947), (7, 57992),
          |        (8, 51153), (9, 45757)) v(digit, exp_ppm))
          |SELECT c.digit, c.n, CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
          |       CAST(c.n * 1000000 - t.total * e.exp_ppm AS BIGINT)
          |         AS dev_ppm_x_n,
          |       CASE WHEN abs(c.n * 1000000 - t.total * e.exp_ppm)
          |                 > t.total * 20000
          |            THEN 'FLAG' ELSE 'PASS' END AS verdict
          |FROM c JOIN e USING (digit) CROSS JOIN t
          |ORDER BY digit""".stripMargin),
    ),
  )

  /** Population Stability Index drift detection — the distribution-drift
    * monitor a feature pipeline runs between a baseline window and the
    * current one (PSI = Σ_buckets (p_cur − p_base)·ln(p_cur/p_base);
    * the standard score underneath "retrain when PSI > 0.25"). Design
    * for exactness AND scale:
    *  - buckets are FIXED-WIDTH on exact integer cents (clamped to 24),
    *    not quantiles — quantile edges are estimation-order-dependent
    *    and would break the cross-engine differential;
    *  - +1 Laplace smoothing over the fixed 24-bucket spine keeps every
    *    ln finite; the spine is materialized explicitly (a missing
    *    bucket still contributes a smoothed term when slice sizes
    *    differ);
    *  - each bucket's term is quantized ONCE to integer micro-units and
    *    SUMMED AS INTEGERS (the doc_dsir_weight recipe): a double sum
    *    over a hash aggregate is reduction-order-dependent, an integer
    *    sum is exact on any cluster shape. The output carries psi_micro
    *    as a BIGINT — no float in the compared columns at all;
    *  - the shuffle carries one row per (type, slice, bucket) — a few
    *    hundred rows at ANY corpus size after the map-side partial.
    * Fixture: slices are calendar halves of the month; the 'error' type's
    * current slice is deterministically recalibrated (cents·2 — a
    * doubled sensor scale) so the gate exercises the DRIFT verdict while
    * the stationary types exercise STABLE.
    */
  private def psiDrift(sp: SparkSession, dir: String): DataFrame = {
    val buckets = 24
    val ev = Tables.events(sp, dir)
    val cents0 = round(col("value") * 100).cast("long")
    val isCur = dayofmonth(col("ts")) > 15
    val cents = when(isCur && col("event_type") === "error",
      cents0 * 2).otherwise(cents0)
    val b = least(greatest(floor(cents.cast("double") / 2500.0), lit(0.0)),
      lit((buckets - 1).toDouble)).cast("long")
    val counts = ev
      .select(col("event_type"), b.as("b"),
        when(isCur, 1L).otherwise(0L).as("is_cur"))
      .groupBy("event_type", "b")
      .agg(sum(lit(1L) - col("is_cur")).as("nb"), sum(col("is_cur")).as("nc"))
    val spine = ev.select(col("event_type")).distinct()
      .crossJoin(sp.range(buckets).select(col("id").as("b")))
    val full = spine.join(counts, Seq("event_type", "b"), "left")
      .select(col("event_type"), col("b"),
        coalesce(col("nb"), lit(0L)).as("nb"),
        coalesce(col("nc"), lit(0L)).as("nc"))
    val totals = full.groupBy("event_type")
      .agg(sum("nb").as("n_base"), sum("nc").as("n_cur"))
    val pb = (col("nb") + 1).cast("double") /
      (col("n_base") + buckets).cast("double")
    val pc = (col("nc") + 1).cast("double") /
      (col("n_cur") + buckets).cast("double")
    val termMicro = round((pc - pb) * log(pc / pb) * 1000000.0).cast("long")
    full.join(broadcast(totals), Seq("event_type"))
      .select(col("event_type"), col("n_base"), col("n_cur"),
        termMicro.as("tm"))
      .groupBy("event_type")
      .agg(min("n_base").as("n_base"), min("n_cur").as("n_cur"),
        sum("tm").as("psi_micro"))
      .withColumn("verdict",
        when(col("psi_micro") >= 250000L, "DRIFT")
          .when(col("psi_micro") >= 100000L, "MODERATE")
          .otherwise("STABLE"))
      .orderBy("event_type")
  }

  // def, not val: referenced from `all` ABOVE its definition — a val
  // would still be null when the Seq is built (object init order)
  private def psiDriftOracle =
    """WITH ev AS (
      |  SELECT event_type,
      |         CASE WHEN day(ts) > 15 AND event_type = 'error'
      |              THEN CAST(round(value * 100) AS BIGINT) * 2
      |              ELSE CAST(round(value * 100) AS BIGINT) END AS cents,
      |         CASE WHEN day(ts) > 15 THEN 1 ELSE 0 END AS is_cur
      |  FROM events),
      |counts AS (
      |  SELECT event_type,
      |         CAST(least(greatest(FLOOR(CAST(cents AS DOUBLE) / 2500.0), 0.0), 23.0) AS BIGINT) AS b,
      |         CAST(sum(1 - is_cur) AS BIGINT) AS nb,
      |         CAST(sum(is_cur) AS BIGINT) AS nc
      |  FROM ev GROUP BY 1, 2),
      |spine AS (
      |  SELECT t.event_type, g.b
      |  FROM (SELECT DISTINCT event_type FROM events) t
      |  CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS b) g),
      |full_c AS (
      |  SELECT s.event_type, s.b,
      |         COALESCE(c.nb, 0) AS nb, COALESCE(c.nc, 0) AS nc
      |  FROM spine s LEFT JOIN counts c
      |    ON s.event_type = c.event_type AND s.b = c.b),
      |tot AS (
      |  SELECT event_type, CAST(sum(nb) AS BIGINT) AS n_base,
      |         CAST(sum(nc) AS BIGINT) AS n_cur
      |  FROM full_c GROUP BY 1),
      |terms AS (
      |  SELECT f.event_type, t.n_base, t.n_cur,
      |         CAST(round(
      |           (CAST(f.nc + 1 AS DOUBLE) / CAST(t.n_cur + 24 AS DOUBLE)
      |            - CAST(f.nb + 1 AS DOUBLE) / CAST(t.n_base + 24 AS DOUBLE))
      |           * ln((CAST(f.nc + 1 AS DOUBLE) / CAST(t.n_cur + 24 AS DOUBLE))
      |                / (CAST(f.nb + 1 AS DOUBLE) / CAST(t.n_base + 24 AS DOUBLE)))
      |           * 1000000.0) AS BIGINT) AS tm
      |  FROM full_c f JOIN tot t ON f.event_type = t.event_type)
      |SELECT event_type, min(n_base) AS n_base, min(n_cur) AS n_cur,
      |       CAST(sum(tm) AS BIGINT) AS psi_micro,
      |       CASE WHEN CAST(sum(tm) AS BIGINT) >= 250000 THEN 'DRIFT'
      |            WHEN CAST(sum(tm) AS BIGINT) >= 100000 THEN 'MODERATE'
      |            ELSE 'STABLE' END AS verdict
      |FROM terms GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Shared generalization-ladder classification for the privacy rows
    * (`dq_k_anonymity`, `dq_l_diversity`): per customer, its release
    * level (L0 / L1 / SUPPRESSED), QI class labels, class size, and the
    * sensitive attribute. Group sizes come from hash AGGREGATES broadcast
    * back (≤ |QI-combo| rows at ANY corpus size), not windows — a window
    * over a low-cardinality QI partition would single-task the largest
    * class at 100 TB, while the aggregate partials map-side and the
    * broadcast join keeps the classification embarrassingly parallel.
    */
  private def kAnonLadder(sp: SparkSession, dir: String): DataFrame = {
    val k = 8
    val cents = round(col("c_acctbal") * 100).cast("long")
    val cust = Tables.customer(sp, dir)
      .join(broadcast(Tables.nation(sp, dir)
        .select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), (col("c_custkey") % 10).as("sens"),
        col("c_mktsegment").as("seg"),
        col("c_nationkey").cast("long").as("nat"),
        col("n_regionkey").cast("long").as("reg"),
        floor(cents.cast("double") / 500000.0).as("b1"),
        floor(cents.cast("double") / 1000000.0).as("b2"))
    val g0 = cust.groupBy("nat", "seg", "b1").agg(count(lit(1)).as("n0"))
    val withN0 = cust.join(broadcast(g0), Seq("nat", "seg", "b1"))
    val l0 = withN0.filter(col("n0") >= k)
      .select(col("c_custkey"), col("sens"), lit("L0").as("anon_level"),
        concat(lit("N"), col("nat")).as("qi_geo"), col("seg").as("qi_seg"),
        concat(lit("K1:"), col("b1")).as("qi_band"),
        col("n0").as("group_n"))
    val esc = withN0.filter(col("n0") < k)
    val g1 = esc.groupBy("reg", "seg", "b2").agg(count(lit(1)).as("n1"))
    val withN1 = esc.join(broadcast(g1), Seq("reg", "seg", "b2"))
    val l1 = withN1.filter(col("n1") >= k)
      .select(col("c_custkey"), col("sens"), lit("L1").as("anon_level"),
        concat(lit("R"), col("reg")).as("qi_geo"), col("seg").as("qi_seg"),
        concat(lit("K2:"), col("b2")).as("qi_band"),
        col("n1").as("group_n"))
    val sup = withN1.filter(col("n1") < k)
      .select(col("c_custkey"), col("sens"),
        lit("SUPPRESSED").as("anon_level"),
        lit(null).cast("string").as("qi_geo"),
        lit(null).cast("string").as("qi_seg"),
        lit(null).cast("string").as("qi_band"),
        lit(null).cast("long").as("group_n"))
    l0.unionByName(l1).unionByName(sup)
  }
}
