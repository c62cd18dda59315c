package graft

import graft.dq.Checks
import org.apache.spark.sql.functions._

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private def dirty = Seq(
    (Some(1L), Some("d1"), Some("good"), 5.0),
    (Some(2L), None, Some("good"), -20.0),        // null device
    (Some(3L), Some("d1"), Some("weird"), -30.0), // bad enum; drags d1 negative
    (Some(3L), Some("d2"), Some("suspect"), 2.0), // dup id
    (Some(4L), Some("d3"), Some(" Good "), 3.0),  // raw-dirty enum (hazard 3)
  ).toDF("id", "device", "flag", "value")

  test("notNull finds exactly the null rows") {
    assert(Checks.notNull(dirty, Seq("device")).select("id").as[Option[Long]].collect().flatten.toSet == Set(2L))
    assert(Checks.notNull(dirty, Seq("id", "flag")).isEmpty)
  }

  test("unique finds duplicated keys with counts") {
    val v = Checks.unique(dirty, Seq("id")).collect()
    assert(v.length == 1 && v.head.getAs[Long]("n_dup") == 2L)
  }

  test("acceptedValues flags out-of-domain including raw-dirty variants") {
    val bad = Checks.acceptedValues(dirty, "flag", Seq("good", "suspect"))
      .select("id").as[Option[Long]].collect().flatten.toSet
    assert(bad == Set(3L, 4L)) // 'weird' and ' Good ' (raw projection fails the enum)
  }

  test("singular test: negative value sums per device (reference pos_sensor_values)") {
    val viol = Checks.singular(
      dirty.groupBy("device").agg(sum("value").as("total"))
        .filter(col("total") < 0))
    assert(viol.select("device").as[Option[String]].collect().flatten.toSet == Set("d1"))
  }

  test("relationships excludes NULL foreign keys (dbt parity)") {
    val child = Seq(
      (1L, Some("d1")), (2L, None), (3L, Some("dX")),
    ).toDF("id", "device")
    val parent = Seq("d1", "d2").toDF("device")
    val orphans = Checks.relationships(child, "device", parent, "device")
      .select("id").as[Long].collect().toSet
    // id=2 (NULL FK) is not an orphan — only the genuinely dangling dX is
    assert(orphans == Set(3L))
  }

  test("source freshness thresholds (dbt source freshness parity)") {
    import java.time.{Duration, Instant}
    val asOf = Instant.parse("2024-01-02T00:00:00Z")
    def src(ts: String) = Seq(Tuple1(java.sql.Timestamp.from(Instant.parse(ts))))
      .toDF("loaded_at")
    val warn = Duration.ofHours(6)
    val err = Duration.ofHours(24)
    // newest row 1h old → fresh; 12h → warn; 48h → error
    assert(Checks.freshness(src("2024-01-01T23:00:00Z"), "loaded_at", asOf, warn, err)
      ._1 == Checks.Fresh)
    val (st, lag) = Checks.freshness(src("2024-01-01T12:00:00Z"), "loaded_at", asOf, warn, err)
    assert(st == Checks.Warn && lag.contains(Duration.ofHours(12)))
    assert(Checks.freshness(src("2023-12-31T00:00:00Z"), "loaded_at", asOf, warn, err)
      ._1 == Checks.Error)
    // empty source: maximally stale
    val empty = Seq.empty[Tuple1[java.sql.Timestamp]].toDF("loaded_at")
    assert(Checks.freshness(empty, "loaded_at", asOf, warn, err) == (Checks.Error, None))
  }

  test("run returns per-check violation counts") {
    val res = Checks.run(Seq(
      "nn" -> Checks.notNull(dirty, Seq("device")),
      "uq" -> Checks.unique(dirty, Seq("id")),
    )).toMap
    assert(res == Map("nn" -> 1L, "uq" -> 1L))
  }

  test("k-anonymity ladder: every released class has >= k members") {
    // The DuckDB oracle proves Spark == DuckDB; this proves BOTH are
    // actually k-anonymous — released equivalence classes (the rows
    // sharing one (anon_level, qi_geo, qi_seg, qi_band)) all have >= 8
    // members, group_n states that size truthfully, escalation is local
    // (L1 sizes count escalated rows only, so an L1 class can be smaller
    // than the L0 total for the same region), and the partition covers
    // every customer exactly once.
    // sf0.01: the smallest SF where the ladder actually releases classes
    // (at sf0.001's 150 customers every L0/L1 class is < 8 → all rows
    // suppressed, which drivercheck proves exact but exercises nothing).
    val out = Checks.all.find(_.name == "dq_k_anonymity").get
      .fn(spark, "/root/testdata/sf0.01").cache()
    val nCust = spark.read.parquet("/root/testdata/sf0.01/customer.parquet").count()
    assert(out.count() == nCust)
    assert(out.select("c_custkey").distinct().count() == nCust)
    val classes = out.filter(col("anon_level") =!= "SUPPRESSED")
      .groupBy("anon_level", "qi_geo", "qi_seg", "qi_band")
      .agg(count(lit(1)).as("actual"), min("group_n").as("lo"), max("group_n").as("hi"))
      .collect()
    assert(classes.exists(_.getAs[String]("anon_level") == "L0"), "no L0 class released")
    assert(classes.exists(_.getAs[String]("anon_level") == "L1"), "no L1 class released")
    classes.foreach { r =>
      assert(r.getAs[Long]("actual") >= 8L, s"class below k: $r")
      assert(r.getAs[Long]("lo") == r.getAs[Long]("actual") &&
        r.getAs[Long]("hi") == r.getAs[Long]("actual"), s"group_n lies: $r")
    }
    // suppressed rows carry no quasi-identifier at all
    val sup = out.filter(col("anon_level") === "SUPPRESSED")
    assert(sup.filter(col("qi_geo").isNotNull || col("qi_seg").isNotNull ||
      col("qi_band").isNotNull || col("group_n").isNotNull).isEmpty)
    out.unpersist()
  }

  test("l-diversity verdicts match the k-anonymity classes and the l bound") {
    def q(n: String) = Checks.all.find(_.name == n).get.fn(spark, "/root/testdata/sf0.01")
    val ld = q("dq_l_diversity").collect()
    // verdict is exactly the l >= 7 rule
    ld.foreach { r =>
      val rel = r.getAs[Long]("n_sensitive") >= 7
      assert(r.getAs[String]("verdict") == (if (rel) "RELEASE" else "SUPPRESS"), r)
      assert(r.getAs[Long]("n_sensitive") <= 10) // sens has 10 values
    }
    // both verdicts occur at both ladder levels at the gate SF — the row
    // exercises the homogeneity-attack branch, not just the happy path
    for (lvl <- Seq("L0", "L1"); v <- Seq("RELEASE", "SUPPRESS"))
      assert(ld.exists(r => r.getAs[String]("anon_level") == lvl &&
        r.getAs[String]("verdict") == v), s"no $lvl/$v class")
    // classes and sizes agree with dq_k_anonymity's released classes
    val ka = q("dq_k_anonymity").filter(col("anon_level") =!= "SUPPRESSED")
      .groupBy("anon_level", "qi_geo", "qi_seg", "qi_band")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)) -> r.getAs[Long]("n"))
      .toMap
    assert(ld.length == ka.size)
    ld.foreach { r =>
      val key = (r.getAs[String]("anon_level"), r.getAs[String]("qi_geo"),
        r.getAs[String]("qi_seg"), r.getAs[String]("qi_band"))
      assert(ka(key) == r.getAs[Long]("n_members"), s"size drift at $key")
    }
  }

  test("psi drift flags the recalibrated type and only it") {
    val out = Checks.all.find(_.name == "dq_psi_drift").get
      .fn(spark, "/root/testdata/sf0.01").collect()
    assert(out.length == 5)
    out.foreach { r =>
      val psi = r.getAs[Long]("psi_micro")
      val want = if (psi >= 250000L) "DRIFT"
        else if (psi >= 100000L) "MODERATE" else "STABLE"
      assert(r.getAs[String]("verdict") == want, r)
      // slice totals are the real row counts, not smoothed
      assert(r.getAs[Long]("n_base") > 0 && r.getAs[Long]("n_cur") > 0)
    }
    val byType = out.map(r => r.getAs[String]("event_type") ->
      r.getAs[String]("verdict")).toMap
    assert(byType("error") == "DRIFT", s"injected drift not flagged: $byType")
    assert(byType.filter(_._1 != "error").values.forall(_ == "STABLE"),
      s"stationary type misflagged: $byType")
  }

  test("profile reports exact per-column nulls, distincts and bounds") {
    val df = Seq(
      (Some(3L), Some("b")),
      (Some(1L), None),
      (Some(3L), Some("a")),
      (None, Some("a")),
    ).toDF("k", "s")
    val out = Checks.profile(df, Seq("k", "s"))
      .as[(String, Long, Long, Long, String, String)].collect().toSet
    assert(out == Set(
      ("k", 4L, 1L, 2L, "1", "3"),
      ("s", 4L, 1L, 2L, "a", "b")))
  }
}
