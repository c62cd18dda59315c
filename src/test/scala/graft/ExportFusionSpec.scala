package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Lake

/** The fused zero-sleep export (one dynamic-partitioned job for every
  * pending version) must be BYTE-identical to the per-version loop: same
  * file names, same rows in each file, same in-file order — a consumer
  * that ingested parts from one path must be able to resume over parts
  * from the other. The per-version baseline is produced by exporting one
  * version at a time (todo.size == 1 never takes the fused branch).
  */
class ExportFusionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-exportfusion").toString

  /** A three-commit table: snapshot, append, delete — inserts and deletes
    * in the feed, sized to spread over both parts of filesPerVersion=2.
    */
  private def buildTable(): String = {
    val root = tmp()
    val t = s"$root/t"
    val base = spark.range(0, 400)
      .select(col("id").as("k"), (col("id") % 7).as("v"))
    Lake.writeVersioned(spark, base.repartition(3), t)
    Lake.appendVersioned(spark,
      spark.range(400, 600).select(col("id").as("k"), (col("id") % 7).as("v")),
      t)
    Lake.deleteWhere(spark, t, col("k") % 5 === 0)
    t
  }

  private def landingFiles(dir: String): Map[String, Array[Byte]] = {
    new java.io.File(dir).listFiles().toSeq
      .filter(_.isFile)
      .map(f => f.getName ->
        java.nio.file.Files.readAllBytes(f.toPath)).toMap
  }

  private def compareLandings(a: String, b: String): Unit = {
    val fa = landingFiles(a)
    val fb = landingFiles(b)
    assert(fa.keySet == fb.keySet,
      s"file sets differ: ${fa.keySet} vs ${fb.keySet}")
    fa.keys.filterNot(_.endsWith(".done")).foreach { n =>
      assert(java.util.Arrays.equals(fa(n), fb(n)),
        s"bytes differ for $n")
    }
  }

  test("fused export is byte-identical to the per-version path (json)") {
    val t = buildTable()
    val perVersion = tmp() + "/landing"
    (1L to 3L).foreach(v => Lake.exportChangeFeedLanding(spark, t,
      perVersion, upTo = Some(v), mtimeOrder = false))
    val fused = tmp() + "/landing"
    Lake.exportChangeFeedLanding(spark, t, fused, mtimeOrder = false)
    compareLandings(perVersion, fused)
  }

  test("fused export is byte-identical for keyed feeds and parquet rows") {
    val t = buildTable()
    val perVersion = tmp() + "/landing"
    (1L to 3L).foreach(v => Lake.exportChangeFeedLanding(spark, t,
      perVersion, upTo = Some(v), keys = Seq("k"), mtimeOrder = false))
    val fused = tmp() + "/landing"
    Lake.exportChangeFeedLanding(spark, t, fused, keys = Seq("k"),
      mtimeOrder = false)
    compareLandings(perVersion, fused)
    // parquet lane: row/file equivalence (parquet bytes may differ in
    // metadata; compare the decoded rows per file instead)
    val pqA = tmp() + "/landing"
    (1L to 3L).foreach(v => Lake.exportChangeFeedLanding(spark, t,
      pqA, upTo = Some(v), format = "parquet", mtimeOrder = false))
    val pqB = tmp() + "/landing"
    Lake.exportChangeFeedLanding(spark, t, pqB, format = "parquet",
      mtimeOrder = false)
    val namesA = new java.io.File(pqA).listFiles().map(_.getName).toSet
    val namesB = new java.io.File(pqB).listFiles().map(_.getName).toSet
    assert(namesA == namesB)
    namesA.filter(_.endsWith(".parquet")).foreach { n =>
      val ra = spark.read.parquet(s"$pqA/$n").collect().map(_.toString)
      val rb = spark.read.parquet(s"$pqB/$n").collect().map(_.toString)
      assert(ra.sameElements(rb), s"rows differ for $n")
    }
  }

  test("fused export resumes over a per-version prefix") {
    val t = buildTable()
    val landing = tmp() + "/landing"
    // v1 exported by the per-version path, v2..v3 by the fused path
    Lake.exportChangeFeedLanding(spark, t, landing, upTo = Some(1L),
      mtimeOrder = false)
    Lake.exportChangeFeedLanding(spark, t, landing, mtimeOrder = false)
    val all = tmp() + "/landing"
    Lake.exportChangeFeedLanding(spark, t, all, mtimeOrder = false)
    compareLandings(landing, all)
  }
}
