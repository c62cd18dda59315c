package graft

import org.apache.spark.sql.functions._

/** Edge cases of the example-preparation operators (ext/PipelineOps) the
  * DuckDB oracle can't state directly: chunk-boundary arithmetic, packing
  * conservation, mixture reproducibility.
  */
class PipelineOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("chunk windows tile every document exactly (size 32, stride 24)") {
    val rows = q("doc_chunking").collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    for ((_, chunks) <- byDoc) {
      val sorted = chunks.sortBy(_.getAs[Long]("chunk_idx"))
      val nTok = sorted.head.getAs[Long]("n_tok")
      // chunk i starts at i*stride+1; all but the last are full-size
      for ((c, i) <- sorted.zipWithIndex) {
        assert(c.getAs[Int]("start_tok") == i * 24 + 1)
        if (i < sorted.length - 1) assert(c.getAs[Int]("chunk_len") == 32)
      }
      // the last chunk ends exactly at the last token
      val last = sorted.last
      assert(last.getAs[Int]("start_tok") + last.getAs[Int]("chunk_len") - 1 == nTok)
      // no chunk is empty, none overruns
      assert(sorted.forall(c => c.getAs[Int]("chunk_len") > 0 &&
        c.getAs[Int]("chunk_len") <= 32))
    }
  }

  test("sequence packing conserves tokens and numbers bins contiguously") {
    val bins = q("doc_pack_sequences").collect()
    val totalFromBins = bins.map(_.getAs[Long]("bin_tokens")).sum
    val totalDirect = Tables.documents(spark, dir)
      .select(sum(size(split(col("text"), " ")).cast("long")))
      .first().getLong(0)
    assert(totalFromBins == totalDirect) // nothing dropped, nothing doubled
    for ((_, rows) <- bins.groupBy(_.getAs[String]("source"))) {
      val ids = rows.map(_.getAs[Long]("bin")).sorted
      assert(ids.head == 0L && ids.toSeq == (0L until ids.length).toSeq,
        s"bins not contiguous: ${ids.toSeq}")
    }
  }

  test("mixture sampling is reproducible and keeps src0 whole") {
    val a = q("doc_mix_sample").collect().map(_.toSeq)
    val b = q("doc_mix_sample").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq) // hash-threshold sampling: no RNG state
    val rows = q("doc_mix_sample").collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"))).toMap
    val (n0, k0) = rows("src0")
    assert(n0 == k0) // keep-rate 1.0
    // downsampled sources keep strictly fewer
    for (s <- Seq("src1", "src2", "src3") if rows.contains(s)) {
      val (n, k) = rows(s)
      assert(k < n, s"$s not downsampled: $k of $n")
    }
  }
}
