package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "hello world", "en", "srcA", 11L),
    (2L, "", "en", "srcB", 0L),
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("media table carries binary payload + typed metadata") {
    val m = Multimodal.asMediaTable(docs)
    assert(m.schema("payload").dataType == BinaryType)
    val r = m.filter(col("doc_id") === 1L).head()
    assert(r.getAs[Long]("n_bytes") == 11L)
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == "hello world")
    assert(r.getAs[String]("media_type") == "media/srcA")
  }

  test("feature extraction is deterministic and handles empty payloads") {
    val f1 = Multimodal.extractFeatures(Multimodal.asMediaTable(docs))
      .orderBy("doc_id").collect()
    val f2 = Multimodal.extractFeatures(Multimodal.asMediaTable(docs))
      .orderBy("doc_id").collect()
    assert(f1.sameElements(f2))
    val empty = f1.find(_.getLong(0) == 2L).get
    assert(empty.getAs[Long]("checksum") == 0L)
    val nonEmpty = f1.find(_.getLong(0) == 1L).get
    assert(nonEmpty.getAs[Int]("width") >= 64 && nonEmpty.getAs[Int]("height") >= 64)
  }
}
