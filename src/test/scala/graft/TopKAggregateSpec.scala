package graft

import graft.ext.Similarity
import graft.functions.TopKPairs
import org.apache.spark.sql.functions._

class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  test("topk_pairs equals window row_number top-k on random data") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 5000).map(i => (i % 17L, rnd.nextInt(1000) / 10.0, i.toLong))
    val df = rows.toDF("grp", "score", "id").repartition(16)
    val heap = df.groupBy("grp")
      .agg(TopKPairs.topk_pairs(col("score"), col("id"), 7).as("tops"))
      .select(col("grp"), posexplode(col("tops")).as(Seq("pos", "t")))
      .select(col("grp"), (col("pos") + 1).as("rn"), col("t.id").as("id"))
      .as[(Long, Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("score").desc, col("id"))
    val window = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 7)
      .select(col("grp"), col("rn").cast("long"), col("id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(heap == window)
  }

  test("topk_pairs survives buffer compaction (groups far larger than 2k)") {
    val df = (1 to 10000).map(i => (1L, i.toDouble, i.toLong)).toDF("grp", "score", "id")
      .repartition(8)
    val top = df.groupBy("grp")
      .agg(TopKPairs.topk_pairs(col("score"), col("id"), 3).as("tops"))
      .select(explode(col("tops")).as("t")).select(col("t.id"))
      .as[Long].collect().toSeq
    assert(top == Seq(10000L, 9999L, 9998L))
  }

  test("heap topK equals window topK end to end on embeddings") {
    val rnd = new scala.util.Random(23)
    val emb = (0 until 80).map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 3)
    val a = Similarity.topK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "vec_id", "rn").as[(Long, Long, Int)].collect().toSet
    val b = Similarity.topKHeap(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "vec_id", "rn").as[(Long, Long, Int)].collect().toSet
    assert(a == b)
  }
}
