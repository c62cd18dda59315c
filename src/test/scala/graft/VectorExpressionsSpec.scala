package graft

import graft.ext.Similarity
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = {
    val rnd = new scala.util.Random(11)
    (0 until 50).map(i => (i.toLong, Array.fill(64)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
  }

  test("native cosine_sim is bit-identical to the HOF formulation") {
    val df = vecs.as("a").crossJoin(vecs.as("b"))
      .select(
        VectorFunctions.cosine_sim(col("a.embedding"), col("b.embedding")).as("native"),
        Similarity.cosineHof(col("a.embedding"), col("b.embedding")).as("hof"))
    assert(df.filter(col("native") =!= col("hof")).isEmpty) // exact, not approx
  }

  test("cosine_sim registers on the SQL surface") {
    VectorFunctions.register(spark)
    vecs.createOrReplaceTempView("vtest")
    val r = spark.sql(
      """SELECT cosine_sim(a.embedding, a.embedding) AS c FROM vtest a WHERE vec_id = 0""")
      .head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("cosine_sim rejects wrong input types at analysis") {
    val bad = intercept[Exception] {
      spark.range(1).select(VectorFunctions.cosine_sim(col("id"), col("id"))).collect()
    }
    assert(bad.getMessage.toLowerCase.contains("cosine_sim"))
  }

  test("two cosine_sim calls compile into one codegen stage (fresh locals)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val at = ArrayType(FloatType, containsNull = false)
    val a = BoundReference(0, at, nullable = false)
    val b = BoundReference(1, at, nullable = false)
    // GenerateUnsafeProjection.generate throws on Janino failure (no silent
    // interpreted fallback at this layer) — this is the regression guard for
    // the IVF 16-cosine argmax stage.
    val proj = GenerateUnsafeProjection.generate(Seq(
      graft.functions.CosineSimilarity(a, b),
      graft.functions.CosineSimilarity(b, a)))
    val row = InternalRow(
      new GenericArrayData(Array[Any](1f, 2f)),
      new GenericArrayData(Array[Any](2f, 1f)))
    val out = proj(row)
    assert(math.abs(out.getDouble(0) - 0.8) < 1e-12)
    assert(out.getDouble(0) == out.getDouble(1))
  }

  test("null inputs yield null, not a crash") {
    val df = Seq((Some(Array(1f, 2f)), None: Option[Array[Float]]))
      .toDF("a", "b")
      .select(VectorFunctions.cosine_sim(col("a"), col("b")).as("c"))
    assert(df.head().isNullAt(0))
  }
}
