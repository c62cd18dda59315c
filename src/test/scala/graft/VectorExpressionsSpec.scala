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

  test("signed_projection_bucket matches the exploded md5 SQL formulation") {
    // The retired plan: quantize via Spark round, explode (dim × lane),
    // re-derive each ±1 from md5 per row, two groupBys. The native
    // expression must reproduce it bit-for-bit on vectors with negative
    // values (where Math.round-style quantization would diverge).
    val nBits = 13
    val sgn = when(substring(md5(concat_ws(":", col("i"), col("j"))), 1, 1)
      .isin("0", "1", "2", "3", "4", "5", "6", "7"), lit(1L)).otherwise(lit(-1L))
    val q = vecs.select(col("vec_id"), posexplode(
      expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"))
      .as(Seq("j", "qv")))
    val oldBk = q.withColumn("i", explode(sequence(lit(0), lit(nBits - 1))))
      .groupBy("vec_id", "i").agg(sum(col("qv") * sgn).as("proj"))
      .groupBy("vec_id")
      .agg(sum(when(col("proj") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), CAST(i AS INT))")).otherwise(0L))
        .as("old_bucket"))
    val signs = graft.functions.SignedProjectionBucket.md5Signs(nBits, dim = 64)
    val newBk = vecs.select(col("vec_id"),
      VectorFunctions.signed_projection_bucket(col("embedding"), signs, 1000)
        .as("bucket"))
    val joined = newBk.join(oldBk, Seq("vec_id"))
    assert(joined.count() == 50)
    assert(joined.filter(col("bucket") =!= col("old_bucket")).isEmpty)
  }

  test("quantize replicates Spark round-then-cast on half-way ties") {
    // 0.0005f·1000 and -0.0005f·1000 land on exact .5 in double for some
    // floats; Spark's Round is HALF_UP on BigDecimal.valueOf (away from
    // zero), Math.round is floor(x+0.5) — they differ at negative ties.
    val tricky = Seq(0.0005f, -0.0005f, 0.0015f, -0.0015f, 1.9995f,
      -1.9995f, 0f, -0f, 0.4999999f, -0.4999999f)
    val sparkSide = tricky.toDF("x")
      .select(expr("CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)").as("q"))
      .collect().map(_.getLong(0))
    val native = tricky.map(
      graft.functions.SignedProjectionBucket.quantize(_, 1000))
    assert(sparkSide.toSeq == native)
  }

  test("hyperplane_bucket matches the aggregate/zip_with HOF formulation") {
    // Same splitmix64 plane derivation as lshSignature; the HOF chain is
    // the retired interpreted implementation. Sequential double
    // accumulation order is identical, so signatures must be bit-equal.
    val nBits = 12
    val dim = 64
    val planes: Seq[Seq[Double]] = Seq.tabulate(nBits, dim) { (i, j) =>
      var z = i.toLong * 1024 + j + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      (math.floorMod(z, 2000001L).toDouble / 1000000.0) - 1.0
    }
    val m = typedlit(planes)
    val hof = aggregate(
      sequence(lit(0), lit(nBits - 1)),
      lit(0L),
      (acc, i) => {
        val d = aggregate(
          zip_with(col("embedding"), element_at(m, i.cast("int") + 1),
            (x, r) => coalesce(x.cast("double") * r, lit(0.0))),
          lit(0.0), (s, v) => s + v)
        acc + when(d > 0, call_function("shiftleft", lit(1L), i.cast("int")))
          .otherwise(0L)
      },
    )
    val df = vecs.select(
      VectorFunctions.hyperplane_bucket(col("embedding"), planes).as("native"),
      hof.as("hof"))
    assert(df.filter(col("native") =!= col("hof")).isEmpty)
  }

  test("quantized_top_dots ranks by integer dot with min-id tie-break") {
    // centroids: c10 = (1000, 0), c20 = (0, 1000), c30 = (1000, 0) — c30
    // duplicates c10 so the tie must resolve to the smaller id. vec (1, 0)
    // → dots: c10 = 1e6, c20 = 0, c30 = 1e6 → top-2 = [10, 30].
    val cents = Seq(Seq(1000L, 0L), Seq(0L, 1000L), Seq(1000L, 0L))
    val ids = Seq(10L, 20L, 30L)
    val df = Seq(Tuple1(Array(1f, 0f))).toDF("v").select(
      VectorFunctions.quantized_top_dots(col("v"), cents, ids, 2, 1000).as("t"))
    assert(df.head().getSeq[Long](0) == Seq(10L, 30L))
  }

  test("quantized_top_dots compiles under codegen (no fallback)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val at = ArrayType(FloatType, containsNull = false)
    val proj = GenerateUnsafeProjection.generate(Seq(
      graft.functions.QuantizedTopDots(
        BoundReference(0, at, nullable = false),
        Seq(Seq(1000L, 0L), Seq(0L, 1000L)), Seq(7L, 8L), 1, 1000)))
    val out = proj(InternalRow(new GenericArrayData(Array[Any](0f, 1f))))
    assert(out.getArray(0).toLongArray.toSeq == Seq(8L))
  }

  test("signed_projection_bucket compiles under codegen (no fallback)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val at = ArrayType(FloatType, containsNull = false)
    val signs = Seq(Seq[Byte](1, 1), Seq[Byte](-1, 1))
    val proj = GenerateUnsafeProjection.generate(Seq(
      graft.functions.SignedProjectionBucket(
        BoundReference(0, at, nullable = false), signs, 1000)))
    // qv = (1000, 2000): lane0 = 3000 > 0 → bit 0; lane1 = 1000 > 0 → bit 1
    val out = proj(InternalRow(new GenericArrayData(Array[Any](1f, 2f))))
    assert(out.getLong(0) == 3L)
  }
}
