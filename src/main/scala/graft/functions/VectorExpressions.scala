package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}

/** Native Catalyst expression for cosine similarity over float-vector
  * columns.
  *
  * The higher-order-function formulation (zip_with + aggregate,
  * Similarity.cosineHof) cannot participate in codegen — Spark evaluates
  * lambda functions interpretively per element, which dominates the ANN
  * hot path. This expression compiles to a tight primitive loop inside
  * whole-stage codegen: no per-element boxing, no lambda dispatch.
  *
  * Accumulation order (sequential, double precision) matches the HOF
  * version bit-for-bit, so both implementations and the DuckDB oracle
  * agree exactly.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // Every local must come from ctx.freshName: two cosine_sim calls in
      // one codegen stage otherwise redeclare the same variables and Janino
      // rejects the stage (silent fallback to interpreted eval).
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Integer dot product of two float vectors after round(x·scale)
  * quantization — the pairwise scoring primitive of the cross-engine ANN
  * variants. Long arithmetic end-to-end, so the score is EXACT and
  * order-independent in any engine (the SQL oracle sums the same integer
  * products). Replaces the explode(dim)-join-groupBy scoring plan: each
  * candidate pair ships two 64-float arrays once and pays one fused loop
  * — no 64× row blowup, no aggregation exchange.
  */
case class QuantizedDot(left: Expression, right: Expression, scale: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantized_dot expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quantized_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    QuantizedDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[QuantizedDot].getName
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $cls.dot($a, $b, $scale);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QuantizedDot {
  /** Static so generated code can call it; quantization is
    * [[SignedProjectionBucket.quantize]] (Spark Round semantics).
    */
  def dot(x: ArrayData, y: ArrayData, scale: Int): Long = {
    val n = math.min(x.numElements(), y.numElements())
    var d = 0L
    var i = 0
    while (i < n) {
      d += SignedProjectionBucket.quantize(x.getFloat(i), scale) *
        SignedProjectionBucket.quantize(y.getFloat(i), scale)
      i += 1
    }
    d
  }
}

/** Nearest-centroid assignment: argmax over a small codebook of cosine
  * similarity between the input vector and each centroid, ties broken to
  * the smallest centroid id (NaN compares greatest, matching Spark's
  * struct ordering so results agree with a greatest(struct(cos,-id))
  * formulation).
  *
  * The codebook rides along as a reference object — ONE compiled loop per
  * stage regardless of codebook size, instead of an expression tree with
  * k cosine sub-trees whose codegen grows (and Janino compile time with
  * it) linearly in k. This is what keeps IVF assignment at scan speed:
  * per row it is k×dim fused multiply-adds with zero allocation.
  */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Float]],
    ids: Seq[Long]) extends UnaryExpression {
  require(centroids.nonEmpty && centroids.length == ids.length,
    "nearest_centroid needs a non-empty codebook with one id per centroid")

  @transient private lazy val mat: Array[Array[Float]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val idArr: Array[Long] = ids.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    var bestC = 0.0
    var bestId = 0L
    var j = 0
    while (j < mat.length) {
      val cv = mat(j)
      val m = math.min(n, cv.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < m) {
        val xi = x.getFloat(i).toDouble
        val yi = cv(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      val c = dot / (math.sqrt(na) * math.sqrt(nb))
      val cmp = java.lang.Double.compare(c, bestC)
      if (j == 0 || cmp > 0 || (cmp == 0 && idArr(j) < bestId)) {
        bestC = c; bestId = idArr(j)
      }
      j += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("centMat", mat, "float[][]")
    val idsRef = ctx.addReferenceObj("centIds", idArr, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val bestC = ctx.freshName("bestC")
      val bestId = ctx.freshName("bestId")
      val j = ctx.freshName("j")
      val cv = ctx.freshName("cv")
      val m = ctx.freshName("m")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      s"""
         |int $n = $v.numElements();
         |double $bestC = 0.0;
         |long $bestId = 0L;
         |for (int $j = 0; $j < $matRef.length; $j++) {
         |  float[] $cv = $matRef[$j];
         |  int $m = java.lang.Math.min($n, $cv.length);
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    double $xi = (double) $v.getFloat($i);
         |    double $yi = (double) $cv[$i];
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  double $c = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  int $cmp = java.lang.Double.compare($c, $bestC);
         |  if ($j == 0 || $cmp > 0 || ($cmp == 0 && $idsRef[$j] < $bestId)) {
         |    $bestC = $c; $bestId = $idsRef[$j];
         |  }
         |}
         |${ev.value} = $bestId;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-hyperplane LSH bucket for a float vector, in one codegen'd pass.
  *
  * Lane i's hyperplane is the ±1 sign row `signs(i)`; the bucket sets bit i
  * iff Σ_j quantize(x_j)·signs(i)(j) > 0, with quantize(x) =
  * CAST(round(x·scale) AS BIGINT) — the exact integer pipeline the DuckDB
  * oracle runs, so buckets agree bit-for-bit cross-engine. Quantization
  * replicates Spark's `Round` on doubles (BigDecimal.valueOf → HALF_UP)
  * rather than Math.round, which differs on negative .5 ties.
  *
  * Replaces the explode(dims)×explode(lanes) + two-groupBy formulation:
  * that plan blows each row up lanes×dim (≈832×) and shuffles twice before
  * the first bucket exists; this is a narrow projection at scan speed —
  * the sign matrix rides along as a reference object exactly like
  * [[NearestCentroid]]'s codebook, so codegen size is constant in lanes.
  */
case class SignedProjectionBucket(child: Expression, signs: Seq[Seq[Byte]],
    scale: Int) extends UnaryExpression {
  require(signs.nonEmpty && signs.forall(_.length == signs.head.length),
    "signed_projection_bucket needs a rectangular non-empty sign matrix")
  require(signs.length <= 63, "bucket is a signed 64-bit long: at most 63 lanes")

  @transient private lazy val mat: Array[Array[Byte]] = signs.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"signed_projection_bucket expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "signed_projection_bucket"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val dim = math.min(x.numElements(), mat(0).length)
    val qv = new Array[Long](dim)
    var j = 0
    while (j < dim) {
      qv(j) = SignedProjectionBucket.quantize(x.getFloat(j), scale)
      j += 1
    }
    var bucket = 0L
    var i = 0
    while (i < mat.length) {
      val sv = mat(i)
      var p = 0L
      var k = 0
      while (k < dim) { p += qv(k) * sv(k); k += 1 }
      if (p > 0L) bucket |= 1L << i
      i += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("signMat", mat, "byte[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val dim = ctx.freshName("dim")
      val qv = ctx.freshName("qv")
      val j = ctx.freshName("j")
      val bucket = ctx.freshName("bucket")
      val i = ctx.freshName("i")
      val sv = ctx.freshName("sv")
      val p = ctx.freshName("p")
      val k = ctx.freshName("k")
      val cls = classOf[SignedProjectionBucket].getName
      s"""
         |int $dim = java.lang.Math.min($v.numElements(), $matRef[0].length);
         |long[] $qv = new long[$dim];
         |for (int $j = 0; $j < $dim; $j++) {
         |  $qv[$j] = $cls.quantize($v.getFloat($j), $scale);
         |}
         |long $bucket = 0L;
         |for (int $i = 0; $i < $matRef.length; $i++) {
         |  byte[] $sv = $matRef[$i];
         |  long $p = 0L;
         |  for (int $k = 0; $k < $dim; $k++) { $p += $qv[$k] * (long) $sv[$k]; }
         |  if ($p > 0L) $bucket |= 1L << $i;
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-hyperplane LSH bucket over REAL-valued hyperplanes: bit i is set
  * iff dot(v, planes(i)) > 0, accumulated sequentially in double — the
  * same order as the aggregate/zip_with HOF formulation it replaces, so
  * signatures are bit-identical while the per-row cost drops from
  * nBits×dim interpreted lambda dispatches to one fused primitive loop.
  * Elements past the vector's length contribute zero (zip_with + coalesce
  * semantics). Matrix rides along as a reference object.
  */
case class HyperplaneBucket(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {
  require(planes.nonEmpty && planes.forall(_.length == planes.head.length),
    "hyperplane_bucket needs a rectangular non-empty plane matrix")
  require(planes.length <= 63, "bucket is a signed 64-bit long: at most 63 lanes")

  @transient private lazy val mat: Array[Array[Double]] = planes.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_bucket"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val dim = math.min(x.numElements(), mat(0).length)
    var bucket = 0L
    var i = 0
    while (i < mat.length) {
      val pv = mat(i)
      var d = 0.0
      var j = 0
      while (j < dim) { d += x.getFloat(j).toDouble * pv(j); j += 1 }
      if (d > 0.0) bucket |= 1L << i
      i += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("planeMat", mat, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val dim = ctx.freshName("dim")
      val bucket = ctx.freshName("bucket")
      val i = ctx.freshName("i")
      val pv = ctx.freshName("pv")
      val d = ctx.freshName("d")
      val j = ctx.freshName("j")
      s"""
         |int $dim = java.lang.Math.min($v.numElements(), $matRef[0].length);
         |long $bucket = 0L;
         |for (int $i = 0; $i < $matRef.length; $i++) {
         |  double[] $pv = $matRef[$i];
         |  double $d = 0.0;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    $d += (double) $v.getFloat($j) * $pv[$j];
         |  }
         |  if ($d > 0.0) $bucket |= 1L << $i;
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Top-`p` centroid ids by INTEGER dot product against a quantized
  * codebook — the IVF assignment/probe primitive of the cross-engine
  * `ann_ivf_int` pipeline. The input float vector is quantized with
  * [[SignedProjectionBucket.quantize]] (Spark Round semantics) and dotted
  * against each pre-quantized centroid in long arithmetic, so the scores
  * — and therefore the assignment and probe order — are EXACT in any
  * engine (ties broken by smaller centroid id). p=1 is cluster
  * assignment; p=nProbe is the query-side probe list. Same
  * reference-object + fused-loop idiom as [[NearestCentroid]].
  */
case class QuantizedTopDots(child: Expression, centroids: Seq[Seq[Long]],
    ids: Seq[Long], p: Int, scale: Int) extends UnaryExpression {
  require(centroids.nonEmpty && centroids.length == ids.length,
    "quantized_top_dots needs a non-empty codebook with one id per centroid")
  require(p >= 1 && p <= centroids.length,
    s"p must be in [1, ${centroids.length}]")

  @transient private lazy val mat: Array[Array[Long]] = centroids.map(_.toArray).toArray
  @transient private lazy val idArr: Array[Long] = ids.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantized_top_dots expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quantized_top_dots"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      QuantizedTopDots.topIds(x, mat, idArr, p, scale))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("qtdMat", mat, "long[][]")
    val idsRef = ctx.addReferenceObj("qtdIds", idArr, "long[]")
    val cls = classOf[QuantizedTopDots].getName
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $cls.topIds($v, $matRef, $idsRef, $p, $scale));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizedTopDots {
  /** Shared by eval and codegen: quantize once, dot per centroid in long
    * arithmetic, partial-select the top p (dot desc, id asc). The whole
    * selection is k·dim fused integer multiply-adds + p argmax passes —
    * no allocation beyond the two small scratch arrays.
    */
  def topIds(x: ArrayData, mat: Array[Array[Long]], ids: Array[Long],
      p: Int, scale: Int): Array[Long] = {
    val dim = math.min(x.numElements(), mat(0).length)
    val qv = new Array[Long](dim)
    var j = 0
    while (j < dim) {
      qv(j) = SignedProjectionBucket.quantize(x.getFloat(j), scale)
      j += 1
    }
    val dots = new Array[Long](mat.length)
    var c = 0
    while (c < mat.length) {
      val cv = mat(c)
      var d = 0L
      var k = 0
      while (k < dim) { d += qv(k) * cv(k); k += 1 }
      dots(c) = d
      c += 1
    }
    val taken = new Array[Boolean](mat.length)
    val out = new Array[Long](p)
    var r = 0
    while (r < p) {
      var best = -1
      var i = 0
      while (i < mat.length) {
        if (!taken(i) && (best < 0 || dots(i) > dots(best) ||
            (dots(i) == dots(best) && ids(i) < ids(best)))) best = i
        i += 1
      }
      taken(best) = true
      out(r) = ids(best)
      r += 1
    }
    out
  }
}

object SignedProjectionBucket {
  /** Spark-semantics quantizer: CAST(round(CAST(x AS DOUBLE)·scale) AS
    * BIGINT). Spark's Round(double) goes through BigDecimal.valueOf with
    * HALF_UP (shortest-decimal, round half away from zero for negatives);
    * the double→long cast then truncates. Static so codegen can call it.
    */
  def quantize(x: Float, scale: Int): Long =
    java.math.BigDecimal.valueOf(x.toDouble * scale)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  /** The md5 lane·dim sign convention shared with the SQL oracle:
    * +1 iff the first hex char of md5("i:j") is '0'–'7' (high nibble of
    * byte 0 < 8). Computed driver-side once — the old plan recomputed this
    * md5 once per (row, lane, dim).
    */
  def md5Signs(lanes: Int, dim: Int): Seq[Seq[Byte]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until lanes).map { i =>
      (0 until dim).map { j =>
        md.reset()
        val h = md.digest(s"$i:$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        if (((h(0) >> 4) & 0xf) < 8) (1: Byte) else (-1: Byte)
      }
    }
  }
}

object VectorFunctions {
  /** Column-API entry point for the native cosine expression. */
  def cosine_sim(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlShims.column(CosineSimilarity(
      org.apache.spark.sql.GraftSqlShims.expression(a),
      org.apache.spark.sql.GraftSqlShims.expression(b)))

  /** Column-API entry point for codebook argmax assignment. */
  def nearest_centroid(vec: Column, centroids: Seq[Seq[Float]],
      ids: Seq[Long]): Column =
    org.apache.spark.sql.GraftSqlShims.column(NearestCentroid(
      org.apache.spark.sql.GraftSqlShims.expression(vec), centroids, ids))

  /** Column-API entry point for the one-pass LSH bucket. */
  def signed_projection_bucket(vec: Column, signs: Seq[Seq[Byte]],
      scale: Int): Column =
    org.apache.spark.sql.GraftSqlShims.column(SignedProjectionBucket(
      org.apache.spark.sql.GraftSqlShims.expression(vec), signs, scale))

  /** Column-API entry point for the real-valued hyperplane bucket. */
  def hyperplane_bucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    org.apache.spark.sql.GraftSqlShims.column(HyperplaneBucket(
      org.apache.spark.sql.GraftSqlShims.expression(vec), planes))

  /** Column-API entry point for the pairwise integer dot product. */
  def quantized_dot(a: Column, b: Column, scale: Int): Column =
    org.apache.spark.sql.GraftSqlShims.column(QuantizedDot(
      org.apache.spark.sql.GraftSqlShims.expression(a),
      org.apache.spark.sql.GraftSqlShims.expression(b), scale))

  /** Column-API entry point for integer-dot codebook top-p selection. */
  def quantized_top_dots(vec: Column, centroids: Seq[Seq[Long]],
      ids: Seq[Long], p: Int, scale: Int): Column =
    org.apache.spark.sql.GraftSqlShims.column(QuantizedTopDots(
      org.apache.spark.sql.GraftSqlShims.expression(vec), centroids, ids, p,
      scale))

  /** Register `cosine_sim` for the SQL surface of an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
}

/** Session extension (spark.sql.extensions=graft.functions.GraftExtensions)
  * injecting the engine's SQL functions at session build time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // opt-in band-join → binned equi-join rewrite (see its scaladoc)
    ext.injectOptimizerRule(_ => graft.plans.BinnedRangeJoinRule)
  }
}

/** The engine's SQL-callable function surface: every graft expression
  * whose arguments are SQL-expressible. Size/flag arguments must be
  * LITERALS because they shape the expression (output arity, codegen
  * loops) at plan time — a non-literal gets a clear analysis-time error,
  * not a runtime surprise. The centroid/plane families (nearest_centroid,
  * signed_projection_bucket, hyperplane_bucket, quantized_top_dots) take
  * driver-resident model data (a trained codebook, a sign matrix) and are
  * deliberately DSL-only: SQL has no literal syntax for model arrays, and
  * smuggling them through string parsing would defeat the plan-time
  * specialization that makes them fast.
  */
object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.Literal

  private def litInt(es: Seq[Expression], i: Int, fn: String): Int =
    es(i) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be an INT literal " +
          s"(it shapes the expression at plan time), got $other")
    }

  private def litBool(es: Seq[Expression], i: Int, fn: String): Boolean =
    es(i) match {
      case Literal(v: Boolean, BooleanType) => v
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a BOOLEAN literal, got $other")
    }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = {
    val arity = Map("cosine_sim" -> 2, "quantized_dot" -> 3,
      "word_shingles" -> 3, "word_shingle_hashes" -> 3, "char_ngrams" -> 2,
      "minhash_sig" -> 2, "minhash_md5_lanes" -> 2,
      "simhash_md5_chunks" -> 3, "simhash64" -> 1, "intersect_count" -> 2)
    def f(name: String, clazz: Class[_],
        builder: Seq[Expression] => Expression) =
      (new FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name),
        (es: Seq[Expression]) => {
          // clear arity error instead of a bare IndexOutOfBounds from es(i)
          if (es.length != arity(name)) throw new IllegalArgumentException(
            s"$name expects ${arity(name)} argument(s), got ${es.length}")
          builder(es)
        })
    Seq(
      f("cosine_sim", classOf[CosineSimilarity],
        es => CosineSimilarity(es(0), es(1))),
      f("quantized_dot", classOf[QuantizedDot],
        es => QuantizedDot(es(0), es(1), litInt(es, 2, "quantized_dot"))),
      f("word_shingles", classOf[WordShingles],
        es => WordShingles(es(0), litInt(es, 1, "word_shingles"),
          litBool(es, 2, "word_shingles"))),
      f("word_shingle_hashes", classOf[WordShingleHashes],
        es => WordShingleHashes(es(0), litInt(es, 1, "word_shingle_hashes"),
          litBool(es, 2, "word_shingle_hashes"))),
      f("char_ngrams", classOf[CharNGrams],
        es => CharNGrams(es(0), litInt(es, 1, "char_ngrams"))),
      f("minhash_sig", classOf[MinHashSignature],
        es => MinHashSignature(es(0), litInt(es, 1, "minhash_sig"))),
      f("minhash_md5_lanes", classOf[MinHashMd5Lanes],
        es => MinHashMd5Lanes(es(0), litInt(es, 1, "minhash_md5_lanes"))),
      f("simhash_md5_chunks", classOf[SimHashMd5Chunks],
        es => SimHashMd5Chunks(es(0), litInt(es, 1, "simhash_md5_chunks"),
          litInt(es, 2, "simhash_md5_chunks"))),
      f("simhash64", classOf[SimHash64], es => SimHash64(es(0))),
      f("intersect_count", classOf[IntersectCount],
        es => IntersectCount(es(0), es(1))),
    )
  }
}
