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
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1)),
    ))
    // opt-in band-join → binned equi-join rewrite (see its scaladoc)
    ext.injectOptimizerRule(_ => graft.plans.BinnedRangeJoinRule)
  }
}
