package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShims.{column => toCol, expression => toExpr}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mergeable MinHash union sketch as a TypedImperativeAggregate.
  *
  * Input: per-row MinHash signatures (array<long>, from MinHashSignature).
  * The aggregate folds them with element-wise min, which is exactly the
  * MinHash signature of the UNION of the underlying shingle sets — a
  * mergeable sketch: partial aggregation on the map side, tiny fixed-size
  * (k·8 bytes) state across the shuffle, associative+commutative merge.
  * That is what makes corpus-level similarity viable at 100 TB: per-group
  * sketches instead of per-group shingle sets.
  *
  * jaccard(A, B) ≈ fraction of lanes where sketch_A(i) == sketch_B(i).
  */
case class MinHashUnionSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_union expects array<bigint> signatures, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_union"

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(k, arr.numElements())
      var i = 0
      while (i < n) {
        val x = arr.getLong(i)
        if (x < buffer(i)) buffer(i) = x
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (other(i) < buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashUnionSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashUnionSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashUnionSketch =
    copy(child = newChild)
}

/** Exact Pearson sufficient statistics over quantized vector elements as
  * ONE mergeable aggregate — the outer-product treeAggregate shape
  * expressed as a TypedImperativeAggregate. Per input vector the update
  * loop accumulates n, Σq_i, Σq_i², and the upper-triangle Σq_i·q_j into
  * a single long array: the same exact integers as the declarative
  * double-posexplode + hash-aggregate formulation, but each element pair
  * costs one multiply-add into an array slot instead of a generated row
  * plus a 2016-key hash probe — the CPU constant that matters when n·d²
  * is 4e12 at corpus scale. State is (2 + 2d + d(d-1)/2) longs (~17.7 KB
  * at d = 64), map-side partial by construction, associative merge.
  *
  * Quantization is q = round(x·scale) with HALF-AWAY-FROM-ZERO ties —
  * bit-matching Spark's `round()` on doubles (SimilaritySpec pins the
  * aggregate equal to the declarative sums), so the DuckDB oracle is
  * unchanged. Layout: [n, d, sx(1..d), sxx(1..d), sxy(upper triangle,
  * row-major)].
  *
  * OVERFLOW CONTRACT: every accumulation uses Math.addExact/multiplyExact,
  * so exceeding Int64 FAILS LOUDLY (ArithmeticException) instead of
  * silently wrapping while the DuckDB oracle keeps summing into HUGEINT.
  * The real bound: with |q| ≤ Q, Σq² overflows Long at ~2⁶³/Q² rows —
  * ~9e10 rows for unit-scale elements at scale = 10⁴. Beyond that, shard
  * the corpus (the stats are associative: sum the [n,sx,sxx,sxy] arrays of
  * the shards exactly in decimal/HUGEINT) or lower `scale`; the exactness
  * claim holds only inside this bound, which the guard now enforces. The
  * exact-check branches are JIT intrinsics (predicted-not-taken), so the
  * hot-loop cost is unchanged.
  */
case class CorrSufficientStats(
    child: Expression,
    scale: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"corr_stats expects array<float|double>, got ${other.simpleString}")
  }

  // lazy: the child is unresolved at construction/copy time
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "corr_stats"

  // allocated lazily on the first vector (d unknown until then); the
  // 2-slot zero buffer stays mergeable as the identity
  override def createAggregationBuffer(): Array[Long] = new Array[Long](2)

  /** Spark Round semantics on doubles, replicated EXACTLY: BigDecimal on
    * the shortest round-trip representation, HALF_UP. A floor(x·s + 0.5)
    * shortcut is NOT equivalent for double inputs — for v = 0.5 − 2⁻⁵⁴
    * the addition rounds up to 1.0 and floor answers 1 where round()
    * answers 0 (float inputs widened to double cannot hit this: a
    * float·10⁴ product carries ≤ 38 significant bits, so the sum stays
    * exact — but this aggregate accepts array<double> too). Per-ELEMENT
    * cost (n·d), not per-pair (n·d²), so the BigDecimal stays off the
    * hot loop.
    */
  private def q(x: Double): Long =
    java.math.BigDecimal.valueOf(x * scale)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    var buf = buffer
    if (buf.length == 2) {
      buf = new Array[Long](2 + 2 * d + d * (d - 1) / 2)
      buf(1) = d
    }
    require(buf(1) == d,
      s"corr_stats: embedding dimension changed mid-aggregate (${buf(1)} -> $d)")
    val qs = new Array[Long](d)
    var i = 0
    while (i < d) {
      qs(i) = q(if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
      i += 1
    }
    buf(0) += 1
    i = 0
    while (i < d) {
      buf(2 + i) = Math.addExact(buf(2 + i), qs(i))
      buf(2 + d + i) = Math.addExact(buf(2 + d + i), Math.multiplyExact(qs(i), qs(i)))
      i += 1
    }
    var idx = 2 + 2 * d
    i = 0
    while (i < d) {
      var j = i + 1
      while (j < d) {
        buf(idx) = Math.addExact(buf(idx), Math.multiplyExact(qs(i), qs(j)))
        idx += 1; j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.length == 2) return buffer
    if (buffer.length == 2) return other.clone()
    require(buffer(1) == other(1),
      s"corr_stats: merging different dimensions (${buffer(1)} vs ${other(1)})")
    var i = 0
    while (i < buffer.length) {
      if (i != 1) buffer(i) = Math.addExact(buffer(i), other(i))
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.length * 8)
    bb.putInt(buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bb.getInt)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CorrSufficientStats =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CorrSufficientStats =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CorrSufficientStats =
    copy(child = newChild)
}

object SketchFunctions {

  /** Aggregate Column: union-MinHash sketch of per-row signatures. */
  def minhash_union(sig: Column, k: Int): Column =
    toCol(MinHashUnionSketch(toExpr(sig), k).toAggregateExpression())

  /** Aggregate Column: exact Pearson sufficient statistics (see
    * [[CorrSufficientStats]]).
    */
  def corr_stats(vec: Column, scale: Int): Column =
    toCol(CorrSufficientStats(toExpr(vec), scale).toAggregateExpression())

  /** Estimated Jaccard between two sketches: matching-lane fraction. */
  def sketch_jaccard(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / size(a)
}
