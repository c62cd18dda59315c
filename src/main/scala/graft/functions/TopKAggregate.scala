package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShims.{column => toCol, expression => toExpr}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Top-k (score, id) pairs per group as a TypedImperativeAggregate.
  *
  * The built-in way to get "top k per key" is a window `row_number` over a
  * per-key sort — which materializes and sorts EVERY row of every key on
  * the reducer. This aggregate keeps a bounded buffer instead: map-side
  * partial aggregation reduces each key to ≤ k pairs per mapper BEFORE the
  * shuffle, so reducer input is k·mappers rows per key instead of the full
  * candidate set — the difference between an ANN query that ships 100 TB of
  * scored candidates and one that ships kilobytes.
  *
  * Ordering: descending score, ascending id on ties — fully deterministic.
  * Output: array<struct<score double, id bigint>> sorted in rank order.
  */
case class TopKPairs(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[TopKPairs.Buf] with BinaryLike[Expression] {

  import TopKPairs.Buf

  override def left: Expression = scoreExpr
  override def right: Expression = idExpr

  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreExpr.dataType == DoubleType && idExpr.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_pairs expects (double, bigint), got " +
        s"(${scoreExpr.dataType.simpleString}, ${idExpr.dataType.simpleString})")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_pairs"

  override def createAggregationBuffer(): Buf = new Buf(k)

  override def update(b: Buf, input: InternalRow): Buf = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: Buf, other: Buf): Buf = { b.mergeFrom(other); b }

  override def eval(b: Buf): Any = {
    val sorted = b.sorted
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
  }

  override def serialize(b: Buf): Array[Byte] = {
    val arr = b.sorted
    val bb = ByteBuffer.allocate(4 + arr.length * 16)
    bb.putInt(arr.length)
    arr.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new Buf(k)
    var j = 0
    while (j < n) { b.insert(bb.getDouble, bb.getLong); j += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairs =
    copy(scoreExpr = newLeft, idExpr = newRight)
}

object TopKPairs {
  /** Bounded buffer: keeps at most 2k entries, compacts to the best k.
    * Rank order: score desc, id asc.
    */
  final class Buf(k: Int) {
    private var scores = new Array[Double](2 * k)
    private var ids = new Array[Long](2 * k)
    private var n = 0

    def insert(s: Double, i: Long): Unit = {
      if (n == scores.length) compact() // leaves n == k, room for k more
      scores(n) = s; ids(n) = i; n += 1
    }

    private def compact(): Unit = {
      val order = (0 until n).sortBy(j => (-scores(j), ids(j)))
      val keep = order.take(k)
      val ns = new Array[Double](2 * k)
      val ni = new Array[Long](2 * k)
      var j = 0
      keep.foreach { idx => ns(j) = scores(idx); ni(j) = ids(idx); j += 1 }
      scores = ns; ids = ni; n = j
    }

    def mergeFrom(other: Buf): Unit = {
      var j = 0
      while (j < other.n) { insert(other.scores(j), other.ids(j)); j += 1 }
    }

    def sorted: Seq[(Double, Long)] = {
      val order = (0 until n).sortBy(j => (-scores(j), ids(j)))
      order.take(k).map(j => (scores(j), ids(j)))
    }
  }

  /** Aggregate Column: top-k (score desc, id asc) pairs per group. */
  def topk_pairs(score: Column, id: Column, k: Int): Column =
    toCol(TopKPairs(toExpr(score), toExpr(id), k).toAggregateExpression())
}
