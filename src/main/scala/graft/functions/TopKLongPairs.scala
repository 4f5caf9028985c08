package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded smallest-k aggregate over (sortKey, id) long pairs, ordered by
  * (sortKey, id) — the per-group TOP-K as a partial-combining aggregate
  * instead of a rank window. The window form (`row_number() OVER
  * (PARTITION BY g ORDER BY …) <= k`) must shuffle and SORT every
  * candidate row a second time; this aggregate keeps at most `2k` pairs
  * of state per (group × mapper), combines map-side like any partial agg,
  * and the top-k shuffle carries O(mappers · groups · k) pairs no matter
  * how many candidates the scan produced. At a 1000-executor scale-out
  * that is the difference between re-shuffling the whole candidate set
  * and shuffling a constant per task.
  *
  * Integer on purpose (the ArrayLongSum discipline): callers rank on
  * exact integer keys (quantized distances, cents), so the winner set is
  * partition-order-independent and engine-exact. Ties break on the id —
  * (sortKey, id) pairs are assumed UNIQUE per group (true for any
  * (distance, candidate-id) ranking), making the result total-order
  * deterministic. Null keys/ids are skipped (SQL aggregate convention).
  *
  * Returns `array<struct<sk: bigint, id: bigint>>` sorted ascending —
  * `posexplode` turns position+1 into the rank. */
case class TopKLongPairs(
    sortKey: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Long)]] {

  require(k > 0, s"top_k_long_pairs: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(sortKey, id)

  override def checkInputDataTypes(): TypeCheckResult =
    (sortKey.dataType, id.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"top_k_long_pairs expects (bigint, bigint), got ($a, $b)")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("sk", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): ArrayBuffer[(Long, Long)] =
    ArrayBuffer.empty

  /** Keep the buffer ≤ 2k: amortized O(1) per row — a sort+truncate every
    * k appends, never per row. */
  private def compact(buf: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    if (buf.length > 2 * k) {
      val kept = buf.sorted.take(k)
      buf.clear()
      buf ++= kept
    }
    buf
  }

  override def update(buf: ArrayBuffer[(Long, Long)],
                      input: InternalRow): ArrayBuffer[(Long, Long)] = {
    val sk = sortKey.eval(input)
    val i = id.eval(input)
    if (sk == null || i == null) buf
    else compact(buf += ((sk.asInstanceOf[Long], i.asInstanceOf[Long])))
  }

  override def merge(buf: ArrayBuffer[(Long, Long)],
                     other: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] =
    compact(buf ++= other)

  override def eval(buf: ArrayBuffer[(Long, Long)]): Any =
    new GenericArrayData(buf.sorted.take(k).map { case (sk, i) =>
      new GenericInternalRow(Array[Any](sk, i))
    }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.length)
    bb.putInt(buf.length)
    buf.foreach { case (sk, i) => bb.putLong(sk); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Long, Long)](n)
    var j = 0
    while (j < n) { buf += ((bb.getLong, bb.getLong)); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLongPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLongPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(sortKey = newChildren(0), id = newChildren(1))
}

object TopKLongPairs {
  /** `top_k_long_pairs(sortKey, id, k)`: the k smallest (sortKey, id)
    * pairs per group, ascending. */
  def top_k_long_pairs(sortKey: Column, id: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKLongPairs(GraftColumnBridge.expression(sortKey),
        GraftColumnBridge.expression(id), k).toAggregateExpression())
}
