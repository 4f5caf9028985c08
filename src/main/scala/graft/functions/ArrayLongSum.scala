package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise sum of fixed-width `array<bigint>` columns — the vector
  * accumulator under per-group embedding centroids (x52). The 100 TB
  * shape argument: the naive route (posexplode to (row, dim, value) then
  * groupBy) multiplies the shuffled row count by the dimension (64× here)
  * BEFORE the aggregate can combine; this aggregate keeps the whole
  * per-group state in one dim-length long array that partial-aggregates
  * map-side like a sum, so the shuffle carries one array per (group ×
  * mapper) regardless of input size.
  *
  * Integer on purpose: callers quantize doubles to longs first
  * (floor(x·10⁶) — exact IEEE ops), making the sums order-independent and
  * engine-exact where a double vector sum would be accumulation-order-
  * dependent and unverifiable. Rows must share one length; a mismatch
  * fails loudly rather than mis-aligning dimensions. Null rows are
  * skipped; a null ELEMENT throws at update time (`ArrayData.toLongArray`
  * would silently coerce it to 0 and corrupt the sum — callers quantize
  * first, so a null element is always a caller bug). */
case class ArrayLongSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"array_long_sum expects array<bigint>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  /** Empty marker until the first row fixes the width. */
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def addInto(buf: Array[Long], arr: Array[Long]): Array[Long] = {
    if (buf.isEmpty) return arr.clone()
    require(buf.length == arr.length,
      s"array_long_sum: ragged input (${buf.length} vs ${arr.length} elements)")
    var i = 0
    while (i < buf.length) { buf(i) += arr(i); i += 1 }
    buf
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        require(!arr.isNullAt(i),
          s"array_long_sum: null element at index $i (toLongArray would coerce it to 0)")
        i += 1
      }
      addInto(buf, arr.toLongArray())
    }
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    if (other.isEmpty) buf else addInto(buf, other)

  override def eval(buf: Array[Long]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArrayLongSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArrayLongSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object ArrayLongSum {
  /** `array_long_sum(arrayCol)` as an aggregate Column: element-wise sum. */
  def array_long_sum(arr: Column): Column =
    GraftColumnBridge.column(
      ArrayLongSum(GraftColumnBridge.expression(arr)).toAggregateExpression())
}
