package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch over a 60-bit hash column —
  * a bounded-memory, MERGEABLE aggregate: each task keeps only the k
  * smallest distinct hash values (O(k) state, O(log k) per row), partial
  * sketches combine map-side like any sum, and the estimate
  * `(k-1)·2⁶⁰ / h₍ₖ₎` falls out of the kth minimum. That is the 100 TB
  * cardinality-estimation shape: no shuffle of the distinct values
  * themselves, state independent of input size — unlike
  * `countDistinct` (exact but shuffles every distinct value) or
  * `approx_count_distinct` (HLL: bounded too, but its sketch is
  * implementation-defined and so not oracle-checkable).
  *
  * Fed with the engine-neutral `Dedup.md5Hash60` hash, the WHOLE sketch is
  * deterministic and SQL-replicable: the k smallest distinct hashes — and
  * therefore the estimate, computed with two exact IEEE ops — are identical
  * in DuckDB, so the driver oracle checks the sketch algorithm end-to-end
  * (x34). Output struct: (n_kept, kth_hash, est_distinct); below k distinct
  * inputs the sketch is exhaustive and the estimate exact. */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 1, "kmv_sketch needs k > 1")

  /** Hash-space size: md5Hash60 values are uniform in [0, 2^60). The
    * constant is exactly representable as a double (a power of two), and
    * (k-1)·2⁶⁰ stays exact for any realistic k, so the estimate is one
    * exact product and one division — bit-identical cross-engine. */
  private val M: Double = math.pow(2.0, 60)

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"kmv_sketch expects a long hash column, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_kept", IntegerType, nullable = false),
    StructField("kth_hash", LongType, nullable = false),
    StructField("est_distinct", DoubleType, nullable = false)))

  override def nullable: Boolean = true

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // keep only values that can enter the k smallest; TreeSet dedups
      if (buf.size < k || h < buf.last()) {
        buf.add(h)
        if (buf.size > k) buf.pollLast()
      }
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long], other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    var done = false
    while (it.hasNext && !done) {
      val h = it.next()
      if (buf.size < k || h < buf.last()) {
        buf.add(h)
        if (buf.size > k) buf.pollLast()
      } else done = true // `other` is sorted ascending: the rest can't enter
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    if (buf.isEmpty) return null
    val n = buf.size
    val kth = buf.last()
    val est = if (n == k) (k - 1).toDouble * M / kth.toDouble else n.toDouble
    InternalRow(n, kth.longValue(), est)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KmvSketch {
  /** `kmv_sketch(hashCol, k)` as an aggregate Column. */
  def kmv_sketch(hash: Column, k: Int): Column =
    GraftColumnBridge.column(
      KmvSketch(GraftColumnBridge.expression(hash), k).toAggregateExpression())
}
