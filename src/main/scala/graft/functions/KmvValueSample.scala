package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bottom-k hash-priority sample: keeps the payload values of the k rows
  * with the smallest (distinct) hash keys — a DETERMINISTIC uniform sample
  * (the hash is the priority, so the chosen rows are a pure function of
  * the data: stable under partitioning, task retries, and merge order,
  * unlike `TABLESAMPLE`/`rand()`-reservoirs). Same bounded-mergeable shape
  * as [[KmvSketch]]: O(k) state, map-side partials, one pass — the 100 TB
  * path to sample-based statistics (quantiles, means) where the exact
  * order-statistic route (x29) must shuffle every row.
  *
  * Fed with `Dedup.md5Hash60` keys the whole sample is oracle-replicable:
  * SQL can select the same k hash-minima and their payloads. Output:
  * the sampled payload values sorted ascending (ready for quantile picks).
  * Ties on hash keep one value (first merged wins is avoided by keying the
  * map on hash; md5-60 collisions over realistic k are not a factor, and
  * determinism is preserved by keeping the MIN payload per colliding hash). */
case class KmvValueSample(
    hashChild: Expression,
    valueChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Long]] {

  require(k > 0, "kmv_value_sample needs k > 0")

  override def children: Seq[Expression] = Seq(hashChild, valueChild)

  override def checkInputDataTypes(): TypeCheckResult =
    (hashChild.dataType, valueChild.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (h, v) => TypeCheckResult.TypeCheckFailure(
        s"kmv_value_sample expects (long hash, long value), got ($h, $v)")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Long] =
    new java.util.TreeMap[java.lang.Long, java.lang.Long]()

  private def offer(buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
                    h: Long, v: Long): Unit = {
    if (buf.size < k || h < buf.lastKey()) {
      val prev = buf.get(h)
      if (prev == null || v < prev) buf.put(h, v)
      if (buf.size > k) buf.pollLastEntry()
    } else if (buf.containsKey(h)) {
      val prev = buf.get(h)
      if (v < prev) buf.put(h, v)
    }
  }

  override def update(buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
                      input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val h = hashChild.eval(input)
    val v = valueChild.eval(input)
    if (h != null && v != null) offer(buf, h.asInstanceOf[Long], v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
                     other: java.util.TreeMap[java.lang.Long, java.lang.Long]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      offer(buf, e.getKey.longValue(), e.getValue.longValue())
    }
    buf
  }

  override def eval(buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Any = {
    if (buf.isEmpty) return null
    val vals = new Array[Long](buf.size)
    val it = buf.values().iterator()
    var i = 0
    while (it.hasNext) { vals(i) = it.next(); i += 1 }
    java.util.Arrays.sort(vals)
    new GenericArrayData(vals)
  }

  override def serialize(buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); bb.putLong(e.getKey); bb.putLong(e.getValue) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeMap[java.lang.Long, java.lang.Long]()
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvValueSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvValueSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(hashChild = newChildren(0), valueChild = newChildren(1))
}

object KmvValueSample {
  /** `kmv_value_sample(hashCol, valueCol, k)` as an aggregate Column:
    * payload values of the k smallest distinct hashes, sorted ascending. */
  def kmv_value_sample(hash: Column, value: Column, k: Int): Column =
    GraftColumnBridge.column(
      KmvValueSample(GraftColumnBridge.expression(hash),
        GraftColumnBridge.expression(value), k).toAggregateExpression())
}
