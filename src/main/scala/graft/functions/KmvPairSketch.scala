package graft.functions

import java.nio.ByteBuffer
import java.util.Comparator

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Bottom-k sketch over a COMPOSITE (hash, tieBreak) key, ordered
  * lexicographically — the fully deterministic sibling of [[KmvSketch]].
  * Where `KmvSketch` keys on the hash alone (a 60-bit md5 collision makes
  * two rows share one TreeSet slot, so "h ≤ kth" can admit k+1 rows and the
  * window-oracle's ORDER BY h becomes a nondeterministic tie), this sketch
  * carries a unique tie-break column (doc_id) in the key, so the k kept
  * pairs — and the threshold pair (kth_hash, kth_tie) — match a
  * `row_number() OVER (ORDER BY h, tie)` selection EXACTLY, collisions
  * included. Same 100 TB shape: O(k) state, O(log k) per row, map-side
  * mergeable partials.
  *
  * Output struct: (n_kept, kth_hash, kth_tie). Selection filter for
  * "bottom cap rows of the group": `n_kept < k  OR  h < kth_hash  OR
  * (h = kth_hash AND tie <= kth_tie)`. */
case class KmvPairSketch(
    hashChild: Expression,
    tieChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Array[Long]]] {

  require(k > 0, "kmv_pair_sketch needs k > 0")

  override def children: Seq[Expression] = Seq(hashChild, tieChild)

  override def checkInputDataTypes(): TypeCheckResult =
    (hashChild.dataType, tieChild.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (h, t) => TypeCheckResult.TypeCheckFailure(
        s"kmv_pair_sketch expects (long hash, long tieBreak), got ($h, $t)")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_kept", IntegerType, nullable = false),
    StructField("kth_hash", LongType, nullable = false),
    StructField("kth_tie", LongType, nullable = false)))

  override def nullable: Boolean = true

  private def cmp: Comparator[Array[Long]] = KmvPairSketch.PairOrder

  override def createAggregationBuffer(): java.util.TreeSet[Array[Long]] =
    new java.util.TreeSet[Array[Long]](cmp)

  private def offer(buf: java.util.TreeSet[Array[Long]], pair: Array[Long]): Unit = {
    if (buf.size < k || cmp.compare(pair, buf.last()) < 0) {
      buf.add(pair) // (h, tie) pairs are unique per row: tie is a key column
      if (buf.size > k) buf.pollLast()
    }
  }

  override def update(buf: java.util.TreeSet[Array[Long]], input: InternalRow): java.util.TreeSet[Array[Long]] = {
    val h = hashChild.eval(input)
    val t = tieChild.eval(input)
    if (h != null && t != null)
      offer(buf, Array(h.asInstanceOf[Long], t.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: java.util.TreeSet[Array[Long]], other: java.util.TreeSet[Array[Long]]): java.util.TreeSet[Array[Long]] = {
    val it = other.iterator()
    var done = false
    while (it.hasNext && !done) {
      val pair = it.next()
      if (buf.size < k || cmp.compare(pair, buf.last()) < 0) {
        buf.add(pair)
        if (buf.size > k) buf.pollLast()
      } else done = true // `other` iterates ascending: the rest can't enter
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[Array[Long]]): Any = {
    if (buf.isEmpty) return null
    val kth = buf.last()
    InternalRow(buf.size, kth(0), kth(1))
  }

  override def serialize(buf: java.util.TreeSet[Array[Long]]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p(0)); bb.putLong(p(1)) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Array[Long]] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[Array[Long]](cmp)
    var i = 0
    while (i < n) { buf.add(Array(bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvPairSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvPairSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(hashChild = newChildren(0), tieChild = newChildren(1))
}

object KmvPairSketch {
  /** Lexicographic (hash, tie) order; a named Serializable object so the
    * aggregate (which holds it as a field) survives task serialization. */
  object PairOrder extends Comparator[Array[Long]] with Serializable {
    override def compare(a: Array[Long], b: Array[Long]): Int = {
      val c = java.lang.Long.compare(a(0), b(0))
      if (c != 0) c else java.lang.Long.compare(a(1), b(1))
    }
  }

  /** `kmv_pair_sketch(hashCol, tieCol, k)` as an aggregate Column:
    * threshold struct (n_kept, kth_hash, kth_tie) of the k smallest
    * (hash, tie) pairs in lexicographic order. */
  def kmv_pair_sketch(hash: Column, tie: Column, k: Int): Column =
    GraftColumnBridge.column(
      KmvPairSketch(GraftColumnBridge.expression(hash),
        GraftColumnBridge.expression(tie), k).toAggregateExpression())
}
