package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** BPE tokenization with a FITTED merge ranking baked in as a plan-time
  * constant (the HyperplaneSignature pattern: model state rides the
  * serialized expression, no lookup join, no UDF). Per whitespace word:
  * start from characters, repeatedly apply the lowest-rank merge present
  * until none applies — the standard greedy BPE encode. Output is the
  * flat token stream in document order (word boundaries are token
  * boundaries by construction, so concatenating tokens reproduces the
  * de-spaced text — the spec's round-trip invariant).
  *
  * Eval-based (CodegenFallback) like the sibling text kernels: the
  * per-row work is a fused loop over words; tokenization cost is
  * O(len · merges-applied), independent of corpus size and fully
  * distributed. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bpe_encode expects string, got $t")
  }

  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap
  @transient private lazy val mergeArr: IndexedSeq[(String, String)] =
    merges.toIndexedSeq // O(1) lookup in the encode loop even if merges is a List

  private def encodeWord(w: String, out: java.util.ArrayList[AnyRef]): Unit = {
    if (w.isEmpty) return
    var syms = new java.util.ArrayList[String](w.length)
    var ci = 0
    while (ci < w.length) {
      val cp = w.codePointAt(ci)
      val n = Character.charCount(cp)
      syms.add(w.substring(ci, ci + n))
      ci += n
    }
    var done = false
    while (!done && syms.size > 1) {
      // lowest-rank adjacent pair present in the word
      var best = Int.MaxValue
      var i = 0
      while (i < syms.size - 1) {
        val r = rank.getOrElse((syms.get(i), syms.get(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = mergeArr(best)
        val next = new java.util.ArrayList[String](syms.size)
        var j = 0
        while (j < syms.size) {
          if (j < syms.size - 1 && syms.get(j) == a && syms.get(j + 1) == b) {
            next.add(a + b); j += 2 // merge all non-overlapping occurrences left-to-right
          } else { next.add(syms.get(j)); j += 1 }
        }
        syms = next
      }
    }
    var k = 0
    while (k < syms.size) {
      out.add(org.apache.spark.unsafe.types.UTF8String.fromString(syms.get(k))); k += 1
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.split(" ", -1)
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    while (i < words.length) { encodeWord(words(i), out); i += 1 }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {
  /** `bpe_encode(text, merges)` — tokens under the fitted merge ranking. */
  def bpe_encode(text: Column, merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(BpeEncode(GraftColumnBridge.expression(text), merges))
}
