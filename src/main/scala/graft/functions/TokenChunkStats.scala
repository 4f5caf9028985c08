package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Token-budget chunk statistics (the x76 kernel): given the per-word
  * token counts of one document (in word order), assign every word to the
  * chunk `floor(cum_tokens_before_word / budget)` and emit one struct per
  * chunk — a single LINEAR pass per row, entirely inside the scan
  * projection, so the chunking operator needs NO shuffle at any corpus
  * size (the same fusion argument as the sibling hash kernels).
  *
  * Chunk semantics: a word belongs wholly to the chunk its FIRST token
  * falls in (word-boundary chunking — chunks may overflow `budget` by at
  * most one word's tokens, and a single word longer than the budget owns
  * its chunk and SKIPS the ids its overflow covers). Zero-token words
  * (empty strings from consecutive separators) attach to the current
  * chunk without advancing it. Equivalence with the window-twin
  * formulation (cumulative sum + floor division + groupBy) is
  * spec-proven in KernelPropertiesSpec.
  *
  * Eval-based (CodegenFallback) like the sibling text kernels; cost is
  * O(words) per row with O(chunks) output. */
case class TokenChunkStats(child: Expression, budget: Long)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(budget >= 1L, "budget must be >= 1 token")

  override def dataType: DataType = ArrayType(TokenChunkStats.chunkType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"token_chunk_stats expects array<bigint>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val counts = input.asInstanceOf[ArrayData]
    val n = counts.numElements()
    val out = new java.util.ArrayList[AnyRef]()
    var cum = 0L
    var curId = -1L
    var nWords = 0L
    var toks = 0L
    var first = 0L
    var last = 0L
    def flush(): Unit = if (curId >= 0L) {
      val row = new GenericInternalRow(5)
      row.setLong(0, curId); row.setLong(1, nWords); row.setLong(2, toks)
      row.setLong(3, first); row.setLong(4, last)
      out.add(row)
    }
    var i = 0
    while (i < n) {
      val v = counts.getLong(i)
      val cid = cum / budget // tokens are counts: cum >= 0, plain / == div
      if (cid != curId) {
        flush()
        curId = cid; nWords = 0L; toks = 0L; first = i.toLong
      }
      nWords += 1L; toks += v; last = i.toLong
      cum += v
      i += 1
    }
    flush()
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenChunkStats {
  val chunkType: StructType = StructType(Seq(
    StructField("chunk_id", LongType, nullable = false),
    StructField("n_words", LongType, nullable = false),
    StructField("chunk_tokens", LongType, nullable = false),
    StructField("first_word", LongType, nullable = false),
    StructField("last_word", LongType, nullable = false)))

  /** `token_chunk_stats(perWordTokenCounts, budget)` — one struct per
    * token-budget chunk of the document. */
  def token_chunk_stats(counts: Column, budget: Long): Column =
    GraftColumnBridge.column(TokenChunkStats(GraftColumnBridge.expression(counts), budget))
}
