package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd signature kernels for the LSH dedup operators.
  *
  * Both take an already-hashed `array<long>` (produced Spark-side with
  * `transform(..., xxhash64)` so the string hashing itself stays a stock
  * codegen'd expression) and do the per-element × per-bit/permutation work
  * in ONE fused loop. The higher-order-function formulations cost a lambda
  * dispatch per element per permutation (k=32 / 64 passes) and — worse —
  * `CollapseProject` duplicates the input-hash computation into every
  * permutation's expression tree. These kernels are the (b)-tier fix from
  * SURVEY.md §7.3: custom Expression before custom physical operator.
  */

/** MinHash signature: for permutation j < k, min over elements of
  * ((h mod P) * (2j+1) + 7919·(j+1)) mod P — identical numerics to the HOF
  * twin `graft.operators.Dedup.minhashSignature`. */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  private val P = 1000000007L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig expects array<long>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = ((a.getLong(i) % P) + P) % P
      var j = 0
      while (j < k) {
        val v = (h * (2L * j + 1) + 7919L * (j + 1)) % P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val sig = ctx.freshName("sig"); val h = ctx.freshName("h"); val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = (($a.getLong($i) % ${P}L) + ${P}L) % ${P}L;
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = ($h * (2L * $j + 1) + 7919L * ($j + 1)) % ${P}L;
         |    if ($v < $sig[$j]) $sig[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash from element hashes: bit b of the result is set iff more
  * than half the elements have bit b set — identical numerics to the HOF
  * twin `graft.operators.Dedup.simhash` applied to the same hash array. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 expects array<long>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val cnt = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = a.getLong(i)
      var b = 0
      while (b < 64) { cnt(b) += ((h >>> b) & 1L).toInt; b += 1 }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (cnt(b) * 2 > n) out |= (1L << b); b += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val cnt = ctx.freshName("cnt"); val h = ctx.freshName("h"); val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |int[] $cnt = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) $cnt[$b] += (int) (($h >>> $b) & 1L);
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) if ($cnt[$b] * 2 > $n) $out |= (1L << $b);
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared engine-neutral md5-60 hashing: the first 15 hex chars of md5
  * parsed as a long — equivalently the big-endian first 8 digest bytes
  * unsigned-shifted right by 4. Identical to Spark's
  * `conv(substr(md5(s),1,15),16,10)` and DuckDB's
  * `('0x'||substr(md5(s),1,15))::BIGINT` (see `Dedup.md5Hash60`), which is
  * what lets minhash/simhash pipelines built on it be oracle-replicated. */
private[graft] object Md5Long {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash60(s: String): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    hash60(b, 0, b.length)
  }

  /** Same 60-bit digest over a byte slice — the window form the fused
    * char-gram kernel uses (no per-gram String allocation). */
  def hash60(bytes: Array[Byte], from: Int, until: Int): Long = {
    val d = md.get()
    d.reset()
    d.update(bytes, from, until - from)
    val b = d.digest()
    val top =
      ((b(0) & 0xffL) << 56) | ((b(1) & 0xffL) << 48) | ((b(2) & 0xffL) << 40) |
      ((b(3) & 0xffL) << 32) | ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
      ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)
    top >>> 4
  }
}

/** Distinct word-n-gram shingles of a text, each hashed to a long — the
  * fused form of `transform(wordShingles(text, n), <hash>)`: split, window,
  * hash and dedup in one pass per row, no intermediate string arrays.
  * `useMd5 = false` → XXH64(UTF8 bytes, seed 42), bit-identical to Spark's
  * `xxhash64` over the same shingle strings; `useMd5 = true` → the
  * engine-neutral 60-bit md5 hash (`Md5Long.hash60`), bit-identical to the
  * DuckDB hex-parse, which makes downstream minhash signatures
  * oracle-replicable. Eval-based (CodegenFallback): the per-row work is a
  * fused batch loop, so the single virtual call per row is noise. */
case class WordShingleHashes(child: Expression, n: Int, useMd5: Boolean = false)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_shingle_hashes expects string, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.split(" ", -1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    val sb = new java.lang.StringBuilder(64)
    while (i + n <= words.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      val h =
        if (useMd5) Md5Long.hash60(sb.toString)
        else org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
          org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString), 42L)
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-whitespace-token md5-60 hashes, duplicates KEPT (SimHash weights
  * tokens by occurrence) — the fused form of
  * `transform(split(text, " "), w => Dedup.md5Hash60(w))`, one pass, no
  * intermediate string array / per-token expression dispatch. */
case class TokenMd5Hashes(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"token_md5_hashes expects string, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.split(" ", -1)
    val out = new Array[Long](words.length)
    var i = 0
    while (i < words.length) { out(i) = Md5Long.hash60(words(i)); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct char-k-gram md5-60 hashes of a text (x62/x64's gram set) —
  * the fused form of
  * `array_distinct(transform(sequence(1, len-k+1), i => md5-60(substr(text, i, k))))`.
  * That HOF chain evaluates an interpreted lambda per POSITION (sequence
  * array, conv/substring/md5 Column pipeline, hex-string round-trip per
  * gram); this kernel is one pass over the row's UTF-8 bytes: walk the
  * codepoint start offsets exactly as `UTF8String.substringSQL` counts
  * characters (so multibyte text hashes identically — spec-gated against
  * the HOF twin on a non-ASCII fixture), md5 each k-char byte window
  * in-place via one thread-local digest, dedup with a hash set. Same
  * md5-60 values bit-for-bit, so the DuckDB algorithm oracle is
  * untouched. Eval-based (CodegenFallback) like the sibling kernels: the
  * per-row work is a fused batch loop. */
case class CharGramHashes(child: Expression, k: Int, dedup: Boolean = true)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(k > 0, "char_gram_hashes needs k > 0")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"char_gram_hashes expects string, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    // codepoint start offsets (UTF-8 lead bytes are != 10xxxxxx)
    var nChars = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) nChars += 1
      i += 1
    }
    if (nChars < k) return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(nChars) = bytes.length
    // dedup=false keeps one hash PER POSITION in document order, so the
    // array index of an element IS its gram's start offset (the span-level
    // consumers' contract); dedup=true emits each distinct hash once
    val seen = if (dedup) new java.util.HashSet[java.lang.Long]() else null
    val out = new java.util.ArrayList[java.lang.Long](nChars - k + 1)
    var p = 0
    while (p <= nChars - k) {
      val h = Md5Long.hash60(bytes, starts(p), starts(p + k))
      if (seen == null || seen.add(h)) out.add(h)
      p += 1
    }
    val arr = new Array[Long](out.size)
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ALL word-n-gram occurrences as strings — duplicates KEPT, document
  * order preserved (frequency-weighted consumers: the bigram LM model of
  * x49/x54 counts occurrences, not types). Fused form of the HOF chain
  * `explode(transform(sequence(0, size-n), i => concat_ws(...)))`: one
  * split, one rolling StringBuilder window, no per-row sequence/lambda
  * allocation. Same eval-based rationale as the sibling kernels. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(n > 0, "word_ngrams needs n > 0")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_ngrams expects string, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.split(" ", -1)
    val count = math.max(words.length - n + 1, 0)
    val out = new Array[AnyRef](count)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct word-n-gram shingles as STRINGS — the fused form of the HOF
  * chain `array_distinct(transform(sequence(...), slice+concat_ws))`, whose
  * `array_distinct` costs O(shingles²) string comparisons per row. Hash-set
  * dedup in one pass; output order = first occurrence (order-insensitive
  * consumers only). Used by the exact n-gram Jaccard operator whose DuckDB
  * oracle needs real shingle strings. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_shingles expects string, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.split(" ", -1)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    val sb = new java.lang.StringBuilder(64)
    while (i + n <= words.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next()); k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Signed-random-hyperplane LSH signature: bit p of the result is set iff
  * the dot product of the vector with hyperplane p (entries ±1, baked in at
  * plan time) is ≥ 0. Fused single loop over planes×dims — replaces a
  * planes×dims literal expression tree (512 nodes for 8×64) with one kernel.
  * Same left-to-right accumulation as the HOF reduce, so buckets are
  * identical. */
case class HyperplaneSignature(child: Expression, signs: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hyperplane_sig expects array<double>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var sig = 0
    var p = 0
    while (p < signs.length) {
      val row = signs(p)
      val n = math.min(v.numElements(), row.length)
      var proj = 0.0
      var d = 0
      while (d < n) { proj += v.getDouble(d) * row(d); d += 1 }
      if (proj >= 0) sig |= (1 << p)
      p += 1
    }
    java.lang.Integer.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val sig = ctx.freshName("sig"); val p = ctx.freshName("p"); val d = ctx.freshName("d")
      val proj = ctx.freshName("proj"); val row = ctx.freshName("row"); val n = ctx.freshName("n")
      s"""
         |int $sig = 0;
         |for (int $p = 0; $p < $signsRef.length; $p++) {
         |  double[] $row = $signsRef[$p];
         |  int $n = java.lang.Math.min($v.numElements(), $row.length);
         |  double $proj = 0.0;
         |  for (int $d = 0; $d < $n; $d++) $proj += $v.getDouble($d) * $row[$d];
         |  if ($proj >= 0) $sig |= (1 << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing fingerprints (MOSS): md5-hex of every k-char gram, sliding
  * window-of-w minimum (monotonic deque, O(len)), distinct minima.
  *
  * The HOF formulation (`transform(sequence, j => array_min(slice(grams)))`)
  * re-evaluates the entire gram array inside every window lambda — O(len²)
  * md5 calls per document, unusable beyond toy sizes. This kernel hashes
  * each gram once. Semantics match the DuckDB oracle exactly: character
  * substrings, UTF-8 md5 hex, binary-lexicographic minima. */
case class WinnowingFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"winnow_fp expects string, got $t")
  }

  @transient private lazy val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def md5Hex(s: String): String = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < bytes.length) {
      sb.append(Character.forDigit((bytes(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(bytes(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val nGrams = text.length - k + 1
    if (nGrams < w) return new GenericArrayData(Array.empty[AnyRef])
    val grams = new Array[String](nGrams)
    var i = 0
    while (i < nGrams) { grams(i) = md5Hex(text.substring(i, i + k)); i += 1 }
    // monotonic deque of indices: front = index of current window minimum;
    // ties keep the EARLIEST index (strict < when evicting) so the selected
    // minimum VALUE matches array_min/list_aggregate-min exactly
    val deque = new java.util.ArrayDeque[Int]()
    val seen = new java.util.LinkedHashSet[String]()
    i = 0
    while (i < nGrams) {
      while (!deque.isEmpty && grams(deque.peekLast()).compareTo(grams(i)) > 0) deque.pollLast()
      deque.addLast(i)
      if (deque.peekFirst() <= i - w) deque.pollFirst()
      if (i >= w - 1) seen.add(grams(deque.peekFirst()))
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) {
      out(j) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next()); j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashSignatures {
  /** `minhash_sig(hashes, k)` — hashes: array<long> (e.g. transform(x, xxhash64)). */
  def minhash_sig(hashes: Column, k: Int): Column =
    GraftColumnBridge.column(MinHashSignature(GraftColumnBridge.expression(hashes), k))

  /** `simhash64(hashes)` — hashes: array<long>. */
  def simhash64(hashes: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(hashes)))

  /** `word_shingle_hashes(text, n)` — distinct hashed word n-grams
    * (xxhash64 by default; `useMd5` for the engine-neutral 60-bit hash). */
  def word_shingle_hashes(text: Column, n: Int, useMd5: Boolean = false): Column =
    GraftColumnBridge.column(WordShingleHashes(GraftColumnBridge.expression(text), n, useMd5))

  /** `token_md5_hashes(text)` — md5-60 per whitespace token, duplicates kept. */
  def token_md5_hashes(text: Column): Column =
    GraftColumnBridge.column(TokenMd5Hashes(GraftColumnBridge.expression(text)))

  /** `char_gram_hashes(text, k)` — distinct md5-60 hashes of all k-char
    * substrings (the x62 gram set, fused). */
  def char_gram_hashes(text: Column, k: Int): Column =
    GraftColumnBridge.column(CharGramHashes(GraftColumnBridge.expression(text), k))

  /** `char_gram_pos_hashes(text, k)` — one md5-60 hash PER gram start
    * position, document order, duplicates kept (element index = char
    * offset of the gram — the x82 span-removal contract). */
  def char_gram_pos_hashes(text: Column, k: Int): Column =
    GraftColumnBridge.column(
      CharGramHashes(GraftColumnBridge.expression(text), k, dedup = false))

  /** `word_shingles(text, n)` — distinct word n-gram strings. */
  def word_shingles(text: Column, n: Int): Column =
    GraftColumnBridge.column(WordShingles(GraftColumnBridge.expression(text), n))

  /** `word_ngrams(text, n)` — ALL n-gram occurrences, duplicates kept. */
  def word_ngrams(text: Column, n: Int): Column =
    GraftColumnBridge.column(WordNgrams(GraftColumnBridge.expression(text), n))

  /** `hyperplane_sig(v, signs)` — LSH bucket id from ±1 hyperplanes. */
  def hyperplane_sig(v: Column, signs: Array[Array[Double]]): Column =
    GraftColumnBridge.column(HyperplaneSignature(GraftColumnBridge.expression(v), signs))

  /** `winnow_fp(text, k, w)` — distinct winnowing fingerprints. */
  def winnow_fp(text: Column, k: Int, w: Int): Column =
    GraftColumnBridge.column(WinnowingFingerprints(GraftColumnBridge.expression(text), k, w))
}
