package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** SparkSessionExtensions wiring for graft's native expressions, so any
  * session built `.withExtensions(new GraftExtensions)` (or launched with
  * `spark.sql.extensions=graft.GraftExtensions`) gets them as SQL functions
  * — the registration tier below a custom Rule/SparkStrategy, which the
  * surveyed surface never needs (SURVEY.md §4: "custom Rule/Strategy needed:
  * none"). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$name must be an int literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => MinHashSignature(exprs(0), intArg(exprs(1), "k"))))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs(0))))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[Expression]) => WordShingles(exprs(0), intArg(exprs(1), "n"))))
    ext.injectFunction((
      new FunctionIdentifier("word_shingle_hashes"),
      new ExpressionInfo(classOf[WordShingleHashes].getName, "word_shingle_hashes"),
      (exprs: Seq[Expression]) => WordShingleHashes(exprs(0), intArg(exprs(1), "n"),
        useMd5 = exprs.length > 2 && boolArg(exprs(2), "useMd5"))))
    ext.injectFunction((
      new FunctionIdentifier("token_md5_hashes"),
      new ExpressionInfo(classOf[TokenMd5Hashes].getName, "token_md5_hashes"),
      (exprs: Seq[Expression]) => TokenMd5Hashes(exprs(0))))
    ext.injectFunction((
      new FunctionIdentifier("winnow_fp"),
      new ExpressionInfo(classOf[WinnowingFingerprints].getName, "winnow_fp"),
      (exprs: Seq[Expression]) =>
        WinnowingFingerprints(exprs(0), intArg(exprs(1), "k"), intArg(exprs(2), "w"))))
  }

  private def boolArg(e: Expression, name: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(s"$name must be a boolean literal, got $other")
  }
}
