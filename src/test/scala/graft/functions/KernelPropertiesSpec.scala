package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Randomized-equivalence tests: every native codegen kernel must agree
  * with its higher-order-function reference on arbitrary inputs, not just
  * the testdata distribution. Inputs come from a fixed-seed generator
  * (reproducible) and ship through a DataFrame so BOTH formulations run in
  * the real executor path. */
class KernelPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(42)
  private val vocab = Array("a", "bb", "ccc", "data", "spark", "x1", "42", "zz")

  private def randText(): String =
    Seq.fill(1 + rng.nextInt(30))(vocab(rng.nextInt(vocab.length))).mkString(" ")

  private def randVec(n: Int): Array[Double] =
    Array.fill(n)(rng.nextDouble() * 20 - 10)

  test("property: WordShingles/WordShingleHashes ≡ HOF on 200 random texts") {
    val df = Seq.fill(200)(randText()).toDF("text")
    val bad = df.select(
      array_sort(HashSignatures.word_shingles($"text", 3)).as("a"),
      array_sort(Dedup.wordShingles($"text", 3)).as("b"),
      array_sort(HashSignatures.word_shingle_hashes($"text", 3)).as("c"),
      array_sort(transform(Dedup.wordShingles($"text", 3), s => xxhash64(s))).as("d"))
      .filter(not($"a" === $"b") || not($"c" === $"d")).count()
    assert(bad == 0)
  }

  test("property: WordNgrams ≡ HOF occurrence chain on 200 random texts") {
    val df = Seq.fill(200)(randText()).toDF("text")
    val ws = split($"text", " ")
    val hof = when(size(ws) < 2, array())
      .otherwise(transform(sequence(lit(0), size(ws) - 2),
        i => concat_ws(" ", element_at(ws, i + 1), element_at(ws, i + 2))))
    val bad = df.select(
      HashSignatures.word_ngrams($"text", 2).as("a"), hof.as("b"))
      .filter(not($"a" === $"b")).count()
    assert(bad == 0) // duplicates and order must match exactly, not just sets
  }

  test("property: SimHash64 and MinHashSignature ≡ HOF on 200 random texts") {
    // ≥2 words so the shingle set is non-empty: on an EMPTY hash array the
    // HOF yields array_min([]) = null per permutation while the kernel
    // yields Long.MaxValue sentinels — operators filter size(hs) > 0 first
    val df = Seq.fill(200)(randText()).toDF("text")
      .filter(size(split($"text", " ")) >= 2)
    val bad = df.select(
      HashSignatures.simhash64(transform(split($"text", " "), w => xxhash64(w))).as("a"),
      Dedup.simhash($"text").as("b"),
      HashSignatures.minhash_sig(
        transform(Dedup.wordShingles($"text", 2), s => xxhash64(s)), 8).as("c"),
      Dedup.minhashSignature(Dedup.wordShingles($"text", 2), 8).as("d"))
      .filter($"a" =!= $"b" || not($"c" === $"d")).count()
    assert(bad == 0)
  }

  test("property: CosineSimilarity kernel ≡ HOF on 200 random vector pairs") {
    val df = Seq.fill(200)((randVec(8), randVec(8))).toDF("a", "b")
    val bad = df.select(
      VectorFunctions.cosine_sim($"a", $"b").as("native"),
      Similarity.cosine($"a", $"b").as("hof"))
      .filter(not($"native" <=> $"hof")).count() // <=> : NaN-safe
    assert(bad == 0)
  }

  test("property: CosineSimilarity handles zero vectors like the HOF (NaN)") {
    val df = Seq((Array(0.0, 0.0), Array(1.0, 2.0))).toDF("a", "b")
    val r = df.select(VectorFunctions.cosine_sim($"a", $"b")).as[Double].head()
    assert(r.isNaN)
  }

  test("property: sorted-run maxTermFreq ≡ quadratic distinct×filter twin (multibyte/edge)") {
    // multibyte tokens + the empty token ("" arises from consecutive
    // spaces under split-on-space) exercise UTF-8 sort grouping and the
    // null-safe run start
    val mb = Array("a", "bb", "日本語", "héllo", "ß", "", "x1", "ZZ")
    val texts = Seq.fill(300)(
      Seq.fill(1 + rng.nextInt(40))(mb(rng.nextInt(mb.length))).mkString(" ")) ++
      Seq("", " ", "  ", "solo", "日本語 日本語 日本語")
    val df = texts.toDF("text")
    val ws = split($"text", " ")
    val quad = array_max(transform(array_distinct(ws),
      w => size(filter(ws, x => x === w)))).cast("long")
    val bad = df.select(TextAnalysis.maxTermFreq(ws).as("fast"), quad.as("slow"))
      .filter(not($"fast" <=> $"slow")).count()
    assert(bad == 0)
    // empty array → NULL, matching array_max over an empty transform
    val onEmpty = Seq(1).toDF("i")
      .select(TextAnalysis.maxTermFreq(array().cast("array<string>"))).head()
    assert(onEmpty.isNullAt(0))
  }

  test("property: winnowing kernel ≡ HOF on 100 random ASCII strings") {
    val texts = Seq.fill(100) {
      (1 to (4 + rng.nextInt(40))).map(_ => ('a' + rng.nextInt(4)).toChar).mkString
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val kernel = df.select($"doc_id",
      explode(HashSignatures.winnow_fp($"text", 4, 3)).as("fp"))
      .as[(Long, String)].collect().toSet
    val hof = TextAnalysis.winnowingFingerprintsHof(df, 4, 3)
      .as[(Long, String)].collect().toSet
    assert(kernel == hof)
  }
}
