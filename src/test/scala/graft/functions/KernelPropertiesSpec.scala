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

  test("property: char_gram_pos_hashes ≡ per-position HOF (dups kept, index = offset)") {
    val mb = Array('a', 'b', '日', 'ß', 'c')
    val texts = Seq.fill(200)(
      (1 to rng.nextInt(30)).map(_ => mb(rng.nextInt(mb.length))).mkString) ++
      Seq("", "ab", "aaaaaaaaaa") // below-k, exactly-k edges, all-dup grams
    val k = 3
    val df = texts.toDF("text")
    val hof = when(length($"text") >= k,
      transform(sequence(lit(1), length($"text") - lit(k - 1)),
        i => Dedup.md5Hash60($"text".substr(i, lit(k)))))
      .otherwise(array().cast("array<long>"))
    val bad = df.select(
      HashSignatures.char_gram_pos_hashes($"text", k).as("kern"), hof.as("hof"))
      .filter(not($"kern" === $"hof")).count()
    assert(bad == 0)
  }

  test("property: TokenChunkStats ≡ driver-side cumsum chunking on random count arrays") {
    // zero counts (empty words), counts far above the budget (chunk-id
    // skips), and empty arrays all hit the kernel's flush edges
    val budget = 7L
    val arrays: Seq[Seq[Long]] = Seq.fill(300) {
      Seq.fill(rng.nextInt(25))(rng.nextInt(20) match {
        case n if n < 4 => 0L
        case n if n < 18 => n.toLong
        case _ => 50L // single word longer than the budget
      })
    } ++ Seq(Seq.empty[Long], Seq(0L, 0L, 0L), Seq(100L), Seq(7L, 7L, 7L))
    def expected(c: Seq[Long]): Seq[(Long, Long, Long, Long, Long)] = {
      val cumBefore = c.scanLeft(0L)(_ + _).dropRight(1)
      c.indices.map(i => (cumBefore(i) / budget, i))
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (cid, ws) =>
          val idx = ws.map(_._2)
          (cid, idx.size.toLong, idx.map(c).sum, idx.min.toLong, idx.max.toLong)
        }
    }
    val df = arrays.zipWithIndex.map { case (a, i) => (i.toLong, a) }.toDF("id", "counts")
    val got = df.select($"id",
      explode(TokenChunkStats.token_chunk_stats($"counts", budget)).as("c"))
      .select($"id", $"c.chunk_id", $"c.n_words", $"c.chunk_tokens",
        $"c.first_word", $"c.last_word")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._2, r._3, r._4, r._5, r._6)).toSeq)
      .toMap
    arrays.zipWithIndex.foreach { case (a, i) =>
      assert(got.getOrElse(i.toLong, Seq.empty) == expected(a), s"array $i: $a")
    }
  }

  test("x76 kernel query ≡ window-twin formulation on real docs; per-word encode ≡ whole-text") {
    val sf = "/root/testdata/sf0.001"
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"chunk_id", $"n_words", $"chunk_tokens", $"first_word", $"last_word")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val kernel = key(TextAnalysis.bpeChunkDocuments(spark, sf))
    val twin = key(TextAnalysis.bpeChunkDocumentsWindowTwin(spark, sf))
    assert(kernel == twin)
    assert(kernel.nonEmpty)
    // chunk token totals conserve the x63 whole-text token count per doc
    // (word boundaries are token boundaries: per-word encode ≡ whole-text)
    val merges = TextAnalysis.PinnedBpeMerges
    val whole = graft.Tables.documents(spark, sf)
      .select($"doc_id", size(BpeEncode.bpe_encode($"text", merges)).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    val byDoc = kernel.toSeq.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    byDoc.foreach { case (id, total) => assert(total == whole(id), s"doc $id") }
  }
}
