package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators for a training-data pipeline over `documents`:
  * quality scoring, language ID, token counting, fingerprinting.
  *
  * All per-row projections built from codegen'd built-ins (split/filter/
  * transform/regexp) — embarrassingly parallel, no shuffle, so they scale
  * linearly to 100 TB and stay inside WholeStageCodegen.
  */
object TextAnalysis {

  /** Default knobs for x41/x42/x45, shared with the oracle SQL in
    * `SparkEntry` so each oracle derives from the SAME values the Spark
    * operators default to (query and oracle can only move together). */
  val CmDepth: Int = 4
  val CmWidth: Int = 1024
  val RareRelDenom: Int = 10
  val ChunkTokens: Int = 64
  val ChunkStride: Int = 32

  /** x51's posting-list sample size, shared with the oracle SQL. */
  val PostingSampleK: Int = 8

  /** x56's per-source score-sample size and quantization scale, shared
    * with the oracle SQL. */
  val CalibSampleK: Int = 64
  val CalibQuantScale: Int = 1000000

  /** Default bounds on the BPE fit's driver-side vocabulary (standard
    * BPE-fit practice: singleton words carry no pair signal worth a merge
    * slot, and a fit only needs the frequent head of the vocabulary).
    * These make `bpeTokenize`'s collect O(BpeVocabCap) regardless of
    * corpus size — at 100 TB the raw distinct-word count is itself
    * corpus-scale (typo/number/hash tokens), so an unbounded vocab
    * collect would OOM the driver. */
  val BpeMinFreq: Long = 2L
  val BpeVocabCap: Int = 65536

  /** Pinned BPE merge table (x63): a fitted tokenizer FROZEN as a shared
    * constant — the planning artifact a real pipeline ships (tokenizers
    * are fit once, then pinned for every downstream budget/packing run;
    * refitting per-query would change token counts under the planner).
    * Interpolated into BOTH the Spark plan (`BpeEncode`'s baked-in
    * ranking) and the x63 oracle SQL (the LshPlanes pattern), which
    * replicates the greedy encode as a recursive CTE. Every merge here
    * has left ≠ right, so occurrences of a pair can never overlap and
    * "merge non-overlapping occurrences left-to-right" equals "merge all
    * occurrences at once" — the property the oracle's set-based rewrite
    * of the encode loop's inner pass relies on (asserted in spec). */
  val PinnedBpeMerges: Seq[(String, String)] = Seq(
    "e" -> "r", "i" -> "n", "o" -> "w", "o" -> "r", "s" -> "t", "m" -> "er",
    "a" -> "t", "l" -> "u", "a" -> "r", "p" -> "ar", "j" -> "o", "jo" -> "in",
    "a" -> "s", "as" -> "h", "h" -> "ash", "r" -> "ow")

  private def words(text: Column): Column = split(text, " ")

  private def countIn(text: Column, vocab: Seq[String]): Column =
    size(filter(words(text), w => w.isin(vocab.map(lit): _*)))

  val EnStopwords: Seq[String] = Seq("the", "a", "an", "of", "to", "in", "and", "is", "for", "on")
  val EsStopwords: Seq[String] = Seq("el", "la", "de", "los", "las", "es", "y", "en", "un", "una")
  val DeStopwords: Seq[String] = Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit")
  val FrStopwords: Seq[String] = Seq("le", "la", "les", "des", "et", "est", "un", "une", "dans")

  /** Quality scoring: length / word-count / mean word length / stopword
    * ratio / punctuation ratio, plus a composite score — the standard cheap
    * pre-filters before expensive dedup or model scoring. All divisions are
    * int/int → one IEEE op, exact cross-engine. */
  def stats(spark: SparkSession, dir: String): DataFrame = {
    val ws = words(col("text"))
    Tables.documents(spark, dir).select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(ws).as("n_words"),
      (length(regexp_replace(col("text"), " ", "")) / size(ws)).as("mean_word_len"),
      (countIn(col("text"), EnStopwords) / size(ws)).as("stopword_ratio"),
      (size(filter(ws, w => length(w) === 1)) / size(ws)).as("short_word_ratio"))
      // int/int divisions and products of exact doubles are bit-identical
      // cross-engine (single IEEE ops) — no rounding needed for the oracle
      .withColumn("quality_score",
        least(lit(1.0), col("n_words") / lit(100.0)) * (lit(1.0) - col("short_word_ratio")))
  }

  /** N-gram-heuristic language ID: stopword-hit scores per candidate
    * language + a CJK-character ratio, argmax with a fixed precedence order
    * (en > es > de > fr > zh) for determinism. */
  def languageId(spark: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    val sEn = countIn(t, EnStopwords)
    val sEs = countIn(t, EsStopwords)
    val sDe = countIn(t, DeStopwords)
    val sFr = countIn(t, FrStopwords)
    val sZh = size(regexp_extract_all(t, lit("[\\u4e00-\\u9fff]"), lit(0)))
    Tables.documents(spark, dir).select(
      col("doc_id"), col("lang").as("labeled_lang"),
      sEn.as("score_en"), sEs.as("score_es"), sDe.as("score_de"),
      sFr.as("score_fr"), sZh.as("score_zh"))
      .withColumn("predicted_lang",
        when(col("score_en") >= greatest(col("score_es"), col("score_de"), col("score_fr"), col("score_zh")), "en")
          .when(col("score_es") >= greatest(col("score_de"), col("score_fr"), col("score_zh")), "es")
          .when(col("score_de") >= greatest(col("score_fr"), col("score_zh")), "de")
          .when(col("score_fr") >= col("score_zh"), "fr")
          .otherwise("zh"))
  }

  /** x109's chunk width in words: language ID runs per chunk, so the
    * unit of detection is a ~sentence-scale window. */
  val CodeSwitchChunkWords: Int = 20

  /** Code-switch detection (x109): run x06's stopword-profile language
    * ID per [[CodeSwitchChunkWords]]-word chunk instead of per document,
    * then audit each document's chunk-language agreement — the
    * mixed-language detector (embedded boilerplate, concatenated crawl
    * fragments, genuine code-switching) that a per-document argmax
    * hides, since a 90% English page with a German footer still argmaxes
    * to English. Majority language is the lexicographically-LAST tied
    * argmax via `max(struct(n, lang))` (deterministic, partial-
    * aggregable — x104's extrema pattern); `agreement` is the one
    * int/int IEEE division; `code_switched` flags >1 distinct chunk
    * language. Chunk scoring reuses x06's exact scorer and precedence
    * order, so a 1-chunk document reproduces x06's prediction verbatim.
    *
    * 100 TB shape: chunking is a per-row flatMap (sequence + slice,
    * x45's kernel — no shuffle); scoring is a per-chunk projection; the
    * rollups are two partial-agg'd groupBys ((doc, lang) then doc). No
    * windows, no driver state; output is O(docs). */
  def codeSwitch(spark: SparkSession, dir: String,
                 chunkWords: Int = CodeSwitchChunkWords): DataFrame = {
    require(chunkWords >= 1, "need chunkWords >= 1")
    val ws = words(col("text"))
    val nChunks = expr(
      s"CAST((size(split(text, ' ')) + ${chunkWords - 1}) div $chunkWords AS INT)")
    val chunks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => array_join(slice(ws, i * chunkWords + 1, lit(chunkWords)), " "))))
      .toDF("doc_id", "chunk_id", "chunk")
    val t = col("chunk")
    def cIn(vocab: Seq[String]): Column =
      size(filter(split(t, " "), w => w.isin(vocab.map(lit): _*)))
    val scored = chunks.select(col("doc_id"),
      cIn(EnStopwords).as("s_en"), cIn(EsStopwords).as("s_es"),
      cIn(DeStopwords).as("s_de"), cIn(FrStopwords).as("s_fr"),
      size(regexp_extract_all(t, lit("[\\u4e00-\\u9fff]"), lit(0))).as("s_zh"))
      .withColumn("chunk_lang",
        when(col("s_en") >= greatest(col("s_es"), col("s_de"), col("s_fr"), col("s_zh")), "en")
          .when(col("s_es") >= greatest(col("s_de"), col("s_fr"), col("s_zh")), "es")
          .when(col("s_de") >= greatest(col("s_fr"), col("s_zh")), "de")
          .when(col("s_fr") >= col("s_zh"), "fr")
          .otherwise("zh"))
    scored.groupBy(col("doc_id"), col("chunk_lang")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("n")).as("n_chunks"),
        count(lit(1)).as("n_langs"),
        max(struct(col("n"), col("chunk_lang"))).as("m"))
      .select(col("doc_id"), col("n_chunks"), col("n_langs"),
        col("m.chunk_lang").as("majority_lang"),
        (col("m.n") / col("n_chunks")).as("agreement"),
        (col("n_langs") > 1).cast("int").as("code_switched"))
  }

  /** Token counting, two tokenizers: plain whitespace and a BPE-ish regex
    * (letter runs / digit runs / single non-space symbols) — the token
    * budget estimator for an LLM data pipeline. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(split(trim(col("text")), " +")).as("ws_tokens"),
      size(regexp_extract_all(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("bpe_ish_tokens"))

  /** Document fingerprinting: md5 of the normalized text (exact-dup key) and
    * the minimum word-hash (a 1-permutation minhash — cheap near-dup key). */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      md5(lower(trim(col("text")))).as("content_fp"),
      array_min(transform(words(col("text")), w => md5(w))).as("min_word_fp"))

  /** Gopher/MassiveText-style repetition thresholds (x67), shared with
    * the oracle SQL: a document is kept iff duplicate-word share ≤
    * RepMaxDupWordPct %, top-word share ≤ RepMaxTopWordPct %, and
    * duplicate-bigram share ≤ RepMaxDup2gramPct %. All three rules are
    * evaluated as INTEGER cross-multiplications (dup·100 ≤ n·pct) — no
    * division ever happens, so the keep set is engine-exact. Calibrated
    * so the synthetic corpus splits ~56/44 at every SF (the operator
    * demonstrably fires; real Gopher cuts sit in the same regime). */
  val RepMaxDupWordPct: Int = 62
  val RepMaxTopWordPct: Int = 14
  val RepMaxDup2gramPct: Int = 8

  /** Max term frequency of a token array in O(L log L): `array_sort`
    * groups equal tokens into contiguous runs, then ONE `aggregate` pass
    * tracks (previous token, current run length, best run length) — the
    * longest run IS the most frequent token's count. Replaces the
    * distinct×filter formulation (for every distinct token, a full rescan
    * of the array: O(distinct × L) per row — fine on short test docs, a
    * straggler-task killer on a multi-MB web page where ~10⁵ words cost
    * ~10¹⁰ comparisons in one row). NULL on an empty array, matching
    * `array_max` over an empty transform; the null-safe `<=>` makes the
    * first element start its run at 1 (prev is initially NULL). Proven ≡
    * the quadratic HOF twin on random multibyte/edge inputs in
    * KernelPropertiesSpec. */
  private[graft] def maxTermFreq(ws: Column): Column =
    aggregate(
      array_sort(ws),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, w) => {
        val run = when(acc("prev") <=> w, acc("run") + 1L).otherwise(lit(1L))
        struct(w.as("prev"), run.as("run"), greatest(acc("best"), run).as("best"))
      },
      acc => when(acc("run") === 0L, lit(null).cast("long")).otherwise(acc("best")))

  /** Within-document repetition metrics (x66) — the Gopher repetition
    * signals as pure integers: word count, distinct words, the most
    * frequent word's count, bigram count and duplicate bigrams. Entirely
    * per-row HOFs over the token array (array_distinct / sorted-run
    * max-tf / zip_with-of-shifted-slices), no UDF, no shuffle — the whole
    * operator is one WholeStageCodegen projection, O(L log L) per row and
    * linear in corpus size to 100 TB. */
  /** The five x66 metric expressions over a text Column — shared by the
    * metric report and the filter so the rule can't diverge from the
    * numbers it reads. */
  private def repMetricCols(text: Column): Seq[(String, Column)] = {
    val ws = words(text)
    val bigrams = zip_with(
      slice(ws, lit(1), size(ws) - 1),
      slice(ws, lit(2), size(ws) - 1),
      (a, b) => concat(a, lit(" "), b))
    Seq(
      "n_words" -> size(ws).cast("long"),
      "n_distinct" -> size(array_distinct(ws)).cast("long"),
      "max_tf" -> maxTermFreq(ws),
      "n_2grams" -> size(bigrams).cast("long"),
      "n_dup_2grams" -> (size(bigrams) - size(array_distinct(bigrams))).cast("long"))
  }

  def repetitionMetrics(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id") +: repMetricCols(col("text")).map { case (n, c) => c.as(n) }: _*)

  /** Repetition quality filter (x67): the removal step over x66's
    * metrics — keep documents passing all three integer threshold rules.
    * The metric expressions evaluate INSIDE the scan's own projection
    * (one pass, zero shuffle, pure codegen predicate) — no join back, no
    * second instantiation of anything. */
  /** The x67 keep predicate over a text column — shared by
    * `repetitionFilter` and the ship-corpus assembly (x69) so a composed
    * pipeline can't diverge from the standalone filter. Pure per-row
    * codegen expression: composing it costs a projection, not a join. */
  def repetitionKeep(text: Column): Column = {
    val m = repMetricCols(text).toMap
    (m("n_words") - m("n_distinct")) * 100 <= m("n_words") * RepMaxDupWordPct &&
    m("max_tf") * 100 <= m("n_words") * RepMaxTopWordPct &&
    m("n_dup_2grams") * 100 <= m("n_2grams") * RepMaxDup2gramPct
  }

  def repetitionFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(repetitionKeep(col("text")))
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))

  /** Token-frequency drift monitor (x65): the distribution-shift check a
    * daily ingest runs before admitting a new batch — per token, compare
    * its count in the existing corpus (doc_id < `newMinId`, x44's shard
    * boundary) against the new batch, and rank by the INTEGER
    * cross-multiplied score |c_old·N_new − c_new·N_old| (the numerator of
    * the rate difference |c_old/N_old − c_new/N_new| scaled by
    * N_old·N_new) — no division, no float, so ranking and values are
    * engine-exact. Domain bound: c·N must fit a signed 64-bit long
    * (c ≲ 10⁹ tokens of one word per 10⁹-token side); beyond that,
    * quantize rates first — DuckDB would fail loud on the overflow where
    * long arithmetic wraps, so the oracle also guards the bound.
    *
    * Scale shape: ONE corpus scan — the per-(token, side) counts
    * partial-agg map-side before the only corpus-derived shuffle (vocab
    * keyed); the global totals fold back in as a broadcast 1-row aggregate
    * crossJoin (x42's pattern). The totals branch re-aggregates the SAME
    * vocab exchange — Spark's exchange reuse makes the second pass read
    * the shuffled vocab, not re-scan the corpus — and, unlike the previous
    * `Window.partitionBy()` formulation, never funnels the vocab table
    * (itself corpus-scale on web data: 10⁸–10⁹ distinct tokens) through a
    * single unpartitioned-window task. Top-k plans as
    * TakeOrderedAndProject. */
  def tokenDrift(spark: SparkSession, dir: String,
                 newMinId: Long = Dedup.IncrementalNewMinId,
                 topK: Int = 20): DataFrame = {
    // tf-weighted fold of the STAGED doc-term table ([[TermStage]]) —
    // occurrence counts split by the old/new doc_id boundary
    val cnt = TermStage.docTermFreq(spark, dir)
      .select((col("doc_id") >= newMinId).as("is_new"), col("term").as("w"),
        col("tf"))
      .groupBy(col("w"))
      .agg(sum(when(col("is_new"), 0L).otherwise(col("tf"))).as("c_old"),
        sum(when(col("is_new"), col("tf")).otherwise(0L)).as("c_new"))
    val totals = cnt.agg(sum(col("c_old")).as("n_old"), sum(col("c_new")).as("n_new"))
    cnt.crossJoin(broadcast(totals))
      .select(col("w"), col("c_old"), col("c_new"),
        abs(col("c_old") * col("n_new") - col("c_new") * col("n_old")).as("drift"))
      .orderBy(col("drift").desc, col("w"))
      .limit(topK)
  }

  /** Corpus vocabulary stats: the top-K words by total frequency with
    * document-frequency — the vocabulary profile a tokenizer-training or
    * data-mixing step starts from. Reads the STAGED term-stats rollup
    * ([[TermStage]] — the corpus explode ran once per snapshot); the
    * query is TakeOrdered over the O(vocab) table. */
  def vocabularyStats(spark: SparkSession, dir: String, topK: Int = 20): DataFrame =
    TermStage.termStats(spark, dir)
      .select(col("term").as("word"), col("tf").as("term_freq"),
        col("df").as("doc_freq"))
      .orderBy(col("term_freq").desc, col("word"))
      .limit(topK)

  /** TF-IDF keyword extraction: top-3 terms per document by
    * tf × (n_docs / df). Rational idf (no log) keeps every number an
    * int/int division — bit-exact cross-engine (log's libm rounding is
    * not). Shuffles: one on word (df), one back on doc_id (ranking).
    * n_docs is folded into the dataflow as a broadcast 1-row ungrouped agg
    * (a column-free count scan reads only parquet footers) instead of a
    * separate eager `count()` action — one job, no extra data scan. */
  def tfidfKeywords(spark: SparkSession, dir: String, perDoc: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    // both tf and df read the STAGED term tables ([[TermStage]])
    val tf = TermStage.docTermFreq(spark, dir)
      .select(col("doc_id"), col("term").as("word"), col("tf"))
    val df = TermStage.termStats(spark, dir)
      .select(col("term").as("word"), col("df"))
    val scored = tf.join(df, Seq("word"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tf_idf", col("tf") * col("n_docs") / col("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf_idf").desc, col("word"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= perDoc)
      .select(col("doc_id"), col("word"), col("tf"), col("df"), col("tf_idf"), col("rank"))
  }

  /** Bigram familiarity scoring (x49): a log-free n-gram-LM quality
    * signal — each document scores the mean corpus frequency of its word
    * bigrams (how "seen-before" its phrasing is). Keeping the score a
    * BIGINT sum over corpus counts plus ONE double division makes it
    * bit-exact cross-engine, where a true log-perplexity would inherit
    * libm rounding differences (the same discipline as tfidf's rational
    * idf).
    *
    * Dataflow: both sides read the STAGED per-(doc, bigram) count table
    * ([[bigramOcc]] — the corpus tokenized ONCE per snapshot), so the
    * model side is a partial-agg'd rollup of the aggregated table (hot
    * bigrams collapse map-side — never a window over the bigram key)
    * and the score folds up as the tf-weighted sum `Σ tf·cf / Σ tf`.
    * The model table is bounded by vocab² — broadcast when small; a
    * hot-bigram-skewed sort-merge join is AQE skew-join territory,
    * noted in SkewJoin. */
  def bigramFamiliarity(spark: SparkSession, dir: String): DataFrame = {
    val tf = bigramOcc(spark, dir)
      .select(col("doc_id"), col("bigram"), col("cnt").as("tf"))
    val freq = bigramOcc(spark, dir)
      .groupBy(col("bigram")).agg(sum(col("cnt")).as("cf"))
    tf.join(freq, Seq("bigram"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"), sum(col("tf") * col("cf")).as("sum_cf"))
      .withColumn("familiarity", col("sum_cf").cast("double") / col("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_cf"), col("familiarity"))
  }

  /** The per-(doc, bigram) occurrence-count table, read from the staged
    * word-gram artifact ([[GramStage]] at n = 2) — shared by x49/x54/
    * x94/x103 so the four can never diverge on tokenization or bigram
    * construction, and so the corpus is tokenized ONCE per snapshot
    * instead of twice per query (the r10 tokenize-twice tradeoff,
    * retired the same way the 5-gram family was: staged ≡ recomputed is
    * GramStageSpec-proven, and the fused `word_ngrams` kernel the family
    * previously exploded is KernelPropertiesSpec-proven equal to the
    * stage's HOF-chain derivation). Occurrence folds become cnt-weighted
    * sums over this table. */
  private def bigramOcc(spark: SparkSession, dir: String): DataFrame =
    GramStage.gramOcc(spark, dir, 2)
      .select(col("doc_id"), col("gram").as("bigram"), col("cnt"))

  /** Fixed-point scale for x94's conditional-probability points
    * (1 point = 10⁻⁶), shared with the oracle SQL. */
  val FluencyScale: Long = 1000000L

  /** Bigram-fluency scoring (x94): per document, the mean conditional
    * bigram probability `p(w2|w1) = c(w1 w2) / c(w1 ·)` under the
    * corpus's own bigram model, in fixed-point ppm — the CCNet-style
    * LM-quality filter signal, with the corpus itself as the language
    * model. This is the CONDITIONAL complement of x49's familiarity
    * (which scores raw bigram frequency): here a frequent first word
    * followed by an unusual second word scores LOW even though both
    * words are individually common — the "fluent continuation" signal a
    * perplexity filter actually measures. Gibberish and boilerplate-free
    * spam rank at the bottom; formulaic text ranks at the top.
    *
    * Integer discipline: per-occurrence points `q = (Scale·c2) div c1`
    * and the doc score `(Σq) div n_bigrams` are pure BIGINT ops — and
    * because `c2 ≤ c1` by construction, `q ≤ Scale`, so the arithmetic
    * CANNOT overflow at any corpus size (no guard needed — contrast
    * x73's documented numerator bound). Docs with fewer than two tokens
    * get (0, 0) via the left join (x63's empty-doc rule).
    *
    * Scale shape: both sides read the STAGED per-(doc, bigram) count
    * table ([[bigramOcc]] — tokenized once per snapshot, not twice per
    * query). The model table is vocab²-bounded, its first-word rollup
    * is derived FROM the model (no third scan), and every join is an
    * equi-join on the bigram/word key — hot-bigram skew is AQE
    * skew-join territory, same note as x49. */
  def bigramFluency(spark: SparkSession, dir: String): DataFrame = {
    val occ = bigramOcc(spark, dir)
    val model = occ.groupBy(col("bigram")).agg(sum(col("cnt")).as("c2"))
      .withColumn("w1", split(col("bigram"), " ", 2)(0))
    val firsts = model.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val scored = occ
      .join(model.join(firsts, Seq("w1"))
        .select(col("bigram"), col("c2"), col("c1")), Seq("bigram"))
      .select(col("doc_id"), col("cnt"), expr(s"(${FluencyScale}L * c2) div c1").as("q"))
    val agg = scored.groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_bigrams"), sum(col("cnt") * col("q")).as("sq"))
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(expr("sq div n_bigrams"), lit(0L)).as("fluency_ppm"))
  }

  /** x103 knobs: fixed-point scale (1 point = 10⁻³), minimum bigram
    * count (PMI of rare pairs is noise — the standard cutoff), and the
    * ranked output size. Shared with the oracle SQL. */
  val PmiScale: Long = 1000L
  val PmiMinCount: Long = 5L
  val PmiTopK: Int = 100

  /** PMI-ranked collocations (x103): the corpus's top word pairs by
    * pointwise mutual information — the phrase-mining signal (Mikolov
    * et al.'s word2vec phrases, NPMI collocation extraction) a pipeline
    * uses to decide which token pairs to fuse before training. Ranks by
    * the LOG-FREE monotone transform (x95's discipline):
    * `pmi_millis = (Scale · c_xy · N) div (c_1 · c_2)` where N is the
    * corpus token count — the exp of true PMI in fixed-point, same
    * order, bit-exact cross-engine.
    *
    * Integer bound, ENFORCED not just documented (x73's guard rule):
    * numerator `Scale·c_xy·N` and denominator `c_1·c_2` are checked in
    * double precision and raise instead of letting non-ANSI Longs wrap
    * silently — the numerator clears 2⁶³ only past c_xy·N ≈ 9.2·10¹⁵
    * (e.g. a 10⁹-count bigram in a 10⁷-token corpus is fine; web scale
    * needs the quantized-ratio form: divide both counts by a common
    * 2^s before the product, which cancels in the ratio).
    *
    * 100 TB shape: bigram and unigram counts are partial-agg'd corpus
    * shuffles (the same frames x49/x94 build); the c_xy ≥ [[PmiMinCount]]
    * filter prunes the bigram side BEFORE any join, N is a 1-row
    * broadcast cross (x42's totals pattern), and the final top-k is
    * `orderBy.limit` — TakeOrdered's per-partition k + driver merge of
    * 32·k rows, never a global sort or single-task window. The unigram
    * joins are equi-joins on the word key; a stop-word-grade hot key is
    * AQE skew-join territory (x49's note). */
  def pmiBigrams(spark: SparkSession, dir: String,
                 minCount: Long = PmiMinCount, k: Int = PmiTopK): DataFrame = {
    require(minCount >= 1 && k >= 1, "need minCount >= 1 and k >= 1")
    // unigram counts from the STAGED term-stats rollup ([[TermStage]])
    val uni = TermStage.termStats(spark, dir)
      .select(col("term").as("w"), col("tf").as("c"))
    val totals = uni.agg(sum(col("c")).as("n_tokens"))
    val bg = bigramOcc(spark, dir)
      .groupBy(col("bigram")).agg(sum(col("cnt")).as("c_xy"))
      .filter(col("c_xy") >= minCount)
      .select(split(col("bigram"), " ", 2)(0).as("w1"),
        split(col("bigram"), " ", 2)(1).as("w2"), col("c_xy"))
    val guard =
      (lit(PmiScale.toDouble) * col("c_xy").cast("double") * col("n_tokens").cast("double") >
        lit(Long.MaxValue.toDouble * 0.9)) ||
      (col("c_1").cast("double") * col("c_2").cast("double") >
        lit(Long.MaxValue.toDouble * 0.9))
    bg.join(uni.select(col("w").as("w1"), col("c").as("c_1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c_2")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .withColumn("pmi_millis",
        when(guard, raise_error(lit("PMI product would exceed Long: " +
          "Scale*c_xy*N or c_1*c_2 over bound; quantize counts (Scaladoc)")))
          .otherwise(expr(s"(${PmiScale}L * c_xy * n_tokens) div (c_1 * c_2)")))
      .select(col("w1"), col("w2"), col("c_xy"), col("c_1"), col("c_2"),
        col("pmi_millis"))
      .orderBy(col("pmi_millis").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Per-source vocabulary audit (x105): token count, type count
    * (distinct tokens), hapax count (tokens seen exactly once), and the
    * type-token / hapax ratios — the corpus-health panel that catches a
    * degenerate source before training (template spam collapses TTR;
    * OCR noise and bot gibberish inflate the hapax share). Ratios are
    * single int/int IEEE divisions (the repo's float discipline), so
    * the whole panel is oracle-exact. TTR is length-biased by nature
    * (larger samples → lower TTR) — the panel reports per-source raw
    * counts so a consumer can window-normalize; the ratio column is the
    * within-corpus comparator, not a cross-corpus constant.
    *
    * 100 TB shape: one corpus token explode into a (source, token)
    * partial-agg'd groupBy (hot tokens combine map-side), then a
    * source-keyed rollup of O(vocab) rows. Output is O(sources). */
  def sourceVocabAudit(spark: SparkSession, dir: String): DataFrame = {
    // STAGED doc-term table joined to the narrow (doc_id, source)
    // projection ([[TermStage]]) — the join shuffles the aggregated TF
    // table, not the exploded corpus token stream
    val counts = TermStage.docTermFreq(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .groupBy(col("source"), col("term").as("token")).agg(sum(col("tf")).as("c"))
    counts.groupBy(col("source"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
        (col("n_types") / col("n_tokens")).as("ttr"),
        (col("n_hapax") / col("n_types")).as("hapax_ratio"))
  }

  /** x107's vocabulary size: the top-K corpus tokens by frequency form
    * the pinned vocabulary whose coverage is audited. */
  val VocabCoverageK: Int = 1000

  /** Vocabulary-coverage audit (x107): freeze the top-[[VocabCoverageK]]
    * corpus tokens as the vocabulary (frequency-truncated, the way a
    * word-level tokenizer or fastText cutoff is chosen), then measure
    * per source what fraction of its token stream falls OUTSIDE it —
    * the OOV-rate panel that decides whether a vocab size survives a
    * new source mix. Ties at the frequency boundary break on the token
    * string, so the vocabulary is a deterministic SET in both engines.
    * `oov_ppm` is exact integer fixed-point ((10⁶·n_oov) div n_tokens —
    * n_oov ≤ n_tokens keeps it overflow-free below 2⁶³/10⁶ ≈ 9.2·10¹²
    * tokens PER SOURCE, the x65 bound class); `coverage` is the one
    * int/int IEEE division.
    *
    * 100 TB shape: the vocab is `orderBy.limit` over the token-count
    * aggregate (TakeOrdered — per-partition k + driver merge, no global
    * sort) and is O(K) — it BROADCASTS into the per-source probe, so
    * the corpus-sized stream joins with no shuffle beyond its own
    * partial-agg'd rollups. */
  def vocabCoverage(spark: SparkSession, dir: String,
                    k: Int = VocabCoverageK): DataFrame = {
    require(k >= 1, "need k >= 1")
    // both sides read the STAGE ([[TermStage]]): the vocab is TakeOrdered
    // over the O(vocab) rollup; the per-source stream is the doc-term
    // table tf-weighted (occurrence counts preserved exactly)
    val counts = TermStage.docTermFreq(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .select(col("source"), col("term").as("token"), col("tf"))
    val vocab = TermStage.termStats(spark, dir)
      .orderBy(col("tf").desc, col("term")).limit(k)
      .select(col("term").as("token"), lit(1).as("in_vocab"))
    counts
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("source"))
      .agg(
        sum(col("tf")).as("n_tokens"),
        sum(when(col("in_vocab").isNull, col("tf")).otherwise(0L)).as("n_oov"))
      .select(col("source"), col("n_tokens"), col("n_oov"),
        expr("(1000000L * n_oov) div n_tokens").as("oov_ppm"),
        ((col("n_tokens") - col("n_oov")) / col("n_tokens")).as("coverage"))
  }

  /** Inverted-index construction (x51): per token, document frequency,
    * corpus frequency, and a bounded posting-list SAMPLE — the search /
    * retrieval-debugging index a data pipeline builds over its corpus.
    *
    * The full posting list of a stop-word-grade token at 100 TB is
    * billions of ids; `collect_list` of it is exactly the wide-payload-
    * rides-a-shuffle failure mode. Instead the sample is the bottom-k
    * hash-priority sketch (`KmvValueSample`, O(k) mergeable state):
    * deterministic (salted md5-60 of (token, doc) — a pure function of
    * the data), so the oracle replicates it row-for-row. df/cf stay
    * exact; shuffles are one on (token, doc_id) for tf and one on token
    * — both partial-agg'd map-side. */
  def invertedIndex(spark: SparkSession, dir: String, k: Int = PostingSampleK): DataFrame = {
    import graft.functions.KmvValueSample.kmv_value_sample
    // postings read the STAGED doc-term table ([[TermStage]])
    val tf = TermStage.docTermFreq(spark, dir)
      .select(col("term").as("token"), col("doc_id"), col("tf"))
    val h = Dedup.md5Hash60(concat(col("token"), lit(":"), col("doc_id").cast("string")))
    tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        kmv_value_sample(h, col("doc_id"), k).as("postings"))
      .select(col("token"), col("df"), col("cf"),
        concat_ws(",", transform(col("postings"), p => p.cast("string"))).as("postings_sample"))
  }

  /** Domain-relevance scoring (x54), the selection signal of DSIR-style
    * importance sampling: score every corpus document by how much its
    * bigram distribution matches a small TARGET domain corpus (here the
    * benchmark set, doc_id < targetMaxId — in production, a curated
    * in-domain sample). Per doc: bigram hit-rate against the target model
    * and the summed target counts of its bigrams — log-free (integer
    * sums + one division) for cross-engine exactness, same discipline as
    * x49.
    *
    * 100 TB shape: the target model is MODEL-STATE-sized by construction
    * (a curated domain sample, not the corpus) and broadcasts; both
    * branches read the STAGED per-(doc, bigram) table ([[bigramOcc]]),
    * the target branch's `doc_id < N` filter pushes into the staged
    * parquet scan so building the model never re-tokenizes the corpus;
    * the corpus side is one broadcast-join → per-doc fold, no corpus
    * shuffle except the final doc_id aggregate. */
  def domainScore(spark: SparkSession, dir: String, targetMaxId: Long = 20): DataFrame = {
    val bg = bigramOcc(spark, dir)
    val target = bg.filter(col("doc_id") < targetMaxId)
      .groupBy(col("bigram")).agg(sum(col("cnt")).as("tcf"))
    bg.filter(col("doc_id") >= targetMaxId)
      .join(broadcast(target), Seq("bigram"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        coalesce(sum(when(col("tcf").isNotNull, col("cnt"))), lit(0L)).as("n_hits"),
        coalesce(sum(col("cnt") * col("tcf")), lit(0L)).as("sum_tcf"))
      .withColumn("hit_ratio", col("n_hits").cast("double") / col("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"), col("n_hits"), col("sum_tcf"), col("hit_ratio"))
  }

  /** x05's composite quality score as a standalone expression over raw
    * text (identical arithmetic to `stats`' aliased-column formulation:
    * both are int/int divisions + one product of exact doubles). Used by
    * x56 so calibration can't diverge from the scored definition. */
  private def qualityScoreExpr(text: Column): Column = {
    val ws = words(text)
    least(lit(1.0), size(ws) / lit(100.0)) *
      (lit(1.0) - size(filter(ws, w => length(w) === 1)) / size(ws))
  }

  /** x256's quality-score cutoffs (quantized units, [[CalibQuantScale]]
    * = 1.0), shared with the oracle: the corpus's scores span roughly
    * 0.08–0.98, so this grid brackets the real pruning decisions. */
  val SweepThresholds: Seq[Long] = Seq(200000L, 400000L, 600000L, 800000L)

  /** Quality-threshold retention sweep (x256) — the pruning-decision
    * panel a pretraining data plan is built from: for every candidate
    * cutoff in [[SweepThresholds]], how many documents and characters
    * each source would RETAIN (docs kept, chars kept, retention ppm).
    * x56 calibrates scores within a source; this prices the global
    * cutoff itself — the "how much data does each quality bar cost us,
    * and whom does it hit" table. Scores are x56's exact quantized
    * [[qualityScoreExpr]], so the sweep can't diverge from the scored
    * definition.
    *
    * 100 TB shape: ONE corpus scan with 2·|thresholds| conditional
    * aggregates (partial-agg'd, map-side combined), then a stack() of
    * the O(sources)-row wide frame to long form — the threshold grid
    * never multiplies the corpus. */
  def qualityRetentionSweep(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir).select(col("source"),
      floor(qualityScoreExpr(col("text")) * lit(CalibQuantScale.toDouble))
        .cast("long").as("score_q"),
      col("n_chars"))
    val condAggs = SweepThresholds.flatMap(t => Seq(
      sum(when(col("score_q") >= t, 1L).otherwise(0L)).as(s"k$t"),
      sum(when(col("score_q") >= t, col("n_chars")).otherwise(0L)).as(s"c$t")))
    val wide = base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), condAggs: _*)
    val stacked = SweepThresholds.map(t => s"${t}L, k$t, c$t").mkString(", ")
    wide.select(col("source"), col("n_docs"),
        expr(s"stack(${SweepThresholds.size}, $stacked) AS (thr, n_kept, chars_kept)"))
      .withColumn("retention_ppm", expr("(1000000L * n_kept) div n_docs"))
  }

  /** Per-source score calibration (x56): map each document's quality
    * score to its SOURCE-RELATIVE decile, so a downstream "keep the top
    * 30%" prune is comparable across sources with different score
    * distributions (a global threshold would empty strict sources and
    * keep junk from lenient ones — the standard calibration step before
    * cross-source quality pruning).
    *
    * Decile edges per source come from the bounded bottom-k hash sample
    * (x50's machinery): O(k) mergeable state, edge table broadcast,
    * corpus assigned deciles in place — no corpus shuffle, and fully
    * deterministic (scores quantized with exact/correctly-rounded ops,
    * so the oracle replicates sample, edges, and assignment). */
  def scoreDeciles(spark: SparkSession, dir: String, k: Int = CalibSampleK): DataFrame = {
    import graft.functions.KmvValueSample.kmv_value_sample
    val base = Tables.documents(spark, dir).select(col("doc_id"), col("source"),
      floor(qualityScoreExpr(col("text")) * lit(CalibQuantScale.toDouble)).cast("long").as("score_q"),
      Dedup.md5Hash60(concat(lit("cal:"), col("doc_id").cast("string"))).as("h"))
    val samples = base.groupBy(col("source"))
      .agg(kmv_value_sample(col("h"), col("score_q"), k).as("vals"))
    def pick(q: Int): Column =
      element_at(col("vals"), ceil(size(col("vals")) * q / 100).cast("int"))
    val edges = samples.select(
      col("source") +: (10 to 90 by 10).map(d => pick(d).as(s"e$d")): _*)
    val decile = (10 to 90 by 10)
      .map(d => when(col("score_q") >= col(s"e$d"), 1).otherwise(0))
      .reduce(_ + _)
    base.join(broadcast(edges), Seq("source"))
      .select(col("doc_id"), col("source"), col("score_q"), decile.as("decile"))
  }

  /** Lexical diversity (x55): per-document Gini–Simpson index
    * `1 − Σtf²/n²` — the probability two random tokens differ — plus
    * token/type counts. The log-free stand-in for entropy-based
    * diversity/quality filters (Shannon entropy needs libm `log`, which
    * is not correctly rounded and so not oracle-checkable; Gini–Simpson
    * carries the same degenerate-text signal with integer sums, one
    * correctly-rounded int→double conversion, one division and one
    * subtraction — bit-exact cross-engine).
    *
    * Two-level aggregate, both partial-agg'd map-side: (doc, token) tf,
    * then per-doc fold — one shuffle each, no hot keys (doc_id is
    * near-unique). */
  def lexicalDiversity(spark: SparkSession, dir: String): DataFrame = {
    // per-doc fold of the STAGED doc-term table ([[TermStage]])
    val tf = TermStage.docTermFreq(spark, dir)
    tf.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        sum(col("tf") * col("tf")).as("sum_tf2"))
      .withColumn("simpson",
        lit(1.0) - col("sum_tf2").cast("double") / (col("n_tokens") * col("n_tokens")))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"), col("sum_tf2"), col("simpson"))
  }

  /** BPE merge-candidate pair counts (x59): the distributed kernel of
    * byte-pair-encoding tokenizer training — corpus-weighted counts of
    * adjacent character pairs, whose argmax is the first merge. (The
    * merge LOOP itself is driver-side over the tiny vocabulary, like any
    * fitted model; the corpus-scale step is exactly this count.)
    *
    * Scale shape is the whole point: the corpus collapses to the word-
    * frequency aggregate FIRST (one shuffle, map-side combined — the
    * same vocab-bounded table as x21), and pair extraction explodes the
    * VOCABULARY, not the corpus: char-pair work is O(vocab × word_len)
    * regardless of corpus size. */
  def bpePairCounts(spark: SparkSession, dir: String): DataFrame = {
    // the word-frequency vocabulary is the STAGED rollup ([[TermStage]])
    val wordFreq = TermStage.termStats(spark, dir)
      .select(col("term").as("w"), col("tf").as("freq"))
    wordFreq.filter(length(col("w")) >= 2)
      .select(col("w"), col("freq"),
        explode(transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("freq")).as("pair_count"), countDistinct(col("w")).as("n_words"))
  }

  /** Deterministic BPE fit over a (word, freq) vocabulary: nMerges rounds
    * of argmax adjacent-pair count (ties broken lexicographically so the
    * fitted model is a pure function of the vocabulary). Driver-side over
    * MODEL-STATE-sized input — the vocabulary aggregate, like a KMeans
    * fit — while the corpus-scale steps (the word-freq aggregate feeding
    * it, and the encode afterwards) stay distributed. Round 1's argmax is
    * exactly x59's top row (asserted in OperatorsSpec). */
  private[graft] def fitBpeMerges(vocab: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    def chars(w: String): Vector[String] = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        b += w.substring(i, i + n); i += n
      }
      b.result()
    }
    var words: Map[Vector[String], Long] =
      vocab.groupBy(t => chars(t._1)).view.mapValues(_.map(_._2).sum).toMap
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val counts = new scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, freq) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + freq)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val (pair, _) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += pair
        words = words.map { case (syms, freq) =>
          val next = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == pair._1 && syms(j + 1) == pair._2) {
              next += (pair._1 + pair._2); j += 2
            } else { next += syms(j); j += 1 }
          }
          next.result() -> freq
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        round += 1
      }
    }
    merges.result()
  }

  /** Bounded vocabulary fetch backing the BPE fit: frequency floor, then
    * distributed top-`vocabCap` by (freq desc, word asc — deterministic
    * tie-break). The orderBy+limit plans as TakeOrderedAndProject: each
    * partition keeps its own top-`vocabCap`, a single tiny exchange merges
    * them, and the driver receives exactly ≤ `vocabCap` rows — bounded
    * MODEL STATE (the KMeans-centroid pattern), never the raw distinct-word
    * set. */
  private[graft] def bpeFitVocabDf(spark: SparkSession, dir: String,
                                   minFreq: Long, vocabCap: Int): DataFrame =
    TermStage.termStats(spark, dir)
      .select(col("term").as("w"), col("tf").as("freq"))
      .filter(col("freq") >= minFreq)
      .orderBy(col("freq").desc, col("w"))
      .limit(vocabCap)

  private[graft] def bpeFitVocab(spark: SparkSession, dir: String,
                                 minFreq: Long, vocabCap: Int): Seq[(String, Long)] =
    bpeFitVocabDf(spark, dir, minFreq, vocabCap)
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))

  /** BPE tokenizer end-to-end: fit merges on the corpus vocabulary
    * (driver-side model state, BOUNDED: `minFreq` floor + top-`vocabCap`
    * cap applied in-plan before the collect, so driver memory is
    * O(vocabCap) at any corpus size), then encode every document with the
    * fused `BpeEncode` kernel — the fitted-tokenizer-applied-distributed
    * shape of a real pipeline. When the corpus vocabulary fits under the
    * bounds (as in the test corpus) the fit is identical to an unbounded
    * one (asserted in OperatorsSpec). Test-gated (model output, x40's
    * pattern); x59 oracle-checks the corpus-scale counting the fit
    * consumes. */
  def bpeTokenize(spark: SparkSession, dir: String, nMerges: Int = 50,
                  minFreq: Long = BpeMinFreq, vocabCap: Int = BpeVocabCap): DataFrame = {
    val merges = fitBpeMerges(bpeFitVocab(spark, dir, minFreq, vocabCap), nMerges)
    Tables.documents(spark, dir).select(
      col("doc_id"),
      graft.functions.BpeEncode.bpe_encode(col("text"), merges).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")))
  }

  /** Per-source distinct-token cardinality via the KMV sketch
    * (`graft.functions.KmvSketch`): bounded O(k) state per group,
    * map-side-combinable, no shuffle of the distinct values — the scale
    * replacement for `countDistinct` when the answer may be approximate.
    * Deterministic end-to-end (md5-60 hashes + exact-IEEE estimate), so
    * x34's oracle replicates the sketch in SQL. */
  def distinctTokenSketch(spark: SparkSession, dir: String, k: Int = 256): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), explode(words(col("text"))).as("w"))
      .select(col("source"), Dedup.md5Hash60(col("w")).as("h"))
      .groupBy(col("source"))
      .agg(graft.functions.KmvSketch.kmv_sketch(col("h"), k).as("sk"))
      .select(col("source"), col("sk.n_kept").as("n_kept"),
        col("sk.kth_hash").as("kth_hash"), col("sk.est_distinct").as("est_distinct"))

  /** Count-min sketch heavy-hitter monitor (x41): estimate per-token
    * frequencies from a fixed O(depth × width) counter table instead of a
    * vocabulary-sized exact count — the bounded-state way to watch the
    * heavy hitters of a 100 TB token stream (the exact x21 vocabulary
    * aggregate shuffles one row per distinct token; this shuffles at most
    * depth×width counter cells, a constant). Hash rows are the
    * engine-neutral salted `md5Hash60` (same family as x03/x27), so the
    * WHOLE sketch — bucketing, counter sums, min-over-rows estimate — is
    * deterministic and replicated in the DuckDB oracle; the sketch's
    * defining one-sided error (estimate ≥ true count) is visible in the
    * output (`overcount` ≥ 0) and asserted in the spec.
    *
    * Scale shape: token explode is map-side only — the groupBy on
    * (row, bucket) partial-aggregates every mapper's stream down to ≤
    * depth×width cells before the (tiny, skew-free) shuffle; the counter
    * table then BROADCASTS to estimate any query set in-plan. The exact
    * top-K reference counts here come from x21's aggregate (this is the
    * eval harness for the sketch); a production monitor would query the
    * sketch alone. */
  /** The count-min (row, bucket) cell of token `w` for hash row `r` —
    * salted engine-neutral md5-60, shared by x41's counter fold, the
    * probe side, and the streaming twin. */
  private[graft] def cmBucket(w: Column, r: Int, width: Int): Column =
    pmod(Dedup.md5Hash60(concat(lit(s"cm$r:"), w)), lit(width.toLong))

  /** The count-min counter cells of a documents frame computed from the
    * RAW token stream — the streaming-compatible form (explode + one
    * partial-agg'd groupBy onto ≤ depth×width cells; as a streaming
    * aggregate its state is exactly those cells — bounded regardless of
    * stream length, the defining property of a sketch). Batch x41 folds
    * the same cells from the staged O(vocab) rollup instead; the spec
    * proves the two constructions identical. */
  def countMinCells(docs: DataFrame, depth: Int = CmDepth,
                    width: Int = CmWidth): DataFrame =
    docs.select(explode(words(col("text"))).as("w"))
      .select(explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), cmBucket(col("w"), r, width).as("b"))): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("cnt"))

  def countMinHeavyHitters(spark: SparkSession, dir: String, depth: Int = CmDepth,
                           width: Int = CmWidth, topK: Int = 20): DataFrame = {
    def bucket(w: Column, r: Int): Column = cmBucket(w, r, width)
    // counters fold the STAGED O(vocab) term-stats rollup tf-weighted
    // ([[TermStage]]) — identical cells to hashing the raw token stream,
    // at O(vocab × depth) work instead of O(corpus tokens × depth)
    val counters = TermStage.termStats(spark, dir)
      .select(col("tf"), explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), bucket(col("term"), r).as("b"))): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(sum(col("tf")).as("cnt"))
    val top = vocabularyStats(spark, dir, topK)
      .select(col("word"), col("term_freq").as("true_count"))
    val probes = top.select(col("word"), col("true_count"),
      explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), bucket(col("word"), r).as("b"))): _*)).as("rb"))
      .select(col("word"), col("true_count"), col("rb.r").as("r"), col("rb.b").as("b"))
    probes.join(broadcast(counters), Seq("r", "b"))
      .groupBy(col("word"), col("true_count"))
      .agg(min(col("cnt")).as("est_count"))
      .withColumn("overcount", col("est_count") - col("true_count"))
  }

  /** Rare-token ratio filter (x42): fraction of a document's token
    * occurrences whose CORPUS-WIDE term frequency is far below the mean —
    * the standard gibberish/OCR-noise gate (rare-token-dominated documents
    * are overwhelmingly mojibake, boilerplate IDs, or OCR failures). A
    * token is rare iff `tf · relDenom < ⌊total_tokens / vocab_size⌋`
    * (i.e. below 1/relDenom of the mean frequency): RELATIVE rarity is
    * scale-invariant — an absolute cutoff that fires at sf0.01 is
    * meaningless at 100 TB — and the all-integer comparison (floor
    * division on both engines) keeps it oracle-exact. Corpus totals fold
    * in as a broadcast 1-row aggregate (x22's n_docs pattern, no separate
    * count() action). Two shuffles, both on uniform keys: term frequencies
    * on token (map-side partial agg — the rare set is most of a real
    * vocabulary, so it is NOT broadcastable and the join back runs as a
    * plain shuffle join on the token key), then per-doc ratios on doc_id.
    * The final ratio is one int/int IEEE division → exact cross-engine. */
  def rareTokenStats(spark: SparkSession, dir: String, relDenom: Int = RareRelDenom,
                     flagAt: Double = 0.5): DataFrame = {
    // both sides read the STAGE ([[TermStage]]): per-doc terms carry
    // their tf (occurrence weight), corpus frequencies come from the
    // O(vocab) rollup — the doc-side join shuffles the aggregated
    // doc-term table, never the exploded occurrence stream
    val tok = TermStage.docTermFreq(spark, dir)
      .select(col("doc_id"), col("term").as("w"), col("tf").as("doc_tf"))
    val tf = TermStage.termStats(spark, dir)
      .select(col("term").as("w"), col("tf"))
    val stats = tf.agg(sum(col("tf")).as("total_tf"), count(lit(1)).as("n_vocab"))
    val isRare = (col("tf") * relDenom) < expr("total_tf div n_vocab")
    tok.join(tf, Seq("w"))
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(sum(col("doc_tf")).as("n_tokens"),
        sum(when(isRare, col("doc_tf")).otherwise(0L)).as("n_rare"),
        count(lit(1)).as("n_distinct"))
      .withColumn("rare_ratio", col("n_rare") / col("n_tokens"))
      .withColumn("flagged", (col("rare_ratio") >= flagAt).cast("int"))
  }

  /** PII scrubbing: redact email addresses, phone-like sequences and long
    * digit runs — the compliance pass every training-data pipeline runs
    * before tokenization. Pure regexp_replace chain (codegen'd, no
    * shuffle); patterns stay in the Java∩RE2 regex subset so the DuckDB
    * oracle behaves identically. The testdata has no PII, so the query
    * plants deterministic synthetic PII per row and verifies the scrub. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id").cast("string")
    val planted = concat(col("text"),
      lit(" contact user"), id, lit("@example.com or +1-555-000-"),
      id, lit(" ref 1234567890123"))
    val scrubbed =
      regexp_replace(
        regexp_replace(
          regexp_replace(planted,
            "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
          "\\+?[0-9][0-9()\\[\\]. -]{7,}[0-9]", "<PHONE>"),
        "[0-9]{9,}", "<NUM>")
    Tables.documents(spark, dir).select(
      col("doc_id"),
      scrubbed.as("scrubbed"),
      (length(planted) - length(scrubbed)).as("chars_removed"))
  }

  /** Intra-document n-gram repetition ratio (the Gopher-style "repetition"
    * quality filter): fraction of n-gram occurrences that are duplicates of
    * an earlier n-gram in the same document. High ratios mark boilerplate /
    * degenerate text an LLM pipeline drops before training. Per-row
    * projection (the distinct count reuses the fused `word_shingles`
    * kernel), no shuffle; `(total-distinct)/total` is one exact int/int
    * IEEE division, so the oracle matches bit-for-bit. */
  /** (total, distinct) n-gram occurrence counts of `text` — the shared
    * arithmetic under the repetition ratio (x30) and the assembly funnel's
    * quality gate (x35); one definition keeps their oracles in lockstep. */
  private[operators] def ngramCounts(n: Int): (Column, Column) = (
    greatest(size(words(col("text"))) - (n - 1), lit(0)),
    size(graft.functions.HashSignatures.word_shingles(col("text"), n)))

  def repetitionStats(spark: SparkSession, dir: String, n: Int = 3,
                      flagAt: Double = 0.2): DataFrame = {
    val (total, distinctN) = ngramCounts(n)
    Tables.documents(spark, dir)
      .select(col("doc_id"), total.as("total_ngrams"), distinctN.as("distinct_ngrams"))
      .filter(col("total_ngrams") > 0)
      .withColumn("dup_ratio",
        (col("total_ngrams") - col("distinct_ngrams")) / col("total_ngrams"))
      .withColumn("flagged", (col("dup_ratio") >= flagAt).cast("int"))
  }

  /** Quality-classifier feature assembly (x40): the per-document feature
    * vector a model-based quality filter scores — length, word-shape and
    * repetition signals (shared definitions with x05/x30 so the three can
    * never drift) — plus the heuristic label the classifier is trained
    * against (the x05 composite score thresholded at 0.5). Fully
    * deterministic per-row projection: every division is int/int (one IEEE
    * op), so the WHOLE feature matrix is oracle-checked cross-engine; the
    * downstream model fit/score (`qualityClassifierScores`) is the only
    * non-oracle-shaped stage, gated by its spec instead. */
  def qualityFeatures(spark: SparkSession, dir: String, labelAt: Double = 0.5): DataFrame = {
    val ws = words(col("text"))
    val (total3, distinct3) = ngramCounts(3)
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(ws).as("n_words"),
      (length(regexp_replace(col("text"), " ", "")) / size(ws)).as("mean_word_len"),
      (countIn(col("text"), EnStopwords) / size(ws)).as("stopword_ratio"),
      (size(filter(ws, w => length(w) === 1)) / size(ws)).as("short_word_ratio"),
      when(total3 > 0, (total3 - distinct3) / total3).otherwise(lit(0.0)).as("dup_ratio"))
      .withColumn("label",
        ((least(lit(1.0), col("n_words") / lit(100.0))
          * (lit(1.0) - col("short_word_ratio"))) >= labelAt).cast("int"))
  }

  /** x89's pinned scorer weights (micro-points per unit) and keep
    * threshold — a fitted linear quality model FROZEN as constants, the
    * form a fastText-style quality classifier actually ships in (fit
    * once offline, pin, apply to every crawl). Shared with the oracle
    * SQL (the PinnedBpeMerges pattern). Weights act on the quantized
    * (×1e6, floored) x40 ratios; the word-count term is per word. */
  val QwWords: Long = 5000L
  val QwMeanLen: Long = 1L
  val QwStop: Long = 3L
  val QwShort: Long = -4L
  val QwDup: Long = -2L
  val QualityKeepThresholdMicro: Long = 4500000L

  /** Pinned-weight quality scoring (x89): the APPLY stage of a quality
    * classifier as an oracle-checked query — x40's features quantized
    * with `floor(ratio · 1e6)` (a composition of exact IEEE ops, the
    * trunc6 argument) then an integer dot product with the frozen
    * weights and a threshold keep flag. Complements
    * `qualityClassifierScores` (the MLlib FIT path, spec-gated): a
    * production pipeline fits rarely and applies constantly, and the
    * apply path is pure per-row projection — no shuffle, no model state
    * beyond the plan-time constants, bit-exact cross-engine. */
  def qualityScorePinned(spark: SparkSession, dir: String): DataFrame = {
    def q(c: Column): Column = floor(c * lit(1000000.0)).cast("long")
    val score = lit(QwWords) * col("n_words").cast("long") +
      lit(QwMeanLen) * q(col("mean_word_len")) +
      lit(QwStop) * q(col("stopword_ratio")) +
      lit(QwShort) * q(col("short_word_ratio")) +
      lit(QwDup) * q(col("dup_ratio"))
    qualityFeatures(spark, dir)
      .select(col("doc_id"), score.as("score_micro"))
      .withColumn("keep", (col("score_micro") >= QualityKeepThresholdMicro).cast("int"))
  }

  /** Model-scoring stage of the quality pipeline: LogisticRegression
    * (MLlib) trained on `qualityFeatures`' heuristic labels, then applied
    * to the whole corpus as one distributed `transform` — the pattern that
    * replaces a driver-side sklearn loop at 100 TB. The fit aggregates
    * gradients over a FIT INPUT PINNED by key (repartition + sort, same
    * discipline as x18's KMeans) so coefficients don't drift with the
    * session's CPU count; scoring itself is a per-row projection of the
    * broadcast coefficient vector — no shuffle, no collect, linear scan.
    * Model output is float-iterative (not oracle-shaped); its spec gates
    * row coverage, determinism, and training-set agreement instead. */
  def qualityClassifierScores(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.VectorAssembler
    val featCols = Array("n_words", "mean_word_len", "stopword_ratio",
      "short_word_ratio", "dup_ratio")
    val assembled = new VectorAssembler()
      .setInputCols(featCols).setOutputCol("features")
      .transform(qualityFeatures(spark, dir))
    val fitInput = assembled
      .repartition(8, col("doc_id")).sortWithinPartitions(col("doc_id"))
    val model = new LogisticRegression()
      .setMaxIter(25).setRegParam(0.01).setStandardization(true)
      .setFeaturesCol("features").setLabelCol("label")
      .fit(fitInput.withColumn("label", col("label").cast("double")))
    model.transform(assembled)
      .select(col("doc_id"), col("label"),
        col("prediction").cast("int").as("predicted"),
        element_at(org.apache.spark.ml.functions.vector_to_array(col("probability")), 2)
          .as("quality_prob"))
  }

  /** Overlapping token-window chunking (x45): cut every document into
    * `chunkTokens`-token windows advancing by `stride` tokens (stride <
    * chunkTokens ⇒ consecutive chunks overlap — the standard context-window
    * prep for RAG indexing and fixed-window pretraining). Chunk count is
    * `ceil(max(n - chunkTokens, 0) / stride) + 1`, so every token is
    * covered and the tail chunk may run short. Pure per-row flatMap
    * (sequence + slice higher-order functions, codegen'd): NO shuffle at
    * any size — the one data-pipeline stage that should never cost more
    * than the scan itself. All-integer arithmetic → exact oracle. */
  def chunkDocuments(spark: SparkSession, dir: String, chunkTokens: Int = ChunkTokens,
                     stride: Int = ChunkStride): DataFrame = {
    require(stride > 0 && chunkTokens >= stride, "need 0 < stride <= chunkTokens")
    val ws = words(col("text"))
    // floor division via `div` keeps the chunk count all-integer
    val nChunks = expr(s"CAST((greatest(size(split(text, ' ')) - $chunkTokens, 0)" +
      s" + ${stride - 1}) div $stride AS INT) + 1")
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => slice(ws, i * stride + 1, lit(chunkTokens)))))
      .toDF("doc_id", "chunk_id", "chunk")
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk")).as("n_tokens"),
        md5(array_join(col("chunk"), " ")).as("chunk_md5"))
  }

  /** x76's token budget per chunk, shared with the oracle SQL. */
  val BpeChunkBudget: Long = 32L

  /** Per-word BPE token counts, in word order — `bpe_encode` applied to
    * each word via `transform` (the encode is word-local, so per-word ≡
    * whole-text slicing; asserted in spec). Shared by the x76 kernel
    * query and its window twin so the two can't diverge on tokenization. */
  private def perWordTokenCounts(merges: Seq[(String, String)]): Column =
    transform(words(col("text")),
      w => size(graft.functions.BpeEncode.bpe_encode(w, merges)).cast("long"))

  /** Tokenizer-fertility audit (x113): BPE tokens per whitespace word,
    * per (source, lang) cell, under the pinned x63 tokenizer — the
    * panel a pretraining team reads before committing a tokenizer to a
    * source mix (high fertility on one language means that language
    * pays more compute per word and fits less text per context window).
    * `fertility_ppm` is exact integer fixed-point
    * `(10⁶·n_bpe_tokens) div n_words` (safe below ~9.2·10¹² tokens per
    * cell, the x65 bound class); `fertility` is the one int/int IEEE
    * division.
    *
    * 100 TB shape: per-word token counts run inside the scan projection
    * (the fused `BpeEncode` kernel via `perWordTokenCounts` — zero
    * shuffle, x76's path); the only shuffle is the partial-agg'd
    * (source, lang) rollup. Output is O(cells). */
  def tokenizerFertility(spark: SparkSession, dir: String,
                         merges: Seq[(String, String)] = PinnedBpeMerges): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), col("lang"),
        size(words(col("text"))).cast("long").as("nw"),
        aggregate(perWordTokenCounts(merges), lit(0L), _ + _).as("nt"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nw")).as("n_words"),
        sum(col("nt")).as("n_bpe_tokens"))
      .select(col("source"), col("lang"), col("n_docs"), col("n_words"),
        col("n_bpe_tokens"),
        expr("(1000000L * n_bpe_tokens) div n_words").as("fertility_ppm"),
        (col("n_bpe_tokens") / col("n_words")).as("fertility"))

  /** BPE-token-budget document chunking (x76): cut every document into
    * chunks of ~`budget` TOKENIZER tokens at word boundaries — x45's
    * context-window prep, but budgeted by the tokens the model actually
    * sees (the pinned x63 tokenizer) instead of the whitespace proxy. A
    * word belongs to the chunk its first token falls in, so chunks
    * overflow by at most one word's tokens, and a single word longer than
    * the budget owns its chunk (ids skip past its overflow — documented
    * kernel semantics).
    *
    * 100 TB shape: per-word counts (`transform` + the fused `BpeEncode`)
    * and chunk assignment (the linear `TokenChunkStats` kernel) both run
    * inside the scan projection, and the chunk structs inline-explode —
    * ZERO shuffles at any corpus size, unlike the window-twin formulation
    * (one corpus shuffle on doc_id), which is kept only as the spec's
    * equivalence reference. */
  def bpeChunkDocuments(spark: SparkSession, dir: String,
                        budget: Long = BpeChunkBudget,
                        merges: Seq[(String, String)] = PinnedBpeMerges): DataFrame =
    bpeChunkDocuments(Tables.documents(spark, dir), budget, merges)

  /** DataFrame-first form of x76 — a stateless per-row projection, so the
    * SAME definition runs over a batch table or a streaming source (the
    * `DocumentStream.bpeChunkStream` twin). */
  def bpeChunkDocuments(docs: DataFrame, budget: Long,
                        merges: Seq[(String, String)]): DataFrame =
    docs
      .select(col("doc_id"),
        explode(graft.functions.TokenChunkStats.token_chunk_stats(
          perWordTokenCounts(merges), budget)).as("c"))
      .select(col("doc_id"), col("c.chunk_id"), col("c.n_words"),
        col("c.chunk_tokens"), col("c.first_word"), col("c.last_word"))

  /** The window formulation of x76 — cumulative token sum per doc, floor
    * division, groupBy — costing one corpus shuffle on doc_id. Reference
    * twin for KernelPropertiesSpec only. */
  private[graft] def bpeChunkDocumentsWindowTwin(spark: SparkSession, dir: String,
                                                 budget: Long = BpeChunkBudget,
                                                 merges: Seq[(String, String)] = PinnedBpeMerges): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(perWordTokenCounts(merges)).as(Seq("pos", "n_toks")))
      .withColumn("cum_after", sum(col("n_toks")).over(w))
      .withColumn("chunk_id", expr(s"CAST((cum_after - n_toks) div ${budget}L AS BIGINT)"))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_toks")).as("chunk_tokens"),
        min(col("pos")).cast("long").as("first_word"),
        max(col("pos")).cast("long").as("last_word"))
  }

  /** Winnowing fingerprints (rolling-hash document fingerprinting, as in
    * MOSS): hash every k-char gram, take the minimum hash of each sliding
    * window of w grams, emit the distinct minima. Guarantees any shared
    * substring ≥ w+k-1 chars yields a shared fingerprint. Per-row
    * projection + explode — no shuffle until a downstream join on `fp`. */
  def winnowingFingerprints(spark: SparkSession, dir: String,
                            k: Int = 8, w: Int = 4): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.HashSignatures.winnow_fp(col("text"), k, w)).as("fp"))

  /** The HOF formulation of winnowing — O(len²) because the gram array is
    * re-evaluated inside every window lambda; kept ONLY as the reference
    * twin for unit-testing the O(len) kernel on tiny inputs. */
  private[graft] def winnowingFingerprintsHof(df: DataFrame, k: Int, w: Int): DataFrame = {
    val t = col("text")
    val nGrams = length(t) - k + 1
    val emptyStrings = array().cast("array<string>")
    val grams = when(nGrams >= 1,
      transform(sequence(lit(0), nGrams - 1), i => md5(substr(t, i + lit(1), lit(k)))))
      .otherwise(emptyStrings)
    val fps = when(size(grams) >= w,
      array_distinct(transform(sequence(lit(0), size(grams) - w),
        j => array_min(slice(grams, j + lit(1), lit(w))))))
      .otherwise(emptyStrings)
    df.select(col("doc_id"), explode(fps).as("fp"))
  }

  /** KMV sketch accuracy audit (x133): per source, x34's bounded-state
    * distinct estimate side-by-side with the EXACT distinct count and
    * the measured error — the honest-measurement harness for the
    * sketch (x130's precision-audit discipline applied to cardinality
    * estimation: don't trust an estimator, measure it where exact truth
    * is still affordable). The exact arm is the expensive path (one
    * shuffle of distinct (source, hash) pairs) — a production monitor
    * runs it on a sampled slice or a small SF, which is precisely what
    * this query demonstrates at gate scale.
    *
    * Error columns: `err_est` is the raw signed difference (estimate −
    * exact, a subtraction — never a signed division) in the sketch's
    * own double precision; `abs_err_ppm` floors `10⁶·|err|/exact` — a
    * composition of exact IEEE ops on oracle-replicated inputs (the
    * trunc6/x89 argument), so it compares bit-identically. */
  def sketchAccuracy(spark: SparkSession, dir: String, k: Int = 256): DataFrame = {
    val exact = Tables.documents(spark, dir)
      .select(col("source"), explode(words(col("text"))).as("w"))
      .select(col("source"), Dedup.md5Hash60(col("w")).as("h"))
      .groupBy(col("source"))
      .agg(countDistinct(col("h")).as("exact_distinct"))
    distinctTokenSketch(spark, dir, k)
      .join(exact, Seq("source"))
      .select(col("source"), col("exact_distinct"), col("n_kept"),
        col("est_distinct"),
        (col("est_distinct") - col("exact_distinct")).as("err_est"),
        floor(abs(col("est_distinct") - col("exact_distinct")) * lit(1000000.0)
          / col("exact_distinct")).cast("long").as("abs_err_ppm"))
  }

  /** Reciprocal-rank-fusion consensus curation (x137): fuse the top-k
    * documents by x89's pinned quality score with the top-k by
    * vocabulary richness (distinct-token count, x55's integer column)
    * into one consensus list — the standard RRF recipe for merging
    * heterogeneous rankings without score calibration, here applied to
    * corpus curation ("which docs do BOTH quality lenses like").
    *
    * Integer-quantized RRF: each list contributes
    * `1000000 div (60 + rank)` micro-units (the classic 1/(60+r)
    * scaled to fixed point and floored — `div` on positive ints is
    * floor in both engines), absent docs contribute 0. No floats
    * anywhere, so the fused score compares bit-identically.
    *
    * 100 TB shape: each arm is a corpus partial-agg (x89's per-row
    * projection / x55's per-doc distinct count) followed by a
    * TakeOrdered top-k — never a global rank window over the corpus.
    * The rank assignment windows run over the two already-reduced
    * k-row frames (`localCheckpoint`ed; the x48 tiny-table case), and
    * the fusion is a full-outer join of two k-row sides (broadcast by
    * size). Output ≤ 2k rows. */
  def rrfConsensus(spark: SparkSession, dir: String,
                   k: Int = 100, kRrf: Int = 60): DataFrame = {
    def topRanked(scored: DataFrame, score: String, rank: String): DataFrame = {
      val top = scored.orderBy(col(score).desc, col("doc_id")).limit(k)
        .localCheckpoint()
      val w = Window.orderBy(col(score).desc, col("doc_id"))
      top.withColumn(rank, row_number().over(w).cast("long"))
        .select(col("doc_id"), col(rank))
    }
    val qRank = topRanked(qualityScorePinned(spark, dir)
      .select(col("doc_id"), col("score_micro")), "score_micro", "r_quality")
    val rRank = topRanked(lexicalDiversity(spark, dir)
      .select(col("doc_id"), col("n_distinct")), "n_distinct", "r_richness")
    qRank.join(rRank, Seq("doc_id"), "full_outer")
      .withColumn("rrf_micro",
        coalesce(expr(s"1000000L div ($kRrf + r_quality)"), lit(0L)) +
          coalesce(expr(s"1000000L div ($kRrf + r_richness)"), lit(0L)))
  }

  /** Quality-drift monitor (x129): per source, the exact-rational OLS
    * slope of x89's pinned quality score over x125's doc_id-range
    * ingest batches — "is this crawl source getting worse", the alarm a
    * corpus operator wants BEFORE a bad batch trains. Composes three
    * pinned definitions verbatim (x89 scoring, x125 batching, x119's
    * raw num/den rational form) so drift can never disagree with the
    * scores or batches it monitors.
    *
    * The regression runs over PER-DOCUMENT points (x = batch, y =
    * score_micro): `n·Σxy − Σx·Σy` and `n·Σx² − (Σx)²` are pure
    * products and sums — legitimately negative for degrading sources,
    * and NEVER divided (the signed floor/truncate trap). Overflow bound
    * (honest): |y| ≲ 10⁷ micro-points and x ≤ 9, so `n·Σxy ≲ 10⁸·n²`
    * wraps past ~10⁵ docs per source at worst-case scores — far above
    * the gate scales; for web-scale sources rescale y first (x110's
    * quantized-share trick, e.g. score deciles) — the same structural
    * note as x119.
    *
    * 100 TB shape: one scored-docs scan (x89's no-shuffle projection)
    * joined to the O(docs) source/batch keys, then ONE partial-agg'd
    * groupBy per source — the five sums all combine map-side. The 1-row
    * max-doc-id scalar crossJoins back broadcast. Output is O(sources). */
  def qualityDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val mx = docs.agg(max(col("doc_id")).as("mx"))
    qualityScorePinned(spark, dir)
      .join(docs, Seq("doc_id"))
      .crossJoin(mx)
      .select(col("source"),
        expr(s"(doc_id * ${Dedup.NoveltyBatches}) div (mx + 1)").as("x"),
        col("score_micro").as("y"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("source"), col("n_docs"),
        (col("n_docs") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n_docs") * col("sxx") - col("sx") * col("sx")).as("slope_den"))
  }

  /** Kolmogorov–Smirnov length-drift matrix (x159): for every source
    * pair, the EXACT two-sample KS statistic over the document-length
    * (n_chars) distributions — max over the merged value grid of
    * |CDF_a − CDF_b| — published as the raw rational `ks_num =
    * max|c_a·n_b − c_b·n_a|`, `ks_den = n_a·n_b` (x119's discipline:
    * the supremum of an integer-valued difference divides at the
    * consumer) plus the smallest length achieving the supremum. This is
    * the distribution-level drift test (x129 tracks a per-source trend;
    * x65 a share drift): "did src7's crawl change shape vs src3" with a
    * statistic a monitoring layer can threshold (KS > c·√((n_a+n_b)/
    * (n_a·n_b)) rejects at the c-level).
    *
    * 100 TB shape: the corpus-sized stage is ONE partial-agg'd groupBy
    * onto (source, length) — O(S·distinct lengths) rows, the
    * bounded-domain discipline of x29/x131 (lengths are capped by the
    * ingest contract, so the count table is aggregate-sized, never
    * corpus-sized). The pair grid is S²/2 × merged-value-grid rows with
    * every window PARTITIONED per pair and bounded by the value domain;
    * drift monitoring across S sources is inherently pairwise — for
    * catalog-scale S, block pairs upstream (same-language, same-format)
    * exactly like x128 blocks names. CDF cross-products c·n run in
    * DECIMAL(38,0) (counts ≥ 2⁶³/n past ~10⁹ docs/source squared —
    * x152's unconditional promotion). */
  /** The shared source-pair merged-value grid under x159/x161: from
    * per-(source, v) counts, every source pair `src_a < src_b` with the
    * union of their observed values and both per-value counts (0 where
    * one side never saw the value). Every rank/CDF statistic over a
    * pair of empirical distributions starts here; the pair build is the
    * S-row inequality self-join (tiny — per-source aggregate sized). */
  private def sourcePairGrid(counts0: DataFrame): DataFrame = {
    val counts = counts0.localCheckpoint()
    val totals = counts.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val pairs = totals.as("a").join(totals.as("b"),
        col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
    val onA = pairs.join(counts.withColumnRenamed("source", "src_a"), Seq("src_a"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("v"),
        col("c").as("da"), lit(0L).as("db"))
    val onB = pairs.join(counts.withColumnRenamed("source", "src_b"), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("v"),
        lit(0L).as("da"), col("c").as("db"))
    onA.unionByName(onB)
      .groupBy(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("v"))
      .agg(sum(col("da")).as("da"), sum(col("db")).as("db"))
  }

  def lengthDriftKs(spark: SparkSession, dir: String): DataFrame = {
    val grid = sourcePairGrid(
      Tables.documents(spark, dir)
        .groupBy(col("source"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("c")))
    val cum = Window.partitionBy(col("src_a"), col("src_b")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapped = grid.withColumn("gap",
      abs(sum(col("da")).over(cum).cast("decimal(38,0)") * col("n_b")
        - sum(col("db")).over(cum).cast("decimal(38,0)") * col("n_a")))
    val top = Window.partitionBy(col("src_a"), col("src_b"))
      .orderBy(col("gap").desc, col("v"))
    gapped.withColumn("r", row_number().over(top)).filter(col("r") === 1)
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("v").as("ks_at_length"),
        col("gap").cast("decimal(38,0)").cast("string").as("ks_num"),
        (col("n_a").cast("decimal(38,0)") * col("n_b"))
          .cast("decimal(38,0)").cast("string").as("ks_den"))
  }

  /** Zipf rank-frequency audit (x167): the corpus vocabulary folded to
    * FREQUENCY LEVELS — for each distinct token frequency f: how many
    * types sit at f, the exact strict-rank span [rank_lo, rank_hi]
    * those types occupy (ties share, x120's convention), and the
    * engine-neutral log₂ bucket of both axes via the bit-length trick
    * (`length(bin(x))` — x142's discipline; float log2 rounds
    * differently near powers of two). The log-log pairs are the Zipf
    * fit input ("is this corpus natural-language-shaped or template
    * spam"); levels, not per-token rows, because the level table is
    * the smallest exact sufficient statistic for any rank-frequency
    * fit.
    *
    * 100 TB shape: one token explode into a partial-agg'd (token, f)
    * groupBy, folded again to O(distinct frequencies) rows — tiny by
    * Zipf itself (≈ √tokens levels) — then ranks from
    * [[Sampling.exclusivePrefixSum]] over the NEGATED frequency (rank
    * 1 = most frequent; never a corpus-wide ordered window). */
  def zipfAudit(spark: SparkSession, dir: String): DataFrame = {
    // frequency levels fold the STAGED O(vocab) rollup ([[TermStage]])
    val levels = TermStage.termStats(spark, dir)
      .select(col("tf").as("f"))
      .groupBy(col("f")).agg(count(lit(1)).as("n_types"))
      .localCheckpoint()
    val ranks = Sampling.exclusivePrefixSum(
        levels.select((-col("f")).as("key"), col("n_types").as("v")))
      .select((-col("key")).as("f"), col("offset"))
    levels.join(ranks, Seq("f"))
      .select(col("f"), col("n_types"),
        (col("offset") + 1).as("rank_lo"),
        (col("offset") + col("n_types")).as("rank_hi"),
        length(bin(col("f"))).cast("long").as("log2_f"),
        length(bin(col("offset") + 1)).cast("long").as("log2_rank"))
  }

  /** Heaps-law vocabulary growth curve (x168): per ingest batch (x125's
    * doc_id-range batches — the crawl-snapshot stand-in), the token
    * volume, the NEW types first seen in that batch, and the cumulative
    * (tokens, types) pair — the empirical Heaps curve V(n) ≈ K·n^β
    * whose flattening tells a crawl operator when new data stops
    * growing the vocabulary (the unigram complement of x125's 5-gram
    * novelty: x125 asks "is the CONTENT new", this asks "is the
    * LANGUAGE new").
    *
    * 100 TB shape: one (batch, token) explode, `localCheckpoint`ed for
    * its two consumers (per-batch volume; per-token min-batch first-seen
    * — both partial-agg'd, the min-fold exactly x125's first-seen
    * shape); the cumulative window runs over O(batches) rows (the
    * documented tiny-table case). */
  def heapsCurve(spark: SparkSession, dir: String,
                 nBatches: Int = Dedup.NoveltyBatches): DataFrame = {
    // batches assigned over the STAGED doc-term table ([[TermStage]]),
    // tf-weighted — token volume and first-seen types are exactly the
    // exploded-stream answers at doc-term-aggregate cost
    val mx = Tables.documents(spark, dir).agg(max(col("doc_id")).as("mx"))
    val bt = TermStage.docTermFreq(spark, dir).crossJoin(broadcast(mx))
      .select(expr(s"(doc_id * $nBatches) div (mx + 1)").as("batch"),
        col("term").as("token"), col("tf"))
      .localCheckpoint()
    val perBatch = bt.groupBy(col("batch")).agg(sum(col("tf")).as("n_tokens"))
    val firstSeen = bt.groupBy(col("token")).agg(min(col("batch")).as("batch"))
      .groupBy(col("batch")).agg(count(lit(1)).as("n_new_types"))
    val w = Window.orderBy(col("batch"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBatch.join(firstSeen, Seq("batch"), "left")
      .select(col("batch"), col("n_tokens"),
        coalesce(col("n_new_types"), lit(0L)).as("n_new_types"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("cum_types", sum(col("n_new_types")).over(w))
  }

  /** Lang × source contingency deviations (x160): the full S×L grid —
    * observed count, row/column marginals, corpus total, and the exact
    * signed deviation from independence as the raw rational
    * `dev_num = n_ij·N − r_i·c_j`, `dev_den = N²` (so `P_obs − P_exp =
    * num/den` exactly) — the input table to every χ² independence
    * audit ("is language mix independent of source"), published as
    * integers so thresholds and χ² folds happen at the consumer
    * (x119's discipline). Unobserved (source, lang) cells appear with
    * n_ij = 0 — their deviation `−r_i·c_j` is exactly what χ² must
    * charge — built by crossing the two marginal aggregates, never by
    * scanning the corpus for absences.
    *
    * 100 TB shape: ONE partial-agg'd groupBy onto O(S·L) cells; the
    * marginals and the full grid are aggregate-sized; the 1-row total
    * crossJoins back broadcast. Products in DECIMAL(38,0) (r·c passes
    * 2⁶³ when both marginals pass ~3·10⁹ — x152's promotion). */
  def langSourceContingency(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(spark, dir)
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n_ij"))
      .localCheckpoint()
    val rows = cells.groupBy(col("source")).agg(sum(col("n_ij")).as("r_i"))
    val cols = cells.groupBy(col("lang")).agg(sum(col("n_ij")).as("c_j"))
    val tot = cells.agg(sum(col("n_ij")).as("n_total"))
    rows.crossJoin(broadcast(cols))
      .join(cells, Seq("source", "lang"), "left")
      .crossJoin(broadcast(tot))
      .select(col("source"), col("lang"),
        coalesce(col("n_ij"), lit(0L)).as("n_ij"),
        col("r_i"), col("c_j"), col("n_total"),
        (coalesce(col("n_ij"), lit(0L)).cast("decimal(38,0)") * col("n_total")
          - col("r_i").cast("decimal(38,0)") * col("c_j"))
          .cast("decimal(38,0)").cast("string").as("dev_num"),
        (col("n_total").cast("decimal(38,0)") * col("n_total"))
          .cast("decimal(38,0)").cast("string").as("dev_den"))
  }

  /** Exact Mann–Whitney rank test between source pairs (x161): for
    * every source pair, the tie-exact doubled Wilcoxon statistic
    * `u2_a = 2·R_a − n_a(n_a+1)` over x89's pinned quality scores,
    * where R_a is src_a's MIDRANK sum in the combined sample — plus
    * the tie term `Σ(d³−d)` the variance's tie correction needs. The
    * rank-based "is src_a's quality stochastically higher" test: KS
    * (x159) detects any shape change; this detects a LOCATION shift
    * with distribution-free calibration (consumer: U = u2/2, z-score
    * from n_a, n_b, tie_cubes — all divisions downstream).
    *
    * Integers only via the doubling trick: a value shared by d rows
    * with o rows strictly below has midrank `o + (d+1)/2`, so 2R_a
    * folds as `Σ c_a·(2o + d + 1)` over the merged grid — the same
    * tie-group identity as x156's Gini, on the combined distribution.
    *
    * 100 TB shape: [[sourcePairGrid]] (bounded-domain counts, per-pair
    * partitioned windows); products in DECIMAL(38,0) (2R_a reaches
    * n² ≈ 10²⁶). */
  def qualityRankTest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val grid = sourcePairGrid(
      qualityScorePinned(spark, dir)
        .join(docs, Seq("doc_id"))
        .groupBy(col("source"), col("score_micro").as("v"))
        .agg(count(lit(1)).as("c")))
    val cum = Window.partitionBy(col("src_a"), col("src_b")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    grid
      .withColumn("d", col("da") + col("db"))
      .withColumn("o", coalesce(sum(col("da") + col("db")).over(cum), lit(0L)))
      .groupBy(col("src_a"), col("src_b"), col("n_a"), col("n_b"))
      .agg(
        sum(col("da").cast("decimal(38,0)")
          * (col("o") * 2 + col("d") + 1)).as("r2a"),
        sum((col("d").cast("decimal(38,0)") * col("d") * col("d")
          - col("d")).cast("decimal(38,0)")).as("tie_cubes"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        (col("r2a") - col("n_a").cast("decimal(38,0)") * (col("n_a") + 1))
          .cast("decimal(38,0)").cast("string").as("u2_a"),
        col("tie_cubes").cast("decimal(38,0)").cast("string").as("tie_cubes"))
  }

  /** x174 knobs: the per-source tf floor (hapax/noise prune) and the
    * per-source panel size, shared with the oracle SQL. */
  val AffinityMinTf: Long = 5L
  val AffinityTopK: Int = 10

  /** Source-characteristic terms (x174): per source, the
    * [[AffinityTopK]] terms most over-represented relative to the
    * corpus, ranked by the exact lift rational `(tf_s·N) / (tf_c·N_s)`
    * — "what vocabulary makes this source itself", the per-source
    * TF-IDF analogue a mixture designer reads before reweighting
    * sources. The rational is published undivided as digit strings
    * (x119/x153's discipline, r10 representation rule) PLUS the
    * one-IEEE-op double used for ranking — both engines convert the
    * same two exact integers and divide once, so the order (tie-broken
    * on the term string) is total and engine-identical. Terms below
    * [[AffinityMinTf]] per-source occurrences are pruned (a hapax in a
    * small source otherwise tops every list).
    *
    * 100 TB shape: per-source term counts are the STAGED doc-term
    * table joined to the narrow (doc_id, source) projection
    * ([[TermStage]] — x105's shape); corpus counts and the 1-row total
    * come from the staged rollup; the per-source window runs over the
    * tf-floored candidate set (O(vocab) per source, partitioned —
    * never corpus-sized). */
  def sourceTermAffinity(spark: SparkSession, dir: String,
                         minTf: Long = AffinityMinTf,
                         topK: Int = AffinityTopK): DataFrame = {
    require(minTf >= 1 && topK >= 1, "need minTf >= 1 and topK >= 1")
    val st = TermStage.docTermFreq(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .groupBy(col("source"), col("term")).agg(sum(col("tf")).as("tf_s"))
      .localCheckpoint() // two consumers: the n_s rollup + the candidates
    val ns = st.groupBy(col("source")).agg(sum(col("tf_s")).as("n_s"))
    val ct = TermStage.termStats(spark, dir)
      .select(col("term"), col("tf").as("tf_c"))
    val nt = ct.agg(sum(col("tf_c")).as("n_total"))
    val cand = st.filter(col("tf_s") >= minTf)
      .join(ct, Seq("term"))
      .join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(nt))
      .withColumn("aff_num",
        (col("tf_s").cast("decimal(38,0)") * col("n_total")).cast("decimal(38,0)"))
      .withColumn("aff_den",
        (col("tf_c").cast("decimal(38,0)") * col("n_s")).cast("decimal(38,0)"))
      .withColumn("affinity",
        col("aff_num").cast("double") / col("aff_den").cast("double"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("affinity").desc, col("term"))
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("source"), col("rank"), col("term"), col("tf_s"),
        col("tf_c"), col("n_s"), col("n_total"),
        col("aff_num").cast("string").as("aff_num"),
        col("aff_den").cast("string").as("aff_den"), col("affinity"))
  }

  /** Boilerplate gram length / document-frequency threshold / per-doc
    * flag ratio for [[boilerplateGrams]] (x194) — shared with the
    * DuckDB oracle. */
  val BoilerN: Int = 5
  val BoilerDfAt: Int = 2
  val BoilerFlagPpm: Long = 200000L

  /** Within-source boilerplate-gram audit (x194): the C4-style
    * boilerplate detector — a word 5-gram appearing in ≥ `dfAt`
    * DISTINCT documents of the SAME source is template text (nav
    * chrome, legal footers, mirror headers), and each document's
    * boilerplate fraction is the share of its gram occurrences that
    * are template grams. Deliberately WITHIN-source df (the per-domain
    * semantics of production boilerplate removal) — the cross-corpus
    * twin of this signal is x68's substring dedup, and the within-DOC
    * twin is x30/x51's repetition ratio; the three are disjoint axes.
    * Documents shorter than the gram (n_grams = 0) carry no evidence
    * and are excluded by contract.
    *
    * 100 TB shape: one corpus scan explodes grams; every shuffle is
    * keyed on (source, gram) and partial-agg'd — df is an aggregate of
    * the per-doc aggregate (never a distinct over raw occurrences),
    * the df table joins back on the same key it was built on, and the
    * final rollups are per-doc then per-source. Gram fan-out is
    * O(words); at the full corpus the (source, gram) key space is what
    * a domain-sharded pipeline partitions by anyway. */
  /** All word n-grams of the `ws` array column as strings — shared by
    * the boilerplate (x194) and Good–Turing (x200) passes. */
  private def wordGramList(n: Int): Column =
    expr(s"transform(sequence(1, size(ws) - ${n - 1}), " +
      s"i -> array_join(slice(ws, i, $n), ' '))")

  def boilerplateGrams(spark: SparkSession, dir: String, n: Int = BoilerN,
                       dfAt: Int = BoilerDfAt): DataFrame = {
    // reads the STAGED gram table ([[GramStage]]) — the corpus explode
    // is paid once per snapshot and shared with x200/x201
    val occ = GramStage.gramOcc(spark, dir, n)
      .select(col("source"), col("gram"), col("doc_id"), col("cnt"))
    val gramDf = occ.groupBy(col("source"), col("gram"))
      .agg(count(lit(1)).as("df"))
    val perDoc = occ.join(gramDf, Seq("source", "gram"))
      .groupBy(col("source"), col("doc_id"))
      .agg(sum(col("cnt")).as("n_grams"),
        sum(when(col("df") >= dfAt, col("cnt")).otherwise(0L)).as("n_boiler"))
      .withColumn("doc_ppm", expr("(1000000L * n_boiler) div n_grams"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_grams")).as("total_grams"),
        sum(col("n_boiler")).as("boiler_grams"),
        sum(when(col("doc_ppm") >= BoilerFlagPpm, 1L).otherwise(0L))
          .as("n_flagged"))
      .withColumn("boiler_ppm",
        expr("(1000000L * boiler_grams) div total_grams"))
  }

  /** x217 knobs: per-label list depth and the minimum supporting doc
    * count — shared with the DuckDB oracle. */
  val LabelTermTopK: Int = 5
  val LabelTermMinDocs: Long = 5L

  /** Label-conditioned term lift (x217): for each embedding-cluster
    * label, the terms most over-represented in that label's documents —
    * supervised feature selection across the text/vector boundary (the
    * doc↔vector id alignment x216 audits is what makes the join
    * legal). Lift = P(term|label)/P(term) as the exact integer ppm
    * rational O·N / (rowSum·colSum) over document-presence counts (the
    * χ²-table moments of x160, ranked instead of tested); ties break
    * on the term. Per-label top-k with a minimum-support floor.
    *
    * 100 TB shape: presence rows come from the STAGED doc-term table
    * ([[TermStage]]); the label join keys on doc_id; the (label, term)
    * aggregate is one partial-agg'd shuffle and every marginal is a
    * rollup of it (never a second corpus scan); the rank window
    * partitions by the label key over O(vocab) rows. */
  def labelTermLift(spark: SparkSession, dir: String,
                    topK: Int = LabelTermTopK,
                    minDocs: Long = LabelTermMinDocs): DataFrame = {
    val labels = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("doc_id"), col("label"))
    val o = TermStage.docTermFreq(spark, dir).select(col("doc_id"), col("term"))
      .join(labels, Seq("doc_id"))
      .groupBy(col("label"), col("term")).agg(count(lit(1)).as("o"))
      .localCheckpoint() // read by the score and the per-term marginal
    val colSum = o.groupBy(col("term")).agg(sum(col("o")).as("df"))
    val rowSum = labels.groupBy(col("label")).agg(count(lit(1)).as("n_label"))
    val n = labels.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("label"))
      .orderBy(col("lift_ppm").desc, col("term"))
    o.join(broadcast(colSum), Seq("term"))
      .join(broadcast(rowSum), Seq("label"))
      .crossJoin(broadcast(n))
      .filter(col("o") >= minDocs)
      .withColumn("lift_ppm",
        expr("(1000000L * o * n_docs) div (n_label * df)"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("label"), col("rank"), col("term"), col("o"), col("df"),
        col("n_label"), col("n_docs"), col("lift_ppm"))
  }

  /** Duplication–quality interaction (x219): per near-dup-cluster size
    * band, the quality-score profile of member documents — the
    * curation question behind "dedup first or filter first" (if
    * heavily-duplicated docs score systematically lower, dedup order
    * changes what survives the quality gate). Pure COMPOSITION of two
    * staged/shared artifacts: cluster labels from [[ClusterStage]]
    * (x17's snapshot table) and x89's pinned integer score — so the
    * interaction panel can never disagree with either source query.
    * Mean is the one-IEEE-division double (sums can be negative, so no
    * integer div — the x117 negative-div trap). */
  def dupeQuality(spark: SparkSession, dir: String): DataFrame = {
    val clusters = ClusterStage.clusters(spark, dir)
    val sizes = clusters.groupBy(col("canonical_id")).agg(count(lit(1)).as("sz"))
    clusters.join(sizes, Seq("canonical_id"))
      .join(qualityScorePinned(spark, dir)
        .select(col("doc_id"), col("score_micro")), Seq("doc_id"))
      .withColumn("size_band",
        when(col("sz") === 1, "1").when(col("sz") === 2, "2")
          .when(col("sz") <= 4, "3-4").otherwise("5+"))
      .groupBy(col("size_band"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("canonical_id")).as("n_clusters"),
        sum(col("score_micro")).as("sum_score_micro"),
        min(col("score_micro")).as("min_score_micro"),
        max(col("score_micro")).as("max_score_micro"))
      .withColumn("mean_score",
        col("sum_score_micro").cast("double") / col("n_docs"))
  }

  /** Good–Turing gram length / published spectrum depth for
    * [[goodTuringGrams]] (x200) — shared with the DuckDB oracle. */
  val GtN: Int = 5
  val GtMaxR: Int = 5

  /** Good–Turing frequency spectrum over word 5-grams (x200): N_r (how
    * many distinct grams occur exactly r times) for r = 1..5, with the
    * GT-adjusted count r* = (r+1)·N_{r+1}/N_r published as the raw
    * rational plus its one-IEEE-division double — the novel-ngram-mass
    * estimate (P₀ = N₁/total) that tells an LM-data pipeline how much
    * unseen text its corpus still implies, and the smoothing table
    * every count-based LM/quality model starts from. 5-grams, not
    * unigrams: the corpus vocabulary is closed (31 words) so only the
    * gram space has the long rare tail Good–Turing models.
    *
    * 100 TB shape: one corpus scan explodes grams into a partial-agg'd
    * (gram → r) groupBy, then the spectrum is an O(distinct r) rollup
    * — the published frame is 5 rows joined against two broadcast
    * copies of the tiny spectrum plus the 1-row totals (documented
    * scalar cross). */
  def goodTuringGrams(spark: SparkSession, dir: String, n: Int = GtN): DataFrame = {
    // corpus gram frequency folded from the STAGED per-doc counts
    // ([[GramStage]]) — an O(distinct grams) rollup, no corpus explode
    val spec = GramStage.gramOcc(spark, dir, n)
      .groupBy(col("gram")).agg(sum(col("cnt")).as("r"))
      .groupBy(col("r")).agg(count(lit(1)).as("n_r"))
      .localCheckpoint() // three readers: both spectrum joins + totals
    val totals = spec.agg(sum(col("r") * col("n_r")).as("total_grams"),
      sum(col("n_r")).as("distinct_grams"))
    spark.range(1L, GtMaxR + 1L).select(col("id").as("r"))
      .join(broadcast(spec), Seq("r"), "left")
      .withColumn("n_r", coalesce(col("n_r"), lit(0L)))
      .join(broadcast(spec.select((col("r") - 1).as("r"), col("n_r").as("n_r1"))),
        Seq("r"), "left")
      .withColumn("n_r1", coalesce(col("n_r1"), lit(0L)))
      .crossJoin(broadcast(totals))
      .select(col("r"), col("n_r"), col("n_r1"),
        ((col("r") + 1) * col("n_r1")).as("gt_num"), col("n_r").as("gt_den"),
        when(col("n_r") > 0,
          ((col("r") + 1) * col("n_r1")).cast("double") / col("n_r"))
          .as("gt_smoothed_r"),
        col("total_grams"), col("distinct_grams"))
  }

  /** x262 knobs: the published-bigram count floor (rare bigrams carry
    * no usable signal — x103's convention) and the absolute-discount
    * rational d = [[KnDiscountNum]]/[[KnDiscountDen]] = 3/4, the
    * classic Kneser–Ney constant. Shared with the oracle. */
  val KnMinCount: Long = PmiMinCount
  val KnDiscountNum: Long = 3L
  val KnDiscountDen: Long = 4L

  /** Interpolated Kneser–Ney bigram model (x262): for every corpus
    * bigram with count ≥ `minCount`, the smoothed conditional
    * probability
    * `P(w2|w1) = (c(w1w2) − d)/c(w1·) + d·N1+(w1,·)/c(w1·) · N1+(·,w2)/N1+(·,·)`
    * — THE standard LM smoothing (continuation counts, not raw
    * frequency, for the backoff mass), published as the exact rational
    * `p_num/p_den` over the common denominator `den·c(w1·)·N1+(·,·)`
    * plus its one-IEEE-division double. x94 scores with the unsmoothed
    * MLE `c2/c1`; this is the properly-smoothed model a CCNet/KenLM-
    * style quality filter actually trains. (For a SEEN bigram
    * `c − d > 0` always since d < 1, so the max(·,0) clamp of the
    * textbook form never binds on published rows.)
    *
    * 100 TB shape: everything folds from the STAGED per-(doc, bigram)
    * table ([[bigramOcc]] — corpus tokenized once per snapshot): the
    * model is one partial-agg'd rollup (vocab²-bounded), the context/
    * continuation tables are rollups OF the model, and the output is
    * two equi-joins on the word keys plus the 1-row total broadcast.
    * Hot-word skew on the w1/w2 joins is AQE skew-join territory, same
    * note as x49/x94. */
  def kneserNeyBigrams(spark: SparkSession, dir: String,
                       minCount: Long = KnMinCount): DataFrame = {
    val model = bigramOcc(spark, dir)
      .groupBy(col("bigram")).agg(sum(col("cnt")).as("a"))
      .select(split(col("bigram"), " ", 2)(0).as("w1"),
        split(col("bigram"), " ", 2)(1).as("w2"), col("a"))
      .localCheckpoint() // four readers: contexts, continuations, total, output
    val contexts = model.groupBy(col("w1"))
      .agg(sum(col("a")).as("cu"), count(lit(1)).as("n1u"))
    val conts = model.groupBy(col("w2")).agg(count(lit(1)).as("nw"))
    val total = model.agg(count(lit(1)).as("nn"))
    val (dn, dd) = (KnDiscountNum, KnDiscountDen)
    // p_num/p_den must stay exactly representable for the one-IEEE-op
    // double (both < 2^53) — x73's guard discipline
    val guard = (col("p_num") >= lit(1L << 53)) || (col("p_den") >= lit(1L << 53))
    model.filter(col("a") >= minCount)
      .join(contexts, Seq("w1")).join(conts, Seq("w2"))
      .crossJoin(broadcast(total))
      .withColumn("p_num",
        (lit(dd) * col("a") - lit(dn)) * col("nn") +
          lit(dn) * col("n1u") * col("nw"))
      .withColumn("p_den", lit(dd) * col("cu") * col("nn"))
      .withColumn("kn_dbl",
        when(guard, raise_error(lit("KN rational exceeds 2^53: quantize " +
          "the continuation counts (Scaladoc) before the double publish")))
          .otherwise(col("p_num").cast("double") / col("p_den").cast("double")))
      .select(col("w1"), col("w2"), col("a"), col("cu"), col("n1u"),
        col("nw"), col("nn"), col("p_num"), col("p_den"), col("kn_dbl"))
  }

  /** Interpolated Kneser–Ney TRIGRAM model (x265): the full textbook
    * recursion on top of x262 —
    * `P(w3|w1w2) = (c(w1w2w3) − d)/c(w1w2·) + d·N1+(w1w2,·)/c(w1w2·) · P'(w3|w2)`
    * where the MIDDLE level uses CONTINUATION counts, not raw counts
    * (`a2' = N1+(·w2w3)` distinct left-contexts of the bigram — the
    * Kneser–Ney insight applied at every backoff level), and the bottom
    * level is x262's unigram-continuation `N1+(·w3)/N1+(··)` over
    * bigram types. Published as the exact rational over the common
    * denominator `d⁴·c(w1w2·)·N1+(·w2·)·N1+(··)` plus the one-IEEE-
    * division double — the 3-gram LM a KenLM-style quality scorer
    * estimates, as a distributed plan.
    *
    * 100 TB shape: trigram and bigram model tables both fold from
    * STAGED per-doc gram tables ([[GramStage]] n = 3 / n = 2, corpus
    * tokenized once per snapshot per n); every derived table (context
    * totals, continuation counts) is a rollup OF the model tables
    * (vocab³-bounded), and the output is equi-joins on word keys plus
    * the 1-row bigram-type total broadcast. */
  def kneserNeyTrigrams(spark: SparkSession, dir: String,
                        minCount: Long = KnMinCount): DataFrame = {
    val tri = GramStage.gramOcc(spark, dir, 3)
      .groupBy(col("gram")).agg(sum(col("cnt")).as("c3"))
      .select(split(col("gram"), " ", 3)(0).as("w1"),
        split(col("gram"), " ", 3)(1).as("w2"),
        split(col("gram"), " ", 3)(2).as("w3"), col("c3"))
      .localCheckpoint() // four readers: contexts, both continuation rollups, output
    val ctx12 = tri.groupBy(col("w1"), col("w2"))
      .agg(sum(col("c3")).as("c12"), count(lit(1)).as("n1u12"))
    // middle level: per (w2, w3) the distinct-left-context count is the
    // trigram-TYPE count (tri is one row per type already)
    val a2p = tri.groupBy(col("w2"), col("w3"))
      .agg(count(lit(1)).as("a2p"))
      .localCheckpoint() // read by mid rollup AND the output join
    val mid = a2p.groupBy(col("w2"))
      .agg(sum(col("a2p")).as("cu2p"), count(lit(1)).as("n1u2p"))
    // bottom level: x262's continuation table over bigram TYPES
    val biTypes = bigramOcc(spark, dir).select(col("bigram")).distinct()
      .select(split(col("bigram"), " ", 2)(1).as("w3"))
    val nwT = biTypes.groupBy(col("w3")).agg(count(lit(1)).as("nw"))
    val totBi = biTypes.agg(count(lit(1)).as("nn"))
    val (dn, dd) = (KnDiscountNum, KnDiscountDen)
    val guard = (col("p_num") >= lit(1L << 53)) || (col("p_den") >= lit(1L << 53))
    tri.filter(col("c3") >= minCount)
      .join(ctx12, Seq("w1", "w2")).join(a2p, Seq("w2", "w3"))
      .join(mid, Seq("w2")).join(nwT, Seq("w3"))
      .crossJoin(broadcast(totBi))
      .withColumn("p_num",
        (lit(dd) * col("c3") - lit(dn)) * lit(dd) * col("cu2p") * col("nn") +
          lit(dn) * col("n1u12") *
            ((lit(dd) * col("a2p") - lit(dn)) * col("nn") +
              lit(dn) * col("n1u2p") * col("nw")))
      .withColumn("p_den",
        lit(dd) * lit(dd) * col("c12") * col("cu2p") * col("nn"))
      .withColumn("kn_dbl",
        when(guard, raise_error(lit("KN trigram rational exceeds 2^53: " +
          "quantize the continuation counts (Scaladoc)")))
          .otherwise(col("p_num").cast("double") / col("p_den").cast("double")))
      .select(col("w1"), col("w2"), col("w3"), col("c3"), col("c12"),
        col("n1u12"), col("a2p"), col("cu2p"), col("n1u2p"), col("nw"),
        col("nn"), col("p_num"), col("p_den"), col("kn_dbl"))
  }

  /** Inter-filter agreement (x270): Cohen's kappa between the engine's
    * two independent keep/drop quality filters — x67's repetition gate
    * ([[repetitionKeep]]) and x40's heuristic quality label
    * ([[qualityFeatures]]) — per source, as the exact integer rational
    * `κ = (N·(n11+n00) − Σ marginal products) / (N² − Σ marginal
    * products)` plus its one-IEEE-division double (NULL when the
    * marginals are degenerate and κ is undefined). Raw percent
    * agreement overstates consensus when both filters keep almost
    * everything; kappa is the chance-corrected number a pipeline reads
    * before treating two filters as redundant (retire one) vs
    * complementary (keep both).
    *
    * 100 TB shape: both decisions are projections of one corpus scan
    * (the x40 side re-reads the shared feature derivation so the
    * definitions cannot drift), one equi-join on doc_id, one partial-
    * agg'd rollup to O(sources). */
  def filterKappa(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.documents(spark, dir).select(col("doc_id"), col("source"),
      repetitionKeep(col("text")).cast("long").as("a"))
    val b = qualityFeatures(spark, dir)
      .select(col("doc_id"), col("label").cast("long").as("b"))
    val c = a.join(b, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("a") * col("b")).as("n11"),
        sum(col("a") * (lit(1L) - col("b"))).as("n10"),
        sum((lit(1L) - col("a")) * col("b")).as("n01"),
        sum((lit(1L) - col("a")) * (lit(1L) - col("b"))).as("n00"))
    // N² must stay exactly representable for the one-IEEE-op double
    val pe = (col("n11") + col("n10")) * (col("n11") + col("n01")) +
      (col("n01") + col("n00")) * (col("n10") + col("n00"))
    c.withColumn("kappa_num",
        when(col("n") >= lit(94906265L), // floor(sqrt(2^53))
          raise_error(lit("kappa N² would exceed 2^53: sample per source " +
            "before the rational publish")))
          .otherwise(col("n") * (col("n11") + col("n00")) - pe))
      .withColumn("kappa_den", col("n") * col("n") - pe)
      .withColumn("kappa_dbl",
        when(col("kappa_den") === 0L, lit(null).cast("double"))
          .otherwise(col("kappa_num").cast("double") / col("kappa_den").cast("double")))
      .select(col("source"), col("n"), col("n11"), col("n10"), col("n01"),
        col("n00"), col("kappa_num"), col("kappa_den"), col("kappa_dbl"))
  }

  /** Smoothed per-document fluency (x264): x94's score with the
    * [[kneserNeyBigrams]] model in place of the raw MLE — per document,
    * the tf-weighted mean of the SMOOTHED conditional bigram
    * probability, in fixed-point ppm (`(10⁶·p_num) div p_den` per
    * bigram, then the integer fold — FP sums would be addition-order-
    * dependent cross-engine; integer points are the x94 discipline).
    * The smoothed scorer no longer zeroes a document for one rare
    * continuation — the reason LM quality filters smooth at all.
    * Empty/one-word docs get (0, 0), x94's rule.
    *
    * 100 TB shape: the model side is x262's (all rollups of the staged
    * bigram table, minCount = 1 so every seen bigram scores); the doc
    * side re-reads the same stage and equi-joins on the bigram key —
    * same shuffle shape as x94, hot-bigram skew same AQE note. */
  def knFluency(spark: SparkSession, dir: String): DataFrame = {
    val model = kneserNeyBigrams(spark, dir, minCount = 1L)
      .select(concat(col("w1"), lit(" "), col("w2")).as("bigram"),
        when(col("p_num") > lit(Long.MaxValue / 1000000L),
          raise_error(lit("KN ppm numerator would exceed Long: quantize " +
            "p_num/p_den first (x73's guard discipline)")))
          .otherwise(expr("(1000000L * p_num) div p_den")).as("kn_ppm"))
    val scored = bigramOcc(spark, dir).join(model, Seq("bigram"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        sum(col("cnt") * col("kn_ppm")).as("sp"))
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(expr("sp div n_bigrams"), lit(0L)).as("kn_fluency_ppm"))
  }
}
