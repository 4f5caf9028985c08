package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic sampling / splitting / distribution-stats operators — the
  * dataset-assembly half of a training-data pipeline (train/eval splits,
  * per-stratum mixing rates, corpus shape stats).
  *
  * All randomness is md5-hash-derived (`Dedup.md5Hash60` on a salted key),
  * NOT `rand()`: assignments are a pure function of the row key, so they
  * are reproducible run-to-run, stable under repartitioning/retries (a
  * `rand()` sample changes under task re-execution — a silent eval-set leak
  * at 100 TB), portable cross-engine (the DuckDB oracles replicate them
  * exactly), and need no shuffle — every operator here is a per-row
  * projection/filter until the final aggregate, so cost is one linear scan.
  */
object Sampling {

  /** x46's default per-source cap — shared with the oracle SQL in
    * `SparkEntry` (same query/oracle single-source pattern as
    * `Dedup.NearDupPlanes`). */
  val DefaultSourceCap: Int = 20

  /** md5-60 hash-space size (2⁶⁰) as a BIGINT, shared with x48's oracle.
    * A power of two: multiplying a double rate by it only shifts the
    * exponent, so `rate * HashSpace` is EXACT, and `floor` of it is the
    * engine-neutral acceptance threshold. */
  val HashSpace: Long = 1L << 60

  /** x50's sampled-trim knobs — sample size and the kept percentile band,
    * shared with the oracle SQL. */
  val TrimSampleK: Int = 64
  val TrimLoPct: Int = 10
  val TrimHiPct: Int = 90

  /** Uniform bucket in [0, buckets) from the salted md5 hash of a key —
    * the primitive under splits and sampling. The salt isolates use-sites:
    * a doc's split bucket and sample bucket are independent. */
  def hashBucket(key: Column, salt: String, buckets: Int = 10000): Column =
    pmod(Dedup.md5Hash60(concat(lit(salt + ":"), key.cast("string"))), lit(buckets.toLong))

  /** train/valid/test label from a [0, 100) hash bucket — shared by
    * `trainTestSplit` (x27) and `assemblyFunnel` (x35) so the two can
    * never diverge on the split rule. */
  def splitLabel(bucket: Column, trainPct: Int = 80, validPct: Int = 10): Column =
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + validPct, "valid")
      .otherwise("test")

  /** Deterministic train/valid/test split: 80/10/10 by hash bucket of
    * doc_id. The split is stable under any reordering, partitioning, or
    * incremental re-run — the property that keeps eval sets leak-free. */
  def trainTestSplit(spark: SparkSession, dir: String,
                     trainPct: Int = 80, validPct: Int = 10): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"), col("source"), col("lang"),
      splitLabel(hashBucket(col("doc_id"), "split", 100), trainPct, validPct).as("split"))

  /** Stratified deterministic sampling: per-language keep-rates (the
    * data-mixing knob of an LLM pipeline — up-sample rare strata, down-
    * sample dominant ones), applied as hash-bucket thresholds so the chosen
    * subset is a stable function of doc_id. Rates are in basis points of
    * 10000 to stay in exact integer arithmetic. */
  def stratifiedSample(spark: SparkSession, dir: String,
                       rates: Map[String, Int] = Map("en" -> 5000, "zh" -> 10000),
                       defaultRate: Int = 2500): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col("lang") === k, lit(v)).otherwise(acc)
    }
    Tables.documents(spark, dir)
      .filter(hashBucket(col("doc_id"), "sample") < rate)
      .select(col("doc_id"), col("lang"), col("source"))
  }

  /** End-to-end training-set assembly funnel — the composition a real LLM
    * data pipeline runs, built entirely from this library's operators:
    * exact dedup (md5 canonical, keep min doc_id) → quality gate (length
    * floor + Gopher-style 3-gram repetition cap) → deterministic
    * train/valid/test split → per-split corpus accounting. Every stage is
    * deterministic, so the WHOLE funnel is oracle-checked (x35). Shuffles:
    * one for the dedup group-by, one for the final split aggregate — the
    * quality gate and split assignment are projection/filter stages in
    * between, fused into the same scan pass. */
  def assemblyFunnel(spark: SparkSession, dir: String, minWords: Int = 20,
                     maxDupRatio: Double = 0.2): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val canonical = docs
      .groupBy(md5(col("text")).as("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val (total3, distinct3) = TextAnalysis.ngramCounts(3) // same gate as x30
    val gated = docs.join(canonical, Seq("doc_id"))
      .withColumn("n_words", size(split(col("text"), " ")))
      .withColumn("total_3grams", total3)
      .filter(col("n_words") >= minWords && col("total_3grams") > 0)
      .withColumn("dup_ratio", (col("total_3grams") - distinct3) / col("total_3grams"))
      .filter(col("dup_ratio") < maxDupRatio)
    gated
      .withColumn("split", splitLabel(hashBucket(col("doc_id"), "split", 100))) // same rule as x27
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("sum_words"),
        countDistinct(col("source")).as("n_sources"))
  }

  /** Cluster-debiased sampling: sample each near-duplicate cluster (x17's
    * connected components) at rate ∝ 1/cluster_size, so duplicated content
    * contributes ~one expected document regardless of how many near-copies
    * exist — the dedup-aware reweighting step between clustering and
    * training-set assembly. Keep rule is the deterministic md5 bucket vs
    * `10000 div cluster_size` basis points (integer division, engine-
    * exact); singletons are kept with certainty. Output: per cluster_size,
    * total vs kept doc counts. */
  def clusterDebiasedSample(spark: SparkSession, dir: String, n: Int = 5,
                            threshold: Double = 0.3): DataFrame =
    clusterDebiasedSample(ClusterStage.clusters(spark, dir, n, threshold))

  /** Composable form of x38: debiased sampling over an ALREADY-COMPUTED
    * cluster assignment (doc_id, canonical_id) — x17's output, or any other
    * entity-resolution labeling. A real pipeline runs the (expensive)
    * Jaccard join + connected components ONCE and feeds the cached result
    * to both the cluster report and this sampler; the standalone overload
    * above recomputes it only because the query contract is
    * (spark, dir) ⇒ DataFrame. Proven equivalent to the standalone form in
    * SamplingSpec. */
  def clusterDebiasedSample(clusters: DataFrame): DataFrame = {
    val sizes = clusters.groupBy(col("canonical_id")).agg(count(lit(1)).as("cluster_size"))
    clusters.join(sizes, Seq("canonical_id"))
      .withColumn("kept",
        (hashBucket(col("doc_id"), "cds") < expr("10000 div cluster_size")).cast("int"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_docs_total"), sum(col("kept")).as("n_docs_kept"))
  }

  /** Exclusive prefix sum over (key, v) rows without EVER running a global
    * single-task window over more than `maxWindowRows` rows: returns
    * (key, offset) with offset = Σ v over all strictly-smaller keys.
    *
    * Structure: if the level fits in `maxWindowRows`, one ordered window
    * finishes it. Otherwise keys are grouped into `fanout`-sized ranges
    * (`key div fanout`), the range totals are prefix-summed by RECURSION on
    * the same rule, and each row gets its range's offset plus a local
    * cumsum — a window partitioned by range, so no task sees more than
    * `fanout` rows. Every level shrinks the row count by `fanout`×, so
    * depth is ⌈log_fanout(n)⌉ (3 levels for 10⁹ keys at fanout 1000) and
    * the sizing decision at each level is one count() over an
    * already-localCheckpoint'ed (materialized, tiny) aggregate — at 100 B
    * docs / bucketSize 1000 the old single-level formulation would have
    * funneled a 100 M-row bucket-prefix window through ONE task; this
    * recursion caps every ordered window at max(maxWindowRows, fanout). */
  private[graft] def exclusivePrefixSum(level: DataFrame, fanout: Long = 1000L,
                                        maxWindowRows: Long = 1000000L): DataFrame = {
    require(fanout > 1, s"fanout must shrink each level, got $fanout")
    val snapped = level.toDF("key", "v").localCheckpoint()
    if (snapped.count() <= maxWindowRows) {
      snapped.withColumn("offset",
        coalesce(sum(col("v")).over(
          Window.orderBy(col("key")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("key"), col("offset"))
    } else {
      val bucketed = snapped.withColumn("b", expr(s"key div $fanout"))
      val upper = exclusivePrefixSum(
        bucketed.groupBy(col("b")).agg(sum(col("v")).as("v"))
          .select(col("b").as("key"), col("v")),
        fanout, maxWindowRows)
      val localW = Window.partitionBy(col("b")).orderBy(col("key"))
        .rowsBetween(Window.unboundedPreceding, -1)
      bucketed
        .join(upper.select(col("key").as("b"), col("offset").as("b_off")), Seq("b"))
        .withColumn("offset", coalesce(sum(col("v")).over(localW), lit(0L)) + col("b_off"))
        .select(col("key"), col("offset"))
    }
  }

  /** Greedy sequential sequence packing: assign documents (in doc_id
    * order) to fixed token-budget training bins — bin = how many full
    * budgets precede the document's first token. The global running token
    * count is computed with a SCALE-SAFE multi-level prefix sum: per-bucket
    * partial sums (one small aggregate), an `exclusivePrefixSum` over the
    * bucket totals (which RECURSES the same bucketing if even the bucket
    * level exceeds `maxWindowRows` — no single-task window at any input
    * size), and a partition-parallel local cumsum within each bucket offset
    * by its bucket's prefix. The naive formulation — a global `sum over
    * (ORDER BY doc_id)` window — funnels every row through ONE task; this
    * shape keeps the row-level pass fully parallel and is proven equal to
    * the naive window in the spec (including a forced-recursion case). */
  /** Doc-level bin assignment under x37's packing rule — the frame
    * `packSequences` aggregates, exposed for the terminal write stage
    * ([[writePackedShards]]). Narrow on purpose: only (doc_id, n_tokens,
    * bin_id) ever ride the pack's shuffles; the payload joins in later. */
  private[graft] def packedDocAssignments(spark: SparkSession, dir: String,
                                          budgetTokens: Long = 512,
                                          bucketSize: Long = 1000,
                                          maxWindowRows: Long = 1000000L): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("bkt", expr(s"doc_id div $bucketSize"))
    val bucketPrefix = exclusivePrefixSum(
      toks.groupBy(col("bkt")).agg(sum(col("n_tokens")).as("v"))
        .select(col("bkt").as("key"), col("v")),
      bucketSize, maxWindowRows)
      .select(col("key").as("bkt"), col("offset").as("bkt_offset"))
    val local = Window.partitionBy(col("bkt")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks.join(bucketPrefix, Seq("bkt"))
      .withColumn("tokens_before",
        coalesce(sum(col("n_tokens")).over(local), lit(0L)) + col("bkt_offset"))
      .withColumn("bin_id", expr(s"tokens_before div $budgetTokens"))
      .select(col("doc_id"), col("n_tokens"), col("bin_id"))
  }

  def packSequences(spark: SparkSession, dir: String, budgetTokens: Long = 512,
                    bucketSize: Long = 1000,
                    maxWindowRows: Long = 1000000L): DataFrame =
    packedDocAssignments(spark, dir, budgetTokens, bucketSize, maxWindowRows)
      .groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))

  /** Packed-shard materialization — the terminal write stage of the
    * assembly funnel: x37's bins become a deterministic partitioned
    * parquet layout (`shard_id=.../part-*.parquet`, rows sorted by
    * (bin_id, doc_id) within every file), the artifact a training job
    * actually reads. shard → rows is a pure function of the corpus
    * (bin_id from the pack, shard = bin div binsPerShard), so reruns and
    * task retries produce the same layout.
    *
    * Scale shape — the payload crosses exactly TWO exchanges, both
    * mandatory: (1) the doc_id equi-join that attaches text to the
    * NARROW pack output (uniform key; the pack's own shuffles carry only
    * (doc_id, n_tokens) — x02's two-linear-pass trade vs hauling text
    * through the pack's bucket window), and (2) one
    * `repartitionByRange(shard_id, bin_id, doc_id)` that clusters rows
    * into shard order for the write. (2) is what makes `partitionBy` NOT
    * fragment: bins are monotone in doc_id, so a range task covers a
    * contiguous bin span and each shard directory receives at most two
    * files (boundary tasks) instead of one file per (task × shard) — at
    * 10⁵ tasks the difference between a readable dataset and a
    * small-file explosion. Asserted in SamplingSpec: ≤ 2 files per shard
    * dir, exactly one range exchange, and token conservation via
    * `Quality.packedShards`. */
  def writePackedShards(spark: SparkSession, dir: String, outPath: String,
                        budgetTokens: Long = 512, binsPerShard: Long = 8,
                        bucketSize: Long = 1000,
                        maxWindowRows: Long = 1000000L): DataFrame = {
    val packed = packedShardRows(spark, dir, budgetTokens, binsPerShard,
      bucketSize, maxWindowRows)
    packed.write.mode("overwrite").partitionBy("shard_id").parquet(outPath)
    spark.read.parquet(outPath)
  }

  /** The frame `writePackedShards` materializes, exposed so the spec can
    * assert the write-side PLAN (exchange census) as well as the files. */
  private[graft] def packedShardRows(spark: SparkSession, dir: String,
                                     budgetTokens: Long, binsPerShard: Long,
                                     bucketSize: Long,
                                     maxWindowRows: Long): DataFrame = {
    val assign = packedDocAssignments(spark, dir, budgetTokens, bucketSize, maxWindowRows)
      .withColumn("shard_id", expr(s"bin_id div $binsPerShard"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .join(assign, Seq("doc_id"))
      .repartitionByRange(col("shard_id"), col("bin_id"), col("doc_id"))
      .sortWithinPartitions(col("shard_id"), col("bin_id"), col("doc_id"))
  }

  /** Sharded-read training-order audit (x71): materialize x37's packed
    * shard layout (`writePackedShards`) and recompute the bin table FROM
    * THE FILES — proving the terminal artifact a training job reads
    * carries exactly the pack's bin structure (doc membership, token
    * totals, bin boundaries) through the partitioned write and back:
    * the read-side twin of SamplingSpec's ≤2-files-per-shard write
    * assertions. The oracle is x37's bin-table SQL verbatim, so
    * layout → read → aggregate must equal the pack computed directly
    * from the corpus. The layout lands in a dir-keyed scratch path,
    * overwritten per run — the query output stays a pure function of
    * the input tables. */
  def shardReadAudit(spark: SparkSession, dir: String, budgetTokens: Long = 512,
                     binsPerShard: Long = 8): DataFrame = {
    val scratch = System.getProperty("java.io.tmpdir") +
      "/graft-shard-audit-" + dir.replaceAll("[^A-Za-z0-9.]", "_")
    val files = writePackedShards(spark, dir, scratch, budgetTokens, binsPerShard)
    files.groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
  }

  /** Per-source document cap (x46): keep at most `cap` documents per
    * source, chosen deterministically as the `cap` smallest salted md5-60
    * hashes — the source-balancing step that stops a dominant crawl from
    * swamping the training mix, with the same retry/rerun stability
    * guarantees as every other sampler here (pure function of doc_id).
    *
    * The 100 TB shape is the interesting part: the naive formulation —
    * `row_number() OVER (PARTITION BY source ORDER BY hash) <= cap` —
    * shuffles and SORTS the whole corpus with the hottest source
    * concentrated in one task. Instead, phase 1 computes each source's
    * cap-th smallest hash with the mergeable O(cap) KMV sketch
    * (`functions.KmvSketch` — map-side combine collapses a billion-doc
    * source to one sketch per mapper), and phase 2 broadcasts the tiny
    * per-source threshold table and keeps rows with hash ≤ threshold —
    * the corpus itself is never shuffled or sorted (plan-asserted in
    * SamplingSpec). The sketch keys on the PAIR (h, doc_id)
    * (`functions.KmvPairSketch`), so even a 60-bit md5 collision between
    * two docs of one source selects exactly the `cap` rows of the
    * window-formulation oracle's ORDER BY h, doc_id — fully deterministic,
    * not merely collision-improbable. Sources with fewer than `cap` docs
    * are kept whole (`n_kept < cap`). */
  def sourceCapSample(spark: SparkSession, dir: String,
                      cap: Int = DefaultSourceCap): DataFrame =
    sourceCapSample(
      Tables.documents(spark, dir).select(col("doc_id"), col("source"), col("lang")),
      cap)
      .select(col("doc_id"), col("source"), col("lang"))

  /** Composable form of x46 (x57's pattern): the per-source KMV cap over
    * ANY frame with (doc_id, source) columns — the ship-corpus assembly
    * (x69) caps the post-filter survivor set, not the raw table. All
    * other columns pass through; the selected rows are the same pure
    * function of (doc_id, source) regardless of what upstream produced
    * them. */
  def sourceCapSample(docs: DataFrame, cap: Int): DataFrame = {
    import graft.functions.KmvPairSketch.kmv_pair_sketch
    val withH = docs.withColumn("h",
      Dedup.md5Hash60(concat(lit("cap:"), col("doc_id").cast("string"))))
    val thresholds = withH.groupBy(col("source"))
      .agg(kmv_pair_sketch(col("h"), col("doc_id"), cap).as("sk"))
      .select(col("source"), col("sk.n_kept").as("n_kept"),
        col("sk.kth_hash").as("kth"), col("sk.kth_tie").as("kth_tie"))
    withH.join(broadcast(thresholds), Seq("source"))
      .filter(col("n_kept") < cap || col("h") < col("kth") ||
        (col("h") === col("kth") && col("doc_id") <= col("kth_tie")))
      .drop("h", "n_kept", "kth", "kth_tie")
  }

  /** Sample-based per-language quantile estimation via the bottom-k
    * hash-priority sample (`functions.KmvValueSample`): each group keeps
    * only the n_chars values of its k smallest-hashed docs (O(k) state,
    * map-side mergeable, deterministic), and quantiles are picked from the
    * sorted sample. The bounded-state twin of `lengthQuantiles` (x29),
    * which must shuffle every row for exact order statistics — this is the
    * shape quantile estimation takes at 100 TB, and because the sample is
    * a pure function of md5-60 hashes, x36's oracle replicates it
    * exactly. */
  def sampledQuantiles(spark: SparkSession, dir: String, k: Int = 64): DataFrame = {
    import graft.functions.KmvValueSample.kmv_value_sample
    val h = Dedup.md5Hash60(concat(lit("q:"), col("doc_id").cast("string")))
    val agg = Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(kmv_value_sample(h, col("n_chars"), k).as("vals"))
    def pick(q: Int): Column =
      element_at(col("vals"), ceil(size(col("vals")) * q / 100).cast("int"))
    agg.select(col("lang"), size(col("vals")).as("n_sample"),
      pick(50).as("q50_sampled"), pick(90).as("q90_sampled"))
  }

  /** Temperature-flattened language mixture (x48): downsample each
    * language stratum to rate √(n_min/n_lang) — the α=0.5 point of the
    * nᵅ temperature-mixing family used to stop a dominant language (or
    * source) from swamping a training mix, anchored so the smallest
    * stratum is kept whole. Acceptance is the salted md5-60 hash against
    * a per-stratum threshold: a pure function of doc_id (retry/rerun
    * stable, no `rand()`), so the DuckDB oracle replicates the sampled
    * set EXACTLY.
    *
    * Cross-engine float discipline: the rate is one exact division and
    * one `sqrt` (correctly rounded per IEEE 754, unlike `pow` — the
    * reason α is 0.5 and not a free knob in the oracle-checked surface);
    * scaling by 2⁶⁰ shifts the exponent only, and `floor` is exact. The
    * threshold is therefore bit-identical in both engines.
    *
    * 100 TB shape: stratum counts are a tiny partial-agg'd aggregate
    * (one row per language); n_min is a WINDOW min over that post-agg
    * table — NOT a separate `counts.agg(min)` branch, which would carry
    * its own copy of the corpus-scan subtree (Spark does not reuse
    * exchanges whose column pruning differs, so the corpus `lang` column
    * would be scanned twice). A global window is the hot-key anti-pattern
    * on corpus-sized input but exactly right on a rows=n_languages
    * aggregate. Thresholds broadcast; the corpus itself is filtered in
    * place: zero corpus shuffles, one corpus scan. */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"),
        Dedup.md5Hash60(concat(lit("mix:"), col("doc_id").cast("string"))).as("h"))
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val thresholds = counts
      .withColumn("n_min", min(col("n")).over(Window.partitionBy()))
      .select(col("lang"),
        floor(sqrt(col("n_min").cast("double") / col("n")) * lit(HashSpace))
          .cast("long").as("thresh"))
    docs.join(broadcast(thresholds), Seq("lang"))
      .filter(col("h") < col("thresh"))
      .select(col("doc_id"), col("source"), col("lang"))
  }

  /** Per-source length tail-trim (x50): drop documents outside the
    * [q10, q90] n_chars band of their source, with the band estimated
    * from the bounded-state bottom-k hash sample (`KmvValueSample`, same
    * machinery as x36) — the robust outlier-trimming stage of a quality
    * pipeline, in the shape it must take at 100 TB: per-source fences
    * come from O(k) mergeable state (no exact order statistics, which
    * would shuffle every row — x29's cost), the fence table broadcasts,
    * and the corpus is filtered unshuffled. Deterministic end-to-end
    * (md5-60 priorities), so the oracle replicates sample, fences, and
    * filter exactly. */
  def lengthTailTrim(spark: SparkSession, dir: String, k: Int = TrimSampleK): DataFrame = {
    import graft.functions.KmvValueSample.kmv_value_sample
    val h = Dedup.md5Hash60(concat(lit("len:"), col("doc_id").cast("string")))
    val samples = Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(kmv_value_sample(h, col("n_chars"), k).as("vals"))
    def pick(q: Int): Column =
      element_at(col("vals"), ceil(size(col("vals")) * q / 100).cast("int"))
    val fences = samples.select(col("source"),
      pick(TrimLoPct).as("lo"), pick(TrimHiPct).as("hi"))
    Tables.documents(spark, dir)
      .join(broadcast(fences), Seq("source"))
      .filter(col("n_chars") >= col("lo") && col("n_chars") <= col("hi"))
      .select(col("doc_id"), col("source"), col("n_chars"))
  }

  /** Unified ship-corpus assembly (x69): the composition a production
    * pipeline ACTUALLY ships, stacking the library's curation stages in
    * their canonical order — near-dup dedup (x57's canonical-survivor
    * rule) ∩ word-shingle decontamination (x47's bloom-prefiltered hit
    * set) ∩ char-gram decontamination (x64's exact-substring hit set) ∩
    * repetition filter (x67's Gopher rules) → per-source cap (x46's KMV
    * threshold) → deterministic split (x27's hash rule) → per-(source ×
    * split) accounting (x61's shape). Supersedes x35's three-stage
    * funnel, which predates the round-5/6 filters.
    *
    * Built from the composable overloads so every expensive artifact is
    * computed ONCE: the dedup keep set reads the STAGED cluster artifact
    * (`ClusterStage.clusters` — zero CC re-runs after the first stage in
    * a session), one bloom build
    * feeds the word-level hit set, one gram join feeds the char-level hit
    * set; the repetition rules are a per-row projection on the survivor
    * scan (no join — `TextAnalysis.repetitionKeep`), the flagged-id
    * anti-join broadcasts (tiny by construction), and the cap thresholds
    * broadcast (one row per source). Every stage is a deterministic
    * function of the data, so the WHOLE composition is oracle-checked
    * end-to-end — the proof the stages stack without divergence. */
  def shipCorpus(spark: SparkSession, dir: String,
                 cap: Int = DefaultSourceCap): DataFrame = {
    val clusters = ClusterStage.clusters(spark, dir)
    val keepDedup = clusters
      .filter(col("doc_id") === col("canonical_id")).select(col("doc_id"))
    val wordFlagged = Dedup.bloomDecontamination(spark, dir)
      .select(col("doc_id"))
    val charFlagged = Dedup.exactSubstringContamination(spark, dir)
      .select(col("doc_id"))
    val flagged = wordFlagged.union(charFlagged).distinct()
    val survivors = Tables.documents(spark, dir)
      .filter(col("doc_id") >= Dedup.DecontamBenchMaxId)
      .filter(TextAnalysis.repetitionKeep(col("text")))
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        size(split(col("text"), " ")).as("ws_toks"))
      .join(keepDedup, Seq("doc_id"), "left_semi")
      .join(broadcast(flagged), Seq("doc_id"), "left_anti")
      // materialized once (r18): sourceCapSample reads its input twice
      // (KMV thresholds, then the acceptance filter), which would replay
      // the whole survivor assembly — repetition filter + dedup semi-join
      // + decontamination anti-join — a second time in the same plan
      .localCheckpoint()
    sourceCapSample(survivors, cap)
      .withColumn("split", splitLabel(hashBucket(col("doc_id"), "split", 100)))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws_toks")).as("ws_tokens"),
        sum(col("n_chars")).as("total_chars"))
  }

  /** Token-budget report (x61): docs / whitespace tokens / chars per
    * (source × split) cell — the planning artifact a training run reads
    * to size epochs and mixture weights after splitting. The split label
    * is x27's pure hash function recomputed inline (no join), token
    * counts are per-row projections, and the whole report is one
    * partial-agg'd shuffle on a (sources × 3)-ary key. */
  def tokenBudget(spark: SparkSession, dir: String): DataFrame =
    tokenBudget(Tables.documents(spark, dir))

  /** DataFrame-first form of x61 — a pure transformation, so the SAME
    * definition runs over a batch table or a streaming source (the
    * `DocumentStream.tokenBudgetStream` twin). */
  def tokenBudget(docs: DataFrame): DataFrame =
    docs
      .select(col("source"),
        splitLabel(hashBucket(col("doc_id"), "split", 100)).as("split"),
        size(split(col("text"), " ")).as("toks"), col("n_chars"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("ws_tokens"),
        sum(col("n_chars")).as("total_chars"))

  /** BPE-token-accurate token budget (x63): x61's per-(source × split)
    * mixture report, but with the token column counted by the fused
    * `BpeEncode` kernel under the PINNED merge table
    * (`TextAnalysis.PinnedBpeMerges`) instead of the whitespace proxy —
    * budgets that feed a training-mixture planner must count the tokens
    * the model will actually see. Both counts are reported so the
    * ws→BPE correction factor is visible per cell.
    *
    * Scale shape: identical to x61 — the encode is pure per-row CPU
    * inside the scan's projection (merge table rides the serialized
    * expression, no lookup join), and the aggregate partial-combines
    * map-side into ≤ sources × 3 rows. */
  def bpeTokenBudget(spark: SparkSession, dir: String,
                     merges: Seq[(String, String)] = TextAnalysis.PinnedBpeMerges): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"),
        splitLabel(hashBucket(col("doc_id"), "split", 100)).as("split"),
        size(graft.functions.BpeEncode.bpe_encode(col("text"), merges)).as("toks"),
        size(split(col("text"), " ")).as("ws"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("bpe_tokens"),
        sum(col("ws")).as("ws_tokens"))

  /** Exact per-source length quantiles (q25/q50/q75 of n_chars) via
    * order-statistic row-pick: rank rows per source on (n_chars, doc_id),
    * select ranks ceil(q·n). Unlike interpolating `percentile`, a picked
    * order statistic is an actual data value — integer, engine-exact — and
    * the whole computation is one shuffle on source. */
  def lengthQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
    val ranked = Tables.documents(spark, dir)
      .select(col("source"), col("n_chars"), col("doc_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
    def pick(q: Int): Column =
      max(when(col("rn") === ceil(col("n") * q / 100).cast("long"), col("n_chars")))
    ranked.groupBy(col("source"))
      .agg(max(col("n")).as("n_docs"),
        pick(25).as("q25_chars"), pick(50).as("q50_chars"), pick(75).as("q75_chars"))
  }

  /** x74 knobs: epochs in the training schedule and the shard fan-out of
    * the materialized order. Shards MUST be a power of two dividing the
    * md5-60 hash space so `h div (HashSpace/shards)` is exact high-bit
    * extraction — shared with the oracle SQL. */
  val ShuffleEpochs: Int = 3
  val ShuffleShards: Int = 16

  /** Deterministic epoch-seeded training-order shuffle (x74): the global
    * permutation a training run reads the corpus in, re-drawn per epoch.
    * Order key is the salted md5-60 of (epoch, doc_id) — a pure function
    * of the data, so every re-run (and the oracle) reproduces the same
    * permutation; `rand()` here would silently re-deal the curriculum on
    * task retry. The total order is materialized the only way a global sort
    * can be at 100 TB: shard = HIGH BITS of the hash (so shards ascend in
    * key order — `shard asc, pos asc` IS the global hash order) and an
    * in-shard position from a window partitioned BY (epoch, shard) —
    * epochs × shards independent partitions, no single-task global
    * row_number, no driver zipWithIndex. Readers consume (epoch, shard,
    * pos) lexicographically — the same contract as x37's packed-shard
    * layout. Per-epoch salts make the permutations independent; the
    * epoch explode costs epochs× rows BEFORE any shuffle (map-side), and
    * the one shuffle is the window's, keyed on (epoch, shard). */
  def epochShuffle(spark: SparkSession, dir: String, epochs: Int = ShuffleEpochs,
                   shards: Int = ShuffleShards): DataFrame = {
    require(epochs >= 1 && shards >= 1 && (shards & (shards - 1)) == 0,
      "need epochs >= 1 and shards a power of two")
    val shardWidth = HashSpace / shards
    val h = Dedup.md5Hash60(
      concat(lit("epoch:"), col("epoch").cast("string"), lit(":"),
        col("doc_id").cast("string")))
    val keyed = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(sequence(lit(1), lit(epochs))).as("epoch"))
      .withColumn("h", h)
      .withColumn("shard", expr(s"h div ${shardWidth}L"))
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("h"), col("doc_id"))
    keyed
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select(col("epoch").cast("long").as("epoch"), col("shard"),
        col("pos"), col("doc_id"), col("h"))
  }

  /** x80's shard fan-out per decile band (power of two, same exactness
    * argument as ShuffleShards) — shared with the oracle SQL. */
  val CurriculumShardsPerDecile: Int = 16

  /** Quality-curriculum schedule (x80): the materialized read order of
    * curriculum training — highest source-relative quality deciles first,
    * hash-shuffled WITHIN a decile band (so the curriculum orders bands,
    * not individual documents — deterministic but not degenerate). The
    * decile is x56's calibrated assignment (same definition, shared
    * oracle CTEs — the schedule can't diverge from the calibration);
    * the within-band key is a fresh salted md5-60.
    *
    * Materialization follows x74's contract: shard = (9 − decile) ·
    * shardsPerDecile + the hash's high bits, so `shard asc, pos asc` IS
    * the global curriculum order, positions come from a window over
    * 10 × shardsPerDecile independent partitions, and no single-task
    * global row_number exists at any corpus size. One corpus shuffle
    * (the window's); the decile assignment itself broadcasts its edge
    * table (x56's shape). */
  def curriculumSchedule(spark: SparkSession, dir: String,
                         shardsPerDecile: Int = CurriculumShardsPerDecile): DataFrame = {
    require(shardsPerDecile >= 1 && (shardsPerDecile & (shardsPerDecile - 1)) == 0,
      "shardsPerDecile must be a power of two")
    val w = HashSpace / shardsPerDecile
    val keyed = TextAnalysis.scoreDeciles(spark, dir)
      .withColumn("h",
        Dedup.md5Hash60(concat(lit("curr:"), col("doc_id").cast("string"))))
      .withColumn("shard",
        expr(s"CAST((9 - decile) * $shardsPerDecile + h div ${w}L AS BIGINT)"))
    val win = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    keyed
      .withColumn("pos", (row_number().over(win) - 1).cast("long"))
      .select(col("shard"), col("pos"), col("doc_id"), col("source"),
        col("decile"), col("h"))
  }

  /** Sequence packing in SHUFFLED order (x81): x37's token-budget bin
    * assignment applied to the x74 epoch-1 read order instead of doc_id
    * order — the pack a training run actually materializes, since packing
    * BEFORE shuffling would destroy the shuffle (bins would stride the
    * corpus in doc_id order). Composition shape: the schedule's shard IS
    * the pack's bucket — in-shard positions give the local order, and
    * the cross-shard token offsets come from the same scale-safe
    * `exclusivePrefixSum` ladder as x37 (no single-task global window at
    * any corpus size). Only (doc_id, shard, pos, n_tokens) ride the
    * pack's shuffles; one doc_id join attaches token counts to the
    * narrow schedule. */
  def packShuffledSequences(spark: SparkSession, dir: String, budgetTokens: Long = 512,
                            shards: Int = ShuffleShards,
                            maxWindowRows: Long = 1000000L): DataFrame = {
    val schedule = epochShuffle(spark, dir, epochs = 1, shards = shards)
      .select(col("doc_id"), col("shard"), col("pos"))
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val s = schedule.join(toks, Seq("doc_id"))
    val shardPrefix = exclusivePrefixSum(
      s.groupBy(col("shard")).agg(sum(col("n_tokens")).as("v"))
        .select(col("shard").as("key"), col("v")),
      maxWindowRows = maxWindowRows)
      .select(col("key").as("shard"), col("offset").as("shard_offset"))
    val local = Window.partitionBy(col("shard")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    s.join(shardPrefix, Seq("shard"))
      .withColumn("tokens_before",
        coalesce(sum(col("n_tokens")).over(local), lit(0L)) + col("shard_offset"))
      .withColumn("bin_id", expr(s"tokens_before div $budgetTokens"))
      .groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
        min(col("shard")).as("first_shard"), max(col("shard")).as("last_shard"))
  }

  /** x83's per-cell sample size, shared with the oracle SQL. */
  val CardSampleK: Int = 8

  /** Per-(source × split) data card (x83): the datasheet artifact a
    * training-data release ships — for every mixture cell, document/token
    * totals, the min/max length envelope, and a bounded inspection sample
    * of doc ids (`CardSampleK` ids by salted-hash priority). The sample
    * is the bottom-k hash sketch (`KmvValueSample`, O(k) mergeable state
    * — x51's discipline): a `collect_list` sample would buffer a cell's
    * whole membership through the aggregate at corpus scale, and a
    * `rand()` sample would change per run. One partial-agg'd shuffle on
    * the (sources × 3)-ary cell key; every output column is an integer
    * or a deterministic id string, so the card is fully oracle-checked. */
  def dataCard(spark: SparkSession, dir: String, k: Int = CardSampleK): DataFrame = {
    import graft.functions.KmvValueSample.kmv_value_sample
    val h = Dedup.md5Hash60(concat(lit("card:"), col("doc_id").cast("string")))
    Tables.documents(spark, dir)
      .select(col("source"),
        splitLabel(hashBucket(col("doc_id"), "split", 100)).as("split"),
        col("doc_id"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("toks"), h.as("h"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("ws_tokens"),
        min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"),
        kmv_value_sample(col("h"), col("doc_id"), k).as("sample"))
      .select(col("source"), col("split"), col("n_docs"), col("ws_tokens"),
        col("min_chars"), col("max_chars"),
        concat_ws(",", transform(array_sort(col("sample")), p => p.cast("string")))
          .as("sample_ids"))
  }

  /** x84 knobs: length-bucket width (tokens) and sequences per batch,
    * shared with the oracle SQL. */
  val BatchBucketTokens: Long = 16L
  val BatchSize: Long = 8L

  /** Length-bucketed micro-batch grouping (x84): assign documents to
    * fixed-size training/inference batches so same-batch sequences have
    * similar token counts — the standard padding-waste mitigation
    * (batching by raw arrival order pads every short sequence up to the
    * batch max; bucketing by length first collapses that waste). Docs
    * land in `bucketTokens`-wide length buckets; WITHIN a bucket they
    * order deterministically by (toks, doc_id) and chop into
    * `batchSize`-sequence batches. Output: one row per batch with its
    * size, token envelope, and `padding_waste` = batchSize·max − Σtoks —
    * the tokens a dense rectangular batch tensor would waste (tail
    * batches count only their actual rows).
    *
    * 100 TB shape: one corpus shuffle (the per-bucket window; buckets are
    * numerous and balanced — skew bound is one LENGTH CLASS, not a hot
    * key), then a partial-agg'd shuffle on (bucket, batch). Everything
    * integer → fully oracle-checked. */
  def lengthBatches(spark: SparkSession, dir: String,
                    bucketTokens: Long = BatchBucketTokens,
                    batchSize: Long = BatchSize): DataFrame = {
    require(bucketTokens >= 1 && batchSize >= 1, "need positive bucket/batch sizes")
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("toks"))
      .withColumn("bucket", expr(s"toks div ${bucketTokens}L"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("toks"), col("doc_id"))
    toks
      .withColumn("rn", row_number().over(w))
      .withColumn("batch_id", expr(s"CAST((rn - 1) div ${batchSize}L AS BIGINT)"))
      .groupBy(col("bucket"), col("batch_id"))
      .agg(count(lit(1)).as("n_seqs"),
        min(col("toks")).as("min_toks"), max(col("toks")).as("max_toks"),
        sum(col("toks")).as("sum_toks"))
      .withColumn("padding_waste", col("n_seqs") * col("max_toks") - col("sum_toks"))
  }

  /** x75's pinned mixture weights in micro-units (1e6 = keep exactly
    * once): the data-mixing spec a training run ships — here frozen as a
    * constant so the oracle interpolates the SAME table (the
    * PinnedBpeMerges pattern). Sources not listed default to
    * `UpsampleDefaultMicro`. Weights > 1e6 upsample (2_500_000 = every
    * doc twice plus a 50% chance of a third copy); weights < 1e6
    * downsample. */
  val UpsampleWeightsMicro: Seq[(String, Long)] = Seq(
    "src0" -> 2500000L, "src3" -> 1300000L, "src7" -> 3000000L,
    "src12" -> 700000L, "src18" -> 250000L)
  val UpsampleDefaultMicro: Long = 1000000L

  /** Fractional source upsampling (x75): materialize the per-source
    * mixture weights as deterministic document REPEATS — the standard way
    * a pretraining mix realizes "see source A 2.5× per epoch" (integer
    * part = unconditional copies; fractional part = one extra copy for a
    * hash-selected `frac` share of the source's docs). The coin is
    * `md5-60(doc_id) mod 1e6 < w mod 1e6` — exact integer arithmetic, a
    * pure function of doc_id, so reruns repeat the same docs and the
    * oracle replicates the realized multiset row-for-row (`rep` numbers
    * the copies 1..n).
    *
    * 100 TB shape: the weight table is spec-sized and broadcasts; copies
    * materialize as a per-row `explode(sequence)` in the scan projection
    * — zero shuffles, output rows = Σ wᵢ·nᵢ by construction. Downstream
    * consumers shuffle the repeats, not this operator. */
  def upsampleMixture(spark: SparkSession, dir: String,
                      weightsMicro: Seq[(String, Long)] = UpsampleWeightsMicro,
                      defaultMicro: Long = UpsampleDefaultMicro): DataFrame = {
    require(weightsMicro.forall(_._2 >= 0L) && defaultMicro >= 0L,
      "weights must be non-negative")
    val spark2 = spark; import spark2.implicits._
    val weights = broadcast(weightsMicro.toDF("source", "w_micro"))
    val hf = pmod(Dedup.md5Hash60(concat(lit("up:"), col("doc_id").cast("string"))),
      lit(1000000L))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .join(weights, Seq("source"), "left")
      .withColumn("wm", coalesce(col("w_micro"), lit(defaultMicro)))
      .withColumn("n_copies",
        expr("wm div 1000000L") + when(hf < col("wm") % lit(1000000L), 1L).otherwise(0L))
      .select(col("doc_id"), col("source"),
        explode(when(col("n_copies") > 0,
          sequence(lit(1L), col("n_copies")))
          .otherwise(array().cast("array<long>"))).as("rep"))
      .select(col("doc_id"), col("source"), col("rep"))
  }

  /** x97 knob — per-source keep budget for the quality-ranked cap. */
  val QualityCapPerSource: Int = 15

  /** Quality-ranked per-source cap (x97): keep the `cap` BEST documents
    * of each source by the pinned quality score (x89's frozen linear
    * scorer — shared code, so ranking can never diverge from scoring),
    * ties broken by doc_id. This is the CURATION variant of x46's
    * hash-cap (which keeps a uniform sample): when a source exceeds its
    * budget, a real pipeline keeps its best documents, not a random
    * subset.
    *
    * Scale shape: the per-source rank is a row_number window that Spark
    * executes with WindowGroupLimit (x73's top-k pattern, plan-asserted
    * in SamplingSpec) — every task prunes to `cap` rows per source
    * map-side BEFORE the shuffle, so the final per-source partition
    * holds ≤ cap·n_input_partitions pre-pruned rows, never a
    * corpus-sized source. The score join is doc_id-keyed (uniform). */
  def qualityCapSample(spark: SparkSession, dir: String,
                       cap: Int = QualityCapPerSource): DataFrame = {
    require(cap >= 1, "need cap >= 1")
    val scored = TextAnalysis.qualityScorePinned(spark, dir)
      .select(col("doc_id"), col("score_micro"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    Tables.documents(spark, dir).select(col("doc_id"), col("source"))
      .join(scored, Seq("doc_id"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= cap)
      .select(col("doc_id"), col("source"), col("score_micro"), col("rank"))
  }

  /** x104's length-bucket width in characters: pairs are mined within
    * (source, n_chars div width) cells so chosen/rejected are
    * comparable in provenance and length — the confound controls a
    * preference-pair miner needs. Shared with the oracle SQL. */
  val PrefBucketChars: Long = 2000L

  /** Preference-pair mining (x104): per (source, length-bucket) cell,
    * pair the highest- and lowest-quality document under x89's pinned
    * scorer — the DPO/RLHF-style (chosen, rejected) construction over
    * raw corpus text, with source and length held fixed so the pair
    * differs by QUALITY rather than by provenance or verbosity. Both
    * picks are argmax/argmin via lexicographic struct extrema
    * `max(struct(score_micro, doc_id))` — deterministic under score
    * ties (doc_id breaks them) and PARTIAL-AGGREGABLE, so the mine is
    * one map-side-combined groupBy with no window at all (contrast
    * x97's ranked cap, which needs row numbers by contract). Cells with
    * one candidate emit nothing (no self-pairs); `margin_micro` is the
    * exact integer score gap a trainer can threshold on.
    *
    * 100 TB shape: scoring is x89's pure per-row projection; the only
    * shuffle is the (source, bucket)-keyed groupBy, partial-agg'd to
    * TWO struct extrema + a count per cell regardless of cell size — a
    * billion-doc cell still reduces map-side. Output is O(cells). */
  def preferencePairs(spark: SparkSession, dir: String,
                      bucketChars: Long = PrefBucketChars): DataFrame = {
    require(bucketChars >= 1, "need bucketChars >= 1")
    val scored = TextAnalysis.qualityScorePinned(spark, dir)
      .select(col("doc_id"), col("score_micro"))
    Tables.documents(spark, dir).select(col("doc_id"), col("source"), col("n_chars"))
      .join(scored, Seq("doc_id"))
      .withColumn("bucket", expr(s"n_chars div ${bucketChars}L"))
      .groupBy(col("source"), col("bucket"))
      .agg(
        count(lit(1)).as("n_candidates"),
        max(struct(col("score_micro"), col("doc_id"))).as("best"),
        min(struct(col("score_micro"), col("doc_id"))).as("worst"))
      .filter(col("n_candidates") >= 2)
      .select(col("source"), col("bucket"), col("n_candidates"),
        col("best.doc_id").as("chosen_id"), col("worst.doc_id").as("rejected_id"),
        (col("best.score_micro") - col("worst.score_micro")).as("margin_micro"))
  }

  /** x115's per-source sample size. */
  val WeightedSampleK: Int = 10

  /** Weighted sampling WITHOUT replacement (x115): draw
    * [[WeightedSampleK]] documents per source with inclusion biased by
    * x89's pinned quality weight — the fixed-SIZE companion to x100's
    * Bernoulli resample (a mixture builder wants exact shard sizes; a
    * filter wants a rate). This is the integer A-ES/priority-sampling
    * variant (Efraimidis–Spirakis with the exp/log race replaced by the
    * repo's hash discipline): priority = `h div w` where h is the
    * salted md5-60 coin and w = max(1, score_micro) — doubling a
    * weight halves a doc's expected priority, so the bottom-k
    * priorities per source are a deterministic weight-biased sample;
    * the log-free variant choice is documented (x95's move: polynomial
    * rather than exponential weight sensitivity).
    *
    * 100 TB shape: scoring and priorities are per-row projections; the
    * bottom-k per source is a rank window that Spark executes as
    * WindowGroupLimit (x97's pattern): each map task keeps only k rows
    * per source before the shuffle, so the exchange carries
    * O(tasks·k·sources), never the corpus. */
  def weightedSample(spark: SparkSession, dir: String,
                     k: Int = WeightedSampleK): DataFrame = {
    require(k >= 1, "need k >= 1")
    val scored = TextAnalysis.qualityScorePinned(spark, dir)
      .select(col("doc_id"), col("score_micro"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("priority"), col("doc_id"))
    Tables.documents(spark, dir).select(col("doc_id"), col("source"))
      .join(scored, Seq("doc_id"))
      .withColumn("weight", greatest(lit(1L), col("score_micro")))
      .withColumn("h", Dedup.md5Hash60(concat(lit("ws:"), col("doc_id").cast("string"))))
      .withColumn("priority", expr("h div weight"))
      .drop("h")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("source"), col("weight"),
        col("priority"), col("rank"))
  }

  /** x95 knobs — hashed-feature bucket count, pinned target-sample
    * boundary (the same convention as x31's benchMaxId: docs below it
    * are the curated domain sample), fixed-point scale. Shared with the
    * oracle SQL so the two sides can only move together. */
  val DsirBuckets: Int = 1024
  val DsirTargetMaxId: Long = 20L
  val DsirScale: Long = 1000000L

  /** Domain-targeted importance weights (x95), DSIR-style (Xie et al.
    * 2023, "Data Selection for Language Models via Importance
    * Resampling"): score every candidate document by how target-like its
    * hashed-unigram distribution is — per token, the add-1-smoothed
    * count ratio between the TARGET sample (docs below `targetMaxId`)
    * and the rest of the corpus, summed per document. The published
    * method sums log-ratios; this is the repo's standard LOG-FREE
    * variant (x73's BM25-idf move): per-token points
    * `q = (Scale·(t_b+1)) div (c_b+1)` are a monotone transform of the
    * per-bucket ratio, so target-aligned tokens get polynomially (not
    * logarithmically) more weight — a documented variant choice. Output
    * per candidate doc: token count, summed points, and the
    * length-normalized per-token points (the actual resampling key).
    *
    * Integer bound (x65's documented pattern): q ≤ Scale·(T+1) where T
    * is the TARGET sample's token count — model-state-sized by design
    * (a curated domain sample, not the corpus) — so the per-doc sum
    * wraps only past n_toks·(T+1) > 2⁶³/Scale ≈ 9.2·10¹², i.e. a
    * 9M-token document against a 1M-token target: outside any real
    * document, and the target size is the operator's own knob.
    *
    * 100 TB shape: ONE aggregation pass computes both sides' bucket
    * counts (conditional sums on the is-target flag — no second corpus
    * scan for the model); the model table is ≤ `buckets` rows and
    * BROADCASTS into the probe scan, so the corpus-sized probe never
    * shuffles for the model join; the only corpus shuffle is the final
    * partial-agg'd groupBy on doc_id. Hash-bucket features are the
    * point of DSIR: driver/model state is O(buckets), independent of
    * vocabulary. */
  def dsirImportance(spark: SparkSession, dir: String,
                     targetMaxId: Long = DsirTargetMaxId,
                     buckets: Int = DsirBuckets): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .select(col("doc_id"), hashBucket(col("token"), "dsir", buckets).as("b"))
    val counts = toks.groupBy(col("b")).agg(
      sum(when(col("doc_id") < targetMaxId, 1L).otherwise(0L)).as("t_b"),
      sum(when(col("doc_id") >= targetMaxId, 1L).otherwise(0L)).as("c_b"))
    val scored = toks.filter(col("doc_id") >= targetMaxId)
      .join(broadcast(counts), Seq("b"))
      .select(col("doc_id"),
        expr(s"(${DsirScale}L * (t_b + 1L)) div (c_b + 1L)").as("q"))
    val agg = scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("q")).as("importance_pts"))
    Tables.documents(spark, dir)
      .filter(col("doc_id") >= targetMaxId).select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        coalesce(col("importance_pts"), lit(0L)).as("importance_pts"),
        coalesce(expr("importance_pts div n_toks"), lit(0L)).as("imp_per_tok"))
  }

  /** Effective-sample-size panel for the DSIR importance weights (x230):
    * per source, Kish's ESS = (Σw)² / Σw² over x95's per-token
    * importance weights — the one number that says how much of the
    * corpus the weighted resample (x100) ACTUALLY uses: ESS ≈ n means
    * near-uniform weights (reweighting is cheap), ESS ≪ n means a few
    * documents dominate and the resampled corpus is effectively tiny
    * (variance blows up — cap or temper the weights before training).
    * Published as the raw rational per the x156 convention: n_docs and
    * the DECIMAL(38,0) moments `sum_w`, `ess_num = (Σw)²`,
    * `ess_den = Σw²` as digit strings — never a float division, and
    * (Σw)² at 10⁹ docs × 10⁶-point weights needs the decimal width
    * (x152's discipline).
    *
    * 100 TB shape: x95's weight derivation is the corpus-sized work
    * (one explode + broadcast-bucket join); this panel adds one
    * partial-agg'd groupBy to O(sources) rows. */
  def importanceEss(spark: SparkSession, dir: String): DataFrame =
    dsirImportance(spark, dir)
      .select(col("doc_id"), col("imp_per_tok").as("w"))
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("w").cast("decimal(38,0)")).as("sw"),
        // multiply AFTER the decimal cast: w² in LongType would raise on
        // overflow (ANSI) once weights clear ~3·10⁹ points
        sum(col("w").cast("decimal(38,0)") * col("w").cast("decimal(38,0)"))
          .as("sw2"))
      .select(col("source"), col("n_docs"),
        col("sw").cast("decimal(38,0)").cast("string").as("sum_w"),
        (col("sw") * col("sw")).cast("decimal(38,0)").cast("string").as("ess_num"),
        col("sw2").cast("decimal(38,0)").cast("string").as("ess_den"))

  /** DSIR importance RESAMPLING (x100) — the apply stage x95's weights
    * exist for: draw a target-like subcorpus by accepting each candidate
    * with probability proportional to its importance weight. Acceptance
    * is the repo's deterministic coin (salted md5-60 vs a threshold, the
    * x48 convention): keep doc iff
    * `h < floor(HashSpace · imp_per_tok / max_imp)` — the max-weight doc
    * is kept almost surely, a zero-weight doc never. The threshold is
    * two IEEE double ops (`(HashSpace·imp) / max`, both sides mirror the
    * same association); HashSpace = 2⁶⁰ is an exact double and the
    * quotient is ≤ 2⁶⁰, so the floor/cast never overflows a Long.
    *
    * 100 TB shape: `max_imp` is a 1-row scalar agg crossJoined back
    * (broadcast by size — x65's global-totals pattern); acceptance is
    * then a pure per-row projection over the weights table, no further
    * shuffle, no driver state. Composable overload takes a precomputed
    * weights frame so a pipeline scores once (x95) and resamples many
    * times under different salts. */
  def dsirResample(weights: DataFrame, salt: String = "dsirs"): DataFrame = {
    val mx = weights.agg(max(col("imp_per_tok")).as("max_imp"))
    weights.crossJoin(mx)
      .filter(Dedup.md5Hash60(concat(lit(salt + ":"), col("doc_id").cast("string"))) <
        floor(lit(HashSpace).cast("double") * col("imp_per_tok") / col("max_imp"))
          .cast("long"))
      .select(col("doc_id"), col("n_toks"), col("imp_per_tok"))
  }

  /** x100 entry: weight with x95's scorer, then resample. The weights
    * are materialized once (r18): `dsirResample` reads its input twice
    * (the max-weight scalar and the acceptance scan), so the uncut
    * lineage replayed x95's corpus-sized explode + bucket join twice
    * in one plan. */
  def dsirResample(spark: SparkSession, dir: String): DataFrame =
    dsirResample(dsirImportance(spark, dir).localCheckpoint())

  /** x157's global token budget, shared with the oracle SQL. */
  val ApportionBudget: Long = 1000000L

  /** Largest-remainder token-budget apportionment (x157): split a fixed
    * global token budget across sources EXACTLY proportionally to their
    * corpus token mass, using Hamilton's method — every source gets
    * `floor(budget·n_s/N)` tokens, and the `budget − Σ floor` leftover
    * goes one token each to the largest remainders (ties broken by
    * source name). Unlike a per-source ratio rounded independently
    * (which misses or exceeds the budget by up to |sources|), the
    * allocations here sum to the budget EXACTLY — the contract a
    * training-mixture planner actually needs before x46/x48 sampling
    * rates are derived from the quotas.
    *
    * 100 TB shape: the corpus-scale work is x07's whitespace token
    * count, one partial-agg'd groupBy onto O(sources) rows; everything
    * after runs on the tiny per-source table (its unpartitioned
    * remainder-rank window is the documented tiny-table case).
    * `budget·n_s` reaches ~10¹⁹ inside the 100 TB envelope, so the
    * quota products run in DECIMAL(38,0) (x152's unconditional
    * promotion); base allocations and remainders fit longs by
    * construction (base ≤ budget, remainder < N). */
  def budgetApportionment(spark: SparkSession, dir: String,
                          budget: Long = ApportionBudget): DataFrame = {
    val perSource = Tables.documents(spark, dir)
      .select(col("source"),
        size(split(trim(col("text")), " +")).cast("long").as("t"))
      .groupBy(col("source")).agg(sum(col("t")).as("n_tokens"))
      .localCheckpoint()
    val tot = perSource.agg(sum(col("n_tokens")).as("n_total"))
    val based = perSource.crossJoin(broadcast(tot))
      .withColumn("quota_num", col("n_tokens").cast("decimal(38,0)") * budget)
      .withColumn("base_alloc", expr("quota_num div n_total"))
      .withColumn("remainder",
        (col("quota_num") - col("base_alloc").cast("decimal(38,0)")
          * col("n_total")).cast("long"))
      .localCheckpoint()
    val left = based.agg((lit(budget) - sum(col("base_alloc"))).as("leftover"))
    val w = Window.orderBy(col("remainder").desc, col("source"))
    based.crossJoin(broadcast(left))
      .withColumn("bonus",
        (row_number().over(w) <= col("leftover")).cast("long"))
      .select(col("source"), col("n_tokens"), col("base_alloc"),
        col("remainder"), col("bonus"),
        (col("base_alloc") + col("bonus")).as("alloc_tokens"))
  }

  /** x158's shard count before the reshard, shared with the oracle. */
  val RendezvousShards: Int = 16

  /** Rendezvous-hash resharding audit (x158): assign every document to
    * a shard by highest-random-weight hashing — shard = argmax over s of
    * md5(doc_id#s) — under K and K+1 shards, and report per old shard
    * how many documents MOVE when the new shard joins. Rendezvous
    * hashing's defining property is minimal disruption: a document
    * moves iff the NEW shard wins its argmax, so each old shard should
    * lose ~1/(K+1) of its docs (ppm column), versus ~K/(K+1) for a
    * naive `hash mod K` reshard. This is the audit a 1000-executor
    * ingest runs before resizing its shard map.
    *
    * 100 TB shape: the K+1-way per-row explode is a plan-time-constant
    * fan-out (no shuffle); BOTH argmaxes (old and new shard sets) fold
    * in ONE partial-agg'd groupBy over doc_id — max(struct(h, s)) with
    * the old-set argmax under a `when(s < K)` guard, so map-side
    * combine collapses the K+1 rows before any exchange and the pass
    * is single-shuffle. Output is O(K) rows. The hash is the
    * engine-neutral md5-60 (the repo's determinism discipline — a
    * rand() assignment would re-shard under task retry). */
  def rendezvousReshard(spark: SparkSession, dir: String,
                        k: Int = RendezvousShards): DataFrame = {
    require(k >= 1, "need at least one shard")
    val shards = (0 to k).map(s => lit(s.toLong))
    val assign = Tables.documents(spark, dir).select(col("doc_id"))
      .select(col("doc_id"), explode(array(shards: _*)).as("s"))
      .withColumn("h", Dedup.md5Hash60(
        concat(col("doc_id").cast("string"), lit("#"), col("s").cast("string"))))
      .groupBy(col("doc_id"))
      .agg(max(when(col("s") < k, struct(col("h"), col("s")))).as("old"),
        max(struct(col("h"), col("s"))).as("nw"))
    assign
      .select(col("old.s").as("shard"), (col("old.s") =!= col("nw.s"))
        .cast("long").as("moved"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("moved")).as("n_moved"))
      .withColumn("moved_ppm", expr("(1000000L * n_moved) div n_docs"))
  }

  /** x218 knobs: ring nodes before the scale-up, virtual nodes per
    * physical node. Shared with the DuckDB oracle. */
  val RingNodes: Int = 8
  val RingVnodes: Int = 64

  /** The vnode ring as PLAN-TIME constants: position = md5₆₀ of
    * "ring:node:v" — computable identically in Scala (for the Spark
    * literal array) and in the generated oracle VALUES list (the
    * hyperplaneSigns discipline: constants, not state). */
  private[graft] def ringPositions(nodes: Int, vnodes: Int): Seq[(Long, Long)] =
    for (n <- 0L until nodes.toLong; v <- 0L until vnodes.toLong)
      yield (n, graft.functions.Md5Long.hash60(s"ring:$n:$v"))

  /** Consistent-hash ring churn audit (x218): assign every document to
    * the vnode ring (clockwise successor = the vnode minimizing
    * (pos − h) mod 2⁶⁰) under N and N+1 physical nodes, and report per
    * old node how many keys MOVE when the new node joins — the OTHER
    * classic minimal-disruption placement next to x158's rendezvous
    * hashing (same audit, different algorithm: the ring bounds churn
    * by the new node's vnode arc coverage ≈ 1/(N+1), and vnode count
    * is the balance knob this panel exposes). The ring is plan-time
    * constant, so BOTH assignments fold in x158's one-shuffle shape:
    * explode the per-key distances over the 576 vnode literals,
    * argmin via `min(struct(dist, node, pos))` with the old ring under
    * a guard — map-side combine collapses the fan-out before the one
    * exchange on doc_id. */
  def ringChurn(spark: SparkSession, dir: String, nodes: Int = RingNodes,
                vnodes: Int = RingVnodes): DataFrame = {
    val ring = ringPositions(nodes + 1, vnodes)
    val entries = ring.map { case (n, p) =>
      struct(lit(n).as("node"), lit(p).as("pos"))
    }
    val mod = 1L << 60
    val assign = Tables.documents(spark, dir).select(col("doc_id"))
      .withColumn("h", Dedup.md5Hash60(
        concat(lit("key:"), col("doc_id").cast("string"))))
      .select(col("doc_id"), col("h"), explode(array(entries: _*)).as("e"))
      .withColumn("dist", pmod(col("e.pos") - col("h"), lit(mod)))
      .groupBy(col("doc_id"))
      .agg(
        min(when(col("e.node") < nodes,
          struct(col("dist"), col("e.node").as("node")))).as("old"),
        min(struct(col("dist"), col("e.node").as("node"))).as("nw"))
    assign
      .select(col("old.node").as("node"),
        (col("old.node") =!= col("nw.node")).cast("long").as("moved"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_keys"), sum(col("moved")).as("n_moved"))
      .withColumn("moved_ppm", expr("(1000000L * n_moved) div n_keys"))
  }

  /** x190's fold count, shared with the oracle SQL. */
  val FoldK: Int = 5

  /** Grouped k-fold assignment (x190): cross-validation folds for event
    * data where the GROUP (user), not the row, is the unit of
    * assignment — rows of one user must never straddle folds, or the
    * validation fold leaks the training users' behavior (the canonical
    * CV mistake on behavioral data; x27's doc split has no such
    * grouping constraint). The fold is the salted md5 bucket of the
    * user id mod [[FoldK]] — deterministic, data-independent,
    * join-free (recomputed inline on every row, the x27 pattern) — and
    * leakage-freedom is structural: the fold is a pure function of the
    * user id. Published per (fold, event_type): row count, distinct
    * users, value total — the balance sheet that tells you whether the
    * grouped folds are usable (imbalance here means heavy users, not a
    * broken split).
    *
    * 100 TB shape: one scan, fold computed per-row with no join, one
    * partial-agg'd groupBy on the (K × types) key; the distinct-user
    * count shuffles (fold, type, user) once — keyed wide, skew-free. */
  def groupedFolds(spark: SparkSession, dir: String,
                   k: Int = FoldK): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.select(col("event_type"),
        pmod(hashBucket(col("user_id"), "fold"), lit(k.toLong)).as("fold"),
        col("user_id"), Relational.cents(col("value")).as("value_cents"))
      .groupBy(col("fold"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value_cents")).as("value_cents"))
  }

  /** x185's budget as a percentage of total corpus tokens — shared with
    * the oracle SQL. 60% forces the allocator to actually ration. */
  val WaterfillPct: Int = 60

  /** Water-filling mixture allocator (x185): given a token budget
    * ([[WaterfillPct]]% of the corpus), allocate it across sources by
    * the max-min fair rule — every source gets the common level L
    * except sources whose whole supply fits under it, which are taken
    * in full ("capped"). This is the allocation a training-mix builder
    * actually computes when one source dwarfs the rest: cap nothing and
    * the big crawl eats the budget; hard-equal-split and small sources
    * can't fill their share. Integer-exact: sources sorted ascending by
    * (supply, source); rank-k is capped iff
    * `s_k·(n−k+1) ≤ budget − cum_{k−1}` — that test is non-increasing
    * along the ascending order ((m−1)·(s_k−s_{k+1}) ≤ 0 per step), so
    * capped sources form a PREFIX and the closed form is exact: the
    * uncapped sources split the remainder as `base = R div m` plus one
    * extra token to the first `R mod m` of them in rank order
    * (base+1 ≤ their supply, since uncapped means s > R/m).
    *
    * 100 TB shape: the ONLY corpus-sized work is the one-scan per-source
    * token aggregate; everything after — ranks, cumulative supplies,
    * the capped test, the allocation — lives on the O(sources) frame
    * (the documented tiny-table window case). */
  def waterfillMixture(spark: SparkSession, dir: String,
                       pct: Int = WaterfillPct): DataFrame = {
    val supply = Tables.documents(spark, dir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("supply"))
      .localCheckpoint() // tiny; read by the totals agg and the rank pass
    val tot = supply.agg(sum(col("supply")).as("total"),
      count(lit(1)).as("n_sources"))
    val w = Window.orderBy(col("supply"), col("source"))
    val ranked = supply
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("supply")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(tot))
      .withColumn("budget", expr(s"($pct * total) div 100"))
      .withColumn("capped",
        (col("supply") * (col("n_sources") - col("rk") + 1) <=
          col("budget") - (col("cum") - col("supply"))).cast("int"))
      .localCheckpoint() // read by the capped rollup and the final select
    val capStats = ranked.agg(
      sum(col("capped").cast("long")).as("n_capped"),
      coalesce(sum(when(col("capped") === 1, col("supply"))), lit(0L))
        .as("capped_cum"))
    ranked.crossJoin(broadcast(capStats))
      .withColumn("r", col("budget") - col("capped_cum"))
      .withColumn("m", col("n_sources") - col("n_capped"))
      .withColumn("alloc",
        when(col("capped") === 1, col("supply"))
          .otherwise(expr("r div m") +
            when(col("rk") - col("n_capped") <= expr("r % m"), 1L).otherwise(0L)))
      .select(col("source"), col("supply"), col("rk"),
        col("capped"), col("alloc"),
        expr("(1000000L * alloc) div budget").as("share_ppm"))
  }

  /** x247 knobs, shared with the oracle: budget = [[EpochBudgetPct]]%
    * of the corpus's total tokens (200% forces repetition somewhere),
    * and no source may repeat more than [[MaxEpochs]] times (the
    * repeated-data degradation cap from the data-constrained-scaling
    * literature — past ~4 epochs repeated tokens stop helping). */
  val EpochBudgetPct: Int = 200
  val MaxEpochs: Int = 4

  /** Multi-epoch repetition schedule under a token budget (x247) — the
    * planning op a data-constrained pretraining run starts from, and
    * the complement of [[waterfillMixture]]: waterfill allocates a
    * budget SMALLER than the corpus (alloc ≤ supply, cap = 1 epoch);
    * this allocates a budget LARGER (here [[EpochBudgetPct]]% of total
    * tokens), so sources must REPEAT — weighted by x242's tempered
    * (T=2, integer floor-sqrt) weights so small sources boost first,
    * but never past [[MaxEpochs]] epochs. Single redistribution round:
    * proportional-to-weight shares, cap at MaxEpochs·supply, then the
    * surplus the capped sources couldn't absorb is re-split across the
    * uncapped by the same weights (re-capped; any residual after the
    * second cap stays unallocated — documented, exact). Every quantity
    * is integer floor arithmetic, digit-identical in the oracle.
    *
    * 100 TB shape: one corpus scan for the per-source token totals;
    * every subsequent step lives on the O(sources) frame (two
    * broadcast-totals crosses, no window, no second scan). */
  def epochSchedule(spark: SparkSession, dir: String): DataFrame =
    epochScheduleOf(Tables.documents(spark, dir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("n_toks")))

  /** Frame-based unit: input (source, n_toks) — exposed so the cap and
    * redistribution behavior is spec-testable on a SKEWED panel (the
    * gate corpus's sources are uniform, so nothing caps there). */
  private[graft] def epochScheduleOf(supply0: DataFrame): DataFrame = {
    val supply = supply0
      .withColumn("w", expr(isqrtSql("n_toks")))
      .localCheckpoint() // tiny; read by totals, shares, and the rollup
    val totals = supply.agg(sum(col("n_toks")).as("total"), sum(col("w")).as("w_total"))
    val shared = supply.crossJoin(broadcast(totals))
      .withColumn("budget", expr(s"($EpochBudgetPct * total) div 100"))
      .withColumn("cap", expr(s"${MaxEpochs}L * n_toks"))
      .withColumn("share", expr("(budget * w) div w_total"))
      .withColumn("a1", least(col("share"), col("cap")))
      .withColumn("capped", (col("share") >= col("cap")).cast("int"))
      .localCheckpoint() // read by the surplus rollup and the final select
    val round2 = shared.agg(
      (max(col("budget")) - sum(col("a1"))).as("surplus"),
      coalesce(sum(when(col("capped") === 0, col("w"))), lit(0L)).as("uw"))
    shared.crossJoin(broadcast(round2))
      .withColumn("bonus",
        when(col("capped") === 0 && col("uw") > 0,
          expr("(surplus * w) div uw")).otherwise(lit(0L)))
      .withColumn("alloc", least(col("a1") + col("bonus"), col("cap")))
      .select(col("source"), col("n_toks"), col("w"), col("share"),
        col("capped").cast("long").as("capped"), col("alloc"),
        expr("(1000000L * alloc) div n_toks").as("epochs_ppm"))
  }

  /** Exact integer floor-sqrt as a SQL expression over BIGINT column
    * `c` — `floor(sqrt(double))` with a ±1 correction branch, so a
    * double rounding at huge values can never shift the result (the
    * engine-neutral-exactness discipline; same text on both engines). */
  private def isqrtSql(c: String): String = {
    val i0 = s"CAST(floor(sqrt(CAST($c AS DOUBLE))) AS BIGINT)"
    val i1 = s"($i0 + (CASE WHEN ($i0 + 1) * ($i0 + 1) <= $c THEN 1 ELSE 0 END))"
    s"($i1 - (CASE WHEN $i1 * $i1 > $c THEN 1 ELSE 0 END))"
  }

  /** Temperature-scaled source mixture (x242): per-source sampling
    * shares ∝ n_s^(1/T) at T = 2 — the standard multilingual/multi-
    * source flattening rule (big sources damped toward the uniform,
    * small ones boosted) that an LLM mixture actually trains with. The
    * exponent is the exact integer floor-sqrt ([[isqrtSql]] — a double
    * `sqrt` plus a ±1 correction, identical text in both engines), and
    * every share is an integer ppm ratio, so the panel is digit-exact
    * cross-engine. Per source: raw share, tempered share, and the
    * per-doc up/down-sampling factor the tempered mixture implies
    * (tempered/raw in ppm — the rate one would feed x28/x75).
    *
    * 100 TB shape: ONE partial-agg'd groupBy over the corpus and a
    * 1-row totals broadcast; output is O(sources). */
  def temperatureMixture(spark: SparkSession, dir: String): DataFrame =
    temperatureMixtureOf(Tables.documents(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs")))

  /** Frame-based unit: input (source, n_docs) — exposed so the
    * flattening property is spec-testable on a SKEWED panel (the gate
    * corpus's sources are uniform, which only exercises the fixed
    * point resample ≡ 10⁶). */
  private[graft] def temperatureMixtureOf(counts0: DataFrame): DataFrame = {
    val counts = counts0
      .withColumn("w", expr(isqrtSql("n_docs")))
      .localCheckpoint() // totals and shares read it
    val totals = counts.agg(sum(col("n_docs")).as("n_total"),
      sum(col("w")).as("w_total"))
    counts.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("w"),
        col("n_total"), col("w_total"),
        expr("(1000000L * n_docs) div n_total").as("raw_share_ppm"),
        expr("(1000000L * w) div w_total").as("temp_share_ppm"))
      // a source under 1 ppm of the corpus floors raw_share_ppm to 0 —
      // exactly the sources tempering boosts — so the ratio-of-ppms form
      // would emit NULL for them; the guard branch computes the factor
      // straight from the counts: w·(10⁶·n_total div n)/w_total, every
      // term ≤ 10⁶·n_total, exact in BIGINT up to ~9·10¹² total docs
      // (same text in the DuckDB oracle)
      .withColumn("resample_ppm",
        expr("CASE WHEN raw_share_ppm = 0 " +
          "THEN (w * ((1000000L * n_total) div n_docs)) div w_total " +
          "ELSE (1000000L * temp_share_ppm) div raw_share_ppm END"))
      .drop("n_total", "w_total")
  }

  /** x237 knobs: sample size and the uniform's fixed-point resolution
    * (the md5-60 hash quantized to 2³⁰ levels, so the weight-unit
    * priority (w · 2³⁰) div (h₃₀+1) never floors to zero and never
    * overflows a Long). Shared with the oracle. */
  val PrioritySampleK: Int = 64
  val PriorityLevels: Long = 1L << 30

  /** Priority sampling / PPSWOR (x237): the weighted without-replacement
    * scheme with the Horvitz–Thompson-style subset-sum estimator
    * (Duffield–Lund–Thorup). Each doc draws the deterministic md5
    * uniform u = (h₃₀+1)/2³⁰ (x27's hash discipline, salt "prio"; h₃₀
    * is the hash's top 30 bits) and gets the WEIGHT-UNIT priority
    * q = (w · 2³⁰) div (h₃₀+1) ≈ w/u with w = n_chars; the sample is
    * the top-[[PrioritySampleK]] by (q desc, doc_id), the threshold τ
    * is the (k+1)-th priority, and every sampled doc estimates its
    * weight as max(w, τ) — unbiased for ANY subset sum, audited here
    * per source against the exact totals. The quantized priority rule
    * IS the contract (the md5-threshold pattern), shared with the
    * DuckDB oracle digit for digit.
    *
    * 100 TB shape: priorities are a projection off the corpus scan; the
    * top-(k+1) is TakeOrdered (per-partition heaps, never a global
    * sort); τ is a 1-row broadcast; the audit is one partial-agg'd
    * groupBy. This is how one draws a weighted eval slice from a corpus
    * without materializing per-stratum passes. */
  def prioritySample(spark: SparkSession, dir: String,
                     k: Int = PrioritySampleK): DataFrame = {
    val w = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars").as("w"))
      .withColumn("h", Dedup.md5Hash60(concat(lit("prio:"), col("doc_id").cast("string"))))
      .withColumn("h", expr(s"h div $PriorityLevels")) // top 30 bits → [0, 2³⁰)
      .withColumn("prio", expr(s"(w * $PriorityLevels) div (h + 1)"))
    // top-(k+1): TakeOrdered, then ranks inside the bounded (k+1)-row
    // frame — MATERIALIZED so the τ branch and the estimate branch don't
    // each re-run the corpus-wide priority scan
    val top = w.orderBy(col("prio").desc, col("doc_id")).limit(k + 1)
      .withColumn("rn", row_number().over( // bounded-domain window: ≤ k+1 rows
        Window.orderBy(col("prio").desc, col("doc_id"))))
      .localCheckpoint()
    val tau = top.agg(coalesce(max(when(col("rn") === k + 1, col("prio"))), lit(0L)).as("tau"))
    val est = top.filter(col("rn") <= k).crossJoin(broadcast(tau))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(greatest(col("w"), col("tau"))).as("est_sum"))
    val exact = w.groupBy(col("source")).agg(sum(col("w")).as("sum_w"))
    exact.join(est, Seq("source"), "left")
      .select(col("source"), coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
        col("sum_w"),
        coalesce(col("est_sum"), lit(0L)).as("est_sum"))
  }
}
