package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Large-scale training-data deduplication operators over the `documents`
  * table (doc_id, text, lang, source, n_chars).
  *
  * Scale design: every variant is a pure dataflow — shingle/signature
  * generation is a per-row projection (maps, no shuffle), candidate
  * generation is a shuffle on the signature/band/bucket key, and
  * verification joins only candidate pairs (never the n² cross product).
  * That is the standard 100 TB-safe shape: cost ∝ data + candidate pairs.
  */
object Dedup {

  /** Hyperplane count / candidate Hamming radius for `embeddingNearDup`
    * (x13). Shared constants: the DuckDB oracle in `SparkEntry` derives its
    * `bit_count(xor(sig)) <= r` rule and signature width from THESE values,
    * so changing a default here regenerates both sides together instead of
    * silently desyncing query and oracle. */
  val NearDupPlanes: Int = 8
  val NearDupMaxHamming: Int = 4

  /** CDC paragraph-boundary modulus (x39/x44) and x44's default
    * new-shard boundary — shared with the oracle SQL in `SparkEntry` so
    * query and oracle can only move together (same pattern as
    * NearDupPlanes, per round-3 advice). */
  val ParagraphBoundaryMod: Int = 16
  val IncrementalNewMinId: Long = 250

  /** x58 split-leakage knobs — shingle order, minimum shared shingles to
    * count a leak, stop-shingle document-frequency cap. Shared with the
    * x58 oracle SQL in `SparkEntry` (same move-together rule as
    * NearDupPlanes): the SQL interpolates these, so editing a default
    * regenerates both sides instead of silently desyncing them. */
  val LeakShingleN: Int = 5
  val LeakMinShared: Int = 3
  val LeakMaxShingleDf: Int = 100

  /** x62 exact-substring decontamination knobs — char k-gram width and the
    * benchmark-id boundary (same eval-set stand-in as x31/x43/x47).
    * Shared with the x62 oracle SQL in `SparkEntry` (move-together rule).
    * 24 chars ≈ 4–5 words of the synthetic vocabulary — wide enough that
    * chance collisions vanish (sweep: 22 chars flags 8× more docs, all
    * noise) while reformatted verbatim overlap still fires at every SF. */
  val DecontamGramChars: Int = 24
  val DecontamBenchMaxId: Long = 20

  /** x68 cross-document exact-substring dedup knobs (same move-together
    * rule — the oracle SQL interpolates them). `CrossDocMaxGramDf` is the
    * hot-gram stop-list cap (x02's discipline): a gram shared by more
    * than this many documents is boilerplate (headers, licenses,
    * navigation chrome), carries no pair-specific signal, and — left in —
    * would make the gram-bucket self-join quadratic in its df. The cap
    * bounds every bucket's pair fan-out at C(cap, 2). */
  val CrossDocMaxGramDf: Int = 20
  val CrossDocMinShared: Int = 1

  /** x68's content-defined anchor modulus: only grams whose md5-60 hash
    * is ≡ 0 (mod this) enter the pairing pipeline — CDC-style anchor
    * sampling (the same content-defined selection as x39/x44's paragraph
    * boundaries, here at gram granularity). The anchor decision is a pure
    * function of the gram's CONTENT, so two documents sharing a span
    * agree on which of its grams are anchors — no cross-engine or
    * cross-doc divergence, and the oracle replicates the rule verbatim.
    * Effect: every shuffled stage (df count, bucket build, in-bucket
    * pairing) carries 1/mod of the gram volume; detection contract
    * becomes "pairs sharing ≥ minShared ANCHORED grams" — templated
    * duplicates share runs of consecutive grams, so real dups keep
    * ~1/mod of their shared-gram count, while a pair would need ≥
    * mod·minShared-ish shared grams before anchoring to reliably fire
    * (the resolution/cost knob every suffix-sampling dedup exposes; mod
    * = 1 restores exhaustive pairing). x62's benchmark decontamination
    * deliberately does NOT anchor — a decontam miss is an eval leak, so
    * it stays exhaustive per position. */
  val CrossDocAnchorMod: Long = 4L

  /** Word n-gram shingles of `text`, distinct, as an array column.
    * Spark-side uses codegen'd higher-order functions (no UDF). */
  def wordShingles(text: Column, n: Int): Column = {
    val words = split(text, " ")
    array_distinct(
      filter(
        transform(sequence(lit(0), greatest(size(words) - n, lit(0))),
          i => when(i + n <= size(words),
            concat_ws(" ", slice(words, i + lit(1), lit(n)))).otherwise(lit(null))),
        x => x.isNotNull))
  }

  /** Exact dedup: group documents by content hash, keep the lowest doc_id as
    * the canonical representative (hash-groupBy; one shuffle on the digest). */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("content_md5"))
      .agg(min(col("doc_id")).as("canonical_doc_id"), count(lit(1)).as("dup_count"))

  /** The x269 canonical text form: ASCII case-fold + whitespace
    * collapse + trim — the C4-style normalization an exact-dedup pass
    * applies before hashing, restricted to transforms both engines
    * compute identically (no Unicode NFC — locale-sensitive). Shared
    * digit-for-digit with the oracle. */
  private[graft] def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Offset for x269's mutated-twin doc ids (collision-free at any
    * scale factor) and the twin selector (every third doc). Shared
    * with the oracle. */
  val NormTwinIdOffset: Long = 1000000000L
  val NormTwinMod: Long = 3L

  /** Normalization-aware exact dedup (x269): per source, how many MORE
    * duplicate groups collapse when documents are hashed on their
    * [[normalized]] form instead of raw bytes — the measured value of
    * the canonicalize-before-hash step every exact-dedup pipeline
    * debates. The synthetic corpus is already canonical (lowercase,
    * single-spaced), so the query FIRST injects the mess a real crawl
    * carries: every `doc_id % NormTwinMod = 0` document gets a mutated
    * twin (UPPER-cased, spaces doubled — byte-distinct, normalization-
    * identical; a deterministic rule both engines replay). Raw hashing
    * sees the twin as new content; normalized hashing collapses it —
    * so `extra_collapsed` equals the twin count per source exactly,
    * and the operator's value is measured, not asserted.
    *
    * 100 TB shape: the twin union is a second projection of the same
    * scan; digests are map-side (no text ships past its hash); one
    * partial-agg'd rollup per source. */
  def normalizedDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"), col("text"))
    val twins = docs.filter(col("doc_id") % NormTwinMod === 0)
      .select((col("doc_id") + NormTwinIdOffset).as("doc_id"), col("source"),
        upper(regexp_replace(col("text"), " ", "  ")).as("text"))
    docs.unionByName(twins)
      .select(col("source"), md5(col("text")).as("raw_md5"),
        md5(normalized(col("text"))).as("norm_md5"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("raw_md5")).as("n_raw_groups"),
        countDistinct(col("norm_md5")).as("n_norm_groups"))
      .withColumn("extra_collapsed", col("n_raw_groups") - col("n_norm_groups"))
  }

  /** Directional copy-flow between sources (x114): for every duplicated
    * PARAGRAPH (x39's CDC unit and digest — the corpus's whole-document
    * md5 groups are all singletons, but paragraphs genuinely recur),
    * the FIRST occurrence (min (doc_id, par_id) — ingest order as the
    * publication proxy, x39's first-wins rule) is the origin; every
    * later occurrence yields one (origin_source → copier_source) edge.
    * The directional complement of x92's undirected mirror pairs:
    * "who copies whom", turning dedup stats into a syndication /
    * scraper map. Self-edges (copier = origin source, including the
    * same document repeating its own paragraph) stay in the result —
    * internal boilerplate is a real signal.
    *
    * 100 TB shape: x39's paragraph derivation (one doc_id shuffle),
    * then one partial-agg'd groupBy on the digest picks each group's
    * origin via the lexicographic struct MINIMUM (x104's extrema
    * pattern — a row_number over the digest would sort the hottest
    * boilerplate paragraph's copies in one task, x39's documented
    * anti-pattern); occurrences re-join the ≥2-count origin table on
    * the digest, source labels attach via two doc-keyed equi-joins,
    * and the edge rollup is O(source²) — partial-agg'd throughout. */
  def copyDirections(spark: SparkSession, dir: String,
                     boundaryMod: Int = ParagraphBoundaryMod): DataFrame = {
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val pars = cdcParagraphs(spark, dir, boundaryMod)
      .select(col("fp"), col("doc_id"), col("par_id"))
    val origins = pars.groupBy(col("fp"))
      .agg(min(struct(col("doc_id"), col("par_id"))).as("o"),
        count(lit(1)).as("dup_count"))
      .filter(col("dup_count") >= 2)
      .select(col("fp"), col("o.doc_id").as("origin_id"),
        col("o.par_id").as("origin_par"))
    pars.join(origins, Seq("fp"))
      .filter(!(col("doc_id") === col("origin_id") &&
        col("par_id") === col("origin_par")))
      .join(src, Seq("doc_id"))
      .join(src.select(col("doc_id").as("origin_id"),
        col("source").as("origin_source")), Seq("origin_id"))
      .groupBy(col("origin_source"), col("source").as("copier_source"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("fp")).as("n_contents"))
  }

  /** N-gram Jaccard near-dup pairs, exact: explode distinct 5-gram shingles,
    * self-join on shingle (set-similarity join — only docs sharing ≥1
    * shingle ever meet), count intersections, filter on true Jaccard.
    *
    * `maxShingleDf` frequency-caps hot shingles (the standard prefix-filter
    * refinement): a shingle appearing in more than `maxShingleDf` documents
    * is a stop-shingle — it contributes O(df²) join rows while carrying no
    * similarity signal — and is excluded from candidate generation AND
    * intersection counts. Pairs that only share capped shingles are dropped
    * and Jaccard is computed over sub-cap shingles (a lower bound for pairs
    * touching capped ones). The cap is part of the operator's CONTRACT —
    * the x02/x17 oracles replicate the same df filter in SQL — so a capped
    * run is oracle-checked as capped, not as a lossy approximation of the
    * uncapped answer. The default (100) is far above the eval corpus' max
    * df (4 at sf0.1); at 100 TB it bounds the hottest key's join blow-up.
    *
    * Skew shape: the stop-list is found with a groupBy count (map-side
    * partial agg shrinks a df=10⁹ shingle to one row per mapper — a window
    * count would instead concentrate all its occurrences in one task) and
    * removed with a broadcast anti-join (stop-shingles are few by
    * definition), so the exploded side never shuffles for the cap. */
  def ngramJaccard(spark: SparkSession, dir: String, n: Int = 5, threshold: Double = 0.5,
                   maxShingleDf: Int = 100): DataFrame =
    ngramJaccard(Tables.documents(spark, dir), n, threshold, maxShingleDf)

  /** Composable form of the Jaccard pair join over any (doc_id, text)
    * frame — the building block `ClusterStage.writeClusterTable` uses to
    * cluster an arbitrary corpus snapshot, not just a `Tables.documents`
    * load. Same plan and contract as the (spark, dir) overload. */
  def ngramJaccard(docsIn: DataFrame, n: Int, threshold: Double,
                   maxShingleDf: Int): DataFrame = {
    val docs = docsIn
      .select(col("doc_id"),
        graft.functions.HashSignatures.word_shingles(col("text"), n).as("shingles"))
      .withColumn("n_sh", size(col("shingles")))
    val raw = docs.select(col("doc_id"), col("n_sh"), explode(col("shingles")).as("sh"))
    val stopShingles = raw.groupBy(col("sh"))
      .agg(count(lit(1)).as("sh_df"))
      .filter(col("sh_df") > maxShingleDf)
      .select(col("sh"))
    val exploded = raw.join(broadcast(stopShingles), Seq("sh"), "left_anti")
    val a = exploded.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a"), col("sh"))
    val b = exploded.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b"), col("sh"))
    a.join(b, Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard"))
  }

  /** Asymmetric containment pairs (x146): x02's candidate machinery,
    * but scored by CONTAINMENT — `inter/|A|` (how much of doc A lives
    * inside doc B) — instead of symmetric Jaccard. A 100-word quote
    * embedded in a 10 000-word page has Jaccard ≈ 0.01 (invisible to
    * x02) and containment ≈ 1.0; this is the detector for
    * subset-copies, the commonest real-world plagiarism/boilerplate
    * shape. The keep filter is pure integer cross-multiplication
    * (`den·inter ≥ num·n` — no float in the decision path); the two
    * containment columns are single-IEEE display divisions.
    *
    * 100 TB shape: identical to x02 — shingle-bucketed equi-join with
    * the stop-shingle df cap bounding the hot keys; the only change is
    * the scoring projection on the already-aggregated pair frame. */
  def containmentPairs(spark: SparkSession, dir: String, n: Int = 5,
                       num: Int = 4, den: Int = 5,
                       maxShingleDf: Int = 100): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.HashSignatures.word_shingles(col("text"), n).as("shingles"))
      .withColumn("n_sh", size(col("shingles")))
    val raw = docs.select(col("doc_id"), col("n_sh"), explode(col("shingles")).as("sh"))
    val stopShingles = raw.groupBy(col("sh"))
      .agg(count(lit(1)).as("sh_df"))
      .filter(col("sh_df") > maxShingleDf)
      .select(col("sh"))
    // no broadcast hint on the stop list: the >df shingle set is
    // corpus-growing on a real crawl (the x68/x72 lesson) — AQE still
    // broadcasts it when it is genuinely small
    val exploded = raw.join(stopShingles, Seq("sh"), "left_anti")
    val a = exploded.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a"), col("sh"))
    val b = exploded.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b"), col("sh"))
    a.join(b, Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("inter"))
      .filter(col("inter") * den >= col("n_a") * num ||
        col("inter") * den >= col("n_b") * num)
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"), col("inter"),
        (col("inter").cast("double") / col("n_a")).as("containment_a"),
        (col("inter").cast("double") / col("n_b")).as("containment_b"))
  }

  /** MinHash signature of a shingle array: k independent permutations
    * approximated as `(a_i * h(shingle) + b_i) mod p`, minimum per row.
    * Pure codegen'd expressions (xxhash64 + higher-order aggregate). */
  def minhashSignature(shingles: Column, k: Int): Column = {
    val p = lit(1000000007L) // prime ~2^30: keeps a*h+b well inside Long (ANSI overflow checks)
    val hashes = transform(shingles, s => pmod(xxhash64(s), p))
    array((0 until k).map { i =>
      val a = lit(2L * i + 1)
      val b = lit(7919L * (i + 1))
      array_min(transform(hashes, h => pmod(h * a + b, p)))
    }: _*)
  }

  /** MinHash + LSH banding: k=32 signature, 8 bands × 4 rows; docs sharing
    * any band bucket become candidates; candidates verified with exact
    * Jaccard (so precision is exact; LSH only bounds recall). Measured
    * recall vs the exact `ngramJaccard` pair set (RecallProbe, RECALL.md):
    * 1.0 at sf0.001/0.01, 255/256 at sf0.1 — and that is NOT a
    * correctness exposure, because every stage is built from
    * engine-neutral primitives — md5-60 shingle hashes (`md5Hash60`), the
    * `(h%P)·a+b mod P` permutations, md5-of-slice band buckets — so the
    * driver oracle replicates the WHOLE algorithm in DuckDB SQL
    * (`SparkEntry.minhashOracleSql`): a pair the banding drops is
    * (identically) absent from both engines.
    *
    * Scale shape: the signature is ONE fused codegen pass
    * (`graft.functions.MinHashSignature` — the HOF formulation paid k
    * lambda passes and CollapseProject duplicated the shingle hashing into
    * all k trees); band join shuffles only (band, bucket, doc_id) — ~40
    * bytes/row, never the shingle arrays; candidate pairs dedup before the
    * arrays are fetched back for exact verification. Band buckets are
    * uniform hashes → skew-free shuffle keys at 100 TB. */
  /** Shared MinHash banding machinery: from any (doc_id, text) frame,
    * the signature table (doc_id, hs — the fused shingle-hash set) and
    * the band table (doc_id, band, bucket). Used by minhashLsh (x03) and
    * the band-index ingest family (x96) so candidate generation can
    * never diverge between the batch pair join and the incremental
    * path. */
  /** The band-index family's shared LSH knobs (shingle n, minhash k,
    * band count) — ONE definition so the batch operators and the
    * streaming ingesters can never drift (every default below and the
    * `DocumentStream` appliers read these). */
  val BandShingleN: Int = 5
  val BandMinhashK: Int = 32
  val BandBands: Int = 8

  /** The fused shingle pass alone: split → n-gram → md5-60 → distinct
    * (array<long>) — all downstream set math runs on the long hashes,
    * never the strings. Split out of [[bandFrames]] so a caller can
    * materialize THIS frame once and derive the band table from the
    * materialization (the streaming appliers' single-pass contract). */
  private[graft] def sigFrame(docsIn: DataFrame, n: Int): DataFrame = {
    import graft.functions.HashSignatures.word_shingle_hashes
    docsIn
      .select(col("doc_id"), word_shingle_hashes(col("text"), n, useMd5 = true).as("hs"))
      .filter(size(col("hs")) > 0)
  }

  /** The band table derived from a (doc_id, hs) signature frame. */
  private[graft] def bandedFromSigs(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    import graft.functions.HashSignatures.minhash_sig
    val rowsPerBand = k / bands
    sigs
      .select(col("doc_id"), minhash_sig(col("hs"), k).as("sig"))
      .select(
        col("doc_id"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            md5(array_join(transform(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand),
              h => h.cast("string")), ",")).as("bucket"))
        }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
  }

  private[graft] def bandFrames(docsIn: DataFrame, n: Int, k: Int,
                                bands: Int): (DataFrame, DataFrame) = {
    val docs = sigFrame(docsIn, n)
    (docs, bandedFromSigs(docs, k, bands))
  }

  /** x255 knobs, shared with the oracle: candidate pairs whose bounded
    * edit distance exceeds [[LevThreshold]] are rejected (-1); verified
    * distances fold into [[LevBandWidth]]-wide census bands. */
  val LevThreshold: Int = 6
  val LevBandWidth: Int = 2

  /** Bounded edit-distance verification of the LSH candidates (x255) —
    * the second-stage verifier a production dedup runs when shingle
    * Jaccard is too coarse (near-identical docs with small in-place
    * edits): x03's banded candidate pairs re-verified with
    * `levenshtein(a, b, threshold)` — Spark's BANDED implementation
    * stops at [[LevThreshold]] (O(threshold · len) per pair, returning
    * -1 past it) instead of filling the full O(len²) matrix, which is
    * the only affordable form at corpus scale. Output is the census of
    * pairs per [[LevBandWidth]]-wide distance band (rejected = band
    * -1), so the oracle (full DuckDB levenshtein + the same CASE)
    * audits both the distances and the cutoff.
    *
    * 100 TB shape: the candidate set is the banded-LSH one (never
    * all-pairs); texts join onto it by doc id; the per-pair kernel is
    * bounded by the threshold, not the document length product. */
  /** x255's candidate-pair frame — x03's banded LSH candidates (the
    * same 5/32/8 knobs as `minhashLsh`'s defaults and its oracle's
    * literals) joined to both texts. Shared with `tools.LevProfile` so
    * the kernel profile always prices the exact frame the query
    * verifies. */
  private[graft] def editCandidatePairs(raw: DataFrame): DataFrame = {
    val (_, banded) = bandFrames(raw, 5, 32, 8)
    val bandA = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
    val bandB = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
    val candidates = bandA.join(bandB, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val ta = raw.select(col("doc_id").as("doc_a"), col("text").as("text_a"))
    val tb = raw.select(col("doc_id").as("doc_b"), col("text").as("text_b"))
    candidates.join(ta, Seq("doc_a")).join(tb, Seq("doc_b"))
  }

  def editDistanceDedup(spark: SparkSession, dir: String): DataFrame = {
    editCandidatePairs(Tables.documents(spark, dir))
      .withColumn("d", levenshtein(col("text_a"), col("text_b"), LevThreshold))
      .withColumn("dist_band",
        when(col("d") < 0, lit(-1L)).otherwise(expr(s"d div $LevBandWidth")))
      .groupBy(col("dist_band"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("d")).cast("long").as("min_d"),
        max(col("d")).cast("long").as("max_d"))
  }

  def minhashLsh(spark: SparkSession, dir: String, n: Int = 5, k: Int = 32,
                 bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    val (docs, banded) = bandFrames(Tables.documents(spark, dir), n, k, bands)
    val bandA = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
    val bandB = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
    val candidates = bandA.join(bandB, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val shA = docs.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"))
    val shB = docs.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"))
    candidates.join(shA, Seq("doc_a")).join(shB, Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("hs_a"), col("hs_b"))))
      .withColumn("jaccard",
        col("inter") / (size(col("hs_a")) + size(col("hs_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** x96 knobs — the new-batch boundary (x44's convention) and the
    * verify threshold on the hashed-shingle Jaccard (x03's rule). Shared
    * with the oracle SQL. */
  val BandIngestNewMinId: Long = 250L
  val BandIngestThreshold: Double = 0.3

  /** Verified near-dup partners of `probe` docs among `base` docs:
    * band-bucket candidates (x03's banding, via [[bandFrames]] outputs)
    * re-checked with exact hashed-shingle Jaccard ≥ threshold. `pred`
    * restricts candidate pairs (e.g. first-occurrence-wins inside a
    * batch). Returns (doc_id, partner) distinct. */
  private def verifiedPartners(probeBands: DataFrame, probeSigs: DataFrame,
                               baseBands: DataFrame, baseSigs: DataFrame,
                               threshold: Double,
                               pred: Column): DataFrame = {
    val cand = probeBands
      .join(baseBands
        .withColumnRenamed("doc_id", "partner"), Seq("band", "bucket"))
      .filter(pred)
      .select(col("doc_id"), col("partner"))
      .dropDuplicates("doc_id", "partner")
    cand
      .join(probeSigs, Seq("doc_id"))
      .join(baseSigs.select(col("doc_id").as("partner"), col("hs").as("hs_p")),
        Seq("partner"))
      .withColumn("inter", size(array_intersect(col("hs"), col("hs_p"))))
      .filter(col("inter") / (size(col("hs")) + size(col("hs_p")) - col("inter"))
        >= threshold)
      .select(col("doc_id"), col("partner"))
  }

  /** Classification core shared by the in-flight (x96 query) and
    * persisted-index ingest paths: every batch doc becomes
    * dup_of_existing (≥1 verified partner in the index — rep is the
    * minimum such partner), else dup_in_batch (≥1 verified SMALLER-id
    * batch partner — first-occurrence-wins, x44's rule), else kept
    * (rep = itself). */
  private def classifyBatch(batchIds: DataFrame,
                            bSigs: DataFrame, bBands: DataFrame,
                            exSigs: DataFrame, exBands: DataFrame,
                            threshold: Double): DataFrame = {
    val exP = verifiedPartners(bBands, bSigs, exBands, exSigs, threshold, lit(true))
      .groupBy(col("doc_id"))
      .agg(min(col("partner")).as("rep_ex"), count(lit(1)).as("n_ex"))
    val inP = verifiedPartners(bBands, bSigs, bBands, bSigs, threshold,
      col("partner") < col("doc_id"))
      .groupBy(col("doc_id"))
      .agg(min(col("partner")).as("rep_in"), count(lit(1)).as("n_in"))
    batchIds.select(col("doc_id"))
      .join(exP, Seq("doc_id"), "left")
      .join(inP, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("n_ex").isNotNull, "dup_of_existing")
          .when(col("n_in").isNotNull, "dup_in_batch")
          .otherwise("kept").as("status"),
        when(col("n_ex").isNotNull, col("rep_ex"))
          .when(col("n_in").isNotNull, col("rep_in"))
          .otherwise(col("doc_id")).as("rep_id"),
        coalesce(col("n_ex"), lit(0L)).as("n_existing_partners"),
        coalesce(col("n_in"), lit(0L)).as("n_batch_partners"))
  }

  /** Incremental near-dup ingest (x96): classify a NEW batch of
    * documents against the already-ingested corpus without rescanning it
    * — the day-2 production contract for MinHash dedup, completing the
    * trilogy of staged artifacts (paragraph digests
    * `writeParagraphIndex` / cluster labels `ClusterStage` / this band
    * index). Each new doc is checked for verified near-dup partners
    * (x03's band-candidate + exact hashed-shingle Jaccard rule) first
    * against the EXISTING corpus, then within the batch
    * (first-occurrence-wins): statuses dup_of_existing / dup_in_batch /
    * kept with the minimum verified partner as rep — x44's paragraph
    * vocabulary at document granularity.
    *
    * This standalone query splits the corpus at `newMinId` (docs below =
    * indexed corpus, docs at/above = today's batch) and builds both
    * sides' band frames in-flight so the oracle covers the full
    * algorithm; `ingestWithBandIndex` is the persisted-artifact twin
    * (spec-proven identical), where the existing side is two narrow
    * parquet reads.
    *
    * 100 TB shape: the index is O(docs·(k/bands + 1)) NARROW rows
    * (signature hashes + band buckets — ~1/1000th corpus bytes), built
    * once per snapshot and appended per batch (`appendToBandIndex`,
    * staged like the paragraph-index delta). Day-N classification costs
    * O(batch) band hashing + a bucketed equi-join touching only buckets
    * the batch lands in + exact verify on candidate pairs alone — the
    * corpus text is NEVER rescanned, and a batch with no near-dups
    * shuffles almost nothing. Hot template buckets inherit x03's df
    * shape (AQE skew-join territory); the hs arrays ride the verify join
    * only for candidate pairs, x03's documented wide-payload bound. */
  def incrementalBandIngest(spark: SparkSession, dir: String,
                            newMinId: Long = BandIngestNewMinId,
                            n: Int = BandShingleN, k: Int = BandMinhashK, bands: Int = BandBands,
                            threshold: Double = BandIngestThreshold): DataFrame = {
    val all = Tables.documents(spark, dir)
    val (exSigs, exBands) = bandFrames(all.filter(col("doc_id") < newMinId), n, k, bands)
    val (bSigs, bBands) = bandFrames(all.filter(col("doc_id") >= newMinId), n, k, bands)
    classifyBatch(all.filter(col("doc_id") >= newMinId), bSigs, bBands,
      exSigs, exBands, threshold)
  }

  /** Persist the band index for a corpus snapshot: two narrow tables,
    * `<path>/sigs` (doc_id, hs) and `<path>/bands` (doc_id, band,
    * bucket). The signature table is what verify reads; the band table
    * is what candidates join. */
  def writeBandIndex(docs: DataFrame, indexPath: String,
                     n: Int = BandShingleN, k: Int = BandMinhashK, bands: Int = BandBands): Unit = {
    val (sigs, banded) = bandFrames(docs, n, k, bands)
    sigs.write.mode("overwrite").parquet(s"$indexPath/sigs")
    banded.write.mode("overwrite").parquet(s"$indexPath/bands")
  }

  /** Day-N ingest against the persisted band index — identical
    * classification to `incrementalBandIngest` (spec-proven) with the
    * existing side read from the two index tables instead of re-derived
    * from corpus text. */
  def ingestWithBandIndex(spark: SparkSession, newBatch: DataFrame,
                          indexPath: String,
                          n: Int = BandShingleN, k: Int = BandMinhashK, bands: Int = BandBands,
                          threshold: Double = BandIngestThreshold): DataFrame = {
    val (bSigs, bBands) = bandFrames(newBatch, n, k, bands)
    classifyBatch(newBatch, bSigs, bBands,
      graft.streaming.IngestCommit.readStage(spark, s"$indexPath/sigs"),
      graft.streaming.IngestCommit.readStage(spark, s"$indexPath/bands"), threshold)
  }

  /** [[ingestWithBandIndex]] with the batch's band frames PRECOMPUTED —
    * the streaming applier reuses the same (sigs, bands) pair for the
    * classification AND the index delta, so each micro-batch pays the
    * fused tokenize+minhash pass once, not twice. */
  private[graft] def ingestWithBandFrames(spark: SparkSession, batchIds: DataFrame,
                                          bSigs: DataFrame, bBands: DataFrame,
                                          indexPath: String,
                                          threshold: Double = BandIngestThreshold): DataFrame =
    classifyBatch(batchIds, bSigs, bBands,
      graft.streaming.IngestCommit.readStage(spark, s"$indexPath/sigs"),
      graft.streaming.IngestCommit.readStage(spark, s"$indexPath/bands"), threshold)

  /** [[ingestClustersWithIndex]] with the batch's band frames
    * precomputed — same single-pass contract for the cluster applier. */
  private[graft] def ingestClustersWithFrames(spark: SparkSession, batchIds: DataFrame,
                                              bSigs: DataFrame, bBands: DataFrame,
                                              bandIndexPath: String,
                                              clusterTablePath: String,
                                              threshold: Double = BandIngestThreshold): DataFrame =
    incrementalClusters(batchIds, bSigs, bBands,
      graft.streaming.IngestCommit.readStage(spark, s"$bandIndexPath/sigs"),
      graft.streaming.IngestCommit.readStage(spark, s"$bandIndexPath/bands"),
      ClusterStage.readClusterTable(spark, clusterTablePath), threshold)

  /** Append a new batch's signatures + bands to the index (the
    * paragraph-index staging discipline: the delta is written to a
    * sibling dir first so index readers and writers never overlap, then
    * appended; the staging dirs are removed best-effort). Append-only —
    * existing index files are immutable. */
  def appendToBandIndex(spark: SparkSession, newBatch: DataFrame,
                        indexPath: String,
                        n: Int = BandShingleN, k: Int = BandMinhashK, bands: Int = BandBands): Unit = {
    val (sigs, banded) = bandFrames(newBatch, n, k, bands)
    Seq(("sigs", sigs), ("bands", banded)).foreach { case (sub, df) =>
      val staged = s"${indexPath.stripSuffix("/")}_${sub}_delta_staging"
      df.write.mode("overwrite").parquet(staged)
      spark.read.parquet(staged).write.mode("append").parquet(s"$indexPath/$sub")
      val p = new org.apache.hadoop.fs.Path(staged)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  /** Incremental cluster maintenance (x98): assign cluster labels to a
    * NEW batch of documents given the snapshot's staged cluster table
    * (`ClusterStage`) and band index (x96) — the day-2 path for the
    * cluster artifact, completing the staged trilogy's maintenance story
    * (paragraph index / band index / now cluster labels). Each batch doc
    * gets:
    *   - `joins_existing` + the EXISTING canonical when its connected
    *     component (over verified near-dup links) reaches any indexed
    *     cluster — links to existing docs are resolved to their
    *     canonical via the cluster table, so the label space stays
    *     consistent with x17;
    *   - `new_cluster` + the min batch doc_id of its component when it
    *     links only within the batch;
    *   - `singleton` + itself when it links to nothing.
    *
    * Connectivity is computed ONLY over the batch graph (batch↔batch
    * links plus batch→canonical anchor edges) with the same large/small-
    * star CC engine as x17 — O(batch edges), never a re-clustering of
    * the corpus. Links use the band index's similarity (band candidates
    * + exact hashed-shingle Jaccard ≥ threshold, x96's rule); the
    * snapshot labels themselves carry x17's exact-shingle rule — the
    * documented split between how a SNAPSHOT is clustered (full
    * re-cluster, periodic) and how a DAY'S batch is attached
    * (index-driven, incremental). Existing labels are APPEND-ONLY: a new
    * doc that bridges two existing clusters takes the smaller canonical
    * and the bridge collapses at the next periodic full re-cluster —
    * the standard production compromise, stated rather than hidden.
    *
    * The standalone query splits the corpus at `newMinId` (x44's
    * convention) and builds the snapshot artifacts in-flight so the
    * oracle covers the full algorithm; `ingestClustersWithIndex` is the
    * persisted-artifact twin (spec-proven identical), whose plan reads
    * ONLY the two index tables + the cluster table + the batch. Caller
    * contract for the generic path: batch doc_ids are strictly GREATER
    * than every snapshot id (monotonic ingest ids, x44's convention) —
    * that is what makes the component-minimum rule resolve to an
    * existing canonical whenever one is reachable. */
  def incrementalClusterIngest(spark: SparkSession, dir: String,
                               newMinId: Long = BandIngestNewMinId,
                               n: Int = BandShingleN, k: Int = BandMinhashK, bands: Int = BandBands,
                               threshold: Double = BandIngestThreshold): DataFrame = {
    val all = Tables.documents(spark, dir)
    val existing = all.filter(col("doc_id") < newMinId)
    val batch = all.filter(col("doc_id") >= newMinId)
    val (exSigs, exBands) = bandFrames(existing, n, k, bands)
    val (bSigs, bBands) = bandFrames(batch, n, k, bands)
    incrementalClusters(batch, bSigs, bBands, exSigs, exBands,
      nearDupClusters(existing, 5, 0.3), threshold)
  }

  /** Persisted-artifact form of x98: the existing side is the band index
    * (x96) and the staged cluster table (`ClusterStage`) — no corpus
    * text is read for the snapshot. */
  def ingestClustersWithIndex(spark: SparkSession, newBatch: DataFrame,
                              bandIndexPath: String, clusterTablePath: String,
                              n: Int = BandShingleN, k: Int = BandMinhashK, bands: Int = BandBands,
                              threshold: Double = BandIngestThreshold): DataFrame = {
    val (bSigs, bBands) = bandFrames(newBatch, n, k, bands)
    incrementalClusters(newBatch, bSigs, bBands,
      graft.streaming.IngestCommit.readStage(spark, s"$bandIndexPath/sigs"),
      graft.streaming.IngestCommit.readStage(spark, s"$bandIndexPath/bands"),
      ClusterStage.readClusterTable(spark, clusterTablePath), threshold)
  }

  private def incrementalClusters(batchIds: DataFrame,
                                  bSigs: DataFrame, bBands: DataFrame,
                                  exSigs: DataFrame, exBands: DataFrame,
                                  exClusters: DataFrame,
                                  threshold: Double): DataFrame = {
    // batch→existing links, resolved to the existing CANONICAL node
    val canonLink = verifiedPartners(bBands, bSigs, exBands, exSigs, threshold, lit(true))
      .join(exClusters.withColumnRenamed("doc_id", "partner"), Seq("partner"))
      .select(col("doc_id"), col("canonical_id").as("node"))
      .distinct()
    // batch↔batch links (one direction; the CC engine symmetrizes)
    val linkIn = verifiedPartners(bBands, bSigs, bBands, bSigs, threshold,
      col("partner") < col("doc_id"))
    val edges = linkIn.select(col("partner").as("doc_a"), col("doc_id").as("doc_b"))
      .union(canonLink.select(col("node").as("doc_a"), col("doc_id").as("doc_b")))
    val labels = ConnectedComponents.components(edges)
      .select(col("node").as("doc_id"), col("component"))
    val exCanon = exClusters.select(col("canonical_id")).distinct()
      .withColumn("is_existing", lit(1))
    batchIds.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("canonical_id", coalesce(col("component"), col("doc_id")))
      .join(exCanon, Seq("canonical_id"), "left")
      .select(col("doc_id"), col("canonical_id"),
        when(col("is_existing").isNotNull, "joins_existing")
          .when(col("component").isNotNull, "new_cluster")
          .otherwise("singleton").as("status"))
  }

  /** Embedding-cosine near-duplicate pairs, LSH-bucketed: candidate pairs
    * are those whose 8-plane hyperplane signatures (`HashSignatures
    * .hyperplane_sig`, same deterministic ±1 matrix as `Similarity.lshTopK`)
    * differ in ≤ `maxHamming` bits; candidates are verified with exact
    * cosine ≥ threshold. Candidate generation is a multi-probe EQUI-join:
    * side A explodes each signature XOR every mask with popcount ≤
    * maxHamming, side B keeps the raw signature — a hash join on an int
    * key, never a cartesian. Each qualifying pair matches on exactly one
    * mask (m = sig_a XOR sig_b), so no dedup pass is needed.
    *
    * The operator's contract is the LSH semantics themselves — "Hamming ≤ r
    * candidates, exact-cosine verified" — and the DuckDB oracle replicates
    * exactly that (signature matrix baked into SQL via `Similarity
    * .hyperplaneSigSql` + `bit_count(xor(...)) <= r`), the same
    * algorithm-oracle pattern as x10. Recall vs the all-pairs baseline
    * (`embeddingNearDupExact`, kept test-only) is measured by
    * `graft.tools.RecallProbe` — ~90% on the evaluation corpus, whose pairs
    * sit AT the 0.4 threshold (the hardest regime for angular LSH: split
    * probability 0.37/plane); at realistic near-dup thresholds (cos ≥ 0.8,
    * split 0.2/plane) radius 4 of 8 captures virtually all pairs while
    * pruning. At 100 TB, `planes` scales up with corpus size (the 2^planes
    * bucket count is the shuffle key space) and the mask fan-out stays a
    * plan-time constant. */
  def embeddingNearDup(spark: SparkSession, dir: String, threshold: Double = 0.4,
                       planes: Int = NearDupPlanes,
                       maxHamming: Int = NearDupMaxHamming): DataFrame = {
    import graft.functions.VectorFunctions.cosine_sim
    val signs = Similarity.hyperplaneSigns(planes)
    val masks: Seq[Int] =
      (0 until (1 << planes)).filter(m => Integer.bitCount(m) <= maxHamming)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
      .withColumn("sig", graft.functions.HashSignatures.hyperplane_sig(col("v"), signs))
    // candidate generation rides only (id, signature) — the mask explosion
    // multiplies rows by |masks|, so the 64-double vectors must NOT be on
    // that side (same discipline as minhashLsh's band join); vectors join
    // back by id for the exact verify of surviving candidates only
    val slim = emb.select(col("vec_id"), col("sig"))
    val a = slim.select(col("vec_id").as("vec_a"),
      explode(array(masks.map(m => col("sig").bitwiseXOR(lit(m))): _*)).as("probe"))
    val b = slim.select(col("vec_id").as("vec_b"), col("sig"))
    val cand = a.join(b, a("probe") === b("sig") && col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"))
    val va = emb.select(col("vec_id").as("vec_a"), col("v").as("va"))
    val vb = emb.select(col("vec_id").as("vec_b"), col("v").as("vb"))
    cand.join(va, Seq("vec_a")).join(vb, Seq("vec_b"))
      .withColumn("cos_sim", cosine_sim(col("va"), col("vb")))
      .filter(col("cos_sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), Similarity.trunc6(col("cos_sim")).as("cos_sim"))
  }

  /** Semantic near-duplicate removal over embeddings (x78) — the
    * SemDeDup-shaped terminal step over x13's pair detection: drop every
    * vector that has a LOWER-id near-duplicate partner (first-occurrence
    * wins, x72's convention — pairwise greedy, not the full CC canonical,
    * which is x17's job). Detection and removal share one definition: the
    * pairs are `embeddingNearDup`'s, and the oracle reuses x13's CTEs
    * verbatim.
    *
    * 100 TB shape: flagged ids are one column off the bucketed pair join;
    * the removal anti-join runs on vec_id with NO broadcast hint — on a
    * real embedding corpus the near-dup side is corpus-scale (that is why
    * one dedups), so it must be free to run as a shuffled anti-join (the
    * x72 argument). */
  def semanticDeduped(spark: SparkSession, dir: String, threshold: Double = 0.4,
                      planes: Int = NearDupPlanes,
                      maxHamming: Int = NearDupMaxHamming): DataFrame =
    semanticDeduped(Tables.embeddings(spark, dir),
      embeddingNearDup(spark, dir, threshold, planes, maxHamming))

  /** Composable overload: removal over precomputed near-dup pairs, so a
    * pipeline that already ran x13 pays detection once. */
  def semanticDeduped(embeddings: DataFrame, pairs: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), col("label"))
      .join(pairs.select(col("vec_b").as("vec_id")).distinct(),
        Seq("vec_id"), "left_anti")

  /** The all-pairs O(n²) exact twin of `embeddingNearDup` — the correctness
    * baseline `RecallProbe` measures bucketed recall against. Test-only
    * (like `TextAnalysis.winnowingFingerprintsHof`): the theta join
    * compiles to a broadcast nested-loop, the canonical 100 TB scale-killer. */
  private[graft] def embeddingNearDupExact(spark: SparkSession, dir: String,
                                           threshold: Double = 0.4): DataFrame = {
    import graft.functions.VectorFunctions.cosine_sim
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val a = emb.select(col("vec_id").as("vec_a"), col("v").as("va"))
    val b = emb.select(col("vec_id").as("vec_b"), col("v").as("vb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos_sim", cosine_sim(col("va"), col("vb")))
      .filter(col("cos_sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), Similarity.trunc6(col("cos_sim")).as("cos_sim"))
  }

  /** Near-duplicate cluster assignment: connected components over the
    * exact-Jaccard near-dup graph, each doc labeled with the minimum doc_id
    * reachable from it (the canonical representative an LLM dedup pipeline
    * keeps). CC runs via alternating large-star/small-star contraction
    * (`ConnectedComponents.components`) — O(log n) rounds on ANY component
    * shape, vs the diameter-bounded min-label propagation kept below as
    * the test twin. The near-dup join runs once (the CC operator
    * checkpoints internally); singleton docs rejoin at the end as their
    * own canonical. Deterministic — oracle is a recursive CTE in DuckDB. */
  def nearDupClusters(spark: SparkSession, dir: String, n: Int = 5,
                      threshold: Double = 0.3): DataFrame =
    nearDupClusters(Tables.documents(spark, dir), n, threshold)

  /** Composable form of x17 over any (doc_id, text) frame — what
    * `ClusterStage.writeClusterTable` persists. Same plan as the
    * (spark, dir) overload (which delegates here). */
  def nearDupClusters(docs: DataFrame, n: Int, threshold: Double): DataFrame = {
    val pairs = ngramJaccard(docs, n, threshold, 100).select(col("doc_a"), col("doc_b"))
    val labels = ConnectedComponents.components(pairs)
    docs.select(col("doc_id"))
      .join(labels.select(col("node").as("doc_id"), col("component")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("canonical_id"))
  }

  /** Near-dup-deduplicated corpus (x57): the shipping artifact a dedup
    * pipeline actually produces — every document that is its own
    * cluster's canonical representative (min doc_id; singletons are their
    * own canonical), i.e. the corpus with one survivor per near-dup
    * cluster. Composes x17's cluster labels with one semi-join on doc_id;
    * the deterministic min-id canonical rule makes the kept set a pure
    * function of the data (stable under reruns — the property a
    * downstream training job needs from its input corpus). */
  def nearDedupedCorpus(spark: SparkSession, dir: String, n: Int = 5,
                        threshold: Double = 0.3): DataFrame =
    nearDedupedCorpus(spark, dir, ClusterStage.clusters(spark, dir, n, threshold))

  /** Composable form of x57 (x38's pattern): selection over an
    * ALREADY-COMPUTED cluster assignment, so a real pipeline runs the
    * Jaccard join + connected components once and feeds the cached
    * labels to the report (x17), the sampler (x38), and this corpus
    * materialization. Proven ≡ the standalone form in OperatorsSpec. */
  def nearDedupedCorpus(spark: SparkSession, dir: String, clusters: DataFrame): DataFrame = {
    val canonical = clusters
      .filter(col("doc_id") === col("canonical_id"))
      .select(col("doc_id"))
    Tables.documents(spark, dir)
      .join(canonical, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
  }

  /** Best-member cluster keep (x70): one survivor per near-dup cluster,
    * chosen by QUALITY rather than x57's min-id rule — rank cluster
    * members on (source priority if given, longest document, doc_id) and
    * keep the first. This is the selection real curation pipelines run
    * (keep the canonical/most-complete copy of a syndicated article, or
    * the copy from the most trusted source), where min-id is only a
    * determinism fallback. Output: the kept doc per cluster with its
    * cluster id and member count.
    *
    * Scale shape: the per-cluster argmin is `min_by` over a lexicographic
    * struct key — a partial-aggregable GROUP BY (map-side combine, no
    * sort, no window over the corpus), so the one shuffle carries
    * pre-combined (cluster → best-so-far) rows. Cluster keys are near-dup
    * components (bounded size, ~uniform), not hot keys. */
  def bestKeepCorpus(spark: SparkSession, dir: String, n: Int = 5,
                     threshold: Double = 0.3,
                     priority: Map[String, Int] = Map.empty): DataFrame =
    bestKeepCorpus(spark, dir, ClusterStage.clusters(spark, dir, n, threshold), priority)

  /** Composable form of x70 (x57's pattern): best-member selection over
    * an ALREADY-COMPUTED cluster assignment, so one CC run feeds
    * x17/x38/x57 and this. `priority` maps source → rank (lower wins);
    * unlisted sources rank below every listed one, and an empty map (the
    * oracle-checked default) makes the rule pure longest-member. */
  def bestKeepCorpus(spark: SparkSession, dir: String, clusters: DataFrame,
                     priority: Map[String, Int]): DataFrame = {
    val prio: Column =
      if (priority.isEmpty) lit(0)
      else priority.foldLeft(lit(priority.values.max + 1)) { case (acc, (src, p)) =>
        when(col("source") === lit(src), lit(p)).otherwise(acc)
      }
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      .join(clusters, Seq("doc_id"))
      .groupBy(col("canonical_id").as("cluster_id"))
      .agg(
        min_by(
          struct(col("doc_id"), col("source"), col("lang"), col("n_chars")),
          struct(prio.as("p"), (-col("n_chars")).as("neg_chars"), col("doc_id"))).as("best"),
        count(lit(1)).as("n_members"))
      .select(col("cluster_id"), col("best.doc_id").as("doc_id"),
        col("best.source").as("source"), col("best.lang").as("lang"),
        col("best.n_chars").as("n_chars"), col("n_members"))
  }

  /** Train/eval split-leakage audit (x58): after a deterministic split
    * (x27's md5-bucket rule, recomputed inline — a pure function of
    * doc_id, so no join against the split table), find eval/valid
    * documents sharing ≥ minShared distinct n-gram shingles with ANY
    * train document — near-dups straddling the split boundary leak eval
    * signal into training, the check every pipeline should run after
    * splitting. Same capped set-similarity join shape as x02 (stop-
    * shingle df cap via partial-agg + broadcast anti-join, never a
    * window; the two split-side branches each scan the corpus once —
    * x02's documented linear-cost trade). Output: one row per leaked
    * eval doc with its partner count and worst overlap. */
  def splitLeakage(spark: SparkSession, dir: String, n: Int = LeakShingleN,
                   minShared: Int = LeakMinShared,
                   maxShingleDf: Int = LeakMaxShingleDf): DataFrame = {
    val split = Sampling.splitLabel(Sampling.hashBucket(col("doc_id"), "split", 100))
    val raw = Tables.documents(spark, dir)
      .select(col("doc_id"), split.as("split"),
        explode(graft.functions.HashSignatures.word_shingles(col("text"), n)).as("sh"))
    val stop = raw.groupBy(col("sh")).agg(count(lit(1)).as("sh_df"))
      .filter(col("sh_df") > maxShingleDf).select(col("sh"))
    val capped = raw.join(broadcast(stop), Seq("sh"), "left_anti")
    val evalSide = capped.filter(col("split") =!= "train")
      .select(col("doc_id").as("eval_doc"), col("split"), col("sh"))
    val trainSide = capped.filter(col("split") === "train")
      .select(col("doc_id").as("train_doc"), col("sh"))
    evalSide.join(trainSide, Seq("sh"))
      .groupBy(col("eval_doc"), col("split"), col("train_doc"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .groupBy(col("eval_doc"), col("split"))
      .agg(count(lit(1)).as("n_train_partners"), max(col("shared")).as("max_shared"))
  }

  /** Min-label propagation CC — rounds = component diameter. Kept as the
    * independent test twin the star-contraction variant is checked against
    * (DedupSpec asserts identical labels); fine when components are tiny,
    * a stall risk on chain-shaped components at scale. */
  private[graft] def nearDupClustersPropagation(spark: SparkSession, dir: String, n: Int = 5,
                                                threshold: Double = 0.3, maxIters: Int = 20): DataFrame = {
    val pairs = ngramJaccard(spark, dir, n, threshold).select(col("doc_a"), col("doc_b"))
    // materialize the edge list ONCE — without this every propagation
    // iteration would re-execute the whole Jaccard set-similarity join
    val edges = pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .toDF("src", "dst")
      .localCheckpoint()
    // propagate only over docs that have an edge; singletons are trivially
    // their own canonical and rejoin at the end (most docs, at any scale)
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("label", col("doc_id"))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val nbrMin = labels.join(edges, labels("doc_id") === edges("src"))
        .groupBy(col("dst")).agg(min(col("label")).as("nbr_min"))
      val updated = labels.join(nbrMin, labels("doc_id") === nbrMin("dst"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("new_label"),
          col("label"))
      changed = updated.filter(col("new_label") < col("label")).count()
      labels = updated.select(col("doc_id"), col("new_label").as("label"))
        .localCheckpoint() // truncate lineage across iterations
      iter += 1
    }
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("canonical_id"))
  }

  /** Benchmark decontamination: corpus documents sharing ≥ `minShared`
    * word n-grams with any benchmark/eval document (here: doc_id <
    * `benchMaxId` stands in for the eval set) — the overlap check every
    * LLM pipeline runs so training data can't leak its eval sets.
    *
    * Scale shape: the BENCHMARK side is broadcast (eval sets are small by
    * definition), so the 100 TB corpus is never shuffled on the shingle
    * key — it streams through a broadcast hash join and only the surviving
    * (doc, bench) hits shuffle for the count. */
  def contaminationPairs(spark: SparkSession, dir: String, n: Int = 5,
                         benchMaxId: Long = 20, minShared: Int = 3): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.HashSignatures.word_shingles(col("text"), n)).as("sh"))
    val bench = sh.filter(col("doc_id") < benchMaxId)
      .select(col("doc_id").as("bench_id"), col("sh"))
    sh.filter(col("doc_id") >= benchMaxId)
      .join(broadcast(bench), Seq("sh"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** x257's flagging bar: a train doc containing ≥ this fraction (ppm)
    * of an eval doc's distinct shingles is a contamination hit. */
  val ContainMinPpm: Long = 100000L

  /** Eval-containment strength (x257) — x31 refined the way the
    * dedup literature actually scores contamination: per (eval doc,
    * train doc) pair, the CONTAINMENT fraction |shared distinct
    * shingles| / |eval doc's distinct shingles| (directional — how much
    * of the BENCHMARK is inside the train doc, which is what leaks),
    * folded per eval doc to the release-review panel: shingle count,
    * how many train docs exceed [[ContainMinPpm]], the worst
    * containment seen, and the worst offender's id (min id at the max,
    * deterministic). x31 counts shared occurrences past a fixed bar;
    * this measures the severity spectrum the auditor actually reads.
    *
    * 100 TB shape: identical to x31 — the benchmark side is broadcast
    * (eval suites are small by definition), shingles are per-doc
    * DISTINCT before the join so a repeated phrase can't inflate
    * containment, and the corpus never shuffles. */
  def containmentScores(spark: SparkSession, dir: String, n: Int = 5,
                        benchMaxId: Long = 20): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.HashSignatures.word_shingles(col("text"), n)).as("sh"))
      .distinct()
    val bench = sh.filter(col("doc_id") < benchMaxId)
      .select(col("doc_id").as("bench_id"), col("sh"))
    val benchSizes = bench.groupBy(col("bench_id"))
      .agg(count(lit(1)).as("n_bench_sh"))
    val pairs = sh.filter(col("doc_id") >= benchMaxId)
      .join(broadcast(bench), Seq("sh"))
      .groupBy(col("bench_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(benchSizes), Seq("bench_id"))
      .withColumn("ppm", expr("(1000000L * n_shared) div n_bench_sh"))
    // per-bench max first (a window over the tiny pair frame), then the
    // one-row-per-eval-doc fold picks the deterministic worst offender
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("bench_id"))
    pairs.withColumn("best", max(col("ppm")).over(w))
      .groupBy(col("bench_id"))
      .agg(max(col("n_bench_sh")).as("n_bench_sh"),
        sum(when(col("ppm") >= ContainMinPpm, 1L).otherwise(0L)).as("n_flagged"),
        max(col("ppm")).as("max_ppm"),
        min(when(col("ppm") === col("best"), col("doc_id"))).as("worst_doc"))
  }

  /** Paragraph-level exact dedup (x39) — the C4/RefinedWeb-style
    * intra-corpus boilerplate killer: split every document into paragraphs,
    * drop each paragraph that already occurred anywhere earlier in the
    * corpus (first occurrence by (doc_id, par_id) wins), and re-assemble
    * each document from its surviving paragraphs in order.
    *
    * Paragraph boundaries are CONTENT-DEFINED (CDC-style): a word whose
    * engine-neutral `md5Hash60` is ≡ 0 (mod `boundaryMod`) starts a new
    * paragraph, giving ~boundaryMod-word chunks whose boundaries move WITH
    * the content — an insertion only re-cuts its own chunk, so near-dup
    * documents still share identical paragraphs (a fixed positional split
    * would misalign after the first edit; a real newline corpus would just
    * use `split(text, '\n\n')` as the segmenter and keep every other stage
    * unchanged). The synthetic corpus has no newlines, so the CDC cut is
    * also what makes the operator testable here.
    *
    * Scale shape (three shuffles, all on uniform or bounded keys):
    * word explode is a per-row flatMap; paragraph assembly shuffles on
    * doc_id ONCE — the running boundary count and the (doc_id, par_id)
    * grouping both run on that partitioning (`HashPartitioning(doc_id)`
    * satisfies the grouping's clustered distribution, so Catalyst inserts
    * no second exchange) and per-task state is bounded by document length,
    * never corpus size; first-occurrence detection is a groupBy on the
    * paragraph digest (map-side partial agg collapses a boilerplate
    * paragraph's 10⁹ copies to one row per mapper — the same hot-key
    * discipline as x02's stop-shingle cap; a row_number-over-digest window
    * would instead sort ALL copies of the hottest boilerplate paragraph in
    * one task, which is exactly the key distribution this operator exists
    * to handle); the keep-check join back on digest matches exactly one
    * `firsts` row per paragraph (no fan-out; AQE's skew-join split handles
    * a mega-hot digest's own row count); re-assembly shuffles on doc_id,
    * computing totals, kept counts AND the re-joined text in the SAME
    * aggregate (`collect_list` skips the nulls the non-kept flag produces),
    * so the paragraph subtree is instantiated exactly twice — once feeding
    * the digest aggregate, once the keep-join — the minimum a skew-safe
    * declarative formulation pays (collapsing to one would force an
    * imperative corpus-sized materialization). */
  def paragraphDedup(spark: SparkSession, dir: String,
                     boundaryMod: Int = ParagraphBoundaryMod): DataFrame =
    paragraphDedup(Tables.documents(spark, dir), boundaryMod)

  /** DataFrame-first form of x39 for composition into user pipelines:
    * any frame with (doc_id: long, text: string) columns. The
    * (spark, dir) form above exists for the query contract and
    * delegates here. */
  def paragraphDedup(docs: DataFrame, boundaryMod: Int): DataFrame = {
    val pars = cdcParagraphs(docs, boundaryMod)
    val firsts = pars.groupBy(col("fp"))
      .agg(min(struct(col("doc_id"), col("par_id"))).as("first"))
    pars.join(firsts, Seq("fp"))
      .withColumn("is_first",
        (col("doc_id") === col("first.doc_id") && col("par_id") === col("first.par_id"))
          .cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pars"), sum(col("is_first")).as("n_kept"),
        array_join(transform(array_sort(collect_list(
          when(col("is_first") === 1L, struct(col("par_id"), col("par"))))),
          s => s.getField("par")), " ").as("clean_text"))
      .select(col("doc_id"), col("n_pars").cast("int").as("n_pars"),
        col("n_kept").cast("int").as("n_kept"), col("clean_text"))
  }

  /** CDC paragraph segmentation shared by x39/x44: one row per
    * (doc_id, par_id) with the re-joined paragraph text and its md5
    * digest. Boundary rule and dataflow documented at [[paragraphDedup]];
    * one shuffle on doc_id (running boundary count + paragraph grouping
    * share the partitioning). */
  private[graft] def cdcParagraphs(spark: SparkSession, dir: String,
                                   boundaryMod: Int): DataFrame =
    cdcParagraphs(Tables.documents(spark, dir), boundaryMod)

  private[graft] def cdcParagraphs(docs: DataFrame, boundaryMod: Int): DataFrame = {
    val words = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .toDF("doc_id", "pos", "w")
    val runningBoundaries = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, 0)
    words
      .withColumn("bd",
        when(pmod(md5Hash60(col("w")), lit(boundaryMod.toLong)) === 0, 1L).otherwise(0L))
      .withColumn("par_id", sum(col("bd")).over(runningBoundaries))
      .groupBy(col("doc_id"), col("par_id"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("pos"), col("w")))),
        s => s.getField("w")), " ").as("par"))
      .withColumn("fp", md5(col("par")))
  }

  /** Incremental (snapshot) paragraph dedup (x44): clean a NEW shard
    * against the paragraph-digest index of the EXISTING corpus — the daily
    * ingestion shape of a C4-style pipeline, where yesterday's corpus is
    * immutable and only today's crawl must be deduped both AGAINST it and
    * WITHIN itself. Every new paragraph is classified kept /
    * dup_of_existing / dup_in_batch (within-batch first occurrence by
    * (doc_id, par_id) wins, same rule as x39), aggregated per document.
    *
    * Scale shape: the existing side reduces to a DISTINCT digest set
    * (map-side partial agg; in production this index is precomputed once
    * and reused across daily runs — here it derives from the same table
    * for self-containment); both classification joins are on the uniform
    * md5 digest key; final rollup shuffles on doc_id. With newMinId = 0
    * the existing side is empty and per-doc kept counts equal x39's
    * (asserted in the spec). */
  def incrementalParagraphDedup(spark: SparkSession, dir: String,
                                newMinId: Long = IncrementalNewMinId,
                                boundaryMod: Int = ParagraphBoundaryMod): DataFrame =
    incrementalParagraphDedup(Tables.documents(spark, dir), newMinId, boundaryMod)

  /** DataFrame-first form of x44: `docs` is the union of existing corpus
    * and new shard, with the shard boundary at `newMinId` (a production
    * caller instead passes yesterday's digest index — see Scaladoc
    * above). */
  def incrementalParagraphDedup(docs: DataFrame, newMinId: Long,
                                boundaryMod: Int): DataFrame = {
    val pars = cdcParagraphs(docs, boundaryMod)
    // ONE digest-index aggregate answers both classification questions —
    // "seen in the existing corpus?" and "first occurrence in the batch?"
    // — so the paragraph subtree is instantiated twice (index + probe),
    // the same skew-safe minimum as x39, instead of three times with
    // separate existing/batch aggregates
    val fpIndex = pars.groupBy(col("fp")).agg(
      max((col("doc_id") < newMinId).cast("int")).as("in_existing"),
      min(when(col("doc_id") >= newMinId,
        struct(col("doc_id"), col("par_id")))).as("first"))
    pars.filter(col("doc_id") >= newMinId)
      .join(fpIndex, Seq("fp"))
      .withColumn("status",
        when(col("in_existing") === 1, "dup_of_existing")
          .when(col("doc_id") =!= col("first.doc_id")
            || col("par_id") =!= col("first.par_id"), "dup_in_batch")
          .otherwise("kept"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pars"),
        sum((col("status") === "kept").cast("long")).as("n_kept"),
        sum((col("status") === "dup_of_existing").cast("long")).as("n_dup_existing"),
        sum((col("status") === "dup_in_batch").cast("long")).as("n_dup_batch"))
      .select(col("doc_id"), col("n_pars").cast("int").as("n_pars"),
        col("n_kept").cast("int").as("n_kept"),
        col("n_dup_existing").cast("int").as("n_dup_existing"),
        col("n_dup_batch").cast("int").as("n_dup_batch"))
  }

  /** Char-level decontaminated corpus (x64): x47's removal step driven by
    * the exact-substring detector instead of the word-shingle one — every
    * non-benchmark document with NO verbatim `DecontamGramChars`-char
    * overlap against any benchmark doc, i.e. the corpus a pipeline ships
    * after the stronger second decontamination pass (x62 flags, this
    * removes). Same scale shape as x47: the flagged-id set is a tiny
    * fraction of the corpus by construction, so removal is one broadcast
    * anti-join on doc_id and the corpus is never shuffled. */
  def substringDecontaminate(spark: SparkSession, dir: String,
                             k: Int = DecontamGramChars,
                             benchMaxId: Long = DecontamBenchMaxId): DataFrame = {
    val flagged = exactSubstringContamination(spark, dir, k, benchMaxId)
      .select(col("doc_id"))
    Tables.documents(spark, dir)
      .filter(col("doc_id") >= benchMaxId)
      .join(broadcast(flagged), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
  }

  /** The x44 production contract made real: the paragraph-digest index
    * as a PERSISTED parquet table, so day-2 ingest reads yesterday's
    * index instead of rescanning the immutable corpus (the Scaladoc
    * above promises exactly this; DedupSpec proves the day-2 plan scans
    * only index + batch). The index is digests-only — one narrow column
    * of md5 strings, ~1/1000th the corpus bytes at typical paragraph
    * sizes — and is built with the same map-side-partial distinct as the
    * in-line x44 index. */
  def writeParagraphIndex(docs: DataFrame, indexPath: String,
                          boundaryMod: Int = ParagraphBoundaryMod): Unit =
    cdcParagraphs(docs, boundaryMod).select(col("fp")).distinct()
      .write.mode("overwrite").parquet(indexPath)

  /** Day-N index maintenance: append the batch's genuinely new digests
    * (anti-join keeps the index duplicate-free, so repeated appends stay
    * idempotent per batch). Append-only — the existing index files are
    * immutable, the daily delta is a new file set. The delta is STAGED
    * to a sibling directory before the append: a plan that reads
    * `indexPath` while a write commits into the same path is legal for
    * append today but fragile across committer/file-index changes, so
    * the job that scans the index and the job that mutates it never
    * overlap. The staging dir is removed afterwards (best-effort — a
    * leftover is harmless and overwritten by the next run). */
  def appendToParagraphIndex(spark: SparkSession, newBatch: DataFrame,
                             indexPath: String,
                             boundaryMod: Int = ParagraphBoundaryMod): Unit = {
    val staged = indexPath.stripSuffix("/") + "_delta_staging"
    cdcParagraphs(newBatch, boundaryMod).select(col("fp")).distinct()
      .join(graft.streaming.IngestCommit.readStage(spark, indexPath), Seq("fp"), "left_anti")
      .write.mode("overwrite").parquet(staged)
    spark.read.parquet(staged).write.mode("append").parquet(indexPath)
    val p = new org.apache.hadoop.fs.Path(staged)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** Day-2+ ingest against the persisted index: classify every paragraph
    * of the NEW batch kept / dup_of_existing / dup_in_batch — identical
    * semantics and schema to `incrementalParagraphDedup` (spec-proven
    * equal on a two-batch fixture) — without touching the existing
    * corpus: "seen before?" is a LEFT join against the digest table,
    * "first in batch?" is a batch-sized aggregate. Cost is O(batch) +
    * O(index), the property that makes daily ingest constant-time as the
    * corpus grows. Both joins key on the uniform md5 digest. */
  def incrementalIngestWithIndex(spark: SparkSession, newBatch: DataFrame,
                                 indexPath: String,
                                 boundaryMod: Int = ParagraphBoundaryMod): DataFrame = {
    val existing = graft.streaming.IngestCommit.readStage(spark, indexPath)
      .select(col("fp"), lit(1).as("in_existing"))
    val pars = cdcParagraphs(newBatch, boundaryMod)
    val batchFirst = pars.groupBy(col("fp"))
      .agg(min(struct(col("doc_id"), col("par_id"))).as("first"))
    pars.join(batchFirst, Seq("fp"))
      .join(existing, Seq("fp"), "left")
      .withColumn("status",
        when(col("in_existing") === 1, "dup_of_existing")
          .when(col("doc_id") =!= col("first.doc_id")
            || col("par_id") =!= col("first.par_id"), "dup_in_batch")
          .otherwise("kept"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pars"),
        sum((col("status") === "kept").cast("long")).as("n_kept"),
        sum((col("status") === "dup_of_existing").cast("long")).as("n_dup_existing"),
        sum((col("status") === "dup_in_batch").cast("long")).as("n_dup_batch"))
      .select(col("doc_id"), col("n_pars").cast("int").as("n_pars"),
        col("n_kept").cast("int").as("n_kept"),
        col("n_dup_existing").cast("int").as("n_dup_existing"),
        col("n_dup_batch").cast("int").as("n_dup_batch"))
  }

  /** Bloom-filter decontamination (x43): same contract as
    * `contaminationPairs` (x31) — corpus documents sharing ≥ `minShared`
    * n-gram shingles with any benchmark document — but the corpus side is
    * prefiltered by a CONSTANT-SIZE Bloom filter of the benchmark shingle
    * set before any join. The bloom is built distributed (bit positions
    * from `numHashes` salted md5-60 hashes, words OR-combined in one tiny
    * aggregate), then collected as MODEL STATE (m/8 bytes on the driver —
    * the KMeans-centroid pattern, NOT a data collect) and baked into the
    * plan as one array literal; membership is a per-row bit-test
    * expression, so the 100 TB corpus never shuffles and never probes a
    * hash table for the overwhelming majority of shingles that miss.
    *
    * Two-phase exactness: bloom hits (true matches + ~(kn/m)^k false
    * positives) proceed to the SAME broadcast verify join as x31, which
    * eliminates false positives — so the OUTPUT is bit-identical to x31
    * (asserted in DedupSpec; the oracle is x31's SQL). The bloom's win
    * over x31 at scale: the probe-side join volume drops from every
    * corpus shingle to only near-hits, and when the benchmark set is too
    * big to broadcast as ROWS it still fits as BITS (a 10⁸-shingle eval
    * suite is ~3 GB of strings but 180 MB of bloom at 10 bits/key). */
  def bloomDecontamination(spark: SparkSession, dir: String, n: Int = 5,
                           benchMaxId: Long = 20, minShared: Int = 3,
                           bloomBits: Int = 1 << 16, numHashes: Int = 3): DataFrame = {
    require(Integer.bitCount(bloomBits) == 1, "bloomBits must be a power of two")
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.HashSignatures.word_shingles(col("text"), n)).as("sh"))
    def bitPos(c: Column, k: Int): Column =
      pmod(md5Hash60(concat(lit(s"bf$k:"), c)), lit(bloomBits.toLong))
    val bench = sh.filter(col("doc_id") < benchMaxId)
      .select(col("doc_id").as("bench_id"), col("sh"))
    // distributed bloom build: explode each bench shingle into its k bit
    // positions, partial-agg OR per 64-bit word — the shuffle carries at
    // most bloomBits/64 rows no matter how large the benchmark set is
    val words = bench.select(explode(array((0 until numHashes).map(k =>
        bitPos(col("sh"), k)): _*)).as("pos"))
      .groupBy(shiftright(col("pos"), 6).cast("int").as("w"))
      .agg(expr("bit_or(shiftleft(1L, CAST(pos & 63 AS INT)))").as("bits"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val bloom = Array.tabulate(bloomBits / 64)(i => words.getOrElse(i, 0L))
    val bloomLit = typedLit(bloom.toSeq)
    // the word lookup nests the array literal; the variable-amount bit
    // shift goes through SQL (the Scala shiftright helper only accepts a
    // constant shift), referencing named intermediate columns
    val withBits = (0 until numHashes).foldLeft(sh.filter(col("doc_id") >= benchMaxId)) {
      (df, k) =>
        df.withColumn(s"_pos$k", bitPos(col("sh"), k))
          .withColumn(s"_word$k",
            element_at(bloomLit, shiftright(col(s"_pos$k"), 6).cast("int") + 1))
    }
    val mightMatch = (0 until numHashes)
      .map(k => s"((shiftright(_word$k, CAST((_pos$k & 63) AS INT))) & 1L) = 1L")
      .mkString(" AND ")
    withBits
      .filter(expr(mightMatch)) // constant-state per-row prefilter: no shuffle, no probe
      .select(col("doc_id"), col("sh"))
      .join(broadcast(bench), Seq("sh")) // exact verify kills bloom false positives
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Decontaminated corpus (x47): the REMOVAL step that turns the
    * contamination report (x31/x43 — which docs overlap the benchmark)
    * into the cleaned training set a pipeline actually ships: every
    * non-benchmark document with NO ≥`minShared`-shingle overlap against
    * any benchmark doc. Detection runs through the bloom-prefiltered path
    * (x43) and removal is one left-anti join on doc_id — the contaminated
    * id set is a tiny fraction of the corpus by construction, so the
    * anti-join broadcasts. */
  def decontaminate(spark: SparkSession, dir: String, n: Int = 5,
                    benchMaxId: Long = 20, minShared: Int = 3): DataFrame = {
    val contaminated = bloomDecontamination(spark, dir, n, benchMaxId, minShared)
      .select(col("doc_id")).distinct()
    Tables.documents(spark, dir)
      .filter(col("doc_id") >= benchMaxId)
      .join(broadcast(contaminated), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
  }

  /** Per-row distinct char-k-gram hash array: every k-char substring of
    * `text`, hashed with the engine-neutral [[md5Hash60]]. Backed by the
    * fused `CharGramHashes` kernel — one byte-level pass per row with a
    * thread-local digest, vs the HOF chain's interpreted lambda per
    * position (measured ~2× on the x62 bench entry). [[charGramHashesHof]]
    * is the declarative twin the kernel is spec-proven identical to
    * (including multibyte boundaries). Callers must pre-filter
    * `length(text) >= k` (kept for plan-pruning parity; the kernel itself
    * returns empty below k). O(len·k) hashing per row; see
    * `exactSubstringContamination` for why that beats a non-verifiable
    * O(len) rolling hash here. */
  private[graft] def charGramHashes(text: Column, k: Int): Column =
    graft.functions.HashSignatures.char_gram_hashes(text, k)

  /** The declarative HOF formulation of [[charGramHashes]] (sequence →
    * transform → array_distinct over built-ins) — kept as the kernel's
    * independent test twin. Spark's `sequence(1, n)` runs DESCENDING when
    * n < 1, so callers must pre-filter `length(text) >= k`. */
  private[graft] def charGramHashesHof(text: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(1), length(text) - lit(k - 1)),
      i => md5Hash60(text.substr(i, lit(k)))))

  /** Exact-substring benchmark decontamination (x62): corpus documents
    * sharing ANY verbatim k-CHAR substring with a benchmark document —
    * the character-level complement to x31/x43's word-shingle overlap.
    * Word tokenization splits reformatted verbatim text (changed
    * whitespace/punctuation) into different shingles; a char k-gram match
    * is tokenization-independent, so this is the standard stronger second
    * pass every eval-decontamination stage runs. Output: one row per
    * contaminated corpus doc with its distinct benchmark-partner count
    * and distinct matching-gram count.
    *
    * Scale shape (the x31 broadcast discipline, no corpus shuffle):
    * the BENCHMARK side (small by definition) explodes its gram hashes
    * and broadcasts; the corpus side computes its per-row gram array
    * in-projection ([[charGramHashes]]), explodes map-side, and streams
    * through the broadcast hash join — only the surviving (doc, bench)
    * hits shuffle into the final count aggregate. Per-position md5 costs
    * O(len·k) vs a Karp–Rabin rolling hash's O(len), but it is pure
    * per-row CPU inside whole-stage codegen (no shuffle, no memory
    * pressure — never the bottleneck of the stage) and md5-60 is
    * engine-neutral, which makes the WHOLE operator an algorithm oracle
    * in DuckDB (substr+md5 over unnest(range)); a 64-bit polynomial roll
    * needs wrapping multiplication DuckDB's BIGINT refuses. */
  def exactSubstringContamination(spark: SparkSession, dir: String,
                                  k: Int = DecontamGramChars,
                                  benchMaxId: Long = DecontamBenchMaxId): DataFrame = {
    def grams(df: DataFrame): DataFrame =
      df.filter(length(col("text")) >= k)
        .select(col("doc_id"), explode(charGramHashes(col("text"), k)).as("gh"))
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val bench = grams(docs.filter(col("doc_id") < benchMaxId))
      .withColumnRenamed("doc_id", "bench_id")
    grams(docs.filter(col("doc_id") >= benchMaxId))
      .join(broadcast(bench), Seq("gh"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("bench_id")).as("n_bench_partners"),
        countDistinct(col("gh")).as("n_gram_hits"))
  }

  /** Cross-document exact-substring duplicate pairs (x68): every corpus
    * doc pair (doc_a < doc_b) sharing at least `minShared` verbatim
    * k-char substrings — the Lee-et-al-style corpus-vs-corpus complement
    * to x62's corpus-vs-benchmark decontamination (see "Deduplicating
    * Training Data Makes Language Models Better", Lee et al. 2022, for
    * why exact substring dup detection matters beyond doc-level near-dup:
    * templated pages share long verbatim spans while differing enough
    * that whole-doc MinHash misses them). Output: one row per duplicated
    * pair with its distinct shared-gram count.
    *
    * Scale shape — anchor-sample, bucket by gram hash, pair within
    * bucket, NEVER all-pairs: the corpus computes its distinct per-row
    * gram array in-projection (the fused [[charGramHashes]] kernel) and
    * keeps only content-defined ANCHOR grams (`hash ≡ 0 mod
    * CrossDocAnchorMod`) before the explode, so every downstream shuffle
    * moves 1/mod of the gram volume — the standard sampling step of
    * suffix/gram dedup at corpus scale, deterministic per content so the
    * oracle replicates it; grams whose document frequency exceeds
    * `maxGramDf` (boilerplate —
    * carrying no pair-specific signal) are dropped via a partial-agg df
    * count + anti-join with NO broadcast hint: on a real crawl the
    * >maxGramDf gram set GROWS with the corpus (license headers,
    * navigation chrome — the same reasoning x72 uses for its removal
    * join and x82 for owner-min aggregation), so the planner must stay
    * free to shuffle it; AQE still broadcasts whenever the measured
    * stop-list is genuinely small. The surviving grams then take ONE
    * shuffle on the uniform md5-60 hash into per-gram doc-id buckets —
    * `collect_set` is safe ONLY because the cap already bounds every
    * bucket at `maxGramDf` ids (the order matters: df-filter first,
    * collect second, or a hot gram would buffer its million doc ids
    * before being dropped) — and ordered pairs explode in-bucket with
    * fan-out ≤ C(maxGramDf, 2). This replaces the textbook gram
    * self-join, which would shuffle the gram table twice more and build
    * a join hash table per partition; the df-agg and bucket-agg branches
    * share one exchange via reuse, so the corpus grams move exactly
    * once. */
  def crossDocSubstringPairs(spark: SparkSession, dir: String,
                             k: Int = DecontamGramChars,
                             maxGramDf: Int = CrossDocMaxGramDf,
                             minShared: Int = CrossDocMinShared,
                             anchorMod: Long = CrossDocAnchorMod): DataFrame =
    crossDocSubstringPairs(Tables.documents(spark, dir), k, maxGramDf, minShared, anchorMod)

  /** DataFrame-first form of x68 (the composable-overload pattern): any
    * (doc_id, text) frame — a day's crawl, a pre-filtered corpus — not
    * just the catalog table. */
  def crossDocSubstringPairs(docs: DataFrame, k: Int,
                             maxGramDf: Int, minShared: Int,
                             anchorMod: Long): DataFrame = {
    require(anchorMod >= 1L, "anchorMod must be >= 1 (1 = exhaustive)")
    val grams = docs
      .filter(length(col("text")) >= k)
      .select(col("doc_id"),
        explode(filter(charGramHashes(col("text"), k),
          h => h % lit(anchorMod) === 0)).as("gh"))
    val stop = grams.groupBy(col("gh")).agg(count(lit(1)).as("gh_df"))
      .filter(col("gh_df") > maxGramDf).select(col("gh"))
    // no broadcast hint: the stop-list is corpus-growing on real crawls
    // (boilerplate), so let AQE pick broadcast vs shuffle from its size
    val buckets = grams.join(stop, Seq("gh"), "left_anti")
      .groupBy(col("gh"))
      .agg(array_sort(collect_set(col("doc_id"))).as("ids")) // ≤ maxGramDf ids, post-cap
    val pairs = flatten(transform(col("ids"), (a, i) =>
      transform(slice(col("ids"), i + lit(2), size(col("ids"))),
        b => struct(a.as("doc_a"), b.as("doc_b")))))
    buckets.select(explode(pairs).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_grams"))
      .filter(col("n_shared_grams") >= minShared)
  }

  /** Cross-document exact-substring DEDUPLICATED corpus (x72): x68's
    * removal step, first-occurrence-wins at doc granularity — drop every
    * document that shares a (capped) verbatim k-char gram with ANY
    * lower-id document, i.e. the doc_b side of the x68 pair report. A
    * document survives iff it has no lower-id substring partner, so the
    * kept set is a pure function of the data (rerun-stable), and the
    * rule composes with x68 exactly (oracle reuses the pair CTEs).
    *
    * Unlike x47/x64 — where the flagged set is benchmark-contamination,
    * tiny by construction, and the anti-join broadcasts — cross-corpus
    * duplication is a large FRACTION of a web corpus (30–50% in
    * published crawls), so the removal anti-join deliberately carries NO
    * broadcast hint: on real data it must run as a shuffled anti-join on
    * the uniform doc_id key. */
  def crossDocSubstringDedup(spark: SparkSession, dir: String,
                             k: Int = DecontamGramChars,
                             maxGramDf: Int = CrossDocMaxGramDf): DataFrame = {
    val flagged = crossDocSubstringPairs(spark, dir, k, maxGramDf, minShared = 1)
      .select(col("doc_b").as("doc_id")).distinct()
    Tables.documents(spark, dir)
      .join(flagged, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
  }

  /** Per-source dedup-rate report (x90): for every source, how many
    * documents the near-dup clustering keeps (cluster canonicals) vs
    * drops — the per-source duplication scorecard a crawl pipeline
    * publishes with each release (duplication rate is a strong
    * source-quality signal: mirror-heavy sources dedup away). One
    * corpus-keyed equi-join of the (doc_id, canonical_id) cluster table
    * against the doc→source projection, then a partial-agg'd shuffle on
    * the small source key; all counts integer, and the oracle reuses
    * x17's cluster CTEs verbatim (the rates cannot diverge from the
    * clustering). Reads the staged cluster artifact (`ClusterStage`), so
    * the scorecard never re-runs clustering. */
  def dedupRates(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"), col("source"))
      .join(ClusterStage.clusters(spark, dir), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("doc_id") === col("canonical_id"), 1L).otherwise(0L))
          .as("n_canonical"))
      .withColumn("n_dropped", col("n_docs") - col("n_canonical"))

  /** Cross-source mirror detection (x92): source pairs that share
    * near-dup clusters, with the shared-cluster count — the signal that
    * two "sources" are actually mirrors/syndicators of each other (a
    * crawl curation step drops or merges heavy mirror pairs before
    * mixture weighting). From the cluster table: distinct
    * (cluster, source) memberships self-join on the cluster id with
    * source_a < source_b — a cluster-keyed equi-join whose per-cluster
    * fan-out is bounded by C(|sources in cluster|, 2) ≤ C(n_sources, 2),
    * never all-pairs over docs; then a partial-agg'd count on the tiny
    * source-pair key. Oracle reuses x17's cluster CTEs verbatim. Reads
    * the staged cluster artifact (`ClusterStage`) — the parquet read is
    * what makes the self-join cheap (two scans of a two-column table,
    * zero CC re-runs). */
  def sourceMirrorPairs(spark: SparkSession, dir: String): DataFrame = {
    val memberships = ClusterStage.clusters(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("canonical_id"), col("source"))
      .distinct()
    memberships.as("a")
      .join(memberships.as("b"),
        col("a.canonical_id") === col("b.canonical_id")
          && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(countDistinct(col("a.canonical_id")).as("n_shared_clusters"))
  }

  /** Span-level cross-document dedup report (x82): for every document,
    * the merged character spans it would LOSE under first-occurrence-wins
    * span removal — Lee et al.'s actual removal granularity (x72 drops
    * whole documents; production exact-substring dedup cuts only the
    * repeated spans and keeps the rest). A position is flagged when its
    * anchored k-gram also occurs in a LOWER-id document (the gram's
    * "owner"); flagged [pos, pos+k) intervals merge into spans with the
    * classic gaps-and-islands window (running max of interval ends, new
    * island on a gap, both pure integer ops — replicated verbatim in the
    * oracle). Output: one row per affected doc with span count and
    * removed/kept char totals.
    *
    * 100 TB shape: per-position hashes come from the fused kernel with
    * the SAME content-defined anchor sampling as x68 (1/mod of positions
    * enter the pipeline; anchors land every ~mod chars, and k ≫ mod, so
    * consecutive anchored intervals overlap and merged islands still
    * cover long shared spans end-to-end). Owner resolution is a
    * partial-agg'd min per gram hash — NO pair explosion and therefore
    * no df cap: a boilerplate gram shared by a million docs costs one
    * aggregate row, and span removal is exactly how boilerplate SHOULD
    * be handled (every doc loses it except the global first occurrence).
    * Shuffles: gram-hash agg + join-back, then one doc-keyed window.
    * The owner branch deliberately re-derives the anchored-gram subtree
    * (a second linear kernel pass — map-side, parallel, x42's documented
    * trade) instead of attaching owners with a per-gram window: a
    * boilerplate gram's window partition is corpus-sized, exactly the
    * hot-key funnel this operator must survive. */
  def spanDedupStats(spark: SparkSession, dir: String,
                     k: Int = DecontamGramChars,
                     anchorMod: Long = CrossDocAnchorMod): DataFrame = {
    import graft.functions.HashSignatures.char_gram_pos_hashes
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val anchored = docs.filter(length(col("text")) >= k)
      .select(col("doc_id"), length(col("text")).cast("long").as("doc_chars"),
        posexplode(char_gram_pos_hashes(col("text"), k)).as(Seq("pos", "gh")))
      .filter(col("gh") % lit(anchorMod) === 0)
    val owner = anchored.groupBy(col("gh")).agg(min(col("doc_id")).as("owner"))
    val flagged = anchored.join(owner, Seq("gh"))
      .filter(col("doc_id") > col("owner"))
      .select(col("doc_id"), col("doc_chars"), col("pos").cast("long").as("pos"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val runEnd = max(col("pos") + k)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val islands = flagged
      .withColumn("nw", when(runEnd.isNull || col("pos") >= runEnd, 1L).otherwise(0L))
      .withColumn("island", sum(col("nw")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(any_value(col("doc_chars")).as("doc_chars"),
        min(col("pos")).as("s"), (max(col("pos")) + k).as("e"))
    islands.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s")).as("chars_removed"),
        (any_value(col("doc_chars")) - sum(col("e") - col("s"))).as("chars_kept"))
  }

  /** 64-bit SimHash from word hashes: sum ±1 per bit position weighted by
    * token occurrence, sign → bit. Computed with codegen'd higher-order
    * functions over the token array — no UDF, no shuffle until the band join. */
  def simhash(text: Column): Column = {
    val hashes = transform(split(text, " "), w => xxhash64(w))
    (0 until 64).map { bit =>
      val ones = size(filter(hashes, h => shiftright(h, bit).bitwiseAND(1) === 1))
      val total = size(hashes)
      // bit set iff more than half the token hashes have it set
      when(ones * 2 > total, shiftleft(lit(1L), bit)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Engine-neutral 60-bit token hash: the first 15 hex chars of md5 parsed
    * as a long. Spark computes it as `conv(substr(md5(w),1,15),16,10)`,
    * DuckDB as `('0x' || substr(md5(w),1,15))::BIGINT` — bit-identical, so
    * every pipeline built on it (SimHash here, the minhash signatures in
    * x03's oracle) is expressible in BOTH engines. 15 chars (not 16) keeps
    * the value non-negative and inside a signed 64-bit long in both. */
  def md5Hash60(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Driver-side Scala twin of [[md5Hash60]] (same bytes as the fused
    * kernels) — for test references that need the hash outside a plan. */
  private[graft] def md5Hash60Ref(s: String): Long = graft.functions.Md5Long.hash60(s)

  /** SimHash near-dup pairs: 4 × 16-bit bands (any-band-equal candidates →
    * hamming-distance verify ≤ maxHamming). Same LSH shape as minhashLsh:
    * shuffle on (band, 16-bit chunk), verify only candidates. Signature via
    * the fused codegen kernel (`graft.functions.SimHash64` — one pass over
    * the token hashes instead of 64 filter scans).
    *
    * Token hashes are the engine-neutral `md5Hash60` (not xxhash64), which
    * makes the WHOLE pipeline — token hashing, per-bit majority vote,
    * 16-bit banding, Hamming verify — replicable in DuckDB SQL: the driver
    * oracle (`SparkEntry.simhashOracleSql`) recomputes it end-to-end. Only
    * bits 0..59 can ever be set; the top nibble is constantly zero on both
    * sides. */
  /** The per-band SimHash collision frame shared by x04's pair join and
    * x179's precision audit: (doc_id, sh, band, chunk) with one 16-bit
    * chunk per (doc, band). */
  private def simhashBanded(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.HashSignatures.{simhash64, token_md5_hashes}
    Tables.documents(spark, dir)
      .select(col("doc_id"), simhash64(token_md5_hashes(col("text"))).as("sh"))
      .select(col("doc_id"), col("sh"),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("band"), shiftright(col("sh"), b * 16).bitwiseAND(0xFFFFL).as("chunk"))
        }: _*)).as("bb"))
      .select(col("doc_id"), col("sh"), col("bb.band"), col("bb.chunk"))
  }

  def simhashPairs(spark: SparkSession, dir: String, maxHamming: Int = 8): DataFrame = {
    val banded = simhashBanded(spark, dir)
    val a = banded.select(col("band"), col("chunk"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("chunk"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** x179's Hamming verify bound — x04's default, hoisted so the audit
    * and the pair join share it with the oracle. */
  val SimhashMaxHamming: Int = 8

  /** SimHash banding precision audit (x179): per 16-bit band, how many
    * of its collision candidates survive the Hamming ≤
    * [[SimhashMaxHamming]] verify — the x130 discipline (measured
    * candidate quality as a first-class artifact) applied to the OTHER
    * LSH family: x130 audits MinHash-Jaccard banding, this audits
    * SimHash banding. A band whose precision collapses is wasting its
    * verify budget (too few bits for the corpus); the ppm column is the
    * knob-tuning signal for band width vs verify cost at 100 TB, where
    * the verify join is the dominant post-banding expense.
    *
    * Candidates are keyed PER BAND (a pair colliding in 2 bands is
    * audited in both — the quantity is verify work per band; x130's
    * convention). Per (doc, band) there is exactly one chunk, so the
    * band join emits each (band, pair) at most once — no dedup needed.
    * One corpus scan for signatures, the banded self-join (the x04
    * shuffle), one partial-agg'd groupBy onto O(bands) rows. */
  def simhashPrecision(spark: SparkSession, dir: String,
                       maxHamming: Int = SimhashMaxHamming): DataFrame = {
    val banded = simhashBanded(spark, dir)
    val a = banded.select(col("band"), col("chunk"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("chunk"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("ok",
        (bit_count(col("sh_a").bitwiseXOR(col("sh_b"))) <= maxHamming).cast("long"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_candidates"), sum(col("ok")).as("n_verified"))
      .withColumn("precision_ppm", expr("(1000000L * n_verified) div n_candidates"))
  }

  /** x53's sketch size and shingle width, shared with the oracle SQL. */
  val OverlapSketchK: Int = 128
  val OverlapShingleN: Int = 4

  /** Source-overlap matrix via KMV Jaccard (x53): for every source pair,
    * estimate the Jaccard similarity of their distinct-shingle SETS from
    * per-source bottom-k sketches — the corpus-diversity / provenance-
    * overlap report that tells a data-mixing step which crawls duplicate
    * each other, without ever joining corpus against corpus.
    *
    * Estimator (Broder): with X = the k smallest hashes of A ∪ B
    * (computable from the two sketches alone), J ≈ |X ∩ sk(A) ∩ sk(B)| /
    * |X| — |X| = min(k, |A ∪ B|), so when both sets are smaller than k
    * the sketches are exhaustive and the estimate IS the exact Jaccard.
    * At 100 TB only the one sketch aggregate sees the corpus (O(k)
    * mergeable state per source, map-side combined; the kmv_value_sample
    * hash-key dedup makes per-source DISTINCT shingles free). The fitted
    * sketch table is MODEL STATE — n_sources × k longs, like fitted
    * centroids or a bloom bit-array — and is collected once: a self-join
    * on the live aggregate would instead instantiate the corpus-scan
    * subtree once per side (alias-differentiated exchanges don't reuse).
    * The pair stage is a broadcast cross of driver-local tiny tables
    * (the x09/x18 accepted BNLJ pattern) over codegen'd array HOFs.
    * md5-60 hashes keep the whole estimate engine-neutral: the oracle
    * replicates sketches, union-top-k, and the match count exactly —
    * the right epistemics for an approximate statistic. */
  def sourceOverlap(spark: SparkSession, dir: String,
                    k: Int = OverlapSketchK): DataFrame = {
    import graft.functions.KmvValueSample.kmv_value_sample
    val sh = Tables.documents(spark, dir)
      .select(col("source"),
        explode(graft.functions.HashSignatures.word_shingles(col("text"), OverlapShingleN)).as("sh"))
    val h = md5Hash60(col("sh"))
    val fitted = sh.groupBy(col("source")).agg(kmv_value_sample(h, h, k).as("sig"))
      .where(col("sig").isNotNull)
      .collect().toSeq.map(r => (r.getString(0), r.getSeq[Long](1)))
    val sk = spark.createDataFrame(fitted).toDF("source", "sig")
    val pairs = sk.select(col("source").as("src_a"), col("sig").as("sig_a"))
      .crossJoin(broadcast(sk.select(col("source").as("src_b"), col("sig").as("sig_b"))))
      .filter(col("src_a") < col("src_b"))
    val unionTopK = slice(array_sort(array_union(col("sig_a"), col("sig_b"))), 1, k)
    pairs
      .withColumn("union_k", unionTopK)
      .withColumn("matches",
        size(array_intersect(col("union_k"), array_intersect(col("sig_a"), col("sig_b")))).cast("long"))
      .withColumn("n_union_k", size(col("union_k")).cast("long"))
      .withColumn("j_est", col("matches") / col("n_union_k"))
      .select(col("src_a"), col("src_b"), col("matches"), col("n_union_k"), col("j_est"))
  }

  /** x130's verify threshold (x03's near-dup rule), shared with the
    * oracle SQL. */
  val LshPrecisionThreshold: Double = 0.3

  /** LSH band-precision audit (x130): per band, how many candidate
    * pairs the band surfaces and how many survive the exact-Jaccard
    * verify — the measured cost/quality panel for x03's index (the
    * precision-side sibling of x18's RECALL.md discipline: don't trust
    * an approximate index, measure it). A band whose precision collapses
    * is wasting its verify budget and wants more rows per band; uniform
    * precision across bands confirms the permutation family is healthy.
    *
    * 100 TB shape: x03's exact machinery ([[bandFrames]] — fused
    * shingle/signature kernels, band-bucket self-join) with the pair
    * dedup keyed PER BAND (a pair surfacing in 3 bands counts in all
    * 3 — that is the audited quantity: verify work per band), then the
    * shingle-set join and ONE partial-agg'd groupBy onto O(bands) rows.
    * Costs ≤ bands× x03's verify stage by construction; the same
    * stop-shingle cap bounds the hot buckets upstream. */
  def lshPrecision(spark: SparkSession, dir: String, n: Int = 5, k: Int = 32,
                   bands: Int = 8,
                   threshold: Double = LshPrecisionThreshold): DataFrame = {
    val (docs, banded) = bandFrames(Tables.documents(spark, dir), n, k, bands)
    val bandA = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
    val bandB = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
    val cand = bandA.join(bandB, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("band"), col("doc_a"), col("doc_b"))
      .dropDuplicates("band", "doc_a", "doc_b")
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("hs_a"), col("hs_b"))))
      .withColumn("ok",
        (col("inter") / (size(col("hs_a")) + size(col("hs_b")) - col("inter"))
          >= threshold).cast("long"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_candidates"), sum(col("ok")).as("n_verified"))
      .withColumn("precision_ppm", expr("(1000000L * n_verified) div n_candidates"))
  }

  /** x128's edit-distance bound, shared with the oracle SQL. */
  val FuzzyMaxDistance: Int = 2

  /** Blocked fuzzy-name matching (x128): part pairs in the same brand
    * whose names are within levenshtein [[FuzzyMaxDistance]] — the
    * classic entity-resolution candidate join (catalog dedup: "blue
    * bolt" vs "blue bolts"), with the TWO standard scale levers both in
    * the plan:
    *
    *  1. BLOCKING: candidates must share the (brand, name-length) key.
    *  2. LENGTH EXPANSION: `lev(a,b) ≤ d` implies `|len(a) − len(b)| ≤
    *     d`, so the left side emits one row per length in `len ± d` and
    *     the join is a pure EQUI-join on (brand, length) — a (2d+1)×
    *     row expansion buys blocks keyed by brand AND length instead of
    *     brand alone (a hot brand no longer forms one quadratic block),
    *     and each qualifying pair meets exactly ONCE (the probe length
    *     equals len(b), which is unique), so no distinct pass.
    *
    * The quadratic work that remains is per (brand, length) block —
    * production ER adds more blocking keys (first token, phonetic code)
    * the same way; the expansion technique composes. `levenshtein` is
    * codegen'd in Spark and semantically identical in DuckDB. */
  /** x128 entry: the STAGED brand-blocked candidate table ([[ErStage]]
    * — generated once per catalog snapshot, read by x128/x181/x184). */
  def fuzzyNamePairs(spark: SparkSession, dir: String,
                     maxDistance: Int = FuzzyMaxDistance): DataFrame =
    ErStage.brandPairs(spark, dir, maxDistance)

  /** The compute path behind the stage (staged ≡ recomputed is
    * spec-asserted in ErStageSpec). */
  private[graft] def computeFuzzyNamePairs(spark: SparkSession, dir: String,
                     maxDistance: Int = FuzzyMaxDistance): DataFrame =
    fuzzyPairsOf(Tables.part(spark, dir), maxDistance)

  /** The same blocked fuzzy join over an arbitrary part frame — shared
    * by the full path above and the sampled-universe path (x281), so
    * the two can never drift on the blocking rule. */
  private[graft] def fuzzyPairsOf(part: DataFrame,
                     maxDistance: Int = FuzzyMaxDistance): DataFrame = {
    val p = part
      .select(col("p_partkey"), col("p_brand"), col("p_name"),
        length(col("p_name")).as("len"))
    val probe = p.select(col("p_partkey").as("key_a"), col("p_brand"),
        col("p_name").as("name_a"),
        explode(sequence(col("len") - maxDistance, col("len") + maxDistance))
          .as("len"))
    probe.join(p.select(col("p_partkey").as("key_b"), col("p_brand"),
        col("p_name").as("name_b"), col("len")), Seq("p_brand", "len"))
      .filter(col("key_a") < col("key_b"))
      // 3-arg levenshtein = banded O(len·d) DP that bails to -1 past the
      // threshold — the block interiors are quadratic in pair count, so
      // the per-pair constant is the hot cost (exact distance is still
      // exact for every SURVIVING pair; -1 rows are the ones the 2-arg
      // form would have computed fully just to discard)
      .withColumn("distance",
        levenshtein(col("name_a"), col("name_b"), maxDistance))
      .filter(col("distance") >= 0 && col("distance") <= maxDistance)
      .select(col("p_brand"), col("key_a"), col("name_a"),
        col("key_b"), col("name_b"), col("distance").cast("int"))
  }

  /** Entity-resolution clusters (x181): the transitive closure of
    * x128's fuzzy-name match — "blue bolt" ~ "blue bolts" ~ "blue bolt."
    * must land in ONE catalog entity even though the ends differ by more
    * than the pair threshold, so ER always finishes with a connected-
    * components pass over the match edges (the x17 relationship:
    * pairs → clusters). Every part gets a row: canonical_key = the
    * cluster's minimum part key (singletons map to themselves),
    * cluster_size, and the is_canonical survivor flag — the
    * dedup'd-catalog mapping table a MERGE step applies.
    *
    * 100 TB shape: the edge list (brand-blocked, threshold-pruned) is
    * tiny relative to the catalog, so [[ConnectedComponents.components]]
    * runs on edges only (alternating-star rounds, checkpointed);
    * singletons never enter the iteration — they are restored by one
    * left join at the end. The size rollup and survivor flag live on
    * the O(parts) mapping frame. */
  /** x183's neighborhood width, shared with the oracle SQL. */
  val SnWindow: Int = 5

  /** Sorted-neighborhood ER blocking (x183): the OTHER classic blocking
    * strategy next to x128's attribute blocking — sort the catalog by
    * name, compare each record only to its `window` successors in sort
    * order, verify survivors with the banded levenshtein. Attribute
    * blocking can never match across blocks (a mistyped brand hides the
    * pair forever); sorted-neighborhood trades that for ordering
    * locality, which is why production ER runs both and unions the
    * candidates. `same_brand` is published per pair: 0-rows are exactly
    * the matches x128 is structurally blind to.
    *
    * Exact global sort ranks WITHOUT a corpus-wide window (the x120
    * discipline): records bucket by a numeric 4-char name prefix —
    * monotone w.r.t. the (name, key) sort order, so bucket-local
    * `row_number` windows plus [[Sampling.exclusivePrefixSum]] offsets
    * over the bucket totals compose to the exact global rank; no task
    * ever sorts more than one prefix-bucket. At 100 TB this is range
    * partitioning by sort key — THE scalable ER trick — with the
    * neighbor join an equi-join on rank (explode of `window` probe
    * ranks per record, fan-out = window). */
  /** x183 entry: the STAGED sorted-neighborhood candidate table
    * ([[ErStage]]). */
  def sortedNeighborhoodPairs(spark: SparkSession, dir: String,
                              window: Int = SnWindow,
                              maxDistance: Int = FuzzyMaxDistance): DataFrame =
    ErStage.snPairs(spark, dir, window, maxDistance)

  /** The compute path behind the stage (staged ≡ recomputed is
    * spec-asserted in ErStageSpec). */
  private[graft] def computeSortedNeighborhoodPairs(spark: SparkSession, dir: String,
                              window: Int = SnWindow,
                              maxDistance: Int = FuzzyMaxDistance): DataFrame = {
    val pfx = (1 to 4).map(i =>
      ascii(substring(col("p_name"), i, 1)).cast("long") *
        lit(1L << (8 * (4 - i)))).reduce(_ + _)
    val p = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_name"), pfx.as("pfx"))
    val offs = Sampling.exclusivePrefixSum(
        p.groupBy(col("pfx")).agg(count(lit(1)).as("c"))
          .select(col("pfx").as("key"), col("c").as("v")))
      .select(col("key").as("pfx"), col("offset"))
    val localW = Window.partitionBy(col("pfx"))
      .orderBy(col("p_name"), col("p_partkey"))
    val ranked = p.join(offs, Seq("pfx"))
      .withColumn("rank", col("offset") + row_number().over(localW))
      .select(col("p_partkey"), col("p_brand"), col("p_name"), col("rank"))
      .localCheckpoint() // probe and build sides of the neighbor join
    val probe = ranked.select(col("p_partkey").as("key_a"),
        col("p_brand").as("brand_a"), col("p_name").as("name_a"),
        col("rank").as("rank_a"),
        explode(sequence(col("rank") + 1, col("rank") + window)).as("rank"))
    probe.join(ranked, Seq("rank"))
      .withColumn("distance",
        levenshtein(col("name_a"), col("p_name"), maxDistance))
      .filter(col("distance") >= 0 && col("distance") <= maxDistance)
      .select(col("key_a"), col("name_a"),
        col("p_partkey").as("key_b"), col("p_name").as("name_b"),
        (col("rank") - col("rank_a")).as("rank_gap"),
        col("distance").cast("int").as("distance"),
        (col("brand_a") === col("p_brand")).cast("int").as("same_brand"))
  }

  /** Blocking-strategy audit (x184): run BOTH candidate generators —
    * x128's brand blocking and x183's sorted neighborhood — over the
    * same verify rule and tabulate, per provenance class (found by
    * both / brand only / sorted-neighborhood only), the pair count,
    * the distance histogram, and how many are cross-brand (reachable
    * ONLY by ordering locality). This is the measured-coverage
    * artifact for ER blocking (the x130/x179 discipline applied to
    * candidate generation): production ER unions blockings precisely
    * because each one's misses are invisible from inside it, and this
    * panel is the number that justifies paying for the second pass.
    *
    * 100 TB shape: both generators keep their own documented scale
    * levers (brand equi-join; rank equi-join over range-partitioned
    * sort order); the audit joins the two O(pairs) candidate sets
    * full-outer on the canonical pair key and folds to a 3-row
    * panel. */
  def blockingAudit(spark: SparkSession, dir: String,
                    window: Int = SnWindow,
                    maxDistance: Int = FuzzyMaxDistance): DataFrame = {
    val brand = fuzzyNamePairs(spark, dir, maxDistance)
      .select(least(col("key_a"), col("key_b")).as("u"),
        greatest(col("key_a"), col("key_b")).as("v"),
        col("distance"), lit(1).as("by_brand"))
    // ranks are unique, the probe always pairs lower → higher rank, and
    // x128's length expansion matches each pair on exactly one len row —
    // so both sides are already distinct on the unordered key
    val sn = sortedNeighborhoodPairs(spark, dir, window, maxDistance)
      .select(least(col("key_a"), col("key_b")).as("u"),
        greatest(col("key_a"), col("key_b")).as("v"),
        col("distance").as("sn_distance"), col("same_brand"),
        lit(1).as("by_sn"))
    brand.join(sn, Seq("u", "v"), "full_outer")
      .select(
        coalesce(col("by_brand"), lit(0)).as("by_brand"),
        coalesce(col("by_sn"), lit(0)).as("by_sn"),
        coalesce(col("distance"), col("sn_distance")).as("d"),
        coalesce(col("same_brand"), lit(1)).as("sb"))
      .groupBy(col("by_brand"), col("by_sn"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("d") === 0, 1L).otherwise(0L)).as("n_dist0"),
        sum(when(col("d") === 1, 1L).otherwise(0L)).as("n_dist1"),
        sum(when(col("d") >= 2, 1L).otherwise(0L)).as("n_dist2plus"),
        sum(when(col("sb") === 0, 1L).otherwise(0L)).as("n_cross_brand"))
  }

  def erClusters(spark: SparkSession, dir: String,
                 maxDistance: Int = FuzzyMaxDistance): DataFrame = {
    // the STAGED canonical mapping (ErStage — closure run once per
    // catalog snapshot, the ClusterStage contract); only the O(parts)
    // size rollup and survivor flag run per query
    val canon = ErStage.erCanon(spark, dir, maxDistance)
      .localCheckpoint() // two consumers: the size rollup + the final join
    val sizes = canon.groupBy(col("canonical_key"))
      .agg(count(lit(1)).as("cluster_size"))
    canon.join(sizes, Seq("canonical_key"))
      .select(col("p_partkey"), col("canonical_key"), col("cluster_size"),
        (col("p_partkey") === col("canonical_key")).cast("int").as("is_canonical"))
  }

  /** The compute path behind [[ErStage.erCanon]]: transitive closure of
    * the staged brand pairs, singletons restored from the part table.
    * (p_partkey, canonical_key). */
  private[graft] def computeErCanon(spark: SparkSession, dir: String,
                 maxDistance: Int = FuzzyMaxDistance): DataFrame = {
    val pairs = fuzzyNamePairs(spark, dir, maxDistance)
      .select(col("key_a").as("u"), col("key_b").as("v"))
    val comp = ConnectedComponents.components(pairs)
    Tables.part(spark, dir).select(col("p_partkey"))
      .join(comp.select(col("node").as("p_partkey"),
        col("component").as("canonical_key")), Seq("p_partkey"), "left")
      .select(col("p_partkey"),
        coalesce(col("canonical_key"), col("p_partkey")).as("canonical_key"))
  }

  /** Keep rate (basis points of 10000) for the SAMPLED ER audit (x281)
    * — x27's md5-bucket rule, salt "psample" (isolated from the doc and
    * query sample salts). Shared with the oracle SQL. 10% reproduces at
    * sf1 exactly the oracle cost the full x181 replay pays at sf0.1
    * (where it is green): brand-blocked pair count scales with density²
    * and the recursive closure with cluster size², so the sampled
    * universe is the dial that keeps both inside the replay budget. */
  val ErSampleBps: Int = 1000

  /** Sampled-universe ER clusters (x281): [[erClusters]]'s exact
    * pipeline — blocked fuzzy pairs, transitive closure, singleton
    * restore, size rollup, survivor flag — over the deterministic
    * md5-bucket part subset. This is x181's bounded-cost production
    * sibling (the x232/x233/x234 pattern applied to ER): the closure's
    * DuckDB replay is quadratic in cluster size, which grows with
    * corpus density, so the FULL replay stops being tractable past
    * bench scale while the engine itself stays linear-in-edges; the
    * sampled universe carries oracle-grade evidence for the whole
    * pipeline at 10× scale. Semantics note: ER over a sampled universe
    * is NOT the restriction of full-universe ER (transitive paths may
    * pass through unsampled parts) — both engines compute the same
    * restricted problem, which is the point: an audit partition, not an
    * estimator. 100 TB shape: identical to x181's (the sample filter
    * pushes into the part scan; everything downstream only shrinks). */
  def erClustersSampled(spark: SparkSession, dir: String,
                        maxDistance: Int = FuzzyMaxDistance,
                        bps: Int = ErSampleBps): DataFrame = {
    val parts = Tables.part(spark, dir)
      .filter(Sampling.hashBucket(col("p_partkey"), "psample") < bps)
    val pairs = fuzzyPairsOf(parts, maxDistance)
      .select(col("key_a").as("u"), col("key_b").as("v"))
    val comp = ConnectedComponents.components(pairs)
    val canon = parts.select(col("p_partkey"))
      .join(comp.select(col("node").as("p_partkey"),
        col("component").as("canonical_key")), Seq("p_partkey"), "left")
      .select(col("p_partkey"),
        coalesce(col("canonical_key"), col("p_partkey")).as("canonical_key"))
      .localCheckpoint() // two consumers: the size rollup + the final join
    val sizes = canon.groupBy(col("canonical_key"))
      .agg(count(lit(1)).as("cluster_size"))
    canon.join(sizes, Seq("canonical_key"))
      .select(col("p_partkey"), col("canonical_key"), col("cluster_size"),
        (col("p_partkey") === col("canonical_key")).cast("int").as("is_canonical"))
  }

  /** x163 knobs: the term width (word 5-grams WITH multiplicity — the
    * weighted twin of x02's distinct shingles), the cosine
    * keep-threshold as the exact rational tNum/tDen (pairs keep iff
    * cos ≥ tNum/tDen, decided by integer cross-multiplication — no
    * float in the decision path), and the stop-term df cap (x02's
    * discipline). Shared with the oracle SQL. */
  val TfCosShingleN: Int = 5
  val TfCosThresholdNum: Int = 1
  val TfCosThresholdDen: Int = 2
  val TfCosMaxTermDf: Int = 100

  /** Exact TF all-pairs cosine similarity (x163): document pairs whose
    * 5-gram term-FREQUENCY vectors have cosine ≥ [[TfCosThresholdNum]]/
    * [[TfCosThresholdDen]] — the WEIGHTED sibling of x02's set-Jaccard
    * (a doc that repeats a template 50× looks near-identical to one
    * repeating it 5× under Jaccard; TF cosine separates them — the
    * repetition-aware near-dup signal), and the exact baseline the
    * DIMSUM-style sampled all-pairs algorithms approximate. Emits the
    * raw integer evidence (dot, both squared norms) plus one 3-IEEE-op
    * `cos_dbl` (mul, sqrt, div — each correctly rounded, so
    * cross-engine identical).
    *
    * The keep decision is PURE INTEGER: `tDen²·dot² ≥ tNum²·n2a·n2b`
    * (squares compare safely since dot ≥ 0), evaluated in
    * DECIMAL(38,0) — dot reaches n2 ≈ tf²·terms ≈ 10¹⁴ per doc, so
    * dot² passes 2⁶³ well inside the envelope. Norms are computed over
    * ALL terms (the true cosine denominator); the stop-term cap only
    * prunes which terms can PAIR documents (x02's rule: a term in more
    * than [[TfCosMaxTermDf]] docs is boilerplate whose bucket join
    * would be quadratic in its df) — so reported cosines are exact,
    * while recall is bounded by the cap exactly as x02 documents.
    *
    * 100 TB shape: the tf table IS the staged gram aggregate
    * ([[GramStage]] — computed once per corpus snapshot; r12 retired
    * this query's private explode+groupBy of the whole text column),
    * norms are a keyed aggregate joined back on doc_id, the pair join
    * is keyed per TERM with fan-out ≤ C(cap, 2) per term, then ONE
    * partial-agg'd pair groupBy. No windows, no driver state. */
  def tfCosinePairs(spark: SparkSession, dir: String,
                    n: Int = TfCosShingleN,
                    tNum: Int = TfCosThresholdNum,
                    tDen: Int = TfCosThresholdDen,
                    maxTermDf: Int = TfCosMaxTermDf): DataFrame = {
    require(tNum >= 0 && tDen > 0, "threshold must be a nonneg rational")
    // every 5-gram OCCURRENCE counts — gramOcc's cnt is exactly this tf
    // (same tokenization, same shorter-than-n exclusion contract)
    val tf = GramStage.gramOcc(spark, dir, n)
      .select(col("doc_id"), col("gram").as("w"), col("cnt").as("tf"))
    val norms = tf.groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("tf")).as("norm2"))
    val stopTerms = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxTermDf).select(col("w"))
    // no broadcast hint on the stop side: boilerplate high-df grams GROW
    // with a web-scale corpus (the x68/x72 lesson) — AQE still broadcasts
    // when the set is genuinely small
    val idx = tf.join(stopTerms, Seq("w"), "left_anti")
      .join(norms, Seq("doc_id"))
    val a = idx.select(col("doc_id").as("doc_a"), col("w"),
      col("tf").as("tf_a"), col("norm2").as("norm2_a"))
    val b = idx.select(col("doc_id").as("doc_b"), col("w"),
      col("tf").as("tf_b"), col("norm2").as("norm2_b"))
    a.join(b, Seq("w"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("norm2_a"), col("norm2_b"))
      .agg(sum(col("tf_a") * col("tf_b")).as("dot"))
      .filter(
        lit(tDen.toLong * tDen).cast("decimal(38,0)")
          * col("dot") * col("dot")
          >= lit(tNum.toLong * tNum).cast("decimal(38,0)")
            * col("norm2_a") * col("norm2_b"))
      .select(col("doc_a"), col("doc_b"), col("dot"),
        col("norm2_a"), col("norm2_b"),
        (col("dot").cast("double")
          / sqrt(col("norm2_a").cast("double") * col("norm2_b")))
          .as("cos_dbl"))
  }

  /** x125 knobs: ingest-batch count (doc_id range deciles) and the
    * shingle width, shared with the oracle SQL. */
  val NoveltyBatches: Int = 10
  val NoveltyShingleN: Int = 5

  /** Ingest-batch n-gram novelty curve (x125): split the corpus into
    * [[NoveltyBatches]] doc_id-range batches (the deterministic stand-in
    * for crawl snapshots) and report, per batch, how many of its
    * distinct 5-gram fingerprints were never seen in ANY earlier batch —
    * the diminishing-returns curve that tells a crawl operator when new
    * data stops adding new content (and the batch-level view of x44's
    * incremental-dedup question).
    *
    * 100 TB shape: the corpus-sized work is one explode of the shingle
    * stream into a (batch, fp) `distinct` — a partial-agg'd shuffle on
    * the pair key, `localCheckpoint`ed because both the first-batch
    * aggregate and the count join read it. After dedup each fp carries
    * ≤ [[NoveltyBatches]] rows TOTAL, so the fp-keyed first-seen
    * aggregate and the join back are skew-bounded BY CONSTRUCTION (a
    * stop-shingle that appears everywhere still contributes at most
    * one row per batch — compare x02's df-cap, which has to prune).
    * Output is O(batches) rows. */
  def noveltyCurve(spark: SparkSession, dir: String,
                   nBatches: Int = NoveltyBatches): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val mx = docs.agg(max(col("doc_id")).as("mx"))
    // the (doc, gram) pairs come from the STAGED gram table
    // ([[GramStage]] — NoveltyShingleN is the engine-wide 5); only the
    // batch tag and the fp hash are computed here
    val bf = GramStage.gramOcc(spark, dir, NoveltyShingleN)
      .crossJoin(broadcast(mx))
      .select(expr(s"(doc_id * $nBatches) div (mx + 1)").as("batch"),
        md5Hash60(col("gram")).as("fp"))
      .distinct()
      .localCheckpoint()
    val first = bf.groupBy(col("fp")).agg(min(col("batch")).as("first_batch"))
    bf.join(first, Seq("fp"))
      .groupBy(col("batch"))
      .agg(count(lit(1)).as("n_fps"),
        sum((col("first_batch") === col("batch")).cast("long")).as("n_new"))
      .withColumn("novelty_ppm", expr("(1000000L * n_new) div n_fps"))
  }

  /** x201 knobs: shingle length and the Jaccard threshold (ppm) —
    * shared with the DuckDB oracle. */
  val PjN: Int = 5
  val PjTauPpm: Long = 500000L

  /** EXACT set-similarity join via prefix filtering (x201): every doc
    * pair with shingle-set Jaccard ≥ τ, with NO false negatives — the
    * database-style alternative to the LSH family (x02 caps df for
    * recall, x03 bands minhashes probabilistically; this one is exact
    * with pruning). The prefix principle: order each doc's shingles by
    * GLOBAL RARITY (df asc, shingle asc); if |a∩b|/|a∪b| ≥ τ, the two
    * sets must share at least one of each other's first
    * |s| − ⌈τ·|s|⌉ + 1 rarest shingles — so candidates are generated
    * by an equi-join on PREFIX shingles only, plus the length filter
    * τ·max(|a|,|b|) ≤ min(|a|,|b|), then candidates are verified by
    * the exact intersection count. All-integer: the prefix bound and
    * both filters are cross-multiplied ppm comparisons.
    *
    * 100 TB shape: the candidate join keys on the shingle, and prefix
    * shingles are by construction the RAREST ones — the high-df keys
    * that make a naive token join quadratic are exactly the ones the
    * prefix excludes (measured here: ~12.5 M doc pairs → 256
    * candidates at sf0.1). Everything else is keyed joins and
    * partial-agg'd groupBys on (doc, shingle). */
  def prefixJaccardPairs(spark: SparkSession, dir: String, n: Int = PjN,
                         tauPpm: Long = PjTauPpm): DataFrame = {
    // the distinct (doc, gram) sets are the STAGED gram table's rows
    // ([[GramStage]]) — four readers, each a cheap scan of the artifact
    val toks = GramStage.gramOcc(spark, dir, n)
      .select(col("doc_id"), col("gram").as("tok"))
    val dfTok = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val sz = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val ord = toks.join(dfTok, Seq("tok")).join(sz, Seq("doc_id"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("tok"))))
    val pref = ord.filter(col("rk") <=
      col("sz") - expr(s"(($tauPpm * sz) + 999999) div 1000000") + 1)
    val cand = pref.as("a").join(pref.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.sz").as("sa"), col("b.sz").as("sb")).distinct()
      .filter(lit(1000000L) * least(col("sa"), col("sb")) >=
        lit(tauPpm) * greatest(col("sa"), col("sb")))
    val inter = toks.select(col("doc_id").as("da"), col("tok"))
      .join(broadcast(cand), Seq("da"))
      .join(toks.select(col("doc_id").as("db"), col("tok")), Seq("db", "tok"))
      .groupBy(col("da"), col("db"), col("sa"), col("sb"))
      .agg(count(lit(1)).as("inter_size"))
    inter.withColumn("union_size", col("sa") + col("sb") - col("inter_size"))
      .filter(lit(1000000L) * col("inter_size") >= lit(tauPpm) * col("union_size"))
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        col("inter_size"), col("union_size"),
        expr("(1000000L * inter_size) div union_size").as("jac_ppm"))
  }
}
