package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: opaque `binary` content + typed metadata,
  * with decode / feature-extraction running as a partition-local batch
  * operator (`mapPartitions` over a typed Dataset — the JVM analog of
  * `mapInPandas`: iterator-in/iterator-out per partition, so a real decoder
  * could batch into native calls without changing the dataflow shape).
  *
  * The actual image/audio decode is STUBBED (`FakeDecoder`) — no codec
  * libraries ship in this environment — but everything Spark-side is real:
  * the binary column, the metadata struct, the encoder schemas, the
  * partition-batch iteration, and the downstream aggregation.
  *
  * Scale: decode is embarrassingly parallel per partition; at 100 TB the
  * only knob is input split size (`spark.sql.files.maxPartitionBytes`) so
  * each task's batch fits memory next to the decoder's buffers.
  */
object Multimodal {

  /** One asset row: opaque bytes + declared metadata. */
  case class Asset(asset_id: Long, modality: String, content: Array[Byte],
                   declared_w: Int, declared_h: Int)

  /** Decoded per-asset features (what a real image pipeline would emit). */
  case class AssetFeatures(asset_id: Long, modality: String, n_bytes: Int,
                           width: Int, height: Int, mean_intensity: Double)

  /** Deterministic stand-in for an image/audio decoder: interprets the
    * bytes as a tiny "pixel buffer". A real implementation would call the
    * codec here — per-partition, over the same Iterator shape. */
  object FakeDecoder {
    def decode(a: Asset): AssetFeatures = {
      val bytes = a.content
      val mean =
        if (bytes.isEmpty) 0.0
        else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
      AssetFeatures(a.asset_id, a.modality, bytes.length, a.declared_w, a.declared_h, mean)
    }
  }

  /** Derive a deterministic binary-asset table from `documents` (the
    * testdata ships no binary column): content = md5 digest bytes of the
    * text, metadata from n_chars. Binary column type + struct metadata are
    * the real thing; only the bytes are synthetic. */
  def assets(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id").as("asset_id"),
        when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("modality"),
        to_binary(md5(col("text")), lit("hex")).as("content"),
        (col("n_chars") % 64 + 1).cast("int").as("declared_w"),
        (col("n_chars") % 48 + 1).cast("int").as("declared_h"))
      .as[Asset]
  }

  /** Partition-batch decode: Iterator[Asset] → Iterator[AssetFeatures]. */
  def decodeFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(FakeDecoder.decode))
  }

  /** "Resized" asset: deterministic byte-level downsample standing in for
    * an image resize — keeps every stride-th byte, recomputes metadata. The
    * dataflow (binary in → binary out, projection-shaped, no shuffle) is
    * exactly what a real resize kernel plugs into. */
  case class ResizedAsset(asset_id: Long, modality: String, content: Array[Byte],
                          declared_w: Int, declared_h: Int)

  def resize(assets: Dataset[Asset], stride: Int): Dataset[ResizedAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val ds = a.content.indices.collect { case i if i % stride == 0 => a.content(i) }.toArray
      ResizedAsset(a.asset_id, a.modality,
        ds, math.max(1, a.declared_w / stride), math.max(1, a.declared_h / stride))
    })
  }

  /** Frame sampling for time-media (audio/video stand-in): split the byte
    * stream into fixed-size frames and keep every rate-th frame, exploded
    * one row per kept frame — the shape a video pipeline feeds to a
    * per-frame feature extractor. */
  case class Frame(asset_id: Long, frame_idx: Int, frame: Array[Byte])

  def sampleFrames(assets: Dataset[Asset], frameBytes: Int, rate: Int): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      a.content.grouped(frameBytes).zipWithIndex.collect {
        case (bytes, idx) if idx % rate == 0 => Frame(a.asset_id, idx, bytes)
      }
    }
  }

  /** Frame-sampling as a query-surface entry: treat each document's UTF-8
    * bytes as a time-media stream (variable length, unlike the fixed md5
    * stand-in), frame it at `frameBytes`, keep every `rate`-th frame, and
    * account frames/bytes per asset — oracle-checks the sampling logic
    * itself (frame boundaries, stride, tail-frame byte math). */
  def frameSampleStats(spark: SparkSession, dir: String,
                       frameBytes: Int = 32, rate: Int = 2): DataFrame = {
    import spark.implicits._
    val textAssets = Tables.documents(spark, dir)
      .select(
        col("doc_id").as("asset_id"),
        lit("text-stream").as("modality"),
        col("text").cast("binary").as("content"),
        lit(0).as("declared_w"), lit(0).as("declared_h"))
      .as[Asset]
    sampleFrames(textAssets, frameBytes, rate).toDF()
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(length(col("frame"))).as("bytes_kept"))
  }

  /** Full operator: decode then roll up per modality — the query-surface
    * entry (schema: modality, n_assets, total_bytes, mean_of_means). */
  def featuresByModality(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(assets(spark, dir)).toDF()
      .groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("width")).as("min_width"),
        max(col("height")).as("max_height"))

  /** x182's chunk size, shared with the oracle SQL. */
  val ChunkBytes: Int = 32

  /** Fixed-size-chunk store dedup (x182): slice every asset's byte
    * stream into [[ChunkBytes]] chunks and account, per asset, what a
    * content-addressed blob store would actually persist — the
    * FIXED-SIZE-CHUNKING complement of the content-defined paragraph
    * dedup (x39/x44: boundaries from content; here: boundaries from
    * offset — the standard media/object-store model, where frames not
    * prose are the unit). A chunk's content is stored ONCE globally;
    * ownership is first-occurrence-wins by asset id (x39's rule), so
    * per asset the report reads: chunks sliced, distinct contents,
    * contents this asset is the first to store, and the raw vs net-new
    * byte ledger a capacity planner bills.
    *
    * The chunking itself runs through the typed multimodal plumbing
    * ([[sampleFrames]] at rate 1 — per-partition iterators, the decoder
    * dataflow). Exactness: chunk equality is raw byte equality in both
    * engines (Spark groups on the binary column directly; at 100 TB
    * you'd key the shuffle on a 16-byte digest instead — same result,
    * smaller key, the md5Hash60 trick — documented, not needed for
    * correctness). Two partial-agg'd shuffles: (asset, content) then
    * content for the global owner; the explode is map-side only. */
  /** The byte-stream asset table x182/x205 operate on: document text as
    * an opaque binary payload (the only reproducible byte source in the
    * testdata; a real corpus supplies images/audio here and NOTHING
    * downstream changes — both operators touch only `content` bytes). */
  private def textStreamAssets(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id").as("asset_id"),
        lit("text-stream").as("modality"),
        col("text").cast("binary").as("content"),
        lit(0).as("declared_w"), lit(0).as("declared_h"))
      .as[Asset]
  }

  def chunkDedupStats(spark: SparkSession, dir: String,
                      frameBytes: Int = ChunkBytes): DataFrame = {
    val textAssets = textStreamAssets(spark, dir)
    val perAsset = sampleFrames(textAssets, frameBytes, rate = 1).toDF()
      .select(col("asset_id"), col("frame"), length(col("frame")).as("len"))
      .groupBy(col("asset_id"), col("frame"))
      .agg(max(col("len")).as("len"), count(lit(1)).as("n_copies"))
    val owners = perAsset.groupBy(col("frame"))
      .agg(min(col("asset_id")).as("owner"))
    perAsset.join(owners, Seq("frame"))
      .groupBy(col("asset_id"))
      .agg(sum(col("n_copies")).as("n_chunks"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("asset_id") === col("owner"), 1L).otherwise(0L)).as("n_owned"),
        sum(when(col("asset_id") === col("owner"), col("len")).otherwise(0L))
          .as("new_bytes"),
        sum(col("n_copies") * col("len")).as("raw_bytes"))
  }

  /** x205's Hamming verify bound — x04's convention, shared with the
    * oracle SQL. */
  val PhashMaxHamming: Int = 8

  /** Perceptual-hash-style near-dup over the OPAQUE BYTE STREAM (x205):
    * a 64-bit SimHash of each asset's fixed-size content chunks
    * (md5-60 per [[ChunkBytes]]-byte chunk → per-bit majority vote),
    * banded 4×16 bits, band-collision candidates, Hamming-verified
    * pairs — the media-fingerprint dedup shape (pHash + Hamming index)
    * with the DCT feature stubbed by the chunk hash, exactly like
    * [[FakeDecoder]] stubs the codec: every Spark-side stage (binary
    * column slicing, signature kernel, banded join, verify) is the real
    * thing and modality-agnostic. The text twin of this signature is
    * x04 (word-level SimHash); this one never looks at the CONTENT
    * semantics, only bytes — the operator a blob store runs when it
    * cannot parse what it stores.
    *
    * 100 TB shape: the signature is a PER-ROW projection (chunk array →
    * codegen'd SimHash64 kernel, zero shuffle, no explode); the only
    * shuffle is the band-keyed candidate join (fan-out bounded per
    * 16-bit bucket) and verification is an integer XOR popcount. */
  def byteSimhashPairs(spark: SparkSession, dir: String,
                       frameBytes: Int = ChunkBytes,
                       maxHamming: Int = PhashMaxHamming): DataFrame = {
    val chunkHashes = expr(
      s"""transform(sequence(0, cast((length(content) + ${frameBytes - 1})
         | div $frameBytes as int) - 1),
         | i -> cast(conv(substring(md5(substring(content,
         |   1 + i * $frameBytes, $frameBytes)), 1, 15), 16, 10) as bigint))"""
        .stripMargin.replaceAll("\n", ""))
    val sigs = textStreamAssets(spark, dir).toDF()
      .select(col("asset_id"),
        graft.functions.HashSignatures.simhash64(chunkHashes).as("sh"))
    val banded = sigs.select(col("asset_id"), col("sh"),
        explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("chunk", expr("(sh >> (band * 16)) & 65535"))
    val a = banded.select(col("band"), col("chunk"),
      col("asset_id").as("asset_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("chunk"),
      col("asset_id").as("asset_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("asset_a") < col("asset_b"))
      .select(col("asset_a"), col("asset_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("asset_a", "asset_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("asset_a"), col("asset_b"), col("hamming"))
  }

  /** x213's candidate Hamming thresholds — shared with the DuckDB
    * oracle. The sweep tops out at [[PhashMaxHamming]] (the banding's
    * verify bound: beyond it candidates aren't generated). */
  val SweepThresholds: Seq[Long] = Seq(0L, 2L, 4L, 8L)

  /** Dedup-aggressiveness sweep (x213): for each candidate Hamming
    * threshold, what the byte-level near-dup dedup (x205's pipeline)
    * would actually delete — pair count, removable assets (an asset is
    * removable if it is the LARGER id of any surviving pair —
    * first-occurrence-wins, x39's rule), and the bytes reclaimed. The
    * thresholds-vs-savings curve is the knob-tuning artifact a storage
    * owner reads before turning the dedup on (x202's radius-sweep
    * discipline applied to the dedup decision); thresholds with no
    * pairs still publish a zero row (the curve has no holes).
    *
    * 100 TB shape: the expensive part is x205's banded candidate set
    * (tiny by construction); the sweep is a broadcast 4-row threshold
    * cross over that candidate frame, and the byte ledger joins the
    * O(removable) id set against the asset metadata. */
  def dedupSweep(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val pairs = byteSimhashPairs(spark, dir).localCheckpoint()
    val th = SweepThresholds.toDF("threshold")
    val fan = pairs.crossJoin(broadcast(th))
      .filter(col("hamming") <= col("threshold"))
      .localCheckpoint() // read by the pair rollup and the removable set
    val nPairs = fan.groupBy(col("threshold"))
      .agg(count(lit(1)).as("n_pairs"))
    val removable = fan.select(col("threshold"), col("asset_b")).distinct()
      .join(Tables.documents(spark, dir)
        .select(col("doc_id"), col("n_chars")), col("asset_b") === col("doc_id"))
      .groupBy(col("threshold"))
      .agg(count(lit(1)).as("n_removable"),
        sum(col("n_chars")).as("bytes_reclaimed"))
    th.join(broadcast(nPairs), Seq("threshold"), "left")
      .join(broadcast(removable), Seq("threshold"), "left")
      .select(col("threshold"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_removable"), lit(0L)).as("n_removable"),
        coalesce(col("bytes_reclaimed"), lit(0L)).as("bytes_reclaimed"))
  }
}
