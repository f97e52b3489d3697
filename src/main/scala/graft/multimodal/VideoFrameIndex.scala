package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted pHash-band index for INCREMENTAL video near-dup — the
  * third standing index next to [[graft.ops.TextDedupIndex]] (MinHash
  * bands) and [[graft.ops.VectorDedupIndex]] (IVF cells), completing
  * VERDICT r16 item 8: a nightly video batch probes a persisted
  * band-partitioned frame-hash index instead of re-pairing the whole
  * corpus through [[Multimodal.videoPairsFromFrameHashes]].
  *
  * Input frames are the (video, frame_idx, phash) projection —
  * [[Multimodal.containerFrames]] → [[PHash.phash64]] upstream; only
  * 64-bit hashes ever reach the index, never rasters.
  *
  * Layout contract (mirrors TextDedupIndex): band rows are written
  * `partitionBy(band, bgroup)` where `bgroup = phash-band-key mod
  * [[GroupMod]]` — one directory per raw 16-bit key would mean 256k
  * directories of tiny files; grouping caps it at bands × GroupMod
  * while a probe still prunes to only the groups its batch hashes
  * into. The probe collects the batch's (band, bgroup) set
  * driver-side (bounded by bands × GroupMod, independent of batch AND
  * corpus size), pushes it as a partition filter (PartitionFilters —
  * spec-pinned), equi-joins surviving index rows on the exact
  * (band, bkey), and Hamming-verifies. Recall contract is
  * [[Multimodal.videoPairsFromFrameHashes]]'s: guaranteed for
  * Hamming ≤ bands−1, best-effort LSH above.
  */
object VideoFrameIndex {

  val GroupMod = 64

  /** One row per (frame, band): the frame's 64/bands-bit slice keyed
    * for exact-equality blocking — the same banding
    * [[Multimodal.videoPairsFromFrameHashes]] uses (shared here so
    * batch path and standing index can never drift). */
  def bandRows(frames: DataFrame, bands: Int = 4): DataFrame = {
    require(bands >= 1 && 64 % bands == 0,
      s"bands must divide 64, got $bands")
    val bandBits = 64 / bands
    val bandMask = if (bandBits == 64) -1L else (1L << bandBits) - 1L
    frames.select(col("video"), col("frame_idx"), col("phash"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("phash"), b * bandBits)
            .bitwiseAND(lit(bandMask)).as("bkey"))): _*)).as("blk"))
      .select(col("video"), col("frame_idx"), col("phash"),
        col("blk.band").as("band"), col("blk.bkey").as("bkey"))
  }

  /** Build + persist the corpus index. One corpus scan; the write is
    * the only shuffle (partitionBy directories). */
  def writeIndex(frames: DataFrame, path: String, bands: Int = 4): Unit =
    bandRows(frames, bands)
      .withColumn("bgroup", pmod(col("bkey"), lit(GroupMod)))
      .write.partitionBy("band", "bgroup")
      .mode("overwrite").parquet(path)

  /** Append an accepted batch's band rows — the nightly admit half.
    * Hashing is deterministic and row-local, so admitted rows are
    * indistinguishable from build-time rows (spec pins admit ≡
    * rebuild). Hash-clustering on (band, bgroup) leaves exactly ONE
    * new file per touched partition directory per admit; run
    * [[compactIndex]] on the usual cadence. */
  def admitBatch(frames: DataFrame, indexPath: String,
      bands: Int = 4): Unit =
    bandRows(frames, bands)
      .withColumn("bgroup", pmod(col("bkey"), lit(GroupMod)))
      .repartition(col("band"), col("bgroup"))
      .write.partitionBy("band", "bgroup")
      .mode("append").parquet(indexPath)

  /** Rewrite the index with one bkey-sorted file per (band, bgroup)
    * directory — small-file maintenance for nightly appends. Writes
    * to `outPath` (never in place); swap after validating. */
  def compactIndex(spark: SparkSession, indexPath: String,
      outPath: String): Unit =
    graft.io.Layout.compactPartitioned(spark, indexPath, outPath,
      Seq("band", "bgroup"), sortCols = Seq("bkey"))

  /** Probe the persisted index with a new batch of frame hashes,
    * reading ONLY the index partitions the batch hashes into.
    * Returns one row per (corpus_video, new_video) with matched
    * keyframe counts and `new_frac = matched_new / n_frames_new` —
    * the fraction of the NEW video already present in the corpus,
    * which is the quantity an ingest gate thresholds (the admit
    * decision is about the new item; the corpus side's frame totals
    * live with the corpus, not in a full-index rescan that would
    * defeat the pruning this index exists for).
    *
    * The batch is small next to the corpus by the incremental
    * contract; its (band, bgroup) set is collected driver-side —
    * bounded by bands × GroupMod regardless of batch size. */
  def probePairs(spark: SparkSession, indexPath: String,
      newFrames: DataFrame, hammingMax: Int = 10,
      bands: Int = 4): DataFrame = {
    require(hammingMax >= 0, s"hammingMax must be >= 0, got $hammingMax")
    val nb = bandRows(newFrames, bands)
      .withColumn("bgroup", pmod(col("bkey"), lit(GroupMod)))
    val groups = nb.select("band", "bgroup").distinct()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    if (groups.isEmpty)
      // an empty batch probes nothing — empty pairs, not a crash
      spark.emptyDataFrame.select(
        lit("").as("corpus_video"), lit("").as("new_video"),
        lit(0L).as("matched_corpus"), lit(0L).as("matched_new"),
        lit(0L).as("n_frames_new"), lit(0d).as("new_frac")).limit(0)
    else {
      // OR-of-conjunctions over the partition columns — prunes at
      // plan time (PartitionFilters), asserted in VideoFrameIndexSpec
      val prune = groups.map { case (b, g) =>
        col("band") === b && col("bgroup") === g
      }.reduce(_ || _)
      val corpus = spark.read.parquet(indexPath)
        .filter(prune)
        .select(col("video").as("corpus_video"),
          col("frame_idx").as("corpus_fi"), col("phash").as("corpus_ph"),
          col("band").cast("int").as("band"), col("bkey"))
      val cand = corpus
        .join(broadcast(nb.select(col("video").as("new_video"),
          col("frame_idx").as("new_fi"), col("phash").as("new_ph"),
          col("band"), col("bkey"))), Seq("band", "bkey"))
        .filter(col("corpus_video") =!= col("new_video"))
        .filter(bit_count(col("corpus_ph").bitwiseXOR(col("new_ph")))
          <= hammingMax)
        .select("corpus_video", "new_video", "corpus_fi", "new_fi")
        .distinct() // a frame pair can match in several bands
      val nNew = newFrames.groupBy(col("video").as("new_video"))
        .agg(count(lit(1)).as("n_frames_new"))
      cand.groupBy("corpus_video", "new_video")
        .agg(countDistinct(col("corpus_fi")).as("matched_corpus"),
          countDistinct(col("new_fi")).as("matched_new"))
        .join(broadcast(nNew), Seq("new_video"))
        .select(col("corpus_video"), col("new_video"),
          col("matched_corpus"), col("matched_new"), col("n_frames_new"),
          (col("matched_new").cast("double") / col("n_frames_new"))
            .as("new_frac"))
    }
  }
}
