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
  *
  * The banding parameter is PART OF THE INDEX, not of the probe: an
  * index written with bands=8 carries 8-bit keys, and probing it with
  * 16-bit bands=4 keys would join to (near-)nothing and read as "no
  * duplicates" — the silent-wrong-answer class. So [[writeIndex]]
  * persists `bands` in a `_graft_index_meta.json` sidecar and every
  * reader ([[probePairs]], [[admitBatch]], [[nightlyIngest]])
  * require-checks its caller's value against it (ADVICE r17). Indexes
  * predating the sidecar derive bands from the `band=` partition
  * directories (every frame explodes into all bands, so a non-empty
  * index has all of them).
  */
object VideoFrameIndex {

  val GroupMod = 64

  /** Sidecar recording the banding the index was built with. The
    * leading underscore keeps it invisible to parquet directory
    * scans (Spark/Hadoop skip `_`/`.` files), so it can live inside
    * the index directory itself. */
  val MetaFile = "_graft_index_meta.json"

  /** One row per (frame, band): the frame's 64/bands-bit slice keyed
    * for exact-equality blocking — the same banding
    * [[Multimodal.videoPairsFromFrameHashes]] uses (shared here so
    * batch path and standing index can never drift). */
  def bandRows(frames: DataFrame, bands: Int = 4): DataFrame =
    bandRowsKeeping(frames.select("video", "frame_idx", "phash"), bands)

  /** [[bandRows]] generalized: explode `phash` into its (band, bkey)
    * slices while PRESERVING every input column — the shared banding
    * arithmetic for callers whose rows are not raw (video, frame_idx,
    * phash) frames (e.g. the collapsed distinct-hash rows the r18
    * candidate-join optimization feeds through
    * [[Multimodal.videoPairsFromFrameHashes]] / [[probePairs]]).
    * Keeping ONE implementation here is what stops the batch path and
    * the standing index from ever drifting on the key arithmetic. */
  def bandRowsKeeping(rows: DataFrame, bands: Int): DataFrame = {
    require(bands >= 1 && 64 % bands == 0,
      s"bands must divide 64, got $bands")
    val bandBits = 64 / bands
    val bandMask = if (bandBits == 64) -1L else (1L << bandBits) - 1L
    val keep = rows.columns.map(col).toSeq
    rows.select(keep :+
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("phash"), b * bandBits)
            .bitwiseAND(lit(bandMask)).as("bkey"))): _*)).as("blk"): _*)
      .select(keep :+ col("blk.band").as("band") :+
        col("blk.bkey").as("bkey"): _*)
  }

  private def metaPath(path: String) =
    new org.apache.hadoop.fs.Path(path, MetaFile)

  private def writeMeta(spark: SparkSession, path: String,
      bands: Int): Unit = {
    val p = metaPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(
      s"""{"bands":$bands,"groupMod":$GroupMod}""".getBytes("UTF-8"))
    finally out.close()
  }

  /** The banding an existing index was built with: the sidecar when
    * present, else (pre-sidecar indexes) `max(band)+1` from the
    * partition directory names. Fails loudly on an empty/unreadable
    * index — "can't tell the banding" must never degrade into a
    * silently-empty probe. */
  def indexBands(spark: SparkSession, indexPath: String): Int = {
    val p = metaPath(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val in = fs.open(p)
      val txt = try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        buf.toString("UTF-8")
      } finally in.close()
      val doc = org.json4s.jackson.JsonMethods.parse(txt)
      doc \ "bands" match {
        case org.json4s.JInt(b) => b.toInt
        case _ => throw new IllegalArgumentException(
          s"$p exists but has no integer 'bands' field: $txt")
      }
    } else {
      val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(indexPath))
        .filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith("band=")).map(_.stripPrefix("band=").toInt)
      require(dirs.nonEmpty, s"no $MetaFile and no band= partition " +
        s"directories under $indexPath — not a VideoFrameIndex")
      dirs.max + 1
    }
  }

  private def requireBands(spark: SparkSession, indexPath: String,
      bands: Int, op: String): Unit = {
    val built = indexBands(spark, indexPath)
    require(built == bands,
      s"index at $indexPath was built with bands=$built but $op was " +
        s"called with bands=$bands — mismatched band keys " +
        s"(${64 / built}-bit vs ${64 / bands}-bit) would join to " +
        "(near-)nothing and read as 'no duplicates'")
  }

  /** Build + persist the corpus index. One corpus scan; the
    * hash-cluster on (band, bgroup) is the only shuffle and leaves
    * exactly ONE file per partition directory — without it every
    * input task writes into every directory (measured: 32 tasks ×
    * 256 dirs = 8k small files, and a 40-directory probe paid ~1,300
    * file opens for ~60k rows). Persists `bands` in the [[MetaFile]]
    * sidecar — see the class doc. */
  def writeIndex(frames: DataFrame, path: String, bands: Int = 4): Unit = {
    bandRows(frames, bands)
      .withColumn("bgroup", pmod(col("bkey"), lit(GroupMod)))
      .transform(graft.io.Layout.clusterForPartitionedWrite(_,
        Seq("band", "bgroup")))
      .write.partitionBy("band", "bgroup")
      .mode("overwrite").parquet(path)
    writeMeta(frames.sparkSession, path, bands)
  }

  /** Append an accepted batch's band rows — the nightly admit half.
    * Hashing is deterministic and row-local, so admitted rows are
    * indistinguishable from build-time rows (spec pins admit ≡
    * rebuild). Hash-clustering on (band, bgroup) leaves exactly ONE
    * new file per touched partition directory per admit; run
    * [[compactIndex]] on the usual cadence. Fails loudly when the
    * caller's `bands` differs from the index's. */
  def admitBatch(frames: DataFrame, indexPath: String,
      bands: Int = 4): Unit = {
    requireBands(frames.sparkSession, indexPath, bands, "admitBatch")
    bandRows(frames, bands)
      .withColumn("bgroup", pmod(col("bkey"), lit(GroupMod)))
      .transform(graft.io.Layout.clusterForPartitionedWrite(_,
        Seq("band", "bgroup")))
      .write.partitionBy("band", "bgroup")
      .mode("append").parquet(indexPath)
  }

  /** Rewrite the index with one bkey-sorted file per (band, bgroup)
    * directory — small-file maintenance for nightly appends. Writes
    * to `outPath` (never in place); swap after validating. The
    * banding sidecar travels with the rewrite. */
  def compactIndex(spark: SparkSession, indexPath: String,
      outPath: String): Unit = {
    val bands = indexBands(spark, indexPath)
    graft.io.Layout.compactPartitioned(spark, indexPath, outPath,
      Seq("band", "bgroup"), sortCols = Seq("bkey"))
    writeMeta(spark, outPath, bands)
  }

  /** Probe the persisted index with a new batch of frame hashes,
    * reading ONLY the index partitions the batch hashes into.
    * Returns (pairs, droppedBuckets): pairs = one row per
    * (corpus_video, new_video) with matched keyframe counts and
    * `new_frac = matched_new / n_frames_new` — the fraction of the
    * NEW video already present in the corpus, which is the quantity
    * an ingest gate thresholds (the admit decision is about the new
    * item; the corpus side's frame totals live with the corpus, not
    * in a full-index rescan that would defeat the pruning this index
    * exists for). droppedBuckets is the
    * [[graft.ops.Blocking.capBucketsWeighted]] report over the CORPUS
    * side (identical rows to the raw-row capBuckets report —
    * bucket_size is the expanded frame-row count):
    * a hot band key (flat/black frames — the exact case the batch
    * path's cap exists for) is dropped AND reported, never allowed
    * to explode the nightly probe's fan-out unbounded (ADVICE r17;
    * the batch side needs no cap — its contribution is bounded by
    * the nightly batch's own size, so per-bucket fan-out is at most
    * bucketCap × |batch|).
    *
    * The batch is small next to the corpus by the incremental
    * contract; its (band, bgroup) set is collected driver-side —
    * bounded by bands × GroupMod regardless of batch size. Fails
    * loudly when the caller's `bands` differs from the index's. */
  def probePairs(spark: SparkSession, indexPath: String,
      newFrames: DataFrame, hammingMax: Int = 10,
      bands: Int = 4, bucketCap: Int = 10000): (DataFrame, DataFrame) = {
    require(hammingMax >= 0, s"hammingMax must be >= 0, got $hammingMax")
    requireBands(spark, indexPath, bands, "probePairs")
    // r18: collapse both sides to distinct (video, phash) rows with
    // frame multiplicities before the candidate join — the same
    // equivalence as [[Multimodal.videoPairsFromFrameHashes]] (frames
    // sharing a hash band identically; whole buckets are capped;
    // per-hash frame sets within a video are disjoint, so
    // countDistinct(frame) = Σ multiplicity over distinct matched
    // hashes). The batch side collapses before banding; the corpus
    // side collapses the pruned index rows map-side (duplicates of a
    // hash co-locate in their (band, bgroup) partition files, so the
    // partial aggregate collapses before the exchange).
    val newU = newFrames.groupBy("video", "phash")
      .agg(count(lit(1)).as("nnf"))
    val nb = bandRowsKeeping(newU, bands)
      .withColumn("bgroup", pmod(col("bkey"), lit(GroupMod)))
    val groups = nb.select("band", "bgroup").distinct()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    if (groups.isEmpty) {
      // an empty batch probes nothing — empty frames, not a crash
      val pairs = spark.emptyDataFrame.select(
        lit("").as("corpus_video"), lit("").as("new_video"),
        lit(0L).as("matched_corpus"), lit(0L).as("matched_new"),
        lit(0L).as("n_frames_new"), lit(0d).as("new_frac")).limit(0)
      val dropped = spark.emptyDataFrame.select(
        lit(0).as("band"), lit(0L).as("bkey"),
        lit(0L).as("bucket_size")).limit(0)
      (pairs, dropped)
    } else {
      // OR-of-conjunctions over the partition columns — prunes at
      // plan time (PartitionFilters), asserted in VideoFrameIndexSpec
      val prune = groups.map { case (b, g) =>
        col("band") === b && col("bgroup") === g
      }.reduce(_ || _)
      // collapse pruned corpus rows to distinct (bucket, video, hash)
      // with frame counts — the weighted cap keeps the same buckets
      // and the same (band, bkey, bucket_size) dropped report as the
      // raw-row capBuckets did (whole buckets, summed multiplicities)
      val pruned = spark.read.parquet(indexPath)
        .filter(prune)
        .select(col("video").as("corpus_video"),
          col("phash").as("corpus_ph"),
          col("band").cast("int").as("band"), col("bkey"))
        .groupBy("band", "bkey", "corpus_video", "corpus_ph")
        .agg(count(lit(1)).as("cnf"))
      val (corpus, dropped) = graft.ops.Blocking.capBucketsWeighted(
        pruned, Seq("band", "bkey"), bucketCap, "cnf")
      val cand = corpus
        .join(broadcast(nb.select(col("video").as("new_video"),
          col("phash").as("new_ph"), col("nnf"),
          col("band"), col("bkey"))), Seq("band", "bkey"))
        .filter(col("corpus_video") =!= col("new_video"))
        .filter(bit_count(col("corpus_ph").bitwiseXOR(col("new_ph")))
          <= hammingMax)
      val nNew = newFrames.groupBy(col("video").as("new_video"))
        .agg(count(lit(1)).as("n_frames_new"))
      // collect_set dedups multi-band hash matches; the in-row fold
      // sums multiplicities (sets bounded by distinct hashes/video)
      val pairs = cand.groupBy("corpus_video", "new_video")
        .agg(collect_set(struct(col("corpus_ph"), col("cnf"))).as("sc"),
          collect_set(struct(col("new_ph"), col("nnf"))).as("sn"))
        .select(col("corpus_video"), col("new_video"),
          aggregate(col("sc"), lit(0L), (acc, x) => acc + x("cnf"))
            .as("matched_corpus"),
          aggregate(col("sn"), lit(0L), (acc, x) => acc + x("nnf"))
            .as("matched_new"))
        .join(broadcast(nNew), Seq("new_video"))
        .select(col("corpus_video"), col("new_video"),
          col("matched_corpus"), col("matched_new"), col("n_frames_new"),
          (col("matched_new").cast("double") / col("n_frames_new"))
            .as("new_frac"))
      (pairs, dropped)
    }
  }

  /** One NIGHTLY video-ingest tick, composed end-to-end (VERDICT r17
    * item 5 — the video twin of
    * [[graft.etl.CorpusCuration.curateIncremental]]): probe the
    * standing index with tonight's frame batch, GATE each new video
    * on how much of it the corpus already contains (max `new_frac`
    * over its corpus partners ≥ `dupFrac` ⇒ rejected as a near-dup),
    * admit the surviving videos' frames into the index, and return
    * the decisions. Run [[compactIndex]] on the usual cadence — the
    * admit leaves one new file per touched partition per night.
    *
    * Intra-batch duplicates are the BATCH path's job
    * ([[Multimodal.videoPairsFromFrameHashes]] over the night's
    * files): this gate is new-vs-corpus, so two novel videos that
    * duplicate only each other are both admitted tonight — and the
    * family blocks from tomorrow on, because tonight's admits ARE
    * tomorrow's corpus (spec-pinned: N gated nights ≡ one gated
    * rebuild).
    *
    * Both returned frames are MATERIALIZED (collected — decisions
    * are one row per new video and the dropped report one row per
    * hot bucket, both nightly-bounded) BEFORE the admit append: the
    * probe reads the index lazily, so an uncollected frame evaluated
    * after admitBatch would see tonight's own rows in the corpus and
    * read as self-dups.
    *
    * Returns (decisions, droppedBuckets): decisions = (video,
    * dup_frac — max new_frac vs the corpus, 0.0 when no corpus
    * partner — admitted: boolean); droppedBuckets = [[probePairs]]'
    * hot-bucket report. */
  def nightlyIngest(spark: SparkSession, indexPath: String,
      newFrames: DataFrame, dupFrac: Double = 0.5, hammingMax: Int = 10,
      bands: Int = 4, bucketCap: Int = 10000): (DataFrame, DataFrame) = {
    require(dupFrac > 0.0 && dupFrac <= 1.0,
      s"dupFrac must be in (0, 1], got $dupFrac")
    import spark.implicits._
    val (pairs, dropped) = probePairs(spark, indexPath, newFrames,
      hammingMax, bands, bucketCap)
    val maxFrac = pairs.groupBy("new_video")
      .agg(max(col("new_frac")).as("dup_frac"))
    val decisions = newFrames.select(col("video")).distinct()
      .join(maxFrac, col("video") === col("new_video"), "left_outer")
      .select(col("video"),
        coalesce(col("dup_frac"), lit(0.0)).as("dup_frac"))
      .withColumn("admitted", col("dup_frac") < dupFrac)
      .as[(String, Double, Boolean)].collect()
    val droppedLocal = dropped
      .as[(Int, Long, Long)].collect()
    val admittedVideos = decisions.collect {
      case (v, _, true) => v
    }.toSeq
    if (admittedVideos.nonEmpty)
      admitBatch(
        newFrames.join(
          broadcast(admittedVideos.toDF("video")), Seq("video"),
          "left_semi"),
        indexPath, bands)
    (decisions.toSeq.toDF("video", "dup_frac", "admitted"),
      droppedLocal.toSeq.toDF("band", "bkey", "bucket_size"))
  }
}
