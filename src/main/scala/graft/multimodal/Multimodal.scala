package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support (north-star spec): image/audio/video as
  * opaque `binary` columns plus typed metadata, with decode /
  * feature-extract / resize / frame-sample implemented as distributed
  * `mapPartitions` passes over a typed Dataset.
  *
  * The codec boundary is [[MediaDecoder]]; the default implementation
  * is the real [[ImageIoDecoder]] (`javax.imageio`, JDK-builtin —
  * PNG/JPEG/GIF/BMP, multi-frame GIF for frame sampling). Container
  * media (mp4/mkv video, mp3/flac audio) enters through the
  * [[Transcoder]] seam — [[transcodeAudioSplit]], [[containerFrames]],
  * [[probeMedia]] — which converts it INTO the raw forms this file and
  * [[Audio]] already process ([[FfmpegCliTranscoder]] in production).
  *
  * The per-partition construction mirrors the external-model pattern
  * (SURVEY.md §2.10 R7 / §2.11 V1): expensive native resources are
  * initialized once per partition, not per row.
  */
final case class MediaFile(
    path: String, kind: String, length: Long, content: Array[Byte])

final case class DecodedImage(
    path: String, width: Int, height: Int, channels: Int,
    pixels: Array[Byte])

final case class MediaFeatures(
    path: String, kind: String, width: Int, height: Int,
    embedding: Array[Float])

final case class VideoFrame(
    path: String, frameIdx: Int, image: DecodedImage)

final case class ProbedMedia(
    path: String, kind: String, container: String, durationMs: Long,
    audioCodecs: Seq[String], videoCodecs: Seq[String])

/** Pluggable codec boundary. Implementations must be Serializable and
  * cheap to construct OR constructed per partition (see decodeImages).
  */
trait MediaDecoder extends Serializable {
  def decodeImage(bytes: Array[Byte]): DecodedImage
  def frameCount(bytes: Array[Byte]): Int
  def decodeFrame(bytes: Array[Byte], idx: Int): DecodedImage
}

object Multimodal {

  /** Read a directory of media files as binary columns via Spark's
    * binaryFile source (path/length/content), tagging a media kind from
    * the extension. The 100 TB shape: content stays opaque bytes until
    * a decode stage asks for it; pushdown prunes on path/length. */
  def readMediaDir(spark: SparkSession, path: String): Dataset[MediaFile] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"),
        lower(element_at(split(col("path"), "\\."), -1)).as("ext"),
        col("length"), col("content"))
      .withColumn("kind",
        when(col("ext").isin("jpg", "jpeg", "png", "gif"), "image")
          .when(col("ext").isin("mp3", "wav", "flac"), "audio")
          .when(col("ext").isin("mp4", "avi", "mkv"), "video")
          .otherwise("other"))
      .select(col("path"), col("kind"), col("length"), col("content"))
      .as[MediaFile]
  }

  /** Decode stage: one decoder instance per partition (the executor-
    * side native-resource cache pattern), streaming through rows.
    *
    * Corrupt-tolerant by design: a 100 TB media corpus always contains
    * truncated/mislabeled files, and one bad row must not kill the job —
    * undecodable rows are dropped and counted (see [[decodeImagesSplit]]
    * when the rejects themselves are wanted as data). */
  def decodeImages(files: Dataset[MediaFile],
      mkDecoder: () => MediaDecoder = () => ImageIoDecoder)
      : Dataset[DecodedImage] = {
    import files.sparkSession.implicits._
    files.filter(_.kind == "image").mapPartitions { it =>
      val dec = mkDecoder() // per-partition init, reused across rows
      it.flatMap { f =>
        scala.util.Try(dec.decodeImage(f.content).copy(path = f.path))
          .toOption
      }
    }
  }

  /** Decode with the rejects kept: returns (decoded, rejectPaths) so a
    * pipeline can quarantine/report corrupt inputs instead of silently
    * shrinking. ONE decode pass: each image is decoded exactly once
    * into a tagged attempt row (the codec is the dominant cost — a
    * second rejects pass would double it), cached, then filtered to
    * the two sides. */
  def decodeImagesSplit(files: Dataset[MediaFile],
      mkDecoder: () => MediaDecoder = () => ImageIoDecoder)
      : (Dataset[DecodedImage], Dataset[String]) = {
    import files.sparkSession.implicits._
    val attempts = files.filter(_.kind == "image").mapPartitions { it =>
      val dec = mkDecoder()
      it.map { f =>
        scala.util.Try(dec.decodeImage(f.content).copy(path = f.path)) match {
          case scala.util.Success(img) => (f.path, Option(img))
          case scala.util.Failure(_) => (f.path, Option.empty[DecodedImage])
        }
      }
    }.cache()
    (attempts.flatMap(_._2), attempts.filter(_._2.isEmpty).map(_._1))
  }

  /** Nearest-neighbor resize on the decoded raster — pure Scala, no
    * codec needed, fully distributed. */
  def resize(img: DecodedImage, w: Int, h: Int): DecodedImage = {
    val out = new Array[Byte](w * h * img.channels)
    var y = 0
    while (y < h) {
      val sy = y * img.height / h
      var x = 0
      while (x < w) {
        val sx = x * img.width / w
        var c = 0
        while (c < img.channels) {
          out((y * w + x) * img.channels + c) =
            img.pixels((sy * img.width + sx) * img.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    DecodedImage(img.path, w, h, img.channels, out)
  }

  /** Feature extraction: fixed-size mean-pool embedding per image
    * (resize to 8x8, mean per cell across channels) — deterministic,
    * the plumbing twin of a CNN/CLIP embed stage. */
  def featurize(images: Dataset[DecodedImage], dim: Int = 64)
      : Dataset[MediaFeatures] = {
    import images.sparkSession.implicits._
    val side = math.sqrt(dim.toDouble).toInt
    images.map { img =>
      val small = resize(img, side, side)
      val emb = Array.tabulate(side * side) { i =>
        var s = 0.0f
        var c = 0
        while (c < small.channels) {
          s += small.pixels(i * small.channels + c).toFloat
          c += 1
        }
        s / small.channels / 128.0f
      }
      MediaFeatures(img.path, "image", img.width, img.height, emb)
    }
  }

  /** RIFF/WAVE sniff — bytes the PCM path decodes directly, no
    * transcode needed. */
  private def isWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE"

  /** Transcode stage for compressed/container audio (mp3/flac, AND
    * mp4/mkv/avi soundtracks — video-kind rows are routed through the
    * same stage, because `readMediaDir` classifies containers as
    * "video" and their soundtrack would otherwise silently never reach
    * the transcoder, ADVICE r15) through the injectable [[Transcoder]]
    * seam: audio rows that are already RIFF/WAVE pass through
    * untouched (sniffed, not extension-trusted); everything else goes
    * through the executor-cached [[TranscoderSession]] and comes back
    * as WAV PCM16 bytes that [[Audio.decodeAudioSplit]]'s `WavDecoder`
    * consumes unchanged, re-kinded "audio" (the content IS audio now).
    * A container with no audio stream lands in rejectPaths — for a
    * soundtrack-extraction stage, "nothing to extract" and "corrupt"
    * both mean the row produced no audio; callers who need the
    * distinction probe first ([[probeMedia]], audioCodecs.isEmpty).
    * Returns (audio-as-WAV, rejectPaths) — same ONE-pass quarantine
    * economics as [[decodeImagesSplit]]: the codec runs exactly once
    * per row, the attempt frame is cached, then filtered to sides. */
  def transcodeAudioSplit(files: Dataset[MediaFile],
      transcoder: Transcoder): (Dataset[MediaFile], Dataset[String]) = {
    import files.sparkSession.implicits._
    val attempts = files.filter(f => f.kind == "audio" || f.kind == "video")
      .mapPartitions { it =>
        // per-JVM session via the cache — tasks share one codec handle
        lazy val session = TranscoderCache.get(transcoder)
        it.map { f =>
          // pass-through rows re-kind too: a video-kind row whose bytes
          // are already RIFF/WAVE is audio from here on, same as the
          // transcoded rows (ADVICE r16 — downstream filters on kind)
          if (isWav(f.content)) (f.path, Option(f.copy(kind = "audio")))
          else scala.util.Try(session.transcodeAudio(f.content)) match {
            case scala.util.Success(wav) =>
              (f.path, Option(f.copy(kind = "audio",
                length = wav.length.toLong, content = wav)))
            case scala.util.Failure(_) => (f.path, Option.empty[MediaFile])
          }
        }
      }.cache()
    (attempts.flatMap(_._2), attempts.filter(_._2.isEmpty).map(_._1))
  }

  /** Frame sampling for CONTAINER video (mp4/mkv/avi) through the
    * [[Transcoder]] seam: each video row fans out to its sampled
    * frames as [[DecodedImage]] rasters — the same downstream type as
    * [[decodeImages]], so resize/featurize/pHash compose unchanged.
    * Corrupt containers yield zero frames (the [[sampleFrames]]
    * stance); use [[transcodeAudioSplit]]'s pattern when the rejects
    * themselves are wanted. */
  def containerFrames(files: Dataset[MediaFile], everyN: Int,
      transcoder: Transcoder): Dataset[VideoFrame] = {
    import files.sparkSession.implicits._
    require(everyN >= 1, "everyN must be >= 1")
    files.filter(_.kind == "video").mapPartitions { it =>
      lazy val session = TranscoderCache.get(transcoder)
      it.flatMap { f =>
        scala.util.Try(session.frames(f.content, everyN).toSeq)
          .getOrElse(Seq.empty)
          .iterator.map { case (idx, img) =>
            VideoFrame(f.path, idx, img.copy(path = f.path)) }
      }
    }
  }

  /** Video near-duplicate detection by sampled KEYFRAMES — the
    * multimodal twin of [[graft.ops.VectorDedupIndex]]'s probePairs
    * and the composition VERDICT r15 item 8 asked for, as ONE call:
    * [[containerFrames]] (every `everyN`th frame through the
    * [[Transcoder]] seam) → [[PHash.phash64]] per frame →
    * [[videoPairsFromFrameHashes]] (the relational half: band
    * blocking → capped candidates → exact Hamming verify →
    * per-video-pair rollup). Two videos are near-dups when a large
    * fraction of one's keyframes each have a ≤`hammingMax`-bit match
    * in the other (re-encodes, resizes, watermarks survive pHash;
    * cuts/edits lower the fraction).
    *
    * Returns (pairs, droppedBands): pairs =
    * (video_a, video_b, matched_a, matched_b, n_frames_a, n_frames_b,
    * shared_frac) with video_a < video_b and `shared_frac =
    * min(matched_a/n_frames_a, matched_b/n_frames_b)` — threshold it
    * (≥ 0.5 is the usual near-dup band); droppedBands is the
    * [[graft.ops.Blocking.capBuckets]] report (flat-content frames —
    * test patterns, black frames — make hot bands; they are dropped
    * AND reported, never silent, the d11 stance). */
  def videoNearDupPairs(files: Dataset[MediaFile], everyN: Int,
      transcoder: Transcoder, hammingMax: Int = 10,
      bucketCap: Int = 10000, bands: Int = 4): (DataFrame, DataFrame) = {
    import files.sparkSession.implicits._
    val hashed = containerFrames(files, everyN, transcoder)
      .map(f => (f.path, f.frameIdx, PHash.phash64(f.image)))
      .toDF("video", "frame_idx", "phash")
    videoPairsFromFrameHashes(hashed, hammingMax, bucketCap, bands)
  }

  /** The relational half of [[videoNearDupPairs]], over an already
    * hashed (video: string, frame_idx, phash: long) frame table —
    * factored out so a standing frame-hash index (hash once, probe
    * nightly) and the DuckDB oracle (m01) drive the exact code the
    * end-to-end path runs. Input contract: one row per
    * (video, frame_idx) — what the hashing pass upstream produces by
    * construction (one pHash per decoded frame); the distinct-hash
    * candidate join below counts on it.
    *
    * Recall contract (ADVICE r16 — the old require overclaimed):
    * exact-equality blocking on `bands` disjoint hash slices
    * guarantees a candidate pair only for Hamming distance ≤ bands−1
    * (pigeonhole: `bands` differing bits can land one per band, so no
    * band matches). A `hammingMax` above bands−1 is BEST-EFFORT LSH —
    * near-dup pHashes concentrate their few flipped bits, so most
    * real pairs still share a clean band, but spread-bit diffs can be
    * missed. Callers needing a hard guarantee at larger distances
    * raise `bands` (64/bands-bit keys: 8 bands guarantees h ≤ 7) and
    * accept hotter buckets — fewer key bits per band means more
    * false candidates, which is exactly the `bucketCap` + dropped
    * report trade.
    *
    * Scale shape (100 TB of video): decode+hash is one pure map pass
    * per frame — no shuffle until the band join, which carries only
    * (video, frame_idx, 64-bit hash)×bands rows, never rasters or
    * bytes; candidate fan-out is bounded by `bucketCap`; the rollup
    * aggregates the verified pairs only. Same-video matches are
    * excluded before the verify, so self-similar videos (title
    * cards) cost candidates, not results. */
  def videoPairsFromFrameHashes(hashed: DataFrame, hammingMax: Int = 10,
      bucketCap: Int = 10000, bands: Int = 4): (DataFrame, DataFrame) = {
    require(hammingMax >= 0, s"hammingMax must be >= 0, got $hammingMax")
    val nFrames = hashed.groupBy("video")
      .agg(count(lit(1)).as("n_frames"))
    // r18 optimization (guide §2.3 "shuffle keys and metadata instead
    // of payloads", §3.3 "join first on the un-exploded key"): video
    // frame hashes repeat heavily (static shots, title cards, wrapped
    // content), and the within-bucket candidate join is QUADRATIC in
    // bucket population — so collapse to one row per DISTINCT
    // (video, phash) first, carry the frame multiplicity `nf`, and run
    // the band join over distinct hashes only. Row-for-row equivalent
    // to banding raw frames because (a) frames sharing (video, phash)
    // band identically, (b) capBuckets drops whole buckets, so the
    // weighted cap keeps exactly the same buckets, and (c) a frame's
    // matched-status depends only on its hash, and frame SETS of
    // different hashes within a video are disjoint — so
    // countDistinct(frame) = Σ nf over distinct matched hashes.
    // (Requires the documented input contract: one row per
    // (video, frame_idx).) Measured at sf1: the m02 8-band arm's join
    // shrinks ~12× and x34's corpus re-pair ~8×.
    val uniq = hashed.groupBy("video", "phash")
      .agg(count(lit(1)).as("nf"))
    // banding shared with the standing index so the batch path and
    // [[VideoFrameIndex.probePairs]] can never drift
    val banded = VideoFrameIndex.bandRowsKeeping(uniq, bands)
    val (kept, dropped) = graft.ops.Blocking.capBucketsWeighted(
      banded, Seq("band", "bkey"), bucketCap, "nf")
    val a = kept.select(col("band"), col("bkey"),
      col("video").as("video_a"), col("phash").as("ph_a"),
      col("nf").as("nf_a"))
    val b = kept.select(col("band"), col("bkey"),
      col("video").as("video_b"), col("phash").as("ph_b"),
      col("nf").as("nf_b"))
    val hashPairs = a.join(b, Seq("band", "bkey"))
      .filter(col("video_a") < col("video_b")) // cross-video, canonical
      .filter(bit_count(col("ph_a").bitwiseXOR(col("ph_b")))
        <= hammingMax)
    // one aggregation pass: collect_set dedups multi-band / multi-
    // partner hash matches (nf is functionally determined by
    // (video, phash), so set identity is hash identity), then the
    // in-row fold sums the multiplicities — the sets are bounded by
    // distinct hashes per video, tiny next to the frame count
    val pairs = hashPairs
      .groupBy("video_a", "video_b")
      .agg(collect_set(struct(col("ph_a"), col("nf_a"))).as("sa"),
        collect_set(struct(col("ph_b"), col("nf_b"))).as("sb"))
      .select(col("video_a"), col("video_b"),
        aggregate(col("sa"), lit(0L), (acc, x) => acc + x("nf_a"))
          .as("matched_a"),
        aggregate(col("sb"), lit(0L), (acc, x) => acc + x("nf_b"))
          .as("matched_b"))
      .join(nFrames.select(col("video").as("video_a"),
        col("n_frames").as("n_frames_a")), Seq("video_a"))
      .join(nFrames.select(col("video").as("video_b"),
        col("n_frames").as("n_frames_b")), Seq("video_b"))
      .select(col("video_a"), col("video_b"),
        col("matched_a"), col("matched_b"),
        col("n_frames_a"), col("n_frames_b"),
        least(col("matched_a").cast("double") / col("n_frames_a"),
          col("matched_b").cast("double") / col("n_frames_b"))
          .as("shared_frac"))
    (pairs, dropped)
  }

  /** Container metadata extraction — the cheap probe pass a curation
    * pipeline runs BEFORE deciding what to decode (gate on duration /
    * codec allow-list, then transcode only survivors). Unprobeable
    * rows surface with container="error" rather than vanishing: the
    * gate decides, not the probe. */
  def probeMedia(files: Dataset[MediaFile], transcoder: Transcoder)
      : Dataset[ProbedMedia] = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      lazy val session = TranscoderCache.get(transcoder)
      it.map { f =>
        scala.util.Try(session.probe(f.content)) match {
          case scala.util.Success(p) =>
            ProbedMedia(f.path, f.kind, p.container, p.durationMs,
              p.audioCodecs, p.videoCodecs)
          case scala.util.Failure(_) =>
            ProbedMedia(f.path, f.kind, "error", -1L, Seq.empty, Seq.empty)
        }
      }
    }
  }

  /** Frame sampling for video: every nth frame via flatMap — one input
    * row fans out to its sampled frames, preserving distribution. */
  def sampleFrames(files: Dataset[MediaFile], everyN: Int,
      mkDecoder: () => MediaDecoder = () => ImageIoDecoder)
      : Dataset[VideoFrame] = {
    import files.sparkSession.implicits._
    files.filter(_.kind == "video").mapPartitions { it =>
      val dec = mkDecoder()
      it.flatMap { f =>
        // same corrupt-tolerance as decodeImages, at BOTH levels: a bad
        // container yields zero frames, and a container whose structure
        // scans cleanly but whose frame data is corrupt drops just the
        // bad frames — neither kills the job
        val n = scala.util.Try(dec.frameCount(f.content)).getOrElse(0)
        (0 until n by everyN).iterator.flatMap(i =>
          scala.util.Try(
            VideoFrame(f.path, i, dec.decodeFrame(f.content, i))).toOption)
      }
    }
  }
}
