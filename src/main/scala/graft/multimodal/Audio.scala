package graft.multimodal

import org.apache.spark.sql.Dataset

/** Audio modality (SURVEY.md north-star multimodal columns): opaque
  * `binary` content + typed metadata in, decoded PCM and frame-level
  * features out, with the same per-partition decoder reuse and
  * corrupt-row quarantine as the image path ([[Multimodal]]).
  *
  * The WAV/PCM16 decoder is REAL (RIFF chunk walk — a published,
  * public container format); compressed codecs (mp3/flac) are a
  * decoder-trait implementation away and change none of the Spark
  * plumbing, which is the part under test here.
  */
final case class DecodedAudio(
    path: String, sampleRate: Int, channels: Int, samples: Array[Float])

final case class AudioFrameFeatures(
    path: String, frame: Int, rms: Double, zcr: Double)

trait AudioDecoder extends Serializable {
  def decodeAudio(bytes: Array[Byte]): DecodedAudio
}

/** RIFF/WAVE PCM16 parser: walks fmt/data chunks, folds interleaved
  * channels to mono float in [-1, 1). Anything malformed throws — the
  * decode stage quarantines, it never guesses. */
object WavDecoder extends AudioDecoder {

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  override def decodeAudio(bytes: Array[Byte]): DecodedAudio = {
    require(bytes.length >= 44, "truncated WAV header")
    require(tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
      "not a RIFF/WAVE file")
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None // (offset, length)
    while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(bytes, off)
      val size = le32(bytes, off + 4)
      // Long arithmetic: a crafted size near Int.MaxValue must not
      // int-overflow past the bound and surface later as an AIOOBE
      require(size >= 0 && off.toLong + 8L + size <= bytes.length,
        s"chunk '$id' overruns the file")
      id match {
        case "fmt " =>
          require(size >= 16, "fmt chunk too short")
          val audioFormat = le16(bytes, off + 8)
          require(audioFormat == 1, s"not PCM (format $audioFormat)")
          val channels = le16(bytes, off + 10)
          val rate = le32(bytes, off + 12)
          val bits = le16(bytes, off + 22)
          require(channels > 0 && rate > 0, "bad fmt values")
          require(bits == 16, s"only PCM16 supported, got $bits-bit")
          fmt = Some((channels, rate, bits))
        case "data" => data = Some((off + 8, size))
        case _ => ()
      }
      off += 8 + size + (size & 1) // chunks pad to even
    }
    val (channels, rate, _) =
      fmt.getOrElse(throw new IllegalArgumentException("no fmt chunk"))
    val (dOff, dLen) =
      data.getOrElse(throw new IllegalArgumentException("no data chunk"))
    val nFrames = dLen / (2 * channels)
    val mono = new Array[Float](nFrames)
    var i = 0
    while (i < nFrames) {
      var s = 0.0f
      var c = 0
      while (c < channels) {
        s += (le16(bytes, dOff + (i * channels + c) * 2).toShort / 32768.0f)
        c += 1
      }
      mono(i) = s / channels
      i += 1
    }
    DecodedAudio("", rate, channels, mono)
  }
}

object Audio {

  /** Decode with rejects kept (the [[Multimodal.decodeImagesSplit]]
    * contract for audio): one decode pass, per-partition decoder,
    * corrupt rows quarantined by path — never job-fatal. */
  def decodeAudioSplit(files: Dataset[MediaFile],
      mkDecoder: () => AudioDecoder = () => WavDecoder)
      : (Dataset[DecodedAudio], Dataset[String]) = {
    import files.sparkSession.implicits._
    val attempts = files.filter(_.kind == "audio").mapPartitions { it =>
      val dec = mkDecoder()
      it.map { f =>
        scala.util.Try(dec.decodeAudio(f.content).copy(path = f.path)) match {
          case scala.util.Success(a) => (f.path, Option(a))
          case scala.util.Failure(_) => (f.path, Option.empty[DecodedAudio])
        }
      }
    }.cache()
    (attempts.flatMap(_._2), attempts.filter(_._2.isEmpty).map(_._1))
  }

  /** Frame-level features — RMS energy and zero-crossing rate per
    * `frameLen`-sample window at `hop` stride (the classic cheap
    * audio descriptors; the deterministic stand-in for a learned
    * embedder, exactly like the image mean-pool in
    * [[Multimodal.featurize]]). One input row fans out to its frames
    * map-side; no shuffle. */
  def frameFeatures(audio: Dataset[DecodedAudio], frameLen: Int = 1024,
      hop: Int = 512): Dataset[AudioFrameFeatures] = {
    require(frameLen > 1 && hop > 0, "bad framing")
    import audio.sparkSession.implicits._
    audio.flatMap { a =>
      val n = a.samples.length
      val starts = 0 until math.max(n - frameLen + 1, math.min(n, 1)) by hop
      starts.iterator.zipWithIndex.map { case (s0, fi) =>
        val end = math.min(s0 + frameLen, n)
        var sq = 0.0
        var crossings = 0
        var i = s0
        while (i < end) {
          val x = a.samples(i)
          sq += x.toDouble * x.toDouble
          if (i > s0 &&
            (x >= 0) != (a.samples(i - 1) >= 0)) crossings += 1
          i += 1
        }
        val len = end - s0
        AudioFrameFeatures(a.path, fi, math.sqrt(sq / len),
          crossings.toDouble / math.max(len - 1, 1))
      }
    }
  }
}
