package graft.multimodal

import java.nio.file.{Files, Path}

/** Container-media transcoding seam (SURVEY.md north-star multimodal;
  * VERDICT r14 item 7): mp4/mkv video and mp3/flac audio arrive as
  * opaque binary columns, but decoding them takes a native codec
  * stack (ffmpeg) that is not a JVM library. So — exactly like the
  * external model boundary in [[graft.embed.ExternalInference]] — the
  * codec is an injectable executor-side resource behind a
  * serializable factory: the factory ships in the closure, the live
  * session (a process handle / JNI context) opens lazily ON the
  * executor and is cached per (JVM, cacheKey) in [[TranscoderCache]],
  * and every Spark-side concern (per-partition reuse, corrupt-row
  * quarantine, one-decode-pass economics, composition into the
  * existing WAV/image operators) is real and spec-tested with a
  * deterministic fake. [[FfmpegCliTranscoder]] is the production
  * implementation; its live spec is env-gated on an ffmpeg binary.
  *
  * Output contract: transcoded audio is RIFF/WAVE PCM16 bytes — the
  * format [[WavDecoder]] already decodes — and video frames surface
  * as [[DecodedImage]] rasters, so everything downstream (resize,
  * featurize, pHash, quarantine reporting) is the already-tested
  * single-modality code. The seam converts formats; it never grows a
  * second feature pipeline.
  */
final case class MediaProbe(
    container: String, durationMs: Long,
    audioCodecs: Seq[String], videoCodecs: Seq[String])

/** Live codec handle. Opened on the executor, shared by that JVM's
  * tasks ([[TranscoderCache]]) — implementations must be thread-safe.
  * Anything undecodable must THROW: the operators quarantine, the
  * session never guesses (same stance as [[WavDecoder]]). */
trait TranscoderSession {
  /** Cheap container identity — never decodes frame data. */
  def probe(bytes: Array[Byte]): MediaProbe

  /** Container/compressed audio → RIFF/WAVE PCM16 bytes
    * ([[WavDecoder]]-ready). */
  def transcodeAudio(bytes: Array[Byte]): Array[Byte]

  /** Container video → every `everyN`th frame as a decoded raster,
    * with its ordinal in the sampled sequence's source positions. */
  def frames(bytes: Array[Byte], everyN: Int): Iterator[(Int, DecodedImage)]
}

/** Serializable factory for a per-executor [[TranscoderSession]] —
  * the transcoding twin of [[graft.embed.InferenceTransport]]. */
trait Transcoder extends Serializable {
  /** Sessions are cached per (executor JVM, cacheKey): two transcoders
    * with the same key share one session. */
  def cacheKey: String

  /** Open the live session — called at most once per (JVM, cacheKey). */
  def open(): TranscoderSession
}

/** Executor-side session cache — same race-safe construction as
  * [[graft.embed.InferenceClientCache]]: lock-free hit path, creation
  * synchronized so concurrent first tasks open exactly ONE session. */
object TranscoderCache {
  private val sessions =
    scala.collection.concurrent.TrieMap.empty[String, TranscoderSession]

  def get(t: Transcoder): TranscoderSession =
    sessions.getOrElse(t.cacheKey, this.synchronized {
      sessions.getOrElseUpdate(t.cacheKey, t.open())
    })

  /** Test/lifecycle hook: drop cached sessions (e.g. between suites). */
  def clear(): Unit = sessions.clear()
}

/** Production transcoder: drives the ffmpeg/ffprobe CLI (public,
  * ubiquitous, zero JVM dependencies). Each call stages the bytes to
  * a private temp file and runs the tool on it — temp files rather
  * than stdin pipes because (a) mp4's moov atom is frequently at the
  * tail, which a non-seekable pipe cannot serve, and (b) a finalized
  * output FILE gets correct RIFF sizes where streamed WAV writes
  * 0xFFFFFFFF placeholders. Frames are emitted as PNGs and decoded by
  * the JDK's own [[ImageIoDecoder]] — ffmpeg converts containers, the
  * existing tested decoder makes rasters.
  *
  * Thread-safety: every call works in its own temp directory and
  * spawns its own process; the session object holds no mutable state.
  * Live coverage: `FfmpegLiveSpec` (cancels where no ffmpeg binary —
  * this sandbox has none; the plumbing spec runs everywhere on
  * [[TranscoderSession]] fakes). */
final case class FfmpegCliTranscoder(
    ffmpeg: String = "ffmpeg", ffprobe: String = "ffprobe")
    extends Transcoder {

  override def cacheKey: String = s"ffmpeg-cli:$ffmpeg:$ffprobe"

  override def open(): TranscoderSession = new TranscoderSession {

    override def probe(bytes: Array[Byte]): MediaProbe =
      withStaged(bytes) { in =>
        // compact output with `|` separator and key=value items —
        // NOT csv: ffprobe's multi-name containers put commas IN the
        // value (mp4 = "mov,mp4,m4a,3gp,3g2,mj2", mkv =
        // "matroska,webm"), so a comma-split mangles exactly the
        // primary targets (ADVICE r15). `|` cannot appear in format
        // or codec names; parser unit-tested on canned mp4/mkv output
        // in TranscoderSpec.
        val out = run(Seq(ffprobe, "-v", "error",
          "-show_entries", "format=format_name,duration",
          "-show_entries", "stream=codec_type,codec_name",
          "-of", "compact=p=1:s=|", in.toString))
        FfmpegCliTranscoder.parseProbe(out)
      }

    override def transcodeAudio(bytes: Array[Byte]): Array[Byte] =
      withStaged(bytes) { in =>
        val out = in.resolveSibling("out.wav")
        // -vn: drop video streams explicitly — container inputs
        // (mp4/mkv) carry both, and this stage extracts the soundtrack
        run(Seq(ffmpeg, "-v", "error", "-y", "-i", in.toString, "-vn",
          "-f", "wav", "-acodec", "pcm_s16le", out.toString))
        Files.readAllBytes(out)
      }

    override def frames(bytes: Array[Byte], everyN: Int)
        : Iterator[(Int, DecodedImage)] =
      withStaged(bytes) { in =>
        val dir = in.getParent
        // select every Nth source frame; -vsync vfr keeps the emitted
        // sequence 1:1 with the selected frames
        run(Seq(ffmpeg, "-v", "error", "-y", "-i", in.toString,
          "-vf", s"select=not(mod(n\\,$everyN))", "-vsync", "vfr",
          dir.resolve("frame%06d.png").toString))
        import scala.jdk.CollectionConverters._
        val pngs = Files.list(dir).iterator().asScala
          .filter(_.getFileName.toString.startsWith("frame"))
          .toSeq.sortBy(_.getFileName.toString)
        // materialized before withStaged deletes the temp dir; frame
        // ordinal i maps back to source frame i*everyN
        pngs.zipWithIndex.map { case (p, i) =>
          (i * everyN,
            ImageIoDecoder.decodeImage(Files.readAllBytes(p)))
        }.iterator
      }

    /** Stage bytes to a fresh private temp dir, run `f`, always clean
      * up — per-call isolation is what makes the session thread-safe. */
    private def withStaged[A](bytes: Array[Byte])(f: Path => A): A = {
      val dir = Files.createTempDirectory("graft-ffmpeg")
      val in = dir.resolve("in.bin")
      Files.write(in, bytes)
      try f(in)
      finally {
        import scala.jdk.CollectionConverters._
        val walk = Files.walk(dir)
        try walk.iterator().asScala.toSeq.reverse
          .foreach(p => Files.deleteIfExists(p))
        finally walk.close()
      }
    }

    /** Drains stdout and stderr CONCURRENTLY: reading stdout to EOF
      * before touching stderr deadlocks when the child fills the OS
      * pipe buffer (~64 KB) on stderr while stdout is still open —
      * corrupt media makes ffmpeg spam stderr even at `-v error`
      * (ADVICE r15). stderr drains on a daemon thread while the call
      * thread reads stdout. */
    private def run(cmd: Seq[String]): String = {
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(false)
      val proc = pb.start()
      proc.getOutputStream.close()
      val errRef = new java.util.concurrent.atomic.AtomicReference[String]("")
      val drainer = new Thread(() =>
        errRef.set(new String(proc.getErrorStream.readAllBytes, "UTF-8")))
      drainer.setDaemon(true)
      drainer.start()
      val out = new String(proc.getInputStream.readAllBytes, "UTF-8")
      val code = proc.waitFor()
      drainer.join(10000L)
      if (code != 0)
        throw new IllegalArgumentException(
          s"${cmd.head} exited $code: ${errRef.get.take(500)}")
      out
    }
  }
}

object FfmpegCliTranscoder {
  /** Parses ffprobe `-of compact=p=1:s=|` output (one `section|k=v|…`
    * line per section) into a [[MediaProbe]]. Pure and public so the
    * comma-bearing-container case is unit-testable without an ffmpeg
    * binary (the live spec is env-gated; this parser is not). */
  def parseProbe(out: String): MediaProbe = {
    def kv(fields: Seq[String]): Map[String, String] =
      fields.flatMap { f =>
        f.split("=", 2) match {
          case Array(k, v) => Some(k -> v)
          case _ => None
        }
      }.toMap
    val lines = out.linesIterator.map(_.trim).filter(_.nonEmpty)
      .map(_.split("\\|").toSeq).toSeq
    val fmt = lines.find(_.headOption.contains("format")).map(l => kv(l.tail))
      .getOrElse(throw new IllegalArgumentException("ffprobe: no format"))
    val streams = lines.filter(_.headOption.contains("stream"))
      .map(l => kv(l.tail))
    MediaProbe(
      container = fmt.getOrElse("format_name", "unknown"),
      durationMs = fmt.get("duration")
        .flatMap(d => scala.util.Try((d.toDouble * 1000).toLong).toOption)
        .getOrElse(-1L),
      audioCodecs = streams.collect {
        case s if s.get("codec_type").contains("audio") =>
          s.getOrElse("codec_name", "unknown") },
      videoCodecs = streams.collect {
        case s if s.get("codec_type").contains("video") =>
          s.getOrElse("codec_name", "unknown") })
  }
}
