package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.ByteOrder.LITTLE_ENDIAN
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec

/** Deterministic toy container format ("GFT?") + a fake [[Transcoder]]
  * over it: proves every Spark-side half of the ffmpeg seam — sniffed
  * WAV passthrough, one-pass quarantine, per-JVM session caching,
  * frame fan-out composing into the existing image operators — with
  * no native codec in the loop. The ffmpeg half runs in
  * [[FfmpegLiveSpec]] where a binary exists. */
object FakeContainer {
  /** "GFTA" rate:int32le n:int32le samples:n*int16le */
  def audio(rate: Int, samples: Array[Short]): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + samples.length * 2)
      .order(LITTLE_ENDIAN)
    bb.put("GFTA".getBytes("US-ASCII")).putInt(rate).putInt(samples.length)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** "GFTV" seed:int32le nFrames:int32le w:byte h:byte */
  def video(seed: Int, nFrames: Int, w: Int, h: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(14).order(LITTLE_ENDIAN)
    bb.put("GFTV".getBytes("US-ASCII")).putInt(seed).putInt(nFrames)
      .put(w.toByte).put(h.toByte)
    bb.array()
  }

  def framePixels(seed: Int, idx: Int, w: Int, h: Int): Array[Byte] =
    Array.tabulate[Byte](w * h * 3)(i =>
      ((seed * 31 + idx * 131 + i * 7) % 256 - 128).toByte)
}

object FakeTranscoderState {
  val opens = new AtomicInteger(0)
}

final case class FakeTranscoder(key: String = "fake") extends Transcoder {
  override def cacheKey: String = s"fake:$key"

  override def open(): TranscoderSession = {
    FakeTranscoderState.opens.incrementAndGet()
    new TranscoderSession {
      private def buf(bytes: Array[Byte]) =
        ByteBuffer.wrap(bytes).order(LITTLE_ENDIAN)
      private def magic(bytes: Array[Byte]): String =
        if (bytes.length < 14) "short"
        else new String(bytes, 0, 4, "US-ASCII")

      override def probe(bytes: Array[Byte]): MediaProbe = magic(bytes) match {
        case "GFTA" =>
          val b = buf(bytes); b.position(4)
          val rate = b.getInt; val n = b.getInt
          MediaProbe("gfta", n.toLong * 1000 / rate, Seq("pcm_s16le"), Nil)
        case "GFTV" =>
          val b = buf(bytes); b.position(8)
          val n = b.getInt
          MediaProbe("gftv", n.toLong * 100, Nil, Seq("rawvideo"))
        case m => throw new IllegalArgumentException(s"bad magic $m")
      }

      override def transcodeAudio(bytes: Array[Byte]): Array[Byte] = {
        require(magic(bytes) == "GFTA", "not GFTA audio")
        val b = buf(bytes); b.position(4)
        val rate = b.getInt; val n = b.getInt
        val samples = Array.fill(n)(b.getShort)
        // independent WAV construction (same stance as AudioSpec's
        // writer): the fake emits spec-conformant RIFF bytes, the
        // production WavDecoder consumes them — seam proven end-to-end
        val out = new ByteArrayOutputStream()
        def w16(v: Int): Unit = {
          out.write(v & 0xff); out.write((v >> 8) & 0xff) }
        def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
        out.write("RIFF".getBytes); w32(36 + n * 2); out.write("WAVE".getBytes)
        out.write("fmt ".getBytes); w32(16); w16(1); w16(1)
        w32(rate); w32(rate * 2); w16(2); w16(16)
        out.write("data".getBytes); w32(n * 2)
        samples.foreach(s => w16(s & 0xffff))
        out.toByteArray
      }

      override def frames(bytes: Array[Byte], everyN: Int)
          : Iterator[(Int, DecodedImage)] = {
        require(magic(bytes) == "GFTV", "not GFTV video")
        val b = buf(bytes); b.position(4)
        val seed = b.getInt; val n = b.getInt
        val w = b.get.toInt; val h = b.get.toInt
        (0 until n by everyN).iterator.map(i =>
          (i, DecodedImage("", w, h, 3,
            FakeContainer.framePixels(seed, i, w, h))))
      }
    }
  }
}

class TranscoderSpec extends SparkSpec {

  override def beforeAll(): Unit = { super.beforeAll(); TranscoderCache.clear() }
  override def afterAll(): Unit = { TranscoderCache.clear(); super.afterAll() }

  private def sine(n: Int, freq: Double, rate: Double, amp: Double) =
    Array.tabulate(n)(i =>
      (amp * 32767 * math.sin(2 * math.Pi * freq * i / rate)).toShort)

  private def writeMediaDir(): String = {
    val dir = Files.createTempDirectory("graft_transcode").toString
    // a REAL WAV (AudioSpec's independent writer shape, mono) — must
    // pass through the transcode stage byte-identical
    val wavBytes = {
      val samples = sine(4000, 440, 8000, 0.5)
      val out = new ByteArrayOutputStream()
      def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
      out.write("RIFF".getBytes); w32(36 + samples.length * 2)
      out.write("WAVE".getBytes)
      out.write("fmt ".getBytes); w32(16); w16(1); w16(1)
      w32(8000); w32(16000); w16(2); w16(16)
      out.write("data".getBytes); w32(samples.length * 2)
      samples.foreach(s => w16(s & 0xffff))
      out.toByteArray
    }
    Files.write(Paths.get(dir, "direct.wav"), wavBytes)
    Files.write(Paths.get(dir, "tone.mp3"),
      FakeContainer.audio(8000, sine(8000, 440, 8000, 0.5)))
    Files.write(Paths.get(dir, "broken.mp3"),
      "not a container at all....".getBytes)
    Files.write(Paths.get(dir, "clip.mp4"),
      FakeContainer.video(seed = 7, nFrames = 10, w = 16, h = 12))
    Files.write(Paths.get(dir, "bad.mkv"), "torn video".getBytes)
    // a VIDEO-extension file whose container carries a soundtrack the
    // fake can extract: readMediaDir kinds it "video", and the r15
    // ADVICE fix says video-kind rows must still reach the audio
    // transcode stage (mp4 soundtracks)
    Files.write(Paths.get(dir, "sound.mp4"),
      FakeContainer.audio(8000, sine(4000, 220, 8000, 0.25)))
    dir
  }

  test("audio transcode: WAV passthrough, container transcode, quarantine") {
    val files = Multimodal.readMediaDir(spark, writeMediaDir())
    val (asWav, rejects) =
      Multimodal.transcodeAudioSplit(files, FakeTranscoder())
    val out = asWav.collect().map(f => f.path.split('/').last -> f).toMap
    // passthrough is BYTE-identical: the sniff, not the extension,
    // decides (direct.wav never visits the codec)
    val original = files.collect()
      .find(_.path.endsWith("direct.wav")).get.content
    assert(out("direct.wav").content.sameElements(original))
    // the fake .mp3 came back as RIFF bytes the REAL WavDecoder parses
    val decoded = WavDecoder.decodeAudio(out("tone.mp3").content)
    assert(decoded.sampleRate == 8000 && decoded.samples.length == 8000)
    val rms = math.sqrt(
      decoded.samples.map(s => s * s.toDouble).sum / decoded.samples.length)
    assert(math.abs(rms - 0.5 / math.sqrt(2)) < 0.01, s"rms=$rms")
    // the mp4-EXTENSION soundtrack (kind "video") reached the codec
    // and came out as decodable audio, re-kinded "audio" (ADVICE r15:
    // container soundtracks must not silently skip this stage)
    assert(out.contains("sound.mp4") && out("sound.mp4").kind == "audio")
    assert(WavDecoder.decodeAudio(out("sound.mp4").content)
      .samples.length == 4000)
    // corrupt container quarantined by path, not thrown; a video with
    // NO soundtrack (GFTV has no audio part) also lands in rejects —
    // "nothing to extract" and "corrupt" both mean no audio produced
    val rej = rejects.collect().toSeq
    assert(rej.exists(_.endsWith("broken.mp3")))
    assert(rej.exists(_.endsWith("clip.mp4")))
    assert(rej.exists(_.endsWith("bad.mkv")))
    // composes with the EXISTING audio decode stage unchanged
    val (pcm, badWav) = Audio.decodeAudioSplit(asWav)
    assert(pcm.count() == 3 && badWav.count() == 0)
  }

  test("ffprobe compact parser survives comma-bearing container names") {
    // canned `-of compact=p=1:s=|` output for an mp4 — format_name is
    // the multi-name "mov,mp4,m4a,3gp,3g2,mj2" that broke the old csv
    // split (ADVICE r15); parser is pure, no ffmpeg binary needed
    val mp4 = FfmpegCliTranscoder.parseProbe(
      """format|format_name=mov,mp4,m4a,3gp,3g2,mj2|duration=5.312000
        |stream|codec_name=h264|codec_type=video
        |stream|codec_name=aac|codec_type=audio""".stripMargin)
    assert(mp4.container == "mov,mp4,m4a,3gp,3g2,mj2")
    assert(mp4.container.contains("mp4"))
    assert(mp4.durationMs == 5312L)
    assert(mp4.videoCodecs == Seq("h264") && mp4.audioCodecs == Seq("aac"))
    val mkv = FfmpegCliTranscoder.parseProbe(
      """format|format_name=matroska,webm|duration=1.000000
        |stream|codec_name=vp9|codec_type=video""".stripMargin)
    assert(mkv.container == "matroska,webm" && mkv.durationMs == 1000L)
    // missing duration degrades to -1, not a throw
    assert(FfmpegCliTranscoder.parseProbe(
      "format|format_name=wav").durationMs == -1L)
    // no format section at all is an error (quarantined by callers)
    intercept[IllegalArgumentException] {
      FfmpegCliTranscoder.parseProbe("stream|codec_name=aac|codec_type=audio")
    }
  }

  test("one session per (JVM, cacheKey) across partitions and stages") {
    TranscoderCache.clear()
    FakeTranscoderState.opens.set(0)
    val files = Multimodal.readMediaDir(spark, writeMediaDir())
      .repartition(8)
    val t = FakeTranscoder("shared")
    val (asWav, _) = Multimodal.transcodeAudioSplit(files, t)
    asWav.count()
    Multimodal.probeMedia(files, t).count()
    Multimodal.containerFrames(files, 2, t).count()
    // 8 partitions x 3 stages, ONE codec open — the executor-singleton
    // contract (a 1000-executor job opens 1000 ffmpeg contexts, not
    // one per task)
    assert(FakeTranscoderState.opens.get() == 1,
      s"opened ${FakeTranscoderState.opens.get()} sessions")
  }

  test("container frames fan out and compose into featurize/pHash") {
    val files = Multimodal.readMediaDir(spark, writeMediaDir())
    val frames = Multimodal.containerFrames(files, 3, FakeTranscoder())
    val got = frames.collect().sortBy(_.frameIdx)
    // 10 frames sampled every 3rd: source indices 0,3,6,9; the corrupt
    // .mkv contributes zero rows, kills nothing
    assert(got.map(_.frameIdx).toSeq == Seq(0, 3, 6, 9))
    assert(got.forall(_.path.endsWith("clip.mp4")))
    assert(got.forall(f => f.image.width == 16 && f.image.height == 12))
    // pixel content is the transcoder's deterministic raster, row-exact
    assert(got.head.image.pixels.sameElements(
      FakeContainer.framePixels(7, 0, 16, 12)))
    // downstream composition: the frames ARE DecodedImages — the
    // existing featurize runs on them unchanged
    import spark.implicits._
    val feats = Multimodal.featurize(frames.map(_.image)).collect()
    assert(feats.length == 4 && feats.forall(_.embedding.length == 64))
  }

  test("probe surfaces container identity; unprobeable rows say error") {
    val files = Multimodal.readMediaDir(spark, writeMediaDir())
    val probed = probeByName(files)
    assert(probed("clip.mp4").container == "gftv")
    assert(probed("clip.mp4").videoCodecs == Seq("rawvideo"))
    assert(probed("tone.mp3").container == "gfta")
    assert(probed("tone.mp3").durationMs == 1000L)
    // the REAL wav is not a GFT container — the fake can't probe it;
    // the row surfaces as error instead of vanishing (the gate
    // downstream decides, not the probe)
    assert(probed("direct.wav").container == "error")
    assert(probed("bad.mkv").container == "error")
  }

  private def probeByName(files: org.apache.spark.sql.Dataset[MediaFile])
      : Map[String, ProbedMedia] =
    Multimodal.probeMedia(files, FakeTranscoder()).collect()
      .map(p => p.path.split('/').last -> p).toMap
}
