package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}

import graft.SparkSpec

class AudioSpec extends SparkSpec {

  /** Minimal WAV writer — independent construction, so the decoder is
    * tested against the format spec, not against itself. */
  private def wav(sampleRate: Int, channels: Int,
      frames: Array[Array[Short]]): Array[Byte] = {
    val dataLen = frames.length * channels * 2
    val out = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
    out.write("RIFF".getBytes); w32(36 + dataLen); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); w32(16); w16(1); w16(channels)
    w32(sampleRate); w32(sampleRate * channels * 2); w16(channels * 2); w16(16)
    out.write("data".getBytes); w32(dataLen)
    frames.foreach(f => f.foreach(w16(_)))
    out.toByteArray
  }

  private def sine(n: Int, freq: Double, rate: Double, amp: Double) =
    Array.tabulate(n)(i =>
      Array((amp * 32767 * math.sin(2 * math.Pi * freq * i / rate)).toShort))

  test("WavDecoder parses PCM16 and folds stereo to mono") {
    val a = WavDecoder.decodeAudio(wav(8000, 1, sine(4000, 440, 8000, 0.5)))
    assert(a.sampleRate == 8000 && a.channels == 1 && a.samples.length == 4000)
    // stereo: L = x, R = -x folds to ~0
    val st = Array.tabulate(100)(i => Array(1000.toShort, (-1000).toShort))
    val m = WavDecoder.decodeAudio(wav(8000, 2, st))
    assert(m.channels == 2 && m.samples.forall(math.abs(_) < 1e-6))
  }

  test("decode stage quarantines corrupt audio, features match theory") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_audio").toString
    Files.write(Paths.get(dir, "tone.wav"),
      wav(8000, 1, sine(8000, 440, 8000, 0.5)))
    Files.write(Paths.get(dir, "quiet.wav"),
      wav(8000, 1, Array.fill(2048)(Array(0.toShort))))
    Files.write(Paths.get(dir, "broken.wav"),
      "definitely not RIFF at all".getBytes)
    val files = Multimodal.readMediaDir(spark, dir)
    val (ok, bad) = Audio.decodeAudioSplit(files)
    assert(bad.collect().toSeq.exists(_.endsWith("broken.wav")))
    val decoded = ok.collect()
    assert(decoded.length == 2)

    val feats = Audio.frameFeatures(ok, frameLen = 1024, hop = 512)
      .collect().groupBy(_.path)
    val tone = feats.keys.find(_.endsWith("tone.wav")).map(feats).get
    // a sine of amplitude A has RMS A/sqrt(2); 440 Hz at 8 kHz crosses
    // zero ~2*440/8000 = 0.11 per sample
    tone.foreach { f =>
      assert(math.abs(f.rms - 0.5 / math.sqrt(2)) < 0.01, f)
      assert(math.abs(f.zcr - 0.11) < 0.01, f)
    }
    val quiet = feats.keys.find(_.endsWith("quiet.wav")).map(feats).get
    assert(quiet.nonEmpty && quiet.forall(f => f.rms == 0.0 && f.zcr == 0.0))
  }

  test("short-clip edge: fewer samples than a frame still yields a frame") {
    import spark.implicits._
    val a = WavDecoder.decodeAudio(wav(8000, 1, sine(100, 440, 8000, 0.3)))
    val one = Audio.frameFeatures(
      spark.createDataset(Seq(a.copy(path = "x"))), 1024, 512).collect()
    assert(one.length == 1 && one.head.rms > 0)
  }
}
