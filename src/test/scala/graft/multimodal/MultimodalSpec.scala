package graft.multimodal

import java.awt.image.BufferedImage
import java.nio.file.Files

import javax.imageio.ImageIO

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  // a.png: 4x3 with a known per-pixel RGB pattern (PNG is lossless, so
  // the decode must reproduce it bit-exactly)
  private def rgbAt(x: Int, y: Int): Int =
    ((x * 60) << 16) | ((y * 80) << 8) | (x + y)

  private def pngBytes(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val baos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  // 4-frame animated GIF, frame f filled with one distinct palette color
  private def frameColor(f: Int): Int = ((40 * f + 20) << 16) | (10 << 8) | 200
  private lazy val gifBytes: Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (f <- 0 until 4) {
      val img = new BufferedImage(6, 4, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 4; x <- 0 until 6) img.setRGB(x, y, frameColor(f))
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    baos.toByteArray
  }

  private lazy val mediaDir: String = {
    val dir = Files.createTempDirectory("graft_media").toFile
    def write(name: String, bytes: Array[Byte]): Unit =
      Files.write(new java.io.File(dir, name).toPath, bytes)
    write("a.png", pngBytes(4, 3, rgbAt))
    write("b.png", pngBytes(5, 5, (x, y) => (x * y * 999) & 0xffffff))
    write("bad.png", Array.tabulate[Byte](64)(_.toByte)) // corrupt
    write("anim.gif", gifBytes)
    write("c.mp4", Array.tabulate[Byte](200)(i => (i * 7).toByte))
    write("d.txt", "not media".getBytes)
    dir.getAbsolutePath
  }

  test("binaryFile source tags media kinds and keeps bytes opaque") {
    val files = Multimodal.readMediaDir(spark, mediaDir).collect()
    assert(files.length == 6)
    val byKind = files.groupBy(_.kind).view.mapValues(_.length).toMap
    assert(byKind == Map("image" -> 4, "video" -> 1, "other" -> 1))
    assert(files.find(_.path.endsWith("c.mp4")).get.content.length == 200)
  }

  test("ImageIoDecoder decodes a real PNG bit-exactly") {
    val files = Multimodal.readMediaDir(spark, mediaDir).repartition(3)
    val decoded = Multimodal.decodeImages(files).collect()
    // 4 image-kind files, one corrupt: bad.png is dropped, job survives
    assert(decoded.length == 3)
    val a = decoded.find(_.path.endsWith("a.png")).get
    assert(a.width == 4 && a.height == 3 && a.channels == 3)
    for (y <- 0 until 3; x <- 0 until 4) {
      val base = (y * 4 + x) * 3
      val v = rgbAt(x, y)
      assert(a.pixels(base) == ((v >> 16) & 0xff).toByte)
      assert(a.pixels(base + 1) == ((v >> 8) & 0xff).toByte)
      assert(a.pixels(base + 2) == (v & 0xff).toByte)
    }
  }

  test("decodeImagesSplit quarantines exactly the corrupt inputs") {
    val files = Multimodal.readMediaDir(spark, mediaDir)
    val (decoded, rejects) = Multimodal.decodeImagesSplit(files)
    assert(decoded.count() == 3)
    val rej = rejects.collect()
    assert(rej.length == 1 && rej.head.endsWith("bad.png"))
  }

  test("resize preserves channel structure at the target size") {
    val img = FakeDecoder.decodeImage(Array[Byte](1, 2, 3))
    val r = Multimodal.resize(img, 4, 4)
    assert(r.width == 4 && r.height == 4 && r.channels == img.channels)
    assert(r.pixels.length == 4 * 4 * img.channels)
  }

  test("featurize yields fixed-dim embeddings for every decoded image") {
    val files = Multimodal.readMediaDir(spark, mediaDir)
    val feats = Multimodal.featurize(Multimodal.decodeImages(files))
      .collect()
    assert(feats.length == 3)
    assert(feats.forall(_.embedding.length == 64))
    assert(feats.forall(_.embedding.forall(v => !v.isNaN && !v.isInfinite)))
    // distinct images embed distinctly
    assert(feats.map(_.embedding.toSeq).distinct.length == 3)
  }

  test("frame sampling decodes real animated-GIF frames") {
    import spark.implicits._
    // GIF is the JDK's multi-frame container; feed it through the video
    // path by tagging the kind explicitly
    val files = Seq(MediaFile("anim.gif", "video", gifBytes.length.toLong,
      gifBytes)).toDS()
    val all = Multimodal.sampleFrames(files, everyN = 1).collect()
      .sortBy(_.frameIdx)
    assert(all.length == 4)
    all.foreach { fr =>
      assert(fr.image.width == 6 && fr.image.height == 4)
      val c = frameColor(fr.frameIdx)
      // solid-color frames survive GIF palettization exactly
      assert(fr.image.pixels(0) == ((c >> 16) & 0xff).toByte)
      assert(fr.image.pixels(1) == ((c >> 8) & 0xff).toByte)
      assert(fr.image.pixels(2) == (c & 0xff).toByte)
    }
    val sampled = Multimodal.sampleFrames(files, everyN = 2).collect()
    assert(sampled.length == 2 && sampled.forall(_.frameIdx % 2 == 0))
  }

  test("undecodable video yields zero frames, not a dead job") {
    val files = Multimodal.readMediaDir(spark, mediaDir)
    assert(Multimodal.sampleFrames(files, everyN = 1).count() == 0)
  }

  test("FakeDecoder plumbing still covers formats the JDK cannot decode") {
    val files = Multimodal.readMediaDir(spark, mediaDir)
    val all = Multimodal.sampleFrames(files, everyN = 1,
      mkDecoder = () => FakeDecoder).collect()
    val sampled = Multimodal.sampleFrames(files, everyN = 2,
      mkDecoder = () => FakeDecoder).collect()
    assert(all.nonEmpty)
    assert(sampled.length == (all.length + 1) / 2)
    assert(all.map(_.image.pixels.toSeq).distinct.length == all.length)
  }
}
