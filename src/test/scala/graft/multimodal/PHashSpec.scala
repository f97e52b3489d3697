package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.SparkSpec

class PHashSpec extends SparkSpec {
  import spark.implicits._

  /** Build a DecodedImage from a pixel function (RGB). */
  private def mkImage(path: String, w: Int, h: Int)(
      f: (Int, Int) => (Int, Int, Int)): DecodedImage = {
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = f(x, y)
      px((y * w + x) * 3) = r.toByte
      px((y * w + x) * 3 + 1) = g.toByte
      px((y * w + x) * 3 + 2) = b.toByte
    }
    DecodedImage(path, w, h, 3, px)
  }

  private def gradient(x: Int, y: Int) = {
    val v = (x * 2 + y) % 256
    (v, (v + 40) % 256, (255 - v) % 256)
  }

  private def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("hash is invariant-ish under resize and small perturbation") {
    val base = mkImage("a", 128, 128)(gradient)
    val resized = mkImage("a2", 64, 64)((x, y) => gradient(x * 2, y * 2))
    val noisy = mkImage("a3", 128, 128) { (x, y) =>
      val (r, g, b) = gradient(x, y)
      // sparse ±3 perturbation — sub-quantization noise
      if ((x * 31 + y * 17) % 11 == 0)
        (math.min(255, r + 3), math.max(0, g - 3), b)
      else (r, g, b)
    }
    val h0 = PHash.phash64(base)
    assert(hamming(h0, PHash.phash64(resized)) <= 8,
      "resize broke the hash")
    assert(hamming(h0, PHash.phash64(noisy)) <= 8,
      "small noise broke the hash")
  }

  test("hash discriminates structurally different images") {
    val a = PHash.phash64(mkImage("a", 128, 128)(gradient))
    // deterministic pseudo-noise — structurally unlike a gradient
    val b = PHash.phash64(mkImage("b", 128, 128) { (x, y) =>
      val v = (x * 7919 + y * 104729) % 256
      (v, (v * 31) % 256, (v * 17) % 256)
    })
    assert(hamming(a, b) >= 16, s"hamming=${hamming(a, b)}")
  }

  test("hash survives a PNG encode/decode round-trip") {
    val img = mkImage("p", 96, 96)(gradient)
    val buf = new BufferedImage(96, 96, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 96; x <- 0 until 96) {
      val base = (y * 96 + x) * 3
      val rgb = ((img.pixels(base) & 0xff) << 16) |
        ((img.pixels(base + 1) & 0xff) << 8) | (img.pixels(base + 2) & 0xff)
      buf.setRGB(x, y, rgb)
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(buf, "png", bos)
    val decoded = ImageIoDecoder.decodeImage(bos.toByteArray)
    // PNG is lossless → identical raster → identical hash
    assert(PHash.phash64(decoded) == PHash.phash64(img))
  }

  test("nearDupPairs finds the perturbed twin and only it") {
    val imgs = Seq(
      mkImage("a", 128, 128)(gradient),
      mkImage("a_noisy", 128, 128) { (x, y) =>
        val (r, g, b) = gradient(x, y)
        if ((x + y) % 13 == 0) (math.min(255, r + 2), g, b) else (r, g, b)
      },
      mkImage("other", 128, 128) { (x, y) =>
        val v = (x * 7919 + y * 104729) % 256
        (v, (v * 31) % 256, (v * 17) % 256)
      })
    val hashes = PHash.hashImages(spark.createDataset(imgs))
    val (pairs, dropped) = PHash.nearDupPairs(hashes, hammingMax = 10)
    val got = pairs.select("path_a", "path_b")
      .as[(String, String)].collect().toSet
    assert(got == Set(("a", "a_noisy")), s"got $got")
    assert(dropped.count() == 0)
  }
}
