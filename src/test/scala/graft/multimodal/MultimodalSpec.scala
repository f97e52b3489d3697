package graft.multimodal

import java.nio.file.Files

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val mediaDir: String = {
    val dir = Files.createTempDirectory("graft_media").toFile
    def write(name: String, bytes: Array[Byte]): Unit =
      Files.write(new java.io.File(dir, name).toPath, bytes)
    write("a.jpg", Array.tabulate[Byte](100)(_.toByte))
    write("b.png", Array.tabulate[Byte](50)(i => (i * 3).toByte))
    write("c.mp4", Array.tabulate[Byte](200)(i => (i * 7).toByte))
    write("d.txt", "not media".getBytes)
    dir.getAbsolutePath
  }

  test("binaryFile source tags media kinds and keeps bytes opaque") {
    val files = Multimodal.readMediaDir(spark, mediaDir).collect()
    assert(files.length == 4)
    val byKind = files.groupBy(_.kind).view.mapValues(_.length).toMap
    assert(byKind == Map("image" -> 2, "video" -> 1, "other" -> 1))
    assert(files.find(_.path.endsWith("a.jpg")).get.content.length == 100)
  }

  test("decode stage runs per-partition, images only, deterministic") {
    val files = Multimodal.readMediaDir(spark, mediaDir).repartition(3)
    val d1 = Multimodal.decodeImages(files).collect()
      .sortBy(_.path)
    val d2 = Multimodal.decodeImages(files).collect()
      .sortBy(_.path)
    assert(d1.length == 2)
    assert(d1.map(_.path).toSeq == d2.map(_.path).toSeq)
    d1.zip(d2).foreach { case (x, y) =>
      assert(x.width == y.width && x.pixels.toSeq == y.pixels.toSeq)
    }
    d1.foreach(i =>
      assert(i.pixels.length == i.width * i.height * i.channels))
  }

  test("resize preserves channel structure at the target size") {
    val img = FakeDecoder.decodeImage(Array[Byte](1, 2, 3))
    val r = Multimodal.resize(img, 4, 4)
    assert(r.width == 4 && r.height == 4 && r.channels == img.channels)
    assert(r.pixels.length == 4 * 4 * img.channels)
  }

  test("featurize yields fixed-dim embeddings for every image") {
    val files = Multimodal.readMediaDir(spark, mediaDir)
    val feats = Multimodal.featurize(Multimodal.decodeImages(files))
      .collect()
    assert(feats.length == 2)
    assert(feats.forall(_.embedding.length == 64))
    assert(feats.forall(_.embedding.forall(v => !v.isNaN)))
  }

  test("frame sampling fans out every nth frame per video") {
    val files = Multimodal.readMediaDir(spark, mediaDir)
    val all = Multimodal.sampleFrames(files, everyN = 1).collect()
    val sampled = Multimodal.sampleFrames(files, everyN = 2).collect()
    assert(all.nonEmpty)
    assert(sampled.length == (all.length + 1) / 2)
    assert(sampled.forall(_.frameIdx % 2 == 0))
    // distinct frames decode distinctly (content-dependent)
    assert(all.map(_.image.pixels.toSeq).distinct.length == all.length)
  }
}
