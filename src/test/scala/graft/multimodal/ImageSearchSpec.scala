package graft.multimodal

import java.awt.image.BufferedImage
import java.nio.file.Files

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.vector.VectorSearch

/** End-to-end multimodal similarity search: real PNG corpus → decode →
  * featurize → brute-force kNN over the image embeddings. The corpus is
  * three visual "families" (horizontal gradients, vertical gradients,
  * checkerboards) with per-image jitter; the nearest neighbors of any
  * image must come from its own family — the full pipeline (codec,
  * mean-pool embed, distance search) preserving perceptual structure. */
class ImageSearchSpec extends SparkSpec {

  private def png(dir: java.io.File, name: String,
      rgb: (Int, Int) => Int): Unit = {
    val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) img.setRGB(x, y, rgb(x, y))
    ImageIO.write(img, "png", new java.io.File(dir, name))
  }

  private lazy val mediaDir: String = {
    val dir = Files.createTempDirectory("graft_imgsearch").toFile
    for (j <- 0 until 4) {
      png(dir, s"hgrad_$j.png",
        (x, _) => ((x * 8 + j) & 0xff) * 0x010101)
      png(dir, s"vgrad_$j.png",
        (_, y) => ((y * 8 + j) & 0xff) * 0x010101)
      png(dir, s"check_$j.png",
        (x, y) => if (((x / 4 + y / 4) + j) % 2 == 0) 0xffffff else 0)
    }
    dir.getAbsolutePath
  }

  test("kNN over image features groups the visual families") {
    val files = Multimodal.readMediaDir(spark, mediaDir)
    val feats = Multimodal.featurize(Multimodal.decodeImages(files))
      .toDF()
      .select(col("path"),
        col("embedding").cast("array<double>").as("vec"))
      .withColumn("fam", regexp_extract(col("path"), "(hgrad|vgrad|check)", 1))
      .withColumn("id", xxhash64(col("path")))
    assert(feats.count() == 12)
    val hits = VectorSearch.knn(
      feats, "id", "vec", feats.select(
        col("id").as("qid"), col("vec").as("qv"), col("fam").as("qfam")),
      "qid", "qv", k = 4)
    // join family labels back on both sides; rank 1 is self (dist 0),
    // ranks 2-4 must stay inside the query's family
    val labeled = hits
      .join(feats.select(col("id"), col("fam")), "id")
      .join(feats.select(col("id").as("query_id"),
        col("fam").as("qfam")), "query_id")
    val crossFamily = labeled
      .filter(col("rank") > 1 && col("fam") =!= col("qfam"))
      .count()
    assert(crossFamily == 0,
      "a non-self nearest neighbor crossed visual families")
    val self = labeled.filter(col("rank") === 1)
    assert(self.count() == 12)
    assert(self.filter(col("dist") =!= 0.0).count() == 0,
      "rank-1 neighbor of an image is not itself")
  }
}
