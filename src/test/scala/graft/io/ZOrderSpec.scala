package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton implementation: interleave bit-by-bit. */
  private def mortonRef(x: Int, y: Int): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1).toLong << (2 * i)) |
        (((y >> i) & 1).toLong << (2 * i + 1))
    }

  test("morton2 matches the bit-by-bit definition") {
    val pts = Seq((0, 0), (1, 0), (0, 1), (65535, 0), (0, 65535),
      (65535, 65535), (12345, 54321), (40000, 1), (7, 65528))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.morton2(col("x"), col("y")).as("z"))
      .as[(Int, Int, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == mortonRef(x, y),
      s"morton($x,$y)") }
  }

  test("morton2 masks inputs wider than 16 bits") {
    val got = Seq((65536 + 5, (1 << 20) + 9)).toDF("x", "y")
      .select(ZOrder.morton2(col("x"), col("y"))).as[Long].head()
    assert(got == mortonRef(5, 9))
  }

  test("writeZOrdered clusters both dimensions into tight per-file envelopes") {
    val n = 64 // 64x64 grid
    val grid = (0 until n * n).map(i => (i % n, i / n)).toDF("x", "y")
    val out = java.nio.file.Files.createTempDirectory("zorder").toString
    ZOrder.writeZOrdered(grid, out, col("x"), col("y"), nFiles = 16)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    assert(files.length == 16)
    // each file's (x,y) bounding box must cover ~1/16 of the grid AREA;
    // a lexicographic (x,y) sort would give y-ranges spanning the full
    // axis in every file. Z-order bounds each file near a 16x16 quadrant
    // (allow 2x slack for range-partition boundary straddle).
    files.foreach { f =>
      val d = spark.read.parquet(f.getAbsolutePath)
        .agg(min("x"), max("x"), min("y"), max("y"))
        .as[(Int, Int, Int, Int)].head()
      val area = (d._2 - d._1 + 1).toLong * (d._4 - d._3 + 1)
      assert(area <= (n * n / 16) * 4,
        s"file envelope too loose: $d area=$area")
    }
  }
}
