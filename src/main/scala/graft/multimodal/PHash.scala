package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual image hashing (pHash) — the image twin of the text
  * SimHash family: a 64-bit signature that survives re-encoding,
  * resizing and small edits, so IMAGE near-dup dedup runs on the same
  * blocked-Hamming machinery as d05/d06.
  *
  * Algorithm (the classic public DCT construction): grayscale →
  * 32×32 nearest-neighbor downsample → 2-D DCT-II → keep the 8×8
  * low-frequency block → bit i = coeff_i > median(AC coeffs). All
  * arithmetic is fixed-order double math on integer inputs —
  * deterministic across JVMs (strict IEEE on the same input bytes).
  *
  * Scale shape: hashing is a pure per-row map over decoded rasters
  * (no shuffle); pairing blocks each hash into four 16-bit bands and
  * equi-joins within bands — a pair within Hamming ≤ hammingMax
  * differs in ≤ hammingMax bits, so with max ≤ 15 at least one of the
  * four bands is EQUAL (pigeonhole: 16 differing bits would be needed
  * to break all four) — then verifies exact Hamming on candidates
  * only. Hot bands go through [[graft.ops.Blocking.capBuckets]] like
  * every other candidate generator in the engine.
  */
object PHash {

  private val Side = 32 // DCT input side
  private val Low = 8 // low-frequency block side

  /** DCT-II basis, precomputed once per JVM: cos((2x+1)·u·π/64). */
  private lazy val cosTable: Array[Array[Double]] = {
    val t = Array.ofDim[Double](Side, Side)
    var u = 0
    while (u < Side) {
      var x = 0
      while (x < Side) {
        t(u)(x) = math.cos((2 * x + 1) * u * math.Pi / (2.0 * Side))
        x += 1
      }
      u += 1
    }
    t
  }

  /** 64-bit perceptual hash of a decoded image. Deterministic: the
    * raster walk, the DCT accumulation order, and the median pick are
    * all fixed-order. */
  def phash64(img: DecodedImage): Long = {
    // grayscale + downsample in one pass (integer luma, nearest pixel)
    val g = Array.ofDim[Double](Side, Side)
    var y = 0
    while (y < Side) {
      val sy = y * img.height / Side
      var x = 0
      while (x < Side) {
        val sx = x * img.width / Side
        val base = (sy * img.width + sx) * img.channels
        val lum =
          if (img.channels >= 3)
            (299 * (img.pixels(base) & 0xff) +
              587 * (img.pixels(base + 1) & 0xff) +
              114 * (img.pixels(base + 2) & 0xff)) / 1000.0
          else (img.pixels(base) & 0xff).toDouble
        g(y)(x) = lum
        x += 1
      }
      y += 1
    }
    // 2-D DCT-II, low-frequency Low×Low block only (O(Low²·Side²))
    val coef = new Array[Double](Low * Low)
    var v = 0
    while (v < Low) {
      var u = 0
      while (u < Low) {
        var acc = 0.0
        var yy = 0
        while (yy < Side) {
          var xx = 0
          val cv = cosTable(v)(yy)
          while (xx < Side) {
            acc += g(yy)(xx) * cosTable(u)(xx) * cv
            xx += 1
          }
          yy += 1
        }
        coef(v * Low + u) = acc
        u += 1
      }
      v += 1
    }
    // median of the 63 AC coefficients (DC term excluded — it only
    // encodes global brightness); bit set where coeff > median
    val ac = java.util.Arrays.copyOfRange(coef, 1, coef.length)
    java.util.Arrays.sort(ac)
    val median = ac(ac.length / 2)
    var hash = 0L
    var i = 1
    while (i < coef.length) {
      if (coef(i) > median) hash |= 1L << (i - 1)
      i += 1
    }
    hash
  }

  /** Hash a decoded image set: (path, phash). */
  def hashImages(images: Dataset[DecodedImage]): DataFrame = {
    import images.sparkSession.implicits._
    images.map(img => (img.path, phash64(img))).toDF("path", "phash")
  }

  /** Near-duplicate image pairs within `hammingMax` bits (≤ 15): four
    * 16-bit band blocks → capped equi-join candidates → exact Hamming
    * verify. Same degradation stance as the text path: buckets hotter
    * than `bucketCap` are dropped AND reported, never silent. Returns
    * (path_a, path_b, hamming) with path_a < path_b, plus the report
    * frame of dropped bands. */
  def nearDupPairs(hashes: DataFrame, hammingMax: Int = 10,
      bucketCap: Int = 10000): (DataFrame, DataFrame) = {
    require(hammingMax <= 15,
      "4-band blocking only guarantees recall for hammingMax <= 15")
    val banded = hashes.select(col("path"), col("phash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("phash"), b * 16)
            .bitwiseAND(lit(0xFFFFL)).as("bkey"))): _*)).as("blk"))
      .select(col("path"), col("phash"),
        col("blk.band").as("band"), col("blk.bkey").as("bkey"))
    val (kept, dropped) =
      graft.ops.Blocking.capBuckets(banded, Seq("band", "bkey"), bucketCap)
    val a = kept.select(col("band"), col("bkey"),
      col("path").as("path_a"), col("phash").as("ph_a"))
    val b = kept.select(col("band"), col("bkey"),
      col("path").as("path_b"), col("phash").as("ph_b"))
    val pairs = a.join(b, Seq("band", "bkey"))
      .filter(col("path_a") < col("path_b"))
      .select(col("path_a"), col("path_b"),
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= hammingMax)
      .distinct() // a pair can match in several bands
    (pairs, dropped)
  }
}
