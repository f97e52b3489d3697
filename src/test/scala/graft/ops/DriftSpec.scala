package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Distribution-drift detection (`ops/Drift`) — the measuring half of
  * the standing-index staleness contracts. The scalar TVD's endpoints
  * and its exact-integer construction are pinned here; the c17/c18
  * oracles pin cross-engine hash parity on the events fixture. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("tvd endpoints: identical slices -> 0, disjoint slices -> 1") {
    val a = (0 until 100).map(i => (i % 16).toDouble).toDF("v")
    val b = (0 until 100).map(i => 128.0 + (i % 16)).toDF("v")
    def t(r: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.DataFrame) =
      Drift.tvd(r, c, "v", bucketWidth = 8.0, maxBucket = 63)
        .select("tvd").as[Double].head()
    assert(t(a, a) == 0.0)
    assert(t(a, b) == 1.0)
    // a half-moved distribution reads exactly 0.5: same buckets for
    // half the mass, disjoint buckets for the other half
    val half = ((0 until 50).map(i => (i % 16).toDouble) ++
      (0 until 50).map(i => 128.0 + (i % 16))).toDF("v")
    assert(t(a, half) == 0.5)
  }

  test("profile contributions sum to the scalar, numerators are " +
      "exact integers over the common denominator") {
    val e = spark.read.parquet(s"$dir/events.parquet")
    val ref = e.filter(col("event_id") % 2 === 0)
    val cur = e.filter(col("event_id") % 2 === 1)
    val prof = Drift.histogramProfile(ref, cur, "value", 8.0, 63)
      .select("n_ref", "n_cur", "t_ref", "t_cur", "tv_num")
      .as[(Long, Long, Long, Long, Long)].collect()
    val (tRef, tCur) = (prof.head._3, prof.head._4)
    assert(tRef == ref.count() && tCur == cur.count())
    prof.foreach { case (nr, nc, tr, tc, num) =>
      assert(num == math.abs(nr * tc - nc * tr)) }
    val scalar = Drift.tvd(ref, cur, "value", 8.0, 63)
      .select("tvd").as[Double].head()
    assert(scalar == prof.map(_._5).sum.toDouble / (2.0 * tRef * tCur))
    assert(scalar > 0.0 && scalar < 1.0,
      s"fixture slices should drift a little, not $scalar")
  }

  test("embeddingShift: recompute parity, and a planted mean shift " +
      "reads as shift >> dispersion-relative noise") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>")
        .as("vec"))
    val ref = emb.filter(col("vec_id") % 2 === 0)
    val cur = emb.filter(col("vec_id") % 2 === 1)
      .withColumn("vec", transform(col("vec"), x => x + lit(0.5)))
    val row = Drift.embeddingShift(ref, cur, "vec").head()
    val dim = row.getAs[Long]("dim")
    val shift = row.getAs[Double]("shift_l2")
    // driver-side recompute on the collected fixture
    def vecs(df: org.apache.spark.sql.DataFrame) =
      df.select("vec").as[Seq[Double]].collect()
    val (rv, cv) = (vecs(ref), vecs(cur))
    def mean(vs: Array[Seq[Double]]) =
      (0 until dim.toInt).map(d => vs.map(_(d)).sum / vs.length)
    val (mr, mc) = (mean(rv), mean(cv))
    val want = math.sqrt(
      mr.zip(mc).map { case (a, b) => (a - b) * (a - b) }.sum)
    assert(math.abs(shift - want) < 1e-9, s"$shift vs $want")
    // +0.5 on every one of 64 dims -> expected shift ~ sqrt(64)*0.5 = 4
    assert(shift > 3.5 && shift < 4.5, shift.toString)
    assert(row.getAs[Long]("n_ref") == rv.length &&
      row.getAs[Long]("n_cur") == cv.length)
    assert(row.getAs[Double]("ref_dispersion") > 0.0)
    // the un-shifted pair reads near zero shift
    val base = Drift.embeddingShift(ref,
      emb.filter(col("vec_id") % 2 === 1), "vec").head()
    assert(base.getAs[Double]("shift_l2") <
      0.2 * base.getAs[Double]("ref_dispersion"),
      "null case must read as no material drift")
  }

  test("guards: non-positive width and degenerate maxBucket rejected") {
    val a = Seq(1.0).toDF("v")
    intercept[IllegalArgumentException] {
      Drift.histogramProfile(a, a, "v", 0.0, 63) }
    intercept[IllegalArgumentException] {
      Drift.histogramProfile(a, a, "v", 8.0, 0) }
  }
}
