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
      // tv_num is decimal(38,0) since the r14 widening (long×long
      // wraps past ~3e9-row slices); fixture values fit a long
      .select(col("n_ref"), col("n_cur"), col("t_ref"), col("t_cur"),
        col("tv_num").cast("long"))
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

  test("null/NaN rows join NEITHER histogram (no double-counted " +
      "phantom drift), and totals exclude them") {
    // without the filter, each side's null mass became an unmatched
    // null-bucket row on BOTH sides of the full-outer join (null keys
    // never match) and read as fully-moved drift; NaN clamped into
    // maxBucket (ADVICE r14)
    val clean = Seq(1.0, 9.0, 17.0).toDF("v")
    val dirty = Seq(Some(1.0), Some(9.0), Some(17.0), None,
      Some(Double.NaN)).toDF("v")
    val t = Drift.tvd(clean, dirty, "v", 8.0, 63).head()
    assert(t.getAs[Double]("tvd") == 0.0,
      "identical clean mass must read zero drift despite null/NaN rows")
    assert(t.getAs[Long]("t_cur") == 3L, "null/NaN rows must not count")
    assert(t.getAs[Long]("n_buckets") == 3L)
  }

  test("degenerate (empty) slice yields null tvd, not NaN or a " +
      "silent zero — the alarm contract") {
    val a = Seq(1.0, 9.0).toDF("v")
    val empty = Seq.empty[Double].toDF("v")
    val row = Drift.tvd(a, empty, "v", 8.0, 63).head()
    assert(row.isNullAt(row.fieldIndex("tvd")),
      "empty cur slice must surface as null tvd")
    assert(row.getAs[Long]("t_cur") == 0L)
    // an all-null slice is degenerate the same way
    val allNull = Seq[Option[Double]](None, None).toDF("v")
    assert(Drift.tvd(a, allNull, "v", 8.0, 63).head().isNullAt(0))
    // per-bucket contributions null out too, rather than NaN
    val prof = Drift.histogramProfile(a, empty, "v", 8.0, 63)
      .select("tv_contrib").collect()
    assert(prof.nonEmpty && prof.forall(_.isNullAt(0)))
  }

  test("clamped_frac surfaces out-of-range mass a mis-sized bucketing " +
      "would otherwise silently fold into the edge buckets") {
    // ref fits the bucketing; cur has outgrown it: half its mass sits
    // at >= (maxBucket+1)*width = 512 and one row is negative. Without
    // the column, all of that folds into buckets 63/0 and the profile
    // under-reads the drift (VERDICT r15 item 7).
    val ref = (0 until 100).map(i => (i % 16).toDouble).toDF("v")
    val cur = ((0 until 50).map(i => (i % 16).toDouble) ++
      (0 until 49).map(i => 600.0 + i) :+ -3.0).toDF("v")
    val row = Drift.tvd(ref, cur, "v", 8.0, 63).head()
    assert(row.getAs[Double]("clamped_frac_ref") == 0.0)
    assert(row.getAs[Double]("clamped_frac_cur") == 0.5)
    // in-range values NEAR the top bucket do not count as clamped:
    // bucket 63 covers [504, 512)
    val edge = Seq(504.0, 511.9).toDF("v")
    val e = Drift.tvd(ref, edge, "v", 8.0, 63).head()
    assert(e.getAs[Double]("clamped_frac_cur") == 0.0)
    // per-bucket profile carries the same per-slice constants
    val prof = Drift.histogramProfile(ref, cur, "v", 8.0, 63)
      .select("clamped_frac_cur").distinct().collect()
    assert(prof.length == 1 && prof.head.getDouble(0) == 0.5)
    // degenerate slice: clamped_frac nulls out like tvd does
    val empty = Seq.empty[Double].toDF("v")
    val d = Drift.tvd(ref, empty, "v", 8.0, 63).head()
    assert(d.isNullAt(d.fieldIndex("clamped_frac_cur")))
  }

  test("tv_num survives counts whose cross product overflows a long") {
    // 4e9 × 4e9 = 1.6e19 > Long.MaxValue: the pre-r15 long arithmetic
    // wrapped negative here; decimal(18,0)×decimal(18,0) is exact.
    // Plant the counts directly through a pre-aggregated frame twin
    // of the internal shape via the public API: two one-bucket slices
    // can't reach 4e9 fixture rows, so check the expression itself.
    val big = 4000000000L
    val df = Seq((0L, big, 1L, big, big)).toDF(
      "bucket", "n_ref", "n_cur", "t_ref", "t_cur")
    val out = df.withColumn("tv_num",
        abs(col("n_ref").cast("decimal(18,0)") *
          col("t_cur").cast("decimal(18,0)") -
          col("n_cur").cast("decimal(18,0)") *
          col("t_ref").cast("decimal(18,0)")))
      .select(col("tv_num").cast("string")).head().getString(0)
    // |4e9·4e9 − 1·4e9| = 15999999996000000000 — 20 digits, > 2^63
    assert(out == "15999999996000000000", out)
    // and the public API's tv_num really is the widened type, not long
    val a = Seq(1.0).toDF("v")
    val dt = Drift.histogramProfile(a, a, "v", 8.0, 63)
      .schema("tv_num").dataType
    assert(dt == org.apache.spark.sql.types.DecimalType(38, 0),
      dt.toString)
  }
}
