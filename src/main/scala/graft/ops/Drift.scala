package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between a reference slice and a
  * current slice of the same signal — the MEASURING half of the
  * standing-index staleness contracts: [[graft.etl.CorpusCuration
  * .refreshIndexes]]'s re-fit cadence and [[VectorDedupIndex]]'s
  * centroid-drift boundary both say WHEN to act; these operators
  * produce the number that trips that alarm in a nightly pipeline
  * (ref = the corpus the indexes were fit on, cur = tonight's slice).
  *
  * Scalar-signal drift is total-variation distance over a fixed-width
  * bucketing — chosen over PSI/KL deliberately: TVD needs no
  * transcendentals, so the entire computation is exact integer counts
  * with per-row trailing divisions (cross-engine hash-exact, the d17
  * stance — PSI's per-bucket `ln` is implementation-defined at the
  * last bit and would break the DuckDB oracle), it is defined at
  * empty buckets (KL is not), and it reads cleanly: the maximum
  * probability mass that moved, in [0, 1].
  *
  * Scale shape (100 TB): each slice contributes ONE map-side-combined
  * groupBy down to ≤ maxBucket+1 rows; everything after (full-outer
  * join, totals window, contributions) runs on that bucket-sized
  * frame. Nothing row-scale shuffles, nothing collects.
  */
object Drift {

  /** Fixed-width bucket id: floor(value/width) clamped to
    * [0, maxBucket]. Width a power of two keeps the division exact in
    * IEEE doubles, so bucketing is bit-identical across engines. */
  private def bucketOf(v: Column, width: Double, maxBucket: Int): Column =
    least(greatest(floor(v / lit(width)), lit(0.0)),
      lit(maxBucket.toDouble)).cast("long")

  /** Null/NaN policy: rows whose value is null (or fails the double
    * cast) or NaN contribute to NEITHER side's histogram. Without the
    * filter a null bucket appears on each side, and null join keys
    * never match in the full-outer join — the null mass would show up
    * as TWO unmatched rows, double-counted as fully-moved drift, while
    * NaN would silently clamp into maxBucket (ADVICE r14). Callers who
    * need the null rate as a drift signal should compare it
    * explicitly (it is one `count(value IS NULL)` per slice).
    *
    * Alongside each bucket count, the CLAMPED count: rows whose raw
    * bucket fell outside [0, maxBucket] and were folded into the edge
    * buckets. A mis-sized bucketing (signal outgrew maxBucket·width)
    * piles real mass invisibly into the top bucket and reads as "no
    * drift" — `clamped_frac` makes that visible (VERDICT r15 item 7).
    * Same single map-side-combined groupBy; no extra pass. */
  private def counts(df: DataFrame, valueCol: String, width: Double,
      maxBucket: Int, as: String): DataFrame =
    df.select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull && !isnan(col("__v")))
      .select(bucketOf(col("__v"), width, maxBucket).as("bucket"),
        // floor(v/w) > maxBucket ⟺ v ≥ (maxBucket+1)·w; < 0 ⟺ v < 0
        // (width a power of two keeps the boundary product exact)
        (col("__v") >= lit((maxBucket + 1) * width) ||
          col("__v") < lit(0.0)).cast("long").as("__clamped"))
      .groupBy("bucket").agg(count(lit(1)).as(as),
        sum(col("__clamped")).as(s"__clamped_$as"))

  /** decimal(18,0) widening for the TVD numerator's cross products:
    * two slice counts multiply, and at 100 TB scale (slice totals
    * ~1e10-1e14) the product exceeds Long.MaxValue — non-ANSI Spark
    * would silently wrap to a wrong TVD while DuckDB errors, breaking
    * both correctness and oracle parity (ADVICE r14). 18-digit inputs
    * give a 36-digit product — exact integers in decimal(38,0), room
    * to 1e18 rows per slice — and the arithmetic stays transcendental-
    * free, so cross-engine hash-exactness is preserved. */
  private def dec(c: Column): Column = c.cast("decimal(18,0)")

  /** Per-bucket drift profile: (bucket, n_ref, n_cur, t_ref, t_cur,
    * tv_num, tv_contrib). `tv_num = |n_ref·t_cur − n_cur·t_ref|` is
    * the integer TVD numerator over the common denominator
    * `2·t_ref·t_cur`, computed in decimal(38,0) (see [[dec]] — the
    * long×long form wraps past ~3e9-row slices); summing tv_num stays
    * in exact scale-0 decimals, so the scalar [[tvd]] is one trailing
    * division — no order-sensitive float summation anywhere (oracle
    * `c17_drift_profile`). The totals window runs on the
    * ≤ maxBucket+1-row joined frame — tiny by construction, never the
    * data. */
  def histogramProfile(ref: DataFrame, cur: DataFrame, valueCol: String,
      bucketWidth: Double, maxBucket: Int = 63): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    require(maxBucket >= 1, s"maxBucket must be >= 1, got $maxBucket")
    counts(ref, valueCol, bucketWidth, maxBucket, "n_ref")
      .join(counts(cur, valueCol, bucketWidth, maxBucket, "n_cur"),
        Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur",
        "__clamped_n_ref", "__clamped_n_cur"))
      .withColumn("t_ref", sum(col("n_ref")).over())
      .withColumn("t_cur", sum(col("n_cur")).over())
      .withColumn("tv_num",
        abs(dec(col("n_ref")) * dec(col("t_cur")) -
          dec(col("n_cur")) * dec(col("t_ref"))))
      // degenerate-slice guard: an empty ref or cur slice makes the
      // contribution 0/0 — emit an explicit null, not a double NaN,
      // so a `tv_contrib > x` alarm reads "degenerate input", never
      // "no drift" (ADVICE r14; same contract as [[tvd]])
      .withColumn("tv_contrib",
        when(col("t_ref") === 0 || col("t_cur") === 0,
          lit(null).cast("double"))
          .otherwise(col("tv_num").cast("double") /
            (lit(2.0) * col("t_ref") * col("t_cur"))))
      // per-slice constants: the fraction of each slice's mass that
      // was clamped into the edge buckets. Nonzero says the bucketing
      // is undersized for the signal and the profile under-reads
      // drift — alarm on it alongside tvd, not instead of it. One
      // exact integer count per slice, one trailing division.
      .withColumn("clamped_frac_ref",
        when(col("t_ref") === 0, lit(null).cast("double"))
          .otherwise(sum(col("__clamped_n_ref")).over()
            .cast("double") / col("t_ref")))
      .withColumn("clamped_frac_cur",
        when(col("t_cur") === 0, lit(null).cast("double"))
          .otherwise(sum(col("__clamped_n_cur")).over()
            .cast("double") / col("t_cur")))
      .drop("__clamped_n_ref", "__clamped_n_cur")
  }

  /** The scalar: (tvd, n_buckets, t_ref, t_cur) — ½ Σ |p − q| as the
    * exact integer numerator sum over the common denominator, ONE
    * trailing division (oracle `c18_drift_tvd`). 0 = identical
    * distributions, 1 = disjoint. Alarm on the threshold your re-fit
    * cost tolerates (0.1–0.25 is the usual band).
    *
    * Degenerate input: an EMPTY ref or cur slice (t_ref or t_cur = 0
    * after the null/NaN filter) yields `tvd = null`, deliberately —
    * a nightly `tvd > threshold` alarm must not silently never fire
    * on a broken upstream; treat a null tvd as "check the inputs",
    * and check t_ref/t_cur (always returned) in the same pass. */
  def tvd(ref: DataFrame, cur: DataFrame, valueCol: String,
      bucketWidth: Double, maxBucket: Int = 63): DataFrame =
    histogramProfile(ref, cur, valueCol, bucketWidth, maxBucket)
      .agg(sum(col("tv_num")).as("num"),
        count(lit(1)).as("n_buckets"),
        max(col("t_ref")).as("t_ref"), max(col("t_cur")).as("t_cur"),
        max(col("clamped_frac_ref")).as("clamped_frac_ref"),
        max(col("clamped_frac_cur")).as("clamped_frac_cur"))
      .select(
        when(col("t_ref") === 0 || col("t_cur") === 0,
          lit(null).cast("double"))
          .otherwise(col("num").cast("double") /
            (lit(2.0) * col("t_ref") * col("t_cur"))).as("tvd"),
        col("n_buckets"), col("t_ref"), col("t_cur"),
        // nonzero = the bucketing clamped real mass; the tvd above
        // under-reads drift in that regime — treat like the null-tvd
        // alarm: check the inputs (resize maxBucket/width), not "no
        // drift" (VERDICT r15 item 7)
        col("clamped_frac_ref"), col("clamped_frac_cur"))

  /** Embedding-space drift: the L2 distance between the two slices'
    * mean vectors, plus each slice's mean distance to its own mean
    * (dispersion) so the shift is readable in units of spread —
    * `shift_l2 / ref_dispersion` ≫ 0.5 says the new data's center
    * moved materially and the frozen IVF centroids
    * ([[VectorDedupIndex]]) are due a re-fit. One posexplode +
    * per-dim aggregate per slice (the Kmeans centroid shape), one
    * map-side distance pass per slice for dispersion; the per-dim
    * frames are dim-sized. Returns ONE row: (dim, n_ref, n_cur,
    * shift_l2, ref_dispersion, cur_dispersion). */
  def embeddingShift(ref: DataFrame, cur: DataFrame,
      vecCol: String): DataFrame = {
    def meanVec(df: DataFrame): DataFrame = df
      .select(posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("pos", "x")))
      .groupBy("pos").agg(avg(col("x")).as("m"), count(lit(1)).as("n"))
    // collect into (pos, m) structs and sort AFTER collecting —
    // orderBy-then-collect_list does not survive the aggregation
    def gather(df: DataFrame, as: String, nAs: String): DataFrame = df
      .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x("m")).as(as),
        max(col("n")).as(nAs))
    val rm = gather(meanVec(ref), "m_ref", "n_ref")
    val cm = gather(meanVec(cur), "m_cur", "n_cur")
    val means = rm.crossJoin(cm) // two one-row frames
    val withShift = means.withColumn("shift_l2",
      sqrt(aggregate(zip_with(col("m_ref"), col("m_cur"),
        (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x)))
    val refD = ref.crossJoin(broadcast(withShift.select(col("m_ref"))))
      .select(call_function("graft_l2_distance",
        col(vecCol).cast("array<double>"), col("m_ref")).as("d"))
      .agg(avg(col("d")).as("ref_dispersion"))
    val curD = cur.crossJoin(broadcast(withShift.select(col("m_cur"))))
      .select(call_function("graft_l2_distance",
        col(vecCol).cast("array<double>"), col("m_cur")).as("d"))
      .agg(avg(col("d")).as("cur_dispersion"))
    withShift
      .select(size(col("m_ref")).cast("long").as("dim"),
        col("n_ref"), col("n_cur"), col("shift_l2"))
      .crossJoin(refD).crossJoin(curD) // one-row frames throughout
  }
}
