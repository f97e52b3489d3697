package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable quantile summary — MRL-style deterministic multi-level
  * sampling (Manku/Rajagopalan/Lindsay, SIGMOD '98; the deterministic
  * ancestor of KLL, which differs only by randomizing the compaction
  * choice). Completes the engine's mergeable-sketch family: HLL
  * (distinct), CMS (frequency), KMV (set overlap), Misra-Gries (heavy
  * hitters), MRL (quantiles).
  *
  * The 100 TB shape: exact percentiles need a global sort (or Spark's
  * `percentile_approx`, which is not a reusable mergeable artifact).
  * The MRL buffer is O(k · log(n/k)) doubles with map-side partial
  * aggregation, so per-day / per-partition summaries persist as small
  * arrays and merge associatively into weekly/monthly quantiles
  * without touching raw data — the same rollup contract the HLL
  * register sketches pin in s10.
  *
  * Structure: level i holds ≤ k values, each standing for 2^i
  * originals. A full level sorts and keeps alternate values (the
  * deterministic compaction — lowest-index survivor), pushing them up
  * one level. Rank error after any merge sequence is bounded by
  * Σ_levels 2^(i-1) · (compactions at level i) ≤ ~log2(n/k) · n / k;
  * the spec pins an empirical rank-error budget under hostile
  * partitionings rather than a fixed byte image (buffer contents are
  * merge-order-dependent — the same stance as Misra-Gries).
  *
  * Null inputs are skipped (standard aggregate contract). NaNs are the
  * caller's problem, as with any ordering.
  */
object QuantileSummary {

  /** levels(i) = sorted values of weight 2^i; n = total items folded. */
  final case class MrlBuffer(levels: Array[Array[Double]], n: Long)

  /** One weighted sample point of the finished summary. */
  final case class WeightedValue(value: Double, weight: Long)

  /** Sorted-merge two sorted arrays. */
  private def merge2(a: Array[Double], b: Array[Double]): Array[Double] = {
    val out = new Array[Double](a.length + b.length)
    var ia = 0
    var ib = 0
    var j = 0
    while (ia < a.length && ib < b.length) {
      if (a(ia) <= b(ib)) { out(j) = a(ia); ia += 1 }
      else { out(j) = b(ib); ib += 1 }
      j += 1
    }
    while (ia < a.length) { out(j) = a(ia); ia += 1; j += 1 }
    while (ib < b.length) { out(j) = b(ib); ib += 1; j += 1 }
    out
  }

  /** Keep alternate values of the first `even` entries of a sorted
    * array (even indices — the deterministic MRL compaction). Count
    * mass is exact: m survivors at double weight stand for 2m
    * originals. */
  private def compact(sorted: Array[Double], even: Int): Array[Double] =
    Array.tabulate(even / 2)(i => sorted(2 * i))

  /** Cascade compaction: any level over `k` halves upward until all
    * levels fit. An odd item count leaves its LAST (largest) value
    * behind at the level — compacting an odd run would silently drop
    * 2^i of count mass. Levels are kept sorted throughout. */
  private def normalize(levels: Array[Array[Double]], k: Int)
      : Array[Array[Double]] = {
    val ls = scala.collection.mutable.ArrayBuffer(levels.toSeq: _*)
    var i = 0
    while (i < ls.length) {
      if (ls(i).length > k) {
        val arr = ls(i)
        val even = arr.length & ~1
        val promoted = compact(arr, even)
        ls(i) = if (arr.length % 2 == 1) Array(arr(arr.length - 1))
          else Array.emptyDoubleArray
        if (i + 1 == ls.length) ls += promoted
        else ls(i + 1) = merge2(ls(i + 1), promoted)
      }
      i += 1
    }
    ls.toArray
  }

  final class MrlAggregator(k: Int)
      extends Aggregator[java.lang.Double, MrlBuffer, Seq[WeightedValue]] {
    require(k >= 2 && k % 2 == 0,
      s"quantileSummary: k must be even and >= 2, got $k")

    override def zero: MrlBuffer = MrlBuffer(Array(Array.emptyDoubleArray), 0L)

    override def reduce(b: MrlBuffer, boxed: java.lang.Double): MrlBuffer = {
      if (boxed == null) return b
      // level 0 collects unsorted; sort only at compaction time
      val l0 = b.levels(0) :+ boxed.doubleValue()
      if (l0.length <= k)
        MrlBuffer(b.levels.updated(0, l0), b.n + 1)
      else {
        java.util.Arrays.sort(l0)
        MrlBuffer(normalize(b.levels.updated(0, l0), k), b.n + 1)
      }
    }

    override def merge(a: MrlBuffer, b: MrlBuffer): MrlBuffer = {
      if (b.n == 0) return a
      if (a.n == 0) return b
      val depth = math.max(a.levels.length, b.levels.length)
      val merged = Array.tabulate(depth) { i =>
        val la = if (i < a.levels.length) a.levels(i)
          else Array.emptyDoubleArray
        val lb = if (i < b.levels.length) b.levels(i)
          else Array.emptyDoubleArray
        if (i == 0) { // level 0 may be unsorted on either side
          val c = la ++ lb
          java.util.Arrays.sort(c)
          c
        } else merge2(la, lb)
      }
      MrlBuffer(normalize(merged, k), a.n + b.n)
    }

    /** Deterministic presentation of the (merge-order-dependent)
      * buffer: the weighted sample sorted by value. */
    override def finish(b: MrlBuffer): Seq[WeightedValue] = {
      val l0 = b.levels(0).clone()
      java.util.Arrays.sort(l0)
      val all = b.levels.zipWithIndex.flatMap { case (vals, i) =>
        (if (i == 0) l0 else vals).map(v => WeightedValue(v, 1L << i))
      }
      all.sortBy(w => (w.value, w.weight)).toSeq
    }

    override def bufferEncoder: Encoder[MrlBuffer] =
      ExpressionEncoder[MrlBuffer]()
    override def outputEncoder: Encoder[Seq[WeightedValue]] =
      ExpressionEncoder[Seq[WeightedValue]]()
  }

  /** Column-API entry: `df.groupBy(g).agg(quantileSummary(k)(valueCol))`
    * → `array<struct<value, weight>>` sorted by value. */
  def quantileSummary(k: Int): Column => Column = {
    val f = udaf(new MrlAggregator(k), Encoders.DOUBLE)
    value => f(value)
  }

  /** Extract a quantile estimate from a finished summary: the value
    * whose cumulative weight first reaches q · totalWeight. */
  def quantile(summary: Seq[WeightedValue], q: Double): Double = {
    require(summary.nonEmpty, "quantile of an empty summary")
    require(q >= 0.0 && q <= 1.0, s"quantile fraction $q outside [0,1]")
    val total = summary.map(_.weight).sum
    val target = q * total
    var cum = 0L
    for (w <- summary) {
      cum += w.weight
      if (cum >= target) return w.value
    }
    summary.last.value
  }
}
