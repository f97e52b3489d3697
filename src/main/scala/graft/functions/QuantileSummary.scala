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
  * Hot-path discipline: the level-0 collector is a FIXED-CAPACITY
  * array mutated in place with a fill counter — `reduce` allocates
  * NOTHING on the per-row path (one k-sized array per k rows at
  * compaction time). Level i holds ≤ k values of weight 2^i; a full
  * level 0 sorts and promotes alternate values (the deterministic
  * compaction, lowest-index survivor); upper-level overflow cascades
  * the same way, leaving one value behind when a run is odd so count
  * mass is conserved exactly.
  *
  * Rank error after any merge sequence is bounded by
  * Σ_levels 2^(i-1) · (compactions at level i) ≤ ~log2(n/k) · n / k;
  * the spec pins an empirical rank-error budget under hostile
  * partitionings rather than a fixed byte image (buffer contents are
  * merge-order-dependent — the same stance as Misra-Gries).
  *
  * Null inputs are skipped (standard aggregate contract). NaNs are the
  * caller's problem, as with any ordering.
  */
object QuantileSummary {

  /** `l0` = fixed-capacity unsorted collector (first `l0n` entries
    * valid, weight 1); `upper(i)` = sorted values of weight 2^(i+1);
    * `n` = total items folded. */
  final case class MrlBuffer(l0: Array[Double], l0n: Int,
      upper: Array[Array[Double]], n: Long)

  /** One weighted sample point of the finished summary. */
  final case class WeightedValue(value: Double, weight: Long)

  /** Sorted-merge two sorted arrays. */
  private def merge2(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
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

  /** Alternate values of the first `even` entries of a sorted array
    * (even indices — the deterministic MRL compaction). Count mass is
    * exact: m survivors at double weight stand for 2m originals. */
  private def compact(sorted: Array[Double], even: Int): Array[Double] =
    Array.tabulate(even / 2)(i => sorted(2 * i))

  /** Cascade compaction over the UPPER levels: any level over `k`
    * halves upward; an odd item count leaves its LAST (largest) value
    * behind (compacting an odd run would drop 2^i of count mass). */
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

  /** Merge `promoted` (weight-2 values) into the upper-level stack and
    * re-normalize. */
  private def promoteUp(upper: Array[Array[Double]],
      promoted: Array[Double], k: Int): Array[Array[Double]] = {
    val base = if (upper.isEmpty) Array(promoted)
      else upper.updated(0, merge2(upper(0), promoted))
    normalize(base, k)
  }

  final class MrlAggregator(k: Int)
      extends Aggregator[java.lang.Double, MrlBuffer, Seq[WeightedValue]] {
    require(k >= 2 && k % 2 == 0,
      s"quantileSummary: k must be even and >= 2, got $k")

    override def zero: MrlBuffer =
      MrlBuffer(Array.emptyDoubleArray, 0, Array.empty, 0L)

    override def reduce(b: MrlBuffer, boxed: java.lang.Double): MrlBuffer = {
      if (boxed == null) return b
      // in-place fill of the fixed-capacity collector: no per-row
      // allocation (the copyOf fires once, and again only after a
      // merge() handed back a trimmed l0)
      val l0 = if (b.l0n == b.l0.length)
        java.util.Arrays.copyOf(b.l0, math.max(k, b.l0n + 1))
      else b.l0
      l0(b.l0n) = boxed.doubleValue()
      if (b.l0n + 1 < k)
        MrlBuffer(l0, b.l0n + 1, b.upper, b.n + 1)
      else {
        // full: sort, promote alternates, reuse the array. The merge
        // invariant keeps l0n < k so m == k (even) here, but sort and
        // compact over m — not the constant k — so a buffer that
        // somehow arrived overfull loses no value silently.
        val m = b.l0n + 1
        java.util.Arrays.sort(l0, 0, m)
        val even = m & ~1
        val promoted = compact(l0, even)
        val leftoverN = m - even
        if (leftoverN == 1) l0(0) = l0(m - 1)
        MrlBuffer(l0, leftoverN, promoteUp(b.upper, promoted, k), b.n + 1)
      }
    }

    override def merge(a: MrlBuffer, b: MrlBuffer): MrlBuffer = {
      if (b.n == 0) return a
      if (a.n == 0) return b
      val depth = math.max(a.upper.length, b.upper.length)
      var upper = Array.tabulate(depth) { i =>
        merge2(
          if (i < a.upper.length) a.upper(i) else Array.emptyDoubleArray,
          if (i < b.upper.length) b.upper(i) else Array.emptyDoubleArray)
      }
      val combined = new Array[Double](a.l0n + b.l0n)
      System.arraycopy(a.l0, 0, combined, 0, a.l0n)
      System.arraycopy(b.l0, 0, combined, a.l0n, b.l0n)
      // strict <: a returned buffer must keep l0n < k (the reduce
      // fast path writes at index l0n assuming room), so a combined
      // level-0 of exactly k compacts eagerly below
      if (combined.length < k)
        MrlBuffer(combined, combined.length, normalize(upper, k),
          a.n + b.n)
      else {
        // both sides were < k, so combined < 2k: one compaction fits
        java.util.Arrays.sort(combined)
        val even = combined.length & ~1
        val promoted = compact(combined, even)
        val leftover = if (combined.length % 2 == 1)
          Array(combined(combined.length - 1))
        else Array.emptyDoubleArray
        upper = promoteUp(upper, promoted, k)
        MrlBuffer(leftover, leftover.length, upper, a.n + b.n)
      }
    }

    /** Deterministic presentation of the (merge-order-dependent)
      * buffer: the weighted sample sorted by value. */
    override def finish(b: MrlBuffer): Seq[WeightedValue] = {
      val l0 = java.util.Arrays.copyOf(b.l0, b.l0n)
      java.util.Arrays.sort(l0)
      val all = l0.map(WeightedValue(_, 1L)) ++
        b.upper.zipWithIndex.flatMap { case (vals, i) =>
          vals.map(v => WeightedValue(v, 1L << (i + 1)))
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
