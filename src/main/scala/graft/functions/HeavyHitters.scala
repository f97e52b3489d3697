package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy-hitters summary — the one-pass top-k CANDIDATE
  * sketch (SURVEY.md §2.13 custom-aggregate surface; complements the
  * count-min sketch of s04, which estimates frequencies for known keys
  * but cannot enumerate which keys are frequent).
  *
  * The 100 TB shape: finding the most frequent tokens / domains / user
  * agents in a corpus normally costs a full `groupBy(item).count()` —
  * a shuffle carrying every distinct item. The MG summary is a bounded
  * buffer (k counters) with map-side partial aggregation: each scan
  * partition reduces to ≤ k (item, count) pairs before the exchange,
  * and merging is the Agarwal et al. ("Mergeable Summaries", PODS '12)
  * counter merge, so any partitioning / AQE re-plan yields a summary
  * with the same guarantees. The shuffle carries O(groups × k), never
  * O(distinct items).
  *
  * Guarantees (classic MG, preserved under merge):
  *  - every reported `est` is an UNDER-estimate: `est <= true`;
  *  - the summary-wide `err` bounds the loss: `true <= est + err`;
  *  - `err <= n / (k + 1)` (n = items folded in), so every item with
  *    true frequency > n/(k+1) is guaranteed present in the summary.
  *
  * Unlike the engine's oracle-paired sketches (HLL, KMV, CMS) the
  * buffer CONTENTS are merge-order-dependent (only the bounds above
  * are invariant), so this surface is spec-verified by its properties,
  * not DuckDB-hashed — the same stance as the seeded MockData
  * distributions.
  *
  * Items are longs: pre-hash strings with
  * [[TextOps.md5Long]]-style keys, or pass natural integer keys
  * directly. Null items must be filtered upstream (the long decoder
  * reads them as 0).
  */
object HeavyHitters {

  /** Summary buffer: parallel arrays sorted ascending by item over
    * the first `size` entries (binary search on reduce; capacity may
    * exceed `size` so the per-row path never reallocates), a
    * cumulative decrement offset `decs` (the summary-wide
    * over-estimation bound), and the fold count `n`. */
  final case class MgBuffer(
      items: Array[Long], counts: Array[Long], size: Int,
      decs: Long, n: Long)

  final case class HeavyHit(item: Long, est: Long, err: Long)

  final class MgAggregator(k: Int)
      extends Aggregator[java.lang.Long, MgBuffer, Seq[HeavyHit]] {
    require(k >= 1, s"heavyHitters: k must be >= 1, got $k")

    override def zero: MgBuffer =
      MgBuffer(Array.emptyLongArray, Array.emptyLongArray, 0, 0L, 0L)

    /** In-place: drop `v` from every counter, keep the positive ones
      * compacted to the front. Returns the new size — the MG overflow
      * step: v is the min so at least one counter zeroes out, and
      * (k+1) * v mass leaves the summary per overflow, which is what
      * bounds cumulative decrements by n / (k+1). */
    private def spillInPlace(items: Array[Long], counts: Array[Long],
        size: Int, v: Long): Int = {
      var j = 0
      var i = 0
      while (i < size) {
        if (counts(i) > v) {
          items(j) = items(i)
          counts(j) = counts(i) - v
          j += 1
        }
        i += 1
      }
      j
    }

    override def reduce(b: MgBuffer, boxed: java.lang.Long): MgBuffer = {
      if (boxed == null) return b
      val item = boxed.longValue()
      val i = java.util.Arrays.binarySearch(b.items, 0, b.size, item)
      if (i >= 0) {
        // hot path (the heavy items, by definition): one probe, one
        // in-place increment, zero allocation
        b.counts(i) += 1
        b.copy(n = b.n + 1)
      } else {
        val at = -i - 1
        // capacity grows to k+1 once, then every insert is an in-place
        // arraycopy shift
        val (items, counts) =
          if (b.size == b.items.length) {
            val cap = math.min(k + 1, math.max(4, b.items.length * 2))
            (java.util.Arrays.copyOf(b.items, cap),
              java.util.Arrays.copyOf(b.counts, cap))
          } else (b.items, b.counts)
        System.arraycopy(items, at, items, at + 1, b.size - at)
        System.arraycopy(counts, at, counts, at + 1, b.size - at)
        items(at) = item
        counts(at) = 1L
        val size = b.size + 1
        if (size <= k) MgBuffer(items, counts, size, b.decs, b.n + 1)
        else {
          // k+1 counters: shed the min (which is <= the just-inserted 1)
          var v = Long.MaxValue
          var j = 0
          while (j < size) { if (counts(j) < v) v = counts(j); j += 1 }
          MgBuffer(items, counts, spillInPlace(items, counts, size, v),
            b.decs + v, b.n + 1)
        }
      }
    }

    override def merge(a: MgBuffer, b: MgBuffer): MgBuffer = {
      if (b.size == 0)
        return a.copy(decs = a.decs + b.decs, n = a.n + b.n)
      if (a.size == 0)
        return b.copy(decs = a.decs + b.decs, n = a.n + b.n)
      // sorted-array merge, summing counts of shared items (merges run
      // per partition pair, not per row — allocation here is fine)
      val items = new Array[Long](a.size + b.size)
      val counts = new Array[Long](items.length)
      var ia = 0
      var ib = 0
      var j = 0
      while (ia < a.size || ib < b.size) {
        val takeA = ib == b.size ||
          (ia < a.size && a.items(ia) <= b.items(ib))
        val takeB = ia == a.size ||
          (ib < b.size && b.items(ib) <= a.items(ia))
        items(j) = if (takeA) a.items(ia) else b.items(ib)
        counts(j) =
          (if (takeA) a.counts(ia) else 0L) +
            (if (takeB) b.counts(ib) else 0L)
        if (takeA) ia += 1
        if (takeB) ib += 1
        j += 1
      }
      if (j <= k)
        MgBuffer(items, counts, j, a.decs + b.decs, a.n + b.n)
      else {
        // Agarwal et al. merge: subtract the (k+1)-th largest counter
        val sorted = java.util.Arrays.copyOf(counts, j)
        java.util.Arrays.sort(sorted)
        val v = sorted(j - 1 - k)
        MgBuffer(items, counts, spillInPlace(items, counts, j, v),
          a.decs + b.decs + v, a.n + b.n)
      }
    }

    /** Deterministic presentation of the (merge-order-dependent)
      * buffer: descending by estimate, items tiebreak ascending. */
    override def finish(b: MgBuffer): Seq[HeavyHit] =
      Seq.tabulate(b.size)(i =>
        HeavyHit(b.items(i), b.counts(i), b.decs))
        .sortBy(h => (-h.est, h.item))

    override def bufferEncoder: Encoder[MgBuffer] =
      ExpressionEncoder[MgBuffer]()
    override def outputEncoder: Encoder[Seq[HeavyHit]] =
      ExpressionEncoder[Seq[HeavyHit]]()
  }

  /** Column-API entry: `df.groupBy(g).agg(heavyHitters(k)(itemCol))` →
    * `array<struct<item, est, err>>` sorted by estimate descending. */
  def heavyHitters(k: Int): Column => Column = {
    val f = udaf(new MgAggregator(k), Encoders.LONG)
    item => f(item)
  }
}
