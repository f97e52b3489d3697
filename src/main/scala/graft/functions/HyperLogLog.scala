package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Deterministic HyperLogLog distinct-count sketch (SURVEY.md §2.5 /
  * §2.13 — the reserved "HLL/centroid" custom-aggregate surface).
  *
  * Design goals, in order:
  *  1. **Cross-engine bit-reproducibility** — the estimate must be the
  *     byte-identical double whether computed by this Aggregator, by the
  *     equivalent relational plan (groupBy register → max → sum), or by
  *     DuckDB running the oracle SQL. Everything is therefore integer
  *     arithmetic until one final double division:
  *     `EstConst / Σ_j 2^(32-M[j])` with the sum an exact Long.
  *  2. **Mergeability** — `merge` is an element-wise register max, so
  *     partial aggregation (map-side combine) and any partitioning give
  *     the same sketch. This is what makes it a 100 TB operator: the
  *     shuffle carries 64-byte buffers, not values.
  *
  * Parameters are fixed (p=6 → m=64 registers) and the standard HLL
  * small-range (linear counting) correction is deliberately omitted:
  * `ln` is libm-dependent and would break cross-engine determinism.
  * The variant is documented as HLL-NC (no correction) — at n ≲ 2.5·m
  * it over-estimates, above that it matches classic HLL exactly.
  *
  * Input is a pre-hashed value in [0, 2^32): use
  * [[TextOps.md5Long32]] so Spark and the DuckDB oracle hash
  * identically. Register index = low 6 bits; rank = trailing zeros of
  * the remaining 26 bits + 1 (27 when they are all zero).
  */
object HyperLogLog {
  val P: Int = 6
  val M: Int = 1 << P // 64 registers
  val MaxRho: Int = 32 - P + 1 // 27

  /** alpha_64 * m^2 * 2^32 = 0.709 * 4096 * 4294967296 — folded to one
    * double literal so Spark, the Aggregator, and DuckDB all divide the
    * same constant by the same integer sum. */
  val EstConst: Double = 1.2472859905490943e13

  /** rho(h) for the 26 post-index bits: trailing zeros + 1. */
  def rho(wbits: Long): Int =
    if (wbits == 0L) MaxRho
    else java.lang.Long.numberOfTrailingZeros(wbits) + 1

  /** The shared estimate formula: registers → exact Long sum → one
    * division. An empty register (value 0) contributes 2^32 exactly as
    * the relational form's `(m - n_regs) * 2^32` term does. */
  def estimate(registers: Array[Byte]): Double = {
    var s = 0L
    var j = 0
    while (j < M) {
      s += 1L << (32 - registers(j))
      j += 1
    }
    EstConst / s.toDouble
  }

  /** Typed Aggregator over md5Long32-hashed values. Input is boxed so
    * a null hash (null source value) is SKIPPED — the standard
    * aggregate null contract, and the same contract the relational
    * form and the DuckDB oracle apply via their explicit
    * `h32 IS NOT NULL` filters; all three stay bit-identical on
    * null-bearing data. */
  class HllAggregator
      extends Aggregator[java.lang.Long, Array[Byte], Double] {
    override def zero: Array[Byte] = new Array[Byte](M)

    override def reduce(b: Array[Byte], boxed: java.lang.Long)
        : Array[Byte] = {
      if (boxed == null) return b
      val h = boxed.longValue()
      val j = (h & (M - 1)).toInt
      val r = rho(h >>> P)
      if (r > b(j)) b(j) = r.toByte
      b
    }

    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var j = 0
      while (j < M) {
        if (b(j) > a(j)) a(j) = b(j)
        j += 1
      }
      a
    }

    override def finish(b: Array[Byte]): Double = estimate(b)

    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column-API entry point: `df.groupBy(..).agg(hll(md5Long32(col)))`. */
  def hll: Column => Column = {
    val f = udaf(new HllAggregator, Encoders.LONG)
    c => f(c)
  }
}
