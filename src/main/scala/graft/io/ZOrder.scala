package graft.io

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-column clustering for
  * 100 TB scan pruning (north-star layout op; same idea as Delta/Iceberg
  * `OPTIMIZE ZORDER BY`).
  *
  * Sorting a table by `(x, y)` lexicographically clusters only `x`;
  * predicates on `y` alone still touch every file. Interleaving the
  * bits of `x` and `y` into one Morton key and range-partitioning on it
  * gives every file a TIGHT min/max envelope on BOTH columns, so
  * parquet footer stats prune scans for either predicate — the standard
  * multi-dimensional-clustering trade.
  *
  * The interleave is the classic magic-bits spread (public-domain "Bit
  * Twiddling Hacks" sequence) expressed as a pure Catalyst column tree
  * (shifts/masks/or) — whole-stage-codegen'd, no UDF, and exactly
  * reproducible in ANSI SQL for the oracle (c06).
  */
object ZOrder {

  /** Spread the low 16 bits of `v` to the even bit positions 0,2,..30. */
  private def spread16(v: Column): Column = {
    val m = v.bitwiseAND(lit(0xFFFFL))
    val a = m.bitwiseOR(shiftleft(m, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key of two 16-bit values: x on even bits, y on odd.
    * Inputs are masked to their low 16 bits (callers bucket wider
    * domains down first — rank/bucket them into [0, 65536)). */
  def morton2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Rewrite a table Z-ordered on two columns: range-partition on the
    * Morton key of the two (bucketed) dimensions, sort within
    * partitions by it, drop the key. File count follows
    * [[Layout.compact]]'s sizing rules via `nFiles`. */
  def writeZOrdered(df: DataFrame, outPath: String, x: Column, y: Column,
      nFiles: Int, maxRecordsPerFile: Long = 1000000L): Unit =
    df.withColumn("__z", morton2(x, y))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.option("maxRecordsPerFile", maxRecordsPerFile)
      .mode(SaveMode.Overwrite).parquet(outPath)
}
