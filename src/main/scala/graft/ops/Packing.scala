package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing for LLM pretraining batches: lay documents out
  * along a global token axis (exclusive running sum of token counts in
  * a stable document order) and cut that axis into fixed `maxLen` bins.
  * A document's bin and in-bin offset tell the batch builder exactly
  * where its tokens land; documents may straddle a boundary (standard
  * "packed dataset" layout — the alternative, greedy first-fit, is
  * inherently sequential and changes output under re-partitioning).
  *
  * The running sum is the scale-sensitive part: `SUM(w) OVER (ORDER BY
  * key)` funnels every row through ONE task (Spark warns "No Partition
  * Defined for Window"). [[withPrefixSum]] instead uses the classic
  * two-phase scan, the same shape [[graft.etl.Normalize.zipWithIndexId]]
  * uses for dense ids: range-partition by the key, per-partition
  * totals (a few hundred longs) to the driver, prefix-sum those into
  * per-partition offsets, then one partition-local pass. Wall-clock is
  * two narrow passes over the data with no global funnel — at 100 TB
  * the window form simply does not finish.
  */
object Packing {

  /** Adds `outCol` = exclusive prefix sum of `weightCol` over the
    * global `orderCol` ascending order. `orderCol` must be unique per
    * row (ties would make the prefix order, and thus the sum,
    * partition-dependent); weights must be non-negative longs. */
  def withPrefixSum(df: DataFrame, orderCol: String, weightCol: String,
      outCol: String): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(df.rdd.getNumPartitions, 1)
    val sorted = df
      .repartitionByRange(parts, col(orderCol))
      .sortWithinPartitions(orderCol)
    // no cache: both phases read the repartitionByRange SHUFFLE output
    // (Spark reuses shuffle files; nothing upstream is recomputed), and
    // caching here would leak a new RDD per bench iteration
    val sortedRdd = sorted.rdd
    val widx = sorted.schema.fieldIndex(weightCol)
    def w(r: Row): Long = r.get(widx) match {
      case l: Long => l
      case i: Int  => i.toLong
      case other   => throw new IllegalArgumentException(
        s"$weightCol must be integral, got $other")
    }
    // phase 1: one long per partition to the driver
    val partTotals = sortedRdd
      .mapPartitionsWithIndex { case (i, it) =>
        Iterator.single(i -> it.map(w).sum)
      }
      .collect().toMap
    val offsets = (0 until parts).scanLeft(0L) {
      case (acc, i) => acc + partTotals.getOrElse(i, 0L)
    }.toArray
    // phase 2: partition-local running sum + the partition's offset
    val out = sortedRdd.mapPartitionsWithIndex { case (i, it) =>
      var acc = offsets(i)
      it.map { r =>
        val before = acc
        acc += w(r)
        Row.fromSeq(r.toSeq :+ before)
      }
    }
    spark.createDataFrame(out,
      StructType(sorted.schema.fields :+
        StructField(outCol, LongType, nullable = false)))
  }

  /** Bin assignment over the packed token axis: `bin` = which maxLen
    * window the document STARTS in, `bin_offset` = where within it. */
  def packBins(df: DataFrame, orderCol: String, weightCol: String,
      maxLen: Long): DataFrame = {
    require(maxLen > 0, s"maxLen must be positive, got $maxLen")
    withPrefixSum(df, orderCol, weightCol, "cum_before")
      .withColumn("bin", expr(s"cum_before div ${maxLen}L"))
      .withColumn("bin_offset", col("cum_before") % maxLen)
  }

  /** Deterministic epoch shuffle + weight-balanced contiguous shards
    * (the library form of oracle query c14): order by the seeded
    * content hash (re-runs land every row in the same spot, unlike
    * `rand()`), then `shard = (nShards · cum_before) div total` —
    * ids in [0, nShards), per-shard weight within one max-row of
    * total/nShards, no driver greedy. Prefix positions come from the
    * two-phase [[withPrefixSum]], never a single-partition window.
    * Adds (shuffle_key, cum_before, shard). */
  def epochShards(df: DataFrame, idCol: String, weightCol: String,
      nShards: Int, seed: String = "epoch-1"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val keyed = df.withColumn("shuffle_key",
      md5(concat(lit(s"$seed:"), col(idCol).cast("string"))))
    val cum = withPrefixSum(keyed, "shuffle_key", weightCol,
      "cum_before")
    val tot = cum.agg(sum(col(weightCol)).cast("long").as("__total"))
    cum.crossJoin(broadcast(tot))
      // greatest(·,1): an all-zero-weight frame must land in shard 0,
      // not null out on the zero division
      .withColumn("shard",
        expr(s"($nShards * cum_before) div greatest(__total, 1L)"))
      .drop("__total")
  }
}
