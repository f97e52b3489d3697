package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("two-phase prefix sum equals the window-function definition") {
    val df = Seq((5L, 10L), (1L, 3L), (3L, 7L), (9L, 2L), (7L, 100L))
      .toDF("k", "w")
    val got = Packing.withPrefixSum(df, "k", "w", "cum")
      .select("k", "cum").as[(Long, Long)].collect().toMap
    val want = df.withColumn("cum",
      coalesce(sum("w").over(Window.orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("k", "cum").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("result is partitioning-independent") {
    val base = (1L to 1000L).map(i => (i, i % 7 + 1)).toDF("k", "w")
    val a = Packing.withPrefixSum(base.repartition(1), "k", "w", "cum")
      .select("k", "cum").as[(Long, Long)].collect().toMap
    val b = Packing.withPrefixSum(base.repartition(13), "k", "w", "cum")
      .select("k", "cum").as[(Long, Long)].collect().toMap
    assert(a == b)
    // spot-check the closed form: sum of (i % 7 + 1) below k
    assert(a(1L) == 0L)
    assert(a(9L) == (1L until 9L).map(_ % 7 + 1).sum)
  }

  test("packBins: bin and offset partition the token axis") {
    val df = (1L to 100L).map(i => (i, 10L)).toDF("k", "w")
    val out = Packing.packBins(df, "k", "w", maxLen = 64L)
      .select("k", "cum_before", "bin", "bin_offset")
      .as[(Long, Long, Long, Long)].collect()
    out.foreach { case (k, cum, bin, off) =>
      assert(cum == (k - 1) * 10)
      assert(bin == cum / 64)
      assert(off == cum % 64)
    }
  }

  test("int weights and empty partitions are handled") {
    val df = Seq((1L, 2), (2L, 3)).toDF("k", "w").repartition(8)
    val got = Packing.withPrefixSum(df, "k", "w", "cum")
      .select("k", "cum").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 2L))
  }
}
