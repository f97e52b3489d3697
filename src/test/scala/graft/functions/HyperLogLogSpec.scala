package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextOps.md5Long32

class HyperLogLogSpec extends SparkSpec {
  import HyperLogLog._

  private def estimateOf(n: Int, parts: Int): Double = {
    import spark.implicits._
    (1 to n).map(i => s"value_$i").toDF("v")
      .repartition(parts)
      .agg(hll(md5Long32(col("v"))).as("est"))
      .collect().head.getDouble(0)
  }

  test("estimate lands within HLL error bounds (m=64 => ~13% stderr)") {
    val est = estimateOf(5000, 4)
    // deterministic given the fixed hash; 3-sigma bound locks it in
    assert(math.abs(est - 5000) / 5000.0 < 0.4, s"est=$est")
    val big = estimateOf(20000, 4)
    assert(math.abs(big - 20000) / 20000.0 < 0.4, s"est=$big")
  }

  test("estimate is partitioning-invariant (mergeable registers)") {
    assert(estimateOf(3000, 1) == estimateOf(3000, 13))
  }

  test("duplicates do not move the estimate") {
    import spark.implicits._
    val uniq = (1 to 800).map(i => s"u$i")
    val dups = uniq ++ uniq ++ uniq.take(200)
    def est(vals: Seq[String]) = vals.toDF("v")
      .agg(hll(md5Long32(col("v")))).collect().head.getDouble(0)
    assert(est(uniq) == est(dups))
  }

  test("aggregator matches the relational register formula bit-for-bit") {
    import spark.implicits._
    val df = (1 to 1234).map(i => s"doc $i").toDF("v")
      .withColumn("h32", md5Long32(col("v")))
    val viaUdaf = df.agg(hll(col("h32"))).collect().head.getDouble(0)
    val viaPlan = df
      .withColumn("j", col("h32") % M)
      .withColumn("wbits", expr(s"h32 div $M"))
      .withColumn("rho", when(col("wbits") === 0, lit(MaxRho))
        .otherwise(expr("bit_count((wbits & -wbits) - 1) + 1")))
      .groupBy("j").agg(max("rho").as("r"))
      .agg((lit(EstConst) /
        (sum(expr("shiftleft(1L, 32 - r)")) +
          (lit(M) - count(lit(1))) * lit(4294967296L)).cast("double")))
      .collect().head.getDouble(0)
    assert(viaUdaf == viaPlan)
  }

  test("EstConst literal equals alpha_64 * m^2 * 2^32") {
    assert(EstConst == 0.709 * 4096.0 * 4294967296.0)
  }

  test("null hashes are skipped: estimate equals the null-free one") {
    import spark.implicits._
    val clean = (1 to 500).map(i => s"v$i")
    def est(vals: Seq[Option[String]]) = vals.toDF("v")
      .agg(hll(md5Long32(col("v")))).collect().head.getDouble(0)
    val withNulls =
      clean.map(Option(_)) ++ Seq.fill(37)(Option.empty[String])
    assert(est(withNulls) == est(clean.map(Option(_))))
  }
}
