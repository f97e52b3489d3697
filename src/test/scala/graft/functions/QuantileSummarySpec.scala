package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property pins for the MRL quantile summary — like HeavyHitters, the
  * buffer contents are merge-order-dependent, so the spec asserts the
  * rank-error guarantee across hostile partitionings, not bytes.
  */
class QuantileSummarySpec extends SparkSpec {
  import spark.implicits._

  private def summarize(values: Seq[Double], k: Int, parts: Int)
      : Seq[QuantileSummary.WeightedValue] =
    values.toDF("v").repartition(parts)
      .agg(QuantileSummary.quantileSummary(k)(col("v")).as("s"))
      .selectExpr("inline(s)")
      .as[QuantileSummary.WeightedValue].collect().toSeq

  test("exact (weight-1 passthrough) when n fits the level-0 buffer") {
    val values = Seq(5.0, 1.0, 9.0, 3.0, 7.0)
    for (parts <- Seq(1, 3)) {
      val s = summarize(values, k = 8, parts)
      assert(s.map(_.value) == values.sorted)
      assert(s.forall(_.weight == 1L))
      assert(QuantileSummary.quantile(s, 0.5) == 5.0)
      assert(QuantileSummary.quantile(s, 0.0) == 1.0)
      assert(QuantileSummary.quantile(s, 1.0) == 9.0)
    }
  }

  test("rank error stays inside the MRL budget under hostile partitioning") {
    val rnd = new scala.util.Random(3)
    val n = 20000
    val values = Seq.fill(n)(rnd.nextDouble() * 1000.0)
    val sorted = values.sorted.toIndexedSeq
    val k = 128
    // theoretical cumulative compaction error ≈ n·log2(n/k)/(2k) ≈ 570
    // ranks here; assert a 5% (1000-rank) envelope to absorb the
    // partition-shape dependence the bound ranges over
    val budget = (0.05 * n).toInt
    for (parts <- Seq(1, 13)) {
      val s = summarize(values, k, parts)
      // summary mass must equal the input count
      assert(s.map(_.weight).sum == n.toLong)
      for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
        val est = QuantileSummary.quantile(s, q)
        // true rank of the estimate (count of values <= est)
        val rank = sorted.count(_ <= est)
        val err = math.abs(rank - q * n)
        assert(err <= budget,
          f"q=$q parts=$parts: rank error $err%.0f exceeds $budget")
      }
    }
  }

  test("merge keeps level-0 strictly under k, and a reduce after a " +
      "full-k merge loses no mass") {
    // direct aggregator driving: merge two half-full buffers into a
    // combined level-0 of exactly k, then keep reducing — before the
    // round-11 fix the merged buffer had l0n == k and the next reduce
    // wrote past the sorted range, silently dropping one value
    val agg = new QuantileSummary.MrlAggregator(4)
    def fill(vals: Seq[Double]) =
      vals.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
    val merged = agg.merge(fill(Seq(1.0, 2.0)), fill(Seq(3.0, 4.0)))
    assert(merged.l0n < 4, s"merge left level-0 at ${merged.l0n} == k")
    val after = Seq(5.0, 6.0, 7.0).foldLeft(merged)((b, v) => agg.reduce(b, v))
    val s = agg.finish(after)
    assert(s.map(_.weight).sum == 7L,
      s"summary mass ${s.map(_.weight).sum} != 7 values reduced")
    assert(after.n == 7L)
  }

  test("per-group summaries aggregate independently") {
    val df = (Seq.tabulate(100)(i => ("a", i.toDouble)) ++
      Seq.tabulate(50)(i => ("b", 1000.0 + i))).toDF("g", "v")
      .repartition(7)
    val out = df.groupBy("g")
      .agg(QuantileSummary.quantileSummary(32)(col("v")).as("s"))
      .selectExpr("g", "s").as[(String, Seq[QuantileSummary.WeightedValue])]
      .collect().toMap
    val medA = QuantileSummary.quantile(out("a"), 0.5)
    val medB = QuantileSummary.quantile(out("b"), 0.5)
    assert(medA >= 40 && medA <= 60, s"group a median $medA")
    assert(medB >= 1015 && medB <= 1035, s"group b median $medB")
  }
}
