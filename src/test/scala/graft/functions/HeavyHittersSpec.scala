package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property pins for the Misra-Gries heavy-hitters aggregate. The
  * buffer contents are merge-order-dependent by design, so the spec
  * asserts the INVARIANT guarantees (under/over bounds, guaranteed
  * recall above n/(k+1), exactness below k distinct) across hostile
  * partitionings, not a fixed byte image.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def summarize(items: Seq[Long], k: Int, parts: Int)
      : Seq[HeavyHitters.HeavyHit] =
    items.toDF("item").repartition(parts)
      .agg(HeavyHitters.heavyHitters(k)(col("item")).as("hh"))
      .selectExpr("inline(hh)")
      .as[HeavyHitters.HeavyHit].collect().toSeq

  test("exact counts when distinct items fit the k counters") {
    val items = Seq.fill(40)(1L) ++ Seq.fill(25)(2L) ++ Seq.fill(7)(3L)
    for (parts <- Seq(1, 7)) {
      val out = summarize(scala.util.Random.shuffle(items), k = 8, parts)
      assert(out.map(h => h.item -> h.est).toMap ==
        Map(1L -> 40L, 2L -> 25L, 3L -> 7L))
      assert(out.forall(_.err == 0L), "no decrements can occur under k")
      // presentation order is deterministic: est desc, item asc
      assert(out.map(_.item) == Seq(1L, 2L, 3L))
    }
  }

  test("MG bounds hold on a skewed stream under hostile partitioning") {
    val rnd = new scala.util.Random(7)
    // two true heavy hitters over a long uniform tail
    val items = Seq.fill(500)(1001L) ++ Seq.fill(300)(1002L) ++
      Seq.fill(1200)(rnd.nextInt(400).toLong)
    val truth = items.groupBy(identity).map { case (i, xs) =>
      i -> xs.size.toLong }
    val n = items.size.toLong
    val k = 20
    for (parts <- Seq(1, 13)) {
      val out = summarize(rnd.shuffle(items), k, parts)
      assert(out.size <= k)
      val err = out.headOption.map(_.err).getOrElse(0L)
      assert(err <= n / (k + 1), s"err $err exceeds n/(k+1)")
      out.foreach { h =>
        val t = truth(h.item)
        assert(h.est <= t, s"item ${h.item}: est ${h.est} over-counts $t")
        assert(t <= h.est + h.err,
          s"item ${h.item}: true $t outside [est, est+err]")
      }
      // guaranteed recall: anything more frequent than n/(k+1) survives
      val kept = out.map(_.item).toSet
      truth.filter(_._2 > n / (k + 1)).keys.foreach(i =>
        assert(kept(i), s"heavy item $i (count ${truth(i)}) was lost"))
    }
  }

  test("per-group summaries aggregate independently") {
    val df = (Seq.fill(30)(("a", 1L)) ++ Seq.fill(9)(("a", 2L)) ++
      Seq.fill(50)(("b", 3L))).toDF("g", "item").repartition(5)
    val out = df.groupBy("g")
      .agg(HeavyHitters.heavyHitters(4)(col("item")).as("hh"))
      .selectExpr("g", "inline(hh)")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(("a", 1L, 30L, 0L), ("a", 2L, 9L, 0L),
      ("b", 3L, 50L, 0L)))
  }
}
