package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucket-cap guard behavior, including the degenerate cases the guard
  * exists for: a hot (over-cap) bucket and a NULL bucket key. */
class BlockingSpec extends SparkSpec {
  import spark.implicits._

  // 3 buckets: "hot" with 12 members, "cool" with 3, NULL with 5 —
  // cap 10 must drop "hot", keep "cool", and treat NULL as a bucket
  private def blocks = (
    (1 to 12).map(i => (i, Option("hot"))) ++
      (21 to 23).map(i => (i, Option("cool"))) ++
      (31 to 35).map(i => (i, Option.empty[String]))
  ).toDF("doc_id", "bkey")

  test("capBuckets drops over-cap buckets and reports them") {
    val (kept, hot) = Blocking.capBuckets(blocks, Seq("bkey"), 10)
    assert(kept.filter($"bkey" === "hot").count() == 0)
    assert(kept.count() == 8) // cool 3 + null 5
    val report = hot.as[(Option[String], Long)].collect().toMap
    assert(report == Map(Option("hot") -> 12L))
  }

  test("capBuckets drops a hot NULL bucket (null-safe anti-join)") {
    // cap 4: both "hot" (12) and NULL (5) exceed it; the NULL bucket
    // must actually leave `kept`, not just appear in the report
    val (kept, hot) = Blocking.capBuckets(blocks, Seq("bkey"), 4)
    assert(kept.filter($"bkey".isNull).count() == 0)
    assert(kept.select("bkey").distinct().as[String].collect().toSeq ==
      Seq("cool"))
    val report = hot.as[(Option[String], Long)].collect().toMap
    assert(report == Map(Option("hot") -> 12L, None -> 5L))
  }

  test("candidatePairs caps fan-out and pairs NULL-key buckets") {
    val (pairs, hot) = Blocking.candidatePairs(blocks, "doc_id",
      Seq("bkey"), 10)
    val got = pairs.select("a_id", "b_id").as[(Int, Int)].collect().toSet
    // cool: C(3,2)=3 pairs; null bucket: C(5,2)=10 pairs; hot: dropped
    val cool = Set((21, 22), (21, 23), (22, 23))
    val nulls = (31 to 35).combinations(2).map(c => (c(0), c(1))).toSet
    assert(got == cool ++ nulls)
    assert(hot.count() == 1)
  }

  test("candidatePairs carries carryCols from both sides") {
    val withPayload = blocks.withColumn("sig", $"doc_id" * 100)
    val (pairs, _) = Blocking.candidatePairs(withPayload, "doc_id",
      Seq("bkey"), 10, carryCols = Seq("sig"))
    val row = pairs.filter($"a_id" === 21 && $"b_id" === 22)
      .select("l_sig", "r_sig").as[(Int, Int)].head()
    assert(row == ((2100, 2200)))
  }
}
