package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1L to 400L)
    .map(i => (i, s"lang${i % 5}")).toDF("doc_id", "lang")

  test("hashSplit is a partition of the corpus with stable assignment") {
    val out = Sampling.hashSplit(docs, "doc_id").cache()
    assert(out.count() == 400)
    val bySplit = out.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(bySplit.keySet == Set("train", "validation", "test"))
    assert(bySplit.values.sum == 400)
    // content-addressed: thresholds hold exactly per bucket
    assert(out.filter(col("bucket") >= 80 && col("bucket") < 90 &&
      col("split") =!= "validation").count() == 0)
    // ~80/10/10 within loose tolerance on 400 uniform hashes
    assert(bySplit("train") > 250 && bySplit("train") < 380)
    out.unpersist()
  }

  test("hashSplit assignment is independent of corpus membership") {
    val full = Sampling.hashSplit(docs, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val half = Sampling.hashSplit(docs.filter(col("doc_id") <= 200),
      "doc_id").select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    // dropping rows never moves a surviving row's split (incremental
    // ingest safety) — the property rand()-based splits lack
    half.foreach { case (id, s) => assert(full(id) == s) }
  }

  test("leakageSplit never lets a near-dup cluster straddle splits") {
    // pair graph: {1,2,3} chained, {10,11} — plus 394 singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val out = Sampling.leakageSplit(docs, "doc_id", pairs).cache()
    assert(out.count() == 400) // enrich join drops/duplicates nothing
    // cluster atomicity: one split (and one bucket) per representative
    assert(out.groupBy("rep")
      .agg(countDistinct("split").as("ns"), countDistinct("bucket").as("nb"))
      .filter(col("ns") > 1 || col("nb") > 1).count() == 0)
    // representative = min doc_id of the connected component
    val reps = out.select("doc_id", "rep").as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L).map(reps) == Seq(1L, 1L, 1L))
    assert(Seq(10L, 11L).map(reps) == Seq(10L, 10L))
    // singletons are their own cluster and match the plain hashSplit
    val plain = Sampling.hashSplit(docs, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val guarded = out.select("doc_id", "rep", "split")
      .as[(Long, Long, String)].collect()
    guarded.filter { case (id, rep, _) => id == rep }.foreach {
      case (id, _, s) => assert(plain(id) == s)
    }
    // clustered docs inherit the REPRESENTATIVE's plain assignment
    guarded.filter { case (id, rep, _) => id != rep }.foreach {
      case (_, rep, s) => assert(plain(rep) == s)
    }
    out.unpersist()
  }

  test("capPerKey keeps exactly cap rows per key, scan-order-independent") {
    val capped = Sampling.capPerKey(docs, "lang", "doc_id", 10)
    val perKey = capped.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(perKey.values.forall(_ == 10))
    val reshuffled = Sampling
      .capPerKey(docs.repartition(7, col("doc_id")), "lang", "doc_id", 10)
    assert(capped.select("doc_id").as[Long].collect().sorted.toSeq ==
      reshuffled.select("doc_id").as[Long].collect().sorted.toSeq)
  }
}
