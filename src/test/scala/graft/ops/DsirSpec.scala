package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkSpec}

/** The fit-once/score-many DSIR model: bit-parity with the c15 oracle
  * query on the same corpus, the unseen-bucket fallback, persistence
  * round-trip, and the incremental contract (scoring a batch never
  * rescans the training corpus — the score plan's only join is the
  * broadcast ratio table).
  */
class DsirModelSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val docs =
    spark.read.parquet(s"$dir/documents.parquet")

  test("fit + score is bit-identical to the c15 single-query form") {
    val model = Dsir.fit(docs, col("lang") === "en")
    val got = Dsir.score(model, docs, Seq("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).sortBy(_._1)
    val want = SparkEntry.queries("c15_dsir_weights")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).sortBy(_._1)
    assert(got.toSeq === want.toSeq)
  }

  test("unseen buckets fall back to the smoothed empty-bucket ratio") {
    // fit on a 3-doc sliver: most of the 256 buckets are unseen, so
    // scoring the full corpus MUST route through the default ratio
    val sliver = docs.filter(col("doc_id") < 3)
    val model = Dsir.fit(sliver, col("lang") === "en")
    val nBuckets = model.ratios.count()
    assert(nBuckets < 256, s"sliver unexpectedly covered all buckets")
    val scored = Dsir.score(model, docs, Seq("doc_id"))
    // exact recompute of one doc containing unseen buckets
    val seen = model.ratios.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sample = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ", -1).sliding(2).filter(_.length == 2)
          .map(bg => graft.functions.TextOps
            .md5Long60Jvm(bg.mkString(" ")) % 256).toSeq)
      .find { case (_, bs) => bs.exists(!seen.contains(_)) }.get
    val want = sample._2
      .map(b => seen.getOrElse(b, model.defaultRatioE6)).sum
    val gotRow = scored.filter(col("doc_id") === sample._1).head()
    assert(gotRow.getLong(2) === want,
      s"fallback-weighted doc ${sample._1}")
  }

  test("persistence round-trip preserves every score") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-dsir").toString
    val model = Dsir.fit(docs, col("lang") === "en")
    Dsir.write(model, tmp)
    val back = Dsir.read(spark, tmp)
    assert(back.buckets === model.buckets)
    assert(back.defaultRatioE6 === model.defaultRatioE6)
    val a = Dsir.score(model, docs, Seq("doc_id")).collect()
      .map(_.toSeq).sortBy(_.toString)
    val b = Dsir.score(back, docs, Seq("doc_id")).collect()
      .map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("scoring a batch is one broadcast join — no corpus rescan") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-dsir-plan").toString
    Dsir.write(Dsir.fit(docs, col("lang") === "en"), tmp)
    val model = Dsir.read(spark, tmp) // model from disk: corpus-free
    val batch = docs.limit(10)
    val df = Dsir.score(model, batch, Seq("doc_id"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // exactly two parquet sources: the batch and the ratio table
    assert("Scan parquet".r.findAllIn(p).size == 2, p)
  }
}
