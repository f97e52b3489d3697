package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The curation staleness alarm wired to the refresh action
  * ([[CorpusCuration.maybeRefresh]] — the dictionary twin of
  * VectorDedupIndex.maybeRefit's drifted-stream/no-op/restored-parity
  * spec): a slice carrying a NEW template trips the coverage-decay
  * signal and the re-fit dictionary then covers it; a same-template
  * slice is a no-op returning the standing indexes untouched; a
  * length-shifted slice trips the TVD signal on its own. */
class MaybeRefreshSpec extends SparkSpec {
  import spark.implicits._

  // topK=2 so a refresh has ROOM to admit the new template beside the
  // old one (with topK=1 the corpus-dominant header would keep the
  // top slot and the re-fit, while correct, would be invisible here)
  private val cfg = CorpusCuration.Config(boilerplateTopK = 2)
  private val H = "promo header" // standing 2-token boilerplate
  private val H2 = "strip block" // the drifted slice's new template
  // same char length as H on purpose: the decay scenario must trip on
  // COVERAGE, with the length-TVD signal quiet

  private def corpus: DataFrame = Seq(
    (0L, s"$H alpha beta gamma delta epsilon zeta"),
    (1L, s"$H eta theta iota kappa lambda mu"),
    (2L, s"$H nu xi omicron pi rho sigma"),
    (3L, s"$H tau upsilon phi chi psi omega"),
    (4L, s"$H aa bb cc dd ee ff")
  ).toDF("doc_id", "text")

  private def fitStanding(): CorpusCuration.Indexes = {
    val curated = CorpusCuration.curate(corpus,
      "doc_id", "text", evalDocs = None, cfg = cfg)
    val idx = CorpusCuration.fitIndexes(corpus, curated.corpus,
      "doc_id", "text", cfg = cfg)
    curated.release()
    idx
  }

  private def segs(dict: DataFrame): Set[String] =
    dict.select("segment").as[String].collect().toSet

  test("same-template slice is a no-op: standing indexes pass through") {
    val idx = fitStanding()
    val slice = Seq( // bodies token-length-matched to the corpus's
      (100L, s"$H gamme betan omikr rhota sigta zetan"),
      (101L, s"$H kapel lamda thets iotan upsln nuxin")
    ).toDF("doc_id", "text")
    val r = CorpusCuration.maybeRefresh(
      corpus.unionByName(slice), slice, idx, "doc_id", "text", cfg = cfg)
    assert(!r.refreshed)
    assert(r.indexes eq idx, "no-op must return the standing object")
    // coverage on the slice tracks the corpus (same header fraction;
    // the tie-broken second top-K segment adds small jitter)
    assert(math.abs(r.stripRateRef - r.stripRateCur) < 0.15,
      s"${r.stripRateRef} vs ${r.stripRateCur}")
    assert(r.lengthTvd.exists(_ < 0.25), r.lengthTvd.toString)
  }

  test("new-template slice trips coverage decay; re-fit dictionary " +
      "covers the new template for future slices") {
    val idx = fitStanding()
    assert(segs(idx.boilerplate).contains(H))
    val slice = Seq( // H2 everywhere, H nowhere — same doc lengths
      (100L, s"$H2 gg hh ii jj kk ll"),
      (101L, s"$H2 mm nn oo pp qq rr"),
      (102L, s"$H2 ss tt uu vv ww xx")
    ).toDF("doc_id", "text")
    val accumulated = corpus.unionByName(slice)
    val r = CorpusCuration.maybeRefresh(
      accumulated, slice, idx, "doc_id", "text", cfg = cfg)
    // the standing dictionary strips ~nothing from the slice
    assert(r.stripRateCur < r.stripRateRef * 0.5,
      s"${r.stripRateCur} vs ref ${r.stripRateRef}")
    // ...and the length signal stayed quiet: coverage was the tripper
    assert(r.lengthTvd.exists(_ < 0.25), r.lengthTvd.toString)
    assert(r.refreshed)
    // re-fit ≡ fitIndexes on the accumulated corpus (the refresh
    // byte-equality contract), and the new template is now covered
    val refit = segs(r.indexes.boilerplate)
    assert(refit.contains(H2), refit.toString)
    val batch = graft.ops.Boilerplate.topSegments(
      accumulated.filter(col("doc_id") >= 0), "doc_id", "text",
      cfg.boilerplateSegTokens, cfg.boilerplateTopK)
    // compare through the same gate path refreshIndexes uses
    val batchViaRefresh = CorpusCuration.refreshIndexes(
      accumulated, idx, "doc_id", "text", cfg = cfg)
    assert(refit == segs(batchViaRefresh.boilerplate))
    // the alarm's point: a next slice with the SAME new template now
    // strips clean through curateIncremental against r.indexes
    val next = Seq((200L, s"$H2 yy zz a1 b2 c3 d4"))
      .toDF("doc_id", "text")
    val inc = CorpusCuration.curateIncremental(
      next, r.indexes, "doc_id", "text", cfg)
    val kept = inc.curated.select("text").as[String].collect()
    assert(kept.nonEmpty && kept.forall(!_.contains(H2)),
      kept.mkString("|"))
    assert(batch.count() >= 0) // dictionary frame remains computable
  }

  test("length-shifted slice trips the TVD signal alone") {
    val idx = fitStanding()
    val longBody = Seq.tabulate(60)(i => s"w$i").mkString(" ")
    val slice = Seq( // same header (coverage healthy), 8x the length
      (100L, s"$H $longBody"),
      (101L, s"$H $longBody x1")
    ).toDF("doc_id", "text")
    val r = CorpusCuration.maybeRefresh(
      corpus.unionByName(slice), slice, idx, "doc_id", "text",
      // decay disabled-by-threshold: isolate the TVD tripper
      decayRatio = 0.001, cfg = cfg)
    assert(r.lengthTvd.exists(_ > 0.25), r.lengthTvd.toString)
    assert(r.refreshed)
  }

  test("saturated length instrument surfaces as clamped_frac, never " +
      "as a silent quiet tvd") {
    val idx = fitStanding()
    // docs beyond the histogram's sight: > (maxBucket+1)*width = 4096
    // chars at the defaults. Both slice docs clamp; the corpus doesn't.
    val huge = "x" * 5000
    val slice = Seq((100L, s"$H $huge"), (101L, s"$H $huge y"))
      .toDF("doc_id", "text")
    val r = CorpusCuration.maybeRefresh(
      corpus.unionByName(slice), slice, idx, "doc_id", "text",
      decayRatio = 0.001, cfg = cfg)
    // ref = accumulated = corpus + slice: exactly the slice's 2 of 7
    // docs clamp there; the slice itself is fully past the histogram
    assert(r.lengthClampedRef.contains(2.0 / 7.0),
      r.lengthClampedRef.toString)
    assert(r.lengthClampedCur.contains(1.0), r.lengthClampedCur.toString)
    // here the shift is still visible (corpus mass is far below the
    // top bucket), but had the corpus ALSO sat past 4 KB the tvd would
    // read ~0 — the clamp columns are what makes that case readable
    assert(r.lengthTvd.exists(_ > 0.25))
  }

  test("empty slice is a degenerate no-op and guards reject bad args") {
    val idx = fitStanding()
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val r = CorpusCuration.maybeRefresh(
      corpus, empty, idx, "doc_id", "text", cfg = cfg)
    assert(!r.refreshed && r.lengthTvd.isEmpty && r.stripRateCur == 0.0)
    assert(r.indexes eq idx)
    intercept[IllegalArgumentException] {
      CorpusCuration.maybeRefresh(corpus, empty, idx, "doc_id", "text",
        decayRatio = 1.5, cfg = cfg)
    }
    intercept[IllegalArgumentException] {
      CorpusCuration.maybeRefresh(corpus, empty, idx, "doc_id", "text",
        sampleFraction = 0.0, cfg = cfg)
    }
  }
}
