package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkEntry}

/** Pins m01's SEMANTICS (the oracle pins cross-engine equality; this
  * pins that the fixture exercises what it claims): at sf0.01 the 20
  * constructed video pairs all land at shared_frac 0.8 — 10 frames,
  * minus the two frame_idx%5==0 frames whose 8-bit perturbation is
  * over the Hamming budget (verify REJECT working) but whose three
  * clean bands still made them candidates (blocking recall working) —
  * and the only other output rows are sub-threshold single-frame
  * band-collision accidents that a shared_frac >= 0.5 cut removes. */
class MultimodalSuiteSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  test("m01: 20 constructed pairs at 0.8; collisions stay sub-threshold") {
    val out = SparkEntry.queries("m01_video_neardup")(spark, dir).cache()
    val strong = out.filter(col("shared_frac") >= 0.5)
      .select("video_a", "video_b", "shared_frac")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(strong.length === 20)
    assert(strong.forall(_._3 === 0.8),
      s"expected 8/10 matched frames per constructed pair: ${strong.toSeq}")
    assert(strong.map(p => (p._1, p._2)).toSeq ===
      (0 until 20).map(g => (f"v${2 * g}%02d", f"v${2 * g + 1}%02d")))
    // accidental band collisions must stay single-frame (0.1): if one
    // ever crosses 0.5 the fixture's mixes stopped separating content
    val weak = out.filter(col("shared_frac") < 0.5)
    assert(weak.agg(max("shared_frac")).head.getDouble(0) <= 0.1)
    out.unpersist()
  }
}
