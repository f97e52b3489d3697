package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Semantics of c16_quality_calibration pinned against a local
  * recompute, plus the two properties that define an exact percentile
  * cutoff: every source keeps at least ceil(0.3·n) docs, and raising
  * the cutoff by one tie class would drop it below that floor.
  */
class QualityCalibrationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** source -> (doc_id, score) list. */
  private lazy val scored: Map[String, Seq[(Long, Long)]] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map { r =>
        val ws = r.getString(2).split(" ", -1)
        (r.getString(1),
          (r.getLong(0), 1000000L * ws.distinct.length / ws.length))
      }.toSeq.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2) }

  private lazy val cutoffs: Map[String, Long] =
    scored.map { case (src, docs) =>
      val k = (3 * docs.size + 9) / 10
      val desc = docs.map(_._2).sorted(Ordering[Long].reverse)
      src -> desc(k - 1) // k-th ranked score = the exact 70th-pct cut
    }

  test("c16 matches the local recompute (scores, cutoffs, kept)") {
    val rows = SparkEntry.queries("c16_quality_calibration")(spark, dir)
      .collect()
    assert(rows.length === scored.values.map(_.size).sum)
    rows.foreach { r =>
      val (id, src, score, cutoff, kept) = (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getBoolean(4))
      val want = scored(src).find(_._1 == id).get._2
      assert(score === want, s"score for $id")
      assert(cutoff === cutoffs(src), s"cutoff for $src")
      assert(kept === (score >= cutoff), s"kept for $id")
    }
  }

  test("the cutoff is the exact per-source percentile") {
    scored.foreach { case (src, docs) =>
      val k = (3 * docs.size + 9) / 10
      val cut = cutoffs(src)
      val keptN = docs.count(_._2 >= cut)
      val strictN = docs.count(_._2 > cut)
      assert(keptN >= k, s"$src keeps $keptN < floor $k")
      assert(strictN < k,
        s"$src: raising the cutoff past its tie class would still keep >= $k")
      // and the gate must BITE: something is dropped per source
      assert(keptN < docs.size, s"$src gate dropped nothing")
    }
  }

  test("plan: the percentile window runs over the histogram; the " +
      "kept decision is a broadcast join") {
    val df = SparkEntry.queries("c16_quality_calibration")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Window".r.findAllIn(p).size == 1, p)
    assert(p.contains("BroadcastHashJoin"), p)
  }
}
