package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Semantics of t17_polyglot pinned against a from-scratch local
  * recompute: 5-token segmentation, marker-lexicon argmax per segment
  * (count-desc/lang-asc tiebreak), majority language per document and
  * the exact mixture ratio.
  */
class PolyglotSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val markers: Map[String, String] = Seq(
    "en" -> Seq("the", "a", "fast", "small"),
    "es" -> Seq("data", "table", "row", "join"),
    "de" -> Seq("hash", "stream", "batch", "group"),
    "fr" -> Seq("query", "merge", "sort", "filter"),
    "zh" -> Seq("spark", "vector", "window", "scan"))
    .flatMap { case (l, ws) => ws.map(_ -> l) }.toMap

  /** doc_id -> (n_segs, major_lang, n_major) over language-bearing
    * segments only. */
  private lazy val local: Map[Long, (Long, String, Long)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .flatMap { r =>
        val ws = r.getString(1).split(" ", -1)
        val segLangs = ws.grouped(5).filter(_.length == 5).toSeq
          .flatMap { seg =>
            val votes = seg.flatMap(markers.get)
              .groupBy(identity).map { case (l, o) => (l, o.size) }
            if (votes.isEmpty) None
            else Some(votes.toSeq.minBy { case (l, c) => (-c, l) }._1)
          }
        if (segLangs.isEmpty) None
        else {
          val byLang = segLangs.groupBy(identity)
            .map { case (l, o) => (l, o.size.toLong) }
          val (major, nMajor) =
            byLang.toSeq.minBy { case (l, c) => (-c, l) }
          Some(r.getLong(0) -> ((segLangs.size.toLong, major, nMajor)))
        }
      }.toMap

  test("t17 matches the local recompute exactly") {
    val rows = SparkEntry.queries("t17_polyglot")(spark, dir).collect()
    assert(rows.length === local.size)
    var poly = 0
    rows.foreach { r =>
      val id = r.getLong(0)
      val (n, major, nMajor) = local(id)
      assert(r.getLong(1) === n, s"n_segs for $id")
      assert(r.getString(2) === major, s"major_lang for $id")
      assert(r.getLong(3) === nMajor, s"n_major for $id")
      val mix = 1000000L * (n - nMajor) / n
      assert(r.getLong(4) === mix, s"mix_ratio_e6 for $id")
      assert(r.getBoolean(5) === (mix > 500000L), s"polyglot for $id")
      if (mix > 500000L) poly += 1
    }
    assert(poly > 0 && poly < rows.length,
      s"polyglot flag degenerate: $poly of ${rows.length}")
  }

  test("the majority share bound holds: n_major in [ceil(n/langs), n]") {
    local.values.foreach { case (n, _, nMajor) =>
      assert(nMajor >= (n + 4) / 5 && nMajor <= n)
    }
  }
}
