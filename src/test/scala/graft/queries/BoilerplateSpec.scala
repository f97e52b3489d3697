package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Semantics of t16_boilerplate pinned against a from-scratch local
  * recompute: deterministic non-overlapping 2-token segmentation,
  * top-20-by-document-frequency boilerplate set (tiebreak on segment
  * text), and in-order reassembly of the surviving segments.
  */
class BoilerplateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** doc_id -> ordered non-overlapping 2-token segments (odd tail
    * token dropped, exactly like the query's segmentation). */
  private lazy val docSegs: Map[Long, Seq[String]] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map { r =>
        val ws = r.getString(1).split(" ", -1)
        r.getLong(0) -> ws.grouped(2).filter(_.length == 2)
          .map(_.mkString(" ")).toSeq
      }.toMap

  private lazy val boiler: Set[String] = {
    val df = docSegs.toSeq
      .flatMap { case (id, segs) => segs.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (seg, occ) => seg -> occ.size.toLong }
    df.toSeq.sortBy { case (seg, d) => (-d, seg) }.take(20)
      .map(_._1).toSet
  }

  test("t16 matches the local recompute (counts, removals, text)") {
    val rows = SparkEntry.queries("t16_boilerplate")(spark, dir).collect()
    assert(rows.length === docSegs.count(_._2.nonEmpty))
    var removedSomewhere = 0
    var keptSomewhere = 0
    rows.foreach { r =>
      val id = r.getLong(0)
      val segs = docSegs(id)
      val removed = segs.count(boiler.contains).toLong
      assert(r.getLong(1) === segs.length.toLong, s"n_segs for $id")
      assert(r.getLong(2) === removed, s"n_removed for $id")
      val clean = segs.filterNot(boiler.contains).mkString(" ")
      assert(r.getString(3) === clean, s"clean_text for $id")
      if (removed > 0) removedSomewhere += 1
      if (removed < segs.length) keptSomewhere += 1
    }
    // the rank cut must BITE (some removal) without flattening the
    // corpus (some survival) — the reason t16 uses top-K, not a
    // fragile absolute count threshold
    assert(removedSomewhere > 0, "no document lost any segment")
    assert(keptSomewhere > 0, "every segment everywhere was removed")
  }

  test("the boilerplate set is exactly the top-20 rank cut") {
    assert(boiler.size === 20)
    // rank determinism: the 20th and 21st entries differ in (df, seg)
    val df = docSegs.toSeq
      .flatMap { case (id, segs) => segs.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (seg, occ) => seg -> occ.size.toLong }
    val ordered = df.toSeq.sortBy { case (seg, d) => (-d, seg) }
    assert(ordered(19) != ordered(20))
  }
}
