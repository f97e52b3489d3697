package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Semantics of t15_lm_novelty pinned against a from-scratch local
  * recompute, plus the scale-free property that motivated the
  * below-corpus-mean rarity cut (an absolute count cut saturates as
  * the corpus grows; the mean cut cannot — it always splits the
  * vocabulary unless every bigram count is identical).
  */
class LmNoveltySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val docBigrams: Map[Long, Seq[String]] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map { r =>
        val ws = r.getString(1).split(" ", -1)
        r.getLong(0) -> ws.sliding(2).filter(_.length == 2)
          .map(_.mkString(" ")).toSeq
      }.toMap

  private lazy val lm: Map[String, Long] =
    docBigrams.values.flatten.groupBy(identity)
      .map { case (b, occ) => b -> occ.size.toLong }

  test("t15 matches the local recompute exactly (counts, div, flag)") {
    val total = lm.values.sum
    val distinct = lm.size.toLong
    val rows = SparkEntry.queries("t15_lm_novelty")(spark, dir).collect()
    assert(rows.length === docBigrams.count(_._2.nonEmpty))
    var flaggedSeen = 0
    rows.foreach { r =>
      val id = r.getLong(0)
      val bgs = docBigrams(id)
      val nRare = bgs.count(b => lm(b) * distinct < total).toLong
      assert(r.getLong(1) === bgs.length.toLong, s"n_bigrams for $id")
      assert(r.getLong(2) === nRare, s"n_rare for $id")
      val novelty = 1000000L * nRare / bgs.length
      assert(r.getLong(3) === novelty, s"novelty_e6 for $id")
      assert(r.getBoolean(4) === (novelty > 500000L), s"flagged for $id")
      if (r.getBoolean(4)) flaggedSeen += 1
    }
    // both branches must fire on the fixture
    assert(flaggedSeen > 0 && flaggedSeen < rows.length,
      s"flag is degenerate: $flaggedSeen of ${rows.length}")
  }

  test("the mean cut splits the vocabulary (the scale-free guarantee)") {
    val total = lm.values.sum
    val distinct = lm.size.toLong
    val rare = lm.values.count(c => c * distinct < total)
    // by the mean inequality this can only fail if EVERY count is equal
    assert(rare > 0 && rare < lm.size,
      s"mean cut degenerate: $rare rare of ${lm.size}")
    // while the absolute cut t15 deliberately avoids IS degenerate on
    // the larger fixtures (measured: min corpus count at sf0.1 is 3) —
    // here just record that the chosen cut differs from cnt<2 for some
    // bigram, i.e. the recast is not vacuously the same rule
    assert(lm.values.exists(c => (c < 2) != (c * distinct < total)))
  }
}
