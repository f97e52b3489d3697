package graft.queries

import graft.{SparkEntry, SparkSpec}
import graft.functions.TextOps.md5Long60Jvm

/** Semantics of c15_dsir_weights pinned against a from-scratch local
  * recompute of the hashed-bigram importance weights, plus the
  * property the operator exists for: documents drawn from the target
  * distribution score higher, on average, than the rest of the raw
  * corpus (otherwise importance resampling selects noise).
  */
class DsirSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val B = 256L

  /** doc_id -> (lang, bucket sequence with multiplicity). */
  private lazy val docBuckets: Map[Long, (String, Seq[Long])] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map { r =>
        val ws = r.getString(2).split(" ", -1)
        val buckets = ws.sliding(2).filter(_.length == 2)
          .map(bg => md5Long60Jvm(bg.mkString(" ")) % B).toSeq
        r.getLong(0) -> (r.getString(1), buckets)
      }.toMap

  private lazy val ratioByBucket: Map[Long, Long] = {
    val all = docBuckets.values.flatMap(_._2).toSeq
    val tgt = docBuckets.values.filter(_._1 == "en").flatMap(_._2).toSeq
    val cntR = all.groupBy(identity).map { case (b, o) => b -> o.size }
    val cntT = tgt.groupBy(identity).map { case (b, o) => b -> o.size }
    val (tR, tT) = (all.size.toLong, tgt.size.toLong)
    cntR.map { case (b, cr) =>
      val ct = cntT.getOrElse(b, 0).toLong
      val num = (ct + 1L) * (tR + B)
      val den = (cr + 1L) * (tT + B)
      b -> math.floor(math.log(num.toDouble / den) * 1e6).toLong
    }
  }

  test("c15 matches the local recompute exactly") {
    val rows = SparkEntry.queries("c15_dsir_weights")(spark, dir)
      .collect()
    assert(rows.length === docBuckets.count(_._2._2.nonEmpty))
    rows.foreach { r =>
      val id = r.getLong(0)
      val buckets = docBuckets(id)._2
      val w = buckets.map(ratioByBucket).sum
      assert(r.getLong(1) === buckets.length.toLong, s"n_bigrams for $id")
      assert(r.getLong(2) === w, s"weight_e6 for $id")
      assert(r.getBoolean(3) === (w > 0L), s"selected for $id")
    }
  }

  test("target-distribution docs outscore the rest on average") {
    val rows = SparkEntry.queries("c15_dsir_weights")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val (en, other) = docBuckets.partition(_._2._1 == "en")
    def mean(ids: Iterable[Long]): Double = {
      val ws = ids.flatMap(rows.get).map(_.toDouble)
      ws.sum / ws.size
    }
    val (mEn, mOther) = (mean(en.keys), mean(other.keys))
    assert(mEn > mOther,
      s"DSIR weights do not separate target from raw: en=$mEn other=$mOther")
    // and the selection branch fires both ways on the fixture
    val nSel = rows.values.count(_ > 0L)
    assert(nSel > 0 && nSel < rows.size, s"degenerate selection: $nSel")
  }
}
