package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Semantics of d16_containment pinned against a local recompute over
  * the SAME candidate pairs d03 emits, plus the property that
  * motivates the operator: the asymmetric flag catches pairs the
  * symmetric Jaccard-0.8 cut (d04) provably misses.
  */
class ContainmentSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val wordSets: Map[Long, Set[String]] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSet)
      .toMap

  private lazy val rows =
    SparkEntry.queries("d16_containment")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))

  test("d16 matches the set-arithmetic recompute on every candidate") {
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, ni, na, nb, cab, cba, flag) =>
      val (wa, wb) = (wordSets(a), wordSets(b))
      assert(na === wa.size.toLong && nb === wb.size.toLong)
      val inter = (wa intersect wb).size.toLong
      assert(ni === inter, s"intersection for ($a,$b)")
      assert(cab === 1000000L * inter / na, s"c_ab for ($a,$b)")
      assert(cba === 1000000L * inter / nb, s"c_ba for ($a,$b)")
      val jac80 = 10 * inter >= 8 * (na + nb - inter)
      assert(flag === (math.max(cab, cba) >= 800000L && !jac80),
        s"flag for ($a,$b)")
    }
  }

  test("the candidate set is exactly d03's (same generator)") {
    val d03 = SparkEntry.queries("d03_lsh_candidates")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(r => (r._1, r._2)).toSet === d03)
  }

  test("containment dominates Jaccard: c_max >= jaccard on every pair") {
    rows.foreach { case (_, _, ni, na, nb, cab, cba, _) =>
      // |A∩B|/min(|A|,|B|) >= |A∩B|/|A∪B| always; in e6 fixed point
      // the floor costs at most one unit
      val jacE6 = 1000000L * ni / (na + nb - ni)
      assert(math.max(cab, cba) + 1 >= jacE6)
    }
  }
}
