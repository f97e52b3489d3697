package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Semantics of v17_semantic_dedup (the SemDeDup decision operator)
  * pinned against a from-scratch local recompute: assignment, the
  * order-free relaxation's drop rule, and its documented relationship
  * to the paper's sequential greedy.
  */
class SemanticDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val Tau = 0.4

  /** Local quantized vectors (the oracle recipe: round(x*1e6) → long). */
  private lazy val vecs: Map[Long, Array[Long]] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map { r =>
        r.getLong(0) -> r.getSeq[Float](1)
          .map(x => math.round(x.toDouble * 1e6)).toArray
      }.toMap

  private def d2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  private def cos(a: Array[Long], b: Array[Long]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) *
      math.sqrt(b.map(x => x * x).sum.toDouble))
  }

  /** v06/v14/v17's assignment, recomputed: nearest of the 8 seed
    * centroids with (d2, cent_id) tiebreak. */
  private lazy val cellOf: Map[Long, Long] = {
    val cents = (0L until 8L).map(i => i -> vecs(i))
    vecs.map { case (id, v) =>
      id -> cents.map { case (cid, cv) => (d2(v, cv), cid) }.min._2
    }
  }

  private lazy val byCell: Map[Long, Seq[Long]] =
    cellOf.keys.toSeq.sorted.groupBy(cellOf)

  /** The relational relaxation: drop v iff ANY earlier cell-mate is
    * above tau (kept or not). */
  private lazy val relaxedDropped: Set[Long] =
    byCell.values.flatMap { ids =>
      ids.filter(b => ids.exists(a => a < b && cos(vecs(a), vecs(b)) > Tau))
    }.toSet

  /** The paper's sequential greedy: scan ids ascending per cell, drop v
    * iff an already-KEPT earlier item is above tau. */
  private lazy val greedyDropped: Set[Long] =
    byCell.values.flatMap { ids =>
      val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
      val dropped = scala.collection.mutable.ArrayBuffer.empty[Long]
      ids.foreach { v =>
        if (kept.exists(u => cos(vecs(u), vecs(v)) > Tau)) dropped += v
        else kept += v
      }
      dropped
    }.toSet

  private lazy val result: Map[Long, (Long, Boolean)] =
    SparkEntry.queries("v17_semantic_dedup")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap

  test("v17 emits exactly the relaxation's kept set over the recomputed cells") {
    assert(result.keySet === vecs.keySet, "one row per vector")
    result.foreach { case (id, (cell, kept)) =>
      assert(cell === cellOf(id), s"cell mismatch for $id")
      assert(kept === !relaxedDropped(id), s"kept mismatch for $id")
    }
    // the decision branch must actually fire on the fixture
    assert(relaxedDropped.nonEmpty, "threshold drops nothing — degenerate")
    assert(relaxedDropped.size < vecs.size / 2, "threshold drops half+")
  }

  test("the relaxation is at-least-as-aggressive as the sequential greedy") {
    // documented contract: relaxed drops ⊇ greedy drops (a greedy drop
    // has a similar KEPT predecessor, which is in particular an earlier
    // similar cell-mate)
    assert(greedyDropped.subsetOf(relaxedDropped),
      s"greedy dropped ${greedyDropped -- relaxedDropped} that relaxed kept")
  }

  test("each cell's minimum id is always kept") {
    byCell.values.foreach { ids =>
      assert(result(ids.min)._2, s"cell min ${ids.min} was dropped")
    }
  }
}
