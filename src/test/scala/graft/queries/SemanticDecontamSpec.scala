package graft.queries

import graft.{SparkEntry, SparkSpec}

/** d17_semantic_decontam: the cell-blocked eval-vs-corpus cosine scan
  * must equal the EXACT all-pairs form — the Cauchy–Schwarz cell cap
  * makes the blocking lossless, and this spec is the pin (VERDICT r12
  * item 2: "spec pinning the blocked form equal to the exact all-pairs
  * form on the fixture").
  */
class SemanticDecontamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val Mod = 23
  private val Tau = 0.3

  /** Quantized vectors, the oracle recipe: round(x*1e6) → long. */
  private lazy val vecs: Map[Long, Array[Long]] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map { r =>
        r.getLong(0) -> r.getSeq[Float](1)
          .map(x => math.round(x.toDouble * 1e6)).toArray
      }.toMap

  private def dot(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => x * y }.sum

  private def cos(a: Array[Long], b: Array[Long]): Double =
    dot(a, b).toDouble /
      (math.sqrt(dot(a, a).toDouble) * math.sqrt(dot(b, b).toDouble))

  /** Brute-force all-pairs ground truth, recomputed from scratch. */
  private lazy val exact: Map[(Long, Long), Double] = {
    val evalIds = vecs.keys.filter(_ % Mod == 0)
    val corpIds = vecs.keys.filter(_ % Mod != 0)
    (for {
      e <- evalIds; c <- corpIds
      cs = cos(vecs(c), vecs(e)) if cs >= Tau
    } yield (c, e) -> cs).toMap
  }

  private lazy val result: Map[(Long, Long), Double] =
    SparkEntry.queries("d17_semantic_decontam")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("blocked form equals the exact all-pairs form, pair for pair") {
    assert(result.keySet === exact.keySet,
      s"missing=${(exact.keySet -- result.keySet).take(5)} " +
        s"extra=${(result.keySet -- exact.keySet).take(5)}")
    result.foreach { case (k, v) =>
      assert(v === exact(k), s"cos mismatch for $k")
    }
    // the operator must actually fire on the fixture, non-degenerately
    assert(exact.nonEmpty, "tau flags nothing — degenerate fixture")
    assert(exact.size < vecs.size, "tau flags ~everything — degenerate")
  }

  test("the Cauchy–Schwarz cell cap is sound on the fixture") {
    // recompute assignment + per-cell stats exactly as the plan does,
    // and check every above-tau pair lands in a cell whose cap admits
    // it — the property that licenses the brute-force oracle
    val cents = (0L until 8L).map(i => i -> vecs(i))
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val corp = vecs.keys.filter(_ % Mod != 0)
    val assign = corp.map { id =>
      id -> cents.map { case (cid, cv) => (d2(vecs(id), cv), cid) }.min
    }.toMap // id -> (dc, cell)
    val byCell = assign.groupBy(_._2._2)
    val stats = byCell.map { case (cell, m) =>
      cell -> (m.values.map(_._1).max, // rad2
        m.keys.map(id => dot(vecs(id), vecs(id))).min) // min ss
    }
    for {
      ((c, e), _) <- exact
      (_, cell) = assign(c)
      (rad2, minSs) = stats(cell)
    } {
      val ev = vecs(e)
      val cap = (dot(ev, vecs(cell)).toDouble /
        math.sqrt(dot(ev, ev).toDouble) + math.sqrt(rad2.toDouble)) /
        math.sqrt(minSs.toDouble)
      assert(cap >= Tau - 1e-9,
        s"cap $cap excludes real pair ($c,$e) in cell $cell")
    }
  }
}
