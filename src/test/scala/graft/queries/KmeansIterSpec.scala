package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Semantics of v18_kmeans_iter pinned against a from-scratch local
  * Lloyd round: seed assignment, truncating-division quantized
  * centroid means, 100-scaled reassignment — all exact long
  * arithmetic, so the match is bitwise, not approximate.
  */
class KmeansIterSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val vecs: Map[Long, Array[Long]] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap

  private def d2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  private def argmin(v: Array[Long], cents: Seq[(Long, Array[Long])])
      : Long =
    cents.map { case (id, c) => (d2(v, c), id) }.min._2

  private lazy val local: Map[Long, (Long, Long)] = {
    val cents0 = (0L until 8L).map(i => i -> vecs(i))
    val cell1 = vecs.map { case (id, v) => id -> argmin(v, cents0) }
    val ncent = cell1.groupBy(_._2).map { case (cell, members) =>
      val vs = members.keys.map(vecs).toSeq
      val cnt = vs.size.toLong
      cell -> Array.tabulate(64) { d =>
        100L * vs.map(_(d)).sum / cnt // JVM / truncates like div, //
      }
    }.toSeq.sortBy(_._1)
    vecs.map { case (id, v) =>
      val scaled = v.map(_ * 100L)
      id -> (cell1(id), argmin(scaled, ncent))
    }
  }

  test("v18 matches the local Lloyd round exactly") {
    val rows = SparkEntry.queries("v18_kmeans_iter")(spark, dir)
      .collect()
    assert(rows.length === vecs.size)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (c1, c2) = local(id)
      assert(r.getLong(1) === c1, s"cell1 for $id")
      assert(r.getLong(2) === c2, s"cell2 for $id")
      assert(r.getBoolean(3) === (c1 != c2), s"moved for $id")
    }
  }

  test("the update actually refines: some vectors move, most stay") {
    val moved = local.values.count { case (a, b) => a != b }
    assert(moved > 0, "degenerate: the seed assignment was already a fixpoint")
    assert(moved < vecs.size / 2,
      s"degenerate: the update scrambled ${moved}/${vecs.size} assignments")
  }

  test("every seed stays in its own cell in round 1 (no empty cells)") {
    (0L until 8L).foreach { i =>
      assert(local(i)._1 === i, s"seed $i not in its own cell")
    }
  }
}
