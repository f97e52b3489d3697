package graft.vector

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** MMR re-rank semantics: exact greedy parity with a local recompute,
  * λ=1 degenerating to plain relevance order, the diversification
  * property it exists for, and determinism under hostile partitioning.
  */
class MmrSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Stage-1 pools: top-20 by L2 for 4 query vectors, rel = -dist,
    * joined back to candidate vectors (the documented input contract). */
  private lazy val candidates = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>")
        .as("vec"))
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"))
    VectorSearch.knn(emb, "vec_id", "vec", queries, "qid", "qvec", 20)
      .join(emb.withColumnRenamed("vec_id", "id"), Seq("id"))
      .select(col("query_id"), col("id"), col("vec"),
        (-col("dist")).as("rel"))
      .cache()
  }

  private def localMmr(pool: Seq[(Long, Array[Double], Double)], k: Int,
      lambda: Double): Seq[(Long, Int, Double)] = {
    val sorted = pool.sortBy { case (id, _, rel) => (-rel, id) }
    val unit = sorted.map { case (_, v, _) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    var taken = Set.empty[Int]
    var out = Vector.empty[(Long, Int, Double)]
    for (rank <- 1 to math.min(k, sorted.length)) {
      // minBy on (negScore, idx): smallest negScore = largest score,
      // ties -> smallest index = the (rel desc, id) pre-sort order
      val best = sorted.indices.filterNot(taken).minBy { i =>
        (-(lambda * sorted(i)._3 - (1 - lambda) *
          (if (taken.isEmpty) 0.0
           else taken.map(j => dot(unit(i), unit(j))).max)), i)
      }
      taken += best
      val score = lambda * sorted(best)._3 - (1 - lambda) *
        (if (taken.size == 1) 0.0
         else (taken - best).map(j => dot(unit(best), unit(j))).max)
      out :+= ((sorted(best)._1, rank, score))
    }
    out
  }

  private def pools: Map[Long, Seq[(Long, Array[Double], Double)]] =
    candidates.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Double](2).toArray, r.getDouble(3)))
      .groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(t => (t._2, t._3, t._4)).toSeq }

  test("mmrRerank matches the local greedy exactly (ids, ranks, scores)") {
    val got = VectorSearch.mmrRerank(candidates, k = 8, lambda = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .groupBy(_._1)
    pools.foreach { case (q, pool) =>
      val want = localMmr(pool, 8, 0.5)
      val rows = got(q).sortBy(_._3).map(t => (t._2, t._3, t._4))
      assert(rows.map(r => (r._1, r._2)).toSeq ===
        want.map(w => (w._1, w._2)), s"pick order for query $q")
      rows.zip(want).foreach { case ((_, _, s), (_, _, ws)) =>
        assert(math.abs(s - ws) < 1e-12, s"score drift for query $q")
      }
    }
  }

  test("lambda = 1 reduces to plain relevance order") {
    val got = VectorSearch.mmrRerank(candidates, k = 8, lambda = 1.0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1)
    pools.foreach { case (q, pool) =>
      val want = pool.sortBy { case (id, _, rel) => (-rel, id) }
        .take(8).map(_._1)
      assert(got(q).sortBy(_._3).map(_._2).toSeq === want,
        s"lambda=1 order for query $q")
    }
  }

  test("diversification: MMR picks are less self-similar than top-k") {
    def meanPairSim(ids: Seq[Long],
        pool: Map[Long, Array[Double]]): Double = {
      val unit = ids.map(pool).map { v =>
        val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
      }
      val sims = for {
        i <- unit.indices; j <- unit.indices if i < j
      } yield unit(i).zip(unit(j)).map { case (x, y) => x * y }.sum
      sims.sum / sims.size
    }
    val mmr = VectorSearch.mmrRerank(candidates, k = 8, lambda = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    var tighter = 0
    pools.foreach { case (q, pool) =>
      val vecs = pool.map(t => t._1 -> t._2).toMap
      val topk = pool.sortBy { case (id, _, rel) => (-rel, id) }
        .take(8).map(_._1)
      val mmrSim = meanPairSim(mmr(q).map(_._2).toSeq, vecs)
      val topSim = meanPairSim(topk, vecs)
      assert(mmrSim <= topSim + 1e-12, s"MMR increased crowding for $q")
      if (mmrSim < topSim - 1e-12) tighter += 1
    }
    assert(tighter > 0, "MMR never diversified any query's picks")
  }

  test("deterministic under hostile repartitioning") {
    val a = VectorSearch.mmrRerank(candidates, 8, 0.5).collect()
      .map(_.toSeq).sortBy(_.toString)
    val b = VectorSearch.mmrRerank(candidates.repartition(13), 8, 0.5)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq === b.toSeq)
  }
}
