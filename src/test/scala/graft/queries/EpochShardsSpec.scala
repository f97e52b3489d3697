package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Semantics of c14_epoch_shards pinned against a from-scratch local
  * recompute (seeded md5 shuffle order, exclusive token prefix sum,
  * `(8·cum) div total` shard cut), plus the two properties the cut
  * formula guarantees by construction: shard ids are contiguous along
  * the shuffled order, and per-shard token mass is balanced to within
  * one maximum document.
  */
class EpochShardsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** (doc_id, shuffle_key, n_tokens, cum_before, shard) in key order. */
  private lazy val expected: Seq[(Long, String, Long, Long, Long)] = {
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map { r =>
        val id = r.getLong(0)
        (id, md5hex(s"epoch-1:$id"),
          r.getString(1).split(" ", -1).length.toLong)
      }.sortBy(_._2)
    val total = base.map(_._3).sum
    var cum = 0L
    base.map { case (id, key, n) =>
      val before = cum; cum += n
      (id, key, n, before, 8L * before / total)
    }
  }

  test("c14 matches the local recompute exactly") {
    val rows = SparkEntry.queries("c14_epoch_shards")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(_._2)
    assert(rows.toSeq === expected)
  }

  test("shards are contiguous in shuffle order and token-balanced") {
    val shards = expected.map(_._5)
    assert(shards.zip(shards.tail).forall { case (a, b) => a <= b },
      "shard ids must be nondecreasing along the shuffled order")
    assert(shards.head === 0L && shards.last === 7L,
      "the cut must span all 8 shards on this fixture")
    val total = expected.map(_._3).sum
    val maxDoc = expected.map(_._3).max
    val perShard = expected.groupBy(_._5).map(_._2.map(_._3).sum)
    // contiguous cut at (8·cum) div total: a shard's token mass can
    // exceed the ideal total/8 only by part of one straddling document
    assert(perShard.max <= total / 8 + maxDoc,
      s"shard imbalance beyond one document: ${perShard.toSeq.sorted}")
  }

  test("the shuffle is seeded, not random: stable across evaluations") {
    val a = SparkEntry.queries("c14_epoch_shards")(spark, dir)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    val b = SparkEntry.queries("c14_epoch_shards")(spark, dir)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(a.toSeq === b.toSeq)
  }
}
