package graft.ops

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def words(n: Int, seed: Int): Seq[String] =
    (0 until n).map(j => s"tk${(seed * 31 + j * 7) % 997}_$j")

  test("content-defined chunks realign after a prefix edit") {
    val base = words(200, 1).mkString(" ")
    // insert ONE token at the front — every fixed-stride chunk after
    // position 0 changes; content-defined chunks must re-synchronize
    val edited = ("zzz_inserted " + base)
    val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val chunks = Chunking.cdcChunks(docs)
      .select("doc_id", "chunk_hash").as[(Long, String)].collect()
    val h1 = chunks.filter(_._1 == 1L).map(_._2).toSet
    val h2 = chunks.filter(_._1 == 2L).map(_._2).toSet
    val shared = h1.intersect(h2)
    // everything after the first post-edit boundary is identical
    // content, so most chunks must match by hash
    assert(shared.size >= (h1.size * 6) / 10,
      s"only ${shared.size} of ${h1.size} chunks realigned")
    // while the documents themselves differ
    assert(h1 != h2)
  }

  test("chunks partition the token axis exactly") {
    val docs = Seq((1L, words(150, 5).mkString(" "))).toDF("doc_id", "text")
    val out = Chunking.cdcChunks(docs)
      .select("chunk", "n_tokens").as[(Long, Long)].collect()
    assert(out.map(_._2).sum == 150)
    // ordinals are dense from 0
    assert(out.map(_._1).sorted.toSeq == (0L until out.length).toSeq)
  }

  test("expected chunk length tracks the modulus") {
    val docs = Seq((1L, words(2000, 9).mkString(" "))).toDF("doc_id", "text")
    val n = Chunking.cdcChunks(docs, mod = 16).count()
    // 2000 tokens / mod 16 → ~125 chunks; allow wide tolerance
    assert(n > 40 && n < 400, s"chunk count $n")
  }
}
