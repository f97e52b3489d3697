package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Semantics of t18_token_entropy pinned against a local recompute,
  * plus the ordering property the signal exists for: concentrating a
  * doc's token mass lowers its entropy even when the distinct count
  * is unchanged (which uniq_ratio alone cannot see).
  */
class TokenEntropySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def lnE6(x: Long): Long =
    math.floor(math.log(x.toDouble) * 1e6).toLong

  private def entropyE6(tk: Seq[String]): (Long, Long, Long, Long) = {
    val cnt = tk.groupBy(identity).map { case (_, o) => o.size.toLong }
    val n = tk.length.toLong
    val sc = cnt.map(c => c * lnE6(c)).sum
    (n, cnt.size.toLong, lnE6(n) - sc / n, lnE6(cnt.size.toLong))
  }

  private lazy val docs: Map[Long, Seq[String]] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
      .toMap

  test("t18 matches the local recompute exactly") {
    val rows = SparkEntry.queries("t18_token_entropy")(spark, dir)
      .collect()
    assert(rows.length === docs.size)
    var flagged = 0
    rows.foreach { r =>
      val id = r.getLong(0)
      val (n, d, h, hmax) = entropyE6(docs(id))
      assert(r.getLong(1) === n, s"n_tokens for $id")
      assert(r.getLong(2) === d, s"n_distinct for $id")
      assert(r.getLong(3) === h, s"entropy_e6 for $id")
      assert(r.getLong(4) === hmax, s"max_entropy_e6 for $id")
      assert(r.getBoolean(5) === (h * 100 < hmax * 95),
        s"repetitive for $id")
      if (r.getBoolean(5)) flagged += 1
    }
    assert(flagged > 0 && flagged < rows.length,
      s"repetitive flag degenerate: $flagged of ${rows.length}")
  }

  test("concentrating mass lowers entropy at fixed distinct count") {
    // balanced: 4 tokens x 5 each; skewed: same 4 tokens, 17+1+1+1
    val balanced = Seq("a", "b", "c", "d").flatMap(w => Seq.fill(5)(w))
    val skewed = Seq.fill(17)("a") ++ Seq("b", "c", "d")
    val (nB, dB, hB, _) = entropyE6(balanced)
    val (nS, dS, hS, _) = entropyE6(skewed)
    assert(nB === nS && dB === dS) // uniq_ratio identical...
    assert(hS < hB)                // ...but entropy separates them
  }

  test("entropy is bounded by its maximum: h_e6 <= hmax_e6 + 1") {
    // +1 absorbs the floor()'s one-unit quantization asymmetry
    docs.values.foreach { tk =>
      val (_, _, h, hmax) = entropyE6(tk)
      assert(h <= hmax + 1, s"entropy above max: $h > $hmax")
    }
  }
}
