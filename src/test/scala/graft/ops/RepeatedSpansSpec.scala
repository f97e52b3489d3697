package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RepeatedSpansSpec extends SparkSpec {
  import spark.implicits._

  private def uniq(seed: Int, len: Int): String =
    (0 until len).map(j => s"u${seed}_$j").mkString(" ")

  // a 5-token span duplicated verbatim across docs 1 and 2; doc 3 is
  // fully unique; doc 4 repeats the span twice internally
  private val span = "the quick brown fox jumps"
  private lazy val docs = Seq(
    (1L, s"${uniq(1, 6)} $span ${uniq(11, 6)}"),
    (2L, s"${uniq(2, 6)} $span ${uniq(12, 6)}"),
    (3L, uniq(3, 20)),
    (4L, s"$span ${uniq(4, 6)} $span")
  ).toDF("doc_id", "text")

  test("detect finds exactly the cross-doc spans, counting occurrences") {
    val dict = RepeatedSpans.detect(docs, "doc_id", "text", n = 5)
    val rows = dict.collect()
    // the duplicated literal span hash must be present with 3 docs /
    // 4 occurrences (docs 1, 2, and twice in 4)
    val h = graft.functions.TextOps.md5Long60(lit(span))
    val spanHash = docs.sparkSession.range(1).select(h).head().getLong(0)
    val hit = rows.find(_.getLong(0) == spanHash)
    assert(hit.isDefined, s"span hash missing from ${rows.length} rows")
    assert(hit.get.getLong(1) == 3 && hit.get.getLong(2) == 4, hit.get)
    // doc 3's content must contribute nothing
    val d3 = RepeatedSpans.detect(docs.filter($"doc_id" === 3L),
      "doc_id", "text", n = 5)
    assert(d3.count() == 0)
  }

  test("strip removes every occurrence of flagged spans, keeps the rest") {
    val dict = RepeatedSpans.detect(docs, "doc_id", "text", n = 5)
    val out = RepeatedSpans.strip(docs, dict, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // no cleaned doc contains the memorized span
    assert(out.values.forall(!_.contains(span)), out)
    // the unique doc is untouched
    assert(out(3L) == uniq(3, 20))
    // unique context around the span survives (docs 1/2 keep their
    // prefix+suffix; only 5-gram-covered tokens drop)
    assert(out(1L).contains("u1_0") && out(1L).contains("u11_5"), out(1L))
    // re-detecting on the cleaned corpus finds nothing — the pass
    // converges in one step for verbatim duplicates
    val again = RepeatedSpans.detect(
      out.toSeq.toDF("doc_id", "text"), "doc_id", "text", n = 5)
    assert(again.count() == 0, "strip left repeated spans behind")
  }
}
