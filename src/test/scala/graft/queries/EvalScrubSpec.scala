package graft.queries

import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkSpec}

/** Semantics of d15_eval_scrub pinned against a from-scratch local
  * recompute, plus the guarantee the operator exists for: after the
  * scrub, NO train document contains any eval 5-gram. Also pins the
  * fully-scrubbed edge ('' text, n_removed = n_tokens) through the
  * library strip directly, since the fixture only exercises it at
  * larger SFs.
  */
class EvalScrubSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val N = 5
  private val Mod = 23

  private lazy val docs: Map[Long, Array[String]] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap

  private def grams(tk: Array[String]): Seq[String] =
    tk.sliding(N).filter(_.length == N).map(_.mkString(" ")).toSeq

  private lazy val evalGrams: Set[String] =
    docs.filter(_._1 % Mod == 0).values.flatMap(grams).toSet

  private lazy val localScrub: Map[Long, (Long, Long, String)] =
    docs.filter(_._1 % Mod != 0).map { case (id, tk) =>
      val covered = tk.indices.sliding(N).filter(_.length == N)
        .filter(w => evalGrams.contains(w.map(tk).mkString(" ")))
        .flatten.toSet
      val kept = tk.indices.filterNot(covered).map(tk)
      (id, (tk.length.toLong, covered.size.toLong, kept.mkString(" ")))
    }

  test("d15 matches the local recompute (counts and cleaned text)") {
    val rows = SparkEntry.queries("d15_eval_scrub")(spark, dir).collect()
    assert(rows.length === localScrub.size)
    var scrubbed = 0
    rows.foreach { r =>
      val id = r.getLong(0)
      val (n, rem, clean) = localScrub(id)
      assert(r.getLong(1) === n, s"n_tokens for $id")
      assert(r.getLong(2) === rem, s"n_removed for $id")
      assert(r.getString(3) === clean, s"clean_text for $id")
      if (rem > 0) scrubbed += 1
    }
    assert(scrubbed > 0, "the scrub never fired on the fixture")
    assert(scrubbed < rows.length, "the scrub flattened every doc")
  }

  test("decontamination guarantee: no eval 5-gram survives the scrub") {
    val rows = SparkEntry.queries("d15_eval_scrub")(spark, dir).collect()
    rows.foreach { r =>
      val kept = r.getString(3)
      if (kept.nonEmpty) {
        val surviving = grams(kept.split(" ", -1))
          .filter(evalGrams.contains)
        // NOTE: removal can in principle SPLICE two kept fragments
        // into a new eval gram; with N=5 and this corpus it does not
        // happen, and the assertion documents (and would catch) it
        assert(surviving.isEmpty,
          s"doc ${r.getLong(0)} still contains eval grams: $surviving")
      }
    }
  }

  test("full scrub degrades to empty text, not null (library strip)") {
    import spark.implicits._
    val one = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val dict = graft.ops.RepeatedSpans.detect(
      Seq((1L, "a b c d e f"), (2L, "a b c d e f"))
        .toDF("doc_id", "text"), "doc_id", "text", N)
    val out = graft.ops.RepeatedSpans
      .strip(one, dict, "doc_id", "text", N).collect()
    assert(out.length === 1)
    assert(out.head.getString(1) === "")
  }
}
