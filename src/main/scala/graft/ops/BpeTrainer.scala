package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training over a corpus (Sennrich et
  * al., "Neural Machine Translation of Rare Words with Subword Units",
  * ACL 2016 — the algorithm behind GPT-2/RoBERTa-style tokenizers).
  * A training-data pipeline that ships corpora to LLM training needs
  * the tokenizer side too: vocabulary induction over the corpus it
  * curates (token-count budgeting in t06/s08 consumes exactly this).
  *
  * Scale split — the part that touches the corpus is distributed, the
  * part that loops is vocabulary-sized:
  *  - the ONLY corpus-scale pass is the word-frequency aggregate (one
  *    explode + one map-side-combined groupBy, any SF);
  *  - BPE's merge loop operates on the word-frequency TABLE (bounded
  *    by `maxVocab`, collected driver-side — the same
  *    justified-bounded-collect class as IVF/PQ training samples), and
  *    each merge touches only words containing the merged pair. This
  *    mirrors how production tokenizers are actually trained: corpus
  *    pass for counts, in-memory loop for merges.
  *
  * Everything is deterministic: frequency ties break on the
  * lexicographically smaller pair, the word table is cut by
  * (count desc, word asc). Retraining on the same corpus reproduces
  * the merge list exactly (spec-pinned under hostile partitioning).
  */
object BpeTrainer {

  /** End-of-word sentinel (a separate symbol, so merges distinguish
    * "est" mid-word from "est " word-final — the Sennrich setup). */
  val Eow = "</w>"

  final case class BpeModel(merges: Seq[(String, String)]) {
    /** rank table in the [[graft.expr.BpeCoder]] key form — the SAME
      * lookup structure the distributed expression compiles, so the
      * driver twin and the executor path can never diverge. */
    @transient lazy val ranks: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      merges.zipWithIndex.foreach { case ((a, b), i) =>
        m.put(graft.expr.BpeCoder.key(a, b), i)
      }
      m
    }

    /** Greedy BPE encode of ONE word (no whitespace) — delegates to
      * the shared coder. Last symbol is Eow-terminated. */
    def encodeWord(word: String): Seq[String] =
      graft.expr.BpeCoder.encodeWord(word, ranks)

    /** Whitespace-split text → concatenated subword streams. */
    def encodeText(text: String): Seq[String] =
      graft.expr.BpeCoder.encodeText(text, ranks)

    /** Distributed encode column via the `graft_bpe_encode` expression:
      * the merge list rides as a plan LITERAL (the PqAdcLit pattern),
      * materialized once into the rank map the generated code calls —
      * one corpus pass, no shuffle, no UDF. */
    def encodeCol(text: Column): Column =
      call_function("graft_bpe_encode", text,
        typedLit(merges.map(p => Seq(p._1, p._2))))
  }

  /** The distributed corpus pass: whitespace word frequencies, cut to
    * the `maxVocab` most frequent words (count desc, word asc — a
    * bounded TakeOrdered, not a global sort). */
  def wordCounts(docs: DataFrame, textCol: String,
      maxVocab: Int): Seq[(String, Long)] =
    docs.select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq

  /** Learn `nMerges` BPE merges from the corpus. */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
      maxVocab: Int = 50000): BpeModel = {
    val vocab = wordCounts(docs, textCol, maxVocab)
    // word → (symbol sequence, frequency); the in-memory merge table
    var words: Array[(Array[String], Long)] = vocab.map { case (w, n) =>
      ((w.map(_.toString) :+ Eow).toArray, n)
    }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var m = 0
    while (m < nMerges) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) m = nMerges
      else {
        // deterministic argmax: highest count, then lexicographically
        // smallest pair
        val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        words = words.map { case (syms, n) =>
          if (syms.length < 2) (syms, n)
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 &&
                  syms(i + 1) == best._2) {
                out += joined
                i += 2
              } else {
                out += syms(i)
                i += 1
              }
            }
            (out.toArray, n)
          }
        }
        m += 1
      }
    }
    BpeModel(merges.toSeq)
  }
}
