package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition-based quality gates (Gopher §A1.1-style repetitious-text
  * filters, token-granularity): per document, the fraction of token
  * mass in the single most frequent unigram / bigram, and the fraction
  * of bigram mass in bigrams that occur more than once. Documents
  * dominated by a few repeated n-grams are boilerplate/spam with high
  * probability and are dropped before training.
  *
  * Scale shape: explode → two keyed partial-aggregating groupBys
  * (id×token, id×bigram) → per-doc rollup → join on the id. Every
  * shuffle keys on the high-cardinality document id — no skew pivot,
  * no corpus-wide state. Fractions are ONE double division of two
  * exact longs, so the numbers (and the threshold flags) are
  * bit-reproducible across engines (oracled as t13). */
object RepetitionGates {

  /** Default thresholds (Gopher-ish, token-granularity). */
  final case class Thresholds(
      topUnigram: Double = 0.30,
      topBigram: Double = 0.18,
      dupBigram: Double = 0.40)

  /** (id, top_uni_frac, top_bi_frac, dup_bi_frac, keep) from a frame
    * with an id column and a tokenized `array<string>` column.
    * Documents with fewer than 2 tokens have no bigrams and are
    * DROPPED (no signal — same stance both engines take when the
    * bigram explode yields nothing). */
  def signals(df: DataFrame, idCol: String, toksCol: String,
      t: Thresholds = Thresholds()): DataFrame = {
    val toks = df.select(col(idCol).as("__id"), col(toksCol).as("ws"))
    val uni = toks
      .select(col("__id"), explode(col("ws")).as("w"))
      .groupBy("__id", "w").agg(count(lit(1)).as("c"))
      .groupBy("__id")
      .agg(max(col("c")).as("top_uni"), sum(col("c")).as("n_uni"))
    val bi = toks
      .select(col("__id"),
        explode(graft.functions.TextOps.shingles(col("ws"), 2)).as("b"))
      .groupBy("__id", "b").agg(count(lit(1)).as("c"))
      .groupBy("__id")
      .agg(max(col("c")).as("top_bi"), sum(col("c")).as("n_bi"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_bi"))
    uni.join(bi, "__id")
      .select(col("__id").as(idCol),
        (col("top_uni").cast("double") / col("n_uni").cast("double"))
          .as("top_uni_frac"),
        (col("top_bi").cast("double") / col("n_bi").cast("double"))
          .as("top_bi_frac"),
        (col("dup_bi").cast("double") / col("n_bi").cast("double"))
          .as("dup_bi_frac"))
      .withColumn("keep",
        (col("top_uni_frac") <= t.topUnigram) &&
          (col("top_bi_frac") <= t.topBigram) &&
          (col("dup_bi_frac") <= t.dupBigram))
  }
}
