package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps.{shingles, tokens}

/** Cross-document boilerplate removal (the library form of oracle
  * query t16 — the CCNet/RefinedWeb line-dedup stage): segments
  * repeated verbatim across many documents (headers, footers, nav
  * chrome) are identified by distinct-document frequency and removed
  * BEFORE any quality scoring, since boilerplate inflates every
  * downstream statistic. Granule: non-overlapping `segTokens`-token
  * segments (the deterministic proxy for lines on unstructured text;
  * the trailing partial segment is never considered boilerplate).
  *
  * Scale shape: segmentation is map-side; the doc-frequency table is
  * one partial-combining groupBy; the top-K cut is a
  * TakeOrderedAndProject (K rows cross the exchange, never the
  * table); removal is a K-row broadcast join + per-doc sort_array
  * reassembly — no window, no global sort, nothing driver-side.
  */
object Boilerplate {

  private def segments(docs: DataFrame, idCol: String, textCol: String,
      segTokens: Int): DataFrame =
    docs.select(col(idCol),
        posexplode(shingles(tokens(col(textCol)), segTokens)))
      .filter(col("pos") % segTokens === 0)
      .select(col(idCol),
        expr(s"CAST(pos div $segTokens AS BIGINT)").as("seg_idx"),
        col("col").as("segment"))

  /** The top-K segments by distinct-document frequency (ties broken
    * on segment text) — the "boilerplate list" a production cleaner
    * is configured with. */
  def topSegments(docs: DataFrame, idCol: String, textCol: String,
      segTokens: Int = 2, topK: Int = 20): DataFrame =
    segments(docs, idCol, textCol, segTokens)
      .groupBy("segment")
      .agg(countDistinct(col(idCol)).as("dfd"))
      .orderBy(col("dfd").desc, col("segment")).limit(topK)

  /** Remove every occurrence of the top-K boilerplate segments from
    * every document, reassembling the survivors in original order.
    * Output: (idCol, textCol cleaned — '' when everything was
    * boilerplate). The trailing partial segment is dropped from the
    * reassembly, identically to the t16 oracle semantics. */
  def strip(docs: DataFrame, idCol: String, textCol: String,
      segTokens: Int = 2, topK: Int = 20): DataFrame =
    stripWith(docs,
      topSegments(docs, idCol, textCol, segTokens, topK),
      idCol, textCol, segTokens)

  /** [[strip]] against a FIXED boilerplate list (`boiler`: one
    * `segment` column) instead of one recomputed from `docs` — the
    * incremental form: a nightly slice strips against the standing
    * corpus's dictionary without touching the corpus
    * ([[graft.etl.CorpusCuration.curateIncremental]]). Also the
    * production shape when the cleaner is configured with an audited
    * boilerplate list rather than a per-run one. */
  def stripWith(docs: DataFrame, boiler: DataFrame, idCol: String,
      textCol: String, segTokens: Int = 2): DataFrame = {
    val boilerFlag = boiler
      .select(col("segment"), lit(true).as("__boiler"))
    val cleaned = segments(docs, idCol, textCol, segTokens)
      .join(broadcast(boilerFlag), Seq("segment"), "left")
      .groupBy(idCol)
      .agg(concat_ws(" ",
        transform(
          sort_array(collect_list(when(col("__boiler").isNull,
            struct(col("seg_idx"), col("segment"))))),
          x => x("segment"))).as(textCol))
    // docs shorter than one segment produce no segment rows — emit
    // them directly as '' so they don't vanish from the output (the
    // t16 oracle only EMITS segmented docs, so parity on segmented
    // docs is unchanged). r18: this used to be a corpus-wide
    // left-join-back on the id (one more scan feeding a full id
    // Exchange); a doc yields segment rows iff size(tokens) >=
    // segTokens (the pos-0 shingle exists), so the union below adds
    // exactly the rows the old join's coalesce('') repaired — same
    // output, one less corpus join (coalesce(-1) keeps a NULL text on
    // the '' path, as the old join-back did).
    val short = docs
      .filter(coalesce(size(tokens(col(textCol))), lit(-1)) < segTokens)
      .select(col(idCol), lit("").as(textCol))
    cleaned.select(col(idCol), col(textCol)).unionByName(short)
  }
}
