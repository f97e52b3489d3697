package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextOps.md5Long60

/** Deterministic sampling / splitting for training-data curation
  * (north-star family: every corpus feeding a training run needs a
  * reproducible train/validation/test split and per-domain caps).
  *
  * All assignment is content-addressed — a pure function of the row's
  * key via the cross-engine md5 hash, never `rand()` — so
  *  - re-running the pipeline (or adding executors) never moves a row
  *    across splits;
  *  - new rows join a split without reshuffling old ones (critical for
  *    incremental 100 TB ingest: yesterday's test docs stay test docs);
  *  - DuckDB reproduces the assignment bit-for-bit (hashSplit's
  *    aggregate form is oracled as s07; capPerKey row-level as c01).
  *
  * Everything is a pure projection or a per-key window — no global
  * shuffle beyond the window's own hash partitioning on the cap key.
  */
object Sampling {

  /** 0..99 bucket of a key column: md5-hash, mod 100. Pure projection
    * (codegen md5, no shuffle); uniform because md5's low bits are. */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    md5Long60(key) % buckets

  /** Named split from hash-bucket thresholds: [0,trainPct) → "train",
    * [trainPct,trainPct+valPct) → "validation", rest → "test". */
  def splitName(bucket: Column, trainPct: Int = 80, valPct: Int = 10)
      : Column =
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "validation")
      .otherwise("test")

  /** Deterministic train/val/test assignment by key. */
  def hashSplit(df: DataFrame, keyCol: String, trainPct: Int = 80,
      valPct: Int = 10): DataFrame = {
    val b = hashBucket(col(keyCol)).cast("long")
    df.withColumn("bucket", b)
      .withColumn("split", splitName(col("bucket"), trainPct, valPct))
  }

  /** Leakage-guarded train/val/test split: hash-split on the near-dup
    * CLUSTER representative instead of the row key, so a near-duplicate
    * of a training document can never land in validation or test — the
    * leakage a plain per-row [[hashSplit]] cannot prevent (two docs
    * that differ by one word hash to unrelated buckets). `pairs` is
    * the VERIFIED near-dup pair graph (e.g. LSH candidates → Jaccard
    * verify, the d03→d04 pipeline); rows absent from it are singleton
    * clusters (representative = own key). Output adds `rep` (the
    * cluster representative: min key in the connected component),
    * `bucket`, and `split`; whole clusters land in one split by
    * construction since the bucket is a pure function of `rep`.
    *
    * Scale (100 TB): the component frame is bounded by the docs that
    * appear in verified pairs — verifier OUTPUT, orders of magnitude
    * smaller than the corpus — so the enrich join BROADCASTS it and
    * the corpus never shuffles; the bucket is a codegen md5 projection.
    * The hint is explicit, not left to AQE: without it Catalyst's
    * initial plan is a SortMergeJoin whose ENSURE_REQUIREMENTS
    * exchange materializes a full corpus shuffle write before AQE
    * rescues the probe side with a local read (measured in PlanSpec) —
    * a 100 TB disk pass for nothing. For the pathological corpus whose
    * clustered fraction itself exceeds executor memory, pass
    * `hintBroadcast = false` to fall back to the (then genuinely
    * necessary) shuffle join. Keys and split assignment stay
    * content-addressed, so incremental ingest keeps yesterday's test
    * clusters in test (new pair evidence can merge clusters and move a
    * MERGED cluster — the correct behavior: the alternative is leaking
    * the newly-discovered dup). */
  def leakageSplit(df: DataFrame, keyCol: String, pairs: DataFrame,
      aCol: String = "a_id", bCol: String = "b_id",
      trainPct: Int = 80, valPct: Int = 10,
      hintBroadcast: Boolean = true): DataFrame = {
    val comp0 = NearDedup.components(pairs, aCol, bCol)
      .withColumnRenamed("id", keyCol)
    val comp = if (hintBroadcast) broadcast(comp0) else comp0
    df.join(comp, Seq(keyCol), "left")
      .withColumn("rep", coalesce(col("component"), col(keyCol)))
      .drop("component")
      .withColumn("bucket", hashBucket(col("rep")).cast("long"))
      .withColumn("split", splitName(col("bucket"), trainPct, valPct))
  }

  /** Cap rows per key (e.g. ≤N docs per domain/language so one crawl
    * host can't dominate the corpus): keep the `cap` rows with the
    * smallest content hash — an unbiased, reproducible per-key sample,
    * unlike "first N seen" which depends on scan order.
    *
    * Scale: one window partitioned BY THE CAP KEY (domains/languages
    * are many) — rows shuffle once on that key; `WindowGroupLimit`
    * pushes the rank filter before the full sort at execution. A key
    * hotter than an executor's partition budget is the same skew story
    * as any groupBy — AQE skew handling applies. */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String, cap: Int)
      : DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(md5Long60(col(idCol)), col(idCol))
    df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= cap)
  }
}
