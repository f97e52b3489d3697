package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextOps.{md5Long60, shingles, tokens}

/** DSIR importance scoring as a FIT-ONCE / SCORE-MANY model (Xie et
  * al. 2023, arXiv:2302.03169) — the incremental form of the oracle
  * query `c15_dsir_weights`: `fit` makes one pass over the training
  * corpus to build the hashed-bigram target/raw ratio table (≤
  * `buckets` rows — fixed-size no matter the corpus, which is the
  * paper's point); `score` then weighs ANY batch map-side against the
  * frozen broadcast table. Nightly ingest never rescans the corpus —
  * the same persisted-model contract as [[TextDedupIndex]].
  *
  * Determinism: identical recipe to c15 — smoothed-count products are
  * exact longs < 2^53, one ln per bucket, floor(·1e6) to a long;
  * per-doc weights are exact long sums, so fit-then-score is
  * bit-identical to the single-query form (spec-pinned).
  *
  * Fit-corpus bound (enforced): the exact-long claim requires
  * (cnt+1)·(T+B) ≤ 2^53, i.e. at most ~9.4e7 bigram tokens in the FIT
  * corpus — `fit` rejects anything larger. That is not a scale
  * limitation of scoring (which handles any batch size): DSIR fits on
  * a bounded SAMPLE by design — the model is `buckets` ratios, and a
  * ~1e7-bigram sample already saturates a 256-bucket table — while
  * the 100 TB corpus flows only through the map-side `score` pass.
  * A corpus past the bound would first lose exactness silently (>2^53)
  * and then overflow the long multiply outright (~3e9 bigrams), so
  * failing fast here is the honest contract.
  *
  * Buckets the training corpus never saw fall back to the smoothed
  * empty-bucket ratio floor(1e6·ln((T_r+B)/(T_t+B))) — carried IN the
  * model (`defaultRatioE6`), so scoring needs no corpus access.
  */
object Dsir {

  /** `ratios`: (bucket: long, ratio_e6: long), ≤ `buckets` rows. */
  final case class DsirModel(ratios: DataFrame, buckets: Int,
      defaultRatioE6: Long)

  private def bucketed(docs: DataFrame, textCol: String,
      buckets: Int): DataFrame =
    docs.withColumn("__bigram",
        explode(shingles(tokens(col(textCol)), 2)))
      .withColumn("bucket", md5Long60(col("__bigram")) % buckets)
      .drop("__bigram")

  /** One corpus pass: both LMs from a single partial-combining
    * groupBy on the bucket; totals reduce the ≤`buckets`-row frame. */
  def fit(docs: DataFrame, isTarget: Column, textCol: String = "text",
      buckets: Int = 256): DsirModel = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val b = buckets.toLong
    val lm = bucketed(docs.withColumn("__t", isTarget), textCol, buckets)
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt_r"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("cnt_t"))
    // tiny: ≤ buckets rows — the reduce and the collect are bounded
    // by the model size, never the corpus
    val Seq(tR, tT) = {
      val r = lm.agg(sum(col("cnt_r")), sum(col("cnt_t"))).head()
      Seq(r.getLong(0), r.getLong(1))
    }
    // worst-case product is (tR+1)·(tR+b) ≤ (tR+b)²; keep it ≤ 2^53 so
    // the double cast below stays exact (see the class doc: fit runs
    // on a bounded sample, score on the full corpus)
    require(tR + b <= 94906265L,
      s"DSIR fit corpus too large for exact-long ratios: $tR bigram " +
        s"tokens (+$b smoothing) exceeds sqrt(2^53); fit on a sample")
    val ratios = lm.select(col("bucket"),
      floor(log(((col("cnt_t") + 1) * (tR + b)).cast("double") /
        ((col("cnt_r") + 1) * (tT + b))) * 1e6).cast("long")
        .as("ratio_e6"))
    val dflt = math.floor(math.log(
      (tR + b).toDouble / (tT + b)) * 1e6).toLong
    DsirModel(ratios, buckets, dflt)
  }

  /** Map-side scoring of any batch: bigram hash + ONE broadcast join
    * against the frozen ratio table + a per-doc rollup keyed on
    * `idCols` — the only batch-scale exchange. */
  def score(model: DsirModel, batch: DataFrame, idCols: Seq[String],
      textCol: String = "text"): DataFrame =
    bucketed(batch.select((idCols :+ textCol).map(col): _*), textCol,
      model.buckets)
      .join(broadcast(model.ratios), Seq("bucket"), "left")
      .withColumn("__r",
        coalesce(col("ratio_e6"), lit(model.defaultRatioE6)))
      .groupBy(idCols.map(col): _*)
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__r")).as("weight_e6"))
      .withColumn("selected", col("weight_e6") > 0L)

  /** Persist the model: the ratio table as parquet plus the scalar
    * metadata as a one-row sidecar (same layout discipline as
    * [[TextDedupIndex]] — self-describing, engine-readable). */
  def write(model: DsirModel, path: String): Unit = {
    model.ratios.write.mode("overwrite").parquet(s"$path/ratios")
    val s = model.ratios.sparkSession
    import s.implicits._
    Seq((model.buckets, model.defaultRatioE6))
      .toDF("buckets", "default_ratio_e6")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  def read(spark: SparkSession, path: String): DsirModel = {
    val meta = spark.read.parquet(s"$path/meta").head()
    DsirModel(spark.read.parquet(s"$path/ratios"),
      meta.getInt(0), meta.getLong(1))
  }
}
