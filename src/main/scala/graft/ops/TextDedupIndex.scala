package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextOps.{md5Long60, md5Long60Jvm, shingles, tokens}

/** Persisted MinHash-LSH index for INCREMENTAL text dedup — the
  * production nightly-ingest flow: dedup a small new batch against a
  * 100 TB corpus without rescanning the corpus.
  *
  * Layout contract (mirrors VectorSearch.writeLshIndexed / the IVF
  * cell layout): band rows are written `partitionBy(band, bgroup)`
  * where `bgroup = bkey mod GroupMod` — the full 60-bit band key would
  * make one directory per bucket (millions of tiny files); grouping
  * keeps the partition count at nBands × GroupMod while still letting
  * a probe prune to only the groups its batch hashes into. The probe
  * collects the batch's (band, bgroup) set driver-side (bounded by
  * nBands × GroupMod, independent of corpus size), pushes it as a
  * partition filter, and equi-joins the surviving index rows on the
  * exact (band, bkey). Candidates then verify downstream (Jaccard on
  * shingle sets — same as the batch path d04).
  */
object TextDedupIndex {

  val GroupMod = 64

  /** LSH band rows (doc_id, band, bkey) for a document set: distinct
    * 3-shingles → K salted minima in ONE groupBy (the d02 recipe,
    * salts pre-folded driver-side) → bands of `rowsPerBand` adjacent
    * minima hashed to one 60-bit key. */
  def bandRows(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    require(k % rowsPerBand == 0, "k must be a multiple of rowsPerBand")
    val sh = docs
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(shingles(tokens(col(textCol)), 3))).as("sh"))
      .select(col("doc_id"), md5Long60(col("sh")).as("shh"))
    val minCols = (0 until k).map(i =>
      min(col("shh").bitwiseXOR(lit(md5Long60Jvm(i.toString))))
        .as(s"mh$i"))
    val sig = sh.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
    val nBands = k / rowsPerBand
    sig.select(col("doc_id"),
        explode(array((0 until nBands).map { b =>
          struct(lit(b).as("band"),
            md5Long60(concat_ws(":",
              (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*))
              .as("bkey"))
        }: _*)).as("x"))
      .select(col("doc_id"), col("x.band").as("band"),
        col("x.bkey").as("bkey"))
  }

  /** Build + persist the corpus index. One corpus scan; the write is
    * the only shuffle (partitionBy directories). */
  def writeIndex(docs: DataFrame, path: String, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 8, rowsPerBand: Int = 2): Unit =
    bandRows(docs, idCol, textCol, k, rowsPerBand)
      .withColumn("bgroup", pmod(col("bkey"), lit(GroupMod)))
      .write.partitionBy("band", "bgroup")
      .mode("overwrite").parquet(path)

  /** Append an accepted batch's band rows into the persisted index —
    * the vector twin is [[VectorDedupIndex.admitBatch]], same nightly
    * contract (VERDICT r13 item 3): probe → dedup → admit survivors,
    * so tomorrow's batch dedups against tonight's. Hashing is
    * deterministic and row-local, so admitted rows are
    * indistinguishable from build-time rows (spec pins N admit cycles
    * ≡ one full rebuild). Hash-clustering on (band, bgroup) leaves
    * exactly ONE new file per touched partition directory per admit;
    * run [[compactIndex]] on the cadence that keeps files-per-
    * directory bounded. */
  def admitBatch(docs: DataFrame, indexPath: String,
      idCol: String = "doc_id", textCol: String = "text",
      k: Int = 8, rowsPerBand: Int = 2): Unit =
    bandRows(docs, idCol, textCol, k, rowsPerBand)
      .withColumn("bgroup", pmod(col("bkey"), lit(GroupMod)))
      .transform(graft.io.Layout.clusterForPartitionedWrite(_,
        Seq("band", "bgroup")))
      .write.partitionBy("band", "bgroup")
      .mode("append").parquet(indexPath)

  /** Rewrite the index with one bkey-sorted file per (band, bgroup)
    * directory — the small-file maintenance pass for nightly
    * [[admitBatch]] appends. Writes to `outPath` (never in place);
    * swap after validating. */
  def compactIndex(spark: SparkSession, indexPath: String,
      outPath: String): Unit =
    graft.io.Layout.compactPartitioned(spark, indexPath, outPath,
      Seq("band", "bgroup"), sortCols = Seq("bkey"))

  /** Candidate (corpus_id, new_id) pairs for a new batch against the
    * persisted index, reading ONLY the index partitions the batch
    * hashes into. The batch is assumed small next to the corpus (the
    * incremental contract); its band set is collected driver-side —
    * bounded by nBands × GroupMod regardless of batch size. */
  def probeCandidates(spark: SparkSession, indexPath: String,
      newDocs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 8, rowsPerBand: Int = 2)
      : DataFrame = {
    // NOT cached: the batch is micro-batch-sized by the incremental
    // contract, so re-shingling it once for the `groups` collect and
    // once inside the returned (lazy) join costs next to nothing —
    // while a per-batch `.cache()` in the long-lived nightly session
    // this is built for accumulates blocks that nothing unpersists.
    val nb = bandRows(newDocs, idCol, textCol, k, rowsPerBand)
      .withColumn("bgroup", pmod(col("bkey"), lit(GroupMod)))
    val groups = nb.select("band", "bgroup").distinct()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    // an empty micro-batch (or one whose docs are all shorter than a
    // shingle) has nothing to probe — return an empty pair frame
    // instead of crashing the caller's streaming loop
    if (groups.isEmpty)
      newDocs.sparkSession.emptyDataFrame
        .select(lit(0L).as("corpus_id"), lit(0L).as("new_id"))
    else {
      // OR-of-conjunctions over the partition columns — prunes at plan
      // time (PartitionFilters), asserted in TextDedupIndexSpec
      val prune = groups.map { case (b, g) =>
        col("band") === b && col("bgroup") === g
      }.reduce(_ || _)
      spark.read.parquet(indexPath)
        .filter(prune)
        .select(col("doc_id").as("corpus_id"), col("band"), col("bkey"))
        .join(nb.select(col("doc_id").as("new_id"), col("band"),
          col("bkey")), Seq("band", "bkey"))
        .filter(col("corpus_id") =!= col("new_id"))
        .select("corpus_id", "new_id")
        .distinct()
    }
  }
}
