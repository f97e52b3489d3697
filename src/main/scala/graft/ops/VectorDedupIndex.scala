package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.vector.VectorSearch

/** Persisted IVF index for INCREMENTAL embedding dedup — the vector
  * twin of [[TextDedupIndex]] (VERDICT r12 item 3), and the nightly
  * form of the batch cell-blocked near-dup (`v14_blocked_neardup`):
  * probe a small new batch of embeddings against a 100 TB corpus
  * WITHOUT rescanning the corpus.
  *
  * Layout contract (composes [[VectorSearch.buildIvfWith]] /
  * [[VectorSearch.writeIvfIndexed]]): the corpus is written
  * `partitionBy(cellCol)` under its nearest-centroid cell. The probe
  * assigns the batch to cells with the SAME literal-argmin expression
  * (map-side, fully codegen — the centroids the index was built with
  * are the caller's responsibility to persist alongside the path, as
  * with any ANN index), collects the batch's distinct cell set
  * driver-side — bounded by the centroid count, independent of both
  * corpus and batch size — and pushes it as a partition filter, so
  * only the probed cell directories are read (PartitionFilters,
  * pinned in VectorDedupIndexSpec). Cosine verification then runs
  * only on (corpus row in probed cell) × (batch row in that cell).
  *
  * Recall contract: identical to the batch form — a near-dup pair
  * straddling a cell boundary is missed (the standard blocked-dedup
  * trade-off; multiprobe assignment is the knob, and
  * `d17_semantic_decontam`'s per-cell cosine cap shows the lossless
  * alternative when the threshold form allows it). What IS exact:
  * probing finds precisely the pairs the batch v14 recipe finds on
  * corpus ∪ batch restricted to (corpus, batch) — pinned in the spec.
  */
object VectorDedupIndex {

  /** Deterministic seed centroids — the v14/v06 convention with a
    * duplicate guard: the nCells lowest-id DISTINCT corpus vectors.
    * The guard matters: on a corpus with exact duplicates (the very
    * thing a dedup index exists for) the naive lowest-N-ids can all
    * be copies of one vector, which degenerates every cell to the
    * same centroid and collapses the whole corpus into one cell —
    * measured: a replica-heavy bench corpus produced 412M candidate
    * pairs in ONE unsplittable cell (single-threaded verify) vs 26M
    * across 16 real cells. Costs one distinct-vector aggregate at
    * build time; production uses [[graft.vector.Kmeans.fit]] output
    * instead. */
  def seedCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int): Seq[(Long, Seq[Double])] =
    corpus.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"))
      .groupBy("vec").agg(min(col("id")).as("id"))
      .orderBy("id").limit(nCells)
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getSeq[Double](0)))
      .toSeq

  /** Build + persist the cell-partitioned corpus index. One corpus
    * scan; the only shuffle is the partitionBy write's cell
    * clustering. */
  def writeIndex(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Long, Seq[Double])], path: String,
      cellCol: String = "ivf_cell"): Unit =
    VectorSearch.writeIvfIndexed(
      VectorSearch.buildIvfWith(corpus, idCol, vecCol, centroids),
      path, cellCol)

  /** (corpus_id, new_id, cell, cos) pairs with cosine ≥ tau between a
    * new batch and the persisted index, reading ONLY the cell
    * partitions the batch assigns into. The batch is small by the
    * incremental contract (it is broadcast); like
    * [[TextDedupIndex.probeCandidates]] it is deliberately NOT cached —
    * re-assigning a micro-batch twice costs next to nothing, while a
    * per-batch cache in a long-lived nightly session leaks blocks. */
  def probePairs(spark: SparkSession, indexPath: String,
      centroids: Seq[(Long, Seq[Double])], batch: DataFrame,
      idCol: String, vecCol: String, tau: Double,
      cellCol: String = "ivf_cell"): DataFrame = {
    // batch assignment: the same matrix-literal argmin as the index
    // build (map-side, scales in centroid count)
    val nb = VectorSearch.assignCells(
        batch.select(col(idCol).cast("long").as("id"),
          col(vecCol).cast("array<double>").as("vec")),
        "vec", centroids)
      .select(col("id").as("new_id"), col("vec").as("new_vec"),
        col("cell"))
      .withColumn("new_ss",
        call_function("graft_dot", col("new_vec"), col("new_vec")))
    val cells = nb.select("cell").distinct()
      .collect().map(_.getLong(0)) // bounded by |centroids|
    if (cells.isEmpty)
      // an empty micro-batch probes nothing — empty pairs, not a crash
      spark.emptyDataFrame.select(
        lit(0L).as("corpus_id"), lit(0L).as("new_id"),
        lit(0L).as("cell"), lit(0d).as("cos")).limit(0)
    else {
      // partition filter: prunes at plan time (PartitionFilters). The
      // partition column reads back as int/string per discovery — cast
      // to long AFTER the filter so the pruning literal types match.
      val corpus = spark.read.parquet(indexPath)
        .filter(col(cellCol).isin(cells: _*))
        .select(col("id").as("corpus_id"), col("vec"),
          col(cellCol).cast("long").as("cell"))
        .withColumn("ss", call_function("graft_dot", col("vec"), col("vec")))
      corpus.join(broadcast(nb), Seq("cell"))
        .filter(col("corpus_id") =!= col("new_id"))
        .withColumn("cos",
          call_function("graft_dot", col("vec"), col("new_vec")) /
            (sqrt(col("ss")) * sqrt(col("new_ss"))))
        .filter(col("cos") >= tau)
        .select(col("corpus_id"), col("new_id"), col("cell"), col("cos"))
    }
  }
}
