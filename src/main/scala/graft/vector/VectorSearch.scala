package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Library-level similarity-search API (the reference's
  * `generate_embeddings.py` search path, V5/V6, re-expressed as plans):
  * brute-force kNN as the exact baseline and an IVF-partitioned variant
  * as the scale path. Distances use the native codegen expressions from
  * [[graft.expr]] (registered by GraftExtensions).
  *
  * Scale design (100 TB): `knn` broadcasts the query set — the corpus
  * is scanned once, map-side, and ranking goes through the grouped
  * bounded-heap aggregate ([[graft.functions.GroupedTopK]] via
  * [[graft.ops.Ops.topKPerGroupAgg]]): each scan partition keeps a
  * local top-k PER QUERY before the exchange, so the shuffle carries
  * only `partitions × queries × k` pairs — never the corpus×queries
  * product, and never a per-query single-task sort. `IvfIndex` embeds
  * the (tiny) centroid set as a *literal array expression*, so cluster
  * assignment is a pure map-side argmin — no crossJoin, no shuffle, no
  * window — and probes read only `nprobe` cells; written
  * `partitionBy("cell")` that becomes real partition pruning.
  */
object VectorSearch {

  private def l2(a: Column, b: Column): Column =
    call_function("graft_l2_distance", a, b)

  /** Rank scored (query_id, id, dist) candidates: top-k per query via
    * the mergeable bounded-heap aggregate. The double distance rides
    * the order-preserving sortable-bits map and is restored
    * bit-for-bit on output. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    graft.ops.Ops.topKPerGroupAgg(
      scored.withColumn("__dk",
        call_function("graft_sortable_bits", col("dist"))),
      Seq("query_id"), col("__dk"), col("id"), k, "dkey", "id", "rank")
      .select(col("query_id"), col("id"),
        call_function("graft_sortable_double", col("dkey")).as("dist"),
        col("rank"))

  /** Exact brute-force top-k: one row per (query, rank<=k neighbor).
    * `queries` must be small (it is broadcast). */
  def knn(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int): DataFrame =
    rankTopK(
      corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
        .crossJoin(broadcast(queries.select(
          col(qidCol).as("query_id"), col(qvecCol).as("qvec"))))
        .withColumn("dist", l2(col("vec"), col("qvec"))),
      k)

  /** IVF index: corpus rows tagged with their nearest centroid cell.
    * `centroids` is driver-side (tiny by construction). */
  final case class IvfIndex(
      assigned: DataFrame, centroids: Seq[(Long, Seq[Double])]) {

    /** (distance-to-centroid, cell) candidates as one literal-array
      * expression over `vec` — evaluated map-side, fully codegen.
      * `private[graft]`: [[graft.ops.SemanticDecontam]] reuses the
      * pair to get nearest-cell AND its distance in one expression. */
    private[graft] def cellCandidates(vec: Column): Column =
      array(centroids.map { case (cellId, cvec) =>
        struct(
          l2(vec, typedLit(cvec)).as("d"),
          lit(cellId).as("cell"))
      }: _*)

    /** Nearest cell for a vector: argmin over the literal candidates. */
    def nearestCell(vec: Column): Column =
      array_min(cellCandidates(vec)).getField("cell")

    /** The query's nprobe nearest cells, nearest first — through the
      * scalable [[probeCellsLit]] expression since r14 (the old
      * `array_sort(cellCandidates)` composition builds the same
      * per-centroid tree that degenerates at large k; ordering parity
      * with it is pinned in VectorSearchSpec). */
    def probeCells(vec: Column, nprobe: Int): Column =
      probeCellsLit(vec, centroids, nprobe)
  }

  /** The nprobe nearest cell IDS for a vector, nearest first, over the
    * centroid MATRIX literal — `graft_nearest_centroid_k`'s flat
    * n-slot insertion loop ([[graft.expr.NearestCentroidK]]), mapped
    * from matrix positions back to cell ids. Same (distance, lowest
    * cell id) tiebreak as the struct-literal form. */
  private[graft] def probeCellsLit(vec: Column,
      centroids: Seq[(Long, Seq[Double])], nprobe: Int): Column = {
    val sorted = centroids.sortBy(_._1)
    transform(
      call_function("graft_nearest_centroid_k",
        vec, typedLit(sorted.map(_._2)), lit(nprobe)),
      i => element_at(typedLit(sorted.map(_._1)), i + 1))
  }

  /** Build the IVF index: pick nCells seed centroids deterministically
    * (lowest ids via TakeOrdered — no global sort), embed them as
    * literals, tag every corpus row with its nearest cell in one
    * map-side pass. */
  def buildIvf(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int): IvfIndex = {
    val ids = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("vec"))
    val cents: Seq[(Long, Seq[Double])] = ids
      .orderBy("id").limit(nCells)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .toSeq
    buildIvfWith(corpus, idCol, vecCol, cents)
  }

  /** Map-side nearest-centroid assignment that scales in centroid
    * count: ONE `graft_nearest_centroid` expression over the centroid
    * MATRIX literal (flat generated loop — [[graft.expr
    * .NearestCentroid]]). The alternatives both fail at large k,
    * measured: the per-centroid struct-literal argmin
    * ([[IvfIndex.cellCandidates]]) builds an nCells×dim expression
    * tree that degenerates past a few dozen cells (160×64 stalled a
    * 2M-row assignment 20+ min), and a join+aggregate form OOMs
    * carrying vectors as group keys through a sort-fallback
    * aggregate. Ties → lowest cell id (matrix rows id-sorted),
    * matching cellCandidates' (d, cell) tiebreak. Appends `cell`. */
  private[graft] def assignCells(rows: DataFrame, vecCol: String,
      centroids: Seq[(Long, Seq[Double])]): DataFrame = {
    val sorted = centroids.sortBy(_._1)
    val ids = sorted.map(_._1)
    val matrix = sorted.map(_._2)
    rows.withColumn("cell",
      element_at(typedLit(ids),
        call_function("graft_nearest_centroid",
          col(vecCol), typedLit(matrix)) + 1))
  }

  /** [[assignCells]] plus the L2 distance to the chosen centroid in
    * `distCol` — the pair [[graft.ops.SemanticDecontam]] needs for its
    * per-cell radius stats. The argmin runs through the same scalable
    * matrix-literal expression; the distance is then ONE O(d)
    * `graft_l2_distance` against `element_at(matrix, argmin+1)` —
    * never a second O(k·d) pass, and never the per-centroid
    * struct-literal tree that degenerates at large k (the r13-measured
    * 160-cell stall this replaces; ADVICE r13). Appends `cell` and
    * `distCol`. */
  private[graft] def assignCellsWithDist(rows: DataFrame, vecCol: String,
      centroids: Seq[(Long, Seq[Double])], distCol: String): DataFrame = {
    val sorted = centroids.sortBy(_._1)
    val ids = sorted.map(_._1)
    val matrix = sorted.map(_._2)
    rows
      .withColumn("__ci",
        call_function("graft_nearest_centroid",
          col(vecCol), typedLit(matrix)))
      .withColumn("cell", element_at(typedLit(ids), col("__ci") + 1))
      .withColumn(distCol,
        l2(col(vecCol), element_at(typedLit(matrix), col("__ci") + 1)))
      .drop("__ci")
  }

  /** Build the IVF index from GIVEN centroids — e.g. [[Kmeans.fit]]
    * output, the production path (trained cells are tighter, so
    * `nprobe` cells capture more true neighbors than seed cells at
    * the same read cost). Assignment is the map-side matrix-literal
    * argmin ([[assignCells]]), which scales in centroid count. */
  def buildIvfWith(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Long, Seq[Double])]): IvfIndex = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    val ids = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("vec"))
    val index = IvfIndex(null, centroids)
    index.copy(assigned = graft.io.Layout.clusterForPartitionedWrite(
      assignCells(ids, "vec", centroids), Seq("cell")))
  }

  /** Persist the IVF-assigned corpus `partitionBy(cell)` — the layout
    * the optimizer-level prune ([[graft.plans.IvfPruneRule]]) turns
    * into real partition pruning. The cell column name doubles as the
    * registry key, so pick a distinctive one. */
  def writeIvfIndexed(index: IvfIndex, path: String,
      cellCol: String = "ivf_cell"): Unit =
    index.assigned.withColumnRenamed("cell", cellCol)
      .write.partitionBy(cellCol).mode("overwrite").parquet(path)

  /** Read an IVF-partitioned corpus back AND register its centroids
    * for optimizer-level cell pruning: any subsequent
    * `orderBy(l2_distance(vec, q)).limit(k)` over the frame is
    * rewritten to scan only the query's `nprobe` nearest cells.
    * Registering is the explicit opt-in to IVF-recall semantics. */
  def readIvfIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      centroids: Seq[(Long, Seq[Double])], nprobe: Int,
      cellCol: String = "ivf_cell"): DataFrame = {
    graft.plans.KnnIvfCatalog.register(cellCol, centroids, nprobe)
    spark.read.parquet(path)
  }

  /** Probe the IVF index: rank the query's `nprobe` nearest cells
    * map-side, then kNN only within those cells. Approximate (standard
    * IVF recall trade-off), exact within the probed cells. */
  def searchIvf(index: IvfIndex, queries: DataFrame, qidCol: String,
      qvecCol: String, k: Int, nprobe: Int = 1): DataFrame = {
    val q = queries.select(col(qidCol).as("query_id"),
      col(qvecCol).cast("array<double>").as("qvec"))
      .withColumn("cell", explode(index.probeCells(col("qvec"), nprobe)))
    val scored = index.assigned.join(broadcast(q), Seq("cell"))
      .withColumn("dist", l2(col("vec"), col("qvec")))
      .withColumn("__dk", call_function("graft_sortable_bits", col("dist")))
    // two-level so the cell provenance column survives WITHOUT a second
    // corpus scan: bounded-heap top-k per (query, probed cell) — the
    // global per-query top-k is a subset of the per-cell top-ks — then
    // a window over the ≤ nprobe × k survivors per query (bounded by
    // construction, never corpus-sized)
    val perCell = graft.ops.Ops.topKPerGroupAgg(scored,
      Seq("query_id", "cell"), col("__dk"), col("id"), k,
      "dkey", "id", "__r1").drop("__r1")
    graft.ops.Ops.topKPerGroup(perCell, Seq("query_id"),
        Seq(col("dkey").asc, col("id").asc), k)
      .select(col("query_id"), col("id"), col("cell"),
        call_function("graft_sortable_double", col("dkey")).as("dist"),
        col("rank"))
  }

  // ------------------------------------------------------------- LSH ANN

  /** Random-hyperplane LSH — the second ANN scale path next to IVF
    * (indyk-motwani style sign buckets): bucket(v) = the B sign bits of
    * v against B fixed hyperplanes, packed into a long. Like the IVF
    * centroids, the (tiny) hyperplane set embeds in the plan as
    * literals, so bucketing is pure map-side expression math — at scale
    * the bucket is a partition/cluster key and probes read only the
    * query's bucket(s). Multiprobe widens recall by also visiting every
    * 1-bit-flip neighbor bucket (B+1 buckets) — still O(1) of the
    * corpus. */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (h, b) =>
      when(call_function("graft_dot", vec, typedLit(h)) > 0d,
        lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)

  /** The query's probe buckets: its own, plus each 1-bit flip when
    * `multiprobe` is on. */
  def lshProbes(vec: Column, planes: Seq[Seq[Double]],
      multiprobe: Boolean): Column = {
    val own = lshBucket(vec, planes)
    if (!multiprobe) array(own)
    else array(own +: planes.indices.map(b =>
      own.bitwiseXOR(lit(1L << b))): _*)
  }

  /** Persist the LSH-bucketed corpus `partitionBy(bucket)` — the same
    * layout contract as [[writeIvfIndexed]]: probes then become REAL
    * partition pruning on read (asserted in VectorSearchSpec). */
  def writeLshIndexed(corpus: DataFrame, idCol: String, vecCol: String,
      planes: Seq[Seq[Double]], path: String,
      bucketCol: String = "lsh_bucket"): Unit =
    corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("vec"))
      .withColumn(bucketCol, lshBucket(col("vec"), planes))
      .write.partitionBy(bucketCol).mode("overwrite").parquet(path)

  /** Append a batch into a persisted LSH index — [[writeLshIndexed]]'s
    * nightly other half, completing the admit contract across all
    * three persisted layouts ([[graft.ops.VectorDedupIndex.admitBatch]]
    * on IVF cells, [[graft.ops.TextDedupIndex.admitBatch]] on MinHash
    * bands, this on sign buckets): bucket map-side with the SAME
    * plane literals, hash-cluster so each admit leaves exactly one
    * new file per touched bucket directory, `mode(append)`. Bucketing
    * is row-local and deterministic, so admitted rows are
    * indistinguishable from build-time rows — probes see them
    * immediately (spec pins admit ≡ rebuild, search-for-search);
    * compact with [[graft.io.Layout.compactPartitioned]] on the usual
    * cadence. */
  def admitLshIndexed(batch: DataFrame, idCol: String, vecCol: String,
      planes: Seq[Seq[Double]], path: String,
      bucketCol: String = "lsh_bucket"): Unit =
    batch.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("vec"))
      .withColumn(bucketCol, lshBucket(col("vec"), planes))
      .transform(graft.io.Layout.clusterForPartitionedWrite(_,
        Seq(bucketCol)))
      .write.partitionBy(bucketCol).mode("append").parquet(path)

  /** Probe a persisted LSH index: the query set's probe buckets are
    * computed driver-side (queries are small by contract) and pushed
    * as a partition filter, so only the probed bucket directories are
    * read; exact top-k within them. */
  def searchLshIndexed(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, qidCol: String, qvecCol: String,
      planes: Seq[Seq[Double]], k: Int, multiprobe: Boolean = true,
      bucketCol: String = "lsh_bucket"): DataFrame = {
    val q = queries.select(col(qidCol).as("query_id"),
      col(qvecCol).cast("array<double>").as("qvec"))
      .withColumn("bucket",
        explode(lshProbes(col("qvec"), planes, multiprobe)))
    val probeBuckets = q.select("bucket").distinct()
      .collect().map(_.getLong(0))
    val corpus = spark.read.parquet(path)
      .filter(col(bucketCol).isin(probeBuckets: _*))
      .withColumnRenamed(bucketCol, "bucket")
    rankTopK(
      corpus.join(broadcast(q), Seq("bucket"))
        .withColumn("dist", l2(col("vec"), col("qvec"))),
      k)
  }

  /** ANN search through sign-bucket LSH: corpus tagged map-side,
    * queries (broadcast) probe their bucket set, exact top-k within
    * the union of probed buckets. */
  def searchLsh(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      planes: Seq[Seq[Double]], k: Int, multiprobe: Boolean = true)
      : DataFrame = {
    val tagged = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("vec"))
      .withColumn("bucket", lshBucket(col("vec"), planes))
    val q = queries.select(col(qidCol).as("query_id"),
      col(qvecCol).cast("array<double>").as("qvec"))
      .withColumn("bucket",
        explode(lshProbes(col("qvec"), planes, multiprobe)))
    rankTopK(
      tagged.join(broadcast(q), Seq("bucket"))
        .withColumn("dist", l2(col("vec"), col("qvec"))),
      k)
  }

  /** Maximal Marginal Relevance re-rank (Carbonell & Goldstein 1998):
    * from each query's candidate pool pick k items greedily by
    * `λ·rel(c) − (1−λ)·max_{s∈picked} cos(c, s)` — the standard
    * diversification pass RAG retrieval runs AFTER first-stage kNN,
    * so near-duplicate passages don't crowd out coverage.
    *
    * Scale design (100 TB): MMR is inherently sequential IN k, so the
    * right distributed shape is per-QUERY parallelism over the
    * already-bounded stage-1 pools: `candidates` is the output of
    * [[knn]]/[[searchIvf]]/[[searchLsh]] joined back to its vectors —
    * contractually ≤ poolSize rows per query — and each query's
    * greedy loop runs in ONE task via `flatMapGroups` (state = that
    * query's pool; O(k·pool) dot products). Nothing corpus-scale is
    * grouped, collected, or shuffled beyond the (query_id) exchange
    * of the small pool frame. Ties break on candidate id, and the
    * pool is pre-sorted (rel desc, id) before the loop, so the result
    * is deterministic under any input partitioning.
    *
    * `candidates` schema: (query_id: long, id: long,
    * vec: array<double>, rel: double — higher is more relevant).
    * Returns (query_id, id, rank 1..k, mmr_score). */
  def mmrRerank(candidates: DataFrame, k: Int,
      lambda: Double = 0.5): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1], got $lambda")
    val spark = candidates.sparkSession
    import spark.implicits._
    val out = candidates
      .select(col("query_id").cast("long"), col("id").cast("long"),
        col("vec").cast("array<double>"), col("rel").cast("double"))
      .as[(Long, Long, Array[Double], Double)]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val pool = it.toArray.sortBy { case (_, id, _, rel) => (-rel, id) }
        // a NaN rel would make every `s > bestScore` comparison false
        // and crash the greedy loop at taken(-1) — fail with the
        // offending (query, id) instead of an index error
        pool.foreach { case (_, id, _, rel) =>
          require(!rel.isNaN, s"NaN rel for query=$qid id=$id") }
        // unit-normalize once so candidate-candidate sim is one dot
        val unit = pool.map { case (_, _, v, _) =>
          val n = math.sqrt(v.map(x => x * x).sum)
          if (n == 0.0) v else v.map(_ / n)
        }
        def dot(a: Array[Double], b: Array[Double]): Double = {
          var s = 0.0; var i = 0
          while (i < a.length) { s += a(i) * b(i); i += 1 }
          s
        }
        val picked = scala.collection.mutable.ArrayBuffer.empty[Int]
        val maxSim = Array.fill(pool.length)(0.0) // max cos to picked set
        val taken = Array.fill(pool.length)(false)
        val rows = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Int, Double)]
        var rank = 1
        while (rank <= math.min(k, pool.length)) {
          var best = -1
          var bestScore = Double.NegativeInfinity
          var i = 0
          while (i < pool.length) {
            if (!taken(i)) {
              val s = lambda * pool(i)._4 -
                (1.0 - lambda) * (if (picked.isEmpty) 0.0 else maxSim(i))
              // strict > keeps the (rel desc, id) pre-sort as tiebreak
              if (s > bestScore) { bestScore = s; best = i }
            }
            i += 1
          }
          taken(best) = true
          picked += best
          rows += ((qid, pool(best)._2, rank, bestScore))
          var j = 0
          while (j < pool.length) {
            if (!taken(j)) {
              val sim = dot(unit(j), unit(best))
              if (sim > maxSim(j)) maxSim(j) = sim
            }
            j += 1
          }
          rank += 1
        }
        rows.iterator
      }
    out.toDF("query_id", "id", "rank", "mmr_score")
  }
}
