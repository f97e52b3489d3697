package graft

import org.apache.spark.sql.functions._

/** Executed-plan pins for the round-13 additions: the properties that
  * make d17 and the persisted-index probes survive a 100 TB corpus,
  * asserted on the EXECUTED plan (not the optimized one). */
class PlanAuditR13Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def executed(q: String): String = {
    val df = SparkEntry.queries(q)(spark, dir)
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("d17 semantic decontam: centroid fan-out and probe join both " +
      "broadcast — the corpus side never shuffles for the pair scan; " +
      "nothing cartesians") {
    val p = executed("d17_semantic_decontam")
    // the corpus×centroids assignment fan-out (8 rows) rides a
    // broadcast nested-loop; the (eval, cell) probe set joins back
    // into the assigned corpus as a broadcast hash join on cell
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the only hash exchanges are the assignment groupBy + cell-stats
    // groupBy (+ AQE reads of them) — the verify join itself adds none
    assert(!p.contains("SortMergeJoin"), p)
  }

  /** One persisted artifact, two consumers: the cell-partitioned
    * corpus `VectorDedupIndex.writeIndex` lays down serves BOTH the
    * dedup probe (explicit partition filter — VectorDedupIndexSpec)
    * AND the declarative kNN idiom through the optimizer-level
    * IvfPruneRule — `orderBy(l2_distance).limit(k)` over the
    * re-read frame scans only the query's probe cells. */
  test("the VectorDedupIndex layout also serves declarative kNN via " +
      "IvfPruneRule with real partition pruning") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cents = graft.ops.VectorDedupIndex
      .seedCentroids(emb, "vec_id", "embedding", 8)
    val path = java.nio.file.Files
      .createTempDirectory("r13_dualuse").toString
    val cellCol = "r13_dual_cell"
    graft.ops.VectorDedupIndex
      .writeIndex(emb, "vec_id", "embedding", cents, path, cellCol)
    // same directories, second consumer: register for optimizer-level
    // pruning and run the declarative nearest-neighbor idiom
    val corpus = graft.vector.VectorSearch.readIvfIndexed(
      spark, path, cents, nprobe = 2, cellCol = cellCol)
    try {
      val qvec = emb.orderBy("vec_id")
        .select(col("embedding").cast("array<double>")).head()
        .getSeq[Double](0)
      val knn = corpus
        .withColumn("d", call_function("graft_l2_distance",
          col("vec").cast("array<double>"), typedLit(qvec)))
        .orderBy(col("d")).limit(5)
      val rows = knn.collect()
      assert(rows.length == 5)
      val p = knn.queryExecution.executedPlan.toString
      val scan = p.split("\n").find(_.contains("PartitionFilters"))
      assert(scan.isDefined, p)
      assert(!scan.get.contains("PartitionFilters: []"),
        s"kNN over the dedup index read all partitions:\n$p")
      assert(scan.get.contains(cellCol), scan.get)
    } finally graft.plans.KnnIvfCatalog.unregister(cellCol)
  }
}
