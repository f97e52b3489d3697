package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.vector.VectorSearch

/** Semantic (embedding-space) decontamination — the library form of
  * oracle query `d17_semantic_decontam`, and the paraphrase-robust
  * sibling of the exact-n-gram forms (`d09` doc flag, `d15` span
  * scrub; ref anchor: the embedding surface of
  * `scripts/transform/generate_embeddings.py`): flag every corpus
  * document whose embedding is cosine-close (≥ tau) to any eval-set
  * embedding.
  *
  * Plan shape — strictly better than the oracle twin's relational
  * recipe: corpus cell assignment is [[VectorSearch.assignCellsWithDist]]
  * — the `graft_nearest_centroid` matrix-literal argmin plus one O(d)
  * distance against the chosen row, pure map-side codegen with no
  * crossJoin, no groupBy, and no per-centroid expression TREE (the
  * struct-literal form this replaced degenerates past a few dozen
  * cells: 160 cells × 64 dims stalled a 2M-row pass 20+ min — ADVICE
  * r13; the migration is what makes this form safe at production cell
  * counts, bench arm `x29_decontam_128cells`). The per-cell pruning
  * stats (radius, min norm) are ONE small aggregate; the eval side
  * probes only cells the per-cell Cauchy–Schwarz cosine cap cannot
  * exclude
  *
  *   cos(e, x) ≤ (dot(e,cent_c)/|e| + rad_c) / minNorm_c   (x ∈ c)
  *
  * which makes the blocking LOSSLESS — no τ-pair can hide in an
  * unprobed cell (SemanticDecontamLibSpec pins pair-set equality with
  * the oracle form; the FP slack only ever ADDS probes). At 100 TB:
  * the corpus is scanned TWICE, both passes pure map-side — once into
  * the cell-stats aggregate, once into the verify join (which shuffles
  * only for its corpus-side cell clustering). Two cheap map passes are
  * the right trade at this scale: caching a corpus-sized `assigned`
  * frame to save one of them would pin ~the whole input in
  * executor/disk storage. Callers who probe repeatedly should instead
  * keep the corpus cell-partitioned on disk
  * ([[VectorDedupIndex.writeIndex]] layout) — then BOTH passes read
  * pruned cell directories and the assignment is free.
  */
object SemanticDecontam {

  /** (corpus_id, eval_id, cos) for every corpus-eval pair with
    * cosine ≥ tau. `centroids` from [[VectorDedupIndex.seedCentroids]]
    * or [[graft.vector.Kmeans.fit]]; vectors cast to array<double>.
    * `tau` must be positive: the Cauchy–Schwarz cap divides by the
    * cell's min norm, which for a NEGATIVE numerator shrinks the bound
    * below the true maximum cosine — a cell whose pairs all lie in
    * [tau, 0) could then be wrongly pruned (ADVICE r13). tau ≤ 0 is
    * also semantically vacuous here: "decontaminate everything less
    * than orthogonal" keeps nothing. */
  def flagged(corpus: DataFrame, cIdCol: String, cVecCol: String,
      eval: DataFrame, eIdCol: String, eVecCol: String,
      centroids: Seq[(Long, Seq[Double])], tau: Double): DataFrame = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    // a duplicated cell id would make centroids.toMap silently keep
    // the LAST entry while the id-sorted assignment matrix keeps both
    // rows — the Cauchy–Schwarz cap could then be computed against a
    // different centroid than the argmin chose, breaking the lossless
    // guarantee (ADVICE r14). Fail loudly instead.
    require(centroids.map(_._1).distinct.size == centroids.size,
      s"centroid cell ids must be distinct, got ${centroids.map(_._1)}")
    require(tau > 0,
      s"tau must be > 0 (the per-cell cosine cap is only an upper " +
        s"bound for positive thresholds), got $tau")
    val assigned = VectorSearch.assignCellsWithDist(
      corpus.select(col(cIdCol).cast("long").as("corpus_id"),
        col(cVecCol).cast("array<double>").as("vec")),
      "vec", centroids, "dc")
      .withColumn("ss", call_function("graft_dot", col("vec"), col("vec")))
    val cellStats = assigned.groupBy("cell")
      .agg(max(col("dc")).as("rad"), min(col("ss")).as("min_ss"))
    val evalSide = eval
      .select(col(eIdCol).cast("long").as("eval_id"),
        col(eVecCol).cast("array<double>").as("e_vec"))
      .withColumn("e_ss",
        call_function("graft_dot", col("e_vec"), col("e_vec")))
    // (eval × cells) is tiny on both axes; cellStats carries no
    // centroid vectors — dot(e, cent_c) looks the centroid up in ONE
    // cell→vector MAP literal (a per-centroid CASE chain is the same
    // O(cells×dim) expression-tree growth as the struct-literal
    // argmin this op already migrated away from; the map literal is
    // one plan node at any cell count)
    val dotCent = call_function("graft_dot", col("e_vec"),
      element_at(typedLit(centroids.toMap), col("cell")))
    val probes = evalSide.crossJoin(broadcast(cellStats))
      .withColumn("cap",
        (dotCent / sqrt(col("e_ss")) + col("rad")) / sqrt(col("min_ss")))
      .filter(col("cap") >= lit(tau) - lit(1e-9))
      .select(col("eval_id"), col("e_vec"), col("e_ss"), col("cell"))
    assigned.join(broadcast(probes), Seq("cell"))
      .withColumn("cos",
        call_function("graft_dot", col("vec"), col("e_vec")) /
          (sqrt(col("ss")) * sqrt(col("e_ss"))))
      .filter(col("cos") >= tau)
      .select(col("corpus_id"), col("eval_id"), col("cos"))
  }
}
