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
  * recipe: corpus cell assignment is the [[VectorSearch.IvfIndex]]
  * centroid-literal argmin (pure map-side codegen — no crossJoin, no
  * groupBy for the assignment at all); the per-cell pruning stats
  * (radius, min norm) are ONE small aggregate; the eval side probes
  * only cells the per-cell Cauchy–Schwarz cosine cap cannot exclude
  *
  *   cos(e, x) ≤ (dot(e,cent_c)/|e| + rad_c) / minNorm_c   (x ∈ c)
  *
  * which makes the blocking LOSSLESS — no τ-pair can hide in an
  * unprobed cell (SemanticDecontamLibSpec pins pair-set equality with
  * the oracle form; the FP slack only ever ADDS probes). At 100 TB:
  * the corpus is scanned once map-side, shuffles once for the
  * cell-stats aggregate and once for the verify join's corpus-side
  * cell clustering — or zero times when the corpus is already
  * cell-partitioned ([[VectorDedupIndex.writeIndex]] layout, probe
  * via broadcast on the tiny (eval × probed-cell) frame).
  */
object SemanticDecontam {

  /** (corpus_id, eval_id, cos) for every corpus-eval pair with
    * cosine ≥ tau. `centroids` from [[VectorDedupIndex.seedCentroids]]
    * or [[graft.vector.Kmeans.fit]]; vectors cast to array<double>. */
  def flagged(corpus: DataFrame, cIdCol: String, cVecCol: String,
      eval: DataFrame, eIdCol: String, eVecCol: String,
      centroids: Seq[(Long, Seq[Double])], tau: Double): DataFrame = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    val index = VectorSearch.IvfIndex(null, centroids)
    val assigned = corpus
      .select(col(cIdCol).cast("long").as("corpus_id"),
        col(cVecCol).cast("array<double>").as("vec"))
      .withColumn("cell", index.nearestCell(col("vec")))
      .withColumn("dc",
        array_min(index.cellCandidates(col("vec"))).getField("d"))
      .withColumn("ss", call_function("graft_dot", col("vec"), col("vec")))
    val cellStats = assigned.groupBy("cell")
      .agg(max(col("dc")).as("rad"), min(col("ss")).as("min_ss"))
    val evalSide = eval
      .select(col(eIdCol).cast("long").as("eval_id"),
        col(eVecCol).cast("array<double>").as("e_vec"))
      .withColumn("e_ss",
        call_function("graft_dot", col("e_vec"), col("e_vec")))
    // (eval × cells) is tiny on both axes; cellStats carries no
    // centroid vectors — dot(e, cent_c) is a CASE over the (small)
    // centroid set with the vectors as plan literals, the same trick
    // as the assignment argmin
    val dotCent = centroids.map { case (cid, cv) =>
      (col("cell") === lit(cid),
        call_function("graft_dot", col("e_vec"), typedLit(cv)))
    }.foldRight(lit(Double.NaN): org.apache.spark.sql.Column) {
      case ((pred, d), acc) => when(pred, d).otherwise(acc)
    }
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
