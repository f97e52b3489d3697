package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate resolution (north-star dedup, final stage): candidate
  * pairs (from MinHash-LSH + Jaccard verification, DedupSuite d03/d04,
  * or embedding-cosine v05) → connected components → one canonical
  * survivor per component.
  *
  * Components use iterative min-label propagation over the undirected
  * pair graph: each round every vertex takes the minimum label among
  * itself and its neighbors; converges in O(diameter) rounds. Each
  * round is one shuffle-on-key join + aggregate — the standard
  * large-graph pattern when GraphX/Pregel is unwarranted; lineage is
  * cut per round with localCheckpoint so plans stay flat.
  */
object NearDedup {

  /** Connected components of the pair graph. Input: (a, b) edge rows
    * (any orientation). Output: (id, component) where component is the
    * smallest vertex id reachable. */
  def components(pairs: DataFrame, aCol: String = "a_id",
      bCol: String = "b_id", maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val propagated = edges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), col("component"))
      val hop = labels.select("id", "component").union(propagated)
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint(true)
      // pointer doubling: follow the label's own label — convergence
      // drops from O(diameter) to O(log diameter) rounds
      val parents = hop.select(col("id").as("pid"),
        col("component").as("pcomp"))
      val next = hop
        .join(parents, hop("component") === parents("pid"), "left")
        .select(hop("id"),
          least(hop("component"), coalesce(col("pcomp"), hop("component")))
            .as("component"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("component", "old"),
        Seq("id")).filter(col("component") =!= col("old")).limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"NearDedup.components did not converge in $maxIter rounds — " +
          "labels are partial; raise maxIter (pointer doubling makes " +
          "20 rounds cover graphs of diameter ~2^20, so this likely " +
          "signals a data problem)")
    labels
  }

  /** Keep one row per near-dup component: the row whose id equals the
    * component minimum survives; rows absent from any pair survive
    * trivially. Returns the deduplicated frame. */
  def dedup(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comp = components(pairs)
    df.join(comp.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .filter(col("component").isNull || col("component") === col(idCol))
      .drop("component")
  }
}
