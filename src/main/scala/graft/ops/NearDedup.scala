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
    * smallest vertex id reachable.
    *
    * Two execution paths, picked by measured edge count:
    *  - at or below `smallGraphEdges` distinct directed edges, the graph
    *    is collected and solved with union-find on the driver. This is
    *    the COMMON case, not a shortcut: near-dup pair sets are the
    *    output of a verifier and are orders of magnitude smaller than
    *    the corpus (like IVF centroids), while every distributed round
    *    costs several scheduled jobs + eager checkpoints — at sf0.1 the
    *    loop spent ~3.4 s labeling a graph union-find solves in
    *    microseconds. The default cap keeps the collect bounded:
    *    1M two-long Rows ≈ 100 MB transient on the driver, safely
    *    inside a default-sized driver; raise it only with driver
    *    memory to match;
    *  - above the threshold, iterative min-label propagation with
    *    pointer doubling (O(log diameter) rounds), each round one
    *    shuffle join + aggregate. */
  def components(pairs: DataFrame, aCol: String = "a_id",
      bCol: String = "b_id", maxIter: Int = 20,
      smallGraphEdges: Long = 1000000L): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint(true)
    if (edges.count() <= smallGraphEdges) return componentsLocal(edges)
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

  /** Driver-side union-find over a collected edge list; same contract
    * as [[components]] (component = smallest reachable id, "smallest"
    * under the id column's own SQL ordering). */
  private def componentsLocal(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val idType = edges.schema("src").dataType
    val rows = edges.collect()
    val index = scala.collection.mutable.HashMap.empty[Any, Int]
    val ids = scala.collection.mutable.ArrayBuffer.empty[Any]
    def idx(v: Any): Int = index.getOrElseUpdate(v, {
      ids += v; ids.length - 1
    })
    val parent = scala.collection.mutable.ArrayBuffer.empty[Int]
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    rows.foreach { r =>
      val a = idx(r.get(0)); val b = idx(r.get(1))
      while (parent.length < ids.length) parent += parent.length
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(rb) = ra
    }
    // min id per root, under the column type's ordering (matches the
    // SQL min/least the distributed path uses)
    val ordering: Ordering[Any] = (idType match {
      case org.apache.spark.sql.types.LongType =>
        Ordering.Long.on((v: Any) => v.asInstanceOf[Long])
      case org.apache.spark.sql.types.IntegerType =>
        Ordering.Int.on((v: Any) => v.asInstanceOf[Int])
      case org.apache.spark.sql.types.StringType =>
        Ordering.String.on((v: Any) => v.asInstanceOf[String])
      case other => throw new IllegalArgumentException(
        s"unsupported id type for local components: $other")
    })
    val minOfRoot = scala.collection.mutable.HashMap.empty[Int, Any]
    ids.indices.foreach { i =>
      val r = find(i)
      val v = ids(i)
      minOfRoot.get(r) match {
        case Some(m) if ordering.lteq(m, v) => ()
        case _ => minOfRoot(r) = v
      }
    }
    val out = ids.indices.map { i =>
      org.apache.spark.sql.Row(ids(i), minOfRoot(find(i)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", idType),
        org.apache.spark.sql.types.StructField("component", idType))))
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
