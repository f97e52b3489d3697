package graft.embed

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.etl.{DocTemplate, ProductDoc}
import graft.vector.VectorSearch

/** The reference's embedding pipeline end-to-end (SURVEY.md §3.3, ref
  * `scripts/transform/generate_embeddings.py`): product rows → templated
  * Vietnamese documents (+ metadata) → batched embedding → vector store
  * → top-k semantic search with catalog join-back.
  *
  * The model boundary is [[TextEmbedder]]: a batched, per-partition
  * interface matching the reference's cached-singleton SentenceTransformer
  * (`:245-272`, batch 50 at `:277`). [[HashingEmbedder]] is the
  * deterministic in-engine implementation (feature hashing + L2
  * normalize, zero-vector fallback on empty text — the reference's
  * failure fallback `:268-272`); a real ONNX/JNI encoder drops in
  * without changing any plan.
  */
trait TextEmbedder extends Serializable {
  def dim: Int

  /** Embed one batch of texts (size bounded by the pipeline). */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]
}

/** Deterministic feature-hashing embedder: token 60-bit hash → bucket,
  * sign from a second hash bit, L2-normalized. */
final case class HashingEmbedder(dim: Int = 64) extends TextEmbedder {
  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    texts.map { t =>
      val v = new Array[Float](dim)
      if (t != null && t.nonEmpty) {
        t.split("\\s+").foreach { tok =>
          val h = graft.functions.TextOps.md5Long60Jvm(tok)
          val bucket = (h % dim).toInt
          val sign = if ((h / dim) % 2 == 0) 1.0f else -1.0f
          v(bucket) += sign
        }
        val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
        if (norm > 0) (0 until dim).foreach(i => v(i) = (v(i) / norm).toFloat)
      }
      v // zero vector when text is empty — the reference's fallback
    }
}

object EmbeddingPipeline {

  /** Product rows → (product_code, text, metadata) documents
    * (ref `prepare_documents`, `:225-243`). */
  def buildDocuments(products: Dataset[ProductDoc]): DataFrame = {
    val spark = products.sparkSession
    import spark.implicits._
    products
      .map(p => (p.product_code, DocTemplate.render(p),
        DocTemplate.metadata(p)))
      .toDF("product_code", "text", "metadata")
  }

  /** Batched distributed embedding: mapPartitions groups rows into
    * `batchSize` chunks, one embedder per partition (the per-executor
    * model-cache pattern; ref batch-of-50 commits `:277,326`). */
  def embedDocuments(docs: DataFrame, embedder: TextEmbedder,
      batchSize: Int = 50): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("product_code", "text")
      .as[(String, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val vecs = embedder.embedBatch(batch.map(_._2))
          batch.zip(vecs).map { case ((code, _), v) => (code, v) }
        }
      }
      .toDF("product_code", "embedding")
  }

  /** Top-k semantic search with catalog join-back (ref `test_search` +
    * `get_product_details`, `:364-493`): embed the query, kNN over the
    * store, join metadata back, score = 1 - distance (V4).
    *
    * Contract: `store` is scanned TWICE (once by the kNN, once for the
    * id→code join-back) — the reference's store is a materialized
    * vector table and so should this one be; pass a read-from-disk or
    * cached frame, not an expensive live computation (a computed store
    * re-runs its whole upstream per scan, as v13 deliberately
    * demonstrates at fixture scale). */
  def search(store: DataFrame, catalog: DataFrame,
      queryText: String, embedder: TextEmbedder, k: Int): DataFrame = {
    val spark = store.sparkSession
    val qvec = embedder.embedBatch(Seq(queryText)).head
    val queries = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(0L, qvec.toSeq)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("qid",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("qvec",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
    val withId = store.withColumn("__id", xxhash64(col("product_code")))
    val hits = VectorSearch.knn(
      withId, "__id", "embedding", queries, "qid", "qvec", k)
    hits
      .join(withId.select(col("__id").as("id"), col("product_code")),
        Seq("id"))
      .join(catalog, Seq("product_code"), "left")
      .withColumn("score", lit(1.0) - col("dist"))
      .drop("id", "query_id")
  }
}
