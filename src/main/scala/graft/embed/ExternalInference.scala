package graft.embed

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Concrete external-model inference operators (SURVEY.md §2.10 R7 /
  * §2.11 V1 — the reference's two out-of-process model calls):
  *
  *  - batched document EMBEDDING against a remote encoder
  *    (ref `generate_embeddings.py:245-272`: process-cached
  *    SentenceTransformer singleton, batch 50 at `:277,326`,
  *    zero-vector fallback on any per-call failure at `:268-272`);
  *  - LLM FILL of missing text fields
  *    (ref `generate_mock_data.py:42-65,130-133`: per-row Ollama
  *    prompt for null/empty `product_description`, empty-string
  *    fallback on error, non-missing rows untouched).
  *
  * The model boundary is [[InferenceTransport]] — a serializable
  * FACTORY shipped to executors. The live client (HTTP pool, ONNX
  * session, JNI handle) is created lazily ON the executor and cached
  * per (JVM, cacheKey) in [[InferenceClientCache]], mirroring the
  * reference's `_model` global: a 1000-executor job opens 1000
  * clients, not one per task or per row. Tasks of the same executor
  * share the client, so implementations must be thread-safe.
  *
  * Failure semantics follow the reference exactly: a failed/misshapen
  * batch call degrades to the per-row fallback (zero vector / fill
  * default) after `maxAttempts` tries — one poisoned batch must never
  * fail a 100 TB job, and the fallback is per-BATCH, so a transient
  * endpoint error cannot zero out a whole partition.
  */
trait InferenceClient {
  /** Embed one batch; must return one vector per input text. */
  def embed(texts: Seq[String]): Seq[Array[Float]]

  /** Complete one batch of prompts; one string per prompt. */
  def complete(prompts: Seq[String]): Seq[String]
}

/** Serializable factory for a per-executor [[InferenceClient]]. */
trait InferenceTransport extends Serializable {
  /** Identity of the endpoint+model: clients are cached per
    * (executor JVM, cacheKey), so two transports with the same key
    * share one client. */
  def cacheKey: String

  /** Open the live client — called at most once per (JVM, cacheKey). */
  def connect(): InferenceClient
}

/** Executor-side client cache (the reference's `_model` singleton,
  * `generate_embeddings.py:245-255`). */
object InferenceClientCache {
  private val clients =
    scala.collection.concurrent.TrieMap.empty[String, InferenceClient]

  /** Lock-free hit path; creation is synchronized so concurrent first
    * tasks on one executor open exactly ONE client (TrieMap's
    * getOrElseUpdate alone may evaluate the thunk twice under a race —
    * a leaked duplicate connection pool on every executor start). */
  def get(transport: InferenceTransport): InferenceClient =
    clients.getOrElse(transport.cacheKey, this.synchronized {
      clients.getOrElseUpdate(transport.cacheKey, transport.connect())
    })

  /** Test/lifecycle hook: drop cached clients (e.g. between suites). */
  def clear(): Unit = clients.clear()
}

/** [[TextEmbedder]] backed by a remote encoder through an injectable
  * transport: per-executor client cache, bounded retries, zero-vector
  * fallback per failed batch. Plugs into
  * [[EmbeddingPipeline.embedDocuments]]/[[EmbeddingPipeline.search]]
  * unchanged — the plan (mapPartitions over batch-50 groups) is
  * identical to the deterministic [[HashingEmbedder]] path. */
final case class ExternalEmbedder(transport: InferenceTransport, dim: Int,
    maxAttempts: Int = 2) extends TextEmbedder {
  require(maxAttempts >= 1, "maxAttempts must be >= 1")

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    val client = InferenceClientCache.get(transport)
    var attempt = 0
    var out: Seq[Array[Float]] = null
    while (out == null && attempt < maxAttempts) {
      attempt += 1
      try {
        val r = client.embed(texts)
        // a response of the wrong shape is a failure, not data
        if (r != null && r.length == texts.length &&
          r.forall(v => v != null && v.length == dim)) out = r
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    // ref `:268-272`: zeros of the proper dimension, per text
    if (out == null) texts.map(_ => new Array[Float](dim)) else out
  }
}

/** Batched LLM fill of a missing text column (R7). Rows whose
  * `targetCol` is null or empty get `complete(prompt)`; everything
  * else streams through untouched. Batches are formed per partition
  * over the MISSING rows only, so a mostly-filled table sends almost
  * nothing to the model. A failed batch (after `maxAttempts`) fills
  * `fallback` (the reference fills `''`, `generate_mock_data.py:63-65`).
  */
object LlmFill {

  def fillMissing(df: DataFrame, targetCol: String, promptCol: Column,
      transport: InferenceTransport, batchSize: Int = 50,
      maxAttempts: Int = 2, fallback: String = ""): DataFrame = {
    require(batchSize >= 1 && maxAttempts >= 1,
      "batchSize and maxAttempts must be >= 1")
    val withPrompt = df.withColumn("__prompt", promptCol.cast("string"))
    val schema = withPrompt.schema
    val ti = schema.fieldIndex(targetCol)
    val pi = schema.fieldIndex("__prompt")
    val enc = org.apache.spark.sql.Encoders.row(schema)

    val filled = withPrompt.mapPartitions { it =>
      // missing rows pack into full batchSize model calls; complete
      // rows stream straight through (row order within a partition is
      // not preserved across the two streams — DataFrames carry no
      // order contract). Memory held: one batch + a small output queue.
      new Iterator[Row] {
        private val pending = scala.collection.mutable.Queue.empty[Row]
        private val batch = scala.collection.mutable.ArrayBuffer.empty[Row]
        private def missing(r: Row): Boolean =
          r.isNullAt(ti) || r.getString(ti).isEmpty

        private def flushBatch(): Unit = {
          if (batch.nonEmpty) {
            val prompts = batch.toSeq.map(r =>
              if (r.isNullAt(pi)) "" else r.getString(pi))
            val client = InferenceClientCache.get(transport)
            var attempt = 0
            var out: Seq[String] = null
            while (out == null && attempt < maxAttempts) {
              attempt += 1
              try {
                val r = client.complete(prompts)
                if (r != null && r.length == prompts.length) out = r
              } catch { case scala.util.control.NonFatal(_) => () }
            }
            val fills = if (out == null) prompts.map(_ => fallback) else out
            batch.toSeq.zip(fills).foreach { case (r, v) =>
              // ref `:132`: str(description) if not None else ''
              pending.enqueue(Row.fromSeq(
                r.toSeq.updated(ti, if (v == null) fallback else v)))
            }
            batch.clear()
          }
        }

        private def refill(): Unit = {
          while (pending.isEmpty && it.hasNext) {
            val r = it.next()
            if (!missing(r)) pending.enqueue(r)
            else {
              batch += r
              if (batch.size >= batchSize) flushBatch()
            }
          }
          if (pending.isEmpty) flushBatch() // input exhausted: remainder
        }

        override def hasNext: Boolean = { refill(); pending.nonEmpty }
        override def next(): Row = { refill(); pending.dequeue() }
      }
    }(enc)
    filled.drop("__prompt")
  }
}
