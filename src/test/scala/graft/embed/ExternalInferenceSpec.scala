package graft.embed

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.ProductDoc

/** Deterministic fake transport: counters live in a companion-style
  * static object so they survive the closure-serialization round trip
  * (in local mode every deserialized copy sees the same JVM statics —
  * exactly how the per-executor cache behaves on a real executor). */
object FakeInference {
  val connects = new AtomicInteger(0)
  val embedCalls = new AtomicInteger(0)
  val completeCalls = new AtomicInteger(0)
  val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
  @volatile var failEmbedContaining: String = null
  @volatile var failFirstAttempt: Boolean = false
  @volatile var misshapen: Boolean = false
  private val attempts =
    scala.collection.concurrent.TrieMap.empty[String, Int]

  def reset(): Unit = {
    connects.set(0); embedCalls.set(0); completeCalls.set(0)
    batchSizes.clear(); failEmbedContaining = null
    failFirstAttempt = false; misshapen = false; attempts.clear()
    InferenceClientCache.clear()
  }

  /** Deterministic "remote" embedding: dim floats derived from text. */
  def vecFor(text: String, dim: Int): Array[Float] =
    Array.tabulate(dim)(i => ((text.length + i) % 7).toFloat)

  final class Client(dim: Int) extends InferenceClient {
    override def embed(texts: Seq[String]): Seq[Array[Float]] = {
      embedCalls.incrementAndGet()
      batchSizes.add(texts.length)
      val key = texts.mkString("")
      val n = attempts.updateWith(key)(c => Some(c.getOrElse(0) + 1)).get
      if (failFirstAttempt && n == 1)
        throw new RuntimeException("transient endpoint error")
      if (failEmbedContaining != null &&
        texts.exists(_.contains(failEmbedContaining)))
        throw new RuntimeException("poisoned batch")
      if (misshapen) texts.map(t => vecFor(t, dim + 1)) // wrong dim
      else texts.map(vecFor(_, dim))
    }

    override def complete(prompts: Seq[String]): Seq[String] = {
      completeCalls.incrementAndGet()
      batchSizes.add(prompts.length)
      if (failEmbedContaining != null &&
        prompts.exists(_.contains(failEmbedContaining)))
        throw new RuntimeException("poisoned batch")
      prompts.map(p => s"desc:$p")
    }
  }
}

final case class FakeTransport(dim: Int) extends InferenceTransport {
  override def cacheKey: String = s"fake:$dim"
  override def connect(): InferenceClient = {
    FakeInference.connects.incrementAndGet()
    new FakeInference.Client(dim)
  }
}

class ExternalInferenceSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 8

  private def docs(n: Int) =
    (1 to n).map(i => (s"P-$i", s"doc text number $i " + ("x" * (i % 5))))
      .toDF("product_code", "text")

  test("external embedding: batch-50 packing, one client per JVM") {
    FakeInference.reset()
    val out = EmbeddingPipeline.embedDocuments(
      docs(137).repartition(4), ExternalEmbedder(FakeTransport(Dim), Dim),
      batchSize = 50)
      .as[(String, Array[Float])].collect().toMap
    assert(out.size == 137)
    // every vector matches the deterministic remote function
    val texts = docs(137).as[(String, String)].collect().toMap
    out.foreach { case (code, v) =>
      assert(v.toSeq == FakeInference.vecFor(texts(code), Dim).toSeq)
    }
    // batches never exceed 50, and the call count is the per-partition
    // ceiling sum (4 partitions × ceil(rows/50))
    val sizes = FakeInference.batchSizes.toArray(Array.empty[Integer])
    assert(sizes.nonEmpty && sizes.forall(_ <= 50))
    assert(sizes.map(_.toInt).sum == 137)
    // the per-executor cache opened ONE client despite 4 partitions
    assert(FakeInference.connects.get() == 1)
  }

  test("a poisoned batch degrades to zero vectors; other batches real") {
    FakeInference.reset()
    FakeInference.failEmbedContaining = "number 3 "
    val out = EmbeddingPipeline.embedDocuments(
      docs(10).coalesce(1), ExternalEmbedder(FakeTransport(Dim), Dim),
      batchSize = 4)
      .as[(String, Array[Float])].collect().toMap
    // rows 1-4 share the poisoned batch → zero vectors (ref fallback);
    // remaining batches are embedded normally
    assert(out("P-3").forall(_ == 0f))
    assert(out("P-1").forall(_ == 0f))
    assert(out("P-5").toSeq != Seq.fill(Dim)(0f))
    assert(out.size == 10)
  }

  test("misshapen responses (wrong dim) are failures, not data") {
    FakeInference.reset()
    FakeInference.misshapen = true
    val out = EmbeddingPipeline.embedDocuments(
      docs(3).coalesce(1), ExternalEmbedder(FakeTransport(Dim), Dim))
      .as[(String, Array[Float])].collect()
    assert(out.forall { case (_, v) => v.length == Dim && v.forall(_ == 0f) })
  }

  test("transient failure is retried within maxAttempts") {
    FakeInference.reset()
    FakeInference.failFirstAttempt = true
    val out = EmbeddingPipeline.embedDocuments(
      docs(5).coalesce(1),
      ExternalEmbedder(FakeTransport(Dim), Dim, maxAttempts = 2))
      .as[(String, Array[Float])].collect().toMap
    // second attempt succeeded — real vectors, not the zero fallback
    assert(out.values.forall(v => v.toSeq != Seq.fill(Dim)(0f)))
    assert(FakeInference.embedCalls.get() == 2) // one failed + one good
  }

  test("LlmFill: only missing rows prompt the model, batches pack") {
    FakeInference.reset()
    val rows = (1 to 20).map { i =>
      val desc = if (i % 3 == 0) null
        else if (i % 3 == 1) "" else s"already described $i"
      (s"P-$i", s"name $i", desc)
    }.toDF("code", "name", "description")
    val byCode = LlmFill.fillMissing(rows.coalesce(1), "description",
      concat(lit("Viết mô tả cho "), col("name")),
      FakeTransport(Dim), batchSize = 5)
      .as[(String, String, String)].collect().toMap2()
    (1 to 20).foreach { i =>
      val d = byCode(s"P-$i")
      if (i % 3 == 2) assert(d == s"already described $i") // untouched
      else assert(d == s"desc:Viết mô tả cho name $i")
    }
    // 13 missing rows in batches of 5 → 3 calls (5,5,3); filled rows
    // never reach the model
    val sizes = FakeInference.batchSizes.toArray(Array.empty[Integer])
      .map(_.toInt).toSeq
    assert(FakeInference.completeCalls.get() == 3, sizes)
    assert(sizes.sorted == Seq(3, 5, 5))
  }

  test("LlmFill: a failed batch fills the fallback, not an exception") {
    FakeInference.reset()
    FakeInference.failEmbedContaining = "name 2"
    val rows = Seq(("A", "name 1", null), ("B", "name 2", null),
      ("C", "name 3", "kept")).toDF("code", "name", "description")
    val filled = LlmFill.fillMissing(rows.coalesce(1), "description",
      concat(lit("p:"), col("name")), FakeTransport(Dim), batchSize = 2)
      .as[(String, String, String)].collect()
      .map(r => r._1 -> r._3).toMap
    // the batch containing "name 2" fails both attempts → '' fallback
    assert(filled("A") == "" && filled("B") == "")
    assert(filled("C") == "kept")
  }

  test("search runs end-to-end through the external embedder") {
    FakeInference.reset()
    def product(code: String, name: String): ProductDoc =
      ProductDoc(code, name, "brA", 1, "Bánh ngọt", "", s"mô tả $name",
        """{"product_sizes":"Standard","product_prices":"50000"}""",
        0.0, 4.0, 10, 50, 30)
    val catalog = Seq(product("CF-001", "Cà phê sữa đá"),
      product("TS-001", "Trà sữa trân châu")).toDS()
    val embedder = ExternalEmbedder(FakeTransport(Dim), Dim)
    val docs = EmbeddingPipeline.buildDocuments(catalog)
    val store = EmbeddingPipeline.embedDocuments(docs, embedder)
    val hits = EmbeddingPipeline.search(store, catalog.toDF(),
      "cà phê đá xay", embedder, k = 1)
    assert(hits.count() == 1)
    assert(hits.select("score").as[Double].head() <= 1.0)
  }

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2(): Map[A, C] = rows.map(r => r._1 -> r._3).toMap
  }
}
