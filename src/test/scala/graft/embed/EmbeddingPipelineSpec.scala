package graft.embed

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.ProductDoc

class EmbeddingPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def product(code: String, name: String, catId: Int,
      cat: String): ProductDoc =
    ProductDoc(code, name, "brA", catId, cat, "", s"mô tả $name",
      """{"product_sizes":"Standard","product_prices":"50000"}""",
      0.0, 4.0, 10, 50, 30)

  private val products = Seq(
    product("CF-001", "Cà phê sữa đá", 10, "Cà phê"),
    product("TS-001", "Trà sữa trân châu", 11, "Trà"),
    product("CA-001", "Bánh kem dâu tây", 1, "Bánh ngọt"),
    product("CA-002", "Bánh mì bơ tỏi", 2, "Bánh mì"))

  test("documents carry rendered text + metadata per product") {
    val docs = EmbeddingPipeline.buildDocuments(products.toDS())
    assert(docs.count() == 4)
    val cf = docs.filter($"product_code" === "CF-001").head()
    assert(cf.getAs[String]("text").contains("THỨC UỐNG"))
    assert(cf.getAs[Map[String, String]]("metadata")("category_name") ==
      "Cà phê")
  }

  test("embedding is batched, normalized, deterministic") {
    val docs = EmbeddingPipeline.buildDocuments(products.toDS())
    val store = EmbeddingPipeline.embedDocuments(docs,
      HashingEmbedder(32), batchSize = 2)
    val vecs = store.as[(String, Array[Float])].collect().toMap
    assert(vecs.size == 4)
    vecs.values.foreach { v =>
      assert(v.length == 32)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5)
    }
    // determinism across runs
    val again = EmbeddingPipeline.embedDocuments(docs,
      HashingEmbedder(32), batchSize = 3)
      .as[(String, Array[Float])].collect().toMap
    assert(vecs.keys.forall(k => vecs(k).toSeq == again(k).toSeq))
  }

  test("empty text embeds to the zero vector (reference fallback)") {
    val v = HashingEmbedder(16).embedBatch(Seq("", null)).map(_.toSeq)
    assert(v == Seq(Seq.fill(16)(0.0f), Seq.fill(16)(0.0f)))
  }

  test("search returns k scored hits joined back to the catalog") {
    val docs = EmbeddingPipeline.buildDocuments(products.toDS())
    val store = EmbeddingPipeline.embedDocuments(docs, HashingEmbedder(64))
    val catalog = products.toDS().toDF()
      .select(col("product_code"), col("product_name"), col("category_name"))
    val hits = EmbeddingPipeline.search(store, catalog,
      "Cà phê sữa đá thức uống", HashingEmbedder(64), k = 2)
      .orderBy("rank").collect()
    assert(hits.length == 2)
    // the coffee doc shares the most tokens with the query → rank 1
    assert(hits(0).getAs[String]("product_code") == "CF-001")
    assert(hits(0).getAs[String]("product_name") == "Cà phê sữa đá")
    val scores = hits.map(_.getAs[Double]("score"))
    assert(scores(0) >= scores(1))
  }
}
