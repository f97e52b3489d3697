package graft.embed

import graft.SparkSpec

/** LIVE half of the real-model embedding leg: binds [[OnnxTransport]]
  * to an actual onnxruntime jar + sentence-encoder ONNX export.
  * Cancels (not passes) where the runtime is absent — this build
  * sandbox has no runtime and zero egress, mirroring
  * PgVectorLiveSpec/FfmpegLiveSpec. To run somewhere real:
  *
  *   SPARK_GRAFT_ONNX_RUNTIME=/path/onnxruntime-<ver>.jar \
  *   SPARK_GRAFT_ONNX_MODEL=/path/model.onnx \
  *   SPARK_GRAFT_ONNX_VOCAB=/path/vocab.txt \
  *   SPARK_GRAFT_ONNX_DIM=768 \
  *   sbt "testOnly graft.embed.OnnxLiveSpec"
  *
  * The portable half — tokenizer, reflective binding, mask-aware
  * pooling, normalization, pipeline composition — runs everywhere in
  * [[OnnxStubRuntimeSpec]] against a compiled stub runtime. */
class OnnxLiveSpec extends SparkSpec {

  private def liveTransport(): OnnxTransport = {
    val need = Seq("SPARK_GRAFT_ONNX_RUNTIME", "SPARK_GRAFT_ONNX_MODEL",
      "SPARK_GRAFT_ONNX_VOCAB")
    val missing = need.filterNot(sys.env.contains)
    if (missing.nonEmpty)
      cancel(s"no live ONNX runtime configured (${missing.mkString(", ")} " +
        "unset) — OnnxStubRuntimeSpec covers the portable half")
    OnnxTransport(
      runtimePath = sys.env("SPARK_GRAFT_ONNX_RUNTIME"),
      modelPath = sys.env("SPARK_GRAFT_ONNX_MODEL"),
      vocabPath = sys.env("SPARK_GRAFT_ONNX_VOCAB"),
      dim = sys.env.getOrElse("SPARK_GRAFT_ONNX_DIM", "768").toInt,
      withTokenTypeIds =
        sys.env.get("SPARK_GRAFT_ONNX_TOKEN_TYPE_IDS").contains("1"))
  }

  test("live: real model embeds; similar texts rank above dissimilar") {
    val t = liveTransport()
    val client = InferenceClientCache.get(t)
    val out = client.embed(Seq(
      "a cup of hot chocolate with milk",
      "cocoa drink served warm with cream",
      "quarterly financial report of the steel industry"))
    assert(out.length == 3 && out.forall(_.length == t.dim))
    def cos(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum // unit vectors
    val near = cos(out(0), out(1))
    val far = cos(out(0), out(2))
    assert(near > far,
      s"semantic ranking failed: near=$near far=$far — wrong model?")
  }

  test("live: pipeline end-to-end on the real model") {
    import spark.implicits._
    val docs = Seq(("p1", "dark chocolate truffles"),
      ("p2", "milk tea with boba")).toDF("product_code", "text")
    val t = liveTransport()
    val rows = EmbeddingPipeline.embedDocuments(
      docs, ExternalEmbedder(t, dim = t.dim)).collect()
    assert(rows.length == 2)
    assert(rows.forall(r =>
      r.getAs[Seq[Float]]("embedding").exists(_ != 0.0f)),
      "zero vectors from the live model — fallback fired; check config")
  }
}
