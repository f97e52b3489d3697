package graft.embed

import java.nio.file.{Files, Path, Paths}

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** WordPiece is pure — unit-tested here with no runtime anywhere in
  * the loop (the ADVICE/verdict stance: the tokenization half of the
  * real-model leg must not need the native half to be verifiable). */
class WordPieceSpec extends AnyFunSuite {

  private val toy = WordPiece.fromTokens(Seq(
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "hello", "world",
    "un", "##aff", "##able", ",", "the", "a"), lowercase = true)

  test("greedy longest-match subwords with ## continuations") {
    assert(toy.encode("hello world", 16).toSeq ==
      Seq(2L, 4L, 5L, 3L)) // [CLS] hello world [SEP]
    assert(toy.encode("unaffable", 16).toSeq ==
      Seq(2L, 6L, 7L, 8L, 3L)) // un ##aff ##able
  }

  test("unknown words collapse to [UNK], not a partial match") {
    assert(toy.encode("xyzzy", 16).toSeq == Seq(2L, 1L, 3L))
    // 'unz': 'un' matches but the '##z' tail has no piece → whole
    // word is UNK (the published wordpiece behavior)
    assert(toy.encode("unz", 16).toSeq == Seq(2L, 1L, 3L))
  }

  test("punctuation splits out as standalone tokens; lowercasing applies") {
    assert(toy.encode("Hello, world", 16).toSeq ==
      Seq(2L, 4L, 9L, 5L, 3L)) // hello , world
  }

  test("truncation respects maxSeqLen and always terminates with [SEP]") {
    val e = toy.encode("hello world the a hello world", 5)
    assert(e.length == 5 && e.head == 2L && e.last == 3L)
  }

  test("null/empty text is [CLS][SEP], never a throw") {
    assert(toy.encode(null, 16).toSeq == Seq(2L, 3L))
    assert(toy.encode("", 16).toSeq == Seq(2L, 3L))
  }
}

/** Drives [[OnnxTransport]]'s REFLECTIVE client through a stub
  * `ai.onnxruntime` compiled at test time with the JDK compiler —
  * same classes/signatures as the public onnxruntime Java API, with
  * deterministic math in place of the native session. This is the
  * recorded green run of the reflective plumbing the sandbox can
  * produce (no runtime binary here, zero egress); `OnnxLiveSpec`
  * binds the identical code to a REAL runtime+model where
  * SPARK_GRAFT_ONNX_* point at one. */
object OnnxStubRuntime {
  /** hidden-state value the stub emits for (tokenId, dim j) — the
    * spec recomputes pooling against this. */
  val H = 8

  private val sources = Map(
    "OrtEnvironment" ->
      """package ai.onnxruntime;
        |public class OrtEnvironment {
        |  private static final OrtEnvironment I = new OrtEnvironment();
        |  public static OrtEnvironment getEnvironment() { return I; }
        |  public OrtSession createSession(String path,
        |      OrtSession.SessionOptions o) { return new OrtSession(path); }
        |}""".stripMargin,
    "OnnxTensor" ->
      // AutoCloseable like the real OnnxTensor, with fault injection
      // + lifecycle logging driven by SYSTEM PROPERTIES (JVM-global,
      // so the spec reaches across the client's private classloader):
      // failOn=N throws on the Nth createTensor (native alloc
      // failure), throwOnClose=N throws from that tensor's close(),
      // log=<file> appends created-N/closed-N events. All default
      // off, so the happy-path tests see the plain stub.
      """package ai.onnxruntime;
        |public class OnnxTensor implements AutoCloseable {
        |  public final Object data;
        |  public final int seq;
        |  private static int calls = 0;
        |  private OnnxTensor(Object d, int s) { data = d; seq = s; }
        |  public static synchronized OnnxTensor createTensor(
        |      OrtEnvironment env, Object data) {
        |    calls++;
        |    if (String.valueOf(calls).equals(
        |        System.getProperty("graft.onnx.stub.failOn", "")))
        |      throw new RuntimeException(
        |        "stub native alloc failure on createTensor call " + calls);
        |    log("created-" + calls);
        |    return new OnnxTensor(data, calls);
        |  }
        |  public void close() {
        |    log("closed-" + seq);
        |    if (String.valueOf(seq).equals(
        |        System.getProperty("graft.onnx.stub.throwOnClose", "")))
        |      throw new RuntimeException("stub close failure " + seq);
        |  }
        |  private static void log(String ev) {
        |    String f = System.getProperty("graft.onnx.stub.log", "");
        |    if (f.isEmpty()) return;
        |    try {
        |      java.nio.file.Files.write(java.nio.file.Paths.get(f),
        |        java.util.Arrays.asList(ev),
        |        java.nio.charset.StandardCharsets.UTF_8,
        |        java.nio.file.StandardOpenOption.CREATE,
        |        java.nio.file.StandardOpenOption.APPEND);
        |    } catch (java.io.IOException e) {
        |      throw new RuntimeException(e);
        |    }
        |  }
        |}""".stripMargin,
    "OnnxValue" ->
      """package ai.onnxruntime;
        |public class OnnxValue {
        |  private final Object v;
        |  OnnxValue(Object v) { this.v = v; }
        |  public Object getValue() { return v; }
        |}""".stripMargin,
    "OrtSession" ->
      """package ai.onnxruntime;
        |import java.util.Map;
        |public class OrtSession {
        |  public static class SessionOptions { public SessionOptions() {} }
        |  private final String path;
        |  OrtSession(String p) { path = p; }
        |  // deterministic fake hidden states: every position (real OR
        |  // padding) gets a token-id-derived vector, so mask-blind
        |  // pooling would be visibly wrong (padding-invariance test)
        |  public Result run(Map<String, OnnxTensor> inputs) {
        |    long[][] ids = (long[][]) inputs.get("input_ids").data;
        |    int H = 8;
        |    float[][][] out = new float[ids.length][][];
        |    for (int b = 0; b < ids.length; b++) {
        |      out[b] = new float[ids[b].length][H];
        |      for (int t = 0; t < ids[b].length; t++)
        |        for (int j = 0; j < H; j++)
        |          out[b][t][j] =
        |            ((ids[b][t] * 31 + j * 7) % 101 - 50) / 50.0f;
        |    }
        |    return new Result(out);
        |  }
        |  public static class Result implements AutoCloseable {
        |    private final Object v;
        |    Result(Object v) { this.v = v; }
        |    public OnnxValue get(int i) { return new OnnxValue(v); }
        |    public void close() {}
        |  }
        |}""".stripMargin)

  /** Compile the stub into a fresh dir; returns the dir to use as
    * OnnxTransport.runtimePath. */
  def compile(): Path = {
    val dir = Files.createTempDirectory("graft_onnx_stub")
    val files = sources.map { case (name, src) =>
      val p = dir.resolve(s"$name.java")
      Files.writeString(p, src)
      p.toString
    }.toSeq
    val javac = javax.tools.ToolProvider.getSystemJavaCompiler
    require(javac != null, "JDK compiler unavailable")
    val rc = javac.run(null, null, null,
      (Seq("-d", dir.toString) ++ files): _*)
    require(rc == 0, s"stub compile failed: $rc")
    dir
  }

  /** the stub's per-(tokenId, j) hidden value, for oracle recompute */
  def hidden(id: Long, j: Int): Float =
    ((id * 31 + j * 7) % 101 - 50) / 50.0f
}

class OnnxStubRuntimeSpec extends SparkSpec {

  private lazy val runtime = OnnxStubRuntime.compile()
  private lazy val (modelPath, vocabPath) = {
    val dir = Files.createTempDirectory("graft_onnx_model")
    val m = dir.resolve("model.onnx")
    Files.write(m, Array[Byte](0x08, 0x01)) // presence is the contract
    val v = dir.resolve("vocab.txt")
    Files.writeString(v, Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]",
      "hello", "world", "the", "a", "un", "##aff", "##able")
      .mkString("\n"))
    (m.toString, v.toString)
  }

  private def transport() = OnnxTransport(
    runtime.toString, modelPath, vocabPath, dim = OnnxStubRuntime.H)

  test("reflective client: batch embed, unit-norm, deterministic") {
    val client = transport().connect()
    val out = client.embed(Seq("hello world", "the a"))
    assert(out.length == 2 && out.forall(_.length == OnnxStubRuntime.H))
    out.foreach { v =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5, s"norm=$n")
    }
    val again = client.embed(Seq("hello world"))
    assert(out(0).sameElements(again(0)))
    assert(!out(0).sameElements(out(1)))
  }

  test("pooling is mask-aware: padding cannot leak into the embedding") {
    val client = transport().connect()
    // "hello" alone (no padding) vs "hello" padded to the longer
    // batch-mate's length — the stub emits garbage at pad positions,
    // so equality here proves the mask gates the mean-pool
    val alone = client.embed(Seq("hello"))(0)
    val padded = client.embed(
      Seq("hello", "hello world the a un hello world"))(0)
    assert(alone.sameElements(padded))
  }

  test("pooled values match a hand-computed mean over real positions") {
    val client = transport().connect()
    val got = client.embed(Seq("hello"))(0)
    // ids: [CLS]=2 hello=4 [SEP]=3
    val ids = Seq(2L, 4L, 3L)
    val mean = (0 until OnnxStubRuntime.H).map(j =>
      ids.map(OnnxStubRuntime.hidden(_, j)).sum / ids.length)
    val norm = math.sqrt(mean.map(x => x * x.toDouble).sum)
    val want = mean.map(x => (x / norm).toFloat)
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-5f, s"$g vs $w") }
  }

  test("the full pipeline runs on the reflective embedder unchanged") {
    import spark.implicits._
    val docs = Seq(("p1", "hello world"), ("p2", "the a"),
      ("p3", "unaffable")).toDF("product_code", "text")
    val embedded = EmbeddingPipeline.embedDocuments(
      docs, ExternalEmbedder(transport(), dim = OnnxStubRuntime.H))
    val rows = embedded.collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[Seq[Float]]("embedding")
      .length == OnnxStubRuntime.H))
  }

  test("missing runtime or model fails connect() loudly — config, not data") {
    intercept[IllegalArgumentException] {
      OnnxTransport("/nonexistent/onnxruntime.jar", modelPath,
        vocabPath, dim = 8).connect()
    }
    intercept[IllegalArgumentException] {
      OnnxTransport(runtime.toString, "/nonexistent/model.onnx",
        vocabPath, dim = 8).connect()
    }
  }

  test("completions are refused — this leg embeds only") {
    intercept[UnsupportedOperationException] {
      transport().connect().complete(Seq("prompt"))
    }
  }

  /** run `body` with stub fault-injection props set, reading back the
    * created-N/closed-N event log; props always cleared after. */
  private def withStubLog(props: (String, String)*)(body: => Unit)
      : Seq[String] = {
    val log = Files.createTempFile("onnx_stub_log", ".txt")
    Files.deleteIfExists(log)
    System.setProperty("graft.onnx.stub.log", log.toString)
    props.foreach { case (k, v) => System.setProperty(k, v) }
    try {
      body
      if (Files.exists(log))
        Files.readAllLines(log).toArray(Array.empty[String]).toSeq
      else Seq.empty
    } finally {
      System.clearProperty("graft.onnx.stub.log")
      props.foreach { case (k, _) => System.clearProperty(k) }
    }
  }

  test("a mid-creation failure closes the already-created tensors " +
      "(ADVICE r17: no leak window before the try)") {
    val events = withStubLog("graft.onnx.stub.failOn" -> "2") {
      val client = transport().connect()
      val e = intercept[java.lang.reflect.InvocationTargetException] {
        client.embed(Seq("hello world"))
      }
      assert(e.getCause.getMessage.contains("native alloc failure"),
        e.getCause.getMessage)
    }
    // tensor 1 (input_ids) was created before attention_mask's
    // creation threw — the finally must have closed it
    assert(events.contains("created-1"), events)
    assert(events.contains("closed-1"), events)
    assert(!events.exists(_.startsWith("created-2")), events)
  }

  test("a throwing close() does not skip the remaining tensors " +
      "and does not fail the batch") {
    val events = withStubLog("graft.onnx.stub.throwOnClose" -> "1") {
      val client = transport().connect()
      // the embed itself must SUCCEED: cleanup failure of one tensor
      // is tolerated per-tensor, never surfaced as a batch failure
      val out = client.embed(Seq("hello world"))
      assert(out.length == 1 && out(0).length == OnnxStubRuntime.H)
    }
    // both input tensors saw a close() attempt despite tensor 1's
    // close throwing
    assert(events.contains("closed-1"), events)
    assert(events.contains("closed-2"), events)
  }
}
