package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  /** The Sennrich et al. running example corpus (word frequencies
    * low:5 lower:2 newest:6 widest:3), flattened to text rows. */
  private val sennrich: Seq[String] =
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")

  test("learns the Sennrich example merges deterministically") {
    val docs = sennrich.grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
    for (parts <- Seq(1, 5)) {
      val model = BpeTrainer.train(docs.repartition(parts), "text",
        nMerges = 4)
      // pair counts: (e,s)=9 (newest+widest) wins round 1; then
      // (es,t)=9; then (est,</w>)=9; then (l,o)=7 (low+lower)
      assert(model.merges == Seq(("e", "s"), ("es", "t"),
        ("est", BpeCoder_Eow), ("l", "o")),
        s"unexpected merges: ${model.merges}")
    }
  }

  private val BpeCoder_Eow = graft.expr.BpeCoder.Eow

  test("encode applies merges greedily; subwords reassemble the word") {
    val model = BpeTrainer.train(sennrich.toDF("text"), "text", nMerges = 6)
    for (w <- Seq("newest", "lowest", "wildest", "low")) {
      val toks = model.encodeWord(w)
      assert(toks.mkString("") == w + BpeCoder_Eow,
        s"$w subwords don't reassemble: $toks")
    }
    // a trained merge sequence compresses in-vocabulary words
    assert(model.encodeWord("newest").length <
      "newest".length + 1)
  }

  test("distributed encodeCol matches the driver-side coder exactly") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val model = BpeTrainer.train(docs, "text", nMerges = 50, maxVocab = 2000)
    val viaExpr = docs.repartition(7)
      .select(col("doc_id"), model.encodeCol(col("text")).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    docs.as[(Long, String)].collect().foreach { case (id, text) =>
      assert(viaExpr(id) == model.encodeText(text),
        s"doc $id tokenizes differently in the expression path")
    }
    // the learned vocabulary compresses the corpus vs raw characters
    val charCount = docs.select(sum(length(col("text")))).head().getLong(0)
    val tokCount = viaExpr.values.map(_.size.toLong).sum
    assert(tokCount < charCount,
      s"BPE produced $tokCount tokens for $charCount chars")
  }

  test("SQL surface: graft_bpe_encode callable from SQL text") {
    val out = spark.sql(
      """SELECT graft_bpe_encode('low lower',
           array(array('l','o'), array('lo','w'))) AS toks""")
      .as[Seq[String]].head()
    assert(out == Seq("low", "</w>", "low", "e", "r", "</w>"))
  }
}
