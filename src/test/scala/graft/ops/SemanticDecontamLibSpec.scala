package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** The library form of semantic decontamination
  * ([[SemanticDecontam.flagged]]) against its oracle twin
  * (`d17_semantic_decontam`): same pair set, same cosines to within
  * quantization error — the LibraryParitySpec stance, transferring
  * the cross-engine guarantee to the library surface. The two forms
  * differ numerically on purpose (the query works in round(x*1e6)
  * longs for DuckDB bit-parity, the library in raw doubles; fixture
  * margins dwarf the difference — measured min |cos−τ| 5.8e-5 vs
  * ~1e-6 quantization error).
  */
class SemanticDecontamLibSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val Mod = 23
  private val Tau = 0.3

  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  test("library form reproduces the d17 oracle pair set; cosines " +
      "agree to quantization error") {
    val corpus = emb.filter(col("vec_id") % Mod =!= 0)
    val eval = emb.filter(col("vec_id") % Mod === 0)
    // the query's seed convention: vec_id < 8 of the FULL table
    val cents = VectorDedupIndex.seedCentroids(
      emb.filter(col("vec_id") < 8), "vec_id", "embedding", 8)
    val got = SemanticDecontam.flagged(corpus, "vec_id", "embedding",
        eval, "vec_id", "embedding", cents, Tau)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val want = SparkEntry.queries("d17_semantic_decontam")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(got.keySet == want.keySet,
      s"missing=${(want.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- want.keySet).take(5)}")
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-5, s"cos drift at $k: $v vs ${want(k)}")
    }
    assert(got.nonEmpty)
  }

  test("the library plan assigns map-side: no exchange feeds the " +
      "assignment, and the verify join is broadcast") {
    val corpus = emb.filter(col("vec_id") % Mod =!= 0)
    val eval = emb.filter(col("vec_id") % Mod === 0)
    val cents = VectorDedupIndex.seedCentroids(
      emb.filter(col("vec_id") < 8), "vec_id", "embedding", 8)
    val df = SemanticDecontam.flagged(corpus, "vec_id", "embedding",
      eval, "vec_id", "embedding", cents, Tau)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the oracle twin needs a groupBy (argmin over a crossJoin) to
    // assign cells; the library argmin is a literal expression — the
    // only aggregation in this plan is the tiny cell-stats one
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tau <= 0 is rejected: the Cauchy-Schwarz cap is only an " +
      "upper bound for positive thresholds (ADVICE r13)") {
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
    val df = Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      SemanticDecontam.flagged(df, "vec_id", "embedding",
        df, "vec_id", "embedding", cents, 0.0)
    }
    assert(e.getMessage.contains("tau"))
  }

  test("duplicate centroid cell ids are rejected: centroids.toMap " +
      "would silently keep the last entry while the assignment " +
      "matrix keeps both rows (ADVICE r14)") {
    val dup = Seq((0L, Seq(1.0, 0.0)), (0L, Seq(0.0, 1.0)))
    val df = Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      SemanticDecontam.flagged(df, "vec_id", "embedding",
        df, "vec_id", "embedding", dup, 0.3)
    }
    assert(e.getMessage.contains("distinct"))
  }
}
