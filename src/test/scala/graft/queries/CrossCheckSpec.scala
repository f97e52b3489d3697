package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Cross-validation of alternative plans for the same semantics —
  * native session_window vs the window-function sessionization (e02),
  * and approximate sketches vs exact aggregates. */
class CrossCheckSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("native session_window agrees with the lag/sum sessionization") {
    val ev = Tables(spark, dir, "events")
    val native = ev
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
    val manual = graft.SparkEntry.queries("e02_sessionize")(spark, dir)
    // same number of sessions per user, same event multiset sizes
    val a = native.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_total"))
    val b = manual.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_total"))
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("approx_count_distinct lands within 5% of exact") {
    val li = Tables(spark, dir, "lineitem")
    val (exact, approx) = (
      li.select(countDistinct("l_partkey")).head().getLong(0),
      li.select(approx_count_distinct("l_partkey")).head().getLong(0))
    val err = math.abs(approx - exact).toDouble / exact
    assert(err < 0.05, s"exact=$exact approx=$approx err=$err")
  }

  test("approx percentile brackets the exact percentile") {
    val li = Tables(spark, dir, "lineitem")
    val exact = li.select(expr("percentile(l_quantity, 0.5)"))
      .head().getDouble(0)
    val approx = li.select(
      percentile_approx(col("l_quantity"), lit(0.5), lit(10000)))
      .head().getDouble(0)
    assert(math.abs(approx - exact) <= 1.0,
      s"exact=$exact approx=$approx")
  }

  test("codegen l2 distance agrees with quantized-oracle distances (v03)") {
    // the oracle-checked v03 distances (quantized) must agree with the
    // production double-precision codegen path to quantization error
    val v03 = graft.SparkEntry.queries("v03_knn_bruteforce")(spark, dir)
    val emb = Tables(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val prod = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        call_function("graft_l2_distance",
          col("embedding"), col("qv")).as("pd"))
    val joined = v03.join(prod, Seq("query_id", "neighbor_id"))
      .select(abs(col("dist") - col("pd")).as("delta"))
      .agg(max("delta")).head().getDouble(0)
    assert(joined < 1e-4, s"max delta $joined")
  }
}
