package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Guard for v13's one legal cross-engine divergence window: the SET
  * of top-K hits is the oracle contract (rank is projected away), and
  * the engine's internal-hash tie order vs the oracle's doc_id
  * tiebreak only matters when a distance TIE straddles the rank-K
  * boundary — which exact-duplicate fixture texts (they exist; the
  * dedup suites depend on them) can produce after a fixture
  * regeneration. This spec fails LOUDLY with the boundary distances
  * when that happens, instead of leaving a bare hash mismatch in the
  * correctness record. */
class V13BoundarySpec extends SparkSpec {
  import spark.implicits._

  private def boundary(dir: String): (Double, Double) = {
    val (store, _) = VectorSuite.v13StoreCatalog(spark, dir)
    val qvec = VectorSuite.FlakyClient.featureHash16(VectorSuite.V13QueryText)
    val dists = store
      .select(col("product_code"), col("embedding").cast("array<double>").as("v"))
      .withColumn("dist",
        sqrt(aggregate(zip_with(col("v"), lit(qvec.map(_.toDouble)),
          (x, y) => (x - y) * (x - y)), lit(0.0d), (s, x) => s + x)))
      .select("dist").as[Double].collect().sorted
    (dists(VectorSuite.V13K - 1), dists(VectorSuite.V13K))
  }

  test("no distance tie straddles the rank-K boundary (sf0.01)") {
    val (kth, next) = boundary("/root/testdata/sf0.01")
    assert(kth < next,
      s"v13 top-K boundary tie: dist(K)=$kth == dist(K+1)=$next — " +
        "the hit SET is no longer deterministic across engines; " +
        "adjust V13K or the query text for this fixture")
  }

  test("no distance tie straddles the rank-K boundary (sf0.1)") {
    val (kth, next) = boundary("/root/testdata/sf0.1")
    assert(kth < next,
      s"v13 top-K boundary tie: dist(K)=$kth == dist(K+1)=$next")
  }
}
