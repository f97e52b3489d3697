package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fixture invariants the oracle comparison silently depends on.
  *
  * d03/d04/d07 apply `Blocking` with `DedupSuite.MaxBucket`, but their
  * DuckDB oracle SQL is uncapped — the comparison is only valid while no
  * fixture bucket approaches the cap. If the driver's test data ever
  * grows a bucket past it, THIS spec must be the thing that fails (with
  * a message naming the cap), not an inscrutable oracle hash mismatch.
  */
class FixtureInvariantSpec extends SparkSpec {

  // the SF the driver's oracle comparison runs at
  private val oracleDir = "/root/testdata/sf0.01"

  test("LSH band buckets stay far below MaxBucket at the oracle SF") {
    val maxBucket = DedupSuite.bandsCached(spark, oracleDir)
      .groupBy("band", "bkey").agg(count(lit(1)).as("n"))
      .agg(max("n")).head().getLong(0)
    assert(maxBucket <= DedupSuite.MaxBucket / 10,
      s"largest LSH band bucket ($maxBucket) is within 10x of " +
        s"MaxBucket (${DedupSuite.MaxBucket}); the capped Spark side " +
        "and the uncapped DuckDB oracle for d03/d04/d07 are about to " +
        "diverge — regenerate the fixture or raise the cap")
  }

  test("SimHash half-blocks stay far below MaxBucket at the oracle SF") {
    // same invariant for d06: rebuild its blocked frame from the
    // oracle-checked d05 signatures
    val sh = graft.SparkEntry.queries("d05_simhash")(spark, oracleDir)
    val maxBlock = sh.select(col("doc_id"), explode(array(
        concat(lit("hi:"), expr("simhash div 65536")),
        concat(lit("lo:"), col("simhash") % 65536))).as("block"))
      .groupBy("block").agg(count(lit(1)).as("n"))
      .agg(max("n")).head().getLong(0)
    assert(maxBlock <= DedupSuite.MaxBucket / 10,
      s"largest SimHash block ($maxBlock) is within 10x of " +
        s"MaxBucket (${DedupSuite.MaxBucket}); d06's capped Spark side " +
        "and its uncapped oracle are about to diverge")
  }

  test("per-row simhash32 expression equals the d05 relational plan") {
    // the streaming near-dup path signs documents with the pure
    // expression form; it must produce the identical signature the
    // oracle-checked groupBy plan computes
    val dir = "/root/testdata/sf0.001"
    val viaExpr = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        graft.functions.TextOps.simhash32(col("text")).as("simhash"))
    val viaPlan = graft.SparkEntry.queries("d05_simhash")(spark, dir)
    assert(viaExpr.exceptAll(viaPlan).isEmpty &&
      viaPlan.exceptAll(viaExpr).isEmpty,
      "expression and relational SimHash diverge")
  }
}
