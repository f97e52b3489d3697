package graft.queries

import graft.{SparkEntry, SparkSpec}

/** The suite memo caches (DedupSuite bands/words/simhash, BenchSuite
  * inflated corpus + IVF index) pin executor storage per (session, dir)
  * — `releaseCaches` must return storage to baseline, and the caches
  * must rebuild lazily afterwards. */
class CacheLifecycleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def cachedRddCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  test("releaseCaches returns storage to baseline; caches rebuild lazily") {
    // start clean: other suites sharing this JVM may have left caches
    DedupSuite.releaseCaches(spark)
    BenchSuite.releaseCaches(spark)
    val baseline = cachedRddCount

    // force the dedup memos (bands, words, simhash) and the bench
    // inflated-corpus memo to materialize
    SparkEntry.queries("d04_jaccard_verify")(spark, dir).collect()
    SparkEntry.queries("d06_simhash_pairs")(spark, dir).collect()
    SparkEntry.queries("x02_knn_codegen")(spark, dir).collect()
    assert(cachedRddCount > baseline,
      "expected the suite memos to hold cached RDDs after queries ran")

    DedupSuite.releaseCaches(spark)
    BenchSuite.releaseCaches(spark)
    assert(cachedRddCount == baseline,
      "releaseCaches left cached RDDs behind")

    // lazily rebuilt on next use — same results, caches repopulate
    val again = SparkEntry.queries("d06_simhash_pairs")(spark, dir)
    assert(again.count() > 0)
    assert(cachedRddCount > baseline)
    DedupSuite.releaseCaches(spark)
    BenchSuite.releaseCaches(spark)
    assert(cachedRddCount == baseline)
  }
}
