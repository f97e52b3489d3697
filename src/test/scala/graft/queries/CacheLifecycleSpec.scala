package graft.queries

import graft.{SparkEntry, SparkSpec}

/** The suite memo caches (DedupSuite bands/words/simhash, BenchSuite
  * inflated corpus + IVF index) pin executor storage per (session, dir)
  * — `releaseCaches` must remove exactly those blocks, and the caches
  * must rebuild lazily afterwards.
  *
  * Assertions track RDD IDs, not global counts: the spec shares its
  * JVM with every other suite, and Spark's ContextCleaner may reap an
  * unreferenced cached RDD from a neighbour at any moment — an
  * equality check on the global persistent-RDD count is inherently
  * racy (it failed exactly that way in full-suite runs). */
class CacheLifecycleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def cachedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("releaseCaches removes exactly the memoized blocks; lazily rebuilt") {
    DedupSuite.releaseCaches(spark)
    BenchSuite.releaseCaches(spark)
    val base = cachedIds

    // force the dedup memos (bands, words, simhash) and the bench
    // inflated-corpus memo to materialize
    SparkEntry.queries("d04_jaccard_verify")(spark, dir).collect()
    SparkEntry.queries("d06_simhash_pairs")(spark, dir).collect()
    SparkEntry.queries("x02_knn_codegen")(spark, dir).collect()
    val added = cachedIds -- base
    assert(added.nonEmpty,
      "expected the suite memos to hold cached RDDs after queries ran")

    DedupSuite.releaseCaches(spark)
    BenchSuite.releaseCaches(spark)
    val leftover = cachedIds.intersect(added)
    assert(leftover.isEmpty,
      s"releaseCaches left cached RDDs behind: $leftover")

    // lazily rebuilt on next use — same results, caches repopulate
    val again = SparkEntry.queries("d06_simhash_pairs")(spark, dir)
    assert(again.count() > 0)
    val rebuilt = cachedIds -- base -- added
    assert(rebuilt.nonEmpty, "memo did not rebuild after release")
    DedupSuite.releaseCaches(spark)
    BenchSuite.releaseCaches(spark)
    assert(cachedIds.intersect(rebuilt).isEmpty)
  }
}
