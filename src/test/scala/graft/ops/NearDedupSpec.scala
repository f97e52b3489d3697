package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NearDedupSpec extends SparkSpec {
  import spark.implicits._

  test("components: two chains and a triangle resolve to min labels") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (21L, 20L)).toDF("a_id", "b_id")
    val comp = NearDedup.components(pairs)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(comp(_) == 10L))
    assert(Seq(20L, 21L).forall(comp(_) == 20L))
  }

  test("long path converges within the iteration budget") {
    val pairs = (1L until 40L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val comp = NearDedup.components(pairs).as[(Long, Long)].collect()
    assert(comp.forall(_._2 == 1L))
  }

  test("distributed path (forced) agrees with driver union-find") {
    // same graphs as above but with the small-graph threshold at 0 so
    // the iterative min-label loop is the code under test
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (21L, 20L)).toDF("a_id", "b_id")
    val dist = NearDedup.components(pairs, smallGraphEdges = 0L)
      .as[(Long, Long)].collect().toMap
    val local = NearDedup.components(pairs).as[(Long, Long)].collect().toMap
    assert(dist == local)
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val distChain = NearDedup.components(chain, smallGraphEdges = 0L)
      .as[(Long, Long)].collect()
    assert(distChain.forall(_._2 == 1L))
  }

  test("string ids resolve under string ordering in the local path") {
    val pairs = Seq(("b", "c"), ("c", "a"), ("x", "y"))
      .toDF("a_id", "b_id")
    val comp = NearDedup.components(pairs)
      .as[(String, String)].collect().toMap
    assert(Seq("a", "b", "c").forall(comp(_) == "a"))
    assert(Seq("x", "y").forall(comp(_) == "x"))
  }

  test("dedup keeps component minima and untouched rows") {
    val docs = (1L to 8L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((2L, 5L), (5L, 7L), (3L, 4L)).toDF("a_id", "b_id")
    val kept = NearDedup.dedup(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // 5,7 collapse into 2; 4 into 3; 1,6,8 untouched
    assert(kept == Seq(1L, 2L, 3L, 6L, 8L))
  }

  test("end-to-end: LSH+Jaccard pairs over documents collapse dup groups") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val pairs = graft.SparkEntry.queries("d04_jaccard_verify")(spark, dir)
      .select("a_id", "b_id")
    val nPairs = pairs.count()
    assert(nPairs > 0, "fixture should contain near-dups")
    val kept = NearDedup.dedup(docs, "doc_id", pairs)
    // survivors = total - (non-minimal members of components)
    val comp = NearDedup.components(pairs)
    val collapsed = comp.filter(col("component") =!= col("id")).count()
    assert(kept.count() == docs.count() - collapsed)
    // idempotence: running dedup again removes nothing
    assert(NearDedup.dedup(kept, "doc_id", pairs).count() == kept.count())
  }
}
