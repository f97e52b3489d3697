package graft

/** Executed-plan pins for the round-11 training-data-pipeline
  * additions (t15/t16/c14/c15/v17/v18): assert, on the EXECUTED plan,
  * the property that makes each operator survive a 100 TB corpus. */
class PlanAuditR11cSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def executed(q: String): String = {
    val df = SparkEntry.queries(q)(spark, dir)
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("t15 lm novelty: the corpus (T,D) frame broadcasts; the " +
      "LM join never cartesians; scan reads only (doc_id, text)") {
    val p = executed("t15_lm_novelty")
    assert(p.contains("BroadcastNestedLoopJoin"), p) // 1-row (T,D)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("t16 boilerplate: top-20 is a TakeOrderedAndProject and the " +
      "removal decision a broadcast join — K rows cross the wire, " +
      "never the segment table") {
    val p = executed("t16_boilerplate")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p) // reassembly is sort_array, not a window
  }

  test("c14 epoch shards: NO single-partition global window — the " +
      "prefix sum is the two-phase Packing pass; the total broadcasts") {
    val p = executed("c14_epoch_shards")
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p) // 1-row total
  }

  test("c15 dsir: the 256-row ratio table broadcasts into the scoring " +
      "join; totals broadcast; no sort-merge join anywhere") {
    val p = executed("c15_dsir_weights")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p) // 1-row totals
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("v17 semantic dedup: both centroid fan-outs broadcast (the " +
      "corpus never shuffles for assignment) and pairs never cartesian") {
    val p = executed("v17_semantic_dedup")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t17 polyglot: ONE corpus exchange — the doc_id repartition " +
      "pre-satisfies all four shrinking groupBy grains; markers broadcast") {
    val p = executed("t17_polyglot")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("d15 eval scrub: span flagging joins the dictionary without a " +
      "cartesian, and no per-token rows reach a window") {
    val p = executed("d15_eval_scrub")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p) // mask is an in-row array, not a window
  }

  test("t18 token entropy: ONE corpus exchange — the doc_id " +
      "repartition serves both the (doc,token) count and the rollup") {
    val p = executed("t18_token_entropy")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("c14 epoch shards hold at 10x: shard token masses stay within " +
      "one max-document of total/8 at sf0.01 too") {
    val rows = SparkEntry.queries("c14_epoch_shards")(
      spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getLong(4), r.getLong(2)))
    val total = rows.map(_._2).sum
    val maxDoc = rows.map(_._2).max
    val perShard = rows.groupBy(_._1).map(_._2.map(_._2).sum)
    assert(perShard.size == 8)
    assert(perShard.max <= total / 8 + maxDoc)
  }

  test("v18 kmeans: both assignment rounds are broadcast argmin scans " +
      "and the centroid update is a (cell,dim) hash aggregate") {
    val p = executed("v18_kmeans_iter")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }
}
