package graft

/** Executed-plan pins for the round-11 operators (the PlanSpec stance:
  * assert the plan property that makes the operator scale, on the
  * EXECUTED plan, not the optimized one). */
class PlanAuditR11Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def executed(q: String): String = {
    val df = SparkEntry.queries(q)(spark, dir)
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("f20 html extraction: exactly ONE exchange — the explicit " +
      "parse-parallelism repartition — and a four-column pruned scan") {
    val p = executed("f20_html_extract")
    // the single-row-group fixture would otherwise parse every page on
    // one core; the query pins an explicit REPARTITION_BY_NUM so AQE's
    // byte-based advisory coalescing cannot fold the tiny shuffle back
    // to one task (its partition count survives into the final plan)
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert(p.contains("REPARTITION_BY_NUM"), p)
    assert(p.contains("ReadSchema: struct<p_partkey:bigint,p_name:string," +
      "p_brand:string,p_type:string>"), p)
  }

  test("t11 cdc chunks: the explicit doc_id repartition is the ONLY " +
      "exchange — the per-doc window reuses it instead of re-shuffling") {
    val p = executed("t11_cdc_chunks")
    // the repartition hash-clusters on doc_id, which satisfies the
    // window's required child distribution through the explode's
    // alias-aware partitioning propagation — EnsureRequirements must
    // not insert a second exchange, and the explicit count keeps AQE
    // from byte-coalescing the CPU-dense explode+hash+window stage
    // back to one task
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert(p.contains("REPARTITION_BY_NUM"), p)
  }

  test("t12 pii scrub: a pure scan-parallel projection — zero " +
      "exchanges, two-column read") {
    val p = executed("t12_pii_scrub")
    assert(!p.contains("Exchange"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("t13 repetition gates: zero exchanges (per-document signals " +
      "stay in-row) and the tallies run inside codegen") {
    val p = executed("t13_repetition_gates")
    assert(!p.contains("Exchange"), p)
    // the one-pass expression composes INSIDE a whole-stage-codegen
    // span (the `*(n)` marker; it is not a CodegenFallback like the
    // higher-order-fold form)
    assert("""\*\(\d+\) Project .*graft_rep_stats""".r
      .findFirstIn(p).isDefined, p)
  }

  test("r17 cube: aggregate-first — no Expand on the scan path, and " +
      "the fact scan feeds a partial aggregate directly") {
    val p = executed("r17_cube")
    // native GROUP BY CUBE would put an Expand (4x row replication)
    // between the scan and the first aggregate; the aggregate-first
    // form explodes only the already-aggregated ~6-row frame
    assert(!p.contains("Expand"), p)
    assert(p.contains("Generate explode"), p)
    // only the three needed columns reach the parquet scan
    val rs = """ReadSchema: struct<([^>]*)>""".r
      .findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(Seq("l_quantity", "l_returnflag", "l_linestatus")
      .forall(rs.contains), s"missing column in ReadSchema: $rs")
    assert(rs.split(",").length == 3,
      s"scan reads more than the three needed columns: $rs")
  }
}
