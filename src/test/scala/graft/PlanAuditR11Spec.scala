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

  test("f20 html extraction: zero exchanges, scan pruned to the four " +
      "page-building columns") {
    val p = executed("f20_html_extract")
    assert(!p.contains("Exchange"), p)
    assert(p.contains("ReadSchema: struct<p_partkey:bigint,p_name:string," +
      "p_brand:string,p_type:string>"), p)
  }

  test("t12 pii scrub: a pure scan-parallel projection — zero " +
      "exchanges, two-column read") {
    val p = executed("t12_pii_scrub")
    assert(!p.contains("Exchange"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("t13 repetition gates: every exchange keys on doc_id (no " +
      "low-cardinality funnel)") {
    val p = executed("t13_repetition_gates")
    val exchanges = """Exchange hashpartitioning\(([^,]+)""".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(exchanges.nonEmpty)
    assert(exchanges.forall(k => k.startsWith("doc_id") ||
      k.startsWith("__id")), s"non-doc-keyed exchange in: $exchanges")
  }
}
