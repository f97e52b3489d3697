package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Contract pins for the bench artifact writer (VERDICT r10 items 1/2/4:
  * the artifact must carry the per-iteration evidence, and a zombie
  * worker must taint subsequent entries IN the artifact). Parsed with
  * json4s (ships with Spark) so well-formedness is asserted by a real
  * parser, not string matching. */
class BenchReportSpec extends AnyFunSuite {
  import BenchReport._

  private def iter(sec: Double, gcMs: Long = 10, tainted: Boolean = false) =
    Iter(sec = sec, gcMs = gcMs, gcN = 2, cpuMs = 900, heapMb = 512,
      storageMb = 64, load = 3.5, tainted = tainted)

  private val results = Seq(
    QueryResult("q_fast", Seq(iter(1.5), iter(0.5), iter(0.6))),
    QueryResult("q_flaky", Seq(iter(-1.0), iter(2.0), iter(-1.0))),
    QueryResult("q_wedged", Seq(iter(-2.0), iter(-2.0, tainted = true))),
    QueryResult("q_after_zombie",
      Seq(iter(0.3, tainted = true), iter(0.3, tainted = true))))

  test("steadyOf: min over successes; -2 beats -1 when all fail") {
    assert(steadyOf(Seq(1.5, 0.5, 0.6)) == 0.5)
    assert(steadyOf(Seq(-1.0, 2.0, -1.0)) == 2.0)
    assert(steadyOf(Seq(-1.0, -1.0)) == -1.0)
    assert(steadyOf(Seq(-1.0, -2.0)) == -2.0)
  }

  test("fullJson carries all iteration times and telemetry per query") {
    val doc = JsonMethods.parse(
      fullJson(3, "/root/testdata/sf0.1", "32", results))
    // legacy shape earlier tooling reads
    assert((doc \ "steady" \ "q_fast") == JDouble(0.5))
    assert((doc \ "cold" \ "q_fast") == JDouble(1.5))
    assert((doc \ "sf_dir") == JString("/root/testdata/sf0.1"))
    // the round-11 evidence block
    val d = doc \ "detail" \ "q_fast"
    assert((d \ "times") == JArray(List(JDouble(1.5), JDouble(0.5),
      JDouble(0.6))))
    assert((d \ "gc_ms") == JArray(List(JInt(10), JInt(10), JInt(10))))
    assert((d \ "cpu_ms").asInstanceOf[JArray].arr.length == 3)
    assert((d \ "load") == JArray(List(JDouble(3.5), JDouble(3.5),
      JDouble(3.5))))
    assert((d \ "storage_mb").asInstanceOf[JArray].arr.length == 3)
    assert((d \ "tainted") == JBool(false))
    // env snapshot present with sane values
    assert((doc \ "env" \ "host_cores").asInstanceOf[JInt].num.toInt > 0)
  }

  test("a zombie taints its own and subsequent entries") {
    val doc = JsonMethods.parse(fullJson(2, "d", "4", results))
    assert((doc \ "detail" \ "q_wedged" \ "tainted") == JBool(true))
    assert((doc \ "detail" \ "q_after_zombie" \ "tainted") == JBool(true))
    assert((doc \ "detail" \ "q_fast" \ "tainted") == JBool(false))
  }

  test("headline line is compact, excludes A/B baselines from the " +
      "engine total, and counts failures/taints") {
    val line = headlineJson(results :+
        QueryResult("x_ab_baseline", Seq(iter(100.0))),
      3, "0.1", Seq("q_fast", "q_flaky"), Set("x_ab_baseline"))
    assert(line.length < 1000, s"headline line too long: ${line.length}")
    val doc = JsonMethods.parse(line)
    // 0.5 + 2.0 + 0 + 0.3 (q_after_zombie counted; negatives clamp 0)
    assert((doc \ "value") == JDouble(2.8))
    assert((doc \ "total_with_ab_baselines") == JDouble(102.8))
    assert((doc \ "failed") == JInt(0))
    assert((doc \ "timed_out") == JInt(1))
    assert((doc \ "tainted") == JInt(2))
    assert((doc \ "queries" \ "q_fast") == JDouble(0.5))
  }

  test("contendedFlags: high load flags an iteration; flat-load runs " +
      "stay clean; sentinels read as no-evidence") {
    def it(sec: Double, cpu: Long, load: Double, gc: Long = 10) =
      Iter(sec, gc, 2, cpu, 512, 64, load, tainted = false)
    // clean-session shape: load ~2.7 on 32 cores, stable walls
    val clean = Seq(it(2.3, 5900, 2.7), it(0.78, 1700, 2.7),
      it(0.81, 1400, 2.7))
    assert(contendedFlags(clean, 32) == Seq(false, false, false))
    assert(!steadyContended(clean, 32))
    // driver-contended x03 shape: load 6-9, every wall inflated —
    // load alone must flag it (incl. the steady-defining min)
    val cont = Seq(it(17.1, 34300, 8.7), it(9.3, 28080, 7.0),
      it(7.2, 16970, 6.2))
    assert(contendedFlags(cont, 32) == Seq(true, true, true))
    assert(steadyContended(cont, 32))
    // interference without a load spike: a WARM iteration at wall >2x
    // best AND cpu >1.6x best cpu, GC flat -> flagged; the best
    // iteration is not, and neither is an expensive COLD pass (idx 0
    // is exempt from the interference clause — codegen/cache fill is
    // real work, which is exactly the `clean` shape above)
    val thrash = Seq(it(0.5, 2000, 3.0), it(1.4, 3600, 3.0),
      it(0.52, 2100, 3.0))
    assert(contendedFlags(thrash, 32) == Seq(false, true, false))
    assert(!steadyContended(thrash, 32)) // steady (0.5) is trustworthy
    // same wall/cpu inflation but GC-dominated -> heap pressure, NOT
    // laundered into a contention claim
    val heap = Seq(it(0.5, 2000, 3.0), it(1.4, 3600, 3.0, gc = 600))
    assert(contendedFlags(heap, 32) == Seq(false, false))
    // -1 telemetry sentinels (unsupported probes) produce no evidence
    val noTel = Seq(it(0.5, -1, -1.0), it(1.4, -1, -1.0))
    assert(contendedFlags(noTel, 32) == Seq(false, false))
    // all-failed query: nothing to compare against
    assert(contendedFlags(Seq(it(-1.0, 10, 2.0)), 32) == Seq(false))
  }

  test("contention verdicts land in both artifacts") {
    def it(sec: Double, load: Double) =
      Iter(sec, 10, 2, 900, 512, 64, load, tainted = false)
    val rs = Seq(
      QueryResult("q_clean", Seq(it(1.0, 2.0), it(0.5, 2.0))),
      QueryResult("q_cont", Seq(it(9.0, 9.0), it(8.0, 9.0))))
    val doc = JsonMethods.parse(
      fullJson(2, "d", "32", rs, hostCores = 32,
        forkGroups = Some(Seq(Seq("q_clean"), Seq("q_cont")))))
    assert((doc \ "detail" \ "q_cont" \ "contended") ==
      JArray(List(JBool(true), JBool(true))))
    assert((doc \ "detail" \ "q_cont" \ "steady_contended") == JBool(true))
    assert((doc \ "detail" \ "q_clean" \ "steady_contended") == JBool(false))
    assert((doc \ "env" \ "load_thresh") == JDouble(4.0))
    assert((doc \ "fork_groups") == JArray(List(
      JArray(List(JString("q_clean"))), JArray(List(JString("q_cont"))))))
    val line = JsonMethods.parse(headlineJson(rs, 2, "0.1", Nil,
      Set.empty, hostCores = 32))
    assert((line \ "contended") == JInt(1))
  }

  test("JSON string escaping survives hostile names") {
    val doc = JsonMethods.parse(fullJson(1, "dir\"with\\quote", "4",
      Seq(QueryResult("q\"x", Seq(iter(1.0))))))
    assert((doc \ "sf_dir") == JString("dir\"with\\quote"))
    assert((doc \ "steady" \ "q\"x") == JDouble(1.0))
  }

  test("non-numeric cpus (local[*]) stays parseable as a string") {
    val doc = JsonMethods.parse(fullJson(1, "d", "*",
      Seq(QueryResult("q", Seq(iter(1.0))))))
    assert((doc \ "cpus") == JString("*"))
    val num = JsonMethods.parse(fullJson(1, "d", "32",
      Seq(QueryResult("q", Seq(iter(1.0))))))
    assert((num \ "cpus") == JInt(32))
  }

  test("AbBaselines name every stock arm and nothing else: all are " +
      "registered bench-only queries (typo guard)") {
    val benchOnly = SparkEntry.benchOnlyQueries.keySet
    val unknown = Bench.AbBaselines -- benchOnly
    assert(unknown.isEmpty,
      s"AbBaselines not in the bench-only registry: $unknown")
  }
}
