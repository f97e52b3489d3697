package graft

/** Bench artifact model + JSON writer, factored out of [[Bench]] so the
  * serialization contract is unit-testable (VERDICT r10 items 1/2/4).
  *
  * Why this exists: three driver rounds in a row produced inflated
  * wall-times on queries whose committed quiet-window steadies are
  * sub-second, and the old artifact (steady+cold only) could not
  * distinguish "the plan regressed" from "the machine was contended"
  * from "late-run heap pressure". The per-iteration telemetry makes
  * that call decidable post-hoc from the artifact alone:
  *
  *  - `times`: ALL iteration wall-times — `min == first` (cold is the
  *    fastest) or monotonic growth across iterations is the
  *    degrading-environment signature, invisible in a bare min;
  *  - `gc_ms` / `gc_n`: JVM GC time/count delta per iteration — a slow
  *    iteration with proportional GC growth is heap pressure, one with
  *    flat GC is external contention;
  *  - `cpu_ms`: process CPU delta — wall-time up with our own CPU flat
  *    means the cores went to someone else (contention), wall and CPU
  *    up together means the query genuinely did more work;
  *  - `load`: system 1-min load average sampled BEFORE the iteration —
  *    load far above this JVM's core budget is direct evidence of a
  *    co-tenant;
  *  - `heap_mb` / `storage_mb`: used heap and executor storage memory
  *    AFTER the iteration — late-run storage growth that correlates
  *    with slowdowns indicts cache pressure, not the plan;
  *  - `tainted`: true from the moment any bench worker survived
  *    cancel+interrupt (a zombie thread may still be running jobs that
  *    overlap later timings) — previously only a stderr note.
  */
object BenchReport {

  /** One timed iteration with its environment evidence. `sec` is the
    * wall time, or -1.0 (failed) / -2.0 (timed out — see [[Bench]]'s
    * watchdog). */
  final case class Iter(
      sec: Double, gcMs: Long, gcN: Long, cpuMs: Long,
      heapMb: Long, storageMb: Long, load: Double, tainted: Boolean)

  final case class QueryResult(name: String, iters: Seq[Iter]) {
    def times: Seq[Double] = iters.map(_.sec)
    def tainted: Boolean = iters.exists(_.tainted)
  }

  /** Steady-state = min over the iterations that SUCCEEDED; -1.0 /
    * -2.0 (timed out) only when every iteration failed — one flaky run
    * must not poison the number when the retries were fine. */
  def steadyOf(ts: Seq[Double]): Double = {
    val ok = ts.filter(_ >= 0)
    if (ok.nonEmpty) ok.min
    else if (ts.contains(-2.0)) -2.0
    else -1.0
  }

  private def jsStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def jsNum(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" else d.toString

  /** Env-sourced values (cpus, sf) splice as bare numbers only when
    * they ARE numbers — SPARK_GRAFT_CPUS="*" is a legal local[N]
    * setting and a raw splice would make the whole artifact
    * unparseable. */
  private def jsNumOrStr(s: String): String =
    if (s.matches("-?\\d+(\\.\\d+)?")) s else jsStr(s)

  private def arr(xs: Iterable[String]) = xs.mkString("[", ",", "]")
  private def obj(kvs: Iterable[(String, String)]) =
    kvs.map { case (k, v) => jsStr(k) + ":" + v }.mkString("{", ",", "}")

  /** The BENCH_FULL.json document. Top-level `steady`/`cold` keep the
    * shape earlier rounds' tooling reads; `detail` carries the
    * per-iteration evidence; `env` pins the run's fixed context. */
  def fullJson(iters: Int, sfDir: String, cpus: String,
      results: Seq[QueryResult]): String = {
    val steady = results.map(q => q.name -> steadyOf(q.times))
    val detail = results.map { q =>
      q.name -> obj(Seq(
        "times" -> arr(q.times.map(jsNum)),
        "gc_ms" -> arr(q.iters.map(_.gcMs.toString)),
        "gc_n" -> arr(q.iters.map(_.gcN.toString)),
        "cpu_ms" -> arr(q.iters.map(_.cpuMs.toString)),
        "heap_mb" -> arr(q.iters.map(_.heapMb.toString)),
        "storage_mb" -> arr(q.iters.map(_.storageMb.toString)),
        "load" -> arr(q.iters.map(i => jsNum(i.load))),
        "tainted" -> q.tainted.toString))
    }
    val rt = Runtime.getRuntime
    val env = obj(Seq(
      "jvm_max_heap_mb" -> (rt.maxMemory() / (1024 * 1024)).toString,
      "host_cores" -> rt.availableProcessors().toString,
      "jvm_uptime_s" -> jsNum(
        java.lang.management.ManagementFactory.getRuntimeMXBean
          .getUptime / 1000.0)))
    obj(Seq(
      "iters" -> iters.toString,
      "sf_dir" -> jsStr(sfDir),
      "cpus" -> jsNumOrStr(cpus),
      "env" -> env,
      "steady" -> obj(steady.map { case (k, v) => k -> jsNum(v) }),
      "cold" -> obj(results.map(q => q.name -> jsNum(q.times.head))),
      "detail" -> obj(detail)))
  }

  /** The one compact stdout line (< 1 KB — the harness keeps only a
    * ~2000-char stdout tail). `headline` picks the per-family subset;
    * `abBaselines` are deliberately-stock comparison arms excluded
    * from the engine total. */
  def headlineJson(results: Seq[QueryResult], iters: Int, sfNum: String,
      headline: Seq[String], abBaselines: Set[String],
      detailFile: String = "BENCH_FULL.json"): String = {
    val steady = results.map(q => q.name -> steadyOf(q.times)).toMap
    def totalOf(m: Map[String, Double]) = m.values.map(_.max(0.0)).sum
    def r3(d: Double) = f"$d%.3f"
    val engineTotal = totalOf(steady.filterNot(kv => abBaselines(kv._1)))
    val head = headline.flatMap(h => steady.get(h).map(h -> _))
    obj(Seq(
      "metric" -> jsStr("engine_total_steady_sec"),
      "value" -> r3(engineTotal),
      "unit" -> jsStr("sec"),
      "sf" -> jsNumOrStr(sfNum),
      "iters" -> iters.toString,
      "nq" -> steady.size.toString,
      "failed" -> steady.count(_._2 == -1.0).toString,
      "timed_out" -> steady.count(_._2 == -2.0).toString,
      "tainted" -> results.count(_.tainted).toString,
      "total_with_ab_baselines" -> r3(totalOf(steady)),
      "detail" -> jsStr(detailFile),
      "queries" -> obj(head.map { case (k, v) => k -> r3(v) })))
  }
}
