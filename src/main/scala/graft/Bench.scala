package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entry point.
  *
  * Methodology (round 3, per VERDICT.md item 3 — the round-2 n=1 cold
  * numbers swung 2x on unchanged code):
  *  - each query runs `iters` times (default 3): iteration 0 is the cold
  *    pass, the rest are warm reruns in the same JVM;
  *  - the headline per-query number is the MIN across the iterations
  *    that succeeded (steady-state); -1.0 only when every iteration
  *    failed;
  *  - results are materialized through the noop sink, not `.count()` —
  *    count() lets Catalyst prune the projected expressions, so
  *    expression-heavy queries would be under-measured.
  *
  * Output contract (round 5 — rounds 1-4 each produced `parsed: null`):
  * the harness keeps only the LAST ~2000 chars of stdout, and the full
  * 90-query steady+cold maps are ~5 KB, so the JSON line start was
  * always truncated away. stdout now gets ONE compact line (< 1 KB):
  * the engine total, the total including the two deliberately-stock A/B
  * baselines (x01 lambda-fold, x05 stock top-k), and a headline subset
  * of per-query steady times. The complete per-query steady/cold maps
  * at full precision go to BENCH_FULL.json in the working directory.
  */
object Bench {

  /** One representative per family for the compact stdout line; the
    * full map is in BENCH_FULL.json. Kept short enough that the whole
    * JSON line plus sbt's `[success]` trailer fits in a 2000-char tail. */
  private val Headline = Seq(
    "r01_pricing_summary", "r08_join_agg", "j01_shipping_priority",
    "w01_lead_lag", "f01_string_chain", "d01_exact_dedup",
    "d03_lsh_candidates", "d06_simhash_pairs", "d09_contamination",
    "e01_tumbling_agg", "e02_sessionize", "e11_attribution_join",
    "t01_quality_metrics", "t04_top_bigrams", "v03_knn_bruteforce",
    "v08_topk_rewrite", "v11_lsh_ann", "s02_hll_distinct",
    "s04_cms_freq", "s08_pack_bins", "p03_curation_funnel",
    "x02_knn_codegen", "x03_knn_ivf")

  /** Deliberately-unoptimized comparison arms of the A/B pairs
    * (x01 vs x02, x05 vs x04, x13 vs x12). They exist to show the win,
    * and belong in the artifact, but not in the engine's headline
    * total. */
  private val AbBaselines =
    Set("x01_knn_lambda", "x05_topk_stock", "x13_asof_rangejoin")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt.max(1)
    val spark = GraftSession.builder(cpus).getOrCreate()
    // ERROR, not WARN: benign-but-noisy warnings (e.g. WindowExec's
    // single-partition notice on provably-tiny dim frames) would flood
    // the stdout tail the harness keeps and crowd out the JSON line
    spark.sparkContext.setLogLevel("ERROR")

    // Watchdog (round 9): one wedged query must never hang the whole
    // round (round 7's 786 s cold x03 turned the driver window into
    // rc=124 thrash). Each iteration runs in its own thread under a
    // cancellable job group; past the cap the group is cancelled and
    // the iteration records -2.0 (timed out) vs -1.0 (failed).
    val capSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_CAP_SEC", "300").toLong

    def runOnce(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      val group = s"bench-$name-${System.nanoTime()}"
      @volatile var result = -1.0
      val worker = new Thread(() => {
        val t0 = System.nanoTime()
        try {
          // job group is per-thread state — set it in the worker so
          // cancelJobGroup reaches exactly this iteration's jobs
          spark.sparkContext.setJobGroup(group, name,
            interruptOnCancel = true)
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          result = (System.nanoTime() - t0) / 1e9
        } catch { case _: Throwable => () } // result stays -1.0
        finally spark.sparkContext.clearJobGroup()
      }, group)
      worker.setDaemon(true)
      worker.start()
      worker.join(capSec * 1000L)
      val out =
        if (worker.isAlive) {
          System.err.println(s"[bench] $name exceeded ${capSec}s — cancelling")
          spark.sparkContext.cancelJobGroup(group)
          worker.join(30000L)
          if (worker.isAlive) {
            // a worker that survives job-group cancellation is wedged in
            // driver-side code (plan/codegen/collect): interrupt it and
            // wait again — an abandoned-but-running zombie would overlap
            // the next iteration's jobs and race the conf unset below,
            // skewing every subsequent timing
            worker.interrupt()
            worker.join(30000L)
            if (worker.isAlive)
              System.err.println(s"[bench] $name worker survived cancel+" +
                "interrupt — treat subsequent timings as tainted")
          }
          -2.0
        } else result
      // conf hygiene: A/B builders (x04/x05 kNN rewrite, x09/x10 bloom
      // join) pin session flags; reset so none leaks into later queries
      graft.queries.BenchSuite.PinnedConfKeys.foreach(spark.conf.unset)
      out
    }

    // optional comma-separated name filter for targeted iteration
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val results = (SparkEntry.queries ++ SparkEntry.benchOnlyQueries)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        // per-query progress to stderr (NOT stdout — the harness parses
        // the stdout tail): makes a wedged or slow query identifiable
        // from the log instead of requiring a thread dump
        System.err.println(s"[bench] $name ...")
        val times = (0 until iters).map(_ => runOnce(name, fn))
        System.err.println(
          s"[bench] $name ${times.map(t => f"$t%.2f").mkString(",")}")
        name -> times
      }
    // steady-state = min over the iterations that SUCCEEDED; -1.0 /
    // -2.0 (timed out) only when every iteration failed (one flaky run
    // must not poison the number when the retries were fine).
    def steadyOf(ts: Seq[Double]): Double = {
      val ok = ts.filter(_ >= 0)
      if (ok.nonEmpty) ok.min
      else if (ts.contains(-2.0)) -2.0
      else -1.0
    }
    val steady = results.map { case (k, ts) => k -> steadyOf(ts) }
    def jmap(m: Iterable[(String, Double)], fmt: Double => String) =
      m.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")

    // full-precision detail file (every query, steady + cold).
    // Filtered (SPARK_GRAFT_BENCH_ONLY) runs write BENCH_PARTIAL.json:
    // a targeted iteration must never clobber the committed
    // full-registry artifact (it did, twice, in round 10).
    val full =
      s"""{"iters":$iters,"sf_dir":"$sfDir","cpus":$cpus,
         |"steady":${jmap(steady, _.toString)},
         |"cold":${jmap(results.map { case (k, ts) => k -> ts.head },
                        _.toString)}}""".stripMargin.replace("\n", "")
    val detailFile =
      if (only.isDefined) "BENCH_PARTIAL.json" else "BENCH_FULL.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(detailFile),
      full.getBytes("UTF-8"))

    def r3(d: Double) = f"$d%.3f"
    def totalOf(m: Map[String, Double]) =
      m.values.map(_.max(0.0)).sum
    val engineTotal = totalOf(steady.filterNot(kv => AbBaselines(kv._1)))
    val allTotal = totalOf(steady)
    val sfNum = raw".*sf([0-9.]+)/?$$".r
      .findFirstMatchIn(sfDir).map(_.group(1)).getOrElse("0.1")
    val head = Headline.flatMap(h => steady.get(h).map(h -> _))
    // failure visibility: a total that silently excludes broken queries
    // reads as an improvement — report the counts next to it
    val nFailed = steady.count(_._2 == -1.0)
    val nTimedOut = steady.count(_._2 == -2.0)
    // ONE compact line, printed last so it survives tail truncation
    println(s"""{"metric":"engine_total_steady_sec","value":${r3(engineTotal)},"unit":"sec","sf":$sfNum,"iters":$iters,"nq":${steady.size},"failed":$nFailed,"timed_out":$nTimedOut,"total_with_ab_baselines":${r3(allTotal)},"detail":"BENCH_FULL.json","queries":${jmap(head, r3)}}""")
    // cache hygiene: the suite memos pin executor storage per (session,
    // dir) — release before stop so a reused/long-lived session (or a
    // follow-on main in the same JVM) starts from storage baseline
    graft.queries.DedupSuite.releaseCaches(spark)
    graft.queries.BenchSuite.releaseCaches(spark)
    spark.stop()
  }
}
