package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checkable query: a Spark plan plus (optionally) the
  * equivalent ANSI SQL that DuckDB runs over the same parquet tables.
  *
  * Contract (driver): the Spark result and the DuckDB result are compared
  * after sorting columns by name and canonicalizing rows, so
  *  - column names MUST match between `run` and `oracle`;
  *  - output must be deterministic as a SET of rows (no raw `rand()`,
  *    no unordered `limit` without a total tiebreak);
  *  - doubles must be bit-reproducible across engines: derive them from
  *    exact decimal/integer arithmetic and cast to double at the end, or
  *    round aggressively.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** A named group of queries (one per SURVEY.md §2 operator family). */
trait QuerySuite {
  def suite: Seq[GraftQuery]
}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  * All reads go through here so schema handling / pruning is uniform.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Canonical post-load type of each timestamp column. The fixture
    * encodings have drifted across driver regenerations (events.ts:
    * parquet timestamp[ns] read as Long under nanosAsLong, then
    * TIMESTAMP_MICROS isAdjustedToUTC=0 read as TIMESTAMP_NTZ), so the
    * loader normalizes whatever it finds into the form every query and
    * oracle was validated against: events.ts as TimestampType (the
    * original ns shim produced it), orders/lineitem dates as
    * TIMESTAMP_NTZ (how Spark reads their current encoding). Under the
    * pinned UTC session timezone the NTZ↔TZ cast is an identity on the
    * underlying microseconds, which is exactly why both forms keep
    * hash-matching DuckDB. */
  private val canonicalTs: Map[String, Seq[(String, org.apache.spark.sql.types.DataType)]] = {
    import org.apache.spark.sql.types._
    Map(
      "events"   -> Seq("ts" -> TimestampType),
      "orders"   -> Seq("o_orderdate" -> TimestampNTZType),
      "lineitem" -> Seq("l_shipdate" -> TimestampNTZType))
  }

  /** Normalize one timestamp-encoded column to `target` by physical
    * encoding: a Long column is a NANOSECOND epoch → integer-divide
    * to us (the same truncation DuckDB applies reading a ns column);
    * Timestamp/NTZ → cast; anything else throws. SHARED by the batch
    * path above and the streaming events source
    * ([[graft.streaming.EventStreams.eventsFileStream]]) so the two
    * can never drift when the fixture's ts encoding changes — a bare
    * cast of the ns-epoch form would read SECONDS and silently break
    * every watermark. */
  def normalizeTs(df: DataFrame, c: String,
      actual: org.apache.spark.sql.types.DataType,
      target: org.apache.spark.sql.types.DataType,
      what: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types._
    actual match {
      case t if t == target => df
      case LongType => df.withColumn(c,
        expr(s"timestamp_micros($c div 1000)").cast(target))
      case TimestampType | TimestampNTZType =>
        df.withColumn(c, col(c).cast(target))
      case other => throw new IllegalStateException(
        s"$what: unexpected physical type $other — update " +
          "Tables.normalizeTs callers")
    }
  }

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    canonicalTs.getOrElse(name, Nil).foldLeft(df) {
      case (d, (c, target)) =>
        normalizeTs(d, c, d.schema(c).dataType, target, s"$name.$c")
    }
  }
}

/** Central SparkSession factory: every entry point (Verify, Bench, tests)
  * builds its session here so scale-oriented settings are uniform.
  * Tuned for local[N] but written for a real cluster: AQE handles
  * post-shuffle coalescing and skew; shuffle partitions match cores.
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // r18 join-strategy audit (guide §3.1) — BOTH knobs measured,
      // both kept at stock; the env overrides remain for deployments:
      //  - preferSortMergeJoin=false (plan-time SHJ) regressed the
      //    corpus-vs-corpus joins in x26 ~1.4× (big per-partition
      //    builds, 2-4× GC) and won nothing the broadcast planner
      //    wasn't already taking — estimates pick SHJ exactly where
      //    it's risky;
      //  - maxShuffledHashJoinLocalMapThreshold=64m (the AQE runtime
      //    rewrite) showed NO measurable effect in a clean alternating
      //    A/B (d08/d12/j01 at sf1, 2 rounds each): AQE's own
      //    partition coalescing targets advisoryPartitionSizeInBytes
      //    (64 MB), so post-shuffle partitions sit AT the threshold
      //    and the rewrite rarely fires; the one earlier run that
      //    suggested a 2× win was a contended-host artifact. Raising
      //    the threshold well above the advisory size is the knob a
      //    deployment would turn — with its own memory headroom, not
      //    ours to default.
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "true"))
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_LOCAL_MAP_MAX", "0"))
      .config("spark.sql.session.timeZone", "UTC")
      // grouped top-k (GroupedTopK) plans as ObjectHashAggregate; the
      // stock 128-key fallback would sort a partition's input by group
      // key once a scan sees >128 query ids. Buffers are ≤ 2k longs, so
      // 4096 in-memory groups is still < 1 MB per task.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "4096")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.ui.enabled", "false")
}
