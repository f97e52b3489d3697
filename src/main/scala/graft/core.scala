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

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts has drifted across fixture generations: parquet
    // timestamp[ns] (read as Long under nanosAsLong), then
    // TIMESTAMP_MICROS isAdjustedToUTC=0 (read as TIMESTAMP_NTZ).
    // Dispatch on the dtype actually read so the logical schema is
    // always a microsecond TimestampType, matching what DuckDB sees:
    //  - LongType: ns epoch → integer-divide to us (same truncation
    //    DuckDB applies reading a ns column);
    //  - TimestampNTZType: identical under the pinned UTC session TZ;
    //  - TimestampType: already canonical.
    if (name == "events") {
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types._
      df.schema("ts").dataType match {
        case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case TimestampType    => df
        case other => throw new IllegalStateException(
          s"events.ts: unexpected physical type $other — update Tables.apply")
      }
    } else df
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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.ui.enabled", "false")
}
