package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-text entry surface: makes the engine usable from plain
  * `spark.sql(...)` without touching the Scala DataFrame API.
  *
  * Three layers, each already SQL-native underneath:
  *  - the graft FUNCTIONS (`graft_l2_distance`, `graft_md5_long`,
  *    `graft_dup_frac`, ...) register through
  *    [[graft.expr.GraftExtensions]] at session build — callable from
  *    any SQL text with no further setup;
  *  - [[registerTables]] publishes the fixture tables as temp views
  *    under their plain names (`lineitem`, `documents`, ...), so the
  *    DuckDB-oracle-shaped SQL in SURVEY/README runs as-is;
  *  - [[registerQueryViews]] publishes every registry query as a view
  *    (same name as its registry key), so a SQL user can compose ON
  *    TOP of any operator result: `SELECT * FROM d11_drop_report
  *    WHERE bucket_size > 10`.
  *
  * Views are lazy plans, not materializations: selecting from a query
  * view executes the same optimized plan the DataFrame API produces —
  * identical results by construction (asserted hash-for-hash in
  * SqlSurfaceSpec).
  */
object SqlCatalog {

  /** Temp views for the test tables of `sfDir` (through [[Tables]], so
    * timestamp canonicalization applies to SQL users too). */
  def registerTables(spark: SparkSession, sfDir: String): Unit =
    Tables.names.foreach { name =>
      Tables(spark, sfDir, name).createOrReplaceTempView(name)
    }

  /** Every registry query as a temp view named by its registry key.
    * `only` restricts registration (view creation is cheap — plans,
    * not data — but a narrowed registration keeps catalogs tidy). */
  def registerQueryViews(spark: SparkSession, sfDir: String,
      only: Set[String] = Set.empty): Unit =
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        fn(spark, sfDir).createOrReplaceTempView(name)
      }

  /** The typed AGGREGATORS as SQL functions (the scalar expressions
    * already register through GraftExtensions). Parametric sketches
    * bind their documented default size — `graft_heavy_hitters` k=64,
    * `graft_quantile_summary` k=128 — because SQL functions can't
    * carry constructor parameters; custom sizes stay on the Column
    * API (`HeavyHitters.heavyHitters(k)`, ...). Idempotent. */
  def registerAggregates(spark: SparkSession): Unit = {
    import org.apache.spark.sql.{functions => F, Encoders}
    spark.udf.register("graft_hll",
      F.udaf(new graft.functions.HyperLogLog.HllAggregator, Encoders.LONG))
    spark.udf.register("graft_heavy_hitters",
      F.udaf(new graft.functions.HeavyHitters.MgAggregator(64),
        Encoders.LONG))
    spark.udf.register("graft_quantile_summary",
      F.udaf(new graft.functions.QuantileSummary.MrlAggregator(128),
        Encoders.DOUBLE))
  }

  /** One-call setup: tables + query views + aggregate functions.
    * Returns the session for
    * `SqlCatalog.install(spark, dir).sql("...")` chaining. */
  def install(spark: SparkSession, sfDir: String,
      only: Set[String] = Set.empty): SparkSession = {
    registerTables(spark, sfDir)
    registerQueryViews(spark, sfDir, only)
    registerAggregates(spark)
    spark
  }

  /** Convenience for pure-SQL callers. */
  def sql(spark: SparkSession, text: String): DataFrame = spark.sql(text)
}
