package graft.io

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Sources & sinks parity — SURVEY.md §2.1 (S1-S4, S8-S9).
  *
  * CSV reading matches the reference's quirks (header, quoted multiline
  * fields, UTF-8); internal stages prefer Parquet (multiLine CSV is not
  * splittable — SURVEY.md §7.5). The JDBC writer reproduces the
  * reference's batched-insert contract (`generate_embeddings.py:277`,
  * batch 50; `psql_load.sql` bulk load); SinksSpec exercises it live
  * against an embedded Derby database (in the Spark classpath) —
  * write, append, read-back join. Production swaps the url for
  * Postgres; the writer configuration is identical.
  */
object Sinks {

  /** S1 — schema'd CSV scan (header, multiline, escaped quotes). */
  def readCsv(spark: SparkSession, schema: StructType, path: String)
      : DataFrame =
    spark.read.schema(schema)
      .option("header", true)
      .option("multiLine", true)
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** S4 — multiline JSON document scan (seed-url maps etc.). */
  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", true).json(path)

  /** S3 — CSV sink with header (overwrite|append). Unlike pandas
    * append-with-header-once, a distributed CSV write emits one file
    * per partition, each with its own header — readers must use
    * `header=true` (they do, via readCsv). */
  def writeCsv(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .option("header", true)
      // RFC-4180 doubled-quote escaping, matching readCsv — Spark's
      // default backslash-escape dialect would not round-trip
      .option("escape", "\"")
      .csv(path)

  /** Internal-stage sink: partitioned parquet (replaces the reference's
    * per-category CSV partitioning with real partition pruning). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCol).parquet(path)

  /** S8/S9 — JDBC sink options mirroring the reference's load path:
    * batched inserts (default 50 rows/batch as `generate_embeddings
    * .py:277`), explicit truncate-vs-append. Returns the configured
    * writer so deployments add url/credentials and `.save()`. */
  def jdbcWriter(df: DataFrame, table: String, batchSize: Int = 50,
      mode: SaveMode = SaveMode.Append)
      : org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row] =
    df.write.format("jdbc")
      .option("dbtable", table)
      .option("batchsize", batchSize)
      .option("isolationLevel", "READ_COMMITTED")
      .mode(mode)

  /** S10 — JDBC scan properties (read-back joins). */
  def jdbcProps(batchSize: Int = 50): Properties = {
    val p = new Properties()
    p.setProperty("fetchsize", batchSize.toString)
    p
  }

  /** S10 — JDBC scan (read-back join source). */
  def readJdbc(spark: SparkSession, url: String, table: String,
      batchSize: Int = 50): DataFrame =
    spark.read.jdbc(url, table, jdbcProps(batchSize))

  /** Columnar interchange beyond parquet: ORC sink/scan (Spark-native
    * format, zlib by default here for the same
    * splittable-columnar-with-stats contract as the parquet internal
    * stage — predicate pushdown and column pruning work identically).
    * The reference has no ORC surface; this rounds out the engine's
    * format matrix (CSV/JSON/parquet/ORC/JDBC) so downstream systems
    * that standardize on ORC ingest the same tables. */
  def writeOrc(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("compression", "zlib").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
