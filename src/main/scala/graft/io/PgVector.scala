package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** pgvector load surface (ref `bytesme_psql_schema.sql:301-317`
  * `VECTOR(768)`, `psql_load.sql:3-7`): the Spark-side plumbing for
  * bulk-loading an embedding column into a Postgres+pgvector table over
  * plain JDBC.
  *
  * pgvector's portable ingest format is the TEXT literal
  * `'[x1,x2,...]'` — a vector-typed column accepts it directly on
  * INSERT, and it round-trips through any JDBC stack (java.sql.Array
  * does not map to the vector type without driver-specific casts). So
  * the load path is:
  *
  *   1. [[vectorLiteral]] — format `array<float>` as the literal,
  *      map-side, codegen (concat over a transform; no UDF);
  *   2. write over the standard JDBC sink ([[Sinks.jdbcWriter]],
  *      batched inserts) with [[PgVectorDialect]] registered so the
  *      column is CREATEd as `vector(d)` on Postgres;
  *   3. [[parseVector]] — the exact inverse, for read-back joins
  *      (`spark.read.jdbc` surfaces a vector column as its text form).
  *
  * The sandbox has no Postgres, so the dialect's type mapping is
  * unit-tested directly and the literal/parse round-trip is proven
  * against embedded Derby with the same writer path (PgVectorSpec) —
  * the one untestable seam (Postgres accepting the literal for a
  * vector column) is pgvector's documented contract.
  */
object PgVector {

  /** `[1.0,2.0,...]` literal from an `array<float>`/`array<double>`
    * column. Element rendering uses Spark's float→string cast
    * (shortest round-trip form), so [[parseVector]] recovers the bits
    * exactly. Pure projection: stays inside WholeStageCodegen. */
  def vectorLiteral(v: Column): Column =
    concat(lit("["),
      concat_ws(",", transform(v, _.cast("string"))), lit("]"))

  /** Inverse of [[vectorLiteral]]: text literal → `array<float>`. */
  def parseVector(c: Column): Column =
    transform(
      split(regexp_replace(c, "^\\[|\\]$", ""), ","),
      _.cast("float"))

  /** A [[JdbcDialect]] that CREATEs `array<float>` / `array<double>`
    * columns as pgvector's `vector(dim)` on Postgres URLs. Register
    * with [[register]] before `df.write.format("jdbc")` so Spark's
    * CREATE TABLE emits the vector DDL; all other types defer to the
    * default Postgres mapping. */
  final case class PgVectorDialect(dim: Int) extends JdbcDialect {
    override def canHandle(url: String): Boolean =
      url.startsWith("jdbc:postgresql")
    override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        Some(JdbcType(s"vector($dim)", java.sql.Types.OTHER))
      case _ => None
    }
  }

  /** Install the dialect (idempotent per dim — Spark consults dialects
    * most-recently-registered first). */
  def register(dim: Int): PgVectorDialect = {
    val d = PgVectorDialect(dim)
    JdbcDialects.registerDialect(d)
    d
  }

  /** The reference's embeddings load (`psql_load.sql`), Spark-first:
    * id + literal-formatted vector, through the batched JDBC writer.
    * `vectorCol` must be `array<float>` or `array<double>`; everything
    * else passes through untouched.
    *
    * DDL contract (important): staging converts the vector column to
    * its TEXT literal, so by the time the JDBC writer sees the schema
    * the column is StringType — [[PgVectorDialect]]'s ArrayType →
    * `vector(dim)` mapping does NOT apply to a staged frame, and a
    * writer-issued CREATE TABLE would emit TEXT. Either load into a
    * PRE-EXISTING table with a `vector(dim)` column (pgvector casts
    * the literal on INSERT — the reference's own path), or pass
    * `.option("createTableColumnTypes", PgVector.createColumnTypes(
    * vectorCol, dim))` so the writer CREATEs the vector column
    * correctly. The dialect's ArrayType mapping remains for schema
    * tools that derive DDL from the UNstaged frame. (Writing the raw
    * array column through JDBC is not supported: Spark's ArrayType
    * setter goes through JDBC createArrayOf, which pgvector does not
    * accept.) */
  def stageForLoad(df: DataFrame, vectorCol: String): DataFrame =
    df.withColumn(vectorCol, vectorLiteral(col(vectorCol)))

  /** `createTableColumnTypes` fragment that makes the JDBC writer
    * CREATE the staged (string-typed) vector column as `vector(dim)` —
    * see the [[stageForLoad]] DDL contract. */
  def createColumnTypes(vectorCol: String, dim: Int): String =
    s"$vectorCol vector($dim)"
}
