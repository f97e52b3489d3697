package graft.io

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class PgVectorSpec extends SparkSpec {

  private lazy val emb = graft.Tables(spark,
    "/root/testdata/sf0.001", "embeddings")

  test("vector literal and parse are exact inverses on real embeddings") {
    val back = emb
      .withColumn("lit", PgVector.vectorLiteral(col("embedding")))
      .withColumn("back", PgVector.parseVector(col("lit")))
    // float→string uses the shortest round-trip form, so the parse
    // must recover every element bit-for-bit
    assert(back.filter(col("back") =!= col("embedding")).count() == 0)
    // and the literal is pgvector's documented format
    val one = back.select("lit").head().getString(0)
    assert(one.matches("""\[[-0-9.eE,]+\]"""), one)
    // formatting is a pure projection — no Exchange, no UDF
    val p = back.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("BatchEvalPython"), p)
  }

  test("dialect maps float/double arrays to vector(dim) on postgres URLs") {
    val d = PgVector.PgVectorDialect(768)
    assert(d.canHandle("jdbc:postgresql://db:5432/bytesme"))
    assert(!d.canHandle("jdbc:derby:memory:x"))
    assert(d.getJDBCType(ArrayType(FloatType)).get.databaseTypeDefinition
      == "vector(768)")
    assert(d.getJDBCType(ArrayType(DoubleType)).get.databaseTypeDefinition
      == "vector(768)")
    // everything else defers to the stock Postgres dialect
    assert(d.getJDBCType(StringType).isEmpty)
    assert(d.getJDBCType(LongType).isEmpty)
  }

  test("staged embeddings round-trip through the batched JDBC writer") {
    // Derby stands in for Postgres: same writer path, same literal
    // column; on a real pgvector target the dialect above swaps the
    // VARCHAR DDL for vector(768) and the server casts the literal
    val url = "jdbc:derby:memory:graft_pgvec;create=true"
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val staged = PgVector.stageForLoad(
      emb.select("vec_id", "embedding"), "embedding")
    assert(staged.schema("embedding").dataType == StringType)
    Sinks.jdbcWriter(staged, "emb_load", batchSize = 50)
      .option("url", url)
      .option("createTableColumnTypes", "embedding VARCHAR(8000)")
      .save()
    val back = Sinks.readJdbc(spark, url, "emb_load")
      .withColumn("embedding", PgVector.parseVector(col("embedding")))
    assert(back.count() == emb.count())
    // bit-exact vector recovery after the full write→read cycle
    val joined = back.alias("b").join(emb.alias("e"), "vec_id")
      .filter(col("b.embedding") =!= col("e.embedding"))
    assert(joined.count() == 0)
  }
}
