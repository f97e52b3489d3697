package graft.queries

import org.apache.spark.sql.types._

import graft.{SparkSpec, Tables}

/** Contract between the engine and the driver-supplied fixtures.
  *
  * The driver regenerates /root/testdata between rounds, and the physical
  * parquet encoding has already drifted once (events.ts: timestamp[ns] →
  * TIMESTAMP_MICROS isAdjustedToUTC=0). Every query reads through
  * `Tables.apply`, so the POST-Tables logical schema is the real API.
  * This spec pins it for all ten tables across all three SF dirs: a
  * future fixture regen that the loader can't normalize fails HERE with
  * one named assertion, not as 22 scattered DATATYPE_MISMATCH errors at
  * the correctness gate.
  */
class FixtureContractSpec extends SparkSpec {

  private val sfDirs = Seq(
    "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  // expected post-Tables logical schema, per table, as (name -> type).
  // events.ts MUST be TimestampType regardless of physical encoding —
  // Tables.apply normalizes Long(ns) / TIMESTAMP_NTZ / TIMESTAMP to it.
  private val contract: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  for (dir <- sfDirs; table <- Tables.names)
    test(s"$table @ ${dir.split('/').last} matches the engine contract") {
      val got = Tables(spark, dir, table).schema
        .map(f => f.name -> (f.dataType match {
          // array element nullability is a writer artifact, not contract
          case ArrayType(et, _) => ArrayType(et)
          case t => t
        }))
      assert(got == contract(table),
        s"\nfixture drift for '$table' in $dir:" +
          s"\n  got      ${got.mkString(", ")}" +
          s"\n  expected ${contract(table).mkString(", ")}" +
          "\nIf the driver regenerated fixtures with a new physical " +
          "encoding, teach Tables.apply to normalize it (core.scala).")
    }
}
