package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkSpec}

/** The round-11 library forms produce byte-identical results to their
  * oracle-query twins (which are hash-verified against DuckDB), so
  * the cross-engine guarantee transfers to the library surface.
  */
class LibraryParitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")

  test("Boilerplate.strip == t16's clean_text") {
    val lib = Boilerplate.strip(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val oracle = SparkEntry.queries("t16_boilerplate")(spark, dir)
      .select("doc_id", "clean_text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(lib === oracle)
  }

  test("Packing.epochShards == c14's shard assignment") {
    val lib = Packing.epochShards(
      docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens")),
      "doc_id", "n_tokens", nShards = 8)
      .select("doc_id", "shuffle_key", "n_tokens", "cum_before", "shard")
      .collect().map(_.toSeq).sortBy(_.head.toString)
    val oracle = SparkEntry.queries("c14_epoch_shards")(spark, dir)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(lib.toSeq === oracle.toSeq)
  }

  test("Boilerplate.strip preserves sub-segment docs as ''") {
    import spark.implicits._
    val tiny = Seq((1L, "only"), (2L, "a b a b a b"),
      (3L, "a b a b a b")).toDF("doc_id", "text")
    val out = Boilerplate.strip(tiny, "doc_id", "text", 2, 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet === Set(1L, 2L, 3L)) // doc 1 survives as a row
    assert(out(1L) === "")                 // ...with empty cleaned text
    assert(out(2L) === "")                 // "a b" is the top-1 segment
  }

  test("epochShards: an all-zero-weight frame lands in shard 0") {
    import spark.implicits._
    val zero = Seq((1L, 0L), (2L, 0L), (3L, 0L))
      .toDF("doc_id", "n_tokens")
    val out = Packing.epochShards(zero, "doc_id", "n_tokens", 8)
      .select("shard").collect().map(_.getLong(0)).toSet
    assert(out === Set(0L))
  }
}
