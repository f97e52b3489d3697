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
}
