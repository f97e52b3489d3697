package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextOps.{md5Long60, tokens}

/** Content-defined chunking (the Rabin/FastCDC idea on token windows):
  * a boundary falls after token i when the hash of the `w`-token
  * window ending at i is ≡ 0 mod `mod` (expected chunk length ≈ mod
  * tokens). Boundaries move WITH the content — fixed-stride chunking
  * shifts every downstream chunk when one token is inserted, while
  * content-defined chunks realign after the edit, so sub-document
  * dedup across near-identical docs keeps matching (ChunkingSpec pins
  * exactly that).
  *
  * Scale: per-doc windows only (partitioned on doc_id); the chunk
  * rebuild is sort_array(collect_list(struct(pos, tok))) — Spark's
  * deterministic twin of SQL's string_agg(... ORDER BY pos).
  */
object Chunking {

  def cdcChunks(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", w: Int = 3, mod: Int = 16): DataFrame = {
    val win = Window.partitionBy("doc_id").orderBy("pos")
    val prior = win.rowsBetween(Window.unboundedPreceding, -1)
    val lags = (w - 1 to 1 by -1).map(k => lag("tok", k).over(win)) :+
      col("tok")
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .withColumn("wh",
        when(col("pos") >= w - 1, md5Long60(concat_ws(" ", lags: _*)))
          .otherwise(lit(null)))
      .withColumn("boundary",
        when(col("wh") % mod === 0, 1).otherwise(0))
      .withColumn("chunk",
        coalesce(sum("boundary").over(prior), lit(0L)).cast("long"))
      .groupBy("doc_id", "chunk")
      .agg(count(lit(1)).as("n_tokens"),
        md5(array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").cast("binary"))
          .as("chunk_hash"))
  }
}
