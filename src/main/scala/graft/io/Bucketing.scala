package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers — the co-located join layout (SURVEY §4 /
  * the 100 TB stance): two fact tables bucketed by the same key into
  * the same bucket count join with NO shuffle on either side; at
  * 100 TB that is the difference between a map-side merge and moving
  * both tables over the network.
  *
  * Spark bucketing rides the session catalog (`saveAsTable`), so these
  * helpers wrap the write/read pair. Sort within buckets makes the
  * join a streaming merge without a per-task sort where supported.
  */
object Bucketing {

  /** Persist `df` as a bucketed catalog table (overwriting). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sortWithinBuckets: Boolean = true): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
    (if (sortWithinBuckets) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Join two same-key bucketed tables — shuffle-free when their
    * bucket counts match (assert via `.explain`: no Exchange above
    * either scan). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
