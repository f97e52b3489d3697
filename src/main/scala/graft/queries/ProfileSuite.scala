package graft.queries

import org.apache.spark.sql.functions._

import graft.{GraftQuery, QuerySuite, Tables}

/** Data-profiling operators (north-star pipeline stage: know your
  * corpus before training on it): equi-width histograms and per-column
  * summary stats, both exact and cross-engine deterministic.
  */
object ProfileSuite extends QuerySuite {

  /** p01 — equi-width histogram of event values per type: 10 bins from
    * the group min/max (two passes: one tiny stats aggregate broadcast
    * back, one binning pass — the standard shape; the corpus never
    * shuffles for the stats side). Bin arithmetic is IEEE double on
    * both engines so edges match bit-for-bit; the max value clamps
    * into bin 9. */
  private val p01 = GraftQuery(
    "p01_histogram",
    (s, dir) => {
      val ev = Tables(s, dir, "events").select(col("event_type"), col("value"))
      val stats = ev.groupBy("event_type")
        .agg(min("value").as("lo"), max("value").as("hi"))
      ev.join(broadcast(stats), Seq("event_type"))
        .withColumn("bin",
          when(col("hi") === col("lo"), 0L).otherwise(
            least(floor((col("value") - col("lo")) /
              ((col("hi") - col("lo")) / 10)).cast("long"), lit(9L))))
        .groupBy("event_type", "bin")
        .agg(count(lit(1)).as("n"), min("value").as("bin_min"),
          max("value").as("bin_max"))
    },
    Some("""WITH stats AS (
        SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
        FROM events GROUP BY 1),
      binned AS (
        SELECT e.event_type, e.value,
          CASE WHEN s.hi = s.lo THEN 0
               ELSE least(CAST(floor((e.value - s.lo) /
                 ((s.hi - s.lo) / 10)) AS BIGINT), 9) END AS bin
        FROM events e JOIN stats s USING (event_type))
      SELECT event_type, bin, COUNT(*) AS n,
        MIN(value) AS bin_min, MAX(value) AS bin_max
      FROM binned GROUP BY 1, 2"""))

  /** p02 — per-column profile of lineitem (the df.describe twin, made
    * deterministic): rows of (column, n, n_null, n_distinct), plus
    * lexicographic min/max for the string column. One aggregate per
    * column unioned by name — each is a partial-aggregate-friendly
    * scan; no floats are ever FORMATTED (float→string rendering
    * differs across engines, so min/max is only emitted for strings). */
  private val p02 = GraftQuery(
    "p02_column_profile",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      def prof(c: String, minMax: Boolean) =
        li.agg(
          count(lit(1)).as("n"),
          count(when(col(c).isNull, lit(1))).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          (if (minMax) min(col(c)).cast("string") else lit(null)
            .cast("string")).as("min_s"),
          (if (minMax) max(col(c)).cast("string") else lit(null)
            .cast("string")).as("max_s"))
          .withColumn("column", lit(c))
      prof("l_orderkey", minMax = false)
        .unionByName(prof("l_returnflag", minMax = true))
        .unionByName(prof("l_linestatus", minMax = true))
        .unionByName(prof("l_quantity", minMax = false))
        .select("column", "n", "n_null", "n_distinct", "min_s", "max_s")
    },
    Some("""
      SELECT 'l_orderkey' AS "column", COUNT(*) AS n,
        COUNT(CASE WHEN l_orderkey IS NULL THEN 1 END) AS n_null,
        COUNT(DISTINCT l_orderkey) AS n_distinct,
        CAST(NULL AS VARCHAR) AS min_s, CAST(NULL AS VARCHAR) AS max_s
      FROM lineitem
      UNION ALL
      SELECT 'l_returnflag', COUNT(*),
        COUNT(CASE WHEN l_returnflag IS NULL THEN 1 END),
        COUNT(DISTINCT l_returnflag),
        MIN(l_returnflag), MAX(l_returnflag)
      FROM lineitem
      UNION ALL
      SELECT 'l_linestatus', COUNT(*),
        COUNT(CASE WHEN l_linestatus IS NULL THEN 1 END),
        COUNT(DISTINCT l_linestatus),
        MIN(l_linestatus), MAX(l_linestatus)
      FROM lineitem
      UNION ALL
      SELECT 'l_quantity', COUNT(*),
        COUNT(CASE WHEN l_quantity IS NULL THEN 1 END),
        COUNT(DISTINCT l_quantity),
        CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
      FROM lineitem"""))

  override val suite: Seq[GraftQuery] = Seq(p01, p02)
}
