package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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

  /** p03 — the curation FUNNEL end-to-end (capstone: the whole
    * training-data cleaning pipeline as ONE declarative plan): total →
    * quality gate (t01's metrics) → repetition gate (t09's duplicate
    * 2-grams) → exact dedup (keep-first by content hash, min_by /
    * arg_min — deterministic under unique doc ids). One row per stage
    * with surviving doc and token counts — the numbers a pipeline
    * owner actually watches. Metrics are within-row array math; the
    * whole funnel is ONE corpus scan and ONE shuffle (the md5 groupBy,
    * map-side combined) — stage totals ride the same aggregate as
    * conditional partials. */
  private val p03 = {
    import graft.functions.TextOps.{shingles, tokens}
    GraftQuery(
      "p03_curation_funnel",
      (s, dir) => {
        val base = Tables(s, dir, "documents")
          .withColumn("toks", tokens(col("text")))
          .withColumn("n_tokens", size(col("toks")).cast("long"))
          .withColumn("uniq_ratio",
            size(array_distinct(col("toks"))).cast("double") /
              size(col("toks")))
          .withColumn("g2", shingles(col("toks"), 2))
          .withColumn("dup2_frac",
            when(size(col("g2")) > 0,
              (size(col("g2")) - size(array_distinct(col("g2"))))
                .cast("double") / size(col("g2"))).otherwise(0.0))
          .withColumn("h", md5(col("text").cast("binary")))
        // one flags projection, then ONE corpus pass: the per-hash
        // groupBy carries conditional partials for stages 0-2 alongside
        // the dedup survivor pick (min-doc_id struct over the gated
        // rows — min skips nulls, doc_id uniqueness makes it total), so
        // the expensive shingle math runs exactly once and the only
        // corpus shuffle is the md5 groupBy (map-side combined)
        val flags = base.select(col("doc_id"), col("n_tokens"), col("h"),
          (col("n_tokens") >= 5 && col("uniq_ratio") >= 0.3).as("qp"),
          (col("dup2_frac") <= 0.2).as("rp"))
        flags.groupBy("h").agg(
            count(lit(1)).as("n0g"), sum("n_tokens").as("t0g"),
            count(when(col("qp"), lit(1))).as("n1g"),
            sum(when(col("qp"), col("n_tokens"))).as("t1g"),
            count(when(col("qp") && col("rp"), lit(1))).as("n2g"),
            sum(when(col("qp") && col("rp"), col("n_tokens"))).as("t2g"),
            min(when(col("qp") && col("rp"),
              struct(col("doc_id"), col("n_tokens")))).as("surv"))
          .agg(
            sum("n0g").as("n0"), sum("t0g").as("t0"),
            sum("n1g").as("n1"), sum("t1g").as("t1"),
            sum("n2g").as("n2"), sum("t2g").as("t2"),
            count(col("surv")).as("n3"),
            sum(col("surv.n_tokens")).as("t3"))
          .selectExpr("""stack(4,
            CAST(0 AS BIGINT), 'total',       n0, t0,
            CAST(1 AS BIGINT), 'quality',     n1, t1,
            CAST(2 AS BIGINT), 'repetition',  n2, t2,
            CAST(3 AS BIGINT), 'exact_dedup', n3, t3)
            AS (stage, gate, n_docs, n_tokens_total)""")
      },
      Some("""WITH base AS (
        SELECT doc_id, md5(text) AS h,
          CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
          CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
            / len(string_split(text,' ')) AS uniq_ratio,
          CASE WHEN len(string_split(text,' ')) >= 2 THEN
            CAST(len(list_transform(range(1, len(string_split(text,' '))),
                i -> array_to_string(list_slice(string_split(text,' '),
                  i, i+1), ' ')))
              - len(list_distinct(list_transform(
                  range(1, len(string_split(text,' '))),
                  i -> array_to_string(list_slice(string_split(text,' '),
                    i, i+1), ' ')))) AS DOUBLE)
              / len(list_transform(range(1, len(string_split(text,' '))),
                  i -> array_to_string(list_slice(string_split(text,' '),
                    i, i+1), ' ')))
            ELSE 0.0 END AS dup2_frac
        FROM documents),
      q AS (SELECT * FROM base
            WHERE n_tokens >= 5 AND uniq_ratio >= 0.3),
      r AS (SELECT * FROM q WHERE dup2_frac <= 0.2),
      d AS (SELECT h, arg_min(n_tokens, doc_id) AS n_tokens
            FROM r GROUP BY h)
      SELECT 0 AS stage, 'total' AS gate, COUNT(*) AS n_docs,
        CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_total FROM base
      UNION ALL
      SELECT 1, 'quality', COUNT(*),
        CAST(SUM(n_tokens) AS BIGINT) FROM q
      UNION ALL
      SELECT 2, 'repetition', COUNT(*),
        CAST(SUM(n_tokens) AS BIGINT) FROM r
      UNION ALL
      SELECT 3, 'exact_dedup', COUNT(*),
        CAST(SUM(n_tokens) AS BIGINT) FROM d"""))
  }

  /** p04 — join-key SKEW profile: the report to read before shuffling
    * 100 TB on a key. Per candidate key: distinct-key count, max and
    * p99-ish key frequency (exact rank over the frequency distribution
    * — a window over per-key counts, i.e. |distinct| rows, not corpus
    * rows), and the share of all rows held by the top key, integer-
    * scaled (×1e6, floor) so it cross-checks exactly. A key whose
    * max_freq share is large wants salting (ops/Ops.saltedJoin) or
    * AQE skew handling; the profile quantifies that BEFORE the job. */
  private val p04 = {
    def profile(keyCol: String) = s"""
      SELECT '$keyCol' AS key_col,
        CAST(COUNT(*) AS BIGINT) AS n_keys,
        CAST(MAX(cnt) AS BIGINT) AS max_freq,
        CAST(MAX(CASE WHEN rnk = (99 * nk + 99) // 100
          THEN cnt END) AS BIGINT) AS p99_freq,
        CAST((MAX(cnt) * 1000000) // SUM(cnt) AS BIGINT) AS top_share_e6
      FROM (
        SELECT cnt, row_number() OVER (ORDER BY cnt, k) AS rnk,
          COUNT(*) OVER () AS nk
        FROM (SELECT $keyCol AS k, COUNT(*) AS cnt
              FROM lineitem GROUP BY 1))"""
    GraftQuery(
      "p04_skew_profile",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        def one(keyCol: String) = {
          val counts = li.groupBy(col(keyCol).as("k"))
            .agg(count(lit(1)).as("cnt"))
          val w = Window.orderBy(col("cnt"), col("k"))
          // the rank window runs over |distinct keys| rows (the
          // aggregated frame), never the corpus — single-partition is
          // fine for a diagnostics frame this small; at true dim-scale
          // cardinality the sort+zipWithIndex path (t05) applies
          counts
            .withColumn("rnk", row_number().over(w).cast("long"))
            .withColumn("nk", count(lit(1)).over())
            .agg(
              count(lit(1)).as("n_keys"),
              max("cnt").as("max_freq"),
              // integer-exact p99 rank: ceil(99*nk/100) without any
              // double math, so no engine's FP rounding can move it
              max(when(col("rnk") === expr("(99 * nk + 99) div 100"),
                col("cnt"))).as("p99_freq"),
              expr("(max(cnt) * 1000000) div sum(cnt)").as("top_share_e6"))
            .select(lit(keyCol).as("key_col"), col("n_keys"),
              col("max_freq"), col("p99_freq"), col("top_share_e6"))
        }
        one("l_orderkey")
          .unionByName(one("l_partkey"))
          .unionByName(one("l_suppkey"))
          .unionByName(one("l_returnflag"))
      },
      Some(s"""${profile("l_orderkey")}
        UNION ALL ${profile("l_partkey")}
        UNION ALL ${profile("l_suppkey")}
        UNION ALL ${profile("l_returnflag")}"""))
  }

  /** p05 — exact covariance matrix over the lineitem measures
    * (quantity, extendedprice, discount): the feature-covariance
    * profile read before normalizing/whitening numeric features, done
    * in EXACT fixed-point arithmetic so the matrix is bit-identical
    * cross-engine (float covariance is famously run-order dependent —
    * `sum((x-μ)(y-μ))` reassociates differently per partitioning).
    * Recipe: measures scale to integer cents (2-decimal money — ×100
    * then round is exact), moments accumulate as decimal(38,0) /
    * HUGEINT (sums of cents² overflow int64 at sf≥0.1), and the
    * sample covariance in e4 fixed point collapses to ONE integral
    * division: cov·1e4 = (n·Σxy − Σx·Σy) div (n·(n−1)) — the cents²
    * scale (10⁴) and the e4 output scale cancel. `div` (Spark) and
    * `//` (DuckDB) both truncate toward zero. Plan: a single
    * partial-aggregating scan (9 moment sums + count in one pass —
    * the corpus is read ONCE for the whole matrix), then the 6
    * pair rows unfold driver-side from the 1-row aggregate. */
  private val p05 = {
    val measures = Seq(
      "l_quantity" -> "q", "l_extendedprice" -> "p", "l_discount" -> "d")
    val pairs = for {
      (i, (nx, ax)) <- measures.zipWithIndex.map(_.swap)
      (ny, ay) <- measures.drop(i)
    } yield (nx, ax, ny, ay)
    GraftQuery(
      "p05_covariance",
      (s, dir) => {
        import org.apache.spark.sql.types.DecimalType
        val cents = measures.map { case (name, a) =>
          round(col(name) * 100).cast(DecimalType(38, 0)).as(a)
        }
        val li = Tables(s, dir, "lineitem").select(cents: _*)
        val momentAggs =
          count(lit(1)).as("n") +:
            measures.map { case (_, a) => sum(col(a)).as(s"s$a") } ++:
            pairs.map { case (_, ax, _, ay) =>
              sum(col(ax) * col(ay)).as(s"s$ax$ay")
            }
        val m = li.agg(momentAggs.head, momentAggs.tail: _*)
        val rows = pairs.map { case (nx, ax, ny, ay) =>
          s"named_struct('col_x', '$nx', 'col_y', '$ny', " +
            s"'n', CAST(n AS BIGINT), " +
            s"'cov_e4', CAST((n * s$ax$ay - s$ax * s$ay) " +
            s"div (n * (n - 1)) AS BIGINT))"
        }
        m.selectExpr(s"inline(array(${rows.mkString(", ")}))")
      },
      Some {
        val sel = measures.map { case (name, a) =>
          s"CAST(round($name * 100) AS HUGEINT) AS $a"
        }.mkString(", ")
        val sums =
          ("CAST(COUNT(*) AS HUGEINT) AS n" +:
            measures.map { case (_, a) => s"SUM($a) AS s$a" } ++:
            pairs.map { case (_, ax, _, ay) => s"SUM($ax * $ay) AS s$ax$ay" })
            .mkString(", ")
        val rows = pairs.map { case (nx, ax, ny, ay) =>
          s"""SELECT '$nx' AS col_x, '$ny' AS col_y, CAST(n AS BIGINT) AS n,
            CAST((n * s$ax$ay - s$ax * s$ay) // (n * (n - 1)) AS BIGINT)
              AS cov_e4 FROM m"""
        }.mkString(" UNION ALL ")
        s"""WITH c AS (SELECT $sel FROM lineitem),
          m AS (SELECT $sums FROM c)
          $rows"""
      })
  }

  override val suite: Seq[GraftQuery] = Seq(p01, p02, p03, p04, p05)
}
