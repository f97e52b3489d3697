package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{GraftQuery, QuerySuite, Tables}

/** Event/time-series operators over the `events` table — the batch form
  * of the streaming surface (SURVEY.md §2.12): tumbling windows,
  * sessionization, lag/lead, cumulative aggregates, pivot. The same
  * plans run under Structured Streaming via graft.streaming (readStream
  * + watermark); batch keeps them oracle-checkable.
  *
  * Scale notes: every window partitions by a high-cardinality key
  * (user_id) — no single-partition windows; the tumbling agg is a plain
  * hash aggregate on (bucket, type) with map-side partials.
  */
object EventsSuite extends QuerySuite {
  import Det._

  /** e01 — tumbling hourly window aggregate (streaming window() in batch
    * form): count + sum(value) per hour per event_type. */
  private val e01 = GraftQuery(
    "e01_tumbling_agg",
    (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), sumDec(col("value")).as("total")),
    Some(s"""SELECT date_trunc('hour', ts) AS hour, event_type,
      COUNT(*) AS cnt, ${sqlSumDec("value")} AS total
    FROM events GROUP BY 1, 2"""))

  /** e02 — sessionization with a 30-minute inactivity gap: lag + flag +
    * running sum over (user_id, ts) assigns session ids; then per-session
    * stats. The canonical stateful-streaming op, done relationally. */
  private val e02 = GraftQuery(
    "e02_sessionize",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables(s, dir, "events")
        .withColumn("prev_ts", lag("ts", 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1)
            .otherwise(0))
        .withColumn("session_seq", sum("new_sess").over(w).cast("long"))
        .groupBy("user_id", "session_seq")
        .agg(count(lit(1)).as("n_events"),
          min("ts").as("sess_start"),
          max("ts").as("sess_end"))
    },
    Some("""WITH flagged AS (
      SELECT user_id, event_id, ts,
        CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
             THEN 1 ELSE 0 END AS new_sess
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, session_seq, COUNT(*) AS n_events,
      min(ts) AS sess_start, max(ts) AS sess_end
    FROM (SELECT user_id, ts,
            CAST(sum(new_sess) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS BIGINT) AS session_seq
          FROM flagged)
    GROUP BY 1, 2"""))

  /** e03 — lag/lead deltas: inter-event gap seconds per user (ref: the
    * closest the reference gets is append-order accumulation; this is the
    * general sequential-delta op). */
  private val e03 = GraftQuery(
    "e03_lag_delta",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables(s, dir, "events")
        .withColumn("gap_us",
          unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w)))
        .filter(col("gap_us").isNotNull)
        .select("user_id", "event_id", "gap_us")
    },
    Some("""SELECT user_id, event_id,
      epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
        ORDER BY ts, event_id)) AS gap_us
    FROM events QUALIFY gap_us IS NOT NULL"""))

  /** e04 — cumulative running aggregate per user ordered by time:
    * running event count and exact running value sum. */
  private val e04 = GraftQuery(
    "e04_running_sum",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          count(lit(1)).over(w).as("run_cnt"),
          sum(dec2(col("value"))).over(w).cast("double").as("run_total"))
    },
    Some("""SELECT user_id, event_id,
      COUNT(*) OVER w AS run_cnt,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS run_total
    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""))

  /** e05 — pivot by event_type (conditional aggregation; ref
    * `pipeline.py:109` status counting generalized): one row per user,
    * one count column per type. */
  private val e05 = GraftQuery(
    "e05_pivot",
    (s, dir) =>
      Tables(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("user_id"), col("click").as("n_click"),
          col("view").as("n_view"), col("purchase").as("n_purchase"),
          col("signup").as("n_signup"), col("error").as("n_error")),
    Some("""SELECT user_id,
      COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
      COUNT(*) FILTER (WHERE event_type = 'view') AS n_view,
      COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
      COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
      COUNT(*) FILTER (WHERE event_type = 'error') AS n_error
    FROM events GROUP BY 1"""))

  /** e06 — daily top-3 users by exact value sum (windows over windows:
    * day bucket → per-day ranking). */
  private val e06 = GraftQuery(
    "e06_daily_top_users",
    (s, dir) => {
      val daily = Tables(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"), col("user_id"))
        .agg(sumDec(col("value")).as("day_total"))
      val w = Window.partitionBy("day")
        .orderBy(col("day_total").desc, col("user_id").asc)
      daily.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
    },
    Some(s"""SELECT * FROM (
      SELECT CAST(ts AS DATE) AS day, user_id,
        ${sqlSumDec("value")} AS day_total,
        CAST(row_number() OVER (PARTITION BY CAST(ts AS DATE)
          ORDER BY CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) DESC,
                   user_id) AS BIGINT) AS rnk
      FROM events GROUP BY 1, 2)
    WHERE rnk <= 3"""))

  /** e07 — event-order funnel per user: did view precede purchase?
    * min-timestamp-per-type self-comparison (conditional agg, no join). */
  private val e07 = GraftQuery(
    "e07_funnel",
    (s, dir) =>
      Tables(s, dir, "events")
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("first_view"),
          min(when(col("event_type") === "purchase", col("ts")))
            .as("first_purchase"))
        .withColumn("converted",
          col("first_view").isNotNull && col("first_purchase").isNotNull &&
            col("first_view") < col("first_purchase"))
        .select("user_id", "first_view", "first_purchase", "converted"),
    Some("""SELECT user_id,
      min(CASE WHEN event_type='view' THEN ts END) AS first_view,
      min(CASE WHEN event_type='purchase' THEN ts END) AS first_purchase,
      COALESCE(min(CASE WHEN event_type='view' THEN ts END) IS NOT NULL
        AND min(CASE WHEN event_type='purchase' THEN ts END) IS NOT NULL
        AND min(CASE WHEN event_type='view' THEN ts END)
            < min(CASE WHEN event_type='purchase' THEN ts END), FALSE)
        AS converted
    FROM events GROUP BY 1"""))

  /** e08 — AS-OF join (an operator Spark lacks; composed per SURVEY
    * §7.4 preference (a)): for every purchase, the most recent
    * same-user event at-or-before it from the signup stream. The
    * composition is the scalable union+carry-forward shape: tag both
    * streams, union, one window per user ordered by (ts, side) with
    * `last(_, ignoreNulls)` carrying the right side forward — ONE
    * shuffle on user_id, no per-row probing, no range explosion.
    * Oracle: DuckDB's native ASOF LEFT JOIN. */
  private val e08 = GraftQuery(
    "e08_asof_join",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
      val left = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
          lit(1).as("is_l"),
          lit(null).cast("long").as("r_event_id"),
          lit(null).cast("timestamp").as("r_ts"))
      val right = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("event_id"),
          lit(0).as("is_l"),
          col("event_id").as("r_event_id"), col("ts").as("r_ts"))
      // right rows sort before left rows at equal ts → inclusive asof
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("is_l"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      left.unionByName(right)
        .withColumn("m_event_id",
          last("r_event_id", ignoreNulls = true).over(w))
        .withColumn("m_ts", last("r_ts", ignoreNulls = true).over(w))
        .filter(col("is_l") === 1)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("m_event_id"), col("m_ts"))
    },
    Some("""SELECT l.user_id, l.event_id, l.ts,
      r.event_id AS m_event_id, r.ts AS m_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') r
      ON l.user_id = r.user_id AND l.ts >= r.ts"""))

  /** e09 — range (interval) join via time-bucketing (the 100 TB shape
    * for inequality joins): ordered same-user event pairs within 60
    * seconds. The left side probes its own and the next 60 s bucket, so
    * the join is equi on (user, bucket) — skew-bounded, no cartesian —
    * and the exact interval predicate filters after. The oracle is the
    * naive inequality join, proving the composition exact. */
  private val e09 = GraftQuery(
    "e09_range_join",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
      val bucket = expr("us div 60000000L") // integer division — exact
      val left = ev
        .withColumn("probe_bucket",
          explode(array(bucket, bucket + 1)))
        .select(col("user_id"), col("event_id").as("a_id"),
          col("us").as("a_us"), col("probe_bucket"))
      val right = ev
        .select(col("user_id"), col("event_id").as("b_id"),
          col("us").as("b_us"), bucket.as("probe_bucket"))
      left.join(right, Seq("user_id", "probe_bucket"))
        .filter(col("b_us") > col("a_us") &&
          col("b_us") - col("a_us") <= 60000000L)
        .select("user_id", "a_id", "b_id")
        .distinct()
    },
    Some("""SELECT DISTINCT a.user_id, a.event_id AS a_id,
      b.event_id AS b_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND epoch_us(b.ts) > epoch_us(a.ts)
     AND epoch_us(b.ts) - epoch_us(a.ts) <= 60000000"""))

  /** e11 — attribution interval join, batch twin of
    * [[graft.streaming.EventStreams.intervalJoin]] (SAME code path —
    * watermarks no-op on static frames): view events joined to the
    * same user's purchases within the following 60 minutes. Equi on
    * user_id with the interval as a post-filter — per-user event
    * counts bound the fan-out, so no cartesian at any scale; the
    * streaming form bounds its buffered state the same way. */
  private val e11 = GraftQuery(
    "e11_attribution_join",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
      graft.streaming.EventStreams.intervalJoin(
          ev.filter(col("event_type") === "view"),
          ev.filter(col("event_type") === "purchase"),
          lookbackMinutes = 60)
        .select(col("user_id"), col("conv_id"), col("cand_id"),
          unix_micros(col("cand_ts")).as("cand_us"),
          unix_micros(col("conv_ts")).as("conv_us"))
    },
    Some("""SELECT c.user_id, p.event_id AS conv_id, c.event_id AS cand_id,
      epoch_us(c.ts) AS cand_us, epoch_us(p.ts) AS conv_us
    FROM (SELECT * FROM events WHERE event_type = 'view') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND epoch_us(c.ts) <= epoch_us(p.ts)
     AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000"""))

  /** e13 — UNPIVOT (e05 pivot's inverse, through the native
    * `Dataset.unpivot` API): lineitem's three rate columns melted to
    * (key, metric, value) rows. Values are raw column passthrough —
    * no arithmetic crosses engines. The oracle states unpivot's
    * definitional UNION ALL expansion. */
  private val e13 = GraftQuery(
    "e13_unpivot",
    (s, dir) =>
      Tables(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
          "l_tax")
        .unpivot(
          ids = Array(col("l_orderkey"), col("l_linenumber")),
          values = Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          variableColumnName = "metric",
          valueColumnName = "value"),
    Some("""SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
        l_quantity AS value FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
      FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem"""))

  /** e12 — sessionization through Spark's NATIVE session_window
    * operator (the built-in merging-session-window; e02 is the
    * relational form, EventStreams.sessionize the stateful-streaming
    * form — three routes to one semantic). Boundary semantics differ
    * from e02 by design: session_window opens [ts, ts+gap) per event
    * and merges overlaps, so a gap of EXACTLY 30 min starts a new
    * session (>=), while e02's lag test splits only on > — the oracle
    * here states the >= islands, proving the built-in's exact
    * semantics rather than approximating them. */
  private val e12 = GraftQuery(
    "e12_session_window",
    (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          min("ts").as("sess_start"), max("ts").as("sess_end"))
        .select("user_id", "n_events", "sess_start", "sess_end"),
    Some("""WITH flagged AS (
      SELECT user_id, event_id, ts,
        CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
             THEN 1 ELSE 0 END AS new_sess
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, COUNT(*) AS n_events,
      min(ts) AS sess_start, max(ts) AS sess_end
    FROM (SELECT user_id, ts,
            CAST(sum(new_sess) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS BIGINT) AS session_seq
          FROM flagged)
    GROUP BY user_id, session_seq"""))

  /** e10 — sketch × event-time integration: HLL distinct users per
    * tumbling day ([[graft.functions.HyperLogLog.hll]] inside a
    * windowed aggregation — the shape a streaming
    * `groupBy(window(ts)).agg(hll)` runs with a watermark; batch form
    * keeps it oracle-checkable). The shuffle carries 64-byte register
    * buffers per day, not user ids. */
  private val e10 = GraftQuery(
    "e10_windowed_hll",
    (s, dir) => {
      import graft.functions.TextOps.md5Long32
      Tables(s, dir, "events")
        .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
        .groupBy("day")
        .agg(countDistinct(col("user_id")).as("n_exact"),
          graft.functions.HyperLogLog.hll(md5Long32(col("user_id")))
            .as("est_users"))
    },
    Some(s"""WITH hashed AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
          ${SketchSuite.duckH32("CAST(user_id AS VARCHAR)")} AS h32
        FROM events WHERE user_id IS NOT NULL),
      rho AS (
        SELECT day, h32 % 64 AS j,
          CASE WHEN h32 // 64 = 0 THEN 27
               ELSE bit_count(((h32 // 64) & -(h32 // 64)) - 1) + 1
          END AS rho
        FROM hashed),
      regs AS (SELECT day, j, max(rho) AS r FROM rho GROUP BY 1, 2),
      s AS (
        SELECT day, SUM(1::BIGINT << (32 - r)) AS sp, COUNT(*) AS nr
        FROM regs GROUP BY 1),
      exact AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
          count(DISTINCT user_id) AS n_exact
        FROM events GROUP BY 1)
      SELECT e.day, e.n_exact,
        ${graft.functions.HyperLogLog.EstConst}
          / CAST(sp + (64 - nr) * 4294967296 AS DOUBLE) AS est_users
      FROM exact e JOIN s USING (day)"""))

  /** e14 — cohort retention matrix: users grouped by first-active
    * ISO week (the cohort), distinct active users per (cohort,
    * week-offset). The standard product-analytics retention triangle;
    * here it is also the engagement-coverage profile a training-data
    * pipeline reads before weighting interaction logs by recency.
    * Cross-engine: date_trunc('week') is Monday-start in both
    * engines; the offset is an exact integer day-difference div 7
    * (always a multiple of 7 after truncation). Plan: distinct on
    * (user, week) keyed on the high-cardinality user_id, min-agg per
    * user, then one self-join back on user_id — AQE broadcasts the
    * cohort side when small, and both shuffles share the user_id
    * key so the exchange is reused at scale. */
  private val e14 = GraftQuery(
    "e14_cohort_retention",
    (s, dir) => {
      val wk = Tables(s, dir, "events")
        .select(col("user_id"),
          to_date(date_trunc("week", col("ts"))).as("wk"))
        .distinct()
      val cohort = wk.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
      wk.join(cohort, "user_id")
        .select(col("cohort_wk"),
          (datediff(col("wk"), col("cohort_wk")) / lit(7))
            .cast("long").as("week_offset"),
          col("user_id"))
        .groupBy("cohort_wk", "week_offset")
        .agg(countDistinct(col("user_id")).as("n_users"))
    },
    Some("""WITH wk AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events),
    coh AS (SELECT user_id, MIN(wk) AS cohort_wk FROM wk GROUP BY 1)
    SELECT c.cohort_wk,
      CAST((wk.wk - c.cohort_wk) // 7 AS BIGINT) AS week_offset,
      CAST(COUNT(DISTINCT wk.user_id) AS BIGINT) AS n_users
    FROM wk JOIN coh c USING (user_id)
    GROUP BY 1, 2"""))

  /** e15 — SLIDING window aggregate (length 2h, slide 1h): each event
    * contributes to len/slide = 2 overlapping windows. Spark's native
    * `window(ts, len, slide)` generates both assignments map-side — an
    * Expand of factor exactly len/slide, bounded by the overlap ratio,
    * never a join or a self-union — then ONE shuffle on (window,
    * event_type). The streaming form is the identical expression plus
    * a watermark. The DuckDB twin states the same window arithmetic as
    * an explicit 2-offset cross join (epoch-aligned hour truncation
    * minus 0/1 slides). */
  private val e15 = GraftQuery(
    "e15_sliding_agg",
    (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), sumDec(col("value")).as("total"))
        .select(col("window.start").as("ws"), col("window.end").as("we"),
          col("event_type"), col("cnt"), col("total")),
    Some(s"""SELECT ws, ws + INTERVAL 2 HOUR AS we, event_type,
      COUNT(*) AS cnt, ${sqlSumDec("value")} AS total
    FROM (SELECT event_type, value,
        date_trunc('hour', ts) - o * INTERVAL 1 HOUR AS ws
      FROM events CROSS JOIN (VALUES (0), (1)) t(o))
    GROUP BY 1, 2, 3"""))

  /** e16 — cumulative distinct-to-date (the "running unique" metric:
    * per user, how many DISTINCT event types they have ever produced
    * as of each active day — engagement-breadth growth, the curve
    * product analytics watches). The naive form is a running
    * `count(distinct)` window over raw events — per-user
    * carried-set state that explodes at scale. The scalable recast:
    * distinct-to-date only changes on a key's FIRST day, so (1) one
    * groupBy collapses events to (user, type, first_day); (2) a
    * second counts new types per (user, day); (3) the running sum
    * windows over THAT frame — |users| × |active days| rows, keyed on
    * the high-cardinality user_id, never raw events.
    *
    * Exactness: dates and counts only — no floats anywhere. */
  private val e16 = GraftQuery(
    "e16_running_distinct",
    (s, dir) => {
      val firsts = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          to_date(col("ts")).as("day"))
        .groupBy("user_id", "event_type")
        .agg(min(col("day")).as("first_day"))
      val perDay = firsts.groupBy("user_id", "first_day")
        .agg(count(lit(1)).as("new_types"))
      val w = Window.partitionBy("user_id").orderBy("first_day")
      perDay
        .withColumn("cum_distinct", sum(col("new_types")).over(w))
        .select(col("user_id"), col("first_day").as("day"),
          col("new_types"), col("cum_distinct"))
    },
    Some("""WITH firsts AS (
      SELECT user_id, event_type, MIN(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY 1, 2),
    per_day AS (
      SELECT user_id, first_day, CAST(COUNT(*) AS BIGINT) AS new_types
      FROM firsts GROUP BY 1, 2)
    SELECT user_id, first_day AS day, new_types,
      CAST(SUM(new_types) OVER (PARTITION BY user_id
        ORDER BY first_day) AS BIGINT) AS cum_distinct
    FROM per_day"""))

  override val suite: Seq[GraftQuery] =
    Seq(e01, e02, e03, e04, e05, e06, e07, e08, e09, e10, e11, e12, e13,
      e14, e15, e16)
}
