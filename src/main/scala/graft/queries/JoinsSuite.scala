package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{GraftQuery, QuerySuite, Tables}

/** Multi-join analytical shapes + set operations — the fact-scale
  * workloads that stress join planning at 100 TB (TPC-H-shaped, since
  * the test tables are TPC-H-ish). AQE picks broadcast vs shuffle per
  * runtime stats; dims are hinted broadcast explicitly.
  */
object JoinsSuite extends QuerySuite {
  import Det._

  /** j01 — shipping-priority shape (TPC-H Q3): 3-way join, grouped
    * exact revenue, top-10 with total tiebreak. */
  private val j01 = GraftQuery(
    "j01_shipping_priority",
    (s, dir) => {
      val c = Tables(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
      val l = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(o("o_orderkey"), o("o_orderdate"))
        .agg(sum(dec2(l("l_extendedprice")) *
          (lit(1).cast("decimal(4,2)") - l("l_discount").cast("decimal(4,2)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("revenue"), col("o_orderdate"))
    },
    Some("""SELECT o_orderkey,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
        AS DOUBLE) AS revenue,
      o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey LIMIT 10"""))

  /** j02 — local-supplier-volume shape (TPC-H Q5): 6-way join through
    * two dim chains, exact revenue per nation. */
  private val j02 = GraftQuery(
    "j02_local_supplier_volume",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      val l = Tables(s, dir, "lineitem")
      val sup = Tables(s, dir, "supplier")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region").filter(col("r_name") === "ASIA")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(n("n_name"))
        .agg(sum(dec2(l("l_extendedprice")) *
          (lit(1).cast("decimal(4,2)") - l("l_discount").cast("decimal(4,2)")))
          .cast("double").as("revenue"))
    },
    Some("""SELECT n_name,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
        AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name"""))

  /** j03 — large-order customers (TPC-H Q18 shape): aggregate →
    * semi-join back to the fact via the aggregate result. */
  private val j03 = GraftQuery(
    "j03_large_orders",
    (s, dir) => {
      val l = Tables(s, dir, "lineitem")
      val big = l.groupBy("l_orderkey")
        .agg(sumDec(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 250)
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      o.join(big, o("o_orderkey") === big("l_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("total_qty"))
    },
    Some(s"""SELECT c_custkey, c_name, o_orderkey, o_orderdate, total_qty
    FROM orders
    JOIN (SELECT l_orderkey, ${sqlSumDec("l_quantity")} AS total_qty
          FROM lineitem GROUP BY 1
          HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 250)
      ON o_orderkey = l_orderkey
    JOIN customer ON o_custkey = c_custkey"""))

  /** j04 — INTERSECT (SURVEY §2.8 "free in Spark"): nations having
    * both customers and suppliers with high balances. */
  private val j04 = GraftQuery(
    "j04_intersect",
    (s, dir) => {
      val c = Tables(s, dir, "customer").filter(col("c_acctbal") > 9000)
        .select(col("c_nationkey").as("nationkey"))
      val sup = Tables(s, dir, "supplier").filter(col("s_acctbal") > 9000)
        .select(col("s_nationkey").as("nationkey"))
      c.intersect(sup)
    },
    Some("""SELECT c_nationkey AS nationkey FROM customer
      WHERE c_acctbal > 9000
    INTERSECT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000"""))

  /** j05 — EXCEPT: part sizes that appear in inventory but never in a
    * large order line. */
  private val j05 = GraftQuery(
    "j05_except",
    (s, dir) => {
      val p = Tables(s, dir, "part").select(col("p_size").as("size"))
      val ordered = Tables(s, dir, "part")
        .join(Tables(s, dir, "lineitem").filter(col("l_quantity") >= 30),
          col("p_partkey") === col("l_partkey"))
        .select(col("p_size").as("size"))
      p.except(ordered)
    },
    Some("""SELECT p_size AS size FROM part
    EXCEPT
    SELECT p_size FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE l_quantity >= 30"""))

  /** j06 — correlated-existence shape (TPC-H Q4-ish): orders with at
    * least one lineitem shipped >90 days after order date, per
    * priority (this schema has no commitdate - slow-ship stands in). */
  private val j06 = GraftQuery(
    "j06_order_priority_check",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
      val l = Tables(s, dir, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY 1"""))

  /** j07 — explicit GROUPING SETS over region/nation (completes the
    * rollup family of r16; SQL surface in both engines — the DataFrame
    * rollup path trips Spark's ambiguous-self-join check, see r16).
    *
    * Scale shape: COUNT and SUM are decomposable, so the fact rows
    * pre-aggregate to the (r_name, n_name) grain FIRST — exact decimal
    * partial sums, map-side combine — and the 4-way Expand replicates
    * only the ~|nations| aggregated rows, never the fact table. The
    * naive form (Expand over the raw join) quadruples every fact row
    * crossing the shuffle; at 100 TB that's 4× the exchange for output
    * the pre-aggregate reproduces exactly (sums of exact decimal
    * partials re-sum losslessly; the double cast happens once at the
    * end, per the Det money-math contract). */
  private val j07 = GraftQuery(
    "j07_grouping_sets",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      val grain = c
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("cnt_part"),
          sum(col("c_acctbal").cast("decimal(18,2)")).as("bal_part"))
      // DataFrame groupingSets (Spark 4): safe here because the grain
      // frame is a fresh aggregate — the ambiguous-self-join trap that
      // forces r16's rollup through SQL text only bites joined frames
      grain.groupingSets(
          Seq(Seq(col("r_name")), Seq(col("n_name")),
            Seq(col("r_name"), col("n_name")), Seq.empty[org.apache.spark.sql.Column]),
          col("r_name"), col("n_name"))
        .agg(sum(col("cnt_part")).as("cnt"),
          sum(col("bal_part")).cast("double").as("bal"))
        .select(coalesce(col("r_name"), lit("ALL")).as("r_name"),
          coalesce(col("n_name"), lit("ALL")).as("n_name"),
          col("cnt"), col("bal"))
    },
    Some("""SELECT COALESCE(r_name, 'ALL') AS r_name,
      COALESCE(n_name, 'ALL') AS n_name, COUNT(*) AS cnt,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name), (n_name), (r_name, n_name), ())"""))

  /** j08 — null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): the
    * join NULL keys silently vanish from under `=`, the bug class the
    * Blocking module's null-bucket fix guards against. Nullable keys
    * derived deterministically (every 7th key NULLed), then matched
    * null-safely — NULL meets NULL exactly like a value. */
  private val j08 = GraftQuery(
    "j08_nullsafe_join",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
        .select(col("c_custkey"),
          when(col("c_custkey") % 7 === 0, lit(null))
            .otherwise(col("c_custkey") % 100).as("k"))
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 7 === 0, lit(null))
            .otherwise(col("o_orderkey") % 100).as("k"))
        .groupBy("k").agg(count(lit(1)).as("n_orders"))
      c.join(o, c("k") <=> o("k"))
        .groupBy(c("k").as("k"))
        .agg(count(lit(1)).as("n_cust"), min("n_orders").as("n_orders"))
    },
    Some("""WITH c AS (
        SELECT c_custkey,
          CASE WHEN c_custkey % 7 = 0 THEN NULL
               ELSE c_custkey % 100 END AS k
        FROM customer),
      o AS (
        SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
                    ELSE o_orderkey % 100 END AS k,
          COUNT(*) AS n_orders
        FROM orders GROUP BY 1)
      SELECT c.k, COUNT(*) AS n_cust, MIN(o.n_orders) AS n_orders
      FROM c JOIN o ON c.k IS NOT DISTINCT FROM o.k
      GROUP BY c.k"""))

  /** j09 — bag-semantics set operations (INTERSECT ALL / EXCEPT ALL —
    * j04/j05's multiset siblings; duplicates COUNT): overlapping order
    * subsets compared as bags of priorities, aggregated to counted
    * rows so the multiplicity the ALL variants preserve is what the
    * oracle hashes. */
  private val j09 = GraftQuery(
    "j09_set_all",
    (s, dir) => {
      val orders = Tables(s, dir, "orders")
      val a = orders.filter(col("o_orderkey") % 3 === 0)
        .select("o_orderpriority")
      val b = orders.filter(col("o_orderkey") % 5 === 0)
        .select("o_orderpriority")
      def agg(df: org.apache.spark.sql.DataFrame, tag: String) =
        df.groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"))
          .withColumn("op", lit(tag))
      agg(a.intersectAll(b), "intersect_all")
        .unionByName(agg(a.exceptAll(b), "except_all"))
    },
    Some("""WITH a AS (SELECT o_orderpriority FROM orders
        WHERE o_orderkey % 3 = 0),
      b AS (SELECT o_orderpriority FROM orders WHERE o_orderkey % 5 = 0)
      SELECT o_orderpriority, COUNT(*) AS n, 'intersect_all' AS op
      FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 1
      UNION ALL
      SELECT o_orderpriority, COUNT(*) AS n, 'except_all' AS op
      FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 1"""))

  /** Shared as-of fixture pairing (j10/j11/j12): orders folded into
    * the events month. The raw tables are time-DISJOINT (orders
    * 1995-2001, events 2024) — raw backward would degenerate to
    * "each user's last order ever" and forward to all-null. The fold
    * `o_ts = 2024-01-01 + (epoch_us(o_orderdate) mod 30 days)` is
    * integer-exact in both engines (pmod on positive micros), scatters
    * the right side across the left's range (sf0.01: backward matches
    * ~90%, forward ~87% — both null paths real), and dedupes to one
    * row per (custkey, o_ts) with a max-orderkey tiebreak. */
  private def asofFixture(s: org.apache.spark.sql.SparkSession,
      dir: String) = {
    val e = Tables(s, dir, "events").select("event_id", "user_id", "ts")
    val r = Tables(s, dir, "orders")
      .withColumn("o_ts", timestamp_micros(
        unix_micros(lit("2024-01-01 00:00:00").cast("timestamp")) +
          pmod(unix_micros(col("o_orderdate").cast("timestamp")),
            lit(2592000000000L))))
      .groupBy(col("o_custkey"), col("o_ts"))
      .agg(max(col("o_orderkey")).as("o_orderkey"),
        max_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))
    (e, r)
  }

  private val asofRightSql = """
        SELECT o_custkey,
          make_timestamp(epoch_us(TIMESTAMP '2024-01-01')
            + epoch_us(o_orderdate) % 2592000000000) AS o_ts,
          MAX(o_orderkey) AS o_orderkey,
          MAX_BY(o_totalprice, o_orderkey) AS o_totalprice
        FROM orders GROUP BY 1, 2"""

  /** j10 — AS-OF join: each event matched to the user's most recent
    * order-activity timestamp at or before the event (DuckDB `ASOF
    * JOIN`; Spark has no native operator). Runs through
    * [[graft.ops.Ops.asofJoin]]'s union+carry-forward plan — one
    * exchange per side on the key, one per-partition sort, zero pair
    * multiplication (the range-theta form multiplies every event by
    * every earlier order before pruning; at 100 TB that's the
    * difference between a sort-merge-join profile and a quadratic
    * one). Right side from [[asofFixture]] (time-folded + deduped). */
  private val j10 = GraftQuery(
    "j10_asof_join",
    (s, dir) => {
      val (e, r) = asofFixture(s, dir)
      graft.ops.Ops.asofJoin(e, r,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_ts",
        rightPayload = Seq("o_orderkey", "o_ts", "o_totalprice"))
    },
    Some(s"""WITH r AS ($asofRightSql)
      SELECT e.event_id, e.user_id, e.ts,
        r.o_orderkey, r.o_ts, r.o_totalprice
      FROM events e ASOF LEFT JOIN r
        ON e.user_id = r.o_custkey AND e.ts >= r.o_ts"""))

  /** j11 — FORWARD as-of: each event matched to the user's FIRST
    * order-activity at or after it (fulfillment-lookahead shape).
    * DuckDB's ASOF JOIN only binds backward (`>=`), so the oracle uses
    * the negation trick: forward-asof on t is exactly backward-asof on
    * -t — negate both sides' times (epoch micros), ASOF on the negated
    * axis, report the original columns. The Spark side runs the same
    * [[graft.ops.Ops.asofJoin]] plan with `AsofForward` (the mirrored
    * descending carry window) — same single keyed shuffle as j10. */
  private val j11 = GraftQuery(
    "j11_asof_forward",
    (s, dir) => {
      val (e, r) = asofFixture(s, dir)
      graft.ops.Ops.asofJoin(e, r,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_ts",
        rightPayload = Seq("o_orderkey", "o_ts", "o_totalprice"),
        direction = graft.ops.Ops.AsofForward)
    },
    Some(s"""WITH r0 AS ($asofRightSql),
      r AS (SELECT *, -epoch_us(o_ts) AS nt FROM r0),
      e AS (SELECT event_id, user_id, ts, -epoch_us(ts) AS nt FROM events)
      SELECT e.event_id, e.user_id, e.ts,
        r.o_orderkey, r.o_ts, r.o_totalprice
      FROM e ASOF LEFT JOIN r
        ON e.user_id = r.o_custkey AND e.nt >= r.nt"""))

  /** j12 — NEAREST as-of: each event matched to the user's closest
    * order-activity in time, either direction, exact ties preferring
    * the earlier one (pandas `merge_asof(direction='nearest')`). The
    * oracle composes DuckDB's two one-directional ASOF JOINs (backward
    * native, forward via j11's negation trick) and picks the closer
    * per event — while the Spark plan computes BOTH carries off ONE
    * keyed shuffle (two in-partition sorts, no re-shuffle; pinned in
    * OpsSpec). */
  private val j12 = GraftQuery(
    "j12_asof_nearest",
    (s, dir) => {
      val (e, r) = asofFixture(s, dir)
      graft.ops.Ops.asofJoin(e, r,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_ts",
        rightPayload = Seq("o_orderkey", "o_ts", "o_totalprice"),
        direction = graft.ops.Ops.AsofNearest)
    },
    Some(s"""WITH r0 AS ($asofRightSql),
      r AS (SELECT *, -epoch_us(o_ts) AS nt FROM r0),
      e AS (SELECT event_id, user_id, ts, -epoch_us(ts) AS nt FROM events),
      b AS (
        SELECT e.event_id, e.user_id, e.ts, r.o_orderkey AS b_key,
          r.o_ts AS b_ts, r.o_totalprice AS b_price
        FROM events e ASOF LEFT JOIN r0 r
          ON e.user_id = r.o_custkey AND e.ts >= r.o_ts),
      f AS (
        SELECT e.event_id, r.o_orderkey AS f_key,
          r.o_ts AS f_ts, r.o_totalprice AS f_price
        FROM e ASOF LEFT JOIN r
          ON e.user_id = r.o_custkey AND e.nt >= r.nt),
      n AS (
        SELECT b.event_id, b.user_id, b.ts,
          CASE WHEN b_key IS NULL OR (f_key IS NOT NULL AND
                 epoch_us(b.ts) - epoch_us(b_ts)
                   > epoch_us(f_ts) - epoch_us(b.ts))
               THEN FALSE ELSE TRUE END AS take_b,
          b_key, b_ts, b_price, f_key, f_ts, f_price
        FROM b JOIN f USING (event_id))
      SELECT event_id, user_id, ts,
        CASE WHEN take_b THEN b_key ELSE f_key END AS o_orderkey,
        CASE WHEN take_b THEN b_ts ELSE f_ts END AS o_ts,
        CASE WHEN take_b THEN b_price ELSE f_price END AS o_totalprice
      FROM n"""))

  /** j13 — as-of with a TOLERANCE bound (pandas
    * `merge_asof(tolerance=...)`): the backward match is kept only
    * when it is at most 12 hours stale, else null. The Spark side is
    * j10's plan plus a per-row post-window check (no plan change); the
    * oracle post-filters DuckDB's ASOF the same way. Exercises both
    * outcomes at sf0.01 (most matches are fresher than 12h on the
    * folded fixture, a real fraction are not). */
  private val j13 = GraftQuery(
    "j13_asof_tolerance",
    (s, dir) => {
      val (e, r) = asofFixture(s, dir)
      graft.ops.Ops.asofJoin(e, r,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_ts",
        rightPayload = Seq("o_orderkey", "o_ts", "o_totalprice"),
        tolerance = Some(expr("INTERVAL 12 HOURS")))
    },
    Some(s"""WITH r AS ($asofRightSql),
      m AS (
        SELECT e.event_id, e.user_id, e.ts,
          r.o_orderkey, r.o_ts, r.o_totalprice
        FROM events e ASOF LEFT JOIN r
          ON e.user_id = r.o_custkey AND e.ts >= r.o_ts)
      SELECT event_id, user_id, ts,
        CASE WHEN ts - o_ts <= INTERVAL 12 HOUR THEN o_orderkey END
          AS o_orderkey,
        CASE WHEN ts - o_ts <= INTERVAL 12 HOUR THEN o_ts END AS o_ts,
        CASE WHEN ts - o_ts <= INTERVAL 12 HOUR THEN o_totalprice END
          AS o_totalprice
      FROM m"""))

  override val suite: Seq[GraftQuery] =
    Seq(j01, j02, j03, j04, j05, j06, j07, j08, j09, j10, j11, j12, j13)
}
