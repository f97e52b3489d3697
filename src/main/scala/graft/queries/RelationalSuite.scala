package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.{GraftQuery, QuerySuite, Tables}

/** Cross-engine-deterministic arithmetic helpers.
  *
  * The driver hash-compares Spark output against DuckDB, so every double
  * we emit must be bit-identical across engines. Money columns in the
  * test tables are exact 2-decimal values, so `double -> decimal(18,2)`
  * casts are lossless; all sums then happen in exact decimal arithmetic
  * and only the final value is cast back to double.
  */
object Det {
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** SUM over an exact decimal view of a 2-decimal money column. */
  def sumDec(c: Column): Column = sum(dec2(c)).cast("double")

  /** AVG computed as exact-decimal sum / count (deterministic division). */
  def avgDec(c: Column): Column = sum(dec2(c)).cast("double") / count(lit(1))

  /** SQL fragments mirroring the above for the DuckDB oracle. */
  def sqlSumDec(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlAvgDec(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)"
}

/** Relational operator inventory — SURVEY.md §2.2 (P*), §2.3 (D*),
  * §2.4 (J*), §2.5 (A*), §2.6 (W*), §2.7 (O*), §2.8 (U1).
  *
  * Scale notes (100 TB): every aggregation here is partial-aggregate
  * friendly (map-side combine); the dim joins (r07, r15) broadcast the
  * small side explicitly; dedup/topk avoid global sorts
  * (TakeOrderedAndProject / per-partition windows keyed on the shuffle
  * key, never a single-partition window over the fact table).
  */
object RelationalSuite extends QuerySuite {
  import Det._

  private val one2 = lit(1).cast(DecimalType(4, 2))

  /** r01 — TPC-H Q1-shaped pricing summary (A3/A4 + grouped agg).
    * Ref semantics: per-group sums/avgs/counts as in
    * `scripts/pipeline.py:66-68,109` generalized to grouped form. */
  private val r01 = GraftQuery(
    "r01_pricing_summary",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val disc = li("l_discount").cast(DecimalType(4, 2))
      li.filter(li("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(li("l_returnflag"), li("l_linestatus"))
        .agg(
          sumDec(li("l_quantity")).as("sum_qty"),
          sumDec(li("l_extendedprice")).as("sum_base_price"),
          sum(dec2(li("l_extendedprice")) * (one2 - disc)).cast("double")
            .as("sum_disc_price"),
          avgDec(li("l_quantity")).as("avg_qty"),
          avgDec(li("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
      ${sqlSumDec("l_quantity")} AS sum_qty,
      ${sqlSumDec("l_extendedprice")} AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      ${sqlAvgDec("l_quantity")} AS avg_qty,
      ${sqlAvgDec("l_extendedprice")} AS avg_price,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus"""))

  /** r02 — filter + projection + derived column (P1/P3/P5/P7, F22).
    * Filters and the 4-column read schema push down to the parquet scan. */
  private val r02 = GraftQuery(
    "r02_filter_project",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      li.filter(li("l_quantity") >= 45 && li("l_returnflag") === "R")
        .select(
          li("l_orderkey"),
          li("l_linenumber").cast("long").as("l_linenumber"),
          (dec2(li("l_extendedprice")) *
            (one2 + li("l_tax").cast(DecimalType(4, 2))))
            .cast("double").as("charge"))
    },
    Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      CAST(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2))) AS DOUBLE) AS charge
    FROM lineitem WHERE l_quantity >= 45 AND l_returnflag = 'R'"""))

  /** r03 — conditional scalar + IN-list membership (P8/P9; ref
    * `generate_mock_data.py:110-127`, `seperate_tables.py:25`). */
  private val r03 = GraftQuery(
    "r03_conditional_case",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
      o.withColumn("priority_class",
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
            .when(col("o_orderpriority") === "3-MEDIUM", "medium")
            .otherwise("low"))
        .groupBy("o_orderstatus", "priority_class")
        .agg(count(lit(1)).as("cnt"), sumDec(col("o_totalprice")).as("total"))
    },
    Some(s"""SELECT o_orderstatus,
      CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'high'
           WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
           ELSE 'low' END AS priority_class,
      COUNT(*) AS cnt, ${sqlSumDec("o_totalprice")} AS total
    FROM orders GROUP BY 1, 2"""))

  /** r04 — deterministic keep-first dedup (D1/W3; ref
    * `remove_duplicates.py:6-12`). pandas keep='first' becomes an
    * explicit stable order, computed as a `min(struct)` AGGREGATE
    * ([[graft.ops.Ops.dedupKeepFirstAgg]]): each partition collapses to
    * one candidate per key map-side, so the exchange carries one row
    * per (partition, key) — the old window form shuffled and sorted
    * every input row for the same keep-first output. */
  private val r04 = GraftQuery(
    "r04_dedup_keep_first",
    (s, dir) =>
      graft.ops.Ops.dedupKeepFirstAgg(
        Tables(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "l_quantity"),
        Seq("l_orderkey"), Seq("l_linenumber", "l_partkey", "l_suppkey"))
        .select("l_orderkey", "l_partkey", "l_quantity"),
    Some("""SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
    QUALIFY row_number() OVER (PARTITION BY l_orderkey
      ORDER BY l_linenumber, l_partkey, l_suppkey) = 1"""))

  /** r05 — full-duplicate detection: keep only repeating keys (D3; ref
    * `tests/test_duplicate_products.py:6-26`). */
  private val r05 = GraftQuery(
    "r05_dup_detect",
    (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1),
    Some("""SELECT l_partkey, l_suppkey, COUNT(*) AS cnt FROM lineitem
    GROUP BY 1, 2 HAVING COUNT(*) > 1"""))

  /** r06 — anti join / except-by-key (D4; ref `menus_crawling.py:12-19`
    * parent-URL removal): customers that placed no orders. */
  private val r06 = GraftQuery(
    "r06_anti_join",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
      c.join(o, Seq("c_custkey"), "left_anti").select("c_custkey", "c_name")
    },
    Some("""SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"""))

  /** r07 — dim-lookup via broadcast hash join (J1/J2/J6; ref
    * `seperate_tables.py:111-117,140-143` dict lookups). nation and region
    * are tiny dims → explicit broadcast, zero shuffle of the fact side
    * beyond the final agg. */
  private val r07 = GraftQuery(
    "r07_dim_broadcast_join",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("cnt"), sumDec(c("c_acctbal")).as("total_bal"))
    },
    Some(s"""SELECT r_name, n_name, COUNT(*) AS cnt,
      ${sqlSumDec("c_acctbal")} AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1, 2"""))

  /** r08 — fact-to-fact equi-join + grouped agg (J3; ref
    * `generate_embeddings.py:383-399`). Shuffles both sides on the join
    * key once; AQE picks SMJ/SHJ by runtime stats. */
  private val r08 = GraftQuery(
    "r08_join_agg",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sumDec(o("o_totalprice")).as("revenue"))
    },
    Some(s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
      ${sqlSumDec("o_totalprice")} AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1"""))

  /** r09 — semi join (J5; ref `generate_embeddings.py:377-399` IN-list):
    * large parts that were actually ordered. */
  private val r09 = GraftQuery(
    "r09_semi_join",
    (s, dir) => {
      val p = Tables(s, dir, "part").filter(col("p_size") > 40)
      val li = Tables(s, dir, "lineitem").select(col("l_partkey").as("p_partkey"))
      p.join(li, Seq("p_partkey"), "left_semi").select("p_partkey", "p_name")
    },
    Some("""SELECT p_partkey, p_name FROM part p WHERE p_size > 40
    AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)"""))

  /** r10 — per-group running counter (A1/W1; ref
    * `generate_mock_data.py:94-103`): first 3 orders per customer. */
  private val r10 = GraftQuery(
    "r10_group_counter",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      o.withColumn("seq", row_number().over(w).cast("long"))
        .filter(col("seq") <= 3)
        .select("o_orderkey", "o_custkey", "seq")
    },
    Some("""SELECT o_orderkey, o_custkey, CAST(row_number() OVER
      (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS seq
    FROM orders QUALIFY seq <= 3"""))

  /** r11 — dense sequential ids over a dim (A2/W2; ref
    * `seperate_tables.py:112-117`). Single-partition window is fine for a
    * dim table; fact-scale dense ids use zipWithIndex (graft.ops.Ids). */
  private val r11 = GraftQuery(
    "r11_dense_ids",
    (s, dir) =>
      Tables(s, dir, "nation")
        .withColumn("nation_sk",
          row_number().over(Window.orderBy("n_name")).cast("long"))
        .select("nation_sk", "n_name"),
    Some("""SELECT CAST(row_number() OVER (ORDER BY n_name) AS BIGINT) AS nation_sk,
      n_name FROM nation"""))

  /** r12 — distinct (A5; ref `tests/test_standardize_categories.py:15`). */
  private val r12 = GraftQuery(
    "r12_distinct",
    (s, dir) => Tables(s, dir, "customer").select("c_mktsegment").distinct(),
    Some("SELECT DISTINCT c_mktsegment FROM customer"))

  /** r13 — union-by-name across extents (U1; ref
    * `seperate_tables.py:191-194`). */
  private val r13 = GraftQuery(
    "r13_union_by_name",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
        .select(col("c_name").as("name"), lit("customer").as("src"))
      val sup = Tables(s, dir, "supplier")
        .select(lit("supplier").as("src"), col("s_name").as("name"))
      c.unionByName(sup)
    },
    Some("""SELECT c_name AS name, 'customer' AS src FROM customer
    UNION ALL SELECT s_name AS name, 'supplier' AS src FROM supplier"""))

  /** r14 — global top-k (O1; ref `generate_embeddings.py:449-452`).
    * Total order via tiebreak key; Spark plans TakeOrderedAndProject
    * (per-partition heap + driver merge, no global sort). */
  private val r14 = GraftQuery(
    "r14_topk",
    (s, dir) =>
      Tables(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_totalprice"),
    Some("""SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""))

  /** r15 — per-group top-k (generalized O1, SURVEY §2.6): top-3 customers
    * by balance per nation. */
  private val r15 = GraftQuery(
    "r15_group_topk",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      c.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .select("n_name", "c_custkey", "c_acctbal", "rnk")
    },
    Some("""SELECT n_name, c_custkey, c_acctbal, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT c_nationkey, c_custkey, c_acctbal, row_number() OVER
        (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk
      FROM customer) c
    JOIN nation ON c_nationkey = n_nationkey
    WHERE rnk <= 3"""))

  /** r16 — rollup over region/nation (SURVEY §2.5 "free in Spark" note).
    * Null grouping markers are coalesced to 'ALL' so the hash compare is
    * unambiguous. */
  private val r16 = GraftQuery(
    "r16_rollup",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      val joined = c
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select("r_name", "n_name")
      joined.createOrReplaceTempView("graft_r16_src")
      s.sql("""SELECT COALESCE(r_name, 'ALL') AS r_name,
          COALESCE(n_name, 'ALL') AS n_name, COUNT(*) AS cnt
        FROM graft_r16_src GROUP BY ROLLUP (r_name, n_name)""")
    },
    Some("""SELECT COALESCE(r_name, 'ALL') AS r_name,
      COALESCE(n_name, 'ALL') AS n_name, COUNT(*) AS cnt
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)"""))

  /** r17 — full CUBE (completes the grouping-analytics family next to
    * r16 ROLLUP and j07 GROUPING SETS): all four aggregation levels of
    * (returnflag, linestatus) with exact-decimal money sums. Same SQL
    * surface both engines; null markers coalesced for the hash.
    *
    * Scale note (100 TB): Spark's native `GROUP BY CUBE` plans Expand
    * BEFORE the aggregate — every scanned row is replicated once per
    * grouping set (4x here), so the CPU on the hot scan path is 4x the
    * data. Because count/sum re-aggregate exactly (sum of partial
    * decimal sums == the direct sum; cnt likewise), we instead
    * aggregate the fact table ONCE on the finest level — 600k rows
    * collapse to |distinct (flag,status)| ~ 6 — and only THEN expand
    * that tiny frame into the four cube levels and re-aggregate. One
    * full-width pass instead of four; the Expand multiplier applies to
    * rows-after-aggregation, not rows-scanned. The per-level `lvl` tag
    * mirrors grouping_id so genuinely-null base keys stay distinct
    * rows from the subtotal null markers, exactly as native CUBE emits
    * them; output is bit-identical to the oracle's native CUBE. */
  private val r17 = GraftQuery(
    "r17_cube",
    (s, dir) => {
      val base = Tables(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"),
          sum(Det.dec2(col("l_quantity"))).as("sq"))
      val nullS = lit(null).cast("string")
      def g(lvl: Int, rf: Column, ls: Column) =
        struct(lit(lvl).as("lvl"), rf.as("rf"), ls.as("ls"))
      base
        .select(explode(array(
            g(0, col("l_returnflag"), col("l_linestatus")),
            g(1, col("l_returnflag"), nullS),
            g(2, nullS, col("l_linestatus")),
            g(3, nullS, nullS))).as("g"),
          col("cnt"), col("sq"))
        .groupBy(col("g.lvl"), col("g.rf"), col("g.ls"))
        .agg(sum(col("cnt")).as("cnt"), sum(col("sq")).cast("double").as("sum_qty"))
        .select(
          coalesce(col("rf"), lit("ALL")).as("l_returnflag"),
          coalesce(col("ls"), lit("ALL")).as("l_linestatus"),
          col("cnt"), col("sum_qty"))
    },
    Some("""SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
      COALESCE(l_linestatus, 'ALL') AS l_linestatus,
      COUNT(*) AS cnt,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"""))

  /** r18 — set-collecting aggregation (collect_set / LISTAGG family):
    * distinct ship modes and the priority list per order status. The
    * collected sets serialize as SORTED joined strings — a raw array
    * column would be nondeterministically ordered AND unsortable by
    * the driver's row comparator; the sorted join makes the value
    * deterministic and scalar. */
  private val r18 = GraftQuery(
    "r18_collect_set",
    (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n"),
          array_join(sort_array(collect_set(col("o_orderpriority"))), "|")
            .as("priorities"),
          countDistinct(col("o_orderpriority")).as("n_priorities")),
    Some("""SELECT o_orderstatus, COUNT(*) AS n,
      array_to_string(list_sort(list(DISTINCT o_orderpriority)), '|')
        AS priorities,
      COUNT(DISTINCT o_orderpriority) AS n_priorities
    FROM orders GROUP BY 1"""))

  /** r19 — correlated scalar subquery (the TPC-H Q17 shape): orders
    * above their own customer's exact-decimal average. Catalyst
    * DECORRELATES the subquery into an aggregate + join — the plan a
    * hand-written self-join would produce, but derived by the
    * optimizer from the declarative form; DuckDB does the same
    * flattening, so both engines run the identical relational
    * semantics. Money math through the exact-decimal recipe in BOTH
    * texts keeps the comparison bit-exact. */
  private val r19 = GraftQuery(
    "r19_correlated_subquery",
    (s, dir) => {
      Tables(s, dir, "orders").createOrReplaceTempView("graft_r19_orders")
      s.sql("""SELECT o_orderkey, o_custkey,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        FROM graft_r19_orders o
        WHERE CAST(o_totalprice AS DECIMAL(18,2)) > (
          SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,2)))
                   / COUNT(*) AS DECIMAL(18,2))
          FROM graft_r19_orders i
          WHERE i.o_custkey = o.o_custkey)""")
    },
    Some("""SELECT o_orderkey, o_custkey,
      CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
    FROM orders o
    WHERE CAST(o_totalprice AS DECIMAL(18,2)) > (
      SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,2)))
               / COUNT(*) AS DECIMAL(18,2))
      FROM orders i
      WHERE i.o_custkey = o.o_custkey)"""))

  /** r20 — key-based upsert ([[graft.ops.Ops.upsertByKey]] — the MERGE
    * INTO semantic on plain storage): a derived "update batch" (every
    * 9th order, price bumped) merged over the base; same-key rows are
    * replaced, the rest survive. The oracle states the definitional
    * form: updates UNION ALL (base anti-join update keys). */
  private val r20 = GraftQuery(
    "r20_upsert",
    (s, dir) => {
      val base = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          Det.dec2(col("o_totalprice")).cast("double").as("price"),
          col("o_orderstatus"))
      val updates = base.filter(col("o_orderkey") % 9 === 0)
        .withColumn("price",
          (Det.dec2(col("price")) * 2).cast("double"))
        .withColumn("o_orderstatus", lit("U"))
      graft.ops.Ops.upsertByKey(base, updates, Seq("o_orderkey"))
    },
    Some("""WITH base AS (
        SELECT o_orderkey, o_custkey,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
          o_orderstatus
        FROM orders),
      updates AS (
        SELECT o_orderkey, o_custkey,
          CAST(CAST(price AS DECIMAL(18,2)) * 2 AS DOUBLE) AS price,
          'U' AS o_orderstatus
        FROM base WHERE o_orderkey % 9 = 0)
      SELECT * FROM updates
      UNION ALL
      SELECT b.* FROM base b
      WHERE NOT EXISTS (SELECT 1 FROM updates u
                        WHERE u.o_orderkey = b.o_orderkey)"""))

  override val suite: Seq[GraftQuery] = Seq(
    r01, r02, r03, r04, r05, r06, r07, r08,
    r09, r10, r11, r12, r13, r14, r15, r16, r17, r18, r19, r20)
}
