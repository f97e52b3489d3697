package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{GraftQuery, QuerySuite, Tables}

/** Window-function coverage beyond the reference's three idioms
  * (SURVEY.md §2.6) — the full ranking/navigation/frame surface a
  * replacement engine must offer. All windows partition on
  * high-cardinality keys (no single-partition windows on fact paths).
  */
object WindowSuite extends QuerySuite {
  import Det._

  /** w01 — lead/lag navigation: next order date per customer. */
  private val w01 = GraftQuery(
    "w01_lead_lag",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          lag("o_orderdate", 1).over(w).as("prev_date"),
          lead("o_orderdate", 1).over(w).as("next_date"))
    },
    Some("""SELECT o_orderkey, o_custkey,
      lag(o_orderdate) OVER w AS prev_date,
      lead(o_orderdate) OVER w AS next_date
    FROM orders WINDOW w AS (PARTITION BY o_custkey
      ORDER BY o_orderdate, o_orderkey)"""))

  /** w02 — ntile quartiles by account balance within nation. */
  private val w02 = GraftQuery(
    "w02_ntile",
    (s, dir) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
          ntile(4).over(w).cast("long").as("quartile"))
    },
    Some("""SELECT c_custkey, c_nationkey,
      CAST(ntile(4) OVER (PARTITION BY c_nationkey
        ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS quartile
    FROM customer"""))

  /** w03 — rank / dense_rank / percent_rank / cume_dist per nation
    * (deterministic: total order via custkey tiebreak). */
  private val w03 = GraftQuery(
    "w03_rank_family",
    (s, dir) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables(s, dir, "customer")
        .select(col("c_custkey"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          percent_rank().over(w).as("prnk"),
          cume_dist().over(w).as("cd"))
    },
    Some("""SELECT c_custkey,
      CAST(rank() OVER w AS BIGINT) AS rnk,
      CAST(dense_rank() OVER w AS BIGINT) AS drnk,
      percent_rank() OVER w AS prnk,
      cume_dist() OVER w AS cd
    FROM customer WINDOW w AS (PARTITION BY c_nationkey
      ORDER BY c_acctbal DESC, c_custkey)"""))

  /** w04 — RANGE frame over a numeric day offset: rolling 7-day order
    * count per customer (range frames need a numeric order key — epoch
    * days — identically in both engines). */
  private val w04 = GraftQuery(
    "w04_range_frame",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("day")
        .rangeBetween(-6, Window.currentRow)
      Tables(s, dir, "orders")
        .withColumn("day", datediff(col("o_orderdate"), lit("1992-01-01")))
        .select(col("o_orderkey"), col("o_custkey"), col("day").cast("long").as("day"),
          count(lit(1)).over(w).as("orders_7d"))
    },
    Some("""SELECT o_orderkey, o_custkey, CAST(day AS BIGINT) AS day,
      COUNT(*) OVER (PARTITION BY o_custkey ORDER BY day
        RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS orders_7d
    FROM (SELECT o_orderkey, o_custkey,
            date_diff('day', DATE '1992-01-01', o_orderdate) AS day
          FROM orders)"""))

  /** w05 — first/last value with an explicit full-partition frame
    * (last_value needs it; the classic window gotcha). */
  private val w05 = GraftQuery(
    "w05_first_last",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          first("o_orderdate").over(w).as("first_order"),
          last("o_orderdate").over(w).as("last_order"))
    },
    Some("""SELECT o_orderkey, o_custkey,
      first_value(o_orderdate) OVER w AS first_order,
      last_value(o_orderdate) OVER w AS last_order
    FROM orders WINDOW w AS (PARTITION BY o_custkey
      ORDER BY o_orderdate, o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""))

  /** w06 — windowed share-of-total: each order's fraction of its
    * customer's exact total spend. */
  private val w06 = GraftQuery(
    "w06_share_of_total",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey")
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          (dec2(col("o_totalprice")).cast("double") /
            sum(dec2(col("o_totalprice"))).over(w).cast("double"))
            .as("share"))
    },
    Some("""SELECT o_orderkey, o_custkey,
      CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) /
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
          OVER (PARTITION BY o_custkey) AS DOUBLE) AS share
    FROM orders"""))

  /** w07 — nth_value / offset family completion: the 3rd order price
    * in each customer's date order (full-frame nth_value) plus lead
    * with an explicit default — the two window shapes w01/w05 leave
    * uncovered. Tie-broken by orderkey so the order is total. */
  private val w07 = GraftQuery(
    "w07_nth_value",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val full = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          nth_value(dec2(col("o_totalprice")).cast("double"), 3)
            .over(full).as("third_price"),
          lead(col("o_orderkey"), 2, -1L).over(w).as("next2_key"))
    },
    Some("""SELECT o_orderkey, o_custkey,
      nth_value(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 3)
        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        AS third_price,
      lead(o_orderkey, 2, -1) OVER (PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey) AS next2_key
    FROM orders"""))

  override val suite: Seq[GraftQuery] =
    Seq(w01, w02, w03, w04, w05, w06, w07)
}
