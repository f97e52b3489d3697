package graft

/** The SQL-text entry surface must reproduce the DataFrame registry
  * bit-for-bit: same rows from pure `spark.sql` text over the
  * registered table views, and query views that hash identically to
  * their DataFrame twins. */
class SqlSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rowSet(df: org.apache.spark.sql.DataFrame): Set[String] = {
    val cols = df.columns.sorted
    df.selectExpr(cols.map(c => s"CAST(`$c` AS STRING)"): _*)
      .collect().map(_.toSeq.map(String.valueOf).mkString("")).toSet
  }

  test("r01-shaped aggregation from pure SQL text equals the registry") {
    SqlCatalog.registerTables(spark, dir)
    val sqlResult = spark.sql(
      """SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS count_order
         FROM lineitem
         WHERE CAST(l_shipdate AS TIMESTAMP) <= TIMESTAMP '1998-09-02'
         GROUP BY 1, 2""")
    val api = SparkEntry.queries("r01_pricing_summary")(spark, dir)
    // r01 carries more measures; compare on the shared ones
    val shared = Seq("l_returnflag", "l_linestatus", "sum_qty", "count_order")
    assert(rowSet(sqlResult.select(shared.head, shared.tail: _*)) ==
      rowSet(api.select(shared.head, shared.tail: _*)))
    assert(sqlResult.count() == api.count())
  }

  test("graft functions drive a kNN from pure SQL text (v03 twin)") {
    SqlCatalog.registerTables(spark, dir)
    val sqlKnn = spark.sql(
      """WITH q AS (
           SELECT vec_id, transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
           FROM embeddings),
         scored AS (
           SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
             graft_sqdist_long(c.qv, qs.qv) AS d2
           FROM q c CROSS JOIN q qs
           WHERE qs.vec_id < 10 AND c.vec_id <> qs.vec_id),
         ranked AS (
           SELECT query_id, neighbor_id, d2,
             row_number() OVER (PARTITION BY query_id
               ORDER BY d2, neighbor_id) AS rnk
           FROM scored)
         SELECT query_id, neighbor_id,
           sqrt(CAST(d2 AS DOUBLE)) / 1e6 AS dist, CAST(rnk AS BIGINT) AS rnk
         FROM ranked WHERE rnk <= 5""")
    val api = SparkEntry.queries("v03_knn_bruteforce")(spark, dir)
    assert(rowSet(sqlKnn) == rowSet(api))
  }

  test("query views compose in SQL and hash-match their DataFrame twins") {
    val names = Set("d01_exact_dedup", "d11_drop_report", "t01_quality_metrics")
    SqlCatalog.install(spark, dir, names)
    names.foreach { n =>
      val viaView = spark.sql(s"SELECT * FROM $n")
      val viaApi = SparkEntry.queries(n)(spark, dir)
      assert(rowSet(viaView) == rowSet(viaApi), s"view $n diverges")
    }
    // composition on top of an operator view, pure SQL
    val dups = spark.sql(
      """SELECT COUNT(*) AS n FROM d01_exact_dedup WHERE group_size > 1""")
      .collect().head.getLong(0)
    assert(dups >= 0)
  }

  test("sketch aggregators are SQL-callable and match the Column API") {
    SqlCatalog.install(spark, dir)
    // HLL over order keys, pure SQL vs Column API — identical doubles
    val sqlEst = spark.sql(
      """SELECT graft_hll(graft_md5_long(CAST(o_orderkey AS STRING), 8)) e
         FROM orders""").collect().head.getDouble(0)
    val apiEst = graft.Tables(spark, dir, "orders")
      .select(graft.functions.HyperLogLog.hll(
        graft.functions.TextOps.md5Long32(
          org.apache.spark.sql.functions.col("o_orderkey"))).as("e"))
      .collect().head.getDouble(0)
    assert(sqlEst == apiEst)
    // heavy hitters + quantile summary run from SQL text and return
    // their structured summaries
    val hh = spark.sql(
      """SELECT inline(graft_heavy_hitters(o_custkey % 10)) FROM orders""")
    assert(hh.count() == 10) // 10 distinct residues fit k=64 -> exact
    val qs = spark.sql(
      """SELECT graft_quantile_summary(o_totalprice) s FROM orders""")
      .selectExpr("aggregate(s, 0L, (a, x) -> a + x.weight) AS mass")
      .collect().head.getLong(0)
    assert(qs == graft.Tables(spark, dir, "orders").count())
  }
}
