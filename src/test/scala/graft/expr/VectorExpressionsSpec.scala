package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorOps

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("SQL registration via GraftExtensions") {
    val r = spark.sql(
      "SELECT graft_l2_distance(array(0.0d, 3.0d), array(4.0d, 0.0d)) d")
      .as[Double].head()
    assert(r == 5.0)
    assert(spark.sql("SELECT graft_dot(array(1.0d,2.0d), array(3.0d,4.0d)) d")
      .as[Double].head() == 11.0)
  }

  test("codegen expressions agree with the lambda-fold forms") {
    val df = Seq.tabulate(100)(i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 17 + j)),
        Array.tabulate(16)(j => math.cos(i * 13 + j))))
      .toDF("id", "a", "b")
    val both = df.select(
      call_function("graft_l2_distance", col("a"), col("b")).as("fast"),
      VectorOps.l2Distance(col("a"), col("b")).as("lambda"),
      call_function("graft_cosine", col("a"), col("b")).as("fast_cos"),
      VectorOps.cosine(col("a"), col("b")).as("lambda_cos"))
      .collect()
    both.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-12)
    }
  }

  test("sqdist_long: exact integer parity with the lambda fold") {
    val df = Seq.tabulate(100)(i =>
      (i.toLong, Array.tabulate(16)(j => (i * 1000003L + j * 777L) % 2000000 - 1000000),
        Array.tabulate(16)(j => (i * 999983L - j * 333L) % 2000000 - 1000000)))
      .toDF("id", "a", "b")
    val both = df.select(
      call_function("graft_sqdist_long", col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x)
        .as("lambda"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // int arrays implicitly widen; null input yields null
    assert(spark.sql(
      "SELECT graft_sqdist_long(array(1, 2), array(3, 5)) d")
      .as[Long].head() == 13L)
    assert(spark.sql(
      "SELECT graft_sqdist_long(CAST(NULL AS ARRAY<BIGINT>), array(1L)) d")
      .collect().head.isNullAt(0))
  }

  test("graft_nfc composes decomposed sequences; idempotent; null-safe") {
    val decomposed = "cafe\u0301" // e + U+0301 combining acute
    val composed = "caf\u00e9"
    assert(decomposed != composed && decomposed.length == 5)
    val r = Seq(decomposed).toDF("s")
      .select(call_function("graft_nfc", col("s")).as("n"))
      .select(col("n"), length(col("n")).as("len"),
        call_function("graft_nfc", col("n")).as("again"))
      .head()
    assert(r.getString(0) == composed && r.getInt(1) == 4)
    assert(r.getString(2) == composed, "NFC must be idempotent")
    assert(spark.sql("SELECT graft_nfc(CAST(NULL AS STRING)) s")
      .head().isNullAt(0))
    // dot_long while we're here: exact integer dot
    assert(spark.sql("SELECT graft_dot_long(array(2L,3L), array(5L,7L)) d")
      .as[Long].head() == 31L)
  }

  test("graft_md5_long is bit-identical to the conv/substring/md5 chain") {
    val df = Seq.tabulate(500)(i => s"tok_${i}_${"x" * (i % 7)}")
      .toDF("s")
    val both = df.select(
      call_function("graft_md5_long", col("s"), lit(8)).as("fast32"),
      conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long").as("ref32"),
      call_function("graft_md5_long", col("s"), lit(15)).as("fast60"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("ref60"))
      .collect()
    both.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"32-bit mismatch: $r")
      assert(r.getLong(2) == r.getLong(3), s"60-bit mismatch: $r")
    }
    // JVM-side twin must agree too (driver-folded salt constants)
    import graft.functions.TextOps
    val one = df.limit(1).select(
      TextOps.md5Long60(col("s")).as("h"), col("s")).head()
    assert(one.getLong(0) == TextOps.md5Long60Jvm(one.getString(1)))
    // non-string input casts like before (e10 hashes user ids)
    assert(spark.sql("SELECT graft_md5_long(CAST(42 AS STRING), 8) h")
      .as[Long].head() ==
      spark.sql("SELECT CAST(conv(substring(md5(CAST(42 AS STRING)),1,8)," +
        "16,10) AS BIGINT) h").as[Long].head())
  }

  test("float arrays implicitly cast (embeddings table path)") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet").limit(5)
    val d = e.crossJoin(e.select(col("embedding").as("e2")).limit(1))
      .select(call_function("graft_l2_distance",
        col("embedding"), col("e2")).as("d"))
      .as[Double].collect()
    assert(d.length == 5 && d.forall(v => v >= 0.0 && !v.isNaN))
  }

  test("l2_normalize produces unit vectors; zero vectors pass through") {
    val df = Seq(
      (1L, Array(3.0, 4.0)),
      (2L, Array(0.0, 0.0))).toDF("id", "v")
    val out = df.select(col("id"),
      call_function("graft_l2_normalize", col("v")).as("n"))
      .as[(Long, Array[Double])].collect().toMap
    assert(math.abs(out(1L).map(x => x * x).sum - 1.0) < 1e-12)
    assert(out(2L).toSeq == Seq(0.0, 0.0))
    // cosine of a zero vector is defined as 0
    assert(df.filter($"id" === 2)
      .select(call_function("graft_cosine", col("v"), col("v")).as("c"))
      .as[Double].head() == 0.0)
  }

  test("null vector yields null (nullIntolerant)") {
    val df = Seq((1L, Option(Array(1.0)), Option.empty[Array[Double]]))
      .toDF("id", "a", "b")
    val r = df.select(
      call_function("graft_l2_distance", col("a"), col("b")).as("d"))
      .collect()
    assert(r.head.isNullAt(0))
  }

  test("sortable bits: order-preserving, exact round trip, codegen = eval") {
    val vals = Seq(Double.NegativeInfinity, -1.5e300, -2.0, -1.0,
      -Double.MinPositiveValue, -0.0, 0.0, Double.MinPositiveValue,
      1.0, 2.0, 1.5e300, Double.PositiveInfinity)
    val df = vals.zipWithIndex.map { case (d, i) => (i.toLong, d) }
      .toDF("id", "d")
      .select(col("id"), col("d"),
        call_function("graft_sortable_bits", col("d")).as("s"))
      .select(col("id"), col("d"), col("s"),
        call_function("graft_sortable_double", col("s")).as("back"))
    val rows = df.as[(Long, Double, Long, Double)].collect().sortBy(_._1)
    // round trip is bit-exact (-0.0 included)
    rows.foreach { case (_, d, _, back) =>
      assert(java.lang.Double.doubleToLongBits(d) ==
        java.lang.Double.doubleToLongBits(back), s"round trip lost $d")
    }
    // signed-long order of the mapped keys equals double order
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.toSeq)
    // interpreted eval agrees with the codegen path just exercised
    import graft.expr.DoubleSortableLong
    import org.apache.spark.sql.catalyst.expressions.Literal
    rows.foreach { case (_, d, s, _) =>
      assert(DoubleSortableLong(Literal(d)).eval(null) == s)
    }
  }

  test("graft_sqdist equals l2_distance squared; PQ ADC forms agree") {
    // sqdist == l2^2 (same sequential fold, no sqrt-then-square drift
    // beyond one rounding of the root)
    val d = spark.sql(
      "SELECT graft_sqdist(array(0.0d, 3.0d), array(4.0d, 0.0d)) d")
      .as[Double].head()
    assert(d == 25.0)
    // ADC: codes pick flat-table entries; the generic binary form and
    // the literal ternary form return identical sums, eval == codegen
    val codes = Seq(Seq(1, 0, 2))
    val flat = Seq(10.0, 11.0, 12.0, 20.0, 21.0, 22.0, 30.0, 31.0, 32.0)
    val df = codes.toDF("codes")
      .withColumn("t", typedLit(flat))
      .withColumn("generic", call_function("graft_pq_adc",
        col("codes"), col("t")))
      .withColumn("lit_form", call_function("graft_pq_adc_lit",
        col("codes"), lit(0), typedLit(Seq(flat))))
    val r = df.select("generic", "lit_form").as[(Double, Double)].head()
    assert(r._1 == 11.0 + 20.0 + 32.0, s"generic ADC sum ${r._1}")
    assert(r._1 == r._2, "literal-table ADC diverged from the generic form")
    // null codes → null (nullIntolerant), both forms
    val n = codes.toDF("codes")
      .select(call_function("graft_pq_adc",
          lit(null).cast("array<int>"), typedLit(flat)).as("a"),
        call_function("graft_pq_adc_lit",
          lit(null).cast("array<int>"), lit(0), typedLit(Seq(flat))).as("b"))
      .head()
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  test("graft_pq_encode matches a hand argmin and is codegen-stable") {
    // 2 subspaces of 2 dims, 2 centroids each
    val books = Seq(
      Seq(Seq(0.0, 0.0), Seq(10.0, 10.0)),
      Seq(Seq(5.0, 5.0), Seq(-5.0, -5.0)))
    val df = Seq(
      (1L, Seq(1.0, 1.0, 4.0, 4.0)),   // sub0 -> c0, sub1 -> c0
      (2L, Seq(9.0, 9.0, -4.0, -6.0)), // sub0 -> c1, sub1 -> c1
      (3L, Seq(5.0, 5.0, 0.0, 0.0)))   // sub0 equidistant -> lowest idx c0
      .toDF("id", "vec")
      .withColumn("codes", call_function("graft_pq_encode",
        col("vec"), typedLit(books)))
    val out = df.select("id", "codes").as[(Long, Seq[Int])]
      .collect().toMap
    assert(out == Map(1L -> Seq(0, 0), 2L -> Seq(1, 1), 3L -> Seq(0, 0)))
  }
}
