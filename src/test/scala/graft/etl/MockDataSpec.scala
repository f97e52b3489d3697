package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MockDataSpec extends SparkSpec {
  import spark.implicits._

  private val n = 20000
  private def base = spark.range(n).toDF("id")

  test("discount: Bernoulli(0.3) gate, values in {0} ∪ [5,50)") {
    val d = base.withColumn("d", MockData.discountPercentage(7))
      .select("d").as[Int].collect()
    assert(d.forall(v => v == 0 || (v >= 5 && v < 50)))
    val frac = d.count(_ > 0).toDouble / n
    assert(frac > 0.27 && frac < 0.33, s"discount fraction $frac")
  }

  test("ratings: Exp(50)+1, positive, mean near 50.5") {
    val r = base.withColumn("r", MockData.totalRatings(11))
      .select("r").as[Int].collect()
    assert(r.forall(_ >= 1))
    val mean = r.map(_.toDouble).sum / n
    assert(mean > 46 && mean < 55, s"ratings mean $mean")
  }

  test("stars: Beta(4,1.5)*4+1 in [1,5], mean near 3.91, skewed high") {
    val s = base.withColumn("s", MockData.overallStars(13))
      .select("s").as[Double].collect()
    assert(s.forall(v => v >= 1.0 && v <= 5.0))
    val mean = s.sum / n
    // E[Beta(4,1.5)] = 4/5.5 = 0.7272… → 0.7272*4+1 = 3.909
    assert(mean > 3.85 && mean < 3.97, s"stars mean $mean")
    assert(s.count(_ > 3.5).toDouble / n > 0.6, "should skew high")
  }

  test("orders: UniformInt[0,500), mean near 250") {
    val o = base.withColumn("o", MockData.totalOrders(17))
      .select("o").as[Int].collect()
    assert(o.forall(v => v >= 0 && v < 500))
    val mean = o.map(_.toDouble).sum / n
    assert(mean > 240 && mean < 260, s"orders mean $mean")
  }

  test("seeded generators are reproducible run-to-run") {
    def sig = base.withColumn("r", MockData.totalRatings(42))
      .agg(sum("r")).as[Long].head()
    assert(sig == sig)
  }

  test("unit price ladder: S|M|L, 12000 step for Cakes else 5000") {
    val df = Seq(("Cakes", 50000L), ("Tea", 30000L), ("Coffee", 0L))
      .toDF("category_name", "price")
      .withColumn("up",
        MockData.unitPriceJson(col("price"), col("category_name")))
      .select("up").as[String].collect()
    assert(df(0) ==
      """{"product_sizes":"S|M|L","product_prices":"50000|62000|74000"}""")
    assert(df(1) ==
      """{"product_sizes":"S|M|L","product_prices":"30000|35000|40000"}""")
    // zero price falls back to the 50000 default base
    assert(df(2) ==
      """{"product_sizes":"S|M|L","product_prices":"50000|55000|60000"}""")
  }

  test("product codes: BR-CA-001 style, dense per category") {
    val df = Seq(
      ("brA", "Cakes", "p1"), ("brA", "Cakes", "p2"), ("brB", "Tea", "p3"))
      .toDF("product_brand", "category_name", "product_name")
    val codes = MockData.withProductCodes(df, "product_name")
      .select("product_code").as[String].collect().sorted.toSeq
    assert(codes == Seq("BR-CA-001", "BR-CA-002", "BR-TE-001"))
  }
}
