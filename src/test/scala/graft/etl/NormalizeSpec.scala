package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val now = lit("2024-01-01 00:00:00").cast("timestamp")

  private def staged = Seq(
    ("Bánh kem dâu", "brA", "Cakes", "u1", "http://a/1.jpg|http://a/2.jpg",
      "front| ", "desc1", """{"product_sizes":"S|M|L","product_prices":"1|2|3"}""", 50, "CA-001"),
    ("Trà sữa", "brB", "Tea", "u2", "http://b/1.jpg", "", "desc2",
      """{"product_sizes":"Standard","product_prices":"30000"}""", 10, "TE-001"),
    ("Bánh mì", "brA", "Breads & Buns", "u3", "http://c/1.jpg", "loaf",
      "desc3", """{"product_sizes":"Standard","product_prices":"20000"}""",
      0, "BR-001"))
    .toDF("product_name", "product_brand", "category_name", "product_url",
      "product_image_url", "product_image_name", "product_description",
      "product_unit_price", "product_stock_quantity", "product_code")
    .withColumn("product_discount_percentage", lit(10.0))
    .withColumn("product_total_orders", lit(5))
    .withColumn("product_total_ratings", lit(7))
    .withColumn("product_overall_stars", lit(4.2))

  test("categories dim: distinct names, dense ids, drink flag") {
    val cats = Normalize.categories(staged, now).collect()
    assert(cats.length == 3)
    val byName = cats.map(r =>
      r.getAs[String]("category_name") ->
        (r.getAs[Int]("category_id"), r.getAs[Int]("category_type"))).toMap
    // ids dense 1..3, ordered by name: Breads & Buns < Cakes < Tea
    assert(byName("Breads & Buns")._1 == 1)
    assert(byName("Cakes")._1 == 2)
    assert(byName("Tea") == ((3, 1)))
    assert(byName("Cakes")._2 == 0)
  }

  test("products fact: FK resolution + dense stable ids") {
    val cats = Normalize.categories(staged, now)
    val prods = Normalize.products(staged, cats, now)
    val rows = prods.orderBy("product_id").collect()
    assert(rows.map(_.getAs[Long]("product_id")).toSeq == Seq(1L, 2L, 3L))
    // sorted by product_code: BR-001, CA-001, TE-001
    assert(rows.map(_.getAs[String]("product_code")).toSeq ==
      Seq("BR-001", "CA-001", "TE-001"))
    val catIds = cats.collect().map(r =>
      r.getAs[String]("category_name") -> r.getAs[Int]("category_id")).toMap
    assert(rows(1).getAs[Int]("category_id") == catIds("Cakes"))
  }

  test("images child: explode parallel lists, default names, FK, ids") {
    val out = Normalize(staged, now)
    val imgs = out.images.orderBy("product_image_url_id").collect()
    // 2 images for CA-001 + 1 each for TE-001/BR-001
    assert(imgs.length == 4)
    val ids = imgs.map(_.getAs[Long]("product_image_url_id")).toSeq
    assert(ids == Seq(1L, 2L, 3L, 4L))
    // blank image name defaults to the product name
    val ca2 = imgs.find(_.getAs[String]("product_image_url") ==
      "http://a/2.jpg").get
    assert(ca2.getAs[String]("product_image_name") == "Bánh kem dâu")
    // FK integrity: every product_id exists in products
    val pids = out.products.select("product_id").as[Long].collect().toSet
    assert(imgs.map(_.getAs[Long]("product_id")).forall(pids.contains))
  }

  test("zipWithIndexId assigns dense 1-based ids at any partitioning") {
    val df = spark.range(1000).toDF("x").repartition(7)
    val ids = Normalize.zipWithIndexId(df, "rid")
      .select("rid").as[Long].collect().sorted
    assert(ids.toSeq == (1L to 1000L))
  }
}
