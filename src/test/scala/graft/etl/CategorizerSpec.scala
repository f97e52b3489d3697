package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CategorizerSpec extends SparkSpec {
  import spark.implicits._

  private def categorize(rows: Seq[(String, String)]): Seq[String] =
    rows.toDF("original_category", "product_name")
      .withColumn("cat",
        Categorizer.standardize(col("original_category"), col("product_name")))
      .select("cat").as[String].collect().toSeq

  test("exact membership match, first mapping entry wins") {
    assert(categorize(Seq(("Cakes", "x"))) == Seq("Cakes"))
    assert(categorize(Seq(("  DRY CAKES  ", "x"))) == Seq("Cakes"))
    assert(categorize(Seq(("bánh mì", "x"))) == Seq("Breads & Buns"))
    assert(categorize(Seq(("tra-sua", "x"))) == Seq("Tea"))
    assert(categorize(Seq(("bingsu", "x"))) == Seq("Bingsu"))
  }

  test("composite birthday-cake special case precedes everything") {
    assert(categorize(Seq(("cakes|bánh tiệc - bánh sinh nhật", "x")))
      == Seq("Season & Specialist"))
  }

  test("'khác' and unknown categories fall back to product-name regex") {
    assert(categorize(Seq(("khác", "hộp Cookies bơ"))) ==
      Seq("Cookies & Biscuits"))
    assert(categorize(Seq(("unknown-cat", "bánh mì que"))) ==
      Seq("Breads & Buns"))
    // regex variants are escaped: the '|' inside 'buns|savory' is a
    // literal, so a name containing just 'savory' must NOT match it
    assert(categorize(Seq(("???", "savory thing"))) == Seq("Others"))
  }

  test("no match anywhere yields Others") {
    assert(categorize(Seq(("mystery", "totally unrelated"))) == Seq("Others"))
  }

  test("category_type flags drinks as 1") {
    val types = Seq("Coffee", "Tea", "Cakes", "Bingsu")
      .toDF("category_name")
      .withColumn("t", Categorizer.categoryType(col("category_name")))
      .select("t").as[Int].collect().toSeq
    assert(types == Seq(1, 1, 0, 0))
  }
}
