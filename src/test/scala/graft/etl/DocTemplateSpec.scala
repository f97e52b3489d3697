package graft.etl

import graft.SparkSpec

class DocTemplateSpec extends SparkSpec {

  private val drink = ProductDoc(
    product_code = "CF-001", product_name = "Cà phê sữa đá",
    product_brand = "brA", category_id = 10, category_name = "Cà phê",
    category_description = "đậm đà", product_description = "ngon",
    product_unit_price =
      """{"product_sizes":"S|M","product_prices":"30000|35000"}""",
    product_discount_percentage = 10.0, product_overall_stars = 4.7,
    product_total_ratings = 12, product_total_orders = 1500,
    product_stock_quantity = 200)

  private val food = drink.copy(
    product_code = "CA-001", product_name = "Bánh kem dâu",
    category_id = 1, category_name = "Bánh ngọt",
    product_unit_price = "50000", product_discount_percentage = 0.0,
    product_overall_stars = 3.0, product_total_orders = 5,
    product_stock_quantity = 0)

  test("drink docs assert drink-ness, sizes, discount, bestseller") {
    val d = DocTemplate.render(drink)
    assert(d.contains("ĐÂY LÀ THỨC UỐNG"))
    assert(d.contains("Sản phẩm thuộc danh mục Cà phê."))
    assert(d.contains("Về danh mục này: đậm đà"))
    assert(d.contains("S for 30000, M for 35000"))
    assert(d.contains("giảm giá 10.0%"))
    assert(d.contains("được đánh giá rất cao với 4.7 sao"))
    assert(d.contains("bán chạy với hơn 1500 lượt"))
    assert(d.contains("còn nhiều hàng"))
    assert(d.endsWith("không phải để ăn."))
  }

  test("food docs assert food-ness and stock-out") {
    val d = DocTemplate.render(food)
    assert(d.contains("ĐÂY LÀ MÓN ĂN hoặc BÁNH"))
    assert(d.contains("số điểm đánh giá là 3.0"))
    assert(d.contains("hết hàng"))
    assert(!d.contains("size với nhiều mức giá")) // non-JSON price
    assert(d.endsWith("không phải để uống."))
  }

  test("long descriptions truncate at 1000 chars with ellipsis") {
    val d = DocTemplate.render(food.copy(product_description = "x" * 1500))
    assert(d.contains("x" * 1000 + "..."))
    assert(!d.contains("x" * 1001))
  }

  test("render is deterministic and total on null-ish fields") {
    val sparse = food.copy(product_description = null, product_brand = null,
      category_description = null)
    assert(DocTemplate.render(sparse) == DocTemplate.render(sparse))
  }

  test("metadata map carries the join-back keys") {
    val m = DocTemplate.metadata(drink)
    assert(m == Map("product_code" -> "CF-001",
      "product_name" -> "Cà phê sữa đá", "category_name" -> "Cà phê"))
  }

  test("unit-price codec tolerates single-quoted pseudo-JSON") {
    assert(UnitPriceCodec.parse(
      """{'product_sizes': 'S|M|L', 'product_prices': '1|2|3'}""")
      .contains(UnitPrice("S|M|L", "1|2|3")))
    assert(UnitPriceCodec.parse("""{"product_sizes":"Standard","product_prices":30000}""")
      .contains(UnitPrice("Standard", "30000")))
    assert(UnitPriceCodec.parse("not json").isEmpty)
  }
}
