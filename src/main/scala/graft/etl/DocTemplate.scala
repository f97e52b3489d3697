package graft.etl

/** Vietnamese document templating for the embedding pipeline — SURVEY.md
  * §2.9 F25, ref `scripts/transform/generate_embeddings.py:39-243`.
  *
  * Implemented as a pure Scala function over the typed `ProductDoc`
  * record (SURVEY.md recommends the typed map over a concat_ws tree for
  * readability + unit-testability); applied as
  * `Dataset[ProductDoc].map(render)` which stays fully distributed.
  * Deterministic: no clock, no RNG, no model calls.
  */
object DocTemplate {

  /** Drink vs food split by category id (ref
    * `generate_embeddings.py:43-54`). */
  private val drinkCategoryIds = Set(10, 11, 12, 13)
  private val foodCategoryIds = (1 to 9).toSet

  private val drinkNameTerms =
    Seq("cà phê", "coffee", "trà", "tea", "đá xay", "drink", "nước")
  private val foodNameTerms =
    Seq("bánh", "cake", "pastry", "cookie", "bread")

  /** The product document text (ref `_create_text_for_embedding`). */
  def render(p: ProductDoc): String = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]

    val productType =
      if (drinkCategoryIds(p.category_id)) Some("drink")
      else if (foodCategoryIds(p.category_id)) Some("food")
      else None

    productType.foreach {
      case "drink" => parts += "ĐÂY LÀ THỨC UỐNG. Đây là một loại đồ uống, " +
        "không phải loại bánh ăn được. Sản phẩm này thuộc nhóm đồ uống giải khát."
      case _ => parts += "ĐÂY LÀ MÓN ĂN hoặc BÁNH. Đây là đồ ăn, không phải " +
        "đồ uống. Sản phẩm này thuộc nhóm thực phẩm ăn được."
    }

    val category = Option(p.category_name).getOrElse("").toLowerCase
    if (category.nonEmpty) {
      parts += s"Sản phẩm thuộc danh mục ${p.category_name}."
      if (Option(p.category_description).exists(_.nonEmpty))
        parts += s"Về danh mục này: ${p.category_description}"
    }

    if (productType.contains("drink")) {
      if (category.contains("trà"))
        parts += "Đây là đồ uống trà thơm ngon, thích hợp giải khát."
      if (category.contains("cà phê") || category.contains("coffee"))
        parts += "Đây là đồ uống cà phê đậm đà, giúp tỉnh táo."
      if (category.contains("đá xay") || category.contains("frosty"))
        parts += "Đây là đồ uống đá xay mát lạnh, thích hợp giải nhiệt."
    } else if (productType.contains("food")) {
      if (category.contains("bánh ngọt") || category.contains("bánh kem") ||
        category.contains("cake"))
        parts += "Đây là bánh ngọt mềm mịn, thơm phức."
      if (category.contains("bánh nướng") || category.contains("pastr"))
        parts += "Đây là bánh giòn, nướng vàng thơm phức."
      if (category.contains("cookie"))
        parts += "Đây là bánh quy giòn tan, thơm mùi bơ."
    }

    val nameParts = scala.collection.mutable.ArrayBuffer.empty[String]
    Option(p.product_name).filter(_.nonEmpty).foreach { n =>
      nameParts += s"Sản phẩm có tên gọi $n."
      val nl = n.toLowerCase
      if (productType.contains("drink") || drinkNameTerms.exists(nl.contains))
        nameParts += "Đây là thức uống, không phải bánh ăn được."
      else if (productType.contains("food") ||
        foodNameTerms.exists(nl.contains))
        nameParts += "Đây là bánh ăn được, không phải thức uống."
    }
    Option(p.product_brand).filter(_.nonEmpty).foreach(b =>
      nameParts += s"Thương hiệu của sản phẩm $b.")
    if (nameParts.nonEmpty) parts += nameParts.mkString(" ")

    Option(p.product_description).map(_.trim).filter(_.nonEmpty).foreach {
      d =>
        val desc = if (d.length > 1000) d.take(1000) + "..." else d
        parts += s"Mô tả sản phẩm: $desc"
    }

    val priceParts = scala.collection.mutable.ArrayBuffer.empty[String]
    Option(p.product_unit_price).filter(_.startsWith("{")).foreach { raw =>
      UnitPriceCodec.parse(raw).foreach { up =>
        val sizes = up.product_sizes.split("\\|")
        val prices = up.product_prices.split("\\|")
        val priced = sizes.zip(prices)
          .map { case (s, pr) => s"$s for $pr" }.mkString(", ")
        priceParts +=
          s"Sản phẩm có nhiều size với nhiều mức giá khác nhau: $priced"
      }
    }
    if (p.product_discount_percentage > 0)
      priceParts +=
        s"Sản phẩm đang được giảm giá ${p.product_discount_percentage}%."
    if (priceParts.nonEmpty) parts += priceParts.mkString(" ")

    val pop = scala.collection.mutable.ArrayBuffer.empty[String]
    if (p.product_overall_stars > 4.5)
      pop += s"Sản phẩm này được đánh giá rất cao với ${p.product_overall_stars} sao trên 5."
    else if (p.product_overall_stars > 3.5)
      pop += s"Sản phẩm này được đánh giá tốt với ${p.product_overall_stars} sao."
    else
      pop += s"Sản phẩm này có số điểm đánh giá là ${p.product_overall_stars}."
    pop += s"Sản phẩm có tổng số lượt ${p.product_total_ratings} khách hàng đánh giá."
    if (p.product_total_orders > 1000)
      pop += s"Đây là sản phẩm bán chạy với hơn ${p.product_total_orders} lượt đặt hàng."
    else
      pop += s"Sản phẩm đã bán được ${p.product_total_orders} đơn hàng."
    parts += pop.mkString(" ")

    parts += (p.product_stock_quantity match {
      case s if s > 100 => "Sản phẩm này còn nhiều hàng và sẵn sàng để giao."
      case s if s > 20 => "Sản phẩm này hiện đang có sẵn trong kho."
      case s if s > 0 => "Sản phẩm này chỉ còn lại một số lượng ít."
      case _ => "Sản phẩm này hiện đang hết hàng."
    })

    productType.foreach {
      case "drink" => parts += "Sản phẩm này là THỨC UỐNG. Dùng để giải " +
        "khát, không phải để ăn."
      case _ => parts += "Sản phẩm này là BÁNH hoặc MÓN ĂN. Dùng để ăn, " +
        "không phải để uống."
    }

    parts.mkString(" ")
  }

  /** Metadata map for the embedding row (ref
    * `generate_embeddings.py:196-207`). */
  def metadata(p: ProductDoc): Map[String, String] = Map(
    "product_code" -> Option(p.product_code).getOrElse(""),
    "product_name" -> Option(p.product_name).getOrElse(""),
    "category_name" -> Option(p.category_name).getOrElse(""))
}

/** product_unit_price JSON-in-string codec (ref `seperate_tables.py:
  * 35-44`, `generate_embeddings.py:116-127`): tolerates the reference's
  * single-quoted pseudo-JSON by normalizing quotes first. */
object UnitPriceCodec {
  private val sizeRe = """"product_sizes"\s*:\s*"([^"]*)"""".r
  private val priceRe = """"product_prices"\s*:\s*"?([0-9|]+)"?""".r

  def parse(raw: String): Option[UnitPrice] = {
    val norm = raw.replace("'", "\"")
    for {
      s <- sizeRe.findFirstMatchIn(norm).map(_.group(1))
      p <- priceRe.findFirstMatchIn(norm).map(_.group(1))
    } yield UnitPrice(s, p)
  }
}
