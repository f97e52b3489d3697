package graft.etl

/** Typed records for the Bytesme catalog pipeline.
  *
  * Mirrors the reference's data model (SURVEY.md §1): `ProductInfo` is
  * the extraction record (`scripts/extract/products_scraping.py:25-44`,
  * list-valued fields as Seq), the staged record is the flat CSV row the
  * transform chain operates on, and Category/Product/ProductImage are
  * the normalized 3-table sink schema
  * (`database/bytesme_psql_schema.sql:7-42`).
  *
  * Deviations from the reference, on purpose (SURVEY.md §7.5):
  *  - the `product_band` typo column is fixed to `product_brand`;
  *  - timestamps are injected (`createdAt` param) instead of
  *    `datetime.now()` per row, so runs are reproducible.
  */
final case class ProductInfo(
    product_name: String,
    product_brand: String,
    category_name: Seq[String],
    product_image: Seq[String],
    product_url: String,
    product_description: String,
    product_unit_price: Long,
    product_discount: Double,
    product_overall_stars: Double,
    product_total_ratings: Int,
    product_total_orders: Int,
    product_stock_quantity: Int)

/** One row of a staged per-category CSV (post-extraction, pre-normalize). */
final case class StagedProduct(
    product_name: String,
    product_brand: String,
    original_category: String,
    product_url: String,
    product_image_url: String,
    product_image_name: String,
    product_description: String,
    product_unit_price: String,
    product_stock_quantity: Int)

/** Parsed product_unit_price JSON payload
  * (ref `generate_mock_data.py:67-79`): pipe-delimited parallel lists. */
final case class UnitPrice(product_sizes: String, product_prices: String)

/** Input to the document templating layer (ref
  * `generate_embeddings.py:39-194`). */
final case class ProductDoc(
    product_code: String,
    product_name: String,
    product_brand: String,
    category_id: Int,
    category_name: String,
    category_description: String,
    product_description: String,
    product_unit_price: String,
    product_discount_percentage: Double,
    product_overall_stars: Double,
    product_total_ratings: Int,
    product_total_orders: Int,
    product_stock_quantity: Int,
    product_currency: String = "")
