package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Seeded synthetic-column generators — SURVEY.md §2.10 (R1-R6), ref
  * `scripts/transform/generate_mock_data.py`.
  *
  * Every sampler is a pure column expression over `rand(seed)`/
  * `randn(seed)`, so results are reproducible per (seed, partitioning)
  * and there is no driver-side RNG state. Distribution fidelity:
  *  - discount: Bernoulli(0.3) gate over UniformInt[5,50) (R1);
  *  - ratings: Exponential(50) via inverse CDF + 1 (R2);
  *  - stars: Beta(4, 1.5)·4 + 1 rounded to 1 decimal (R3) — Beta is
  *    composed from Gamma draws: Gamma(4) = -ln(Π of 4 uniforms)
  *    (integer shape), Gamma(1.5) = Gamma(0.5) + Gamma(1) = Z²/2 +
  *    Exp(1) with Z standard normal; Beta = X/(X+Y). Exact
  *    distributional identity, no rejection loop, no custom expression;
  *  - orders: UniformInt[0,500) (R4);
  *  - price fill and S|M|L ladder (R5/R6) exactly as referenced,
  *    including the documented ×1000 vs ×100 inconsistency FIX: we use
  *    ×1000 for both (SURVEY.md §7.5).
  */
object MockData {

  /** R1 — discount percentage (`generate_mock_data.py:18-26`). */
  def discountPercentage(seed: Long): Column =
    when(rand(seed) < 0.3,
      (floor(rand(seed + 1) * 45) + 5).cast("int")).otherwise(0)

  /** R2 — total ratings ⌊Exp(scale=50)⌋+1 (`generate_mock_data.py:28-31`). */
  def totalRatings(seed: Long): Column =
    (floor(-lit(50.0) * log(lit(1.0) - rand(seed))) + 1).cast("int")

  /** R3 — overall stars round(Beta(4,1.5)·4+1, 1)
    * (`generate_mock_data.py:33-35`). */
  def overallStars(seed: Long): Column = {
    val gamma4 = -log(rand(seed) * rand(seed + 1) * rand(seed + 2) *
      rand(seed + 3))
    val gamma15 = pow(randn(seed + 4), 2) / 2.0 - log(rand(seed + 5))
    val beta = gamma4 / (gamma4 + gamma15)
    round(beta * 4.0 + 1.0, 1)
  }

  /** R4 — total orders UniformInt[0,500) (`generate_mock_data.py:39-40`). */
  def totalOrders(seed: Long): Column =
    floor(rand(seed) * 500).cast("int")

  /** R5 — price fill: 0 → UniformInt[80,220)·1000
    * (`seperate_tables.py:50-57`). */
  def priceFill(price: Column, seed: Long): Column =
    when(price === 0,
      ((floor(rand(seed) * 140) + 80) * 1000).cast("long"))
      .otherwise(price)

  /** Default base price when a ladder product has price 0
    * (`generate_mock_data.py:36,113-116`). */
  val DefaultBasePrice = 50000L

  /** Categories that get the S|M|L price ladder
    * (`generate_mock_data.py:110-111`). */
  val ladderCategories: Seq[String] = Seq(
    "Bingsu", "Frosty", "Tea", "Chocolate & Cacao", "Coffee",
    "Chilled & Cold", "Cakes")

  /** R6 — size/price ladder JSON (`generate_mock_data.py:67-79`):
    * S|M|L, step 12000 for Cakes else 5000, exact integer arithmetic,
    * serialized as the double-encoded JSON-in-string the reference
    * writes. */
  def unitPriceJson(basePrice: Column, categoryName: Column): Column = {
    val base = when(basePrice === 0, DefaultBasePrice).otherwise(basePrice)
    val step = when(categoryName === "Cakes", 12000L).otherwise(5000L)
    val prices = transform(sequence(lit(0), lit(2)),
      i => (base + i.cast("long") * step).cast("string"))
    to_json(struct(
      lit("S|M|L").as("product_sizes"),
      array_join(prices, "|").as("product_prices")))
  }

  /** A1 — per-category sequential product code BR-CA-001
    * (`generate_mock_data.py:11-16,94-103`): window counter per
    * category ordered by a caller-supplied stable key. Partitions on
    * the (bounded-cardinality) category — no global window. */
  def withProductCodes(df: DataFrame, orderKey: String): DataFrame = {
    val w = Window.partitionBy("category_name").orderBy(orderKey)
    df.withColumn("product_code",
      format_string("%s-%s-%03d",
        upper(substring(col("product_brand"), 1, 2)),
        upper(substring(col("category_name"), 1, 2)),
        row_number().over(w)))
  }

  /** The full mock-data stage (ref `update_product_dataset`,
    * `generate_mock_data.py:81-143`), seeds split per column family. */
  def apply(df: DataFrame, seed: Long, orderKey: String): DataFrame =
    withProductCodes(df, orderKey)
      .withColumn("product_total_ratings", totalRatings(seed + 10))
      .withColumn("product_overall_stars", overallStars(seed + 20))
      .withColumn("product_total_orders", totalOrders(seed + 30))
      .withColumn("product_discount_percentage",
        discountPercentage(seed + 40).cast("double"))
      .withColumn("__price",
        coalesce(col("product_unit_price").cast("long"), lit(0L)))
      .withColumn("product_unit_price",
        when(col("category_name").isin(ladderCategories: _*),
          unitPriceJson(col("__price"), col("category_name")))
          .otherwise(to_json(struct(
            lit("Standard").as("product_sizes"),
            priceFill(col("__price"), seed + 50)
              .cast("string").as("product_prices")))))
      .drop("__price")
}
