package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Denormalized staging rows → 3-table star schema (ref
  * `scripts/transform/seperate_tables.py`): `categories` dim,
  * `products` fact with FK category_id, `product_images` child with FK
  * product_id. One source read fans out into three derived DataFrames
  * (SURVEY.md §2.5 A6); FK resolution is broadcast-join, not dict
  * lookup; dense ids come from a window for dims and `zipWithIndex`
  * for fact-scale tables (a global row_number window would serialize
  * the fact through one partition — SURVEY.md §7.5).
  *
  * Timestamps are injected (`now`) instead of per-row wall clock
  * (`seperate_tables.py:31-32`) for reproducibility.
  */
object Normalize {

  final case class Outputs(
      categories: DataFrame, products: DataFrame, images: DataFrame)

  /** Dense 1-based ids at fact scale without a single-partition window:
    * per-partition counts → cumulative offsets → partition-local index.
    * Ordering is whatever the incoming partitioning gives — callers that
    * need a *stable* order must sort first (dims use the window path). */
  def zipWithIndexId(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(StructField(idCol, LongType, nullable = false)
      +: df.schema.fields)
    val rdd = df.rdd.zipWithIndex.map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq((i + 1L) +: row.toSeq)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** The categories dim (ref `seperate_tables.py:24-33,111-127`):
    * one row per distinct category_name, deterministic keep-first,
    * ids ordered by name (the reference uses first-encounter order —
    * file-order-dependent; we normalize to name order and document). */
  def categories(staged: DataFrame, now: Column): DataFrame =
    staged.select(col("category_name")).distinct()
      .withColumn("category_id",
        row_number().over(Window.orderBy("category_name")))
      .select(
        col("category_id"),
        col("category_name"),
        lit("").as("category_background_url"),
        Categorizer.categoryType(col("category_name")).as("category_type"),
        lit("").as("category_description"),
        now.as("created_at"),
        now.as("updated_at"))

  /** The products fact (ref `seperate_tables.py:60-79,128-163`):
    * broadcast dim join resolves category_id; product_id is dense over
    * a stable product_code sort via zipWithIndex (no global window). */
  def products(staged: DataFrame, cats: DataFrame, now: Column): DataFrame = {
    val joined = staged.join(
      broadcast(cats.select("category_id", "category_name")),
      Seq("category_name"))
    zipWithIndexId(joined.sort("product_code"), "product_id")
      .select(
        col("product_id"), col("category_id"), col("product_code"),
        col("product_name"), col("product_description"),
        col("product_brand"),
        col("product_discount_percentage").cast("double"),
        col("product_unit_price"),
        col("product_total_orders").cast("int"),
        col("product_total_ratings").cast("int"),
        col("product_overall_stars").cast("double"),
        col("product_stock_quantity").cast("int"),
        now.as("created_at"), now.as("updated_at"))
  }

  /** The product_images child — reference-exact semantics
    * (ref `seperate_tables.py:81-106,164-179`, verified golden against
    * `data/processed/product_images.csv`):
    *  - when BOTH url and name contain '|': zip the two lists
    *    *truncated to the shorter* (python zip), trimming urls, blank
    *    names defaulting to the product name;
    *  - otherwise: exactly one row with the raw url (even when empty)
    *    and name-or-product-name;
    *  - FK resolution keeps the LAST product_id per product_code
    *    (the reference's dict overwrite, `:143`). */
  def images(staged: DataFrame, prods: DataFrame, now: Column): DataFrame = {
    val u = col("product_image_url")
    val n = coalesce(col("product_image_name"), lit(""))
    val uparts = split(u, "\\|")
    val nparts = split(n, "\\|")
    val k = least(size(uparts), size(nparts))
    val both = u.contains("|") && n.contains("|")
    val entries = when(both,
      transform(sequence(lit(1), k), i => struct(
        trim(element_at(uparts, i)).as("url"),
        trim(element_at(nparts, i)).as("name"))))
      .otherwise(array(struct(u.as("url"), n.as("name"))))
    val exploded = staged
      .select(col("product_code"), col("product_name"),
        explode(entries).as("img"))
      .select(
        col("product_code"),
        col("img.url").as("product_image_url"),
        when(col("img.name") === "" || col("img.name").isNull,
          col("product_name")).otherwise(col("img.name"))
          .as("product_image_name"))
    val fk = prods.groupBy("product_code")
      .agg(max("product_id").as("product_id")) // last-wins per code
    val withFk = exploded.join(broadcast(fk), Seq("product_code"))
    zipWithIndexId(withFk.sort("product_code", "product_image_url"),
      "product_image_url_id")
      .select(
        col("product_image_url_id"), col("product_id"),
        col("product_image_url"), col("product_image_name"),
        lit(1).cast("short").as("product_image_type"),
        now.as("created_at"), now.as("updated_at"))
  }

  /** Full separate-tables stage: one cached source read, three sinks
    * (ref `seperate_tables.py:191-196`). */
  def apply(staged: DataFrame, now: Column): Outputs = {
    val src = staged.cache()
    val cats = categories(src, now)
    val prods = products(src, cats, now)
    val imgs = images(src, prods, now)
    Outputs(cats, prods, imgs)
  }
}
