package graft.etl

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Category standardization compiled to a pure Catalyst expression tree
  * (ref `scripts/transform/standardize_categories.py:9-72`).
  *
  * The reference evaluates, per row: (0) a special case for composite
  * birthday-cake categories; (1) exact membership of the lowercased raw
  * category in a mapping list, first mapping entry wins; (2) if no exact
  * hit (or the raw category is the catch-all 'khác'), a case-insensitive
  * escaped-alternation regex search of the *product name*, first entry
  * wins; (3) 'Others'.
  *
  * Here the whole decision procedure is ONE `when`-chain + `rlike`
  * expression — no UDF, fully codegen'd, and the mapping regexes are
  * compile-time constants (the reference recompiled them per call,
  * SURVEY.md §4).
  *
  * Note: the reference source fuses two list entries via Python implicit
  * string concatenation (`'bánh flan gato' 'gato cắt miếng/cupcake'` →
  * one garbage entry, `standardize_categories.py:11-12`). We implement
  * the evident intent (two separate entries) and document the deviation
  * (SURVEY.md §7.5).
  */
object Categorizer {

  /** Insertion-ordered standard-category → raw-variant mapping. */
  val mapping: Seq[(String, Seq[String])] = Seq(
    "Cakes" -> Seq("cakes", "dry cakes", "cake slices", "bánh kem bơ",
      "bánh flan gato", "gato cắt miếng/cupcake", "bánh ngọt",
      "gato box - cake box", "bánh bông lan", "bông lan"),
    "Breads & Buns" -> Seq("sandwiches", "buns|savory", "buns|sweet",
      "sweet|buns", "bánh mì", "daily storing", "bánh tươi", "breads",
      "bánh nướng - bánh mì"),
    "Pastries & Pies" -> Seq("pastries-and-pies", "donuts", "bánh nướng",
      "toasts", "chocolate"),
    "Season & Specialist" -> Seq("xoài sấy", "tết", "bánh sinh nhật",
      "trung thu", "bánh tiệc - bánh sinh nhật"),
    "Cookies & Biscuits" -> Seq("cookies", "cookie special", "bánh healthy"),
    "Chilled & Cold" -> Seq("pudding", "bánh lạnh", "sữa chua",
      "bánh entremet", "bánh kem bắp", "bánh mousse"),
    "Sets" -> Seq("set bánh tổng hợp", "sets", "set bánh", "sweetbox",
      "sweetin - bánh hộp thiếc cao cấp"),
    "Coffee" -> Seq("cold-brew", "ca-phe-highlight-2", "a-me",
      "ca-phe-viet-nam", "ca-phe-may"),
    "Tea" -> Seq("tra-xanh-tay-bac", "tra-trai-cay", "tra-sua", "hi-tea-tra"),
    "Chocolate & Cacao" -> Seq("chocolate-1"),
    "Frosty" -> Seq("trai-cay-xay-0-c", "da-xay-frosty-1"),
    "Bingsu" -> Seq("bingsu"),
    "Topping thêm" -> Seq("topping thêm"))

  /** Drink-type categories (ref `seperate_tables.py:25`). */
  val drinkCategories: Seq[String] =
    Seq("Coffee", "Tea", "Chocolate & Cacao", "Frosty")

  /** `(?i)`-ready escaped alternation per standard category
    * (ref `standardize_categories.py:41-44`). */
  private val patterns: Seq[(String, String)] = mapping.map {
    case (cat, vars) =>
      cat -> ("(?i)(" + vars.map(Pattern.quote).mkString("|") + ")")
  }

  /** The standardized category for (original_category, product_name). */
  def standardize(rawCat: Column, productName: Column): Column = {
    val cur = lower(trim(rawCat))
    val name = lower(trim(productName))

    val exact = mapping.foldLeft(when(lit(false), "")) {
      case (acc, (cat, vars)) => acc.when(cur.isin(vars: _*), cat)
    }
    val byName = patterns.foldLeft(when(lit(false), "")) {
      case (acc, (cat, pat)) => acc.when(name.rlike(pat), cat)
    }
    when(cur.contains("|") && cur.contains("bánh tiệc - bánh sinh nhật"),
      "Season & Specialist")
      .when(cur =!= "khác" && exact.isNotNull, exact)
      .otherwise(coalesce(byName, lit("Others")))
  }

  /** category_type flag: 1 = drink, 0 = food (ref `seperate_tables.py:25`). */
  def categoryType(categoryName: Column): Column =
    when(categoryName.isin(drinkCategories: _*), 1).otherwise(0)
}
