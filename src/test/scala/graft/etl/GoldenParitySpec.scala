package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Ops

/** Golden end-to-end parity (SURVEY.md §5.4): run our Normalize stage
  * over the reference's own staging CSVs and compare against its
  * checked-in processed outputs (`/root/reference/data/processed/`).
  *
  * Fixture caveat (documented deviation): the checked-in processed
  * tables were generated from an *earlier* pipeline run whose staging
  * used Vietnamese category names, while the checked-in staging carries
  * the standardized English names — the two fixture families are
  * mutually inconsistent on names. Category comparison is therefore
  * structural (same partition of product codes into categories, same
  * cardinalities); product/image comparisons are exact on codes, urls
  * and names. Timestamps and id order (file-encounter vs stable sort)
  * are excluded per SURVEY §7.5.
  *
  * Runs only when the read-only reference snapshot is present.
  */
class GoldenParitySpec extends SparkSpec {

  private val refData = new java.io.File("/root/reference/data")
  private def whenRef(f: => Unit): Unit =
    if (refData.isDirectory) f else cancel("reference snapshot not present")

  /** Staging files drift in column order (topping puts category_name
    * 4th) — per-file reads + by-name union (U1), exactly the failure a
    * positional union would hide. */
  private lazy val staging: DataFrame = {
    val files = new java.io.File(refData, "staging")
      .listFiles().filter(_.getName.endsWith("_products.csv"))
    Ops.unionByNameAll(files.toSeq.map { f =>
      spark.read
        .option("header", true).option("multiLine", true)
        .option("escape", "\"")
        .csv(f.getAbsolutePath)
    })
  }

  private def processed(name: String): DataFrame =
    spark.read.option("header", true).option("multiLine", true)
      .option("escape", "\"")
      .csv(s"/root/reference/data/processed/$name.csv")

  private lazy val out: Normalize.Outputs =
    Normalize(staging, lit("2024-01-01 00:00:00").cast("timestamp"))

  /** category partition: category → sorted codes, names erased. */
  private def partition(codeCat: Seq[(String, String)]): Set[Seq[String]] =
    codeCat.groupBy(_._2).values.map(_.map(_._1).sorted).toSet

  test("categories: 13-entry dim with dense ids") {
    whenRef {
      val cats = out.categories.collect()
      assert(cats.length == 13)
      assert(cats.map(_.getAs[Int]("category_id")).sorted.toSeq ==
        (1 to 13))
      assert(processed("categories").count() == 13)
    }
  }

  test("products: same 520 codes, identical code→category partition") {
    whenRef {
      val ours = out.products
        .select("product_code", "category_id")
        .collect().map(r => (r.getString(0), r.getInt(1).toString)).toSeq
      val golden = processed("products")
        .select("product_code", "category_id")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      assert(ours.length == 520 && golden.length == 520)
      // same code multiset
      assert(ours.map(_._1).sorted.toSeq == golden.map(_._1).sorted.toSeq)
      // same partition of codes into categories (names/ids erased)
      assert(partition(ours) == partition(golden))
    }
  }

  /** Code-parity golden for the categorizer: the fixture
    * `ref_categorizer_golden.csv` is the output of the reference's
    * *actual* `standardize_category` run over its deduped raw rows
    * (the staging fixtures predate the current mapping — they were
    * produced by the deleted NLP experiment, SURVEY §0 — so code
    * output, not stale fixtures, is the golden). Our implementation
    * must agree everywhere except the two documented reference bugs we
    * deliberately fix (SURVEY §7.5):
    *  1. fused-entry: implicit string concat merges two Cakes variants
    *     into one garbage entry — we match them exactly;
    *  2. char-class-regex: bare-string mapping values ('Bingsu',
    *     'Topping thêm') iterate as characters, so the reference's
    *     fallback regex is `B|i|n|g|s|u` (matches almost any name) —
    *     ours matches the whole word. */
  test("categorizer agrees with the reference code modulo documented bugs") {
    whenRef {
      val golden = spark.read.option("header", true)
        .csv(getClass.getResource("/ref_categorizer_golden.csv").getPath)
      val out = golden
        .withColumn("cat", Categorizer.standardize(
          col("original_category"), col("product_name")))
      assert(out.count() == 520)
      val fusedVariants = Seq("bánh flan gato", "gato cắt miếng/cupcake")
      val disagreements = out.filter(col("cat") =!= col("ref_cat"))
      val unexplained = disagreements.filter(
        !lower(trim(col("original_category"))).isin(fusedVariants: _*) &&
          !col("ref_cat").isin("Bingsu", "Topping thêm"))
      assert(unexplained.count() == 0,
        unexplained.collect().take(5).mkString("; "))
      // and the deviation surface stays small + pinned
      assert(disagreements.count() == 35)
      assert(out.filter(col("cat") === col("ref_cat")).count() == 485)
    }
  }

  test("images: exactly the reference's 1572 (code, url, name) rows") {
    whenRef {
      val codeOf = out.products.select("product_id", "product_code")
      val ours = out.images.join(codeOf, "product_id")
        .select("product_code", "product_image_url", "product_image_name")
      val goldenCode = processed("products").select(
        col("product_id"), col("product_code"))
      val golden = processed("product_images").join(goldenCode, "product_id")
        .select("product_code", "product_image_url", "product_image_name")
      assert(ours.count() == 1572)
      assert(golden.count() == 1572)
      assert(ours.exceptAll(golden).count() == 0, "rows we emit ⊄ golden")
      assert(golden.exceptAll(ours).count() == 0, "golden rows ⊄ ours")
    }
  }
}
