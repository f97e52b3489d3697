package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  /** Write a raw fixture CSV (reference raw shape, incl. a quoted
    * multiline description) and run the full end-to-end slice. */
  test("end-to-end: raw CSVs -> chain -> 3 normalized tables") {
    val dir = Files.createTempDirectory("graft_raw").toFile
    val csv =
      """product_name,product_brand,original_category,product_url,product_image_url,product_image_name,product_description,product_unit_price,product_stock_quantity
        |Bánh kem dâu,brA,cakes,u1,http://a/1.jpg|http://a/2.jpg,front|back,"multi
        |line desc",50000,40
        |Bánh kem dâu,brA,cakes,u1,http://a/1.jpg,front,dup of first,50000,40
        |Trà sữa trân châu,brB,tra-sua,u2,http://b/1.jpg,,mô tả,0,10
        |Thing,brC,khác,u3,http://c/1.jpg,img,desc,12000,5
        |""".stripMargin
    Files.writeString(
      new java.io.File(dir, "cake_products.csv").toPath, csv)

    val now = lit("2024-01-01 00:00:00").cast("timestamp")
    val (out, results) =
      Pipeline.endToEnd(spark, dir.getAbsolutePath + "/*_products.csv",
        seed = 42, now = now)

    assert(results.forall(_.status == "success"), results.mkString("; "))

    val cats = out.categories.collect()
    val prods = out.products.orderBy("product_id").collect()
    val imgs = out.images.collect()

    // dedup dropped the duplicate (name,url) row: 3 products remain
    assert(prods.length == 3)
    // category standardization: cakes→Cakes, tra-sua→Tea, khác→Others
    assert(cats.map(_.getAs[String]("category_name")).sorted.toSeq ==
      Seq("Cakes", "Others", "Tea"))
    // Tea is a drink
    val tea = cats.find(_.getAs[String]("category_name") == "Tea").get
    assert(tea.getAs[Int]("category_type") == 1)
    // product codes were generated per category
    assert(prods.map(_.getAs[String]("product_code")).forall(
      _.matches("[A-Z]{2}-[A-Z]{2}-\\d{3}")))
    // multiline CSV field survived the read
    assert(prods.exists(
      _.getAs[String]("product_description").contains("multi\nline")))
    // images: 2 from the pipe list + 1 + 1
    assert(imgs.length == 4)
    // unit price JSON: Tea gets a ladder, Others keeps Standard
    val teaProd = prods.find(_.getAs[String]("product_code")
      .startsWith("BR-TE")).get
    assert(teaProd.getAs[String]("product_unit_price")
      .contains(""""product_sizes":"S|M|L""""))
    val otherProd = prods.find(r => r.getAs[Int]("category_id") ==
      cats.find(_.getAs[String]("category_name") == "Others").get
        .getAs[Int]("category_id")).get
    assert(otherProd.getAs[String]("product_unit_price")
      .contains(""""product_sizes":"Standard""""))
  }

  /** S5: the transform chain comes from a YAML config fixture, in config
    * order, with unknown names surfaced (ref `utils/etl_config.yml:6-10`
    * + `pipeline.py:25-37,55-85`). */
  test("config-driven chain: YAML order drives transforms, unknowns reported") {
    val dir = Files.createTempDirectory("graft_cfg").toFile
    val yml =
      """input_directory: "data/raw"
        |output_directory: "data/staging"
        |final_output_directory: "data/processed"
        |file_pattern: "*.csv"
        |transforms:
        |  - standardize_categories
        |  - frobnicate
        |  - remove_duplicates
        |  - generate_mock_data
        |  - seperate_tables
        |""".stripMargin
    val cfgPath = new java.io.File(dir, "etl_config.yml").toPath
    Files.writeString(cfgPath, yml)

    val cfg = PipelineConfig.load(cfgPath.toString)
    assert(cfg.filePattern == "*.csv")
    assert(cfg.transforms == Seq("standardize_categories", "frobnicate",
      "remove_duplicates", "generate_mock_data", "seperate_tables"))

    val csv =
      """product_name,product_brand,original_category,product_url,product_image_url,product_image_name,product_description,product_unit_price,product_stock_quantity
        |Bánh kem dâu,brA,cakes,u1,http://a/1.jpg,front,desc,50000,40
        |Bánh kem dâu,brA,cakes,u1,http://a/1.jpg,front,dup,50000,40
        |Trà sữa,brB,tra-sua,u2,http://b/1.jpg,,mô tả,0,10
        |""".stripMargin
    Files.writeString(new java.io.File(dir, "p_products.csv").toPath, csv)

    val now = lit("2024-01-01 00:00:00").cast("timestamp")
    val (staged, outputs, results) = Pipeline.endToEndConfig(
      spark, cfg, dir.getAbsolutePath + "/*_products.csv", seed = 42,
      now = now)

    // unknown transform surfaced, known ones ran in config order
    assert(results.head == Pipeline.StageResult(
      "frobnicate", "skipped", "unknown transform"))
    assert(results.filter(_.status == "success").map(_.name) ==
      Seq("standardize_categories", "remove_duplicates",
        "generate_mock_data"))
    // seperate_tables in the config triggered the normalize fan-out
    assert(outputs.isDefined)
    assert(staged.count() == 2) // dedup ran
    assert(outputs.get.products.count() == 2)

    // transforms key absent -> empty chain (pipeline.py:24 dict.get)
    val bare = PipelineConfig.parse("input_directory: x")
    assert(bare.transforms.isEmpty)
    // missing file -> reference defaults (pipeline.py:31-37)
    val dflt = PipelineConfig.load("/nonexistent/etl_config.yml")
    assert(dflt.transforms == Seq("standardize_categories",
      "remove_duplicates", "generate_mock_data"))
  }

  test("stage isolation: a failing stage is reported and skipped") {
    val df = Seq(("a", "b")).toDF("x", "y")
    val chain = Seq[(String, org.apache.spark.sql.DataFrame =>
      org.apache.spark.sql.DataFrame)](
      "ok" -> (d => d.withColumn("z", lit(1))),
      "boom" -> (_ => throw new RuntimeException("nope")),
      "after" -> (d => d.withColumn("w", lit(2))))
    val (out, results) = Pipeline.run(df, chain)
    assert(results.map(_.status) == Seq("success", "error", "success"))
    assert(out.columns.toSeq == Seq("x", "y", "z", "w"))
  }
}
