package graft.etl

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Config-driven transform-chain runner (ref `scripts/pipeline.py`).
  *
  * The reference iterates raw CSVs and applies a YAML-ordered list of
  * named transforms per file, isolating per-file failures and
  * aggregating a status report (`pipeline.py:44-112`). Here the chain
  * is a `Seq[(name, DataFrame => DataFrame)]` applied lazily — one
  * logical plan per input — and "per-file" isolation happens at plan
  * build/execution granularity. Inputs are read with an explicit schema
  * (no inference — SURVEY.md §1.3) and glob paths with
  * `input_file_name()` provenance replace the reference's per-file
  * loop, so one Spark job covers the whole raw directory.
  */
object Pipeline {

  /** Explicit staging schema (SURVEY.md §1.3 — contracts, not
    * inference). */
  val stagedSchema: StructType = StructType(Seq(
    StructField("product_name", StringType),
    StructField("product_brand", StringType),
    StructField("original_category", StringType),
    StructField("product_url", StringType),
    StructField("product_image_url", StringType),
    StructField("product_image_name", StringType),
    StructField("product_description", StringType),
    StructField("product_unit_price", StringType),
    StructField("product_stock_quantity", IntegerType)))

  /** CSV reader matching the reference's quoted/multiline data
    * (SURVEY.md §2.1 S1): header, embedded newlines, escaped quotes,
    * permissive corrupt-record handling replacing per-file try/except. */
  def readRawCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(stagedSchema)
      .option("header", true)
      .option("multiLine", true)
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .csv(path)
      .withColumn("src_file", input_file_name())
      // multiLine CSVs are non-splittable (one partition per file), so
      // monotonically_increasing_id ascends in file order within each
      // file — this pins pandas keep='first' dedup semantics (D1/W3).
      .withColumn("file_order", monotonically_increasing_id())

  final case class StageResult(name: String, status: String, error: String)

  /** The standard transform chain (ref `utils/etl_config.yml:6-10`
    * order: standardize → dedup → mock → normalize happens after). */
  def standardChain(seed: Long): Seq[(String, DataFrame => DataFrame)] = Seq(
    "standardize_categories" -> { df: DataFrame =>
      df.withColumn("category_name",
          Categorizer.standardize(col("original_category"),
            col("product_name")))
        .drop("original_category")
    },
    "remove_duplicates" -> { df: DataFrame =>
      // pandas keep='first' in file order → explicit stable order on
      // (src_file, file_order) — SURVEY.md §2.3 D1 deterministic form,
      // as the min(struct) aggregate: partial combine map-side, one
      // candidate row per key crosses the shuffle (Ops.dedupKeepFirstAgg)
      graft.ops.Ops.dedupKeepFirstAgg(df,
        Seq("product_name", "product_url"), Seq("src_file", "file_order"))
    },
    "generate_mock_data" -> { df: DataFrame =>
      MockData(df, seed, orderKey = "product_name")
    })

  /** Resolve a config-ordered transform list (SURVEY.md §2.1 S5, ref
    * `pipeline.py:55-85`) against the named standard transforms. The
    * reference's if/elif dispatch silently skips unknown names; here they
    * are surfaced as `skipped` stage results instead — per-name, in
    * config order. `seperate_tables` is recognized but deferred: it is
    * the normalization fan-out (`Normalize`), which runs after the
    * row-level chain (see [[endToEndConfig]]). */
  def chainFromConfig(names: Seq[String], seed: Long)
      : (Seq[(String, DataFrame => DataFrame)], Seq[StageResult]) = {
    val registry = standardChain(seed).toMap
    val resolved = names.flatMap { n =>
      registry.get(n).map(fn => n -> fn)
    }
    val reports = names.collect {
      case n if !registry.contains(n) && n != "seperate_tables" =>
        StageResult(n, "skipped", "unknown transform")
    }
    (resolved, reports)
  }

  /** Config-driven end-to-end: YAML transform order drives the chain;
    * the `seperate_tables` stage (if configured) triggers the normalize
    * fan-out on the staged result. */
  def endToEndConfig(spark: SparkSession, cfg: PipelineConfig,
      rawGlob: String, seed: Long, now: Column)
      : (DataFrame, Option[Normalize.Outputs], Seq[StageResult]) = {
    val raw = readRawCsv(spark, rawGlob)
    val (chain, unknown) = chainFromConfig(cfg.transforms, seed)
    val (staged, results) = run(raw, chain)
    val outputs =
      if (cfg.transforms.contains("seperate_tables"))
        Some(Normalize(staged, now))
      else None
    (staged, outputs, unknown ++ results)
  }

  /** Run the chain with per-stage isolation; failed stages are skipped
    * (their input passes through) and reported, mirroring
    * `pipeline.py:94-110`. */
  def run(df: DataFrame, chain: Seq[(String, DataFrame => DataFrame)])
      : (DataFrame, Seq[StageResult]) =
    chain.foldLeft((df, Seq.empty[StageResult])) {
      case ((cur, results), (name, fn)) =>
        Try(fn(cur)) match {
          case Success(next) =>
            (next, results :+ StageResult(name, "success", ""))
          case Failure(e) =>
            (cur, results :+ StageResult(name, "error",
              Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
    }

  /** Full raw-to-normalized pipeline: read → chain → separate tables
    * (the §7.2 minimum end-to-end slice). */
  def endToEnd(spark: SparkSession, rawGlob: String, seed: Long,
      now: Column): (Normalize.Outputs, Seq[StageResult]) = {
    val raw = readRawCsv(spark, rawGlob)
    val (staged, results) = run(raw, standardChain(seed))
    (Normalize(staged, now), results)
  }
}
