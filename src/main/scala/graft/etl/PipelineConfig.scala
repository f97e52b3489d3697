package graft.etl

import scala.jdk.CollectionConverters._
import scala.util.Try

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

/** YAML pipeline config (ref `utils/etl_config.yml`, loaded by
  * `pipeline.py:25-37`) — closes SURVEY.md §2.1 S5.
  *
  * Semantics mirror `TransformPipeline._load_config`:
  *  - a missing/unreadable file falls back to the reference's hardcoded
  *    defaults (`pipeline.py:31-37`);
  *  - a present file uses `dict.get` defaults per key — notably
  *    `transforms` defaults to the EMPTY list when the key is absent
  *    (`pipeline.py:24`), not to the standard chain;
  *  - transform order is the config's list order.
  *
  * Parsed with jackson-dataformat-yaml (ships with Spark — no new
  * dependency).
  */
final case class PipelineConfig(
    inputDirectory: String,
    outputDirectory: String,
    finalOutputDirectory: String,
    filePattern: String,
    transforms: Seq[String])

object PipelineConfig {

  /** `pipeline.py:31-37` fallback when the config file is missing. */
  val defaults: PipelineConfig = PipelineConfig(
    inputDirectory = "data/raw",
    outputDirectory = "data/processed",
    finalOutputDirectory = "data/processed",
    filePattern = "*.csv",
    transforms =
      Seq("standardize_categories", "remove_duplicates", "generate_mock_data"))

  private val mapper = new ObjectMapper(new YAMLFactory)

  /** Parse YAML text; per-key `dict.get` defaults like `pipeline.py:
    * 20-24` (transforms absent → empty chain, NOT the standard one). */
  def parse(yaml: String): PipelineConfig = {
    val node = Option(mapper.readTree(yaml))
      .getOrElse(mapper.createObjectNode())
    def str(key: String, dflt: String) =
      Option(node.get(key)).filter(_.isTextual).fold(dflt)(_.asText)
    val transforms = Option(node.get("transforms")).filter(_.isArray)
      .fold(Seq.empty[String])(_.elements().asScala.map(_.asText).toSeq)
    PipelineConfig(
      inputDirectory = str("input_directory", "data/raw"),
      outputDirectory = str("output_directory", "data/staging"),
      finalOutputDirectory = str("final_output_directory", "data/processed"),
      filePattern = str("file_pattern", "*.csv"),
      transforms = transforms)
  }

  /** Load from a path; missing/unreadable → [[defaults]], mirroring the
    * reference's FileNotFoundError branch. */
  def load(path: String): PipelineConfig =
    Try(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))
      .fold(_ => defaults, parse)
}
