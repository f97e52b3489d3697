package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Failure visibility contract: a query that throws must surface as a
  * RED row in the correctness record, never a missing one. So
  *  - oracle_sql.json is written BEFORE the query loop (a mid-run crash
  *    still yields a diagnosable artifact: every listed query with no
  *    output dir reads as a failure);
  *  - a thrown query gets `<outDir>/<name>/_ERROR` with the message;
  *  - `<outDir>/errors.json` summarizes all failures at the end.
  */
object Verify {
  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // all host cores by default (matches Bench's stance) — results
    // are core-count-independent, only the wall time isn't
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    // optional comma-separated name filter for targeted iteration
    // (same contract as Bench's SPARK_GRAFT_BENCH_ONLY)
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${e.getMessage}"
        System.err.println(s"[verify] $name failed: $msg")
        errors(name) = msg
        val d = new java.io.File(s"$outDir/$name")
        d.mkdirs()
        Files.writeString(Paths.get(s"$outDir/$name/_ERROR"), msg)
      }
      // conf hygiene: builders may pin session flags (x04/x05 and
      // x09/x10 A/Bs, v08) — reset so one query's flag never leaks
      // into the next
      finally graft.queries.BenchSuite.PinnedConfKeys
        .foreach(spark.conf.unset)
    }
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries failed: " +
        errors.keys.mkString(", "))
    // cache hygiene: release the suite memos (see Bench) before stop
    graft.queries.DedupSuite.releaseCaches(spark)
    graft.queries.BenchSuite.releaseCaches(spark)
    graft.queries.VectorSuite.releaseCaches(spark)
    spark.stop()
  }
}
