package graft.queries

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Behavioral checks for the sketch family beyond the DuckDB hash gate:
  * accuracy, the CMS never-undercount invariant, and the s02/s03
  * relational-vs-UDAF estimate identity. Runs on the sf0.001 fixture. */
class SketchSuiteSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SketchSuite.suite.find(_.name == name).get.run(spark, dir)

  test("s01 KMV estimates track exact distinct counts") {
    val rows = run("s01_kmv_distinct").collect()
    // groups with >= k distinct hashes only; estimates in a sane band
    rows.foreach { case Row(lang: String, exact: Long, est: Double) =>
      assert(est > 0.2 * exact && est < 5.0 * exact,
        s"$lang exact=$exact est=$est")
    }
  }

  test("s02 relational HLL and s03 UDAF HLL agree bit-for-bit") {
    val rel = run("s02_hll_distinct").collect()
      .map { case Row(lang: String, _, est: Double) => lang -> est }.toMap
    val ud = run("s03_hll_udaf").collect()
      .map { case Row(lang: String, est: Double) => lang -> est }.toMap
    assert(rel.keySet == ud.keySet)
    rel.foreach { case (lang, est) =>
      assert(est == ud(lang), s"$lang rel=$est udaf=${ud(lang)}")
    }
  }

  test("s04 CMS never undercounts and is exact without collisions") {
    val rows = run("s04_cms_freq").collect()
    assert(rows.nonEmpty)
    rows.foreach { case Row(u: Long, exact: Long, est: Long) =>
      assert(est >= exact, s"user $u undercounted: exact=$exact est=$est")
    }
  }

  test("s05 sampled median sits inside the full value range") {
    val full = graft.Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.min("value").as("lo"),
        org.apache.spark.sql.functions.max("value").as("hi"))
      .collect()
      .map { case Row(t: String, lo: Double, hi: Double) => t -> (lo, hi) }
      .toMap
    val rows = run("s05_sampled_quantile").collect()
    assert(rows.nonEmpty)
    rows.foreach { case Row(t: String, n: Long, med: Double) =>
      assert(n > 0)
      val (lo, hi) = full(t)
      assert(med >= lo && med <= hi, s"$t median=$med outside [$lo,$hi]")
    }
  }
}
