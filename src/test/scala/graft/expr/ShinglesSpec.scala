package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextOps

/** The codegen [[Shingles]] expression vs the original higher-order
  * composition it replaced — element-for-element, on hostile inputs
  * (null arrays, null elements, empty strings, short docs). */
class ShinglesSpec extends SparkSpec {
  import spark.implicits._

  private def both(docs: Seq[Seq[String]], n: Int) = {
    val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws) }
      .toDF("id", "ws")
    def run(c: org.apache.spark.sql.Column) =
      df.select(col("id"), c.as("g")).orderBy("id")
        .as[(Long, Seq[String])].collect().toSeq
    (run(TextOps.shingles(col("ws"), n)),
      run(TextOps.shinglesHof(col("ws"), n)))
  }

  test("matches the HOF form on representative docs, n=2 and n=3") {
    val docs = Seq(
      Seq("a", "b", "c", "d"),
      Seq("one"),
      Seq.empty[String],
      Seq("", "x", ""),
      Seq("multi word", "tok"),
      Seq("a", "a", "a"))
    for (n <- Seq(2, 3)) {
      val (cg, hof) = both(docs, n)
      assert(cg == hof, s"n=$n: $cg vs $hof")
    }
  }

  test("null elements join with array_join's null-skipping; a null " +
      "array yields the empty array in both forms") {
    val df = Seq(1L, 2L, 3L).toDF("id")
      .withColumn("ws",
        when(col("id") === 1, array(lit("a"), lit(null), lit("b")))
          .when(col("id") === 2, lit(null).cast("array<string>"))
          .otherwise(array(lit(null).cast("string"), lit(null))))
    def run(c: org.apache.spark.sql.Column) =
      df.select(col("id"), c.as("g")).orderBy("id")
        .as[(Long, Seq[String])].collect().toSeq
    val cg = run(TextOps.shingles(col("ws"), 2))
    val hof = run(TextOps.shinglesHof(col("ws"), 2))
    assert(cg == hof, s"$cg vs $hof")
    // pin the exact null-skip values, not just agreement
    assert(cg == Seq(1L -> Seq("a", "b"), 2L -> Seq(),
      3L -> Seq("")), cg)
  }

  test("graft_dup_frac agrees with the compositional form over " +
      "graft_shingles (pins the two n-gram key builders together)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val tok = Gen.oneOf(Seq[Option[String]](
      Some("a"), Some("b"), Some(""), Some("c c"), None))
    val docGen = Gen.choose(0, 10).flatMap(k => Gen.listOfN(k, tok))
    val docs = (1 to 50).flatMap(i =>
      docGen.apply(Gen.Parameters.default, Seed(3L + i)).toSeq)
    val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws) }
      .toDF("id", "ws")
    for (n <- Seq(1, 2, 3)) {
      val g = TextOps.shingles(col("ws"), n)
      val compositional = when(size(g) > 0,
        (size(g) - size(array_distinct(g))).cast("double") /
          size(g).cast("double")).otherwise(0.0)
      val out = df.select(
          call_function("graft_dup_frac", col("ws"), lit(n)).as("a"),
          compositional.as("b"))
        .as[(Double, Double)].collect()
      out.foreach { case (a, b) => assert(a == b, s"n=$n: $a vs $b") }
    }
  }

  test("property: agreement on random token arrays") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val tok = Gen.oneOf("a", "b", "", "c c", "dd")
    val docGen = Gen.choose(0, 12).flatMap(k => Gen.listOfN(k, tok))
    val docs = (1 to 60).flatMap(i =>
      docGen.apply(Gen.Parameters.default, Seed(7L + i)).toSeq)
    for (n <- Seq(1, 2, 3, 4)) {
      val (cg, hof) = both(docs, n)
      assert(cg == hof, s"n=$n")
    }
  }
}
