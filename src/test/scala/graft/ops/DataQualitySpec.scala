package graft.ops

import graft.SparkSpec

class DataQualitySpec extends SparkSpec {
  import spark.implicits._
  import DataQuality._

  private def toy = Seq(
    (1L, Some("A"), 10.0),
    (2L, Some("B"), -1.0), // bad value, out of range
    (2L, Some("A"), 5.0), // duplicate key
    (3L, None, 120.0) // null, out of range
  ).toDF("id", "flag", "score")

  test("rowChecks counts each violation class in one pass") {
    val got = rowChecks(toy, Seq(
        notNull("flag"),
        acceptedValues("flag", Seq("A")),
        inRange("score", 0, 100)))
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(
      ("not_null", "flag", 1L),
      ("accepted_values", "flag", 2L), // "B" and the null both violate
      ("in_range", "score", 2L)))
    // single aggregate: the plan carries exactly one Aggregate pair
    val p = rowChecks(toy, Seq(notNull("flag"), inRange("score", 0, 100)))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Union"), s"row checks fan out into passes:\n$p")
  }

  test("uniqueKey counts extra rows beyond the first per key") {
    val got = uniqueKey(toy, Seq("id"))
      .as[(String, String, Long)].head()
    assert(got == (("unique", "id", 1L)))
    val clean = uniqueKey(toy.filter($"score" > 0), Seq("id", "flag"))
      .as[(String, String, Long)].head()
    assert(clean._3 == 0L)
  }

  test("referential counts orphans") {
    val parent = Seq(1L, 2L).toDF("id")
    val got = referential(toy, "id", parent, "id")
      .as[(String, String, Long)].head()
    assert(got == (("referential", "id", 1L))) // id=3 is an orphan
  }

  test("tableChecksum is order/partitioning-independent and drift-sensitive") {
    val cols = Seq("id", "flag")
    def sum3(df: org.apache.spark.sql.DataFrame) =
      tableChecksum(df, cols).as[(Long, Long, Long)].head()
    val a = sum3(toy)
    assert(a == sum3(toy.repartition(7)), "repartition changed checksum")
    assert(a == sum3(toy.orderBy($"score".desc)), "order changed checksum")
    // a single changed value must move the checksum
    val drifted = toy.withColumn("flag",
      org.apache.spark.sql.functions.when($"id" === 1, "Z")
        .otherwise($"flag"))
    assert(sum3(drifted) != a)
    // duplicating a row an even number of times cancels in XOR but is
    // caught by n_rows and the modular sum — the reason both exist
    val doubled = toy.unionAll(toy)
    val d = sum3(doubled)
    assert(d._2 == 0L, "every row paired: XOR must cancel to zero")
    assert(d._1 == 2 * a._1 && d._3 == 2 * a._3 && d._3 != a._3)
  }
}
