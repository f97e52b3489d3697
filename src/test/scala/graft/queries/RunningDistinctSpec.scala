package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Semantics of e16_running_distinct pinned against a local
  * recompute, plus the equivalence that justifies the scalable
  * recast: the first-day running sum equals the naive
  * carried-set running count(distinct) at every active day.
  */
class RunningDistinctSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** user -> sorted (day, types seen that day) from raw events. */
  private lazy val byUser: Map[Long, Seq[(java.sql.Date, Set[String])]] =
    spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("user_id", "CAST(ts AS DATE) AS day", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1), r.getString(2)))
      .groupBy(_._1)
      .map { case (u, rows) =>
        u -> rows.groupBy(_._2).map { case (d, rs) =>
          d -> rs.map(_._3).toSet
        }.toSeq.sortBy(_._1.getTime)
      }

  test("e16 matches the naive carried-set running distinct") {
    val got = SparkEntry.queries("e16_running_distinct")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getDate(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    var checked = 0
    byUser.foreach { case (u, days) =>
      var seen = Set.empty[String]
      days.foreach { case (d, types) =>
        val newTypes = (types diff seen).size.toLong
        seen ++= types
        if (newTypes > 0) {
          val (gn, gc) = got((u, d))
          assert(gn === newTypes, s"new_types for ($u, $d)")
          assert(gc === seen.size.toLong, s"cum_distinct for ($u, $d)")
          checked += 1
        } else {
          // days with no NEW type produce no row — by design: the
          // distinct-to-date curve only changes on first days
          assert(!got.contains((u, d)), s"spurious row for ($u, $d)")
        }
      }
    }
    assert(checked === got.size, "row sets diverge")
  }

  test("the curve is strictly increasing per user") {
    val rows = SparkEntry.queries("e16_running_distinct")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).getTime, r.getLong(3)))
      .groupBy(_._1)
    rows.values.foreach { rs =>
      val sorted = rs.sortBy(_._2).map(_._3)
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a < b, "cum_distinct must strictly increase on first days")
      }
    }
  }
}
