package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {

  private lazy val events = graft.Tables(spark,
    "/root/testdata/sf0.001", "events")

  test("day-partitioned write prunes partitions on day filters") {
    val dir = Files.createTempDirectory("graft_layout").toString + "/ev"
    Layout.writeDayPartitioned(events, "ts", dir)
    val back = Layout.readDayPartitioned(spark, dir)
    // partition-column type inference may read p_day back as DATE
    val day = back.select(min("p_day")).head().get(0).toString
    val q = back.filter(col("p_day") === day)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters"), p)
    // the filter must reach the partition level, not just the data scan
    assert("""PartitionFilters: \[[^\]]*p_day""".r.findFirstIn(p).isDefined,
      "day filter did not become a partition filter: " + p)
    // row parity: partition column adds, rows do not change
    assert(back.count() == events.count())
    assert(q.count() ==
      events.filter(date_format(col("ts"), "yyyy-MM-dd") === day).count())
  }

  test("compaction bounds file count and preserves rows") {
    val base = Files.createTempDirectory("graft_compact").toString
    val frag = base + "/frag"
    val compacted = base + "/compact"
    // simulate incremental ingest: 40 tiny appends
    val ev = events.limit(2000).cache()
    (0 until 40).foreach { i =>
      ev.filter(col("event_id") % 40 === i)
        .coalesce(1).write.mode("append").parquet(frag)
    }
    val fragFiles = new java.io.File(frag).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(fragFiles >= 40, s"expected fragmented input, got $fragFiles")
    Layout.compact(spark, frag, compacted, Seq("user_id", "ts"))
    val outFiles = new java.io.File(compacted).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(outFiles < fragFiles / 4,
      s"compaction left $outFiles files (from $fragFiles)")
    val a = spark.read.parquet(frag)
    val b = spark.read.parquet(compacted)
    assert(a.count() == b.count())
    assert(a.join(b, a.columns.toSeq, "left_anti").count() == 0)

    // glob input paths size correctly too (getContentSummary threw on
    // them; sizing now goes through globStatus over data files only)
    val globOut = base + "/compact_glob"
    Layout.compact(spark, frag + "/part-*.parquet", globOut,
      Seq("user_id", "ts"))
    assert(spark.read.parquet(globOut).count() == a.count())

    // a leftover _temporary tree (crashed earlier write) must not
    // inflate the sizing: with a huge junk file hidden inside it, the
    // compaction must still produce the same small file count
    val junkDir = new java.io.File(frag, "_temporary/0")
    junkDir.mkdirs()
    val junk = new java.io.File(junkDir, "junk.bin")
    val out = new java.io.FileOutputStream(junk)
    out.write(new Array[Byte](8 << 20)); out.close()
    val hiddenOut = base + "/compact_hidden"
    Layout.compact(spark, frag, hiddenOut, Seq("user_id", "ts"),
      targetFileBytes = 1 << 20)
    val hiddenFiles = new java.io.File(hiddenOut).listFiles()
      .count(_.getName.endsWith(".parquet"))
    val cleanFiles = {
      junk.delete()
      val cleanOut = base + "/compact_clean"
      Layout.compact(spark, frag, cleanOut, Seq("user_id", "ts"),
        targetFileBytes = 1 << 20)
      new java.io.File(cleanOut).listFiles()
        .count(_.getName.endsWith(".parquet"))
    }
    assert(hiddenFiles == cleanFiles,
      s"hidden _temporary junk changed sizing: $hiddenFiles vs $cleanFiles")
  }
}
