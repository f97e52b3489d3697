package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class EventStreamsSpec extends SparkSpec {

  /** Stage the sf0.001 events table as a file-source dir (2 chunks to
    * exercise multi-file discovery). */
  private lazy val srcDir: String = {
    val dir = Files.createTempDirectory("graft_stream_src").toString
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    // chunks split on event time, as a real ingest would arrive — the
    // watermark then advances monotonically across micro-batches
    val mid = ev.agg(expr("percentile_approx(unix_micros(ts), 0.5)"))
      .head().getLong(0)
    ev.filter(unix_micros(col("ts")) < mid).write.mode("append").parquet(dir)
    ev.filter(unix_micros(col("ts")) >= mid).write.mode("append").parquet(dir)
    dir
  }

  private def runToMemory(df: org.apache.spark.sql.DataFrame,
      name: String, mode: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("windowed agg over a file stream matches the batch plan") {
    val stream = EventStreams.fromFiles(spark, srcDir)
    runToMemory(EventStreams.windowedAgg(stream), "win_agg", "append")
    val streamed = spark.table("win_agg")
      .agg(sum("cnt")).collect()(0).getLong(0)
    val batch = spark.read.parquet(srcDir).count()
    // watermark may hold back the final (incomplete) window in append
    // mode; everything emitted must agree with batch totals per window
    val batchWin = spark.read.parquet(srcDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("cnt"))
    val joined = spark.table("win_agg")
      .join(batchWin, Seq("win_start", "event_type"), "left")
      .filter(spark.table("win_agg")("cnt") =!= batchWin("cnt"))
    assert(joined.count() == 0, "streamed window disagrees with batch")
    assert(streamed > 0 && streamed <= batch)
  }

  test("SLIDING windowed agg over a file stream matches the batch twin " +
      "per emitted window (e15 semantics: 2h windows sliding by 1h)") {
    val stream = EventStreams.fromFiles(spark, srcDir)
    runToMemory(EventStreams.windowedAgg(stream, "2 hours",
      slide = Some("1 hour")), "win_slide", "append")
    val batchWin = spark.read.parquet(srcDir)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("cnt"))
    val emitted = spark.table("win_slide")
    assert(emitted.count() > 0, "no sliding windows emitted")
    val disagree = emitted
      .join(batchWin, Seq("win_start", "event_type"), "left")
      .filter(emitted("cnt") =!= batchWin("cnt"))
    assert(disagree.count() == 0,
      "streamed sliding window disagrees with batch")
  }

  test("streaming windowed HLL matches the batch estimate bit-for-bit") {
    import graft.functions.{HyperLogLog, TextOps}
    val stream = EventStreams.fromFiles(spark, srcDir)
    runToMemory(EventStreams.windowedDistinctUsers(stream, "1 day"),
      "hll_win", "append")
    val streamed = spark.table("hll_win").collect()
      .map(r => r.getTimestamp(0) -> r.getDouble(1)).toMap
    assert(streamed.nonEmpty)
    val batch = spark.read.parquet(srcDir)
      .groupBy(window(col("ts"), "1 day"))
      .agg(HyperLogLog.hll(TextOps.md5Long32(col("user_id")))
        .as("est_users"))
      .select(col("window.start").as("win_start"), col("est_users"))
      .collect().map(r => r.getTimestamp(0) -> r.getDouble(1)).toMap
    // append mode may hold back the last in-flight window; every window
    // the stream DID emit must carry the exact batch estimate — the
    // register merge is what makes micro-batch == partition semantics
    streamed.foreach { case (w, est) =>
      assert(batch.contains(w) && batch(w) == est, s"window $w")
    }
  }

  test("streaming windowed heavy hitters keep the MG guarantees") {
    import spark.implicits._
    val stream = EventStreams.fromFiles(spark, srcDir)
    val k = 16
    runToMemory(EventStreams.windowedHeavyHitters(stream, k, "1 day"),
      "hh_win", "append")
    val streamed = spark.table("hh_win")
      .selectExpr("win_start", "inline(hh)")
      .as[(java.sql.Timestamp, Long, Long, Long)].collect()
      .groupBy(_._1)
    assert(streamed.nonEmpty)
    // per emitted window: est <= true <= est + err against the exact
    // batch counts, and the error stays inside n/(k+1) — micro-batch
    // merge boundaries must not weaken the batch-side bounds
    val truth = spark.read.parquet(srcDir)
      .groupBy(window(col("ts"), "1 day").getField("start").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n"))
      .as[(java.sql.Timestamp, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    streamed.foreach { case (w, hits) =>
      val exact = truth(w)
      val n = exact.values.sum
      hits.foreach { case (_, item, est, err) =>
        val t = exact(item)
        assert(est <= t && t <= est + err, s"window $w item $item")
        assert(err <= n / (k + 1), s"window $w err $err over budget")
      }
      val kept = hits.map(_._2).toSet
      exact.filter(_._2 > n / (k + 1)).keys.foreach(i =>
        assert(kept(i), s"window $w lost heavy user $i"))
    }
  }

  test("streaming dedup drops within-watermark duplicate keys") {
    // duplicate every event by unioning the source with itself
    val dir = Files.createTempDirectory("graft_stream_dup").toString
    val ev = spark.read.parquet(srcDir)
    ev.write.mode("append").parquet(dir)
    ev.write.mode("append").parquet(dir)
    val stream = EventStreams.fromFiles(spark, dir)
    runToMemory(EventStreams.dedupStream(stream), "dedup_out", "append")
    val n = spark.table("dedup_out").count()
    assert(n == ev.count(), s"expected ${ev.count()} distinct, got $n")
  }

  test("stateful sessionization emits gap-closed sessions that match batch") {
    val stream = EventStreams.fromFiles(spark, srcDir)
    runToMemory(EventStreams.sessionize(stream).toDF(), "sessions", "append")
    val streamed = spark.table("sessions")
    // batch twin (e02 logic): closed sessions only (max ts per user is
    // the open session, never emitted without timeout)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val batch = spark.read.parquet(srcDir)
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) >
            30L * 60 * 1000000, 1).otherwise(0))
      .withColumn("session_seq",
        sum("new_sess").over(w))
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"), max("ts").as("sess_end"))
    val lastPerUser = batch.groupBy("user_id")
      .agg(max("session_seq").as("session_seq"))
    val closedBatch = batch.join(lastPerUser,
      Seq("user_id", "session_seq"), "left_anti")
    // every streamed session must exactly match the batch session with
    // the same (user, seq): gap-closed sessions always stream; sessions
    // closed by event-time timeout may stream too — both must agree
    val mismatches = streamed
      .join(batch, Seq("user_id", "session_seq"), "left")
      .filter(batch("n_events").isNull ||
        streamed("n_events") =!= batch("n_events"))
    assert(mismatches.count() == 0)
    assert(streamed.count() >= closedBatch.count())
  }

  test("stream-stream interval join matches the batch twin") {
    val clicks = EventStreams.fromFiles(spark, srcDir)
      .filter(col("event_type") === "view")
    val buys = EventStreams.fromFiles(spark, srcDir)
      .filter(col("event_type") === "purchase")
    runToMemory(EventStreams.intervalJoin(clicks, buys, 60),
      "attrib", "append")
    val streamed = spark.table("attrib")
    val ev = spark.read.parquet(srcDir)
    val batch = EventStreams.intervalJoin(
      ev.filter(col("event_type") === "view"),
      ev.filter(col("event_type") === "purchase"), 60)
    // streamed output may lag the watermark on the tail; every emitted
    // pair must exist in the batch join, and coverage must be material
    val extra = streamed.join(batch,
      Seq("user_id", "conv_id", "cand_id"), "left_anti").count()
    assert(extra == 0, "streamed join emitted pairs the batch twin lacks")
    val total = batch.count()
    assert(total > 0, "fixture yields no view->purchase attribution pairs")
    assert(streamed.count() * 10 >= total * 9,
      s"streamed join emitted ${streamed.count()} of $total batch pairs")
  }

  test("streaming as-of enrich matches the batch asofJoin twin") {
    val purchases = EventStreams.fromFiles(spark, srcDir)
      .filter(col("event_type") === "purchase")
    val signups = EventStreams.fromFiles(spark, srcDir)
      .filter(col("event_type") === "signup")
    runToMemory(EventStreams.asofEnrich(purchases, signups).toDF(),
      "asof", "append")
    val streamed = spark.table("asof")
    val ev = spark.read.parquet(srcDir)
    // batch twin: right deduped per (user, ts) to the max event_id —
    // the same tiebreak the stream applies at equal timestamps
    val batch = graft.ops.Ops.asofJoin(
      ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id"),
      ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("m_ts"), col("event_id"))
        .groupBy(col("user_id"), col("m_ts"))
        .agg(max(col("event_id")).as("m_event_id")),
      "user_id", "user_id", "ts", "m_ts", Seq("m_event_id", "m_ts"))
    // soundness: every streamed row must agree with the batch row for
    // the same left event, null matches included
    val mismatches = streamed.alias("s")
      .join(batch.alias("b"), Seq("user_id", "event_id"), "left")
      .filter(!(col("s.m_event_id") <=> col("b.m_event_id")) ||
        !(col("s.m_ts") <=> col("b.m_ts")))
    assert(mismatches.count() == 0,
      "streamed as-of disagrees with batch asofJoin")
    // coverage: the watermark holds back only the final horizon; all
    // lefts older than (max event time - 3h) must have emitted
    val horizon = ev.agg(max(unix_micros(col("ts")))).head().getLong(0) -
      3L * 3600 * 1000000
    val due = batch.filter(unix_micros(col("ts")) <= horizon).count()
    assert(due > 0, "fixture leaves no finalizable as-of rows")
    assert(streamed.count() >= due,
      s"streamed ${streamed.count()} rows, expected at least $due")
  }

  test("as-of enrich stays sound under hostile (non-chronological) batching") {
    // second file holds the EARLIER half of every user's events: the
    // watermark from batch 1 drops most of batch 2 as late — coverage
    // legitimately degrades, but every row that IS emitted must still
    // equal the batch answer (the soundness contract)
    val dir = Files.createTempDirectory("graft_asof_hostile").toString
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    ev.filter(col("event_id") % 2 === 0).write.mode("append").parquet(dir)
    ev.filter(col("event_id") % 2 === 1).write.mode("append").parquet(dir)
    val purchases = EventStreams.fromFiles(spark, dir)
      .filter(col("event_type") === "purchase")
    val signups = EventStreams.fromFiles(spark, dir)
      .filter(col("event_type") === "signup")
    runToMemory(EventStreams.asofEnrich(purchases, signups,
      watermark = "30 minutes").toDF(), "asof_hostile", "append")
    val streamed = spark.table("asof_hostile")
    val all = spark.read.parquet(dir)
    val batch = graft.ops.Ops.asofJoin(
      all.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id"),
      all.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("m_ts"), col("event_id"))
        .groupBy(col("user_id"), col("m_ts"))
        .agg(max(col("event_id")).as("m_event_id")),
      "user_id", "user_id", "ts", "m_ts", Seq("m_event_id", "m_ts"))
    // a streamed match may be missing or STALER than batch (a late
    // right row never reached the state), but it must never be a row
    // the batch twin lacks, and never NEWER than the batch match
    val bad = streamed.alias("s")
      .join(batch.alias("b"), Seq("user_id", "event_id"), "left")
      .filter(col("b.ts").isNull ||
        (col("s.m_ts").isNotNull &&
          (col("b.m_ts").isNull || col("s.m_ts") > col("b.m_ts"))))
    assert(bad.count() == 0,
      "hostile batching produced matches the batch twin disproves")
    assert(streamed.count() > 0, "nothing emitted under hostile batching")
  }

  test("streaming near-dup detection matches the batch SimHash pairs") {
    import spark.implicits._
    val docDir = Files.createTempDirectory("graft_stream_docs").toString
    // deterministic event times derived from doc_id, split in two
    // chunks so pairs must form ACROSS micro-batches through state
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      // +1: epoch-0 would sit exactly AT the initial watermark and be
      // dropped as late before reaching the stateful operator
      .withColumn("ts", expr("timestamp_micros((doc_id + 1) * 60000000)"))
      .select("doc_id", "ts", "text")
    docs.filter(col("doc_id") % 2 === 0).write.mode("append").parquet(docDir)
    docs.filter(col("doc_id") % 2 === 1).write.mode("append").parquet(docDir)
    val stream = spark.readStream
      .schema(docs.schema).parquet(docDir)
    // horizon covers the fixture's whole 8.3 h time span, so no block
    // state expires and the stream must find EVERY batch pair; shorter
    // horizons legitimately drop cross-horizon pairs (bounded state)
    runToMemory(EventStreams.nearDupStream(stream,
        watermark = "24 hours", horizonMs = 86400000L).toDF(),
      "neardup", "append")
    val rows = spark.table("neardup")
      .select("a_id", "b_id", "hamming")
      .as[(Long, Long, Long)].collect().toSeq
    // duplicate-free by construction: the lo block skips hi-equal
    // pairs, which the hi block already emits
    assert(rows.size == rows.toSet.size,
      s"stream emitted duplicate pairs: ${rows.size} rows, " +
        s"${rows.toSet.size} distinct")
    val streamed = rows.toSet
    val batch = graft.SparkEntry.queries("d06_simhash_pairs")(
      spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty, "fixture should contain near-dup pairs")
    assert(streamed == batch,
      s"streamed=${streamed.size} batch=${batch.size}: " +
        s"missing=${(batch -- streamed).take(3)} " +
        s"extra=${(streamed -- batch).take(3)}")
  }

  test("foreachBatch transform sink appends transformed micro-batches") {
    val out = Files.createTempDirectory("graft_stream_out").toString + "/o"
    val cp = Files.createTempDirectory("graft_stream_cp").toString
    val stream = EventStreams.fromFiles(spark, srcDir)
    val q = EventStreams.transformSink(stream,
      b => b.filter(col("event_type") === "purchase")
        .withColumn("v2", col("value") * 2),
      out, cp)
    q.awaitTermination()
    val got = spark.read.parquet(out)
    val want = spark.read.parquet(srcDir)
      .filter(col("event_type") === "purchase").count()
    assert(got.count() == want)
    assert(got.columns.contains("v2"))
  }
}
