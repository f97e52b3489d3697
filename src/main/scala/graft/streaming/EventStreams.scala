package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.12): the reference's
  * incremental idioms (append-mode CSV accumulation, per-file isolation)
  * re-expressed as streaming plans, plus the event-time operators a
  * production pipeline needs — watermarked tumbling windows, streaming
  * dedup, stateful sessionization, and a foreachBatch sink that runs
  * the batch transform chain incrementally.
  *
  * Everything here shares plan shapes with the batch EventsSuite
  * (e01/e02): same aggregation, same session semantics — batch is the
  * oracle-checkable twin of each streaming op.
  *
  * Deployment note — state partitioning: a stateful query freezes
  * `spark.sql.shuffle.partitions` into its checkpoint at the first
  * batch, and every partition carries its own state-store instances
  * (a stream-stream join runs FOUR per partition), each paying a
  * fixed commit (delta file + fsync) per micro-batch however little
  * state it holds. Size that conf to expected state volume within the
  * watermark horizon (target tens-of-MB per partition), not to core
  * count — the batch default (= cores) over-partitions small/medium
  * state 3-5× in measured wall time (PERFORMANCE.md "x21 profile").
  */
object EventStreams {

  /** events table schema (TESTDATA.md), explicit for the file source. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of event files — the streaming
    * twin of the reference's append-mode CSV accumulation
    * (`tests/test_products_scraping.py:44-49`). */
  def fromFiles(spark: SparkSession, path: String,
      format: String = "parquet"): DataFrame =
    spark.readStream.schema(eventSchema).format(format).load(path)

  /** File-source stream over a driver-generated `sfDir`'s events
    * parquet, with the same timestamp normalization [[graft.Tables]]
    * applies on the batch path (the fixture's ts encoding has drifted
    * across driver regenerations — read with the file's OWN schema,
    * then cast to TimestampType, an identity on the micros under the
    * pinned UTC session timezone). */
  def eventsFileStream(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/events.parquet").schema
    // the file SOURCE requires a directory path — point it at the sf
    // dir and glob-filter down to the events file
    val stream = spark.readStream.schema(raw)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    // the EXACT per-encoding rule graft.Tables applies on the batch
    // path, via the same shared helper — so the streaming source can
    // never drift from the batch read when the fixture's ts encoding
    // changes
    graft.Tables.normalizeTs(stream, "ts", raw("ts").dataType,
      TimestampType, "events.ts")
  }

  /** Watermarked window aggregation (streaming twin of e01; with
    * `slide` < `windowLen`, of the SLIDING e15): counts + sums per
    * (window, event_type). Sliding state is len/slide windows per key
    * group — the same bounded Expand factor as the batch form. */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours", slide: Option[String] = None)
      : DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(
        slide.map(sl => window(col("ts"), windowLen, sl))
          .getOrElse(window(col("ts"), windowLen)),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("total"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col("event_type"),
        col("cnt"), col("total"))

  /** Watermarked windowed HLL distinct-user estimate (streaming twin of
    * the oracle-checked e10): the mergeable register sketch works
    * unchanged under incremental execution — partial buffers merge
    * across micro-batches exactly as they merge across partitions, so
    * the streamed estimate is bit-identical to the batch one for every
    * completed window. State per window is one 64-byte buffer. */
  def windowedDistinctUsers(events: DataFrame, windowLen: String = "1 day",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen))
      .agg(graft.functions.HyperLogLog.hll(
        graft.functions.TextOps.md5Long32(col("user_id"))).as("est_users"))
      .select(col("window.start").as("win_start"), col("est_users"))

  /** Windowed heavy hitters: the Misra-Gries candidate summary as a
    * streaming aggregate — per event-time window, the top user
    * CANDIDATES with their MG bounds. The buffer merges associatively,
    * so micro-batch boundaries behave exactly like partition
    * boundaries: the emitted summary satisfies the same under/over
    * bounds and >n/(k+1) recall as the batch aggregate (contents may
    * differ — the property, not the bytes, is the contract, same as
    * the batch stance). State per window is ONE bounded buffer. */
  def windowedHeavyHitters(events: DataFrame, k: Int = 16,
      windowLen: String = "1 day", watermark: String = "2 hours")
      : DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen))
      .agg(graft.functions.HeavyHitters.heavyHitters(k)(col("user_id"))
        .as("hh"))
      .select(col("window.start").as("win_start"), col("hh"))

  /** Streaming dedup by key within the watermark horizon (D2 as a
    * stream; state is bounded by the watermark). */
  def dedupStream(events: DataFrame, watermark: String = "2 hours")
      : DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join (attribution: each conversion event
    * joins the same user's candidate events in the preceding
    * `lookbackMinutes`). Both sides carry watermarks and the join
    * condition bounds event time on BOTH ends — exactly what Spark
    * needs to age out buffered state, so state size is O(events in the
    * lookback + watermark horizon), not the whole stream. The batch
    * twin (same join on static frames) is the correctness oracle in
    * the spec. */
  def intervalJoin(candidates: DataFrame, conversions: DataFrame,
      lookbackMinutes: Long = 60, watermark: String = "2 hours")
      : DataFrame = {
    val l = candidates
      .select(col("user_id"), col("event_id").as("cand_id"),
        col("event_type").as("cand_type"), col("ts").as("cand_ts"))
      .withWatermark("cand_ts", watermark)
    val r = conversions
      .select(col("user_id").as("conv_user"),
        col("event_id").as("conv_id"), col("ts").as("conv_ts"))
      .withWatermark("conv_ts", watermark)
    l.join(r,
      col("user_id") === col("conv_user") &&
        col("cand_ts") <= col("conv_ts") &&
        col("cand_ts") >= col("conv_ts") -
          expr(s"INTERVAL $lookbackMinutes MINUTES"))
      .select(col("user_id"), col("conv_id"), col("cand_id"),
        col("cand_type"), col("cand_ts"), col("conv_ts"))
  }

  final case class BlockDoc(
      block: String, doc_id: Long, ts: Timestamp, simhash: Long)
  final case class BlockState(seen: List[(Long, Long)])
  final case class NearDupHit(a_id: Long, b_id: Long, hamming: Long)

  /** STREAMING near-duplicate detection — the incremental form of the
    * batch SimHash pipeline (d05/d06): each arriving document's
    * per-row [[graft.functions.TextOps.simhash32]] signature (a pure
    * projection, so it composes before the one-stateful-op limit) is
    * blocked on its two 16-bit halves; per-block state keeps the
    * signatures seen inside the watermark horizon and every arrival
    * emits its Hamming-verified pairs against them. State per block is
    * capped (the [[graft.ops.Blocking]] hot-bucket stance: a
    * degenerate block must not grow state without bound) and expires
    * on event-time timeout. Each pair is emitted EXACTLY once: a pair
    * whose hi halves are equal comes from the hi block alone, and the
    * lo block skips hi-equal pairs — no consumer-side distinct needed.
    * The spec pins the emitted rows duplicate-free and the pair set
    * equal to the batch d06 pairs on the same corpus.
    *
    * Cap interaction (documented degradation stance): when a hi block's
    * `seen` list is saturated at `maxPerBlock`, a hi-equal pair that the
    * saturated hi block can no longer emit is ALSO skipped by the lo
    * block (the skip keys on hash equality, not on whether the partner
    * was actually retained hi-side) — so past saturation the stream
    * under-reports hi-equal pairs rather than double-reporting any pair.
    * Exactly-once-per-pair is preserved; coverage degrades only in
    * blocks hotter than `maxPerBlock`, mirroring the batch path's
    * capped-bucket stance (`Blocking.capBuckets`). */
  def nearDupStream(docs: DataFrame, hammingMax: Int = 6,
      watermark: String = "2 hours", horizonMs: Long = 7200000L,
      maxPerBlock: Int = 1000): Dataset[NearDupHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tagged = docs
      .withColumn("simhash",
        graft.functions.TextOps.simhash32(col("text")))
      .select(col("doc_id"), col("ts"), col("simhash"),
        explode(array(
          concat(lit("hi:"), expr("simhash div 65536")),
          concat(lit("lo:"), expr("simhash % 65536")))).as("block"))
      .withWatermark("ts", watermark)
      .select("block", "doc_id", "ts", "simhash").as[BlockDoc]
    tagged.groupByKey(_.block)
      .flatMapGroupsWithState[BlockState, NearDupHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (block: String, rows: Iterator[BlockDoc],
            state: GroupState[BlockState]) =>
          // a pair whose hi halves are equal is emitted by the hi
          // block alone; the lo block emits only hi-differing pairs,
          // so the union across blocks is duplicate-free (each pair
          // matches in >=1 block, never emitted twice)
          val loBlock = block.startsWith("lo:")
          if (rows.isEmpty && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var seen = state.getOption.map(_.seen).getOrElse(Nil)
            val out = scala.collection.mutable.ArrayBuffer.empty[NearDupHit]
            var lastMs = 0L
            rows.toSeq.sortBy(d => (d.ts.getTime, d.doc_id)).foreach { d =>
              seen.foreach { case (sh, id) =>
                if (id != d.doc_id &&
                    !(loBlock && (sh >>> 16) == (d.simhash >>> 16))) {
                  val ham = java.lang.Long.bitCount(sh ^ d.simhash).toLong
                  if (ham <= hammingMax)
                    out += NearDupHit(math.min(id, d.doc_id),
                      math.max(id, d.doc_id), ham)
                }
              }
              if (seen.length < maxPerBlock)
                seen = (d.simhash, d.doc_id) :: seen
              lastMs = math.max(lastMs, d.ts.getTime)
            }
            state.update(BlockState(seen))
            // a late block (all events behind the watermark) must still
            // get a VALID timeout — Spark rejects timestamps at or
            // below the current watermark
            state.setTimeoutTimestamp(math.max(lastMs + horizonMs,
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  final case class SessionEvent(
      user_id: Long, ts: Timestamp, event_id: Long)
  final case class SessionState(
      sessionSeq: Long, startMs: Long, lastMs: Long, n: Long)
  final case class Session(
      user_id: Long, session_seq: Long, n_events: Long,
      sess_start: Timestamp, sess_end: Timestamp)

  /** Stateful sessionization with an inactivity gap — the streaming
    * twin of e02, via flatMapGroupsWithState (KeyValueGroupedDataset
    * custom state, SURVEY.md §2.12). Emits a session when a gap closes
    * it or on event-time timeout. State per user is O(1). */
  def sessionize(events: DataFrame, gapMinutes: Long = 30,
      watermark: String = "2 hours"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    def flush(userId: Long, st: SessionState): Session =
      Session(userId, st.sessionSeq, st.n,
        new Timestamp(st.startMs), new Timestamp(st.lastMs))

    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[SessionEvent],
            state: GroupState[SessionState]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed the open session: emit and clear
            val out = state.getOption.map(flush(userId, _)).toList
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur = cur match {
                case Some(st) if t - st.lastMs <= gapMs =>
                  // out-of-order in-watermark events may precede the
                  // session's recorded start — fold the min too, so the
                  // emitted window matches the batch twin (e02)
                  Some(st.copy(startMs = math.min(st.startMs, t),
                    lastMs = math.max(st.lastMs, t), n = st.n + 1))
                case Some(st) =>
                  closed += flush(userId, st)
                  Some(SessionState(st.sessionSeq + 1, t, t, 1))
                case None =>
                  Some(SessionState(1, t, t, 1))
              }
            }
            cur.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(st.lastMs + gapMs)
            }
            closed.iterator
          }
      }
  }

  final case class AsofRow(
      user_id: Long, ts: Timestamp, event_id: Long, is_left: Boolean)
  final case class AsofState(
      // (tsUs, event_id), both kept sorted ascending; rights holds the
      // in-watermark buffer plus ONE carried best row at-or-before the
      // prune cutoff (the as-of carry — a future left may still need it)
      rights: List[(Long, Long)], lefts: List[(Long, Long)])
  final case class AsofMatch(
      user_id: Long, event_id: Long, ts: Timestamp,
      m_event_id: Option[Long], m_ts: Option[Timestamp])

  /** STREAMING as-of enrichment — the incremental twin of
    * [[graft.ops.Ops.asofJoin]] (batch oracle e08/j10): each left-side
    * event is matched to the same user's most recent right-side event
    * at-or-before it. Both sides union into one keyed state machine;
    * a left row finalizes when the watermark passes its event time
    * (any right row that could still precede it would be beyond the
    * watermark, so the match set is provably complete), emitting the
    * argmax-(ts, event_id) right at-or-before it — ASOF LEFT JOIN
    * semantics, unmatched lefts emit null. State per user is the
    * pending buffer inside the watermark horizon plus one carried
    * right row (the current as-of value — it persists like any
    * dimension's latest state), with an event-time timeout driving
    * finalization when a user goes quiet. */
  def asofEnrich(left: DataFrame, right: DataFrame,
      watermark: String = "2 hours"): Dataset[AsofMatch] = {
    val spark = left.sparkSession
    import spark.implicits._
    def us(t: Timestamp): Long = t.getTime / 1000 * 1000000L + t.getNanos / 1000
    def fromUs(u: Long): Timestamp = {
      val t = new Timestamp(u / 1000)
      t.setNanos((u % 1000000L).toInt * 1000)
      t
    }
    def side(df: DataFrame, isLeft: Boolean) = df
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(isLeft).as("is_left"))
    side(left, isLeft = true).unionByName(side(right, isLeft = false))
      .withWatermark("ts", watermark)
      .as[AsofRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, AsofMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[AsofRow],
            state: GroupState[AsofState]) =>
          val st = state.getOption.getOrElse(AsofState(Nil, Nil))
          val (inL, inR) = rows.toSeq.partition(_.is_left)
          val lefts = (st.lefts ++ inL.map(r => (us(r.ts), r.event_id))).sorted
          val rights = (st.rights ++ inR.map(r => (us(r.ts), r.event_id))).sorted
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (done, pending) = lefts.partition(_._1 <= wmUs)
          val out = done.map { case (lt, lid) =>
            // latest right at-or-before lt; equal ts ties resolve to the
            // max event_id (the batch argmax-struct tiebreak)
            val m = rights.takeWhile(_._1 <= lt).lastOption
            AsofMatch(userId, lid, fromUs(lt),
              m.map(_._2), m.map(r => fromUs(r._1)))
          }
          // prune rights: everything after the cutoff can still win a
          // pending (or future) left; below it only the best row matters
          val cutoff = (wmUs +: pending.map(_._1)).min
          val (olds, keep) = rights.partition(_._1 <= cutoff)
          val pruned = olds.lastOption.toList ++ keep
          state.update(AsofState(pruned, pending))
          if (pending.nonEmpty)
            // drive finalization of buffered lefts on watermark advance
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
          out.iterator
      }
  }

  /** foreachBatch sink running an arbitrary batch transform per
    * micro-batch and appending parquet — the incremental form of the
    * reference's transform chain (`pipeline.py` + append CSV). */
  def transformSink(events: DataFrame, transform: DataFrame => DataFrame,
      outPath: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    events.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        transform(batch).write.mode("append").parquet(outPath)
        ()
      }
      .start()
}
