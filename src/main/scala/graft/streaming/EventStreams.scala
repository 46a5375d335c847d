package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One raw event of the warehouse's incremental-load stream (schema of
  * `events.parquet`, minus the free-form `props` JSON).
  */
final case class Event(
    event_id: Long,
    ts: Timestamp,
    user_id: Long,
    event_type: String,
    value: Double)

/** Open-session accumulator kept in `GroupState` (one per user). */
final case class SessionState(startUs: Long, lastUs: Long, nEvents: Long)

/** One closed session, emitted when the event-time watermark passes the
  * session gap.
  */
final case class ClosedSession(
    user_id: Long,
    session_start_us: Long,
    n_events: Long,
    duration_us: Long)

/** Structured-Streaming twins of the batch event queries — SURVEY §2.6
  * (st01/st02). The incremental-load workload of the reference (append
  * of new visits) maps to `readStream` over the events source; these
  * transforms are source-agnostic (`MemoryStream` in tests, a file or
  * Kafka source in production — same plan either way).
  */
object EventStreams {

  /** st01: hourly tumbling-window aggregate with a watermark — the
    * streaming twin of q51. State is bounded: windows older than the
    * watermark are finalized and evicted, so the query runs forever on
    * an unbounded stream. The aggregation is hash-partial per
    * micro-batch (map-side combine), shuffled on (window, event_type).
    */
  def tumblingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  /** st02: gap-based sessionization (30 min default) via
    * `flatMapGroupsWithState` with an event-time timeout — the
    * streaming twin of q52. State per user is O(1) (one open session),
    * closed sessions are emitted exactly once when the watermark
    * passes `lastUs + gap`. Keys shuffle once on user_id; at cluster
    * scale state is sharded across executors by the same hash.
    */
  def sessionize(
      events: Dataset[Event],
      gapMinutes: Int = 30,
      // allowed lateness; defaults to the gap. Deployments that admit
      // very late data (lateness >> gap) still sessionize it correctly:
      // >gap-early admitted events accumulate in their own "earlier
      // session" below instead of polluting the open one.
      lateness: Option[String] = None): Dataset[ClosedSession] = {
    val gapUs = gapMinutes.toLong * 60L * 1000000L

    // true microseconds: getTime alone is ms-truncated, which would
    // diverge from the batch q52 twin (unix_micros) on sub-ms gaps
    def micros(t: Timestamp): Long =
      t.getTime * 1000L + (t.getNanos % 1000000) / 1000L

    def update(
        userId: Long,
        rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(ClosedSession(userId, s.startUs, s.nEvents, s.lastUs - s.startUs))
      } else {
        val closed = Iterator.newBuilder[ClosedSession]
        var cur = state.getOption
        // Watermark-admitted late events that lie more than `gap`
        // BEFORE the open session belong to earlier, already-gone
        // sessions. Accumulate them in their own open "earlier
        // session" so consecutive ones within `gap` of each other
        // close as ONE session (as the batch q52 twin would), not as
        // per-event singletons.
        var earlier: Option[SessionState] = None
        def closeEarlier(): Unit = {
          earlier.foreach(s =>
            closed += ClosedSession(userId, s.startUs, s.nEvents, s.lastUs - s.startUs))
          earlier = None
        }
        // Micro-batch rows are not ordered; sort the (small) per-user
        // slice by event time before folding it into the session.
        rows.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
          val us = micros(e.ts)
          cur match {
            // Merge only when the event falls within `gap` of the open
            // session's SPAN [startUs, lastUs]. A watermark-admitted
            // late event from an earlier batch can precede startUs —
            // extending startUs keeps session_start_us/duration_us
            // consistent with the batch q52 twin (which sorts all
            // events before splitting on gaps).
            case Some(s) if us - s.lastUs <= gapUs && s.startUs - us <= gapUs =>
              earlier match {
                // the earlier chain reaches this event, and this event
                // reaches the main session: the batch twin would see
                // one unbroken run — bridge everything into one session
                case Some(eS) if us - eS.lastUs <= gapUs =>
                  cur = Some(SessionState(
                    math.min(eS.startUs, math.min(s.startUs, us)),
                    math.max(s.lastUs, us), s.nEvents + eS.nEvents + 1))
                  earlier = None
                case _ =>
                  cur = Some(SessionState(
                    math.min(s.startUs, us), math.max(s.lastUs, us), s.nEvents + 1))
              }
            // More than `gap` before the open session (first case not
            // matching with us < startUs implies startUs - us > gap):
            // extend or start the earlier session.
            case Some(s) if us < s.startUs =>
              earlier match {
                case Some(eS) if us - eS.lastUs <= gapUs =>
                  earlier = Some(SessionState(eS.startUs, us, eS.nEvents + 1))
                case _ =>
                  closeEarlier()
                  earlier = Some(SessionState(us, us, 1))
              }
            // More than `gap` after: close and reopen.
            case Some(s) =>
              closed += ClosedSession(userId, s.startUs, s.nEvents, s.lastUs - s.startUs)
              cur = Some(SessionState(us, us, 1))
            case None =>
              cur = Some(SessionState(us, us, 1))
          }
        }
        // anything still in `earlier` is > gap before the surviving
        // open session — no later event in any batch can merge with it
        closeEarlier()
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.lastUs / 1000L + gapMinutes.toLong * 60L * 1000L)
        }
        closed.result().iterator
      }
    }

    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val stEnc = Encoders.product[SessionState]
    events
      .withWatermark("ts", lateness.getOrElse(s"$gapMinutes minutes"))
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** st05: continuous-load source breadth. A deterministic
    * `rate-micro-batch` stream mapped onto the Event schema — the
    * stand-in for the reference's continuous import feed. In
    * production the ONLY change is the source line
    * (`format("kafka")` + `from_json(value)`); every downstream
    * transform ([[tumblingCounts]], [[sessionize]], [[dedupedAppend]])
    * takes the DataFrame unchanged, which is the point: graft's
    * streaming operators are source-agnostic.
    *
    * Each micro-batch carries `rowsPerBatch` rows sharing one event
    * time that advances `advanceMs` per batch, so window/watermark
    * behavior is reproducible in tests (unlike the wall-clock `rate`
    * source).
    */
  def rateEvents(
      spark: org.apache.spark.sql.SparkSession,
      rowsPerBatch: Int = 90,
      startMs: Long = 0L,
      advanceMs: Long = 3600000L): DataFrame =
    spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch.toLong)
      .option("startTimestamp", startMs)
      .option("advanceMillisPerBatch", advanceMs)
      .load()
      .select(
        col("value").as("event_id"),
        col("timestamp").as("ts"),
        (col("value") % 50).as("user_id"),
        when(col("value") % 3 === 0, "click")
          .when(col("value") % 3 === 1, "view")
          .otherwise("buy").as("event_type"),
        ((col("value") % 100) / 10.0).as("value"))

  /** st03: exactly-once incremental load — the reference's "append new
    * visits" ETL shape. Duplicate deliveries (at-least-once sources,
    * replayed batches) are dropped on the event id within the
    * watermark horizon; state is bounded because ids older than the
    * watermark are evicted.
    */
  def dedupedAppend(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
}
