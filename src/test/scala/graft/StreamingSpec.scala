package graft

import java.sql.Timestamp

import graft.streaming.{ClosedSession, Event, EventStreams}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** st01/st02 — Structured Streaming twins of q51/q52 (SURVEY §2.6). */
class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("st01: streamed tumbling-window agg matches the batch q51 answer") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // sort by event time so the two-batch split below is a valid
    // stream prefix — an out-of-order first half could advance the
    // watermark past second-half events and drop them as late
    val batchEvents = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
      .collect()
      .sortBy(e => (e.ts.getTime, e.event_id))

    val input = MemoryStream[Event]
    val q = EventStreams.tumblingCounts(input.toDF(), watermark = "2 hours")
      .writeStream
      .format("memory")
      .queryName("st01_out")
      .outputMode("append")
      .start()
    try {
      // Two micro-batches to exercise partial-state carry-over, then a
      // far-future sentinel to push the watermark past every window.
      val (first, rest) = batchEvents.splitAt(batchEvents.length / 2)
      input.addData(first.toIndexedSeq)
      q.processAllAvailable()
      input.addData(rest.toIndexedSeq)
      q.processAllAvailable()
      input.addData(Event(-1L, ts("2099-01-01 00:00:00"), -1L, "sentinel", 0.0))
      q.processAllAvailable()

      val streamed = spark.table("st01_out")
        .filter(col("event_type") =!= "sentinel")
        .select(col("hour"), col("event_type"), col("n"), round(col("sum_value"), 3).as("sum_value"))
        .collect().map(_.toSeq).toSet
      val batch = Tables.events(spark, sf)
        .withColumn("hour", date_trunc("hour", col("ts")))
        .groupBy("hour", "event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 3).as("sum_value"))
        .collect().map(_.toSeq).toSet

      assert(streamed === batch)
    } finally q.stop()
  }

  test("st0e: streamed sliding-window agg matches the batch q5b answer") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val batchEvents = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
      .collect()
      .sortBy(e => (e.ts.getTime, e.event_id))

    val input = MemoryStream[Event]
    val q = EventStreams.slidingCounts(input.toDF())
      .writeStream
      .format("memory")
      .queryName("st0e_out")
      .outputMode("append")
      .start()
    try {
      val (first, rest) = batchEvents.splitAt(batchEvents.length / 2)
      input.addData(first.toIndexedSeq)
      q.processAllAvailable()
      input.addData(rest.toIndexedSeq)
      q.processAllAvailable()
      input.addData(Event(-1L, ts("2099-01-01 00:00:00"), -1L, "sentinel", 0.0))
      q.processAllAvailable()

      val streamed = spark.table("st0e_out")
        .filter(col("event_type") =!= "sentinel")
        .select(col("window_start"), col("event_type"), col("n"),
          round(col("sum_value"), 3).as("sum_value"))
        .collect().map(_.toSeq).toSet
      val batch = Tables.events(spark, sf)
        .groupBy(window(col("ts"), "15 minutes", "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 3).as("sum_value"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
        .collect().map(_.toSeq).toSet

      assert(streamed === batch)
      // multiplicity law carried over from the batch twin: 3 window
      // instances per event
      val totalN = spark.table("st0e_out")
        .filter(col("event_type") =!= "sentinel")
        .agg(sum("n")).collect().head.getLong(0)
      assert(totalN === 3 * batchEvents.length)
    } finally q.stop()
  }

  test("st02: flatMapGroupsWithState sessionization closes sessions on watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream
      .format("memory")
      .queryName("st02_out")
      .outputMode("append")
      .start()
    try {
      // user 1: two sessions (gap 45 min > 30); user 2: one session.
      input.addData(
        Event(1, ts("2026-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2026-01-01 10:10:00"), 1, "click", 1.0),
        Event(3, ts("2026-01-01 10:55:00"), 1, "click", 1.0),
        Event(4, ts("2026-01-01 10:05:00"), 2, "view", 2.0))
      q.processAllAvailable()
      // Sentinel advances the watermark far enough to time out all state.
      input.addData(Event(99, ts("2026-01-02 00:00:00"), 9, "x", 0.0))
      q.processAllAvailable()
      input.addData(Event(100, ts("2026-01-03 00:00:00"), 9, "x", 0.0))
      q.processAllAvailable()

      val out = spark.table("st02_out").as[ClosedSession].collect()
        .filter(_.user_id < 9).sortBy(s => (s.user_id, s.session_start_us))
      def us(s: String) = ts(s).getTime * 1000L
      assert(out.toSeq === Seq(
        ClosedSession(1, us("2026-01-01 10:00:00"), 2, 600000000L),
        ClosedSession(1, us("2026-01-01 10:55:00"), 1, 0L),
        ClosedSession(2, us("2026-01-01 10:05:00"), 1, 0L)))
    } finally q.stop()
  }

  test("st02: watermark-admitted late event in a later batch extends session start") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("st02_late").outputMode("append").start()
    try {
      // batch 1: user 2 at 12:00 advances the watermark to 11:30
      input.addData(Event(1, ts("2026-01-01 12:00:00"), 2, "x", 0.0))
      q.processAllAvailable()
      // batch 2: user 1 opens a session [11:58, 11:59]
      input.addData(
        Event(2, ts("2026-01-01 11:58:00"), 1, "click", 1.0),
        Event(3, ts("2026-01-01 11:59:00"), 1, "click", 1.0))
      q.processAllAvailable()
      // batch 3: LATE user-1 event at 11:35 — admitted (>= watermark
      // 11:30), 23 min before session start (within gap): must merge
      // AND extend session_start_us, matching the batch q52 twin
      input.addData(Event(4, ts("2026-01-01 11:35:00"), 1, "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(98, ts("2026-01-02 00:00:00"), 9, "x", 0.0))
      q.processAllAvailable()
      input.addData(Event(99, ts("2026-01-03 00:00:00"), 9, "x", 0.0))
      q.processAllAvailable()

      def us(s: String) = ts(s).getTime * 1000L
      val out = spark.table("st02_late").as[ClosedSession].collect()
        .filter(_.user_id == 1).sortBy(_.session_start_us)
      assert(out.toSeq === Seq(
        ClosedSession(1, us("2026-01-01 11:35:00"), 3, 24L * 60 * 1000000)))
    } finally q.stop()
  }

  test("st02: >gap-early late events within gap of each other close as ONE session") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Event]
    // allowed lateness (3 h) >> gap (30 min): events far earlier than
    // the open session can still be admitted by the watermark
    val q = EventStreams.sessionize(input.toDS(), gapMinutes = 30, lateness = Some("3 hours"))
      .writeStream.format("memory").queryName("st02_earlier").outputMode("append").start()
    try {
      // batch 1: user 1 opens a session at 12:00 (watermark after: 09:00)
      input.addData(Event(1, ts("2026-01-01 12:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      // batches 2 and 3: two admitted late events at 10:00 and 10:20,
      // in SEPARATE micro-batches — both > gap before the open
      // session, within gap of each other. The batch q52 twin sees
      // one 2-event session [10:00, 10:20], not two singletons; the
      // earlier session must stay open in state across batches.
      input.addData(Event(2, ts("2026-01-01 10:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(3, ts("2026-01-01 10:20:00"), 1, "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(98, ts("2026-01-02 00:00:00"), 9, "x", 0.0))
      q.processAllAvailable()
      input.addData(Event(99, ts("2026-01-03 00:00:00"), 9, "x", 0.0))
      q.processAllAvailable()

      def us(s: String) = ts(s).getTime * 1000L
      val out = spark.table("st02_earlier").as[ClosedSession].collect()
        .filter(_.user_id == 1).sortBy(_.session_start_us)
      assert(out.toSeq === Seq(
        ClosedSession(1, us("2026-01-01 10:00:00"), 2, 20L * 60 * 1000000),
        ClosedSession(1, us("2026-01-01 12:00:00"), 1, 0L)))
    } finally q.stop()
  }

  test("st05: rate-micro-batch source drives tumblingCounts (kafka-shaped continuous load)") {
    // 90 consecutive values per batch → exactly 30 per event_type in
    // every 1-hour window; batches advance event time 1 h each, so the
    // 30-min watermark closes one window per subsequent batch.
    val src = EventStreams.rateEvents(spark, rowsPerBatch = 90)
    val q = EventStreams.tumblingCounts(src, watermark = "30 minutes")
      .writeStream.format("memory").queryName("st05_out").outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 90000
      while (spark.table("st05_out").isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      val rows = spark.table("st05_out")
        .select("event_type", "n").collect()
      assert(rows.nonEmpty, "no window closed within the deadline")
      rows.foreach { r =>
        assert(Set("click", "view", "buy").contains(r.getString(0)))
        assert(r.getLong(1) === 30L, s"window count for ${r.getString(0)}")
      }
    } finally q.stop()
  }

  test("st03: streamed dedup drops replayed events within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Event]
    val q = EventStreams.dedupedAppend(input.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("st03_out").outputMode("append").start()
    try {
      val e1 = Event(1, ts("2026-01-01 10:00:00"), 1, "click", 1.0)
      val e2 = Event(2, ts("2026-01-01 10:01:00"), 1, "view", 1.0)
      input.addData(e1, e2, e1) // duplicate within one batch
      q.processAllAvailable()
      input.addData(e2, Event(3, ts("2026-01-01 10:02:00"), 2, "click", 1.0)) // replay across batches
      q.processAllAvailable()
      val ids = spark.table("st03_out").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("st09: file source readStream over a json-lines directory, incremental batches") {
    import spark.implicits._
    val dir = tmpDir("st01files")
    val schema = org.apache.spark.sql.Encoders.product[Event].schema

    def writeBatch(events: Seq[Event]): Unit =
      events.toDF().coalesce(1).write.mode("append").json(s"$dir/in")

    writeBatch(Seq(
      Event(1, ts("2026-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, ts("2026-01-01 10:30:00"), 1, "view", 2.0)))

    val stream = spark.readStream.schema(schema).json(s"$dir/in")
    val q = EventStreams.tumblingCounts(stream, watermark = "2 hours")
      .writeStream.format("memory").queryName("st01_files").outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      // second file arrives later — the file source must pick it up
      writeBatch(Seq(Event(3, ts("2026-01-01 10:45:00"), 2, "click", 3.0)))
      q.processAllAvailable()
      writeBatch(Seq(Event(9, ts("2026-01-02 00:00:00"), 9, "sentinel", 0.0)))
      q.processAllAvailable()
      val rows = spark.table("st01_files")
        .filter(col("event_type") =!= "sentinel")
        .select("event_type", "n", "sum_value")
        .collect().map(_.toSeq).toSet
      assert(rows === Set(Seq("click", 2L, 4.0), Seq("view", 1L, 2.0)))
    } finally q.stop()
  }

  test("st0a: socket source json-lines feed drives tumblingCounts") {
    val loopback = java.net.InetAddress.getLoopbackAddress
    val server = new java.net.ServerSocket(0, 1, loopback)
    val port = server.getLocalPort
    @volatile var writer: java.io.PrintWriter = null
    val accepted = new java.util.concurrent.CountDownLatch(1)
    val acceptor = new Thread(() => {
      val sock = server.accept()
      writer = new java.io.PrintWriter(sock.getOutputStream, true)
      accepted.countDown()
    })
    acceptor.setDaemon(true)
    acceptor.start()

    // same literal address on both ends — "localhost" can resolve to a
    // different loopback family than the ServerSocket's bind address
    val src = EventStreams.socketEvents(spark, loopback.getHostAddress, port)
    val q = EventStreams.tumblingCounts(src, watermark = "30 minutes")
      .writeStream.format("memory").queryName("st0a_out").outputMode("append").start()
    try {
      assert(accepted.await(30, java.util.concurrent.TimeUnit.SECONDS),
        "socket source never connected")
      def send(id: Long, isoTs: String, user: Long, typ: String, v: Double): Unit =
        writer.println(
          s"""{"event_id":$id,"ts":"$isoTs","user_id":$user,"event_type":"$typ","value":$v}""")
      send(1, "2026-01-01T10:00:00", 1, "click", 1.0)
      send(2, "2026-01-01T10:20:00", 1, "click", 2.0)
      // a garbage line and a schema-mismatched one (null required
      // field) must DROP — not kill the typed query with an all-null
      // row, and not pollute the windowed counts below
      writer.println("{not json at all")
      writer.println("""{"event_id":null,"ts":"2026-01-01T10:21:00","user_id":1,"event_type":"click","value":9.0}""")
      // watermark only advances between micro-batches, and the socket
      // source batches whatever has arrived — keep nudging it forward
      // with far-future sentinels until the 10:00 window closes
      val deadline = System.currentTimeMillis() + 90000
      var sentinelId = 100L
      while (spark.table("st0a_out").filter(col("event_type") === "click").isEmpty
          && System.currentTimeMillis() < deadline) {
        send(sentinelId, s"2026-01-02T00:00:0${sentinelId % 10}", 9, "sentinel", 0.0)
        sentinelId += 1
        Thread.sleep(250)
      }
      val rows = spark.table("st0a_out")
        .filter(col("event_type") === "click")
        .select("event_type", "n", "sum_value").collect()
      // on timeout, show what DID arrive — "0 rows" alone says nothing
      // about whether the socket, the watermark, or the window is stuck
      assert(rows.length === 1,
        s"expected exactly the closed 10:00 click window; sink so far: " +
          spark.table("st0a_out").collect().map(_.toSeq).mkString("[", ", ", "]"))
      assert(rows(0).getLong(1) === 2L)
      assert(rows(0).getDouble(2) === 3.0)
    } finally {
      q.stop()
      server.close()
    }
  }

  test("st04: stream-stream interval join (clicks within 10 min after views)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val views = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val v = views.toDF().withWatermark("ts", "1 hour")
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"), col("ts").as("v_ts"))
    val c = clicks.toDF().withWatermark("ts", "1 hour")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    val joined = v.join(c,
      col("v_user") === col("c_user") &&
        col("c_ts") > col("v_ts") &&
        col("c_ts") <= col("v_ts") + expr("INTERVAL 10 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("st04_out").outputMode("append").start()
    try {
      views.addData(Event(1, ts("2026-01-01 10:00:00"), 1, "view", 0))
      clicks.addData(
        Event(2, ts("2026-01-01 10:05:00"), 1, "click", 0), // within window
        Event(3, ts("2026-01-01 10:20:00"), 1, "click", 0), // outside window
        Event(4, ts("2026-01-01 10:05:00"), 2, "click", 0)) // other user
      q.processAllAvailable()
      val got = spark.table("st04_out").select("v_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((1L, 2L)))
    } finally q.stop()
  }

  test("st02 twin: session counts per user agree with batch q52 on sf0.001") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val batchEvents = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
      .collect()
    val maxTs = batchEvents.map(_.ts.getTime).max

    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("st02_twin").outputMode("append").start()
    try {
      input.addData(batchEvents.toIndexedSeq)
      q.processAllAvailable()
      input.addData(Event(-1, new Timestamp(maxTs + 86400L * 1000), -1, "sentinel", 0.0))
      q.processAllAvailable()
      input.addData(Event(-2, new Timestamp(maxTs + 2 * 86400L * 1000), -1, "sentinel", 0.0))
      q.processAllAvailable()

      val streamed = spark.table("st02_twin").as[ClosedSession].collect()
        .filter(_.user_id >= 0)
        .groupBy(_.user_id).view.mapValues(_.length).toMap
      val batch = SparkEntry.queries("q52_sessionize")(spark, sf)
        .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("st0f: the CDC tail follows the store — span feeds, quiet compactions, replay-exact progress") {
    import spark.implicits._
    import graft.sources.Snapshots

    val root = tmpDir("st0f-src") + "/orders"
    val out = tmpDir("st0f-out") + "/feed"
    Snapshots.commit(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "name", "amount"), root)
    // nothing after the baseline: a poll commits nothing
    Snapshots.tailOnce(spark, root, Seq("id"), out)
    assert(Snapshots.versions(spark, out).isEmpty)
    // v2: update 1, insert 3 — the poll appends the span feed
    Snapshots.commitDelta(Seq((1L, "a2", 11L), (3L, "c", 30L)).toDF("id", "name", "amount"), root)
    Snapshots.tailOnce(spark, root, Seq("id"), out)
    def feedRows(): Seq[(Long, String, Long, Long)] =
      Snapshots.readAppendOnly(spark, out)
        .select("id", "_change", "_from_v", "_to_v").orderBy("_to_v", "id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(feedRows() === Seq((1L, "update", 1L, 2L), (3L, "insert", 1L, 2L)))
    // a replayed poll (crash-after-commit restart) adds NOTHING —
    // progress is read off the output itself
    Snapshots.tailOnce(spark, root, Seq("id"), out)
    assert(feedRows().size === 2)
    // a quiet compaction advances versions without changes: no commit
    Snapshots.compact(spark, root, Seq("id"))
    Snapshots.tailOnce(spark, root, Seq("id"), out)
    assert(feedRows().size === 2)
    // v4 tombstones id=2 — the span (2,4] crosses the full, so the
    // full-diff fallback runs and still emits exactly the delete
    Snapshots.commitDelta(
      Seq((2L, "b", 20L, true)).toDF("id", "name", "amount", "_deleted"), root)
    Snapshots.tailOnce(spark, root, Seq("id"), out)
    assert(feedRows() === Seq(
      (1L, "update", 1L, 2L), (3L, "insert", 1L, 2L), (2L, "delete", 2L, 4L)))
    // applying the feed to the baseline reproduces the live state —
    // the consumer-side contract of a CDC stream
    val applied = Snapshots.asOf(spark, root, 1L, Seq("id"))
      .withColumn("_v", lit(0L)).withColumn("_deleted", lit(false))
      .unionByName(
        Snapshots.readAppendOnly(spark, out)
          .withColumn("_v", col("_to_v"))
          .withColumn("_deleted", col("_change") === "delete")
          .select("id", "name", "amount", "_v", "_deleted"),
        allowMissingColumns = true)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("_v").desc)
    val lives = applied.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && !col("_deleted"))
      .select("id", "name", "amount").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val direct = Snapshots.latest(spark, root, Seq("id"))
      .select("id", "name", "amount").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(lives === direct)
  }

  test("st0f: a racing second tail's stale span is fenced out, not duplicated") {
    import spark.implicits._
    import graft.sources.Snapshots

    val root = tmpDir("st0f3-src") + "/orders"
    val out = tmpDir("st0f3-out") + "/feed"
    Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), root)
    Snapshots.commitDelta(Seq((1L, "a2"), (3L, "c")).toDF("id", "name"), root)
    // two concurrent tails both observe (last=1, tip=2). The winner:
    Snapshots.tailOnce(spark, root, Seq("id"), out)
    val landed = Snapshots.versions(spark, out)
    assert(landed.size === 1)
    // the loser replays its STALE observation after the winner landed —
    // the fenced commit must read the output's advanced _to_v and DROP
    // the span, never append the same rows under the next version
    val vsAtObservation = Snapshots.versions(spark, root)
    Snapshots.tailSpan(spark, root, Seq("id"), out, 1L, 2L, vsAtObservation)
    assert(Snapshots.versions(spark, out) === landed,
      "stale duplicate span landed in the feed")
    assert(Snapshots.readAppendOnly(spark, out).count() === 2L)
    // a GENUINELY new span still commits through the same fence
    Snapshots.commitDelta(Seq((2L, "b", true)).toDF("id", "name", "_deleted"), root)
    Snapshots.tailOnce(spark, root, Seq("id"), out)
    assert(Snapshots.versions(spark, out).size === 2)
    assert(Snapshots.readAppendOnly(spark, out)
      .select("id", "_change", "_to_v").orderBy("_to_v", "id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      === Seq((1L, "update", 2L), (3L, "insert", 2L), (2L, "delete", 3L)))
  }

  test("st0f: the streaming wrapper drives polls from ticks and resumes across queries") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.sources.Snapshots

    val root = tmpDir("st0f2-src") + "/orders"
    val out = tmpDir("st0f2-out") + "/feed"
    Snapshots.commit(Seq((1L, "a")).toDF("id", "name"), root)
    Snapshots.commitDelta(Seq((2L, "b")).toDF("id", "name"), root)
    val ticks = MemoryStream[Int]
    val q = Snapshots.streamChangesInto(spark, root, Seq("id"), out,
      tmpDir("st0f2-ckpt"), ticks = Some(ticks.toDF()))
    try {
      ticks.addData(1)
      q.processAllAvailable()
      // bootstrap span (1, 2]: the insert of id=2
      assert(Snapshots.readAppendOnly(spark, out).count() === 1)
      Snapshots.commitDelta(Seq((1L, "a9")).toDF("id", "name"), root)
      ticks.addData(2)
      q.processAllAvailable()
      val rows = Snapshots.readAppendOnly(spark, out)
        .select("id", "_change", "_to_v").orderBy("_to_v")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(rows === Seq((2L, "insert", 2L), (1L, "update", 3L)))
    } finally q.stop()
  }

  test("st06: streaming ingest commits one delta per micro-batch; as-of reproduces boundaries") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.sources.Snapshots

    val root = tmpDir("st06-store") + "/orders"
    Snapshots.commit(
      Seq((1L, "O", 10.0), (2L, "O", 20.0), (3L, "O", 30.0)).toDF("k", "status", "price"),
      root)

    val input = MemoryStream[StoreUpd]
    val q = Snapshots.streamInto(input.toDF(), root, tmpDir("st06-ckpt"))
    try {
      input.addData(StoreUpd(2L, "F", 21.0, _deleted = false)) // v2: amend k=2
      q.processAllAvailable()
      input.addData( // v3: insert k=4, tombstone k=1
        StoreUpd(4L, "O", 40.0, _deleted = false),
        StoreUpd(1L, "X", 0.0, _deleted = true))
      q.processAllAvailable()
    } finally q.stop()

    assert(graft.sources.Snapshots.latestVersion(spark, root) === 3L,
      "each non-empty micro-batch should commit exactly one delta version")

    def state(v: Long): Seq[(Long, String, Double)] =
      Snapshots.asOf(spark, root, v, Seq("k"))
        .select("k", "status", "price").orderBy("k")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq

    // latest: amend applied, insert present, tombstoned key gone
    assert(state(3L) === Seq((2L, "F", 21.0), (3L, "O", 30.0), (4L, "O", 40.0)))
    // the v2 boundary stays reproducible after v3 committed
    assert(state(2L) === Seq((1L, "O", 10.0), (2L, "F", 21.0), (3L, "O", 30.0)))
    assert(state(1L) === Seq((1L, "O", 10.0), (2L, "O", 20.0), (3L, "O", 30.0)))
  }

  test("st06: streamed commits carry zone maps — a time-range read opens only its micro-batch's segment") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.sources.Snapshots

    val root = tmpDir("st06-zm") + "/ticks"
    val input = MemoryStream[StoreUpd]
    val q = Snapshots.streamInto(input.toDF(), root, tmpDir("st06-zm-ckpt"),
      statsCols = Seq("k", "price"))
    try {
      input.addData(StoreUpd(100L, "A", 1.0, _deleted = false),
        StoreUpd(199L, "A", 2.0, _deleted = false)) // v1: k in [100, 199]
      q.processAllAvailable()
      input.addData(StoreUpd(200L, "B", 3.0, _deleted = false)) // v2: k in [200, 200]
      q.processAllAvailable()
      input.addData(StoreUpd(300L, "C", 4.0, _deleted = false)) // v3: k in [300, 300]
      q.processAllAvailable()
    } finally q.stop()

    // ...except that streamInto batches carry _deleted, making the
    // store merge-read: the zone-map read path is the APPEND-ONLY
    // one, so this asserts the pruning DECISION (sidecars written per
    // micro-batch, ranges disjoint) rather than the full read
    assert(Snapshots.prunedTo(spark, root, "k", 150L, 250L) === Seq(1L, 2L))
    assert(Snapshots.prunedTo(spark, root, "price", 3.5, 9.0) === Seq(3L))
  }

  test("st0b: streaming dedup ingest screens each micro-batch against the growing band index") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.dedup.Dedup
    import graft.sources.Snapshots

    // the store's schema must match what the stream commits: (doc_id, text)
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 7 =!= 3 && col("doc_id") % 7 =!= 5)
    val b1 = docs.filter(col("doc_id") % 7 === 3)
    val b2 = docs.filter(col("doc_id") % 7 === 5)

    val base = tmpDir("st0b")
    val indexRoot = s"$base/idx"
    val corpusRoot = s"$base/corpus"
    Snapshots.commit(corpus, corpusRoot)
    Dedup.commitBandIndex(corpus, indexRoot)

    // batch-wise expected keepers from the (spec-trusted) direct pipeline
    def keepIds(batch: org.apache.spark.sql.DataFrame,
        against: org.apache.spark.sql.DataFrame): Set[Long] =
      Dedup.incrementalNearDups(batch, against)
        .filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
    val expK1 = keepIds(b1, corpus)
    val corpus2 = corpus.unionByName(b1.filter(col("doc_id").isin(expK1.toSeq: _*)))
    val expK2 = keepIds(b2, corpus2)

    val input = MemoryStream[(Long, String)]
    val q = EventStreams.streamDedupIngest(
      input.toDF().toDF("doc_id", "text"), indexRoot, corpusRoot, tmpDir("st0b-ckpt"))
    try {
      input.addData(b1.collect().map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSeq: _*)
      q.processAllAvailable()
      input.addData(b2.collect().map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    // the corpus store holds corpus ∪ keepers(b1) ∪ keepers(b2|corpus+k1),
    // i.e. batch 2 was screened against batch 1's keepers THROUGH the store
    val expected = corpus.select("doc_id").collect().map(_.getLong(0)).toSet ++ expK1 ++ expK2
    val got = Snapshots.latest(spark, corpusRoot, Seq("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === expected)
    // and the index grew by one delta per non-empty micro-batch
    assert(Snapshots.latestVersion(spark, indexRoot) === 3L)
  }

  test("st0c: streaming vector ingest screens each micro-batch against the growing bucket index") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.dedup.Dedup
    import graft.sources.Snapshots

    // store schema must match what the stream commits: MemoryStream
    // delivers array<double>, so the corpus casts up front
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
    val corpus = vecs.filter(col("vec_id") % 7 =!= 3 && col("vec_id") % 7 =!= 5)
    val b1 = vecs.filter(col("vec_id") % 7 === 3)
    val b2 = vecs.filter(col("vec_id") % 7 === 5)

    val base = tmpDir("st0c")
    val indexRoot = s"$base/idx"
    val corpusRoot = s"$base/corpus"
    Snapshots.commit(corpus, corpusRoot)
    Dedup.commitVecIndex(corpus, indexRoot)

    // batch-wise expected keepers from the (spec-trusted) index-read
    // path at the PINNED geometry — st0c's job is the store plumbing,
    // verdict-vs-direct equivalence is q6d's spec
    def keepIds(batch: org.apache.spark.sql.DataFrame,
        against: org.apache.spark.sql.DataFrame): Set[Long] =
      Dedup.ingestAgainstVecIndex(batch, against, indexRoot)
        .filter(col("keep")).select("vec_id").collect().map(_.getLong(0)).toSet
    val expK1 = keepIds(b1, corpus)

    val input = MemoryStream[(Long, Seq[Double])]
    val q = EventStreams.streamVecDedupIngest(
      input.toDF().toDF("vec_id", "embedding"), indexRoot, corpusRoot, tmpDir("st0c-ckpt"))
    try {
      input.addData(b1.collect().map(r =>
        (r.getAs[Long]("vec_id"), r.getSeq[Double](1))).toSeq: _*)
      q.processAllAvailable()
      // expected keepers for batch 2 must be computed against the
      // index AS OF after batch 1's delta — read it now
      val corpus2 = corpus.unionByName(b1.filter(col("vec_id").isin(expK1.toSeq: _*)))
      val expK2 = keepIds(b2, corpus2)
      input.addData(b2.collect().map(r =>
        (r.getAs[Long]("vec_id"), r.getSeq[Double](1))).toSeq: _*)
      q.processAllAvailable()

      // corpus store holds corpus ∪ keepers(b1) ∪ keepers(b2 | corpus+k1):
      // batch 2 was screened against batch 1's keepers THROUGH the store
      val expected = corpus.select("vec_id").collect().map(_.getLong(0)).toSet ++ expK1 ++ expK2
      val got = Snapshots.latest(spark, corpusRoot, Seq("vec_id"))
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(got === expected)
    } finally q.stop()
    // one index delta per non-empty micro-batch on top of the build
    assert(Snapshots.latestVersion(spark, indexRoot) === 3L)
  }

  test("st0d: streaming curation ingest — batch-local qa0 stage, cross-batch screen through the band index") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.dedup.Dedup
    import graft.operators.Curate
    import graft.sources.Snapshots

    val docs = Tables.documents(spark, sf).select("doc_id", "text", "source")
    val corpus = docs.filter(col("doc_id") % 7 =!= 3 && col("doc_id") % 7 =!= 5)
    val b1 = docs.filter(col("doc_id") % 7 === 3)
    val b2 = docs.filter(col("doc_id") % 7 === 5)

    // the stores hold the CURATED corpus: same schema the sink commits
    val curatedSeed = Curate.curated(corpus).localCheckpoint(true)
    val base = tmpDir("st0d")
    val indexRoot = s"$base/idx"
    val corpusRoot = s"$base/corpus"
    Snapshots.commit(curatedSeed, corpusRoot)
    Dedup.commitBandIndex(curatedSeed, indexRoot)

    // the curation stage must actually bite, or the test is st0b again
    val c1 = Curate.curated(b1).localCheckpoint(true)
    assert(c1.count() < b1.count(), "batch 1 survives curation untouched — weak fixture")

    // batch-wise expected keepers from the spec-trusted direct pipeline
    // over the CURATED batches
    def keepIds(batch: org.apache.spark.sql.DataFrame,
        against: org.apache.spark.sql.DataFrame): Set[Long] =
      Dedup.incrementalNearDups(batch, against)
        .filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
    val expK1 = keepIds(c1, curatedSeed)
    val corpus2 = curatedSeed.unionByName(c1.filter(col("doc_id").isin(expK1.toSeq: _*)))
    val expK2 = keepIds(Curate.curated(b2), corpus2)

    val input = MemoryStream[(Long, String, String)]
    val q = EventStreams.streamCurateIngest(
      input.toDF().toDF("doc_id", "text", "source"), indexRoot, corpusRoot, tmpDir("st0d-ckpt"))
    try {
      input.addData(b1.collect().map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[String]("text"), r.getAs[String]("source"))).toSeq: _*)
      q.processAllAvailable()
      input.addData(b2.collect().map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[String]("text"), r.getAs[String]("source"))).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val stored = Snapshots.latest(spark, corpusRoot, Seq("doc_id")).localCheckpoint(true)
    val expected = curatedSeed.select("doc_id").collect().map(_.getLong(0)).toSet ++ expK1 ++ expK2
    val got = stored.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === expected)
    // every stored row carries its curation verdicts: gate passed,
    // language matched, split tagged
    assert(stored.filter(col("quality") < 0.12 || col("pred_lang") =!= "en" ||
      !col("split").isin("train", "val", "test")).isEmpty,
      "a stored row escaped the curation gate")
  }

  test("st07: maintained aggregate tracks a streamed delta chain bit-identically") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.sources.Snapshots
    import graft.operators.Warehouse

    val root = tmpDir("st07-store") + "/t"
    Snapshots.commit(
      Seq((1L, "O", 10.0), (2L, "O", 20.0), (3L, "F", 30.0), (4L, "F", 40.0))
        .toDF("k", "status", "price"),
      root)

    val input = MemoryStream[StoreUpd]
    val q = Snapshots.streamInto(input.toDF(), root, tmpDir("st07-ckpt"))
    try {
      input.addData(StoreUpd(2L, "F", 25.0, _deleted = false)) // amend: moves groups
      q.processAllAvailable()
      input.addData(
        StoreUpd(5L, "P", 50.0, _deleted = false), // insert new group
        StoreUpd(3L, "X", 0.0, _deleted = true))   // retract
      q.processAllAvailable()
      input.addData(StoreUpd(4L, "F", 44.0, _deleted = false)) // amend in place
      q.processAllAvailable()
    } finally q.stop()

    val topV = Snapshots.latestVersion(spark, root)
    assert(topV === 4L)

    // fold the maintenance step over every streamed batch — after each
    // version the maintained state must equal the full recompute of
    // asOf(v), bit-for-bit (decimal partials, double presentation)
    var state = Warehouse.aggState(Snapshots.read(spark, root, 1L), "status", "price")
    (2L to topV).foreach { v =>
      state = Warehouse.applyBatchToAgg(
        state,
        Snapshots.asOf(spark, root, v - 1, Seq("k")),
        Snapshots.read(spark, root, v),
        Seq("k"), "status", "price")
      val maintained = Warehouse.presentAgg(state, "status", "n", "sum_price")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      val recomputed = Warehouse.presentAgg(
        Warehouse.aggState(Snapshots.asOf(spark, root, v, Seq("k")), "status", "price"),
        "status", "n", "sum_price")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(maintained === recomputed, s"maintained state diverged at v$v")
    }
  }
  test("st10: maintained JOIN view tracks a streamed delta chain; dim amendments cost nothing") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.sources.Snapshots
    import graft.operators.Warehouse

    val root = tmpDir("st10-store") + "/t"
    Snapshots.commit(
      Seq((1L, 10L, 10.0), (2L, 10L, 20.0), (3L, 20L, 30.0), (4L, 30L, 40.0))
        .toDF("k", "fk", "price"), root)
    val input = MemoryStream[JoinUpd]
    val q = Snapshots.streamInto(input.toDF(), root, tmpDir("st10-ckpt"))
    try {
      // the amendment MOVES k=2 between join keys (fk 10 → 20): the
      // signed partials must subtract the before-image from alpha's
      // custkey partial and add the after-image to beta's
      input.addData(JoinUpd(2L, 20L, 25.0, _deleted = false))
      q.processAllAvailable()
      input.addData(
        JoinUpd(5L, 30L, 50.0, _deleted = false),
        JoinUpd(3L, 20L, 0.0, _deleted = true))
      q.processAllAvailable()
    } finally q.stop()
    assert(Snapshots.latestVersion(spark, root) === 3L)
    // the dimension is AMENDED mid-chain (a rename at v3) without any
    // state work — presentAggVia picks it up because the state lives
    // at the fact's join-key grain, never at the dim attribute's
    val dims = Map(
      2L -> Seq((10L, "alpha"), (20L, "beta"), (30L, "gamma")),
      3L -> Seq((10L, "alpha"), (20L, "beta-renamed"), (30L, "gamma")))
    var state = Warehouse.aggState(Snapshots.read(spark, root, 1L), "fk", "price")
    (2L to 3L).foreach { v =>
      state = Warehouse.applyBatchToAgg(
        state,
        Snapshots.asOf(spark, root, v - 1, Seq("k")),
        Snapshots.read(spark, root, v),
        Seq("k"), "fk", "price")
      val dim = dims(v).toDF("dk", "name")
      def present(st: org.apache.spark.sql.DataFrame) =
        Warehouse.presentAggVia(st, dim, "dk", col("name"), "g", "n", "s")
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      val maintained = present(state)
      val recomputed = present(
        Warehouse.aggState(Snapshots.asOf(spark, root, v, Seq("k")), "fk", "price"))
      assert(maintained === recomputed, s"maintained join view diverged at v$v")
      assert(maintained.nonEmpty)
    }
  }

  test("st08: streaming scrub + quality gate redacts PII and flags short docs per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[(Long, String)]
    val q = EventStreams.scrubbedDocs(input.toDF().toDF("doc_id", "text"), minTokens = 4)
      .writeStream
      .format("memory")
      .queryName("st08_out")
      .outputMode("append")
      .start()
    try {
      input.addData(
        (1L, "reach me at alice@example.com for the full data set details"),
        (2L, "too short"))
      q.processAllAvailable()
      input.addData((3L, "server 10.0.0.7 logged a perfectly ordinary clean event today"))
      // null text: under ANSI size(null) is NULL — without the
      // coalesce the keep flag went NULL and the row was invisible to
      // BOTH the keep filter and the reject-side audit
      input.addData((4L, null))
      q.processAllAvailable()

      val out = spark.table("st08_out").orderBy("doc_id").collect()
      assert(out.length === 4)
      assert(out(3).getAs[Long]("n_tokens") === 0L)
      assert(out(3).getAs[Boolean]("keep") === false,
        "null-text doc must land keep=false, not keep=NULL")
      assert(out(0).getAs[Long]("n_redactions") === 1L)
      assert(out(0).getAs[String]("text").contains("[REDACTED]"))
      assert(!out(0).getAs[String]("text").contains("@"))
      assert(out(0).getAs[Boolean]("keep"))
      assert(out(1).getAs[Long]("n_redactions") === 0L)
      assert(!out(1).getAs[Boolean]("keep"), "2-token doc must fail the 4-token gate")
      assert(out(2).getAs[Long]("n_redactions") === 1L)
      assert(!out(2).getAs[String]("text").contains("10.0.0.7"))
      assert(out(2).getAs[Boolean]("keep"))
    } finally q.stop()
  }
}

/** st06 stream element: an upsert (or tombstone) for the snapshot store. */
case class StoreUpd(k: Long, status: String, price: Double, _deleted: Boolean)
case class JoinUpd(k: Long, fk: Long, price: Double, _deleted: Boolean)
