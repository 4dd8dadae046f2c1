package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.PropertyGraph
import graft.streaming.EventPipeline

/** Structured Streaming specs: watermarked windows, stateful groups, and
  * the foreachBatch incremental graph merge (idempotent under replay). */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("windowedCounts aggregates tumbling windows with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventPipeline.windowedCounts(events, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("wc").outputMode(OutputMode.Complete()).start()
    mem.addData((ts("10:05"), "click", 1.0), (ts("10:45"), "click", 2.0), (ts("11:10"), "view", 5.0))
    q.processAllAvailable()
    val rows = spark.table("wc")
      .select(col("ws").cast("string"), col("event_type"), col("cnt"), col("sum_value"))
      .as[(String, String, Long, Double)].collect().toSet
    q.stop()
    assert(rows == Set(
      ("2024-01-01 10:00:00", "click", 2L, 3.0),
      ("2024-01-01 11:00:00", "view", 1L, 5.0)))
  }

  test("userStats keeps running per-user state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventPipeline.UserEvent]
    val q = EventPipeline.userStats(mem.toDS())
      .writeStream.format("memory").queryName("us").outputMode(OutputMode.Update()).start()
    mem.addData(EventPipeline.UserEvent(1L, "click", 3.0))
    q.processAllAvailable()
    mem.addData(EventPipeline.UserEvent(1L, "view", 7.0), EventPipeline.UserEvent(2L, "click", 1.0))
    q.processAllAvailable()
    val last = spark.table("us").as[EventPipeline.UserStat].collect()
      .groupBy(_.user_id).map { case (k, v) => k -> v.maxBy(_.n_events) }
    q.stop()
    assert(last(1L) == EventPipeline.UserStat(1L, 2L, 7.0))
    assert(last(2L) == EventPipeline.UserStat(2L, 1L, 1.0))
  }

  test("runningTotals (transformWithState): ValueState survives across micro-batches under RocksDB") {
    implicit val sqlCtx = spark.sqlContext
    GateSupport.withConfs(spark,
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val mem = MemoryStream[EventPipeline.TwsEvent]
      val q = EventPipeline.runningTotals(mem.toDS()).toDF()
        .writeStream.format("memory").queryName("tws")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("tws-ck").toString)
        .outputMode(OutputMode.Update()).start()
      // stop in finally: a failure mid-test must not leave a live RocksDB
      // stateful query (native resources + the sink name) on the shared
      // session for the rest of the suite
      val rows = try {
        mem.addData(EventPipeline.TwsEvent(1L, 100L), EventPipeline.TwsEvent(1L, 50L),
          EventPipeline.TwsEvent(2L, 10L))
        q.processAllAvailable()
        mem.addData(EventPipeline.TwsEvent(1L, 25L), EventPipeline.TwsEvent(3L, 7L))
        q.processAllAvailable()
        spark.table("tws").as[EventPipeline.TwsTotal].collect()
      } finally q.stop()
      // one emit per user per micro-batch it appears in
      assert(rows.count(_.user_id == 1L) == 2)
      // batch-1 emit for user 1 is the prefix total (state, not a re-agg)
      assert(rows.find(r => r.user_id == 1L && r.cnt == 2L)
        .exists(_.sum_cents == 150L))
      // latest emit per user (max cnt) equals the full batch aggregate
      val last = rows.groupBy(_.user_id).map { case (k, v) => k -> v.maxBy(_.cnt) }
      assert(last(1L) == EventPipeline.TwsTotal(1L, 3L, 175L))
      assert(last(2L) == EventPipeline.TwsTotal(2L, 1L, 10L))
      assert(last(3L) == EventPipeline.TwsTotal(3L, 1L, 7L))
    }
  }

  test("sessionizeTws (transformWithState): gap split, timer flush on watermark alone, late-merge parity") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    GateSupport.withConfs(spark,
      key -> "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val mem = MemoryStream[EventPipeline.SessionEvent]
      val q = EventPipeline.sessionizeTws(mem.toDS(),
          gapMs = 10 * 60 * 1000, watermark = "0 seconds").toDF()
        .writeStream.format("memory").queryName("tws_sess")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("tws-sess-ck").toString)
        .outputMode(OutputMode.Append()).start()
      val sessions = try {
        mem.addData(
          EventPipeline.SessionEvent(1L, ts("10:00")),
          EventPipeline.SessionEvent(1L, ts("10:05")),
          EventPipeline.SessionEvent(1L, ts("10:35")))
        q.processAllAvailable()
        // watermark advances on OTHER users' data only — user 1's tail
        // session must flush via its registered TIMER, no new rows for it
        mem.addData(EventPipeline.SessionEvent(2L, ts("13:00")))
        q.processAllAvailable()
        mem.addData(EventPipeline.SessionEvent(2L, ts("16:00")))
        q.processAllAvailable()
        spark.table("tws_sess")
          .select(col("user_id"), col("start").cast("string"), col("n_events"))
          .as[(Long, String, Long)].collect().toSet
      } finally q.stop()
      assert(sessions.contains((1L, "2024-01-01 10:00:00", 2L))) // closed by gap
      assert(sessions.contains((1L, "2024-01-01 10:35:00", 1L))) // closed by timer
      // same semantics as the flatMapGroupsWithState path on this input
      assert(sessions.count(_._1 == 1L) == 2)
    }
  }

  test("distinctUsers (MapState): recurring users across batches never re-count; new ones do") {
    implicit val sqlCtx = spark.sqlContext
    GateSupport.withConfs(spark,
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val mem = MemoryStream[EventPipeline.TypedEvent]
      val q = EventPipeline.distinctUsers(mem.toDS()).toDF()
        .writeStream.format("memory").queryName("tws_dist")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("tws-dist-ck").toString)
        .outputMode(OutputMode.Update()).start()
      val rows = try {
        mem.addData(EventPipeline.TypedEvent("click", 1L),
          EventPipeline.TypedEvent("click", 1L), // in-batch dup
          EventPipeline.TypedEvent("click", 2L),
          EventPipeline.TypedEvent("view", 1L))
        q.processAllAvailable()
        // user 1 recurs across the batch boundary (the MapState probe is
        // what keeps it from re-counting); user 3 is genuinely new
        mem.addData(EventPipeline.TypedEvent("click", 1L),
          EventPipeline.TypedEvent("click", 3L))
        q.processAllAvailable()
        spark.table("tws_dist").as[EventPipeline.TypeDistinct].collect()
      } finally q.stop()
      val last = rows.groupBy(_.event_type)
        .map { case (k, v) => k -> v.map(_.n_users).max }
      assert(last == Map("click" -> 3L, "view" -> 1L))
      // batch-1 emit for click was the prefix distinct (2), not 3
      assert(rows.exists(r => r.event_type == "click" && r.n_users == 2L))
    }
  }

  test("recentK (ListState): out-of-order arrivals trim safely; state holds k, count keeps counting") {
    implicit val sqlCtx = spark.sqlContext
    GateSupport.withConfs(spark,
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val mem = MemoryStream[EventPipeline.SeqEvent]
      val q = EventPipeline.recentK(mem.toDS(), k = 3).toDF()
        .writeStream.format("memory").queryName("tws_lastk")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("tws-lastk-ck").toString)
        .outputMode(OutputMode.Update()).start()
      def ev(us: Long, id: Long, t: String) = EventPipeline.SeqEvent(1L, us, id, t)
      val rows = try {
        // batch 1: times 10,40,50,60 — trim drops the 10
        mem.addData(ev(40, 4, "b"), ev(10, 1, "a"), ev(60, 6, "d"), ev(50, 5, "c"))
        q.processAllAvailable()
        // batch 2: a LATE event at t=45 (older than the in-state 50,60 but
        // newer than the trimmed 40) plus a new head at t=70 — the final
        // window must be 70,60,50 regardless of arrival order, and the
        // late 45 must not resurrect anything
        mem.addData(ev(45, 7, "late"), ev(70, 8, "e"))
        q.processAllAvailable()
        spark.table("tws_lastk").as[EventPipeline.UserRecent].collect()
      } finally q.stop()
      assert(rows.map(_.cnt).toSet == Set(4L, 6L)) // one emit per batch, counts cumulative
      assert(rows.maxBy(_.cnt).recent == "e,d,c")  // newest-first top-3 by event time
      assert(rows.minBy(_.cnt).recent == "d,c,b")  // batch-1 window was exact too
    }
  }

  test("sessionizeTws out-of-order: a late in-gap event BRIDGES two open sessions and moves the timer") {
    implicit val sqlCtx = spark.sqlContext
    GateSupport.withConfs(spark,
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val mem = MemoryStream[EventPipeline.SessionEvent]
      val q = EventPipeline.sessionizeTws(mem.toDS(),
          gapMs = 20 * 60 * 1000, watermark = "2 hours").toDF()
        .writeStream.format("memory").queryName("tws_ooo")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("tws-ooo-ck").toString)
        .outputMode(OutputMode.Append()).start()
      val sessions = try {
        // two open sessions 35min apart (gap is 20min)
        mem.addData(
          EventPipeline.SessionEvent(1L, ts("10:00")),
          EventPipeline.SessionEvent(1L, ts("10:05")),
          EventPipeline.SessionEvent(1L, ts("10:40")),
          EventPipeline.SessionEvent(1L, ts("10:45")))
        q.processAllAvailable()
        // 10:22 arrives LATE (admissible under the 2h watermark): it is
        // within gap of BOTH open sessions -> they bridge into one, and
        // the user's earliest possible close moves, so the stale timer
        // must be deleted and re-armed (the settle re-arm path)
        mem.addData(EventPipeline.SessionEvent(1L, ts("10:22")))
        q.processAllAvailable()
        // flush via watermark advance on another user only
        mem.addData(EventPipeline.SessionEvent(2L, ts("20:00")))
        q.processAllAvailable()
        mem.addData(EventPipeline.SessionEvent(2L, ts("23:00")))
        q.processAllAvailable()
        spark.table("tws_ooo")
          .select(col("user_id"), col("start").cast("string"),
            col("end").cast("string"), col("n_events"))
          .as[(Long, String, String, Long)].collect().toSet
      } finally q.stop()
      // one bridged session — NOT two, and NOT a mis-merged late orphan
      assert(sessions.filter(_._1 == 1L) ==
        Set((1L, "2024-01-01 10:00:00", "2024-01-01 10:45:00", 5L)))
    }
  }

  test("sessionizeTws keeps a late out-of-gap predecessor as its own session (old-API twin)") {
    implicit val sqlCtx = spark.sqlContext
    GateSupport.withConfs(spark,
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val mem = MemoryStream[EventPipeline.SessionEvent]
      val q = EventPipeline.sessionizeTws(mem.toDS(),
          gapMs = 30 * 60 * 1000, watermark = "2 hours").toDF()
        .writeStream.format("memory").queryName("tws_oog")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("tws-oog-ck").toString)
        .outputMode(OutputMode.Append()).start()
      val u1 = try {
        mem.addData(EventPipeline.SessionEvent(1L, ts("11:00")))
        q.processAllAvailable()
        // 09:30 arrives late but 90min of silence separates it from
        // 11:00 — it must open its OWN (earlier) session, not merge
        mem.addData(EventPipeline.SessionEvent(1L, ts("09:30")))
        q.processAllAvailable()
        mem.addData(EventPipeline.SessionEvent(2L, ts("20:00")))
        q.processAllAvailable()
        mem.addData(EventPipeline.SessionEvent(2L, ts("23:00")))
        q.processAllAvailable()
        spark.table("tws_oog")
          .select(col("user_id"), col("start").cast("string"), col("n_events"))
          .as[(Long, String, Long)].collect().toSet.filter(_._1 == 1L)
      } finally q.stop()
      assert(u1 == Set(
        (1L, "2024-01-01 09:30:00", 1L),
        (1L, "2024-01-01 11:00:00", 1L)))
    }
  }

  test("sessionize splits on gaps and closes the tail session via watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventPipeline.SessionEvent]
    val q = EventPipeline.sessionize(mem.toDS(), gapMs = 10 * 60 * 1000, watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess").outputMode(OutputMode.Append()).start()
    // two events 5min apart (one session), then 30min silence, then one more
    mem.addData(
      EventPipeline.SessionEvent(1L, ts("10:00")),
      EventPipeline.SessionEvent(1L, ts("10:05")),
      EventPipeline.SessionEvent(1L, ts("10:35")))
    q.processAllAvailable()
    // watermark far past the open session -> timeout emits it
    mem.addData(EventPipeline.SessionEvent(2L, ts("13:00")))
    q.processAllAvailable()
    mem.addData(EventPipeline.SessionEvent(2L, ts("16:00")))
    q.processAllAvailable()
    val sessions = spark.table("sess")
      .select(col("user_id"), col("start").cast("string"), col("n_events"))
      .as[(Long, String, Long)].collect().toSet
    q.stop()
    assert(sessions.contains((1L, "2024-01-01 10:00:00", 2L))) // closed by gap
    assert(sessions.contains((1L, "2024-01-01 10:35:00", 1L))) // closed by timeout
  }

  test("watermark boundary: an event at ts == wm is late-filtered; the session emits whole") {
    // Pins the exact boundary semantics behind the strict close predicate
    // (end+gap < wm): Spark's late-row filter drops an input row whose
    // ts == watermark BEFORE it reaches the state function, so no
    // admissible event can ever have ts <= wm — a session with
    // end+gap == wm is unextendable either way, and the strict predicate
    // is a free safety margin, not a behavior change. Observable contract:
    // the session is never split, never loses its identity, and emits
    // exactly once via timeout.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventPipeline.SessionEvent]
    val q = EventPipeline.sessionize(mem.toDS(), gapMs = 10 * 60 * 1000, watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess_bound").outputMode(OutputMode.Append()).start()
    mem.addData(EventPipeline.SessionEvent(1L, ts("10:00")))
    q.processAllAvailable()
    // advance the watermark to EXACTLY end+gap via another user...
    mem.addData(EventPipeline.SessionEvent(2L, ts("10:10")))
    q.processAllAvailable()
    // ...the boundary event ts == wm == 10:10 is dropped by the late
    // filter (it would merge if admitted; it is not admitted)...
    mem.addData(EventPipeline.SessionEvent(1L, ts("10:10")))
    q.processAllAvailable()
    // ...push the watermark far past everything so timeouts flush.
    mem.addData(EventPipeline.SessionEvent(3L, ts("13:00")))
    q.processAllAvailable()
    mem.addData(EventPipeline.SessionEvent(3L, ts("16:00")))
    q.processAllAvailable()
    val sessions = spark.table("sess_bound")
      .filter(col("user_id") === 1L)
      .select(col("start").cast("string"), col("end").cast("string"), col("n_events"))
      .as[(String, String, Long)].collect().toSet
    q.stop()
    // One whole session; the boundary event neither splits it nor opens a
    // phantom second session.
    assert(sessions == Set(("2024-01-01 10:00:00", "2024-01-01 10:00:00", 1L)),
      s"unexpected boundary behavior: $sessions")
  }

  test("sessionize lowers session start on a late in-gap event (out-of-order input)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventPipeline.SessionEvent]
    val q = EventPipeline.sessionize(mem.toDS(), gapMs = 10 * 60 * 1000, watermark = "1 hour")
      .writeStream.format("memory").queryName("sess_ooo").outputMode(OutputMode.Append()).start()
    // 10:05 arrives first; the 10:00 event lands late but within the
    // watermark and inside the gap -> one session starting at 10:00.
    mem.addData(EventPipeline.SessionEvent(1L, ts("10:05")))
    q.processAllAvailable()
    mem.addData(EventPipeline.SessionEvent(1L, ts("10:00")))
    q.processAllAvailable()
    // push the watermark far past the session so the timeout emits it
    mem.addData(EventPipeline.SessionEvent(2L, ts("16:00")))
    q.processAllAvailable()
    mem.addData(EventPipeline.SessionEvent(2L, ts("19:00")))
    q.processAllAvailable()
    val sessions = spark.table("sess_ooo")
      .select(col("user_id"), col("start").cast("string"), col("end").cast("string"),
        col("n_events"))
      .as[(Long, String, String, Long)].collect().toSet
    q.stop()
    assert(sessions.contains((1L, "2024-01-01 10:00:00", "2024-01-01 10:05:00", 2L)))
  }

  test("sessionize keeps a late out-of-gap predecessor as its own session") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventPipeline.SessionEvent]
    val q = EventPipeline.sessionize(mem.toDS(), gapMs = 30 * 60 * 1000, watermark = "2 hours")
      .writeStream.format("memory").queryName("sess_oog").outputMode(OutputMode.Append()).start()
    mem.addData(EventPipeline.SessionEvent(1L, ts("11:00")))
    q.processAllAvailable()
    // 09:30 arrives late (within the 2h watermark) but 90min of silence
    // separates it from 11:00 — it must NOT merge into that session.
    mem.addData(EventPipeline.SessionEvent(1L, ts("09:30")))
    q.processAllAvailable()
    // advance the watermark far past both sessions to flush them
    mem.addData(EventPipeline.SessionEvent(2L, ts("20:00")))
    q.processAllAvailable()
    mem.addData(EventPipeline.SessionEvent(2L, ts("23:00")))
    q.processAllAvailable()
    val u1 = spark.table("sess_oog")
      .select(col("user_id"), col("start").cast("string"), col("n_events"))
      .as[(Long, String, Long)].collect().toSet.filter(_._1 == 1L)
    q.stop()
    assert(u1 == Set(
      (1L, "2024-01-01 09:30:00", 1L),
      (1L, "2024-01-01 11:00:00", 1L)))
  }

  test("clickAttribution: stream-stream interval join matches within the window only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp, Double)]
    val q = EventPipeline.clickAttribution(
        clicks.toDF().toDF("user_id", "ts"),
        buys.toDF().toDF("user_id", "ts", "value"),
        watermark = "1 hour", joinWindow = "30 minutes")
      .writeStream.format("memory").queryName("attr").outputMode(OutputMode.Append()).start()
    clicks.addData((1L, ts("10:00")), (2L, ts("10:00")))
    buys.addData(
      (1L, ts("10:10"), 9.5),  // in window -> match
      (2L, ts("11:59"), 7.0),  // past 30min -> no match
      (3L, ts("10:05"), 1.0))  // no click -> no match
    q.processAllAvailable()
    val rows = spark.table("attr")
      .select(col("user_id"), col("click_ts").cast("string"),
        col("purchase_ts").cast("string"), col("value"))
      .as[(Long, String, String, Double)].collect().toSet
    q.stop()
    assert(rows == Set((1L, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 9.5)))
  }

  test("clickAttribution left_outer: unconverted clicks emit with NULLs after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp, Double)]
    val q = EventPipeline.clickAttribution(
        clicks.toDF().toDF("user_id", "ts"),
        buys.toDF().toDF("user_id", "ts", "value"),
        watermark = "1 hour", joinWindow = "30 minutes", joinType = "left_outer")
      .writeStream.format("memory").queryName("attr_lo").outputMode(OutputMode.Append()).start()
    clicks.addData((1L, ts("10:00")), (2L, ts("10:00")))
    buys.addData((1L, ts("10:10"), 9.5)) // user 1 converts; user 2 never does
    q.processAllAvailable()
    // advance both watermarks far past 10:30 so user 2's click provably
    // cannot match anymore — only then may the NULL row emit
    clicks.addData((9L, ts("14:00")))
    buys.addData((9L, ts("14:00"), 0.0))
    q.processAllAvailable()
    // state eviction emits on the batch AFTER the watermark bump — nudge
    clicks.addData((10L, ts("15:00")))
    buys.addData((10L, ts("15:00"), 0.0))
    q.processAllAvailable()
    val rows = spark.table("attr_lo")
      .select(col("user_id"), col("click_ts").cast("string"),
        col("purchase_ts").cast("string"), col("value"))
      .as[(Long, String, String, Option[Double])].collect().toSet
    q.stop()
    assert(rows.contains((1L, "2024-01-01 10:00:00", "2024-01-01 10:10:00", Some(9.5))))
    assert(rows.contains((2L, "2024-01-01 10:00:00", null, None)),
      s"unmatched click should emit with NULL purchase after the watermark: $rows")
  }

  test("clickAttribution full_outer: orphan purchases ALSO emit, keeping their user id") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp, Double)]
    val q = EventPipeline.clickAttribution(
        clicks.toDF().toDF("user_id", "ts"),
        buys.toDF().toDF("user_id", "ts", "value"),
        watermark = "1 hour", joinWindow = "30 minutes", joinType = "full_outer")
      .writeStream.format("memory").queryName("attr_fo").outputMode(OutputMode.Append()).start()
    clicks.addData((1L, ts("10:00")), (2L, ts("10:00")))
    // user 1 converts; user 2 never does; user 3's purchase has NO click
    buys.addData((1L, ts("10:10"), 9.5), (3L, ts("10:05"), 4.5))
    q.processAllAvailable()
    // double watermark advance on BOTH sides (eviction emits on the
    // batch after the bump), same discipline as the left_outer test
    Seq(ts("14:00"), ts("15:00")).zipWithIndex.foreach { case (t, i) =>
      clicks.addData((9L + i, t)); buys.addData((9L + i, t, 0.0))
      q.processAllAvailable()
    }
    val rows = spark.table("attr_fo")
      .select(col("user_id"), col("click_ts").cast("string"),
        col("purchase_ts").cast("string"), col("value"))
      .as[(Long, String, String, Option[Double])].collect().toSet
    q.stop()
    assert(rows.contains((1L, "2024-01-01 10:00:00", "2024-01-01 10:10:00", Some(9.5))))
    assert(rows.contains((2L, "2024-01-01 10:00:00", null, None)),
      s"unmatched click should emit with NULL purchase: $rows")
    assert(rows.contains((3L, null, "2024-01-01 10:05:00", Some(4.5))),
      s"orphan purchase should emit with NULL click and ITS user id: $rows")
  }

  test("dedupStream drops replayed event ids with watermark-bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = EventPipeline.dedupStream(mem.toDF().toDF("event_id", "ts", "event_type"))
      .writeStream.format("memory").queryName("dedup").outputMode(OutputMode.Append()).start()
    mem.addData((1L, ts("10:00"), "click"), (2L, ts("10:01"), "view"))
    q.processAllAvailable()
    mem.addData((1L, ts("10:00"), "click"), (3L, ts("10:02"), "click")) // replay of 1
    q.processAllAvailable()
    val ids = spark.table("dedup").select(col("event_id")).as[Long].collect().toSeq
    q.stop()
    assert(ids.sorted == Seq(1L, 2L, 3L))
  }

  test("training-data ingest as a stream: gopher gate + watermark dedup match the batch twin") {
    // The LLM-pipeline quality gate is a pure codegen'd projection, so it
    // applies unchanged to a stream; replayed doc ids are dropped by the
    // watermark-bounded dedup. Streaming output must equal the batch
    // composition of the same operators on the same (deduped) corpus.
    implicit val sqlCtx = spark.sqlContext
    val good = Seq.tabulate(60)(i => s"alpha$i").mkString(" ")
    val mem = MemoryStream[(Long, Timestamp, String)]
    val docs = mem.toDF().toDF("doc_id", "ts", "text")
    val gated = operators.TextAnalysis.gopherQuality(
        docs.withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark("doc_id"), "doc_id", "text")
      .filter(col("passes")).select("doc_id", "n_words")
    val q = gated.writeStream.format("memory").queryName("ingest")
      .outputMode(OutputMode.Append()).start()
    mem.addData((1L, ts("10:00"), good), (2L, ts("10:01"), "too short"))
    q.processAllAvailable()
    mem.addData((1L, ts("10:02"), good), (3L, ts("10:03"), good)) // 1 is a replay
    q.processAllAvailable()
    val streamed = spark.table("ingest").as[(Long, Long)].collect().toSet
    q.stop()
    val batch = operators.TextAnalysis.gopherQuality(
        Seq((1L, good), (2L, "too short"), (3L, good)).toDF("doc_id", "text"),
        "doc_id", "text")
      .filter(col("passes")).select("doc_id", "n_words")
      .as[(Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.map(_._1) == Set(1L, 3L))
  }

  test("chunkWindows applies unchanged to a stream and equals the batch twin") {
    // Chunking is a stateless projection+explode, so the same operator
    // runs on readStream input with no watermark or state — the
    // encoder-feeding path of a streaming ingest pipeline.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val chunked = operators.TextAnalysis.chunkWindows(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", window = 4, overlap = 2)
    val q = chunked.writeStream.format("memory").queryName("chunks")
      .outputMode(OutputMode.Append()).start()
    val rows = Seq((1L, "a b c d e f"), (2L, "x y"), (3L, ""))
    mem.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.table("chunks").as[(Long, Long, Long, String)].collect().toSet
    q.stop()
    val batch = operators.TextAnalysis.chunkWindows(
        rows.toDF("doc_id", "text"), "doc_id", "text", window = 4, overlap = 2)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("foreachBatch quality gate: gopher + approx percentile cut equals the batch composition") {
    // percentileCut is a corpus-wide aggregate broadcast back over the
    // corpus — not expressible as an append streaming query — so the
    // composition runs under foreachBatch: each micro-batch is a plain
    // DataFrame and the WHOLE batch chain (gopher gate -> approx
    // percentile threshold -> keep flags) applies verbatim, threshold
    // scoped per micro-batch (the honest semantics for a rolling ingest
    // cut). Streamed output must equal the batch chain applied to the
    // same micro-batch slices.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.DataFrame
    def gate(df: DataFrame): DataFrame = {
      val passing = operators.TextAnalysis.gopherQuality(df, "doc_id", "text")
        .filter(col("passes"))
        .select(col("doc_id"), col("n_words").cast("double").as("v"))
      operators.Dedup.percentileCut(passing, "v", 0.3, exact = false)
        .select(col("doc_id"), col("v"), col("threshold"), col("kept"))
    }
    def doc(id: Long, n: Int) = (id, Seq.tabulate(n)(i => s"alpha$i").mkString(" "))
    val batch1 = Seq(doc(1L, 60), doc(2L, 80), doc(3L, 100), doc(4L, 120),
      doc(5L, 140), (6L, "too short"))
    val batch2 = Seq(doc(7L, 70), doc(8L, 90), doc(9L, 110), doc(10L, 130))
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double, Boolean)]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val out = gate(batch).as[(Long, Double, Double, Boolean)].collect()
        results.synchronized { results ++= out }
        ()
      }
      .start()
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    val expected = (gate(batch1.toDF("doc_id", "text"))
        .as[(Long, Double, Double, Boolean)].collect() ++
      gate(batch2.toDF("doc_id", "text"))
        .as[(Long, Double, Double, Boolean)].collect()).toSet
    assert(results.toSet == expected)
    // The cut did real work: the gopher gate dropped doc 6, and each
    // micro-batch's bottom-decile-ish doc (p=0.3 over 4-5 docs ->
    // the second-smallest value) flags its minimum doc kept = false.
    assert(!results.exists(_._1 == 6L))
    assert(results.filterNot(_._4).map(_._1).toSet == Set(1L, 7L))
  }

  test("crossSpans decontaminates a stream against a static probe, equals the batch twin") {
    // The corpus side of crossSpans is stateless map-side window hashing
    // joined to a probe that reduces to a static (hash, count) table — a
    // stream-static equi-join, so the SAME operator decontaminates a
    // live ingest feed with no watermark or state.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val probe = Seq((100L, "zz one two three zz")).toDF("doc_id", "text")
    val flagged = operators.Dedup.crossSpans(
      mem.toDF().toDF("doc_id", "text"), probe, "doc_id", "text", k = 3)
    val q = flagged.writeStream.format("memory").queryName("leaks")
      .outputMode(OutputMode.Append()).start()
    val rows = Seq((1L, "a b one two three p q r"), (2L, "clean doc here"))
    mem.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.table("leaks").as[(Long, Long, Long, Long)].collect().toSet
    q.stop()
    val batch = operators.Dedup.crossSpans(
        rows.toDF("doc_id", "text"), probe, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
    assert(streamed.map(_._1) == Set(1L)) // the clean doc emits nothing
  }

  test("streaming count-min sketch build equals the batch sketch cell-for-cell") {
    // The sketch's BUILD aggregation is algebraic (counts over the
    // Kirsch–Mitzenmacher cells), so Structured Streaming maintains it
    // incrementally — the live heavy-hitter monitor. Two micro-batches,
    // then the accumulated sketch must equal the batch build over the
    // concatenated input.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val cells = operators.Sketch.cmsCells(
      mem.toDF().withColumnRenamed("value", "word"), "word", depth = 4, width = 16)
    val q = cells.groupBy(col("r"), col("b")).agg(count(lit(1)).as("c"))
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode(OutputMode.Complete()).start()
    val batch1 = Seq("alpha", "beta", "alpha", "gamma", "alpha")
    val batch2 = Seq("beta", "beta", "delta", "alpha")
    mem.addData(batch1: _*); q.processAllAvailable()
    mem.addData(batch2: _*); q.processAllAvailable()
    val streamed = spark.table("cms_stream").as[(Int, Long, Long)].collect().toSet
    q.stop()
    val batch = operators.Sketch.cmsCells(
        (batch1 ++ batch2).toDF("word"), "word", depth = 4, width = 16)
      .groupBy(col("r"), col("b")).agg(count(lit(1)).as("c"))
      .as[(Int, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming sessionize equals the batch gaps-and-islands twin on real events") {
    implicit val sqlCtx = spark.sqlContext
    val gapMs = 30 * 60 * 1000L
    // ms precision on both sides: sessionize state runs on Timestamp.getTime
    // (epoch millis), so sub-ms digits would differ only in rendering
    val events = SparkEntry.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts", expr("timestamp_millis(unix_millis(ts))"))
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
    // batch twin: lag/gap islands, same 30min gap
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val batchSessions = events
      .withColumn("brk", when(
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w) > gapMs * 1000, 1L)
        .otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).cast("string").as("start"), max(col("ts")).cast("string").as("end"),
        count(lit(1)).as("n"))
      .select(col("user_id"), col("start"), col("end"), col("n"))
      .as[(Long, String, String, Long)].collect().toSet
    // streaming: one batch of all events, then a sentinel far in the future
    // to push the watermark past every session's close
    val rows = events.as[(Long, java.sql.Timestamp)].collect()
    val maxTs = rows.map(_._2.getTime).max
    val mem = MemoryStream[EventPipeline.SessionEvent]
    val q = EventPipeline.sessionize(mem.toDS(), gapMs, watermark = "1 hour")
      .writeStream.format("memory").queryName("sess_eq").outputMode(OutputMode.Append()).start()
    mem.addData(rows.map(r => EventPipeline.SessionEvent(r._1, r._2)).toIndexedSeq: _*)
    q.processAllAvailable()
    mem.addData(EventPipeline.SessionEvent(-1L, new Timestamp(maxTs + 10L * 86400 * 1000)))
    q.processAllAvailable()
    mem.addData(EventPipeline.SessionEvent(-1L, new Timestamp(maxTs + 20L * 86400 * 1000)))
    q.processAllAvailable()
    val streamSessions = spark.table("sess_eq")
      .filter(col("user_id") >= 0)
      .select(col("user_id"), col("start").cast("string"), col("end").cast("string"),
        col("n_events"))
      .as[(Long, String, String, Long)].collect().toSet
    q.stop()
    assert(streamSessions == batchSessions)
    assert(streamSessions.nonEmpty)
  }

  test("end-to-end: readStream over events parquet -> foreachBatch graph merge") {
    import org.apache.spark.sql.streaming.Trigger
    // Schema-on-read for streams is stricter than batch: take the schema the
    // batch reader actually produces on this runtime (LongType nanos on
    // Spark ≤4.0 with the legacy conf, TIMESTAMP_NTZ on 4.1+) so the file
    // stream source agrees with the footer on any Spark version.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet("/root/testdata/sf0.001/events.parquet").schema
    // the file stream source wants a directory; stage the table file into one
    val stageDir = java.nio.file.Files.createTempDirectory("graft-stream-in")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      stageDir.resolve("events.parquet"))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stageDir.toString)
    val empty = PropertyGraph(
      Seq.empty[(Long, String, String, Map[String, String])].toDF("id", "label", "key", "props"),
      Seq.empty[(Long, Long, String, Int)].toDF("src", "dst", "label", "weight"))
    val state = new EventPipeline.GraphState(empty)
    val q = stream.writeStream
      .foreachBatch(EventPipeline.graphMergeBatch(state, 1000000L, 2000000L) _)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // sf0.001 events: 1000 rows, 20 users, 5 event types
    val batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val nUsers = batch.select("user_id").distinct().count()
    val nTypes = batch.select("event_type").distinct().count()
    val nPairs = batch.select("user_id", "event_type").distinct().count()
    assert(state.graph.vertices.count() == nUsers + nTypes)
    assert(state.graph.edges.count() == nPairs)
  }

  test("cmMergeBatch: batched sketch equals one-shot sketch (CMS linearity)") {
    import graft.operators.Sketch
    val all = (1L to 300L).map(i => (i, s"key${i % 7}")).toDF("i", "k")
    val oneShot = Sketch.cmsCells(all.select("k"), "k", depth = 4, width = 16)
      .groupBy(col("r"), col("b")).agg(count(lit(1)).as("c"))
      .as[(Int, Long, Long)].collect().toSet
    val state = new EventPipeline.CmState(
      Seq.empty[(Int, Long, Long)].toDF("r", "b", "c"))
    val merge = EventPipeline.cmMergeBatch(state, "k", 4, 16) _
    // three uneven micro-batches covering the same multiset
    merge(all.filter(col("i") <= 100).select("k"), 0L)
    merge(all.filter(col("i") > 100 && col("i") <= 250).select("k"), 1L)
    merge(all.filter(col("i") > 250).select("k"), 2L)
    val streamed = state.cells.as[(Int, Long, Long)].collect().toSet
    assert(streamed == oneShot)
  }

  test("foreachBatch graph merge is incremental and replay-idempotent") {
    val empty = PropertyGraph(
      Seq.empty[(Long, String, String, Map[String, String])].toDF("id", "label", "key", "props"),
      Seq.empty[(Long, Long, String, Int)].toDF("src", "dst", "label", "weight"))
    val state = new EventPipeline.GraphState(empty)
    val batch1 = Seq((10L, "click"), (11L, "view")).toDF("user_id", "event_type")
    val merge = EventPipeline.graphMergeBatch(state, 1000L, 2000L) _
    merge(batch1, 0L)
    assert(state.graph.vertices.count() == 4) // 2 users + 2 types
    assert(state.graph.edges.count() == 2)
    merge(batch1, 1L) // replayed micro-batch: no duplicates
    assert(state.graph.vertices.count() == 4)
    assert(state.graph.edges.count() == 2)
    merge(Seq((10L, "view")).toDF("user_id", "event_type"), 2L)
    assert(state.graph.vertices.count() == 4)
    assert(state.graph.edges.count() == 3) // new user->type edge only
  }

  test("funnel: greedy earliest-entry depth with a whole-funnel window bound") {
    // user 1: view 10:00 -> click 10:10 -> purchase 10:30  => depth 3
    // user 2: view 10:00 -> click 10:20 -> purchase 11:30  => depth 2 (purchase outside 1h of view)
    // user 3: view 10:00 only                              => depth 1
    // user 4: click 09:50, view 10:00 (click BEFORE view)  => depth 1
    // user 5: purchase 10:00 only (never entered)          => absent
    // user 6: view 10:00, click 10:01, purchase 10:00:30   => depth 2 (purchase before click binds)
    val rows = Seq(
      (1L, "10:00", "view"), (1L, "10:10", "click"), (1L, "10:30", "purchase"),
      (2L, "10:00", "view"), (2L, "10:20", "click"), (2L, "11:30", "purchase"),
      (3L, "10:00", "view"),
      (4L, "09:50", "click"), (4L, "10:00", "view"),
      (5L, "10:00", "purchase"),
      (6L, "10:00", "view"), (6L, "10:01", "click"), (6L, "10:00:30", "purchase"))
      .map { case (u, t, e) =>
        val full = if (t.count(_ == ':') == 1) t + ":00" else t
        (u, java.sql.Timestamp.valueOf(s"2024-01-01 $full"), e)
      }
      .toDF("user_id", "ts", "event_type")
    val out = EventPipeline.funnel(rows, Seq("view", "click", "purchase"),
        windowMicros = 3600L * 1000000L)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(3L -> 1L, 2L -> 2L, 1L -> 2L),
      s"expected depth histogram {3 -> user 1; 2 -> users 2, 6; 1 -> users 3, 4} got $out")
  }

  test("retentionCohorts: first-seen cohorts, offset cells count active users") {
    val rows = Seq(
      (1L, "2024-01-01 09:00:00"), (1L, "2024-01-01 17:00:00"), // same day counts once
      (1L, "2024-01-02 10:00:00"),                              // returns day+1
      (2L, "2024-01-01 11:00:00"),                              // never returns
      (3L, "2024-01-02 12:00:00"), (3L, "2024-01-04 12:00:00")) // cohort 01-02, back at +2
      .map { case (u, t) => (u, java.sql.Timestamp.valueOf(t)) }
      .toDF("user_id", "ts")
    val out = EventPipeline.retentionCohorts(rows)
      .select(col("cohort").cast("string"), col("offset"), col("n_users"))
      .as[(String, Int, Long)].collect().toSet
    assert(out == Set(
      ("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L),
      ("2024-01-02", 0, 1L), ("2024-01-02", 2, 1L)))
  }

  test("retentionCohorts plan: one user exchange serves dedup, window, and cohort — two shuffles total") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.SparkPlan
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val nested = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => Seq.empty
      }
      p +: (nested ++ p.children).flatMap(nodes)
    }
    val rows = (1L to 200L).map(i =>
      (i % 40, java.sql.Timestamp.valueOf(f"2024-01-${i % 9 + 1}%02d 10:00:00")))
      .toDF("user_id", "ts")
    val df = EventPipeline.retentionCohorts(rows)
    df.collect()
    val shuffles = nodes(df.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size == 2,
      s"expected 2 exchanges (user_id + final histogram), got ${shuffles.size}")
  }

  test("transitionMatrix: per-user ordered bigrams with exact integer-micro probabilities") {
    // user 1: A -> B -> A   (bigrams A->B, B->A)
    // user 2: A -> B        (bigram  A->B)
    // user 3: C             (no bigram)
    // Totals: from A: A->B x2 (p=1.0); from B: B->A x1 (p=1.0).
    val rows = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "A"), (2L, 1L, "2024-01-01 10:05:00", "B"),
      (3L, 1L, "2024-01-01 10:10:00", "A"),
      (4L, 2L, "2024-01-01 11:00:00", "A"), (5L, 2L, "2024-01-01 11:30:00", "B"),
      (6L, 3L, "2024-01-01 12:00:00", "C"))
      .map { case (e, u, t, typ) => (e, u, java.sql.Timestamp.valueOf(t), typ) }
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = EventPipeline.transitionMatrix(rows)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out == Map(("A", "B") -> (2L, 1000000L), ("B", "A") -> (1L, 1000000L)))
    // split distribution: user 4 goes A -> C, so from-A mass divides 2:1
    val rows2 = rows.union(Seq(
      (7L, 4L, java.sql.Timestamp.valueOf("2024-01-01 13:00:00"), "A"),
      (8L, 4L, java.sql.Timestamp.valueOf("2024-01-01 13:05:00"), "C"))
      .toDF("event_id", "user_id", "ts", "event_type"))
    val out2 = EventPipeline.transitionMatrix(rows2)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out2(("A", "B")) == (2L, 666666L)) // floor(2e6 / 3)
    assert(out2(("A", "C")) == (1L, 333333L))
  }

  test("property: recentK equals the naive top-k reference under random batch splits") {
    // 5 seeded trials: random event logs, randomly PARTITIONED into 2-4
    // micro-batches (arrival order decoupled from event time — the
    // adversarial case for a trimmed window), final emit per user must
    // equal the naive sort-desc-take-k reference.
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(1515)
    GateSupport.withConfs(spark,
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      (1 to 5).foreach { trial =>
        val k = 1 + rnd.nextInt(4)
        val n = 20 + rnd.nextInt(80)
        val evs = (1L to n.toLong).map { i =>
          EventPipeline.SeqEvent(rnd.nextInt(6).toLong,
            rnd.nextInt(40).toLong, i, s"t${rnd.nextInt(5)}")
        }
        val nBatches = 2 + rnd.nextInt(3)
        val batches = rnd.shuffle(evs).grouped(
          math.max(1, (n + nBatches - 1) / nBatches)).toSeq
        val mem = MemoryStream[EventPipeline.SeqEvent]
        val name = s"tws_lastk_prop_$trial"
        val q = EventPipeline.recentK(mem.toDS(), k).toDF()
          .writeStream.format("memory").queryName(name)
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("tws-lastk-prop-ck").toString)
          .outputMode(OutputMode.Update()).start()
        val rows = try {
          batches.foreach { b => mem.addData(b); q.processAllAvailable() }
          spark.table(name).as[EventPipeline.UserRecent].collect()
        } finally q.stop()
        val got = rows.groupBy(_.user_id)
          .map { case (u, rs) => u -> rs.maxBy(_.cnt) }
        val expected = evs.groupBy(_.user_id).map { case (u, es) =>
          u -> (es.size.toLong,
            es.sortBy(e => (-e.us, -e.event_id)).take(k)
              .map(_.event_type).mkString(","))
        }
        assert(got.keySet == expected.keySet, s"trial $trial: user sets differ")
        expected.foreach { case (u, (cnt, recent)) =>
          assert(got(u).cnt == cnt && got(u).recent == recent,
            s"trial $trial user $u (k=$k): got (${got(u).cnt}, ${got(u).recent}), " +
              s"expected ($cnt, $recent)")
        }
      }
    }
  }

  test("property: funnel/retention/transitions equal naive references on seeded random logs") {
    val rnd = new scala.util.Random(4242)
    val types = Vector("view", "click", "purchase", "error")
    (1 to 8).foreach { _ =>
      val n = 30 + rnd.nextInt(120)
      val evs = (1L to n.toLong).map { i =>
        (i, rnd.nextInt(12).toLong,
          java.sql.Timestamp.valueOf(f"2024-01-${rnd.nextInt(6) + 1}%02d " +
            f"${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"),
          types(rnd.nextInt(types.size)))
      }
      val df = evs.toDF("event_id", "user_id", "ts", "event_type")

      // --- funnel reference (greedy earliest-entry, 1h window)
      val W = 3600L * 1000000L
      val byUser = evs.groupBy(_._2)
      val depths = byUser.flatMap { case (_, es) =>
        def us(t: java.sql.Timestamp) = t.getTime * 1000L
        val t1 = es.filter(_._4 == "view").map(e => us(e._3)).minOption
        val t2 = t1.flatMap(a => es.filter(e => e._4 == "click" && us(e._3) > a
          && us(e._3) <= a + W).map(e => us(e._3)).minOption)
        val t3 = (t1, t2) match {
          case (Some(a), Some(b)) => es.filter(e => e._4 == "purchase" && us(e._3) > b
            && us(e._3) <= a + W).map(e => us(e._3)).minOption
          case _ => None
        }
        if (t3.isDefined) Some(3L) else if (t2.isDefined) Some(2L) else if (t1.isDefined) Some(1L) else None
      }
      val expFunnel = depths.groupBy(identity).map { case (d, l) => d -> l.size.toLong }
      val gotFunnel = EventPipeline.funnel(df, Seq("view", "click", "purchase"), W)
        .as[(Long, Long)].collect().toMap
      assert(gotFunnel == expFunnel, s"funnel mismatch: got $gotFunnel exp $expFunnel")

      // --- retention reference
      val userDays = evs.map(e => (e._2, e._3.toLocalDateTime.toLocalDate)).distinct
      val cohorts = userDays.groupBy(_._1).map { case (u, l) => u -> l.map(_._2).min }
      val expRet = userDays.groupBy { case (u, d) =>
        (cohorts(u), java.time.temporal.ChronoUnit.DAYS.between(cohorts(u), d).toInt)
      }.map { case (k, l) => k -> l.size.toLong }
      val gotRet = EventPipeline.retentionCohorts(df)
        .select(col("cohort").cast("string"), col("offset"), col("n_users"))
        .as[(String, Int, Long)].collect()
        .map(r => (java.time.LocalDate.parse(r._1), r._2) -> r._3).toMap
      assert(gotRet == expRet, s"retention mismatch: got $gotRet exp $expRet")

      // --- transition reference
      val bigrams = byUser.toSeq.flatMap { case (_, es) =>
        es.sortBy(e => (e._3.getTime, e._1)).map(_._4).sliding(2)
          .collect { case Seq(a, b) => (a, b) }
      }
      val cnts = bigrams.groupBy(identity).map { case (k, l) => k -> l.size.toLong }
      val tots = cnts.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
      val expTr = cnts.map { case (k, c) => k -> (c, c * 1000000L / tots(k._1)) }
      val gotTr = EventPipeline.transitionMatrix(df)
        .as[(String, String, Long, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      assert(gotTr == expTr, s"transitions mismatch: got $gotTr exp $expTr")
    }
  }

  test("property: activeUsers equals a naive reference on seeded random logs") {
    val rnd = new scala.util.Random(7117)
    (1 to 6).foreach { _ =>
      val n = 40 + rnd.nextInt(160)
      val evs = (1L to n.toLong).map { i =>
        (i, rnd.nextInt(15).toLong,
          java.sql.Timestamp.valueOf(f"2024-01-${rnd.nextInt(12) + 1}%02d " +
            f"${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"),
          "view")
      }
      val df = evs.toDF("event_id", "user_id", "ts", "event_type")
      val got = EventPipeline.activeUsers(df, windowDays = 3)
        .collect().map(r => r.getDate(0).toString ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      // naive reference
      val pairs = evs.map(e => (e._2, e._3.toLocalDateTime.toLocalDate)).distinct
      val days = pairs.map(_._2).distinct.sorted
      val firstSeen = pairs.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      val want = days.map { d =>
        val dau = pairs.count(_._2 == d).toLong
        val roll = pairs.filter(p => !p._2.isAfter(d) && !p._2.isBefore(d.minusDays(2)))
          .map(_._1).distinct.size.toLong
        val nNew = firstSeen.values.count(_ == d).toLong
        val cum = firstSeen.values.count(!_.isAfter(d)).toLong
        d.toString -> ((dau, roll, nNew, cum))
      }.toMap
      assert(got == want, s"n=$n")
    }
  }

  test("abTest: windowed exposure->conversion per arm; degenerate pools yield NULL z") {
    // Arms are md5(user_id) % 2 — recompute them with the same portable
    // hash so the expected counts do not hardcode hash outputs.
    val arms = (1L to 6L).map { u =>
      u -> spark.range(1).select(
        pmod(graft.functions.Hashing.md5Long(lit(u)), lit(2L))).as[Long].head()
    }.toMap
    def t(x: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $x:00")
    // every user is exposed at 10:00; users 1 and 2 convert inside 1h,
    // user 3 converts too late, the rest never convert.
    val rows = (1L to 6L).map(u => (u, t("10:00"), "view")) ++ Seq(
      (1L, t("10:30"), "purchase"), (2L, t("10:59"), "purchase"),
      (3L, t("11:30"), "purchase"))
    val df = rows.toDF("user_id", "ts", "event_type")
    val Array((na, ca, nb, cb, _)) = EventPipeline.abTest(df)
      .as[(Long, Long, Long, Long, Option[Long])].collect()
    val exp0 = (1L to 6L).count(arms(_) == 0L).toLong
    val expC0 = Seq(1L, 2L).count(arms(_) == 0L).toLong
    assert(na == exp0 && nb == 6L - exp0, s"arm sizes ($na, $nb) vs expected ($exp0, ${6 - exp0})")
    assert(ca == expC0 && cb == 2L - expC0, s"conversions ($ca, $cb) vs expected ($expC0, ${2 - expC0})")
    // all-convert pool: zero variance -> NULL z, not a division error.
    val allConv = (1L to 4L).flatMap(u =>
      Seq((u, t("10:00"), "view"), (u, t("10:10"), "purchase")))
      .toDF("user_id", "ts", "event_type")
    val z = EventPipeline.abTest(allConv)
      .select(col("z_micro")).as[Option[Long]].collect()
    assert(z.toSeq == Seq(None), s"degenerate pool must yield NULL z, got ${z.toSeq}")
  }

  test("state TTL expires across the two-phase sleep; TTL.NONE accumulates (differential)") {
    // The sw28 mechanism isolated: phase 1 counts users {1,1,2}, the
    // harness sleeps past the 1.2 s TTL, phase 2 feeds {1,2,2,3}. With
    // TTL the phase-2 counts must RESTART (1→1, 2→2, 3→1); with
    // ttlMs=0 (TTLConfig.NONE) the identical harness and sleep must
    // ACCUMULATE (1→3, 2→3, 3→1) — proving expiry comes from the TTL,
    // not from the restart/sleep itself.
    def phases(ttlMs: Long): Map[(Long, Int), Long] = {
      val p1 = Seq(1L, 1L, 2L).toDF("user_id")
      val p2 = Seq(1L, 2L, 2L, 3L).toDF("user_id")
      val (out1, out2) = GateSupport.runTwsTwoPhaseReplay(spark, "ttlspec",
        (Seq(p1), 2L), (Seq(p2), 3L), p1.schema, sleepMs = 2500L) { stream =>
        EventPipeline.ttlCounts(
          stream.as[EventPipeline.KeyOnlyEvent], ttlMs = ttlMs).toDF()
      }
      (out1.withColumn("phase", lit(1)).unionByName(out2.withColumn("phase", lit(2))))
        .select(col("user_id"), col("phase"), col("cnt"))
        .as[(Long, Int, Long)].collect()
        .map { case (u, p, c) => (u, p) -> c }.toMap
    }
    val ttl = phases(1200L)
    assert(ttl == Map((1L, 1) -> 2L, (2L, 1) -> 1L,
      (1L, 2) -> 1L, (2L, 2) -> 2L, (3L, 2) -> 1L),
      s"TTL run: expected phase-2 restart, got $ttl")
    val none = phases(0L)
    assert(none == Map((1L, 1) -> 2L, (2L, 1) -> 1L,
      (1L, 2) -> 3L, (2L, 2) -> 3L, (3L, 2) -> 1L),
      s"TTL.NONE control: expected phase-2 accumulation, got $none")
  }
}
