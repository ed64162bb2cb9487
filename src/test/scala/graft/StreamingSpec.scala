package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming windowed agg matches the batch form on the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Event(1L, ts("2024-01-01 00:05:00"), 1L, "view", 1.0),
      Event(2L, ts("2024-01-01 00:45:00"), 1L, "view", 2.0),
      Event(3L, ts("2024-01-01 01:05:00"), 2L, "click", 4.0),
      Event(4L, ts("2024-01-01 02:30:00"), 2L, "view", 8.0))

    val stream = MemoryStream[Event]
    stream.addData(events: _*)
    val got = EventStreams.runToMemory(
        EventStreams.windowedCounts(stream.toDF(), "1 hour"),
        "windowed_counts", OutputMode.Complete())
      .orderBy("window_start", "event_type")
      .select("window_start", "event_type", "n_events", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSeq

    val batch = EventStreams.windowedCounts(events.toDF())
      .orderBy("window_start", "event_type")
      .as[(Timestamp, String, Long, Double)].collect().toSeq

    assert(got == batch)
    assert(got.map(_._3).sum == 4)
  }

  test("native session_window: streaming append emits the batch sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val early = Seq(
      Event(1L, ts("2024-01-01 00:00:00"), 7L, "view", 1.0),
      Event(2L, ts("2024-01-01 00:10:00"), 7L, "view", 2.0),
      // exactly gap after -> merges (the strict-> rule, in streaming too)
      Event(3L, ts("2024-01-01 00:40:00"), 7L, "view", 4.0),
      Event(4L, ts("2024-01-01 00:05:00"), 8L, "click", 8.0))
    val stream = MemoryStream[Event]
    val q = EventStreams.sessionWindowed(stream.toDF(), gapSec = 1800)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("native_sessions").start()
    stream.addData(early: _*)
    q.processAllAvailable()
    // sentinel far in the future advances the watermark past the early
    // sessions so append finalizes and emits them
    stream.addData(Event(9L, ts("2024-01-01 12:00:00"), 9L, "view", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("native_sessions")
      .filter($"user_id" =!= 9L)
      .orderBy("user_id", "session_start")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSeq
    val batch = EventStreams.sessionWindowed(early.toDF(), gapSec = 1800)
      .orderBy("user_id", "session_start")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSeq
    assert(got === batch)
    // user 7's three events (incl. the exactly-gap one) are ONE session
    assert(got.filter(_._1 == 7L).map(_._4) === Seq(3L))
  }

  test("session window: a row behind the watermark is dropped; batch twin over on-time rows matches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val onTime = Seq(
      Event(1L, ts("2024-01-01 00:00:00"), 7L, "view", 1.0),
      Event(2L, ts("2024-01-01 00:10:00"), 7L, "view", 2.0))
    val stream = MemoryStream[Event]
    val q = EventStreams.sessionWindowed(stream.toDF(), gapSec = 1800)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("late_sessions").start()
    stream.addData(onTime: _*)
    q.processAllAvailable()
    // sentinel advances the watermark far past user 7's session -> emitted
    stream.addData(Event(8L, ts("2024-01-01 12:00:00"), 9L, "view", 0.0))
    q.processAllAvailable()
    // LATE: would extend the already-emitted session, but sits hours
    // behind the watermark -> must be dropped, not re-open the session
    val late = Event(3L, ts("2024-01-01 00:20:00"), 7L, "view", 4.0)
    stream.addData(late)
    q.processAllAvailable()
    stream.addData(Event(9L, ts("2024-01-01 13:00:00"), 9L, "view", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("late_sessions")
      .filter($"user_id" === 7L)
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSeq
    // equals the batch twin with the EQUIVALENT filter (on-time rows only)
    val batchOnTime = EventStreams.sessionWindowed(onTime.toDF(), gapSec = 1800)
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSeq
    assert(got == batchOnTime)
    // and differs from the batch over ALL rows — the late row really
    // carried information the stream dropped
    val batchAll = EventStreams
      .sessionWindowed((onTime :+ late).toDF(), gapSec = 1800)
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSeq
    assert(got != batchAll)
  }

  test("windowed CMS grid drops late rows; batch twin over on-time terms matches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val onTime = Seq(
      (ts("2024-01-01 00:05:00"), "alpha"),
      (ts("2024-01-01 00:10:00"), "beta"),
      (ts("2024-01-01 00:15:00"), "alpha"))
    val stream = MemoryStream[(Timestamp, String)]
    val q = ExtensionQueries7.cmsCountersWindowed(
        stream.toDS().toDF("ts", "term"), depth = 3, width = 16L,
        windowDur = "1 hour", watermark = "30 minutes")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("late_cms").start()
    stream.addData(onTime: _*)
    q.processAllAvailable()
    stream.addData((ts("2024-01-01 12:00:00"), "sentinel"))
    q.processAllAvailable()
    // late 'alpha' behind the watermark: must not mutate the emitted grid
    stream.addData((ts("2024-01-01 00:20:00"), "alpha"))
    q.processAllAvailable()
    stream.addData((ts("2024-01-01 13:00:00"), "sentinel"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("late_cms")
      .filter($"window_start" === ts("2024-01-01 00:00:00"))
      .select("row_i", "bucket", "cnt")
      .as[(Int, Long, Long)].collect().toSet
    val batchOnTime = ExtensionQueries7.cmsCounters(
        onTime.map(_._2).toDF("term"), depth = 3, width = 16L)
      .as[(Int, Long, Long)].collect().toSet
    assert(got == batchOnTime)
    // the late row would have bumped alpha's counters — prove the drop
    val batchAll = ExtensionQueries7.cmsCounters(
        (onTime.map(_._2) :+ "alpha").toDF("term"), depth = 3, width = 16L)
      .as[(Int, Long, Long)].collect().toSet
    assert(got != batchAll)
  }

  test("windowed HLL registers drop late rows; batch twin over on-time ids matches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def regsOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("ts"), lit("x").as("seg"),
        ExtensionQueries3.md5Hash48(col("uid")).as("h"))
    val onTime = (1L to 40L).map(i => (ts("2024-01-01 00:05:00"), i))
    val stream = MemoryStream[(Timestamp, Long)]
    val q = ExtensionQueries7.hllRegsWindowed(
        regsOf(stream.toDS().toDF("ts", "uid")),
        windowDur = "1 hour", watermark = "30 minutes")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("late_hll").start()
    stream.addData(onTime: _*)
    q.processAllAvailable()
    stream.addData((ts("2024-01-01 12:00:00"), 999L))
    q.processAllAvailable()
    // late id behind the watermark (would add a new register row)
    stream.addData((ts("2024-01-01 00:06:00"), 4242L))
    q.processAllAvailable()
    stream.addData((ts("2024-01-01 13:00:00"), 998L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("late_hll")
      .filter($"window_start" === ts("2024-01-01 00:00:00"))
      .select("seg", "bucket", "reg")
      .as[(String, Long, Int)].collect().toSet
    val batchOnTime = ExtensionQueries7.hllRegs(
        onTime.map(_._2).toDF("uid")
          .select(lit("x").as("seg"), ExtensionQueries3.md5Hash48(col("uid")).as("h")))
      .as[(String, Long, Int)].collect().toSet
    assert(got == batchOnTime)
    val batchAll = ExtensionQueries7.hllRegs(
        (onTime.map(_._2) :+ 4242L).toDF("uid")
          .select(lit("x").as("seg"), ExtensionQueries3.md5Hash48(col("uid")).as("h")))
      .as[(String, Long, Int)].collect().toSet
    assert(got != batchAll)
  }

  test("stateful sessionization tracks per-user sessions across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val updates = EventStreams.sessionize(stream.toDS(), gapSeconds = 1800)
    val q = updates.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("sessions").start()

    stream.addData(
      Event(1L, ts("2024-01-01 00:00:00"), 7L, "view", 1.0),
      Event(2L, ts("2024-01-01 00:10:00"), 7L, "view", 1.0))
    q.processAllAvailable()
    // next batch: same user continues within the gap
    stream.addData(Event(3L, ts("2024-01-01 00:20:00"), 7L, "view", 1.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sessions")
      .select("user_id", "n_events", "duration_secs", "closed")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    // state carried across micro-batches: final update sees 3 events, 20 min
    assert(rows.contains((7L, 3L, 1200.0, false)))
  }

  test("a gap inside a batch emits the CLOSED session, not just the new one") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val updates = EventStreams.sessionize(stream.toDS(), gapSeconds = 1800)
    val q = updates.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("sessions_gap").start()
    stream.addData(
      Event(1L, ts("2024-01-01 00:00:00"), 9L, "view", 1.0),
      Event(2L, ts("2024-01-01 00:10:00"), 9L, "view", 1.0),
      Event(3L, ts("2024-01-01 02:00:00"), 9L, "view", 1.0)) // > 30 min gap
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sessions_gap")
      .select("user_id", "n_events", "duration_secs", "closed")
      .as[(Long, Long, Double, Boolean)].collect().toSet
    assert(rows.contains((9L, 2L, 600.0, true)))  // the finished session
    assert(rows.contains((9L, 1L, 0.0, false)))   // the open one
  }

  test("transformWithState sessionization emits exactly what flatMapGroupsWithState does") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batches = Seq(
      Seq(Event(1L, ts("2024-01-01 00:00:00"), 7L, "view", 1.0),
        Event(2L, ts("2024-01-01 00:10:00"), 7L, "view", 1.0),
        Event(3L, ts("2024-01-01 02:00:00"), 7L, "view", 1.0), // gap → close
        Event(4L, ts("2024-01-01 00:05:00"), 8L, "view", 1.0)),
      Seq(Event(5L, ts("2024-01-01 02:20:00"), 7L, "view", 1.0),
        Event(6L, ts("2024-01-01 05:00:00"), 8L, "view", 1.0))) // gap → close
    def run(name: String, f: org.apache.spark.sql.Dataset[Event] =>
        org.apache.spark.sql.Dataset[EventStreams.SessionUpdate]) = {
      val stream = MemoryStream[Event]
      val q = f(stream.toDS()).writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName(name).start()
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      q.stop()
      spark.table(name)
        .select("user_id", "n_events", "duration_secs", "closed")
        .as[(Long, Long, Double, Boolean)].collect().sorted.toList
    }
    val fmgws = run("tws_ref", ds => EventStreams.sessionize(ds, 1800))
    // transformWithState requires the RocksDB state-store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val tws = run("tws_new", ds => EventStreams.sessionizeTws(ds, 1800))
      assert(tws == fmgws,
        "the v2 state API must reproduce the fMGWS updates emit-for-emit")
      assert(tws.count(_._4) == 2, "both gap-closed sessions must be emitted")
    } finally {
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("state TTL: an idle key's ValueState actually expires, and for keys " +
      "that stay idle the TTL'd emissions still match the fMGWS twin") {
    // TimeMode.ProcessingTime schedules continuous no-data batches (that
    // is how timers/TTL advance), so processAllAvailable never settles
    // and AvailableNow never self-terminates — the harness instead POLLS
    // a foreachBatch sink for each phase's expected update (TTL expiry
    // is stamped at state-write time and checked at state-READ time, so
    // the returning key's read deterministically misses after the
    // sleep; the empty batches in between are engine bookkeeping).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    type Update = (Long, Long, Double, Boolean)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    def phases(tag: String, batches: Seq[(Seq[Event], Update)],
        sleepMs: Long,
        f: org.apache.spark.sql.Dataset[Event] =>
          org.apache.spark.sql.Dataset[EventStreams.SessionUpdate]) = {
      val stream = MemoryStream[Event]
      val sink = new java.util.concurrent.ConcurrentLinkedQueue[Update]()
      import scala.jdk.CollectionConverters._
      val q = f(stream.toDS()).writeStream.outputMode(OutputMode.Update())
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[EventStreams.SessionUpdate],
           _: Long) =>
            df.collect().foreach(u =>
              sink.add((u.user_id, u.n_events, u.duration_secs, u.closed)))
        }
        .start()
      try batches.zipWithIndex.foreach { case ((b, waitFor), i) =>
        if (i > 0 && sleepMs > 0) Thread.sleep(sleepMs)
        stream.addData(b: _*)
        val deadline = System.nanoTime() + 120e9.toLong
        while (!sink.asScala.exists(_ == waitFor) &&
            System.nanoTime() < deadline) Thread.sleep(50)
        assert(sink.asScala.exists(_ == waitFor),
          s"${tag}_$i: expected update $waitFor never arrived; " +
            s"sink=${sink.asScala.toList.sorted}")
      } finally q.stop()
      sink.asScala.toList.sorted
    }
    try {
      // Part 1 — output-invisibility for keys that stay idle: user 7 is
      // active only in phase 1, user 8 only in phase 2; far more
      // processing time than the 1 ms TTL passes between phases, so
      // user 7's state IS evicted — and because 7 never returns, the
      // emitted updates must match the no-TTL fMGWS twin exactly.
      val idle = Seq(
        (Seq(Event(1L, ts("2024-01-01 00:00:00"), 7L, "view", 1.0),
          Event(2L, ts("2024-01-01 00:10:00"), 7L, "view", 1.0)),
          (7L, 2L, 600.0, false)),
        (Seq(Event(3L, ts("2024-01-01 00:00:00"), 8L, "view", 1.0)),
          (8L, 1L, 0.0, false)))
      val twin = phases("ttl_twin", idle, sleepMs = 0,
        ds => EventStreams.sessionize(ds, 1800))
      val ttld = phases("ttl_idle", idle, sleepMs = 100,
        ds => EventStreams.sessionizeTwsTtl(ds, 1800,
          java.time.Duration.ofMillis(1)))
      assert(ttld == twin,
        "eviction of a never-returning key must be output-invisible")
      // Part 2 — the eviction is real: user 9's phase-2 event lands
      // WITHIN the 1800 s event-time gap, so with state intact the
      // update reads (9, 3 events, 1200 s) — the no-TTL control proves
      // it; with the 1 ms TTL the state has expired and the processor
      // starts a FRESH session (9, 1 event, 0 s) — the documented
      // accuracy-for-space trade, observed through the TTL surface.
      val r1 = Seq(Event(1L, ts("2024-01-01 00:00:00"), 9L, "view", 1.0),
        Event(2L, ts("2024-01-01 00:10:00"), 9L, "view", 1.0))
      val r2 = Seq(Event(3L, ts("2024-01-01 00:20:00"), 9L, "view", 1.0))
      val noTtl = phases("ttl_keep",
        Seq((r1, (9L, 2L, 600.0, false)), (r2, (9L, 3L, 1200.0, false))),
        sleepMs = 100, ds => EventStreams.sessionizeTws(ds, 1800))
      assert(noTtl.contains((9L, 3L, 1200.0, false)),
        "without TTL the session continues across the sleep")
      val evicted = phases("ttl_evict",
        Seq((r1, (9L, 2L, 600.0, false)), (r2, (9L, 1L, 0.0, false))),
        sleepMs = 100, ds => EventStreams.sessionizeTwsTtl(ds, 1800,
          java.time.Duration.ofMillis(1)))
      assert(evicted.contains((9L, 1L, 0.0, false)) &&
        !evicted.contains((9L, 3L, 1200.0, false)),
        s"the returned key must start fresh after eviction; got $evicted")
    } finally {
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("timer-driven idle closure: the session finalizes WITHOUT an input " +
      "row, and the cleared state restarts fresh on a late return") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    type Update = (Long, Long, Double, Boolean)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[Event]
      val sink = new java.util.concurrent.ConcurrentLinkedQueue[Update]()
      import scala.jdk.CollectionConverters._
      val q = EventStreams.sessionizeTwsTimers(stream.toDS(), 1800,
          java.time.Duration.ofMillis(500))
        .writeStream.outputMode(OutputMode.Update())
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[EventStreams.SessionUpdate],
           _: Long) =>
            df.collect().foreach(u =>
              sink.add((u.user_id, u.n_events, u.duration_secs, u.closed)))
        }
        .start()
      def awaitUpdate(expect: Update): Unit = {
        val deadline = System.nanoTime() + 120e9.toLong
        while (!sink.asScala.exists(_ == expect) &&
            System.nanoTime() < deadline) Thread.sleep(50)
        assert(sink.asScala.exists(_ == expect),
          s"expected $expect; sink=${sink.asScala.toList.sorted}")
      }
      try {
        stream.addData(
          Event(1L, ts("2024-01-01 00:00:00"), 7L, "view", 1.0),
          Event(2L, ts("2024-01-01 00:10:00"), 7L, "view", 1.0))
        awaitUpdate((7L, 2L, 600.0, false))
        // the finalization arrives with NO further input — the timer
        // fires in a later bookkeeping batch and emits closed=true
        awaitUpdate((7L, 2L, 600.0, true))
        // the timer cleared state: a return WITHIN the event-time gap
        // still starts a fresh session (the idle bar closed the old one)
        stream.addData(Event(3L, ts("2024-01-01 00:20:00"), 7L, "view", 1.0))
        awaitUpdate((7L, 1L, 0.0, false))
        assert(!sink.asScala.exists(_ == ((7L, 3L, 1200.0, false))),
          "a timer-closed session must not be continued")
      } finally q.stop()
    } finally {
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("MapState+ListState profile: the streamed final per-user profile " +
      "equals the batch twin across a batch split, and the recency " +
      "buffer genuinely truncates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val batch1 = Seq(
        Event(1L, ts("2024-01-01 00:00:00"), 1L, "view", 1.0),
        Event(2L, ts("2024-01-01 00:01:00"), 1L, "view", 1.0),
        Event(3L, ts("2024-01-01 00:02:00"), 1L, "cart", 1.0),
        Event(4L, ts("2024-01-01 00:00:30"), 2L, "view", 1.0))
      val batch2 = Seq(
        Event(5L, ts("2024-01-01 00:03:00"), 1L, "purchase", 1.0),
        Event(6L, ts("2024-01-01 00:04:00"), 1L, "view", 1.0),
        Event(7L, ts("2024-01-01 00:01:30"), 2L, "purchase", 1.0))
      val stream = MemoryStream[Event]
      val q = EventStreams.profileTws(stream.toDS(), recentN = 3)
        .writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName("profiles").start()
      stream.addData(batch1: _*); q.processAllAvailable()
      stream.addData(batch2: _*); q.processAllAvailable()
      q.stop()
      // each user's FINAL update (max n_events) is its steady-state profile
      val streamed = spark.table("profiles")
        .as[EventStreams.UserProfile].collect()
        .groupBy(_.user_id).view.mapValues(_.maxBy(_.n_events)).toMap
      val batch = EventStreams.profileBatch(
          (batch1 ++ batch2).toDF(), recentN = 3)
        .as[EventStreams.UserProfile].collect()
        .map(p => p.user_id -> p).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (u, p) =>
        assert(p == batch(u), s"user $u: stream $p vs batch ${batch(u)}")
      }
      // the buffer truncated: user 1 saw 5 events, keeps ids of the last 3
      assert(streamed(1L).recent_ids == Seq(3L, 5L, 6L))
      assert(streamed(1L).n_types == 3 && streamed(1L).n_events == 5)
    } finally {
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("event-time timer sessionization: the watermark passing the gap " +
      "closes the session deterministically — no wall clock anywhere") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[Event]
      val q = EventStreams.sessionizeTwsEventTime(stream.toDS(), 1800)
        .writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName("et_sessions").start()
      def rows() = spark.table("et_sessions")
        .select("user_id", "n_events", "duration_secs", "closed")
        .as[(Long, Long, Double, Boolean)].collect().toSet
      // user 7's session: two events 10 min apart
      stream.addData(
        Event(1L, ts("2024-01-01 00:00:00"), 7L, "view", 1.0),
        Event(2L, ts("2024-01-01 00:10:00"), 7L, "view", 1.0))
      q.processAllAvailable()
      assert(rows().contains((7L, 2L, 600.0, false)))
      assert(!rows().exists(_._4), "nothing may close before the watermark")
      // user 8's 02:00 event advances max event time; the NEXT batch's
      // watermark (02:00) passes 7's gap bar (00:40) and fires the timer
      stream.addData(Event(3L, ts("2024-01-01 02:00:00"), 8L, "view", 1.0))
      q.processAllAvailable()
      stream.addData(Event(4L, ts("2024-01-01 02:01:00"), 8L, "view", 1.0))
      q.processAllAvailable()
      assert(rows().contains((7L, 2L, 600.0, true)),
        s"the watermark must close 7's session; got ${rows()}")
      // 7 returns AFTER the closure: a fresh session, not a continuation
      stream.addData(Event(5L, ts("2024-01-01 02:30:00"), 7L, "view", 1.0))
      q.processAllAvailable()
      assert(rows().contains((7L, 1L, 0.0, false)))
      assert(!rows().contains((7L, 3L, 9000.0, false)),
        "a watermark-closed session must not be continued")
      q.stop()
    } finally {
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming value streaks match the batch form across a mid-streak batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq(
      Event(1L, ts("2024-01-01 00:00:00"), 1L, "view", 1.0),
      Event(2L, ts("2024-01-01 00:01:00"), 1L, "view", 2.0),
      Event(3L, ts("2024-01-01 00:02:00"), 1L, "view", 3.0),
      Event(4L, ts("2024-01-01 00:00:00"), 2L, "view", 5.0),
      Event(5L, ts("2024-01-01 00:01:00"), 2L, "view", 5.0)) // tie = break
    val batch2 = Seq(
      // user 1's streak CONTINUES across the batch boundary (3.0 -> 4.0)...
      Event(6L, ts("2024-01-01 00:03:00"), 1L, "view", 4.0),
      // ...then breaks and restarts
      Event(7L, ts("2024-01-01 00:04:00"), 1L, "view", 1.0),
      Event(8L, ts("2024-01-01 00:05:00"), 1L, "view", 2.5),
      // user 2's second streak extends across the boundary (5.0 -> 6.0)
      Event(9L, ts("2024-01-01 00:02:00"), 2L, "view", 6.0))

    val stream = MemoryStream[Event]
    val q = EventStreams.valueStreaks(stream.toDS())
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("value_streaks").start()
    stream.addData(batch1: _*)
    q.processAllAvailable()
    stream.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    // totals are monotone, so each user's final update is its max-n_events row
    val streamed = spark.table("value_streaks")
      .groupBy(col("user_id"))
      .agg(max(struct(col("n_events"), col("longest_streak"), col("n_streaks")))
        .as("s"))
      .select(col("user_id"), col("s.longest_streak"), col("s.n_streaks"),
        col("s.n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet

    val batch = EventStreams.valueStreaksBatch((batch1 ++ batch2).toDF())
      .select(col("user_id"), col("longest_streak"), col("n_streaks"),
        col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet

    assert(streamed == batch)
    assert(batch == Set((1L, 4L, 2L, 6L), (2L, 2L, 2L, 3L)))
  }

  test("streaming transitions match the batch form across a batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq(
      Event(1L, ts("2024-01-01 00:00:00"), 1L, "view", 1.0),
      Event(2L, ts("2024-01-01 00:01:00"), 1L, "click", 1.0),
      Event(3L, ts("2024-01-01 00:00:00"), 2L, "view", 1.0))
    val batch2 = Seq(
      // user 1's transition SPANS the batch boundary (click -> purchase)
      Event(4L, ts("2024-01-01 00:02:00"), 1L, "purchase", 9.0),
      Event(5L, ts("2024-01-01 00:01:00"), 2L, "view", 1.0),
      Event(6L, ts("2024-01-01 00:02:00"), 2L, "click", 1.0))

    val stream = MemoryStream[Event]
    val q = EventStreams.transitions(stream.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("transitions").start()
    stream.addData(batch1: _*)
    q.processAllAvailable()
    stream.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    def tuples(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("event_id"), col("from_type"), col("to_type"))
      .as[(Long, Long, String, String)].collect().toSet
    val streamed = tuples(spark.table("transitions"))
    val batch = tuples(EventStreams.transitionsBatch((batch1 ++ batch2).toDF()))
    assert(streamed == batch)
    assert(batch == Set(
      (1L, 2L, "view", "click"), (1L, 4L, "click", "purchase"),
      (2L, 5L, "view", "view"), (2L, 6L, "view", "click")))
  }

  test("streaming dedup drops in-watermark duplicates across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val deduped = EventStreams.dedupStream(stream.toDF(), Seq("event_id"))
    val q = deduped.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("deduped").start()
    stream.addData(
      Event(1L, ts("2024-01-01 00:00:00"), 1L, "view", 1.0),
      Event(1L, ts("2024-01-01 00:00:00"), 1L, "view", 1.0), // same-batch dup
      Event(2L, ts("2024-01-01 00:01:00"), 1L, "view", 1.0))
    q.processAllAvailable()
    stream.addData(
      Event(1L, ts("2024-01-01 00:00:30"), 1L, "view", 1.0), // restamped dup
      Event(3L, ts("2024-01-01 00:02:00"), 1L, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("deduped").select("event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("stream-stream interval join matches the batch join on the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    def ev(id: Long, t: String, u: Long, tpe: String) = Event(id, ts(t), u, tpe, 1.0)
    // view/click pairs across two batches: in-window match, out-of-window
    // click, click before any view, cross-user non-match
    views.addData(ev(1, "2024-01-01 10:00:00", 1, "view"),
      ev(2, "2024-01-01 10:00:00", 2, "view"))
    clicks.addData(ev(10, "2024-01-01 10:10:00", 1, "click"), // match u1
      ev(11, "2024-01-01 09:50:00", 1, "click"),              // before view
      ev(12, "2024-01-01 11:00:00", 2, "click"))              // > 30 min
    val joined = EventStreams.clicksAfterViews(views.toDF(), clicks.toDF())
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ssj").start()
    q.processAllAvailable()
    views.addData(ev(3, "2024-01-01 12:00:00", 3, "view"))
    clicks.addData(ev(13, "2024-01-01 12:05:00", 3, "click")) // match u3, batch 2
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssj")
      .select(col("user_id"), col("click_id")).as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (3L, 13L)))

    // batch form of the same join on the same rows gives the same matches
    val allViews = Seq(ev(1, "2024-01-01 10:00:00", 1, "view"),
      ev(2, "2024-01-01 10:00:00", 2, "view"),
      ev(3, "2024-01-01 12:00:00", 3, "view")).toDF()
    val allClicks = Seq(ev(10, "2024-01-01 10:10:00", 1, "click"),
      ev(11, "2024-01-01 09:50:00", 1, "click"),
      ev(12, "2024-01-01 11:00:00", 2, "click"),
      ev(13, "2024-01-01 12:05:00", 3, "click")).toDF()
    val batch = EventStreams.clicksAfterViews(allViews, allClicks)
      .select(col("user_id"), col("click_id")).as[(Long, Long)].collect().toSet
    assert(batch == got)
  }

  test("streaming A/B variant moments match the batch form across a batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val chunk1 = Seq(
      Event(1L, ts("2024-01-01 00:00:00"), 1L, "view", 1.5),   // variant 1
      Event(2L, ts("2024-01-01 00:01:00"), 2L, "view", 2.25),  // variant 0
      Event(3L, ts("2024-01-01 00:02:00"), 3L, "click", 4.0))  // variant 1
    val chunk2 = Seq(
      Event(4L, ts("2024-01-01 00:03:00"), 4L, "view", 8.5),   // variant 0
      Event(5L, ts("2024-01-01 00:04:00"), 1L, "view", 16.75)) // variant 1

    val stream = MemoryStream[Event]
    val q = ExtensionQueries8.abVariantMoments(stream.toDF())
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("ab_moments").start()
    stream.addData(chunk1: _*)
    q.processAllAvailable()
    stream.addData(chunk2: _*)
    q.processAllAvailable()
    q.stop()

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("event_type", "variant", "n", "sv", "svv")
      .as[(String, Int, Long, Double, Double)].collect().toSet
    val got = rows(spark.table("ab_moments"))
    val batch = rows(ExtensionQueries8.abVariantMoments((chunk1 ++ chunk2).toDF()))
    assert(got == batch)
    assert(got.toSeq.map(_._3).sum == 5, "every event lands in exactly one moment cell")
  }

  test("stream-static enrichment join matches the batch join; dimension-less events keep nulls") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Event(1L, ts("2024-01-01 00:05:00"), 1L, "view", 1.0),
      Event(2L, ts("2024-01-01 00:45:00"), 2L, "click", 2.0),
      Event(3L, ts("2024-01-01 01:05:00"), 9L, "view", 4.0)) // no dim row
    val dim = Seq((1L, "GOLD", 10), (2L, "SILVER", 20))
      .toDF("user_id", "segment", "nation_id")

    val stream = MemoryStream[Event]
    stream.addData(events: _*)
    val got = EventStreams.runToMemory(
        EventStreams.enrichWithDim(stream.toDF(), dim),
        "enriched", OutputMode.Append())
      .select(col("event_id"), col("segment"), col("nation_id"))
      .as[(Long, Option[String], Option[Int])].collect().toSet
    // identical code is the batch twin
    val batch = EventStreams.enrichWithDim(events.toDF(), dim)
      .select(col("event_id"), col("segment"), col("nation_id"))
      .as[(Long, Option[String], Option[Int])].collect().toSet
    assert(got == batch)
    assert(got == Set((1L, Some("GOLD"), Some(10)),
      (2L, Some("SILVER"), Some(20)), (3L, None, None)),
      "the left join must pass dimension-less events through with nulls")
  }

  test("foreachBatch lake ingest is exactly-once: a replayed epoch does not duplicate rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest").toString + "/events"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ingest_ckpt").toString
    val chunk1 = Seq(Event(1L, ts("2024-01-01 00:00:00"), 1L, "view", 1.0),
      Event(2L, ts("2024-01-01 00:01:00"), 2L, "click", 2.0))
    val chunk2 = Seq(Event(3L, ts("2024-01-01 00:02:00"), 1L, "view", 4.0))

    val stream = MemoryStream[Event]
    val q = EventStreams.startLakeIngest(stream.toDF(), dir, ckpt)
    stream.addData(chunk1: _*)
    q.processAllAvailable()
    stream.addData(chunk2: _*)
    q.processAllAvailable()
    q.stop()

    def lake() = spark.read.parquet(dir)
    assert(lake().select("event_id").as[Long].collect().toSeq.sorted == Seq(1L, 2L, 3L))

    // Simulate the at-least-once window: epoch 0 is REPLAYED (failure
    // after its write, before the checkpoint commit). The idempotent
    // per-batch commit overwrites batch=0 instead of appending beside it.
    EventStreams.writeBatchIdempotent(chunk1.toDF(), dir, batchId = 0L)
    assert(lake().select("event_id").as[Long].collect().toSeq.sorted == Seq(1L, 2L, 3L),
      "a replayed epoch must not duplicate rows")
    // the replay really re-wrote batch 0 (fresh files), not a no-op
    assert(lake().filter(col("batch") === 0).count() == 2)
  }

  test("file-source streaming read ingests the events fixture") {
    // stage the fixture as a directory of event files (the source contract)
    val dir = java.nio.file.Files.createTempDirectory("graft_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("part-0.parquet"))
    val stream = EventStreams.readEventStream(spark, dir.toString)
    assert(stream.isStreaming)
    val got = EventStreams.runToMemory(
      EventStreams.windowedCounts(stream, "1 day"),
      "daily_from_files", OutputMode.Complete())
    assert(got.agg(sum("n_events")).first.getLong(0) == 1000L)
  }

  test("text + media operators run unchanged on a streaming source (batch parity)") {
    import org.apache.spark.sql.DataFrame
    import graft.operators.{Multimodal, TextOps}
    // stage the documents fixture as a file-stream directory
    val dir = java.nio.file.Files.createTempDirectory("graft_docs")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/documents.parquet"),
      dir.resolve("part-0.parquet"))
    val batch = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val stream = spark.readStream.schema(batch.schema).parquet(dir.toString)
    assert(stream.isStreaming)

    // the text exprs and the partition-batched decode seam are mode-agnostic:
    // the SAME functions compose over a streaming DataFrame
    def features(df: DataFrame): DataFrame =
      Multimodal.decodeFeatures(Multimodal.mediaFromDocuments(df)).toDF()
        .select(col("doc_id"), col("media_type"), col("n_bytes"), col("checksum"))
    def quality(df: DataFrame): DataFrame = df.select(
      col("doc_id"),
      TextOps.charHash(col("text")).as("fingerprint"),
      size(TextOps.tokens(col("text"))).as("n_tokens"),
      // the native NFC expression is a plain row-local Catalyst expr, so
      // it must compose over a streaming plan unchanged too
      graft.functions.UnicodeNormalizeNFC.nfcNormalize(lower(col("text"))).as("norm"))

    val gotQ = EventStreams.runToMemory(quality(stream), "stream_doc_quality",
      OutputMode.Append()).collect().toSet
    assert(gotQ == quality(batch).collect().toSet && gotQ.nonEmpty)

    val gotM = EventStreams.runToMemory(features(stream), "stream_doc_media",
      OutputMode.Append()).collect().toSet
    assert(gotM == features(batch).collect().toSet && gotM.nonEmpty)
  }

  test("screen checkpoint restart: recovered bucket members keep " +
      "flagging post-restart dups exactly as an uninterrupted run") {
    screenRestartParity(Map.empty, requireChangelog = false)
  }

  test("screen checkpoint restart under RocksDB changelog checkpointing: " +
      "same parity, and the checkpoint actually contains changelog files") {
    // The production checkpoint mode for a state that grows with the
    // bucket-key space (r17): full-snapshot uploads scale with TOTAL
    // state per batch, changelog checkpointing uploads only the keys the
    // batch changed (snapshots amortize in the background). The screen's
    // restart semantics must be identical under it — and the .changelog
    // assertion proves the knob took effect rather than being silently
    // ignored by a renamed conf.
    screenRestartParity(
      Map("spark.sql.streaming.stateStore.rocksdb." +
        "changelogCheckpointing.enabled" -> "true"),
      requireChangelog = true)
  }

  /** The screen restart-parity body, shared by the default-snapshot and
    * changelog-checkpointing tests: batch 1, STOP, restart from the
    * checkpoint, batch 2 — emit-for-emit with an uninterrupted run.
    */
  private def screenRestartParity(extraConfs: Map[String, String],
      requireChangelog: Boolean): Unit = {
    // The ingest screen's production restart concern: the capped
    // ListState bucket members recovered from a checkpoint must flag a
    // dup that arrives AFTER the restart against a member stored BEFORE
    // it — emit-for-emit with an uninterrupted run over the same feed.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    type Hit = (Long, Long, Double, Int)
    val textA = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val textB = "north south east west spring summer autumn winter " +
      "morning noon evening night river mountain valley plain"
    val batch1 = Seq(Doc(1L, ts("2024-01-01 00:00:01"), textA),
      Doc(2L, ts("2024-01-01 00:00:02"), textA))
    val batch2 = Seq(Doc(3L, ts("2024-01-01 00:01:01"), textA),
      Doc(4L, ts("2024-01-01 00:01:02"), textB),
      Doc(5L, ts("2024-01-01 00:01:03"), textB))
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val confKeys = provKey +: extraConfs.keys.toSeq
    val prior = confKeys.map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    extraConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def run(ckpt: String, stream: MemoryStream[Doc],
          buf: java.util.concurrent.ConcurrentLinkedQueue[Hit])
          : org.apache.spark.sql.streaming.StreamingQuery =
        DocStreams.nearDupStream(stream.toDS()).writeStream
          .outputMode(OutputMode.Update())
          .option("checkpointLocation", ckpt)
          .foreachBatch {
            (df: org.apache.spark.sql.Dataset[DocStreams.NearDupHit],
             _: Long) =>
              df.collect().foreach(h => buf.add(
                (h.doc_id, h.dup_of, h.est_jaccard, h.band)))
          }.start()
      def drained(buf: java.util.concurrent.ConcurrentLinkedQueue[Hit]) = {
        val b = Seq.newBuilder[Hit]
        buf.forEach(x => b += x)
        b.result().sorted.toList
      }
      // reference: both batches through one uninterrupted query
      val refBuf = new java.util.concurrent.ConcurrentLinkedQueue[Hit]()
      val refCkpt = java.nio.file.Files
        .createTempDirectory("graft-screen-ref").toString
      val refStream = MemoryStream[Doc]
      val qRef = run(refCkpt, refStream, refBuf)
      Seq(batch1, batch2).foreach { b =>
        refStream.addData(b: _*); qRef.processAllAvailable()
      }
      qRef.stop()
      // test: batch 1, STOP, restart from the checkpoint, batch 2
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[Hit]()
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-screen-restart").toString
      val stream = MemoryStream[Doc]
      val q1 = run(ckpt, stream, buf)
      stream.addData(batch1: _*); q1.processAllAvailable(); q1.stop()
      val q2 = run(ckpt, stream, buf)
      stream.addData(batch2: _*); q2.processAllAvailable(); q2.stop()
      val got = drained(buf)
      assert(got == drained(refBuf),
        "the restarted run must emit exactly the uninterrupted run's hits")
      val pairs = got.map(h => (h._1, h._2)).toSet
      assert(pairs.contains((3L, 1L)) && pairs.contains((3L, 2L)),
        s"a post-restart dup must hit the RECOVERED pre-restart members: $pairs")
      assert(pairs.contains((5L, 4L)),
        "post-restart same-batch members must keep working too")
      if (requireChangelog) {
        val walk = java.nio.file.Files
          .walk(java.nio.file.Paths.get(ckpt, "state"))
        val changelogs =
          try walk.filter(p => p.toString.endsWith(".changelog")).count()
          finally walk.close()
        assert(changelogs > 0,
          "changelog checkpointing was enabled but the checkpoint's state " +
            "dir holds no .changelog files — the conf did not take effect")
      }
    } finally {
      prior.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("state-store rescale: restarting sessionizeTws from a checkpoint " +
      "under a DIFFERENT shuffle-partition count emits identical sessions") {
    // The production rescale concern (r14 verdict item 6): Structured
    // Streaming pins the state-store partition count at the FIRST start
    // (it is recorded in the checkpoint's metadata), so a restart under a
    // different spark.sql.shuffle.partitions must keep reading/writing
    // the checkpointed layout — recovered sessions must continue and
    // close exactly as an uninterrupted run would. A true state
    // REPARTITION is an offline rewrite, not a restart-time conf change;
    // this pins that the conf change is safe (ignored for state layout),
    // never corrupting.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq(
      Event(1L, ts("2024-01-01 00:00:00"), 7L, "view", 1.0),
      Event(2L, ts("2024-01-01 00:10:00"), 7L, "view", 1.0),
      Event(3L, ts("2024-01-01 00:05:00"), 8L, "view", 1.0),
      Event(4L, ts("2024-01-01 00:07:00"), 9L, "view", 1.0))
    val batch2 = Seq(
      Event(5L, ts("2024-01-01 02:00:00"), 7L, "view", 1.0), // gap → close 7
      Event(6L, ts("2024-01-01 00:20:00"), 8L, "view", 1.0), // extends 8
      Event(7L, ts("2024-01-01 05:00:00"), 9L, "view", 1.0)) // gap → close 9
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val partKey = "spark.sql.shuffle.partitions"
    val (priorProv, priorParts) =
      (spark.conf.getOption(provKey), spark.conf.get(partKey))
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      // foreachBatch accumulator: survives the stop/restart (a memory
      // sink's table belongs to one query incarnation)
      def run(ckpt: String, stream: MemoryStream[Event],
          buf: java.util.concurrent.ConcurrentLinkedQueue[
            (Long, Long, Double, Boolean)])
          : org.apache.spark.sql.streaming.StreamingQuery =
        EventStreams.sessionizeTws(stream.toDS(), 1800).writeStream
          .outputMode(OutputMode.Update())
          .option("checkpointLocation", ckpt)
          .foreachBatch {
            (df: org.apache.spark.sql.Dataset[EventStreams.SessionUpdate],
             _: Long) =>
              df.collect().foreach(u => buf.add(
                (u.user_id, u.n_events, u.duration_secs, u.closed)))
          }.start()
      def drained(buf: java.util.concurrent.ConcurrentLinkedQueue[
          (Long, Long, Double, Boolean)]) = {
        val b = Seq.newBuilder[(Long, Long, Double, Boolean)]
        buf.forEach(x => b += x)
        b.result().sorted.toList
      }
      // reference: both batches through ONE uninterrupted query at 3
      // shuffle partitions
      val refBuf = new java.util.concurrent.ConcurrentLinkedQueue[
        (Long, Long, Double, Boolean)]()
      val refCkpt = java.nio.file.Files
        .createTempDirectory("graft-rescale-ref").toString
      spark.conf.set(partKey, "3")
      val refStream = MemoryStream[Event]
      val qRef = run(refCkpt, refStream, refBuf)
      Seq(batch1, batch2).foreach { b =>
        refStream.addData(b: _*); qRef.processAllAvailable()
      }
      qRef.stop()
      // test run: batch 1 at 3 partitions, STOP, restart the same
      // checkpoint at 7 partitions, batch 2 — sessions opened before the
      // rescale attempt must close correctly after it
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[
        (Long, Long, Double, Boolean)]()
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-rescale").toString
      spark.conf.set(partKey, "3")
      val stream = MemoryStream[Event]
      val q1 = run(ckpt, stream, buf)
      stream.addData(batch1: _*); q1.processAllAvailable(); q1.stop()
      spark.conf.set(partKey, "7")
      val q2 = run(ckpt, stream, buf)
      stream.addData(batch2: _*); q2.processAllAvailable()
      // the state layout stays the CHECKPOINTED count — the conf change
      // must not re-shard recovered state
      val stateParts = q2.lastProgress.stateOperators(0).numShufflePartitions
      q2.stop()
      assert(stateParts == 3,
        s"restart must keep the checkpointed state partitioning, got $stateParts")
      assert(drained(buf) == drained(refBuf),
        "the rescaled run must emit exactly the uninterrupted run's sessions")
    } finally {
      spark.conf.set(partKey, priorParts)
      priorProv match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }
  }

  test("windowed agg survives a stop/restart from checkpoint with exactly-once output") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-restart").toString
    val ckpt = s"$root/ckpt"
    val out = s"$root/out"

    val stream = MemoryStream[Event]
    // identical query body for both incarnations — only the checkpoint links them
    def start() = EventStreams.windowedCounts(stream.toDF()).writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()

    // phase 1: hours 0-1 arrive, then a 02:30 event pushes the watermark
    // (10 min lateness) to 02:20 so windows [0,1) and [1,2) finalize
    stream.addData(
      Event(1L, ts("2024-01-01 00:05:00"), 1L, "view", 1.0),
      Event(2L, ts("2024-01-01 00:45:00"), 1L, "view", 2.0),
      Event(3L, ts("2024-01-01 01:10:00"), 2L, "click", 4.0))
    val q1 = start()
    q1.processAllAvailable()
    stream.addData(Event(4L, ts("2024-01-01 02:30:00"), 2L, "view", 8.0))
    q1.processAllAvailable()
    q1.stop() // kill the query; window [2,3) is still OPEN in state

    // phase 2: restart from the checkpoint; a 05:00 event pushes the
    // watermark past [2,3), whose contents were ingested BEFORE the restart
    // — emitting it correctly requires the recovered state store
    val q2 = start()
    stream.addData(Event(5L, ts("2024-01-01 05:00:00"), 3L, "view", 16.0))
    q2.processAllAvailable()
    q2.stop()

    val result = spark.read.parquet(out)
      .select("window_start", "event_type", "n_events", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect()
      .sortBy(r => (r._1.getTime, r._2)).toSeq
    // exactly-once: every finalized window appears EXACTLY once across both
    // incarnations — nothing lost at the stop, nothing re-emitted after the
    // restart (file-sink metadata log + recovered state store)
    assert(result == Seq(
      (ts("2024-01-01 00:00:00"), "view", 2L, 3.0),
      (ts("2024-01-01 01:00:00"), "click", 1L, 4.0),
      (ts("2024-01-01 02:00:00"), "view", 1L, 8.0)))
  }
  test("streaming near-dup screen: the TWS form emits exactly the batch " +
      "twin's hits (multiplicity included) across a batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    val base = "the quick brown fox jumps over the lazy dog again and " +
      "again while the band plays on through the long winter evening"
    val docs = Seq(
      Doc(1L, ts("2024-01-01 00:00:00"), base),
      Doc(2L, ts("2024-01-01 00:01:00"), base), // exact dup of 1
      Doc(3L, ts("2024-01-01 00:02:00"),
        base.replace("winter", "summer")), // near dup of 1/2
      Doc(4L, ts("2024-01-01 00:03:00"),
        "completely unrelated text about spark physical plans and " +
          "shuffle partitions at scale with no shared shingles at all"),
      // second micro-batch: another exact dup + a short no-shingle doc
      Doc(5L, ts("2024-01-01 00:10:00"), base),
      Doc(6L, ts("2024-01-01 00:11:00"), "one"))
    val batches = Seq(docs.take(4), docs.drop(4))

    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    def run(name: String, capK: Int) = {
      val stream = MemoryStream[Doc]
      val q = DocStreams.nearDupStream(stream.toDS(), capK = capK)
        .writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName(name).start()
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      q.stop()
      spark.table(name)
        .as[(Long, Long, Double, Int)].collect().sorted.toList
    }
    try {
      val got = run("neardup_tws", 16)
      val want = DocStreams.nearDupBatch(docs.toDF(), capK = 16)
        .as[(Long, Long, Double, Int)].collect().sorted.toList
      assert(got == want,
        "stream must equal the batch twin hit-for-hit, band multiplicity included")
      // the fixture exercises the semantics, not just emptiness:
      val pairs = got.map(h => (h._1, h._2)).toSet
      assert(pairs.contains((2L, 1L)), "exact dup flagged at ingest")
      assert(pairs.contains((5L, 1L)) && pairs.contains((5L, 2L)),
        "a later batch's dup hits the earlier batches' stored members")
      assert(got.filter(h => h._1 == 2L && h._2 == 1L)
        .forall(_._3 == 1.0), "exact dup estimates 1.0")
      assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
        "unrelated doc never hits")
      assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L),
        "a doc too short to shingle is dropped, not crashed on")

      // cap semantics, pinned at capK=1: later exact dups still hit the
      // FIRST member (matching is uncapped) but never each other
      // (membership is) — and the batch twin prices the identical miss
      val capped = run("neardup_tws_cap", 1)
      val cappedPairs = capped.map(h => (h._1, h._2)).toSet
      assert(cappedPairs.contains((2L, 1L)) && cappedPairs.contains((5L, 1L)))
      assert(!cappedPairs.contains((5L, 2L)),
        "capK=1: doc 2 never became a member, so doc 5 must not hit it")
      val cappedWant = DocStreams.nearDupBatch(docs.toDF(), capK = 1)
        .as[(Long, Long, Double, Int)].collect().sorted.toList
      assert(capped == cappedWant)
    } finally {
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("screen TTL: an idle bucket's members actually evict (the dup " +
      "passes unflagged) and eviction re-opens capK room; the no-TTL " +
      "control proves both against the same feed") {
    // Same polling harness as the sessionizer TTL case: ProcessingTime
    // bookkeeping batches never settle, so each phase carries its own
    // fresh exact-dup MARKER pair and the sink is polled for the marker
    // hit before asserting what the probe docs did (or did not) emit.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    type Hit = (Long, Long, Double, Int)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val textA = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    def marker(n: Int) = s"marker$n one marker$n two marker$n three " +
      s"marker$n four marker$n five marker$n six marker$n seven"
    // per-phase (data-added, marker-seen) nanos — the observable bracket
    // around each phase's state writes/reads, used to detect a box so
    // loaded the TTL assertions become inconclusive (see below)
    val phaseTimes = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def phases(tag: String, sleeps: Seq[Long],
        f: org.apache.spark.sql.Dataset[Doc] =>
          org.apache.spark.sql.Dataset[DocStreams.NearDupHit]) = {
      phaseTimes.clear()
      // probe docs 1, 2, 3 all carry textA; each phase i also feeds the
      // exact-dup marker pair (100i, 100i+1) whose hit signals the
      // phase fully processed
      val batches = Seq(
        (Seq(Doc(1L, ts("2024-01-01 00:00:01"), textA),
          Doc(100L, ts("2024-01-01 00:00:02"), marker(1)),
          Doc(101L, ts("2024-01-01 00:00:03"), marker(1))), (101L, 100L)),
        (Seq(Doc(2L, ts("2024-01-01 00:01:01"), textA),
          Doc(200L, ts("2024-01-01 00:01:02"), marker(2)),
          Doc(201L, ts("2024-01-01 00:01:03"), marker(2))), (201L, 200L)),
        (Seq(Doc(3L, ts("2024-01-01 00:02:01"), textA),
          Doc(300L, ts("2024-01-01 00:02:02"), marker(3)),
          Doc(301L, ts("2024-01-01 00:02:03"), marker(3))), (301L, 300L)))
      val stream = MemoryStream[Doc]
      val sink = new java.util.concurrent.ConcurrentLinkedQueue[Hit]()
      import scala.jdk.CollectionConverters._
      val q = f(stream.toDS()).writeStream.outputMode(OutputMode.Update())
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[DocStreams.NearDupHit],
           _: Long) =>
            df.collect().foreach(h =>
              sink.add((h.doc_id, h.dup_of, h.est_jaccard, h.band)))
        }
        .start()
      try batches.zip(sleeps).zipWithIndex.foreach { case (((b, mk), slp), i) =>
        if (slp > 0) Thread.sleep(slp)
        val added = System.nanoTime()
        stream.addData(b: _*)
        val deadline = added + 120e9.toLong
        while (!sink.asScala.exists(h => (h._1, h._2) == mk) &&
            System.nanoTime() < deadline) Thread.sleep(50)
        assert(sink.asScala.exists(h => (h._1, h._2) == mk),
          s"${tag}_$i: marker $mk never arrived; " +
            s"sink=${sink.asScala.toList.sorted}")
        phaseTimes += ((added, System.nanoTime()))
      } finally q.stop()
      sink.asScala.toList.map(h => (h._1, h._2)).toSet
    }
    try {
      // no-TTL control at capK=1: doc 1 is the bucket's only member
      // forever (cap full), so 2 and 3 both hit 1 and never each other
      val ctl = phases("screen_ttl_ctl", sleeps = Seq(0, 100, 100),
        ds => DocStreams.nearDupStream(ds, capK = 1))
      assert(ctl.contains((2L, 1L)) && ctl.contains((3L, 1L)),
        s"control must flag both later dups against the stored member: $ctl")
      assert(!ctl.contains((3L, 2L)),
        s"capK=1 without TTL: 2 never became a member: $ctl")
      // TTL'd run, same feed, TTL between the two gaps: the 20 s sleep
      // before phase 2 evicts doc 1 (8 s TTL, 2.5x margin), so 2 passes
      // UNFLAGGED — and 2 takes the re-opened cap slot; phase 3 follows
      // immediately, so its read lands well inside 2's 8 s TTL even on
      // a heavily loaded box (observed phase latency ~2 s), and 3 hits
      // 2, not 1
      val ttld = phases("screen_ttl", sleeps = Seq(0, 20000, 0),
        ds => DocStreams.nearDupStreamTtl(ds,
          java.time.Duration.ofSeconds(8), capK = 1))
      assert(!ttld.contains((2L, 1L)),
        s"the original evicted during the 20 s idle, its dup must pass " +
          s"unflagged: $ttld")
      // Phase 3's read must land inside doc 2's 8 s TTL for the
      // re-opened-slot assertions to be meaningful. Doc 2's state write
      // happened no earlier than phase 2's addData; phase 3's read no
      // later than its marker hit — so if (marker-3 seen − phase-2
      // added) ≤ TTL the read was provably in budget. A box loaded
      // enough to blow that bracket makes the outcome genuinely
      // inconclusive: CANCEL (visible, non-flaky) instead of failing —
      // the eviction direction above is sleep-dominated and stays
      // asserted regardless of load.
      val inBudget =
        phaseTimes(2)._2 - phaseTimes(1)._1 <= 8e9.toLong
      if (!inBudget && !(ttld.contains((3L, 2L)) && !ttld.contains((3L, 1L))))
        cancel(f"phase 3 landed ${(phaseTimes(2)._2 - phaseTimes(1)._1) / 1e9}%.1f s " +
          "after phase 2 — outside doc 2's 8 s TTL budget under load; " +
          "re-run on a quieter box")
      assert(ttld.contains((3L, 2L)) && !ttld.contains((3L, 1L)),
        s"eviction must re-open the capK slot for the next arrival: $ttld")
    } finally {
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  import graft.operators.Multimodal

  test("media table has the opaque-binary schema with typed metadata") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val media = Multimodal.mediaFromDocuments(docs)
    val schema = media.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("payload") == "binary")
    assert(schema("media_type") == "string")
    assert(media.count() == docs.count())
  }

  test("partition-batched decode is deterministic and partition-independent") {
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val media = Multimodal.mediaFromDocuments(docs)
    val a = Multimodal.decodeFeatures(media.repartition(1))
      .select("doc_id", "media_type", "n_bytes", "frames_sampled", "features")
      .as[(Long, String, Int, Int, Seq[Float])].collect().sortBy(_._1).toSeq
    val b = Multimodal.decodeFeatures(media.repartition(7))
      .select("doc_id", "media_type", "n_bytes", "frames_sampled", "features")
      .as[(Long, String, Int, Int, Seq[Float])].collect().sortBy(_._1).toSeq
    assert(a == b)
    a.take(10).foreach { case (_, mediaType, nBytes, frames, feats) =>
      assert(feats.length == 8 && nBytes > 0 && frames > 0)
      if (mediaType == "image") {
        // PPM features: [w, h, maxval, n_pixels, sum_r, sum_g, sum_b, max]
        assert(feats(0) == Multimodal.ImgW.toFloat && feats(1) == Multimodal.ImgH.toFloat)
        assert(feats(3) == (Multimodal.ImgW * Multimodal.ImgH).toFloat)
      } else {
        // stub features are normalized histograms: 8 bins summing to ~1
        assert(math.abs(feats.sum - 1.0f) < 1e-3)
      }
    }
    assert(a.exists(_._2 == "image") && a.exists(_._2 != "image"))
  }

  test("decode stub is the documented byte histogram") {
    val payload = Array.tabulate[Byte](256)(i => i.toByte)
    val f = Multimodal.StubDecoder.decode(payload)
    assert(f.toSeq == Seq.fill(8)(32f / 256))
  }
}

class PpmSpec extends AnyFunSuite {
  import graft.operators.{Multimodal, Ppm}
  lazy val spark = SparkTestSession.spark

  test("encode -> parse round-trips dims, maxval, and raster") {
    val pixels = Array.tabulate[Byte](5 * 4 * 3)(i => (i * 7 % 256).toByte)
    val img = Ppm.parse(Ppm.encode(5, 4, pixels))
    assert(img.width == 5 && img.height == 4 && img.maxVal == 255)
    assert(img.pixels.toSeq == pixels.toSeq)
  }

  test("parse handles netpbm comment lines in the header") {
    val pixels = Array.fill[Byte](1 * 1 * 3)(42)
    val withComment = "P6\n# a comment\n1 1\n255\n".getBytes("US-ASCII") ++ pixels
    val img = Ppm.parse(withComment)
    assert(img.width == 1 && img.height == 1 && img.pixels.toSeq == pixels.toSeq)
  }

  test("decode returns integer-exact channel sums") {
    // 2x1: pixel0 = (10, 20, 30), pixel1 = (40, 50, 255)
    val raster = Array[Byte](10, 20, 30, 40, 50, -1)
    val f = Ppm.decode(Ppm.encode(2, 1, raster))
    assert(f.toSeq == Seq[Float](2, 1, 255, 2, 50, 70, 285, 255))
  }

  test("parse rejects malformed payloads") {
    val pixels = Array.fill[Byte](3)(0)
    intercept[IllegalArgumentException](Ppm.parse("P5\n1 1\n255\n".getBytes ++ pixels))
    intercept[IllegalArgumentException](Ppm.parse("P6\n2 2\n255\n".getBytes ++ pixels))
    intercept[IllegalArgumentException](Ppm.parse("P6\nx y\n255\n".getBytes ++ pixels))
    intercept[IllegalArgumentException](Ppm.parse(Array[Byte]()))
  }

  test("resizeNearest samples dst (x,y) from src (x*W/tw, y*H/th)") {
    val w = 16; val h = 9
    val px = Array.tabulate[Byte](w * h * 3)(i => (i % 251).toByte)
    val t = Ppm.resizeNearest(Ppm.parse(Ppm.encode(w, h, px)), 4, 3)
    assert(t.width == 4 && t.height == 3)
    for (y <- 0 until 3; x <- 0 until 4; c <- 0 until 3) {
      val sx = x * w / 4
      val sy = y * h / 3
      assert(t.pixels((y * 4 + x) * 3 + c) == px((sy * w + sx) * 3 + c),
        s"mismatch at dst ($x,$y) channel $c")
    }
  }

  test("resizeNearest is the identity when dst geometry == src geometry") {
    val px = Array.tabulate[Byte](4 * 3 * 3)(i => (i * 11 % 256).toByte)
    val t = Ppm.resizeNearest(Ppm.parse(Ppm.encode(4, 3, px)), 4, 3)
    assert(t.pixels.toSeq == px.toSeq)
  }

  test("Pcm round-trips samples and rejects malformed payloads") {
    val samples = Array.tabulate[Byte](512)(i => (i % 251).toByte)
    val payload = Multimodal.Pcm.encodeHeader(512) ++ samples
    assert(Multimodal.Pcm.parse(payload).toSeq == samples.toSeq)
    intercept[IllegalArgumentException]( // wrong magic
      Multimodal.Pcm.parse("WAV\n512\n".getBytes ++ samples))
    intercept[IllegalArgumentException]( // header/body length mismatch
      Multimodal.Pcm.parse(Multimodal.Pcm.encodeHeader(513) ++ samples))
    intercept[IllegalArgumentException](Multimodal.Pcm.parse(Array[Byte]()))
  }

  test("audioEnergy: silence threshold separates padding from text, energies exact") {
    import spark.implicits._
    // 64 signal bytes ('a' = 97 -> amplitude 65) then 448 spaces: exactly
    // one loud window, seven silent ones, all-integer energies
    val docs = Seq((1L, "a" * 64)).toDF("doc_id", "text")
    val got = Multimodal.audioEnergy(Multimodal.audioFromDocuments(docs),
      Multimodal.PcmWin, Multimodal.PcmSilenceThr).collect()
    assert(got.length == 1)
    val f = got(0)
    assert(f.n_samples == 512 && f.n_windows == 8)
    assert(f.peak_energy == 65L * 65 * 64, "window of 'a' is 64 * (97-32)^2")
    assert(f.total_energy == f.peak_energy, "padding windows contribute zero")
    assert(f.n_silent == 7)
  }
}
