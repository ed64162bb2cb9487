package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the event operators (batch forms in
  * [[graft.operators.EventOps]] share the same semantics — windowed
  * aggregation results are identical because `window()` is the same
  * expression in both modes).
  *
  * Scale design: the windowed aggregate is a streaming state store keyed by
  * (window, event_type) — bounded by watermark expiry; sessionization keeps
  * one small state record per active user key via mapGroupsWithState, with
  * processing-time timeout so abandoned sessions flush. Both scale
  * horizontally with `spark.sql.shuffle.partitions` state-store shards.
  */
object EventStreams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionState(nEvents: Long, firstSec: Double, lastSec: Double)

  case class SessionUpdate(user_id: Long, n_events: Long, duration_secs: Double,
      closed: Boolean)

  case class UserProfile(user_id: Long, n_types: Long, n_events: Long,
      recent_ids: Seq[Long])

  /** Watermarked tumbling-window aggregate (guide: readStream -> transforms
    * -> writeStream). 10-minute lateness tolerance; append output emits each
    * window once it is final.
    */
  def windowedCounts(events: DataFrame, window: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  // Spark's `window` function shadows the parameter name in this scope.
  private object functions {
    def window(c: org.apache.spark.sql.Column, w: String) =
      org.apache.spark.sql.functions.window(c, w)
  }

  /** Gap-merged session aggregation on Spark's NATIVE `session_window`
    * grouping key — ONE definition for both execution modes: in batch it is
    * a plain keyed aggregation (e11's registered query), in streaming the
    * same plan runs against the session-window state store (append mode +
    * watermark, per Spark's session-window streaming contract; the
    * `withWatermark` is a no-op in batch). Window = [first event,
    * last event + gap]; an event exactly `gap` after the previous still
    * merges (strict-> split rule, pinned by Round11Spec).
    */
  def sessionWindowed(events: DataFrame, gapSec: Int,
      watermark: String = "0 seconds"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapSec seconds").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        graft.operators.Agg.roundAt(
          graft.operators.Agg.decSum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Stateful gap-based sessionization with mapGroupsWithState: one state
    * record per user; a gap larger than `gapSeconds` between event times
    * starts a new session. The gap logic is event-time-driven, so the
    * default timeout conf is NoTimeout; a production deployment that also
    * wants idle-state eviction passes ProcessingTimeTimeout (with a real
    * trigger interval — under the default no-delay trigger a processing
    * timeout makes the query re-fire batches continuously, which is why it
    * is opt-in).
    */
  def sessionize(events: Dataset[Event], gapSeconds: Double,
      timeoutConf: GroupStateTimeout = GroupStateTimeout.NoTimeout)
      : Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Update(), timeoutConf) {
        case (userId, evts, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionUpdate(userId, s.nEvents, s.lastSec - s.firstSec,
              closed = true))
          } else {
            val sorted = evts.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val secs = sorted.map(_.ts.getTime / 1000.0)
            val init = state.getOption.getOrElse(
              SessionState(0L, secs.head, secs.head))
            // fold events into the state; when a gap closes a session, EMIT
            // it (mapGroupsWithState's one-output-per-group would lose every
            // session except the last)
            val closed = Seq.newBuilder[SessionUpdate]
            val folded = secs.foldLeft(init) { (s, sec) =>
              if (s.nEvents > 0 && sec - s.lastSec > gapSeconds) {
                closed += SessionUpdate(userId, s.nEvents, s.lastSec - s.firstSec,
                  closed = true)
                SessionState(1L, sec, sec)
              } else
                SessionState(s.nEvents + 1, if (s.nEvents == 0) sec else s.firstSec, sec)
            }
            state.update(folded)
            if (timeoutConf == GroupStateTimeout.ProcessingTimeTimeout) {
              state.setTimeoutDuration(((gapSeconds * 1000).toLong).max(1L))
            }
            (closed.result() :+ SessionUpdate(userId, folded.nEvents,
              folded.lastSec - folded.firstSec, closed = false)).iterator
          }
      }
  }

  case class StreakState(lastValue: Double, curLen: Long, longest: Long,
      nStreaks: Long, nEvents: Long)

  case class StreakUpdate(user_id: Long, longest_streak: Long, n_streaks: Long,
      n_events: Long)

  /** Batch form of the value-streak (gaps-and-islands over a VALUE
    * predicate) detection — e12's registered body: per user, the longest
    * run of consecutive events (event-time order) with STRICTLY INCREASING
    * value. A break (first event or non-increase) starts a new island via
    * a cumulative sum over break flags — one shuffle on user_id, two
    * ordered window passes inside the partition, then a keyed aggregate.
    */
  def valueStreaksBatch(events: DataFrame): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val running = byUser.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    events
      .withColumn("__prev", lag(col("value"), 1).over(byUser))
      .withColumn("__brk",
        when(col("__prev").isNull || col("value") <= col("__prev"), 1L)
          .otherwise(0L))
      .withColumn("__streak", sum(col("__brk")).over(running))
      .groupBy(col("user_id"), col("__streak"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"),
        sum(col("len")).as("n_events"))
  }

  /** Streaming twin of [[valueStreaksBatch]] (the d17 pattern: one
    * semantics, two execution modes, hash-equal outputs — StreamingSpec):
    * flatMapGroupsWithState keeps ONE bounded record per user (last value,
    * current/longest run, totals) and emits the user's updated totals each
    * batch, so state never grows with history — the 100 TB shape for a
    * continuous engagement-momentum feed. Same contract as [[sessionize]]:
    * events must arrive in event-time order per user across batches
    * (within a batch they are sorted here).
    */
  def valueStreaks(events: Dataset[Event]): Dataset[StreakUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[StreakState, StreakUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (userId, evts, state: GroupState[StreakState]) =>
          val sorted = evts.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(StreakState(0.0, 0L, 0L, 0L, 0L))
          sorted.foreach { e =>
            st =
              if (st.nEvents == 0L || e.value <= st.lastValue)
                // break: first event ever, or a non-increase
                StreakState(e.value, 1L, math.max(st.longest, 1L),
                  st.nStreaks + 1L, st.nEvents + 1L)
              else {
                val len = st.curLen + 1L
                StreakState(e.value, len, math.max(st.longest, len),
                  st.nStreaks, st.nEvents + 1L)
              }
          }
          state.update(st)
          Iterator(StreakUpdate(userId, st.longest, st.nStreaks, st.nEvents))
      }
  }

  case class TransState(lastType: String, hasLast: Boolean)

  case class Transition(user_id: Long, event_id: Long, from_type: String,
      to_type: String)

  /** Batch form of the per-user event-type transition extraction — e14's
    * pre-aggregation body: each event after a user's first yields
    * (from = previous type, to = its type) in (ts, event_id) order. One
    * shuffle on user_id; the downstream matrix aggregation is at most
    * |types|² rows.
    */
  def transitionsBatch(events: DataFrame): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("from_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("from_type").isNotNull)
      .select(col("user_id"), col("event_id"), col("from_type"),
        col("event_type").as("to_type"))
  }

  /** Streaming twin of [[transitionsBatch]] (the d17/e12 pattern: one
    * semantics, two execution modes, equal outputs — StreamingSpec): ONE
    * event-type string of state per user, each arriving event emitting its
    * (from, to) transition — so a downstream streaming `groupBy(from, to)`
    * count keeps e14's Markov matrix continuously current. State never
    * grows with history; same in-order-arrival contract as [[sessionize]].
    */
  def transitions(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (userId, evts, state: GroupState[TransState]) =>
          val sorted = evts.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(TransState("", hasLast = false))
          val out = Vector.newBuilder[Transition]
          sorted.foreach { e =>
            if (st.hasLast)
              out += Transition(userId, e.event_id, st.lastType, e.event_type)
            st = TransState(e.event_type, hasLast = true)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming exact dedup: keep the first occurrence of each `idCols`
    * combination, with state bounded by the watermark (duplicates arriving
    * later than `watermark` after the original may pass — the standard
    * state/completeness tradeoff for continuous dedup of a document or
    * event feed). Keys on `idCols` ALONE — a retried duplicate restamped
    * with a different ts is still dropped — via
    * dropDuplicatesWithinWatermark, which is the API that both bounds the
    * state and ignores the event-time column for identity.
    */
  def dedupStream(events: DataFrame, idCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Stream-stream interval join: each click matches views by the same user
    * within [view_ts, view_ts + maxDelay]. Watermarks on BOTH sides plus the
    * time-range condition are what let Spark bound the join state (each
    * side's buffer is purged once the other side's watermark passes the
    * interval); an unconstrained stream-stream join would buffer forever.
    * Inner matches emit as soon as both rows arrive — the watermark governs
    * state eviction, not emission.
    */
  def clicksAfterViews(views: DataFrame, clicks: DataFrame,
      maxDelay: String = "30 minutes"): DataFrame = {
    val v = views.withWatermark("ts", maxDelay)
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
    val c = clicks.withWatermark("ts", maxDelay)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    c.join(v, col("c_user") === col("v_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"interval $maxDelay"))
      .select(col("c_user").as("user_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  /** File-source entry point for continuous ingestion of a directory of
    * event parquet files (the FileStreamSource contract — new files landing
    * in the directory become new micro-batches).
    */
  def readEventStream(spark: SparkSession, eventsDir: String): DataFrame = {
    // Same ts-encoding adaptivity as the batch path (Tables.loadEvents):
    // NANOS surfaces as long (exact integer division to micros), MICROS as
    // TimestampType/NTZ (normalized to the session-zoned type).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(eventsDir).schema
    val raw = spark.readStream.schema(rawSchema).parquet(eventsDir)
    rawSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Run a streaming DataFrame to completion against an in-memory sink and
    * return the materialized result (test/driver harness).
    */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }

  /** Stream-STATIC enrichment join: each event picks up its user's
    * dimension attributes from a static lookup table. This is the
    * stateless third join shape beside the stream-stream interval join
    * ([[clicksAfterViews]]) and the batch joins: the static side needs no
    * watermark and holds no streaming state — it is (re-)resolved per
    * micro-batch, which for a file-based dim means a slowly-changing
    * lookup is picked up on the next batch, and for a small dim the join
    * broadcasts. LEFT join: an event with no dim row flows through with
    * nulls rather than silently dropping (ingest must never lose events
    * to late dim arrival). `dim` must carry `user_id` plus the
    * enrichment columns; identical code serves the batch twin —
    * StreamingSpec pins stream ≡ batch on the same rows.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")

  /** One idempotently-committed micro-batch of the lake ingest: the
    * batch lands in its OWN `batch=<id>` directory with overwrite mode,
    * so a retried epoch (failure after write, before the checkpoint
    * commit — the at-least-once window foreachBatch exposes) REPLACES
    * its previous attempt instead of appending beside it. Idempotent
    * per-batch writes + the checkpoint's exactly-once batch numbering
    * are what turn foreachBatch's at-least-once delivery into an
    * exactly-once lake table; readers see `dir` as an ordinary
    * partitioned parquet table.
    */
  def writeBatchIdempotent(df: DataFrame, dir: String, batchId: Long): Unit =
    df.write.mode("overwrite").parquet(s"$dir/batch=$batchId")

  /** Continuous lake ingest via foreachBatch — the production
    * streaming-to-lake sink shape (the streaming twin of the reference's
    * append sink S2/q56): every micro-batch commits through
    * [[writeBatchIdempotent]] under the query checkpoint.
    */
  def startLakeIngest(stream: DataFrame, dir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        writeBatchIdempotent(df.toDF(), dir, batchId)
      }
      .start()

  /** [[sessionize]] on Spark 4's `transformWithState` — the
    * arbitrary-state v2 API (explicit named state handles, TimeMode,
    * TTL and timer surfaces, RocksDB-backed) a production deployment
    * migrates to from flatMapGroupsWithState. The fold logic is
    * [[sessionize]]'s verbatim over an explicit
    * `ValueState[SessionState]`, so its per-batch updates must equal
    * the fMGWS form's exactly — StreamingSpec pins the two APIs
    * emit-for-emit across the same batch split. Requires the RocksDB
    * state-store provider (Spark's transformWithState contract); the
    * caller sets `spark.sql.streaming.stateStore.providerClass`.
    */
  def sessionizeTws(events: Dataset[Event], gapSeconds: Double)
      : Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapSeconds),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** [[sessionizeTws]] with a state TTL — the production retention knob
    * for a key space that grows forever (at 100 TB of events, users who
    * never return must not pin RocksDB state indefinitely): each user's
    * ValueState is evicted by the store once `ttl` of PROCESSING time
    * passes without an update (TTL requires TimeMode.ProcessingTime —
    * Spark's transformWithState contract). Semantics under eviction: an
    * idle key's open-session record disappears; if that key NEVER
    * returns, the emitted updates are exactly the no-TTL form's (its
    * last open-session update was already emitted — eviction is
    * output-invisible for keys that stay idle, which is the only kind a
    * well-chosen TTL should ever evict); if it DOES return after
    * eviction, its next event starts a fresh session instead of
    * continuing the evicted one — the deliberate accuracy-for-space
    * trade, priced in StreamingSpec (one case pins hash-equality with
    * the fMGWS twin for idle keys, one pins the fresh-start divergence
    * for a returned key).
    */
  def sessionizeTwsTtl(events: Dataset[Event], gapSeconds: Double,
      ttl: java.time.Duration): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapSeconds, Some(ttl)),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        OutputMode.Update())
  }

  /** [[sessionizeTws]] with PROACTIVE idle closure via processing-time
    * TIMERS — the other half of the v2 state API's lifecycle surface
    * beside [[sessionizeTwsTtl]]'s eviction. The gap-fold forms (fMGWS
    * and both TWS twins) can only close a session when the user's NEXT
    * event arrives; a user who never returns leaves a forever-open
    * session that no downstream join ever sees finalized. Here every
    * state update (re-)arms a per-key timer at now + `idleTimeout`;
    * if no further event lands, `handleExpiredTimer` EMITS the closed
    * session and clears the state — finalization without an input row,
    * which is what timers exist for and TTL alone cannot do (TTL
    * silently drops state; timers emit on the way out). Semantics:
    * closure by timer uses the processing-time idle bar, closure by a
    * late-arriving event still uses the event-time gap — the standard
    * production pairing. StreamingSpec pins the no-input closed
    * emission and the cleared-state fresh restart.
    */
  def sessionizeTwsTimers(events: Dataset[Event], gapSeconds: Double,
      idleTimeout: java.time.Duration): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(
        new SessionTimerProcessor(gapSeconds, idleTimeout.toMillis),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        OutputMode.Update())
  }

  /** [[sessionizeTws]] with EVENT-TIME timers — the watermark-driven
    * closure that [[sessionizeTwsTimers]]'s processing-time idle bar
    * approximates: each update re-arms a timer at last_event_time + gap
    * in EVENT time, and the timer fires exactly when the WATERMARK
    * passes it — i.e. when the engine can prove no in-order event can
    * extend the session. Closure is therefore deterministic in the data
    * (no wall clock anywhere): the closed emissions are precisely the
    * gap-rule sessions, finalized as early as the watermark allows —
    * the semantics e11's built-in session_window applies to aggregates,
    * here on the arbitrary-state path where the session record can
    * carry anything. Caller supplies the watermark via `delay`
    * (applied here so the TimeMode and the watermark travel together).
    */
  def sessionizeTwsEventTime(events: Dataset[Event], gapSeconds: Double,
      delay: String = "0 seconds"): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionEventTimeProcessor(gapSeconds),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Update())
  }

  /** Continuously-maintained per-user profile on the v2 state API's
    * COMPOSITE state primitives — the two the sessionizers don't touch:
    * a MapState[event_type → count] (per-key SUB-keyed state the store
    * can update point-wise, where a ValueState[Map] would rewrite the
    * whole map per event) and a ListState recency buffer of the last
    * `recentN` event ids (arrival-ordered — the production semantics of
    * a recency feed; equal to the event-time order whenever delivery is
    * in order, which the spec's batch twin pins). One emission per
    * (user, batch): distinct types, total events, recent ids. At 100 TB
    * the MapState point updates are what keep a hot user's profile
    * write O(types touched this batch), not O(all types ever seen).
    */
  def profileTws(events: Dataset[Event], recentN: Int)
      : Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new ProfileProcessor(recentN),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** [[profileTws]]'s batch twin over in-order data: per user, distinct
    * types, event count, and the last `recentN` event ids by
    * (ts, event_id).
    */
  def profileBatch(events: DataFrame, recentN: Int): DataFrame = {
    val ids = org.apache.spark.sql.functions.transform(
      array_sort(collect_list(struct(col("ts"), col("event_id")))),
      s => s.getField("event_id"))
    events.groupBy(col("user_id"))
      .agg(countDistinct(col("event_type")).as("n_types"),
        count(lit(1)).as("n_events"), ids.as("__ids"))
      .withColumn("recent_ids",
        when(size(col("__ids")) <= recentN, col("__ids"))
          .otherwise(slice(col("__ids"), -recentN, recentN)))
      .drop("__ids")
  }
}

/** Shared gap-fold core of the three transformWithState sessionizers:
  * one named ValueState record per user, the fMGWS-identical fold, and
  * the timer-expiry closure (emit the open session as closed, clear
  * state). Subclasses differ ONLY in their timer policy ([[armTimer]])
  * and the state's TTLConfig ([[ttlConfig]]) — a future fix to the fold
  * lands in exactly one place.
  */
abstract class SessionFoldProcessor(gapSeconds: Double) extends
    org.apache.spark.sql.streaming.StatefulProcessor[
      Long, EventStreams.Event, EventStreams.SessionUpdate] {
  import EventStreams.{Event, SessionState, SessionUpdate}
  @transient protected var st:
    org.apache.spark.sql.streaming.ValueState[SessionState] = _

  /** The session state's TTL (NONE by default; the TTL twin overrides). */
  protected def ttlConfig: org.apache.spark.sql.streaming.TTLConfig =
    org.apache.spark.sql.streaming.TTLConfig.NONE

  /** (Re-)arm this key's timer after a state update — no-op by default;
    * the timer twins override with their policy. Timer hygiene for
    * overriders: delete the previous timer before arming, so a chatty
    * key holds exactly ONE pending timer and the timer store scales
    * with keys, not updates.
    */
  protected def armTimer(
      timers: org.apache.spark.sql.streaming.TimerValues,
      folded: SessionState): Unit = ()

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    st = getHandle.getValueState("session",
      org.apache.spark.sql.Encoders.product[SessionState], ttlConfig)

  override def handleInputRows(userId: Long, rows: Iterator[Event],
      timers: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[SessionUpdate] = {
    val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    if (sorted.isEmpty) Iterator.empty
    else {
      val secs = sorted.map(_.ts.getTime / 1000.0)
      val init = if (st.exists()) st.get()
        else SessionState(0L, secs.head, secs.head)
      val closed = Seq.newBuilder[SessionUpdate]
      val folded = secs.foldLeft(init) { (s, sec) =>
        if (s.nEvents > 0 && sec - s.lastSec > gapSeconds) {
          closed += SessionUpdate(userId, s.nEvents, s.lastSec - s.firstSec,
            closed = true)
          SessionState(1L, sec, sec)
        } else
          SessionState(s.nEvents + 1,
            if (s.nEvents == 0) sec else s.firstSec, sec)
      }
      st.update(folded)
      armTimer(timers, folded)
      (closed.result() :+ SessionUpdate(userId, folded.nEvents,
        folded.lastSec - folded.firstSec, closed = false)).iterator
    }
  }

  override def handleExpiredTimer(userId: Long,
      timers: org.apache.spark.sql.streaming.TimerValues,
      expired: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[SessionUpdate] =
    if (!st.exists()) Iterator.empty
    else {
      val s = st.get()
      st.clear()
      Iterator.single(
        SessionUpdate(userId, s.nEvents, s.lastSec - s.firstSec, closed = true))
    }
}

/** [[EventStreams.sessionizeTwsTimers]]'s processor: the shared fold
  * plus a per-key PROCESSING-time timer at now + idle; expiry emits the
  * closed session without an input row.
  */
class SessionTimerProcessor(gapSeconds: Double, idleMs: Long)
    extends SessionFoldProcessor(gapSeconds) {
  override protected def armTimer(
      timers: org.apache.spark.sql.streaming.TimerValues,
      folded: EventStreams.SessionState): Unit = {
    getHandle.listTimers().foreach(getHandle.deleteTimer)
    getHandle.registerTimer(timers.getCurrentProcessingTimeInMs() + idleMs)
  }
}

/** [[EventStreams.sessionizeTwsEventTime]]'s processor: the shared fold
  * plus one EVENT-time timer at last_event_time + gap; the watermark
  * passing it proves the session unextendable.
  */
class SessionEventTimeProcessor(gapSeconds: Double)
    extends SessionFoldProcessor(gapSeconds) {
  override protected def armTimer(
      timers: org.apache.spark.sql.streaming.TimerValues,
      folded: EventStreams.SessionState): Unit = {
    getHandle.listTimers().foreach(getHandle.deleteTimer)
    // one fused ms conversion, CEILed, + 1 (r15 advice, tightened r16):
    // the old `(lastSec*1000).toLong + (gap*1000).toLong` truncated each
    // term's fractional milliseconds independently, and a timer at
    // exactly lastSec+gap races the fold's STRICT gap rule (an event AT
    // the boundary still extends the session — `sec - lastSec > gap`
    // closes it). truncate+1 still had a 1-ulp residue: when the true
    // boundary is an exact millisecond and the double product rounds one
    // ulp BELOW it, toLong+1 lands exactly ON the boundary ms. ceil+1 is
    // strictly past it under any rounding — the sum and product are each
    // correctly rounded (≲1.5 ulp combined, ~2e-4 ms at epoch
    // magnitudes), so the +1 ms dominates; firing marginally late is
    // safe (the session is unextendable from the boundary on), firing at
    // or before it is the race.
    getHandle.registerTimer(
      math.ceil((folded.lastSec + gapSeconds) * 1000).toLong + 1)
  }
}

/** [[EventStreams.profileTws]]'s StatefulProcessor: one MapState
  * (event_type → count, point-updated per type touched) plus one
  * ListState recency buffer per user — the two composite v2 state
  * primitives in one processor, each under its own named handle.
  */
class ProfileProcessor(recentN: Int) extends
    org.apache.spark.sql.streaming.StatefulProcessor[
      Long, EventStreams.Event, EventStreams.UserProfile] {
  import EventStreams.{Event, UserProfile}
  @transient private var typeCounts:
    org.apache.spark.sql.streaming.MapState[String, Long] = _
  @transient private var recent:
    org.apache.spark.sql.streaming.ListState[Long] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
    typeCounts = getHandle.getMapState("type_counts",
      org.apache.spark.sql.Encoders.STRING,
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.streaming.TTLConfig.NONE)
    recent = getHandle.getListState("recent",
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.streaming.TTLConfig.NONE)
  }

  override def handleInputRows(userId: Long, rows: Iterator[Event],
      timers: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[UserProfile] = {
    val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    if (sorted.isEmpty) Iterator.empty
    else {
      sorted.foreach { e =>
        val cur = if (typeCounts.containsKey(e.event_type))
          typeCounts.getValue(e.event_type) else 0L
        typeCounts.updateValue(e.event_type, cur + 1)
      }
      val prev = if (recent.exists()) recent.get().toSeq else Seq.empty
      val upd = (prev ++ sorted.map(_.event_id)).takeRight(recentN)
      recent.put(upd.toArray)
      val counts = typeCounts.iterator().toSeq
      Iterator.single(UserProfile(userId, counts.size.toLong,
        counts.map(_._2).sum, upd))
    }
  }
}

/** [[EventStreams.sessionizeTws]]'s processor: the shared fold with no
  * timers; `ttl` (the [[EventStreams.sessionizeTwsTtl]] path) hands the
  * state handle a TTLConfig so the STORE itself evicts idle keys — the
  * fold never changes, an evicted key simply reads as `!st.exists()`
  * on its next event.
  */
class SessionProcessor(gapSeconds: Double,
    ttl: Option[java.time.Duration] = None)
    extends SessionFoldProcessor(gapSeconds) {
  override protected def ttlConfig: org.apache.spark.sql.streaming.TTLConfig =
    ttl.map(org.apache.spark.sql.streaming.TTLConfig(_))
      .getOrElse(org.apache.spark.sql.streaming.TTLConfig.NONE)
}
