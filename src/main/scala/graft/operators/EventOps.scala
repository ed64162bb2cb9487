package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators, batch form (the streaming forms live in
  * graft.streaming and share these semantics).
  *
  * Scale design: tumbling windows and session aggregation both reduce to a
  * single shuffle on (key) or (key, window); sessionization uses one window
  * function pass per user partition — no driver-side state.
  */
object EventOps {

  /** Tumbling time-window aggregate: epoch-aligned windows via Spark's
    * `window()`, surfaced as the window start date/timestamp.
    */
  def tumblingDaily(events: DataFrame): DataFrame =
    events.groupBy(
        window(col("ts"), "1 day").getField("start").cast("date").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Agg.roundAt(Agg.decSum(col("value")), 2).as("sum_value"))

  /** Gap-based sessionization: a new session starts after `gapSeconds` of
    * inactivity. Returns one row per (user, session) with count + duration.
    * Total-ordered by (ts, event_id) for determinism under ties.
    */
  def sessionize(events: DataFrame, gapSeconds: Double): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sec = col("ts").cast("double")
    events
      .withColumn("__prev", lag(sec, 1).over(byUser))
      .withColumn("__new_s",
        when(col("__prev").isNull || (sec - col("__prev")) > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("__new_s")).over(running))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        Agg.roundAt(max(sec) - min(sec), 3).as("duration_secs"))
  }

  /** Distributed sweep-line: max concurrent CLOSED intervals per aligned
    * `bucketMicros`-wide time bucket, plus the bucket's net change.
    *
    * The textbook sweep (sort ALL boundary events globally, running-sum
    * the +1/−1 deltas) is a single total order — one partition at 100 TB.
    * The two-level form keeps the data-scale work partitioned:
    *
    *   1. within each bucket, the local prefix maxima/net run in parallel
    *      (one shuffle on the bucket key, ordered windows inside it);
    *   2. the cross-bucket base (concurrency entering each bucket) is a
    *      prefix sum over the PER-BUCKET nets — span/width rows, bounded
    *      by the time span, never by data volume;
    *   3. peak(bucket) = base + local max, since every global running-sum
    *      value inside a bucket is base + a local prefix.
    *
    * The departure delta sits at end+1 (closed intervals, matching
    * JoinOps.intervalOverlapJoin), so at one microsecond a −1 orders
    * BEFORE a +1: the departing interval ended strictly before the
    * arriving one began, and the opposite order would count two
    * adjacent, non-overlapping intervals as concurrent. Two endpoint-
    * touching intervals never tie (the −1 lands one past the +1) and do
    * count as concurrent. Concurrency at an instant t is base + (all
    * bucket deltas at us ≤ t); when the bucket's first delta sits past
    * the bucket's start, the carried-in base itself is attained on
    * [bucketStart, firstDelta) and competes in the max — a
    * departure-only bucket peaks at base, not base−1. Buckets with no
    * boundary events carry no row (their concurrency is constant and
    * equal to the next emitted base).
    */
  def peakConcurrencyByBucket(intervals: DataFrame, startUs: String,
      endUs: String, bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    val deltas = intervals.select(col(startUs).as("us"), lit(1L).as("delta"))
      .unionAll(intervals.select((col(endUs) + 1).as("us"),
        lit(-1L).as("delta")))
      .withColumn("bucket", expr(s"us div $bucketMicros"))
    val inBucket = Window.partitionBy(col("bucket"))
      .orderBy(col("us").asc, col("delta").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perBucket = deltas
      .withColumn("run", sum(col("delta")).over(inBucket))
      .groupBy(col("bucket"))
      .agg(max(col("run")).as("local_max"), sum(col("delta")).as("net"),
        min(col("us")).as("first_us"))
    val beforeBucket = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perBucket
      .withColumn("base", coalesce(sum(col("net")).over(beforeBucket), lit(0L)))
      // the bare base is only attained when some instant precedes the
      // bucket's first delta
      .withColumn("local_peak",
        when(col("first_us") > col("bucket") * bucketMicros,
          greatest(col("local_max"), lit(0L)))
          .otherwise(col("local_max")))
      .select(col("bucket"), (col("base") + col("local_peak")).as("peak"),
        col("net"))
  }
}
