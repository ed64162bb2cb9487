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
}
