package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream batch operators: gap-based sessionization and time-window
  * histograms (the batch duals of the Structured Streaming pipeline in
  * graft.streaming).
  *
  * Sessionization is one shuffle (partition by user) + one window pass;
  * the per-user partitioning is exactly how it scales on a cluster — each
  * user's timeline is processed locally after the shuffle, and AQE handles
  * skewed users.
  */
object Sessionize {

  /** Per-user session stats with a gap threshold: a new session starts when
    * the time since the previous event exceeds `gapSeconds`. Output:
    * (user_id, n_events, n_sessions). */
  def sessionStats(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts"))
            > gapSeconds * 1000L, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("new_session")).as("n_sessions"))
  }

  /** Tumbling-window histogram: events per (hour, event_type) — the batch
    * form of the streaming windowed count. */
  def hourlyHistogram(events: DataFrame): DataFrame =
    events.groupBy(date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"))

  /** Trailing-window features: for EVERY event, count + integral sum over
    * the same user's events in [ts − window, ts] — the point-in-time
    * rolling feature a training pipeline attaches to each example. A RANGE
    * frame over the micros-since-epoch ordering computes all rows in one
    * partitioned window pass (one shuffle, running frame state — never a
    * per-event self-join); equal timestamps are peers, included together
    * on both engines per the SQL standard. */
  def rollingUserStats(events: DataFrame,
      windowMicros: Long = 3600000000L): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-windowMicros, 0)
    events.select(col("event_id"), col("user_id"),
      count(lit(1)).over(w).as("n_trailing"),
      sum(col("event_id")).over(w).as("sum_eid_trailing"))
  }
}
