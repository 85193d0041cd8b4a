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

  /** The gap rule in ONE place — per-user (ts, event_id)-ordered window
    * plus the `new_session` flag (strict >, millis arithmetic, NULL prev
    * opens a session). [[sessionStats]], [[sessionIntervals]] and the
    * streaming dual's spec all depend on this exact predicate; a single
    * definition keeps them from desynchronizing. Returns the flagged
    * frame and the window (for callers that add running sums over it). */
  private def withNewSessionFlag(events: DataFrame, gapSeconds: Long)
      : (DataFrame, org.apache.spark.sql.expressions.WindowSpec) = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    (events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts"))
            > gapSeconds * 1000L, 1L).otherwise(0L)), w)
  }

  /** Per-user session stats with a gap threshold: a new session starts when
    * the time since the previous event exceeds `gapSeconds`. Output:
    * (user_id, n_events, n_sessions). */
  def sessionStats(events: DataFrame, gapSeconds: Long = 1800L): DataFrame =
    withNewSessionFlag(events, gapSeconds)._1
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("new_session")).as("n_sessions"))

  /** Tumbling-window histogram: events per (hour, event_type) — the batch
    * form of the streaming windowed count. */
  def hourlyHistogram(events: DataFrame): DataFrame =
    events.groupBy(date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"))

  /** Sliding (hopping) window histogram: each event lands in
    * duration/slide overlapping windows aligned to the epoch slide grid —
    * the batch dual of Structured Streaming's
    * `window(ts, "1 hour", "30 minutes")`. Spark expands the windows at
    * the expression level (a duration/slide-way explode) and then it is
    * ONE partial-aggregating shuffle on (window, type) — no self-join.
    * Window starts are exact integer micro arithmetic, so the assignment
    * replays verbatim in any engine. */
  def hoppingHistogram(events: DataFrame, duration: String = "1 hour",
      slide: String = "30 minutes"): DataFrame =
    events.groupBy(window(col("ts"), duration, slide), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("event_type"), col("cnt"))

  /** Gap sessions WITH boundaries: (user_id, session_id, session_start,
    * session_end, session_n_events). session_id is the running count of
    * session starts per user — stable under the (ts, event_id) total
    * order. Same one-shuffle shape as [[sessionStats]]. */
  def sessionIntervals(events: DataFrame,
      gapSeconds: Long = 1800L): DataFrame = {
    val (flagged, w) = withNewSessionFlag(events, gapSeconds)
    flagged
      .withColumn("session_id", sum(col("new_session"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("session_n_events"))
  }

  /** Funnel analysis: how far each user progresses through an ORDERED step
    * sequence (default view → click → purchase), advancing one stage at a
    * time on the first qualifying event. One shuffle groups each user's
    * timeline; the scan is a fold over the time-sorted event array with
    * codegen'd higher-order functions — no UDF, no per-step self-join
    * (the k-way join formulation shuffles the events table k times; this
    * shuffles it once). The (ts, event_id, type) struct sort is a total
    * order, so stage assignment is deterministic under ties. */
  def funnelStages(events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    // step names are interpolated into SQL — escape backslashes FIRST,
    // then quotes: Spark string literals process backslash escapes, so
    // a trailing backslash would swallow the closing quote (parse
    // error) and an unescaped "\n" would silently become a newline and
    // never match its events
    val enc = steps.zipWithIndex
      .map { case (s, i) =>
        val esc = s.replace("\\", "\\\\").replace("'", "\\'")
        s"WHEN '$esc' THEN ${i + 1}" }.mkString(" ")
    events
      .groupBy(col("user_id"))
      .agg(array_sort(collect_list(struct(col("ts"), col("event_id"),
        col("event_type")))).as("seq"))
      .withColumn("stage", expr(
        s"aggregate(transform(seq, e -> CASE e.event_type $enc ELSE 0 END)" +
          ", 0, (acc, t) -> CASE WHEN t = acc + 1 THEN acc + 1 ELSE acc END)")
        .cast("long"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("user_id")).cast("long").as("sum_uid"))
  }

  /** Interval-containment attribution: each point row lands in the session
    * interval that contains it — an equi-join on the user key with the
    * range predicate as join residual (sort-merge on user_id; the interval
    * side is bounded per user, so no unkeyed range-join blowup). */
  def attributeToSessions(points: DataFrame, sessions: DataFrame,
      tsCol: String = "ts"): DataFrame =
    points.join(sessions, Seq("user_id"))
      .filter(col(tsCol) >= col("session_start") &&
        col(tsCol) <= col("session_end"))

  /** Bounded-interval attribution PAIRS: every (purchase, click) pair of
    * the same user with the click inside the `lookbackMinutes` window
    * ending at the purchase — the marketing-attribution / feature-join
    * shape whose streaming dual is Structured Streaming's watermarked
    * stream-stream interval join ([[graft.streaming.EventStream
    * .clickAttribution]] applies the IDENTICAL predicate to two
    * watermarked streams; the spec asserts pair-set equality). An
    * equi-join on the user key with the time range as join residual —
    * never an unkeyed range join — and the interval bound is what keeps
    * the streaming side's buffered state finite. */
  def attributionPairs(purchases: DataFrame, clicks: DataFrame,
      lookbackMinutes: Int = 30): DataFrame =
    purchases
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
      .join(clicks.select(col("event_id").as("click_id"),
        col("user_id"), col("ts").as("c_ts")), Seq("user_id"))
      .filter(col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $lookbackMinutes MINUTES"))
      .select(col("purchase_id"), col("user_id"), col("click_id"))

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
