package graft.ops

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Lazy fail-loud accounting for scale rails (`maxBucket`,
  * `maxBlockPairs`, ...).
  *
  * A rail drops degenerate key populations by POLICY, and the operator of
  * a 100 TB run must see the drop count — but counting the over-cap set
  * with an eager `count()` at operator-construction time turns a plan
  * TRANSFORMATION into 1-3 driver-side jobs per call (measured: the r11
  * fuzzy rail moved q_fuzzy_match 0.13 s → 0.51 s of fixed census
  * overhead) and is a composability smell: callers expect `df = op(...)`
  * to be free until their own action.
  *
  * [[observed]] keeps the accounting WITHOUT the eager jobs: the over-cap
  * census frame gets a `Dataset.observe` row-count metric, so the count is
  * collected as a side effect of whatever action first executes the plan
  * (the census is on the broadcast build side of the rail's anti join, so
  * it always executes), and a once-per-session QueryExecutionListener
  * turns any non-zero observation into the operator's warn log line. The
  * anti join itself runs UNCONDITIONALLY — broadcasting an empty over-cap
  * set costs next to nothing, which is the designed-for case (a rail, not
  * a filter).
  *
  * Metric names are `graft.rail.<kind>#<n>` — the `#n` suffix keeps names
  * unique when one query plan embeds the same operator twice (Spark
  * rejects duplicate observation names per query); the warn template is
  * registered once per rail KIND, so the registry stays O(#rail kinds).
  */
object Rail {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val seq = new AtomicLong()
  private val Prefix = "graft.rail."
  /** rail kind → warn template (one `%d` slot for the dropped count). */
  private val warnTemplates = new ConcurrentHashMap[String, String]()
  /** rail kind → most recent non-negative observed drop count (specs). */
  private val lastCounts = new ConcurrentHashMap[String, Long]()
  // weak + synchronized: a dedup guard must not PIN sessions — a
  // long-lived JVM creating short-lived sessions (newSession per tenant,
  // per-suite test sessions) would otherwise retain every one until
  // application end (onApplicationEnd fires once per app, not per
  // session). The session's own listener registry holds the listener;
  // this set only answers "already hooked?".
  private val hooked = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Attach lazy drop accounting to an over-cap census frame: the
    * returned frame carries a row-count observation that logs
    * `warnTemplate.format(count)` (once per completed action, via the
    * session listener) whenever the census is non-empty. Pure plan
    * construction — no job runs here. */
  def observed(overCap: DataFrame, kind: String,
      warnTemplate: String): DataFrame = {
    ensureListener(overCap.sparkSession)
    warnTemplates.put(kind, warnTemplate)
    overCap.observe(Prefix + kind + "#" + seq.incrementAndGet(),
      count(lit(1)).as("dropped"))
  }

  /** Row-screen variant of [[observed]]: attach the drop accounting to
    * the SURVIVING stream itself, counting rows matching `dropCond` —
    * for screens where the dropped rows have no census frame of their
    * own (e.g. NULL-signature rows filtered before blocking). The
    * observation sits ABOVE the screen's filter in the plan, so the
    * count executes with whatever action first runs the consumer.
    * Returns the observed frame; the caller applies its filter on top.
    * Pure plan construction — no job runs here. */
  def observedScreen(df: DataFrame, dropCond: org.apache.spark.sql.Column,
      kind: String, warnTemplate: String): DataFrame = {
    ensureListener(df.sparkSession)
    warnTemplates.put(kind, warnTemplate)
    df.observe(Prefix + kind + "#" + seq.incrementAndGet(),
      count(when(dropCond, lit(1))).as("dropped"))
  }

  /** The most recent observed drop count for a rail kind, if any action
    * over an [[observed]] plan has completed in this JVM — a spec hook
    * (observations arrive asynchronously; poll). */
  def observationSeen(kind: String): Option[Long] =
    Option(lastCounts.get(kind))

  /** Forget the last observation for a rail kind (spec isolation). */
  def clearObservation(kind: String): Unit = lastCounts.remove(kind)

  private def ensureListener(s: SparkSession): Unit =
    if (hooked.add(s)) {
      s.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith(Prefix) && !row.isNullAt(0)) {
              val kind = name.stripPrefix(Prefix).takeWhile(_ != '#')
              val dropped = row.getLong(0)
              lastCounts.put(kind, dropped)
              if (dropped > 0L) {
                val t = warnTemplates.get(kind)
                log.warn(
                  if (t != null) t.format(dropped)
                  else s"rail $kind dropped $dropped over-cap groups")
              }
            }
          }
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      })
      // no SparkListener cleanup hook: an anonymous listener on the
      // app-global context bus would CLOSE OVER the session strongly,
      // defeating the weak set above (the session would stay reachable
      // through the bus until application end — the exact leak the weak
      // set exists to prevent); the QueryExecutionListener is owned by
      // the session itself and dies with it
    }
}
