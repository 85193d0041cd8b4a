package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** A per-(SparkSession, key) memo for staged DataFrames and driver-side
  * metadata, with an explicit lifecycle:
  *
  *  - values compute OUTSIDE the map's bin lock (a `Stage.barrier` inside
  *    `computeIfAbsent` would run multi-job materialization while holding
  *    the lock); a losing racer discards its duplicate.
  *  - entries for a session are dropped when that session's context ends
  *    (a `SparkListener` registered on first use), so stopped sessions
  *    don't retain DataFrames — and their pinned cache lineage — forever.
  *  - `evict(session)` releases eagerly for long-lived sessions.
  */
final class SessionScoped[V] {
  private val map = new ConcurrentHashMap[(SparkSession, String), V]()
  private val hooked = ConcurrentHashMap.newKeySet[SparkSession]()

  private def hook(s: SparkSession): Unit =
    if (hooked.add(s)) {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          evict(s)
      })
    }

  /** `discard` releases a racer's duplicate when `putIfAbsent` loses —
    * without it a losing `Stage.barrier` result would stay pinned in the
    * block manager (and in Stage's tracked set) with no remaining caller. */
  def getOrCompute(s: SparkSession, key: String, discard: V => Unit = _ => ())(
      compute: => V): V = {
    hook(s)
    val k = (s, key)
    val existing = map.get(k)
    if (existing != null) existing
    else {
      val v = compute // outside any lock; racers may duplicate, first wins
      val prior = map.putIfAbsent(k, v)
      if (prior != null) { discard(v); prior } else v
    }
  }

  /** All live values across sessions (e.g. oracle generation, which runs
    * after the queries and has no session handle of its own). */
  def allValues: Seq[V] = {
    val out = Seq.newBuilder[V]
    map.values().forEach(v => out += v)
    out.result()
  }

  /** Entries for `s`, e.g. to release staged frames before dropping them. */
  def valuesFor(s: SparkSession): Seq[V] = {
    val it = map.entrySet().iterator()
    val out = Seq.newBuilder[V]
    while (it.hasNext) { val e = it.next(); if (e.getKey._1 eq s) out += e.getValue }
    out.result()
  }

  def evict(s: SparkSession): Unit = {
    val it = map.keySet().iterator()
    while (it.hasNext) if (it.next()._1 eq s) it.remove()
    hooked.remove(s)
  }

  def size: Int = map.size()
}
