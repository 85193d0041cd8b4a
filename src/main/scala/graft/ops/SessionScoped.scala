package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** A per-(SparkSession, key) memo for staged DataFrames and driver-side
  * metadata, with an explicit lifecycle:
  *
  *  - compute is SERIALIZED per key via a lazy holder: `computeIfAbsent`
  *    only allocates the (cheap) holder under the map's bin lock; the
  *    multi-job `Stage.barrier` materialization runs when the holder is
  *    first forced, outside that lock, and a concurrent caller blocks on
  *    the holder instead of double-staging. This also removes the old
  *    lost-race discard path, which could unpersist cache blocks the
  *    winner shared (Spark's CacheManager keys entries by analyzed plan,
  *    so two racers' barriers usually landed on ONE cache entry).
  *  - entries for a session are dropped when that session's context ends
  *    (a `SparkListener` registered on first use), so stopped sessions
  *    don't retain DataFrames — and their pinned cache lineage — forever.
  *  - `evict(session)` releases eagerly for long-lived sessions, and every
  *    instance is evicted by `Stage.releaseAll(session)` (a global release
  *    hook): a memo that outlived its staged frame's cache would hand out
  *    an unpersisted DataFrame that recomputes from source on every
  *    action. Eviction instead makes the next access recompute — and
  *    re-stage — fresh (rebuild-on-touch).
  */
final class SessionScoped[V] {
  private final class Holder(compute: () => V) { lazy val value: V = compute() }

  private val map = new ConcurrentHashMap[(SparkSession, String), Holder]()
  private val hooked = ConcurrentHashMap.newKeySet[SparkSession]()
  SessionScoped.register(this)

  private def hook(s: SparkSession): Unit =
    if (hooked.add(s)) {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          evict(s)
          hooked.remove(s) // only here — see evict's duplicate-guard note
        }
      })
    }

  def getOrCompute(s: SparkSession, key: String)(compute: => V): V = {
    hook(s)
    // holder allocation is lock-cheap; forcing `value` (the real work,
    // possibly multi-job) happens outside the map's bin lock, and any
    // concurrent caller for the same key blocks on the holder's lazy init
    map.computeIfAbsent((s, key), _ => new Holder(() => compute)).value
  }

  /** All live values across sessions (e.g. oracle generation, which runs
    * after the queries and has no session handle of its own). */
  def allValues: Seq[V] = {
    val out = Seq.newBuilder[V]
    map.values().forEach(v => out += v.value)
    out.result()
  }

  /** Entries for `s`, e.g. to release staged frames before dropping them. */
  def valuesFor(s: SparkSession): Seq[V] = {
    val it = map.entrySet().iterator()
    val out = Seq.newBuilder[V]
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq s) out += e.getValue.value
    }
    out.result()
  }

  def evict(s: SparkSession): Unit = {
    val it = map.keySet().iterator()
    while (it.hasNext) if (it.next()._1 eq s) it.remove()
    // `hooked` membership is NOT cleared here: the application-end
    // listener stays registered on the shared bus either way, so
    // removing the guard would make the next getOrCompute on a live
    // session register a DUPLICATE listener — hundreds of releaseAll →
    // reuse cycles (the bench loop) would accumulate thousands of
    // listeners, each iterated per event. The entry dies with the
    // session via the listener itself.
  }

  def size: Int = map.size()
}

object SessionScoped {
  // weak set: an instance is only a query-object static today, but a
  // dropped instance must not be pinned here forever
  private val instances = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[SessionScoped[_], java.lang.Boolean]())

  private def register(i: SessionScoped[_]): Unit = {
    instances.synchronized { instances.add(i) }
    hookOnce
  }

  // one global Stage hook, installed on first instance construction
  private lazy val hookOnce: Unit =
    Stage.onReleaseAllGlobal { s =>
      val snapshot = instances.synchronized {
        val b = Seq.newBuilder[SessionScoped[_]]
        instances.forEach(b += _)
        b.result()
      }
      snapshot.foreach(_.evict(s))
    }
}
