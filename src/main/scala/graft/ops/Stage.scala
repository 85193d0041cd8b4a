package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Staging barrier for self-joined intermediates.
  *
  * A lazily-cached DataFrame referenced from BOTH sides of a self-join is
  * computed concurrently by every branch of the first job that touches it
  * (blocks dedupe only on write — the "Block rdd_N already exists" race),
  * so the whole upstream pipeline runs once per branch. Materializing the
  * cache with a cheap action first makes the upstream run exactly once;
  * the self-join then reads memory. This is the staged-pipeline pattern
  * (persist + count) used by iterative ML workloads, and it matters at any
  * scale — on a 1000-executor cluster a duplicated upstream is a duplicated
  * shuffle.
  *
  * LIFECYCLE — read before calling from a long-lived session:
  *  - `barrier` is EAGER: it runs one Spark job (the materializing count)
  *    inside what would otherwise be pure plan construction. Library ops
  *    that stage therefore trigger work at call time, not first action —
  *    the authoritative list of such ops is `grep -rl Stage.barrier
  *    src/main/scala` (it has grown every round; a prose list here kept
  *    drifting stale).
  *  - the cached blocks stay pinned until released. Every barrier is
  *    tracked per session; call [[releaseAll]] when a batch of staged
  *    queries is done (or [[release]] for one frame). Tracking is dropped
  *    automatically when the session's context ends.
  *  - holders that MEMOIZE staged frames (OsmPipeline's relation memos,
  *    SessionScoped caches) register an [[onReleaseAll]] hook so a
  *    session-wide release also invalidates the memo — otherwise the
  *    memo would keep handing out an unpersisted frame that silently
  *    recomputes from source on every action instead of re-staging.
  *    Rebuild-on-touch is the contract: the first access after a release
  *    re-runs the barrier.
  */
object Stage {
  private val staged =
    new ConcurrentHashMap[SparkSession, java.util.Set[DataFrame]]()
  private val hooked = ConcurrentHashMap.newKeySet[SparkSession]()
  private val releaseHooks =
    new ConcurrentHashMap[SparkSession, java.util.Set[() => Unit]]()
  private val globalReleaseHooks =
    ConcurrentHashMap.newKeySet[SparkSession => Unit]()

  // leaf frame → (original cached frame, cache-entry key): release(leaf)
  // must unpersist through the ORIGINAL (the leaf's own plan matches no
  // CacheManager entry) and drop the entry's memoized base leaf
  private val leafOriginal =
    new ConcurrentHashMap[DataFrame, (DataFrame, AnyRef)]()
  // cache entry (InMemoryRelation instance) → its ONE opaque base leaf:
  // repeated barriers over plan-equal inputs must return PLAN-EQUAL
  // frames (same LogicalRDD), or every downstream re-barrier would be a
  // cache miss on the second rep
  private val entryLeaf =
    new ConcurrentHashMap[AnyRef, DataFrame]()

  def barrier(df: DataFrame): DataFrame = barrierCounted(df)._1

  /** [[barrier]] plus the materializing count's VALUE — for callers that
    * need the staged frame's row count anyway (components' rail sizing):
    * the barrier already ran the count job, so a separate `.count()`
    * action over the fresh cache is a pure job-round-trip duplicate
    * (measured ~30–50 ms per action at bench scale, r21). */
  def barrierCounted(df: DataFrame): (DataFrame, Long) = {
    val cached = df.cache()
    // unpersist on a FAILED materialization: cache() registers the plan
    // in the CacheManager immediately, so a count() that throws
    // (executor loss, ANSI overflow inside the staged plan) would
    // otherwise leave a registered-but-untracked entry — plus any
    // partially materialized blocks — that releaseAll (which only walks
    // the tracked set) could never release
    val n = try cached.count()
    catch {
      case t: Throwable =>
        try cached.unpersist(blocking = false) catch { case _: Throwable => }
        throw t
    }
    track(cached)
    // PLAN-SIZE TRUNCATION (r20): hand consumers an OPAQUE leaf over the
    // materialized cache entry instead of the original plan. cache()
    // alone truncates nothing — composed staged pipelines multiply
    // upstream trees into every downstream plan (the curation chain's
    // description reached ~200k lines) and AQE re-renders that
    // description per stage (~70% of the chain's driver wall measured in
    // generateTreeString). The leaf is one LogicalRDD line carrying the
    // entry's actual size stats + partitioning (Bridge.opaqueLeafOver);
    // it is memoized PER ENTRY so rep-over-rep barriers stay plan-equal,
    // with the caller's column names restored per call (cache lookup
    // ignores names). Lifecycle caveat: a caller that retains a leaf
    // across releaseAll and re-reads it will re-materialize the cache
    // untracked — memoized holders already drop their references via the
    // release hooks, which is the documented holder contract.
    (leafed(cached), n)
  }

  /** The size-gated opaque-leaf handle over an already-MATERIALIZED
    * cached frame — the shared tail of [[barrier]] and [[seal]]. */
  private def leafed(cached: DataFrame): DataFrame = {
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    bridge.cachedEntry(cached) match {
      // SIZE GATE: the leaf pays for its plan-size win by consuming the
      // cache through a row-RDD scan, losing InMemoryTableScan's
      // vectorized columnar decode and batch pruning for every
      // downstream read. For the KB–MB staged frames that drive the
      // composition blowup that is noise; for the few-hundred-MB edge/
      // pair caches the simhash family stages at sf ≥ 1 it measured
      // ~+40% on the iterative consumers (each round re-decodes the
      // cache). Entries above the threshold keep classic IMR
      // consumption — their render contribution stays bounded because
      // their own cached plans are built over (small) leaves. The
      // threshold is conf-tunable (`graft.stage.leafMaxBytes`); the
      // default comfortably covers every sf0.1 staged frame and excludes
      // the big sf ≥ 1 caches.
      case Some(entry) if bridge.entrySizeBytes(entry) <=
          BigInt(cached.sparkSession.conf
            .get("graft.stage.leafMaxBytes", (64L << 20).toString).toLong) =>
        val base = entryLeaf.computeIfAbsent(entry,
          e => bridge.opaqueLeafOver(e, cached.sparkSession))
        val named =
          base.toDF(cached.queryExecution.analyzed.output.map(_.name): _*)
        leafOriginal.put(named, (cached, entry))
        named
      case _ => cached
    }
  }

  /** Cache + track `df` WITHOUT materializing it — the fused-chain form
    * of [[barrier]] (guide §1.2: fewer actions): when a staged frame's
    * FIRST consumer is a later barrier in the same composition, that
    * barrier's own materializing count computes this entry as a side
    * effect (its plan reads through the registered cache), so an eager
    * count here would be a duplicate action round-trip. Returns the
    * CACHED frame (classic IMR consumption — downstream chain plans are
    * built over it); call [[seal]] AFTER the materializing barrier to
    * get the size-gated opaque leaf for the fan-out consumers.
    *
    * SAFETY CONTRACT (the reason [[barrier]] stays the default): the
    * materializing downstream plan must reference this frame exactly
    * ONCE. A plan referencing an UNMATERIALIZED cache entry from two
    * branches lets AQE submit both branches' leaf stages concurrently,
    * and each computes the entry's partitions (blocks dedupe only on
    * write) — the duplicated upstream run the barrier exists to
    * prevent. Single-reference chains have no concurrent reader, so the
    * entry materializes exactly once, inside the downstream action. */
  def defer(df: DataFrame): DataFrame = {
    val cached = df.cache()
    track(cached)
    cached
  }

  /** The opaque-leaf handle for a [[defer]]red frame, AFTER a downstream
    * barrier/action materialized it. Same size gate and release
    * bookkeeping as [[barrier]]'s returned frame. Calling it on an
    * entry that was never materialized is safe but mis-sizes the gate
    * (the entry's stats are still the optimizer estimate) — the defer/
    * seal pair is an intra-op pattern, not a public lifecycle. */
  def seal(cached: DataFrame): DataFrame = leafed(cached)

  /** Run `h` every time [[releaseAll]] fires for session `s` — the memo-
    * invalidation side of the release contract (see LIFECYCLE). Hooks live
    * until the session's context ends. */
  def onReleaseAll(s: SparkSession, h: () => Unit): Unit = {
    ensureHooked(s)
    releaseHooks
      .computeIfAbsent(s, _ => ConcurrentHashMap.newKeySet[() => Unit]())
      .add(h)
  }

  /** Like [[onReleaseAll]] but for every session — used by class-level
    * registries (SessionScoped) that exist before any session does. */
  def onReleaseAllGlobal(h: SparkSession => Unit): Unit =
    globalReleaseHooks.add(h)

  private def ensureHooked(s: SparkSession): Unit =
    if (hooked.add(s)) {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          staged.remove(s); releaseHooks.remove(s); hooked.remove(s)
        }
      })
    }

  private def track(df: DataFrame): Unit = {
    val s = df.sparkSession
    ensureHooked(s)
    staged.computeIfAbsent(s, _ => ConcurrentHashMap.newKeySet[DataFrame]())
      .add(df)
  }

  /** Unpersist one staged frame and stop tracking it. Consumers that read
    * it afterwards recompute from source — release only after the staged
    * results are no longer needed. */
  def release(df: DataFrame): Unit = {
    // a barrier-returned LEAF unpersists through its original frame (the
    // leaf's plan matches no CacheManager entry); anything else as before
    val mapped = leafOriginal.remove(df)
    val target = if (mapped != null) { entryLeaf.remove(mapped._2); mapped._1 }
                 else df
    target.unpersist()
    val set = staged.get(target.sparkSession)
    if (set != null) set.remove(target)
  }

  /** Unpersist every frame staged in `s` since the last release, after
    * first firing the registered memo-invalidation hooks (so holders drop
    * their references and re-stage on next touch rather than silently
    * recomputing from source). */
  def releaseAll(s: SparkSession): Unit = {
    globalReleaseHooks.forEach(h => h(s))
    val hooks = releaseHooks.get(s)
    if (hooks != null) hooks.forEach(h => h())
    val set = staged.remove(s)
    if (set != null) set.forEach(_.unpersist())
    // drop this session's leaf bookkeeping (the originals just released)
    leafOriginal.entrySet().removeIf { e =>
      val mine = e.getValue._1.sparkSession eq s
      if (mine) entryLeaf.remove(e.getValue._2)
      mine
    }
  }

  /** Currently-tracked barrier count for `s` (diagnostics / specs). */
  def stagedCount(s: SparkSession): Int = {
    val set = staged.get(s)
    if (set == null) 0 else set.size()
  }

  /** Run `body`, then release every barrier it staged — the bounded
    * per-iteration lifecycle a LONG-RUNNING loop needs (a foreachBatch
    * trigger, a maintenance sweep): each iteration's staged frames are
    * consumed inside `body`, and without a scope nothing could release
    * them (the frames are internal to the callee), so a stream pinning
    * 3 caches per trigger would fill executor storage and churn
    * eviction forever. Barriers staged BEFORE the scope are untouched.
    * Concurrency caveat: a barrier staged by ANOTHER thread during the
    * scope is released with it — harmless for correctness
    * (rebuild-on-touch) but it forfeits that frame's staging; keep
    * scopes to single-threaded loops. */
  def scoped[A](s: SparkSession)(body: => A): A = {
    val before = {
      val set = staged.get(s)
      if (set == null) java.util.Collections.emptySet[DataFrame]()
      else new java.util.HashSet[DataFrame](set)
    }
    try body
    finally {
      val set = staged.get(s)
      if (set != null) {
        val it = set.iterator()
        while (it.hasNext) {
          val df = it.next()
          if (!before.contains(df)) {
            try df.unpersist(blocking = false)
            catch { case _: Throwable => }
            it.remove()
          }
        }
      }
    }
  }
}
