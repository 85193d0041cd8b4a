package graft.ops

import org.apache.spark.storage.StorageLevel

import graft.SparkSpec

class StageSpec extends SparkSpec {

  test("barrier materializes + tracks; release unpersists + untracks") {
    val before = Stage.stagedCount(spark)
    val src = spark.range(100).toDF("n")
    val c = Stage.barrier(src)
    // r20: barrier returns a PLAN-TRUNCATED leaf over the materialized
    // cache entry (its own plan matches no CacheManager entry, so its
    // storageLevel reads NONE); the ORIGINAL plan is the cached one
    assert(org.apache.spark.sql.graftbridge.Bridge.isCachedLeaf(c))
    assert(src.storageLevel != StorageLevel.NONE)
    assert(Stage.stagedCount(spark) == before + 1)
    Stage.release(c) // release accepts the leaf and unpersists through it
    assert(src.storageLevel == StorageLevel.NONE)
    assert(Stage.stagedCount(spark) == before)
  }

  test("SessionScoped computes once per key and evicts per session") {
    val scoped = new SessionScoped[java.lang.Integer]
    var calls = 0
    def v = scoped.getOrCompute(spark, "k") { calls += 1; calls }
    assert(v == 1 && v == 1 && calls == 1)
    assert(scoped.getOrCompute(spark, "k2") { calls += 1; calls } == 2)
    assert(scoped.allValues.toSet == Set(1, 2))
    scoped.evict(spark)
    assert(scoped.size == 0)
    assert(v == 3) // recomputed after eviction
  }

  test("releaseAll unpersists everything, fires hooks, and memoized " +
      "holders rebuild-on-touch") {
    var hookFired = 0
    Stage.onReleaseAll(spark, () => hookFired += 1)
    // a SessionScoped memo over a staged frame — the pattern OsmQueries
    // and the ANN centroid cache use
    val scoped = new SessionScoped[org.apache.spark.sql.DataFrame]
    var computes = 0
    def staged = scoped.getOrCompute(spark, "frame") {
      computes += 1
      Stage.barrier(spark.range(50).toDF("n"))
    }
    val first = staged
    assert(computes == 1 && Stage.stagedCount(spark) >= 1)
    // r20 leaf contract: the staged frame is a cache-leaf over the
    // pinned entry (the count below reads it without recompute)
    assert(org.apache.spark.sql.graftbridge.Bridge.isCachedLeaf(first))

    Stage.releaseAll(spark)
    assert(hookFired == 1)
    assert(Stage.stagedCount(spark) == 0) // between-queries invariant
    // the memo was evicted with the cache: next touch re-computes AND
    // re-stages, rather than handing back the unpersisted frame
    val second = staged
    assert(computes == 2)
    assert(org.apache.spark.sql.graftbridge.Bridge.isCachedLeaf(second))
    assert(second.count() == 50)
    Stage.releaseAll(spark)
    assert(hookFired == 2) // hooks persist across release cycles
  }

  test("SessionScoped serializes racing computes: one winner, no discard") {
    import java.util.concurrent.{Callable, CyclicBarrier, Executors, TimeUnit}
    val scoped = new SessionScoped[java.lang.Integer]
    val calls = new java.util.concurrent.atomic.AtomicInteger
    val start = new CyclicBarrier(8)
    val pool = Executors.newFixedThreadPool(8)
    try {
      val futures = (1 to 8).map(_ => pool.submit(new Callable[Integer] {
        override def call(): Integer = {
          start.await(5, TimeUnit.SECONDS) // all 8 enter simultaneously
          scoped.getOrCompute(spark, "race") {
            Thread.sleep(100) // widen the window a lost race would need
            Integer.valueOf(calls.incrementAndGet())
          }
        }
      }))
      // the per-key holder runs compute exactly once; before this fix,
      // racers double-staged and the loser's discard could unpersist the
      // winner's shared cache entry
      assert(futures.map(_.get(30, TimeUnit.SECONDS)).toSet == Set(1))
      assert(calls.get() == 1)
    } finally pool.shutdown()
  }
}
