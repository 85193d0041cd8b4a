package graft.ops

import org.apache.spark.storage.StorageLevel

import graft.SparkSpec

class StageSpec extends SparkSpec {

  test("barrier materializes + tracks; release unpersists + untracks") {
    val before = Stage.stagedCount(spark)
    val c = Stage.barrier(spark.range(100).toDF("n"))
    assert(c.storageLevel != StorageLevel.NONE)
    assert(Stage.stagedCount(spark) == before + 1)
    Stage.release(c)
    assert(c.storageLevel == StorageLevel.NONE)
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
}
