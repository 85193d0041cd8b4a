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
  *    that stage (jaccardPairs, minhashDedupPairs, lshCandidatePairs,
  *    knnLsh, nearDupPairs, contamination, knnIvfWith) therefore trigger
  *    work at call time, not first action.
  *  - the cached blocks stay pinned until released. Every barrier is
  *    tracked per session; call [[releaseAll]] when a batch of staged
  *    queries is done (or [[release]] for one frame). Tracking is dropped
  *    automatically when the session's context ends.
  */
object Stage {
  private val staged =
    new ConcurrentHashMap[SparkSession, java.util.Set[DataFrame]]()
  private val hooked = ConcurrentHashMap.newKeySet[SparkSession]()

  def barrier(df: DataFrame): DataFrame = {
    val cached = df.cache()
    cached.count()
    track(cached)
    cached
  }

  private def track(df: DataFrame): Unit = {
    val s = df.sparkSession
    if (hooked.add(s)) {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          staged.remove(s); hooked.remove(s)
        }
      })
    }
    staged.computeIfAbsent(s, _ => ConcurrentHashMap.newKeySet[DataFrame]())
      .add(df)
  }

  /** Unpersist one staged frame and stop tracking it. Consumers that read
    * it afterwards recompute from source — release only after the staged
    * results are no longer needed. */
  def release(df: DataFrame): Unit = {
    df.unpersist()
    val set = staged.get(df.sparkSession)
    if (set != null) set.remove(df)
  }

  /** Unpersist every frame staged in `s` since the last release. */
  def releaseAll(s: SparkSession): Unit = {
    val set = staged.remove(s)
    if (set != null) set.forEach(_.unpersist())
  }

  /** Currently-tracked barrier count for `s` (diagnostics / specs). */
  def stagedCount(s: SparkSession): Int = {
    val set = staged.get(s)
    if (set == null) 0 else set.size()
  }
}
