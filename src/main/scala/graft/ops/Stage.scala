package graft.ops

import org.apache.spark.sql.DataFrame

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
  */
object Stage {
  def barrier(df: DataFrame): DataFrame = {
    val cached = df.cache()
    cached.count()
    cached
  }
}
