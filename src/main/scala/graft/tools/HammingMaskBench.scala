package graft.tools

import org.apache.spark.sql.SparkSession

/** Back-to-back A/B of [[graft.ops.Dedup.hammingNearDupPairs]]' r14
  * surviving-block mask (the per-row over-cap long through the kernel's
  * (blk, key, tile) exchange) against the legacy maskless all-blocks
  * rule, on the SAME staged signature relation q_simhash_neardup
  * benches. The rail never fires on this corpus, so the two rules emit
  * identical pairs (asserted) — the delta IS the mask carry cost the
  * pre-r14 scaladoc asserted was "real bytes on every hot-shuffle row"
  * without measuring it.
  *
  * Usage: HammingMaskBench [sfDir] [reps]  (defaults: target/sf1, 3)
  */
object HammingMaskBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_SKEW_STAGES=1 → per-stage task-time table (StageSpread)
    if (sys.env.contains("SPARK_GRAFT_SKEW_STAGES"))
      spark.sparkContext.addSparkListener(graft.SkewBench.stageSpread())

    val docs = graft.queries.DedupSim.docsWithMutants(spark, sfDir)
    // stage signatures ONCE, outside both timers (simhashNearDupPairs'
    // own posture) — the A/B isolates the kernel pipeline
    val sigs = graft.ops.Stage.barrier(graft.ops.Dedup.simhashes(docs))
    def run(surviving: Boolean): (Double, Long) = {
      var n = 0L
      val t = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        n = graft.ops.Dedup.hammingNearDupPairs(sigs,
          survivingBlocks = surviving).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      (t, n)
    }
    // interleave would be better against drift, but reps=3 min-of each
    // back-to-back matches the BENCH_NOTES protocol for A/B adjudication
    println("=== PHASE legacy (survivingBlocks=false) ===")
    val (tOff, nOff) = run(surviving = false)
    println("=== PHASE mask (survivingBlocks=true) ===")
    val (tOn, nOn) = run(surviving = true)
    assert(nOn == nOff, s"pair counts diverged: on=$nOn off=$nOff " +
      "(rail fired on this corpus?)")
    println(s"""{"metric":"hamming_mask_ab","sf":"$sfDir","reps":$reps,""" +
      s""""pairs":$nOn,"legacy_sec":$tOff,"mask_sec":$tOn,""" +
      f""""overhead_pct":${(tOn / tOff - 1.0) * 100}%.1f}""")
    graft.ops.Stage.releaseAll(spark)
    spark.stop()
  }
}
