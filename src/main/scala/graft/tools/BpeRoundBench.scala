package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures [[graft.ops.TextAnalysis.bpeTrain]]'s driver-iteration scale
  * shape: one distributed pair-count + 1-row argmax job per merge round.
  * Times the training at two merge counts on the same corpus; the slope
  * ((t2 − t1) / (n2 − n1)) is the per-round floor, and the intercept is
  * the shared word-frequency build. A production tokenizer run is 32k —
  * 100k rounds, so rounds × floor dominates: the scaladoc documents the
  * shape with this measured number (BENCH_NOTES r14).
  *
  * Usage: BpeRoundBench [sfDir] [n1] [n2]  (defaults: target/sf1, 8, 24)
  */
object BpeRoundBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf1")
    val n1 = args.lift(1).map(_.toInt).getOrElse(8)
    val n2 = args.lift(2).map(_.toInt).getOrElse(24)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables(spark, sfDir).documents
    def time(n: Int, batch: Int = 1): (Double, Long) = {
      val rounds = new java.util.concurrent.atomic.AtomicLong()
      val t0 = System.nanoTime()
      graft.ops.TextAnalysis.bpeTrain(docs, nMerges = n,
        batchSize = batch, roundsOut = Some(rounds)).count()
      ((System.nanoTime() - t0) / 1e9, rounds.get())
    }
    time(2) // warm the word-frequency path + codegen
    val (t1, _) = time(n1)
    val (t2, _) = time(n2)
    val perRound = (t2 - t1) / (n2 - n1)
    // batched mode at the larger merge count: same per-round floor,
    // fewer rounds — rounds/merge is the lever the knob buys
    val batch = args.lift(3).map(_.toInt).getOrElse(4)
    val (tb, rb) = time(n2, batch)
    println(s"""{"metric":"bpe_round_floor","sf":"$sfDir",""" +
      s""""n1":$n1,"t1_sec":$t1,"n2":$n2,"t2_sec":$t2,""" +
      f""""per_round_sec":$perRound%.3f,""" +
      f""""projected_32k_rounds_hours":${perRound * 32000 / 3600}%.1f,""" +
      s""""batch":$batch,"batched_t_sec":$tb,"batched_rounds":$rb,""" +
      f""""batched_rounds_per_merge":${rb.toDouble / n2}%.3f,""" +
      // anchored on the MEASURED batched marginal cost per merge
      // ((tb − intercept)/n2, intercept = the shared word-frequency
      // build the serial slope also subtracts), not the serial floor ×
      // round ratio: a batched round folds B regexp passes into its
      // projection, which the serial floor omits
      f""""projected_32k_merges_batched_hours":${
        math.max(tb - (t1 - perRound * n1), 0) / n2 * 32000 / 3600}%.1f}""")
    spark.stop()
  }
}
