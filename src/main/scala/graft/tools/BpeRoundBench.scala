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
    def time(n: Int): Double = {
      val t0 = System.nanoTime()
      graft.ops.TextAnalysis.bpeTrain(docs, nMerges = n).count()
      (System.nanoTime() - t0) / 1e9
    }
    time(2) // warm the word-frequency path + codegen
    val t1 = time(n1)
    val t2 = time(n2)
    val perRound = (t2 - t1) / (n2 - n1)
    println(s"""{"metric":"bpe_round_floor","sf":"$sfDir",""" +
      s""""n1":$n1,"t1_sec":$t1,"n2":$n2,"t2_sec":$t2,""" +
      f""""per_round_sec":$perRound%.3f,""" +
      f""""projected_32k_rounds_hours":${perRound * 32000 / 3600}%.1f}""")
    spark.stop()
  }
}
