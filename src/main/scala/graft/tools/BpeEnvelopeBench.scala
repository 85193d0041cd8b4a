package graft.tools

import org.apache.spark.sql.SparkSession

/** The BPE batching OPERATING ENVELOPE (VERDICT r15 #1): trains the
  * serial reference table to a few hundred merges, then re-trains with
  * batchSize ∈ {16, 64, 256} and reports, per batch size:
  *
  *   - rounds and rounds/merge (the lever the knob buys),
  *   - wall time vs serial,
  *   - acceptance rate = merges / (rounds × batch) — how much of each
  *     candidate batch the prefix-disjoint rule actually admits,
  *   - merge-table drift vs serial: common-SET fraction over (l, r)
  *     pairs and the longest common PREFIX of the rank order — the
  *     quality trade the scaladoc names ("may otherwise pick a
  *     different merge table — the standard batched-BPE trade"),
  *     now a number.
  *
  * Usage: BpeEnvelopeBench [sfDir] [nMerges] [batchSizes...]
  *   (defaults: target/sf1, 256, 16 64 256)
  */
object BpeEnvelopeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf1")
    val nMerges = args.lift(1).map(_.toInt).getOrElse(256)
    val batches =
      if (args.length > 2) args.drop(2).map(_.toInt).toSeq
      else Seq(16, 64, 256)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables(spark, sfDir).documents

    def train(batch: Int): (Seq[(String, String)], Double, Long) = {
      val rounds = new java.util.concurrent.atomic.AtomicLong()
      val t0 = System.nanoTime()
      val tbl = graft.ops.TextAnalysis.bpeTrain(docs, nMerges = nMerges,
          batchSize = batch, roundsOut = Some(rounds))
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      ((tbl, (System.nanoTime() - t0) / 1e9, rounds.get()))
    }

    graft.ops.TextAnalysis.bpeTrain(docs, nMerges = 2).count() // warm
    val (serial, tSerial, _) = train(1)
    val arms = batches.map { b =>
      val (tbl, t, rounds) = train(b)
      val common = tbl.toSet.intersect(serial.toSet).size
      val prefix = tbl.zip(serial).takeWhile { case (a, s) => a == s }.size
      (s""""b$b":{"batch":$b,"wall_sec":${math.round(t * 100) / 100.0},""" +
        s""""rounds":$rounds,""" +
        f""""rounds_per_merge":${rounds.toDouble / tbl.size}%.3f,""" +
        f""""acceptance":${tbl.size.toDouble / (rounds * b)}%.3f,""" +
        s""""n_merges":${tbl.size},"common_with_serial":$common,""" +
        f""""common_frac":${common.toDouble / serial.size}%.3f,""" +
        s""""rank_prefix_agree":$prefix}""")
    }
    println(s"""{"metric":"bpe_envelope","sf":"$sfDir",""" +
      s""""n_merges":$nMerges,""" +
      s""""serial_wall_sec":${math.round(tSerial * 100) / 100.0},""" +
      arms.mkString(",") + "}")
    spark.stop()
  }
}
