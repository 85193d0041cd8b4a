package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew measurement harness (see BENCH_NOTES.md for recorded results):
  * one hot key owning 50% of a 20M-row relation, exercised through
  *
  *  - groupBy count/sum, unsalted vs ops.Salting.saltedCountSum — expected
  *    ≈ equal: map-side partial aggregation already shuffles one row per
  *    (key, partition), so key skew never reaches the wire;
  *  - a sort-merge join against a small-but-not-broadcastable dim,
  *    plain (AQE skew-join off), salted (ops.Salting.saltedJoin, AQE
  *    skew-join off), and plain with AQE skew-join on — the case where
  *    one reducer otherwise sorts+joins 10M rows while 31 idle.
  *
  * Each measurement runs twice; the warm (second) time is reported.
  * Pass a case name as arg(0) to run ONE case per JVM — measured here,
  * sequential in-process join measurements pollute each other by ~2.5×
  * (accumulated shuffle files + GC pressure), so the recorded numbers run
  * each case in its own process. Even then, JVM-to-JVM wall-time variance
  * on this box reaches several ×: record interleaved A/B/A/B medians, and
  * trust the per-stage task spread (SPARK_GRAFT_SKEW_STAGES=1) over wall
  * time — max-task vs mean-task is the straggler, directly.
  */
object SkewBench {
  private def timed(f: => Long): (Double, Long) = {
    f // warm: JIT + shuffle files for this exact plan shape
    val t0 = System.nanoTime()
    val n = f
    ((System.nanoTime() - t0) / 1e9, n)
  }

  /** SPARK_GRAFT_SKEW_STAGES=1 → per-stage task-time spread, the direct
    * evidence for (or against) a straggler: wall ≈ max task, skew ≈
    * max/mean. */
  private final class StageSpread extends org.apache.spark.scheduler.SparkListener {
    import org.apache.spark.scheduler._
    private val times = new java.util.concurrent.ConcurrentHashMap[Int, java.util.List[Long]]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      times.computeIfAbsent(t.stageId,
        _ => java.util.Collections.synchronizedList(new java.util.ArrayList[Long]()))
        .add(t.taskInfo.duration)
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val ts = Option(times.get(s.stageInfo.stageId))
        .map(l => { import scala.jdk.CollectionConverters._; l.asScala.toSeq })
        .getOrElse(Seq.empty)
      if (ts.nonEmpty) {
        val mx = ts.max / 1e3; val mean = ts.sum.toDouble / ts.size / 1e3
        println(f"  stage ${s.stageInfo.stageId}%3d ${s.stageInfo.name.takeWhile(_ != ' ')}%-22s tasks=${ts.size}%3d max=${mx}%6.2fs mean=${mean}%6.2fs skew=${mx / math.max(mean, 1e-9)}%5.1fx")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("SPARK_GRAFT_SKEW_STAGES"))
      spark.sparkContext.addSparkListener(new StageSpread)

    val rows = sys.env.getOrElse("SPARK_GRAFT_SKEW_ROWS", "20000000").toLong
    // SPARK_GRAFT_SKEW_PAYLOAD=N widens each row by an N-char hash-derived
    // string (deterministic, poorly compressible): AQE's skew split keys
    // off ACTUAL compressed partition bytes (skewedPartitionThresholdInBytes,
    // default 256MB), and 20M rows of (tiny key, sequential long) compress
    // far below it — the r8 finding that the split "did NOT trigger" is a
    // statement about partition BYTES, not row counts. The payload makes a
    // row cost what a real document row costs, so the threshold crossing
    // can be measured rather than asserted (VERDICT r9 #8).
    val payload = sys.env.getOrElse("SPARK_GRAFT_SKEW_PAYLOAD", "0").toInt
    val payloadCols =
      if (payload <= 0) Seq(col("id").as("v"))
      else Seq(col("id").as("v"),
        // repeat a 32-hex block derived from id: unique per row, so runs
        // of rows share no bytes and lz4 gains little
        substring(repeat(md5(col("id").cast("string")), payload / 32 + 1),
          1, payload).as("pay"))
    // 50% of rows share key "hot"; the rest spread over 1000 cold keys
    val big = graft.ops.Stage.barrier(spark.range(rows).select(
      when(col("id") % 2 === 0, lit("hot"))
        .otherwise(concat(lit("k"), col("id") % 1000)).as("key") +: payloadCols: _*))
    val dim = graft.ops.Stage.barrier(spark.range(1001).select(
      when(col("id") === 1000, lit("hot"))
        .otherwise(concat(lit("k"), col("id"))).as("key"),
      (col("id") * 7).as("w")))

    def aggUnsalted() =
      big.groupBy(col("key")).agg(count(lit(1)), sum(col("v"))).count()
    def aggSalted() =
      graft.ops.Salting.saltedCountSum(big, "key", "v", "v").count()

    def joinCount(salted: Boolean): Long = {
      val joined =
        if (salted) graft.ops.Salting.saltedJoin(big, dim, "key", "v")
        else big.join(dim, Seq("key"))
      joined.groupBy(col("key")).agg(sum(col("w"))).count()
    }
    def withConf[T](pairs: (String, String)*)(f: => T): T = {
      val prev = pairs.map { case (k, _) => k -> spark.conf.get(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try f finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
    }

    val noBroadcast = "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    val skewOff = "spark.sql.adaptive.skewJoin.enabled" -> "false"
    val cases: Map[String, () => (Double, Long)] = Map(
      "agg_unsalted" -> (() => timed(aggUnsalted())),
      "agg_salted" -> (() => timed(aggSalted())),
      "join_plain_noskewhandling" ->
        (() => withConf(noBroadcast, skewOff)(timed(joinCount(salted = false)))),
      "join_salted" ->
        (() => withConf(noBroadcast, skewOff)(timed(joinCount(salted = true)))),
      "join_plain_aqe_skewjoin" ->
        (() => withConf(noBroadcast)(timed(joinCount(salted = false)))))
    val selected =
      if (args.nonEmpty) Seq(args(0)) else cases.keys.toSeq.sorted
    selected.foreach { name =>
      val (sec, n) = cases(name)()
      println(f"""{"case":"$name","sec":$sec%.2f,"rows":$n}""")
    }
    spark.stop()
  }
}
