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

  /** [[StageSpread]] factory for sibling diagnostics ([[QueryStages]]). */
  private[graft] def stageSpread(): org.apache.spark.scheduler.SparkListener =
    new StageSpread

  /** SPARK_GRAFT_SKEW_STAGES=1 → per-stage task-time spread, the direct
    * evidence for (or against) a straggler: wall ≈ max task, skew ≈
    * max/mean. */
  private final class StageSpread extends org.apache.spark.scheduler.SparkListener {
    import org.apache.spark.scheduler._
    // per stage: task durations + per-task shuffle read bytes (the
    // quantity AQE's skew split thresholds on) + total write bytes
    private final case class T(dur: Long, read: Long, write: Long)
    private val times = new java.util.concurrent.ConcurrentHashMap[Int, java.util.List[T]]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      val rec =
        if (m == null) T(t.taskInfo.duration, 0L, 0L)
        else T(t.taskInfo.duration, m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten)
      times.computeIfAbsent(t.stageId,
        _ => java.util.Collections.synchronizedList(new java.util.ArrayList[T]()))
        .add(rec)
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val ts = Option(times.get(s.stageInfo.stageId))
        .map(l => { import scala.jdk.CollectionConverters._; l.asScala.toSeq })
        .getOrElse(Seq.empty)
      if (ts.nonEmpty) {
        val mx = ts.map(_.dur).max / 1e3
        val mean = ts.map(_.dur).sum.toDouble / ts.size / 1e3
        val maxRd = ts.map(_.read).max / 1e6
        val sumRd = ts.map(_.read).sum / 1e6
        val sumWr = ts.map(_.write).sum / 1e6
        println(f"  stage ${s.stageInfo.stageId}%3d ${s.stageInfo.name.takeWhile(_ != ' ')}%-22s tasks=${ts.size}%3d max=${mx}%6.2fs mean=${mean}%6.2fs skew=${mx / math.max(mean, 1e-9)}%5.1fx rdMax=${maxRd}%7.1fMB rdSum=${sumRd}%8.1fMB wrSum=${sumWr}%8.1fMB")
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

    // Execute the COMPILED plan, not a derived count: `df.count()` builds
    // a NEW query (count over the aggregate) and Catalyst prunes every
    // column the count doesn't reference — including the aggregate
    // expressions, and transitively the payload below the join. Measured
    // before this fix: 20M payload-64 rows "joined" as a 6MB shuffle of
    // bare keys, because only the group keys survived pruning. toRdd
    // runs the plan exactly as the query declares it.
    def force(df: DataFrame): Long = {
      val n = df.queryExecution.toRdd.count()
      if (sys.env.contains("SPARK_GRAFT_SKEW_EXPLAIN"))
        println(df.queryExecution.executedPlan.toString)
      n
    }

    def aggUnsalted() =
      force(big.groupBy(col("key")).agg(count(lit(1)), sum(col("v"))))
    def aggSalted() =
      force(graft.ops.Salting.saltedCountSum(big, "key", "v", "v"))

    val nSalts = sys.env.getOrElse("SPARK_GRAFT_SKEW_NSALTS", "16").toInt
    def joinCount(salted: Boolean): Long = {
      val joined =
        if (salted) graft.ops.Salting.saltedJoin(big, dim, "key", "v", nSalts)
        else big.join(dim, Seq("key"))
      // payload mode CONSUMES pay after the join so the join shuffle
      // carries the full row — what a real document join does
      val aggs =
        if (payload > 0) Seq(sum(col("w")), sum(length(col("pay"))))
        else Seq(sum(col("w")))
      force(joined.groupBy(col("key")).agg(aggs.head, aggs.tail: _*))
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
        (() => withConf(noBroadcast)(timed(joinCount(salted = false)))),
      // OptimizeSkewedJoin declines to split when the join feeds a
      // same-key aggregate (the split breaks the children's output
      // partitioning, and honoring the aggregate's distribution would
      // need an extra shuffle). force=true accepts that extra shuffle —
      // the AQE knob a real pipeline must flip for join→agg chains.
      "join_plain_aqe_skewjoin_forced" ->
        (() => withConf(noBroadcast,
          "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")(
          timed(joinCount(salted = false)))))
    val selected =
      if (args.nonEmpty) Seq(args(0)) else cases.keys.toSeq.sorted
    selected.foreach { name =>
      val (sec, n) = cases(name)()
      println(f"""{"case":"$name","sec":$sec%.2f,"rows":$n}""")
    }
    spark.stop()
  }
}

/** Isolated per-query stage attribution — the adjudication tool for bench
  * variance watch items ("which stage moved?"): run ONE SparkEntry query
  * in its own JVM, reps times, optionally under the [[SkewBench]]
  * stage-spread listener (SPARK_GRAFT_SKEW_STAGES=1) so each completed
  * stage prints its task-time max/mean/skew and shuffle bytes.
  *
  * Usage: `sbt "runMain graft.QueryStages <q_name> [sfDir]"` with
  * SPARK_GRAFT_REPS (default 3). Staged caches are released between reps
  * so every rep pays the query's true first-touch cost, like the suite.
  */
object QueryStages {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect() // session warmup
    if (sys.env.contains("SPARK_GRAFT_SKEW_STAGES"))
      spark.sparkContext.addSparkListener(SkewBench.stageSpread())
    val fn = SparkEntry.queries(name)
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt)
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"REP $r $name: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      graft.ops.Stage.releaseAll(spark)
    }
    spark.stop()
  }
}
