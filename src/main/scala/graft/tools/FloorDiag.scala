package graft.tools

import org.apache.spark.sql.SparkSession

/** Attribution instrument for the PER-QUERY FIXED FLOOR (~0.08–0.16 s ×
  * ~140 queries at sf0.1 — VERDICT r20 "next round" #1): splits a warm
  * bench rep into its driver-side phases so the largest constant is
  * identifiable before anything is changed (guide §1).
  *
  * Per query, warm rep (after one untimed staging/codegen rep + release):
  *   - construct_ms: `fn(spark, dir)` — plan construction, incl. every
  *     `spark.read.parquet` resolution (file listing + footer schema
  *     inference) the query performs.
  *   - plan_ms: analysis + optimization + physical planning of the
  *     `count()` aggregate (forced via `.queryExecution.executedPlan`).
  *   - exec_ms: the remaining action time (job submission + run).
  *
  * Also prints, once: the bare job floor (`spark.range(1).count()`), and
  * the per-table `spark.read.parquet` resolution time for the sf dir.
  *
  * Usage: runMain graft.tools.FloorDiag q_name [q_name ...]
  */
object FloorDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6

    // bare scheduler floor: an empty-plan job, min of 5 warm
    spark.range(1).count()
    val bare = (1 to 5).map { _ =>
      val t0 = System.nanoTime(); spark.range(1).count(); ms(t0)
    }.min
    println(f"""{"bare_job_ms":$bare%.1f}""")

    // per-table parquet resolution cost (spark.read.parquet, no action)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      val t0 = System.nanoTime()
      spark.read.parquet(s"$sfDir/$t.parquet")
      val warm = ms(t0)
      val t1 = System.nanoTime()
      spark.read.parquet(s"$sfDir/$t.parquet")
      println(f"""{"table":"$t","resolve_ms_1":$warm%.1f,""" +
        f""""resolve_ms_2":${ms(t1)}%.1f}""")
    }

    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_token_stats", "q_count_star", "q_fingerprint",
        "q_groupby_count", "q_redact", "q_filter_in")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // rep 1: staging + codegen, untimed
      graft.ops.Stage.releaseAll(spark)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val constructMs = ms(t0)
      // count() the way the bench does, but phase-split: build the count
      // aggregate, force its physical plan, then execute
      val t1 = System.nanoTime()
      val cnt = df.groupBy().count()
      cnt.queryExecution.executedPlan // force analysis→physical
      val planMs = ms(t1)
      val t2 = System.nanoTime()
      cnt.collect()
      val execMs = ms(t2)
      println(f"""{"query":"$name","construct_ms":$constructMs%.1f,""" +
        f""""plan_ms":$planMs%.1f,"exec_ms":$execMs%.1f,""" +
        f""""total_ms":${constructMs + planMs + execMs}%.1f}""")
      graft.ops.Stage.releaseAll(spark)
    }
    spark.stop()
  }
}
