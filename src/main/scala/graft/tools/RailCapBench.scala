package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B the union-find rail cap (`graft.components.maxLocalEdges`) on
  * named queries: at sf1 the simhash rep graph (~14M pairs → 28M
  * symmetric edges) overflows the 8M default and runs the distributed
  * hook+jump rounds; a larger cap collapses it driver-side. This tool
  * measures whether that trade wins at a given scale before any default
  * moves.
  *
  * Usage: runMain graft.tools.RailCapBench <capEdges> q_name [q_name...]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_REPS.
  */
object RailCapBench {
  def main(args: Array[String]): Unit = {
    val cap = args.headOption.map(_.toLong).getOrElse(1L << 23)
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q_simhash_canonical", "q_split_safe")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt)
    val spark = graft.Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("graft.components.maxLocalEdges", cap.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        graft.ops.Stage.releaseAll(spark)
        t
      }
      println(f"""{"query":"$name","cap":$cap,"min_sec":${times.min}%.3f,""" +
        s""""reps":[${times.map(t => f"$t%.3f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
