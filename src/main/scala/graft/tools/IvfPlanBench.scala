package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures IVF assignment at production quantizer shapes (VERDICT r15
  * #3): the literal `array_min(array(struct(...)))` rendering vs the
  * fused [[graft.functions.CentroidArgmin]] kernel, at nlist ∈
  * {256, 1024, 4096} × dim 128 over a synthetic corpus.
  *
  * Per variant it reports: plan time (analysis + physical planning —
  * where nlist×dim inlined literals hurt first), execution wall time,
  * and whether the assignment projection stayed inside a
  * WholeStageCodegen span (`*(n)` prefix).
  *
  * Usage: IvfPlanBench [nRows] [maxLiteralNlist]
  *   (defaults: 100000, 1024 — the literal plan at 4096 is the known
  *    blowup; raise the cap to measure it anyway)
  */
object IvfPlanBench {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toInt).getOrElse(100000)
    val maxLit = args.lift(1).map(_.toInt).getOrElse(1024)
    val dim = 128
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("IvfPlanBench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic synthetic corpus, materialized BEFORE timing so
    // generation cost never leaks into either variant
    val embs = spark.range(nRows).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(dim)),
        i => pmod(xxhash64(col("id") * 131L + i.cast("long")),
          lit(100000L)).cast("double") / 50000.0d - 1.0d).as("embedding"))
      .cache()
    embs.count()

    def literalAssign(c: Seq[(Int, Seq[Double])]): DataFrame =
      embs.select(col("vec_id"),
        graft.ops.Similarity.toDouble(col("embedding")).as("vec"))
        .withColumn("cluster", array_min(array(c.map { case (id, cent) =>
          struct((graft.ops.Similarity.dot(col("vec"), typedLit(cent))
            * -2.0d + lit(cent.map(x => x * x).sum)).as("d"),
            lit(id).as("id"))
        }: _*)).getField("id"))

    def kernelAssign(c: Seq[(Int, Seq[Double])]): DataFrame =
      graft.ops.Ivf.assign(embs, c)

    def measure(mk: () => DataFrame): (Double, Double, Boolean, Long) = {
      val t0 = System.nanoTime()
      val df = mk()
      val plan = df.queryExecution.executedPlan.toString // forces analysis
      val tPlan = (System.nanoTime() - t0) / 1e9
      val codegen = plan.linesIterator.exists(l =>
        (l.contains("centroid_argmin") || l.contains("array_min")) &&
          l.contains("*("))
      val t1 = System.nanoTime()
      val n = df.groupBy(col("cluster")).count().count()
      val tExec = (System.nanoTime() - t1) / 1e9
      (tPlan, tExec, codegen, n)
    }

    val out = new StringBuilder
    out.append(s"""{"metric":"ivf_plan_bench","rows":$nRows,"dim":$dim""")
    for (nlist <- Seq(256, 1024, 4096)) {
      val cents = graft.ops.Ivf.staticCentroids(nlist, dim)
      val (kp, ke, kc, kn) = measure(() => kernelAssign(cents))
      out.append(f""","kernel_$nlist":{"plan_sec":$kp%.2f,"exec_sec":$ke%.2f,"codegen":$kc,"lists_used":$kn}""")
      if (nlist <= maxLit) {
        // the literal plan is the known blowup: at nlist 4096 × dim 128
        // Janino dies with "Code grows beyond 64 KB" and the retry OOMs
        // the driver heap (measured r16) — report, don't crash the tool
        try {
          val (lp, le, lc, ln) = measure(() => literalAssign(cents))
          out.append(f""","literal_$nlist":{"plan_sec":$lp%.2f,"exec_sec":$le%.2f,"codegen":$lc,"lists_used":$ln}""")
        } catch {
          case t: Throwable =>
            val root = Iterator.iterate(t)(_.getCause)
              .takeWhile(_ != null).toSeq.last
            out.append(s""","literal_$nlist":{"failed":"${
              root.getClass.getSimpleName}"}""")
        }
      }
    }
    out.append("}")
    // scalastyle:off println
    println(out.toString)
    // scalastyle:on println
    spark.stop()
  }
}
