package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-round diagnostic replica of TextAnalysis.bpeTrain's loop: prints
  * each round's wall time, the winning pair, its count, and the vocab
  * frame's row count — to localize the round-9+ cliff BpeRoundBench
  * measured at sf1. Not a product surface.
  *
  * Usage: BpeRoundDiag [sfDir] [nMerges]
  */
object BpeRoundDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf1")
    val n = args.lift(1).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables(spark, sfDir).documents
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    // SPARK_GRAFT_BPE_CACHE=1 reproduces the pre-fix nested-cache form
    val useCache = sys.env.contains("SPARK_GRAFT_BPE_CACHE")
    def pin(df: org.apache.spark.sql.DataFrame) =
      if (useCache) { val c = df.cache(); c.count(); c }
      else df.localCheckpoint(true)
    var vocab = pin(words.select(col("w"), col("freq"),
      concat_ws(" ", split(col("w"), "")).as("sym")))
    println(s"vocab rows: ${vocab.count()} (cacheMode=$useCache)")
    var k = 1
    while (k <= n) {
      val t0 = System.nanoTime()
      val s = col("_s")
      val pairArr = when(size(s) >= 2,
        transform(sequence(lit(1), size(s) - 1),
          i => struct(element_at(s, i).as("l"),
            element_at(s, i + 1).as("r"))))
        .otherwise(array().cast("array<struct<l:string,r:string>>"))
      val top = vocab
        .select(col("freq"), split(col("sym"), " ").as("_s"))
        .select(col("freq"), explode(pairArr).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).cast("long").as("cnt"))
        .orderBy(desc("cnt"), col("l"), col("r"))
        .limit(1).collect()
      val tAgg = (System.nanoTime() - t0) / 1e9
      val (l, r, cnt) =
        (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      val pat = java.util.regex.Pattern.quote(s" $l $r ")
      val rep = java.util.regex.Matcher.quoteReplacement(s" $l$r ")
      val t1 = System.nanoTime()
      val next = pin(vocab.withColumn("sym",
        trim(regexp_replace(concat(lit(" "), col("sym"), lit(" ")),
          pat, rep))))
      val tMat = (System.nanoTime() - t1) / 1e9
      vocab.unpersist()
      vocab = next
      println(f"round $k%2d: agg=$tAgg%7.2fs mat=$tMat%7.2fs " +
        f"merge=('$l', '$r') cnt=$cnt")
      k += 1
    }
    spark.stop()
  }
}
