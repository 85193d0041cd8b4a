package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the FIRED-rail census-probe cost of
  * [[graft.ops.Dedup.lshCandidatePairs]] — the O(bands × |census|)
  * `array_contains` when-chain the scaladoc documents (a fired rail
  * swaps the `size == 0` fast path for per-candidate linear scans of
  * the collected over-cap census).
  *
  * Three runs over the SAME base corpus (docsWithMutants) + a
  * mass-duplicate block of EQUAL row volume, at one `maxBucket`:
  *
  *  - clean: no dup block — the rail never fires (fast-path baseline)
  *  - fired_small: ONE text × 30k copies — census ≈ bands entries
  *  - fired_big: 150 texts × 201 copies — census ≈ 150 × bands entries
  *
  * The dup blocks' own candidates are entirely over-cap in every band
  * (identical texts ⇒ identical signatures), so all three runs emit the
  * same SURVIVING pair set from the base corpus; fired_small vs
  * fired_big isolates how the probe scales with census size at equal
  * input volume and equal drops.
  *
  * Usage: LshRailBench [sfDir] [reps]  (defaults: /root/testdata/sf0.1, 2)
  */
object LshRailBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.{Dedup, Stage}

    val docs = graft.queries.DedupSim.docsWithMutants(spark, sfDir)
    // nTexts distinct mass-duplicated texts, `copies` rows each, ids and
    // vocabulary disjoint from the base corpus
    def dupBlock(nTexts: Int, copies: Int): DataFrame =
      spark.range(nTexts.toLong * copies).select(
        (col("id") + 5000000L).as("doc_id"),
        concat(lit("massdup block "), (col("id") % nTexts).cast("string"),
          lit(" qq ww ee rr tt yy uu ii oo pp aa ss dd ff gg hh jj kk"),
          lit(" zz xx cc vv bb nn mm "),
          (col("id") % nTexts).cast("string")).as("text"))
    val maxBucket = 200
    def run(extra: Option[DataFrame]): (Double, Long) = {
      val in = extra.map(docs.union).getOrElse(docs)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = Dedup.lshCandidatePairs(
          Dedup.minhashSignatures(in), maxBucket = maxBucket).count()
        val dt = (System.nanoTime() - t0) / 1e9
        // release OUTSIDE the timer (as SplitShapeBench.best): the
        // staged-frame release is harness bookkeeping, not operator cost
        Stage.releaseAll(spark)
        (dt, n)
      }
      (ts.map(_._1).min, ts.head._2)
    }
    val (tClean, nClean) = run(None)
    val (tSmall, nSmall) = run(Some(dupBlock(1, 30000)))
    val (tBig, nBig) = run(Some(dupBlock(150, 201)))
    println(s"""{"metric":"lsh_fired_rail","sf":"$sfDir",""" +
      s""""reps":$reps,"max_bucket":$maxBucket,""" +
      s""""clean_sec":$tClean,"clean_pairs":$nClean,""" +
      s""""fired_small_census_sec":$tSmall,"fired_small_pairs":$nSmall,""" +
      s""""fired_big_census_sec":$tBig,"fired_big_pairs":$nBig}""")
    spark.stop()
  }
}
