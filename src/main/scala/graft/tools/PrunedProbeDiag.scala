package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Stage-attribution diagnostic for the pruned trickle screen — times
  * the band-probe collect and the shingle-side verdict separately, for
  * both the file-subset path (r19) and the full in-place screen, so a
  * corpus-proportional term is attributable to ONE stage. One JSON
  * line; a diagnosis tool, not a suite bench. */
object PrunedProbeDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf2")
    // nBuckets: 32 = the suite stores' width (a 125-doc probe touches
    // every bucket — the degrade regime); hundreds+ = the production
    // width where a tiny probe's keys MISS most buckets and the
    // file-subset path's candidate-proportional I/O shows
    val nBuckets = args.lift(1).map(_.toInt).getOrElse(32)
    val probeDocs = args.lift(2).map(_.toInt).getOrElse(125)
    val spark = Tables.configure(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sfDir).documents.select(col("doc_id"), col("text"))
    val base = "/tmp/graft_probediag"
    val (bt, st) = ("ppd_bands", "ppd_shingles")
    graft.ops.Dedup.buildNearDupIndex(docs, bt, s"$base/bands", st,
      s"$base/shingles", nBuckets = nBuckets)
    val trickle = docs.orderBy(col("doc_id")).limit(probeDocs)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        when(col("doc_id") % 2 === 0,
          regexp_replace(col("text"), "^[^ ]* ", ""))
          .otherwise(translate(col("text"), "aeiou", "01234")).as("text"))
      .cache()
    trickle.count()
    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    def arm(f: => Long): Seq[Double] =
      (1 to 3).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        trickle.cache().count()
        time(f)._1
      }
    // full pruned screen, fresh-build layout then the MAINTAINED
    // posture (build → compact → serve): one file per bucket, so the
    // file-subset read opens |wanted buckets| files instead of
    // |wanted| × build-tasks
    val tPruned = arm(graft.ops.Dedup.incrementalNearDedupPruned(
      spark, trickle, bt, st).filter(col("kept")).count())
    val tIndexed = arm(graft.ops.Dedup.incrementalNearDedupFrom(
      spark, trickle, bt, st).filter(col("kept")).count())
    val tCompact = {
      val t0 = System.nanoTime()
      graft.sources.PartitionedStore.compactBucketed(spark, bt)
      graft.sources.PartitionedStore.compactBucketed(spark, st)
      (System.nanoTime() - t0) / 1e9
    }
    val tPrunedC = arm(graft.ops.Dedup.incrementalNearDedupPruned(
      spark, trickle, bt, st).filter(col("kept")).count())
    val tIndexedC = arm(graft.ops.Dedup.incrementalNearDedupFrom(
      spark, trickle, bt, st).filter(col("kept")).count())
    // stage attribution inside the pruned path: replicate its steps
    import graft.ops.Dedup
    val tStages = (1 to 3).map { _ =>
      spark.sharedState.cacheManager.clearCache()
      trickle.cache().count()
      val (tBsh, bsh) = time {
        graft.ops.Stage.barrier(
          Dedup.hashedShingleRows(trickle, 2, "text"))
      }
      val (tBands, head) = time {
        Dedup.withBkey(Dedup.bandRows(Dedup.minhashSigsOf(bsh, 64),
          16, 64)).select(col("doc_id"), col("bkey"))
          .limit(4097).collect()
      }
      val keys = head.iterator.map(_.getString(1)).toSet
      val (tScan, bandSide) = time {
        graft.sources.PartitionedStore.prunedBucketScan(spark, bt, keys)
          .select(col("bkey"), col("doc_id").as("corpus_id"))
      }
      val localBands = broadcast(spark.createDataFrame(
        java.util.Arrays.asList(head: _*),
        new org.apache.spark.sql.types.StructType()
          .add("doc_id", "long").add("bkey", "string")))
      val (tCand, candRows) = time {
        bandSide.join(localBands, Seq("bkey"))
          .select(col("doc_id"), col("corpus_id")).distinct()
          .limit(8193).collect()
      }
      val cids = candRows.iterator.map(_.get(1)).toSeq.distinct
      val (tShingle, nKept) = time {
        val csh = graft.sources.PartitionedStore
          .prunedBucketScan(spark, st, cids)
          .select(col("doc_id").as("corpus_id"), col("sh").as("sh_c"))
        val cand = broadcast(spark.createDataFrame(
          java.util.Arrays.asList(candRows: _*),
          new org.apache.spark.sql.types.StructType()
            .add("doc_id", "long").add("corpus_id", "long")))
        Dedup.nearDupVerdict(trickle, cand, bsh, csh, 7, 10)
          .filter(col("kept")).count()
      }
      (tBsh, tBands, tScan, tCand, tShingle, candRows.length, cids.size,
        nKept)
    }
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString("[", ",", "]")
    println(s"""{"metric":"pruned_probe_diag","sf":"$sfDir",""" +
      s""""n_buckets":$nBuckets,"probe_docs":$probeDocs,""" +
      s""""pruned_sec":${fmt(tPruned)},"indexed_sec":${fmt(tIndexed)},""" +
      f""""compact_sec":$tCompact%.2f,""" +
      s""""pruned_compacted_sec":${fmt(tPrunedC)},""" +
      s""""indexed_compacted_sec":${fmt(tIndexedC)},""" +
      s""""bsh_sec":${fmt(tStages.map(_._1))},""" +
      s""""bands_collect_sec":${fmt(tStages.map(_._2))},""" +
      s""""band_scan_build_sec":${fmt(tStages.map(_._3))},""" +
      s""""cand_collect_sec":${fmt(tStages.map(_._4))},""" +
      s""""shingle_verdict_sec":${fmt(tStages.map(_._5))},""" +
      s""""n_cand":${tStages.last._6},"n_cids":${tStages.last._7}}""")
    for (t <- Seq(bt, st)) spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.stop()
  }
}
