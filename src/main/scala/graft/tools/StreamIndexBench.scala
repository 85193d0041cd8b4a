package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Measures the claim behind EventStream.nearDupAgainstIndex: a
  * stream-static join RE-EXECUTES its static subplan on every
  * micro-batch, so the inline streaming near-dup screen re-derives the
  * whole corpus chain per batch while the index dual's per-batch static
  * work is two bucketed scans.
  *
  * Harness: `nBatches` parquet files of ~2k recrawl docs each, consumed
  * one file per trigger (maxFilesPerTrigger=1 — one micro-batch per
  * file); each arm runs the same stream to a memory sink and reports
  * total wall + per-batch average. Both arms emit identical pair sets
  * (asserted — a fast-but-wrong arm would be meaningless).
  *
  * Usage: StreamIndexBench [sfDir] [nBatches] [docsPerBatch]
  * [nBuckets] [compact] (defaults: target/sf1, 4, 2000, 32, false).
  * docsPerBatch ≤ ~125 is the pruned foreachBatch dual's regime (its
  * literal rail caps at ~128 docs × 16 bands); at the 2000-doc default
  * the pruned arm rail-falls-back to the same in-place scan as the
  * transform dual. nBuckets > key-count with compact=true is the
  * MAINTAINED production posture (build → compact → serve): the
  * pruned arm's per-trigger index I/O becomes candidate-proportional
  * file-subset reads of one-file buckets — the 100 TB floor.
  */
object StreamIndexBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(4)
    val docsPerBatch = args.lift(2).map(_.toInt).getOrElse(2000)
    val nBuckets = args.lift(3).map(_.toInt).getOrElse(32)
    val doCompact = args.lift(4).exists(_.toBoolean)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.EventStream
    val docs = graft.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text"))
    val corpus = docs

    val base = java.nio.file.Files
      .createTempDirectory("graft_stream_idx").toString
    // nBatches files of ~2k docs each: recrawls (near-dups) and fresh
    // rewrites, ids offset per batch so batches never collide. The
    // near-dup/fresh split keys on floor(doc_id / mod) % 2 — the
    // INTEGRAL quotient: Spark's `/` is fractional, so a plain
    // (doc_id / mod) % 2 is nonzero for every residue class but 0 and
    // would silence the near-dup arm in most batches (review r17; the
    // first take also sized mod by 2000·nBatches, making each batch
    // nBatches× the documented size)
    val mod = math.max(1L, docs.count() / docsPerBatch)
    val land = s"$base/landing"
    (0 until nBatches).foreach { b =>
      docs.filter(col("doc_id") % mod === b % mod)
        .select((col("doc_id") + 1000000L * (b + 1)).as("doc_id"),
          when(pmod(floor(col("doc_id") / mod).cast("long"), lit(2L)) === 0,
              regexp_replace(col("text"), "^[^ ]* ", ""))
            .otherwise(translate(col("text"), "aeiou", "01234"))
            .as("text"))
        .coalesce(1).write.parquet(s"$land/b$b")
    }
    graft.ops.Dedup.buildNearDupIndex(corpus, "sib_bands",
      s"$base/bands", "sib_shingles", s"$base/shingles",
      nBuckets = nBuckets)
    if (doCompact) for (t <- Seq("sib_bands", "sib_shingles"))
      graft.sources.PartitionedStore.compactBucketed(spark, t)

    def stream() = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$land/*")
    def run(name: String, df: org.apache.spark.sql.DataFrame)
        : (Double, Set[(Long, Long)]) = {
      val t0 = System.nanoTime()
      val pairs = EventStream.runToMemory(df, name, OutputMode.Append)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      ((System.nanoTime() - t0) / 1e9, pairs)
    }
    // the foreachBatch PRUNED dual is sink-shaped: pairs accumulate
    // through the sink callback instead of a memory-sink table
    def runPruned(src: org.apache.spark.sql.DataFrame)
        : (Double, Set[(Long, Long)]) = {
      val acc = scala.collection.mutable.Set[(Long, Long)]()
      val t0 = System.nanoTime()
      val q = EventStream.nearDupIndexEachBatch(spark, src,
        "sib_bands", "sib_shingles") { (m, _) =>
          acc ++= m.collect().map(r => (r.getLong(0), r.getLong(1)))
        }.start()
      q.processAllAvailable(); q.stop()
      ((System.nanoTime() - t0) / 1e9, acc.toSet)
    }
    // warm ALL arms' codegen on a single batch, untimed — warming only
    // one would charge the others' one-time compile (including the very
    // corpus-chain subplan under measurement) to their timed runs
    def oneBatch() = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(s"$land/b0")
    run("sib_warm_idx", EventStream.nearDupAgainstIndex(spark,
      oneBatch(), "sib_bands", "sib_shingles"))
    run("sib_warm_inl", EventStream.nearDupAgainstCorpus(
      oneBatch(), corpus))
    runPruned(oneBatch())
    val (tIdx, pIdx) = run("sib_idx",
      EventStream.nearDupAgainstIndex(spark, stream(),
        "sib_bands", "sib_shingles"))
    val (tPrn, pPrn) = runPruned(stream())
    val (tInl, pInl) = run("sib_inline",
      EventStream.nearDupAgainstCorpus(stream(), corpus))
    // pair-SET equality, not row counts: a fast-but-differently-wrong
    // arm must fail the harness, not publish a comparison
    require(pIdx == pInl, s"arms diverged: only-idx=" +
      s"${(pIdx -- pInl).take(3)} only-inline=${(pInl -- pIdx).take(3)}")
    require(pPrn == pInl, s"pruned arm diverged: only-pruned=" +
      s"${(pPrn -- pInl).take(3)} only-inline=${(pInl -- pPrn).take(3)}")
    println(s"""{"metric":"stream_index","sf":"$sfDir",""" +
      s""""n_batches":$nBatches,"docs_per_batch":$docsPerBatch,""" +
      s""""n_buckets":$nBuckets,"compacted":$doCompact,""" +
      s""""n_pairs":${pIdx.size},""" +
      f""""indexed_total_sec":$tIdx%.2f,""" +
      f""""indexed_per_batch_sec":${tIdx / nBatches}%.2f,""" +
      f""""pruned_total_sec":$tPrn%.2f,""" +
      f""""pruned_per_batch_sec":${tPrn / nBatches}%.2f,""" +
      f""""inline_total_sec":$tInl%.2f,""" +
      f""""inline_per_batch_sec":${tInl / nBatches}%.2f}""")
    spark.sql("DROP TABLE IF EXISTS sib_bands")
    spark.sql("DROP TABLE IF EXISTS sib_shingles")
    spark.stop()
  }
}
