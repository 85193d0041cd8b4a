package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted near-dup screen index (Dedup.buildNearDupIndex /
  * incrementalNearDedupFrom): the corpus's band rows and shingle sets
  * live in bucketed external tables every later increment reads IN
  * PLACE — asserted on the PLAN (one-exchange band probe, bucketed
  * scans) and on the ROWS (identical verdicts to the inline recompute
  * screen). */
class NearDupIndexSpec extends SparkSpec {

  test("band probe reads the index in place; screen equals the recompute") {
    import spark.implicits._
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    spark.conf.set("spark.sql.shuffle.partitions", 32)
    val dir = java.nio.file.Files.createTempDirectory("graft_ndidx")
      .toString
    try {
      val corpus = spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), col("text"))
      Dedup.buildNearDupIndex(corpus, "nd_bands_t", s"$dir/bands",
        "nd_shingles_t", s"$dir/shingles")

      // plan shape: a leaf batch-band relation probing the band table —
      // ONE exchange (the batch side onto the (band, key) layout); the
      // index side scans its buckets in place at any corpus size
      // key is the STRING band sub-signature (bandKeyCols' concat_ws) —
      // a mistyped leaf would cast the table column and silently
      // disable bucket reuse, which is exactly what this pins against
      val batchBands = Seq((1L, 0, "42_7"), (2L, 3, "99_1"))
        .toDF("doc_id", "band", "key")
      val probe = Dedup.nearDupBandProbe(spark, batchBands, "nd_bands_t")
      assert(nShuffles(probe) == 1,
        probe.queryExecution.executedPlan.toString)
      assert(probe.queryExecution.executedPlan.toString
        .contains("Bucketed: true"), "band index must read its buckets")

      // the verification side too: a candidate join keyed on the
      // shingle table's bucket column scans it in place
      val candLeaf = Seq((1000001L, 1L)).toDF("doc_id", "corpus_id")
      val ver = candLeaf.join(spark.table("nd_shingles_t")
          .select(col("doc_id").as("corpus_id"), col("sh")),
        Seq("corpus_id"))
      assert(nShuffles(ver) == 1,
        ver.queryExecution.executedPlan.toString)
      assert(ver.queryExecution.executedPlan.toString
        .contains("Bucketed: true"), "shingle table must read its buckets")

      // row identity with the inline recompute screen on the suite's
      // SHARED fixture batch (even ids near-dup, odd ids fresh) — the
      // same definition q_incremental_neardup{,_prod} run, so this
      // assertion covers exactly the oracle-shared rows
      val batch = graft.queries.DedupSim.recrawlBatch(corpus)
      val prod = Dedup.incrementalNearDedupFrom(spark, batch,
          "nd_bands_t", "nd_shingles_t")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet
      val inline = Dedup.incrementalNearDedup(batch, corpus)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet
      assert(prod == inline,
        s"index/recompute diverged: only-prod=${(prod -- inline).take(5)} " +
          s"only-inline=${(inline -- prod).take(5)}")
      assert(prod.exists(_._3) && prod.exists(!_._3),
        "fixture must exercise both verdicts")

      // banding-parameter mismatch fails LOUDLY: a screen probed with
      // different (n, k, bands) than the index was built with would
      // otherwise return an empty candidate set — every batch doc
      // silently "kept" (review r17)
      val e = intercept[IllegalArgumentException] {
        Dedup.incrementalNearDedupFrom(spark, batch,
          "nd_bands_t", "nd_shingles_t", bands = 8)
      }
      assert(e.getMessage.contains("mismatched banding"), e.getMessage)

      // lifecycle: an index BUILT on half the corpus then APPENDED with
      // the other half screens identically to the whole-build index —
      // and the probe still reads the (now multi-file-per-bucket)
      // layout in place
      val dir2 = java.nio.file.Files.createTempDirectory("graft_ndidx2")
        .toString
      Dedup.buildNearDupIndex(corpus.filter(col("doc_id") % 2 === 0),
        "nd_bands_a", s"$dir2/bands", "nd_shingles_a", s"$dir2/shingles")
      Dedup.appendNearDupIndex(corpus.filter(col("doc_id") % 2 === 1),
        "nd_bands_a", "nd_shingles_a")
      val appended = Dedup.incrementalNearDedupFrom(spark, batch,
          "nd_bands_a", "nd_shingles_a")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet
      assert(appended == prod, "appended index diverged from whole-build")
      val probe2 = Dedup.nearDupBandProbe(spark, batchBands, "nd_bands_a")
      assert(nShuffles(probe2) == 1 &&
        probe2.queryExecution.executedPlan.toString
          .contains("Bucketed: true"),
        "appended index must still read in place")
      // appending with mismatched banding is refused BEFORE any write
      val e2 = intercept[IllegalArgumentException] {
        Dedup.appendNearDupIndex(corpus, "nd_bands_a", "nd_shingles_a",
          k = 32, bands = 8)
      }
      assert(e2.getMessage.contains("mismatched banding"), e2.getMessage)
    } finally {
      spark.sql("DROP TABLE IF EXISTS nd_bands_a")
      spark.sql("DROP TABLE IF EXISTS nd_shingles_a")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      spark.sql("DROP TABLE IF EXISTS nd_bands_t")
      spark.sql("DROP TABLE IF EXISTS nd_shingles_t")
    }
  }
}
