package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted-store lifecycles of the ladder's OTHER two rungs —
  * the digest index (exact screen) and the span bank (sub-document
  * screen), symmetric with the near-dup index: built once, appended per
  * increment, screened IN PLACE (plan-asserted), retry-idempotent by
  * construction, compacted bucket-preservingly. */
class DigestSpanStoreSpec extends SparkSpec {

  test("digest index: in-place anti join, screen == recompute, " +
      "retries invisible") {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    spark.conf.set("spark.sql.shuffle.partitions", 32)
    val dir = java.nio.file.Files.createTempDirectory("graft_digidx")
      .toString
    try {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), col("text"))
      // build on half, append the rest — the increment lifecycle
      Dedup.buildDigestIndex(docs.filter(col("doc_id") % 2 === 0),
        "dg_idx_t", s"$dir/digests")
      Dedup.appendDigestIndex(docs.filter(col("doc_id") % 2 === 1),
        "dg_idx_t")

      // a batch of verbatim re-deliveries (dropped) + fresh rewrites
      // (kept) under new ids
      val batch = docs.select((col("doc_id") + 1000000L).as("doc_id"),
        when(col("doc_id") % 2 === 0, col("text"))
          .otherwise(concat(lit("fresh "), col("text"))).as("text"))
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), Option(r.getString(1))))
          .toSet
      val prod = rows(Dedup.incrementalDedupFrom(spark, batch, "dg_idx_t"))
      val inline = rows(Dedup.incrementalDedup(batch,
        docs.select(sha2(lower(col("text")), 256).as("digest"))))
      assert(prod == inline, s"store/recompute diverged: " +
        s"only-prod=${(prod -- inline).take(5)} " +
        s"only-inline=${(inline -- prod).take(5)}")
      assert(prod.nonEmpty && prod.size < batch.count(),
        "fixture must drop some and keep some")

      // the screen's plan: both exchanges on the BATCH side (digest
      // agg + probe join), the store scans its buckets in place
      val kept = Dedup.incrementalDedupFrom(spark, batch, "dg_idx_t")
      assert(nShuffles(kept) == 2,
        kept.queryExecution.executedPlan.toString)
      assert(kept.queryExecution.executedPlan.toString
        .contains("Bucketed: true"), "digest store must read its buckets")

      // a blindly RETRIED append changes nothing: duplicate digest rows
      // are invisible to the anti join...
      Dedup.appendDigestIndex(docs.filter(col("doc_id") % 2 === 1),
        "dg_idx_t")
      assert(rows(Dedup.incrementalDedupFrom(spark, batch, "dg_idx_t"))
        == prod, "retried append changed exact-screen verdicts")
      // ...and bucket-preserving compaction reclaims them (distinct
      // parity) with verdicts unchanged
      val n = graft.sources.PartitionedStore.compactBucketed(spark,
        "dg_idx_t", dedupRows = true)
      assert(n == spark.table("dg_idx_t").count())
      assert(rows(Dedup.incrementalDedupFrom(spark, batch, "dg_idx_t"))
        == prod, "compacted store diverged")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      spark.sql("DROP TABLE IF EXISTS dg_idx_t")
    }
  }

  test("span bank: in-place semi join, screen == recompute, stamp " +
      "guard, retries invisible") {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    spark.conf.set("spark.sql.shuffle.partitions", 32)
    val dir = java.nio.file.Files.createTempDirectory("graft_spanbank")
      .toString
    try {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), col("text"))
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
      val batch = docs.filter(col("doc_id") % 5 === 0)
      // build on part of the corpus, append the rest
      Dedup.buildSpanBank(corpus.filter(col("doc_id") % 2 === 0),
        "sb_bank_t", s"$dir/bank")
      Dedup.appendSpanBank(corpus.filter(col("doc_id") % 2 === 1),
        "sb_bank_t")

      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSet
      val prod = rows(Dedup.spanScreenFrom(spark, batch, "sb_bank_t"))
      val inline = rows(Dedup.spanScreen(batch, Dedup.spanBank(corpus)))
      assert(prod == inline, s"bank/recompute diverged: " +
        s"only-prod=${(prod -- inline).take(5)} " +
        s"only-inline=${(inline -- prod).take(5)}")
      assert(prod.exists(_._3 > 0L), "fixture must flag some coverage")

      // the LEFT SEMI probe reads the bank's buckets in place
      val screen = Dedup.spanScreenFrom(spark, batch, "sb_bank_t")
      assert(screen.queryExecution.executedPlan.toString
        .contains("Bucketed: true"), "span bank must read its buckets")

      // mismatched window width fails LOUDLY (silent zero coverage is
      // the failure class the stamp closes)
      val e = intercept[IllegalArgumentException] {
        Dedup.spanScreenFrom(spark, batch, "sb_bank_t", windowTokens = 6)
      }
      assert(e.getMessage.contains("mismatched windows"), e.getMessage)
      val e2 = intercept[IllegalArgumentException] {
        Dedup.appendSpanBank(corpus, "sb_bank_t", windowTokens = 6)
      }
      assert(e2.getMessage.contains("mismatched windows"), e2.getMessage)

      // a blindly RETRIED append is invisible to the semi join, and
      // compaction reclaims the duplicate rows with verdicts unchanged
      // (and the windowTokens stamp survives the rewrite)
      Dedup.appendSpanBank(corpus.filter(col("doc_id") % 2 === 1),
        "sb_bank_t")
      assert(rows(Dedup.spanScreenFrom(spark, batch, "sb_bank_t"))
        == prod, "retried append changed span coverage")
      graft.sources.PartitionedStore.compactBucketed(spark, "sb_bank_t",
        dedupRows = true)
      assert(rows(Dedup.spanScreenFrom(spark, batch, "sb_bank_t"))
        == prod, "compacted bank diverged")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      spark.sql("DROP TABLE IF EXISTS sb_bank_t")
    }
  }
}
