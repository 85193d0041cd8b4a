package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.PartitionedStore

/** The one-sweep maintenance audit over every persisted-store kind
  * (VERDICT r18 #4/#7; +IVF index r20): storeStats health numbers, the
  * stats-driven compaction trigger, stamp verification, and the
  * torn-append diff — so one entry point answers "is every store
  * healthy, and which ones need a compaction". */
class StoreAuditSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("storeStats + auditStores: health numbers, dup backlog, " +
      "stats-driven compaction, stamp and torn-append detection") {
    val dir = java.nio.file.Files.createTempDirectory("graft_audit")
      .toString
    val (dt, bt, st, kt) =
      ("aud_dig_t", "aud_band_t", "aud_shingle_t", "aud_span_t")
    val vt = "aud_ivf_t"
    try {
      val base = docs.filter(col("doc_id") % 2 === 0)
      val inc = docs.filter(col("doc_id") % 2 === 1)
      Dedup.buildDigestIndex(base, dt, s"$dir/dig")
      Dedup.buildNearDupIndex(base, bt, s"$dir/bands", st,
        s"$dir/shingles")
      Dedup.buildSpanBank(base, kt, s"$dir/spans")

      // one append + ONE BLIND RETRY of the same append on the digest
      // index — the retried rows are screen-invisible but are exactly
      // the duplicate backlog the stats must surface
      Dedup.appendDigestIndex(inc, dt)
      Dedup.appendDigestIndex(inc, dt)
      Dedup.appendNearDupIndex(inc, bt, st)
      Dedup.appendSpanBank(inc, kt)

      val dg = PartitionedStore.storeStats(spark, dt)
      assert(dg.nBuckets == 32 && dg.nFiles >= dg.nBuckets,
        s"build + 2 appends should leave multi-file buckets: $dg")
      // each aligned append adds exactly one file per bucket; the
      // build wrote at its own parallelism (>= 1 file in some bucket)
      assert(dg.filesPerBucketMax >= 3, s"appends not visible: $dg")
      assert(dg.dupBacklog > 0,
        s"retried append must surface as duplicate backlog: $dg")
      assert(dg.rows - dg.dupBacklog == dg.distinctRows)

      // the fourth store kind: a persisted IVF index (r20), stamped
      // with its quantizer parameters
      val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      graft.ops.Ivf.buildIvfIndex(embs, vt, s"$dir/ivf")

      val audit = Dedup.auditStores(spark, Seq(
        Dedup.DigestStoreRef(dt), Dedup.SpanBankRef(kt),
        Dedup.NearDupIndexRef(bt, st), Dedup.IvfIndexRef(vt)))
        .collect().map(r => r.getString(0) ->
          (r.getString(1), r.getLong(6), r.getBoolean(7), r.getLong(8)))
        .toMap
      assert(audit.keySet == Set(dt, kt, bt, st, vt))
      assert(audit(vt)._1 == "ivf_index" && audit(vt)._3 &&
        audit(vt)._4 == 0L, s"ivf row: ${audit(vt)}")
      assert(audit(dt)._1 == "digest_index" && audit(dt)._2 > 0 &&
        audit(dt)._3 && audit(dt)._4 == 0L, s"digest row: ${audit(dt)}")
      assert(audit(kt)._1 == "span_bank" && audit(kt)._3,
        s"span row: ${audit(kt)}")
      assert(audit(bt)._3 && audit(st)._3 &&
        audit(bt)._4 == 0L && audit(st)._4 == 0L,
        "fresh index pair must be stamped and un-torn")

      // stats-driven compaction: the dup backlog alone fires it, and
      // the compacted store reads one file per bucket with zero
      // backlog — while screen verdicts are unchanged (the invariance
      // DigestSpanStoreSpec pins; here we pin the TRIGGER)
      val batch = docs.select((col("doc_id") + 1000000L).as("doc_id"),
        when(col("doc_id") % 2 === 0, col("text"))
          .otherwise(concat(lit("fresh "), col("text"))).as("text"))
      val before = Dedup.incrementalDedupFrom(spark, batch, dt)
        .collect().map(_.getLong(0)).sorted.toSeq
      val (preStats, fired) =
        PartitionedStore.compactIfNeeded(spark, dt, maxFilesPerBucket = 64)
      assert(fired && preStats.dupBacklog > 0,
        s"backlog must fire the trigger: $preStats")
      val dg2 = PartitionedStore.storeStats(spark, dt)
      assert(dg2.filesPerBucketMax == 1 && dg2.dupBacklog == 0L,
        s"compaction must collapse files and reclaim the backlog: $dg2")
      assert(Dedup.incrementalDedupFrom(spark, batch, dt)
        .collect().map(_.getLong(0)).sorted.toSeq == before,
        "stats-driven compaction changed screen verdicts")
      // healthy store: the trigger does NOT fire again
      val (postStats, fired2) =
        PartitionedStore.compactIfNeeded(spark, dt, maxFilesPerBucket = 64)
      assert(!fired2 && postStats.dupBacklog == 0L,
        s"healthy store must not re-compact: $postStats")

      // poisoned stamp (the manual-write failure class): a span bank
      // whose width stamp is lost fails the audit loudly
      spark.sql(s"ALTER TABLE $kt UNSET TBLPROPERTIES " +
        "('graft.spanbank.w')")
      val poisoned = Dedup.auditStores(spark, Seq(Dedup.SpanBankRef(kt)))
        .head()
      assert(!poisoned.getBoolean(7), "lost stamp must fail the audit")
      // same class on the IVF index: a lost quantizer stamp flags
      spark.sql(s"ALTER TABLE $vt UNSET TBLPROPERTIES " +
        "('graft.ivf.nlist')")
      assert(!Dedup.auditStores(spark, Seq(Dedup.IvfIndexRef(vt)))
        .head().getBoolean(7), "lost ivf stamp must fail the audit")

      // torn append: shingles land, bands don't (the designed crash
      // ordering) — the audit attributes the gap to the BAND table
      val torn = docs.filter(col("doc_id") % 10 === 3)
        .select((col("doc_id") + 7000000L).as("doc_id"), col("text"))
      PartitionedStore.appendBucketed(
        Dedup.hashedShingleRows(torn, 2, "text"), st)
      val tornAudit = Dedup.auditStores(spark,
        Seq(Dedup.NearDupIndexRef(bt, st)))
        .collect().map(r => r.getString(1) -> r.getLong(8)).toMap
      assert(tornAudit("nd_band_index") > 0L,
        s"torn append must land on the band side: $tornAudit")
      assert(tornAudit("nd_shingle_index") == 0L,
        s"shingle side is not torn: $tornAudit")
    } finally {
      for (t <- Seq(dt, bt, st, kt, vt))
        spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }
}
