package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Dedup
import graft.sources.PartitionedStore

/** The FULL steady-state production chain (q_epoch_refresh_full /
  * q_epoch_span_full — VERDICT r18 #1): digest index + near-dup index
  * + span bank built on base, both epochs screened through the
  * persisted stores, all three appended at the epoch boundary, and
  * compactBucketed(dedupRows) interleaved BETWEEN epoch 1's appends
  * and epoch 2's screens. The pins: (1) row identity with the inline
  * chain across both epochs — so the composed store lifecycle changed
  * no verdict; (2) a direct A/B — the same batch screened through
  * appended-then-COMPACTED stores vs appended-only twins must agree on
  * every rung's verdicts. */
class EpochFullSpec extends SparkSpec {

  test("full three-store chain matches the inline chain across both " +
      "epochs; span artifacts cover exactly the published docs") {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    spark.conf.set("spark.sql.shuffle.partitions", 32)
    try {
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1),
          r.getString(2), Option(r.getString(3)))).toSet
      val full = rows(DedupSim.epochRefreshFull(spark, sf))
      val inline = rows(DedupSim.epochRefresh(spark, sf))
      assert(full == inline,
        s"full/inline diverged: only-full=${(full -- inline).take(5)} " +
          s"only-inline=${(inline -- full).take(5)}")
      assert(Seq("screened", "dup_exact", "dup_near", "published")
        .forall(st => full.exists(_._3 == st)),
        "fixture must exercise every status")

      // span rung: one coverage row per PUBLISHED doc of each epoch,
      // screened against the bank as of that epoch (epoch 2's bank is
      // the appended-then-compacted one)
      val span = DedupSim.epochSpanFull(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val published = full.filter(_._3 == "published")
        .map(t => (t._1, t._2))
      assert(span == published,
        s"span verdicts must cover exactly the published docs: " +
          s"only-span=${(span -- published).take(5)} " +
          s"only-published=${(published -- span).take(5)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.conf.set("spark.sql.shuffle.partitions", parts)
    }
  }

  test("screen verdicts on all three rungs are invariant under a " +
      "compaction interleaved between appends and screens") {
    val parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", 32)
    val dir = java.nio.file.Files.createTempDirectory("graft_abcomp")
      .toString
    val tables = for (side <- Seq("a", "b"); t <-
      Seq("dig", "band", "shingle", "span")) yield s"ab_${side}_$t"
    try {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), col("text"))
      val base = docs.filter(col("doc_id") % 3 === 0)
      val inc = docs.filter(col("doc_id") % 3 === 1)
        .select((col("doc_id") + 4000000L).as("doc_id"), col("text"))
      // twin store sets, identically built and appended
      for (side <- Seq("a", "b")) {
        Dedup.buildDigestIndex(base, s"ab_${side}_dig", s"$dir/${side}_dig")
        Dedup.buildNearDupIndex(base, s"ab_${side}_band",
          s"$dir/${side}_band", s"ab_${side}_shingle",
          s"$dir/${side}_shingle")
        Dedup.buildSpanBank(base, s"ab_${side}_span", s"$dir/${side}_span")
        Dedup.appendDigestIndex(inc, s"ab_${side}_dig")
        Dedup.appendNearDupIndex(inc, s"ab_${side}_band",
          s"ab_${side}_shingle")
        Dedup.appendSpanBank(inc, s"ab_${side}_span")
      }
      // the interleave: B compacts between the appends and the screens
      for (t <- Seq("dig", "band", "shingle", "span"))
        PartitionedStore.compactBucketed(spark, s"ab_b_$t",
          dedupRows = true)

      // one batch, every rung, both sides: verbatim redeliveries of
      // base AND increment docs (store hits on both the built and the
      // appended generation), near-dups, and fresh rewrites
      val batch = base.unionByName(inc)
        .select((col("doc_id") + 8000000L).as("doc_id"),
          when(col("doc_id") % 4 === 0, col("text"))
            .when(col("doc_id") % 4 === 1,
              regexp_replace(col("text"), "^[^ ]* ", ""))
            .otherwise(translate(col("text"), "aeiou", "01234"))
            .as("text"))
      def exactOf(side: String) =
        Dedup.incrementalDedupFrom(spark, batch, s"ab_${side}_dig")
          .collect().map(_.getLong(0)).toSet
      def nearOf(side: String) =
        Dedup.incrementalNearDedupFrom(spark, batch, s"ab_${side}_band",
          s"ab_${side}_shingle")
          .collect().map(r => (r.getLong(0), r.getLong(1),
            r.getBoolean(2))).toSet
      def spanOf(side: String) =
        Dedup.spanScreenFrom(spark, batch, s"ab_${side}_span")
          .collect().map(r => (r.getLong(0), r.getLong(1),
            r.getLong(2), r.getLong(3))).toSet
      val (ea, eb) = (exactOf("a"), exactOf("b"))
      assert(ea == eb, s"exact rung moved under compaction: " +
        s"only-a=${(ea -- eb).take(5)} only-b=${(eb -- ea).take(5)}")
      assert(ea.nonEmpty && ea.size < batch.count(),
        "exact fixture must drop some and keep some")
      val (na, nb) = (nearOf("a"), nearOf("b"))
      assert(na == nb, s"near rung moved under compaction: " +
        s"only-a=${(na -- nb).take(5)} only-b=${(nb -- na).take(5)}")
      assert(na.exists(!_._3) && na.exists(_._3),
        "near fixture must flag some and keep some")
      val (sa, sb) = (spanOf("a"), spanOf("b"))
      assert(sa == sb, s"span rung moved under compaction: " +
        s"only-a=${(sa -- sb).take(5)} only-b=${(sb -- sa).take(5)}")
      assert(sa.exists(_._3 > 0L) && sa.exists(t => t._3 < t._2),
        "span fixture must show partial coverage")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      for (t <- tables) spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }
}
