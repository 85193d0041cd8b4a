package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition a training-data pipeline
  * actually runs, wired from the library's own stages:
  *
  *   length gate → exact dedup (sha-256 of lowercased text, keep lowest
  *   id) → deterministic train/valid/test split → per-(split, language)
  *   accounting.
  *
  * Scale shape: the gate is a pushed-down scan filter; rows are projected
  * to (doc_id, lang, digest) BEFORE the dedup shuffle, so the shuffle
  * carries ~50 bytes/row regardless of document size; dedup is one
  * hash-partitioned window min (no sort); the split is a stateless hash;
  * the final rollup is a partial-aggregated few-hundred-row frame. One
  * wide scan, two shuffles, nothing driver-side.
  */
object Curation {

  def curate(docs: DataFrame, minChars: Long = 100L,
      maxChars: Long = 400L): DataFrame = {
    val gated = docs
      .filter(col("n_chars").between(minChars, maxChars))
      .select(col("doc_id"), col("lang"),
        sha2(lower(col("text")), 256).as("_dig"))
    Dedup.firstPerDigest(gated)
      .withColumn("split", TextAnalysis.splitAssign(col("doc_id")))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).cast("long").as("sum_id"))
  }

  /** The FULL training-data curation chain as one DAG — the product
    * shape of the builder brief, every stage the library's own operator:
    *
    *   Gopher quality gate → exact digest dedup → simhash near-dup
    *   cluster map (docs collapse to their cluster canonical, and the
    *   SAME map keys the split — built once, used twice) → segment
    *   decontamination against the eval set → leakage-safe train split →
    *   temperature-flattened source mix → sequence packing → per-source
    *   manifest of the packed training mixture.
    *
    * Returns one row per source: the manifest columns (docs, chars,
    * id range, order-independent checksum) plus the packed token count
    * and bin span — the artifact a training run publishes before it
    * reads a byte.
    *
    * Scale shape: each stage keeps its own audited plan (per-row gate;
    * digest-keyed shuffles; banded near-dup, never all-pairs; broadcast
    * banned-segment set; stateless split/mix hashes; prefix-sum packing)
    * — the composition adds only the narrow id semi-joins that thread
    * the keep-sets through. The cluster map is staged: it feeds both the
    * canonical collapse and the split ([[graft.ops.Sampling
    * .leakageSafeSplitsFrom]]), the reuse the 100 TB pipeline gets by
    * materializing the dedup stage's map
    * ([[graft.sources.PartitionedStore.writeBucketed]]). Measured as one
    * DAG at sf1/sf2 in BENCH_NOTES r14 (tools.CurationChainBench). */
  def curationChain(docs: DataFrame, evalDocs: DataFrame,
      targetRows: Long, minTokens: Long = 20L, maxTokens: Long = 100000L,
      maxHamming: Int = 6, segTokens: Int = 8, alpha: Double = 0.5,
      capacity: Long = 2048L, nShards: Int = 32): DataFrame = {
    // 1: quality gate (text + source carried through for the stages
    // downstream of the screen)
    val gated = TextAnalysis.gopherRules(docs, minTokens, maxTokens,
        "text", carry = Seq("source", "text"))
      .filter(col("gopher_pass"))
      .select(col("doc_id"), col("source"), col("text"))
    // 2: exact digest dedup (keep lowest id per content digest) —
    // STAGED: deduped is consumed by BOTH the cluster-map staging below
    // and the canonical semi-join, so without a barrier the gate →
    // digest-dedup subtree runs once per consumer (and again per
    // consumer of `canonical`). Staging HERE beats staging `canonical`
    // by measurement (r15 A/B at sf1, BENCH_NOTES): canonical's own two
    // consumers then re-run only a semi-join over this staged leaf,
    // which is cheaper than a second barrier's materialization pass.
    // DEFERRED (r21): the dedup stage's first consumer is the cluster-map
    // staging right below — simhashCanonical's first internal barrier
    // materializes this entry through the cache (single reference), so
    // an eager count here was a duplicate action; the fan-out consumers
    // (canonical semi-join, decon rejoin) read the sealed leaf.
    val dedupedC = Stage.defer(Dedup.firstPerDigest(
        gated.withColumn("_dig", sha2(lower(col("text")), 256)))
      .select(col("doc_id"), col("source"), col("text")))
    // 3: near-dup cluster map — STAGED, because it is consumed twice
    // (canonical collapse here, split keys below); this is the in-DAG
    // form of the bucketed-table reuse the split scaladoc prescribes
    val cmap = Stage.barrier(Dedup.simhashCanonical(dedupedC, maxHamming))
    val deduped = Stage.seal(dedupedC)
    val canonical = deduped.join(
      cmap.filter(col("doc_id") === col("canonical_id"))
        .select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    // 4: segment decontamination against the eval set (scrubbed text
    // flows on; a fully-banned doc keeps zero segments)
    val decon = Dedup.decontaminateSegments(canonical, evalDocs, segTokens)
      .select(col("doc_id"), col("clean_text").as("text"))
      .join(canonical.select(col("doc_id"), col("source")), Seq("doc_id"))
    // 5: leakage-safe split from the SAME cluster map; train side feeds
    // the mixture. DEFERRED (r21): temperatureMix's internal counts
    // barrier is the train frame's first consumer (one reference — the
    // per-source groupBy), so its materializing count computes this
    // entry too; unstaged, the decontamination subtree (the segment
    // explode + text rebuild) ran once for the counts and AGAIN for the
    // mixture materialization.
    val train = Stage.defer(decon.join(
      Sampling.leakageSafeSplitsFrom(cmap)
        .filter(col("split") === "train").select(col("doc_id")),
      Seq("doc_id"), "left_semi"))
    // 6: temperature-flattened source mix at the token budget's row
    // target. DEFERRED: packSequences' internal projection barrier is
    // the mixture's first consumer (one reference); the manifest and the
    // packed join-back below read the sealed leaf.
    val mixedC = Stage.defer(
      Sampling.temperatureMix(train, "source", "doc_id", alpha, targetRows))
    // 7: sequence packing of the mixture
    val packed = Packing.packSequences(mixedC, capacity, nShards)
    val mixed = Stage.seal(mixedC)
    // 8: per-source manifest of what a training run will actually read
    TextAnalysis.manifest(mixed, "source")
      .join(packed.join(mixed.select(col("doc_id"), col("source")),
          Seq("doc_id"))
        .groupBy(col("source"))
        .agg(sum(col("n_tokens")).cast("long").as("n_tokens"),
          countDistinct(col("bin")).cast("long").as("n_bins")),
        Seq("source"))
  }
}
