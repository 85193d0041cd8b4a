package graft.ops

import graft.SparkSpec

class LeakageSplitSpec extends SparkSpec {
  import spark.implicits._

  // naive buckets (polyHash(id) % 100): "1" → 49 (train), "20" → 98
  // (test), "21" → 99 (test), "4" → 52 (train) — chosen so the dup pair's
  // two sides straddle the train boundary under the NAIVE split.
  test("leakage-safe split: a near-dup cluster cannot straddle splits") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (20L, "the quick brown fox jumps over the lazy dog"), // dup of 1
      (21L, "completely different content about other things entirely"),
      (4L, null: String)).toDF("doc_id", "text")
    val splits = Sampling.leakageSafeSplits(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // docs 1 and 20 share a cluster (identical text) → both hash the
    // canonical id 1 → SAME split, though their naive buckets sit on
    // opposite sides of the boundary (49 → train vs 98 → test)
    assert(splits(1L) == ((1L, "train")) && splits(20L) == ((1L, "train")),
      s"cluster must split as one unit: $splits")
    assert(splits(21L) == ((21L, "test")))
    // NULL text: self-labeled singleton, still receives a split
    assert(splits(4L) == ((4L, "train")))
    // the audit measures the same fact: the (1, 20) pair leaks under the
    // naive per-doc split, and cannot leak under the cluster-keyed one
    val audit = Sampling.splitLeakage(df).collect().head
    assert((audit.getLong(0), audit.getLong(1), audit.getLong(2)) ==
      ((1L, 1L, 0L)),
      s"expected (n_pairs, naive_leaked, safe_leaked) = (1, 1, 0), got " +
        s"(${audit.getLong(0)}, ${audit.getLong(1)}, ${audit.getLong(2)})")
    // r20 route parity: the dense-corpus route (rep collapse before the
    // component propagation — forced via maxDirectPairs = 0) must read
    // the identical audit row as the direct-components route above
    val dense = Sampling.splitLeakage(df, maxDirectPairs = 0L)
      .collect().head
    assert((dense.getLong(0), dense.getLong(1), dense.getLong(2)) ==
      ((audit.getLong(0), audit.getLong(1), audit.getLong(2))),
      "dense-corpus route diverged from the direct route")
    Stage.releaseAll(spark)
  }

  test("no near-dups: audit reads all-zero instead of nulling out") {
    // empty pair relation → sum() is NULL pre-coalesce; the audit must
    // still deliver one well-typed row of zeros
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val audit = Sampling.splitLeakage(df).collect()
    assert(audit.length == 1)
    assert((audit.head.getLong(0), audit.head.getLong(1),
      audit.head.getLong(2)) == ((0L, 0L, 0L)))
    Stage.releaseAll(spark)
  }

  test("production shape: bucketed map joins the corpus with no map-side " +
      "exchange") {
    import org.apache.spark.sql.functions.col
    // a corpus with one duplicated pair, so the split map is non-trivial
    val docs = (1L to 60L).map(i => (i, s"document number $i with some " +
        s"agreeable filler content token$i"))
      .toDF("doc_id", "text")
      .union(Seq((1060L,
        "document number 7 with some agreeable filler content token7"))
        .toDF("doc_id", "text"))
    // the dedup stage's deliverable, materialized the way the scaladoc
    // prescribes: a doc_id-bucketed external table
    val cmap = Dedup.simhashCanonical(docs)
    graft.sources.PartitionedStore.writeBucketed(cmap, "bkt_split_map",
      "/tmp/graft_splitmap_spec", "doc_id", 8, Seq("doc_id"))
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // at scale the corpus cannot broadcast; disable to see that plan
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val splits = Sampling.leakageSafeSplitsFrom(
        spark.table("bkt_split_map"))
      val joined = docs.join(splits, Seq("doc_id"))
      // ONE exchange: the corpus moving onto the map's bucket layout —
      // the map side (the O(docs) frame the dedup stage already wrote)
      // reads its buckets in place, zero exchange
      assert(nShuffles(joined) == 1,
        joined.queryExecution.executedPlan.toString)
      assert(joined.queryExecution.executedPlan.toString
        .contains("Bucketed: true"), "map scan must read its buckets")
      // and the production-shape rows equal the recompute form's
      val got = joined.select(col("doc_id"), col("canonical_id"),
        col("split")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val want = Sampling.leakageSafeSplits(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(got == want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS bkt_split_map")
    }
    Stage.releaseAll(spark)
  }

  test("precomputed cluster map variant matches the composed form") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (20L, "alpha beta gamma delta epsilon zeta"),
      (21L, "unrelated words entirely elsewhere tonight")).toDF(
      "doc_id", "text")
    val viaDocs = Sampling.leakageSafeSplits(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val viaMap = Sampling.leakageSafeSplitsFrom(
        Dedup.simhashCanonical(df)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(viaDocs == viaMap)
    Stage.releaseAll(spark)
  }
}
