package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.polyHash

/** Deterministic sampling and quota operators for training-corpus
  * composition: the "data mixing" stage that rebalances sources and
  * strata before tokenization.
  *
  * Everything keys off the portable polynomial hash of the document id
  * (never `rand()`): the selected set is a pure function of the data, so
  * it is identical across runs, engines (the DuckDB oracles replay the
  * hash), partitionings, and cluster sizes — the reproducibility property
  * a 100 TB pipeline run needs when a stage is retried.
  */
object Sampling {

  /** Hash bucket in [0, 100) for rate-based selection. */
  private def pctBucket(id: org.apache.spark.sql.Column) =
    pmod(polyHash(id.cast("string")), lit(100L))

  /** Weyl-multiplied portable-hash bucket in [0, mod) — the ONE rendering
    * of the `polyHash(key) · 2654435761 mod m` rule shared by
    * [[temperatureMix]], [[materializeMix]] and [[trainingOrder]] (and
    * replayed by their DuckDB oracles). The polynomial rolling hash is
    * LINEAR in the trailing characters, so sequential ids land in tight
    * bands; Knuth's multiplier turns each band into an equidistributed
    * Weyl sequence mod m. Requirements stated once: the multiplier is
    * coprime to every modulus used (10⁶, 10³, 10⁹+7), and the int64
    * product cannot overflow (h < 2³¹ × 2654435761 < 2⁶³). */
  private def weylBucket(key: org.apache.spark.sql.Column, mod: Long) =
    pmod(polyHash(key) * lit(2654435761L), lit(mod))

  /** Per-stratum Bernoulli sampling at per-key percentage rates:
    * keep a row iff hash(id) % 100 < rate(stratum). `default` applies to
    * strata absent from `rates`. Used to downsample over-represented
    * languages/sources to a target mix. Narrow filter — no shuffle, no
    * state; scales linearly and composes with pushed-down scans. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      rates: Map[String, Int], default: Int): DataFrame = {
    val rate = rates.foldLeft(lit(default)) { case (acc, (k, r)) =>
      when(col(stratumCol) === k, lit(r)).otherwise(acc)
    }
    df.filter(pctBucket(col(idCol)) < rate)
  }

  /** Per-source quota: keep at most `quota` rows per `keyCol`, chosen
    * deterministically by (hash(id), id) order — an unbiased, stable
    * "first K by hash" draw rather than "first K by arrival".
    *
    * Scale shape: a bounded top-k aggregate, NOT a row_number window — a
    * window ships EVERY row of a hot source to one reducer before
    * cutting, while the aggregate reduces each map task's slice to ≤
    * quota (hash, id) entries per key BEFORE the shuffle (the hash values
    * are < 2³¹, exact in the double score; negation turns the aggregate's
    * descending order into ascending hash, and its tie-break is the same
    * ascending id). The surviving id set is quota·|sources| rows — tiny
    * at any corpus size — so it broadcasts into a semi-join and the full
    * rows never shuffle at all.
    *
    * Assumes `idCol` identifies rows (the corpus contract): rows sharing
    * an id are kept or dropped together, whereas the old window form cut
    * arbitrarily between them. */
  def sourceQuota(df: DataFrame, keyCol: String, idCol: String,
      quota: Int): DataFrame = {
    val keep = df.select(col(keyCol), col(idCol))
      .groupBy(col(keyCol))
      .agg(graft.functions.TopKAgg.topKBy(
        -polyHash(col(idCol).cast("string")).cast("double"),
        col(idCol).cast("long"), quota).as("top"))
      .select(col(keyCol), explode(col("top")).as("t"))
      .select(col(keyCol).as("_sqk"), col("t.id").as("_sqi"))
    // null-safe key equality: the TopKAgg groupBy keeps a NULL-key group
    // like any other, so NULL-key rows must survive the semi join too —
    // a plain equi join would silently drop every row of a NULL source
    // instead of capping it at `quota`
    df.join(broadcast(keep),
      col(keyCol) <=> col("_sqk") && col(idCol) === col("_sqi"),
      "left_semi")
  }

  /** Temperature-flattened source mixing — the multilingual/multi-source
    * rebalance (XLM-style): sampling weight per source w_s ∝ c_s^α, so
    * α = 1 preserves the natural mix and α → 0 flattens toward uniform,
    * up-weighting small sources without duplicating rows. Realized as a
    * deterministic per-row Bernoulli keep at
    * rate_s = min(1, target · w_s / (Σw · c_s)) over the portable-hash
    * uniform (hash("tmix:" + id) mod 10⁶ < rate · 10⁶) — like
    * [[stratifiedSample]] but with the per-stratum rates DERIVED from the
    * data and a total-row budget instead of dictated per key. The
    * multiplicative finisher matters: a polynomial rolling hash is LINEAR
    * in the trailing characters, so sequential ids land in tight bands
    * (consecutive hashes), which a 10⁶ modulus inherits — Knuth's
    * 2654435761 multiplier turns each band into an equidistributed Weyl
    * sequence mod 10⁶ (the multiplier is coprime to the modulus; the
    * int64 product cannot overflow: h < 2³¹). [[stratifiedSample]]'s
    * mod-100 bucket doesn't need this only because any 100 consecutive
    * ids sweep all 100 residues.
    *
    * Scale shape: one partial-aggregated count per source (tiny frame,
    * staged so the corpus scans once), rates broadcast back, then a
    * narrow filter — no shuffle of the corpus itself. The only doubles
    * (pow, one sum over |sources| weights) sit far from the keep
    * threshold's integer hash buckets, so the selected set is stable
    * across engines and partitionings. */
  def temperatureMix(df: DataFrame, keyCol: String, idCol: String,
      alpha: Double, targetRows: Long): DataFrame = {
    val counts = Stage.barrier(
      df.groupBy(col(keyCol)).agg(count(lit(1)).cast("long").as("c"))
        .withColumn("w", pow(col("c").cast("double"), lit(alpha))))
    val rates = counts
      .crossJoin(broadcast(counts.agg(sum(col("w")).as("wsum"))))
      .select(col(keyCol).as("_tmk"),
        least(lit(1.0d),
          lit(targetRows.toDouble) * col("w") /
            (col("wsum") * col("c").cast("double"))).as("rate"))
    // null-safe key equality: the counts groupBy forms a NULL-key group
    // (weighted into wsum like any other), so NULL-key rows must join
    // their own rate back — a plain equi join would both DROP them
    // entirely and still dilute every other source's rate through wsum
    df.join(broadcast(rates), col(keyCol) <=> col("_tmk"))
      .filter(weylBucket(concat(lit("tmix:"), col(idCol).cast("string")),
          1000000L)
        .cast("double") < col("rate") * lit(1000000.0d))
      .drop("rate", "_tmk")
  }

  /** Token-budget mixing PLAN — the artifact a training run publishes
    * before it samples: per source, the token count, the α-flattened
    * sampling share, and the implied number of epochs (passes) over that
    * source at a global token budget — epochs_s = budget · w_s / (Σw ·
    * tok_s), the LLaMA/DoReMi data-mixture table. epochs > 1 flags a
    * source the budget will repeat; the plan is where that's decided,
    * not discovered mid-run. Where [[temperatureMix]] materializes a
    * row-sampled corpus, this op emits the plan itself (fixed point
    * ×1000, floor — the one double (pow) sits far from the floor
    * boundary on real counts, same accepted class as temperatureMix).
    *
    * Scale shape: one narrow projection for per-row token counts, one
    * partial-aggregated groupBy source (|sources| rows), one broadcast
    * of the one-row weight sum. The corpus scans once; nothing else
    * moves. */
  def mixPlan(df: DataFrame, keyCol: String, textCol: String,
      alpha: Double, tokenBudget: Long): DataFrame = {
    // staged: the tiny per-source frame feeds both the weight sum and the
    // output — without the barrier the corpus scan runs once per branch
    // NULL text counts 0 tokens (size(split(NULL)) is NULL, which a sum
    // would silently SKIP while n_docs still counts the row)
    val perSource = Stage.barrier(df
      .select(col(keyCol),
        coalesce(size(split(col(textCol), " ")).cast("long"), lit(0L))
          .as("toks"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("toks")).cast("long").as("n_tokens"))
      .withColumn("w", pow(col("n_tokens").cast("double"), lit(alpha))))
    perSource
      .crossJoin(broadcast(perSource.agg(sum(col("w")).as("wsum"))))
      .select(col(keyCol), col("n_docs"), col("n_tokens"),
        floor(lit(tokenBudget.toDouble) * col("w") * lit(1000.0d) /
          (col("wsum") * col("n_tokens").cast("double")))
          .cast("long").as("epochs_x1000"))
  }

  /** Materialize the [[mixPlan]]: emit each document with one row per
    * training copy — ⌊epochs⌋ full passes for every doc of the source,
    * plus one more for a deterministic epochs-fractional share of its
    * docs (hash-Bernoulli, same Weyl-multiplier equidistribution as
    * [[temperatureMix]]) — so each source's expected token count hits
    * the plan's share of the budget without any doc-level randomness.
    * Returns (idCol, keyCol, copy); a downstream writer typically
    * re-shuffles by a (doc, copy)-keyed hash to interleave the epochs.
    *
    * Scale shape: the plan is |sources| rows, broadcast onto the corpus;
    * the explode is bounded by ⌈epochs⌉ per row — the output is the
    * training mixture itself, so its size IS the requested budget.
    * Deterministic end to end: same plan + same ids → the same mixture,
    * on any engine and any partitioning. */
  def materializeMix(df: DataFrame, keyCol: String, idCol: String,
      textCol: String, alpha: Double, tokenBudget: Long): DataFrame = {
    val plan = mixPlan(df, keyCol, textCol, alpha, tokenBudget)
      .select(col(keyCol).as("_mmk"), col("epochs_x1000"))
    val extra = (weylBucket(concat(lit("mmix:"),
        col(idCol).cast("string")), 1000L) <
      col("epochs_x1000") % 1000L).cast("long")
    // null-safe, as temperatureMix: a NULL-key source is a plan row too
    df.select(col(idCol), col(keyCol))
      .join(broadcast(plan), col(keyCol) <=> col("_mmk"))
      .drop("_mmk")
      .withColumn("n_copies", expr("epochs_x1000 DIV 1000") + extra)
      .filter(col("n_copies") >= 1L)
      .select(col(idCol), col(keyCol),
        explode(sequence(lit(1L), col("n_copies"))).as("copy"))
      .select(col(idCol), col(keyCol), col("copy").cast("int").as("copy"))
  }

  /** Deterministic training-order shuffle + sharding — the last hop
    * before the training writer: every (doc, copy) of the materialized
    * mixture gets a shard and a position within it, both derived from a
    * portable hash (Weyl-multiplied, then a PRIME modulus so the shard
    * residue and the intra-shard order are decorrelated), so the
    * "randomized" training order is reproducible across runs, engines,
    * and partitionings, and two copies of the same doc land in
    * different shards/positions.
    *
    * Scale shape: the per-shard position is a row_number window
    * partitioned by shard — at real scale nShards is sized to the
    * writer's output files (thousands), making each window partition
    * exactly one shard's worth, i.e. the same repartition +
    * sortWithinPartitions the writer itself performs; no global sort
    * ever happens. */
  def trainingOrder(mix: DataFrame, idCol: String, copyCol: String,
      nShards: Int): DataFrame = {
    val h = weylBucket(concat(lit("ord:"), col(idCol).cast("string"),
      lit(":"), col(copyCol).cast("string")), 1000000007L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("_h"), col(idCol), col(copyCol))
    mix.withColumn("_h", h)
      .withColumn("shard", pmod(col("_h"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("_h")
  }

  /** Leakage-safe train/valid/test split: assignment keyed on the
    * near-dup CLUSTER, not the document. A hash split on doc ids puts a
    * lightly edited duplicate of a training document into the eval split
    * at the background duplication rate — the classic dedup-leakage
    * failure that silently inflates every eval metric. Keying the same
    * deterministic hash on `canonical_id` ([[Dedup.simhashCanonical]]'s
    * transitive near-dup cluster label, O(docs)) makes a straddling
    * cluster IMPOSSIBLE by construction: every member hashes the same id.
    *
    * Returns (doc_id, canonical_id, split). NULL-text docs label
    * themselves in the canonical map, so they split like singletons.
    *
    * Scale shape: the cluster map is the only addition over the naive
    * split — one O(docs) frame whose cost is the simhash clustering the
    * pipeline typically already ran for dedup (pass its output in via
    * [[leakageSafeSplitsFrom]] to reuse it). */
  def leakageSafeSplits(docs: DataFrame, maxHamming: Int = 6,
      textCol: String = "text"): DataFrame =
    leakageSafeSplitsFrom(Dedup.simhashCanonical(docs, maxHamming, textCol))

  /** [[leakageSafeSplits]] over a PRECOMPUTED (doc_id, canonical_id)
    * cluster map — the production shape: the dedup stage already built
    * the map; splitting re-reads it instead of re-clustering. At 100 TB
    * the map lives as a doc_id-bucketed table
    * ([[graft.sources.PartitionedStore.writeBucketed]]), so joining the
    * split back onto the corpus reads buckets in place — the
    * zero-exchange contract PartitionedStoreSpec pins. */
  def leakageSafeSplitsFrom(canonicalMap: DataFrame): DataFrame =
    canonicalMap.select(col("doc_id"), col("canonical_id"),
      TextAnalysis.splitAssign(col("canonical_id")).as("split"))

  /** Split-leakage audit: how many VERIFIED near-dup pairs straddle
    * split boundaries under (a) the naive per-doc hash split and (b) the
    * cluster-keyed safe split. One row — (n_pairs, naive_leaked,
    * safe_leaked); safe_leaked is measured through the same join (never
    * assumed) and must come back 0, since a pair's two sides share a
    * cluster by definition of the pair graph's transitive closure.
    *
    * Scale shape: the split map is a narrow O(docs) projection of the
    * canonical map; the pair relation (the big side on duplicated
    * corpora) shuffles once per join key — both joins are plain equi
    * shuffles AQE can split, and the signature stage under the pair and
    * cluster plans is shared through the staging cache. */
  def splitLeakage(docs: DataFrame, maxHamming: Int = 6,
      textCol: String = "text",
      maxDirectPairs: Long = 1L << 22): DataFrame = {
    // ONE near-dup machinery pass when the graph is small (r20): the
    // audit only reads splits for docs that appear in a verified pair,
    // and for those the safe split's cluster key —
    // [[Dedup.simhashCanonical]]'s label — is BY CONSTRUCTION the
    // connected-component min of this very pair graph (the canonical
    // map is "identical to running components over the full document
    // pair graph", proven in DedupSpec and by q_simhash_canonical's
    // recursive-CTE oracle). So derive the labels from the staged pair
    // relation directly instead of re-running the signature → rep →
    // rep-pair blocking a second time; every pair member has a
    // component row, so no self-label fallback is needed. Output is
    // bit-identical either way (q_split_leakage's oracle pins it).
    //
    // ROUTED on the measured pair count: the direct path hands the FULL
    // doc-level graph to components(), which is a clear win while the
    // union-find rail covers it (sf0.1: 2.6M pairs, the whole label
    // step is one driver union-find) but runs the distributed rounds
    // over a graph the rep collapse would have SHRUNK first once the
    // corpus is dense at scale (sf1 full-size: 38.7M doc pairs vs the
    // rep graph's ~14M — measured +40% on the full-size quad artifact).
    // maxDirectPairs defaults to half the rail (symmetric closure = 2×
    // pairs), so the direct path and the rail engage together.
    // barrierCounted: the routing count below rides the materializing
    // count, and threads into components' rail sizing (r21)
    val (pairs, nPairs) = Stage.barrierCounted(
      Dedup.simhashNearDupPairs(docs, maxHamming, textCol))
    val spl = if (nPairs <= maxDirectPairs) {
      // the kernel emits each pair once with doc_a < doc_b (structural
      // first-clean-block dedup, spec-pinned) — skip the edge-dedup pass
      Dedup.components(pairs, assumeCanonical = true, knownPairs = nPairs)
        .select(col("doc_id"),
          TextAnalysis.splitAssign(col("doc_id")).as("naive_split"),
          TextAnalysis.splitAssign(col("component")).as("safe_split"))
    } else
      // dense corpus: collapse identical signatures to reps BEFORE the
      // component propagation (simhashCanonical's shape) — the staged
      // signature frame is shared with the pair producer above
      leakageSafeSplits(docs, maxHamming, textCol)
        .select(col("doc_id"),
          TextAnalysis.splitAssign(col("doc_id")).as("naive_split"),
          col("split").as("safe_split"))
    pairs
      .join(spl.select(col("doc_id").as("doc_a"),
        col("naive_split").as("_na"), col("safe_split").as("_sa")),
        Seq("doc_a"))
      .join(spl.select(col("doc_id").as("doc_b"),
        col("naive_split").as("_nb"), col("safe_split").as("_sb")),
        Seq("doc_b"))
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        coalesce(sum(when(col("_na") =!= col("_nb"), 1L).otherwise(0L)),
          lit(0L)).cast("long").as("naive_leaked"),
        coalesce(sum(when(col("_sa") =!= col("_sb"), 1L).otherwise(0L)),
          lit(0L)).cast("long").as("safe_leaked"))
  }
}
