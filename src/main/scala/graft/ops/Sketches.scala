package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.polyHash

/** Distributed sketches with ENGINE-PORTABLE, integer-exact arithmetic.
  *
  * Spark ships approx_count_distinct / approx_percentile, but their sketch
  * internals (xxHash64 seeds, QuantileSummaries merge order) are
  * implementation-defined — no other engine reproduces their outputs, so
  * they cannot be cross-engine verified and their values drift across
  * Spark versions. These variants trade a little accuracy headroom for
  * full determinism: the portable polynomial hash and pure int64 math make
  * the sketch a function of the data alone (same answer on DuckDB, any
  * partitioning, any cluster size) — what a reproducible 100 TB pipeline
  * audit wants from its cardinality/quantile estimates.
  */
object Sketches {

  /** HyperLogLog bucket count (2^6). 64 registers → ~13% standard error
    * (1.04/√m): a corpus-profiling resolution, chosen small so the whole
    * register file is 64 rows of driver-free aggregate state. */
  val HllM = 64

  /** Approximate distinct count of `keyCol` via a 64-register HLL,
    * alongside the exact count for audit.
    *
    * Portable construction: h = polyHash(key) ∈ [0, 2³¹-1); bucket =
    * h mod 64; the remaining 25 bits give ρ = 26 − bitlen(rest) (the
    * leading-zero rank, ρ ∈ [1, 26]). Register file = max ρ per bucket —
    * ONE partially-aggregated groupBy over 64 keys, so the shuffle carries
    * at most 64 rows per map task regardless of input size. The harmonic
    * estimator is computed as an exact rational: Σ 2^(−ρ) = S / 2²⁶ with
    * S = Σ 2^(26−ρ) (int64-exact, ≤ 64·2²⁶), so
    * est×1000 = 709·m²·2²⁶ div S — integer division, no float drift.
    * Raw Flajolet-et-al estimator without small/large-range correction
    * (documented; the spec bounds its error against the exact count).
    *
    * The polynomial hash alone is NOT HLL-grade: short keys never wrap
    * the modulus, leaving the high bits zero and ρ inflated (measured
    * 2–5500× overestimates). One universal-hash mixing step
    * h' = (a·h + b) mod P — the same family the MinHash signatures use —
    * wraps every key through the full 31-bit range; measured error is
    * then −5%…−2% at 150/1.5k/15k distinct keys with 64 registers. */
  /** The mixed 31-bit hash, bucket, and leading-zero rank ρ — ONE
    * definition of the register construction, shared by the global,
    * per-group, and merge variants (drift between them would silently
    * break sketch-union semantics). */
  private def hllBucketRho(keyCol: String): (Column, Column) = {
    val h = pmod(
      polyHash(col(keyCol).cast("string")) * 1103515245L + 12345L,
      lit(2147483647L))
    val rest = shiftright(h, 6) // h div 64, h ≥ 0; int-exact
    val rho = when(rest === 0, lit(26L))
      .otherwise(lit(26L) - length(bin(rest.cast("long"))).cast("long"))
    (pmod(h, lit(HllM.toLong)), rho)
  }

  /** The int64-exact harmonic estimator over a register file (b, r) —
    * est×1000 = 709·m²·2²⁶ div Σ 2^(26−ρ); absent registers contribute
    * ρ = 0 (including ALL of them: sum() over an empty register file is
    * NULL, so both aggregates coalesce to keep the documented convention
    * — an empty input estimates 709·m²·1000 div 64·2²⁶, never NULL).
    * One row out. */
  private def hllEstimate(regs: DataFrame): DataFrame =
    regs.agg(
        coalesce(sum(expr("shiftleft(1L, cast(26 - r as int))")), lit(0L))
          .as("s_present"),
        count(lit(1)).as("n_regs"))
      .select((lit(709L) * HllM * HllM * (1L << 26)).as("num"),
        (col("s_present") + (lit(HllM.toLong) - col("n_regs")) * (1L << 26))
          .as("den"))
      .select(expr("num div den").as("hll_est_x1000"))

  /** NULL keys carry no register: polyHash null-propagates, so an
    * unfiltered NULL key would form a phantom (NULL, NULL) register row —
    * counted in n_regs, contributing nothing to s_present — biasing the
    * estimate high, while the paired exact countDistinct ignores NULLs.
    * One screen, shared by all three variants. */
  private def nonNullKeys(df: DataFrame, keyCol: String): DataFrame =
    df.filter(col(keyCol).isNotNull)

  def hllDistinct(df: DataFrame, keyCol: String): DataFrame = {
    val (bucket, rho) = hllBucketRho(keyCol)
    val regs = nonNullKeys(df, keyCol).select(bucket.as("b"), rho.as("rho"))
      .groupBy(col("b")).agg(max(col("rho")).as("r"))
    val exact = df.agg(countDistinct(col(keyCol)).as("n_exact"))
    exact.crossJoin(hllEstimate(regs)) // two single-row frames
  }

  /** Sketch-union reaggregability — the property that makes a sketch a
    * MERGEABLE METADATA artifact at cluster scale: build one register
    * file PER `segmentCol` value (exactly as 1000 executors, or 1000
    * daily increments, would sketch their shards independently and
    * persist ≤ 64 rows each), then merge by per-bucket max and estimate
    * the UNION cardinality. Returns one row: the exact distinct count,
    * the merged-from-segments estimate, and the direct single-pass
    * estimate. Merged == direct BY CONSTRUCTION (max is associative and
    * commutative over the identical register construction) — the
    * invariant the spec pins; overlap between segments (the same key in
    * several segments) is handled exactly, where summing per-segment
    * counts would double-count.
    *
    * Scale shape: per-segment registers are one partial-aggregated
    * groupBy (≤ 64 rows per segment); the merge is a 64-row groupBy of
    * THOSE — post-aggregation metadata, never data-scale. */
  def hllMergeAcross(df: DataFrame, keyCol: String,
      segmentCol: String): DataFrame = {
    val (bucket, rho) = hllBucketRho(keyCol)
    val keyed = nonNullKeys(df, keyCol)
    val perSegment = keyed
      .select(col(segmentCol).as("_g"), bucket.as("b"), rho.as("rho"))
      .groupBy(col("_g"), col("b")).agg(max(col("rho")).as("r"))
    val merged = perSegment.groupBy(col("b")).agg(max(col("r")).as("r"))
    val direct = keyed.select(bucket.as("b"), rho.as("rho"))
      .groupBy(col("b")).agg(max(col("rho")).as("r"))
    df.agg(countDistinct(col(keyCol)).as("n_exact"))
      .crossJoin(hllEstimate(merged)
        .withColumnRenamed("hll_est_x1000", "merged_est_x1000"))
      .crossJoin(hllEstimate(direct)
        .withColumnRenamed("hll_est_x1000", "direct_est_x1000"))
  }

  /** Per-group [[hllDistinct]]: one register file per group key. The
    * shuffle carries ≤ 64 register rows per (map task, group) — the
    * grouped-sketch shape that answers "distinct users per segment" over
    * any number of segments in one pass, without a per-group
    * count-distinct expansion. Estimator arithmetic is identical to the
    * global variant (int64-exact, engine-portable). */
  def hllDistinctBy(df: DataFrame, keyCol: String,
      groupCol: String): DataFrame = {
    val (bucket, rho) = hllBucketRho(keyCol)
    val est = nonNullKeys(df, keyCol)
      .select(col(groupCol).as("_g"), bucket.as("b"), rho.as("rho"))
      .groupBy(col("_g"), col("b")).agg(max(col("rho")).as("r"))
      .groupBy(col("_g"))
      .agg(sum(expr("shiftleft(1L, cast(26 - r as int))")).as("s_present"),
        count(lit(1)).as("n_regs"))
      .select(col("_g"), expr(
        s"(709L * $HllM * $HllM * shiftleft(1L, 26)) div " +
          s"(s_present + ($HllM - n_regs) * shiftleft(1L, 26))")
        .as("hll_est_x1000"))
    // null-safe join + left: a NULL group is a group like any other (the
    // equi form silently dropped it); a group whose every key is NULL has
    // no register file — its estimate coalesces to 0, matching n_exact
    df.groupBy(col(groupCol))
      .agg(countDistinct(col(keyCol)).as("n_exact"))
      .join(est, col(groupCol) <=> col("_g"), "left")
      .select(col(groupCol), col("n_exact"),
        coalesce(col("hll_est_x1000"), lit(0L)).as("hll_est_x1000"))
  }

  /** Approximate quantiles from an integer histogram: bin = value div
    * `binWidth`, quantile q answers with the first bin whose cumulative
    * share reaches q%. The histogram aggregation is the only data-scale
    * work (partial combine, ≤ #bins rows per map task); the bin table —
    * post-aggregation metadata bounded by value-range/binWidth, like IVF
    * centroids — is then packed into ONE sorted array row and the
    * cumulative scan runs as an array fold, so no global-window shuffle
    * (and no single-partition window) ever touches the plan. Error ≤
    * binWidth by construction; all int64. */
  /** FLOOR-division bin of a value column — `(v − pmod(v, w)) div w`,
    * int64-exact. Plain `div` truncates toward zero, which for NEGATIVE
    * values merges bin 0 into (−w, w) and makes each negative bin's
    * `value_lo` its UPPER edge — the gate threshold would snap UP
    * instead of the documented "within binWidth BELOW the true
    * quantile". The value is aliased to an internal column first, so a
    * caller-supplied name never splices into raw SQL. Identical to
    * truncation on the non-negative domain (where the existing oracles
    * live); the DuckDB renderings floor the same way. */
  private def binOf(df: DataFrame, valueCol: String, binWidth: Long,
      carry: Seq[(Column, String)] = Nil): DataFrame =
    df.select(carry.map { case (c, n) => c.as(n) } :+
        col(valueCol).as("_v"): _*)
      .select(carry.map { case (_, n) => col(n) } :+
        expr(s"(_v - pmod(_v, ${binWidth}L)) div ${binWidth}L")
          .as("bin"): _*)

  def histogramQuantiles(df: DataFrame, valueCol: String, binWidth: Long,
      qs: Seq[Int]): DataFrame = {
    import df.sparkSession.implicits._
    val hist = binOf(df, valueCol, binWidth)
      .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
    val packed = hist
      .agg(array_sort(collect_list(struct(col("bin"), col("cnt"))))
        .as("bins"))
      .select(col("bins"), aggregate(col("bins"), lit(0L),
        (acc, x) => acc + x.getField("cnt")).as("n_total"))
    // per quantile: fold (cum, answer) once across the sorted bins
    packed.crossJoin(qs.toDF("q"))
      .select(col("q").cast("long").as("q"), quantileFold.as("bin"))
      .withColumn("value_lo", col("bin") * binWidth)
      // empty input → no bins → NULL fold answer; the SQL restatement's
      // join against an empty histogram returns ZERO rows, so drop the
      // null-bin rows to agree on the empty-table edge
      .filter(col("bin").isNotNull)
  }

  /** The (cum, answer) fold over a sorted `bins` array against `n_total`
    * and `q` columns — shared by the global and per-group variants. */
  private def quantileFold: Column =
    aggregate(col("bins"),
      struct(lit(0L).as("cum"), lit(null).cast("long").as("ans")),
      (acc, x) => {
        val cum = acc.getField("cum") + x.getField("cnt")
        struct(cum.as("cum"),
          when(acc.getField("ans").isNull &&
              cum * 100 >= col("n_total") * col("q"),
            x.getField("bin"))
            .otherwise(acc.getField("ans")).as("ans"))
      }).getField("ans")

  /** Per-group [[histogramQuantiles]] — the per-language / per-source
    * length-profile a corpus audit reports. One grouped histogram
    * aggregation (≤ #groups × #bins rows through the shuffle, partial
    * combine), then each group's bin table packs into one sorted array
    * row and the quantile fold runs per (group, q) — no window over the
    * raw rows, no per-group sort of data-scale input. */
  def histogramQuantilesBy(df: DataFrame, groupCol: String,
      valueCol: String, binWidth: Long, qs: Seq[Int]): DataFrame = {
    import df.sparkSession.implicits._
    val hist = binOf(df, valueCol, binWidth,
        carry = Seq(col(groupCol) -> "_g"))
      .groupBy(col("_g"), col("bin")).agg(count(lit(1)).as("cnt"))
    val packed = hist.groupBy(col("_g"))
      .agg(array_sort(collect_list(struct(col("bin"), col("cnt"))))
        .as("bins"))
      .select(col("_g"), col("bins"), aggregate(col("bins"), lit(0L),
        (acc, x) => acc + x.getField("cnt")).as("n_total"))
    packed.crossJoin(qs.toDF("q"))
      .select(col("_g").as(groupCol), col("q").cast("long").as("q"),
        quantileFold.as("bin"))
      .withColumn("value_lo", col("bin") * binWidth)
      .filter(col("bin").isNotNull)
  }

  /** Per-group quantile-threshold GATE — the 100 TB form of "keep each
    * language's top quartile by length" (the exact-ntile q_ntile_gate
    * keeps the WindowExec form for bounded groups; its scaladoc names
    * this one as the scale path). Exact ntile needs a per-group total
    * order — one sort task per group, wrong when one group is the whole
    * corpus. Here the per-group threshold comes from the
    * [[histogramQuantilesBy]] sketch (one partially-combined histogram
    * aggregation, ≤ #groups × #bins shuffle rows regardless of input
    * size or group skew), broadcasts back onto the stream (#groups
    * rows), and the gate is a map-side `value ≥ threshold` filter — no
    * window, no per-group sort, skew-immune. The trade is edge
    * precision: the threshold snaps DOWN to its bin's lower edge, so
    * the kept set is the exact ≥-threshold set for a threshold within
    * `binWidth` below the true quantile — a gate contract (deterministic,
    * engine-reproducible in exact int64), not a rank contract. */
  def quantileThresholdGate(df: DataFrame, groupCol: String,
      valueCol: String, binWidth: Long, q: Int): DataFrame = {
    require(q >= 1 && q <= 100, s"q must be a percentage in [1,100], got $q")
    val th = histogramQuantilesBy(df, groupCol, valueCol, binWidth, Seq(q))
      .select(col(groupCol).as("_gth"), col("value_lo").as("_th"))
    // null-safe group match: a NULL group has its own threshold like any
    // other — the equi form silently dropped every NULL-group row
    df.join(broadcast(th), col(groupCol) <=> col("_gth"))
      .filter(col(valueCol) >= col("_th"))
      .drop("_gth", "_th")
  }

  /** Count-min sketch dimensions: 4 hash rows × 512 counters. Error bound
    * e·N/512 per row, min over 4 independent rows — heavy-hitter (≥ ~2%)
    * resolution with a 2 KB register file. */
  val CmD = 4
  val CmW = 512

  /** The CM hash family (aᵣ, bᵣ), the same universal construction the
    * MinHash signatures use but a different seed — exposed so the DuckDB
    * oracle renders identical literals. */
  private[graft] def cmCoeffs: Seq[(Long, Long)] =
    Dedup.minhashCoeffs(CmD, seed = 11L)

  /** Heavy hitters via a count-min sketch, with the exact count alongside
    * for audit (the same estimate-plus-exact shape as [[hllDistinct]]).
    *
    * Build: each item hashes to one cell per row, hᵣ = ((aᵣ·h + bᵣ) mod P)
    * mod 512; the counter table is a groupBy over ≤ 4·512 keys, so the
    * sketch shuffle carries at most 2,048 partially-combined rows per map
    * task REGARDLESS of input size or key skew — this is the point: exact
    * per-key counting of a skewed stream shuffles every distinct key,
    * the sketch shuffles a constant. Probe: each candidate key reads its
    * 4 cells (broadcast join against the 2,048-row counter table) and
    * takes the min — an overestimate by at most the collision mass.
    * Emits keys whose estimate reaches `sharePermille`‰ of the stream;
    * all arithmetic int64-exact, engine-portable. */
  /** The d (row, cell) coordinates of one key — shared by the batch
    * heavy-hitter pass and the streaming sketch maintenance so both sides
    * address the identical register file. */
  private[graft] def cmCells(key: Column): Seq[Column] = {
    val h0 = polyHash(key.cast("string"))
    cmCoeffs.zipWithIndex.map { case ((a, b), r) =>
      struct(lit(r).as("r"),
        pmod(pmod(h0 * a + b, lit(Dedup.P)), lit(CmW.toLong)).as("cell"))
    }
  }

  def countMinHeavyHitters(items: DataFrame, keyCol: String = "token",
      sharePermille: Int = 20): DataFrame = {
    val cells = cmCells(col(keyCol))
    // ONE corpus scan: the audit-side exact counts are staged, and the
    // register file derives from them (a token's d cells are identical
    // for every occurrence, so summing n_exact per cell equals counting
    // occurrences — the value the streaming build produces). Sketch-only
    // production mode would aggregate the occurrence stream directly.
    val exact = Stage.barrier(items.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n_exact")))
    val counters = exact
      .select(col("n_exact"), explode(array(cells: _*)).as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.cell").as("cell"))
      .agg(sum(col("n_exact")).as("cnt"))
    val total = exact.agg(sum(col("n_exact")).cast("long").as("n_total"))
    exact
      .select(col(keyCol), col("n_exact"), explode(array(cells: _*)).as("rc"))
      .select(col(keyCol), col("n_exact"),
        col("rc.r").as("r"), col("rc.cell").as("cell"))
      .join(broadcast(counters), Seq("r", "cell"))
      .groupBy(col(keyCol), col("n_exact"))
      .agg(min(col("cnt")).cast("long").as("cm_est"))
      .crossJoin(broadcast(total)) // single-row frame
      .filter(col("cm_est") * 1000 >= col("n_total") * sharePermille.toLong)
      .select(col(keyCol), col("n_exact"), col("cm_est"), col("n_total"))
  }
}
