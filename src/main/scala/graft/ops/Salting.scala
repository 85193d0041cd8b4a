package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers: two-phase (salted) aggregation for hot keys.
  *
  * AQE's skew-join handling covers joins; for aggregations over a key whose
  * distribution is pathological (one user with 10⁹ events at 100 TB), a
  * deterministic salt splits each hot key across `nSalts` reducers, then a
  * second (tiny) aggregation recombines per key. Both phases are hash
  * aggregations with map-side partials; total shuffle volume is unchanged
  * but the max partition size drops by ~nSalts.
  */
object Salting {

  /** Deterministic per-row salt in [0, nSalts): hash(spread) mod nSalts.
    * `spread` must vary WITHIN a hot key (an event id, a timestamp) — a
    * column constant per key yields one salt bucket and no skew
    * mitigation. */
  def salt(nSalts: Int, spread: Column): Column =
    pmod(hash(spread), lit(nSalts))

  /** groupBy(key).agg(count, sum) with a salt phase. `spreadCol` must be a
    * column (not necessarily unique) that distributes rows of the same key
    * across salts — e.g. the event id.
    *
    * MEASURED caveat (SkewBench): for algebraic aggregates like count/sum,
    * Spark's map-side partial aggregation already shuffles one row per key
    * per partition, so a skewed KEY does not skew the shuffle and this
    * two-phase plan adds a stage for little gain. It earns its keep when
    * the partial combine is ineffective — very wide buffers, or aggregate
    * modes that can't partially combine. For skewed JOINS use
    * [[saltedJoin]], where the hot key otherwise pins to one reducer. */
  def saltedCountSum(df: DataFrame, keyCol: String, spreadCol: String,
      valueCol: String, nSalts: Int = 16): DataFrame =
    df.withColumn("_salt", salt(nSalts, col(spreadCol)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
      .groupBy(col(keyCol))
      .agg(sum(col("_n")).as("n_rows"), sum(col("_s")).as("sum_value"))

  /** Skew-safe equi-join of a skewed `big` side against a `small` (but not
    * broadcastable) side: big rows get a deterministic salt from
    * `spreadCol`, the small side replicates once per salt, and the join
    * key becomes (key, salt) — the hot key's rows spread over `nSalts`
    * reducers instead of one straggler task. Inner-join semantics are
    * identical to `big.join(small, key)` (each big row matches exactly the
    * same small rows, under exactly one salt). Use when the small side is
    * too big to broadcast and AQE's skew-join can't kick in (its byte
    * thresholds untriggered — measured in BENCH_NOTES.md — or the skewed
    * side feeds an aggregation that AQE must not re-split). Shuffle
    * volume: big unchanged, small × nSalts — cheap when |small| ≪ |big|,
    * the regime where key skew hurts. MEASURED (SkewBench): the plain
    * skewed join runs the hot key as ONE max-size task; salting divides
    * the max task by ~nSalts — the property that prevents the
    * spill/OOM/straggler at 100 TB, where that one task is terabytes.
    *
    * nSalts default (`<= 0` = auto): 4× the session's shuffle
    * parallelism. The salt buckets land in reducer partitions by HASH,
    * so with nSalts ≈ partitions the binning is lumpy (balls-in-bins:
    * at 16 salts / 32 partitions one task drew 3 hot buckets = 126MB of
    * a 418MB hot key, measured r10) while nSalts ≫ partitions smooths it
    * (128 salts / 32 partitions: max task 37MB ≈ 1.1× mean, wall on par
    * with forced-AQE splitting). The extra dim replication is the cheap
    * side of the trade by construction. */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCol: String,
      spreadCol: String, nSalts: Int = -1): DataFrame = {
    // auto n is CAPPED: 4× parallelism smooths the balls-in-bins lumps
    // (see above), but on a wide cluster (thousands of shuffle
    // partitions) an uncapped factor replicates the small side by
    // thousands — past ~1024 salts the binning is already smooth and the
    // replication starts to rival |big|, inverting the trade
    val n =
      if (nSalts > 0) nSalts
      else math.min(
        4 * big.sparkSession.sessionState.conf.numShufflePartitions, 1024)
    val salted = big.withColumn("_salt", salt(n, col(spreadCol)))
    // sequence, not an n-child array literal: the replication factor must
    // not bloat the plan/codegen (an 8000-element CreateArray is an
    // 8000-child expression tree)
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, Seq(keyCol, "_salt")).drop("_salt")
  }
}
