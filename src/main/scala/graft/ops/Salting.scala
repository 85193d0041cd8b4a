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

  /** Deterministic per-row salt in [0, nSalts) — hash of the whole row's
    * key list plus a spread column when provided, else a pseudo-random but
    * deterministic spread from monotonically_increasing_id. */
  def salt(nSalts: Int, spread: Column): Column =
    pmod(hash(spread), lit(nSalts))

  /** groupBy(key).agg(count, sum) with a salt phase. `spreadCol` must be a
    * column (not necessarily unique) that distributes rows of the same key
    * across salts — e.g. the event id. */
  def saltedCountSum(df: DataFrame, keyCol: String, spreadCol: String,
      valueCol: String, nSalts: Int = 16): DataFrame =
    df.withColumn("_salt", salt(nSalts, col(spreadCol)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
      .groupBy(col(keyCol))
      .agg(sum(col("_n")).as("n_rows"), sum(col("_s")).as("sum_value"))
}
