package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: for each probe row, the latest build row
  * with the same key and build ts ≤ probe ts — the join that makes ML
  * feature lookups leakage-free (a feature computed AFTER the label's
  * timestamp must never be visible to it).
  *
  * Spark-first composition (no custom plan needed): tag both inputs,
  * union, and run ONE running `last(ignoreNulls)` window per key ordered
  * by (ts, side, build-id) — build rows sort before probe rows at equal
  * ts, so "at or before" is inclusive, and ties among builds resolve to
  * the max id deterministically (the SQL oracle replays the same rule).
  * Cost: one shuffle on the key, a per-key sort, O(1) running state per
  * row — the same plan shape a sessionization window pays, with none of
  * the per-probe subqueries a naive formulation would scale as.
  */
object AsOf {

  /** For each probe row: (probe id, key, matched build id or null).
    * `buildIdCol` must be long-typed and unique within the build side;
    * ties on (key, ts) deterministically keep the max build id. */
  def asOfLatest(probe: DataFrame, build: DataFrame, keyCol: String,
      probeTsCol: String, probeIdCol: String,
      buildTsCol: String, buildIdCol: String): DataFrame = {
    val p = probe.select(col(keyCol).as("_k"), col(probeTsCol).as("_t"),
      col(probeIdCol).as("_pid"),
      lit(null).cast("long").as("_bid"), lit(0).as("_side"))
    // Drop null-key / null-ts build rows: the SQL restatement's equi-join
    // never matches NULLs, while partitionBy groups NULL keys together and
    // sorts NULL timestamps first — without this filter a null-key probe
    // could "match" a null-key build row. With it, a null-key probe sits in
    // a build-free partition and a null-ts probe sorts before every build
    // row (nulls-first asc), so both engines agree: no match.
    val b = build
      .filter(col(keyCol).isNotNull && col(buildTsCol).isNotNull)
      .select(col(keyCol).as("_k"), col(buildTsCol).as("_t"),
        lit(null).cast(probe.schema(probeIdCol).dataType).as("_pid"),
        col(buildIdCol).cast("long").as("_bid"), lit(1).as("_side"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_side").desc, col("_bid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.unionByName(b)
      .withColumn("_match", last(col("_bid"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      .select(col("_pid").as(probeIdCol), col("_k").as(keyCol),
        col("_match").as(s"asof_$buildIdCol"))
  }

  /** [[asOfLatest]] carrying a build-side value column alongside the id:
    * the matched id is joined back to the build side (broadcast-friendly
    * when the build side is dimensional; shuffle equi-join otherwise). */
  def asOfLatestWith(probe: DataFrame, build: DataFrame, keyCol: String,
      probeTsCol: String, probeIdCol: String, buildTsCol: String,
      buildIdCol: String, valueCol: Column, valueName: String): DataFrame = {
    val matched = asOfLatest(probe, build, keyCol, probeTsCol, probeIdCol,
      buildTsCol, buildIdCol)
    val vals = build.select(col(buildIdCol).cast("long")
      .as(s"asof_$buildIdCol"), valueCol.as(valueName))
    matched.join(vals, Seq(s"asof_$buildIdCol"), "left")
      .select(col(probeIdCol), col(keyCol), col(s"asof_$buildIdCol"),
        col(valueName))
  }
}
