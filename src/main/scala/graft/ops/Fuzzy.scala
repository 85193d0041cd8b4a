package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy entity matching — the approximate-equality join the
  * relational family lacks: probe strings matched to build strings
  * within a Levenshtein budget, without a cartesian product.
  *
  * The caller supplies the BLOCKING key and owns its completeness
  * argument (a candidate pair outside the block is silently unmatched
  * — that is the blocking contract, same as LSH banding): e.g. for
  * trailing-character noise, the first token is edit-invariant, so
  * first-token blocking is complete.
  *
  * Scale design — collapse to DISTINCT strings first, the same move as
  * SimHash canonical's signature collapse: entity-name columns have
  * bounded vocabulary, so the verify join runs over |distinct probe| ×
  * |distinct build per block| candidates REGARDLESS of row count; the
  * corpus-sized frames only ever see hash equi-joins on the text. Best
  * match per probe string is min(struct(dist, text)) — the map-side-
  * combining argmin, no window — then a per-text min-id representative
  * attaches a stable build id. Probes with no candidate within budget
  * survive with null match columns (left join), so downstream can split
  * matched/unmatched without a second pass.
  */
object Fuzzy {

  /** probe: (p_id, p_text, block); build: (b_id, b_text, block).
    * Returns (p_id, match_id, match_text, dist) for every probe row;
    * null match columns when nothing in the probe's block is within
    * `maxDist`. Ties: smallest (dist, b_text), then smallest b_id of
    * that text IN THE BLOCK — fully deterministic. The block key is
    * carried through every stage (best-match grouping, join-back, and
    * the representative-id lookup): a probe text that recurs under a
    * different blocking key must not inherit a match found in someone
    * else's block, and a matched text's id must come from the block
    * that was actually searched. */
  def blockedFuzzyJoin(probe: DataFrame, build: DataFrame,
      maxDist: Int = 2): DataFrame = {
    val pn = probe.select(col("p_text"), col("block")).distinct()
    val bn = build.select(col("b_text"), col("block")).distinct()
    val matched = pn.join(bn, "block")
      .withColumn("dist", levenshtein(col("p_text"), col("b_text")))
      .filter(col("dist") <= maxDist)
    val best = matched.groupBy("p_text", "block")
      .agg(min(struct(col("dist"), col("b_text"))).as("m"))
      .select(col("p_text"), col("block"),
        col("m.b_text").as("match_text"),
        col("m.dist").cast("long").as("dist"))
    val rep = build.groupBy(col("b_text").as("match_text"), col("block"))
      .agg(min(col("b_id")).as("match_id"))
    probe.select(col("p_id"), col("p_text"), col("block"))
      .join(best, Seq("p_text", "block"), "left")
      .join(rep, Seq("match_text", "block"), "left")
      .select(col("p_id"), col("match_id"), col("match_text"),
        col("dist"))
  }
}
