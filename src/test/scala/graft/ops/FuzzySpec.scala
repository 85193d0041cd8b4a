package graft.ops

import graft.SparkSpec

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  test("blocked fuzzy join: best match, deterministic ties, null misses") {
    val build = Seq(
      (10L, "red widget", "red"),
      (11L, "red widgets", "red"),   // dist 1 from "red widget"
      (12L, "red widget", "red"),    // duplicate text, higher id
      (20L, "blue bolt", "blue"))
      .toDF("b_id", "b_text", "block")
    val probe = Seq(
      (1L, "red widget", "red"),     // exact: dist 0, rep id 10 (min)
      (2L, "red widgett", "red"),    // dist 1 to BOTH candidates → min text
      (3L, "blue boat", "blue"),     // one substitution from "blue bolt"
      (4L, "green gear", "green"),   // empty block → null
      (5L, "red wzzzzzz", "red"))    // in-block but beyond maxDist → null
      .toDF("p_id", "p_text", "block")
    val r = Fuzzy.blockedFuzzyJoin(probe, build, maxDist = 2).collect()
      .map(x => x.getLong(0) -> (
        if (x.isNullAt(1)) None else Some((x.getLong(1), x.getString(2),
          x.getLong(3))))).toMap
    assert(r(1L) == Some((10L, "red widget", 0L)))
    // tie at dist 1: "red widget" < "red widgets" lexicographically
    assert(r(2L) == Some((10L, "red widget", 1L)))
    assert(r(3L) == Some((20L, "blue bolt", 1L)))
    assert(r(4L) == None)
    assert(r(5L) == None)
  }

  test("blocking contract: a match outside the block stays unmatched") {
    val build = Seq((1L, "alpha beta", "alpha")).toDF("b_id", "b_text", "block")
    // identical text but a different blocking key: never considered
    val probe = Seq((9L, "alpha beta", "other")).toDF("p_id", "p_text", "block")
    val r = Fuzzy.blockedFuzzyJoin(probe, build).collect()
    assert(r.length == 1 && r.head.isNullAt(1))
  }

  test("duplicate probe text across blocks: each row matched in ITS block") {
    // same text twice under different blocks; the candidate exists only
    // in blockA — the blockB row must NOT inherit blockA's match, and
    // the matched id must come from the searched block (not the lower
    // id under an unsearched block)
    val build = Seq(
      (7L, "anna", "blockA"),
      (3L, "anna", "blockB"))   // lower id, but in the OTHER block
      .toDF("b_id", "b_text", "block")
    val probe = Seq(
      (1L, "ann", "blockA"),
      (2L, "ann", "blockC"))    // empty block
      .toDF("p_id", "p_text", "block")
    val r = Fuzzy.blockedFuzzyJoin(probe, build).collect()
      .map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(r(1L) == Some(7L), "must take blockA's id, not blockB's lower one")
    assert(r(2L) == None, "a probe in an empty block must stay unmatched")
  }
}
