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

  test("length prune is exact: matches at every |len delta| ≤ maxDist survive") {
    // candidates at length deltas −2..+2 with true edit distance ≤ 2 must
    // all match (the prune is a LOWER bound, never a tighter filter), and
    // a same-length candidate at dist 3 must still miss
    val build = Seq(
      (1L, "abcd", "k"),     // len 4
      (2L, "abcdef", "k"),   // len 6
      (3L, "ab", "k"),       // len 2
      (4L, "wxyz", "k"))     // len 4 but dist 4 from "abcd"? (all 4 differ)
      .toDF("b_id", "b_text", "block")
    val probe = Seq(
      (10L, "abcd", "k"),    // dist 0 to b1
      (11L, "abcde", "k"),   // dist 1 to b1 (len +1), 1 to b2 (len −1)
      (12L, "abc", "k"),     // dist 1 to b1, 1 to b3
      (13L, "qqqq", "k"))    // same length as b1/b4, dist 4 → unmatched
      .toDF("p_id", "p_text", "block")
    val r = Fuzzy.blockedFuzzyJoin(probe, build, maxDist = 2).collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(2)) None
        else Some((x.getString(2), x.getLong(3))))).toMap
    assert(r(10L) == Some(("abcd", 0L)))
    assert(r(11L) == Some(("abcd", 1L)))
    // tie at dist 1 between "ab" and "abcd": lexicographically "ab" wins
    assert(r(12L) == Some(("ab", 1L)))
    assert(r(13L) == None, "same-length over-budget candidate must miss")
  }

  test("block-population rail: a degenerate block drops loudly, others match") {
    // block "hot" has 40×40 distinct candidate pairs; with the rail at
    // 1000 it is dropped (probes unmatched) and COUNTED, while the sane
    // block still matches
    val build = ((1L to 40L).map(i => (i, f"hot text $i%03d", "hot")) :+
      (100L, "cool text", "cool")).toDF("b_id", "b_text", "block")
    val probe = ((1L to 40L).map(i => (i + 500L, f"hot text $i%03x", "hot")) :+
      (600L, "cool texx", "cool")).toDF("p_id", "p_text", "block")
    val (out, dropped) =
      Fuzzy.blockedFuzzyJoinWithStats(probe, build, maxDist = 2,
        maxBlockPairs = 1000L)
    val r = out.collect().map(x => x.getLong(0) ->
      (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(dropped == 1L, "exactly the hot block must be dropped, counted")
    assert(r(600L) == Some(100L), "the sane block must still match")
    assert((501L to 540L).forall(r(_) == None),
      "dropped-block probes must surface as unmatched rows, not vanish")
    // default rail: nothing dropped, hot probes match again
    val (_, dropped2) = Fuzzy.blockedFuzzyJoinWithStats(probe, build, 2)
    assert(dropped2 == 0L)
  }

  test("plain blockedFuzzyJoin is pure plan construction: no jobs, " +
      "no pinned caches") {
    val build = Seq((1L, "aaaa", "k")).toDF("b_id", "b_text", "block")
    val probe = Seq((2L, "aaab", "k")).toDF("p_id", "p_text", "block")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val stagedBefore = Stage.stagedCount(spark)
      val out = Fuzzy.blockedFuzzyJoin(probe, build)
      Thread.sleep(500) // job-start events are async; let any drain
      assert(jobs.get() == 0,
        "operator construction must not launch Spark jobs (r11 rail " +
          "censuses ran 3 eager jobs per call)")
      assert(Stage.stagedCount(spark) == stagedBefore,
        "operator construction must not pin staging caches")
      assert(out.collect().map(_.getLong(0)).toSeq == Seq(2L))
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("lazy rail: dropped blocks surface via the graft.rail observation") {
    Rail.clearObservation(Fuzzy.BlockPairsRail)
    val build = ((1L to 40L).map(i => (i, f"hot text $i%03d", "hot")) :+
      (100L, "cool text", "cool")).toDF("b_id", "b_text", "block")
    val probe = ((1L to 40L).map(i => (i + 500L, f"hot text $i%03x", "hot")) :+
      (600L, "cool texx", "cool")).toDF("p_id", "p_text", "block")
    val out = Fuzzy.blockedFuzzyJoin(probe, build, maxDist = 2,
      maxBlockPairs = 1000L)
    val r = out.collect().map(x => x.getLong(0) ->
      (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(r(600L) == Some(100L) && r(501L) == None,
      "rail semantics must match the eager WithStats path")
    // the census count rides the caller's action as an observation and
    // arrives via the (async) listener bus — poll briefly
    var seen: Option[Long] = None
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (seen.isEmpty && System.nanoTime() < deadline) {
      seen = Rail.observationSeen(Fuzzy.BlockPairsRail)
      if (seen.isEmpty) Thread.sleep(50)
    }
    assert(seen.contains(1L),
      s"rail census must surface as an observed metric, got $seen")
  }
}
