package graft.ops

import graft.SparkSpec

/** Plan audit for the r7 operators: each one's scale story names a join
  * strategy — this spec pins it so a refactor (or an optimizer change)
  * can't silently swap a broadcast for a shuffle or an equi-join for a
  * cartesian. Runs on sf0.001 query entries (plan shape, not data). */
class R7PlanSpec extends SparkSpec {

  private val dir = sf

  private def executed(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("decontamination broadcasts the ban set — corpus side stays put") {
    val plan = executed(graft.queries.CorpusOps.decontaminate(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      "ban-set join is not broadcast:\n" + plan.take(600))
    assert(!plan.contains("CartesianProduct"))
  }

  test("semantic dedup: cluster self-join is a real equi-join") {
    val plan = executed(graft.queries.DedupSim.semanticDedup(spark, dir))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "within-cluster pairing degenerated to a cross product:\n" +
        plan.take(600))
  }

  test("incremental near-dup screen: banding never goes quadratic") {
    val plan = executed(
      graft.queries.DedupSim.incrementalNearDedup(spark, dir))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "band join degenerated to a cross product:\n" + plan.take(600))
  }

  test("materialized mix broadcasts the plan onto the corpus") {
    val plan = executed(graft.queries.CorpusOps.materializeMix(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      "plan join is not broadcast:\n" + plan.take(600))
  }

  test("pageRank: rounds read the STAGED edge/degree frames, no " +
      "cartesian") {
    val plan = executed(graft.queries.Relational.pageRank(spark, dir))
    // staged frames surface as opaque LogicalRDD leaves since the r20
    // barrier truncation ("Scan ExistingRDD"); the old marker was the
    // InMemoryTableScan the pre-truncation barrier exposed
    assert(plan.contains("Scan ExistingRDD") ||
        plan.contains("InMemoryTableScan"),
      "edges/degrees not staged — every round rescans the source:\n" +
        plan.take(600))
    assert(!plan.contains("CartesianProduct"),
      "a rank join degenerated to a cartesian product:\n" +
        plan.take(600))
    // ONE edge join per round (deg staged onto the edge relation once) +
    // one |nodes|-row rank rebuild per round: ≤ 2 joins × 3 iters. The
    // old shape paid a third (edge ⋈ deg) join every round. Counted by
    // TREE traversal: InMemoryTableScan has no children, so the staging
    // plans cached behind the barriers don't inflate the count (the
    // printed form re-renders them at every reference).
    val joins = graft.queries.Relational.pageRank(spark, dir)
      .queryExecution.executedPlan
      .collect { case p if p.nodeName.contains("Join") => p }.size
    assert(joins <= 6,
      s"expected <= 2 joins per round over 3 rounds, found $joins:\n" +
        plan.take(600))
  }

  test("click attribution: keyed join with range residual, no range " +
      "cartesian") {
    val plan = executed(graft.queries.TextOps.clickAttrib(spark, dir))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "the interval predicate escaped the equi-join residual:\n" +
        plan.take(600))
  }

  test("landing pipeline: every stage keeps its audited join strategy") {
    val plan = executed(graft.queries.DedupSim.landingPipeline(spark, dir))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "a landing stage degenerated to a cross product:\n" + plan.take(600))
  }

  test("bm25: broadcast joins + distributed top-k, no global sort") {
    val plan = executed(graft.queries.TextOps.bm25(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"),
      "bm25 top-k is not a TakeOrdered:\n" + plan.take(600))
    assert(plan.contains("BroadcastHashJoin"),
      "df/stats frames are not broadcast:\n" + plan.take(600))
  }

  test("hybridSearch: shortlist rerank is broadcast, no corpus-wide " +
      "vector math") {
    val plan = executed(graft.queries.DedupSim.hybridSearch(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      "shortlist join is not broadcast:\n" + plan.take(600))
    assert(!plan.contains("CartesianProduct"),
      "rerank degenerated to a cartesian product:\n" + plan.take(600))
  }

  test("oovRate: vocabulary is broadcast onto the token stream") {
    val plan = executed(graft.queries.TextOps.oovRate(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      "vocab join is not broadcast:\n" + plan.take(600))
  }

  test("clusterCap: bounded aggregate, no per-cluster sort window") {
    val plan = executed(graft.queries.DedupSim.clusterCap(spark, dir))
    assert(!plan.contains("Window"),
      "cluster cap degenerated to a row_number window:\n" + plan.take(600))
    assert(plan.contains("ObjectHashAggregate"),
      "TopKAgg buffers not in play:\n" + plan.take(600))
  }

  test("randomProjection: pure projection — no shuffle, no join") {
    val plan = executed(graft.queries.DedupSim.randProj(spark, dir))
    assert(!plan.contains("Exchange"),
      "JL projection shuffles:\n" + plan.take(600))
    assert(!plan.contains("Join"),
      "JL projection joins:\n" + plan.take(600))
  }

  test("linear score: no join at all — weights are a literal lookup") {
    val plan = executed(graft.queries.TextOps.linearScore(spark, dir))
    assert(!plan.contains("Join"),
      "classifier scoring grew a join; weights must stay a broadcast " +
        "literal element_at:\n" + plan.take(600))
  }
}
