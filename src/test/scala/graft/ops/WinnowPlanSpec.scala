package graft.ops

import graft.SparkSpec

/** Plan audit for the winnowing/lexical family added in r10: pins the
  * physical shapes the scale story claims, so a refactor can't silently
  * degrade them. Runs on sf0.001 query entries (plan shape, not data). */
class WinnowPlanSpec extends SparkSpec {

  private val dir = sf

  private def executed(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("winnow: native expression in a scan-project pipeline, no shuffle") {
    val qe = graft.queries.TextOps.winnowQ(spark, dir).queryExecution
    val plan = qe.executedPlan.toString
    assert(plan.contains("winnow_fps"),
      "native WinnowFps expression missing from the plan:\n" + plan.take(600))
    assert(!plan.contains("Exchange"),
      "winnow selection must be shuffle-free:\n" + plan.take(600))
  }

  test("winnow pairs: df-rail and pairing are equi-joins, never cartesian") {
    val qe = graft.queries.TextOps.winnowPairs(spark, dir).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "fp self-join degenerated to a cross product:\n" + plan.take(600))
    // the fp relation is STAGED: the df count + both self-join sides
    // read the barriered frame — an unstaged plan re-evaluates the
    // winnow expression over the corpus once per branch (4× measured).
    // Node collection stops at InMemoryTableScan leaves, so any
    // GenerateExec found here is one that would EXECUTE per branch.
    val liveGenerates = qe.executedPlan.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g }
    assert(liveGenerates.isEmpty && (plan.contains("Scan ExistingRDD") ||
        plan.contains("InMemoryTableScan")),
      "fp relation not staged — winnow recomputed per branch:\n" +
        plan.take(600))
    graft.ops.Stage.releaseAll(spark)
  }

  test("vocab overlap: token self-join is an equi-join, never cartesian") {
    val plan = executed(graft.queries.TextOps.vocabOverlapQ(spark, dir))
    assert(!plan.contains("CartesianProduct"),
      "unbroadcast cross product planned:\n" + plan.take(600))
    // the corpus-sized TOKEN self-join must stay an equi-join on tok
    assert(plan.contains("Join [tok"),
      "token self-join degenerated from an equi-join:\n" + plan.take(600))
    // the r13 zero-overlap completion builds its pair skeleton as ONE
    // bounded cross join of the |sources|-row sizes frame (broadcast
    // nested loop over an aggregate — allowed); anything beyond that
    // single skeleton join means a corpus-sized relation went nested-loop
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1,
      "more than the pair-skeleton cross join went nested-loop:\n" +
        plan.take(600))
    assert(plan.contains("Scan ExistingRDD") ||
        plan.contains("InMemoryTableScan"),
      "distinct vocabulary not staged — tokenized per branch:\n" +
        plan.take(600))
    graft.ops.Stage.releaseAll(spark)
  }

  test("lexical diversity: per-row projection, no shuffle") {
    val plan = executed(graft.queries.TextOps.lexicalDiv(spark, dir))
    assert(!plan.contains("Exchange"),
      "lexical diversity must be a narrow projection:\n" + plan.take(600))
  }
}
