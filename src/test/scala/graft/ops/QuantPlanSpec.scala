package graft.ops

import graft.SparkSpec

/** Plan audit for the quantized ANN path: the O(d²)-per-row pathology this
  * round removed was `array_min`/`array_max` expression trees captured
  * INSIDE the code lambda (interpreted HOFs re-evaluate captured children
  * per element). CollapseProject must keep the staged projections apart —
  * this spec fails if a future refactor (or optimizer change) re-inlines
  * them. */
class QuantPlanSpec extends SparkSpec {

  test("quantization lambda captures attributes, not array_min/max trees") {
    val embs = graft.Tables(spark, sf).embeddings
    for (df <- Seq(Similarity.knnQuantized(embs, 5, 3, 8),
        Similarity.quantizeInt8(embs))) {
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!"lambdafunction\\([^\n]*array_min".r.findFirstIn(plan).isDefined,
        "array_min captured inside a lambda body — the per-element " +
          "re-evaluation pathology is back")
    }
  }

  test("the sq8 shortlist dot product is the native kernel, not a HOF") {
    val embs = graft.Tables(spark, sf).embeddings
    val plan = Similarity.knnQuantized(embs, 5, 3, 8)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("vec_dot"), "expected the fused native kernel")
    assert(!plan.contains("zip_with"),
      "interpreted zip_with survives in the scoring path")
  }
}
