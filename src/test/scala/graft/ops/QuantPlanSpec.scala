package graft.ops

import graft.SparkSpec

/** Plan audit for the quantized ANN path: the O(d²)-per-row pathology this
  * round removed was `array_min`/`array_max` expression trees captured
  * INSIDE the code lambda (interpreted HOFs re-evaluate captured children
  * per element). CollapseProject must keep the staged projections apart —
  * this spec fails if a future refactor (or optimizer change) re-inlines
  * them. */
class QuantPlanSpec extends SparkSpec {

  test("quantization is the fused kernel, evaluated once per row") {
    val embs = graft.Tables(spark, sf).embeddings
    for (df <- Seq(Similarity.knnQuantized(embs, 5, 3, 8),
        Similarity.quantizeInt8(embs))) {
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!"lambdafunction\\([^\n]*array_min".r.findFirstIn(plan).isDefined,
        "array_min captured inside a lambda body — the per-element " +
          "re-evaluation pathology is back")
      // the kernel appears, and only in the ALIASING projection — field
      // extraction must not have collapsed into four per-row evaluations
      val hits = "quantize_int8".r.findAllIn(plan).size
      assert(hits >= 1, "expected the fused quantize_int8 kernel")
      assert(hits <= 2, // ≤ one aliased evaluation per join side
        s"quantize_int8 inlined $hits times — CollapseProject merged the " +
          "struct alias into its field extractions:\n" + plan)
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
