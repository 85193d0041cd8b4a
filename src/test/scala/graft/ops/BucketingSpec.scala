package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plan-asserted shuffle elimination via bucketed layout — the write-once
  * shuffle the 100 TB pipeline buys for its constantly-joined tables. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  // shuffle nodes print as "Exchange hashpartitioning(...)"; broadcast
  // builds print as "BroadcastExchange ..." and are not shuffles
  private def nExchanges(df: org.apache.spark.sql.DataFrame): Int = {
    val p = df.queryExecution.executedPlan.toString
    "Exchange ".r.findAllIn(p).size -
      "BroadcastExchange ".r.findAllIn(p).size
  }

  test("both sides bucketed on the join key: zero exchanges, same result") {
    val dim = (1L to 200L).map(i => (i, s"name_$i")).toDF("id", "name")
    val fact = (1L to 2000L).map(i => (i % 200 + 1, i)).toDF("id", "v")
    Bucketing.writeBucketed(dim, "bspec_dim", "/tmp/graft_bspec/dim",
      "id", 8, sortCols = Seq("id"))
    Bucketing.writeBucketed(fact, "bspec_fact", "/tmp/graft_bspec/fact",
      "id", 8, sortCols = Seq("id"))
    val joined = spark.table("bspec_dim")
      .join(spark.table("bspec_fact"), Seq("id"))
    assert(nExchanges(joined) == 0,
      "co-partitioned bucketed join must not shuffle either side:\n" +
        joined.queryExecution.executedPlan)
    val plain = dim.join(fact, Seq("id"))
    assert(joined.count() == 2000L && plain.count() == 2000L)
    assert(joined.agg(sum(col("v"))).head.getLong(0) ==
      plain.agg(sum(col("v"))).head.getLong(0))
  }

  test("bucketed corpus digest table: only the batch side shuffles") {
    val corpus = (1L to 500L)
      .map(i => (i, f"digest_$i%04d")).toDF("doc_id", "digest")
    Bucketing.writeBucketed(corpus, "bspec_digests",
      "/tmp/graft_bspec/digests", "digest", 8)
    val batch = Seq((9001L, "digest_0007"), (9002L, "fresh_a"),
      (9003L, "fresh_b")).toDF("doc_id", "_dig")
    // at test scale the planner would (rightly) broadcast the toy corpus;
    // disable auto-broadcast to observe the at-scale plan, where the
    // corpus is terabytes and only the batch can move
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val kept = Bucketing.antiJoinBucketed(spark, batch, "bspec_digests")
      // one exchange — the small batch moving onto the corpus layout; the
      // corpus scan itself reads its buckets in place
      assert(nExchanges(kept) == 1,
        kept.queryExecution.executedPlan.toString)
      assert(kept.queryExecution.executedPlan.toString
        .contains("Bucketed: true"), "corpus scan must read its buckets")
      assert(kept.select(col("doc_id")).as[Long].collect().sorted.toSeq ==
        Seq(9002L, 9003L))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      threshold)
  }
}
