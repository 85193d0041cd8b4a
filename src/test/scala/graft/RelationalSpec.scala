package graft

import graft.queries.Relational

class RelationalSpec extends SparkSpec {

  test("every relational query runs at sf0.001 and has a schema") {
    Relational.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, name)
      assert(df.count() >= 0, name)
    }
  }

  test("every relational query has an oracle") {
    assert(Relational.oracle.keySet == Relational.queries.keySet)
  }

  test("count_star matches direct parquet count") {
    val n = Relational.countStar(spark, sf).head().getLong(0)
    assert(n == spark.read.parquet(s"$sf/lineitem.parquet").count())
  }

  test("semi + anti partition orders") {
    val semi = Relational.semiJoin(spark, sf).count()
    val anti = Relational.antiJoin(spark, sf).count()
    val all = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(semi + anti == all)
  }

  test("key_split semantics: first-colon split with 'regular' default") {
    val rows = Relational.keySplit(spark, sf)
      .selectExpr("k", "tag_type", "tag_key").collect()
    rows.foreach { r =>
      val (k, t, key) = (r.getString(0), r.getString(1), r.getString(2))
      if (k.contains(":")) {
        assert(t == k.substring(0, k.indexOf(':')))
        assert(key == k.substring(k.indexOf(':') + 1))
      } else {
        assert(t == "regular" && key == k)
      }
    }
  }

  test("joinAgg broadcasts the dimension side") {
    val plan = Relational.joinAgg(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("star join broadcasts dims and gaps are non-negative") {
    val plan = Relational.starJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    val deltas = Relational.eventDeltas(spark, sf).collect()
    // exactly one NULL gap (first event) per user
    val byUser = deltas.groupBy(_.getLong(0))
    byUser.values.foreach { rows =>
      assert(rows.count(_.isNullAt(2)) == 1)
      rows.filter(!_.isNullAt(2)).foreach(r => assert(r.getLong(2) >= 0L))
    }
  }

  test("json_agg parses every props payload") {
    val events = spark.read.parquet(s"$sf/events.parquet")
    val out = Relational.jsonAgg(spark, sf)
    // every event carries a k field, so per-type counts sum to the total
    val parsed = out.selectExpr("sum(n_with_k)").head().getLong(0)
    assert(parsed == events.count())
  }

  test("pivot columns partition the event count") {
    val out = Relational.pivotCounts(spark, sf)
    val total = out
      .selectExpr("sum(click + view + purchase + signup + error)")
      .head().getLong(0)
    assert(total == spark.read.parquet(s"$sf/events.parquet").count())
    // no collect-distinct job: the pivot plan is a single aggregate
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("collectlimit"), plan.take(1000))
  }

  test("pivot keeps a NULL group key (fill is scoped to pivot columns)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pivot-null").toString
    Seq((Some(1L), "click", 1000000000L, "{}"),
        (None, "view", 2000000000L, "{}"))
      .toDF("user_id", "event_type", "ts", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val rows = Relational.pivotCounts(spark, dir).collect()
    val nullRow = rows.filter(_.isNullAt(0))
    // the NULL user survives as SQL's NULL group — not rewritten to 0
    assert(nullRow.length == 1 && nullRow.head.getLong(2) == 1L)
    assert(rows.filterNot(_.isNullAt(0)).head.getLong(1) == 1L)
  }

  test("rollup emits leaf + subtotal + grand-total grouping sets") {
    val out = Relational.rollupAgg(spark, sf).collect()
    // 25 nations + 5 region subtotals + 1 grand total
    assert(out.length == 31)
    val grand = out.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    val nCust = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(grand.head.getLong(2) == nCust)
  }
}
