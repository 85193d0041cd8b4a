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
}
