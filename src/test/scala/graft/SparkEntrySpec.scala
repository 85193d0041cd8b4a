package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract's merge guard: `Map ++ Map` silently drops the
  * left value on a key collision, which once cost a round part of its
  * correctness surface (q_full_outer/q_pivot shadowed). mergeDistinct
  * must fail LOUDLY instead, naming the key and both owning modules. */
class SparkEntrySpec extends AnyFunSuite {

  test("mergeDistinct passes through disjoint maps unchanged") {
    val merged = SparkEntry.mergeDistinct(Seq(
      "a" -> Map("q_x" -> 1, "q_y" -> 2), "b" -> Map("q_z" -> 3)))
    assert(merged === Map("q_x" -> 1, "q_y" -> 2, "q_z" -> 3))
  }

  test("a colliding key fails the merge loudly, naming key and modules") {
    val e = intercept[IllegalStateException] {
      SparkEntry.mergeDistinct(Seq(
        "modA" -> Map("q_dup" -> 1, "q_a" -> 2),
        "modB" -> Map("q_dup" -> 3)))
    }
    assert(e.getMessage.contains("q_dup"))
    assert(e.getMessage.contains("modA") && e.getMessage.contains("modB"))
  }

  test("the real query and oracle maps merge without collisions") {
    // Evaluating these exercises mergeDistinct's duplicate-key check; a
    // regression that reintroduces a duplicate key fails here, not in
    // the driver's correctness run.
    assert(SparkEntry.queries.nonEmpty)
    assert(SparkEntry.oracleSql.nonEmpty)
    // every oracle key must name a real query — a typo'd oracle entry
    // would otherwise record a DuckDB run with nothing to compare against
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without a query: $orphans")
  }
}
