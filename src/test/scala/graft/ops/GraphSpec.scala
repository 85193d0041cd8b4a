package graft.ops

import graft.SparkSpec

/** Integer PageRank on hand-computable graphs. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: symmetric 2-cycle is the fixed point 1000000") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 3).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("pageRank: star center accumulates; exact fixed-point integers") {
    // undirected star: center 0, leaves 1..3
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 3).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    // hand-computed 3-round fixed-point arithmetic (see scaladoc rule)
    assert(r(0L) == 2483250L, r.toString)
    // leaves: round-3 center contribution 1254999 div 3 = 418333;
    // 150000 + (850*418333) div 1000 = 505583.
    assert(Seq(1L, 2L, 3L).map(r).distinct == Seq(505583L), r.toString)
    assert(r(0L) > r(1L))
  }

  test("pageRank: partitioning-invariant (integer sums commute)") {
    val pairs = (1L to 40L).map(i => (i, i % 7 + 100L))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val a = Graph.pageRank(edges.repartition(1), iters = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    val b = Graph.pageRank(edges.repartition(13), iters = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(a == b)
  }

  test("pageRank: duplicate input edges do not double-count") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 2).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("pageRank: dangling-mass redistribution conserves total rank") {
    // 1 → 2 and nothing out of 2: node 2 is dangling
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val r1 = Graph.pageRank(edges, iters = 1, redistributeDangling = true)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    // round 1: dangling sum = rank(2) = 1000000 → share = 500000
    //   rank'(1) = 150000 + (850 ·  500000) div 1000 =  575000
    //   rank'(2) = 150000 + (850 · 1500000) div 1000 = 1425000
    assert(r1 == Map(1L -> 575000L, 2L -> 1425000L), r1.toString)
    val r2 = Graph.pageRank(edges, iters = 2, redistributeDangling = true)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    // round 2: dangling sum = 1425000 → share = 712500
    //   rank'(1) = 150000 + (850 · 712500) div 1000            =  755625
    //   rank'(2) = 150000 + (850 · (575000 + 712500)) div 1000 = 1244375
    assert(r2 == Map(1L -> 755625L, 2L -> 1244375L), r2.toString)
    // total mass conserved each round; the simplified variant leaks it
    assert(r1.values.sum == 2000000L && r2.values.sum == 2000000L)
    val leaky = Graph.pageRank(edges, iters = 1)
      .collect().map(_.getLong(1)).sum
    assert(leaky < 2000000L, s"expected dropped dangling mass, got $leaky")
  }

  test("triangles: clique counted once per corner, chain has none") {
    // K4 on {1,2,3,4} (4 triangles, each vertex in 3) plus the chain
    // 4-5-6 (vertex 5 has degree 2 but no closing edge)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L))
      .toDF("a", "b")
    val r = Graph.triangleStats(edges).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    // K4 corners: deg 3 (1,2,3) / deg 4 (4, also on the chain), each in
    // 3 triangles; cc = 2000·3/(3·2) = 1000 resp. 2000·3/(4·3) = 500
    assert(r(1L) == ((3L, 3L, 1000L)), r.toString)
    assert(r(2L) == ((3L, 3L, 1000L)))
    assert(r(3L) == ((3L, 3L, 1000L)))
    assert(r(4L) == ((4L, 3L, 500L)))
    // chain: deg-2 vertex with an open wedge → 0 triangles, cc 0
    assert(r(5L) == ((2L, 0L, 0L)))
    assert(r(6L) == ((1L, 0L, 0L)))
    // global count: 3·n_triangles corner rows = 12
    assert(r.values.map(_._2).sum == 12L)
  }
}
