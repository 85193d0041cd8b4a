package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Morton interleave + Z-bucket bounding boxes + range-partitioned
  * write layout. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue: hand-computed interleaves") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 0L),
      (3L, 5L)).toDF("x", "y")
    val r = df.select(col("x"), col("y"),
        Layout.zValue(col("x"), col("y"), bits = 8).as("z"))
      .collect().map(x => ((x.getLong(0), x.getLong(1)), x.getLong(2)))
      .toMap
    // x bit i -> position 2i; y bit i -> position 2i+1
    assert(r((0L, 0L)) == 0L)
    assert(r((1L, 0L)) == 1L)
    assert(r((0L, 1L)) == 2L)
    assert(r((1L, 1L)) == 3L)
    assert(r((2L, 0L)) == 4L)
    assert(r((3L, 5L)) == 39L) // x=0b11 -> 1+4; y=0b101 -> 2+32
  }

  test("zorderStats: full grid buckets into exact quadrant boxes") {
    // the full 16x16 grid at bits=4, 4 buckets: each Z-range is one 8x8
    // quadrant -> every bucket's bbox is exactly its quadrant, with both
    // dimensions tight. A single-column sort would leave one dimension's
    // box spanning the whole [0,15] range.
    val grid = (0 until 16).flatMap(x => (0 until 16).map(y => (x, y)))
      .toDF("x", "y")
    val r = Layout.zorderStats(grid, "x", "y", bits = 4, nBuckets = 4)
      .orderBy("bucket").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5)))
    assert(r.toSeq == Seq(
      (0L, 64L, 0L, 7L, 0L, 7L),
      (1L, 64L, 8L, 15L, 0L, 7L),
      (2L, 64L, 0L, 7L, 8L, 15L),
      (3L, 64L, 8L, 15L, 8L, 15L)))
  }

  test("zValue: bijective on the full bits x bits grid") {
    val grid = (0 until 16).flatMap(x => (0 until 16).map(y => (x, y)))
      .toDF("x", "y")
    val zs = grid.select(Layout.zValue(col("x"), col("y"), bits = 4)
      .as("z")).collect().map(_.getLong(0))
    assert(zs.distinct.length == 256)
    assert(zs.min == 0L && zs.max == 255L)
  }

  test("repartitionByZ: range-partitioned on the Z value") {
    val df = Seq((1L, 2L, "a"), (3L, 4L, "b")).toDF("x", "y", "v")
    val plan = Layout.repartitionByZ(df, "x", "y", 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      "no range partitioning on zval:\n" + plan.take(600))
  }
}
