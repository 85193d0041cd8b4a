package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: Morton (Z-order) interleaving for
  * multi-dimensional data clustering. Sorting 100 TB by one column keeps
  * parquet row-group min/max stats tight on THAT column only; sorting by
  * the interleaved Z-value keeps them tight on BOTH dimensions at once,
  * so scans filtered on either (or both) columns skip most files. The
  * [[zValue]] expression is pure integer bit math — literal-unrolled
  * shifts that stay inside whole-stage codegen and replay exactly in any
  * SQL engine.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * integer columns: bit i of `x` lands at position 2i, bit i of `y` at
    * 2i+1. Monotone in the Z-curve traversal order; 2·bits ≤ 62 keeps
    * everything in a long. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Per-bucket bounding boxes of the Z-curve: assign each row to one of
    * `nBuckets` equal-width Z-ranges and report (bucket, n_rows, min_x,
    * max_x, min_y, max_y). This is exactly the min/max-stats relation a
    * file-skipping reader consults — tight boxes on BOTH columns mean a
    * filter on either dimension prunes most buckets, which is the whole
    * point of Z-ordering vs a single-column sort (LayoutSpec asserts the
    * boxes really are tight).
    *
    * `nBuckets` must divide 2^(2·bits) — any power of two up to
    * 2^(2·bits) — so the bucket rule is one exact integer division.
    *
    * Scale shape: a narrow per-row integer projection then ONE
    * partial-aggregated shuffle of ≤ nBuckets groups; min/max/count all
    * combine map-side. The write-side twin is [[repartitionByZ]]. */
  def zorderStats(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 16, nBuckets: Int = 16): DataFrame = {
    val span = (1L << (2 * bits)) / nBuckets
    require(span * nBuckets == (1L << (2 * bits)),
      "nBuckets must divide 2^(2*bits)")
    df.select(col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      .withColumn("zval", zValue(col("x"), col("y"), bits))
      .withColumn("bucket", expr(s"zval div $span"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
  }

  /** Range-partition by Z-value and sort within partitions — the write
    * layout that makes every output file a contiguous Z-range, so its
    * parquet footer min/max stats are tight in both dimensions. Feed
    * straight to `.write.parquet`. */
  def repartitionByZ(df: DataFrame, xCol: String, yCol: String,
      nPartitions: Int, bits: Int = 16): DataFrame = {
    val z = zValue(col(xCol), col(yCol), bits)
    df.repartitionByRange(nPartitions, z).sortWithinPartitions(z)
  }
}
