package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling — the ANALYZE-style per-column statistics relation
  * (row count, null count, exact distinct count, lexicographic min/max)
  * a pipeline snapshots before and after every stage: schema drift, a
  * null-rate spike, or a cardinality collapse in one diff ([[
  * graft.queries.CorpusOps]] pairs it with the corpus manifest/diff ops).
  *
  * All values are profiled through ONE canonical string rendering per
  * column (caller-supplied expressions, typically `cast(c as string)`) so
  * the output relation has a fixed schema regardless of the input's, and
  * the cross-engine oracle comparison is exact (integer casts render
  * identically; no float formatting enters unless the caller sends one).
  */
object Profile {

  /** Profile `cols` (name → string-valued expression) of `df` in one
    * unpivoted pass: (col_name, n_rows, n_nulls, n_distinct, min_value,
    * max_value), one row per profiled column.
    *
    * Scale shape: the unpivot (an inline generator, no join) multiplies
    * rows by |cols| BEFORE one partial-aggregated shuffle keyed on
    * (col_name, value) for the distinct, then |cols| rows reshuffle for
    * the final stats — the standard two-level distinct-count plan, skew
    * spread across every distinct value. min/max/counts combine
    * map-side; nothing is ever collected or globally sorted. */
  def profile(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = df.select(explode(map(
      cols.flatMap { case (n, c) =>
        Seq(lit(n), c.cast("string"))
      }: _*)).as(Seq("col_name", "value")))
    // two-level: exact distinct via a (col, value) pre-aggregation that
    // carries each value's null flag and occurrence count upward
    val agg = pairs.groupBy(col("col_name"), col("value"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("col_name"))
      .agg(sum(col("n")).cast("long").as("n_rows"),
        sum(when(col("value").isNull, col("n")).otherwise(0L))
          .cast("long").as("n_nulls"),
        count(col("value")).cast("long").as("n_distinct"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
    // an EMPTY input still profiles every requested column — (col, 0, 0,
    // 0, null, null) — so a before/after diff of a stage that emptied
    // the table shows n_rows collapsing to 0 instead of the profiled
    // columns vanishing from the relation (the drift signal this op
    // exists to carry); the names side is a |cols|-row local relation
    cols.map(_._1).toDF("col_name")
      .join(agg, Seq("col_name"), "left")
      .select(col("col_name"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        coalesce(col("n_nulls"), lit(0L)).as("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_value"), col("max_value"))
  }
}
