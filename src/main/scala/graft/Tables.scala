package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Handles on the driver-provided synthetic parquet tables (TESTDATA.md /
  * FIXTURES.md §5). One directory per scale factor; each table is a single
  * parquet file. Reads are plain `spark.read.parquet` so Catalyst gets full
  * predicate pushdown / column pruning into the scan — at cluster scale the
  * same loader works unchanged over a partitioned directory of files.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = table("region")
  def nation: DataFrame = table("nation")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame = table("part")
  def orders: DataFrame = table("orders")
  def lineitem: DataFrame = table("lineitem")

  /** `events.ts` is TIMESTAMP(NANOS) in the parquet footer, which Spark's
    * vectorized reader rejects. Read nanos as long (legacy conf) and
    * floor-convert to a microsecond timestamp — the same truncation DuckDB
    * applies, so oracle comparisons stay exact. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table("events").withColumn("ts",
      org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** Register all tables as temp views for `spark.sql` exploration
    * (mirrors the reference's CSV→SQLite→SQL flow, SURVEY.md §3.4).
    * `events` goes through its converting accessor — the raw parquet is
    * TIMESTAMP(NANOS) and unreadable without the nanos→micros conversion. */
  def registerViews(): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(n => table(n).createOrReplaceTempView(n))
    events.createOrReplaceTempView("events")
  }
}
