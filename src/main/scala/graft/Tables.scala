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

  /** `events.ts` has varied across driver testdata generations:
    * TIMESTAMP(NANOS) footers (unreadable by Spark's vectorized reader
    * without `nanosAsLong`, then a bigint of nanos) and plain
    * TIMESTAMP(MICROS) (read natively as TIMESTAMP_NTZ). Normalize both
    * to a session-zone (UTC) timestamp with microsecond values — the same
    * floor truncation DuckDB applies — so every downstream query and
    * oracle comparison sees one type regardless of the footer. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.LongType
    val raw = table("events")
    val ts = raw.schema("ts").dataType match {
      case LongType => expr("timestamp_micros(ts div 1000)") // nanos footer
      case _        => col("ts").cast("timestamp")           // micros footer
    }
    raw.withColumn("ts", ts)
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
