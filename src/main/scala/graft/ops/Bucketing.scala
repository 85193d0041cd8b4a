package graft.ops

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table layout — the shuffle-elimination path for repeated
  * joins at 100 TB.
  *
  * A join shuffles both sides onto the join key every time it runs. For
  * the tables a pipeline joins constantly — the corpus digest table every
  * ingestion increment, a dimension joined by every query — the scale
  * move is to pay the shuffle ONCE at write time: `bucketBy(n, key)`
  * hash-partitions rows into a fixed number of files per partition, and
  * every later equi-join on the key reads the layout instead of
  * exchanging:
  *
  *  - both sides bucketed on the join key with the same bucket count →
  *    ZERO exchanges (co-partitioned join; BucketingSpec plan-asserts).
  *  - one side bucketed (the big corpus) joined to an unbucketed small
  *    side (a new ingestion batch) → exactly ONE exchange, of the SMALL
  *    side, onto the big side's layout. The 100 TB corpus never moves —
  *    the posture `Dedup.incrementalDedup`'s scaladoc promises.
  *
  * Tables are written as EXTERNAL parquet (explicit `path`), so the data
  * lives where the caller says and only the layout metadata lives in the
  * session catalog. `sortBy` within buckets additionally lets sort-merge
  * joins skip their per-task sort.
  */
object Bucketing {

  /** Write `df` as an external bucketed parquet table. Overwrites both
    * the table entry and the files. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketCol: String, nBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w: DataFrameWriter[Row] = df.write.mode("overwrite")
      .format("parquet").option("path", path)
      .bucketBy(nBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).saveAsTable(table)
  }

  /** The digest-table increment join (see Dedup.incrementalDedup): keep
    * batch rows whose `_dig` is unseen in the bucketed corpus digest
    * table. The corpus side reads its bucket layout — only the batch
    * shuffles. */
  def antiJoinBucketed(spark: SparkSession, batch: DataFrame,
      digestTable: String): DataFrame =
    batch.join(spark.table(digestTable).select(col("digest").as("_dig")),
      Seq("_dig"), "left_anti")
}
