package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.polyHash

/** Sequence packing — the concat-and-split batch construction of LLM
  * pretraining: documents are laid out in one deterministic order and the
  * token stream is cut into fixed-`capacity` bins; each document reports
  * where it landed (bin and offset, spilling into the next bin when it
  * crosses a boundary).
  *
  * The layout order is (shard, hash, doc_id) — hash-shuffled so bins mix
  * sources, deterministic so every engine and every run agrees.
  *
  * The global running offset is a distributed PREFIX SUM, a primitive
  * Spark lacks natively and a naive `Window.orderBy(...)` computes on ONE
  * partition (the classic scale-killer): instead, per-shard running sums
  * run in parallel (window partitioned by shard), shard totals aggregate
  * to a `nShards`-row frame whose own running sum — metadata-scale, the
  * only single-partition step — broadcasts back as each shard's base
  * offset. Two shuffles of projected (id, tokens) rows, never a global
  * sort of the corpus.
  */
object Packing {

  def packSequences(docs: DataFrame, capacity: Long = 2048L,
      nShards: Int = 32, textCol: String = "text"): DataFrame = {
    // staged: consumed by both the per-shard window and the shard-totals
    // aggregate below — without the barrier the corpus is re-scanned and
    // re-tokenized per consumer (the narrow 3-column projection is what
    // the cache holds, not the documents)
    // NULL text packs as a ZERO-length placement (coalesce): without it
    // size(split(NULL)) is NULL, the window sum skips the row, and the
    // doc emerges with NULL global_start/bin — silently unplaced in any
    // bin-partitioned writer
    val d = Stage.barrier(docs.select(col("doc_id"),
      coalesce(size(split(col(textCol), " ")).cast("long"), lit(0L))
        .as("n_tokens"),
      polyHash(col("doc_id").cast("string")).as("_h"))
      .withColumn("_shard", pmod(col("_h"), lit(nShards.toLong))))
    // parallel per-shard prefix sums
    val withinWin = Window.partitionBy(col("_shard"))
      .orderBy(col("_h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = d.withColumn("_end", sum(col("n_tokens")).over(withinWin))
    // shard base offsets: an nShards-row frame; its running sum is the
    // one legitimately single-partition window (bounded metadata, like
    // IVF centroids or the packed histogram)
    val baseWin = Window.orderBy(col("_shard"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bases = d.groupBy(col("_shard"))
      .agg(sum(col("n_tokens")).as("_total"))
      .withColumn("_base", sum(col("_total")).over(baseWin) - col("_total"))
      .select(col("_shard"), col("_base"))
    within.join(broadcast(bases), Seq("_shard"))
      .select(col("doc_id"), col("n_tokens"),
        (col("_base") + col("_end") - col("n_tokens")).as("global_start"))
      .withColumn("bin", expr(s"global_start div $capacity"))
      .withColumn("bin_offset", expr(s"global_start % $capacity"))
  }
}
