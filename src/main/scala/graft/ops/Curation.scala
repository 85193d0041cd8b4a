package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition a training-data pipeline
  * actually runs, wired from the library's own stages:
  *
  *   length gate → exact dedup (sha-256 of lowercased text, keep lowest
  *   id) → deterministic train/valid/test split → per-(split, language)
  *   accounting.
  *
  * Scale shape: the gate is a pushed-down scan filter; rows are projected
  * to (doc_id, lang, digest) BEFORE the dedup shuffle, so the shuffle
  * carries ~50 bytes/row regardless of document size; dedup is one
  * hash-partitioned window min (no sort); the split is a stateless hash;
  * the final rollup is a partial-aggregated few-hundred-row frame. One
  * wide scan, two shuffles, nothing driver-side.
  */
object Curation {

  def curate(docs: DataFrame, minChars: Long = 100L,
      maxChars: Long = 400L): DataFrame = {
    val gated = docs
      .filter(col("n_chars").between(minChars, maxChars))
      .select(col("doc_id"), col("lang"),
        sha2(lower(col("text")), 256).as("_dig"))
    Dedup.firstPerDigest(gated)
      .withColumn("split", TextAnalysis.splitAssign(col("doc_id")))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).cast("long").as("sum_id"))
  }
}
