package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** JSON-Lines corpus storage — the interchange format LLM training
  * corpora actually arrive in (one JSON document per line, gzip-friendly,
  * appendable, streamable).
  *
  * Read posture mirrors the XML scan's (OsmPipeline.stagedRaw): an
  * EXPLICIT schema always — schema inference is a full extra pass over
  * 100 TB and type-drifts on dirty data — and PERMISSIVE mode with a
  * `_corrupt_record` column when a quarantine is requested, so one
  * truncated shard neither kills the job nor silently vanishes. JSONL
  * splits by line, so unlike the single-file XML case a big file
  * parallelizes natively across tasks.
  */
object JsonlStore {

  /** Write one JSON object per line (text-file layout, splittable). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Strict scan: explicit schema, malformed line → job failure
    * (FAILFAST), the right default for curated data. */
  def readJsonl(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    // session resolution memo (snapshot-validated — a rewritten landing
    // zone re-resolves); same FAILFAST/schema contract as before
    graft.Tables.resolvedJson(spark, path, schema)

  /** Streaming scan of a JSONL landing zone (file source): same
    * explicit-schema contract as [[readJsonl]]; files appearing in the
    * directory are picked up incrementally — the continuous-ingestion
    * shape of a corpus drop folder feeding the pipeline's streaming
    * duals. */
  def readJsonlStream(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(path)

  /** Quarantining scan: malformed lines land in `<quarantineDir>` as raw
    * text while clean rows flow on. The raw read is staged INSIDE this
    * op (Stage.barrier — Spark disallows querying only the corrupt
    * column off a raw scan, and the quarantine write plus the returned
    * clean stream must share one parse); do NOT stage the result again.
    * The staged blocks stay pinned until the caller's next
    * Stage.releaseAll — the standard staged-op lifecycle (see Stage). */
  def readJsonlQuarantined(spark: SparkSession, path: String,
      schema: StructType, quarantineDir: String): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    val raw = graft.ops.Stage.barrier(
      spark.read.schema(withCorrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path))
    raw.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record"))
      .write.mode(SaveMode.Overwrite).text(quarantineDir)
    raw.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
  }
}
