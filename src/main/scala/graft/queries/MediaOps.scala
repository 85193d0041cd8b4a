package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Multimodal

/** Rows-only SparkEntry surface for the multimodal plumbing (binary
  * payloads + typed metadata + batched decode-stub features). Feature
  * vectors are serialized to CSV strings so the dumped parquet stays
  * flat for the driver's generic row checks. */
object MediaOps {

  def features(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(
        Multimodal.mediaFromDocuments(Tables(s, dir).documents))
      .toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        concat_ws(",", col("features")).as("features_csv"))

  def frames(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
        Multimodal.mediaFromDocuments(Tables(s, dir).documents))
      .toDF()
      .select(col("media_id"), col("frame_no"), col("offset"),
        length(col("frame_bytes")).as("n_frame_bytes"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_features" -> features,
    "q_media_frames" -> frames,
  )

  /** Frame offsets/sizes are pure arithmetic on the payload length, so the
    * sampling op has a full SQL oracle (the decode stub does not). */
  val oracle: Map[String, String] = Map(
    "q_media_frames" ->
      ("SELECT media_id, CAST(off // 256 AS INT) AS frame_no, " +
        "CAST(off AS INT) AS \"offset\", " +
        "CAST(least(64, len - off) AS INT) AS n_frame_bytes FROM (" +
        "SELECT doc_id AS media_id, octet_length(encode(text)) AS len, " +
        "unnest(range(0, greatest(len - 63, 1), 256)) AS off " +
        "FROM documents WHERE doc_id % 3 = 2)"),
  )
}
