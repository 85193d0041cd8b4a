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
}
