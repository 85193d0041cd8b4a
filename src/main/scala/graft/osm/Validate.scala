package graft.osm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative replacement for the reference's (disabled) cerberus schema
  * validation (`validate_element`, parse_clean_and_csv.py:177-186; the
  * schema module itself is absent from the repo). Instead of per-row
  * driver-side validation, each relation gets a constraint predicate and
  * violations surface as DataFrames — `filter(...).isEmpty` checks that
  * run distributed and cost one pass only when actually evaluated. */
object Validate {

  /** Per-relation constraint violations (empty DataFrame == valid). */
  def violations(p: OsmPipeline): Map[String, DataFrame] = Map(
    "nodes_id_null" -> p.nodes.filter(col("id").isNull),
    "nodes_id_dup" -> p.nodes.groupBy(col("id"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1),
    "nodes_latlon_shape" -> p.nodes.filter(
      !col("lat").rlike("^-?\\d+(\\.\\d+)?$") ||
        !col("lon").rlike("^-?\\d+(\\.\\d+)?$")),
    "ways_id_dup" -> p.ways.groupBy(col("id"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1),
    "tags_key_empty" -> p.nodeTags.unionByName(p.wayTags)
      .filter(col("key").isNull || col("key") === ""),
    "tags_type_empty" -> p.nodeTags.unionByName(p.wayTags)
      .filter(col("type").isNull || col("type") === ""),
    "way_nodes_position" -> p.wayNodes
      .filter(col("position").isNull || col("position") < 0),
    "update_history_domain" -> p.updateHistory.filter(
      !col("element_type").isin("node", "way") ||
        !col("field_updated").isin("name", "phone")))

  /** One row per failed constraint with its violation count. */
  def report(spark: SparkSession, p: OsmPipeline): DataFrame = {
    import spark.implicits._
    violations(p).toSeq.sortBy(_._1)
      .map { case (name, df) => name -> df.count() }
      .filter(_._2 > 0)
      .toDF("constraint", "violations")
  }
}
