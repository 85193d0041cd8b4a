package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit}

/** Cross-engine oracle support for the RELATIONAL half of the OSM surface.
  *
  * DuckDB cannot read the bundled OSM/PSI XML, so the INGEST half of the
  * OSM engine stays golden-pinned (OsmGoldenSpec's reference-derived
  * hashes). But everything DOWNSTREAM of ingestion — the exploration
  * joins/aggregations (case_study_osm.pdf p.8-12), the update-history
  * derivation (parse_clean_and_csv.py:263-290), the phone audit
  * (audit_phone_numbers.py:142-184) and the official-list corrections
  * (parse_clean_and_csv.py:342-356) — is plain relational logic. This
  * object exports the shaped input relations to parquet during
  * [[graft.Verify]], and [[OsmQueries.oracle]] carries DuckDB SQL that
  * RESTATES each downstream computation over those exports (never a
  * `SELECT *` of a query's own result), giving those rows a real
  * rows+schema+hash cross-engine check in the driver's gate.
  */
object OsmOracleExport {

  /** Token in [[OsmQueries.oracle]] SQL that [[graft.Verify]] replaces
    * with the actual export directory before writing oracle_sql.json. */
  val Placeholder = "__OSM_ORACLE_DIR__"

  /** Export location for a given Verify outDir: a SIBLING of outDir
    * (same writable volume wherever the driver runs the gate — a
    * hardcoded checkout path would silently degrade every OSM oracle to
    * rows-only when run from elsewhere), deliberately NOT inside it: the
    * driver treats every outDir subdirectory as a query result, so a
    * side-band export there would surface as a bogus correctness row. */
  def dirFor(outDir: String): String = {
    val out = new java.io.File(outDir).getCanonicalFile
    new java.io.File(out.getParentFile, out.getName + ".osm_oracle")
      .getAbsolutePath
  }

  /** Write the shaped relations the oracle SQL reads. All derive from the
    * one staged pipeline in [[OsmQueries]], so the export costs no extra
    * XML parse. Relations exported:
    *   - `nodes`, `ways`             — shaped elements (explore inputs)
    *   - `ways_tags`                 — final (post-fix) way tags (explore
    *                                   IN/NOT-IN probe input; its OWN
    *                                   oracle, q_osm_way_tags, re-derives
    *                                   it from `raw_tags` instead)
    *   - `raw_tags`                  — pre-clean tags of both kinds in
    *                                   document order (audit + tag-fix +
    *                                   update-history derivation input)
    *   - `official_cleaned`          — the uncorrected official list
    *   - `update_history`            — explore input (its own oracle
    *                                   re-derives it from `raw_tags`,
    *                                   not from this export)
    */
  def export(spark: SparkSession, dir: String): Unit = {
    val p = OsmQueries.pipeline(spark)
    // coalesce(1) is CORRECT ONLY HERE: these are shatin-sized oracle
    // fixtures (≤17k rows) and DuckDB reads a single file fastest. Do NOT
    // copy this into a real sink — one output task serializes the whole
    // write; production paths go through sources.* writers, which keep
    // the parallel layout.
    def w(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name")
    w(p.nodes, "nodes")
    w(p.ways, "ways")
    w(p.wayTags, "ways_tags")
    val rawTags = p.rawNodeTags.withColumn("_kind", lit(0))
      .unionByName(p.rawWayTags.withColumn("_kind", lit(1)))
      .select(col("_kind"), col("tag_pos").as("_tag_pos"),
        col("id"), col("key"), col("value"), col("type"))
    w(rawTags, "raw_tags")
    w(p.officialUncorrected, "official_cleaned")
    w(p.updateHistory, "update_history")
  }
}
