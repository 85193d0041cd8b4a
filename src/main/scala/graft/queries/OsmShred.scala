package graft.queries

/** Cross-engine oracle support for the XML-INGEST half of the OSM surface.
  *
  * [[OsmOracleExport]] gives the relational half of the OSM queries a
  * DuckDB cross-check, but its exported inputs come from the engine's own
  * XML scans — so the six raw-ingest queries (`q_osm_nodes/ways/way_nodes/
  * relations/relation_members/official_raw`) would only ever be compared
  * against themselves. This object closes that gap with a genuinely
  * INDEPENDENT second implementation: `tools/shred_osm.py` re-parses the
  * bundled XML with Python's stdlib ElementTree (mirroring the reference's
  * iterparse semantics, parse_clean_and_csv.py:115-176 and 296-340) and
  * writes the six raw relations to parquet; the oracle SQL for those
  * queries SELECTs from that export. Spark's XML source never touches the
  * oracle side, so a bug in either parser shows up as a row/hash mismatch.
  *
  * Like the shaped-relation export, the shred output lives in a SIBLING of
  * Verify's outDir (the driver treats outDir subdirectories as query
  * results). If python3 or the script is unavailable, [[graft.Verify]]
  * drops these six oracle entries and the queries fall back to the
  * rows-only check backed by OsmGoldenSpec's reference-derived hashes.
  */
object OsmShred {

  /** Token in [[OsmQueries.oracle]] SQL that [[graft.Verify]] replaces
    * with the shred export directory before writing oracle_sql.json. */
  val Placeholder = "__OSM_SHRED_DIR__"

  def dirFor(outDir: String): String = {
    val out = new java.io.File(outDir).getCanonicalFile
    new java.io.File(out.getParentFile, out.getName + ".osm_shred")
      .getAbsolutePath
  }

  /** Run the shredder as a subprocess (driver-side tooling, same tier as
    * tools/selfcheck.py — the engine's own runtime never depends on it).
    * Fails loudly on a missing script or a non-zero exit so Verify can
    * fall back to rows-only rather than ship oracle SQL pointing at a
    * half-written export. */
  def run(outDir: String): Unit = {
    val script = sys.env.getOrElse("SPARK_GRAFT_SHREDDER",
      new java.io.File("tools/shred_osm.py").getAbsolutePath)
    require(new java.io.File(script).isFile, s"shredder not found: $script")
    val pb = new ProcessBuilder("python3", script,
      OsmQueries.OsmPath, OsmQueries.PsiPath, outDir)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val log = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val code = p.waitFor()
    require(code == 0, s"shred_osm.py exited $code:\n$log")
  }
}
