package graft.osm

import org.apache.spark.sql.SparkSession

/** Diagnostic: time each OSM pipeline stage in dependency order, so bench
  * attribution (whichever query first touches a shared barrier pays for
  * everything beneath it) can be decomposed into per-stage costs. Run:
  * `sbt "runMain graft.osm.OsmProfile"`. */
object OsmProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect() // session warmup

    // optional [osm.xml] [official.xml] args (e.g. a scale_osm.py tile)
    val p = OsmPipeline(spark,
      args.lift(0).getOrElse(OsmQueriesPaths.OsmPath),
      args.lift(1).getOrElse(OsmQueriesPaths.PsiPath))
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"""  ${name}%-24s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n""")
    }
    t("officialUncorrected")(p.officialUncorrected.count())
    t("official")(p.official.count())
    t("rawNodes (via nodes)")(p.nodes.count())
    t("rawWays (via ways)")(p.ways.count())
    t("wayNodes")(p.wayNodes.count())
    t("phoneAudit")(p.phoneAudit.count())
    t("nodeTagsFixed")(p.nodeTags.count())
    t("wayTagsFixed")(p.wayTags.count())
    t("updateHistory")(p.updateHistory.count())
    t("streetAudit")(p.streetAudit.count())
    t("explore.contributions")(
      Explore.df.updatedUsersVsContributions(p).count())
    t("explore.summary")({ p.registerViews(); Explore.summary(spark).count() })
    spark.stop()
  }
}

/** Path constants shared with queries.OsmQueries (kept here so the
  * diagnostic has no dependency on the queries package). */
object OsmQueriesPaths {
  val OsmPath = "/root/reference/shatin.osm"
  val PsiPath = "/root/reference/PSI_Street Name_062017.xml"
}
