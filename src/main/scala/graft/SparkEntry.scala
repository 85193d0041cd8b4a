package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{CorpusOps, DedupSim, MediaOps, OsmQueries, Relational, TextOps}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.joinAgg(spark, "/root/testdata/sf0.001")

  /** Merge the per-module maps, failing LOUDLY on a duplicate key.
    * `Map ++ Map` silently keeps the right-hand value, so a query name
    * accidentally reused across modules would shadow one implementation
    * and shrink the correctness surface without any signal (round 7
    * briefly lost q_full_outer/q_pivot to exactly this). */
  private[graft] def mergeDistinct[V](parts: Seq[(String, Map[String, V])])
      : Map[String, V] = {
    val merged = parts.map(_._2).reduce(_ ++ _)
    if (merged.size != parts.map(_._2.size).sum) {
      val dups = parts.flatMap { case (mod, m) => m.keys.map(_ -> mod) }
        .groupBy(_._1).filter(_._2.size > 1)
        .map { case (k, owners) =>
          s"$k (${owners.map(_._2).mkString(", ")})" }
      throw new IllegalStateException(
        s"duplicate query keys across modules: ${dups.mkString("; ")}")
    }
    merged
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    mergeDistinct(Seq(
      "Relational" -> Relational.queries, "TextOps" -> TextOps.queries,
      "DedupSim" -> DedupSim.queries, "MediaOps" -> MediaOps.queries,
      "OsmQueries" -> OsmQueries.queries, "CorpusOps" -> CorpusOps.queries))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    mergeDistinct(Seq(
      "Relational" -> Relational.oracle, "TextOps" -> TextOps.oracle,
      "DedupSim" -> DedupSim.oracle, "MediaOps" -> MediaOps.oracle,
      "OsmQueries" -> OsmQueries.oracle, "CorpusOps" -> CorpusOps.oracle))
}
