package graft.osm

import java.nio.file.Files

import graft.SparkSpec

/** K1 — the CSV sink round-trips: write the six relations, read them back
  * with headers, and get identical row counts (values stay strings, as in
  * the reference's all-text CSV model). */
class CsvSinkSpec extends SparkSpec {

  test("writeCsvs round-trips all six relations") {
    val pipe = OsmPipeline(spark, "/root/reference/shatin.osm",
      "/root/reference/PSI_Street Name_062017.xml")
    val out = Files.createTempDirectory("graft-csv").toString
    pipe.writeCsvs(out)
    def readBack(name: String) =
      spark.read.option("header", "true").csv(s"$out/$name")
    assert(readBack("nodes").count() == 13676)
    assert(readBack("nodes_tags").count() == 1841)
    assert(readBack("ways").count() == 1958)
    assert(readBack("ways_nodes").count() == 16547)
    assert(readBack("ways_tags").count() == 7040)
    assert(readBack("update_history").count() == 8)
    val cols = readBack("nodes").columns.toSeq
    assert(cols == Seq("id", "lat", "lon", "user", "uid", "version",
      "changeset", "timestamp"))
  }
}
