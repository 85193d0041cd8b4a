package graft.osm

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.SparkSpec

/** The XML scan must parallelize across files — the shape the 100 TB input
  * takes (an extract sharded into many files). A directory of N copies
  * yields N× the rows and at least N input partitions. */
class MultiFileScanSpec extends SparkSpec {

  test("node scan distributes over a multi-file directory") {
    val dir = Files.createTempDirectory("graft-osm-shard")
    (1 to 4).foreach { i =>
      Files.copy(Paths.get("/root/reference/shatin.osm"),
        dir.resolve(s"part-$i.osm"), StandardCopyOption.REPLACE_EXISTING)
    }
    val nodes = OsmIngest.rawNodes(spark, dir.toString + "/*.osm")
    assert(nodes.count() == 4 * 13676)
    assert(nodes.rdd.getNumPartitions >= 4)
  }
}
