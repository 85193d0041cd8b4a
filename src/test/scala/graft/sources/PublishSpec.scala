package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PublishSpec extends SparkSpec {
  import spark.implicits._

  test("publish replaces the target only after the audit passes") {
    val base = Files.createTempDirectory("graft_pub").toString
    val target = s"$base/out"
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(Publish.parquet(v1, target) == 2L)
    assert(Publish.readPublished(spark, target).count() == 2L)

    // a second publish atomically replaces the first
    val v2 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    assert(Publish.parquet(v2, target, audit = _.count() == 3L) == 3L)
    assert(Publish.readPublished(spark, target).count() == 3L)
  }

  test("failed audit quarantines staging and leaves the target intact") {
    val base = Files.createTempDirectory("graft_pub2").toString
    val target = s"$base/out"
    Publish.parquet(Seq((1L, "good")).toDF("id", "v"), target)

    // the "truncated retry": audit expects 5 rows, gets 1
    val bad = Seq((9L, "partial")).toDF("id", "v")
    intercept[Publish.AuditFailedException] {
      Publish.parquet(bad, target, audit = _.count() == 5L)
    }
    // target still serves the previous publish...
    val kept = Publish.readPublished(spark, target).collect()
    assert(kept.length == 1 && kept.head.getString(1) == "good")
    // ...and the rejected files are quarantined for inspection
    assert(spark.read.parquet(s"$target.rejected").count() == 1L)
  }

  test("reading an unpublished path fails loudly, not as empty") {
    val base = Files.createTempDirectory("graft_pub3").toString
    intercept[IllegalArgumentException] {
      Publish.readPublished(spark, s"$base/never_published")
    }
  }

  test("audit sees the staged files, not the input frame") {
    val base = Files.createTempDirectory("graft_pub4").toString
    val target = s"$base/out"
    var audited = -1L
    Publish.parquet(
      Seq((1L, "x"), (2L, "y")).toDF("id", "v"), target,
      audit = staged => { audited = staged.count(); true })
    assert(audited == 2L)
  }
}
