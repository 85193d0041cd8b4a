package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.ops.Sessionize

class EventStreamSpec extends SparkSpec {

  /** Bounded streaming source: the events parquet alone in a temp dir. */
  lazy val streamDir: String = {
    val dir = Files.createTempDirectory("graft-stream")
    Files.copy(Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("streaming hourly counts equal the batch histogram") {
    val stream = EventStream.readEvents(spark, streamDir)
    val got = EventStream.runToMemory(
      EventStream.hourlyCounts(stream), "hourly_stream",
      org.apache.spark.sql.streaming.OutputMode.Update)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = Sessionize.hourlyHistogram(Tables(spark, sf).events)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == batch)
  }

  test("watermarked streaming dedup equals batch distinct") {
    val stream = EventStream.readEvents(spark, streamDir)
    val got = EventStream.runToMemory(
      EventStream.dedupEvents(stream).select("event_id"), "dedup_stream",
      org.apache.spark.sql.streaming.OutputMode.Append).count()
    val batch = Tables(spark, sf).events.select("event_id")
      .distinct().count()
    assert(got == batch)
  }

  test("stateful streaming sessionization equals the batch window version") {
    val stream = EventStream.readEvents(spark, streamDir)
    val got = EventStream.runToMemory(
      EventStream.sessionize(stream).toDF(), "sessions_stream")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = Sessionize.sessionStats(Tables(spark, sf).events)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == batch)
  }
}
