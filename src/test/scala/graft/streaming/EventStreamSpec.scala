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
      org.apache.spark.sql.streaming.OutputMode.Update,
      lastPerKey = Seq("hour", "event_type"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = Sessionize.hourlyHistogram(Tables(spark, sf).events)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == batch)
  }

  test("streaming sliding-window counts equal the batch hopping histogram") {
    val stream = EventStream.readEvents(spark, streamDir)
    val got = EventStream.runToMemory(
      EventStream.hoppingCounts(stream), "hopping_stream",
      org.apache.spark.sql.streaming.OutputMode.Update,
      lastPerKey = Seq("ws", "event_type"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = Sessionize.hoppingHistogram(Tables(spark, sf).events)
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

  test("streaming top-k per window equals an independent batch rank-window") {
    val stream = EventStream.readEvents(spark, streamDir)
    val got = EventStream.runToMemory(
      EventStream.topEventsHourly(stream, k = 3), "topk_stream",
      org.apache.spark.sql.streaming.OutputMode.Update,
      lastPerKey = Seq("hour", "rank"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getInt(2)) ->
        (r.getLong(1), r.getDouble(3))).toMap
    // independent reference: batch rank-window, not the same aggregate
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("hour")).orderBy(desc("value"), col("event_id"))
    val batch = Tables(spark, sf).events
      .select(date_trunc("hour", col("ts")).as("hour"),
        col("event_id"), col("value"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .collect()
      .map(r => (r.getTimestamp(0), r.getInt(3)) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(got == batch)
  }

  test("stateful streaming sessionization equals the batch window version") {
    val stream = EventStream.readEvents(spark, streamDir)
    val got = EventStream.runToMemory(
      EventStream.sessionize(stream).toDF(), "sessions_stream",
      lastPerKey = Seq("user_id"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = Sessionize.sessionStats(Tables(spark, sf).events)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == batch)
  }

  /** Two files + maxFilesPerTrigger=1 → two micro-batches: the Update-mode
    * memory sink emits a row per user per batch; lastPerKey must reduce to
    * the same final state as the batch operator. Splitting on event time
    * keeps later-half events in the later batch, so per-user state really
    * evolves across batches. */
  test("multi-batch sessionization reduces to the batch result") {
    val dir = Files.createTempDirectory("graft-stream-2f").toString
    val events = Tables(spark, sf).events
    val cut = events.agg(expr("percentile_approx(unix_millis(ts), 0.5)"))
      .head().getLong(0)
    events.filter(unix_millis(col("ts")) <= cut).coalesce(1)
      .write.parquet(s"$dir/half1")
    events.filter(unix_millis(col("ts")) > cut).coalesce(1)
      .write.parquet(s"$dir/half2")
    val stream = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, " +
        "event_type STRING, value DOUBLE, props STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/half*")
    val table = EventStream.runToMemory(
      EventStream.sessionize(stream).toDF(), "sessions_stream_2b",
      lastPerKey = Seq("user_id"))
    val raw = spark.table("sessions_stream_2b")
    assert(raw.count() > table.count(),
      "expected multiple micro-batches to append per-user duplicates")
    val got = table.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = Sessionize.sessionStats(events)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == batch)
  }

  test("stream-stream interval join equals the batch attribution pairs") {
    val stream = EventStream.readEvents(spark, streamDir)
    val got = EventStream.runToMemory(
      EventStream.clickAttribution(stream), "attrib_stream",
      org.apache.spark.sql.streaming.OutputMode.Append)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ev = Tables(spark, sf).events
    val batch = graft.ops.Sessionize.attributionPairs(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "click"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty, "no in-window pairs — the equality is vacuous")
    assert(got == batch)
  }

  test("stream-static anti join drops corpus-known digests") {
    import java.nio.file.Files
    val docs = Tables(spark, sf).documents
    val dir = Files.createTempDirectory("graft-docs-stream").toString
    docs.coalesce(1).write.mode("overwrite").parquet(dir)
    val seen = docs.filter(col("doc_id") % 2 === 0)
      .select(sha2(lower(col("text")), 256).as("digest"))
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, " +
        "n_chars LONG")
      .parquet(dir)
    val got = EventStream.runToMemory(
      EventStream.dedupAgainstCorpus(stream, seen), "inc_dedup_stream",
      org.apache.spark.sql.streaming.OutputMode.Append)
      .collect().map(_.getLong(0)).toSet
    val expected = docs.filter(col("doc_id") % 2 === 1)
      .collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }

  test("streaming near-dup screen matches the batch incremental screen") {
    import java.nio.file.Files
    val docs = Tables(spark, sf).documents.select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") < 250)
    // the arriving batch: edited recrawls of even corpus docs + fresh text
    val batch = docs.filter(col("doc_id") < 100)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        when(col("doc_id") % 2 === 0,
            regexp_replace(col("text"), "^[^ ]* ", ""))
          .otherwise(translate(col("text"), "aeiou", "01234")).as("text"))
    val dir = Files.createTempDirectory("graft-neardup-stream").toString
    batch.coalesce(1).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(dir)
    val gotPairs = EventStream.runToMemory(
      EventStream.nearDupAgainstCorpus(stream, corpus), "neardup_stream",
      org.apache.spark.sql.streaming.OutputMode.Append)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(gotPairs.length == gotPairs.distinct.length)
    // per-doc match counts equal the batch op's verified counts
    val gotCounts = gotPairs.groupBy(_._1).view.mapValues(_.size.toLong)
      .toMap
    val expected = graft.ops.Dedup.incrementalNearDedup(batch, corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(expected.values.exists(_ > 0L), "screen found nothing — vacuous")
    assert(gotCounts == expected.filter(_._2 > 0L))
  }

  test("streaming count-min counters equal the batch sketch registers") {
    val stream = EventStream.readEvents(spark, streamDir)
    val got = EventStream.runToMemory(
      EventStream.cmCounters(stream, "event_type"), "cm_stream",
      org.apache.spark.sql.streaming.OutputMode.Update,
      lastPerKey = Seq("r", "cell"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the same register file built by the batch op's build phase
    val events = Tables(spark, sf).events
    val batch = events
      .select(explode(array(graft.ops.Sketches.cmCells(
        col("event_type")): _*)).as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.cell").as("cell"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == batch)
    // constant-state property: register rows bounded by d×w
    assert(got.size <= 4 * 512)
  }

  test("streaming landing chain (screen → dedup → near-dup) equals the " +
      "batch landing pipeline") {
    val docs = Tables(spark, sf).documents.select("doc_id", "text")
    val dir = Files.createTempDirectory("graft-landing-stream").toString
    graft.queries.DedupSim.landingBatch(docs)
      .coalesce(1).write.mode("overwrite").parquet(dir)
    def stream = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(dir)
    val seen = docs.select(sha2(lower(col("text")), 256).as("digest"))
    def chainToExact = EventStream.dedupAgainstCorpus(
      EventStream.qualityScreen(stream, carry = Seq("text"))
        .select(col("doc_id"), col("text")),
      seen, carry = Seq("text"))
    val passIds = EventStream.runToMemory(
      EventStream.qualityScreen(stream).select("doc_id"), "landing_pass",
      org.apache.spark.sql.streaming.OutputMode.Append)
      .collect().map(_.getLong(0)).toSet
    val exactKept = EventStream.runToMemory(
      chainToExact.select("doc_id"), "landing_exact",
      org.apache.spark.sql.streaming.OutputMode.Append)
      .collect().map(_.getLong(0)).toSet
    // the FULL chain in one streaming DAG: screen → exact dedup →
    // near-dup screen, emitting the verified corpus-match doc ids
    val nearMatched = EventStream.runToMemory(
      EventStream.nearDupAgainstCorpus(
        chainToExact.select(col("doc_id"), col("text")), docs)
        .select("doc_id"), "landing_near",
      org.apache.spark.sql.streaming.OutputMode.Append)
      .collect().map(_.getLong(0)).toSet
    val statuses = graft.queries.DedupSim.landingPipeline(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def ids(st: String) = statuses.filter(_._2 == st).keySet
    // every terminal status is populated (the chain is non-vacuous) and
    // each streaming stage's frontier equals the batch attribution
    assert(Seq("screened", "dup_exact", "dup_near", "published")
      .forall(st => ids(st).nonEmpty), statuses.values.toSet.toString)
    assert(statuses.keySet -- passIds == ids("screened"))
    assert(passIds -- exactKept == ids("dup_exact"))
    assert(nearMatched == ids("dup_near"))
    assert(exactKept -- nearMatched == ids("published"))
  }

  test("streaming quality screen equals the batch gopher gate") {
    val docs = Tables(spark, sf).documents.select("doc_id", "text")
    val dir = Files.createTempDirectory("graft-quality-stream").toString
    docs.coalesce(1).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(dir)
    val got = EventStream.runToMemory(
      EventStream.qualityScreen(stream), "quality_stream",
      org.apache.spark.sql.streaming.OutputMode.Append)
      .collect().map(_.getLong(0)).toSet
    val all = graft.ops.TextAnalysis.gopherRules(docs)
    val expected = all.filter(col("gopher_pass"))
      .collect().map(_.getLong(0)).toSet
    assert(expected.nonEmpty, "gate passed nothing — vacuous")
    assert(expected.size < all.count(), "gate rejected nothing — vacuous")
    assert(got == expected)
  }
}
