package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
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
  test("readEvents fails fast on an empty landing dir, then reads the " +
      "nanos variant once a file lands") {
    val dir = Files.createTempDirectory("graft-stream-empty").toString
    val ex = intercept[IllegalStateException] {
      EventStream.readEvents(spark, dir)
    }
    assert(ex.getMessage.contains("landing dir") &&
      ex.getMessage.contains("AFTER the first file lands"),
      s"failure must explain the construct-after-landing contract: $ex")
    // the nanos footer variant surfaces as a BIGINT of nanos under
    // `nanosAsLong` — write that physical shape into the same dir,
    // reconstruct, and the shared normalization must line the stream up
    // with the batch histogram
    val events = Tables(spark, sf).events
    events
      .withColumn("ts", expr("unix_micros(ts) * 1000"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val stream = EventStream.readEvents(spark, dir)
    assert(stream.schema("ts").dataType.typeName === "timestamp",
      "nanos-long input must normalize to the session timestamp type")
    val got = EventStream.runToMemory(
      EventStream.hourlyCounts(stream), "hourly_nanos_stream",
      org.apache.spark.sql.streaming.OutputMode.Update,
      lastPerKey = Seq("hour", "event_type"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = Sessionize.hourlyHistogram(events)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == batch)
  }

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
    // TWO files, one per trigger: the foreachBatch leak assertion below
    // is only cumulative across MULTIPLE triggers (a 1-trigger stream
    // can't distinguish per-trigger release from release-at-stop), and
    // every dual must produce the same pair set regardless of how the
    // batch is split across micro-batches
    batch.repartition(2).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1)
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

    // the persisted-index dual screens the SAME stream to the SAME
    // pairs: at steady state a stream-static join re-executes its
    // static subplan per micro-batch, so production reads the
    // buildNearDupIndex tables instead of re-deriving the corpus chain
    val idxDir = Files.createTempDirectory("graft-ndidx-stream").toString
    graft.ops.Dedup.buildNearDupIndex(corpus, "nd_stream_bands",
      s"$idxDir/bands", "nd_stream_shingles", s"$idxDir/shingles")
    try {
      val viaIndex = EventStream.runToMemory(
        EventStream.nearDupAgainstIndex(spark, stream,
          "nd_stream_bands", "nd_stream_shingles"), "neardup_stream_idx",
        org.apache.spark.sql.streaming.OutputMode.Append)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(viaIndex == gotPairs.sorted.toSeq,
        s"index dual diverged from inline dual")
      // the foreachBatch PRUNED dual screens the same stream to the
      // same pair set — per-trigger index reads bucket-pruned to the
      // micro-batch's candidate buckets instead of scanning the corpus
      // tables whole (VERDICT r17 #2); sink-shaped, so matches
      // accumulate through the sink callback
      val acc = scala.collection.mutable.Set[(Long, Long)]()
      val stagedBefore = graft.ops.Stage.stagedCount(spark)
      // the leak assertion must watch where the barriers actually
      // live: foreachBatch runs with the query's CLONED session, so an
      // outer-session Stage count alone is vacuously stable whether or
      // not the scope releases anything (ADVICE r18). Cached blocks,
      // however, are CONTEXT-global — getPersistentRDDs sees every
      // session's materialized cache entries — so the pin is: cached
      // RDDs grow while the trigger's screen is live (the batch-shingle
      // barrier at minimum) and return to the pre-query count after
      // stop. A scope keyed on the wrong session fails the second
      // assertion with exactly the +1-per-trigger growth it would leak.
      val persistentBefore = spark.sparkContext.getPersistentRDDs.size
      @volatile var midSinkPersistent = -1
      val q = EventStream.nearDupIndexEachBatch(spark, stream,
        "nd_stream_bands", "nd_stream_shingles") { (m, _) =>
          midSinkPersistent = spark.sparkContext.getPersistentRDDs.size
          acc ++= m.collect().map(r => (r.getLong(0), r.getLong(1)))
        }.start()
      q.processAllAvailable(); q.stop()
      assert(acc.toSeq.sorted == gotPairs.sorted.toSeq,
        "pruned foreachBatch dual diverged from inline dual")
      assert(midSinkPersistent > persistentBefore,
        s"expected the trigger's barriers cached during the sink: " +
          s"$midSinkPersistent vs $persistentBefore before")
      assert(spark.sparkContext.getPersistentRDDs.size == persistentBefore,
        "foreachBatch screen leaked cached frames across triggers")
      assert(graft.ops.Stage.stagedCount(spark) == stagedBefore,
        "foreachBatch screen leaked staged frames on the outer session")
      // mismatched banding fails loudly, as in the batch screen
      val e = intercept[IllegalArgumentException] {
        EventStream.nearDupAgainstIndex(spark, stream,
          "nd_stream_bands", "nd_stream_shingles", bands = 8)
      }
      assert(e.getMessage.contains("mismatched banding"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS nd_stream_bands")
      spark.sql("DROP TABLE IF EXISTS nd_stream_shingles")
    }
  }

  test("live stream × compaction: a between-triggers sweep changes no " +
      "verdict, and a mid-trigger swap retries once to the same rows") {
    // VERDICT r19 #1 — the one untested store-lifecycle interaction:
    // a 24/7 stream cannot stop for the nightly compaction sweep, and
    // the pruned screen's index file listing is as-of-call. Two race
    // positions, both against the SAME no-maintenance control run:
    //  A) the sweep lands BETWEEN triggers → next trigger lists the
    //     compacted files afresh; pair set identical.
    //  B) the swap lands MID-TRIGGER (deterministically: the sink
    //     compacts BEFORE consuming its frame, whose lazy shingle read
    //     was planned on the pre-swap listing) → the action dies
    //     FILE_NOT_EXIST and nearDupIndexEachBatch's retry-once
    //     posture replays the trigger against the post-swap files:
    //     same batch id, same rows — the idempotent re-delivery
    //     foreachBatch sinks already contract for.
    val docs = Tables(spark, sf).documents.select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") < 250)
    // every batch doc is an edited recrawl of a corpus doc, so every
    // trigger verifies matches — the mid-trigger race below must hit a
    // NON-vacuous shingle-side read
    val batch = docs.filter(col("doc_id") < 16)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        regexp_replace(col("text"), "^[^ ]* ", "").as("text"))
    val dir = Files.createTempDirectory("graft-race-stream").toString
    batch.repartition(2).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val idxDir = Files.createTempDirectory("graft-race-idx").toString
    // 128 buckets: an ~8-doc trigger's ≤128 band keys cannot cover
    // every bucket, so the PRUNED path — the one whose file listing
    // can go stale — is the code under race, not the catalog fallback
    graft.ops.Dedup.buildNearDupIndex(corpus, "nd_race_bands",
      s"$idxDir/bands", "nd_race_shingles", s"$idxDir/shingles",
      nBuckets = 128)
    val tables = Seq("nd_race_bands", "nd_race_shingles")
    def sweep(): Unit = tables.foreach(t =>
      graft.sources.PartitionedStore.compactBucketed(spark, t,
        dedupRows = true))
    def pairsOf(m: org.apache.spark.sql.DataFrame) =
      m.collect().map(r => (r.getLong(0), r.getLong(1)))
    try {
      val control = scala.collection.mutable.Set[(Long, Long)]()
      locally {
        val q = EventStream.nearDupIndexEachBatch(spark, stream,
          "nd_race_bands", "nd_race_shingles") { (m, _) =>
            control ++= pairsOf(m)
          }.start()
        q.processAllAvailable(); q.stop()
      }
      assert(control.nonEmpty, "race fixture found no matches — vacuous")

      // A: between triggers — compact inside trigger 0's sink AFTER
      // consuming, so trigger 1 screens the compacted store
      val accA = scala.collection.mutable.Set[(Long, Long)]()
      var sweptA = false
      locally {
        val q = EventStream.nearDupIndexEachBatch(spark, stream,
          "nd_race_bands", "nd_race_shingles") { (m, _) =>
            accA ++= pairsOf(m)
            if (!sweptA) { sweptA = true; sweep() }
          }.start()
        q.processAllAvailable(); q.stop()
      }
      assert(sweptA)
      assert(accA == control,
        "between-triggers compaction changed the pair set")

      // B: mid-trigger straddle — swap BEFORE consuming; the retried
      // attempt (same batch id, second sink call) must succeed and the
      // non-straddling trigger must run exactly once
      val accB = scala.collection.mutable.Set[(Long, Long)]()
      val calls = scala.collection.mutable.Map[Long, Int]()
      var swappedB = false
      locally {
        val q = EventStream.nearDupIndexEachBatch(spark, stream,
          "nd_race_bands", "nd_race_shingles") { (m, id) =>
            calls(id) = calls.getOrElse(id, 0) + 1
            if (!swappedB) { swappedB = true; sweep() }
            accB ++= pairsOf(m)
          }.start()
        q.processAllAvailable(); q.stop()
      }
      assert(accB == control, "mid-trigger swap changed the pair set")
      assert(calls.getOrElse(0L, 0) == 2,
        s"straddling trigger must fail FILE_NOT_EXIST and retry once: " +
          s"$calls")
      assert(calls.getOrElse(1L, 0) == 1,
        s"non-straddling trigger must run exactly once: $calls")

      // C: the retry ALSO straddles a swap (the store is being
      // continuously rewritten — the operational fault the posture is
      // designed to surface) → the query dies loudly, and the
      // propagated failure carries the FIRST straddle as a suppressed
      // throwable so the diagnosis "second failure = continuous
      // rewrite" is attributable from one stack trace (review r20)
      val callsC = scala.collection.mutable.Map[Long, Int]()
      val accC = scala.collection.mutable.Set[(Long, Long)]()
      val eC = intercept[org.apache.spark.sql.streaming
          .StreamingQueryException] {
        val q = EventStream.nearDupIndexEachBatch(spark, stream,
          "nd_race_bands", "nd_race_shingles") { (m, id) =>
            callsC(id) = callsC.getOrElse(id, 0) + 1
            sweep() // swap on EVERY attempt: the retry must die too
            accC ++= pairsOf(m) // consume → trigger the doomed read
          }.start()
        try q.processAllAvailable() finally q.stop()
      }
      assert(accC.isEmpty,
        s"no attempt may survive a continuous rewrite: $accC")
      assert(callsC.getOrElse(0L, 0) == 2,
        s"continuous rewrite must still be exactly one retry: $callsC")
      var c: Throwable = eC
      var sawSuppressed = false
      while (c != null && !sawSuppressed) {
        sawSuppressed = c.getSuppressed.nonEmpty
        c = if (c.getCause eq c) null else c.getCause
      }
      assert(sawSuppressed,
        "the second failure must carry the first straddle as suppressed")
    } finally {
      spark.sql("DROP TABLE IF EXISTS nd_race_bands")
      spark.sql("DROP TABLE IF EXISTS nd_race_shingles")
    }
  }

  test("streaming IVF probe equals the batch probe, across a " +
      "compaction sweep") {
    // the ANN streaming dual (r20): per-trigger top-k against the
    // persisted IVF index. Each query's top-k is independent, so the
    // union over triggers must equal the one-shot batch probe of all
    // queries — and a maintenance sweep INSIDE trigger 0's sink
    // (between triggers, the nightly posture) must not change trigger
    // 1's rows (compaction is probe-invariant; IvfSpec pins the batch
    // side, this pins the streaming side)
    val embs = Tables(spark, sf).embeddings
    val dir = Files.createTempDirectory("graft-ivf-stream").toString
    graft.ops.Ivf.buildIvfIndex(embs, "ivf_stream_t", s"$dir/t")
    val qdir = s"$dir/q"
    embs.filter(col("vec_id") < 5).coalesce(1).write.parquet(s"$qdir/b0")
    embs.filter(col("vec_id") >= 5 && col("vec_id") < 10).coalesce(1)
      .write.parquet(s"$qdir/b1")
    try {
      val stream = spark.readStream.schema(embs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true").parquet(qdir)
      val acc = scala.collection.mutable.Set[(Long, Long, Int)]()
      var swept = false
      val q = EventStream.ivfProbeEachBatch(spark, stream,
        "ivf_stream_t", k = 3) { (m, _) =>
          acc ++= m.collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getInt(2)))
          if (!swept) {
            swept = true
            graft.sources.PartitionedStore
              .compactBucketed(spark, "ivf_stream_t")
          }
        }.start()
      q.processAllAvailable(); q.stop()
      assert(swept)
      val batch = graft.ops.Ivf.knnIvfFrom(spark, "ivf_stream_t",
        embs.filter(col("vec_id") < 10), k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet
      assert(acc == batch,
        s"stream/batch diverged: ${(acc -- batch) ++ (batch -- acc)}")
    } finally spark.sql("DROP TABLE IF EXISTS ivf_stream_t")
  }

  test("cross-batch late event folds into the session, never a phantom") {
    // delivery: 10:00 (batch 1), 09:00 (batch 2 — LATE), 10:20 (batch 3).
    // The late event must fold into the open session WITHOUT regressing
    // the gap clock: pre-fix, lastTs regressed to 09:00 and the 10:20
    // event measured an 80-min gap → a phantom second session. The
    // documented streaming semantics count ONE session (batch parity is
    // scoped to in-order delivery; a late event never opens a session).
    import java.nio.file.Files
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-late").toString
    val base = java.sql.Timestamp.valueOf("2026-01-01 10:00:00").getTime
    def writeOne(name: String, tsMs: Long, mtime: Long): Unit = {
      Seq((1L, new java.sql.Timestamp(tsMs)))
        .toDF("user_id", "ts").coalesce(1)
        .write.parquet(s"$dir/$name")
      new java.io.File(s"$dir/$name").listFiles()
        .foreach(_.setLastModified(mtime))
    }
    writeOne("f1", base, 1000000L)                    // 10:00
    writeOne("f2", base - 3600000L, 2000000L)         // 09:00, late
    writeOne("f3", base + 1200000L, 3000000L)         // 10:20
    val stream = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/f*")
    val got = EventStream.runToMemory(
        EventStream.sessionize(stream).toDF(), "sessions_late",
        lastPerKey = Seq("user_id"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(got == ((3L, 1L)),
      s"expected (n_events, n_sessions) = (3, 1), got $got")
  }

  test("streaming span screen: NULL-text doc absent, like the batch dual") {
    import java.nio.file.Files
    import spark.implicits._
    val corpus = Seq((100L, "a b c d e f g h i j"))
      .toDF("doc_id", "text")
    val dir = s"${Files.createTempDirectory("graft-span-null")}/docs"
    Seq((1L, "a b c d e f g h i j k l"), (2L, null: String))
      .toDF("doc_id", "text").coalesce(1).write.parquet(dir)
    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(dir)
    val got = EventStream.runToMemory(
        EventStream.spanScreenAgainstCorpus(stream, corpus), "span_null",
        org.apache.spark.sql.streaming.OutputMode.Append)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L),
      s"NULL-text doc must be absent (batch dual drops it): $got")
  }

  test("streaming span screen matches the batch spanScreen exactly") {
    import java.nio.file.Files
    val docs = Tables(spark, sf).documents.select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val dir = Files.createTempDirectory("graft-spanscreen-stream").toString
    batch.coalesce(1).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(dir)
    val got = EventStream.runToMemory(
      EventStream.spanScreenAgainstCorpus(stream, corpus), "span_stream",
      org.apache.spark.sql.streaming.OutputMode.Append)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val expected = graft.ops.Dedup
      .spanScreen(batch, graft.ops.Dedup.spanBank(corpus)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(expected.values.exists(_._2 > 0L), "screen found nothing — vacuous")
    // bloom FPs could only ADD coverage; on this fixture none fire, so
    // the stateless bloom screen reproduces the exact screen row-for-row
    assert(got == expected)
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

  test("streaming chain screen → dedup → span-screen equals the batch " +
      "composition") {
    val docs = Tables(spark, sf).documents.select("doc_id", "text")
    val dir = Files.createTempDirectory("graft-spanchain-stream").toString
    graft.queries.DedupSim.landingBatch(docs)
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(dir)
    val seen = docs.select(sha2(lower(col("text")), 256).as("digest"))
    // one streaming DAG: quality screen → corpus exact-dedup → bloom
    // span screen; all three stages stateless or stream-static
    val got = EventStream.runToMemory(
      EventStream.spanScreenAgainstCorpus(
        EventStream.dedupAgainstCorpus(
          EventStream.qualityScreen(stream, carry = Seq("text"))
            .select(col("doc_id"), col("text")),
          seen, carry = Seq("text"))
          .select(col("doc_id"), col("text")),
        docs), "span_chain",
      org.apache.spark.sql.streaming.OutputMode.Append)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // batch composition over the same frontier
    val lb = graft.queries.DedupSim.landingBatch(docs)
    val screened = graft.ops.TextAnalysis
      .gopherRules(lb, carry = Seq("text")).filter(col("gopher_pass"))
      .select(col("doc_id"), col("text"))
    val kept = graft.ops.Dedup.incrementalDedup(screened, seen)
      .select("doc_id").join(screened, Seq("doc_id"))
    val expected = graft.ops.Dedup
      .spanScreen(kept, graft.ops.Dedup.spanBank(docs)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(expected.values.exists(_._2 > 0L), "span stage vacuous")
    assert(got == expected)
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

  // ---- state-bound assertions: the scaladoc claims about watermark
  // eviction, MEASURED from StateOperatorProgress instead of described ----

  /** One micro-batch per parquet dir, ordered by file mtime (what the
    * file source sorts on); `at` spaces mtimes a minute apart so the
    * batch order is deterministic. */
  private def writeBatch(dir: String, name: String, at: Int,
      rows: Seq[(Long, Long, Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("event_id", "es", "user_id", "event_type")
      .select(col("event_id"), timestamp_seconds(col("es")).as("ts"),
        col("user_id"), col("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.parquet(s"$dir/$name")
    new java.io.File(s"$dir/$name").listFiles()
      .foreach(_.setLastModified(1700000000000L + at * 60000L))
  }

  /** Drive to completion and return (result table, per-batch state-rows
    * totals) for the stateful operator chain. */
  private def runWithProgress(df: org.apache.spark.sql.DataFrame,
      name: String,
      mode: org.apache.spark.sql.streaming.OutputMode =
        org.apache.spark.sql.streaming.OutputMode.Append)
      : (org.apache.spark.sql.DataFrame, Seq[Long]) = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory").queryName(name)
      .start()
    q.processAllAvailable()
    val progress = q.recentProgress.toSeq.filter(_.stateOperators.nonEmpty)
    q.stop()
    (spark.table(name),
      progress.map(_.stateOperators.map(_.numRowsTotal).sum))
  }

  private val H = 3600L

  test("interval join: evicted state cannot resurrect pairs, rows bounded") {
    val dir = Files.createTempDirectory("graft-attrib-late").toString
    // b1: on-time pair at hour 0; b2: pair at hour 10 (watermark → 8:00
    // after commit); b3: benign views — the batch where the 8:00
    // watermark APPLIES and hour-0 state is physically removed; b4: a
    // LATE click for user 1 at 00:05, inside purchase 201's lookback —
    // its partner's state is gone, so no pair may appear (within the
    // eviction batch itself Spark still matches before removing, so the
    // deterministic guarantee starts one batch later — measured); b5:
    // on-time pair at hour 30; b6: views at hour 40 → final eviction.
    writeBatch(dir, "b1", 1, Seq((101L, 600L, 1L, "click"),
      (201L, 1200L, 1L, "purchase")))
    writeBatch(dir, "b2", 2, Seq((102L, 10L * H, 2L, "click"),
      (202L, 10L * H + 600L, 2L, "purchase")))
    writeBatch(dir, "b3", 3, Seq((901L, 11L * H, 9L, "view")))
    writeBatch(dir, "b4", 4, Seq((107L, 300L, 1L, "click")))
    writeBatch(dir, "b5", 5, Seq((104L, 30L * H, 4L, "click"),
      (204L, 30L * H + 300L, 4L, "purchase")))
    writeBatch(dir, "b6", 6, Seq((105L, 40L * H, 5L, "view"),
      (106L, 40L * H + 60L, 5L, "view")))
    val stream = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, " +
        "event_type STRING, value DOUBLE, props STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/b*")
    val (table, totals) = runWithProgress(
      EventStream.clickAttribution(stream), "attrib_state_bounds")
    val pairs = table.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // (a) the late click finds no partner — state eviction is REAL: the
    // pair (201, 1, 107) the batch predicate would produce is absent
    assert(pairs == Set((201L, 1L, 101L), (202L, 2L, 102L),
      (204L, 4L, 104L)), s"got $pairs")
    // (b) state is BOUNDED: eviction brings the final total below the
    // peak — the buffer tracks the watermark horizon, it does not
    // accumulate the stream (totals sum both join sides)
    assert(totals.size >= 6, s"expected >=6 stateful batches: $totals")
    assert(totals.last < totals.max,
      s"no eviction observed across batches: $totals")
    assert(totals.last <= 4,
      s"final state should hold only the last horizon's rows: $totals")
  }

  test("watermarked dedup: duplicates drop, key state evicts, bounded") {
    val dir = Files.createTempDirectory("graft-dedup-late").toString
    writeBatch(dir, "b1", 1, Seq((1L, 0L, 1L, "view"),
      (2L, 300L, 1L, "view")))
    writeBatch(dir, "b2", 2, Seq((3L, 10L * H, 2L, "view")))
    // late duplicate of id 1 — its key is still present when the batch
    // computes (removal runs in the same batch), so it deduplicates
    writeBatch(dir, "b3", 3, Seq((1L, 600L, 1L, "view")))
    // id 2 again at hour 20, long after key 2's state evicted: the
    // documented dropDuplicatesWithinWatermark tradeoff — it RE-EMITS
    // (bounded state cannot remember evicted keys)
    writeBatch(dir, "b4", 4, Seq((2L, 20L * H, 4L, "view")))
    writeBatch(dir, "b5", 5, Seq((6L, 30L * H, 5L, "view")))
    val stream = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, " +
        "event_type STRING, value DOUBLE, props STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/b*")
    val (table, totals) = runWithProgress(
      EventStream.dedupEvents(stream).select("event_id"),
      "dedup_state_bounds")
    val counts = table.collect().map(_.getLong(0)).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(counts == Map(1L -> 1, 2L -> 2, 3L -> 1, 6L -> 1),
      s"got $counts")
    // key state tracks the watermark horizon: the final total is below
    // the peak (evictions happened) and small
    assert(totals.last < totals.max,
      s"no key-state eviction observed: $totals")
    assert(totals.last <= 2, s"final key state should be bounded: $totals")
  }

  test("streaming split dual: late near-dup lands in its cluster's split") {
    import spark.implicits._
    import graft.ops.{Dedup, Sampling, TextAnalysis}
    // corpus: docs 1 and 20 share a near-dup cluster (identical text,
    // canonical 1 → "train" — same fixture family as LeakageSplitSpec);
    // doc 21 is an unrelated singleton
    val longText = "the quick brown fox jumps over the lazy dog while " +
      "seventeen curious pelicans watch from the harbour wall and the " +
      "tide slides out past the mooring buoys toward the grey horizon " +
      "carrying little boats and their patient silent fishermen along"
    val corpus = Seq(
      (1L, longText), (20L, longText),
      (21L, "completely different content about other things entirely " +
        "with its own vocabulary and rhythm and no overlap at all"))
      .toDF("doc_id", "text")
    val cmap = Dedup.simhashCanonical(corpus)
    // arriving doc_ids (all > corpus ids, the documented contract),
    // chosen so the near-dup's NAIVE split is NOT train — the leakage
    // case this operator exists to close
    val naive = (5000L to 5100L).map(i => (i,
        spark.range(1).select(
          TextAnalysis.splitAssign(lit(i)).as("s")).head().getString(0)))
    val lateId = naive.find(_._2 == "test").get._1
    val freshId = naive.find(p => p._2 == "test" && p._1 != lateId).get._1
    val arriving = Seq(
      // late near-dup of the (1, 20) training cluster: first word dropped
      (lateId, longText.replaceFirst("^[^ ]* ", "")),
      // genuinely fresh text: self-labels at its own hash bucket
      (freshId, "entirely novel prose concerning migratory songbirds " +
        "and the cartography of small alpine lakes at dawn in autumn"),
      // NULL text: NULL signature, joins nothing, self-labels
      (7000L, null: String)).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft-split-stream").toString
    arriving.coalesce(1).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(dir)
    val got = EventStream.runToMemory(
      EventStream.splitAgainstCorpus(stream, corpus, cmap),
      "split_stream", org.apache.spark.sql.streaming.OutputMode.Update,
      lastPerKey = Seq("doc_id"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    // row-identity with the batch operator replayed over corpus ∪ batch
    val batch = Sampling.leakageSafeSplitsFrom(
        Dedup.simhashCanonical(corpus.union(arriving)))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    val arrivingIds = Seq(lateId, freshId, 7000L)
    assert(arrivingIds.forall(id => got(id) == batch(id)),
      s"stream diverged from batch replay: got=$got batch=" +
        s"${batch.view.filterKeys(arrivingIds.contains).toMap}")
    // and the fixture exercises the leakage case: the late near-dup's
    // cluster split (train, keyed on canonical 1) differs from its naive
    // per-doc split (test) — it must land in the CLUSTER's split
    assert(got(lateId) == ((1L, "train")),
      s"late near-dup must join cluster 1's train split: ${got(lateId)}")
    // fresh + NULL docs self-label as singletons
    assert(got(freshId) == ((freshId, "test")))
    assert(got(7000L)._1 == 7000L)
    graft.ops.Stage.releaseAll(spark)
  }

  test("streaming split dual: within-stream near-dups self-label " +
      "(documented divergence), and the epoch posture removes it") {
    import spark.implicits._
    import graft.ops.{Dedup, Sampling}
    // the ONE streaming-vs-batch divergence splitAgainstCorpus documents
    // (EventStream contract): arriving docs compare to the CORPUS only,
    // never to each other — two streamed near-dups of one another with
    // no corpus match each self-label, possibly into different splits,
    // where the batch replay clusters them. Within-stream duplication
    // is the landing screens' job, which in the incremental posture
    // means: doc A's epoch publishes A into the corpus, so doc B's
    // epoch DOES see A — this spec pins both halves executably.
    val corpus = Seq(
      (1L, "completely different content about other things entirely " +
        "with its own vocabulary and rhythm and no overlap at all"))
      .toDF("doc_id", "text")
    val cmap = Dedup.simhashCanonical(corpus)
    val novel = "entirely novel prose concerning migratory songbirds " +
      "and the cartography of small alpine lakes at dawn in autumn " +
      "where the first frost writes silver sentences on the meadow " +
      "grass and the last swifts carve their goodbyes into pale sky"
    // pick arriving ids (> corpus ids) whose NAIVE splits differ — the
    // divergence must be visible in the split column, not just the label
    val naive = (5000L to 5100L).map(i => (i,
      spark.range(1).select(
        graft.ops.TextAnalysis.splitAssign(lit(i)).as("s"))
        .head().getString(0)))
    val idA = naive.find(_._2 == "test").get._1
    // idB > idA: half 2 publishes A into the corpus, and the operator's
    // contract requires arriving ids larger than every corpus id
    val idB = naive.find(p => p._2 == "train" && p._1 > idA).get._1
    val textA = novel
    val textB = novel.replaceFirst("^[^ ]* ", "") // near-dup of A
    // fixture sanity: batch WOULD cluster them (they are near-dups) and
    // neither matches the corpus
    val batchMap = Dedup.simhashCanonical(
      corpus.union(Seq((idA, textA), (idB, textB)).toDF("doc_id", "text")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batchMap(idA) == batchMap(idB),
      "fixture broken: batch replay must cluster the two near-dups")
    assert(batchMap(idA) == math.min(idA, idB) && batchMap(1L) == 1L,
      "fixture broken: the pair must not touch the corpus cluster")

    // HALF 1 — one stream delivers both: each self-labels, splits differ
    val dir = Files.createTempDirectory("graft-split-wsdup").toString
    Seq((idA, textA), (idB, textB)).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/one")
    val oneStream = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(s"$dir/one")
    val got = EventStream.runToMemory(
      EventStream.splitAgainstCorpus(oneStream, corpus, cmap),
      "split_wsdup", org.apache.spark.sql.streaming.OutputMode.Update,
      lastPerKey = Seq("doc_id"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(got(idA) == ((idA, "test")) && got(idB) == ((idB, "train")),
      s"each within-stream near-dup must SELF-label (documented " +
        s"contract): $got")
    // and that IS a divergence from the batch replay, by construction
    val batchSplit = Sampling.leakageSafeSplitsFrom(
      Dedup.simhashCanonical(corpus.union(
        Seq((idA, textA), (idB, textB)).toDF("doc_id", "text"))))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(batchSplit(idA) == batchSplit(idB),
      "batch replay puts the cluster in ONE split")
    assert(got(idA)._2 != got(idB)._2,
      "fixture must exhibit the documented split divergence")

    // HALF 2 — the epoch posture: A's epoch publishes A into the
    // corpus (the landing chain's job), so B's epoch sees A in the
    // static index and joins A's cluster — divergence gone
    Seq((idB, textB)).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/two")
    val corpus2 = corpus.union(Seq((idA, textA)).toDF("doc_id", "text"))
    val cmap2 = Dedup.simhashCanonical(corpus2)
    val bStream = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(s"$dir/two")
    val got2 = EventStream.runToMemory(
      EventStream.splitAgainstCorpus(bStream, corpus2, cmap2),
      "split_wsdup2", org.apache.spark.sql.streaming.OutputMode.Update,
      lastPerKey = Seq("doc_id"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(got2(idB) == ((idA, "test")),
      s"after A is published, B must join A's cluster and split: $got2")
    graft.ops.Stage.releaseAll(spark)
  }

  test("near-dup screen: re-delivered doc with CHANGED text re-verifies") {
    import spark.implicits._
    // corpus doc 1; the arriving doc_id 100 is delivered TWICE: first as
    // a lightly-padded version that LSH-collides but FAILS the cranked
    // 99/100 Jaccard verification, then re-delivered as the exact corpus
    // text, which passes. Without the content digest in the stateful
    // candidate dedup key, the failed first delivery permanently
    // suppresses the (100, 1) candidate and the second delivery is never
    // verified — the r14 advice finding this spec pins.
    val base = "the quick brown fox jumps over the lazy dog while " +
      "seventeen curious pelicans watch from the harbour wall and the " +
      "tide slides out past the mooring buoys toward the grey horizon " +
      "carrying little boats and their patient silent fishermen along"
    val corpus = Seq((1L, base)).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft-redeliver").toString
    def writeDoc(name: String, at: Int, text: String): Unit = {
      Seq((100L, text)).toDF("doc_id", "text").coalesce(1)
        .write.parquet(s"$dir/$name")
      new java.io.File(s"$dir/$name").listFiles()
        .foreach(_.setLastModified(1700000000000L + at * 60000L))
    }
    val padded = base + " coda epilogue"
    writeDoc("b1", 1, padded)
    writeDoc("b2", 2, base)
    def stream = spark.readStream.schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/b*")
    // fixture sanity: the padded version IS an LSH candidate (threshold
    // 0 verifies any collision) — the suppression path is exercised
    val collided = EventStream.runToMemory(
      EventStream.nearDupAgainstCorpus(stream, corpus,
        numer = 0, denom = 1), "redeliver_sanity",
      org.apache.spark.sql.streaming.OutputMode.Append)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(collided.length == 2 &&
      collided.map(c => (c._1, c._2)).distinct.toSeq == Seq((100L, 1L)),
      s"padded delivery did not collide / digests did not split: " +
        collided.mkString(","))
    assert(collided.map(_._3).distinct.length == 2,
      "content digests of the two deliveries must differ")
    // cranked verification: only the re-delivered exact text passes
    val got = EventStream.runToMemory(
      EventStream.nearDupAgainstCorpus(stream, corpus,
        numer = 99, denom = 100), "redeliver_stream",
      org.apache.spark.sql.streaming.OutputMode.Append)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((100L, 1L)),
      s"changed-text re-delivery must re-verify: got ${got.mkString(",")}")
  }

  test("streaming split dual: event-time watermark bounds per-doc state") {
    import spark.implicits._
    import graft.ops.{Dedup, Sampling}
    val longText = "the quick brown fox jumps over the lazy dog while " +
      "seventeen curious pelicans watch from the harbour wall and the " +
      "tide slides out past the mooring buoys toward the grey horizon " +
      "carrying little boats and their patient silent fishermen along"
    val corpus = Seq(
      (1L, longText), (20L, longText),
      (21L, "completely different content about other things entirely " +
        "with its own vocabulary and rhythm and no overlap at all"))
      .toDF("doc_id", "text")
    val cmap = Dedup.simhashCanonical(corpus)
    val dir = Files.createTempDirectory("graft-split-wm").toString
    def writeDoc(name: String, at: Int, id: Long, es: Long,
        text: String): Unit = {
      Seq((id, es, text)).toDF("doc_id", "es", "text")
        .select(col("doc_id"), timestamp_seconds(col("es")).as("ts"),
          col("text"))
        .coalesce(1).write.parquet(s"$dir/$name")
      new java.io.File(s"$dir/$name").listFiles()
        .foreach(_.setLastModified(1700000000000L + at * 60000L))
    }
    // event times 10 hours apart: each batch's commit advances the
    // watermark past the previous doc's timestamp, so its aggregation
    // state row is evicted — per-doc state tracks the lateness horizon
    // instead of accumulating one row per doc forever. Base epoch well
    // past 0 (epoch-0 event times sit exactly on the initial watermark).
    val E = 1700000000L
    writeDoc("b1", 1, 5000L, E, longText.replaceFirst("^[^ ]* ", ""))
    writeDoc("b2", 2, 5001L, E + 10L * H, "entirely novel prose " +
      "concerning migratory songbirds and the cartography of alpine lakes")
    writeDoc("b3", 3, 5002L, E + 20L * H, "another fresh document about " +
      "glacier moraines and the slow patience of lichen on granite")
    writeDoc("b4", 4, 5003L, E + 30L * H, "final fresh text on the " +
      "acoustics of empty railway stations after the last train has gone")
    val stream = spark.readStream
      .schema("doc_id LONG, ts TIMESTAMP, text STRING")
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/b*")
    val (table, totals) = runWithProgress(
      EventStream.splitAgainstCorpus(stream, corpus, cmap,
        eventTimeCol = Some("ts")),
      "split_wm", org.apache.spark.sql.streaming.OutputMode.Update)
    val got = table.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // row identity with the batch replay — the watermark key must not
    // change any assignment
    val batchDocs = Seq(5000L, 5001L, 5002L, 5003L)
    val arriving = table.sparkSession.read.parquet(s"$dir/b*")
      .select(col("doc_id"), col("text"))
    val batch = Sampling.leakageSafeSplitsFrom(
        Dedup.simhashCanonical(corpus.union(arriving)))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(batchDocs.forall(id => got(id) == batch(id)),
      s"watermarked split diverged from batch replay: got=$got")
    assert(got(5000L) == ((1L, "train")),
      "the near-dup must still land in cluster 1's split")
    // state eviction is REAL: the final per-doc state total sits below
    // the peak and at the horizon's size, not the stream's
    assert(totals.size >= 4, s"expected >=4 stateful batches: $totals")
    assert(totals.last < totals.max,
      s"no aggregation-state eviction observed: $totals")
    assert(totals.last <= 2,
      s"final agg state should hold only the horizon's docs: $totals")
    graft.ops.Stage.releaseAll(spark)
  }
}
