package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.CorpusOps

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("every corpus query runs at sf0.001 and has an oracle") {
    CorpusOps.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, name)
      assert(df.count() >= 0, name)
    }
    assert(CorpusOps.oracle.keySet == CorpusOps.queries.keySet)
  }

  test("stratified sample is deterministic and rate-shaped") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 40), default = 80)
    val b = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 40), default = 80)
    // pure function of the data: two evaluations agree exactly
    assert(a.select("doc_id").except(b.select("doc_id")).count() == 0)
    assert(a.count() < docs.count() && a.count() > 0)
    // en is downsampled harder than the rest
    val keptRate = a.groupBy("lang").count()
      .join(docs.groupBy("lang").count().withColumnRenamed("count", "all"),
        "lang")
      .select(col("lang"), col("count") * 100 / col("all"))
      .as[(String, Double)].collect().toMap
    assert(keptRate("en") < keptRate.filterNot(_._1 == "en").values.min)
  }

  test("source quota keeps at most K per source, deterministically") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val q = Sampling.sourceQuota(docs, "source", "doc_id", 3)
    val perSource = q.groupBy("source").count().as[(String, Long)]
      .collect()
    assert(perSource.forall(_._2 <= 3))
    // every source with ≥3 docs hits the quota exactly
    val eligible = docs.groupBy("source").count()
      .filter(col("count") >= 3).count()
    assert(perSource.count(_._2 == 3) == eligible)
  }

  test("mix + quota treat a NULL key as a group, not as rows to drop") {
    // pre-fix, the equi joins inside temperatureMix / sourceQuota
    // silently dropped every NULL-source row while the NULL group still
    // inflated the budget denominator
    val docs = ((0 until 400).map(i => (i.toLong, "big")) ++
      (400 until 500).map(i => (i.toLong, null: String)))
      .toDF("doc_id", "source")
    val kept = Sampling.temperatureMix(docs, "source", "doc_id",
      alpha = 0.5, targetRows = 250L)
      .groupBy("source").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    // w_big = 20, w_null = 10 → rate_big ≈ 0.417, rate_null ≈ 0.833:
    // the NULL group participates at ITS derived rate
    assert(kept.contains(None), s"NULL-source rows dropped: $kept")
    assert(math.abs(kept(None) - 83L) <= 15, kept.toString)
    assert(math.abs(kept.values.sum - 250L) <= 25, kept.toString)
    val q = Sampling.sourceQuota(docs, "source", "doc_id", 3)
      .groupBy("source").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(q(None) == 3L, s"NULL source must cap at quota, got $q")
  }

  test("packing: NULL text packs as a zero-length placement") {
    val docs = Seq((1L, "a b c"), (2L, null: String), (3L, "d e"))
      .toDF("doc_id", "text")
    val p = Packing.packSequences(docs, capacity = 4L, nShards = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // all three docs placed (getLong throws on a NULL bin, so building
    // the map IS the non-null assertion); the NULL-text doc holds a
    // real zero-width slot inside the 5-token stream
    assert(p.size == 3, p.toString)
    assert(p(2L)._1 == 0L, s"NULL text must count 0 tokens: ${p(2L)}")
    assert(p.values.map(_._1).sum == 5L, p.toString)
    assert(p.values.forall(v => v._2 >= 0L && v._2 <= 5L && v._3 >= 0L),
      s"zero-width doc must sit at a real offset: $p")
  }

  test("temperature mix flattens a skewed source distribution to budget") {
    val docs = ((0 until 900).map(i => (i.toLong, "big")) ++
      (900 until 1000).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    val kept = Sampling.temperatureMix(docs, "source", "doc_id",
      alpha = 0.5, targetRows = 300L)
    // deterministic: two evaluations agree exactly
    assert(kept.select("doc_id")
      .except(Sampling.temperatureMix(docs, "source", "doc_id", 0.5, 300L)
        .select("doc_id")).count() == 0)
    val bySource = kept.groupBy("source").count().as[(String, Long)]
      .collect().toMap
    // w_big = 30, w_small = 10 → rate_big = 0.25, rate_small = 0.75:
    // the small source keeps a 3× HIGHER fraction (flattening), and the
    // Weyl-sequence buckets land each count within a few % of expectation
    assert(math.abs(bySource("big") - 225L) <= 20, bySource.toString)
    assert(math.abs(bySource("small") - 75L) <= 10, bySource.toString)
    val total = bySource.values.sum
    assert(math.abs(total - 300L) <= 25, s"total=$total")
  }

  test("mix plan: flattened epochs, exact at alpha extremes") {
    // big: 4 docs × 4 tokens = 16; small: 1 doc × 4 tokens = 4
    val docs = ((1 to 4).map(i => (i.toLong, "big", "w x y z")) :+
      ((9L, "small", "p q r s"))).toDF("doc_id", "source", "text")
    // α = 1: natural mix — every source gets the same epoch count
    // (budget/total = 40/20 = 2.000)
    val nat = Sampling.mixPlan(docs, "source", "text", alpha = 1.0,
        tokenBudget = 40L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(nat("big") == ((4L, 16L, 2000L)))
    assert(nat("small") == ((1L, 4L, 2000L)))
    // α = 0.5: w_big = 4, w_small = 2 → small's epochs 2× big's
    // (big: 40·4/(6·16) = 5/3; small: 40·2/(6·4) = 10/3)
    val flat = Sampling.mixPlan(docs, "source", "text", alpha = 0.5,
        tokenBudget = 40L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(flat("big") == 1666L, flat.toString)
    assert(flat("small") == 3333L, flat.toString)
  }

  test("materialized mix: floor copies for all, fraction via hash share") {
    val docs = (0 until 100).map(i => (i.toLong, "s", "a b c d"))
      .toDF("doc_id", "source", "text")
    // integral epochs: 800·1000/400 = 2000 → exactly 2 copies each
    val exact = Sampling.materializeMix(docs, "source", "doc_id", "text",
      alpha = 1.0, tokenBudget = 800L)
    assert(exact.count() == 200L)
    assert(exact.groupBy("doc_id").count().filter(col("count") =!= 2L)
      .count() == 0L)
    // fractional: 1000·1000/400 = 2500 → 2 or 3 copies, ~half each
    val frac = Sampling.materializeMix(docs, "source", "doc_id", "text",
      alpha = 1.0, tokenBudget = 1000L)
    val per = frac.groupBy("doc_id").count().as[(Long, Long)]
      .collect().toMap
    assert(per.size == 100 && per.values.forall(c => c == 2L || c == 3L))
    assert(math.abs(per.values.sum - 250L) <= 20, per.values.sum.toString)
    // deterministic: two evaluations agree exactly
    assert(frac.exceptAll(Sampling.materializeMix(docs, "source",
      "doc_id", "text", 1.0, 1000L)).count() == 0L)
  }

  test("training order: dense per-shard positions, spread, deterministic") {
    val mix = (0 until 200).flatMap(i =>
      Seq((i.toLong, "s", 1), (i.toLong, "s", 2)))
      .toDF("doc_id", "source", "copy")
    val r = Sampling.trainingOrder(mix, "doc_id", "copy", nShards = 8)
    assert(r.count() == 400)
    val byShard = r.groupBy("shard")
      .agg(count(lit(1)).as("n"), min(col("pos")).as("mn"),
        max(col("pos")).as("mx"))
      .collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(byShard.map(_._1).toSet.subsetOf((0 until 8).toSet))
    // positions are dense 0..n-1 within every shard
    byShard.foreach { case (s, n, mn, mx) =>
      assert(mn == 0L && mx == n - 1, s"shard $s: n=$n mn=$mn mx=$mx") }
    // hash spread: no shard hogs the mixture
    assert(byShard.map(_._2).max <= 150L, byShard.mkString(","))
    assert(byShard.length == 8)
    // deterministic: two evaluations agree exactly
    assert(r.exceptAll(Sampling.trainingOrder(mix, "doc_id", "copy", 8))
      .count() == 0L)
  }

  test("portable HLL estimate lands within 30% of exact") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val row = Sketches.hllDistinct(orders, "o_custkey").head()
    val exact = row.getLong(0)
    val est = row.getLong(1) / 1000.0
    assert(exact > 0)
    assert(math.abs(est - exact) <= 0.30 * exact,
      s"exact=$exact est=$est")
  }

  test("merged per-segment HLL registers equal the direct union sketch") {
    // key with sketch-scale cardinality at sf0.001 (user_id has only 15
    // distinct there, below the raw estimator's small-range floor —
    // documented in hllDistinct) that still overlaps across segments
    val events = graft.Tables(spark, sf).events
      .withColumn("k", col("event_id") % 997)
    val row = Sketches.hllMergeAcross(events, "k", "event_type")
      .head()
    val (exact, merged, direct) =
      (row.getLong(0), row.getLong(1), row.getLong(2))
    // the reaggregability invariant: merging segment register files IS
    // the union sketch, bit for bit — NOT the sum of per-segment counts
    assert(merged == direct, s"merged=$merged direct=$direct")
    assert(math.abs(merged / 1000.0 - exact) <= 0.30 * exact,
      s"exact=$exact merged=$merged")
    // overlap really exists: summing per-segment exact counts overshoots
    val sumOfSegments = events.groupBy(col("event_type"))
      .agg(countDistinct(col("k")).as("n")).agg(sum("n"))
      .head().getLong(0)
    assert(sumOfSegments > exact,
      s"segments don't overlap — the merge test is vacuous ($sumOfSegments)")
  }

  test("histogram quantiles bracket the exact quantiles within one bin") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val qh = Sketches.histogramQuantiles(docs, "n_chars", 64L,
        Seq(50, 90, 99))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val exact = docs.stat.approxQuantile("n_chars",
      Array(0.5, 0.9, 0.99), 0.0)
    for (((q, lo), ex) <- qh.toSeq.sortBy(_._1).zip(exact)) {
      assert(ex >= lo && ex < lo + 64 + 64, s"q=$q lo=$lo exact=$ex")
    }
  }

  test("histogram quantiles on an empty input return zero rows") {
    val empty = Seq.empty[Long].toDF("n_chars")
    assert(Sketches.histogramQuantiles(empty, "n_chars", 64L,
      Seq(50, 99)).count() == 0)
  }

  test("segment dedup: first doc intact, exact dup emptied, reassembly ordered") {
    val docs = Seq(
      (1L, "a b c d e f g h i j k l"), // 12 tokens → segs of 8: 2 segs
      (2L, "a b c d e f g h i j k l"), // exact dup → everything dropped
      (3L, "x y z a b c d e f g h i j k l q") // fresh 16 → both segs kept
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, segTokens = 8)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._4 == "a b c d e f g h i j k l")
    assert(out(1L)._2 == 2 && out(1L)._3 == 2)
    assert(out(2L)._3 == 0 && out(2L)._4 == "")
    assert(out(3L)._3 == 2 &&
      out(3L)._4 == "x y z a b c d e f g h i j k l q")
  }

  test("segment dedup: hot segment across half the corpus, no window op") {
    // one boilerplate segment shared by 50% of docs — the skew shape the
    // groupBy + min(struct) first-occurrence step exists for: a
    // row_number window partitioned by segment value would sort the
    // whole hot key on one task with no runtime mitigation
    val hotSeg = (1 to 8).map(i => s"h$i").mkString(" ")
    val docs = (1L to 40L).map { id =>
      if (id % 2 == 0)
        (id, hotSeg + " " + (1 to 8).map(i => s"u${id}_$i").mkString(" "))
      else (id, (1 to 8).map(i => s"v${id}_$i").mkString(" "))
    }.toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, segTokens = 8)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "first-occurrence step must not plan a value-partitioned window")
    // ...and the replacement really is a PARTIAL-aggregated min: the hot
    // key arrives at the reducer pre-reduced by every map task
    assert(plan.contains("partial_min"), plan)
    val m = out.as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // doc 2 is the lowest-(doc_id, pos) holder of the hot segment: intact
    assert(m(2L)._3 == 2 &&
      m(2L)._4.startsWith(hotSeg))
    // every later even doc loses exactly the hot segment
    (4L to 40L by 2).foreach { id =>
      assert(m(id)._2 == 2 && m(id)._3 == 1)
      assert(m(id)._4 == (1 to 8).map(i => s"u${id}_$i").mkString(" "))
    }
    // odd docs (unique segments) are untouched
    (1L to 39L by 2).foreach(id => assert(m(id)._3 == 1))
  }

  test("freq score: constant-token doc scores corpus count") {
    val docs = Seq((1L, "w w w"), (2L, "w rare")).toDF("doc_id", "text")
    val out = TextAnalysis.freqScore(docs)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // 'w' occurs 4× corpus-wide, 'rare' once
    assert(out(1L) == ((1L, 3L, 12L, 4L)))
    assert(out(2L) == ((2L, 2L, 5L, 2L)))
  }

  test("curation: gate drops short docs, dedup is case-insensitive, totals hold") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Same Text", "en", 200L),   // kept, dedup winner
      (2L, "sAME tEXT", "en", 200L),   // dropped: same lowercased digest
      (3L, "short", "de", 50L),        // dropped by the length gate
      (4L, "unique body", "fr", 399L)) // kept
      .toDF("doc_id", "text", "lang", "n_chars")
    val out = Curation.curate(docs).collect()
    assert(out.map(_.getLong(2)).sum == 2L)          // n_docs total
    assert(out.map(_.getLong(3)).sum == 1L + 4L)     // sum_id total
    assert(out.map(_.getString(1)).toSet == Set("en", "fr"))
  }

  test("per-group histogram quantiles: independent per group, matches global on one group") {
    import spark.implicits._
    // group a: values 0..99 (p50 bin = 5 with width 10); group b: all 7
    val df = ((0 until 100).map(i => ("a", i.toLong)) ++
      Seq.fill(10)(("b", 7L))).toDF("g", "v")
    val got = Sketches.histogramQuantilesBy(df, "g", "v", 10L, Seq(50, 99))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got(("a", 50L)) == ((4L, 40L))) // cum hits 50 at bin 4 (values 40-49)
    assert(got(("a", 99L)) == ((9L, 90L)))
    assert(got(("b", 50L)) == ((0L, 0L)))
    assert(got(("b", 99L)) == ((0L, 0L)))
    // a single-group frame reduces to the global sketch
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val global = Sketches.histogramQuantiles(docs, "n_chars", 64L,
      Seq(50, 90, 99)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val grouped = Sketches.histogramQuantilesBy(
      docs.withColumn("one", lit("x")), "one", "n_chars", 64L,
      Seq(50, 90, 99)).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(global == grouped)
  }

  test("quantile-threshold gate: kept set ≡ value ≥ per-group sketch " +
      "threshold; no window, threshold broadcast") {
    import spark.implicits._
    // group a: values 0..99, binWidth 10 → p75 answers bin 7 (cum hits
    // 75% at values 70-79), threshold 70 → keeps 70..99 (30 rows);
    // group b: constant 7 → threshold 0 → keeps all 10
    val df = ((0 until 100).map(i => ("a", i.toLong, i.toLong)) ++
      (100 until 110).map(i => ("b", i.toLong, 7L)))
      .toDF("g", "id", "v")
    val gate = Sketches.quantileThresholdGate(df, "g", "v", 10L, 75)
    val kept = gate.collect().map(r => r.getLong(1)).toSet
    assert(kept == ((70L until 100L) ++ (100L until 110L)).toSet)
    // the gate's plan is the scale contract: per-group thresholds
    // broadcast onto the stream, no WindowExec, no per-group sort
    val plan = gate.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "the sketch gate reintroduced a window:\n" + plan.take(600))
    assert(plan.contains("BroadcastHashJoin"),
      "the threshold side must broadcast:\n" + plan.take(600))
    // q out of range fails at construction
    intercept[IllegalArgumentException] {
      Sketches.quantileThresholdGate(df, "g", "v", 10L, 0)
    }
  }

  test("histogram bins FLOOR negatives; gate threshold snaps DOWN " +
      "(r14 review)") {
    import spark.implicits._
    // truncating div merged bin 0 into (-w, w) and made negative bins'
    // value_lo their UPPER edge — {-5,-5,-5,5} with w=10, q=25 then
    // gated on threshold 0 and kept only {5}; flooring answers bin -1,
    // value_lo -10 ≤ true quantile -5, and the gate keeps all rows
    val df = Seq(("a", 1L, -5L), ("a", 2L, -5L), ("a", 3L, -5L),
      ("a", 4L, 5L)).toDF("g", "id", "v")
    val qh = Sketches.histogramQuantiles(df, "v", 10L, Seq(25))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(qh(25L) == ((-1L, -10L)),
      s"negative values must land in floored bins: $qh")
    val kept = Sketches.quantileThresholdGate(df, "g", "v", 10L, 25)
      .collect().map(_.getLong(1)).toSet
    assert(kept == Set(1L, 2L, 3L, 4L),
      "gate threshold must sit BELOW the true quantile, incl. negatives")
    // NULL group: a group like any other — the equi join dropped it
    val dfn = Seq((null: String, 1L, 100L), (null: String, 2L, 200L),
      ("a", 3L, 5L)).toDF("g", "id", "v")
    val keptN = Sketches.quantileThresholdGate(dfn, "g", "v", 10L, 50)
      .collect().map(_.getLong(1)).toSet
    assert(keptN.contains(2L) && keptN.contains(3L),
      s"NULL group must gate against its own threshold: $keptN")
  }

  test("HLL: NULL keys carry no register, NULL groups survive, empty " +
      "input estimates 0 not NULL (r14 review)") {
    import spark.implicits._
    // NULL keys: estimate must track the 3 distinct non-null keys (a
    // phantom (NULL,NULL) register would shrink den and inflate it) and
    // agree with the all-non-null frame exactly
    val withNulls = Seq(Some("a"), Some("b"), Some("c"), None, None)
      .toDF("k")
    val noNulls = Seq("a", "b", "c").toDF("k")
    val estN = Sketches.hllDistinct(withNulls, "k").collect().head
    val est0 = Sketches.hllDistinct(noNulls, "k").collect().head
    assert(estN.getLong(0) == 3L)
    assert(estN.getLong(1) == est0.getLong(1),
      "NULL keys must not perturb the register file")
    // NULL group row survives the per-group estimate join
    val grouped = Seq((null: String, "x"), (null: String, "y"),
      ("g1", "x")).toDF("grp", "k")
    val byG = Sketches.hllDistinctBy(grouped, "k", "grp").collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(byG(None) == 2L && byG(Some("g1")) == 1L,
      s"NULL group must be reported: $byG")
    // empty input: documented absent-register convention, never NULL
    val empty = Seq.empty[String].toDF("k")
    val e = Sketches.hllDistinct(empty, "k").collect().head
    assert(!e.isNullAt(1) && e.getLong(1) > 0L,
      "empty input must estimate via the all-absent register file")
  }

  test("manifest: order-independent checksum detects any content change") {
    import spark.implicits._
    val a = Seq((1L, "abc", "s1"), (2L, "def", "s1"), (3L, "ghi", "s2"))
      .toDF("doc_id", "text", "source")
    val m = TextAnalysis.manifest(a).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(m("s1")._1 == 2L && m("s2")._1 == 1L)
    // row order does not move the checksum
    val shuffled = TextAnalysis.manifest(a.orderBy(desc("doc_id"))).collect()
      .map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(shuffled == m.map { case (k, v) => k -> v._5 })
    // one changed character does
    val b = Seq((1L, "abd", "s1"), (2L, "def", "s1"), (3L, "ghi", "s2"))
      .toDF("doc_id", "text", "source")
    val mb = TextAnalysis.manifest(b).collect()
      .map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(mb("s1") != m("s1")._5 && mb("s2") == m("s2")._5)
  }

  test("sequence packing: gapless prefix sum, bin math, partition-invariant") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val packed = Packing.packSequences(docs, capacity = 256L, nShards = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // sorted by global_start, each doc starts where the previous ended
    val sorted = packed.sortBy(_._3)
    assert(sorted.head._3 == 0L)
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(b._3 == a._3 + a._2,
        s"gap between ${a._1} and ${b._1}")
      case _ =>
    }
    // bin arithmetic consistent
    packed.foreach { case (_, _, start, bin, off) =>
      assert(bin == start / 256L && off == start % 256L)
    }
    // deterministic under a different input partitioning
    val re = Packing.packSequences(docs.repartition(13), capacity = 256L,
      nShards = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(re == packed.map(p => p._1 -> p._3).toMap)
  }

  test("count-min: estimate bounds exact, heavy hitter surfaces alone") {
    import spark.implicits._
    val items = (Seq.fill(100)("hot") ++ (1 to 50).map(i => s"cold$i"))
      .toDF("token")
    // 50% threshold: only the hot key (100 of 150 = 67%) qualifies
    val hh = Sketches.countMinHeavyHitters(items, sharePermille = 500)
      .collect()
    assert(hh.length == 1)
    val r = hh.head
    assert(r.getString(0) == "hot" && r.getLong(1) == 100L &&
      r.getLong(3) == 150L)
    // CM never underestimates; with 51 keys in 4×512 cells it is exact
    // unless a rare 4-row total collision occurs — allow the overestimate
    assert(r.getLong(2) >= 100L)
    // threshold 0 emits every key; est >= exact must hold for all
    val all = Sketches.countMinHeavyHitters(items, sharePermille = 0)
      .collect()
    assert(all.length == 51)
    assert(all.forall(x => x.getLong(2) >= x.getLong(1)))
  }
}
