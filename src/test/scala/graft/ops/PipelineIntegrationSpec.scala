package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end composition of the training-data operators — the shape a
  * real corpus build takes: near-dup pairs → components → keep-set →
  * deterministic split → contamination audit. Planted structure makes
  * every stage's contribution observable. */
class PipelineIntegrationSpec extends SparkSpec {
  import spark.implicits._

  test("dedup → split → contamination composes end to end") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).limit(200)
    // plant near-dups: one mutant per doc (first token dropped)
    val corpus = docs.union(docs.select(col("doc_id") + 1000000L,
      regexp_replace(col("text"), "^[^ ]* ", ""))).cache()
    val n = corpus.count()

    val pairs = Dedup.minhashDedupPairs(corpus)
    val comps = Dedup.components(pairs).cache()
    // every planted (i, i+1M) pair must share a component
    val planted = pairs.filter(col("doc_b") === col("doc_a") + 1000000L)
    assert(planted.count() >= 190, "planted mutants must be recalled")

    val drop = comps.filter(col("doc_id") =!= col("component"))
      .select(col("doc_id"))
    val kept = corpus.join(drop, Seq("doc_id"), "left_anti").cache()
    // keep-set: strictly smaller than the corpus, one canonical per
    // component survives
    assert(kept.count() < n)
    val survivors = kept.select("doc_id").as[Long].collect().toSet
    comps.select("component").distinct().as[Long].collect()
      .foreach(c => assert(survivors.contains(c),
        s"canonical doc $c must survive its own cluster"))

    // split the cleaned corpus, audit train→test leakage
    val split = kept.withColumn("split",
      TextAnalysis.splitAssign(col("doc_id")))
    val sizes = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.keySet.subsetOf(Set("train", "valid", "test")))
    assert(sizes.getOrElse("train", 0L) > sizes.getOrElse("test", 0L),
      s"80/10/10 buckets: $sizes")

    // contamination audit: plant one verbatim cross-split leak (a train
    // doc's text under a test id) and one clean gibberish doc — the audit
    // must score them 100% and 0% regardless of the corpus's natural
    // template overlap
    val aTrainText = split.filter(col("split") === "train")
      .select("text").head().getString(0)
    val planted2 = split.select("doc_id", "text", "split").union(
      Seq((5000000L, aTrainText, "test"),
        (5000001L, "qqa qqb qqc qqd qqe qqf", "test"))
        .toDF("doc_id", "text", "split"))
    val contam = Dedup.contamination(planted2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(contam(5000000L)._1 == contam(5000000L)._2,
      s"verbatim leak must be 100% contaminated: ${contam(5000000L)}")
    assert(contam(5000001L)._2 == 0L,
      s"gibberish doc must be clean: ${contam(5000001L)}")
  }

  test("curation chain: one DAG equals the stage-by-stage composition") {
    // The composed Curation.curationChain must produce EXACTLY what the
    // stages produce when each intermediate is materialized to parquet
    // and re-read (true lineage break) — pinning that the composition
    // adds no coupling (shared staging, barrier reuse, nondeterminism)
    // beyond the stages themselves.
    import java.nio.file.Files
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val evalDocs = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id"), col("text"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    val oneDag = rows(Curation.curationChain(docs, evalDocs,
      targetRows = 5000L))
    Stage.releaseAll(spark)

    val base = Files.createTempDirectory("graft_chain").toString
    def mat(df: org.apache.spark.sql.DataFrame, name: String) = {
      df.write.mode("overwrite").parquet(s"$base/$name")
      spark.read.parquet(s"$base/$name")
    }
    val gated = mat(TextAnalysis.gopherRules(docs, 20L, 100000L, "text",
        carry = Seq("source", "text"))
      .filter(col("gopher_pass"))
      .select(col("doc_id"), col("source"), col("text")), "gated")
    val deduped = mat(Dedup.firstPerDigest(
        gated.withColumn("_dig", sha2(lower(col("text")), 256)))
      .select(col("doc_id"), col("source"), col("text")), "deduped")
    val cmap = mat(Dedup.simhashCanonical(deduped), "cmap")
    Stage.releaseAll(spark)
    val canonical = mat(deduped.join(
      cmap.filter(col("doc_id") === col("canonical_id"))
        .select(col("doc_id")), Seq("doc_id"), "left_semi"), "canonical")
    val decon = mat(Dedup.decontaminateSegments(canonical, evalDocs, 8)
      .select(col("doc_id"), col("clean_text").as("text"))
      .join(canonical.select(col("doc_id"), col("source")),
        Seq("doc_id")), "decon")
    val train = mat(decon.join(
      Sampling.leakageSafeSplitsFrom(cmap)
        .filter(col("split") === "train").select(col("doc_id")),
      Seq("doc_id"), "left_semi"), "train")
    val mixed = mat(Sampling.temperatureMix(train, "source", "doc_id",
      0.5, 5000L), "mixed")
    val packed = Packing.packSequences(mixed, 2048L, 32)
    val staged = rows(TextAnalysis.manifest(mixed, "source")
      .join(packed.join(mixed.select(col("doc_id"), col("source")),
          Seq("doc_id"))
        .groupBy(col("source"))
        .agg(sum(col("n_tokens")).cast("long").as("n_tokens"),
          countDistinct(col("bin")).cast("long").as("n_bins")),
        Seq("source")))
    Stage.releaseAll(spark)
    assert(oneDag == staged,
      s"composed chain diverged from its stages:\nDAG=$oneDag\nSBS=$staged")
    assert(oneDag.nonEmpty && oneDag.exists(_._2 > 0L),
      "chain output must be non-vacuous")
  }

  test("landing pipeline re-run republishes identically, never appends") {
    // a RETRY of the whole landing job — same landing dir and published
    // store on disk, fresh session-scoped staging (Stage.releaseAll
    // evicts every SessionScoped memo, the new-session simulation) —
    // must converge to the same published bytes, not append duplicates
    def run(): (Set[(Long, String)], Long) = {
      val r = graft.queries.DedupSim.landingPipeline(spark, sf)
        .collect().map(x => (x.getLong(0), x.getString(1))).toSet
      (r, r.size.toLong)
    }
    def publishedState(): (Set[String], Long, Set[Long]) = {
      // the same tag derivation as landingPipeline's landing-path key
      val tag = sf.replaceAll("[^A-Za-z0-9._-]", "_") +
        f"-${sf.hashCode & 0xffffffffL}%08x"
      val pub = new java.io.File(s"/tmp/graft_landing/$tag.published")
      assert(pub.isDirectory, s"published store missing at $pub")
      // part-file names carry a fresh UUID per write; the layout identity
      // that must be stable is the (count, sizes) shape of the data files
      val files = pub.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(_.length.toString).sorted.mkString(",") match {
          case s => Set(s)
        }
      val rows = spark.read.parquet(pub.toString)
      (files, rows.count(),
        rows.select("doc_id").collect().map(_.getLong(0)).toSet)
    }
    val (audit1, n1) = run()
    val (files1, pubN1, pubIds1) = publishedState()
    assert(pubN1 > 0 && pubIds1.size.toLong == pubN1,
      "published store must hold unique docs")

    Stage.releaseAll(spark) // evict landing/publish memos: simulate retry
    val (audit2, n2) = run()
    val (files2, pubN2, pubIds2) = publishedState()

    assert(audit2 == audit1 && n2 == n1,
      "re-run must reproduce the audit relation exactly")
    assert(pubIds2 == pubIds1 && pubN2 == pubN1,
      s"re-publish must not append: $pubN1 -> $pubN2 rows")
    assert(files2 == files1,
      "atomic replace should yield the identical file set (name:size)")
  }
}
