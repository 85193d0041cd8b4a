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
