package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25 / OOV-rate / Gopher-gate / dup-profile / cluster-stats checks on
  * hand-computable inputs. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25: rarer term outranks common term; tf breaks the tie up") {
    // "cat" appears in 1/4 docs, "dog" in 3/4 — doc 0 (has cat) must beat
    // the dog-only docs; doc 1 (dog dog) beats doc 2 (dog once, same dl)
    val docs = Seq(
      (0L, "cat dog aaa bbb"),
      (1L, "dog dog aaa bbb"),
      (2L, "dog aaa bbb ccc"),
      (3L, "aaa bbb ccc ddd")).toDF("doc_id", "text")
    val r = Retrieval.bm25(docs, Seq("cat", "dog"), k = 10)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.length == 3) // doc 3 hits no term
    assert(r.map(_._1).toSeq == Seq(0L, 1L, 2L),
      "expected rank cat-doc > dog-dog-doc > dog-doc: " + r.mkString(","))
    assert(r(0)._3 == 2L && r(1)._3 == 1L) // n_terms_hit
    // ordering column is (score desc): scores strictly decreasing
    assert(r.map(_._2).sliding(2).forall(p => p(0) > p(1)))
  }

  test("oovRate: NULL-text doc reports (0, 0, 0), never vanishes " +
      "(r14 review)") {
    val docs = Seq((1L, "aaa bbb aaa"), (2L, null: String))
      .toDF("doc_id", "text")
    val got = Retrieval.oovRate(docs, vocabSize = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    // vocab = {aaa}; doc 1: 3 tokens, 1 oov (bbb)
    assert(got(1L) == ((3L, 1L, 333333L)))
    assert(got.contains(2L),
      "the NULL-text doc must appear in the coverage report")
    assert(got(2L) == ((0L, 0L, 0L)))
  }

  test("knnQuantized rejects k > shortlist at construction (r14 review)") {
    val embs = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.knnQuantized(embs, nQueries = 1, k = 50, shortlist = 32)
    }
  }

  test("bm25: longer doc scores below shorter doc at equal tf") {
    val docs = Seq(
      (0L, "term aaa bbb"),
      (1L, "term aaa bbb ccc ddd eee fff ggg")).toDF("doc_id", "text")
    val r = Retrieval.bm25(docs, Seq("term"), k = 10)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(r.map(_._1).toSeq == Seq(0L, 1L))
    assert(r(0)._2 > r(1)._2)
  }

  test("hardNegatives: positives drop from the ranking, scores unchanged") {
    val docs = Seq(
      (0L, "cat dog aaa bbb"),
      (1L, "dog dog aaa bbb"),
      (2L, "dog aaa bbb ccc"),
      (3L, "aaa bbb ccc ddd")).toDF("doc_id", "text")
    val full = Retrieval.bm25(docs, Seq("cat", "dog"), k = 10)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    // exclude the top doc: the negatives are the remaining ranking, with
    // the SAME full-corpus scores (df must not be recomputed ex-positives)
    val negs = Retrieval.hardNegatives(docs, Seq("cat", "dog"),
      positives = Seq(0L), k = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(negs.map(_._1).toSeq == Seq(1L, 2L))
    negs.foreach { case (id, score) => assert(score == full(id)) }
    // k bound honored even when positives sit below the cut
    val k1 = Retrieval.hardNegatives(docs, Seq("cat", "dog"),
      positives = Seq(2L), k = 1).collect().map(_.getLong(0)).toSeq
    assert(k1 == Seq(0L))
  }

  test("ragIngest: full chunk coverage, deterministic content-keyed cells") {
    val text = ("spark join window agg " * 12).trim  // 87 chars → 2 chunks
    val df = Seq((1L, text), (2L, text), (3L, "tiny doc")).toDF("doc_id", "text")
    val r = Retrieval.ragIngest(df).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> ((x.getLong(2), x.getLong(3))))
      .toMap
    // every chunk of every doc present, cells in range
    assert(r.keySet.map(_._1) == Set(1L, 2L, 3L))
    assert(r.values.forall { case (c, _) => c >= 0 && c < 8 })
    // identical text → identical per-chunk assignment (content-keyed,
    // independent of doc id or row order)
    val chunks1 = r.collect { case ((1L, cid), v) => cid -> v }
    val chunks2 = r.collect { case ((2L, cid), v) => cid -> v }
    assert(chunks1.nonEmpty && chunks1 == chunks2)
    // repartitioned input yields the same assignment
    val r2 = Retrieval.ragIngest(df.repartition(7)).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> ((x.getLong(2), x.getLong(3))))
      .toMap
    assert(r2 == r)
  }

  test("oovRate: tokens outside the top-v vocab are counted") {
    // vocab of size 1 = {"aa"} (3 occurrences beats 2)
    val docs = Seq(
      (0L, "aa aa bb"),
      (1L, "aa bb zz")).toDF("doc_id", "text")
    val r = Retrieval.oovRate(docs, vocabSize = 1)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r(0) == ((0L, 3L, 1L, 333333L))) // bb OOV
    assert(r(1) == ((1L, 3L, 2L, 666666L))) // bb zz OOV
  }

  test("gopher rules: each signal fires and gates the conjunction") {
    val good = ("www " * 18 + "the of " + "word " * 5).trim // 25 toks
    val tooShort = "the of tiny"
    val symHeavy = ("wwww " * 16 + "the of " + "!!! " * 7).trim // 7 sym
    val docs = Seq((0L, good), (1L, tooShort), (2L, symHeavy))
      .toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs).orderBy("doc_id").collect()
    assert(r(0).getAs[Boolean]("gopher_pass"))
    assert(!r(1).getAs[Boolean]("gopher_pass")) // under minTokens
    assert(!r(2).getAs[Boolean]("gopher_pass")) // n_sym*10 > n_tokens
    assert(r(2).getAs[Long]("n_sym") == 7L)
    assert(r(0).getAs[Long]("n_stop") == 2L)
    assert(r(0).getAs[Long]("n_alpha") == 25L)
  }

  test("hybridSearch: BM25 shortlist gates; cosine reranks inside it") {
    // docs 1..3 contain the term; doc 9 doesn't — even with a perfect
    // cosine it must not appear. Embeddings: doc 2 aligns with the query
    // vector (id 0), doc 1 is orthogonal, doc 3 anti-aligned.
    val docs = Seq(
      (1L, "term aaa"), (2L, "term bbb"), (3L, "term ccc"),
      (9L, "zzz yyy")).toDF("doc_id", "text")
    val embs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(2.0f, 0.0f)), (3L, Seq(-1.0f, 0.0f)),
      (9L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = Retrieval.hybridSearch(docs, embs, Seq("term"),
        queryVecId = 0L, shortlist = 3, k = 3)
      .collect().map(x => (x.getLong(0), x.getDouble(2)))
    assert(r.map(_._1).toSeq == Seq(2L, 1L, 3L),
      "cosine rerank order wrong: " + r.mkString(","))
    assert(r(0)._2 == 1.0 && r(1)._2 == 0.0 && r(2)._2 == -1.0)
  }

  test("clusterCap: cap respected, ranks dense, matches window replay") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = Ivf.staticCentroids(4, 64)
    val cap = 3
    val r = Ivf.clusterCap(embs, cents, cap)
    val rows = r.collect().map(x => (x.getInt(0), x.getInt(1), x.getLong(2)))
    val byCluster = rows.groupBy(_._1)
    byCluster.foreach { case (c, xs) =>
      assert(xs.length <= cap, s"cluster $c over cap")
      assert(xs.map(_._2).sorted.toSeq == (1 to xs.length).toSeq,
        s"cluster $c ranks not dense")
    }
    // replay with the window form the DuckDB oracle uses
    import org.apache.spark.sql.expressions.Window
    val h = graft.functions.GraftFunctions.polyHash(
      concat(lit("cap:"), col("vec_id").cast("string")))
    val w = Window.partitionBy(col("cluster")).orderBy(h, col("vec_id"))
    val replay = Ivf.assign(embs, cents)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
      .select(col("cluster"), col("rk").cast("int").as("rk"),
        col("vec_id"))
    assert(r.exceptAll(replay).count() == 0L &&
      replay.exceptAll(r).count() == 0L)
  }

  test("dupProfile: histogram of component sizes") {
    // components: {1,2}, {3,4}, {5,6,7} → two 2-clusters, one 3-cluster
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L),
      (5L, 5L), (6L, 5L), (7L, 5L)).toDF("doc_id", "component")
    val r = Dedup.dupProfile(labels).orderBy("cluster_size").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((2L, 2L, 4L), (3L, 1L, 3L)))
  }

  test("profile: nulls, exact distinct, lexicographic min/max per column") {
    val df = Seq(
      (1L, Some("b"), 10L), (2L, Some("a"), 10L),
      (3L, None, 20L), (4L, Some("a"), 30L))
      .toDF("id", "tag", "n")
    val r = Profile.profile(df, Seq("id" -> col("id"),
        "tag" -> col("tag"), "n" -> col("n")))
      .orderBy("col_name").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getString(4), x.getString(5)))
    assert(r(0) == (("id", 4L, 0L, 4L, "1", "4")))
    assert(r(1) == (("n", 4L, 0L, 3L, "10", "30"))) // lexicographic max
    assert(r(2) == (("tag", 4L, 1L, 2L, "a", "b")))
  }

  test("profile of an EMPTY table keeps one zero row per column") {
    // the drift-diff use case: a stage that empties the table must show
    // n_rows collapsing to 0, not the profiled columns vanishing
    val df = Seq((1L, "x")).toDF("id", "tag").filter(col("id") < 0)
    val r = Profile.profile(df, Seq("id" -> col("id"), "tag" -> col("tag")))
      .orderBy("col_name").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.isNullAt(4), x.isNullAt(5)))
    assert(r.toSeq == Seq(("id", 0L, 0L, 0L, true, true),
      ("tag", 0L, 0L, 0L, true, true)), r.mkString(","))
  }

  test("clusterStats: counts cover the corpus; distances are sane") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = Ivf.staticCentroids(4, 64)
    val r = Ivf.clusterStats(embs, cents)
    val rows = r.collect()
    assert(rows.map(_.getLong(1)).sum == embs.count())
    rows.foreach { x =>
      assert(x.getLong(2) <= x.getLong(3)) // min ≤ max
      assert(x.getLong(2) >= 0L)
    }
    // stats are consistent with assign(): per-cluster counts agree
    val viaAssign = Ivf.assign(embs, cents).groupBy("cluster").count()
      .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    rows.foreach(x => assert(viaAssign(x.getInt(0)) == x.getLong(1)))
  }
}
