package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** n-gram novelty, JL projection, FULL OUTER, and pivot semantics. */
class NoveltyProjSpec extends SparkSpec {
  import spark.implicits._

  test("ngramNovelty: shared bigrams counted once per doc, exact rates") {
    // A and B share exactly the bigram "x y"; C is fully novel;
    // D repeats its own bigram (distinct per doc -> counted once, novel)
    val docs = Seq(
      (1L, "x y a"),   // bigrams: "x y", "y a"
      (2L, "x y b"),   // bigrams: "x y", "y b"
      (3L, "c d"),     // bigram:  "c d"
      (4L, "e f e f")) // bigrams: "e f", "f e" (distinct set)
      .toDF("doc_id", "text")
    val r = Dedup.ngramNovelty(docs, n = 2).orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r(0) == ((1L, 2L, 1L, 500000L)))
    assert(r(1) == ((2L, 2L, 1L, 500000L)))
    assert(r(2) == ((3L, 1L, 0L, 1000000L)))
    assert(r(3) == ((4L, 2L, 0L, 1000000L)))
  }

  test("ngramNovelty: identical docs have zero novelty") {
    val docs = Seq((1L, "p q r"), (2L, "p q r")).toDF("doc_id", "text")
    val r = Dedup.ngramNovelty(docs, n = 2).collect()
      .map(x => (x.getLong(0), x.getLong(3))).toMap
    assert(r == Map(1L -> 0L, 2L -> 0L))
  }

  test("randomProjection: matches the HOF dot replay; deterministic") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet").limit(50)
    val r = Similarity.randomProjection(embs, kOut = 4)
    // replay with the declarative HOF fold (same order) per plane
    val planes = Similarity.hyperplanes(4, 64, seed = 123L)
    val replay = embs.select(col("vec_id") +:
      planes.zipWithIndex.map { case (p, i) =>
        round(Similarity.dotHof(Similarity.toDouble(col("embedding")),
          typedLit(p)) * 1e6, 0).cast("long").as(s"p$i")
      }: _*)
    assert(r.exceptAll(replay).count() == 0L &&
      replay.exceptAll(r).count() == 0L)
    assert(r.columns.toSeq == Seq("vec_id", "p0", "p1", "p2", "p3"))
  }

}
