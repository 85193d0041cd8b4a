package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  lazy val embs = spark.read.parquet(s"$sf/embeddings.parquet")

  test("cosine matches a driver-side computation") {
    val rows = embs.limit(20).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    val got = Similarity.knnBrute(embs.limit(20), nQueries = 1, k = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val q = rows.find(_._1 == 0L).get._2
    val expected = rows.filter(_._1 != 0L)
      .map { case (id, v) => id -> cos(q, v) }
      .sortBy { case (id, s) => (-s, id) }.take(3).toMap
    expected.foreach { case (id, s) =>
      assert(got.contains(id), s"neighbor $id missing")
      assert(math.abs(got(id) - s) < 1e-6)
    }
  }

  test("native vec_dot is bit-identical to the higher-order-function fold") {
    val both = embs.limit(200)
      .select(Similarity.toDouble(col("embedding")).as("v"))
      .select(Similarity.dot(col("v"), col("v")).as("native"),
        Similarity.dotHof(col("v"), col("v")).as("hof"))
    // bit-exact, not approximate: same left-to-right double accumulation
    assert(both.filter(col("native") =!= col("hof")).isEmpty,
      "native kernel diverged from declarative fold")
    // and alone it must run inside whole-stage codegen, not fall back
    // (the combined plan above can't: the HOF fold is CodegenFallback —
    // which is exactly why the native kernel exists)
    val nativeOnly = embs.limit(200)
      .select(Similarity.toDouble(col("embedding")).as("v"))
      .select(Similarity.dot(col("v"), col("v")).as("native"))
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen span
    val plan = nativeOnly.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("vec_dot") && l.contains("*(")), plan.take(400))
  }

  test("LSH recalls identical vectors at rank 1") {
    // plant an exact duplicate of vec 0 and make sure LSH finds it
    val dup = embs.filter(col("vec_id") === 0)
      .select((col("vec_id") + 5000L).as("vec_id"), col("embedding"))
    val corpus = embs.select("vec_id", "embedding").union(dup)
    val got = Similarity.knnLsh(corpus, nQueries = 1, k = 5)
      .filter(col("query_id") === 0).collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.nonEmpty, "no LSH candidates for query 0")
    val top = got.find(_._2 == 1).get
    assert(top._1 == 5000L && math.abs(top._3 - 1.0) < 1e-9,
      s"expected planted duplicate at rank 1, got $top")
  }

  test("embedding near-dup pairs find planted near-duplicates only") {
    val mutant = embs.limit(50)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x * 1.2f).otherwise(x)).as("embedding"))
    val corpus = embs.limit(50).select("vec_id", "embedding").union(mutant)
    val pairs = Similarity.nearDupPairs(corpus, minCosine = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 50L).map(i => (i, i + 1000000L)).toSet
    assert(expected.subsetOf(pairs),
      s"missing ${(expected -- pairs).take(5)}")
    // isotropic noise vectors must NOT appear as near-dups of each other
    assert(pairs.forall { case (a, b) => b - a == 1000000L })
  }

  test("quantized-scan ANN recalls a planted duplicate at rank 1") {
    val dup = embs.filter(col("vec_id") === 0)
      .select(lit(5000L).as("vec_id"), col("embedding"))
    val corpus = embs.select("vec_id", "embedding").union(dup)
    val got = Similarity.knnQuantized(corpus, nQueries = 1, k = 5)
      .filter(col("query_id") === 0).collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.length == 5)
    val top = got.find(_._2 == 1).get
    assert(top._1 == 5000L && math.abs(top._3 - 1.0) < 1e-9,
      s"expected planted duplicate at rank 1, got $top")
    // int8 shortlist should agree with brute force on most top-1 picks
    val brute = Similarity.knnBrute(embs.limit(200), nQueries = 5, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sq8 = Similarity.knnQuantized(embs.limit(200), nQueries = 5, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = brute.keys.count(q => brute(q) == sq8(q))
    assert(agree >= 4, s"sq8 top-1 agreed with brute on only $agree/5")
  }

  test("int8 quantization: endpoints, constant vectors, code bounds") {
    val df = Seq(
      (1L, Seq(0.0f, 1.0f, 0.5f)),
      (2L, Seq(2.0f, 2.0f, 2.0f)),   // max == min → all zeros
      (3L, Seq(-1.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.quantizeInt8(df).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getString(2), x.getLong(3)))
      .toMap
    assert(r(1L) == ((3L, "0,255,127", 382L)))
    assert(r(2L) == ((3L, "0,0,0", 0L)))
    assert(r(3L) == ((3L, "0,127,255", 382L)))
    // on real vectors: every code in [0, 255], min always present as 0
    val real = Similarity.quantizeInt8(embs.limit(50))
      .select(col("codes_csv")).collect().map(_.getString(0))
    assert(real.forall(_.split(",").map(_.toLong).forall(c =>
      c >= 0L && c <= 255L)))
    assert(real.forall(_.split(",").map(_.toLong).min == 0L))
  }

  test("semantic dedup drops co-clustered near-duplicates, keeps noise") {
    val mutant = embs.limit(50)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x * 1.2f).otherwise(x)).as("embedding"))
    val corpus = embs.limit(50).select("vec_id", "embedding").union(mutant)
    val r = Similarity.semanticDedup(corpus,
        Ivf.staticCentroids(nlist = 4, dim = 64), minCosine = 0.9)
      .collect().map(x => x.getLong(0) -> (x.getInt(1), x.getBoolean(2)))
      .toMap
    assert(r.size == 100)
    // every original survives (it is the smallest id in any dup group)
    assert((0L until 50L).forall(r(_)._2), "an original was dropped")
    val clusters = r.map { case (id, (c, _)) => id -> c }
    // a mutant is dropped IFF it landed in its source's cluster — the
    // cluster-blocking semantics, exactly
    (0L until 50L).foreach { i =>
      val sameCell = clusters(i) == clusters(i + 1000000L)
      assert(r(i + 1000000L)._2 == !sameCell,
        s"mutant of $i: sameCell=$sameCell kept=${r(i + 1000000L)._2}")
    }
    // and the blocking is effective: most mutants do co-cluster
    assert((0L until 50L).count(i =>
      clusters(i) == clusters(i + 1000000L)) >= 40)
  }

  test("semantic dedup hot-cell guard fails loudly, not quadratically") {
    val corpus = embs.limit(60).select("vec_id", "embedding")
    // a 1-centroid quantizer lands every vector in one cell — the
    // degenerate-quantizer shape the guard exists for
    val one = Ivf.staticCentroids(nlist = 1, dim = 64)
    val e = intercept[Throwable] {
      Similarity.semanticDedup(corpus, one, minCosine = 0.9, maxCell = 50)
        .collect()
    }
    val messages = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(messages.contains("maxCell"),
      s"expected the hot-cell guard message, got: $messages")
    // the same degenerate cell under a sufficient bound still computes
    val ok = Similarity.semanticDedup(corpus, one, minCosine = 0.9,
      maxCell = 60).collect()
    assert(ok.length == 60)
    graft.ops.Stage.releaseAll(spark)
  }

  test("semantic dedup cell census plans no value-partitioned window") {
    // the guard exists for the degenerate hot cell — a count() OVER
    // (PARTITION BY cluster) would serialize that cell into one
    // WindowExec task BEFORE raise_error fires; the census must stay a
    // partial-aggregated groupBy joined back by broadcast
    val corpus = embs.limit(40).select("vec_id", "embedding")
    val cents = Ivf.staticCentroids(nlist = 4, dim = 64)
    val plan = Similarity.semanticDedup(corpus, cents, minCosine = 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "cell accounting must stay a partial-aggregated groupBy:\n" +
        plan.take(600))
    assert(plan.contains("BroadcastHashJoin"),
      "the cell census must attach via a broadcast join:\n" +
        plan.take(600))
    graft.ops.Stage.releaseAll(spark)
  }
}
