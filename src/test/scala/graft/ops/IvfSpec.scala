package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfSpec extends SparkSpec {

  lazy val embs = spark.read.parquet(s"$sf/embeddings.parquet")

  test("centroid training: nlist centroids, refinement changes seeds") {
    val cs = Ivf.trainCentroids(embs, nlist = 8, iters = 1)
    assert(cs.map(_._1) == (0 until 8))
    assert(cs.forall(_._2.length == 64))
    val seeds = Ivf.trainCentroids(embs, nlist = 8, iters = 0)
    assert(cs != seeds) // the Lloyd step moved at least one centroid
  }

  test("assignment is the argmin list and covers every vector") {
    val cs = Ivf.trainCentroids(embs, nlist = 8, iters = 1)
    val assigned = Ivf.assign(embs, cs)
    assert(assigned.count() == embs.count())
    val clusters = assigned.select("cluster").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(clusters.subsetOf((0 until 8).toSet))
  }

  test("IVF finds a planted duplicate at rank 1 (same list, any nprobe)") {
    val dup = embs.filter(col("vec_id") === 0)
      .select((col("vec_id") + 5000L).as("vec_id"), col("embedding"))
    val corpus = embs.select("vec_id", "embedding").union(dup)
    val got = Ivf.knnIvf(corpus, nQueries = 1, k = 5, nlist = 8, nprobe = 2)
      .filter(col("query_id") === 0 && col("rank") === 1).collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 5000L &&
      math.abs(got(0).getDouble(3) - 1.0) < 1e-9)
  }

  test("centroid training is partition-invariant (fixed-point means)") {
    // the Lloyd mean is a scaled-integer sum, so the trained centroids
    // are bit-identical regardless of how the corpus is partitioned — a
    // float avg() merges partials in task-completion order and can
    // drift in the last ulp, flipping a boundary vector's list
    val a = Ivf.trainCentroids(embs, nlist = 8, iters = 2)
    val b = Ivf.trainCentroids(embs.repartition(7), nlist = 8, iters = 2)
    assert(a == b, "centroids differ across partitionings")
  }

  test("clusterCap accepts a non-long id column (casts for TopKAgg)") {
    val intIds = embs.select(col("vec_id").cast("int").as("vec_id"),
      col("embedding"))
    val cs = Ivf.staticCentroids(nlist = 4, dim = 64)
    val got = Ivf.clusterCap(intIds, cs, cap = 2).collect()
    assert(got.nonEmpty && got.forall(_.getInt(1) <= 2))
  }

  test("static-quantizer IVF also recalls a planted duplicate at rank 1") {
    val dup = embs.filter(col("vec_id") === 0)
      .select((col("vec_id") + 5000L).as("vec_id"), col("embedding"))
    val corpus = embs.select("vec_id", "embedding").union(dup)
    val got = Ivf.knnIvfStatic(corpus, nQueries = 1, k = 5)
      .filter(col("query_id") === 0 && col("rank") === 1).collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 5000L &&
      math.abs(got(0).getDouble(3) - 1.0) < 1e-9)
  }

  test("CentroidArgmin kernel is BIT-identical to the literal argmin") {
    // the kernel replaced the literal rendering in assign/clusterStats
    // (r16) — same dot fold, operation order, and nan-safe (d, id)
    // tie-break; this pins d down to the raw bits, not a tolerance
    val cents = Ivf.staticCentroids(nlist = 16, dim = 64)
    val base = embs.select(col("vec_id"),
      Similarity.toDouble(col("embedding")).as("vec"))
    val literalBest = array_min(array(cents.map { case (id, c) =>
      struct((Similarity.dot(col("vec"), typedLit(c)) * -2.0d +
        lit(c.map(x => x * x).sum)).as("d"), lit(id).as("id"))
    }: _*))
    val both = base.select(col("vec_id"),
      graft.functions.GraftFunctions.centroidArgmin(col("vec"), cents)
        .as("k"),
      literalBest.as("l"))
      .select(col("vec_id"), col("k.d").as("kd"), col("k.id").as("kid"),
        col("l.d").as("ld"), col("l.id").as("lid"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)),
        s"vec ${r.getLong(0)}: kernel d bits diverged")
      assert(r.getInt(2) == r.getInt(4),
        s"vec ${r.getLong(0)}: kernel picked a different list")
    }
  }

  test("assignment stays codegen'd at nlist 1024 (no literal blowup)") {
    // the literal form at production nlist would blow the expression
    // tree (nlist × dim inlined literals — analysis chokes, codegen
    // falls back); the kernel must keep the stage fused at any nlist
    val cents = Ivf.staticCentroids(nlist = 1024, dim = 64)
    val assigned = Ivf.assign(embs, cents)
    val plan = assigned.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen
    // span; centroid_argmin must sit inside one
    assert(plan.linesIterator.exists(l =>
      l.contains("centroid_argmin") && l.contains("*(")), plan.take(600))
    // and the whole thing actually runs: every vector lands in a list
    assert(assigned.count() == embs.count())
  }

  test("persisted IVF index: build + append + stamped probe equals the " +
      "one-shot static plan, and the probe is bucket-pruned") {
    // the vector store lifecycle (r20): build from the even ids, append
    // the odd half under the STAMP-derived quantizer, probe — rows must
    // be identical to knnIvfStatic over the full corpus (the oracle
    // q_knn_ivf_prod shares verbatim), which certifies the append path
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfidx")
      .toString
    try {
      Ivf.buildIvfIndex(embs.filter(col("vec_id") % 2 === 0),
        "ivf_idx_spec", s"$dir/t")
      Ivf.appendIvfIndex(embs.filter(col("vec_id") % 2 =!= 0),
        "ivf_idx_spec")
      assert(Ivf.ivfStamp(spark, "ivf_idx_spec") == ((16, 64, 77L)))
      val queries = embs.filter(col("vec_id") < 10)
      val got = Ivf.knnIvfFrom(spark, "ivf_idx_spec", queries, k = 5)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getDouble(3))).toSet
      assert(rows(got) ==
        rows(Ivf.knnIvfStatic(embs, nQueries = 10, k = 5)),
        "persisted lifecycle diverged from the one-shot static plan")
      // plan shape: the probe side is broadcast (zero corpus-side
      // exchange), and for a probe that cannot cover every bucket —
      // 2 queries × 4 probes = ≤ 8 distinct lists over 16 buckets —
      // the corpus side is the bucket-pruned FILE read, not the
      // catalog (the feature's point; a catalog-routed regression
      // would still return correct rows, so the plan is the only
      // witness — review r20)
      val plan = got.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan.take(800))
      val narrow = Ivf.knnIvfFrom(spark, "ivf_idx_spec",
        embs.filter(col("vec_id") < 2), k = 5)
      val narrowPlan = narrow.queryExecution.executedPlan.toString
      assert(!narrowPlan.contains("default.ivf_idx_spec"),
        "a non-covering probe must read pruned bucket files, not the " +
          s"catalog: ${narrowPlan.take(600)}")
      assert(rows(narrow) ==
        rows(Ivf.knnIvfStatic(embs, nQueries = 2, k = 5)),
        "pruned narrow probe diverged from the one-shot static plan")
      // the store is maintainable by the shared machinery: stats see
      // the appended second file per bucket, compaction collapses it
      val stats0 = graft.sources.PartitionedStore
        .storeStats(spark, "ivf_idx_spec")
      assert(stats0.filesPerBucketMax >= 2L, stats0.toString)
      graft.sources.PartitionedStore.compactBucketed(spark, "ivf_idx_spec")
      assert(rows(Ivf.knnIvfFrom(spark, "ivf_idx_spec", queries, k = 5))
        == rows(got), "compaction changed probe results")
    } finally spark.sql("DROP TABLE IF EXISTS ivf_idx_spec")
  }

  test("persisted IVF index: a dim-mismatched increment fails loudly, " +
      "never lands as null-cluster rows") {
    // review r20: the argmin returns NULL for a vector whose length
    // differs from the quantizer's dim — without the guard a
    // wrong-embedding-model increment would append rows no probe can
    // ever find (silent recall collapse). The guard raises on the
    // first offending row, inside the write's own scan.
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfdim")
      .toString
    try {
      Ivf.buildIvfIndex(embs.filter(col("vec_id") % 2 === 0),
        "ivf_dim_spec", s"$dir/t")
      val wrongDim = embs.filter(col("vec_id") % 2 =!= 0)
        .select(col("vec_id"), slice(col("embedding"), 1, 32)
          .as("embedding"))
      val e = intercept[Exception] {
        Ivf.appendIvfIndex(wrongDim, "ivf_dim_spec")
      }
      def chain(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(16)
          .flatMap(c => Option(c.getMessage)).toSeq
      assert(chain(e).exists(_.contains("quantizer dim")),
        s"must name the dim mismatch: ${chain(e).take(3)}")
      // and the store is unchanged: only the even-id build rows
      assert(spark.table("ivf_dim_spec").count() ==
        embs.filter(col("vec_id") % 2 === 0).count())
    } finally spark.sql("DROP TABLE IF EXISTS ivf_dim_spec")
  }

  test("persisted IVF index: a store without the stamp fails loudly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfns")
      .toString
    try {
      // a bucketed table that LOOKS like an index but carries no stamp
      graft.sources.PartitionedStore.writeBucketed(
        Seq((0, 1L, Seq(1.0d))).toDF("cluster", "vec_id", "vec"),
        "ivf_nostamp", s"$dir/t", Seq("cluster"), 4, Seq("cluster"))
      val e = intercept[IllegalStateException] {
        Ivf.knnIvfFrom(spark, "ivf_nostamp",
          embs.filter(col("vec_id") < 2), k = 1)
      }
      assert(e.getMessage.contains("graft.ivf.nlist"), e.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS ivf_nostamp")
  }
}
