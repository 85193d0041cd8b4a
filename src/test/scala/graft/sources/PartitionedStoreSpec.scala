package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PartitionedStoreSpec extends SparkSpec {

  test("partitioned write prunes directories at planning time") {
    val dir = Files.createTempDirectory("graft_part").toString
    val events = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
    PartitionedStore.writePartitioned(events, dir, Seq("l_returnflag"))

    val back = PartitionedStore.readPartitioned(spark, dir)
      .filter(col("l_returnflag") === "R")
    // row parity with the unpartitioned source... (executing THIS plan
    // instance, so its scan metrics are the ones populated)
    val qe = back.queryExecution
    val want = events.filter(col("l_returnflag") === "R").count()
    assert(want > 0 && qe.executedPlan.execute().count() == want)
    // ...and the executed scan only TOUCHED the R directory:
    // planning-time pruning, not a read-then-filter — inputFiles would
    // list all three dirs because it reflects the unpruned file index
    val scan = qe.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.get
    assert(scan.metadata("PartitionFilters").contains("l_returnflag"),
      scan.metadata("PartitionFilters"))
    assert(scan.metrics("numFiles").value == 1,
      s"read ${scan.metrics("numFiles").value} files, wanted 1")
  }

  test("bucketed corpus digest table: only the batch side shuffles") {
    import spark.implicits._
    val corpus = (1L to 500L)
      .map(i => (i, f"digest_$i%04d")).toDF("doc_id", "digest")
    PartitionedStore.writeBucketed(corpus, "bkt_digests",
      "/tmp/graft_bspec/digests", "digest", 8, Nil)
    val batch = Seq((9001L, "digest_0007"), (9002L, "fresh_a"),
      (9003L, "fresh_b")).toDF("doc_id", "_dig")
    // at test scale the planner would (rightly) broadcast the toy corpus;
    // disable auto-broadcast to observe the at-scale plan, where the
    // corpus is terabytes and only the batch can move
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val kept = PartitionedStore.antiJoinBucketed(spark, batch,
        "bkt_digests")
      // one exchange — the small batch moving onto the corpus layout; the
      // corpus scan itself reads its buckets in place. (String-matched:
      // `collect` does not descend into AdaptiveSparkPlanExec's wrapped
      // plan, so a node-class collect is vacuous under AQE.)
      assert(nShuffles(kept) == 1,
        kept.queryExecution.executedPlan.toString)
      assert(kept.queryExecution.executedPlan.toString
        .contains("Bucketed: true"), "corpus scan must read its buckets")
      assert(kept.select(col("doc_id")).as[Long].collect().sorted.toSeq ==
        Seq(9002L, 9003L))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS bkt_digests")
    }
  }

  test("compaction merges small files with audited row parity") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_compact").toString
    val path = s"$base/data"
    val df = (1L to 400L).map(i => (i, s"row_$i")).toDF("id", "v")
    df.repartition(40).write.parquet(path)
    def partFiles = new java.io.File(path).listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(partFiles == 40)

    val rows = PartitionedStore.compact(spark, path,
      targetBytesPerFile = 1L << 30)
    assert(rows == 400L)
    assert(partFiles == 1, s"got $partFiles files after compaction")
    val back = spark.read.parquet(path)
    assert(back.count() == 400L)
    assert(back.agg(sum(col("id"))).head.getLong(0) == 400L * 401L / 2)
    // the retired originals are gone, not lingering as a shadow copy
    assert(!new java.io.File(s"$path.old").exists())
  }

  test("compact refuses a bucketed layout instead of destroying it") {
    import spark.implicits._
    // a bucketed table's directory passes the partition-dir guard (flat
    // layout) but its files encode bucket ids; a flat rewrite would
    // pass the row-count audit while silently scrambling every later
    // "exchange-free" join — compact must refuse and point at
    // compactBucketed (VERDICT r17 #7)
    val base = Files.createTempDirectory("graft_cbkt_refuse").toString
    val df = (1L to 100L).map(i => (i, s"v_$i")).toDF("id", "v")
    try {
      PartitionedStore.writeBucketed(df, "bkt_refuse", s"$base/t",
        "id", 4, Seq("id"))
      val e = intercept[IllegalArgumentException] {
        PartitionedStore.compact(spark, s"$base/t")
      }
      assert(e.getMessage.contains("compactBucketed"), e.getMessage)
      // and the data is untouched
      assert(spark.table("bkt_refuse").count() == 100L)
    } finally spark.sql("DROP TABLE IF EXISTS bkt_refuse")
  }

  test("compactBucketed: appended buckets merge to one file each, " +
      "layout + stamps + rows survive") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_cbkt").toString
    val path = s"$base/t"
    val mk = (r: Range) => r.map(i => (i.toLong, s"v_$i")).toDF("id", "v")
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      PartitionedStore.writeBucketed(mk(1 to 200), "bkt_cpt", path,
        "id", 4, Seq("id"))
      spark.sql("ALTER TABLE bkt_cpt SET TBLPROPERTIES(" +
        "'graft.test.stamp'='keepme')")
      // 8 increments — files-per-bucket grows one per append
      (1 to 8).foreach { a =>
        PartitionedStore.appendBucketed(mk(200 * a + 1 to 200 * (a + 1)),
          "bkt_cpt")
      }
      def files = new java.io.File(path).listFiles()
        .count(_.getName.startsWith("part-"))
      // ≥ one file per (write, bucket-with-rows); exact count depends on
      // how many tasks each local write ran — the claim under test is
      // only that appends GROW the file set and compaction collapses it
      assert(files >= 9, s"expected at least one file per write, got $files")
      val before = spark.table("bkt_cpt").as[(Long, String)].collect().toSet

      val rows = PartitionedStore.compactBucketed(spark, "bkt_cpt")
      assert(rows == 1800L)
      assert(files == 4, s"expected one file per bucket, got $files")
      // rows identical, stamp survived (catalog entry never touched)
      assert(spark.table("bkt_cpt").as[(Long, String)].collect().toSet
        == before)
      val props = spark.sql("SHOW TBLPROPERTIES bkt_cpt").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("graft.test.stamp").contains("keepme"), props)
      // and the compacted table still joins exchange-free on its bucket
      // column — the layout genuinely survived, not just the file count
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = Seq((5L, "x")).toDF("id", "p")
        .join(spark.table("bkt_cpt"), Seq("id"))
      assert(nShuffles(probe) == 1,
        probe.queryExecution.executedPlan.toString)
      assert(probe.queryExecution.executedPlan.toString
        .contains("Bucketed: true"), "compacted table must read buckets")
      // no shadow copies linger
      assert(!new java.io.File(s"$path.old").exists())
      assert(!new java.io.File(s"$path.compacted").exists())

      // dedupRows reclaims a blindly RETRIED append's duplicate rows
      PartitionedStore.appendBucketed(mk(2001 to 2100), "bkt_cpt")
      PartitionedStore.appendBucketed(mk(2001 to 2100), "bkt_cpt") // retry
      assert(spark.table("bkt_cpt").count() == 2000L)
      val deduped = PartitionedStore.compactBucketed(spark, "bkt_cpt",
        dedupRows = true)
      assert(deduped == 1900L && spark.table("bkt_cpt").count() == 1900L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS bkt_cpt")
    }
  }

  test("bucketIdOf matches the written bucket layout; prunedBucketScan " +
      "reads exactly the candidate buckets' rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bidof")
      .toString
    try {
      // one string-keyed and one long-keyed table — the two key types
      // the near-dup index pair uses
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"),
          concat(lit("k_"), col("doc_id")).as("skey"))
      PartitionedStore.writeBucketed(docs, "bid_s", s"$dir/s",
        Seq("skey"), 8, Seq("skey"))
      PartitionedStore.writeBucketed(docs, "bid_l", s"$dir/l",
        Seq("doc_id"), 8, Seq("doc_id"))
      // parity: every row of every bucket FILE hashes back to that
      // file's encoded bucket id — the driver-side formula and the
      // write's HashPartitioning cannot drift
      val bucketOf = """part-\d+-.*_(\d{5})""".r.unanchored
      for ((sub, colName, dt) <- Seq(
          ("s", "skey", org.apache.spark.sql.types.StringType),
          ("l", "doc_id", org.apache.spark.sql.types.LongType))) {
        val files = new java.io.File(s"$dir/$sub").listFiles()
          .filter(f => f.getName.startsWith("part-"))
        assert(files.nonEmpty)
        for (f <- files) {
          val b = f.getName match { case bucketOf(x) => x.toInt }
          val vals = spark.read.parquet(f.getPath)
            .select(col(colName)).collect().map(_.get(0))
          assert(vals.forall { v =>
            val internal = v match {
              case s0: String =>
                org.apache.spark.unsafe.types.UTF8String.fromString(s0)
              case x => x
            }
            PartitionedStore.bucketIdOf(internal, dt, 8) == b
          }, s"rows in bucket file $b of $sub hash elsewhere")
        }
      }
      // file-subset scan with FEW keys (wanted buckets < nBuckets, so
      // the pruned path — not the all-buckets catalog fallback — is
      // exercised): key-exact rows for both key types, and the plan is
      // a path read, not a catalog bucketed scan
      val someKeys = (0L until 3L).map(i => s"k_$i")
      val prunedS = PartitionedStore.prunedBucketScan(spark, "bid_s",
        someKeys)
      assert(!prunedS.queryExecution.executedPlan.toString
        .contains("Bucketed: true"),
        "few-key scan must path-read its file subset")
      val got = prunedS.collect().map(_.getLong(0)).toSet
      val want = spark.table("bid_s")
        .filter(col("skey").isin(someKeys: _*))
        .collect().map(_.getLong(0)).toSet
      assert(got == want && want.nonEmpty)
      val gotL = PartitionedStore
        .prunedBucketScan(spark, "bid_l", (0L until 3L).map(Long.box))
        .collect().map(_.getLong(0)).toSet
      assert(gotL == (0L until 3L).toSet)
      // a key set touching every bucket degrades to the catalog's
      // in-place read with NO key filter (superset; joins re-apply
      // the equality) — never a per-file listing that prunes nothing
      val full = PartitionedStore.prunedBucketScan(spark, "bid_s",
        (0L until 200L).map(i => s"k_$i"))
      val fullPlan = full.queryExecution.executedPlan.toString
      assert(fullPlan.contains("default.bid_s") &&
        fullPlan.contains("InMemoryFileIndex(1 paths)"),
        s"all-buckets probe must fall back to the one-path catalog " +
          s"scan, not a per-file listing:\n$fullPlan")
      assert(full.count() == spark.table("bid_s").count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS bid_s")
      spark.sql("DROP TABLE IF EXISTS bid_l")
    }
  }

  test("writeBucketed rejects a multi-column bucket spec at write time") {
    import spark.implicits._
    // the store-layer invariant (VERDICT r19 #5): graft stores bucket
    // on exactly ONE (possibly fused) key column, so every store stays
    // probe-able by bucketIdOf/prunedBucketScan. Enforced at write
    // time — an unprobe-able layout can never be created and then
    // discovered at read time.
    val df = Seq((1L, 2L, "v")).toDF("a", "b", "v")
    val e = intercept[IllegalArgumentException] {
      PartitionedStore.writeBucketed(df, "bkt_multi",
        "/tmp/graft_bspec/multi", Seq("a", "b"), 4, Nil)
    }
    assert(e.getMessage.contains("fuse"), e.getMessage)
    assert(!spark.catalog.tableExists("bkt_multi"))
  }

  test("compactBucketed still compacts a pre-invariant composite-key " +
      "table") {
    import spark.implicits._
    // the single-column invariant gates what writeBucketed can CREATE;
    // a composite-key table already on disk (pre-invariant, or a
    // foreign writer straight into the catalog) must remain
    // compactable — refusing would strand its append backlog forever
    // and abort a maintenance sweep mid-loop (review r20). It still
    // fails loudly at PROBE time, where the layout actually matters.
    val dir = java.nio.file.Files.createTempDirectory("graft_comp2")
      .toString
    val df = (0L until 32L).map(i => (i % 4, i % 8, i)).toDF("a", "b", "v")
    try {
      df.repartition(2).write.mode("overwrite").format("parquet")
        .option("path", s"$dir/t").bucketBy(4, "a", "b")
        .saveAsTable("bkt_comp2")
      df.write.mode("append").format("parquet")
        .bucketBy(4, "a", "b").saveAsTable("bkt_comp2")
      val rows = PartitionedStore.compactBucketed(spark, "bkt_comp2")
      assert(rows == 64L, s"expected both writes' rows, got $rows")
      assert(spark.table("bkt_comp2").count() == 64L)
      intercept[IllegalArgumentException] {
        PartitionedStore.prunedBucketScan(spark, "bkt_comp2", Seq(1L))
      }
    } finally spark.sql("DROP TABLE IF EXISTS bkt_comp2")
  }

  test("prunedBucketScan degrades to the catalog read on a layout it " +
      "cannot prove: foreign data file or subdirectory") {
    import spark.implicits._
    // ADVICE r19: a data file WITHOUT the bucket-id suffix (an external
    // writer) or a subdirectory (a future partitioned+bucketed layout)
    // would be silently EXCLUDED from a path-pruned screen — rows lost,
    // wrong verdicts. The guard degrades to the catalog scan, the
    // correct superset either way (callers re-apply the key equality).
    val dir = java.nio.file.Files.createTempDirectory("graft_foreign")
      .toString
    val docs = (0L until 64L).map(i => (i, s"k_$i")).toDF("doc_id", "skey")
    try {
      PartitionedStore.writeBucketed(docs, "bkt_foreign", s"$dir/t",
        Seq("skey"), 8, Seq("skey"))
      def planOf(keys: Seq[String]) = PartitionedStore
        .prunedBucketScan(spark, "bkt_foreign", keys)
        .queryExecution.executedPlan.toString
      // sanity: a clean layout path-prunes (multi-path file read)
      assert(!planOf(Seq("k_1")).contains("default.bkt_foreign"),
        "clean few-key probe must path-prune, not read the catalog")
      // an external writer drops a conforming-schema file with a
      // non-conforming NAME into the table dir
      val foreign = Seq((9999L, "k_1")).toDF("doc_id", "skey")
      val tmp = java.nio.file.Files.createTempDirectory("graft_fwrite")
        .toString
      foreign.coalesce(1).write.mode("overwrite").parquet(tmp)
      val src = new java.io.File(tmp).listFiles()
        .find(_.getName.startsWith("part-")).get
      java.nio.file.Files.copy(src.toPath,
        java.nio.file.Paths.get(s"$dir/t/data-foreign.parquet"))
      spark.catalog.refreshTable("bkt_foreign")
      val poisoned = PartitionedStore.prunedBucketScan(spark,
        "bkt_foreign", Seq("k_1"))
      // review r20: file-level anomalies degrade to the RAW dir read
      // (no bucket metadata), not the catalog — the catalog's bucketed
      // scan is only provably safe when every file is in-contract
      assert(!poisoned.queryExecution.executedPlan.toString
        .contains("default.bkt_foreign"),
        "foreign data file must degrade the probe to the raw path read")
      // and the foreign row is VISIBLE, not silently lost — a pruned
      // read would have skipped the unparseable file
      assert(poisoned.filter(col("skey") === "k_1")
        .collect().map(_.getLong(0)).toSet == Set(1L, 9999L))
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(s"$dir/t/data-foreign.parquet"))
      spark.catalog.refreshTable("bkt_foreign")
      assert(!planOf(Seq("k_1")).contains("default.bkt_foreign"),
        "clean layout must path-prune again once the foreign file is gone")
      // a conforming NAME with an OUT-OF-RANGE bucket id (review r20):
      // a writer with a different bucket count (here: "bucket 99" in an
      // 8-bucket table) hashed its rows under a layout the probe's
      // bucket-id formula does not route to — same silent-row-loss
      // class as the non-conforming name. The catalog read is NOT the
      // safe degrade here: Spark's bucketed scan indexes its
      // bucket-pruning BitSet by the file's parsed id and throws on a
      // key-filtered query (pinned below) — the degrade is the raw
      // path read of every data file, bucket metadata dropped.
      java.nio.file.Files.copy(src.toPath, java.nio.file.Paths.get(
        s"$dir/t/part-00000-deadbeef_00099.parquet"))
      spark.catalog.refreshTable("bkt_foreign")
      intercept[ArrayIndexOutOfBoundsException] {
        spark.table("bkt_foreign").filter(col("skey") === "k_1").collect()
      }
      val outOfRange = PartitionedStore.prunedBucketScan(spark,
        "bkt_foreign", Seq("k_1"))
      // the foreign-layout row is VISIBLE — a pruned scan would have
      // skipped the bucket-99 file for a key the 8-bucket formula
      // routes elsewhere
      assert(outOfRange.filter(col("skey") === "k_1")
        .collect().map(_.getLong(0)).toSet == Set(1L, 9999L))
      // the maintenance probe is where the out-of-contract layout gets
      // SEEN: storeStats must survive the poisoned table AND report it
      val errBuf = new java.io.ByteArrayOutputStream()
      val prevErr = System.err
      val statsPoisoned =
        try {
          System.setErr(new java.io.PrintStream(errBuf, true))
          PartitionedStore.storeStats(spark, "bkt_foreign")
        } finally System.setErr(prevErr)
      // the exact row count under a poisoned layout is ill-defined
      // (the catalog scan may or may not include the foreign file
      // depending on whether the planner picks the bucketed read) —
      // the contract is: survive, see at least the in-contract rows,
      // and REPORT
      assert(statsPoisoned.rows >= 64L, statsPoisoned.toString)
      assert(errBuf.toString.contains("outside the bucketed layout"),
        s"storeStats must report the foreign file: '${errBuf.toString}'")
      java.nio.file.Files.delete(java.nio.file.Paths.get(
        s"$dir/t/part-00000-deadbeef_00099.parquet"))
      spark.catalog.refreshTable("bkt_foreign")
      // a (non-hidden) subdirectory: the driver listing is
      // non-recursive, so pruning cannot prove coverage — degrade
      java.nio.file.Files.createDirectory(
        java.nio.file.Paths.get(s"$dir/t/extra"))
      assert(planOf(Seq("k_1")).contains("default.bkt_foreign"),
        "subdirectory must degrade the probe to the catalog read")
    } finally spark.sql("DROP TABLE IF EXISTS bkt_foreign")
  }

  test("co-bucketed tables join with zero exchanges") {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    assert(warehouse.nonEmpty)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    PartitionedStore.writeBucketed(orders, "bkt_orders", "o_orderkey", 8)
    PartitionedStore.writeBucketed(lineitem, "bkt_lineitem", "l_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // forbid broadcast so the join would NEED a shuffle without buckets
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_orders")
        .join(spark.table("bkt_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
      assert(nShuffles(joined) == 0,
        joined.queryExecution.executedPlan.toString)
      // and the bucketed join still returns the right rows
      val want = orders.join(lineitem,
        col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() == want && want > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    }
  }
}
