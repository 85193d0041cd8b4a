package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Layout-aware parquet storage: hive-style partitioned directories and
  * bucketed tables.
  *
  * These are the two storage-side levers that decide whether a 100 TB
  * query reads 100 TB or 100 GB:
  *
  *  - **Partitioning** (directory per key value) lets Catalyst prune whole
  *    directories at PLANNING time — a filter on the partition column
  *    never touches excluded files (`PartitionFilters` in the scan node),
  *    so a day/type-scoped query on a year of data reads only its slice.
  *    Use for low-cardinality, always-filtered columns.
  *  - **Bucketing** (fixed hash-bucket files per table) pre-shuffles the
  *    data ONCE at write time: two tables bucketed on the same key with
  *    the same bucket count join with NO exchange on either side — the
  *    repeated per-query shuffle of the fact table, usually the dominant
  *    cost of a large join, disappears. Use for the high-cardinality keys
  *    that joins/aggregations repeatedly shuffle on.
  *
  * Both are plain open formats (parquet + hive layout) — any engine,
  * including the DuckDB oracle, can read the same files back.
  */
object PartitionedStore {

  /** Write `df` as hive-partitioned parquet (one directory per value of
    * `partitionCols`, in order). */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Aligns `df`'s partitioning with the table's bucket hash before a
    * bucketed write: `repartition(n, cols)` and the bucket id share the
    * SAME pmod(murmur3, n) formula, so each write task holds exactly
    * one bucket and writes exactly ONE file (an unaligned bucketed
    * write emits one file per (task, bucket-present) pair — up to
    * tasks×buckets files per write).
    *
    * Applied to APPENDS and COMPACTION only, deliberately NOT to
    * one-shot Overwrite builds (review r18): an increment is small, so
    * collapsing its write to nBuckets tasks is free and the
    * one-file-per-bucket-per-increment discipline is the whole point —
    * but a whole-corpus build forced through nBuckets tasks is a
    * parallelism collapse at exactly the scale this library targets
    * (100 TB / 32 buckets = 3 TB of sort+write per task). Builds keep
    * the write stage's natural parallelism; their bounded multi-file
    * buckets read fine in place and [[compactBucketed]] collapses them
    * when wanted — with nBuckets sized so a bucket fits a task.
    *
    * The input must not itself be a bucketed TABLE SCAN on the same
    * keys (the planner would elide the repartition as
    * already-satisfied and the alignment silently vanishes —
    * compactBucketed reads files by path for this reason). */
  private def alignBuckets(df: DataFrame, bucketCols: Seq[String],
      nBuckets: Int): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.repartition(nBuckets, bucketCols.map(col): _*)
  }

  /** Write `df` as a bucketed (and in-bucket sorted) managed table. Spark
    * records bucketing in the catalog, so later equi-joins/aggregations on
    * `bucketCol` across tables with the SAME bucket count skip their
    * exchanges (and with the sort, their sorts). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Catalog-safe table-name suffix for a data directory: sanitized to
    * [a-z0-9_] (table names reject '/', '.', '-') PLUS the dir's hash —
    * the sanitized text alone could collide across dirs ("sf0.1" vs
    * "sf0_1") and silently serve one corpus's table to the other. ONE
    * definition for every session-scoped bucketed store (split map,
    * epoch digest store, near-dup index, bucketed-join demos). */
  def tableSuffix(dir: String): String =
    dir.toLowerCase.replaceAll("[^a-z0-9]", "_") +
      f"_${dir.hashCode & 0xffffffffL}%08x"

  /** Scratch path for a (store-name, data-dir)-scoped artifact — half
    * of [[storeNames]], for non-table artifacts (materialized verdict
    * files) that must live under the same collision-safe scheme. */
  def storePath(name: String, dir: String): String =
    s"/tmp/graft_$name/${tableSuffix(dir)}"

  /** The ONE naming scheme for every session-scoped bucketed store
    * (split map, digest stores, near-dup index, span bank, bucketed
    * demos): (table, path) = ("graft_bkt_<name>_<suffix>",
    * "/tmp/graft_<name>/<suffix>"). A single definition so a future
    * scheme change (different scratch root, different collision
    * suffix) cannot be applied to five call sites and missed in the
    * sixth — which would silently serve one store under the old
    * scheme (review r18). */
  def storeNames(name: String, dir: String): (String, String) =
    (s"graft_bkt_${name}_${tableSuffix(dir)}", storePath(name, dir))

  /** EXTERNAL-table variant of [[writeBucketed]]: the parquet lives at
    * `path` (where the caller's storage layout says), only the bucketing
    * metadata lives in the session catalog — the production shape, where
    * tables are storage-first and catalogs are replaceable. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketCol: String, nBuckets: Int, sortCols: Seq[String]): Unit =
    writeBucketed(df, table, path, Seq(bucketCol), nBuckets, sortCols)

  /** Seq-spec variant of the external-table write. STORE-LAYER
    * INVARIANT (VERDICT r19 #5): every graft store buckets on exactly
    * ONE key column — a composite key is FUSED into one column first
    * (the near-dup index's `bkey` = xxhash64(band, key) is the
    * pattern), because the driver-side probe machinery
    * ([[bucketIdOf]] / [[prunedBucketScan]]) names a key's bucket file
    * from one value, and a join only reuses composite bucketing when
    * its clustering covers every bucket column anyway — fusing costs
    * nothing and keeps every store probe-able. Enforced HERE, at write
    * time, so a multi-column layout can never be created and then
    * discovered unprobe-able at read time. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketCols: Seq[String], nBuckets: Int, sortCols: Seq[String]): Unit = {
    require(bucketCols.size == 1,
      s"writeBucketed($table): graft stores bucket on exactly one " +
        s"(possibly fused) key column, got $bucketCols — fuse the " +
        "composite key into one column (xxhash64/concat), as the " +
        "near-dup index's bkey does")
    writeBucketedUnchecked(df, table, path, bucketCols, nBuckets, sortCols)
  }

  /** The write body WITHOUT the single-column invariant — for
    * [[compactBucketed]] only, which rewrites an EXISTING table through
    * its own catalog spec: the invariant gates what layouts can be
    * CREATED, and a pre-invariant (or foreign-writer) composite-key
    * table must still be compactable — refusing here would strand its
    * append backlog forever and abort a maintenance sweep mid-loop
    * (review r20). Such a table still fails loudly at probe time
    * ([[probeBuckets]]'s own require), which is where the layout
    * actually matters. */
  private def writeBucketedUnchecked(df: DataFrame, table: String,
      path: String, bucketCols: Seq[String], nBuckets: Int,
      sortCols: Seq[String]): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet").option("path", path)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).saveAsTable(table)
  }

  /** APPEND to an existing bucketed table — the per-increment
    * maintenance write of a long-lived index (band/shingle/digest
    * stores): each append adds one more file per bucket, the hash
    * layout still holds (joins stay exchange-free on the table side;
    * Spark adds a merge sort across the bucket's files where a
    * single-write table scanned pre-sorted).
    *
    * The bucket spec is read from the CATALOG, never from the caller
    * (review r18): the table already defines its layout, and a
    * caller-supplied count could drift from it — Spark would reject
    * the write, but only after [[alignBuckets]] had already shuffled
    * the increment to the wrong width, and with a generic message
    * instead of the table's actual spec. */
  def appendBucketed(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    val spec = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table))
      .bucketSpec.getOrElse(throw new IllegalArgumentException(
        s"appendBucketed($table): table has no bucket spec — plain " +
          "appends don't need this writer"))
    val cols = spec.bucketColumnNames
    val w = alignBuckets(df, cols, spec.numBuckets)
      .write.mode(SaveMode.Append)
      .format("parquet")
      .bucketBy(spec.numBuckets, cols.head, cols.tail: _*)
    (if (spec.sortColumnNames.nonEmpty)
       w.sortBy(spec.sortColumnNames.head, spec.sortColumnNames.tail: _*)
     else w).saveAsTable(table)
  }

  /** The digest-table increment join (see Dedup.incrementalDedup): keep
    * batch rows whose `_dig` is unseen in the bucketed corpus digest
    * table. With the corpus bucketed on `digest`, its scan reads the
    * bucket layout in place and only the (small) batch side shuffles —
    * the 100 TB corpus never moves across increments
    * (PartitionedStoreSpec plan-asserts). */
  def antiJoinBucketed(spark: SparkSession, batch: DataFrame,
      digestTable: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    batch.join(spark.table(digestTable).select(col("digest").as("_dig")),
      Seq("_dig"), "left_anti")
  }

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    // session resolution memo — snapshot-validated, so appends/compaction
    // (which change the file listing) re-resolve; see Publish.readPublished
    graft.Tables.resolved(spark, path)

  /** Small-files compaction — the maintenance pass every long-lived
    * 100 TB dataset needs: streaming ingestion and fine-grained writes
    * leave thousands of KB-sized files whose per-file open/footer cost
    * dominates later scans. Rewrites `path` into
    * ⌈bytes / targetBytesPerFile⌉ files via [[Publish]], so the rewrite
    * is atomic and AUDITED — the compacted copy must hold exactly the
    * original row count before it replaces the original (a lost-rows
    * compaction is unrecoverable; the audit makes it impossible to
    * publish). Returns the row count. */
  def compact(spark: SparkSession, path: String,
      targetBytesPerFile: Long = 128L << 20): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // refuse a hive-partitioned tree: partition discovery would fold the
    // directory keys into data columns and the flat rewrite would
    // silently DESTROY the layout (planning-time pruning gone, every
    // path/key=value/ reader broken) while the row-count audit passes.
    // Compact partitioned data one LEAF directory at a time.
    val partitionDirs = fs.listStatus(p)
      .filter(_.isDirectory).map(_.getPath.getName).filter(_.contains("="))
    require(partitionDirs.isEmpty,
      s"compact($path): hive-partitioned layout detected " +
        s"(${partitionDirs.take(3).mkString(", ")}…) — a flat rewrite " +
        "would silently drop the partition tree; compact each leaf " +
        "partition directory instead")
    // refuse a BUCKETED table's files too: bucketed layouts are flat
    // (they pass the partition-dir guard above) but encode the bucket id
    // in each file name (part-NNNNN-<uuid>_BBBBB.*); a flat rewrite
    // passes the row-count audit while silently destroying the hash
    // layout — every later "exchange-free" bucketed join would read
    // rows from the wrong buckets. Bucketed tables compact through
    // [[compactBucketed]], which rewrites THROUGH the bucket spec.
    val bucketed = fs.listStatus(p).filter(_.isFile)
      .map(_.getPath.getName)
      .filter(_.matches("""part-\d+-.*_\d{5}(\..*)?"""))
    require(bucketed.isEmpty,
      s"compact($path): bucketed-table files detected " +
        s"(${bucketed.take(2).mkString(", ")}…) — a flat rewrite would " +
        "silently destroy the bucket layout while the row-count audit " +
        "passes; use compactBucketed(spark, table) instead")
    val bytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1L,
      (bytes + targetBytesPerFile - 1) / targetBytesPerFile).toInt
    val df = spark.read.parquet(path)
    val expected = df.count()
    // rewrite to a sibling then atomically swap over the original —
    // Publish stages + audits + renames; the original stays readable
    // until the rename
    val rows = Publish.parquet(df.repartition(nFiles), path + ".compacted",
      rowAudit = _ == expected)
    // swap: original steps aside first, so a crash mid-swap leaves BOTH
    // copies on disk (recoverable), never neither
    val retired = new Path(path + ".old")
    fs.delete(retired, true)
    if (!fs.rename(p, retired) ||
        !fs.rename(new Path(path + ".compacted"), p))
      throw new Publish.AuditFailedException(
        s"swap of compacted files into $path failed")
    fs.delete(retired, true)
    rows
  }

  /** Driver-side bucket id of one INTERNAL-typed value (UTF8String for
    * strings) under an n-bucket spec — digit-for-digit the bucketed
    * write's own formula (HashPartitioning.partitionIdExpression =
    * pmod(murmur3(col, seed 42), n)), so a key's file can be named
    * without planning a scan. This is what lets a trickle probe skip
    * Spark's genBucketSet, which evaluates the same expression
    * INTERPRETED per set value at physical planning (~0.2 ms/value
    * measured — the r18 pruned screen's dominant constant). Parity with
    * the write is spec-pinned (PartitionedStoreSpec: every row of every
    * bucket file hashes back to that file's bucket id). */
  def bucketIdOf(value: Any,
      dt: org.apache.spark.sql.types.DataType, nBuckets: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
      .hash(value, dt, 42L).toInt
    val m = h % nBuckets
    if (m < 0) m + nBuckets else m
  }

  /** Bucket-pruned read of a single-column bucketed table, for a probe
    * whose candidate keys are known driver-side: the candidate bucket
    * ids are computed with the write's own hash ([[bucketIdOf]]) and
    * only those buckets' files are read BY PATH, with the exact key
    * filter (InSet) applied — planning is O(1) in the key count where
    * a key-filtered catalog scan pays genBucketSet's per-value
    * interpreted walk (~0.2 ms/value, the r18 screen's dominant
    * constant), and I/O is bucket-pruned by construction.
    *
    * When the candidate buckets cover the WHOLE table (a trickle probe
    * against few buckets — the suite's 32-bucket stores at 2k keys),
    * pruning cannot save any I/O and the per-file path listing is pure
    * cost that GROWS with the file count (measured ~1 s/scan at sf2:
    * >32 individual paths also trip Spark's parallel-listing job) — so
    * the scan degrades to the catalog's in-place table read with NO
    * key filter (no genBucketSet), semantically a superset read either
    * way: callers join on the key column, which re-applies the
    * equality. Path-read trade-offs when pruned: no catalog bucketing
    * metadata (join the result via a BROADCAST batch side, not a
    * shuffle), and the file listing is as of call time (same staleness
    * class as the catalog's listing under a racing compaction).
    *
    * RACING-COMPACTION CONTRACT: a [[compactBucketed]] swap between
    * this call and the returned frame's ACTION fails that action with
    * FILE_NOT_EXIST (there is no mid-plan refresh for a path read).
    * Compaction is verdict-invariant (EpochFullSpec / DedupSim pin it),
    * so the recovery is: rebuild the scan — a fresh call lists the
    * post-swap files — and retry ONCE; a second failure means the store
    * is being continuously rewritten and should fail loudly.
    * [[graft.streaming.EventStream.nearDupIndexEachBatch]] implements
    * exactly this posture per trigger (EventStreamSpec pins it with a
    * deterministic mid-trigger swap). */
  /** (internal values, wanted bucket ids, bucket spec, table schema)
    * of a key probe against a single-column bucketed table. */
  private def probeBuckets(spark: SparkSession, table: String,
      keys: Iterable[Any]) = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"prunedBucketScan($table): table has no bucket spec"))
    // defense in depth: writeBucketed rejects multi-column specs at
    // write time (the store-layer invariant), but this table could have
    // been created by a foreign writer straight into the catalog
    require(spec.bucketColumnNames.size == 1,
      s"prunedBucketScan($table): single-column bucketing only " +
        s"(got ${spec.bucketColumnNames})")
    val schema = spark.table(table).schema
    val dt = schema(spec.bucketColumnNames.head).dataType
    val internal = keys.iterator.map {
      case s0: String =>
        org.apache.spark.unsafe.types.UTF8String.fromString(s0)
      case v => v
    }.toSeq
    val wanted = internal.iterator
      .map(bucketIdOf(_, dt, spec.numBuckets)).toSet
    (internal, wanted, spec, schema, meta)
  }

  def prunedBucketScan(spark: SparkSession, table: String,
      keys: Iterable[Any]): DataFrame = {
    val (internal, wanted, spec, schema, meta) =
      probeBuckets(spark, table, keys)
    val keyCol = spec.bucketColumnNames.head
    // all-buckets fast path: a probe that prunes nothing reads the
    // catalog directly and deliberately SKIPS the directory listing
    // (measured ~1 s/scan at sf2 for a listing that prunes nothing —
    // BENCH_NOTES r19), so the layout guards below cannot run here. A
    // foreign-layout store (out-of-range bucket file) misbehaves under
    // this read — but identically under every other catalog read in
    // the engine; such a store is out of contract, [[storeStats]]
    // reports it loudly at maintenance time, and [[compactBucketed]]
    // (a path read rewritten through the spec) repairs it.
    if (wanted.size >= spec.numBuckets) return spark.table(table)
    val path = new Path(meta.location)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bucketOf = """part-\d+-.*_(\d{5})""".r.unanchored
    val listing = fs.listStatus(path)
    // layout guards (ADVICE r19, re-ordered review r20): the pruned
    // path trusts two layout facts — every DATA file's name encodes an
    // in-range bucket id, and the table is flat (this listing is
    // non-recursive). Degrade targets differ BY ANOMALY, and the
    // subdir check must run first:
    //  - a (non-hidden) SUBDIRECTORY (a future partitioned+bucketed
    //    subtree): the flat listing cannot enumerate the data at all —
    //    degrade to the catalog read, Spark's canonical semantics for
    //    whatever the table's layout is.
    //  - a FILE-level anomaly — a data file without the bucket-id
    //    suffix (external writer) or with an id outside the spec's
    //    range (a foreign bucket count; its rows are hashed under a
    //    layout the probe's formula does not route to): the CATALOG
    //    read is NOT safe here — Spark's bucketed scan silently drops
    //    an out-of-range file on a plain scan and throws
    //    ArrayIndexOutOfBounds from its bucket-pruning BitSet under a
    //    key filter (measured; PartitionedStoreSpec pins it). Degrade
    //    to the RAW path read of the directory — provably flat at this
    //    point, so it reads exactly every data file, whatever its
    //    name, with no bucket metadata. Callers re-apply the key
    //    equality, so both degrades stay correct supersets.
    // Spark's own hidden-path convention: _/. prefixes are metadata
    // (_SUCCESS, a racing write's _temporary), never data.
    val subdirs = listing.filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
    if (subdirs.nonEmpty)
      return spark.table(table)
    val parsed = listing.filter(_.isFile).map(_.getPath)
      .filter { p =>
        val n = p.getName; !n.startsWith("_") && !n.startsWith(".")
      }
      .map { p =>
        p.getName match {
          case bucketOf(b) => p -> Some(b.toInt)
          case _ => p -> None
        }
      }
    if (parsed.exists { case (_, b) =>
        b.isEmpty || b.exists(_ >= spec.numBuckets) })
      return spark.read.schema(schema).parquet(path.toString)
    val files = parsed.collect {
      case (p, Some(b)) if wanted(b) => p.toString
    }
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else {
      import org.apache.spark.sql.functions.col
      // >32 root paths trip Spark's DISTRIBUTED listing job
      // (parallelPartitionDiscovery.threshold) — seconds of task
      // scheduling to re-stat files this function just listed
      // (measured 3.4 s for a ~hundreds-file subset at sf2/512
      // buckets). The subset is rail-sized by construction, so list
      // driver-side: raise the threshold for the duration of the
      // DataFrame RESOLUTION (the file index is built eagerly in
      // spark.read, so the conf is restored before returning).
      // the set/resolve/restore is a JVM-wide critical section: two
      // concurrent callers interleaving set→save-prev→restore would
      // otherwise capture each other's inflated value and restore it
      // PERMANENTLY (round-close review r19); concurrent planning on
      // other threads during the short window sees the inflated
      // threshold — worst case one slow driver-side listing, never a
      // wrong result
      val thresholdKey =
        "spark.sql.sources.parallelPartitionDiscovery.threshold"
      PartitionedStore.synchronized {
        val prev = spark.conf.get(thresholdKey)
        spark.conf.set(thresholdKey, Int.MaxValue.toString)
        try {
          // exact key filter on the pruned files: one InSet node over
          // the ALREADY-internal values, pushed to parquet
          spark.read.schema(schema).parquet(files.toSeq: _*)
            .filter(org.apache.spark.sql.graftbridge.Bridge
              .inSet(col(keyCol), internal))
        } finally spark.conf.set(thresholdKey, prev)
      }
    }
  }

  /** Health snapshot of a bucketed store table — the "when do I
    * compact" input ([[compactBucketed]]'s scaladoc says run it when
    * probe scans go merge-heavy; this is the number that says when):
    * files per bucket (each [[appendBucketed]] adds one file per
    * bucket, so max ≈ increments since the last compaction), row vs
    * DISTINCT-row count (the duplicate backlog blindly-retried appends
    * leave behind — verdict-invariant at screen time, reclaimed by
    * `compactBucketed(dedupRows = true)`), and the table's `graft.*`
    * TBLPROPERTIES stamps (the parameter guards every screen
    * validates). Cost: one filesystem listing + ONE aggregation job
    * (rows and distinct rows fold out of one xxhash64 row-fingerprint
    * aggregation — 8 bytes shuffled per row, never the rows) + a
    * catalog read — a maintenance probe, never per screen. */
  case class StoreStats(table: String, nBuckets: Int, nFiles: Long,
      filesPerBucketMin: Long, filesPerBucketMax: Long, rows: Long,
      distinctRows: Long, stamps: Map[String, String]) {
    /** Duplicate rows a retried append left behind. */
    def dupBacklog: Long = rows - distinctRows
    /** Mean data files per bucket. */
    def filesPerBucketMean: Double =
      if (nBuckets == 0) 0.0 else nFiles.toDouble / nBuckets
  }

  def storeStats(spark: SparkSession, table: String): StoreStats = {
    import org.apache.spark.sql.functions.{col, count, count_distinct,
      lit, struct, sum, xxhash64}
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"storeStats($table): table has no bucket spec — these stats " +
        "describe the append-per-increment bucketed-store lifecycle"))
    val path = new Path(meta.location)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // bucket id is encoded in each file name (part-NNNNN-<uuid>_BBBBB)
    val bucketOf = """part-\d+-.*_(\d{5})""".r.unanchored
    val names = fs.listStatus(path).filter(_.isFile)
      .map(_.getPath.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
    // the maintenance probe is where an out-of-contract layout gets
    // SEEN (review r20): a data file with no bucket suffix or an
    // out-of-range id means a foreign writer touched the store —
    // prunedBucketScan degrades on it, the catalog scan misbehaves on
    // it, and compactBucketed (a path read rewritten through the spec)
    // repairs it. Report loudly, don't die: the stats themselves and
    // the compaction they gate are exactly the repair path.
    val foreign = names.filter { n =>
      bucketOf.findFirstMatchIn(n) match {
        case Some(m) => m.group(1).toInt >= spec.numBuckets
        case None => true
      }
    }
    if (foreign.nonEmpty)
      System.err.println(s"[graft] storeStats($table): ${foreign.length} " +
        s"data file(s) outside the bucketed layout (first: " +
        s"${foreign.head}) — run compactBucketed to rewrite the store " +
        "through its spec")
    val perBucket = names
      .collect { case bucketOf(b) => b.toInt }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    // zero-file buckets count 0 — min is over ALL nBuckets
    val counts = (0 until spec.numBuckets)
      .map(b => perBucket.getOrElse(b, 0L))
    val tbl = spark.table(table)
    // dup-backlog via an 8-byte row fingerprint UNDER THE BUCKET KEY,
    // not a group-by over all columns (VERDICT r19 #2). Two structural
    // facts make this the 100 TB shape: (a) equal rows share the bucket
    // key, and the bucketed scan already clusters by it, so
    // groupBy(bucketKey) is EXCHANGE-FREE — the store never moves; (b)
    // the per-group distinct state is xxhash64(struct(*)) longs, never
    // rows — the old group-by-all held every distinct row FULL-WIDTH
    // (the shingle store's arrays included) in the per-partition
    // aggregation map, the real blowup at scale (its shuffle was
    // already near-zero on a bucketed table, measured: the clustering
    // was satisfied — BENCH_NOTES r20 A/B, which also rejected an
    // unkeyed count_distinct(hash) that re-shuffled 8 B/row).
    // Collision posture: a 64-bit collision can only merge two distinct
    // rows WITHIN one key group, so distinctRows only UNDERcounts and
    // dupBacklog only OVERstates — worst case one unnecessary
    // compaction (whose dedupRows pass collapses true duplicates
    // exactly, via distinct() over the rows themselves); a real
    // backlog can never be hidden.
    val a = tbl
      .withColumn("_h", xxhash64(struct(tbl.columns.map(col): _*)))
      .groupBy(spec.bucketColumnNames.map(col): _*)
      .agg(count(lit(1)).as("_n"), count_distinct(col("_h")).as("_d"))
      .agg(sum(col("_n")).cast("long"), sum(col("_d")).cast("long"))
      .head()
    val stamps = spark.sql(s"SHOW TBLPROPERTIES $table").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
      .filter { case (k, _) => k.startsWith("graft.") }
    StoreStats(table, spec.numBuckets, counts.sum,
      if (counts.isEmpty) 0L else counts.min,
      if (counts.isEmpty) 0L else counts.max,
      // sum over an EMPTY store is NULL, not 0
      if (a.isNullAt(0)) 0L else a.getLong(0),
      if (a.isNullAt(1)) 0L else a.getLong(1), stamps)
  }

  /** [[compactBucketed]] gated on [[storeStats]] — the stats-driven
    * maintenance trigger: compacts only when the table's max
    * files-per-bucket exceeds `maxFilesPerBucket` (the measured knee —
    * BENCH_NOTES r18: a 33-file bucket screened 1.5× slower than one
    * file) or a duplicate backlog from retried appends exists. Returns
    * the consulted stats and whether compaction fired, so a sweep over
    * many stores can report what it did. */
  def compactIfNeeded(spark: SparkSession, table: String,
      maxFilesPerBucket: Long = 8L): (StoreStats, Boolean) = {
    val stats = storeStats(spark, table)
    val fire = stats.filesPerBucketMax > maxFilesPerBucket ||
      stats.dupBacklog > 0
    if (fire) compactBucketed(spark, table, dedupRows = stats.dupBacklog > 0)
    (stats, fire)
  }

  /** Bucket-PRESERVING compaction of a bucketed external table — the
    * maintenance pass the append-per-increment lifecycle needs:
    * [[appendBucketed]] adds one file per bucket per increment forever,
    * and [[compact]]'s flat rewrite would destroy the hash layout (it
    * now refuses). Rewrites the table's data THROUGH its own catalog
    * bucket spec into ONE file per bucket, with the same
    * stage–audit–swap discipline as [[compact]]: the staged copy must
    * hold exactly the expected row count before it replaces the
    * original, and a crash mid-swap leaves both copies on disk. The
    * live table's catalog entry (location, bucket spec, TBLPROPERTIES
    * stamps) is never touched — only its files are swapped — so index
    * parameter stamps survive by construction and later joins still
    * read `Bucketed: true` with zero table-side exchanges.
    *
    * `dedupRows = true` additionally collapses EXACT duplicate rows —
    * what a blindly retried [[graft.ops.Dedup.appendNearDupIndex]]
    * leaves behind (verdict-invariant at screen time; reclaimed here).
    * The audit then checks distinct-row parity instead.
    *
    * Scale shape: one shuffle of the table onto its own bucket hash
    * (`repartition(n, bucketCols)` uses the same pmod(murmur3, n) as
    * the bucketed write, so each task holds exactly one bucket and
    * writes exactly one file), one count per side for the audit, two
    * directory renames. Run it when files-per-bucket makes probe scans
    * merge-heavy — BENCH_NOTES carries the measured knee. */
  def compactBucketed(spark: SparkSession, table: String,
      dedupRows: Boolean = false): Long = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"compactBucketed($table): table has no bucket spec — flat parquet " +
        "compacts with compact(path)"))
    val path = new Path(meta.location)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // read the FILES, not the table: a table-scan source reports the
    // bucket hash as its output partitioning, which lets the planner
    // elide the aligned repartition below — and then (auto-disabled
    // bucketed scan) write from however many read tasks the file
    // coalescer picked, one file per bucket EACH. The path read has no
    // claimed partitioning, so the repartition is physical and each
    // write task holds exactly one bucket.
    val raw = spark.read.schema(spark.table(table).schema)
      .parquet(path.toString)
    val base = if (dedupRows) raw.distinct() else raw
    val expected = base.count()
    // the aligned repartition is what yields ONE file per bucket —
    // writeBucketed itself does not align (build parallelism; see
    // alignBuckets), so compaction, whose purpose IS the collapse,
    // aligns here
    val df = alignBuckets(base, spec.bucketColumnNames, spec.numBuckets)
    val staging = table + "__compacting"
    val stagingPath = path.toString + ".compacted"
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    fs.delete(new Path(stagingPath), true)
    writeBucketedUnchecked(df, staging, stagingPath,
      spec.bucketColumnNames, spec.numBuckets, spec.sortColumnNames)
    val got = spark.table(staging).count()
    if (got != expected) {
      spark.sql(s"DROP TABLE IF EXISTS $staging")
      fs.delete(new Path(stagingPath), true)
      throw new Publish.AuditFailedException(
        s"compactBucketed($table): staged copy holds $got rows, " +
          s"expected $expected — original untouched")
    }
    // swap: original steps aside first, so a crash mid-swap leaves BOTH
    // copies on disk (recoverable), never neither
    val retired = new Path(path.toString + ".old")
    fs.delete(retired, true)
    if (!fs.rename(path, retired) ||
        !fs.rename(new Path(stagingPath), path))
      throw new Publish.AuditFailedException(
        s"compactBucketed($table): swap into $path failed")
    fs.delete(retired, true)
    // external drop is metadata-only; the staged files now ARE the
    // live table's files, so only the staging catalog entry goes
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    spark.catalog.refreshTable(table)
    expected
  }
}
