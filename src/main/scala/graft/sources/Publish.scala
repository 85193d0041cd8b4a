package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Write–audit–publish: retry-safe batch output promotion.
  *
  * A 100 TB job that dies mid-write must neither leave a half-written
  * directory where downstream readers look, nor silently publish a
  * truncated result on retry. The pattern: write to a staging directory
  * next to the target, AUDIT the staged files (re-read and validate —
  * row count against the source, or any caller-supplied invariant), and
  * only then atomically rename staging → final (a metadata operation on
  * HDFS-like filesystems; object stores substitute a manifest swap).
  * A failed audit leaves the target untouched and the staging directory
  * quarantined for inspection.
  */
object Publish {

  /** Returns the rows published, or throws [[AuditFailedException]]
    * leaving `finalPath` untouched (previous contents intact) and the
    * rejected staging directory at the returned quarantine path.
    *
    * `audit` runs against a fresh read of the STAGED files — what
    * downstream will actually see, not the in-memory frame that produced
    * them. */
  def parquet(df: DataFrame, finalPath: String,
      audit: DataFrame => Boolean = _ => true,
      rowAudit: Long => Boolean = _ => true): Long = {
    val spark = df.sparkSession
    val staging = new Path(finalPath + ".staging")
    val target = new Path(finalPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(staging, true)
    df.write.mode(SaveMode.Overwrite).parquet(staging.toString)

    val staged = spark.read.parquet(staging.toString)
    val rows = staged.count()
    // `rowAudit` sees the count this method ALREADY took of the fresh
    // staged read — the common row-count audit re-ran `staged.count()`
    // inside its lambda, a duplicate scan+job per publish (r21). The
    // generic `audit` hook is unchanged for invariants beyond the count.
    if (!rowAudit(rows) || !audit(staged)) {
      val quarantine = new Path(finalPath + ".rejected")
      fs.delete(quarantine, true)
      fs.rename(staging, quarantine)
      throw new AuditFailedException(
        s"audit rejected staged output ($rows rows); " +
          s"target untouched, staged files at $quarantine")
    }
    // publish: the live target steps ASIDE first (rename, not delete) —
    // a crash or failed rename in the window must leave the PREVIOUS
    // published data recoverable at .old, never a state where neither
    // copy exists (the same swap order compact() uses). The retired copy
    // is deleted only after the new data is live.
    val retired = new Path(finalPath + ".old")
    fs.delete(retired, true)
    if (fs.exists(target) && !fs.rename(target, retired))
      throw new AuditFailedException(
        s"could not retire live $target -> $retired; target untouched, " +
          s"staged files at $staging")
    if (!fs.rename(staging, target)) {
      // roll back: put the previous published data back live. The
      // rollback rename can itself fail (same degraded filesystem that
      // failed the publish rename) — report the TRUE state either way,
      // never claim "restored" while the target is missing and the only
      // copy sits at .old (ADVICE r15).
      val hadPrevious = fs.exists(retired)
      val restored = hadPrevious && fs.rename(retired, target)
      throw new AuditFailedException(
        if (restored)
          s"rename $staging -> $target failed; previous publish restored"
        else if (hadPrevious)
          s"rename $staging -> $target failed AND rollback failed; " +
            s"target is MISSING — previous data at $retired, staged " +
            s"files at $staging"
        else
          s"rename $staging -> $target failed; no previous publish to " +
            s"restore — staged files at $staging")
    }
    fs.delete(retired, true)
    rows
  }

  final class AuditFailedException(msg: String)
    extends RuntimeException(msg)

  /** Read a published dataset, failing loudly if the path does not exist
    * or is empty — the reader-side half of the contract (an unpublished
    * or rolled-back output must not read as an empty DataFrame). */
  def readPublished(spark: SparkSession, path: String): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"$path has not been published")
    // through the session's resolution memo (Tables.resolved, r21): the
    // store-lifecycle queries read their published stores several times
    // per run, and each bare spark.read.parquet re-lists + re-infers the
    // footer (~60–110 ms/path measured). The memo's (name, length,
    // mtime) snapshot invalidates on every re-publish — an atomic swap
    // replaces the directory contents, so a stale resolution can never
    // be handed out.
    graft.Tables.resolved(spark, path)
  }
}
