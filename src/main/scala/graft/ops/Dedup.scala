package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines: exact, n-gram
  * Jaccard, MinHash + LSH banding, and SimHash.
  *
  * Scale design: exact dedup is one hash aggregation; MinHash signatures
  * are one aggregation (k min-columns with map-side partial aggregation —
  * no k-fold row explosion); LSH banding shuffles on (band, signature)
  * buckets only; SimHash is a pure per-row fold. The only quadratic path is
  * the in-bucket pair join, bounded by bucket size (guard + salt skewed
  * buckets at real scale).
  */
object Dedup {

  /** Exact dedup via hash aggregation on (normalized) content: canonical =
    * min doc_id per group (the reference's "keep one copy" A6 semantics,
    * parse_clean_and_csv.py:321-326, hash-based instead of O(n²)). */
  def exact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(lower(col(textCol)).as("text_norm"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct word-level n-gram shingles of a document. For size < n the
    * whole (shorter) token span becomes one shingle. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Pairwise n-gram Jaccard within a blocking column: emits pairs with
    * intersection/union counts and keeps jaccard ≥ numer/denom using pure
    * integer math (denom·|∩| ≥ numer·|∪|) — float-free, oracle-safe.
    * Blocking bounds the quadratic pair count; at scale use MinHash-LSH
    * banding below instead. */
  def jaccardPairs(docs: DataFrame, blockCol: String, n: Int,
      numer: Int, denom: Int, textCol: String = "text"): DataFrame = {
    val sh = docs.select(col("doc_id"), col(blockCol).as("block"),
      shingles(col(textCol), n).as("sh"))
    val a = sh.select(col("block"), col("doc_id").as("doc_a"),
      col("sh").as("sh_a"))
    val b = sh.select(col("block"), col("doc_id").as("doc_b"),
      col("sh").as("sh_b"))
    a.join(b, Seq("block"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("n_inter"),
        size(array_union(col("sh_a"), col("sh_b"))).as("n_union"))
      .filter(col("n_inter") * denom >= col("n_union") * numer)
  }

  /** Mersenne-ish prime modulus for the universal hash family. */
  private val P = 2147483647L

  /** Deterministic (aᵢ, bᵢ) coefficients for h_i(x) = (aᵢ·x + bᵢ) mod P. */
  private def coeffs(k: Int, seed: Long): Seq[(Long, Long)] = {
    var state = seed
    def next(): Long = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 33) % (P - 1) + 1
    }
    Seq.fill(k)((next(), next()))
  }

  /** MinHash signatures: k universal hashes over murmur3 shingle hashes,
    * computed as k independent `min` aggregates over the exploded
    * (doc, shingle) relation — partial aggregation makes the shuffle carry
    * one k-vector per doc per partition, not per shingle. */
  def minhashSignatures(docs: DataFrame, n: Int = 2, k: Int = 64,
      textCol: String = "text"): DataFrame = {
    val cs = coeffs(k, seed = 7L)
    val base = docs.select(col("doc_id"),
        explode(shingles(col(textCol), n)).as("shingle"))
      .withColumn("h", pmod(hash(col("shingle")).cast("long"), lit(P)))
    val mins = cs.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * a + b, lit(P))).as(s"m$i")
    }
    base.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH banding: split the k-long signature into `bands` bands of k/bands
    * values; docs sharing any band's exact sub-signature are candidate
    * pairs. Shuffle key = (band, sub-signature) — the standard scale-out
    * near-dup plan. `maxBucket` guards quadratic blowup in degenerate
    * buckets (drop + log them at real scale rather than exploding). */
  def lshCandidatePairs(sigs: DataFrame, bands: Int = 16,
      maxBucket: Int = 10000): DataFrame = {
    val rowsPerBand = 64 / bands
    val bandCols = (0 until bands).map { j =>
      struct(lit(j).as("band"),
        concat_ws("_", (0 until rowsPerBand).map(r =>
          col("sig").getItem(j * rowsPerBand + r).cast("string")): _*)
          .as("key"))
    }
    val buckets = sigs.select(col("doc_id"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.key").as("key"))
    val sized = buckets
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("key"))))
      .filter(col("bucket_n") <= maxBucket)
    val a = sized.select(col("band"), col("key"), col("doc_id").as("doc_a"))
    val b = sized.select(col("band"), col("key"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** MinHash near-dup pipeline: signatures → banded candidates → exact
    * n-gram Jaccard verification (integer threshold as in jaccardPairs). */
  def minhashDedupPairs(docs: DataFrame, n: Int = 2, k: Int = 64,
      bands: Int = 16, numer: Int = 7, denom: Int = 10,
      textCol: String = "text"): DataFrame = {
    val cands = lshCandidatePairs(minhashSignatures(docs, n, k, textCol),
      bands)
    val sh = docs.select(col("doc_id"), shingles(col(textCol), n).as("sh"))
    cands
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
        Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("n_inter"),
        size(array_union(col("sh_a"), col("sh_b"))).as("n_union"))
      .filter(col("n_inter") * denom >= col("n_union") * numer)
  }

  /** 64-bit SimHash over a document's tokens — a single per-row fold:
    * per token, xxhash64 supplies the bit pattern; each bit contributes
    * ±1 to its counter lane; the sign of each lane becomes the output bit.
    * Word-order independent, cheap, and hamming-comparable. Two-step
    * select so the 64-lane counter array is computed once per row. */
  def simhashes(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = split(col(textCol), " ")
    val bitsOf: Column => Column = t =>
      array((0 until 64).map(j =>
        when(shiftright(xxhash64(t), j).bitwiseAND(1) === 1, lit(1L))
          .otherwise(lit(-1L))): _*)
    val counts = aggregate(toks, array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc, bitsOf(t), (a, c) => a + c))
    docs.select(col("doc_id"), counts.as("lanes"))
      .select(col("doc_id"),
        (0 until 64).map(j =>
          when(element_at(col("lanes"), j + 1) > 0, lit(1L << j))
            .otherwise(lit(0L))).reduce(_ bitwiseOR _).as("simhash"))
  }

  /** SimHash near-dup candidates with hamming ≤ maxHamming: block on
    * (maxHamming+1) bit-chunks — any pair within the hamming budget must
    * agree exactly on at least one chunk (pigeonhole), so candidates are
    * found with equality joins only; then exact bit_count verification. */
  def simhashNearDupPairs(docs: DataFrame, maxHamming: Int = 3,
      textCol: String = "text"): DataFrame = {
    val chunks = maxHamming + 1
    val bitsPerChunk = 64 / chunks
    val hs = simhashes(docs, textCol)
    val chunkCols = (0 until chunks).map { c =>
      struct(lit(c).as("chunk"),
        shiftright(col("simhash"), c * bitsPerChunk)
          .bitwiseAND((1L << bitsPerChunk) - 1L).as("key"))
    }
    val blocked = hs.select(col("doc_id"), col("simhash"),
        explode(array(chunkCols: _*)).as("ck"))
      .select(col("doc_id"), col("simhash"),
        col("ck.chunk").as("chunk"), col("ck.key").as("key"))
    val a = blocked.select(col("chunk"), col("key"),
      col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val b = blocked.select(col("chunk"), col("key"),
      col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("chunk", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
