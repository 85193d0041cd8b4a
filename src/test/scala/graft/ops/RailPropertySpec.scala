package graft.ops

import scala.collection.mutable

import graft.SparkSpec

/** Property pins for the two near-dup rail semantics, checked against
  * executable Scala models over seeded corpora (bases + ≤6-bit mutants +
  * a constant-signature clump that fires the rail):
  *
  *  - [[Dedup.hammingNearDupPairs]] emits a (hamming ≤ 6) pair iff the
  *    bucket of its FIRST clean chunk-pair block (two lowest clean
  *    chunks) is within `maxBucket` — the documented all-blocks rule,
  *    including its recall-loss corner under a fired rail.
  *  - [[Dedup.lshCandidatePairs]] emits a pair iff the docs share at
  *    least one SURVIVING band bucket (size ≤ maxBucket), in the first
  *    such band — the r13 surviving-band rule.
  *
  * Both must emit each pair exactly once (structural dedup, no
  * pair-keyed exchange to fall back on).
  */
class RailPropertySpec extends SparkSpec {
  import spark.implicits._

  private def chunk(sig: Long, c: Int): Long = (sig >>> (c * 8)) & 0xffL

  test("hamming rail semantics == executable model on a seeded corpus") {
    val rnd = new scala.util.Random(20260815L)
    val bases = Vector.fill(25)(rnd.nextLong())
    val mutants = bases.flatMap { b =>
      Vector.fill(rnd.nextInt(3)) {
        var x = b
        (0 until 1 + rnd.nextInt(6)).foreach(_ => x ^= 1L << rnd.nextInt(64))
        x
      }
    }
    val clump = Vector.fill(30)(0x0123456789abcdefL)
    val sigs = (bases ++ mutants ++ clump).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    val df = sigs.toDF("doc_id", "simhash")
    for (cap <- Seq(20, 100000)) {
      val census = mutable.Map[(Int, Long), Int]().withDefaultValue(0)
      for ((_, s) <- sigs; c1 <- 0 until 8; c2 <- (c1 + 1) until 8)
        census((c1 * 8 + c2, chunk(s, c1) * 256 + chunk(s, c2))) += 1
      val expected = (for {
        (ia, sa) <- sigs
        (ib, sb) <- sigs
        if ia < ib
        x = sa ^ sb
        if java.lang.Long.bitCount(x) <= 6
        blk = HammingPairKernel.firstCleanBlk(x)
        if census((blk,
          chunk(sa, blk / 8) * 256 + chunk(sa, blk % 8))) <= cap
      } yield (ia, ib, java.lang.Long.bitCount(x).toLong)).toSet
      val got = Dedup.hammingNearDupPairs(df, maxBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.length == got.toSet.size,
        s"duplicate emission at cap=$cap")
      assert(got.toSet == expected, s"cap=$cap: " +
        s"missing=${expected -- got.toSet} extra=${got.toSet -- expected}")
      // the fixture actually exercises both regimes
      if (cap == 20) assert(!expected.exists(_._3 == 0L),
        "clump pairs must be railed at cap=20")
      else assert(expected.count(_._3 == 0L) == 30 * 29 / 2)
    }
  }

  test("LSH surviving-band semantics == executable model, seeded corpus") {
    val rnd = new scala.util.Random(7L)
    // tiny value domain → band sub-signatures collide heavily, so small
    // caps rail real buckets while most pairs still share another band
    val rows: Seq[(Long, Vector[Long])] = (1L to 40L).map(i =>
      (i, Vector.fill(8)(rnd.nextInt(3).toLong)))
    val df = rows.toDF("doc_id", "sig")
    def sub(s: Vector[Long], j: Int) = s.slice(2 * j, 2 * j + 2)
    for (cap <- Seq(4, 10000)) {
      val bucket = mutable.Map[(Int, Vector[Long]), Int]().withDefaultValue(0)
      for ((_, s) <- rows; j <- 0 until 4) bucket((j, sub(s, j))) += 1
      val expected = (for {
        (ia, sa) <- rows
        (ib, sb) <- rows
        if ia < ib
        if (0 until 4).exists(j =>
          sub(sa, j) == sub(sb, j) && bucket((j, sub(sa, j))) <= cap)
      } yield (ia, ib)).toSet
      val got = Dedup.lshCandidatePairs(df, bands = 4, k = 8,
          maxBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size,
        s"duplicate emission at cap=$cap")
      assert(got.toSet == expected, s"cap=$cap: " +
        s"missing=${expected -- got.toSet} extra=${got.toSet -- expected}")
      if (cap == 4) {
        assert(bucket.values.exists(_ > 4), "fixture must fire the rail")
        // the surviving-band rule RECOVERS pairs the all-bands rule lost:
        // at least one expected pair's first matching band is over-cap
        assert(expected.exists { case (ia, ib) =>
          val sa = rows(ia.toInt - 1)._2; val sb = rows(ib.toInt - 1)._2
          val firstMatch = (0 until 4).find(j => sub(sa, j) == sub(sb, j)).get
          bucket((firstMatch, sub(sa, firstMatch))) > 4
        }, "fixture must contain a first-match-railed recovered pair")
      }
      Stage.releaseAll(spark)
    }
  }
}
