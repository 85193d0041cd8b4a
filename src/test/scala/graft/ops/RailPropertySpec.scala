package graft.ops

import scala.collection.mutable

import graft.SparkSpec

/** Property pins for the two near-dup rail semantics, checked against
  * executable Scala models over seeded corpora (bases + ≤6-bit mutants +
  * a constant-signature clump that fires the rail):
  *
  *  - [[Dedup.hammingNearDupPairs]] DEFAULT (all-blocks rule): emit a
  *    (hamming ≤ 6) pair iff the FIRST clean block's bucket is within
  *    `maxBucket`, including its recall-loss corner under a fired rail
  *    (the measured-fast path — see the operator scaladoc).
  *    `survivingBlocks = true` (r14) emits iff SOME clean block's
  *    bucket survived, in the lexicographically first such block — LSH
  *    surviving-band parity.
  *  - [[Dedup.lshCandidatePairs]] emits a pair iff the docs share at
  *    least one SURVIVING band bucket (size ≤ maxBucket), in the first
  *    such band — the r13 surviving-band rule.
  *
  * All must emit each pair exactly once (structural dedup, no
  * pair-keyed exchange to fall back on).
  */
class RailPropertySpec extends SparkSpec {
  import spark.implicits._

  private def chunk(sig: Long, c: Int): Long = (sig >>> (c * 8)) & 0xffL

  private def seededSigs: Seq[(Long, Long)] = {
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
    // hot-prefix family: 30 sigs sharing chunks 0-1 = 0 (golden-ratio
    // high bytes, pairwise hamming ≫ 6) over-fill bucket (blk (0,1),
    // key 0) at cap=20, so the (hotA, hotB) pair's FIRST clean block is
    // railed while its other clean blocks survive — the corner where
    // the surviving-block rule recovers a pair the legacy rule drops
    val hotA = 0L
    val hotB = 1L << 56
    val hotFillers = (1L to 30L).map(i => (i * 0x9e3779b97f4a7c15L) & ~0xffffL)
    (bases ++ mutants ++ clump ++ Vector(hotA, hotB) ++ hotFillers)
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
  }

  private def hammingCensus(sigs: Seq[(Long, Long)])
      : mutable.Map[(Int, Long), Int] = {
    val census = mutable.Map[(Int, Long), Int]().withDefaultValue(0)
    for ((_, s) <- sigs; c1 <- 0 until 8; c2 <- (c1 + 1) until 8)
      census((c1 * 8 + c2, chunk(s, c1) * 256 + chunk(s, c2))) += 1
    census
  }

  /** Clean blocks of the XOR, lexicographic (c1*8+c2 ascending). */
  private def cleanBlks(x: Long): Seq[Int] = for {
    c1 <- 0 until 8; c2 <- (c1 + 1) until 8
    if ((x >>> (c1 * 8)) & 0xffL) == 0L && ((x >>> (c2 * 8)) & 0xffL) == 0L
  } yield c1 * 8 + c2

  test("hamming surviving-block semantics == executable model (knob on)") {
    val sigs = seededSigs
    val df = sigs.toDF("doc_id", "simhash")
    for (cap <- Seq(20, 100000)) {
      val census = hammingCensus(sigs)
      // model: emitted iff ANY clean block's bucket survived
      val expected = (for {
        (ia, sa) <- sigs
        (ib, sb) <- sigs
        if ia < ib
        x = sa ^ sb
        if java.lang.Long.bitCount(x) <= 6
        if cleanBlks(x).exists(blk => census((blk,
          chunk(sa, blk / 8) * 256 + chunk(sa, blk % 8))) <= cap)
      } yield (ia, ib, java.lang.Long.bitCount(x).toLong)).toSet
      val got = Dedup.hammingNearDupPairs(df, maxBucket = cap,
          survivingBlocks = true)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.length == got.toSet.size,
        s"duplicate emission at cap=$cap")
      assert(got.toSet == expected, s"cap=$cap: " +
        s"missing=${expected -- got.toSet} extra=${got.toSet -- expected}")
      // the fixture actually exercises both regimes: at cap=20 the clump
      // over-fills EVERY bucket of the constant signature, so identical
      // pairs are dropped (no surviving clean block at all)...
      if (cap == 20) {
        assert(!expected.exists { case (a, b, h) =>
          h == 0L && sigs(a.toInt)._2 == 0x0123456789abcdefL &&
            sigs(b.toInt)._2 == sigs(a.toInt)._2 },
          "clump pairs must be railed at cap=20")
        // ...while the hot-prefix pair IS expected (recovered through a
        // surviving clean block) — i.e. the two rules genuinely differ
        // on this fixture
        val legacy = expected.filter { case (a, b, _) =>
          val x = sigs(a.toInt)._2 ^ sigs(b.toInt)._2
          val blk = HammingPairKernel.firstCleanBlk(x)
          census((blk, chunk(sigs(a.toInt)._2, blk / 8) * 256 +
            chunk(sigs(a.toInt)._2, blk % 8))) <= cap
        }
        assert(legacy.size < expected.size,
          "fixture must contain a pair only the surviving rule emits")
      } else assert(expected.count(_._3 == 0L) >= 30 * 29 / 2)
    }
  }

  test("hamming all-blocks rule == executable model (the DEFAULT)") {
    val sigs = seededSigs
    val df = sigs.toDF("doc_id", "simhash")
    val cap = 20
    val census = hammingCensus(sigs)
    // legacy model: emitted iff the FIRST clean block's bucket survived
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
    val got = Dedup.hammingNearDupPairs(df, maxBucket = cap,
        survivingBlocks = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == got.toSet.size, "duplicate emission")
    assert(got.toSet == expected,
      s"missing=${expected -- got.toSet} extra=${got.toSet -- expected}")
    // the DEFAULT is the all-blocks rule (the surviving mask costs an
    // extra census pass — measured, see hammingNearDupPairs scaladoc);
    // pin it so a silent default flip is a conscious decision
    val gotDefault = Dedup.hammingNearDupPairs(df, maxBucket = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(gotDefault.toSet == expected, "default must be the all-blocks rule")
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
