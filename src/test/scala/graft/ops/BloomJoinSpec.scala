package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{BloomAgg, BloomAlgos}

class BloomJoinSpec extends SparkSpec {

  test("bloom bit math: inserted keys always probe true (no false negatives)") {
    val words = new Array[Long](1 << 10) // 2^16 bits
    val keys = (0L until 1000L).map(_ * 7919L + 13L)
    keys.foreach(k => BloomAlgos.set(words, k, 1 << 16, 5))
    assert(keys.forall(k => BloomAlgos.contains(k, words, 1 << 16, 5)))
  }

  test("bloom false-positive rate stays near the textbook estimate") {
    val bits = 1 << 16
    val words = new Array[Long](bits / 64)
    (0L until 1000L).foreach(k => BloomAlgos.set(words, k, bits, 5))
    // 1k keys in 64k bits, k=5 → (1-e^(-5000/65536))^5 ≈ 2.4e-6; allow
    // three orders of slack — the point is "prunes almost everything"
    val fp = (1000L until 101000L)
      .count(k => BloomAlgos.contains(k, words, bits, 5))
    assert(fp < 100, s"false positives: $fp / 100000")
  }

  test("BloomAgg bitmap equals a driver-side build (merge is a pure OR)") {
    import spark.implicits._
    val keys = (0L until 500L).map(_ * 31L + 7L)
    val agg = keys.toDF("k").repartition(4)
      .select(BloomAgg.bloomAgg(col("k"), 1 << 12, 4).as("w"))
      .head().getSeq[Long](0).toArray
    val local = new Array[Long]((1 << 12) / 64)
    keys.foreach(k => BloomAlgos.set(local, k, 1 << 12, 4))
    assert(agg.sameElements(local))
  }

  test("bloom-pruned semi join equals the plain semi join") {
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    val supplier = spark.read.parquet(s"$sf/supplier.parquet")
      .filter(col("s_nationkey") < 5)
    val bloomed = BloomJoin.semiJoin(
        lineitem, col("l_suppkey"), supplier, col("s_suppkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"))
    val plain = lineitem.join(supplier,
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"))
    assert(bloomed.count() > 0)
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
  }

  test("bloom semi join on STRING keys keeps every true match") {
    // pre-fix, the bloom hashed cast(key as long): a non-numeric string
    // casts to NULL, the probe returned NULL, and the filter silently
    // dropped rows the rescue join (raw-key equality) would have kept
    import spark.implicits._
    val big = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"),
      (4L, null: String)).toDF("id", "k")
    val small = Seq("alpha", "gamma", null).toDF("sk")
    val got = BloomJoin.semiJoin(big, col("k"), small, col("sk"))
      .select("id").collect().map(_.getLong(0)).toSet
    val plain = big.join(small, col("k") === col("sk"), "left_semi")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L) && got == plain,
      s"string-keyed bloom semi join diverged: got=$got plain=$plain")
  }

  test("bloom semi join auto-widens losslessly-coercible key types") {
    // xxhash64 hashes int and long differently; since r16 an
    // integral-vs-integral mismatch widens BOTH sides to long before
    // hashing (injective — one shared hash space), so the int-keyed
    // fact against a long-keyed dim keeps every true match
    import spark.implicits._
    val big = Seq((1L, 7), (2L, 8), (3L, 9)).toDF("id", "k") // int key
    val small = Seq(7L, 9L).toDF("sk") // long key
    val got = BloomJoin.semiJoin(big, col("k"), small, col("sk"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L),
      s"widened int-vs-long bloom semi join diverged: got=$got")
  }

  test("bloom semi join keeps ±0.0 and NaN matches on fractional keys") {
    // ADVICE r16 flagged a potential false negative: if xxhash64(-0.0)
    // differed from xxhash64(0.0) the probe could prune a 0.0 fact row
    // matching a -0.0 dim key that the rescue join's normalized equality
    // keeps. Spark's hash expressions normalize -0.0→0.0 (SPARK-26021)
    // and Double.doubleToLongBits canonicalizes NaN payloads, so the
    // build and probe spaces agree with join equality — this pins it
    // (and the float→double widening path) against regression.
    import spark.implicits._
    val nanA = java.lang.Double.longBitsToDouble(0x7ff8000000000000L)
    val nanB = java.lang.Double.longBitsToDouble(0x7ff8000000000001L)
    val big = Seq((1L, 0.0d), (2L, -0.0d), (3L, nanA), (4L, 1.5d))
      .toDF("id", "k")
    val small = Seq(-0.0d, nanB).toDF("sk")
    val plain = big.join(small, col("k") === col("sk"), "left_semi")
      .select("id").collect().map(_.getLong(0)).toSet
    val got = BloomJoin.semiJoin(big, col("k"), small, col("sk"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == plain && got == Set(1L, 2L, 3L),
      s"fractional-key bloom semi join diverged: got=$got plain=$plain")
    // widened branch: float dim against double fact, -0.0f → -0.0d
    val smallF = Seq(-0.0f).toDF("sk")
    val gotW = BloomJoin.semiJoin(big, col("k"), smallF, col("sk"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(gotW == Set(1L, 2L),
      s"float-vs-double ±0.0 bloom semi join diverged: got=$gotW")
  }

  test("bloom semi join REFUSES lossily-coercible key types") {
    // integral-vs-fractional coercion collapses distinct keys past 2⁵³
    // (and string-vs-numeric casts NULL) — still a loud failure
    import spark.implicits._
    val big = Seq((1L, 7)).toDF("id", "k") // int key
    val small = Seq(7.0d).toDF("sk") // double key
    val e = intercept[IllegalArgumentException] {
      BloomJoin.semiJoin(big, col("k"), small, col("sk"))
    }
    assert(e.getMessage.contains("key types must match"))
  }
}
