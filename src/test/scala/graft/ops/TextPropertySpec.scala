package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Randomized equivalence checks for the per-row text kernels that were
  * rewritten for the HOF re-evaluation fix (BENCH_NOTES r6): each is
  * pinned against a straightforward driver-side Scala reference over
  * generated documents — empty-ish, single-token, repetitive, and long. */
class TextPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // tiny vocabulary → heavy shingle/segment collisions
  val docGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 60)
    toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "cc", "ddd", "e"))
  } yield toks.mkString(" ")

  test("shingles (zip_with form) == naive reference, n in {1,2,3}") {
    val texts = samples(docGen, 300).distinct
    def reference(text: String, n: Int): Seq[String] = {
      val t = text.split(" ", -1).toSeq
      if (t.size < n) Seq(t.mkString(" "))
      else t.sliding(n).map(_.mkString(" ")).toSeq
    }.distinct
    for (n <- Seq(1, 2, 3)) {
      val got = texts.toDF("text")
        .select(col("text"), Dedup.shingles(col("text"), n).as("sh"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      texts.foreach { t =>
        assert(got(t) == reference(t, n).distinct,
          s"shingle mismatch for n=$n text='$t'")
      }
    }
  }

  test("chunkDocs covers every character exactly once per stride window") {
    val lens = samples(Gen.chooseNum(1, 400), 200).distinct
    val docs = lens.zipWithIndex
      .map { case (len, i) => (i.toLong, "x" * len) }
    val got = docs.toDF("doc_id", "text")
      .transform(d => TextAnalysis.chunkDocs(d, chunkChars = 96,
        stride = 64))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1)
    docs.foreach { case (id, text) =>
      val chunks = got(id).sortBy(_._2)
      // expected count from the closed form
      val expected = math.max(text.length - 96 + 64 - 1, 0) / 64 + 1
      assert(chunks.length == expected, s"count for len=${text.length}")
      // chunk i starts at i·stride and never overruns
      chunks.foreach { case (_, i, c) =>
        assert(c == text.slice((i * 64).toInt,
          (i * 64).toInt + 96))
      }
      // full coverage: last chunk reaches the end
      val last = chunks.last
      assert(last._2 * 64 + last._3.length == text.length.toLong)
    }
  }

  test("winnowFps (rolling hash + deque) == naive window-min reference") {
    val M = 1000000007L
    // the naive formulation the native expression replaced: hash every
    // k-gram independently, min over each clipped window, dedup in
    // selection order
    def reference(text: String, k: Int, w: Int): Seq[Long] = {
      val cps = text.codePoints().toArray
      if (cps.length < k) return Seq.empty
      val hs = (0 to cps.length - k).map(p =>
        (p until p + k).foldLeft(0L)((acc, i) => (acc * 31L + cps(i)) % M))
      val nw = math.max(hs.length - w + 1, 1)
      (0 until nw).map(i => hs.slice(i, i + w).min).distinct
    }
    // mixed alphabet incl. repeats (hash ties) and a non-ASCII char
    val gen: Gen[String] = for {
      n <- Gen.chooseNum(0, 120)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'a', ' ', 'z', 'é'))
    } yield cs.mkString
    val texts = samples(gen, 400).distinct
    for ((k, w) <- Seq((4, 5), (2, 3), (8, 4))) {
      val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .select(col("doc_id"), graft.functions.GraftFunctions
          .winnowFps(col("text"), k, w).as("fps"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong).sorted == reference(t, k, w).sorted,
          s"winnow mismatch k=$k w=$w text='$t'")
      }
    }
  }

  test("simHash62 (one-pass) == naive split+polyHash reference") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.StringAlgos
    // the naive reference tokenizes the DECLARED way — split(' ', -1)
    // keeping empty segments — and folds each token's polyHash2 bits
    // into the 62 counter lanes; the one-pass kernel must agree on
    // every string, including runs of spaces, leading/trailing spaces,
    // and supplementary-plane codepoints split across char pairs
    def reference(text: String): Long = {
      val counters = new Array[Int](62)
      text.split(" ", -1).foreach { tok =>
        val h = StringAlgos.polyHash2(UTF8String.fromString(tok))
        var j = 0
        while (j < 62) {
          counters(j) += (((h >>> j) & 1L).toInt << 1) - 1
          j += 1
        }
      }
      var out = 0L
      var j = 0
      while (j < 62) {
        if (counters(j) > 0) out |= 1L << j
        j += 1
      }
      out
    }
    val gen: Gen[String] = for {
      n <- Gen.chooseNum(0, 40)
      cs <- Gen.listOfN(n,
        Gen.oneOf("a", "b", " ", "  ", "é", "😀", "中", "z "))
    } yield cs.mkString
    val texts = samples(gen, 500).distinct ++
      Seq("", " ", "  ", "a", " a", "a ", "a  b", "😀 😀😀 ")
    texts.foreach { t =>
      assert(StringAlgos.simHash62(UTF8String.fromString(t)) ==
        reference(t), s"simHash62 mismatch for '$t'")
    }
  }
}
