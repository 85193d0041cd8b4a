package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token stats and quality on a fixture") {
    val df = Seq((1L, "the a of to in x"), (2L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val q = TextAnalysis.qualityScore(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toMap
    assert(q(1L) == ((6L, 5L, 183L, false))) // 5 of 6 stopwords → low quality
    assert(q(2L) == ((3L, 0L, 466L, false))) // 14 chars / 3 tokens; too short
  }

  test("tokenizer fertility: contractions and punctuation inflate per-lang") {
    val df = Seq(
      // en: "don't stop, won't stop!" → BPE-ish tokens: don|'t|_stop|,
      // |_won|'t|_stop|! = 8 over 4 whitespace words → fertility 2000
      (1L, "en", "don't stop, won't stop!"),
      // xx: plain words, one token per word → fertility 1000
      (2L, "xx", "alpha beta gamma"),
      (3L, "xx", "delta epsilon")).toDF("doc_id", "lang", "text")
    val r = TextAnalysis.tokenizerFertility(df).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(5)))).toMap
    assert(r("en") == ((1L, 4L, 8L, 2000L)))
    assert(r("xx") == ((2L, 5L, 5L, 1000L)))
  }

  test("markup strip: blocks dropped, tags stripped, entities decoded once") {
    val df = Seq(
      (1L, "<div><p>hello <b>world</b></p><script>var a=\"<x>\";</script></div>"),
      // &amp;lt; must decode to the LITERAL "&lt;", not double-decode to <
      (2L, "a &amp; b &amp;lt; c &#39;d&#39; &nbsp;e"),
      (3L, "plain text, no markup")).toDF("doc_id", "text")
    val r = TextAnalysis.stripMarkup(df).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getString(2)))).toMap
    // 9 tags in raw doc 1 (div p b /b /p script x /script /div — incl.
    // <x> inside the script); script CONTENT never reaches clean text
    assert(r(1L) == ((9L, "hello world")))
    assert(r(2L) == ((0L, "a & b &lt; c 'd' e")))
    assert(r(3L) == ((0L, "plain text, no markup")))
  }

  test("repetition stats: duplicate bigrams flag boilerplate") {
    val df = Seq(
      (1L, "buy now buy now buy now buy now"),   // 7 dup bigrams of 7
      (2L, "alpha beta gamma delta"),            // all distinct
      (3L, "solo"))                              // <2 tokens → zero bigrams
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(df).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getBoolean(5))).toMap
    assert(r(1L) == ((8L, 2L, 7L, 2L, true)))  // "buy now"/"now buy" only
    assert(r(2L) == ((4L, 4L, 3L, 3L, false)))
    assert(r(3L) == ((1L, 1L, 0L, 0L, false)))
  }

  test("PII redaction: counts and masks emails, phones, IPv4") {
    val df = Seq(
      (1L, "mail me at a.b@x.com or c@y.org thanks"),
      (2L, "call +852 91234567 from 10.0.0.1"),
      (3L, "nothing sensitive here"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(df).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3),
        x.getString(4))).toMap
    assert(r(1L) == ((2L, 0L, 0L, "mail me at <EMAIL> or <EMAIL> thanks")))
    assert(r(2L) == ((0L, 1L, 1L, "call <PHONE> from <IP>")))
    assert(r(3L) == ((0L, 0L, 0L, "nothing sensitive here")))
  }

  test("fingerprint: deterministic, shift-sensitive") {
    val df = Seq((1L, "abc"), (2L, "abc"), (3L, "acb")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprints(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
    // known value: ((0*31+97)*31+98)*31+99 = 96354 for "abc" codepoints
    assert(fp(1L) == ((97L * 31 + 98) * 31 + 99) % 1000000007L)
  }

  test("BPE-ish tokenizer: contractions, digit groups, punctuation runs") {
    import spark.implicits._
    val got = Seq("I'll say it's 2026, don't you?!")
      .toDF("text")
      .select(TextAnalysis.bpeTokens(col("text")).as("t"))
      .head().getSeq[String](0)
    // digit groups are bounded at 3 (the GPT-2-style number split):
    // "2026" → " 202" + "6"
    assert(got == Seq("I", "'ll", " say", " it", "'s", " 202", "6", ",",
      " don", "'t", " you", "?!"), got)
  }

  test("language ID on real multilingual vectors") {
    val vectors = Seq(
      ("the cat sat on the mat and it is happy", "en"),
      ("el perro y la casa de los amigos es grande", "es"),
      ("der hund und die katze ist ein tier", "de"),
      ("le chat et le chien est une belle chose", "fr"),
      ("這是一段中文文字 用來測試語言識別", "zh"),
      ("zzz qqq xxx", "unknown"))
    val got = vectors.map(_._1).toDF("text")
      .select(col("text"), TextAnalysis.langId(col("text")).as("lang"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    vectors.foreach { case (text, want) =>
      assert(got(text) == want, s"<$text> → ${got(text)}, want $want")
    }
  }

  test("zscoreOutliers flags the statistical outlier, exact-integer stats") {
    import spark.implicits._
    // group a: 10,10,10,10,100 -> mean 28, sd ~40.25: only 100 passes 1.5
    // group b: all equal -> sd 0, z = x/0 -> NaN, abs(NaN)>t is false
    val docs = Seq(
      (1L, "a", 10L), (2L, "a", 10L), (3L, "a", 10L), (4L, "a", 10L),
      (5L, "a", 100L), (6L, "b", 7L), (7L, "b", 7L))
      .toDF("doc_id", "lang", "n_chars")
    val got = TextAnalysis.zscoreOutliers(docs, threshold = 1.5)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(5L))
  }

  test("keywords: tf-idf rank prefers rare tokens, ties break by token") {
    import spark.implicits._
    // df: a=2 docs, b=1, c=1. doc1: b tf2 -> 2e6, a -> 5e5; doc2: c -> 1e6
    val docs = Seq((1L, "a b b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.keywords(docs, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3))).toMap
    assert(got((1L, 1L)) == ("b", 2000000L))
    assert(got((1L, 2L)) == ("a", 500000L))
    assert(got((2L, 1L)) == ("c", 1000000L))
    assert(got((2L, 2L)) == ("a", 500000L))
  }

  test("chunking: closed-form count, stride overlap, full coverage") {
    val df = Seq(
      (1L, "a" * 200), // (200-96+63) div 64 + 1 = 3 chunks
      (2L, "b" * 96),  // exactly one window
      (3L, "c" * 97),  // one char past → 2 chunks, second is 33 chars
      (4L, "d"))       // shorter than a window → 1 chunk of 1 char
      .toDF("doc_id", "text")
    val r = TextAnalysis.chunkDocs(df, chunkChars = 96, stride = 64)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> (x.getString(2), x.getLong(3)))
      .toMap
    assert(r.keySet.map(_._1).toSeq.sorted == Seq(1L, 2L, 3L, 4L))
    assert(r.count(_._1._1 == 1L) == 3 && r.count(_._1._1 == 2L) == 1 &&
      r.count(_._1._1 == 3L) == 2 && r.count(_._1._1 == 4L) == 1)
    assert(r((1L, 0L))._2 == 96L && r((1L, 1L))._2 == 96L)
    assert(r((1L, 2L))._2 == 72L)  // 200 - 2·64 = 72 trailing chars
    assert(r((3L, 1L))._2 == 33L)  // 97 - 64
    assert(r((4L, 0L)) == (("d", 1L)))
    // coverage: strides of 64 with 96-wide windows overlap by 32
    assert(r((1L, 0L))._1.length == 96 && r((1L, 1L))._1 == "a" * 96)
  }

  test("document gate: each reason bit fires on its own trigger") {
    val ok = (1 to 30).map(i => s"w$i").mkString(" ")  // 30 distinct tokens
    val df = Seq(
      (1L, ok),                                      // passes everything
      (2L, "tiny doc"),                              // bit 0: too short
      (3L, (1 to 30).map(_ => "the a of to in")
        .mkString(" ")),                             // bits 2+8: stopwords + repetitive
      (4L, Seq.fill(20)("abcdefghijklmnopqrstuvwxyz")
        .mkString(" ")))                             // bit 4: mean len 26 chars
      .toDF("doc_id", "text")
    val r = TextAnalysis.documentGate(df).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getBoolean(2))).toMap
    assert(r(1L) == ((0L, true)))
    assert((r(2L)._1 & 1L) == 1L && !r(2L)._2)
    assert((r(3L)._1 & 4L) == 4L && (r(3L)._1 & 8L) == 8L)
    assert((r(4L)._1 & 16L) == 16L)
  }

  test("posting lists: df exact, postings capped and ascending") {
    val df = Seq(
      (3L, "x y"), (1L, "x y z"), (2L, "x"), (4L, "x x x"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.postingLists(df, cap = 2).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getString(2))).toMap
    // within-doc repeats count once (array_distinct before explode)
    assert(r("x") == ((4L, "1,2")))  // df 4, capped at the 2 lowest ids
    assert(r("y") == ((2L, "1,3")))
    assert(r("z") == ((1L, "1")))
  }

  test("skipgram counts: window pairs, boundary-safe") {
    val docs = Seq((1L, "a b c d"), (2L, "x")).toDF("doc_id", "text")
    val r = TextAnalysis.skipgramCounts(docs, window = 2, minCount = 1)
      .collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    // forward pairs within distance 2: ab ac bc bd cd — single-token
    // doc contributes nothing
    assert(r == Map(("a", "b") -> 1L, ("a", "c") -> 1L, ("b", "c") -> 1L,
      ("b", "d") -> 1L, ("c", "d") -> 1L))
  }

  test("hash features: counts land in hash slots, row sums preserved") {
    val docs = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    val r = TextAnalysis.hashFeatures(docs, dim = 8).collect()
      .map(x => x.getLong(0) ->
        x.getString(1).split(",").map(_.toLong)).toMap
    assert(r(1L).length == 8 && r(1L).sum == 3L) // every token lands once
    assert(r(2L).sum == 1L)
    assert(r(1L).max == 2L) // both "a"s share one slot
  }

  test("lm counts: continuation counts are distinct-neighbor counts") {
    val docs = Seq((1L, "a b"), (2L, "c b"), (3L, "a b"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.lmCounts(docs).collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r("a") == ((2L, 0L, 1L))) // 2 occurrences, follows nothing, precedes {b}
    assert(r("b") == ((3L, 2L, 0L))) // preceded by {a, c} — 2 TYPES, not 3 tokens
    assert(r("c") == ((1L, 0L, 1L)))
  }

  test("bpe training: classic merge chain on the textbook corpus") {
    // low×5 lower×2 newest×6 widest×3 — the standard BPE walkthrough
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, nMerges = 4).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3))).toMap
    // (e,s)=9 ties (s,t)=9 → lexicographic l wins; then es+t, l+o, lo+w
    assert(merges(1L) == (("e", "s", 9L)))
    assert(merges(2L) == (("es", "t", 9L)))
    assert(merges(3L) == (("l", "o", 7L)))
    assert(merges(4L) == (("lo", "w", 7L)))
  }

  test("bpe batched training: equals serial when rounds don't conflict") {
    // four disjoint two-letter words: every round's candidates share no
    // symbols and merging one never changes another's count, so the
    // batched induction must reproduce the serial table EXACTLY —
    // ranks, counts, and all — in a single distributed round
    val text = (Seq.fill(10)("ab") ++ Seq.fill(8)("cd") ++
      Seq.fill(6)("ef") ++ Seq.fill(4)("gh")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    def table(batch: Int) =
      TextAnalysis.bpeTrain(docs, nMerges = 4, batchSize = batch)
        .collect().sortBy(_.getLong(0))
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSeq
    val serial = table(1)
    assert(serial == Seq((1L, "a", "b", 10L), (2L, "c", "d", 8L),
      (3L, "e", "f", 6L), (4L, "g", "h", 4L)))
    assert(table(4) == serial, "conflict-free batching must be lossless")
  }

  test("bpe overlap convention: ' a b a b ' merges once, survivor " +
      "merges next round") {
    // the convention the scaladoc documents (occurrences sharing a
    // delimiter space merge in a later round if their pair wins again),
    // executable: word "abab" → sym "a b a b"; pair counting sees BOTH
    // (a,b) occurrences (cnt 2·freq) but left-to-right non-overlapping
    // application consumes the middle space, merging only the first →
    // "ab a b". Next round (a,b) cnt=freq TIES (ab,a) cnt=freq; the
    // lexicographic (l, r) tie-break picks (a,b) — the shared-delimiter
    // SURVIVOR merges → "ab ab"; finally (ab,ab). The same pair at two
    // ranks is the signature the oracle fixture q_bpe_overlap replays
    // in DuckDB over the identical corpus.
    val docs = Seq((1L, "abab abab abab")).toDF("doc_id", "text")
    def table(batch: Int) =
      TextAnalysis.bpeTrain(docs, nMerges = 3, batchSize = batch)
        .collect().sortBy(_.getLong(0))
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSeq
    val serial = table(1)
    assert(serial == Seq((1L, "a", "b", 6L), (2L, "a", "b", 3L),
      (3L, "ab", "ab", 3L)), s"overlap convention broke: $serial")
    // batched: each round's runner-up shares a symbol with the winner
    // ((b,a) then (ab,a) — prefix-disjoint rejects both), so batch=4
    // must walk the exact serial chain
    assert(table(4) == serial, "batched induction diverged on overlaps")
  }

  test("bpe batched training: prefix-disjoint rule defers conflicts") {
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    def table(batch: Int) =
      TextAnalysis.bpeTrain(docs, nMerges = 4, batchSize = batch)
        .collect().sortBy(_.getLong(0))
        .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // batch 2: round 1 sees (e,s)=9 and (s,t)=9, but (s,t) shares `s`
    // with the higher-ranked winner — deferred; it re-wins round 2 as
    // (es,t) alongside the now-disjoint (l,o). Three rounds reproduce
    // the serial table exactly (0.75 rounds/merge, zero divergence).
    assert(table(2) == Seq(("e", "s", 9L), ("es", "t", 9L),
      ("l", "o", 7L), ("lo", "w", 7L)))
    assert(table(2) == table(1))
    // batch 4: round 1 accepts {(e,s), (l,o)} — (s,t) and (w,e) are
    // shadowed — and round 2 accepts {(es,t), (lo,w)}: 2 rounds for 4
    // merges (0.5 rounds/merge). The SAME four merges arrive in a
    // different rank order — the documented batched-BPE trade: counts
    // stay the winners' pre-batch counts, order interleaves
    assert(table(4) == Seq(("e", "s", 9L), ("l", "o", 7L),
      ("es", "t", 9L), ("lo", "w", 7L)))
  }

  test("bpe encode: trained merges compress the corpus they came from") {
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, nMerges = 4).collect()
      .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = TextAnalysis.bpeEncode(docs, merges).collect().head
    // after (e,s), (es,t), (l,o), (lo,w):
    //   low → "low" (1 sym), lower → "low e r" (3), newest → "n e w est"
    //   (4), widest → "w i d est" (4)
    assert(enc.getLong(1) == 16L) // words
    assert(enc.getLong(2) == 5 * 1 + 2 * 3 + 6 * 4 + 3 * 4)
    // no merges → pure character count
    val raw = TextAnalysis.bpeEncode(docs, Nil).collect().head
    assert(raw.getLong(2) ==
      (5 * 3 + 2 * 5 + 6 * 6 + 3 * 6))
  }

  test("pmi bigrams: true collocation outranks chance co-occurrence") {
    // "new york" always adjacent; tokN fillers rotate
    val docs = (1 to 30).map(i =>
      (i.toLong, s"new york tok${i % 3} tok${(i + 1) % 3}"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.pmiBigrams(docs, minCount = 5, topK = 10).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5))).toMap
    // n_xy=30, n_x=n_y=30, N=120 → 30·120·1000 / 900 = 4000
    assert(r(("new", "york")) == ((30L, 30L, 30L, 4000L)))
    assert(r.values.map(_._4).max == 4000L) // nothing outranks it
  }

  test("domain score: target-domain tokens outrank off-domain, exact fp") {
    val raw = Seq((1L, "k k"), (2L, "z z")).toDF("doc_id", "text")
    val target = Seq((9L, "k")).toDF("doc_id", "text")
    // c_raw(k)=2, c_tgt(k)=1 → fp = 2·10⁶ // 3 = 666666
    // c_raw(z)=2, c_tgt(z)=0 → fp = 1·10⁶ // 3 = 333333
    val r = TextAnalysis.domainScore(raw, target).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r(1L) == ((2L, 1333332L, 666666L)))
    assert(r(2L) == ((2L, 666666L, 333333L)))
    // ranking property: the on-domain doc strictly outranks
    assert(r(1L)._3 > r(2L)._3)
  }

  test("linear score: hash-slot weight lookup, exact integer sum") {
    // polyHash("a") = 97 → slot 1; polyHash("b") = 98 → slot 0 (dim 2)
    val docs = Seq((1L, "a b a"), (2L, "a a"), (3L, ""))
      .toDF("doc_id", "text")
    val r = TextAnalysis.linearScore(docs, dim = 2,
        weights = Seq(10L, -3L))
      .collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getBoolean(3))).toMap
    assert(r(1L) == ((3L, 4L, true)))   // -3 + 10 - 3
    assert(r(2L) == ((2L, -6L, false)))
    // empty text → one "" token → polyHash("") = 0 → slot 0
    assert(r(3L) == ((1L, 10L, true)))
  }

  test("lm score: hand-computed add-one fixed point, short docs score 0") {
    val docs = Seq((1L, "a b a b"), (2L, "z z"), (3L, "q"))
      .toDF("doc_id", "text")
    // unigrams a:2 b:2 z:2 q:1 → V=4
    // fp(a,b) = (2+1)·10⁶ // (2+4) = 500000; fp(b,a) = (1+1)·10⁶ // 6 =
    // 333333; fp(z,z) = (1+1)·10⁶ // 6 = 333333
    val r = TextAnalysis.lmScore(docs).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r(1L) == ((3L, 1333333L, 444444L)))
    assert(r(2L) == ((1L, 333333L, 333333L)))
    assert(r(3L) == ((0L, 0L, 0L))) // no bigrams → zero evidence, kept
  }

  test("lexical diversity: hand-computed types/hapax, boundary runs") {
    val docs = Seq(
      (1L, "a b a c"),   // 4 toks, 3 types, hapax {b, c}
      (2L, "x x x"),     // 3 toks, 1 type, 0 hapax
      (3L, "only"))      // singleton: 1/1/1, ratios 1000
      .toDF("doc_id", "text")
    val r = TextAnalysis.lexicalDiversity(docs).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
          x.getLong(5))).toMap
    assert(r(1L) == ((4L, 3L, 2L, 750L, 500L)))
    assert(r(2L) == ((3L, 1L, 0L, 333L, 0L)))
    assert(r(3L) == ((1L, 1L, 1L, 1000L, 1000L)))
  }

  test("winnowing: guarantee — shared substring >= w+k-1 shares a fp") {
    val shared = "the quick brown fox jumps"   // 25 chars >= 5+4-1
    val docs = Seq(
      (1L, s"AAAA $shared BBBB"),
      (2L, s"zzzz $shared qqqq"),
      (3L, "completely unrelated text here"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.winnow(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty,
      "docs sharing a long substring must share a selected fingerprint")
    // distinctness inside a doc
    assert(fps.distinct.length == fps.length)
  }

  test("winnow pairs: shared chunk pairs up, boilerplate df-rail drops") {
    val chunk = "a genuinely distinctive shared passage of text"
    val boiler = "standard footer"   // in EVERY doc → df over the rail
    val docs = Seq(
      (1L, s"one $chunk end $boiler"),
      (2L, s"two start $chunk $boiler"),
      (3L, s"three unrelated content entirely $boiler"),
      (4L, s"four other words altogether $boiler"))
      .toDF("doc_id", "text")
    // maxDf=3 < 4 docs: every boilerplate-only fp is suppressed, so only
    // the chunk-sharing pair survives minShared
    val got = TextAnalysis.winnowCandidatePairs(docs, maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)), "chunk-sharing pair must be reported")
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L || p._2 == 4L),
      s"boilerplate-only overlap must not pair docs: $got")
  }

  test("winnow canonical: chunk-reordered near-dup lands in the right " +
      "cluster, transitivity holds, non-fingerprintable docs self-label") {
    // winnowing pairs on shared 4-GRAMS, so anything meant to stay
    // unpaired must be alphabet-disjoint, not just "different words" —
    // ordinary English fragments (ent-, ing-) pair everything up
    val s1 = "alpha whale jumping across frozen rivers quickly"
    val s2 = "beta melon garden behind bright summer skyline"
    val s3 = "gamma violet thunder rolls over distant canyons"
    val s4 = "xqxq wvwv kzkz xwxw vkvk zxzx qwqw"
    val docs = Seq(
      (1L, s"$s1 $s2 $s3"),
      (2L, s"$s3 $s2 $s1"),          // chunk-REORDERED copy of doc 1
      (3L, s"$s3 $s4"),              // shares s3 with 1/2, s4 with 4
      (4L, s"$s4 jjuu ujju juju uujj"),
      (5L, "mgmg gmmg ggmm mmgg gmgm"),
      (6L, "ab"))                    // below k=4: no fingerprints at all
      .toDF("doc_id", "text")
    val got = TextAnalysis.winnowCanonical(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1↔2 share every chunk (order-independent — winnowing is LOCAL);
    // 3 reaches the cluster via s3; 4 only via 3 (no substring shared
    // with 1/2) — pure transitivity
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L && got(4L) == 1L,
      s"chunk-overlap chain must collapse to canonical 1: $got")
    assert(got(5L) == 5L, "singletons label themselves")
    assert(got(6L) == 6L, "too-short docs still appear, self-labeled")
    assert(got.size == 6, "canonical map must cover every document")
    // sanity: 1-4 is genuinely transitive, not a direct 1-4 pair
    val pairs = TextAnalysis.winnowCandidatePairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((2L, 4L)),
      s"fixture broken: 4 must only connect through 3, got $pairs")
    graft.ops.Stage.releaseAll(spark)
  }

  test("vocab overlap: hand-computed Jaccard, a<b ordering, no self-pair") {
    val docs = Seq(
      ("web", "a b c"), ("web", "c d"),      // vocab {a,b,c,d}
      ("book", "c d e"),                     // vocab {c,d,e}
      ("code", "x y"))                       // vocab {x,y} — disjoint
      .toDF("source", "text")
    val r = TextAnalysis.vocabOverlap(docs).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5))).toMap
    // book<web: common {c,d}=2, sizes 3/4, J = 2/5 = 400
    assert(r(("book", "web")) == ((2L, 3L, 4L, 400L)))
    // disjoint pairs get an EXPLICIT zero row (r13): a missing pair is
    // indistinguishable from "not computed", and zero-overlap pairs are
    // the redundancy-free signal mixing planning looks for
    assert(r.size == 3, r.keySet.toString)
    assert(r(("book", "code")) == ((0L, 3L, 2L, 0L)))
    assert(r(("code", "web")) == ((0L, 2L, 4L, 0L)))
    graft.ops.Stage.releaseAll(spark)
  }

  test("strip markup: multi-line and uppercase script blocks drop wholesale") {
    val docs = Seq(
      (1L, "<script>\nvar x = 1;\nalert(x);\n</script>Hello"),
      (2L, "<STYLE>\np { color: red }\n</STYLE>World"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.stripMarkup(docs).collect()
      .map(x => x.getLong(0) -> x.getString(2)).toMap
    assert(r(1L) == "Hello", s"script code leaked: '${r(1L)}'")
    assert(r(2L) == "World", s"style rules leaked: '${r(2L)}'")
  }

  test("langId: empty text is unknown, not zh") {
    val r = TextAnalysis.langIds(
        Seq((1L, ""), (2L, "的 是 了 在 中 文")).toDF("doc_id", "text"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) == "unknown", r.toString)
    assert(r(2L) == "zh") // the CJK shortcut still fires on real CJK
  }

  test("fertility: an all-empty language reports zeros, not a crash") {
    val docs = Seq(("xx", ""), ("xx", ""), ("en", "the cat sat"))
      .toDF("lang", "text")
    val r = TextAnalysis.tokenizerFertility(docs).collect()
      .map(x => x.getString(0) -> (x.getLong(5), x.getLong(6))).toMap
    // ANSI mode would have thrown DIVIDE_BY_ZERO on the xx group; note
    // split("") is Array("") so n_words=2 but n_bpe_tokens=0 — the
    // chars-per-token ratio is the guarded one here
    assert(r("xx") == ((0L, 0L)), r.toString)
    assert(r("en")._1 > 0L)
  }

  test("redact: dashed/plus-addressed emails redact fully") {
    val r = TextAnalysis.redactPii(
        Seq((1L, "mail john-doe+spam@x.com now")).toDF("doc_id", "text"))
      .collect().head
    assert(r.getLong(1) == 1L)
    assert(r.getString(4) == "mail <EMAIL> now",
      s"PII fragment leaked: '${r.getString(4)}'")
  }

  test("chunkDocs: odd column names parse; NULL text keeps chunk 0") {
    val docs = Seq((1L, "abcdef"), (2L, null: String))
      .toDF("doc_id", "page text")
    val r = TextAnalysis.chunkDocs(docs, chunkChars = 4, stride = 2,
        textCol = "page text").collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        Option(x.getString(2))).toMap
    assert(r((1L, 0L)) == Some("abcd") && r((1L, 1L)) == Some("cdef"))
    // NULL-text doc stays joinable: one chunk-0 row with NULL text
    assert(r.contains((2L, 0L)) && r((2L, 0L)).isEmpty, r.toString)
  }

  test("keywords: shuffle-join path (broadcastVocab=false) is identical") {
    val docs = Seq((1L, "a a b c"), (2L, "b b c d")).toDF("doc_id", "text")
    def out(b: Boolean) = TextAnalysis.keywords(docs, k = 2,
        broadcastVocab = b).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getLong(3)))
      .toSet
    assert(out(true) == out(false))
  }

  test("winnowing: short docs — below k dropped, below w one window") {
    val docs = Seq((1L, "abc"), (2L, "abcde")).toDF("doc_id", "text")
    val r = TextAnalysis.winnow(docs, k = 4, w = 5).collect()
    assert(!r.exists(_.getLong(0) == 1L), "len<k has no k-gram")
    // len 5, k 4 → 2 k-grams < w → exactly one clipped window → 1 fp
    assert(r.count(_.getLong(0) == 2L) == 1)
  }
}
