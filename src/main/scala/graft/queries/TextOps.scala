package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.GraftFunctions.{capwords, nfcNormalize}
import graft.functions.TopKAgg
import graft.ops.{Sessionize, TextAnalysis}
import graft.osm.PhoneFix

/** Oracle-backed queries exercising the string/cleaning operators (C1-C9)
  * and the text-analysis + sessionization ops on the synthetic tables.
  *
  * The phone-canonicalization query synthesizes deterministic phone-shaped
  * inputs from event ids with the SAME expression on both sides, then the
  * oracle re-states the reference's canonicalization cascade in DuckDB SQL —
  * a full cross-engine check of C6-C9.
  */
object TextOps {

  /** C1 — capwords over part names (native Catalyst expression). */
  def capwordsQuery(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).part
      .select(col("p_partkey"), capwords(col("p_name")).as("cap_name"))

  /** C6-C9 — phone canonicalization over synthesized inputs. */
  def phoneCanon(s: SparkSession, dir: String): DataFrame = {
    val d8 = (lit(20000000L) + (col("event_id") * 137) % 80000000L)
      .cast("string")
    val raw = when(col("event_id") % 6 === 0, d8)
      .when(col("event_id") % 6 === 1,
        concat(lit("852-"), d8, lit(","), d8))
      .when(col("event_id") % 6 === 2,
        concat(lit("+852 "), substring(d8, 1, 4), lit(" "),
          substring(d8, 5, 4)))
      .when(col("event_id") % 6 === 3, concat(lit("13"), d8, lit("7")))
      .when(col("event_id") % 6 === 4,
        concat(lit("+86 0755-"), substring(d8, 1, 7)))
      .otherwise(concat(lit("no phone "), d8, lit("x")))
    Tables(s, dir).events
      .select(col("event_id"), raw.as("raw"))
      .withColumn("fixed", PhoneFix.fixPhoneValue(col("raw")))
  }

  /** Token/char counts (text analysis). */
  def tokenStats(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenStats(Tables(s, dir).documents)

  /** The Unicode-whitespace mode of TextAnalysis.tokens (`"(?U)\\s+"` —
    * what real text needs): the corpus is re-separated with a per-doc mix
    * of tab / NBSP / multi-space runs, then tokenized Unicode-aware,
    * recovering exactly the original tokens (count + total chars pin the
    * content). The DuckDB oracle replays the injection and splits on the
    * explicit `[tab NBSP space]+` class — RE2 has no `(?U)\s`, and the
    * class covers precisely the separators injected. */
  def tokenUnicode(s: SparkSession, dir: String): DataFrame = {
    val sep = when(col("doc_id") % 3 === 0, lit("\t"))
      .when(col("doc_id") % 3 === 1, lit("\u00a0"))
      .otherwise(lit("  "))
    val toks = TextAnalysis.tokens(col("messy"), "(?U)\\s+")
    Tables(s, dir).documents
      .select(col("doc_id"),
        regexp_replace(col("text"), lit(" "), sep).as("messy"))
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        aggregate(transform(toks, t => length(t).cast("long")),
          lit(0L), (a, x) => a + x).as("sum_token_chars"))
  }

  /** Quality scoring (integer-only outputs for oracle parity). */
  def quality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityScore(Tables(s, dir).documents)

  /** Rolling-hash fingerprints. */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprints(Tables(s, dir).documents)

  /** Lexical-diversity gates (TTR / hapax ratio, integer-scaled). */
  def lexicalDiv(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.lexicalDiversity(Tables(s, dir).documents)

  /** Winnowing (MOSS) fingerprint selection, k=4 w=5. */
  def winnowQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.winnow(Tables(s, dir).documents)

  /** MOSS pairing: shared-winnow-fp candidate pairs, df-rail 50. */
  def winnowPairs(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.winnowCandidatePairs(Tables(s, dir).documents)

  /** MOSS canonical clusters: verified pairs → components → label map. */
  def winnowCanonicalQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.winnowCanonical(Tables(s, dir).documents)

  /** Pairwise source-vocabulary Jaccard (mixture-planning diagnostic). */
  def vocabOverlapQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabOverlap(Tables(s, dir).documents)

  /** Language ID over the synthetic docs (rows-only: the corpus vocabulary
    * is English-ish regardless of the synthetic lang label; real accuracy
    * is asserted on multilingual vectors in TextAnalysisSpec). */
  def langId(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.langIds(Tables(s, dir).documents)

  /** Gap-based sessionization per user. */
  def sessionize(s: SparkSession, dir: String): DataFrame =
    Sessionize.sessionStats(Tables(s, dir).events)

  /** Hourly tumbling-window histogram. */
  def hourly(s: SparkSession, dir: String): DataFrame =
    Sessionize.hourlyHistogram(Tables(s, dir).events)

  /** Trailing-1h per-user rolling features (RANGE-frame window). */
  def rolling(s: SparkSession, dir: String): DataFrame =
    Sessionize.rollingUserStats(Tables(s, dir).events)

  /** Purchase → containing-session attribution (interval join). */
  def sessionAttrib(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir).events
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    Sessionize
      .attributeToSessions(purchases, Sessionize.sessionIntervals(ev))
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("session_id"), col("session_n_events"))
  }

  /** Bounded-interval click→purchase attribution pairs — the batch form
    * of the watermarked stream-stream interval join
    * ([[graft.streaming.EventStream.clickAttribution]], same predicate;
    * EventStreamSpec pins the pair-set equality). */
  def clickAttrib(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir).events
    graft.ops.Sessionize.attributionPairs(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "click"))
  }

  /** Two-phase salted aggregation — must equal the plain groupBy (the
    * oracle IS the unsalted SQL), demonstrating the hot-key scale path.
    * value summed is integral (event props k) so the compare stays exact:
    * use count only plus an integral sum of event_id for determinism. */
  def saltedAgg(s: SparkSession, dir: String): DataFrame =
    graft.ops.Salting.saltedCountSum(
      Tables(s, dir).events.withColumn("eid", col("event_id")),
      keyCol = "event_type", spreadCol = "event_id", valueCol = "eid")

  /** Gopher-style repetition signals over the documents table. */
  def repetition(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionStats(Tables(s, dir).documents)

  /** PII scrub demo: the synthetic corpus carries no PII, so each doc gets
    * one deterministic planted item (email / phone / IPv4 by doc_id mod 3
    * — the same injection is replayed in the DuckDB oracle) and the
    * redaction cascade must find and mask exactly that. */
  def redact(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir).documents
    val planted = d.select(col("doc_id"),
      concat(col("text"), lit(" contact "),
        when(col("doc_id") % 3 === 0,
          concat(lit("user"), col("doc_id").cast("string"),
            lit("@mail.example")))
          .when(col("doc_id") % 3 === 1,
            concat(lit("+852 9"),
              lpad(((col("doc_id") * 37) % 10000000).cast("string"), 7, "0")))
          .otherwise(concat(lit("10.0."),
            (col("doc_id") % 256).cast("string"), lit("."),
            ((col("doc_id") * 7) % 256).cast("string")))).as("text"))
    TextAnalysis.redactPii(planted)
  }

  /** Markup-extraction demo: the synthetic corpus is plain text, so each
    * doc gets deterministic planted markup (three variants by doc_id mod
    * 3 — nested tags + a script block / inline tags + entities / a style
    * block) and the strip cascade must recover exactly the original
    * content plus the decoded entity text. Injection replayed verbatim
    * in the DuckDB oracle, like q_redact. */
  def stripMarkup(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir).documents
    val planted = d.select(col("doc_id"),
      when(col("doc_id") % 3 === 0,
        concat(lit("<div class=\"a\"><p>"), col("text"),
          lit("</p><script>var x=1;</script></div>")))
        .when(col("doc_id") % 3 === 1,
          concat(lit("<b>Title</b> "), col("text"),
            lit(" &amp; more &lt;tail&gt;")))
        .otherwise(
          concat(lit("<style>p{color:red}</style><span>"), col("text"),
            lit("&nbsp;end</span>"))).as("text"))
    TextAnalysis.stripMarkup(planted)
  }

  /** Composed RAG ingest: chunk → hash-feature → shard assignment. */
  def ragIngest(s: SparkSession, dir: String): DataFrame =
    graft.ops.Retrieval.ragIngest(Tables(s, dir).documents)

  /** Per-language tokenizer fertility / compression audit. */
  def fertility(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenizerFertility(Tables(s, dir).documents)

  /** BPE-ish token counting (see TextAnalysis.BpeTokenRe). */
  def tokenBpe(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeTokenStats(Tables(s, dir).documents)

  /** Deterministic hash-based train/valid/test split sizes. */
  def trainSplit(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.splitCounts(Tables(s, dir).documents)

  /** Top-100 corpus vocabulary. */
  def vocabTopK(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabulary(Tables(s, dir).documents)

  /** Train→test contamination over the deterministic split. */
  def contamination(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.contamination(
      Tables(s, dir).documents
        .withColumn("split", TextAnalysis.splitAssign(col("doc_id"))))

  /** Unicode NFC normalization (native expression): decomposed sequences
    * are synthesized onto each document ("e"+U+0301, "A"+U+030A) so the
    * composition is observable — the raw text is ASCII and NFC-invariant.
    * Char counts before/after prove the combining marks fused. */
  def nfcNorm(s: SparkSession, dir: String): DataFrame = {
    val raw = concat(substring(col("text"), 1, 40), lit("e\u0301A\u030A"))  // decomposed: e+COMBINING ACUTE, A+COMBINING RING
    Tables(s, dir).documents
      .select(col("doc_id"), nfcNormalize(raw).as("norm"),
        length(raw).cast("long").as("len_raw"),
        length(nfcNormalize(raw)).cast("long").as("len_norm"))
  }

  /** Per-language z-score outlier gate over document length. 1.5σ keeps
    * enough rows (58 at sf0.01) for a meaningful hash compare. */
  def zscore(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.zscoreOutliers(Tables(s, dir).documents, threshold = 1.5)

  /** Quartile gate: keep each language's longest quarter of documents.
    * `ntile` is rank-based — no float statistics — so the gate is exact
    * and engine-portable; the (n_chars, doc_id) order is a total order,
    * which makes bucket edges deterministic.
    *
    * Scale posture: exact ntile requires a per-language total order, so
    * each language sorts in one WindowExec task — fine for bounded
    * per-group sizes, wrong when one group is the whole corpus. The
    * 100 TB form of this GATE is a quantile THRESHOLD: compute each
    * language's 75th-percentile length with the distributed quantile
    * sketch (ops.Sketches, `q_quantiles`) and filter `n_chars >= t` —
    * one partial-aggregated pass, no per-group sort, at the cost of
    * sketch-precision tile edges. */
  def ntileGate(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents
      .withColumn("tile", ntile(4).over(
        Window.partitionBy(col("lang"))
          .orderBy(col("n_chars"), col("doc_id"))))
      .filter(col("tile") === 4)
      .select(col("doc_id"), col("lang"), col("n_chars"))

  /** Per-language top-3 documents by length via the native TopKAgg — each
    * map task reduces its slice to ≤ k entries before the shuffle, versus
    * the rank-window form that shuffles and sorts EVERY row per group. */
  def groupTopK(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents
      .groupBy(col("lang"))
      .agg(TopKAgg.topKBy(col("n_chars").cast("double"), col("doc_id"), 3)
        .as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("_i", "e")))
      .select(col("lang"), (col("_i") + 1).cast("long").as("rk"),
        col("e.id").as("doc_id"), col("e.score").cast("long").as("n_chars"))

  /** Sliding 1h/30m window histogram (each event in exactly 2 windows). */
  def hopping(s: SparkSession, dir: String): DataFrame =
    Sessionize.hoppingHistogram(Tables(s, dir).events)

  /** Per-document tf-idf keyword extraction (top-2 tokens). */
  def keywordsQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.keywords(Tables(s, dir).documents)

  /** Funnel-stage distribution over a deterministic 1-in-11 event sample
    * (the full stream is dense enough that EVERY user completes the
    * funnel — one output row proves nothing; the thinned stream spreads
    * users across all four stages at sf0.01). */
  def funnel(s: SparkSession, dir: String): DataFrame =
    Sessionize.funnelStages(
      Tables(s, dir).events.filter(col("event_id") % 11 === 0))

  /** Overlapping 96/64 character chunking (RAG window preparation). */
  def chunk(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunkDocs(Tables(s, dir).documents,
      chunkChars = 96, stride = 64)

  /** Top-25 PMI bigram collocations (min count 5). */
  def pmi(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.pmiBigrams(Tables(s, dir).documents,
      minCount = 5, topK = 25)

  /** Reason-coded composite document gate. */
  def docGate(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.documentGate(Tables(s, dir).documents)

  /** Eight BPE merge-induction rounds over the corpus vocabulary. */
  def bpeTrain(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeTrain(Tables(s, dir).documents, nMerges = 8)

  /** The same 8 merges induced in top-4 prefix-disjoint BATCHES per
    * round (~nMerges/batch distributed rounds — the driver-iteration
    * lever for tokenizer-scale merge counts; the oracle replays the
    * batched rule independently, argmax window and all). */
  def bpeTrainBatched(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeTrain(Tables(s, dir).documents, nMerges = 8,
      batchSize = 4)

  /** The BPE overlap convention as an EXECUTABLE cross-engine fixture
    * (VERDICT r15 #5): on the word "abab" (sym " a b a b ") the winning
    * pair (a, b) occurs twice but the occurrences SHARE the middle
    * delimiter space, so left-to-right non-overlapping application
    * merges only the first — the survivor merges the NEXT round when
    * (a, b) wins again (tie vs (ab, a) broken lexicographically).
    * Expected table: (1, a, b, 6), (2, a, b, 3), (3, ab, ab, 3) — the
    * same pair at two ranks is the convention's signature. The corpus
    * is inline (three copies of the word), and the DuckDB oracle replays
    * its own induction over the identical VALUES corpus — both engines
    * EXECUTE the convention instead of merely documenting it
    * (TextAnalysis.bpeTrain scaladoc). */
  def bpeOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TextAnalysis.bpeTrain(
      Seq((1L, "abab abab abab")).toDF("doc_id", "text"), nMerges = 3)
  }

  /** Encode the corpus with the trained merges (encode-vocab-once +
    * occurrence join). The merge table is driver metadata, memoized per
    * (session, dir); the oracle replays the induction independently and
    * joins words to ITS final vocabulary — so training and encoding are
    * cross-checked end to end. */
  private val mergeCache = new graft.ops.SessionScoped[Seq[(String, String)]]
  def bpeEncode(s: SparkSession, dir: String): DataFrame = {
    val merges = mergeCache.getOrCompute(s, dir)(
      TextAnalysis.bpeTrain(Tables(s, dir).documents, nMerges = 8)
        .orderBy(col("rank")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq)
    TextAnalysis.bpeEncode(Tables(s, dir).documents, merges)
  }

  /** Kneser-Ney count tables over the corpus. */
  def lmCounts(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.lmCounts(Tables(s, dir).documents)

  /** Fixed-point add-one bigram fluency score per document. */
  def lmScore(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.lmScore(Tables(s, dir).documents)

  /** Pretrained linear classifier (integer weights, 32 hash slots). */
  def linearScore(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.linearScore(Tables(s, dir).documents)

  /** DSIR-style domain relevance: target = the English subset. */
  def domainScore(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir).documents
    TextAnalysis.domainScore(docs, docs.filter(col("lang") === "en"))
  }

  /** ±3-window skip-gram co-occurrence counts (min count 5). */
  def skipgrams(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.skipgramCounts(Tables(s, dir).documents,
      window = 3, minCount = 5)

  /** 32-dim hashing-trick count features per document. */
  def hashFeats(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.hashFeatures(Tables(s, dir).documents, dim = 32)

  /** BM25 top-10 retrieval for a fixed term bag (integer-exact scoring). */
  def bm25(s: SparkSession, dir: String): DataFrame =
    graft.ops.Retrieval.bm25(Tables(s, dir).documents,
      graft.ops.Retrieval.DefaultTerms, k = 10)

  /** Gold positives for the hard-negative query: the two TOP-ranked
    * docs of q_bm25 at the oracle sf (so the exclusion provably bites —
    * the result's head differs from q_bm25's). Fixed literals, shared
    * with the oracle rendering. */
  val HardNegPositives: Seq[Long] = Seq(296L, 97L)

  /** Top-10 BM25 hard negatives after excluding the gold positives. */
  def hardNegatives(s: SparkSession, dir: String): DataFrame =
    graft.ops.Retrieval.hardNegatives(Tables(s, dir).documents,
      graft.ops.Retrieval.DefaultTerms, HardNegPositives, k = 10)

  /** OOV rate against the corpus's own top-20 vocabulary (small enough
    * that the synthetic corpus has real OOV mass). */
  def oovRate(s: SparkSession, dir: String): DataFrame =
    graft.ops.Retrieval.oovRate(Tables(s, dir).documents, vocabSize = 20)

  /** Gopher-style composite quality gate, per-rule signals surfaced. */
  def gopherRulesQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.gopherRules(Tables(s, dir).documents)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bm25" -> bm25,
    "q_hard_negatives" -> hardNegatives,
    "q_oov_rate" -> oovRate,
    "q_gopher_rules" -> gopherRulesQ,
    "q_skipgram" -> skipgrams,
    "q_hash_features" -> hashFeats,
    "q_lm_counts" -> lmCounts,
    "q_lm_score" -> lmScore,
    "q_linear_score" -> linearScore,
    "q_domain_score" -> domainScore,
    "q_bpe_train" -> bpeTrain,
    "q_bpe_train_batched" -> bpeTrainBatched,
    "q_bpe_overlap" -> bpeOverlap,
    "q_bpe_encode" -> bpeEncode,
    "q_doc_gate" -> docGate,
    "q_chunk" -> chunk,
    "q_pmi" -> pmi,
    "q_funnel" -> funnel,
    "q_keywords" -> keywordsQ,
    "q_hopping" -> hopping,
    "q_nfc_norm" -> nfcNorm,
    "q_zscore" -> zscore,
    "q_ntile_gate" -> ntileGate,
    "q_group_topk" -> groupTopK,
    "q_capwords" -> capwordsQuery,
    "q_phone_canon" -> phoneCanon,
    "q_token_stats" -> tokenStats,
    "q_token_unicode" -> tokenUnicode,
    "q_token_bpe" -> tokenBpe,
    "q_fertility" -> fertility,
    "q_rag_ingest" -> ragIngest,
    "q_strip_markup" -> stripMarkup,
    "q_train_split" -> trainSplit,
    "q_vocab_topk" -> vocabTopK,
    "q_contamination" -> contamination,
    "q_quality" -> quality,
    "q_fingerprint" -> fingerprint,
    "q_lexical_div" -> lexicalDiv,
    "q_winnow" -> winnowQ,
    "q_winnow_pairs" -> winnowPairs,
    "q_winnow_canonical" -> winnowCanonicalQ,
    "q_vocab_overlap" -> vocabOverlapQ,
    "q_langid" -> langId,
    "q_sessionize" -> sessionize,
    "q_hourly" -> hourly,
    "q_salted_agg" -> saltedAgg,
    "q_repetition" -> repetition,
    "q_redact" -> redact,
    "q_rolling" -> rolling,
    "q_session_attrib" -> sessionAttrib,
    "q_click_attrib" -> clickAttrib,
  )

  /** The per-segment phone cascade — ONE rendering, shared with the OSM
    * tag-fix oracles (see [[OracleSql.phoneSegmentCase]]). */
  private def phoneCase = OracleSql.phoneSegmentCase

  /** The portable polynomial hash rendering (shared via [[OracleSql]]). */
  private def pHash(e: String): String = OracleSql.pHash(e)

  /** The full BPE induction generated as chained CTEs — DuckDB runs its
    * OWN argmax chain per round (independent replay, not rendered
    * literals), so the merge tables match only if every pair count, every
    * tie-break, and every left-to-right merge application agree. */
  /** The induction CTE chain alone (v0..vN, pN, mN) — shared by the
    * train oracle (which selects the merge rows) and the encode oracle
    * (which joins document words to the FINAL vocabulary vN). */
  /** The tokenize → per-word frequency → char-symbol CTE (v0) and the
    * per-round pair-count CTE (p_k) — ONE rendering shared by the serial
    * and batched replays, so the two oracles can never drift on
    * tokenization or pair counting (the batched rule differs only in
    * candidate selection and application). */
  private def duckBpeV0From(src: String): String =
    "WITH v0 AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS freq, " +
      "array_to_string(string_split(w, ''), ' ') AS sym FROM (" +
      s"SELECT unnest(string_split(text, ' ')) AS w FROM $src) " +
      "GROUP BY w)"

  private val duckBpeV0: String = duckBpeV0From("documents")

  private def duckBpePairCte(k: Int): String =
    s", p$k AS MATERIALIZED (SELECT u.l AS l, u.r AS r, " +
      "CAST(sum(freq) AS BIGINT) AS cnt FROM (" +
      "SELECT freq, unnest(list_transform(range(1, len(s)), " +
      "i -> {'l': s[i], 'r': s[i+1]})) AS u FROM (" +
      s"SELECT freq, string_split(sym, ' ') AS s FROM v${k - 1})) " +
      "GROUP BY 1, 2)"

  private def duckBpeCtes(nMerges: Int,
      src: String = "documents"): String = {
    val sb = new StringBuilder
    sb ++= duckBpeV0From(src)
    for (k <- 1 to nMerges) {
      sb ++= duckBpePairCte(k)
      sb ++= (s", m$k AS MATERIALIZED (SELECT l, r, cnt FROM p$k " +
        "ORDER BY cnt DESC, l, r LIMIT 1)")
      sb ++= (s", v$k AS MATERIALIZED (SELECT w, freq, trim(replace(' ' || sym || ' ', " +
        s"(SELECT ' ' || l || ' ' || r || ' ' FROM m$k), " +
        s"(SELECT ' ' || l || r || ' ' FROM m$k))) AS sym FROM v${k - 1})")
    }
    sb.toString
  }

  private def duckBpeSql(nMerges: Int): String =
    duckBpeCtes(nMerges) + " " +
      (1 to nMerges).map(k =>
        s"SELECT CAST($k AS BIGINT) AS rank, l, r, cnt AS pair_count " +
          s"FROM m$k").mkString(" UNION ALL ")

  /** BATCHED BPE induction replayed independently — the same pair-count
    * CTE per round as the serial chain, then the engine's prefix-
    * disjoint acceptance restated as a NOT EXISTS over the ordered
    * top-`batch` candidates (c→a), the round's accepted merges applied
    * sequentially in rank order via list_reduce (v), and the global
    * merge rank recovered as a row_number over (round, in-round rank)
    * truncated to nMerges. `nMerges` rounds are generated (acceptance
    * is ≥1 per non-empty round, so that always suffices); an exhausted
    * round carries an empty merge list and v stays fixed. */
  private def duckBpeBatchedSql(nMerges: Int, batch: Int): String = {
    val sb = new StringBuilder
    sb ++= duckBpeV0
    for (k <- 1 to nMerges) {
      sb ++= duckBpePairCte(k)
      sb ++= (s", c$k AS MATERIALIZED (SELECT * FROM (" +
        "SELECT l, r, cnt, row_number() OVER (ORDER BY cnt DESC, l, r) " +
        s"AS rn FROM p$k) WHERE rn <= $batch)")
      sb ++= (s", a$k AS MATERIALIZED (SELECT l, r, cnt, " +
        "row_number() OVER (ORDER BY rn) AS arn " +
        s"FROM c$k c WHERE NOT EXISTS (SELECT 1 FROM c$k d " +
        "WHERE d.rn < c.rn AND (d.l = c.l OR d.l = c.r " +
        "OR d.r = c.l OR d.r = c.r)))")
      sb ++= (s", ms$k AS MATERIALIZED (SELECT coalesce(" +
        "list(' ' || l || ' ' || r || ' ' ORDER BY arn), []) AS ms " +
        s"FROM a$k)")
      sb ++= (s", v$k AS MATERIALIZED (SELECT w, freq, " +
        "trim(list_reduce(list_prepend(' ' || sym || ' ', ms), " +
        "(acc, m) -> replace(acc, m, " +
        "' ' || replace(trim(m), ' ', '') || ' '))) AS sym " +
        s"FROM v${k - 1}, ms$k)")
    }
    sb ++= (", allm AS (" +
      (1 to nMerges).map(k =>
        s"SELECT $k AS rnd, arn, l, r, cnt FROM a$k")
        .mkString(" UNION ALL ") + ") ")
    sb ++= ("SELECT rank, l, r, pair_count FROM (" +
      "SELECT row_number() OVER (ORDER BY rnd, arn) AS rank, l, r, " +
      "cnt AS pair_count FROM allm) " +
      s"WHERE rank <= $nMerges")
    sb.toString
  }

  /** Shared winnow CTE chain (k=4, w=5, df-rail [2,50], minShared 2):
    * k-gram rolling hashes → per-window minima (distinct fps per doc) →
    * df-railed fps → verified candidate pairs — the body both
    * q_winnow_pairs and q_winnow_canonical's reachability build on. */
  private val duckWinnowPairsCtes: String =
    "g AS (SELECT doc_id, " +
      "list_transform(range(1, CAST(len(text) AS BIGINT) - 2), " +
      "p -> list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(string_split(array_slice(text, p, p + 3), ''), " +
      "ch -> CAST(ord(ch) AS BIGINT))), " +
      "(acc, x) -> (acc * 31 + x) % 1000000007)) AS hs " +
      "FROM documents WHERE len(text) >= 4), " +
      "wn AS (SELECT DISTINCT doc_id, fp FROM (SELECT doc_id, " +
      "unnest(list_transform(" +
      "range(1, greatest(len(hs) - 4, 1) + 1), " +
      "i -> list_aggregate(array_slice(hs, i, i + 4), 'min'))) AS fp " +
      "FROM g)), " +
      "kept AS (SELECT doc_id, fp FROM wn WHERE fp IN (" +
      "SELECT fp FROM wn GROUP BY fp " +
      "HAVING count(*) BETWEEN 2 AND 50)), " +
      "wpairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
      "CAST(count(*) AS BIGINT) AS n_shared " +
      "FROM kept a JOIN kept b USING (fp) " +
      "WHERE a.doc_id < b.doc_id " +
      "GROUP BY 1, 2 HAVING count(*) >= 2)"

  val oracle: Map[String, String] = Map(
    // same bounded forward-offset pair generation (i ≤ n−1,
    // d ≤ min(3, n−i)); range()'s exclusive end supplies the bounds
    "q_skipgram" ->
      ("WITH t AS (SELECT string_split(text, ' ') AS l FROM documents), " +
        "p AS (SELECT unnest(flatten(list_transform(range(1, len(l)), " +
        "i -> list_transform(range(1, least(3, len(l) - i) + 1), " +
        "d -> {'w1': l[i], 'w2': l[i + d]})))) AS u FROM t) " +
        "SELECT u.w1 AS w1, u.w2 AS w2, count(*) AS n_cooc FROM p " +
        "GROUP BY 1, 2 HAVING count(*) >= 5"),
    "q_hash_features" ->
      (s"SELECT doc_id, array_to_string(list_transform(range(0, 32), " +
        s"s -> CAST(len(list_filter(string_split(text, ' '), " +
        s"t -> ${pHash("t")} % 32 = s)) AS BIGINT)), ',') " +
        "AS features_csv FROM documents"),
    "q_lm_counts" ->
      ("WITH t AS (SELECT string_split(text, ' ') AS l FROM documents), " +
        "bg AS (SELECT DISTINCT u.w1 AS w1, u.w2 AS w2 FROM (" +
        "SELECT unnest(list_transform(range(1, len(l)), " +
        "i -> {'w1': l[i], 'w2': l[i+1]})) AS u FROM t)), " +
        "succ AS (SELECT w1 AS token, CAST(count(*) AS BIGINT) " +
        "AS n1p_succ FROM bg GROUP BY w1), " +
        "pred AS (SELECT w2 AS token, CAST(count(*) AS BIGINT) " +
        "AS n1p_pred FROM bg GROUP BY w2), " +
        "uni AS (SELECT unnest(l) AS token FROM t) " +
        "SELECT token, count(*) AS n, " +
        "coalesce(any_value(n1p_pred), 0) AS n1p_pred, " +
        "coalesce(any_value(n1p_succ), 0) AS n1p_succ " +
        "FROM uni LEFT JOIN pred USING (token) " +
        "LEFT JOIN succ USING (token) GROUP BY token"),
    // exact integer fixed point end to end — the same
    // ⌊10⁶·(c12+1)/(c1+V)⌋ per bigram, summed as BIGINT, so no float
    // summation order or libm log can diverge across engines
    "q_lm_score" ->
      ("WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l " +
        "FROM documents), " +
        "bg AS (SELECT doc_id, u.w1 AS w1, u.w2 AS w2 FROM (" +
        "SELECT doc_id, unnest(list_transform(range(1, len(l)), " +
        "i -> {'w1': l[i], 'w2': l[i+1]})) AS u FROM toks)), " +
        "c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 " +
        "FROM bg GROUP BY w1, w2), " +
        "uni AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM (" +
        "SELECT unnest(l) AS w1 FROM toks) GROUP BY w1), " +
        "v AS (SELECT CAST(count(*) AS BIGINT) AS vocab FROM uni), " +
        "fp AS (SELECT doc_id, " +
        "((c12 + 1) * 1000000) // (c1 + vocab) AS fp " +
        "FROM bg JOIN c12 USING (w1, w2) JOIN uni USING (w1) " +
        "CROSS JOIN v), " +
        "agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, " +
        "CAST(sum(fp) AS BIGINT) AS score_sum FROM fp GROUP BY doc_id) " +
        "SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams, " +
        "coalesce(a.score_sum, 0) AS score_sum, " +
        "CAST(coalesce(a.score_sum // a.n_bigrams, 0) AS BIGINT) " +
        "AS score_avg FROM documents d LEFT JOIN agg a USING (doc_id)"),
    // identical integer weights rendered as a list literal; the same
    // hash-slot lookup and int64 sum — the decision boundary (> 0) has no
    // float anywhere near it
    "q_linear_score" -> {
      val w = TextAnalysis.classifierWeights(32).mkString("[", ", ", "]")
      "WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tk " +
        "FROM documents), " +
        s"s AS (SELECT doc_id, ($w)[CAST(${pHash("tk")} % 32 AS INT) + 1] " +
        "AS w FROM t) " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, " +
        "CAST(sum(w) AS BIGINT) AS score, sum(w) > 0 AS label " +
        "FROM s GROUP BY doc_id"
    },
    // the same ⌊(c_tgt+1)·10⁶/(c_raw+1)⌋ per token, summed as BIGINT —
    // exact integer fixed point end to end, like q_lm_score
    "q_domain_score" ->
      ("WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t " +
        "FROM documents), " +
        "raw AS (SELECT t, CAST(count(*) AS BIGINT) AS c_raw FROM tok " +
        "GROUP BY t), " +
        "tgt AS (SELECT t, CAST(count(*) AS BIGINT) AS c_tgt FROM (" +
        "SELECT unnest(string_split(text, ' ')) AS t FROM documents " +
        "WHERE lang = 'en') GROUP BY t), " +
        "fp AS (SELECT doc_id, " +
        "((coalesce(c_tgt, 0) + 1) * 1000000) // (c_raw + 1) AS fp " +
        "FROM tok JOIN raw USING (t) LEFT JOIN tgt USING (t)), " +
        "agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, " +
        "CAST(sum(fp) AS BIGINT) AS score_sum FROM fp GROUP BY doc_id) " +
        "SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens, " +
        "coalesce(a.score_sum, 0) AS score_sum, " +
        "CAST(coalesce(a.score_sum // a.n_tokens, 0) AS BIGINT) " +
        "AS score_avg FROM documents d LEFT JOIN agg a USING (doc_id)"),
    "q_bpe_train" -> duckBpeSql(8),
    // batched induction replayed independently: DuckDB derives its own
    // top-4 windows, applies the same prefix-disjoint acceptance, and
    // recovers the global rank — engine and oracle agree only if every
    // count, tie-break, acceptance decision, and in-round application
    // order match
    "q_bpe_train_batched" -> duckBpeBatchedSql(8, 4),
    // the overlap-convention fixture: DuckDB's replace() and the
    // engine's regexp_replace share left-to-right non-overlapping
    // semantics, so both merge " a b a b " ONCE per round — the replay
    // runs over the identical inline corpus, no parquet involved
    "q_bpe_overlap" ->
      (duckBpeCtes(3, "(SELECT 'abab abab abab' AS text)") + " " +
        (1 to 3).map(k =>
          s"SELECT CAST($k AS BIGINT) AS rank, l, r, cnt AS pair_count " +
            s"FROM m$k").mkString(" UNION ALL ")),
    // independent replay: DuckDB derives its OWN merges (argmax chain),
    // then encodes via the same vocabulary-join the engine uses
    "q_bpe_encode" ->
      (duckBpeCtes(8) +
        ", wordsx AS (SELECT doc_id, unnest(string_split(text, ' ')) " +
        "AS w FROM documents) " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, " +
        "CAST(sum(len(string_split(v.sym, ' '))) AS BIGINT) " +
        "AS n_bpe_tokens FROM wordsx JOIN v8 v USING (w) " +
        "GROUP BY doc_id"),
    // every gate rule restated bit-for-bit (thresholds shared with
    // q_quality / q_repetition)
    "q_doc_gate" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS l " +
        "FROM documents), " +
        "s AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tok, " +
        "CAST(len(list_filter(l, x -> x IN " +
        "('the', 'a', 'of', 'to', 'in'))) AS BIGINT) AS n_stop, " +
        "CAST(list_sum(list_transform(l, x -> length(x))) AS BIGINT) " +
        "* 100 // len(l) AS mean_len, " +
        "CASE WHEN len(l) < 2 THEN 0 ELSE CAST(len(l) - 1 AS BIGINT) END " +
        "AS n_big, " +
        "CASE WHEN len(l) < 2 THEN 0 ELSE CAST(len(list_distinct(" +
        "list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1]))) " +
        "AS BIGINT) END AS n_dbig FROM t) " +
        "SELECT doc_id, CAST(" +
        "(CASE WHEN n_tok < 20 THEN 1 ELSE 0 END) + " +
        "(CASE WHEN n_tok > 500 THEN 2 ELSE 0 END) + " +
        "(CASE WHEN n_stop * 4 >= n_tok THEN 4 ELSE 0 END) + " +
        "(CASE WHEN n_big > 0 AND (n_big - n_dbig) * 5 >= n_big " +
        "THEN 8 ELSE 0 END) + " +
        "(CASE WHEN mean_len < 200 OR mean_len > 1200 THEN 16 ELSE 0 END) " +
        "AS BIGINT) AS reasons, " +
        "(CASE WHEN n_tok < 20 THEN 1 ELSE 0 END) + " +
        "(CASE WHEN n_tok > 500 THEN 2 ELSE 0 END) + " +
        "(CASE WHEN n_stop * 4 >= n_tok THEN 4 ELSE 0 END) + " +
        "(CASE WHEN n_big > 0 AND (n_big - n_dbig) * 5 >= n_big " +
        "THEN 8 ELSE 0 END) + " +
        "(CASE WHEN mean_len < 200 OR mean_len > 1200 THEN 16 ELSE 0 END) " +
        "= 0 AS kept FROM s"),
    // identical closed-form chunk count and 1-based substring windows
    "q_chunk" ->
      ("WITH n AS (SELECT doc_id, text, " +
        "greatest(coalesce(length(text), 0) - 33, 0) // 64 + 1 AS nc " +
        "FROM documents), " +
        "e AS (SELECT doc_id, text, unnest(range(0, nc)) AS i FROM n) " +
        "SELECT doc_id, CAST(i AS BIGINT) AS chunk_id, " +
        "substring(text, CAST(i * 64 + 1 AS INTEGER), 96) AS chunk_text, " +
        "CAST(length(substring(text, CAST(i * 64 + 1 AS INTEGER), 96)) " +
        "AS BIGINT) AS chunk_len FROM e"),
    // adjacent-pair counts vs unigram counts; the ×1000 integer PMI ratio
    // and the (pmi, w1, w2) tie-broken top-25 restated 1:1
    "q_pmi" ->
      ("WITH t AS (SELECT string_split(text, ' ') AS l FROM documents), " +
        "bg AS (SELECT u.w1 AS w1, u.w2 AS w2 FROM (" +
        "SELECT unnest(list_transform(range(1, len(l)), " +
        "i -> {'w1': l[i], 'w2': l[i+1]})) AS u FROM t)), " +
        "nxy AS (SELECT w1, w2, count(*) AS n_xy FROM bg GROUP BY w1, w2), " +
        "uni AS (SELECT unnest(l) AS w FROM t), " +
        "nx AS (SELECT w, count(*) AS n FROM uni GROUP BY w), " +
        "tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM nx) " +
        "SELECT w1, w2, n_xy, n_x, n_y, " +
        "n_xy * n_total * 1000 // (n_x * n_y) AS pmi_x1000 FROM (" +
        "SELECT nxy.w1 AS w1, nxy.w2 AS w2, nxy.n_xy AS n_xy, " +
        "a.n AS n_x, b.n AS n_y FROM nxy " +
        "JOIN nx a ON a.w = nxy.w1 JOIN nx b ON b.w = nxy.w2 " +
        "WHERE nxy.n_xy >= 5), tot " +
        "ORDER BY pmi_x1000 DESC, w1, w2 LIMIT 25"),
    // the same time-sorted fold: encode steps 1..3, advance acc only on
    // exactly acc+1; DuckDB's list_reduce takes its init from the first
    // element, hence the prepended 0 (same trick as the polyhash oracles)
    "q_funnel" ->
      ("SELECT stage, count(*) AS n_users, " +
        "CAST(sum(user_id) AS BIGINT) AS sum_uid FROM (" +
        "SELECT user_id, list_reduce(list_prepend(0, list_transform(" +
        "list_sort(list({'ts': ts, 'event_id': event_id, " +
        "'event_type': event_type})), " +
        "e -> CASE e.event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2 " +
        "WHEN 'purchase' THEN 3 ELSE 0 END)), " +
        "(acc, t) -> CASE WHEN t = acc + 1 THEN acc + 1 ELSE acc END) " +
        "AS stage FROM events WHERE event_id % 11 = 0 " +
        "GROUP BY user_id) GROUP BY stage"),
    // integer tf·10⁶÷df score (the constant corpus-size factor of idf
    // can't change per-doc rankings, so it is dropped — see
    // TextAnalysis.keywords); ties broken by token
    "q_keywords" ->
      ("WITH tf AS (SELECT doc_id, token, " +
        "CAST(count(*) AS BIGINT) AS tf FROM (" +
        "SELECT doc_id, unnest(string_split(text, ' ')) AS token " +
        "FROM documents) GROUP BY doc_id, token), " +
        "dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS df " +
        "FROM tf GROUP BY token) " +
        "SELECT doc_id, rk, token, score FROM (" +
        "SELECT tf.doc_id, tf.token, tf.tf * 1000000 // dfq.df AS score, " +
        "row_number() OVER (PARTITION BY tf.doc_id " +
        "ORDER BY tf.tf * 1000000 // dfq.df DESC, tf.token) AS rk " +
        "FROM tf JOIN dfq USING (token)) WHERE rk <= 2"),
    // with duration = 2×slide every event is valid in BOTH grid-aligned
    // windows (k = 0, 1), so assignment is pure integer micro arithmetic
    "q_hopping" ->
      ("SELECT ws, event_type, count(*) AS cnt FROM (" +
        "SELECT make_timestamp((epoch_us(ts) // 1800000000 - k) " +
        "* 1800000000) AS ws, event_type " +
        "FROM events, (SELECT unnest([0, 1]) AS k)) " +
        "GROUP BY ws, event_type"),
    // chr(769)/chr(778) are the combining marks; utf8proc NFC and JDK
    // Normalizer both implement the standard canonical composition
    "q_nfc_norm" ->
      ("SELECT doc_id, nfc_normalize(raw) AS norm, " +
        "length(raw) AS len_raw, " +
        "length(nfc_normalize(raw)) AS len_norm FROM (" +
        "SELECT doc_id, substr(text, 1, 40) || 'e' || chr(769) || " +
        "'A' || chr(778) AS raw FROM documents)"),
    // the SAME fixed expression order over exact integer sums on both
    // sides → bit-identical doubles (no order-dependent float aggregate)
    "q_zscore" ->
      ("WITH st AS (SELECT * FROM (SELECT lang, " +
        "CAST(count(*) AS BIGINT) AS _n, " +
        "CAST(sum(n_chars) AS BIGINT) AS _s, " +
        "CAST(sum(n_chars * n_chars) AS BIGINT) AS _s2 " +
        "FROM documents GROUP BY lang) " +
        "WHERE _n > 1 AND _s2 * _n > _s * _s) " + // variance > 0, exact
        "SELECT doc_id, lang, n_chars, z FROM (" +
        "SELECT d.doc_id, d.lang, d.n_chars, " +
        "(CAST(d.n_chars AS DOUBLE) - " +
        "CAST(st._s AS DOUBLE) / CAST(st._n AS DOUBLE)) / " +
        "sqrt((CAST(st._s2 AS DOUBLE) - " +
        "CAST(st._s AS DOUBLE) * CAST(st._s AS DOUBLE) / " +
        "CAST(st._n AS DOUBLE)) / CAST(st._n - 1 AS DOUBLE)) AS z " +
        "FROM documents d JOIN st USING (lang)) WHERE abs(z) > 1.5"),
    "q_ntile_gate" ->
      ("SELECT doc_id, lang, n_chars FROM (" +
        "SELECT doc_id, lang, n_chars, ntile(4) OVER (" +
        "PARTITION BY lang ORDER BY n_chars, doc_id) AS tile " +
        "FROM documents) WHERE tile = 4"),
    "q_group_topk" ->
      ("SELECT lang, rk, doc_id, n_chars FROM (" +
        "SELECT lang, doc_id, n_chars, row_number() OVER (" +
        "PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rk " +
        "FROM documents) WHERE rk <= 3"),
    "q_capwords" ->
      ("SELECT p_partkey, array_to_string(list_transform(" +
        "string_split(p_name, ' '), x -> upper(x[1:1]) || lower(x[2:])), ' ')" +
        " AS cap_name FROM part"),
    "q_phone_canon" ->
      ("SELECT event_id, raw, CASE WHEN len(m) = 0 THEN raw " +
        "ELSE array_to_string(m, ';') END AS fixed FROM (" +
        "SELECT event_id, raw, list_filter(list_transform(" +
        "string_split_regex(raw, '[,;]'), s -> " + phoneCase +
        "), x -> x IS NOT NULL) AS m FROM (" +
        "SELECT event_id, CASE " +
        "WHEN event_id % 6 = 0 THEN d8 " +
        "WHEN event_id % 6 = 1 THEN '852-' || d8 || ',' || d8 " +
        "WHEN event_id % 6 = 2 THEN '+852 ' || substr(d8, 1, 4) || ' ' || substr(d8, 5, 4) " +
        "WHEN event_id % 6 = 3 THEN '13' || d8 || '7' " +
        "WHEN event_id % 6 = 4 THEN '+86 0755-' || substr(d8, 1, 7) " +
        "ELSE 'no phone ' || d8 || 'x' END AS raw FROM (" +
        "SELECT event_id, CAST(20000000 + (event_id * 137) % 80000000 " +
        "AS VARCHAR) AS d8 FROM events)))"),
    "q_token_stats" ->
      ("SELECT doc_id, len(string_split(text, ' ')) AS n_tokens, " +
        "length(text) AS n_chars_measured FROM documents"),
    // the same per-doc separator injection as tokenUnicode; the split
    // class [tab NBSP space]+ is (?U)\s's cover of the injected runs
    "q_token_unicode" ->
      ("WITH messy AS (SELECT doc_id, replace(text, ' ', " +
        "CASE WHEN doc_id % 3 = 0 THEN chr(9) " +
        "WHEN doc_id % 3 = 1 THEN chr(160) " +
        "ELSE '  ' END) AS m FROM documents), " +
        "t AS (SELECT doc_id, string_split_regex(m, " +
        "'[' || chr(9) || chr(160) || ' ]+') AS toks FROM messy) " +
        "SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, " +
        "CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) " +
        "AS sum_token_chars FROM t"),
    "q_train_split" ->
      ("SELECT split, count(*) AS n_docs FROM (SELECT CASE " +
        "WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' " +
        "ELSE 'test' END AS split FROM (SELECT " +
        "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(string_split(CAST(doc_id AS VARCHAR), ''), " +
        "ch -> CAST(ord(ch) AS BIGINT))), " +
        "(acc, cp) -> (acc * 31 + cp) % 2147483647) % 100 AS b " +
        "FROM documents)) GROUP BY split"),
    "q_vocab_topk" ->
      ("SELECT token, count(*) AS n FROM (SELECT " +
        "unnest(string_split(text, ' ')) AS token FROM documents) " +
        "GROUP BY token ORDER BY n DESC, token LIMIT 100"),
    "q_contamination" ->
      ("WITH s AS (SELECT doc_id, CASE WHEN b < 80 THEN 'train' " +
        "WHEN b < 90 THEN 'valid' ELSE 'test' END AS split, t FROM (" +
        "SELECT doc_id, string_split(text, ' ') AS t, " +
        "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(string_split(CAST(doc_id AS VARCHAR), ''), " +
        "ch -> CAST(ord(ch) AS BIGINT))), " +
        "(acc, cp) -> (acc * 31 + cp) % 2147483647) % 100 AS b " +
        "FROM documents)), " +
        "sh AS (SELECT doc_id, split, unnest(list_distinct(" +
        "list_transform(list_transform(" +
        "range(1, greatest(len(t)-1,1)+1), " +
        "i -> CASE WHEN i < len(t) THEN t[i] || ' ' || t[i+1] " +
        "ELSE t[i] END), x -> " +
        "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(string_split(x, ''), " +
        "ch -> CAST(ord(ch) AS BIGINT))), " +
        "(acc, cp) -> (acc * 31 + cp) % 2147483647)))) AS h FROM s), " +
        "train AS (SELECT DISTINCT h FROM sh WHERE split = 'train') " +
        "SELECT sh.doc_id, count(*) AS n_shingles, " +
        "CAST(sum(CASE WHEN train.h IS NOT NULL THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_hit " +
        "FROM sh LEFT JOIN train ON train.h = sh.h " +
        "WHERE sh.split = 'test' GROUP BY sh.doc_id"),
    // the same lookahead-free pattern runs under DuckDB's RE2 with
    // identical leftmost-first alternation ('' escapes the quote)
    "q_token_bpe" ->
      ("SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens_bpe, " +
        "array_to_string(toks[1:5], '|') AS preview FROM (" +
        "SELECT doc_id, regexp_extract_all(text, " +
        "'''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]{1,3}" +
        "| ?[^A-Za-z0-9 ]+') AS toks FROM documents)"),
    // the q_chunk CTE + the q_hash_features vector + a literal integer
    // weight matrix (same LCG as linearScore, seeds 100..107); argmax
    // with ties to the lowest cell = list_position of list_max
    "q_rag_ingest" -> {
      val dim = 32
      def weights(seed: Long): Seq[Long] = {
        var st = seed
        Seq.fill(dim) {
          st = st * 6364136223846793005L + 1442695040888963407L
          (st >>> 33) % 17L - 8L
        }
      }
      val scoreExprs = (0 until 8).map { c =>
        weights(100L + c).zipWithIndex
          .map { case (w, i) => s"fv[${i + 1}] * ($w)" }.mkString(" + ")
      }.mkString("[", ", ", "]")
      "WITH n AS (SELECT doc_id, text, " +
        "greatest(length(text) - 33, 0) // 64 + 1 AS nc FROM documents), " +
        "e AS (SELECT doc_id, text, unnest(range(0, nc)) AS i FROM n), " +
        "ch AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_id, " +
        "substring(text, CAST(i * 64 + 1 AS INTEGER), 96) AS ct FROM e), " +
        "f AS (SELECT doc_id, chunk_id, CAST(length(ct) AS BIGINT) " +
        "AS chunk_len, list_transform(range(0, 32), " +
        s"s -> CAST(len(list_filter(list_filter(string_split(ct, ' '), t -> t != ''), " +
        s"t -> ${pHash("t")} % 32 = s)) AS BIGINT)) AS fv FROM ch), " +
        s"sc AS (SELECT doc_id, chunk_id, chunk_len, $scoreExprs AS sl " +
        "FROM f) " +
        "SELECT doc_id, chunk_id, CAST(list_position(sl, " +
        "list_aggregate(sl, 'max')) - 1 AS BIGINT) AS cell, chunk_len " +
        "FROM sc"
    },
    // the same planted markup, block-drop, tag-strip, entity cascade
    "q_strip_markup" ->
      ("WITH planted AS (SELECT doc_id, CASE " +
        "WHEN doc_id % 3 = 0 THEN '<div class=\"a\"><p>' || text || " +
        "'</p><script>var x=1;</script></div>' " +
        "WHEN doc_id % 3 = 1 THEN '<b>Title</b> ' || text || " +
        "' &amp; more &lt;tail&gt;' " +
        "ELSE '<style>p{color:red}</style><span>' || text || " +
        "'&nbsp;end</span>' END AS t FROM documents), " +
        "stripped AS (SELECT doc_id, " +
        "len(regexp_extract_all(t, '<[^>]*>')) AS n_tags_removed, " +
        "replace(replace(replace(replace(replace(replace(" +
        "regexp_replace(regexp_replace(regexp_replace(t, " +
        "'(?is)<script[^>]*>.*?</script>', ' ', 'g'), " +
        "'(?is)<style[^>]*>.*?</style>', ' ', 'g'), " +
        "'<[^>]*>', ' ', 'g'), " +
        "'&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), " +
        "'&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS c " +
        "FROM planted) " +
        "SELECT doc_id, CAST(n_tags_removed AS BIGINT) AS n_tags_removed, " +
        "trim(regexp_replace(c, '\\s+', ' ', 'g')) AS clean_text " +
        "FROM stripped"),
    // same BPE-ish regex as q_token_bpe, rolled up per language
    "q_fertility" ->
      ("SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(w) AS BIGINT) AS n_words, " +
        "CAST(sum(t) AS BIGINT) AS n_bpe_tokens, " +
        "CAST(sum(c) AS BIGINT) AS n_chars, " +
        "CASE WHEN sum(w) > 0 THEN CAST(sum(t) AS BIGINT) * 1000 " +
        "// CAST(sum(w) AS BIGINT) ELSE 0 END AS fertility_x1000, " +
        "CASE WHEN sum(t) > 0 THEN CAST(sum(c) AS BIGINT) * 1000 " +
        "// CAST(sum(t) AS BIGINT) ELSE 0 END " +
        "AS chars_per_tok_x1000 FROM (" +
        "SELECT lang, len(string_split(text, ' ')) AS w, " +
        "len(regexp_extract_all(text, " +
        "'''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]{1,3}" +
        "| ?[^A-Za-z0-9 ]+')) AS t, " +
        "length(text) AS c FROM documents) GROUP BY lang"),
    "q_quality" ->
      ("SELECT doc_id, n_tokens, n_stop, total_len * 100 // n_tokens " +
        "AS mean_tok_len_x100, " +
        "n_tokens >= 20 AND n_tokens <= 500 AND n_stop * 4 < n_tokens " +
        "AS is_quality FROM (SELECT doc_id, " +
        "len(string_split(text, ' ')) AS n_tokens, " +
        "len(list_filter(string_split(text, ' '), " +
        "x -> x IN ('the', 'a', 'of', 'to', 'in'))) AS n_stop, " +
        "CAST(list_sum(list_transform(string_split(text, ' '), " +
        "x -> length(x))) AS BIGINT) AS total_len FROM documents)"),
    "q_bm25" ->
      OracleSql.duckBm25(graft.ops.Retrieval.DefaultTerms, 10),
    // same scoring CTEs; positives excluded only on the ranked list
    "q_hard_negatives" ->
      OracleSql.duckBm25(graft.ops.Retrieval.DefaultTerms, 10,
        HardNegPositives),
    // the same top-20 vocabulary rule as q_vocab_topk (n DESC, token),
    // then a left-join OOV count per document
    // LEFT JOIN back onto documents: a NULL-text doc has no token rows
    // but must still report (0, 0, 0) — the engine's explode_outer
    // semantics (r14)
    "q_oov_rate" ->
      ("WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) " +
        "AS token FROM documents), " +
        "vocab AS (SELECT token FROM (SELECT token, count(*) AS n " +
        "FROM toks GROUP BY token) ORDER BY n DESC, token LIMIT 20), " +
        "j AS (SELECT t.doc_id, CASE WHEN v.token IS NULL THEN 1 " +
        "ELSE 0 END AS oov FROM toks t LEFT JOIN vocab v " +
        "USING (token)), " +
        "agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, " +
        "CAST(sum(oov) AS BIGINT) AS n_oov, " +
        "CAST(sum(oov) AS BIGINT) * 1000000 // " +
        "CAST(count(*) AS BIGINT) AS oov_x1e6 " +
        "FROM j GROUP BY doc_id) " +
        "SELECT d.doc_id, coalesce(a.n_tokens, CAST(0 AS BIGINT)) " +
        "AS n_tokens, coalesce(a.n_oov, CAST(0 AS BIGINT)) AS n_oov, " +
        "coalesce(a.oov_x1e6, CAST(0 AS BIGINT)) AS oov_x1e6 " +
        "FROM documents d LEFT JOIN agg a USING (doc_id)"),
    "q_gopher_rules" ->
      ("SELECT doc_id, n_tokens, n_alpha, n_sym, n_stop, " +
        "chars100 // n_tokens AS mean_tok_len_x100, " +
        "n_tokens >= 20 AND n_tokens <= 100000 AND " +
        "chars100 // n_tokens >= 300 AND chars100 // n_tokens <= 1000 " +
        "AND n_sym * 10 <= n_tokens AND n_alpha * 5 >= n_tokens * 4 " +
        "AND n_stop >= 2 AS gopher_pass FROM (" +
        "SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, " +
        "CAST(list_sum(list_transform(toks, x -> length(x))) " +
        "AS BIGINT) * 100 AS chars100, " +
        "CAST(len(list_filter(toks, x -> " +
        "regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha, " +
        "CAST(len(list_filter(toks, x -> " +
        "regexp_matches(x, '^[^A-Za-z0-9]+$'))) AS BIGINT) AS n_sym, " +
        "CAST(len(list_filter(toks, x -> " +
        "x IN ('the', 'a', 'of', 'to', 'in'))) AS BIGINT) AS n_stop " +
        "FROM (SELECT doc_id, string_split(text, ' ') AS toks " +
        "FROM documents))"),
    "q_fingerprint" ->
      ("SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(string_split(text, ''), " +
        "ch -> CAST(ord(ch) AS BIGINT))), " +
        "(acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint " +
        "FROM documents"),
    // Semantics-first restatement, not an implementation mirror: the
    // Spark side counts sorted-run starts per row; the oracle groups
    // exploded tokens — identical type/hapax multiset by definition.
    "q_lexical_div" ->
      ("WITH t AS (SELECT doc_id, tok, count(*) AS c FROM (" +
        "SELECT doc_id, unnest(string_split(text, ' ')) AS tok " +
        "FROM documents) GROUP BY 1, 2) " +
        "SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, " +
        "CAST(count(*) AS BIGINT) AS n_types, " +
        "CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_hapax, " +
        "CAST(count(*) * 1000 // sum(c) AS BIGINT) AS ttr_x1000, " +
        "CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000 // sum(c) " +
        "AS BIGINT) AS hapax_x1000 FROM t GROUP BY doc_id"),
    "q_winnow" ->
      ("WITH g AS (SELECT doc_id, " +
        "list_transform(range(1, CAST(len(text) AS BIGINT) - 2), " +
        "p -> list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(string_split(array_slice(text, p, p + 3), ''), " +
        "ch -> CAST(ord(ch) AS BIGINT))), " +
        "(acc, x) -> (acc * 31 + x) % 1000000007)) AS hs " +
        "FROM documents WHERE len(text) >= 4) " +
        "SELECT DISTINCT doc_id, fp FROM (SELECT doc_id, " +
        "unnest(list_transform(" +
        "range(1, greatest(len(hs) - 4, 1) + 1), " +
        "i -> list_aggregate(array_slice(hs, i, i + 4), 'min'))) AS fp " +
        "FROM g)"),
    "q_winnow_pairs" ->
      ("WITH " + duckWinnowPairsCtes +
        " SELECT doc_a, doc_b, n_shared FROM wpairs"),
    // same verified-pair CTE, then recursive-CTE reachability — an
    // independent transitive closure cross-checking the engine's label
    // propagation (the same oracle shape as q_simhash_canonical)
    "q_winnow_canonical" ->
      ("WITH RECURSIVE " + duckWinnowPairsCtes + ", " +
        "edges AS (SELECT doc_a AS s, doc_b AS d FROM wpairs " +
        "UNION SELECT doc_b, doc_a FROM wpairs), " +
        "nodes AS (SELECT DISTINCT s AS id FROM edges), " +
        "reach(id, r) AS (SELECT id, id FROM nodes UNION " +
        "SELECT reach.id, edges.d FROM reach JOIN edges " +
        "ON edges.s = reach.r), " +
        "comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id) " +
        "SELECT d.doc_id AS doc_id, " +
        "coalesce(comp.component, d.doc_id) AS canonical_id " +
        "FROM documents d LEFT JOIN comp ON comp.id = d.doc_id"),
    "q_vocab_overlap" ->
      ("WITH v AS (SELECT DISTINCT source, tok FROM (SELECT source, " +
        "unnest(string_split(text, ' ')) AS tok FROM documents)), " +
        "s AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM v " +
        "GROUP BY source), " +
        "p AS (SELECT a.source AS source_a, b.source AS source_b, " +
        "CAST(count(*) AS BIGINT) AS n_common " +
        "FROM v a JOIN v b USING (tok) WHERE a.source < b.source " +
        "GROUP BY 1, 2) " +
        // every pair (a < b) appears even at zero overlap — the engine
        // builds the same skeleton off the sizes frame
        "SELECT sa.source AS source_a, sb.source AS source_b, " +
        "coalesce(n_common, 0) AS n_common, " +
        "sa.n AS n_vocab_a, sb.n AS n_vocab_b, " +
        "CAST(coalesce(n_common, 0) * 1000 // " +
        "(sa.n + sb.n - coalesce(n_common, 0)) AS BIGINT) " +
        "AS jaccard_x1000 FROM s sa JOIN s sb ON sa.source < sb.source " +
        "LEFT JOIN p ON p.source_a = sa.source " +
        "AND p.source_b = sb.source"),
    "q_sessionize" ->
      ("SELECT user_id, count(*) AS n_events, " +
        "CAST(sum(new_session) AS BIGINT) AS n_sessions FROM (" +
        "SELECT user_id, CASE WHEN prev_ts IS NULL OR " +
        "epoch_ms(ts) - epoch_ms(prev_ts) > 1800000 THEN 1 ELSE 0 END " +
        "AS new_session FROM (SELECT user_id, ts, " +
        "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) " +
        "AS prev_ts FROM events)) GROUP BY user_id"),
    "q_hourly" ->
      ("SELECT date_trunc('hour', ts) AS hour, event_type, " +
        "count(*) AS cnt FROM events GROUP BY 1, 2"),
    // the salted two-phase plan must produce exactly the unsalted answer
    "q_salted_agg" ->
      ("SELECT event_type, count(*) AS n_rows, " +
        "CAST(sum(event_id) AS BIGINT) AS sum_value " +
        "FROM events GROUP BY event_type"),
    // the same gap-session construction (lag → flag → running sum → group
    // to intervals) then the same containment join; DuckDB's widened
    // window sum casts back to BIGINT
    "q_click_attrib" ->
      ("SELECT p.event_id AS purchase_id, p.user_id, " +
        "c.event_id AS click_id " +
        "FROM events p JOIN events c ON c.user_id = p.user_id " +
        "WHERE p.event_type = 'purchase' AND c.event_type = 'click' " +
        "AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE"),
    "q_session_attrib" ->
      ("WITH s0 AS (SELECT event_id, user_id, ts, " +
        "CASE WHEN lag(ts) OVER w IS NULL OR " +
        "epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000 " +
        "THEN 1 ELSE 0 END AS new_session FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "s1 AS (SELECT user_id, ts, CAST(sum(new_session) OVER (" +
        "PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) " +
        "AS session_id FROM s0), " +
        "sess AS (SELECT user_id, session_id, min(ts) AS session_start, " +
        "max(ts) AS session_end, count(*) AS session_n_events " +
        "FROM s1 GROUP BY 1, 2) " +
        "SELECT p.event_id AS purchase_id, p.user_id, s.session_id, " +
        "s.session_n_events " +
        "FROM (SELECT event_id, user_id, ts FROM events " +
        "WHERE event_type = 'purchase') p JOIN sess s " +
        "ON s.user_id = p.user_id AND p.ts >= s.session_start " +
        "AND p.ts <= s.session_end"),
    // the same RANGE frame over micros-since-epoch; DuckDB window sums of
    // BIGINT widen to HUGEINT → cast back
    "q_rolling" ->
      ("SELECT event_id, user_id, count(*) OVER w AS n_trailing, " +
        "CAST(sum(event_id) OVER w AS BIGINT) AS sum_eid_trailing " +
        "FROM events WINDOW w AS (PARTITION BY user_id " +
        "ORDER BY epoch_us(ts) " +
        "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)"),
    // bigrams rebuilt with 1-based list indexing; the <2-token guard
    // mirrors the Spark when() exactly
    "q_repetition" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS l " +
        "FROM documents), b AS (SELECT doc_id, l, " +
        "list_transform(range(1, greatest(len(l), 1)), " +
        "i -> l[i] || ' ' || l[i+1]) AS bg FROM t) " +
        "SELECT doc_id, len(l) AS n_tokens, " +
        "len(list_distinct(l)) AS n_distinct_tokens, " +
        "CASE WHEN len(l) < 2 THEN 0 ELSE len(l) - 1 END AS n_bigrams, " +
        "CASE WHEN len(l) < 2 THEN 0 ELSE len(list_distinct(bg)) END " +
        "AS n_distinct_bigrams, " +
        "CASE WHEN len(l) >= 2 AND (len(l) - 1 - len(list_distinct(bg))) " +
        "* 5 >= len(l) - 1 THEN true ELSE false END AS is_repetitive " +
        "FROM b"),
    // the same planted-PII injection, then the same count+mask cascade
    // (RE2 and Java regex agree on these lookahead-free patterns; 'g'
    // matches Spark's replace-all default)
    "q_redact" ->
      ("WITH p AS (SELECT doc_id, text || ' contact ' || " +
        "CASE WHEN doc_id % 3 = 0 THEN 'user' || CAST(doc_id AS VARCHAR) " +
        "|| '@mail.example' " +
        "WHEN doc_id % 3 = 1 THEN '+852 9' || " +
        "lpad(CAST((doc_id * 37) % 10000000 AS VARCHAR), 7, '0') " +
        "ELSE '10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || " +
        "CAST((doc_id * 7) % 256 AS VARCHAR) END AS text FROM documents) " +
        "SELECT doc_id, " +
        "len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) " +
        "AS n_emails, " +
        "len(regexp_extract_all(text, '\\+[0-9]{2,3} [0-9]{7,11}')) " +
        "AS n_phones, " +
        "len(regexp_extract_all(text, " +
        "'[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}')) AS n_ips, " +
        "regexp_replace(regexp_replace(regexp_replace(text, " +
        "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'), " +
        "'\\+[0-9]{2,3} [0-9]{7,11}', '<PHONE>', 'g'), " +
        "'[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}', '<IP>', 'g') " +
        "AS redacted FROM p"),
    // the language-ID heuristic restated in DuckDB SQL (fold argmax ==
    // "first language in profile order achieving the max score")
    "q_langid" ->
      ("SELECT doc_id, CASE WHEN length(text) > 0 " +
        "AND n_cjk * 5 >= length(text) THEN 'zh' " +
        "WHEN m > 0 THEN best_lang ELSE 'unknown' END AS lang_pred FROM (" +
        "SELECT doc_id, text, n_cjk, " +
        "greatest(s_en, s_es, s_de, s_fr) AS m, " +
        "CASE WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en' " +
        "WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es' " +
        "WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de' " +
        "ELSE 'fr' END AS best_lang FROM (SELECT doc_id, text, " +
        "len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS n_cjk, " +
        "len(list_filter(toks, t -> t IN ('the','a','of','and','to','in'," +
        "'is','that','it'))) AS s_en, " +
        "len(list_filter(toks, t -> t IN ('el','la','de','que','y','los'," +
        "'un','una','es'))) AS s_es, " +
        "len(list_filter(toks, t -> t IN ('der','die','und','das','ist'," +
        "'ein','nicht','mit'))) AS s_de, " +
        "len(list_filter(toks, t -> t IN ('le','la','les','de','et','un'," +
        "'une','est','que'))) AS s_fr FROM (" +
        "SELECT doc_id, text, " +
        "list_transform(string_split_regex(lower(text), '\\s+'), " +
        "t -> regexp_replace(t, '[[:punct:]]', '', 'g')) AS toks " +
        "FROM documents)))"),
  )
}
