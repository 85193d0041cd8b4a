package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus retrieval / vocabulary-coverage operators: BM25 scoring against
  * a term list and out-of-vocabulary rate against a frequency-ranked
  * vocabulary — the "find the docs about X" and "how much of this doc does
  * my tokenizer cover" questions a training-data pipeline asks constantly
  * (topical subset mining, tokenizer-fit QA before a vocab freeze).
  *
  * Both scores are INTEGER-exact (scaled rationals, integer division) so
  * the cross-engine oracle comparison is float-free: BM25's k1/b
  * constants are carried as ×1000 integers and the per-term contribution
  * is one integer division of two int64 products.
  */
object Retrieval {

  /** Canonical query-term bag for the oracled retrieval queries (terms
    * present in the synthetic corpus with distinct document frequencies). */
  val DefaultTerms: Seq[String] = Seq("spark", "join", "vector")

  /** BM25 top-k retrieval for a conjunctive bag of query `terms`.
    *
    * Per (doc, term): idf_x1e6 · tf_x1000, with
    *   idf_x1e6 = ⌊(2(N−df)+1)·10⁶ / (2df+1)⌋   (the +0.5 idf, ×2 to
    *              stay integral; floored at 0 for df > N/2 terms)
    *   tf_x1000 = ⌊tf·(k1+1)·10³·tot / (tf·10³·tot + k1·((10³−b)·tot +
    *              b·dl·N))⌋ — the BM25 length normalization with
    *              avgdl = tot/N multiplied through, so the only division
    *              is the final integer one.
    * k1 = k1X1000/1000 (default 1.2), b = bX1000/1000 (default 0.75).
    *
    * Scale shape: the term list is a literal array (a broadcast
    * dimension in the degenerate); the corpus is touched TWICE — once
    * for the (N, tot) scalars (a single-row broadcast, not a collect)
    * and once for the scoring stream, where the document length rides
    * WITH each term occurrence out of the same tokenization (array
    * materialized per row, size() + a filtered explode limited to query
    * terms — non-query tokens never leave the map side), so dl needs NO
    * corpus-size join back (the r14 review caught the old plan shuffling
    * a per-document dl relation against the tf stream — a data-scale
    * exchange — plus a third corpus scan). One (doc, term)
    * partial-aggregated count, one df aggregation DERIVED from the tf
    * relation (≤ |terms| rows), and a TakeOrdered top-k — no global
    * sort, no join bigger than |terms|.
    *
    * Int64 headroom — the honest bound is on the INTERMEDIATES, not the
    * final contribution: `num` = tf·2200·10³·tot·10³ stays exact while
    * tf·tot ≲ 4·10⁹ (corpora to a few 10⁹ tokens at ordinary tf). Past
    * that, score in doubles — the ranking is unchanged (every factor is
    * far under 2⁵³, and the ratio is smooth); the all-integer form
    * exists for the bit-exact cross-engine oracle, which runs at test
    * scale by construction. The idf term alone is exact to N ≈ 10⁹
    * docs. */
  def bm25(docs: DataFrame, terms: Seq[String], k: Int = 10,
      k1X1000: Long = 1200L, bX1000: Long = 750L,
      textCol: String = "text"): DataFrame = {
    // corpus scalars: N docs, tot tokens (single row, broadcast below)
    val stats = docs.agg(
      count(lit(1)).cast("long").as("n_docs"),
      sum(size(split(col(textCol), " "))).cast("long").as("tot"))
    // ONE tokenization per row feeds BOTH the doc length and the
    // term-filtered explode (array materialized as a column first — the
    // HOF re-evaluation rule), so dl rides with every occurrence and the
    // former corpus-size dl join disappears
    val toks = docs
      .select(col("doc_id"), split(col(textCol), " ").as("_toks"))
      .select(col("doc_id"), size(col("_toks")).cast("long").as("dl"),
        explode(filter(col("_toks"),
          t => t.isin(terms: _*))).as("token"))
    val tf = toks
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).cast("long").as("tf"),
        min(col("dl")).as("dl")) // constant within the doc; min = pick it
    val df = tf.groupBy(col("token"))
      .agg(count(lit(1)).cast("long").as("df")) // tf rows: distinct pairs
    tf.join(broadcast(df), "token")
      .crossJoin(broadcast(stats))
      // tfc ×1000: numerator and denominator both multiplied by 10⁶·tot
      // so the ONLY division is the final integer one (float-free);
      // df ≤ n_docs always, so the idf numerator is ≥ 10⁶ — no clamp
      .withColumn("num",
        col("tf") * (lit(1000L) + k1X1000) * lit(1000L) * col("tot") *
          lit(1000L))
      .withColumn("den",
        col("tf") * lit(1000000L) * col("tot") +
          lit(k1X1000) * ((lit(1000L) - bX1000) * col("tot") +
            lit(bX1000) * col("dl") * col("n_docs")))
      .withColumn("contrib",
        expr("((2 * (n_docs - df) + 1) * 1000000 div (2 * df + 1)) " +
          "* (num div den)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).cast("long").as("score"),
        count(lit(1)).cast("long").as("n_terms_hit"))
      .orderBy(desc("score"), col("doc_id"))
      .limit(k)
  }

  /** Hybrid retrieval — the RAG candidate-generation shape: a cheap
    * lexical BM25 scan shortlists `shortlist` documents, then only the
    * shortlist pays for exact embedding cosine against the query vector
    * (the row of `embs` with id `queryVecId`), and the top `k` by
    * semantic similarity (ties → doc_id) come back with BOTH scores.
    * Lexical recall + semantic precision, without ever running the
    * vector math over the full corpus.
    *
    * Scale shape: [[bm25]]'s scan cost (one corpus pass, no global
    * sort); the shortlist is ≤`shortlist` rows, so the embedding join is
    * a broadcast of the shortlist onto the (bucketable) embeddings
    * table, the query vector rides as a LITERAL (pulled eagerly by one
    * point lookup, validated to exactly one row — see inline), and the
    * rerank is per-row array math over `shortlist` rows.
    *
    * BEHAVIOR NOTE (since r15, intentional): construction is EAGER — the
    * query-vector lookup runs at call time and a missing or duplicated
    * `queryVecId` THROWS, where earlier versions built a lazy plan that
    * returned an empty result for a missing id. Callers that treated
    * "vector absent" as "no results" must pre-check the id; the loud
    * failure is deliberate (an empty frame is indistinguishable from
    * "no relevant docs", which silently corrupts downstream evals). */
  def hybridSearch(docs: DataFrame, embs: DataFrame, terms: Seq[String],
      queryVecId: Long = 0L, shortlist: Int = 20, k: Int = 5): DataFrame = {
    val short = bm25(docs, terms, shortlist)
    val vecs = embs.select(col("vec_id").as("doc_id"),
      Similarity.toDouble(col("embedding")).as("v"))
    // the query vector is pulled EAGERLY (one pushed-down point lookup —
    // the IVF centroid-pull pattern) and must be exactly one row: a
    // missing id would otherwise annihilate the whole result through the
    // cross join (0 rows, indistinguishable from "no relevant docs") and
    // a duplicated id would multiply the shortlist
    val qrows = vecs.filter(col("doc_id") === queryVecId)
      .select(col("v")).limit(2).collect()
    require(qrows.length == 1,
      s"hybridSearch: expected exactly one embedding with vec_id=" +
        s"$queryVecId, found ${if (qrows.isEmpty) "none" else "several"}")
    val qv = typedLit(qrows.head.getSeq[Double](0))
    broadcast(short).join(vecs, "doc_id")
      .withColumn("qv", qv)
      .withColumn("sim_r", round(
        Similarity.dot(col("qv"), col("v")) /
          (sqrt(Similarity.dot(col("qv"), col("qv"))) *
            sqrt(Similarity.dot(col("v"), col("v")))), 6))
      .orderBy(desc("sim_r"), col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("score"), col("sim_r"))
  }

  /** Out-of-vocabulary rate against the corpus's own top-`vocabSize`
    * vocabulary (ties broken by token — the [[TextAnalysis.vocabulary]]
    * rule): per document, token count, OOV token count, and the OOV rate
    * ×10⁶ (integer). The tokenizer-coverage QA metric: a vocab freeze
    * that strands 30% of a source's tokens shows up here, not in loss
    * curves three weeks later.
    *
    * Scale shape: the vocabulary is |vocabSize| rows — broadcast to the
    * exploded token stream (hash lookup per token, no shuffle of the
    * corpus side); one per-doc partial-aggregated count after. The
    * vocabulary build itself is the one corpus-wide aggregation, shared
    * shape with [[TextAnalysis.vocabulary]]. */
  def oovRate(docs: DataFrame, vocabSize: Int = 100,
      textCol: String = "text"): DataFrame = {
    val vocab = TextAnalysis.vocabulary(docs, vocabSize, textCol)
      .select(col("token"), lit(1).as("iv"))
    // explode_outer: a NULL-text doc keeps ONE row with a NULL token
    // (plain explode silently dropped the doc — precisely the degenerate
    // document a coverage QA exists to surface); it reports (0, 0, 0)
    docs.select(col("doc_id"),
        explode_outer(split(col(textCol), " ")).as("token"))
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("token")).cast("long").as("n_tokens"),
        sum(when(col("iv").isNull && col("token").isNotNull, 1L)
          .otherwise(0L)).cast("long").as("n_oov"))
      .withColumn("oov_x1e6",
        when(col("n_tokens") === 0L, lit(0L))
          .otherwise(expr("n_oov * 1000000 div n_tokens")))
  }

  /** Composed RAG-ingest pipeline — the retrieval-side counterpart of
    * the curation/landing compositions: overlapping character chunks
    * ([[TextAnalysis.chunkDocs]]) → hashing-trick feature vectors (no
    * vocabulary table, zero shuffle) → deterministic linear shard
    * assignment (argmax of integer dot against an LCG weight matrix,
    * ties → lowest cell) — the relation an ANN index build or a
    * cell-bucketed vector store ingests: (doc_id, chunk_id, cell,
    * chunk_len).
    *
    * The shard assignment is pure integer math so the whole chain is
    * bit-replayable in the oracle; swapping the LCG weights for trained
    * centroids turns the same plan into real IVF routing
    * ([[graft.ops.Ivf]] owns that path, with its own oracled queries).
    * Scale shape: per-row end to end — chunking is a bounded posexplode,
    * features and the nlist×dim score fan-out are flat codegen over the
    * row, and the output is ready to `repartition(cell)` for bucketed
    * writes without ever shuffling the text. */
  def ragIngest(docs: DataFrame, chunkChars: Int = 96, stride: Int = 64,
      dim: Int = 32, nlist: Int = 8, textCol: String = "text"): DataFrame = {
    val chunks = TextAnalysis.chunkDocs(docs, chunkChars, stride, textCol)
    // slots materialize as a column before the per-slot filter reads
    // them (interpreted-HOF rule, BENCH_NOTES r6). Chunk boundaries cut
    // mid-separator, so leading/trailing EMPTY tokens appear — excluded
    // before hashing (an empty string is not a token, and the engines
    // disagree on hashing it: DuckDB ord('') = −1 vs a 0-hash here)
    val slots = transform(
      filter(TextAnalysis.tokens(col("chunk_text")), t => t =!= ""),
      t => pmod(graft.functions.GraftFunctions.polyHash(t), lit(dim.toLong)))
    val feats = transform(sequence(lit(0), lit(dim - 1)),
      s => size(filter(col("_slots"), x => x === s)).cast("long"))
    val scored = chunks
      .select(col("doc_id"), col("chunk_id"), col("chunk_len"),
        slots.as("_slots"))
      .select(col("doc_id"), col("chunk_id"), col("chunk_len"),
        feats.as("_f"))
    val cellScores = (0 until nlist).map { c =>
      val ws = TextAnalysis.classifierWeights(dim, seed = 100L + c)
      (0 until dim).map(i => element_at(col("_f"), i + 1) * lit(ws(i)))
        .reduce(_ + _)
    }
    // argmax with ties to the LOWEST cell: lexicographic max over
    // (score, -cell) structs
    val best = greatest(cellScores.zipWithIndex.map { case (s, c) =>
      struct(s.as("s"), lit(-c).as("nc"))
    }: _*)
    scored.select(col("doc_id"), col("chunk_id"),
      (-best.getField("nc")).cast("long").as("cell"), col("chunk_len"))
  }

  /** Hard-negative mining — the contrastive-training data shape (DPR /
    * RocketQA style): for a query's term bag, the top `k` BM25-ranked
    * documents EXCLUDING the gold positives. Lexically close but
    * unlabeled-as-relevant documents are exactly the negatives that
    * teach a retriever its decision boundary; random negatives are too
    * easy and in-batch negatives too few.
    *
    * Ranking parity: document frequencies and corpus scalars are
    * computed over the FULL corpus (positives included) — excluding them
    * first would perturb every score. The exclusion happens on the
    * ranked list: fetch the top k+|positives| (exclusion can remove at
    * most |positives| rows from any prefix), drop positives, keep `k`.
    * Identical to ranking everything and filtering, at shortlist cost.
    *
    * Scale shape: [[bm25]]'s one corpus pass; the exclusion set rides
    * the plan as a literal NOT-IN over ≤ k+|positives| rows (driver-side
    * gold labels are small by definition — a labeled query has tens of
    * positives, not millions). */
  def hardNegatives(docs: DataFrame, terms: Seq[String],
      positives: Seq[Long], k: Int = 10,
      textCol: String = "text"): DataFrame =
    bm25(docs, terms, k + positives.size, textCol = textCol)
      .filter(!col("doc_id").isin(positives: _*))
      .orderBy(desc("score"), col("doc_id"))
      .limit(k)
}
