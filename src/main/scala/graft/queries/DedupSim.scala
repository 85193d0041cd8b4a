package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Dedup, Similarity}

/** SparkEntry surface for the dedup + similarity-search operators.
  *
  * Near-dup queries union the corpus with deterministically MUTATED copies
  * (offset ids) so the operators demonstrably find true positives on the
  * synthetic data (which contains no natural near-duplicates — documents
  * are unique and embeddings are isotropic noise).
  */
object DedupSim {

  /** documents ∪ near-dup copies: id + 1_000_000, first token dropped. */
  private def docsWithMutants(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir).documents.select(col("doc_id"), col("text"))
    docs.union(docs.select(col("doc_id") + 1000000L,
      regexp_replace(col("text"), "^[^ ]* ", "")))
  }

  /** embeddings ∪ near-identical copies: id + 1_000_000, first component
    * scaled ×1.2 (cosine vs original ≈ 0.99+). */
  private def embsWithMutants(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir).embeddings.select(col("vec_id"), col("embedding"))
    e.union(e.select(col("vec_id") + 1000000L,
      transform(col("embedding"),
        (x, i) => when(i === 0, x * 1.2f).otherwise(x))))
  }

  def exactDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(Tables(s, dir).documents)

  /** Pairwise Jaccard baseline, blocked on (source, lang) — blocking
    * granularity is the scale knob for the quadratic baseline; the LSH
    * pipeline below is the unblocked scale path. */
  def jaccardPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(
      Tables(s, dir).documents
        .withColumn("blk", concat_ws("|", col("source"), col("lang"))),
      "blk", n = 1, numer = 3, denom = 4)

  def minhashSigs(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashSignaturesNative(Tables(s, dir).documents)
      .select(col("doc_id"), concat_ws(",", col("sig")).as("sig_csv"))

  def minhashNearDups(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashDedupPairs(docsWithMutants(s, dir))

  def simhashes(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashes(Tables(s, dir).documents)

  def simhashNearDups(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDupPairs(docsWithMutants(s, dir))

  def knnBrute(s: SparkSession, dir: String): DataFrame =
    Similarity.knnBrute(Tables(s, dir).embeddings, nQueries = 10, k = 5)

  def knnLsh(s: SparkSession, dir: String): DataFrame =
    Similarity.knnLsh(Tables(s, dir).embeddings, nQueries = 10, k = 5)

  def knnIvf(s: SparkSession, dir: String): DataFrame =
    graft.ops.Ivf.knnIvf(Tables(s, dir).embeddings, nQueries = 10, k = 5)

  /** 12 bits/table (4096 buckets): for ~10k isotropic vectors this keeps
    * random bucket collisions ~16× rarer than the 8-bit default while
    * near-identical pairs (cosine ≥ .99) still collide in ≥1 of 4 tables
    * w.p. ~.97 — candidate volume, not the exact verify, is the cost. */
  def embedNearDups(s: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairs(embsWithMutants(s, dir), minCosine = 0.95,
      bitsPerTable = 12)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_docs" -> exactDedup,
    "q_jaccard_pairs" -> jaccardPairs,
    "q_minhash_sigs" -> minhashSigs,
    "q_minhash_neardup" -> minhashNearDups,
    "q_simhash" -> simhashes,
    "q_simhash_neardup" -> simhashNearDups,
    "q_knn_brute" -> knnBrute,
    "q_knn_lsh" -> knnLsh,
    "q_knn_ivf" -> knnIvf,
    "q_embed_neardup" -> embedNearDups,
  )

  /** DuckDB dot product with the same left-to-right double accumulation as
    * Similarity.dot (list_reduce over the zipped products). */
  private def duckDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(list_zip($a, $b), " +
      "z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))), " +
      "(acc, x) -> acc + x)"

  /** Machine-generated oracle for the hyperplane-LSH signatures: the same
    * plane constants as Similarity.knnLsh rendered as SQL literals. Dot
    * products accumulate in the same order on both engines, so signs —
    * and therefore buckets and candidate sets — match bit-for-bit. */
  private def duckLshSignatureSql: String = {
    val tables = (0 until 4).map { t =>
      val planes = graft.ops.Similarity.hyperplanes(8, 64, seed = 1000L + t)
      val bits = planes.zipWithIndex.map { case (p, i) =>
        val lit = p.mkString("[", ", ", "]")
        s"(CASE WHEN ${duckDot("e", lit)} >= 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, e, $t AS tbl, $bits AS bucket FROM v"
    }
    tables.mkString(" UNION ALL ")
  }

  val oracle: Map[String, String] = Map(
    "q_dedup_docs" ->
      ("SELECT lower(text) AS text_norm, min(doc_id) AS keep_id, " +
        "count(*) AS n_copies FROM documents GROUP BY 1"),
    "q_jaccard_pairs" ->
      ("WITH sh AS (SELECT doc_id, source, lang, " +
        "list_distinct(string_split(text, ' ')) AS s FROM documents) " +
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "len(list_intersect(a.s, b.s)) AS n_inter, " +
        "len(list_distinct(list_concat(a.s, b.s))) AS n_union " +
        "FROM sh a JOIN sh b ON a.source = b.source AND a.lang = b.lang " +
        "AND a.doc_id < b.doc_id " +
        "WHERE len(list_intersect(a.s, b.s)) * 4 >= " +
        "len(list_distinct(list_concat(a.s, b.s))) * 3"),
    "q_knn_brute" ->
      ("WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e " +
        "FROM embeddings), " +
        "scored AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, " +
        duckDot("q.e", "n.e") + " / (sqrt(" + duckDot("q.e", "q.e") +
        ") * sqrt(" + duckDot("n.e", "n.e") + ")) AS sim " +
        "FROM v q JOIN v n ON q.vec_id < 10 AND q.vec_id != n.vec_id) " +
        "SELECT query_id, neighbor_id, rank, round(sim, 6) AS sim_r FROM (" +
        "SELECT query_id, neighbor_id, sim, CAST(row_number() OVER (" +
        "PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) " +
        "AS rank FROM scored) WHERE rank <= 5"),
    "q_knn_lsh" ->
      ("WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e " +
        "FROM embeddings), " +
        "buckets AS (" + duckLshSignatureSql + "), " +
        "cand AS (SELECT DISTINCT q.vec_id AS query_id, " +
        "n.vec_id AS neighbor_id FROM buckets q JOIN buckets n " +
        "ON q.tbl = n.tbl AND q.bucket = n.bucket " +
        "WHERE q.vec_id < 10 AND q.vec_id != n.vec_id), " +
        "scored AS (SELECT c.query_id, c.neighbor_id, " +
        duckDot("q.e", "n.e") + " / (sqrt(" + duckDot("q.e", "q.e") +
        ") * sqrt(" + duckDot("n.e", "n.e") + ")) AS sim " +
        "FROM cand c JOIN v q ON q.vec_id = c.query_id " +
        "JOIN v n ON n.vec_id = c.neighbor_id) " +
        "SELECT query_id, neighbor_id, rank, round(sim, 6) AS sim_r FROM (" +
        "SELECT query_id, neighbor_id, sim, CAST(row_number() OVER (" +
        "PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) " +
        "AS rank FROM scored) WHERE rank <= 5"),
  )
}
