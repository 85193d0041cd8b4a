package graft.queries

/** Shared DuckDB-SQL renderings used across the oracle maps. Lives in its
  * own object so query objects can share it without referencing each
  * other (cross-references during object init deadlock into nulls). */
object OracleSql {

  /** The portable polynomial hash (functions.PolyHash) as DuckDB SQL. */
  def pHash(e: String): String =
    "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split(CAST($e AS VARCHAR), ''), " +
      "ch -> CAST(ord(ch) AS BIGINT))), " +
      "(acc, cp) -> (acc * 31 + cp) % 2147483647)"

  /** [[pHash]] generalized to an arbitrary base — building block of the
    * 62-bit rendering below (and DedupSim's simhash lane hashing). */
  def pHashBase(e: String, base: Long): String =
    "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split(CAST($e AS VARCHAR), ''), " +
      "ch -> CAST(ord(ch) AS BIGINT))), " +
      s"(acc, cp) -> (acc * $base + cp) % 2147483647)"

  /** The 62-bit dual polynomial hash (functions.PolyHash2 =
    * h₃₇·2³¹ + h₃₁; both halves < 2³¹ so `<< 31 | a` ≡ the product-sum
    * and the result fits BIGINT). */
  def pHash2(e: String): String =
    s"(${pHashBase(e, 37L)} * 2147483648 + ${pHashBase(e, 31L)})"

  /** PhoneFix.fixPhoneValue's per-segment cascade over a lambda alias
    * `s` — strip separators (incl. the fullwidth plus), then
    * first-match-wins HK → PRC cell → Shenzhen landline; NULL when no
    * shape matches (parse_clean_and_csv.py:490-522). Shared by
    * q_phone_canon and the OSM tag-fix oracles. */
  val phoneSegmentCase: String =
    """CASE
      | WHEN regexp_matches(regexp_replace(s, '[- +)(＋]+', '', 'g'), '^(852)?\d{8}$')
      |   THEN '+852 ' || regexp_extract(regexp_replace(s, '[- +)(＋]+', '', 'g'), '^(?:852)?(\d{8})$', 1)
      | WHEN regexp_matches(regexp_replace(s, '[- +)(＋]+', '', 'g'), '^(86)?1[3-9]\d{9}$')
      |   THEN '+86 ' || regexp_extract(regexp_replace(s, '[- +)(＋]+', '', 'g'), '^(?:86)?(1[3-9]\d{9})$', 1)
      | WHEN regexp_matches(regexp_replace(s, '[- +)(＋]+', '', 'g'), '^(86)?0?755\d{6,8}$')
      |   THEN '+86 755 ' || regexp_extract(regexp_replace(s, '[- +)(＋]+', '', 'g'), '^(?:86)?0?755(\d{6,8})$', 1)
      | ELSE NULL END""".stripMargin.replace("\n", " ")

  /** The canonicalized (matched-only) segment list of `,`/`;`-separated
    * phone expression `raw`. */
  def phoneMatchedList(raw: String): String =
    s"list_filter(list_transform(string_split_regex($raw, '[,;]'), " +
      s"s -> $phoneSegmentCase), x -> x IS NOT NULL)"

  /** ops.Retrieval.bm25 restated with the same ×1000/×10⁶ scaled-integer
    * arithmetic: the only divisions are the two integer ones, so scores
    * are bit-exact across engines (sum(contrib) re-cast: DuckDB widens
    * BIGINT sums to HUGEINT). Shared by q_bm25 and the hybrid-search
    * oracle that shortlists through it. */
  def duckBm25(terms: Seq[String], k: Int): String =
    duckBm25(terms, k, Seq.empty)

  /** [[duckBm25]] with a positives exclusion applied AFTER scoring
    * (df/corpus scalars stay full-corpus — Retrieval.hardNegatives'
    * ranking-parity rule). */
  def duckBm25(terms: Seq[String], k: Int, exclude: Seq[Long]): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val excl =
      if (exclude.isEmpty) ""
      else s"WHERE doc_id NOT IN (${exclude.mkString(", ")}) "
    "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) " +
      "AS token FROM documents), " +
      "stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, " +
      "CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tot " +
      "FROM documents), " +
      "dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) " +
      "AS BIGINT) AS dl FROM documents), " +
      "tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf " +
      s"FROM toks WHERE token IN ($termList) " +
      "GROUP BY doc_id, token), " +
      "df AS (SELECT token, CAST(count(*) AS BIGINT) AS df " +
      "FROM tf GROUP BY token), " +
      "sc AS (SELECT tf.doc_id, " +
      "((2 * (n_docs - df) + 1) * 1000000 // (2 * df + 1)) * " +
      "((tf * 2200 * 1000 * tot * 1000) // " +
      "(tf * 1000000 * tot + 1200 * ((1000 - 750) * tot + " +
      "750 * dl * n_docs))) AS contrib " +
      "FROM tf JOIN df USING (token) CROSS JOIN stats " +
      "JOIN dl USING (doc_id)) " +
      "SELECT doc_id, score, n_terms_hit FROM (" +
      "SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS score, " +
      "CAST(count(*) AS BIGINT) AS n_terms_hit FROM sc " +
      "GROUP BY doc_id) " + excl +
      s"ORDER BY score DESC, doc_id LIMIT $k"
  }
}
