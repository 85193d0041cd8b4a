package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Multimodal

/** Rows-only SparkEntry surface for the multimodal plumbing (binary
  * payloads + typed metadata + batched decode-stub features). Feature
  * vectors are serialized to CSV strings so the dumped parquet stays
  * flat for the driver's generic row checks. */
object MediaOps {

  /** Integer histogram stage of the decode stub — the oracled feature
    * surface (the normalized float form can't hash-compare cross-engine;
    * see Multimodal.extractHistograms). */
  def features(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractHistograms(
        Multimodal.mediaFromDocuments(Tables(s, dir).documents))
      .toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        concat_ws(",", transform(col("hist"), _.cast("string")))
          .as("hist_csv"))

  def frames(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
        Multimodal.mediaFromDocuments(Tables(s, dir).documents))
      .toDF()
      .select(col("media_id"), col("frame_no"), col("offset"),
        length(col("frame_bytes")).as("n_frame_bytes"))

  /** Media near-dup via perceptual-hash signatures: the corpus plus a
    * lightly-edited copy of every payload (one byte appended — media_id
    * + 1000000), paired by the generic hamming chunk-pair blocking.
    * The oracle recomputes signatures byte-for-byte in DuckDB and scans
    * ALL pairs exhaustively, independently re-proving the blocking's
    * recall guarantee on binary payloads. */
  def mediaNearDup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir).documents
    val mutated = docs.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit("z")).as("text"))
    val media = Multimodal.mediaFromDocuments(
      docs.select(col("doc_id"), col("text")).union(mutated))
    // signatures STAGED like simhashNearDupPairs' (r21): hammingNearDupPairs
    // evaluates its input in both the bucket census and the blocked kernel
    // branch, and the per-row payload histogram (histStub over every media
    // byte) is the operator's dominant cost — unstaged it ran twice per
    // action. 16 bytes/row cached; Stage lifecycle as usual.
    graft.ops.Dedup.hammingNearDupPairs(
        graft.ops.Stage.barrier(Multimodal.mediaSignatures(media).toDF()),
        maxHamming = 6, idCol = "media_id", sigCol = "sig")
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"),
        col("hamming"))
  }

  /** Per-frame feature histograms over the sampled video frames. */
  def frameFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.frameHistograms(
        Multimodal.sampleFrames(
          Multimodal.mediaFromDocuments(Tables(s, dir).documents)))
      .toDF()
      .select(col("media_id"), col("frame_no"),
        concat_ws(",", transform(col("hist"), _.cast("string")))
          .as("hist_csv"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_features" -> features,
    "q_media_frames" -> frames,
    "q_media_neardup" -> mediaNearDup,
    "q_frame_features" -> frameFeatures,
  )

  /** Frame offsets/sizes are pure arithmetic on the payload length, and
    * the feature histogram is pure integer arithmetic over the UTF-8
    * payload bytes — DuckDB recovers each byte from the hex dump of
    * encode(text) (no direct blob indexing in 1.0), folds the identical
    * (b+i) mod 16 weighted histogram, and zero-fills empty slots. */
  val oracle: Map[String, String] = Map(
    "q_media_features" ->
      // engine lockstep on degenerate rows: NULL text is a ZERO-byte
      // payload (coalesce) and kind/filters use the sign-safe
      // ((id % 3) + 3) % 3 — the engine's pmod
      ("WITH m AS (SELECT doc_id AS media_id, " +
        "(['image','audio','video'])" +
        "[CAST((doc_id % 3 + 3) % 3 + 1 AS INT)] AS kind, " +
        "hex(coalesce(encode(text), encode(''))) AS hx, " +
        "CAST(coalesce(octet_length(encode(text)), 0) AS INT) AS n_bytes " +
        "FROM documents), " +
        "vals AS (SELECT media_id, i, " +
        "(strpos('0123456789ABCDEF', substr(hx, CAST(2*i+1 AS INT), 1)) - 1) " +
        "* 16 + " +
        "(strpos('0123456789ABCDEF', substr(hx, CAST(2*i+2 AS INT), 1)) - 1) " +
        "AS bv FROM (SELECT media_id, hx, " +
        "unnest(range(0, n_bytes)) AS i FROM m)), " +
        "hist AS (SELECT media_id, CAST((bv + i) % 16 AS INT) AS slot, " +
        "CAST(sum(bv) AS BIGINT) AS s FROM vals GROUP BY 1, 2), " +
        "slots AS (SELECT m.media_id, sl.slot FROM m CROSS JOIN " +
        "(SELECT CAST(unnest(range(16)) AS INT) AS slot) sl), " +
        "filled AS (SELECT slots.media_id, slots.slot, " +
        "coalesce(hist.s, 0) AS s FROM slots LEFT JOIN hist " +
        "ON hist.media_id = slots.media_id AND hist.slot = slots.slot), " +
        "csv AS (SELECT media_id, " +
        "array_to_string(list(s ORDER BY slot), ',') AS hist_csv " +
        "FROM filled GROUP BY media_id) " +
        "SELECT m.media_id, m.kind, m.n_bytes, c.hist_csv " +
        "FROM m JOIN csv c USING (media_id)"),
    "q_media_frames" ->
      ("SELECT media_id, CAST(off // 256 AS INT) AS frame_no, " +
        "CAST(off AS INT) AS \"offset\", " +
        "CAST(least(64, len - off) AS INT) AS n_frame_bytes FROM (" +
        "SELECT doc_id AS media_id, " +
        "coalesce(octet_length(encode(text)), 0) AS len, " +
        "unnest(range(0, greatest(len - 63, 1), 256)) AS off " +
        "FROM documents WHERE (doc_id % 3 + 3) % 3 = 2)"),
    // per-frame histograms: the same hex byte recovery, windowed to each
    // frame's offset with FRAME-LOCAL weighting indices
    "q_frame_features" ->
      ("WITH m AS (SELECT doc_id AS media_id, " +
        "hex(coalesce(encode(text), encode(''))) AS hx, " +
        "coalesce(octet_length(encode(text)), 0) AS len FROM documents " +
        "WHERE (doc_id % 3 + 3) % 3 = 2), " +
        "f AS (SELECT media_id, hx, len, " +
        "unnest(range(0, greatest(len - 63, 1), 256)) AS off FROM m), " +
        "v AS (SELECT media_id, off, j, " +
        "(strpos('0123456789ABCDEF', " +
        "substr(hx, CAST(2*(off+j)+1 AS INT), 1)) - 1) * 16 + " +
        "(strpos('0123456789ABCDEF', " +
        "substr(hx, CAST(2*(off+j)+2 AS INT), 1)) - 1) AS bv FROM (" +
        "SELECT media_id, hx, off, " +
        "unnest(range(0, least(64, len - off))) AS j FROM f)), " +
        "hist AS (SELECT media_id, off, CAST((bv + j) % 16 AS INT) " +
        "AS slot, CAST(sum(bv) AS BIGINT) AS s FROM v GROUP BY 1, 2, 3), " +
        "slots AS (SELECT f.media_id, f.off, sl.slot FROM f CROSS JOIN " +
        "(SELECT CAST(unnest(range(16)) AS INT) AS slot) sl), " +
        "filled AS (SELECT slots.media_id, slots.off, slots.slot, " +
        "coalesce(hist.s, 0) AS s FROM slots LEFT JOIN hist " +
        "ON hist.media_id = slots.media_id AND hist.off = slots.off " +
        "AND hist.slot = slots.slot) " +
        "SELECT media_id, CAST(off // 256 AS INT) AS frame_no, " +
        "array_to_string(list(s ORDER BY slot), ',') AS hist_csv " +
        "FROM filled GROUP BY media_id, off"),
    // signatures recomputed byte-for-byte (same hex recovery as
    // q_media_features, 62 slots, integer above-mean threshold), then an
    // EXHAUSTIVE all-pairs hamming scan — independently proving the
    // chunk-pair blocking's recall on binary payloads
    "q_media_neardup" ->
      ("WITH d AS (SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT doc_id + 1000000, text || 'z' FROM documents), " +
        "m AS (SELECT doc_id AS media_id, " +
        "hex(coalesce(encode(text), encode(''))) AS hx, " +
        "CAST(coalesce(octet_length(encode(text)), 0) AS INT) " +
        "AS n_bytes FROM d), " +
        "vals AS (SELECT media_id, i, " +
        "(strpos('0123456789ABCDEF', substr(hx, CAST(2*i+1 AS INT), 1)) " +
        "- 1) * 16 + " +
        "(strpos('0123456789ABCDEF', substr(hx, CAST(2*i+2 AS INT), 1)) " +
        "- 1) AS bv FROM (SELECT media_id, hx, " +
        "unnest(range(0, n_bytes)) AS i FROM m)), " +
        "hist AS (SELECT media_id, CAST((bv + i) % 62 AS INT) AS slot, " +
        "CAST(sum(bv) AS BIGINT) AS s FROM vals GROUP BY 1, 2), " +
        "tot AS (SELECT media_id, CAST(sum(bv) AS BIGINT) AS total " +
        "FROM vals GROUP BY 1), " +
        "sig0 AS (SELECT h.media_id, CAST(sum(CASE WHEN h.s * 62 > t.total " +
        "THEN (1::BIGINT << h.slot) ELSE 0 END) AS BIGINT) AS sig " +
        "FROM hist h JOIN tot t USING (media_id) GROUP BY h.media_id), " +
        // LEFT JOIN back to every media row: an empty payload has no vals/
        // hist rows and would otherwise vanish here, while the engine's
        // mediaSignatures emits sig = 0 for it — coalesce keeps the two
        // sides divergence-free on degenerate corpora
        "sig AS (SELECT m.media_id, coalesce(sig0.sig, 0) AS sig " +
        "FROM m LEFT JOIN sig0 USING (media_id)) " +
        "SELECT a.media_id AS id_a, b.media_id AS id_b, " +
        "CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming " +
        "FROM sig a JOIN sig b ON a.media_id < b.media_id " +
        "WHERE bit_count(xor(a.sig, b.sig)) <= 6"),
  )
}
