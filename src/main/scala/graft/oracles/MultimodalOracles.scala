package graft.oracles

/** DuckDB oracle SQL for the multimodal query family — the
  * literal twins split out of SparkEntry (one object per family;
  * `SparkEntry.oracleSqlBase` unions them). Entry text is
  * byte-identical to the pre-split map: derived oracles anchor on
  * exact substrings of these strings. */
object MultimodalOracles {
  val sql: Map[String, String] = Map(
    "mm1_media_features" ->
      """SELECT doc_id,
        |  (['png','jpeg','wav','mp4'])[CAST(doc_id % 4 + 1 AS INT)] AS format,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS media_len,
        |  md5(text) AS media_md5,
        |  md5(substr(text, 1, 64)) AS thumb_md5,
        |  CAST((octet_length(encode(text)) + 255) // 256 AS BIGINT) AS n_frames
        |FROM documents""".stripMargin,
    // FakeDecoder is a pure function of the UTF-8 bytes, so the oracle
    // reproduces it from the hex dump: byte i = 16·hi + lo nibble.
    "mm2_decoded_features" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents
        |)
        |SELECT doc_id,
        |  (['png','jpeg','wav','mp4'])[CAST(doc_id % 4 + 1 AS INT)] AS format,
        |  n AS n_bytes,
        |  CAST((n + 255) // 256 AS BIGINT) AS n_frames,
        |  CASE WHEN n = 0 THEN 0.0 ELSE
        |    CAST(list_sum(list_transform(generate_series(1, CAST(n AS INT)),
        |      i -> (strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1) * 16
        |         + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1))) AS DOUBLE) / n
        |  END AS mean_byte,
        |  CAST(CASE WHEN n = 0 THEN -1 ELSE
        |    (strpos('0123456789ABCDEF', substr(hx, 1, 1)) - 1) * 16
        |    + (strpos('0123456789ABCDEF', substr(hx, 2, 1)) - 1)
        |  END AS INT) AS first_byte
        |FROM b""".stripMargin,
    // Patch slicing runs over the hex dump on both engines (2 chars/byte);
    // md5 is taken over the hex substring itself, so no BLOB functions are
    // needed anywhere.
    "mm3_patch_extract" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents),
        |e0 AS (SELECT doc_id, hx,
        |  UNNEST(range(0, (n + 31) // 32)) AS pi FROM b),
        |e AS (SELECT doc_id, CAST(pi AS INT) AS patch_idx,
        |  substr(hx, CAST(64 * pi + 1 AS BIGINT), 64) AS ph FROM e0)
        |SELECT doc_id, patch_idx,
        |  CAST(length(ph) // 2 AS BIGINT) AS patch_len,
        |  md5(ph) AS patch_md5,
        |  CAST((strpos('0123456789ABCDEF', substr(ph, 1, 1)) - 1) * 16
        |    + (strpos('0123456789ABCDEF', substr(ph, 2, 1)) - 1) AS INT)
        |    AS first_byte
        |FROM e""".stripMargin,
    // Every 16th byte via hex-dump nibbles (stride 16 → 32 hex chars apart).
    "mm4_frame_sample" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents),
        |e AS (SELECT doc_id, hx,
        |  UNNEST(range(0, (n + 15) // 16)) AS fi FROM b)
        |SELECT doc_id AS media_id, CAST(fi AS INT) AS frame_idx,
        |  CAST((strpos('0123456789ABCDEF',
        |      substr(hx, CAST(32 * fi + 1 AS BIGINT), 1)) - 1) * 16
        |    + (strpos('0123456789ABCDEF',
        |      substr(hx, CAST(32 * fi + 2 AS BIGINT), 1)) - 1) AS INT)
        |    AS frame_byte
        |FROM e""".stripMargin,
    // stride-4 thumbnail: every 4th byte (8 hex chars apart), md5 over the
    // concatenated hex pairs — byte-exact on both engines
    "mm5_resize" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents),
        |o AS (SELECT doc_id, n AS n_bytes,
        |  CAST((n + 3) // 4 AS BIGINT) AS thumb_bytes, hx FROM b)
        |SELECT doc_id, n_bytes, thumb_bytes,
        |  CASE WHEN thumb_bytes > 0 THEN md5(array_to_string(
        |    list_transform(range(0, thumb_bytes),
        |      i -> substr(hx, CAST(8 * i + 1 AS BIGINT), 2)), ''))
        |  ELSE NULL END AS thumb_md5
        |FROM o""".stripMargin,
    "mm8_media_mix" ->
      """SELECT source,
        |  ['png', 'jpeg', 'wav', 'mp4'][CAST(doc_id % 4 + 1 AS INT)]
        |    AS format,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY 1, 2""".stripMargin,
    // mm17: mm8's catalog aggregate + the c22 largest-remainder
    // apportionment over byte mass (ties by source, format).
    "mm17_mix_allocation" ->
      """WITH per AS (SELECT source,
        |    ['png', 'jpeg', 'wav', 'mp4'][CAST(doc_id % 4 + 1 AS INT)]
        |      AS format,
        |    CAST(count(*) AS BIGINT) AS n_items,
        |    CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
        |  FROM documents GROUP BY 1, 2),
        |a1 AS (SELECT *,
        |    CASE WHEN CAST(SUM(total_bytes) OVER () AS DOUBLE) > 0
        |      THEN CAST(10000 AS DOUBLE) * CAST(total_bytes AS DOUBLE)
        |        / CAST(SUM(total_bytes) OVER () AS DOUBLE)
        |      ELSE CAST(10000 AS DOUBLE) * CAST(n_items AS DOUBLE)
        |        / CAST(SUM(n_items) OVER () AS DOUBLE) END AS raw
        |  FROM per),
        |a2 AS (SELECT *, floor(raw) AS b, raw - floor(raw) AS f FROM a1),
        |a3 AS (SELECT *, 10000 - CAST(SUM(b) OVER () AS BIGINT) AS rem,
        |    row_number() OVER (ORDER BY f DESC, source, format) AS rn
        |  FROM a2)
        |SELECT source, format, n_items, total_bytes,
        |  CAST(b AS BIGINT) + (CASE WHEN rn <= rem THEN 1 ELSE 0 END)
        |    AS alloc
        |FROM a3""".stripMargin,
    // PCM-at-128 read of the payload bytes via the hex dump; energy is
    // exact integer math, RMS one IEEE division + correctly-rounded sqrt.
    "mm7_frame_energy" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents),
        |u AS (SELECT doc_id, hx, unnest(range(0, n)) AS i FROM b),
        |s AS (SELECT doc_id, CAST(i // 64 AS BIGINT) AS frame_idx,
        |    CAST(('0x' || substr(hx, CAST(2 * i + 1 AS INT), 2)) AS INT)
        |      - 128 AS sv
        |  FROM u),
        |fr AS (SELECT doc_id AS media_id, frame_idx,
        |    CAST(count(*) AS BIGINT) AS n_samples,
        |    CAST(SUM(sv * sv) AS BIGINT) AS energy
        |  FROM s GROUP BY 1, 2)
        |SELECT media_id, frame_idx, n_samples, energy,
        |  sqrt(CAST(energy AS DOUBLE) / n_samples) AS rms
        |FROM fr""".stripMargin,
    // dHash over the stride-4 thumbnail, then d9's banded Hamming search:
    // 4 × 15-bit bands on the 60-bit hash, xor+bit_count on candidates.
    "mm6_phash_pairs" ->
      """WITH t AS (SELECT doc_id, hex(encode(text)) AS hx,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents),
        |th AS (SELECT doc_id,
        |    list_transform(range(0, 61),
        |      i -> CAST(('0x' || substr(hx, CAST(i * 8 + 1 AS INT), 2))
        |        AS INT)) AS b
        |  FROM t WHERE n >= 241),
        |ph AS (SELECT doc_id,
        |    list_reduce(list_transform(range(0, 60),
        |      i -> CASE WHEN b[CAST(i + 1 AS INT)] < b[CAST(i + 2 AS INT)]
        |           THEN (1::BIGINT << CAST(i AS INT)) ELSE 0::BIGINT END),
        |      (a, x) -> a | x) AS phash
        |  FROM th),
        |bands AS (SELECT doc_id, phash, j,
        |    (phash >> CAST(15 * j AS INT)) & 32767 AS bv
        |  FROM ph, range(4) r(j)),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.phash AS pa, b.phash AS pb
        |  FROM bands a JOIN bands b ON a.j = b.j AND a.bv = b.bv
        |    AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, bit_count(xor(pa, pb)) AS hamming
        |FROM cand WHERE bit_count(xor(pa, pb)) <= 6""".stripMargin,
    // mm9: mm6's signature/band CTEs with the corpus split at the band
    // stage — stored side doc_id % 10 <> 0, incoming % 10 = 0, no
    // ordering constraint (cross-set namespaces).
    "mm9_phash_vs_index" ->
      """WITH t AS (SELECT doc_id, hex(encode(text)) AS hx,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents),
        |th AS (SELECT doc_id,
        |    list_transform(range(0, 61),
        |      i -> CAST(('0x' || substr(hx, CAST(i * 8 + 1 AS INT), 2))
        |        AS INT)) AS b
        |  FROM t WHERE n >= 241),
        |ph AS (SELECT doc_id,
        |    list_reduce(list_transform(range(0, 60),
        |      i -> CASE WHEN b[CAST(i + 1 AS INT)] < b[CAST(i + 2 AS INT)]
        |           THEN (1::BIGINT << CAST(i AS INT)) ELSE 0::BIGINT END),
        |      (a, x) -> a | x) AS phash
        |  FROM th),
        |bandsk AS (SELECT doc_id, phash, j,
        |    (phash >> CAST(15 * j AS INT)) & 32767 AS bv
        |  FROM ph, range(4) r(j) WHERE doc_id % 10 <> 0),
        |bandsi AS (SELECT doc_id, phash, j,
        |    (phash >> CAST(15 * j AS INT)) & 32767 AS bv
        |  FROM ph, range(4) r(j) WHERE doc_id % 10 = 0),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS dup_of,
        |    a.phash AS pa, b.phash AS pb
        |  FROM bandsi a JOIN bandsk b ON a.j = b.j AND a.bv = b.bv)
        |SELECT doc_id, dup_of, bit_count(xor(pa, pb)) AS hamming
        |FROM cand WHERE bit_count(xor(pa, pb)) <= 6""".stripMargin,
  )
}
