package graft.oracles

/** DuckDB oracle SQL for the similarity query family — the
  * literal twins split out of SparkEntry (one object per family;
  * `SparkEntry.oracleSqlBase` unions them). Entry text is
  * byte-identical to the pre-split map: derived oracles anchor on
  * exact substrings of these strings. */
object SimilarityOracles {
  val sql: Map[String, String] = Map(
    "s4_range_search" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        | FROM v q JOIN v c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id)
        |SELECT query_id, neighbor_id, cos FROM p WHERE cos >= 0.3""".stripMargin,
    "s5_hybrid_rrf" ->
      """WITH t AS (SELECT doc_id,
        |  unnest(list_distinct(string_split(text,' '))) AS term FROM documents),
        |q AS (SELECT doc_id AS query_id, term FROM t WHERE doc_id % 100 = 0),
        |o AS (SELECT query_id, t.doc_id, count(*) AS ovl
        |  FROM q JOIN t USING (term) WHERE t.doc_id <> query_id GROUP BY 1, 2),
        |lr AS (SELECT query_id, doc_id, rank_l FROM (
        |  SELECT query_id, doc_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY ovl DESC, doc_id) AS rank_l
        |  FROM o) WHERE rank_l <= 20),
        |v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        | FROM v q JOIN v c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id),
        |vr AS (SELECT query_id, neighbor_id AS doc_id, rank_v FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank_v
        |  FROM p) WHERE rank_v <= 20)
        |SELECT COALESCE(lr.query_id, vr.query_id) AS query_id,
        |  COALESCE(lr.doc_id, vr.doc_id) AS doc_id,
        |  COALESCE(CAST(1 AS DOUBLE) / (60 + rank_l), 0)
        |    + COALESCE(CAST(1 AS DOUBLE) / (60 + rank_v), 0) AS rrf_score
        |FROM lr FULL OUTER JOIN vr
        |  ON lr.query_id = vr.query_id AND lr.doc_id = vr.doc_id""".stripMargin,
    "s6_ann_tiered" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |co AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_reduce(list_transform(range(1,17), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,17), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,17), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS ccos
        | FROM v q JOIN v c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id),
        |cand AS (SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY ccos DESC, neighbor_id) AS r
        |  FROM co) WHERE r <= 30),
        |fx AS (SELECT cand.query_id, cand.neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        | FROM cand JOIN v q ON q.vec_id = cand.query_id
        |           JOIN v c ON c.vec_id = cand.neighbor_id)
        |SELECT query_id, neighbor_id, cos, rank FROM (
        |  SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM fx) WHERE rank <= 10""".stripMargin,
    "s7_ann_hamming" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |b AS (SELECT vec_id, x,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 32), i ->
        |    CASE WHEN x[i + 1] >= 0 THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END)),
        |    (a, w) -> a | w) AS w0,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 32), i ->
        |    CASE WHEN x[i + 33] >= 0 THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END)),
        |    (a, w) -> a | w) AS w1
        | FROM v),
        |ham AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  CAST(bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1)) AS BIGINT) AS hamming
        | FROM b q JOIN b c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id),
        |cand AS (SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY hamming, neighbor_id) AS r
        |  FROM ham) WHERE r <= 30),
        |fx AS (SELECT cand.query_id, cand.neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        | FROM cand JOIN v q ON q.vec_id = cand.query_id
        |           JOIN v c ON c.vec_id = cand.neighbor_id)
        |SELECT query_id, neighbor_id, cos, rank FROM (
        |  SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM fx) WHERE rank <= 10""".stripMargin,
    // s1's scan with the label inequality in the join, per-anchor top-5.
    "s10_hard_negatives" ->
      """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS x FROM embeddings),
        |p AS (SELECT q.vec_id AS query_id, q.label AS qlabel,
        |  c.vec_id AS neighbor_id, c.label AS neg_label,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        | FROM v q JOIN v c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id
        |   AND c.label <> q.label)
        |SELECT query_id, qlabel, neighbor_id, neg_label, cos, rank FROM (
        |  SELECT query_id, qlabel, neighbor_id, neg_label, cos,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, neighbor_id) AS INT) AS rank
        |  FROM p) WHERE rank <= 5""".stripMargin,
    // s1's exact top-10 and s6's tiered top-10 composed, left-joined on
    // (query, neighbor), reduced to per-query recall.
    "s9_ann_recall" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        | FROM v q JOIN v c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id),
        |ex AS (SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM p) WHERE rank <= 10),
        |co AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_reduce(list_transform(range(1,17), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,17), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,17), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS ccos
        | FROM v q JOIN v c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id),
        |cand AS (SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY ccos DESC, neighbor_id) AS r
        |  FROM co) WHERE r <= 30),
        |fx AS (SELECT cand.query_id, cand.neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        | FROM cand JOIN v q ON q.vec_id = cand.query_id
        |           JOIN v c ON c.vec_id = cand.neighbor_id),
        |ap AS (SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM fx) WHERE rank <= 10)
        |SELECT ex.query_id, COUNT(*) AS n_exact,
        |  CAST(SUM(CASE WHEN ap.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_hit,
        |  CAST(CAST(SUM(CASE WHEN ap.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS DOUBLE) / COUNT(*) AS recall
        |FROM ex LEFT JOIN ap ON ex.query_id = ap.query_id
        |  AND ex.neighbor_id = ap.neighbor_id
        |GROUP BY ex.query_id""".stripMargin,
    // ADC tier reuses e5's codebook construction verbatim (sub/seeds/d0/
    // a0/m1/cb), then scores corpus codes against the per-query lookup
    // table on the shared 1e-9 grid before the exact re-rank.
    "s8_ann_pq_adc" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |sub AS (SELECT vec_id, s, x[(16*s+1):(16*s+16)] AS sx
        |  FROM v CROSS JOIN (SELECT UNNEST(range(0, 4)) AS s)),
        |seeds AS (SELECT s, sx AS cx,
        |    CAST(row_number() OVER (PARTITION BY s ORDER BY vec_id) AS INT)
        |      AS code
        |  FROM sub WHERE vec_id % 61 = 0 AND vec_id < 61 * 256),
        |d0 AS (SELECT u.vec_id, u.s, se.code, u.sx,
        |  list_reduce(list_transform(range(1, 17), i ->
        |    (u.sx[i] - se.cx[i]) * (u.sx[i] - se.cx[i])), (a, b) -> a + b)
        |    AS d2
        |  FROM sub u JOIN seeds se ON u.s = se.s),
        |a0 AS (SELECT vec_id, s, code, sx FROM (SELECT vec_id, s, code, sx,
        |    row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, code)
        |      AS rn FROM d0) WHERE rn = 1),
        |m1 AS (SELECT s, code, list(m ORDER BY i) AS mx FROM (
        |  SELECT a.s, a.code, d.i,
        |    CAST(SUM(CAST(round(a.sx[d.i] * 1.0e9) AS BIGINT)) AS DOUBLE)
        |      / (COUNT(*) * 1.0e9) AS m
        |  FROM a0 a CROSS JOIN (SELECT UNNEST(range(1, 17)) AS i) d
        |  GROUP BY a.s, a.code, d.i) GROUP BY s, code),
        |cb AS (SELECT se.s, se.code, COALESCE(m1.mx, se.cx) AS cx
        |  FROM seeds se LEFT JOIN m1 ON se.s = m1.s AND se.code = m1.code),
        |asg AS (SELECT vec_id, s, code FROM (SELECT u.vec_id, u.s, c.code,
        |    row_number() OVER (PARTITION BY u.vec_id, u.s ORDER BY
        |      list_reduce(list_transform(range(1, 17), i ->
        |        (u.sx[i] - c.cx[i]) * (u.sx[i] - c.cx[i])), (a, b) -> a + b),
        |      c.code) AS rn
        |  FROM sub u JOIN cb c ON u.s = c.s) WHERE rn = 1),
        |lut AS (SELECT q.vec_id AS query_id, c.s, c.code,
        |  CAST(round(list_reduce(list_transform(range(1, 17), i ->
        |    (q.sx[i] - c.cx[i]) * (q.sx[i] - c.cx[i])), (a, b) -> a + b)
        |    * 1.0e9) AS BIGINT) AS g2
        |  FROM sub q JOIN cb c ON q.s = c.s WHERE q.vec_id % 100 = 0),
        |adc AS (SELECT l.query_id, a.vec_id AS neighbor_id,
        |  CAST(CAST(SUM(g2) AS BIGINT) AS DOUBLE) / 1.0e9 AS adc_d2
        |  FROM asg a JOIN lut l ON a.s = l.s AND a.code = l.code
        |    AND a.vec_id <> l.query_id
        |  GROUP BY 1, 2),
        |cand AS (SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY adc_d2, neighbor_id) AS r
        |  FROM adc) WHERE r <= 30),
        |fx AS (SELECT cand.query_id, cand.neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        | FROM cand JOIN v q ON q.vec_id = cand.query_id
        |           JOIN v c ON c.vec_id = cand.neighbor_id)
        |SELECT query_id, neighbor_id, cos, rank FROM (
        |  SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM fx) WHERE rank <= 10""".stripMargin,
    "s1_knn_brute" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        | FROM v q JOIN v c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id)
        |SELECT query_id, neighbor_id, cos, rank FROM (
        |  SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM p) WHERE rank <= 10""".stripMargin,
    // s26: s1's query/top-k shape with the CORPUS side dequantized from
    // e2's int8 grid (queries stay raw float — asymmetric distance).
    "s26_sq8_serve" ->
      """WITH v0 AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |m AS (SELECT vec_id, x,
        |  list_max(list_transform(x, a -> abs(a))) AS maxabs FROM v0),
        |dq AS (SELECT vec_id,
        |  CASE WHEN maxabs = 0 THEN list_transform(x, a -> 0.0)
        |       ELSE list_transform(x, a ->
        |         floor(a * (127.0 / maxabs) + 0.5) * (maxabs / 127.0))
        |  END AS x
        | FROM m),
        |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        | FROM v0 q JOIN dq c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id)
        |SELECT query_id, neighbor_id, cos, rank FROM (
        |  SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM p) WHERE rank <= 10""".stripMargin,
    // s1 with the metadata predicate on the corpus side (pre-filter).
    "s11_filtered_knn" ->
      """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS x
        |  FROM embeddings),
        |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        | FROM v q JOIN v c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id
        |   AND c.label % 2 = 0)
        |SELECT query_id, neighbor_id, label, cos, rank FROM (
        |  SELECT query_id, neighbor_id, label, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM p) WHERE rank <= 10""".stripMargin,
    // Greedy MMR as a recursive CTE (e9's aggregates-in-recursion
    // precedent): one state row per query per rank, selected set carried
    // as a list; (1 - 0.7) is written as the same double expression the
    // engine computes.
    "s12_mmr_rerank" ->
      """WITH RECURSIVE v AS (SELECT vec_id, embedding::DOUBLE[] AS x,
        |  sqrt(list_reduce(list_transform(range(1,65), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (a,b) -> a + b)) AS nrm
        |  FROM embeddings),
        |sc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) / (q.nrm * c.nrm) AS rel
        |  FROM v q JOIN v c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id),
        |cand AS (SELECT query_id, neighbor_id, rel FROM (
        |  SELECT query_id, neighbor_id, rel,
        |    row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, neighbor_id) AS rn
        |  FROM sc) t WHERE rn <= 20),
        |cv AS (SELECT cand.query_id, cand.neighbor_id, cand.rel, v.x, v.nrm
        |  FROM cand JOIN v ON v.vec_id = cand.neighbor_id),
        |pp AS (SELECT a.query_id, a.neighbor_id AS ca, b.neighbor_id AS cb,
        |  list_reduce(list_transform(range(1,65), i -> a.x[i] * b.x[i]), (a2,b2) -> a2 + b2) / (a.nrm * b.nrm) AS sim
        |  FROM cv a JOIN cv b ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id),
        |sel(r, query_id, neighbor_id, mmr_score, sel_ids) AS (
        |  SELECT 1, query_id, neighbor_id, 0.7 * rel, [neighbor_id]
        |  FROM (SELECT query_id, neighbor_id, rel,
        |    row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, neighbor_id) AS rn
        |    FROM cand) t WHERE rn = 1
        |  UNION ALL
        |  SELECT r + 1, query_id, pick_id, score, list_append(sel_ids, pick_id) FROM (
        |    SELECT m.r, m.query_id, m.pick_id, m.sel_ids, m.score,
        |      row_number() OVER (PARTITION BY m.query_id ORDER BY m.score DESC, m.pick_id) AS rn
        |    FROM (
        |      SELECT s.r, s.query_id, c.neighbor_id AS pick_id, s.sel_ids,
        |        0.7 * c.rel - (CAST(1 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * MAX(p.sim) AS score
        |      FROM sel s
        |      JOIN cand c ON c.query_id = s.query_id
        |        AND NOT list_contains(s.sel_ids, c.neighbor_id)
        |      JOIN pp p ON p.query_id = s.query_id AND p.ca = c.neighbor_id
        |        AND list_contains(s.sel_ids, p.cb)
        |      WHERE s.r < 5
        |      GROUP BY s.r, s.query_id, c.neighbor_id, s.sel_ids, c.rel
        |    ) m
        |  ) picked WHERE rn = 1
        |)
        |SELECT query_id, neighbor_id, CAST(r AS INT) AS mmr_rank, mmr_score
        |FROM sel""".stripMargin,
    "s2_ann_lsh" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |dots AS (SELECT vec_id, i,
        |  list_reduce(list_transform(range(1,65), d ->
        |    x[d] * (CASE WHEN (CASE WHEN ascii(substr(md5(i || ':' || (d-1)), 1, 1)) <= 57
        |                       THEN ascii(substr(md5(i || ':' || (d-1)), 1, 1)) - 48
        |                       ELSE ascii(substr(md5(i || ':' || (d-1)), 1, 1)) - 87 END) % 2 = 1
        |            THEN 1.0 ELSE -1.0 END)), (a,b) -> a + b) AS dot
        |  FROM v, range(16) t(i)),
        |sig AS (SELECT vec_id,
        |  CAST(sum(CASE WHEN i < 8 AND dot > 0 THEN power(2, i) ELSE 0 END) AS INT) AS band0,
        |  CAST(sum(CASE WHEN i >= 8 AND dot > 0 THEN power(2, i - 8) ELSE 0 END) AS INT) AS band1
        |  FROM dots GROUP BY vec_id),
        |cand AS (SELECT q.vec_id AS query_id, s.vec_id AS neighbor_id
        |  FROM sig q JOIN sig s ON (q.band0 = s.band0 OR q.band1 = s.band1)
        |  WHERE q.vec_id % 100 = 0 AND s.vec_id <> q.vec_id GROUP BY 1, 2),
        |p AS (SELECT query_id, neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        |  FROM cand JOIN v q ON q.vec_id = query_id JOIN v c ON c.vec_id = neighbor_id)
        |SELECT query_id, neighbor_id, cos, rank FROM (
        |  SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM p) WHERE rank <= 5""".stripMargin,
    // Mirrors Similarity.kmeansCentroids exactly: seeds = vec_id%50 sample,
    // training set = vec_id%5 sample, KMeansIters=2 unrolled Lloyd steps
    // (a0/g0/m1/c1 then a1/g1/m2/c2), per-dim means as DECIMAL(38,12) sums
    // divided in double, empty cells keep the previous centroid.
    // s13 = s3's coarse-quantizer chain (verbatim, through `probes`) +
    // s8's PQ chain (CTEs renamed pd0/pa0/pm1/pasg/plut) with the ADC sum
    // restricted to probed-cell candidates (`ccand`), then the exact
    // re-rank — the IVFADC composition mirrored CTE for CTE.
    "s13_ivf_adc" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |dims AS (SELECT UNNEST(range(1,65)) AS i),
        |samp AS (SELECT vec_id, x FROM v WHERE vec_id % 5 = 0),
        |c0 AS (SELECT vec_id AS cent_id, x AS cx FROM v WHERE vec_id % 50 = 0),
        |a0 AS (SELECT s.vec_id, c.cent_id,
        |  list_reduce(list_transform(range(1,65), i -> s.x[i] * c.cx[i]), (p,q) -> p + q) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> s.x[i] * s.x[i]), (p,q) -> p + q)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.cx[i] * c.cx[i]), (p,q) -> p + q))) AS ccos
        |  FROM samp s, c0 c),
        |g0 AS (SELECT vec_id, cent_id FROM (
        |  SELECT vec_id, cent_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn
        |  FROM a0) WHERE rn <= 1),
        |m1 AS (SELECT cent_id, list(m ORDER BY i) AS mx FROM (
        |  SELECT g.cent_id, d.i,
        |    CAST(SUM(CAST(s.x[d.i] AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS m
        |  FROM samp s JOIN g0 g ON s.vec_id = g.vec_id CROSS JOIN dims d
        |  GROUP BY g.cent_id, d.i) GROUP BY cent_id),
        |c1 AS (SELECT c.cent_id, COALESCE(m.mx, c.cx) AS cx
        |  FROM c0 c LEFT JOIN m1 m ON c.cent_id = m.cent_id),
        |a1 AS (SELECT s.vec_id, c.cent_id,
        |  list_reduce(list_transform(range(1,65), i -> s.x[i] * c.cx[i]), (p,q) -> p + q) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> s.x[i] * s.x[i]), (p,q) -> p + q)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.cx[i] * c.cx[i]), (p,q) -> p + q))) AS ccos
        |  FROM samp s, c1 c),
        |g1 AS (SELECT vec_id, cent_id FROM (
        |  SELECT vec_id, cent_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn
        |  FROM a1) WHERE rn <= 1),
        |m2 AS (SELECT cent_id, list(m ORDER BY i) AS mx FROM (
        |  SELECT g.cent_id, d.i,
        |    CAST(SUM(CAST(s.x[d.i] AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS m
        |  FROM samp s JOIN g1 g ON s.vec_id = g.vec_id CROSS JOIN dims d
        |  GROUP BY g.cent_id, d.i) GROUP BY cent_id),
        |cent AS (SELECT c.cent_id, COALESCE(m.mx, c.cx) AS cx
        |  FROM c1 c LEFT JOIN m2 m ON c.cent_id = m.cent_id),
        |ac AS (SELECT a.vec_id, c.cent_id,
        |  list_reduce(list_transform(range(1,65), i -> a.x[i] * c.cx[i]), (p,q) -> p + q) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> a.x[i] * a.x[i]), (p,q) -> p + q)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.cx[i] * c.cx[i]), (p,q) -> p + q))) AS ccos
        |  FROM v a, cent c),
        |asg AS (SELECT vec_id, cent_id FROM (
        |  SELECT vec_id, cent_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn
        |  FROM ac) WHERE rn <= 1),
        |probes AS (SELECT vec_id AS query_id, cent_id FROM (
        |  SELECT vec_id, cent_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn
        |  FROM ac WHERE vec_id % 100 = 0) WHERE rn <= 2),
        |ccand AS (SELECT p.query_id, s.vec_id AS neighbor_id
        |  FROM probes p JOIN asg s ON p.cent_id = s.cent_id
        |  WHERE s.vec_id <> p.query_id GROUP BY 1, 2),
        |sub AS (SELECT vec_id, s, x[(16*s+1):(16*s+16)] AS sx
        |  FROM v CROSS JOIN (SELECT UNNEST(range(0, 4)) AS s)),
        |seeds AS (SELECT s, sx AS cx,
        |    CAST(row_number() OVER (PARTITION BY s ORDER BY vec_id) AS INT)
        |      AS code
        |  FROM sub WHERE vec_id % 61 = 0 AND vec_id < 61 * 256),
        |pd0 AS (SELECT u.vec_id, u.s, se.code, u.sx,
        |  list_reduce(list_transform(range(1, 17), i ->
        |    (u.sx[i] - se.cx[i]) * (u.sx[i] - se.cx[i])), (a, b) -> a + b)
        |    AS d2
        |  FROM sub u JOIN seeds se ON u.s = se.s),
        |pa0 AS (SELECT vec_id, s, code, sx FROM (SELECT vec_id, s, code, sx,
        |    row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, code)
        |      AS rn FROM pd0) WHERE rn = 1),
        |pm1 AS (SELECT s, code, list(m ORDER BY i) AS mx FROM (
        |  SELECT a.s, a.code, d.i,
        |    CAST(SUM(CAST(round(a.sx[d.i] * 1.0e9) AS BIGINT)) AS DOUBLE)
        |      / (COUNT(*) * 1.0e9) AS m
        |  FROM pa0 a CROSS JOIN (SELECT UNNEST(range(1, 17)) AS i) d
        |  GROUP BY a.s, a.code, d.i) GROUP BY s, code),
        |cb AS (SELECT se.s, se.code, COALESCE(pm1.mx, se.cx) AS cx
        |  FROM seeds se LEFT JOIN pm1 ON se.s = pm1.s AND se.code = pm1.code),
        |pasg AS (SELECT vec_id, s, code FROM (SELECT u.vec_id, u.s, c.code,
        |    row_number() OVER (PARTITION BY u.vec_id, u.s ORDER BY
        |      list_reduce(list_transform(range(1, 17), i ->
        |        (u.sx[i] - c.cx[i]) * (u.sx[i] - c.cx[i])), (a, b) -> a + b),
        |      c.code) AS rn
        |  FROM sub u JOIN cb c ON u.s = c.s) WHERE rn = 1),
        |plut AS (SELECT q.vec_id AS query_id, c.s, c.code,
        |  CAST(round(list_reduce(list_transform(range(1, 17), i ->
        |    (q.sx[i] - c.cx[i]) * (q.sx[i] - c.cx[i])), (a, b) -> a + b)
        |    * 1.0e9) AS BIGINT) AS g2
        |  FROM sub q JOIN cb c ON q.s = c.s WHERE q.vec_id % 100 = 0),
        |adc AS (SELECT cc.query_id, cc.neighbor_id,
        |  CAST(CAST(SUM(g2) AS BIGINT) AS DOUBLE) / 1.0e9 AS adc_d2
        |  FROM ccand cc JOIN pasg a ON a.vec_id = cc.neighbor_id
        |    JOIN plut l ON l.query_id = cc.query_id
        |      AND a.s = l.s AND a.code = l.code
        |  GROUP BY 1, 2),
        |cand AS (SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY adc_d2, neighbor_id) AS r
        |  FROM adc) WHERE r <= 30),
        |fx AS (SELECT cand.query_id, cand.neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        | FROM cand JOIN v q ON q.vec_id = cand.query_id
        |           JOIN v c ON c.vec_id = cand.neighbor_id)
        |SELECT query_id, neighbor_id, cos, rank FROM (
        |  SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM fx) WHERE rank <= 10""".stripMargin,
    "s3_ann_ivf" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |dims AS (SELECT UNNEST(range(1,65)) AS i),
        |samp AS (SELECT vec_id, x FROM v WHERE vec_id % 5 = 0),
        |c0 AS (SELECT vec_id AS cent_id, x AS cx FROM v WHERE vec_id % 50 = 0),
        |a0 AS (SELECT s.vec_id, c.cent_id,
        |  list_reduce(list_transform(range(1,65), i -> s.x[i] * c.cx[i]), (p,q) -> p + q) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> s.x[i] * s.x[i]), (p,q) -> p + q)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.cx[i] * c.cx[i]), (p,q) -> p + q))) AS ccos
        |  FROM samp s, c0 c),
        |g0 AS (SELECT vec_id, cent_id FROM (
        |  SELECT vec_id, cent_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn
        |  FROM a0) WHERE rn <= 1),
        |m1 AS (SELECT cent_id, list(m ORDER BY i) AS mx FROM (
        |  SELECT g.cent_id, d.i,
        |    CAST(SUM(CAST(s.x[d.i] AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS m
        |  FROM samp s JOIN g0 g ON s.vec_id = g.vec_id CROSS JOIN dims d
        |  GROUP BY g.cent_id, d.i) GROUP BY cent_id),
        |c1 AS (SELECT c.cent_id, COALESCE(m.mx, c.cx) AS cx
        |  FROM c0 c LEFT JOIN m1 m ON c.cent_id = m.cent_id),
        |a1 AS (SELECT s.vec_id, c.cent_id,
        |  list_reduce(list_transform(range(1,65), i -> s.x[i] * c.cx[i]), (p,q) -> p + q) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> s.x[i] * s.x[i]), (p,q) -> p + q)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.cx[i] * c.cx[i]), (p,q) -> p + q))) AS ccos
        |  FROM samp s, c1 c),
        |g1 AS (SELECT vec_id, cent_id FROM (
        |  SELECT vec_id, cent_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn
        |  FROM a1) WHERE rn <= 1),
        |m2 AS (SELECT cent_id, list(m ORDER BY i) AS mx FROM (
        |  SELECT g.cent_id, d.i,
        |    CAST(SUM(CAST(s.x[d.i] AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS m
        |  FROM samp s JOIN g1 g ON s.vec_id = g.vec_id CROSS JOIN dims d
        |  GROUP BY g.cent_id, d.i) GROUP BY cent_id),
        |cent AS (SELECT c.cent_id, COALESCE(m.mx, c.cx) AS cx
        |  FROM c1 c LEFT JOIN m2 m ON c.cent_id = m.cent_id),
        |ac AS (SELECT a.vec_id, c.cent_id,
        |  list_reduce(list_transform(range(1,65), i -> a.x[i] * c.cx[i]), (p,q) -> p + q) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> a.x[i] * a.x[i]), (p,q) -> p + q)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.cx[i] * c.cx[i]), (p,q) -> p + q))) AS ccos
        |  FROM v a, cent c),
        |asg AS (SELECT vec_id, cent_id FROM (
        |  SELECT vec_id, cent_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn
        |  FROM ac) WHERE rn <= 1),
        |probes AS (SELECT vec_id AS query_id, cent_id FROM (
        |  SELECT vec_id, cent_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn
        |  FROM ac WHERE vec_id % 100 = 0) WHERE rn <= 2),
        |cand AS (SELECT p.query_id, s.vec_id AS neighbor_id
        |  FROM probes p JOIN asg s ON p.cent_id = s.cent_id
        |  WHERE s.vec_id <> p.query_id GROUP BY 1, 2),
        |p AS (SELECT query_id, neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        |  FROM cand JOIN v q ON q.vec_id = query_id JOIN v c ON c.vec_id = neighbor_id)
        |SELECT query_id, neighbor_id, cos, rank FROM (
        |  SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM p) WHERE rank <= 5""".stripMargin,
  )
}
