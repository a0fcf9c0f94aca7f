package graft.oracles

/** DuckDB oracle SQL for the embedding query family — the
  * literal twins split out of SparkEntry (one object per family;
  * `SparkEntry.oracleSqlBase` unions them). Entry text is
  * byte-identical to the pre-split map: derived oracles anchor on
  * exact substrings of these strings. */
object EmbeddingOracles {
  val sql: Map[String, String] = Map(
    // e23: TwoNN intrinsic dimension (Facco et al.) over the standard
    // query sample — exact 2-NN Euclidean distances (the s18 left-fold
    // grid shape + sqrt), ln grid-rounded to 5 dp as DECIMAL(18,6) and
    // summed exactly, zero-r1 duplicates excluded and counted.
    "e23_intrinsic_dim" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  sqrt(list_reduce(list_transform(range(1,65),
        |    i -> (q.x[i] - c.x[i]) * (q.x[i] - c.x[i])), (a,b) -> a + b))
        |    AS dist
        | FROM v q JOIN v c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id),
        |nn AS (SELECT query_id, dist,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY dist, neighbor_id) AS rn
        |  FROM p),
        |tw AS (SELECT a.query_id, a.dist AS r1, b.dist AS r2
        |  FROM nn a JOIN nn b ON b.query_id = a.query_id
        |    AND a.rn = 1 AND b.rn = 2),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |  CAST(SUM(CASE WHEN r1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_used,
        |  SUM(CASE WHEN r1 > 0
        |    THEN CAST(round(ln(r2 / r1), 5) AS DECIMAL(18,6))
        |    ELSE CAST(0 AS DECIMAL(18,6)) END) AS slm
        | FROM tw GROUP BY (1=1))
        |SELECT n_queries, n_used, CAST(slm AS DOUBLE) AS sum_log_ratio,
        |  CASE WHEN slm > 0 THEN CAST(n_used AS DOUBLE) / CAST(slm AS DOUBLE)
        |    ELSE CAST(0 AS DOUBLE) END AS intrinsic_dim
        |FROM ag""".stripMargin,
    "e2_int8_quantize" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |m AS (SELECT vec_id, x,
        |  list_max(list_transform(x, a -> abs(a))) AS maxabs FROM v),
        |q AS (SELECT vec_id, x, maxabs,
        |  CASE WHEN maxabs = 0
        |       THEN list_transform(x, a -> 0.0)
        |       ELSE list_transform(x, a -> floor(a * (127.0 / maxabs) + 0.5))
        |  END AS qv
        | FROM m)
        |SELECT vec_id, maxabs / 127.0 AS scale,
        |  CAST(list_min(qv) AS BIGINT) AS q_min,
        |  CAST(list_max(qv) AS BIGINT) AS q_max,
        |  list_reduce(list_prepend(0.0, list_transform(range(1, 65), i ->
        |    (x[i] - qv[i] * (maxabs / 127.0)) * (x[i] - qv[i] * (maxabs / 127.0)))),
        |    (a, b) -> a + b) AS l2_err_sq,
        |  list_max(list_transform(range(1, 65), i ->
        |    abs(x[i] - qv[i] * (maxabs / 127.0)))) AS max_abs_err
        |FROM q""".stripMargin,
    // sums of squared grid values exceed int64 → decimal→double goes
    // through VARCHAR (same DuckDB int128-cast quirk as q33)
    "e3_zscore_normalize" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |dims AS (SELECT UNNEST(range(0, 64)) AS dim),
        |e AS (SELECT vec_id, CAST(dim AS INT) AS dim,
        |  x[dim + 1] AS v FROM v CROSS JOIN dims),
        |st AS (SELECT dim,
        |  CAST(CAST(SUM(CAST(round(v * 1.0e9) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS sg,
        |  CAST(CAST(SUM(CAST(round(v * 1.0e9) * round(v * 1.0e9) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS sg2,
        |  count(*) AS n
        | FROM e GROUP BY dim),
        |m AS (SELECT dim, sg / n / 1.0e9 AS mu, sg2 / (n * 1.0e18) AS ex2
        | FROM st),
        |s AS (SELECT dim, mu, ex2 - mu * mu AS vr FROM m)
        |SELECT vec_id, e.dim, (v - mu) / sqrt(vr + 1.0e-9) AS zscore
        |FROM e JOIN s ON e.dim = s.dim""".stripMargin,
    "e6_matryoshka" ->
      """WITH v AS (SELECT vec_id, label, (embedding::DOUBLE[])[1:16] AS t FROM embeddings),
        |n AS (SELECT vec_id, label, t,
        |  sqrt(list_reduce(list_transform(range(1,17), i -> t[i] * t[i]),
        |    (a,b) -> a + b)) AS nrm FROM v),
        |dims AS (SELECT UNNEST(range(0, 16)) AS dim)
        |SELECT vec_id, label, CAST(dim AS INT) AS dim,
        |  t[dim + 1] / nrm AS mval
        |FROM n CROSS JOIN dims""".stripMargin,
    "e7_binary_quantize" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings)
        |SELECT vec_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 32), i ->
        |    CASE WHEN x[i + 1] >= 0 THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END)),
        |    (a, w) -> a | w) AS w0,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 32), i ->
        |    CASE WHEN x[i + 33] >= 0 THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END)),
        |    (a, w) -> a | w) AS w1,
        |  CAST(len(list_filter(x, y -> y >= 0)) AS BIGINT) AS n_pos
        |FROM v""".stripMargin,
    // Grid sums stay within int64 (|x_i·x_j|·1e9 ≤ ~3.5e8 per row here);
    // e16: per-dimension mean/variance from 1e-9-grid integer sums (the
    // e8/g1 parity pattern); the divisions and the E[x²]−E[x]² subtraction
    // are plain IEEE after the exact sums.
    // e20: mean random-pair cosine in closed form — normalize each
    // vector (in-order fold + sqrt), grid-sum unit coordinates per dim,
    // grid-sum the squared per-dim sums, then (ΣS² − n)/(n(n−1)).
    "e20_anisotropy" ->
      """WITH v AS (SELECT embedding::DOUBLE[] AS x FROM embeddings),
        |nv AS (SELECT x, sqrt(list_reduce(list_transform(range(1, 65),
        |    i -> x[i] * x[i]), (a, b) -> a + b)) AS nrm FROM v),
        |f AS (SELECT * FROM nv WHERE nrm > 0),
        |d AS (SELECT UNNEST(range(1, 65)) AS i),
        |g AS (SELECT d.i - 1 AS dim, CAST(count(*) AS BIGINT) AS n,
        |    SUM(CAST(round(f.x[d.i] / f.nrm * 1.0e9) AS DECIMAL(38,0)))
        |      AS s
        |  FROM f CROSS JOIN d GROUP BY d.i),
        |t AS (SELECT CAST(max(n) AS BIGINT) AS n_vectors,
        |    SUM(CAST(round((CAST(s AS DOUBLE) / 1.0e9)
        |      * (CAST(s AS DOUBLE) / 1.0e9) * 1.0e9) AS DECIMAL(38,0)))
        |      AS ss
        |  FROM g GROUP BY (1=1))
        |SELECT n_vectors, CAST(ss AS DOUBLE) / 1.0e9 AS sum_sq,
        |  CASE WHEN n_vectors >= 2 THEN
        |    (CAST(ss AS DOUBLE) / 1.0e9 - CAST(n_vectors AS DOUBLE)) /
        |    (CAST(n_vectors AS DOUBLE) * CAST(n_vectors - 1 AS DOUBLE))
        |  ELSE CAST(0 AS DOUBLE) END AS anisotropy
        |FROM t""".stripMargin,
    "e16_dim_stats" ->
      """WITH v AS (SELECT embedding::DOUBLE[] AS x FROM embeddings),
        |d AS (SELECT UNNEST(range(1, 65)) AS i),
        |g AS (SELECT d.i - 1 AS dim,
        |    CAST(count(*) AS BIGINT) AS n,
        |    SUM(CAST(round(v.x[d.i] * 1.0e9) AS DECIMAL(38,0))) AS s,
        |    SUM(CAST(round(v.x[d.i] * v.x[d.i] * 1.0e9)
        |      AS DECIMAL(38,0))) AS s2
        |  FROM v CROSS JOIN d GROUP BY d.i)
        |SELECT dim, n,
        |  (CAST(s AS DOUBLE) / 1.0e9) / n AS mean,
        |  (CAST(s2 AS DOUBLE) / 1.0e9) / n
        |    - ((CAST(s AS DOUBLE) / 1.0e9) / n)
        |      * ((CAST(s AS DOUBLE) / 1.0e9) / n) AS variance
        |FROM g""".stripMargin,
    // DuckDB SUM(BIGINT) yields HUGEINT → CAST back to BIGINT before the
    // double divide (the q33 int128 quirk).
    "e8_gram_matrix" ->
      """WITH v AS (SELECT embedding::DOUBLE[] AS x FROM embeddings),
        |pr AS (SELECT UNNEST(range(0, 64)) AS d),
        |pairs AS (SELECT a.d AS i, b.d AS j
        |  FROM pr a CROSS JOIN pr b WHERE b.d >= a.d)
        |SELECT CAST(p.i AS INT) AS i, CAST(p.j AS INT) AS j,
        |  CAST(CAST(SUM(CAST(round(x[p.i + 1] * x[p.j + 1] * 1.0e9) AS BIGINT))
        |    AS BIGINT) AS DOUBLE) / 1.0e9 AS gram,
        |  COUNT(*) AS n
        |FROM v CROSS JOIN pairs p GROUP BY p.i, p.j""".stripMargin,
    // e8's Gram matrix mirrored symmetric, then 8 grid-stabilized power
    // iterations in a recursive CTE (GROUP BY matvec + windowed norm per
    // step); every sum is over 1e-9-grid integers so the loadings are
    // bit-identical to the driver-side loop.
    "e9_pc1_power" ->
      """WITH RECURSIVE ve AS (SELECT embedding::DOUBLE[] AS x FROM embeddings),
        |pr AS (SELECT UNNEST(range(0, 64)) AS d),
        |pairs AS (SELECT a.d AS i, b.d AS j
        |  FROM pr a CROSS JOIN pr b WHERE b.d >= a.d),
        |g0 AS (SELECT p.i, p.j,
        |  CAST(CAST(SUM(CAST(round(x[p.i + 1] * x[p.j + 1] * 1.0e9) AS BIGINT))
        |    AS BIGINT) AS DOUBLE) / 1.0e9 AS gram
        |  FROM ve CROSS JOIN pairs p GROUP BY p.i, p.j),
        |gm AS (SELECT i, j, gram FROM g0
        |  UNION ALL SELECT j AS i, i AS j, gram FROM g0 WHERE i <> j),
        |pw(it, d, vv, lam) AS (
        |  SELECT 0, d, CAST(1.0 AS DOUBLE) / 64, CAST(0 AS DOUBLE) FROM pr
        |  UNION ALL
        |  SELECT it + 1, d, w / nrm, nrm FROM (
        |    SELECT it, d, w,
        |      sqrt(CAST(CAST(SUM(CAST(round(w * w * 1.0e9) AS BIGINT))
        |        OVER (PARTITION BY it) AS BIGINT) AS DOUBLE) / 1.0e9) AS nrm
        |    FROM (
        |      SELECT pw.it, gm.i AS d,
        |        CAST(CAST(SUM(CAST(round(gm.gram * pw.vv * 1.0e9) AS BIGINT))
        |          AS BIGINT) AS DOUBLE) / 1.0e9 AS w
        |      FROM pw JOIN gm ON gm.j = pw.d WHERE pw.it < 8
        |      GROUP BY pw.it, gm.i) a) b
        |)
        |SELECT CAST(d AS INT) AS dim, vv AS loading, lam AS eigenvalue
        |FROM pw WHERE it = 8""".stripMargin,
    // e9's converged direction folded to a list, then the pure per-row
    // projection x' = x - (v.x) v, long-form like e3/e6.
    "e10_remove_pc1" ->
      """WITH RECURSIVE ve AS (SELECT embedding::DOUBLE[] AS x FROM embeddings),
        |pr AS (SELECT UNNEST(range(0, 64)) AS d),
        |pairs AS (SELECT a.d AS i, b.d AS j
        |  FROM pr a CROSS JOIN pr b WHERE b.d >= a.d),
        |g0 AS (SELECT p.i, p.j,
        |  CAST(CAST(SUM(CAST(round(x[p.i + 1] * x[p.j + 1] * 1.0e9) AS BIGINT))
        |    AS BIGINT) AS DOUBLE) / 1.0e9 AS gram
        |  FROM ve CROSS JOIN pairs p GROUP BY p.i, p.j),
        |gm AS (SELECT i, j, gram FROM g0
        |  UNION ALL SELECT j AS i, i AS j, gram FROM g0 WHERE i <> j),
        |pw(it, d, vv, lam) AS (
        |  SELECT 0, d, CAST(1.0 AS DOUBLE) / 64, CAST(0 AS DOUBLE) FROM pr
        |  UNION ALL
        |  SELECT it + 1, d, w / nrm, nrm FROM (
        |    SELECT it, d, w,
        |      sqrt(CAST(CAST(SUM(CAST(round(w * w * 1.0e9) AS BIGINT))
        |        OVER (PARTITION BY it) AS BIGINT) AS DOUBLE) / 1.0e9) AS nrm
        |    FROM (
        |      SELECT pw.it, gm.i AS d,
        |        CAST(CAST(SUM(CAST(round(gm.gram * pw.vv * 1.0e9) AS BIGINT))
        |          AS BIGINT) AS DOUBLE) / 1.0e9 AS w
        |      FROM pw JOIN gm ON gm.j = pw.d WHERE pw.it < 8
        |      GROUP BY pw.it, gm.i) a) b
        |),
        |pc AS (SELECT list(vv ORDER BY d) AS v FROM pw WHERE it = 8),
        |vx AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |pj AS (SELECT vec_id, x,
        |  list_reduce(list_transform(range(1, 65), i -> x[i] * pc.v[i]),
        |    (a, b) -> a + b) AS proj
        |  FROM vx CROSS JOIN pc)
        |SELECT vec_id, CAST(dd AS INT) AS dim,
        |  x[dd + 1] - proj * pc.v[dd + 1] AS wval
        |FROM pj CROSS JOIN pc
        |  CROSS JOIN (SELECT UNNEST(range(0, 64)) AS dd)""".stripMargin,
    "e5_pq_encode" ->
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
        |df AS (SELECT u.vec_id, u.s, c.code,
        |  list_reduce(list_transform(range(1, 17), i ->
        |    (u.sx[i] - c.cx[i]) * (u.sx[i] - c.cx[i])), (a, b) -> a + b)
        |    AS d2
        |  FROM sub u JOIN cb c ON u.s = c.s)
        |SELECT vec_id, CAST(s AS INT) AS subspace, code, d2 AS err2
        |FROM (SELECT vec_id, s, code, d2,
        |    row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, code)
        |      AS rn FROM df) WHERE rn = 1""".stripMargin,
    "e4_random_projection" ->
      """WITH sgn AS (SELECT j, i,
        |  CASE WHEN CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('rp:' || j || ':' || i), c, 1)) <= 57
        |         THEN ascii(substr(md5('rp:' || j || ':' || i), c, 1)) - 48
        |         ELSE ascii(substr(md5('rp:' || j || ':' || i), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS s
        |  FROM range(16) t1(j), range(64) t2(i)),
        |v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |e AS (SELECT vec_id, CAST(i AS INT) AS i,
        |  CAST(round(x[i + 1] * 1.0e9) AS BIGINT) AS g
        |  FROM v CROSS JOIN (SELECT UNNEST(range(0, 64)) AS i))
        |SELECT vec_id, CAST(j AS INT) AS out_dim,
        |  CAST(SUM(g * s) AS DOUBLE) / 1.0e9 AS proj
        |FROM e JOIN sgn ON e.i = sgn.i
        |GROUP BY vec_id, j""".stripMargin,
    // e26: JL distortion of e4's projection — same sign matrix, same
    // 1e-9 coordinate grid, squared-diff terms on the 1e-12 grid summed
    // as DECIMAL (the e15 idiom), consecutive-id pairs (e25 convention).
    "e26_projection_distortion" ->
      """WITH sgn AS (SELECT j, i,
        |  CASE WHEN CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('rp:' || j || ':' || i), c, 1)) <= 57
        |         THEN ascii(substr(md5('rp:' || j || ':' || i), c, 1)) - 48
        |         ELSE ascii(substr(md5('rp:' || j || ':' || i), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS s
        |  FROM range(16) t1(j), range(64) t2(i)),
        |v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |e AS (SELECT vec_id, CAST(i AS INT) AS i,
        |  CAST(round(x[i + 1] * 1.0e9) AS BIGINT) AS g
        |  FROM v CROSS JOIN (SELECT UNNEST(range(0, 64)) AS i)),
        |p AS (SELECT vec_id, CAST(j AS INT) AS j,
        |  CAST(SUM(g * s) AS DOUBLE) / 1.0e9 AS proj
        |  FROM e JOIN sgn ON e.i = sgn.i GROUP BY vec_id, j),
        |xo AS (SELECT vec_id, i, CAST(g AS DOUBLE) / 1.0e9 AS xv FROM e),
        |do2 AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  CAST(SUM(CAST(round((a.xv - b.xv) * (a.xv - b.xv) * 1.0e12)
        |    AS DECIMAL(38,0))) AS DOUBLE) / 1.0e12 AS d2_orig
        |  FROM xo a JOIN xo b
        |    ON b.vec_id = a.vec_id + 1 AND a.i = b.i
        |  WHERE a.vec_id % 2 = 0 GROUP BY 1, 2),
        |dp2 AS (SELECT a.vec_id AS vec_a,
        |  CAST(SUM(CAST(round((a.proj - b.proj) * (a.proj - b.proj) * 1.0e12)
        |    AS DECIMAL(38,0))) AS DOUBLE) / 1.0e12 AS d2_proj
        |  FROM p a JOIN p b
        |    ON b.vec_id = a.vec_id + 1 AND a.j = b.j
        |  WHERE a.vec_id % 2 = 0 GROUP BY 1)
        |SELECT do2.vec_a, do2.vec_b, d2_orig, d2_proj,
        |  CASE WHEN d2_orig > 0
        |    THEN d2_proj / (CAST(16.0 AS DOUBLE) * d2_orig) END
        |    AS distortion
        |FROM do2 JOIN dp2 ON do2.vec_a = dp2.vec_a""".stripMargin,
    "e15_centroid_drift" ->
      """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS x
        |  FROM embeddings),
        |dims AS (SELECT UNNEST(range(0, 64)) AS dim),
        |ca AS (SELECT label, CAST(dim AS INT) AS dim,
        |    CAST(SUM(CAST(round(x[dim + 1] * 1.0e9) AS BIGINT)) AS DOUBLE)
        |      / (COUNT(*) * 1.0e9) AS ca,
        |    COUNT(*) AS n_accepted
        |  FROM v CROSS JOIN dims WHERE vec_id % 2 = 0
        |  GROUP BY label, dim),
        |cb AS (SELECT label, CAST(dim AS INT) AS dim,
        |    CAST(SUM(CAST(round(x[dim + 1] * 1.0e9) AS BIGINT)) AS DOUBLE)
        |      / (COUNT(*) * 1.0e9) AS cb,
        |    COUNT(*) AS n_incoming
        |  FROM v CROSS JOIN dims WHERE vec_id % 2 <> 0
        |  GROUP BY label, dim),
        |j AS (SELECT ca.label, ca.n_accepted, cb.n_incoming,
        |    CAST(SUM(CAST(round(ca.ca * cb.cb * 1.0e12) AS DECIMAL(38,0)))
        |      AS DOUBLE) / 1.0e12 AS dot,
        |    CAST(SUM(CAST(round(ca.ca * ca.ca * 1.0e12) AS DECIMAL(38,0)))
        |      AS DOUBLE) / 1.0e12 AS na2,
        |    CAST(SUM(CAST(round(cb.cb * cb.cb * 1.0e12) AS DECIMAL(38,0)))
        |      AS DOUBLE) / 1.0e12 AS nb2
        |  FROM ca JOIN cb ON ca.label = cb.label AND ca.dim = cb.dim
        |  GROUP BY 1, 2, 3)
        |SELECT label, n_accepted, n_incoming,
        |  dot / (sqrt(na2) * sqrt(nb2)) AS cos_drift,
        |  (dot / (sqrt(na2) * sqrt(nb2))) < 0.95 AS drifted
        |FROM j""".stripMargin,
    "e1_label_centroids" ->
      """WITH v AS (SELECT label, embedding::DOUBLE[] AS x FROM embeddings),
        |dims AS (SELECT UNNEST(range(0, 64)) AS dim)
        |SELECT label, CAST(dim AS INT) AS dim,
        |  CAST(SUM(CAST(round(x[dim + 1] * 1.0e9) AS BIGINT)) AS DOUBLE)
        |    / (COUNT(*) * 1.0e9) AS centroid,
        |  COUNT(*) AS n_vecs
        |FROM v CROSS JOIN dims
        |GROUP BY label, dim""".stripMargin,
    // e9's recursion twice with Hotelling deflation on the 1e-9 grid
    // between (G' = G - lam*v*vT, every cell re-quantized).
    "e13_top2_power" ->
      """WITH RECURSIVE ve AS (SELECT embedding::DOUBLE[] AS x FROM embeddings),
        |pr AS (SELECT UNNEST(range(0, 64)) AS d),
        |pairs AS (SELECT a.d AS i, b.d AS j
        |  FROM pr a CROSS JOIN pr b WHERE b.d >= a.d),
        |g0 AS (SELECT p.i, p.j,
        |  CAST(CAST(SUM(CAST(round(x[p.i + 1] * x[p.j + 1] * 1.0e9) AS BIGINT))
        |    AS BIGINT) AS DOUBLE) / 1.0e9 AS gram
        |  FROM ve CROSS JOIN pairs p GROUP BY p.i, p.j),
        |gm AS (SELECT i, j, gram FROM g0
        |  UNION ALL SELECT j AS i, i AS j, gram FROM g0 WHERE i <> j),
        |pw(it, d, vv, lam) AS (
        |  SELECT 0, d, CAST(1.0 AS DOUBLE) / 64, CAST(0 AS DOUBLE) FROM pr
        |  UNION ALL
        |  SELECT it + 1, d, w / nrm, nrm FROM (
        |    SELECT it, d, w,
        |      sqrt(CAST(CAST(SUM(CAST(round(w * w * 1.0e9) AS BIGINT))
        |        OVER (PARTITION BY it) AS BIGINT) AS DOUBLE) / 1.0e9) AS nrm
        |    FROM (
        |      SELECT pw.it, gm.i AS d,
        |        CAST(CAST(SUM(CAST(round(gm.gram * pw.vv * 1.0e9) AS BIGINT))
        |          AS BIGINT) AS DOUBLE) / 1.0e9 AS w
        |      FROM pw JOIN gm ON gm.j = pw.d WHERE pw.it < 24
        |      GROUP BY pw.it, gm.i) a) b
        |),
        |v1 AS (SELECT d, vv FROM pw WHERE it = 24),
        |l1 AS (SELECT lam FROM pw WHERE it = 24 LIMIT 1),
        |g2 AS (SELECT gm.i, gm.j,
        |  CAST(CAST(round(gm.gram * 1.0e9) AS BIGINT)
        |     - CAST(round(l1.lam * vi.vv * vj.vv * 1.0e9) AS BIGINT) AS DOUBLE)
        |    / 1.0e9 AS gram
        |  FROM gm JOIN v1 vi ON vi.d = gm.i JOIN v1 vj ON vj.d = gm.j
        |  CROSS JOIN l1),
        |pw2(it, d, vv, lam) AS (
        |  SELECT 0, d, CAST(1.0 AS DOUBLE) / 64, CAST(0 AS DOUBLE) FROM pr
        |  UNION ALL
        |  SELECT it + 1, d, w / nrm, nrm FROM (
        |    SELECT it, d, w,
        |      sqrt(CAST(CAST(SUM(CAST(round(w * w * 1.0e9) AS BIGINT))
        |        OVER (PARTITION BY it) AS BIGINT) AS DOUBLE) / 1.0e9) AS nrm
        |    FROM (
        |      SELECT pw2.it, g2.i AS d,
        |        CAST(CAST(SUM(CAST(round(g2.gram * pw2.vv * 1.0e9) AS BIGINT))
        |          AS BIGINT) AS DOUBLE) / 1.0e9 AS w
        |      FROM pw2 JOIN g2 ON g2.j = pw2.d WHERE pw2.it < 24
        |      GROUP BY pw2.it, g2.i) a) b
        |)
        |SELECT 1 AS component, CAST(d AS INT) AS dim, vv AS loading,
        |  lam AS eigenvalue FROM pw WHERE it = 24
        |UNION ALL
        |SELECT 2, CAST(d AS INT), vv, lam FROM pw2 WHERE it = 24""".stripMargin,
    // One Lloyd step: s1's cosine scoring for the argmax assignment,
    // e1's grid-exact mean recipe for the update.
    "e11_kmeans_step" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x,
        |  sqrt(list_reduce(list_transform(range(1,65), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (a,b) -> a + b)) AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cent_id, x AS cx, nrm AS cnrm FROM v
        |  WHERE vec_id % 199 = 0),
        |sc AS (SELECT v.vec_id, c.cent_id,
        |  list_reduce(list_transform(range(1,65), i -> v.x[i] * c.cx[i]), (a,b) -> a + b)
        |    / (v.nrm * c.cnrm) AS ccos
        |  FROM v CROSS JOIN c),
        |asg AS (SELECT vec_id, cent_id FROM (
        |  SELECT vec_id, cent_id, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn FROM sc)
        |  WHERE rn = 1),
        |dims AS (SELECT UNNEST(range(0, 64)) AS dim)
        |SELECT cent_id, CAST(dim AS INT) AS dim,
        |  CAST(SUM(CAST(round(x[dim + 1] * 1.0e9) AS BIGINT)) AS DOUBLE)
        |    / (COUNT(*) * 1.0e9) AS centroid,
        |  COUNT(*) AS n_vecs
        |FROM v JOIN asg ON v.vec_id = asg.vec_id CROSS JOIN dims
        |GROUP BY cent_id, dim""".stripMargin,
    // e1's grid-exact centroids re-assembled into arrays, s1's cosine
    // shape against them, bottom-k ascending per label.
    "e12_centroid_outliers" ->
      """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS x,
        |  sqrt(list_reduce(list_transform(range(1,65), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (a,b) -> a + b)) AS nrm
        |  FROM embeddings),
        |dims AS (SELECT UNNEST(range(0, 64)) AS dim),
        |cd AS (SELECT label, dim,
        |    CAST(SUM(CAST(round(x[dim + 1] * 1.0e9) AS BIGINT)) AS DOUBLE)
        |      / (COUNT(*) * 1.0e9) AS centroid
        |  FROM v CROSS JOIN dims GROUP BY label, dim),
        |c AS (SELECT label, list(centroid ORDER BY dim) AS cx FROM cd
        |  GROUP BY label),
        |cn AS (SELECT label, cx,
        |    sqrt(list_reduce(list_transform(range(1,65), i -> cx[i] * cx[i]), (a,b) -> a + b)) AS cnrm
        |  FROM c),
        |sc AS (SELECT v.label, v.vec_id,
        |    list_reduce(list_transform(range(1,65), i -> v.x[i] * cn.cx[i]), (a,b) -> a + b)
        |      / (v.nrm * cn.cnrm) AS cos_centroid
        |  FROM v JOIN cn ON v.label = cn.label)
        |SELECT label, vec_id, cos_centroid, outlier_rank FROM (
        |  SELECT label, vec_id, cos_centroid, row_number() OVER (
        |    PARTITION BY label ORDER BY cos_centroid ASC, vec_id)
        |    AS outlier_rank
        |  FROM sc) t WHERE outlier_rank <= 5""".stripMargin,
    // e12's cosine-to-centroid machinery scored against ALL centroids:
    // cohesion (own), separation (best other), grid-exact per-label means.
    "e14_cluster_quality" ->
      """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS x,
        |  sqrt(list_reduce(list_transform(range(1,65), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (a,b) -> a + b)) AS nrm
        |  FROM embeddings),
        |dims AS (SELECT UNNEST(range(0, 64)) AS dim),
        |cd AS (SELECT label, dim,
        |    CAST(SUM(CAST(round(x[dim + 1] * 1.0e9) AS BIGINT)) AS DOUBLE)
        |      / (COUNT(*) * 1.0e9) AS centroid
        |  FROM v CROSS JOIN dims GROUP BY label, dim),
        |c AS (SELECT label AS clabel, list(centroid ORDER BY dim) AS cx
        |  FROM cd GROUP BY label),
        |cn AS (SELECT clabel, cx,
        |    sqrt(list_reduce(list_transform(range(1,65), i -> cx[i] * cx[i]), (a,b) -> a + b)) AS cnrm
        |  FROM c),
        |sc AS (SELECT v.vec_id, v.label, cn.clabel,
        |    list_reduce(list_transform(range(1,65), i -> v.x[i] * cn.cx[i]), (a,b) -> a + b)
        |      / (v.nrm * cn.cnrm) AS ccos
        |  FROM v CROSS JOIN cn),
        |pv AS (SELECT vec_id, label,
        |    MAX(CASE WHEN label = clabel THEN ccos END) AS cos_own,
        |    MAX(CASE WHEN label <> clabel THEN ccos END) AS cos_other
        |  FROM sc GROUP BY vec_id, label),
        |agg AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |    CAST(SUM(CAST(round(cos_own * 1.0e9) AS BIGINT)) AS DOUBLE)
        |      / (COUNT(*) * 1.0e9) AS mean_cos_own,
        |    CAST(SUM(CAST(round(cos_other * 1.0e9) AS BIGINT)) AS DOUBLE)
        |      / (COUNT(*) * 1.0e9) AS mean_cos_other
        |  FROM pv GROUP BY label)
        |SELECT label, n_vecs, mean_cos_own, mean_cos_other,
        |  mean_cos_own - mean_cos_other AS margin
        |FROM agg""".stripMargin,
    // e24: per-label norm-band histogram. The norm is the index-order
    // Σx² fold + sqrt (IEEE), grid-rounded to 5 dp as DECIMAL(18,6)
    // BEFORE banding so the ×2 and floor happen in exact decimal
    // arithmetic — boundary norms bucket identically on both engines.
    "e24_norm_bands" ->
      """WITH v AS (SELECT label,
        |  CAST(round(sqrt(list_reduce(list_transform(range(1,65),
        |    i -> x[i] * x[i]), (a,b) -> a + b)), 5) AS DECIMAL(18,6))
        |    AS nrm_g
        |  FROM (SELECT label, embedding::DOUBLE[] AS x FROM embeddings))
        |SELECT label, CAST(FLOOR(nrm_g * 2) AS BIGINT) AS band,
        |  CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(MIN(nrm_g) AS DOUBLE) AS min_nrm,
        |  CAST(MAX(nrm_g) AS DOUBLE) AS max_nrm
        |FROM v GROUP BY 1, 2""".stripMargin,
    // e25: consecutive-id pairs per label (lead window), s1's cosine
    // shape, 1e-9-grid alignment sum, 5-decimal-snapped exp/ln for
    // uniformity (x21 precedent).
    "e25_align_uniformity" ->
      """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS x FROM embeddings),
        |p AS (SELECT label, x,
        |    lead(x) OVER (PARTITION BY label ORDER BY vec_id) AS y FROM v),
        |c AS (SELECT label,
        |  list_reduce(list_transform(range(1,65), i -> x[i] * y[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> x[i] * x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> y[i] * y[i]), (a,b) -> a + b))) AS cos
        |  FROM p WHERE y IS NOT NULL),
        |g AS (SELECT label,
        |    CAST(round(cos * 1.0e9) AS DECIMAL(38,0)) AS gg,
        |    CAST(round(exp(CAST(4.0 AS DOUBLE) * cos - CAST(4.0 AS DOUBLE)), 5)
        |      AS DECIMAL(18,6)) AS u
        |  FROM c)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(gg) AS DOUBLE) / 1.0e9 / count(*) AS alignment,
        |  CAST(CAST(round(ln(CAST(SUM(u) AS DOUBLE) / count(*)), 5)
        |    AS DECIMAL(18,6)) AS DOUBLE) AS uniformity
        |FROM g GROUP BY label""".stripMargin,
  )
}
