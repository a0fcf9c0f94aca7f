package graft.oracles

/** DuckDB oracle SQL for the dedup query family — the
  * literal twins split out of SparkEntry (one object per family;
  * `SparkEntry.oracleSqlBase` unions them). Entry text is
  * byte-identical to the pre-split map: derived oracles anchor on
  * exact substrings of these strings. */
object DedupOracles {
  val sql: Map[String, String] = Map(
    "d14_url_dedup" ->
      """WITH p AS (SELECT doc_id, length(text) AS n_chars,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'http://' END)
        |  || source || '.Example.COM'
        |  || (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END)
        |  || '/p/' || (doc_id % 7)
        |  || '?utm_source=feed&id=' || (doc_id % 13)
        |  || (CASE WHEN doc_id % 3 = 0 THEN '&utm_campaign=x' ELSE '' END)
        |  || '#sec' AS url
        | FROM documents),
        |n AS (SELECT doc_id, n_chars,
        |  lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) || '://'
        |  || regexp_replace(lower(regexp_replace(
        |       regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1),
        |       ':[0-9]+$', '')), '^www\.', '')
        |  || regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1)
        |  || (CASE WHEN array_to_string(list_filter(
        |        string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
        |        q -> NOT starts_with(q, 'utm_')), '&') = '' THEN ''
        |      ELSE '?' || array_to_string(list_filter(
        |        string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
        |        q -> NOT starts_with(q, 'utm_')), '&') END) AS norm_url
        | FROM p),
        |w AS (SELECT norm_url, doc_id, n_chars,
        |  row_number() OVER (PARTITION BY norm_url
        |    ORDER BY n_chars DESC, doc_id) AS rn,
        |  count(*) OVER (PARTITION BY norm_url) AS n_dupes
        | FROM n)
        |SELECT norm_url, doc_id AS keep_doc_id, CAST(n_chars AS BIGINT)
        |  AS n_chars, n_dupes
        |FROM w WHERE rn = 1""".stripMargin,
    "d1_exact_dedup" ->
      """SELECT md5(text) AS content_md5, min(doc_id) AS keep_doc_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "d2_minhash_lsh" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |tok AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        |hx AS (SELECT doc_id, md5('m:' || shingle) AS h FROM tok),
        |base AS (SELECT doc_id, CAST(list_reduce(
        |    list_transform(range(1, 8), c ->
        |      CASE WHEN ascii(substr(h, c, 1)) <= 57
        |           THEN ascii(substr(h, c, 1)) - 48
        |           ELSE ascii(substr(h, c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) AS b FROM hx),
        |mh AS (SELECT doc_id, k,
        |  min(([1299721, 2750161, 4256233, 5800079, 7368787, 8960453, 10570841,
        |        12195257, 13834103, 15485863, 17624813, 19654991][k + 1] * b +
        |       [15487469, 32452843, 49979687, 67867967, 86028121, 104395301,
        |        122949823, 141650939, 160481183, 179424673, 198491317,
        |        217645177][k + 1]) % 1000000007) AS mh
        |  FROM base, range(12) t(k) GROUP BY doc_id, k),
        |band AS (SELECT doc_id, k // 3 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY k) AS bkey
        |  FROM mh GROUP BY doc_id, k // 3),
        |bandk AS (SELECT b0.* FROM band b0
        |  QUALIFY count(*) OVER (PARTITION BY b0.band, b0.bkey) <= 500),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bandk a JOIN bandk b
        |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jac AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
        |  FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b)
        |SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.7""".stripMargin,
    "d3_simhash" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |tok AS (SELECT doc_id, unnest(w) AS word FROM ws),
        |h AS (SELECT doc_id, md5('w:' || word) AS hx FROM tok),
        |bits AS (SELECT doc_id, b,
        |  CASE WHEN ((CASE WHEN ascii(substr(hx, b // 4 + 1, 1)) <= 57
        |              THEN ascii(substr(hx, b // 4 + 1, 1)) - 48
        |              ELSE ascii(substr(hx, b // 4 + 1, 1)) - 87 END)
        |             >> (b % 4)) & 1 = 1 THEN 1 ELSE -1 END AS v
        |  FROM h, range(60) t(b)),
        |agg AS (SELECT doc_id, b, sum(v) AS sb FROM bits GROUP BY doc_id, b)
        |SELECT doc_id,
        |  CAST(sum(CASE WHEN sb > 0 THEN power(2, b)::BIGINT ELSE 0 END) AS BIGINT) AS simhash
        |FROM agg GROUP BY doc_id""".stripMargin,
    "d9_simhash_pairs" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |tok AS (SELECT doc_id, unnest(w) AS word FROM ws),
        |h AS (SELECT doc_id, md5('w:' || word) AS hx FROM tok),
        |bits AS (SELECT doc_id, b,
        |  CASE WHEN ((CASE WHEN ascii(substr(hx, b // 4 + 1, 1)) <= 57
        |              THEN ascii(substr(hx, b // 4 + 1, 1)) - 48
        |              ELSE ascii(substr(hx, b // 4 + 1, 1)) - 87 END)
        |             >> (b % 4)) & 1 = 1 THEN 1 ELSE -1 END AS v
        |  FROM h, range(60) t(b)),
        |agg AS (SELECT doc_id, b, sum(v) AS sb FROM bits GROUP BY doc_id, b),
        |s AS (SELECT doc_id,
        |  CAST(sum(CASE WHEN sb > 0 THEN power(2, b)::BIGINT ELSE 0 END) AS BIGINT) AS simhash
        |  FROM agg GROUP BY doc_id),
        |bnd AS (SELECT doc_id, simhash, j,
        |  (simhash >> (15 * j)) & 32767 AS bv FROM s, range(4) t(j)),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.simhash AS sa, b.simhash AS sb
        |  FROM bnd a JOIN bnd b
        |    ON a.j = b.j AND a.bv = b.bv AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b,
        |  CAST(bit_count(xor(sa, sb)::BIT) AS INT) AS hamming
        |FROM cand WHERE bit_count(xor(sa, sb)::BIT) <= 3""".stripMargin,
    "d4_ngram_jaccard" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |skx AS (SELECT doc_id, unnest(s) AS x FROM sh),
        |skh AS (SELECT doc_id, list_reduce(list_transform(range(1, 16), c ->
        |    CAST(CASE WHEN ascii(substr(md5('f:' || x), c, 1)) <= 57
        |         THEN ascii(substr(md5('f:' || x), c, 1)) - 48
        |         ELSE ascii(substr(md5('f:' || x), c, 1)) - 87 END
        |      AS BIGINT)),
        |    (a, v) -> a * 16 + v) AS h FROM skx),
        |sk AS (SELECT doc_id, unnest((list_sort(list(h)))[1:4]) AS h
        |  FROM skh GROUP BY doc_id),
        |skk AS (SELECT s0.* FROM sk s0
        |  QUALIFY count(*) OVER (PARTITION BY s0.h) <= 500),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM skk a JOIN skk b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |g AS (SELECT doc_id,
        |  list_distinct(list_transform(range(1, length(text) - 1), i -> substr(text, i, 3))) AS g3
        |  FROM documents WHERE length(text) >= 3),
        |jac AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.g3, y.g3)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.g3, y.g3))) AS jaccard3
        |  FROM cand JOIN g x ON x.doc_id = doc_a JOIN g y ON y.doc_id = doc_b)
        |SELECT doc_a, doc_b, jaccard3 FROM jac WHERE jaccard3 >= 0.6""".stripMargin,
    // d4's sketch blocking, but scored asymmetrically on the word-shingle
    // sets themselves: containment(A->B) = |A∩B| / |A|.
    "d15_containment" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |skx AS (SELECT doc_id, unnest(s) AS x FROM sh),
        |skh AS (SELECT doc_id, list_reduce(list_transform(range(1, 16), c ->
        |    CAST(CASE WHEN ascii(substr(md5('f:' || x), c, 1)) <= 57
        |         THEN ascii(substr(md5('f:' || x), c, 1)) - 48
        |         ELSE ascii(substr(md5('f:' || x), c, 1)) - 87 END
        |      AS BIGINT)),
        |    (a, v) -> a * 16 + v) AS h FROM skx),
        |sk AS (SELECT doc_id, unnest((list_sort(list(h)))[1:4]) AS h
        |  FROM skh GROUP BY doc_id),
        |skk AS (SELECT s0.* FROM sk s0
        |  QUALIFY count(*) OVER (PARTITION BY s0.h) <= 500),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM skk a JOIN skk b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |ct AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) / len(x.s) AS cont_a_in_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) / len(y.s) AS cont_b_in_a
        |  FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b)
        |SELECT doc_a, doc_b, cont_a_in_b, cont_b_in_a FROM ct
        |WHERE greatest(cont_a_in_b, cont_b_in_a) >= 0.8""".stripMargin,
    "d5_embed_dedup" ->
      """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS x FROM embeddings),
        |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  list_reduce(list_transform(range(1,65), i -> a.x[i] * b.x[i]), (p,q) -> p + q) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> a.x[i] * a.x[i]), (p,q) -> p + q)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> b.x[i] * b.x[i]), (p,q) -> p + q))) AS cos
        | FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT vec_a, vec_b, cos FROM p WHERE cos >= 0.4""".stripMargin,
    "d6_source_sketch" ->
      """WITH ws AS (SELECT doc_id, source, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id, source,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |hx0 AS (SELECT source, unnest(s) AS x FROM sh),
        |h AS (SELECT DISTINCT source,
        |  list_reduce(list_transform(range(1, 16), c ->
        |    CAST(CASE WHEN ascii(substr(md5('f:' || x), c, 1)) <= 57
        |         THEN ascii(substr(md5('f:' || x), c, 1)) - 48
        |         ELSE ascii(substr(md5('f:' || x), c, 1)) - 87 END
        |      AS BIGINT)),
        |    (a, v) -> a * 16 + v) AS h FROM hx0),
        |r AS (SELECT source, h,
        |  row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM h)
        |SELECT source,
        |  string_agg(CAST(h AS VARCHAR), '|' ORDER BY h) AS sketch
        |FROM r WHERE rn <= 4 GROUP BY source""".stripMargin,
    "d11_source_overlap" ->
      """WITH ws AS (SELECT doc_id, source, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id, source,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |hx0 AS (SELECT source, unnest(s) AS x FROM sh),
        |h AS (SELECT DISTINCT source,
        |  list_reduce(list_transform(range(1, 16), c ->
        |    CAST(CASE WHEN ascii(substr(md5('f:' || x), c, 1)) <= 57
        |         THEN ascii(substr(md5('f:' || x), c, 1)) - 48
        |         ELSE ascii(substr(md5('f:' || x), c, 1)) - 87 END
        |      AS BIGINT)),
        |    (a, v) -> a * 16 + v) AS h FROM hx0),
        |r AS (SELECT source, h,
        |  row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM h),
        |kk AS (SELECT source, h FROM r WHERE rn <= 16),
        |p AS (SELECT a.source AS source_a, b.source AS source_b,
        |  count(*) AS n_common
        |  FROM kk a JOIN kk b ON a.h = b.h AND a.source < b.source
        |  GROUP BY 1, 2),
        |sz AS (SELECT source, count(*) AS n FROM kk GROUP BY 1)
        |SELECT source_a, source_b, n_common,
        |  CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard_est
        |FROM p JOIN sz sa ON sa.source = source_a
        |JOIN sz sb ON sb.source = source_b""".stripMargin,
    "d7_neardup_components" ->
      """WITH RECURSIVE ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |tok AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        |hx AS (SELECT doc_id, md5('m:' || shingle) AS h FROM tok),
        |base AS (SELECT doc_id, CAST(list_reduce(
        |    list_transform(range(1, 8), c ->
        |      CASE WHEN ascii(substr(h, c, 1)) <= 57
        |           THEN ascii(substr(h, c, 1)) - 48
        |           ELSE ascii(substr(h, c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) AS b FROM hx),
        |mh AS (SELECT doc_id, k,
        |  min(([1299721, 2750161, 4256233, 5800079, 7368787, 8960453, 10570841,
        |        12195257, 13834103, 15485863, 17624813, 19654991][k + 1] * b +
        |       [15487469, 32452843, 49979687, 67867967, 86028121, 104395301,
        |        122949823, 141650939, 160481183, 179424673, 198491317,
        |        217645177][k + 1]) % 1000000007) AS mh
        |  FROM base, range(12) t(k) GROUP BY doc_id, k),
        |band AS (SELECT doc_id, k // 3 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY k) AS bkey
        |  FROM mh GROUP BY doc_id, k // 3),
        |bandk AS (SELECT b0.* FROM band b0
        |  QUALIFY count(*) OVER (PARTITION BY b0.band, b0.bkey) <= 500),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bandk a JOIN bandk b
        |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jac AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
        |  FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b),
        |p AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.7),
        |ed AS (SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION SELECT doc_b, doc_a FROM p),
        |reach(doc, lab) AS (
        |  SELECT a, a FROM ed
        |  UNION
        |  SELECT ed.a, reach.lab FROM ed JOIN reach ON ed.b = reach.doc)
        |SELECT doc AS doc_id, min(lab) AS cluster_rep,
        |  doc = min(lab) AS keep
        |FROM reach GROUP BY doc""".stripMargin,
    // d7's clusters with the keep-longest winner rule (n_chars desc, id).
    "d22_keep_longest" ->
      """WITH RECURSIVE ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |tok AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        |hx AS (SELECT doc_id, md5('m:' || shingle) AS h FROM tok),
        |base AS (SELECT doc_id, CAST(list_reduce(
        |    list_transform(range(1, 8), c ->
        |      CASE WHEN ascii(substr(h, c, 1)) <= 57
        |           THEN ascii(substr(h, c, 1)) - 48
        |           ELSE ascii(substr(h, c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) AS b FROM hx),
        |mh AS (SELECT doc_id, k,
        |  min(([1299721, 2750161, 4256233, 5800079, 7368787, 8960453, 10570841,
        |        12195257, 13834103, 15485863, 17624813, 19654991][k + 1] * b +
        |       [15487469, 32452843, 49979687, 67867967, 86028121, 104395301,
        |        122949823, 141650939, 160481183, 179424673, 198491317,
        |        217645177][k + 1]) % 1000000007) AS mh
        |  FROM base, range(12) t(k) GROUP BY doc_id, k),
        |band AS (SELECT doc_id, k // 3 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY k) AS bkey
        |  FROM mh GROUP BY doc_id, k // 3),
        |bandk AS (SELECT b0.* FROM band b0
        |  QUALIFY count(*) OVER (PARTITION BY b0.band, b0.bkey) <= 500),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bandk a JOIN bandk b
        |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jac AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
        |  FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b),
        |p AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.7),
        |ed AS (SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION SELECT doc_b, doc_a FROM p),
        |reach(doc, lab) AS (
        |  SELECT a, a FROM ed
        |  UNION
        |  SELECT ed.a, reach.lab FROM ed JOIN reach ON ed.b = reach.doc),
        |dec AS (SELECT doc AS doc_id, min(lab) AS cluster_rep
        |  FROM reach GROUP BY doc),
        |mem AS (SELECT dec.doc_id, dec.cluster_rep, d.n_chars
        |  FROM dec JOIN documents d ON d.doc_id = dec.doc_id),
        |win AS (SELECT cluster_rep, doc_id AS winner_id FROM (
        |  SELECT cluster_rep, doc_id, row_number() OVER (
        |    PARTITION BY cluster_rep ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM mem) t WHERE rn = 1)
        |SELECT mem.doc_id, mem.cluster_rep, win.winner_id,
        |  mem.doc_id = win.winner_id AS keep
        |FROM mem JOIN win ON mem.cluster_rep = win.cluster_rep""".stripMargin,
    "d13_incremental_dedup" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |tok AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        |hx AS (SELECT doc_id, md5('m:' || shingle) AS h FROM tok),
        |base AS (SELECT doc_id, CAST(list_reduce(
        |    list_transform(range(1, 8), c ->
        |      CASE WHEN ascii(substr(h, c, 1)) <= 57
        |           THEN ascii(substr(h, c, 1)) - 48
        |           ELSE ascii(substr(h, c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) AS b FROM hx),
        |mh AS (SELECT doc_id, k,
        |  min(([1299721, 2750161, 4256233, 5800079, 7368787, 8960453, 10570841,
        |        12195257, 13834103, 15485863, 17624813, 19654991][k + 1] * b +
        |       [15487469, 32452843, 49979687, 67867967, 86028121, 104395301,
        |        122949823, 141650939, 160481183, 179424673, 198491317,
        |        217645177][k + 1]) % 1000000007) AS mh
        |  FROM base, range(12) t(k) GROUP BY doc_id, k),
        |band AS (SELECT doc_id, k // 3 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY k) AS bkey
        |  FROM mh GROUP BY doc_id, k // 3),
        |bandi AS (SELECT b0.* FROM band b0 WHERE b0.doc_id % 10 = 0
        |  QUALIFY count(*) OVER (PARTITION BY b0.band, b0.bkey) <= 500),
        |bandn AS (SELECT b0.* FROM band b0 WHERE b0.doc_id % 10 <> 0
        |  QUALIFY count(*) OVER (PARTITION BY b0.band, b0.bkey) <= 500),
        |cand AS (SELECT a.doc_id AS doc_id, b.doc_id AS dup_of
        |  FROM bandi a JOIN bandn b
        |    ON a.band = b.band AND a.bkey = b.bkey
        |  GROUP BY 1, 2)
        |SELECT cand.doc_id AS doc_id, cand.dup_of AS dup_of,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
        |FROM cand JOIN sh x ON x.doc_id = cand.doc_id
        |  JOIN sh y ON y.doc_id = cand.dup_of
        |WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) >= 0.7""".stripMargin,
    // d12 computes the SAME decisions as d7 through the star-contraction
    // scale path — one oracle definition, two engine algorithms.
    "d12_cc_star" ->
      """WITH RECURSIVE ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |tok AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        |hx AS (SELECT doc_id, md5('m:' || shingle) AS h FROM tok),
        |base AS (SELECT doc_id, CAST(list_reduce(
        |    list_transform(range(1, 8), c ->
        |      CASE WHEN ascii(substr(h, c, 1)) <= 57
        |           THEN ascii(substr(h, c, 1)) - 48
        |           ELSE ascii(substr(h, c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) AS b FROM hx),
        |mh AS (SELECT doc_id, k,
        |  min(([1299721, 2750161, 4256233, 5800079, 7368787, 8960453, 10570841,
        |        12195257, 13834103, 15485863, 17624813, 19654991][k + 1] * b +
        |       [15487469, 32452843, 49979687, 67867967, 86028121, 104395301,
        |        122949823, 141650939, 160481183, 179424673, 198491317,
        |        217645177][k + 1]) % 1000000007) AS mh
        |  FROM base, range(12) t(k) GROUP BY doc_id, k),
        |band AS (SELECT doc_id, k // 3 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY k) AS bkey
        |  FROM mh GROUP BY doc_id, k // 3),
        |bandk AS (SELECT b0.* FROM band b0
        |  QUALIFY count(*) OVER (PARTITION BY b0.band, b0.bkey) <= 500),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bandk a JOIN bandk b
        |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jac AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
        |  FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b),
        |p AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.7),
        |ed AS (SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION SELECT doc_b, doc_a FROM p),
        |reach(doc, lab) AS (
        |  SELECT a, a FROM ed
        |  UNION
        |  SELECT ed.a, reach.lab FROM ed JOIN reach ON ed.b = reach.doc)
        |SELECT doc AS doc_id, min(lab) AS cluster_rep,
        |  doc = min(lab) AS keep
        |FROM reach GROUP BY doc""".stripMargin,
    "d8_dedup_apply" ->
      """WITH RECURSIVE ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |tok AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        |hx AS (SELECT doc_id, md5('m:' || shingle) AS h FROM tok),
        |base AS (SELECT doc_id, CAST(list_reduce(
        |    list_transform(range(1, 8), c ->
        |      CASE WHEN ascii(substr(h, c, 1)) <= 57
        |           THEN ascii(substr(h, c, 1)) - 48
        |           ELSE ascii(substr(h, c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) AS b FROM hx),
        |mh AS (SELECT doc_id, k,
        |  min(([1299721, 2750161, 4256233, 5800079, 7368787, 8960453, 10570841,
        |        12195257, 13834103, 15485863, 17624813, 19654991][k + 1] * b +
        |       [15487469, 32452843, 49979687, 67867967, 86028121, 104395301,
        |        122949823, 141650939, 160481183, 179424673, 198491317,
        |        217645177][k + 1]) % 1000000007) AS mh
        |  FROM base, range(12) t(k) GROUP BY doc_id, k),
        |band AS (SELECT doc_id, k // 3 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY k) AS bkey
        |  FROM mh GROUP BY doc_id, k // 3),
        |bandk AS (SELECT b0.* FROM band b0
        |  QUALIFY count(*) OVER (PARTITION BY b0.band, b0.bkey) <= 500),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bandk a JOIN bandk b
        |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jac AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
        |  FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b),
        |p AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.7),
        |ed AS (SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION SELECT doc_b, doc_a FROM p),
        |reach(doc, lab) AS (
        |  SELECT a, a FROM ed
        |  UNION
        |  SELECT ed.a, reach.lab FROM ed JOIN reach ON ed.b = reach.doc),
        |dec AS (SELECT doc, min(lab) AS rep FROM reach GROUP BY doc),
        |drops AS (SELECT doc FROM dec WHERE doc <> rep)
        |SELECT d.source, count(*) AS n_docs_kept
        |FROM documents d LEFT JOIN drops ON d.doc_id = drops.doc
        |WHERE drops.doc IS NULL
        |GROUP BY d.source""".stripMargin,
    // d8's component chain, aggregated into the dropped-mass report.
    "d16_dedup_report" ->
      """WITH RECURSIVE ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |tok AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        |hx AS (SELECT doc_id, md5('m:' || shingle) AS h FROM tok),
        |base AS (SELECT doc_id, CAST(list_reduce(
        |    list_transform(range(1, 8), c ->
        |      CASE WHEN ascii(substr(h, c, 1)) <= 57
        |           THEN ascii(substr(h, c, 1)) - 48
        |           ELSE ascii(substr(h, c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) AS b FROM hx),
        |mh AS (SELECT doc_id, k,
        |  min(([1299721, 2750161, 4256233, 5800079, 7368787, 8960453, 10570841,
        |        12195257, 13834103, 15485863, 17624813, 19654991][k + 1] * b +
        |       [15487469, 32452843, 49979687, 67867967, 86028121, 104395301,
        |        122949823, 141650939, 160481183, 179424673, 198491317,
        |        217645177][k + 1]) % 1000000007) AS mh
        |  FROM base, range(12) t(k) GROUP BY doc_id, k),
        |band AS (SELECT doc_id, k // 3 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY k) AS bkey
        |  FROM mh GROUP BY doc_id, k // 3),
        |bandk AS (SELECT b0.* FROM band b0
        |  QUALIFY count(*) OVER (PARTITION BY b0.band, b0.bkey) <= 500),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bandk a JOIN bandk b
        |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jac AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
        |  FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b),
        |p AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.7),
        |ed AS (SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION SELECT doc_b, doc_a FROM p),
        |reach(doc, lab) AS (
        |  SELECT a, a FROM ed
        |  UNION
        |  SELECT ed.a, reach.lab FROM ed JOIN reach ON ed.b = reach.doc),
        |dec AS (SELECT doc, min(lab) AS rep FROM reach GROUP BY doc),
        |drops AS (SELECT doc FROM dec WHERE doc <> rep),
        |bc AS (SELECT band, bkey, count(*) AS n FROM band GROUP BY 1, 2),
        |skx AS (SELECT doc_id, unnest(s) AS x FROM sh),
        |skh AS (SELECT doc_id, list_reduce(list_transform(range(1, 16), c ->
        |    CAST(CASE WHEN ascii(substr(md5('f:' || x), c, 1)) <= 57
        |         THEN ascii(substr(md5('f:' || x), c, 1)) - 48
        |         ELSE ascii(substr(md5('f:' || x), c, 1)) - 87 END
        |      AS BIGINT)),
        |    (a, v) -> a * 16 + v) AS h FROM skx),
        |sk AS (SELECT doc_id, unnest((list_sort(list(h)))[1:4]) AS h
        |  FROM skh GROUP BY doc_id),
        |sc AS (SELECT h, count(*) AS n FROM sk GROUP BY 1),
        |bstat AS (SELECT 'minhash_band' AS family,
        |  count(*) AS n_keys,
        |  CAST(sum(CASE WHEN n > 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_hot_keys,
        |  CAST(sum(CASE WHEN n > 5 THEN n ELSE 0 END) AS BIGINT) AS n_dropped_entries
        |  FROM bc),
        |sstat AS (SELECT 'bottom4_sketch' AS family,
        |  count(*) AS n_keys,
        |  CAST(sum(CASE WHEN n > 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_hot_keys,
        |  CAST(sum(CASE WHEN n > 5 THEN n ELSE 0 END) AS BIGINT) AS n_dropped_entries
        |  FROM sc)
        |SELECT d.source AS section, 'source_dedup' AS kind,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN drops.doc IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dropped,
        |  CAST(COUNT(*) - SUM(CASE WHEN drops.doc IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_kept,
        |  CAST(CAST(SUM(CASE WHEN drops.doc IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS DOUBLE) / COUNT(*) AS drop_frac,
        |  CAST(NULL AS BIGINT) AS n_keys,
        |  CAST(NULL AS BIGINT) AS n_hot_keys,
        |  CAST(NULL AS BIGINT) AS n_dropped_entries
        |FROM documents d LEFT JOIN drops ON d.doc_id = drops.doc
        |GROUP BY d.source
        |UNION ALL
        |SELECT family AS section, 'hot_key_cap' AS kind,
        |  CAST(NULL AS BIGINT) AS n_docs, CAST(NULL AS BIGINT) AS n_dropped,
        |  CAST(NULL AS BIGINT) AS n_kept, CAST(NULL AS DOUBLE) AS drop_frac,
        |  n_keys, n_hot_keys, n_dropped_entries
        |FROM (SELECT * FROM bstat UNION ALL SELECT * FROM sstat)""".stripMargin,
    "d10_span_dedup" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |f AS (SELECT doc_id, list_transform(w, x -> CAST(list_reduce(
        |    list_transform(range(1, 8), c ->
        |      CASE WHEN ascii(substr(md5('r:' || x), c, 1)) <= 57
        |           THEN ascii(substr(md5('r:' || x), c, 1)) - 48
        |           ELSE ascii(substr(md5('r:' || x), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT)) AS varr
        |  FROM ws WHERE len(w) >= 4),
        |r AS (SELECT doc_id, list_transform(range(1, len(varr) - 2), i ->
        |    ((((varr[i] * 131 + varr[i+1]) % 1000000007) * 131 + varr[i+2])
        |      % 1000000007 * 131 + varr[i+3]) % 1000000007) AS roll
        |  FROM f),
        |e AS (SELECT doc_id, unnest(roll) AS h FROM r),
        |sh AS (SELECT h, 1 AS is_shared FROM (
        |  SELECT h, count(DISTINCT doc_id) AS nd FROM e GROUP BY h)
        |  WHERE nd >= 2),
        |a AS (SELECT e.doc_id, count(*) AS n_windows,
        |  count(sh.is_shared) AS n_shared_windows
        | FROM e LEFT JOIN sh ON e.h = sh.h GROUP BY e.doc_id)
        |SELECT doc_id, n_windows, n_shared_windows,
        |  CAST(n_shared_windows AS DOUBLE) / n_windows AS shared_frac,
        |  CAST(n_shared_windows AS DOUBLE) / n_windows > 0.5 AS is_dup_heavy
        |FROM a""".stripMargin,
    // d10's rolling windows with positions; maximal consecutive-shared runs
    // via gaps-and-islands (pos minus per-doc rank is constant in a run)
    "d18_removable_spans" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |f AS (SELECT doc_id, list_transform(w, x -> CAST(list_reduce(
        |    list_transform(range(1, 8), c ->
        |      CASE WHEN ascii(substr(md5('r:' || x), c, 1)) <= 57
        |           THEN ascii(substr(md5('r:' || x), c, 1)) - 48
        |           ELSE ascii(substr(md5('r:' || x), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT)) AS varr
        |  FROM ws WHERE len(w) >= 4),
        |r AS (SELECT doc_id, list_transform(range(1, len(varr) - 2), i ->
        |    ((((varr[i] * 131 + varr[i+1]) % 1000000007) * 131 + varr[i+2])
        |      % 1000000007 * 131 + varr[i+3]) % 1000000007) AS roll
        |  FROM f),
        |e AS (SELECT doc_id, unnest(range(1, len(roll) + 1)) AS pos,
        |  unnest(roll) AS h FROM r),
        |nd AS (SELECT h FROM (
        |  SELECT h, count(DISTINCT doc_id) AS n FROM e GROUP BY h)
        |  WHERE n >= 2),
        |sp AS (SELECT e.doc_id, e.pos FROM e JOIN nd USING (h)),
        |isl AS (SELECT doc_id, pos,
        |  pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS g
        |  FROM sp)
        |SELECT doc_id, min(pos) AS span_start,
        |  CAST(max(pos) - min(pos) + 4 AS BIGINT) AS span_len
        |FROM isl GROUP BY doc_id, g""".stripMargin,
    // incoming (doc_id%10=0) scored against the shared-span index of the
    // rest; index membership is distinct-doc-count >= 2 on the 90% side
    "d19_span_vs_index" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |f AS (SELECT doc_id, list_transform(w, x -> CAST(list_reduce(
        |    list_transform(range(1, 8), c ->
        |      CASE WHEN ascii(substr(md5('r:' || x), c, 1)) <= 57
        |           THEN ascii(substr(md5('r:' || x), c, 1)) - 48
        |           ELSE ascii(substr(md5('r:' || x), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT)) AS varr
        |  FROM ws WHERE len(w) >= 4),
        |r AS (SELECT doc_id, list_transform(range(1, len(varr) - 2), i ->
        |    ((((varr[i] * 131 + varr[i+1]) % 1000000007) * 131 + varr[i+2])
        |      % 1000000007 * 131 + varr[i+3]) % 1000000007) AS roll
        |  FROM f),
        |e AS (SELECT doc_id, unnest(roll) AS h FROM r),
        |idx AS (SELECT h FROM (
        |  SELECT h, count(DISTINCT doc_id) AS nd FROM e
        |  WHERE doc_id % 10 <> 0 GROUP BY h) WHERE nd >= 2),
        |inc AS (SELECT doc_id, h FROM e WHERE doc_id % 10 = 0),
        |a AS (SELECT inc.doc_id, count(*) AS n_windows,
        |  count(idx.h) AS n_indexed_windows
        |  FROM inc LEFT JOIN idx ON inc.h = idx.h GROUP BY inc.doc_id)
        |SELECT doc_id, n_windows, n_indexed_windows,
        |  CAST(n_indexed_windows AS DOUBLE) / n_windows AS indexed_frac,
        |  CAST(n_indexed_windows AS DOUBLE) / n_windows > 0.5
        |    AS is_boilerplate_heavy
        |FROM a""".stripMargin,
    // d23's S-curve swept over every (bands, rows) factorization of the
    // hash budget; powers are left-fold repeated multiplication (1.0·s ≡ s
    // in IEEE so Spark aggregate-HOF and DuckDB list_reduce agree), error
    // terms grid-rounded before the cross-grid integral.
    "d25_lsh_tune" ->
      """WITH combos AS (SELECT CAST(b AS INT) AS bands,
        |    CAST(12 // b AS INT) AS rows_per_band
        |  FROM (SELECT UNNEST(range(1, 13)) AS b) q WHERE 12 % b = 0),
        |g AS (SELECT CAST(i AS DOUBLE) / 20 AS s FROM range(1, 20) t(i)),
        |sc AS (SELECT bands, rows_per_band, s,
        |    list_reduce(list_transform(range(1,
        |      CAST(rows_per_band + 1 AS BIGINT)), i -> s),
        |      (a, b) -> a * b) AS sr
        |  FROM combos CROSS JOIN g),
        |pc AS (SELECT bands, rows_per_band, s,
        |    1.0 - list_reduce(list_transform(range(1,
        |      CAST(bands + 1 AS BIGINT)), i -> 1.0 - sr),
        |      (a, b) -> a * b) AS p
        |  FROM sc),
        |terms AS (SELECT bands, rows_per_band,
        |    CASE WHEN s < 0.7 THEN p * 0.05 ELSE 0.0 END AS fp_term,
        |    CASE WHEN s >= 0.7 THEN (1.0 - p) * 0.05 ELSE 0.0 END AS fn_term
        |  FROM pc),
        |errs AS (SELECT bands, rows_per_band,
        |    CAST(SUM(CAST(round(fp_term * 1.0e9) AS BIGINT)) AS DOUBLE)
        |      / 1.0e9 AS fp_mass,
        |    CAST(SUM(CAST(round(fn_term * 1.0e9) AS BIGINT)) AS DOUBLE)
        |      / 1.0e9 AS fn_mass
        |  FROM terms GROUP BY 1, 2)
        |SELECT bands, rows_per_band, fp_mass, fn_mass,
        |  fp_mass + fn_mass AS total_err,
        |  row_number() OVER (ORDER BY fp_mass + fn_mass, bands) = 1
        |    AS chosen
        |FROM errs""".stripMargin,
    // Prefix filtering: rare-first order (corpus frequency asc, hash asc),
    // prefix length floor((1-t)*n)+1, size-ratio filter in the candidate
    // join, exact Jaccard verify — the same pipeline as the engine, so the
    // oracle pins the exact-recall semantics, not a sample of it.
    "d26_prefix_filter" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |tokx AS (SELECT doc_id, len(s) AS n, unnest(s) AS x FROM sh),
        |tok AS (SELECT doc_id, n,
        |  list_reduce(list_transform(range(1, 16), c ->
        |    CAST(CASE WHEN ascii(substr(md5('f:' || x), c, 1)) <= 57
        |         THEN ascii(substr(md5('f:' || x), c, 1)) - 48
        |         ELSE ascii(substr(md5('f:' || x), c, 1)) - 87 END
        |      AS BIGINT)),
        |    (a, v) -> a * 16 + v) AS h FROM tokx),
        |freq AS (SELECT h, count(*) AS freq FROM tok GROUP BY h),
        |rk AS (SELECT t.doc_id, t.n, t.h,
        |  row_number() OVER (PARTITION BY t.doc_id ORDER BY f.freq, t.h) AS rn
        |  FROM tok t JOIN freq f ON f.h = t.h),
        |pre AS (SELECT doc_id, n, h, rn FROM rk
        |  WHERE rn <= floor((1.0 - 0.7) * n + 1e-9) + 1),
        |prec AS (SELECT p.* FROM pre p
        |  QUALIFY count(*) OVER (PARTITION BY p.h) <= 500),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM prec a JOIN prec b ON a.h = b.h AND a.doc_id < b.doc_id
        |    AND a.n >= 0.7 * b.n AND b.n >= 0.7 * a.n
        |    AND CAST(1 + least(a.n - a.rn, b.n - b.rn) AS DOUBLE)
        |      >= ceil(0.7e0 * (a.n + b.n) / (1.0e0 + 0.7e0) - 1.0e-9)
        |  GROUP BY 1, 2),
        |jac AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
        |  FROM cand JOIN sh x ON x.doc_id = doc_a
        |    JOIN sh y ON y.doc_id = doc_b)
        |SELECT doc_a, doc_b, jaccard FROM jac
        |WHERE jaccard >= 0.7""".stripMargin,
    "d30_syndication" ->
      """WITH h AS (SELECT source,
        |    md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS h
        |  FROM documents),
        |c AS (SELECT h, source, count(*) AS n FROM h GROUP BY 1, 2)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(SUM(a.n * b.n) AS BIGINT) AS n_dup_pairs,
        |  CAST(count(*) AS BIGINT) AS n_shared_texts
        |FROM c a JOIN c b ON a.h = b.h AND a.source < b.source
        |GROUP BY 1, 2""".stripMargin,
    // d32: d29's first-copy rule grouped by source — which feed re-posts.
    "d32_dup_by_source" ->
      """WITH h AS (SELECT doc_id, source, md5(text) AS h FROM documents),
        |f AS (SELECT h, min(doc_id) AS first_doc FROM h GROUP BY h),
        |j AS (SELECT x.source, x.doc_id <> f.first_doc AS is_dup
        |  FROM h x JOIN f ON f.h = x.h)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_docs,
        |  CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) AS dup_frac
        |FROM j GROUP BY source""".stripMargin,
    // d33: x12's 8-word line segmentation; boilerplate = a line whose
    // exact text occurs in >= 2 distinct docs.
    "d33_boilerplate_lines" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |l AS (SELECT doc_id, i AS li,
        |  list_aggr(w[i:i+7], 'string_agg', ' ') AS line
        |  FROM t, UNNEST(range(1, len(w)+1, 8)) AS u(i))
        |SELECT line, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_occurrences
        |FROM l GROUP BY line
        |HAVING count(DISTINCT doc_id) >= 2""".stripMargin,
    // d34: d33's detector applied per doc — surviving lines rejoined in
    // order and md5'd so every output byte is pinned.
    "d34_boilerplate_apply" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |l AS (SELECT doc_id, i AS li,
        |  list_aggr(w[i:i+7], 'string_agg', ' ') AS line
        |  FROM t, UNNEST(range(1, len(w)+1, 8)) AS u(i)),
        |b AS (SELECT line FROM (SELECT line,
        |    count(DISTINCT doc_id) AS nd FROM l GROUP BY line)
        |  WHERE nd >= 2),
        |f AS (SELECT l.doc_id, l.li, l.line, (b.line IS NOT NULL) AS flag
        |  FROM l LEFT JOIN b ON l.line = b.line)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CASE WHEN flag THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_boiler,
        |  CAST(count(*) - SUM(CASE WHEN flag THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) AS kept_ratio,
        |  md5(COALESCE(string_agg(CASE WHEN NOT flag THEN line END,
        |    ' | ' ORDER BY li), '')) AS kept_md5
        |FROM f GROUP BY doc_id""".stripMargin,
    // d36: bottom-k (KMV) distinct-shingle cardinality per source — the
    // 28-bit portable-hash fold (x15's idiom) over d6's shingle chain;
    // est = (k-1)*2^28/h_k with k = 64 once a source holds >= k hashes.
    "d36_cardinality_sketch" ->
      """WITH ws AS (SELECT doc_id, source, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id, source,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |t AS (SELECT DISTINCT source, unnest(s) AS sg FROM sh),
        |ex AS (SELECT source, count(*) AS n_exact FROM t GROUP BY source),
        |h AS (SELECT DISTINCT source,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('card:' || sg), c, 1)) <= 57
        |         THEN ascii(substr(md5('card:' || sg), c, 1)) - 48
        |         ELSE ascii(substr(md5('card:' || sg), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) AS h FROM t),
        |r AS (SELECT source, h,
        |  row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM h),
        |st AS (SELECT source, count(*) AS n_sketch, max(h) AS h_k
        |  FROM r WHERE rn <= 64 GROUP BY source),
        |fin AS (SELECT ex.source, ex.n_exact, st.n_sketch,
        |  CASE WHEN st.n_sketch < 64 THEN CAST(st.n_sketch AS DOUBLE)
        |       ELSE CAST(16911433728 AS DOUBLE) / CAST(st.h_k AS DOUBLE)
        |  END AS est
        |  FROM ex JOIN st ON st.source = ex.source)
        |SELECT source, n_exact, n_sketch, est,
        |  (est - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE)
        |    AS rel_err
        |FROM fin""".stripMargin,
    "d29_dup_trend" ->
      """WITH h AS (SELECT doc_id, md5(text) AS h FROM documents),
        |f AS (SELECT h, min(doc_id) AS first_doc FROM h GROUP BY h),
        |j AS (SELECT x.doc_id, x.doc_id <> f.first_doc AS is_dup
        |  FROM h x JOIN f ON f.h = x.h)
        |SELECT doc_id // 100 AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_docs,
        |  CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) AS dup_frac
        |FROM j GROUP BY 1""".stripMargin,
    // d26's pair chain + d8's component/apply tail: exact candidates →
    // transitive closure → keep component minima → kept-per-source.
    "d28_exact_pipeline" ->
      """WITH RECURSIVE ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |tokx AS (SELECT doc_id, len(s) AS n, unnest(s) AS x FROM sh),
        |tok AS (SELECT doc_id, n,
        |  list_reduce(list_transform(range(1, 16), c ->
        |    CAST(CASE WHEN ascii(substr(md5('f:' || x), c, 1)) <= 57
        |         THEN ascii(substr(md5('f:' || x), c, 1)) - 48
        |         ELSE ascii(substr(md5('f:' || x), c, 1)) - 87 END
        |      AS BIGINT)),
        |    (a, v) -> a * 16 + v) AS h FROM tokx),
        |freq AS (SELECT h, count(*) AS freq FROM tok GROUP BY h),
        |rk AS (SELECT t.doc_id, t.n, t.h,
        |  row_number() OVER (PARTITION BY t.doc_id ORDER BY f.freq, t.h) AS rn
        |  FROM tok t JOIN freq f ON f.h = t.h),
        |pre AS (SELECT doc_id, n, h, rn FROM rk
        |  WHERE rn <= floor((1.0 - 0.7) * n + 1e-9) + 1),
        |prec AS (SELECT p0.* FROM pre p0
        |  QUALIFY count(*) OVER (PARTITION BY p0.h) <= 500),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM prec a JOIN prec b ON a.h = b.h AND a.doc_id < b.doc_id
        |    AND a.n >= 0.7 * b.n AND b.n >= 0.7 * a.n
        |    AND CAST(1 + least(a.n - a.rn, b.n - b.rn) AS DOUBLE)
        |      >= ceil(0.7e0 * (a.n + b.n) / (1.0e0 + 0.7e0) - 1.0e-9)
        |  GROUP BY 1, 2),
        |jac AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
        |  FROM cand JOIN sh x ON x.doc_id = doc_a
        |    JOIN sh y ON y.doc_id = doc_b),
        |p AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.7),
        |ed AS (SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION SELECT doc_b, doc_a FROM p),
        |reach(doc, lab) AS (
        |  SELECT a, a FROM ed
        |  UNION
        |  SELECT ed.a, reach.lab FROM ed JOIN reach ON ed.b = reach.doc),
        |dec AS (SELECT doc, min(lab) AS rep FROM reach GROUP BY doc),
        |drops AS (SELECT doc FROM dec WHERE doc <> rep)
        |SELECT d.source, count(*) AS n_docs_kept
        |FROM documents d LEFT JOIN drops ON d.doc_id = drops.doc
        |WHERE drops.doc IS NULL
        |GROUP BY d.source""".stripMargin,
    // d26's pipeline split cross-set: the frequency order is frozen from
    // the INDEX side only; incoming tokens unseen there rank with freq 0
    // (before all seen tokens) — the same single total order both sides.
    "d27_prefix_vs_index" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |tokx AS (SELECT doc_id, len(s) AS n, unnest(s) AS x FROM sh),
        |tok AS (SELECT doc_id, n,
        |  list_reduce(list_transform(range(1, 16), c ->
        |    CAST(CASE WHEN ascii(substr(md5('f:' || x), c, 1)) <= 57
        |         THEN ascii(substr(md5('f:' || x), c, 1)) - 48
        |         ELSE ascii(substr(md5('f:' || x), c, 1)) - 87 END
        |      AS BIGINT)),
        |    (a, v) -> a * 16 + v) AS h FROM tokx),
        |freq AS (SELECT h, count(*) AS freq FROM tok
        |  WHERE doc_id % 10 <> 0 GROUP BY h),
        |rkk AS (SELECT t.doc_id, t.n, t.h,
        |  row_number() OVER (PARTITION BY t.doc_id ORDER BY f.freq, t.h) AS rn
        |  FROM tok t JOIN freq f ON f.h = t.h WHERE t.doc_id % 10 <> 0),
        |prek AS (SELECT p.doc_id, p.n, p.h, p.rn
        |  FROM (SELECT doc_id, n, h, rn FROM rkk
        |    WHERE rn <= floor((1.0 - 0.7) * n + 1e-9) + 1) p
        |  QUALIFY count(*) OVER (PARTITION BY p.h) <= 500),
        |rki AS (SELECT t.doc_id, t.n, t.h,
        |  row_number() OVER (PARTITION BY t.doc_id
        |    ORDER BY COALESCE(f.freq, 0), t.h) AS rn
        |  FROM tok t LEFT JOIN freq f ON f.h = t.h WHERE t.doc_id % 10 = 0),
        |prei AS (SELECT p.doc_id, p.n, p.h, p.rn
        |  FROM (SELECT doc_id, n, h, rn FROM rki
        |    WHERE rn <= floor((1.0 - 0.7) * n + 1e-9) + 1) p
        |  QUALIFY count(*) OVER (PARTITION BY p.h) <= 500),
        |cand AS (SELECT a.doc_id AS doc_id, b.doc_id AS dup_of
        |  FROM prei a JOIN prek b ON a.h = b.h
        |    AND a.n >= 0.7 * b.n AND b.n >= 0.7 * a.n
        |    AND CAST(1 + least(a.n - a.rn, b.n - b.rn) AS DOUBLE)
        |      >= ceil(0.7e0 * (a.n + b.n) / (1.0e0 + 0.7e0) - 1.0e-9)
        |  GROUP BY 1, 2),
        |jac AS (SELECT c.doc_id, c.dup_of,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
        |  FROM cand c JOIN sh x ON x.doc_id = c.doc_id
        |    JOIN sh y ON y.doc_id = c.dup_of)
        |SELECT doc_id, dup_of, jaccard FROM jac
        |WHERE jaccard >= 0.7""".stripMargin,
    // The S-curve uses multiplication-only arithmetic in the same order
    // as the Spark expression, so doubles match bit-for-bit.
    "d23_lsh_curve" ->
      """WITH g AS (SELECT CAST(i AS DOUBLE) / 20 AS jaccard
        |  FROM range(1, 20) t(i)),
        |s AS (SELECT jaccard,
        |    1.0 - jaccard * jaccard * jaccard AS q FROM g),
        |s2 AS (SELECT jaccard, q * q AS q2 FROM s)
        |SELECT jaccard, 1.0 - q2 * q2 AS p_candidate FROM s2""".stripMargin,
    // Block on the exact 8-char title prefix (d2's QUALIFY cap mirror),
    // verify with Levenshtein inside blocks only.
    "d21_fuzzy_title" ->
      """WITH t AS (SELECT doc_id, substr(text, 1, 40) AS title
        |  FROM documents),
        |b AS (SELECT doc_id, title, substr(title, 1, 8) AS blk FROM t),
        |bk AS (SELECT * FROM b
        |  QUALIFY count(*) OVER (PARTITION BY blk) <= 500)
        |SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
        |  CAST(levenshtein(a.title, b2.title) AS INT) AS edit_dist
        |FROM bk a JOIN bk b2 ON a.blk = b2.blk AND a.doc_id < b2.doc_id
        |WHERE levenshtein(a.title, b2.title) <= 5""".stripMargin,
    // sorted-neighborhood: the oracle's single-window row_number IS the
    // semantic spec; the engine computes the same global rank with the
    // two-phase range-partition + offset scheme and pairs neighbors via
    // a rank-bucket equi-join (never a windowed global sort).
    "d24_sorted_neighborhood" ->
      """WITH t AS (SELECT doc_id, substr(text, 1, 40) AS title
        |  FROM documents),
        |r AS (SELECT doc_id, title,
        |  row_number() OVER (ORDER BY title, doc_id) AS rk FROM t)
        |SELECT least(a.doc_id, b.doc_id) AS doc_a,
        |  greatest(a.doc_id, b.doc_id) AS doc_b,
        |  CAST(levenshtein(a.title, b.title) AS INT) AS edit_dist
        |FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND 10
        |WHERE levenshtein(a.title, b.title) <= 5""".stripMargin,
    // d39: a's last-3-gram joined against b's leading 3-gram positions
    // 1..6 (an L-token overlap puts it at position L-2), QUALIFY = the
    // agg+anti-join hot-key cap on both sides, then exact slice verify
    // of the claimed length and a per-pair max — all-integer.
    // d42: distinct-shingle collision audit of the two fold widths —
    // count(*) vs count(DISTINCT fold) over the same fold arithmetic.
    "d42_fold_collisions" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |t AS (SELECT DISTINCT unnest(s) AS x FROM sh),
        |h AS (SELECT
        |  list_reduce(list_transform(range(1, 8), c ->
        |    CAST(CASE WHEN ascii(substr(md5('m:' || x), c, 1)) <= 57
        |         THEN ascii(substr(md5('m:' || x), c, 1)) - 48
        |         ELSE ascii(substr(md5('m:' || x), c, 1)) - 87 END
        |      AS BIGINT)),
        |    (a, v) -> a * 16 + v) AS h7,
        |  list_reduce(list_transform(range(1, 16), c ->
        |    CAST(CASE WHEN ascii(substr(md5('f:' || x), c, 1)) <= 57
        |         THEN ascii(substr(md5('f:' || x), c, 1)) - 48
        |         ELSE ascii(substr(md5('f:' || x), c, 1)) - 87 END
        |      AS BIGINT)),
        |    (a, v) -> a * 16 + v) AS h15
        |  FROM t)
        |SELECT count(*) AS n_shingles,
        |  count(DISTINCT h7) AS n_fold7_values,
        |  count(*) - count(DISTINCT h7) AS n_fold7_collisions,
        |  CAST(count(*) - count(DISTINCT h7) AS DOUBLE) / count(*)
        |    AS fold7_collision_frac,
        |  count(DISTINCT h15) AS n_fold15_values,
        |  count(*) - count(DISTINCT h15) AS n_fold15_collisions,
        |  CAST(count(*) - count(DISTINCT h15) AS DOUBLE) / count(*)
        |    AS fold15_collision_frac
        |FROM h
        |HAVING count(*) > 0""".stripMargin,
    // d44: measured LSH recall vs exact ground truth — d2's banding
    // CTEs and d26's prefix-filter CTEs side by side over one shared
    // shingle pass; true pairs bucketed by Jaccard decile with the
    // fraction the banding actually found (the d23 S-curve, measured).
    "d44_lsh_vs_exact" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |ltok AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        |hx AS (SELECT doc_id, md5('m:' || shingle) AS h FROM ltok),
        |base AS (SELECT doc_id, CAST(list_reduce(
        |    list_transform(range(1, 8), c ->
        |      CASE WHEN ascii(substr(h, c, 1)) <= 57
        |           THEN ascii(substr(h, c, 1)) - 48
        |           ELSE ascii(substr(h, c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) AS b FROM hx),
        |mh AS (SELECT doc_id, k,
        |  min(([1299721, 2750161, 4256233, 5800079, 7368787, 8960453, 10570841,
        |        12195257, 13834103, 15485863, 17624813, 19654991][k + 1] * b +
        |       [15487469, 32452843, 49979687, 67867967, 86028121, 104395301,
        |        122949823, 141650939, 160481183, 179424673, 198491317,
        |        217645177][k + 1]) % 1000000007) AS mh
        |  FROM base, range(12) t(k) GROUP BY doc_id, k),
        |band AS (SELECT doc_id, k // 3 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY k) AS bkey
        |  FROM mh GROUP BY doc_id, k // 3),
        |bandk AS (SELECT b0.* FROM band b0
        |  QUALIFY count(*) OVER (PARTITION BY b0.band, b0.bkey) <= 500),
        |lcand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bandk a JOIN bandk b
        |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |ljac AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
        |  FROM lcand JOIN sh x ON x.doc_id = doc_a
        |    JOIN sh y ON y.doc_id = doc_b),
        |lsh_pairs AS (SELECT doc_a, doc_b FROM ljac WHERE jaccard >= 0.7),
        |tokx AS (SELECT doc_id, len(s) AS n, unnest(s) AS x FROM sh),
        |tok AS (SELECT doc_id, n,
        |  list_reduce(list_transform(range(1, 16), c ->
        |    CAST(CASE WHEN ascii(substr(md5('f:' || x), c, 1)) <= 57
        |         THEN ascii(substr(md5('f:' || x), c, 1)) - 48
        |         ELSE ascii(substr(md5('f:' || x), c, 1)) - 87 END
        |      AS BIGINT)),
        |    (a, v) -> a * 16 + v) AS h FROM tokx),
        |freq AS (SELECT h, count(*) AS freq FROM tok GROUP BY h),
        |rk AS (SELECT t.doc_id, t.n, t.h,
        |  row_number() OVER (PARTITION BY t.doc_id ORDER BY f.freq, t.h) AS rn
        |  FROM tok t JOIN freq f ON f.h = t.h),
        |pre AS (SELECT doc_id, n, h, rn FROM rk
        |  WHERE rn <= floor((1.0 - 0.7) * n + 1e-9) + 1),
        |prec AS (SELECT p.* FROM pre p
        |  QUALIFY count(*) OVER (PARTITION BY p.h) <= 500),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM prec a JOIN prec b ON a.h = b.h AND a.doc_id < b.doc_id
        |    AND a.n >= 0.7 * b.n AND b.n >= 0.7 * a.n
        |    AND CAST(1 + least(a.n - a.rn, b.n - b.rn) AS DOUBLE)
        |      >= ceil(0.7e0 * (a.n + b.n) / (1.0e0 + 0.7e0) - 1.0e-9)
        |  GROUP BY 1, 2),
        |jac AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
        |  FROM cand JOIN sh x ON x.doc_id = doc_a
        |    JOIN sh y ON y.doc_id = doc_b),
        |true_pairs AS (SELECT doc_a, doc_b, jaccard FROM jac
        |  WHERE jaccard >= 0.7),
        |j AS (SELECT CAST(floor(t.jaccard * 10) AS INT) AS j_bucket,
        |    CASE WHEN l.doc_a IS NOT NULL THEN 1 ELSE 0 END AS found
        |  FROM true_pairs t LEFT JOIN lsh_pairs l
        |    ON l.doc_a = t.doc_a AND l.doc_b = t.doc_b)
        |SELECT j_bucket, CAST(count(*) AS BIGINT) AS n_true_pairs,
        |  CAST(SUM(found) AS BIGINT) AS n_lsh_found,
        |  CAST(SUM(found) AS DOUBLE) / count(*) AS lsh_recall
        |FROM j GROUP BY j_bucket""".stripMargin,
    // d45: the operating-point sweep — d28's CTE chain through the
    // verified base pairs at the lowest threshold, then a
    // threshold-keyed transitive closure: reach recurses over
    // (t, doc, lab) so one recursion serves every cut, mirroring the
    // engine's per-threshold connectedComponents legs exactly.
    // the VALUES list interpolates Dedup.SweepThresholds — engine and
    // oracle widen in lockstep (the d39 lesson); the base CTEs stay at
    // 0.7 = the list's minimum (see the constant's scaladoc)
    "d45_threshold_sweep" ->
      s"""WITH RECURSIVE ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |tokx AS (SELECT doc_id, len(s) AS n, unnest(s) AS x FROM sh),
        |tok AS (SELECT doc_id, n,
        |  list_reduce(list_transform(range(1, 16), c ->
        |    CAST(CASE WHEN ascii(substr(md5('f:' || x), c, 1)) <= 57
        |         THEN ascii(substr(md5('f:' || x), c, 1)) - 48
        |         ELSE ascii(substr(md5('f:' || x), c, 1)) - 87 END
        |      AS BIGINT)),
        |    (a, v) -> a * 16 + v) AS h FROM tokx),
        |freq AS (SELECT h, count(*) AS freq FROM tok GROUP BY h),
        |rk AS (SELECT t.doc_id, t.n, t.h,
        |  row_number() OVER (PARTITION BY t.doc_id ORDER BY f.freq, t.h) AS rn
        |  FROM tok t JOIN freq f ON f.h = t.h),
        |pre AS (SELECT doc_id, n, h, rn FROM rk
        |  WHERE rn <= floor((1.0 - 0.7) * n + 1e-9) + 1),
        |prec AS (SELECT p0.* FROM pre p0
        |  QUALIFY count(*) OVER (PARTITION BY p0.h) <= 500),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM prec a JOIN prec b ON a.h = b.h AND a.doc_id < b.doc_id
        |    AND a.n >= 0.7 * b.n AND b.n >= 0.7 * a.n
        |    AND CAST(1 + least(a.n - a.rn, b.n - b.rn) AS DOUBLE)
        |      >= ceil(0.7e0 * (a.n + b.n) / (1.0e0 + 0.7e0) - 1.0e-9)
        |  GROUP BY 1, 2),
        |jac AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
        |  FROM cand JOIN sh x ON x.doc_id = doc_a
        |    JOIN sh y ON y.doc_id = doc_b),
        |p AS (SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.7),
        |th AS (SELECT CAST(v.x AS DOUBLE) AS t
        |  FROM (VALUES ${graft.operators.Dedup.SweepThresholds
             .map(t => s"($t)").mkString(", ")}) v(x)),
        |tp AS (SELECT th.t, p.doc_a, p.doc_b FROM p
        |  JOIN th ON p.jaccard >= th.t),
        |ed AS (SELECT t, doc_a AS a, doc_b AS b FROM tp
        |  UNION SELECT t, doc_b, doc_a FROM tp),
        |reach(t, doc, lab) AS (
        |  SELECT t, a, a FROM ed
        |  UNION
        |  SELECT ed.t, ed.a, reach.lab FROM ed JOIN reach
        |    ON ed.b = reach.doc AND ed.t = reach.t),
        |dec AS (SELECT t, doc, min(lab) AS rep FROM reach GROUP BY t, doc),
        |np AS (SELECT t, CAST(count(*) AS BIGINT) AS n_pairs
        |  FROM tp GROUP BY t)
        |SELECT d.t AS threshold, np.n_pairs,
        |  CAST(count(*) AS BIGINT) AS n_docs_in_pairs,
        |  CAST(SUM(CASE WHEN d.doc <> d.rep THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_docs_removed,
        |  CAST(SUM(CASE WHEN d.doc <> d.rep THEN 1 ELSE 0 END) AS DOUBLE)
        |    / (SELECT count(*) FROM documents) AS frac_docs_removed
        |FROM dec d JOIN np ON np.t = d.t
        |GROUP BY d.t, np.n_pairs""".stripMargin,
    // d43: the PPJoin positional-filter audit — d26's candidate CTEs
    // with the bound demoted from join predicate to measured flag;
    // n_verified_pruned pins exact recall as a number (must be 0).
    "d43_positional_audit" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |tokx AS (SELECT doc_id, len(s) AS n, unnest(s) AS x FROM sh),
        |tok AS (SELECT doc_id, n,
        |  list_reduce(list_transform(range(1, 16), c ->
        |    CAST(CASE WHEN ascii(substr(md5('f:' || x), c, 1)) <= 57
        |         THEN ascii(substr(md5('f:' || x), c, 1)) - 48
        |         ELSE ascii(substr(md5('f:' || x), c, 1)) - 87 END
        |      AS BIGINT)),
        |    (a, v) -> a * 16 + v) AS h FROM tokx),
        |freq AS (SELECT h, count(*) AS freq FROM tok GROUP BY h),
        |rk AS (SELECT t.doc_id, t.n, t.h,
        |  row_number() OVER (PARTITION BY t.doc_id ORDER BY f.freq, t.h) AS rn
        |  FROM tok t JOIN freq f ON f.h = t.h),
        |pre AS (SELECT doc_id, n, h, rn FROM rk
        |  WHERE rn <= floor((1.0 - 0.7) * n + 1e-9) + 1),
        |prec AS (SELECT p.* FROM pre p
        |  QUALIFY count(*) OVER (PARTITION BY p.h) <= 500),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    max(CASE WHEN CAST(1 + least(a.n - a.rn, b.n - b.rn) AS DOUBLE)
        |      >= ceil(0.7e0 * (a.n + b.n) / (1.0e0 + 0.7e0) - 1.0e-9)
        |      THEN 1 ELSE 0 END) AS pp_ok
        |  FROM prec a JOIN prec b ON a.h = b.h AND a.doc_id < b.doc_id
        |    AND a.n >= 0.7 * b.n AND b.n >= 0.7 * a.n
        |  GROUP BY 1, 2),
        |jac AS (SELECT c.pp_ok,
        |    CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |      / len(list_distinct(list_concat(x.s, y.s))) AS j
        |  FROM cand c JOIN sh x ON x.doc_id = c.doc_a
        |    JOIN sh y ON y.doc_id = c.doc_b)
        |SELECT CAST(count(*) AS BIGINT) AS n_candidates,
        |  CAST(SUM(pp_ok) AS BIGINT) AS n_after_positional,
        |  CAST(count(*) - SUM(pp_ok) AS DOUBLE) / count(*) AS pruned_frac,
        |  CAST(SUM(CASE WHEN j >= 0.7 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_verified,
        |  CAST(SUM(CASE WHEN j >= 0.7 AND pp_ok = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_verified_pruned
        |FROM jac
        |HAVING count(*) > 0""".stripMargin,
    // The probe range interpolates ChainProbePositions so a future
    // widening of ChainMaxOverlap updates engine + oracle in lockstep
    // (d41's oracle already interpolates the same constant).
    "d39_chain_overlap" ->
      s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS w,
        |    len(string_split(text,' ')) AS n FROM documents),
        |t2 AS (SELECT doc_id, w, n FROM t WHERE n >= 3),
        |a AS (SELECT doc_id AS doc_a, w AS wa, n AS na,
        |    array_to_string(w[-3:],' ') AS bkey FROM t2
        |  QUALIFY count(*) OVER (PARTITION BY bkey) <= 100),
        |b0 AS (SELECT doc_id AS doc_b, w AS wb, n AS nb,
        |    UNNEST(range(1, ${graft.operators.DedupSources.ChainProbePositions + 1})) AS j FROM t2),
        |bx AS (SELECT doc_b, wb, nb, j,
        |    array_to_string(wb[j:j+2],' ') AS bkey
        |  FROM b0 WHERE nb >= j + 2),
        |b AS (SELECT * FROM bx
        |  QUALIFY count(*) OVER (PARTITION BY bkey) <= 100),
        |cand AS (SELECT doc_a, doc_b, wa, na, wb, nb, j
        |  FROM a JOIN b USING (bkey) WHERE doc_a <> doc_b),
        |ol AS (SELECT doc_a, doc_b,
        |    CASE WHEN na >= j + 2 AND nb >= j + 2
        |      AND wa[-(j+2):] = wb[1:j+2] THEN j + 2 ELSE 0 END AS l
        |  FROM cand)
        |SELECT doc_a, doc_b, CAST(max(l) AS BIGINT) AS overlap_len
        |FROM ol GROUP BY 1, 2 HAVING max(l) >= 3""".stripMargin,
  )
}
