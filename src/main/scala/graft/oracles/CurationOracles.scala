package graft.oracles

/** DuckDB oracle SQL for the curation query family — the
  * literal twins split out of SparkEntry (one object per family;
  * `SparkEntry.oracleSqlBase` unions them). Entry text is
  * byte-identical to the pre-split map: derived oracles anchor on
  * exact substrings of these strings. */
object CurationOracles {
  val sql: Map[String, String] = Map(
    "c13_source_report" ->
      """WITH t AS (SELECT doc_id, source, n_chars, text,
        |    len(string_split(text,' ')) AS n FROM documents),
        |m AS (SELECT doc_id, source, n_chars, n,
        |  0.4 * (CAST(len(list_filter(string_split(text,' '),
        |    x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS DOUBLE) / n)
        |  + 0.3 * (1.0 - CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
        |      / greatest(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')), 1))
        |  + 0.3 * (least(CAST(length(text) - (n - 1) AS DOUBLE) / n, 8.0) / 8.0) AS q
        | FROM t)
        |SELECT source, count(*) AS n_docs,
        |  CAST(SUM(CAST(round(q * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE)
        |    / (count(*) * 1000000.0) AS mean_quality,
        |  CAST(SUM(CAST(n AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS mean_tokens,
        |  CAST(COUNT(CASE WHEN q >= 0.5 THEN 1 END) AS DOUBLE) / count(*) AS quality_rate,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM m GROUP BY source""".stripMargin,
    "c12_quality_sample" ->
      """WITH t AS (SELECT doc_id, lang, text,
        |    len(string_split(text,' ')) AS n FROM documents),
        |m AS (SELECT doc_id, lang,
        |  0.4 * (CAST(len(list_filter(string_split(text,' '),
        |    x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS DOUBLE) / n)
        |  + 0.3 * (1.0 - CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
        |      / greatest(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')), 1))
        |  + 0.3 * (least(CAST(length(text) - (n - 1) AS DOUBLE) / n, 8.0) / 8.0) AS qs
        | FROM t),
        |h AS (SELECT doc_id, lang, qs,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('qs:' || doc_id), c, 1)) <= 57
        |         THEN ascii(substr(md5('qs:' || doc_id), c, 1)) - 48
        |         ELSE ascii(substr(md5('qs:' || doc_id), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) % 10000 AS gate
        | FROM m)
        |SELECT doc_id, lang, qs AS quality_score FROM h
        |WHERE gate < CAST(floor(qs * 10000) AS BIGINT)""".stripMargin,
    "c9_chunk_overlap" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |e AS (SELECT doc_id, w,
        |  unnest(range(1, len(w) + 1, 48)) AS start FROM t)
        |SELECT doc_id,
        |  CAST((start - 1) // 48 AS BIGINT) AS chunk_id,
        |  CAST(start AS BIGINT) AS start_token,
        |  CAST(len(w[start:start+63]) AS BIGINT) AS n_tokens,
        |  array_to_string(w[start:start+63], ' ') AS chunk_text
        |FROM e""".stripMargin,
    // c25: token mass per source over exact-dedup survivors (first copy
    // by doc_id); weight = survivor tokens / total survivor tokens.
    "c25_dedup_weighted_mix" ->
      """WITH h AS (SELECT doc_id, source,
        |    md5(text) AS h, len(string_split(text, ' ')) AS tok
        |  FROM documents),
        |f AS (SELECT h, min(doc_id) AS first_doc FROM h GROUP BY h),
        |kept AS (SELECT h.* FROM h JOIN f ON f.h = h.h
        |  WHERE h.doc_id = f.first_doc),
        |per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(tok) AS BIGINT) AS n_tokens
        |  FROM kept GROUP BY source),
        |t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t FROM per)
        |SELECT source, n_docs, n_tokens,
        |  CAST(n_tokens AS DOUBLE) / CAST(t AS DOUBLE) AS weight
        |FROM per CROSS JOIN t""".stripMargin,
    "c24_token_temperature" ->
      """WITH masses AS (SELECT lang,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS t_total
        |  FROM documents GROUP BY 1),
        |mn AS (SELECT min(t_total) AS min_t FROM masses),
        |rates AS (SELECT lang,
        |  CAST(floor(10000.0 * sqrt(CAST(min_t AS DOUBLE) / t_total)) AS BIGINT)
        |    AS keep_per_10k
        |  FROM masses CROSS JOIN mn),
        |h AS (SELECT doc_id, source, d.lang,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('tmt:' || doc_id), c, 1)) <= 57
        |         THEN ascii(substr(md5('tmt:' || doc_id), c, 1)) - 48
        |         ELSE ascii(substr(md5('tmt:' || doc_id), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) % 10000 AS b
        | FROM documents d)
        |SELECT doc_id, source, h.lang FROM h JOIN rates ON h.lang = rates.lang
        |WHERE b < keep_per_10k""".stripMargin,
    "c10_temperature_mix" ->
      """WITH counts AS (SELECT lang, count(*) AS n_total FROM documents GROUP BY 1),
        |mn AS (SELECT min(n_total) AS min_n FROM counts),
        |rates AS (SELECT lang,
        |  CAST(floor(10000.0 * sqrt(CAST(min_n AS DOUBLE) / n_total)) AS BIGINT)
        |    AS keep_per_10k
        |  FROM counts CROSS JOIN mn),
        |h AS (SELECT doc_id, source, d.lang,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('tmp:' || doc_id), c, 1)) <= 57
        |         THEN ascii(substr(md5('tmp:' || doc_id), c, 1)) - 48
        |         ELSE ascii(substr(md5('tmp:' || doc_id), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) % 10000 AS b
        | FROM documents d)
        |SELECT doc_id, source, h.lang FROM h JOIN rates ON h.lang = rates.lang
        |WHERE b < keep_per_10k""".stripMargin,
    "c11_token_budget" ->
      """WITH t AS (SELECT doc_id, lang, text,
        |    len(string_split(text,' ')) AS n FROM documents),
        |m AS (SELECT doc_id, lang, CAST(n AS BIGINT) AS n_tokens,
        |  0.4 * (CAST(len(list_filter(string_split(text,' '),
        |    x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS DOUBLE) / n)
        |  + 0.3 * (1.0 - CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
        |      / greatest(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')), 1))
        |  + 0.3 * (least(CAST(length(text) - (n - 1) AS DOUBLE) / n, 8.0) / 8.0) AS q
        | FROM t),
        |c AS (SELECT doc_id, lang AS domain, n_tokens, q,
        |  CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY q DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        | FROM m)
        |SELECT doc_id, domain, n_tokens, q AS quality_score, cum_tokens
        |FROM c WHERE cum_tokens <= 3000""".stripMargin,
    "c1_stratified_sample" ->
      """WITH h AS (SELECT doc_id, lang, source,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('smp:' || doc_id), c, 1)) <= 57
        |         THEN ascii(substr(md5('smp:' || doc_id), c, 1)) - 48
        |         ELSE ascii(substr(md5('smp:' || doc_id), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) % 100 AS bucket
        | FROM documents)
        |SELECT doc_id, lang, source, bucket FROM h
        |WHERE bucket < CASE WHEN lang = 'en' THEN 50 ELSE 25 END""".stripMargin,
    "c2_domain_mix" ->
      """WITH counts AS (SELECT lang, count(*) AS n_total FROM documents GROUP BY 1),
        |mn AS (SELECT min(n_total) AS min_n FROM counts),
        |rates AS (SELECT lang, (min_n * 10000) // n_total AS keep_per_10k
        |  FROM counts CROSS JOIN mn),
        |h AS (SELECT doc_id, source, d.lang,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('mix:' || doc_id), c, 1)) <= 57
        |         THEN ascii(substr(md5('mix:' || doc_id), c, 1)) - 48
        |         ELSE ascii(substr(md5('mix:' || doc_id), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) % 10000 AS b
        | FROM documents d)
        |SELECT doc_id, source, h.lang FROM h JOIN rates ON h.lang = rates.lang
        |WHERE b < keep_per_10k""".stripMargin,
    "c3_leakage_split" ->
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
        |r AS (SELECT d.doc_id, COALESCE(dec.rep, d.doc_id) AS rep
        |  FROM documents d LEFT JOIN dec ON d.doc_id = dec.doc),
        |hh AS (SELECT doc_id, rep,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('sp:' || rep), c, 1)) <= 57
        |         THEN ascii(substr(md5('sp:' || rep), c, 1)) - 48
        |         ELSE ascii(substr(md5('sp:' || rep), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) % 100 AS b
        | FROM r)
        |SELECT doc_id, rep,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM hh""".stripMargin,
    "c4_pack_sequences" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('pk:' || doc_id), c, 1)) <= 57
        |         THEN ascii(substr(md5('pk:' || doc_id), c, 1)) - 48
        |         ELSE ascii(substr(md5('pk:' || doc_id), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) % 32 AS shard
        | FROM documents),
        |c AS (SELECT doc_id, shard, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        | FROM t)
        |SELECT doc_id, shard, n_tokens,
        |  CAST((cum - n_tokens) // 512 AS BIGINT) AS pack_id,
        |  CAST((cum - n_tokens) % 512 AS BIGINT) AS start_offset
        |FROM c""".stripMargin,
    "c8_pack_materialize" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('pk:' || doc_id), c, 1)) <= 57
        |         THEN ascii(substr(md5('pk:' || doc_id), c, 1)) - 48
        |         ELSE ascii(substr(md5('pk:' || doc_id), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) % 32 AS shard
        | FROM documents),
        |c AS (SELECT doc_id, shard, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        | FROM t),
        |p AS (SELECT doc_id, shard, n_tokens,
        |  CAST((cum - n_tokens) // 512 AS BIGINT) AS pack_id FROM c)
        |SELECT p.shard, p.pack_id, count(*) AS n_docs,
        |  CAST(sum(p.n_tokens) AS BIGINT) AS n_tokens,
        |  string_agg(d.text, ' ' ORDER BY d.doc_id) AS pack_text
        |FROM p JOIN documents d ON p.doc_id = d.doc_id
        |GROUP BY 1, 2""".stripMargin,
    "c5_curation_pipeline" ->
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
        |m AS (SELECT d.doc_id, d.lang, d.n_chars,
        |  CAST(length(d.text) - (len(ws.w) - 1) AS DOUBLE) / len(ws.w) AS mwl,
        |  CAST(len(list_filter(ws.w,
        |    x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS DOUBLE)
        |    / len(ws.w) AS sr,
        |  CAST(len(regexp_extract_all(d.text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
        |    / greatest(len(regexp_extract_all(d.text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')), 1) AS pr,
        |  CASE WHEN len(ws.w) > 0
        |       THEN CAST(len(ws.w) - len(list_distinct(ws.w)) AS DOUBLE) / len(ws.w)
        |       ELSE 0.0 END AS dw,
        |  CASE WHEN len(ws.w) >= 2
        |       THEN CAST(len(ws.w) - 1 - len(list_distinct(
        |         [array_to_string(ws.w[i:i+1],' ') for i in range(1, len(ws.w))])) AS DOUBLE)
        |         / (len(ws.w) - 1)
        |       ELSE 0.0 END AS d2f,
        |  CASE WHEN len(ws.w) >= 3
        |       THEN CAST(len(ws.w) - 2 - len(list_distinct(
        |         [array_to_string(ws.w[i:i+2],' ') for i in range(1, len(ws.w)-1)])) AS DOUBLE)
        |         / (len(ws.w) - 2)
        |       ELSE 0.0 END AS d3f
        | FROM documents d JOIN ws ON d.doc_id = ws.doc_id),
        |sel AS (SELECT doc_id, lang, n_chars FROM m
        |  WHERE (0.4 * sr + 0.3 * (1.0 - pr) + 0.3 * (least(mwl, 8.0) / 8.0)) >= 0.5
        |    AND NOT (dw > 0.30 OR d2f > 0.20 OR d3f > 0.18)
        |    AND doc_id NOT IN (SELECT doc FROM drops))
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM sel GROUP BY lang""".stripMargin,
    "c7_group_sample" ->
      """WITH t AS (SELECT doc_id, lang,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('gs:' || doc_id), c, 1)) <= 57
        |         THEN ascii(substr(md5('gs:' || doc_id), c, 1)) - 48
        |         ELSE ascii(substr(md5('gs:' || doc_id), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) % 1000000 AS h
        | FROM documents)
        |SELECT doc_id, lang, h FROM (
        |  SELECT doc_id, lang, h,
        |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
        |  FROM t) WHERE rn <= 10""".stripMargin,
    "c6_decontaminate" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
        |cor AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 97 <> 0),
        |ov AS (SELECT doc_id, count(*) AS shared
        |  FROM cor JOIN bench USING(g) GROUP BY 1)
        |SELECT d.doc_id, d.source,
        |  COALESCE(ov.shared, 0) AS n_shared,
        |  COALESCE(ov.shared, 0) >= 3 AS contaminated
        |FROM documents d LEFT JOIN ov ON d.doc_id = ov.doc_id
        |WHERE d.doc_id % 97 <> 0""".stripMargin,
    // c15 is the bloom-prefiltered physical form of c6 — the sketch only
    // prunes, the exact join confirms, so the oracle is the same plain SQL
    "c15_decontaminate_bloom" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
        |cor AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 97 <> 0),
        |ov AS (SELECT doc_id, count(*) AS shared
        |  FROM cor JOIN bench USING(g) GROUP BY 1)
        |SELECT d.doc_id, d.source,
        |  COALESCE(ov.shared, 0) AS n_shared,
        |  COALESCE(ov.shared, 0) >= 3 AS contaminated
        |FROM documents d LEFT JOIN ov ON d.doc_id = ov.doc_id
        |WHERE d.doc_id % 97 <> 0""".stripMargin,
    "c16_shuffle_shard" ->
      """WITH h AS (SELECT doc_id,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('shard:' || doc_id), c, 1)) <= 57
        |         THEN ascii(substr(md5('shard:' || doc_id), c, 1)) - 48
        |         ELSE ascii(substr(md5('shard:' || doc_id), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) AS sh,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('ord:' || doc_id), c, 1)) <= 57
        |         THEN ascii(substr(md5('ord:' || doc_id), c, 1)) - 48
        |         ELSE ascii(substr(md5('ord:' || doc_id), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) AS sort_key
        | FROM documents)
        |SELECT doc_id, sh % 8 AS shard, sort_key FROM h""".stripMargin,
    "c17_dsir_resample" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |h AS (SELECT doc_id, CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('fh:' || tok), c, 1)) <= 57
        |         THEN ascii(substr(md5('fh:' || tok), c, 1)) - 48
        |         ELSE ascii(substr(md5('fh:' || tok), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) % 64 AS bucket,
        |  doc_id % 97 = 0 AS is_t FROM t),
        |tc AS (SELECT bucket, COUNT(*) AS tb FROM h WHERE is_t GROUP BY 1),
        |rc AS (SELECT bucket, COUNT(*) AS rb FROM h WHERE NOT is_t GROUP BY 1),
        |tot AS (SELECT (SELECT COUNT(*) FROM h WHERE is_t) AS tt,
        |               (SELECT COUNT(*) FROM h WHERE NOT is_t) AS rt),
        |lam AS (SELECT rc.bucket,
        |  CAST(round(ln(COALESCE(tc.tb, 0) + 1.0) - ln(tt + 64.0)
        |           - ln(rc.rb + 1.0) + ln(rt + 64.0), 5) AS DECIMAL(18,6)) AS lam
        |  FROM rc LEFT JOIN tc USING(bucket) CROSS JOIN tot),
        |w AS (SELECT h.doc_id, COUNT(*) AS n_tokens, SUM(lam) AS wsum
        |  FROM h JOIN lam USING(bucket) WHERE NOT is_t GROUP BY 1),
        |sel AS (SELECT doc_id FROM w ORDER BY wsum DESC, doc_id LIMIT 100)
        |SELECT w.doc_id, w.n_tokens, CAST(w.wsum AS DOUBLE) AS logratio,
        |  w.doc_id IN (SELECT doc_id FROM sel) AS selected
        |FROM w""".stripMargin,
    "c18_unimax" ->
      """WITH pl AS (SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY 1),
        |c AS (SELECT lang, n_docs, tokens, tokens * 2 AS cap FROM pl),
        |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY cap, lang) AS i,
        |  COALESCE(SUM(cap) OVER (ORDER BY cap, lang
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre,
        |  COUNT(*) OVER () AS nlang FROM c),
        |f AS (SELECT *, cap * (nlang - i + 1) + pre <= 20000 AS capped FROM r),
        |ks AS (SELECT CAST(SUM(CASE WHEN capped THEN 1 ELSE 0 END) AS BIGINT) AS k,
        |  CAST(SUM(CASE WHEN capped THEN cap ELSE 0 END) AS BIGINT) AS s FROM f)
        |SELECT lang, n_docs, tokens, cap,
        |  CASE WHEN capped THEN CAST(cap AS DOUBLE)
        |       ELSE CAST(20000 - ks.s AS DOUBLE) / (nlang - ks.k)
        |  END AS alloc_tokens
        |FROM f CROSS JOIN ks""".stripMargin,
    // c18's schedule divided down to epochs/language, then the repeat
    // explode with the c1-style md5 basis-point gate for the fraction.
    "c19_epoch_expand" ->
      """WITH pl AS (SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY 1),
        |c AS (SELECT lang, n_docs, tokens, tokens * 2 AS cap FROM pl),
        |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY cap, lang) AS i,
        |  COALESCE(SUM(cap) OVER (ORDER BY cap, lang
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre,
        |  COUNT(*) OVER () AS nlang FROM c),
        |f AS (SELECT *, cap * (nlang - i + 1) + pre <= 20000 AS capped FROM r),
        |ks AS (SELECT CAST(SUM(CASE WHEN capped THEN 1 ELSE 0 END) AS BIGINT) AS k,
        |  CAST(SUM(CASE WHEN capped THEN cap ELSE 0 END) AS BIGINT) AS s FROM f),
        |sch AS (SELECT lang,
        |  (CASE WHEN capped THEN CAST(cap AS DOUBLE)
        |        ELSE CAST(20000 - ks.s AS DOUBLE) / (nlang - ks.k)
        |   END) / tokens AS epochs
        |  FROM f CROSS JOIN ks),
        |s2 AS (SELECT lang, CAST(floor(epochs) AS BIGINT) AS full_ep,
        |  CAST(floor((epochs - floor(epochs)) * 10000.0) AS BIGINT) AS rem_bp
        |  FROM sch),
        |dn AS (SELECT doc_id, d.lang,
        |  full_ep + (CASE WHEN
        |    CAST(list_reduce(list_transform(range(1, 8), ch ->
        |      CASE WHEN ascii(substr(md5('ep:' || doc_id), ch, 1)) <= 57
        |           THEN ascii(substr(md5('ep:' || doc_id), ch, 1)) - 48
        |           ELSE ascii(substr(md5('ep:' || doc_id), ch, 1)) - 87 END),
        |      (a, v) -> a * 16 + v) AS BIGINT) % 10000 < rem_bp
        |    THEN 1 ELSE 0 END) AS n_copies
        |  FROM documents d JOIN s2 ON d.lang = s2.lang)
        |SELECT doc_id, lang, UNNEST(range(0, n_copies)) AS epoch
        |FROM dn WHERE n_copies > 0""".stripMargin,
    // x3's composite score, 10 fixed buckets, per-source total variation
    // distance between the even/odd snapshot distributions; bucket gaps
    // decimal-accumulated so the sum is order-independent
    "c20_quality_drift" ->
      """WITH t AS (SELECT doc_id, source, text,
        |    len(string_split(text,' ')) AS n FROM documents),
        |m AS (SELECT doc_id, source,
        |  0.4 * (CAST(len(list_filter(string_split(text,' '),
        |    x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS DOUBLE) / n)
        |  + 0.3 * (1.0 - CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
        |    / greatest(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')), 1))
        |  + 0.3 * (least(CAST(length(text) - (n - 1) AS DOUBLE) / n, 8.0) / 8.0)
        |    AS score
        |  FROM t),
        |b AS (SELECT source, doc_id % 2 AS side,
        |  CAST(least(floor(score * 10), 9.0) AS BIGINT) AS bucket FROM m),
        |c AS (SELECT source, bucket,
        |  CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
        |  CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
        |  FROM b GROUP BY 1, 2),
        |tt AS (SELECT source, CAST(sum(n_old) AS BIGINT) AS t_old,
        |  CAST(sum(n_new) AS BIGINT) AS t_new FROM c GROUP BY 1),
        |agg AS (SELECT c.source,
        |  CAST(max(t_old) AS BIGINT) AS n_old_docs,
        |  CAST(max(t_new) AS BIGINT) AS n_new_docs,
        |  CAST(SUM(CAST(abs(
        |    CASE WHEN t_old > 0 THEN CAST(n_old AS DOUBLE) / t_old ELSE 0.0 END -
        |    CASE WHEN t_new > 0 THEN CAST(n_new AS DOUBLE) / t_new ELSE 0.0 END)
        |    AS DECIMAL(38,6))) AS DOUBLE) / 2 AS tv_distance
        |  FROM c JOIN tt USING (source) GROUP BY c.source)
        |SELECT source, n_old_docs, n_new_docs, tv_distance,
        |  tv_distance > 0.1 AS drifted
        |FROM agg""".stripMargin,
    "c14_semdedup" ->
      """WITH RECURSIVE v AS (SELECT vec_id, label, embedding::DOUBLE[] AS x FROM embeddings),
        |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  list_reduce(list_transform(range(1,65), i -> a.x[i] * b.x[i]), (p,q) -> p + q) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> a.x[i] * a.x[i]), (p,q) -> p + q)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> b.x[i] * b.x[i]), (p,q) -> p + q))) AS cos
        | FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id),
        |e AS (SELECT vec_a AS a, vec_b AS b FROM p WHERE cos >= 0.4),
        |ed AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
        |reach(doc, lab) AS (
        |  SELECT a, a FROM ed
        |  UNION
        |  SELECT ed.a, reach.lab FROM ed JOIN reach ON ed.b = reach.doc),
        |c AS (SELECT doc, min(lab) AS lab FROM reach GROUP BY doc)
        |SELECT d.doc_id, COALESCE(c.lab, d.doc_id) AS cluster_rep,
        |  COALESCE(c.lab, d.doc_id) = d.doc_id AS keep
        |FROM documents d LEFT JOIN c ON c.doc = d.doc_id""".stripMargin,
    // c4's packer with (cell, doc_id) ordering inside each shard; cell =
    // the embedding label, joined on doc_id = vec_id.
    "c21_pack_similar" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('pk:' || doc_id), c, 1)) <= 57
        |         THEN ascii(substr(md5('pk:' || doc_id), c, 1)) - 48
        |         ELSE ascii(substr(md5('pk:' || doc_id), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) % 32 AS shard
        | FROM documents),
        |j AS (SELECT t.doc_id, t.shard, t.n_tokens,
        |    CAST(e.label AS BIGINT) AS cell
        |  FROM t JOIN embeddings e ON e.vec_id = t.doc_id),
        |c AS (SELECT doc_id, shard, cell, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY shard
        |    ORDER BY cell, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum
        | FROM j)
        |SELECT doc_id, shard, cell, n_tokens,
        |  CAST((cum - n_tokens) // 512 AS BIGINT) AS pack_id,
        |  CAST((cum - n_tokens) % 512 AS BIGINT) AS start_offset
        |FROM c""".stripMargin,
    // Neyman allocation: exact decimal power sums → fixed-order double
    // variance, grid-rounded N_h·σ_h weights, largest-remainder
    // integerization (allocations sum exactly to the budget).
    "c22_neyman_alloc" ->
      """WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nh,
        |    SUM(CAST(n_chars AS DECIMAL(38,0))) AS sx,
        |    SUM(CAST(n_chars * n_chars AS DECIMAL(38,0))) AS sx2
        |  FROM documents GROUP BY source),
        |s1 AS (SELECT source, nh,
        |    sqrt(greatest((CAST(sx2 AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / nh) / nh, 0.0))
        |      AS sigma
        |  FROM per),
        |s2 AS (SELECT source, nh AS n_docs, sigma,
        |    CAST(round(nh * sigma * 1.0e9) AS DECIMAL(38,0)) AS g FROM s1),
        |s3 AS (SELECT source, n_docs, sigma,
        |    1000.0 * (CASE WHEN CAST(SUM(g) OVER () AS DOUBLE) > 0
        |      THEN CAST(g AS DOUBLE) / CAST(SUM(g) OVER () AS DOUBLE)
        |      ELSE CAST(n_docs AS DOUBLE)
        |        / CAST(SUM(n_docs) OVER () AS DOUBLE) END) AS raw
        |  FROM s2),
        |s4 AS (SELECT source, n_docs, sigma, floor(raw) AS base,
        |    raw - floor(raw) AS frac FROM s3),
        |s5 AS (SELECT source, n_docs, sigma, base, frac,
        |    1000 - CAST(SUM(base) OVER () AS BIGINT) AS rem,
        |    row_number() OVER (ORDER BY frac DESC, source) AS rn FROM s4)
        |SELECT source, n_docs, sigma,
        |  CAST(base AS BIGINT) +
        |    (CASE WHEN rn <= rem THEN 1 ELSE 0 END) AS alloc
        |FROM s5""".stripMargin,
    // Efraimidis–Spirakis A-ES keys: u from the shared 28-bit fold,
    // ln grid-rounded to 5 decimals (x21 precedent) so the one libm call
    // agrees across engines; everything else is IEEE-exact arithmetic.
    "c23_weighted_sample" ->
      """WITH h AS (SELECT doc_id, n_chars,
        |    md5('ws:' || doc_id) AS hx FROM documents),
        |v AS (SELECT doc_id, n_chars,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(hx, c, 1)) <= 57
        |         THEN ascii(substr(hx, c, 1)) - 48
        |         ELSE ascii(substr(hx, c, 1)) - 87 END),
        |    (a, x) -> a * 16 + x) AS BIGINT) AS hv
        |  FROM h),
        |k AS (SELECT doc_id, n_chars AS weight,
        |  (0.0 - CAST(CAST(round(ln((hv + 1) / 268435456.0), 5)
        |      AS DECIMAL(18,6)) AS DOUBLE)) / n_chars AS skey
        |  FROM v)
        |SELECT doc_id, weight, skey FROM k
        |ORDER BY skey, doc_id LIMIT 100""".stripMargin,
    // c31: two-phase (main/anneal) budgets — c12's quality expression,
    // per-source phase token masses, then TWO c22 largest-remainder
    // apportionments (main 900000, anneal 100000), each summing exactly
    // to its phase budget.
    "c31_anneal_mix" ->
      """WITH t AS (SELECT source, text,
        |    len(string_split(text,' ')) AS n FROM documents),
        |m AS (SELECT source, CAST(n AS BIGINT) AS tok,
        |  0.4 * (CAST(len(list_filter(string_split(text,' '),
        |    x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS DOUBLE) / n)
        |  + 0.3 * (1.0 - CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
        |      / greatest(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')), 1))
        |  + 0.3 * (least(CAST(length(text) - (n - 1) AS DOUBLE) / n, 8.0) / 8.0) AS qs
        | FROM t),
        |per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(CASE WHEN qs >= 0.4 THEN tok ELSE 0 END) AS BIGINT)
        |      AS main_tokens,
        |    CAST(SUM(CASE WHEN qs >= 0.6 THEN tok ELSE 0 END) AS BIGINT)
        |      AS anneal_tokens
        |  FROM m GROUP BY source),
        |a1 AS (SELECT *,
        |    CASE WHEN CAST(SUM(main_tokens) OVER () AS DOUBLE) > 0
        |      THEN CAST(900000 AS DOUBLE) * CAST(main_tokens AS DOUBLE)
        |        / CAST(SUM(main_tokens) OVER () AS DOUBLE)
        |      ELSE CAST(900000 AS DOUBLE) * CAST(n_docs AS DOUBLE)
        |        / CAST(SUM(n_docs) OVER () AS DOUBLE) END AS raw1,
        |    CASE WHEN CAST(SUM(anneal_tokens) OVER () AS DOUBLE) > 0
        |      THEN CAST(100000 AS DOUBLE) * CAST(anneal_tokens AS DOUBLE)
        |        / CAST(SUM(anneal_tokens) OVER () AS DOUBLE)
        |      ELSE CAST(100000 AS DOUBLE) * CAST(n_docs AS DOUBLE)
        |        / CAST(SUM(n_docs) OVER () AS DOUBLE) END AS raw2
        |  FROM per),
        |a2 AS (SELECT *, floor(raw1) AS b1, raw1 - floor(raw1) AS f1,
        |    floor(raw2) AS b2, raw2 - floor(raw2) AS f2 FROM a1),
        |a3 AS (SELECT *,
        |    900000 - CAST(SUM(b1) OVER () AS BIGINT) AS rem1,
        |    row_number() OVER (ORDER BY f1 DESC, source) AS rn1,
        |    100000 - CAST(SUM(b2) OVER () AS BIGINT) AS rem2,
        |    row_number() OVER (ORDER BY f2 DESC, source) AS rn2 FROM a2)
        |SELECT source, n_docs, main_tokens, anneal_tokens,
        |  CAST(b1 AS BIGINT) + (CASE WHEN rn1 <= rem1 THEN 1 ELSE 0 END)
        |    AS main_alloc,
        |  CAST(b2 AS BIGINT) + (CASE WHEN rn2 <= rem2 THEN 1 ELSE 0 END)
        |    AS anneal_alloc
        |FROM a3""".stripMargin,
    // c33: c12's quality expression folded per LANGUAGE — pass rate at
    // the 0.5 floor + the 1e-9-grid exact mean score.
    "c33_gate_fairness" ->
      """WITH t AS (SELECT lang, text,
        |    len(string_split(text,' ')) AS n FROM documents),
        |m AS (SELECT lang,
        |  0.4 * (CAST(len(list_filter(string_split(text,' '),
        |    x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS DOUBLE) / n)
        |  + 0.3 * (1.0 - CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
        |      / greatest(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')), 1))
        |  + 0.3 * (least(CAST(length(text) - (n - 1) AS DOUBLE) / n, 8.0) / 8.0) AS qs
        | FROM t)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN qs >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_pass,
        |  CAST(SUM(CASE WHEN qs >= 0.5 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS pass_rate,
        |  CAST(SUM(CAST(round(qs * 1.0e9) AS DECIMAL(38,0))) AS DOUBLE)
        |    / 1.0e9 / count(*) AS mean_quality
        |FROM m GROUP BY lang""".stripMargin,
  )
}
