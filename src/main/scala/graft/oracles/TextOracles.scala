package graft.oracles

/** DuckDB oracle SQL for the text query family — the
  * literal twins split out of SparkEntry (one object per family;
  * `SparkEntry.oracleSqlBase` unions them). Entry text is
  * byte-identical to the pre-split map: derived oracles anchor on
  * exact substrings of these strings. */
object TextOracles {

  /** Unrolled BPE merge-step CTE chain shared by the x25/x26/x27 oracles:
    * w0 is the char-split word-count table (end-of-word marker appended),
    * then per step i: overlapping adjacent-pair counts (pi), the argmax
    * pair with deterministic tie-break (bi), and the 3-pass space-padded
    * replace rewrite (wi) — the exact arithmetic of
    * `LlmBpe.bpeTrainState`, unrolled because the per-step argmax makes
    * a recursive CTE reference its own table twice. */
  private def bpeCtes(n: Int): String = {
    val steps = (1 to n).map { i =>
      s"""p$i AS (SELECT ss[k] AS lhs, ss[k+1] AS rhs,
         |    CAST(SUM(cnt) AS BIGINT) AS c
         |  FROM (SELECT cnt, string_split(sym,' ') AS ss FROM w${i - 1}) t$i,
         |       UNNEST(range(1, len(ss))) AS u$i(k)
         |  GROUP BY 1, 2),
         |b$i AS (SELECT lhs, rhs, c FROM p$i ORDER BY c DESC, lhs, rhs LIMIT 1),
         |w$i AS (SELECT w, cnt, trim(replace(replace(replace(' '||sym||' ',
         |    ' '||lhs||' '||rhs||' ', ' '||lhs||rhs||' '),
         |    ' '||lhs||' '||rhs||' ', ' '||lhs||rhs||' '),
         |    ' '||lhs||' '||rhs||' ', ' '||lhs||rhs||' ')) AS sym
         |  FROM w${i - 1} CROSS JOIN b$i)""".stripMargin
    }
    s"""WITH w0 AS (
       |  SELECT w, cnt,
       |    trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' </w>' AS sym
       |  FROM (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
       |     SELECT UNNEST(string_split(text, ' ')) AS w FROM documents) q
       |     WHERE len(w) > 0 GROUP BY w) wc
       |),
       |${steps.mkString(",\n")}""".stripMargin
  }

  val sql: Map[String, String] = Map(
    "x1_token_stats" ->
      """SELECT doc_id,
        |  len(string_split(text,' ')) AS n_tokens,
        |  len(list_distinct(string_split(text,' '))) AS n_distinct_tokens,
        |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_bpe_tokens,
        |  CAST(length(text) - (len(string_split(text,' ')) - 1) AS DOUBLE)
        |    / len(string_split(text,' ')) AS avg_token_len
        |FROM documents""".stripMargin,
    "x2_lang_id" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |s AS (SELECT doc_id,
        |  len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS score_en,
        |  len(list_filter(w, x -> list_contains(['le','la','les','de','et','un','une','est'], x))) AS score_fr,
        |  len(list_filter(w, x -> list_contains(['der','die','das','und','ist','ein','eine','von'], x))) AS score_de,
        |  len(list_filter(w, x -> list_contains(['el','los','las','de','y','un','una','es'], x))) AS score_es
        | FROM t)
        |SELECT doc_id, score_en, score_fr, score_de, score_es,
        |  CASE WHEN score_en >= score_fr AND score_en >= score_de AND score_en >= score_es THEN 'en'
        |       WHEN score_fr >= score_de AND score_fr >= score_es THEN 'fr'
        |       WHEN score_de >= score_es THEN 'de'
        |       ELSE 'es' END AS pred_lang
        |FROM s""".stripMargin,
    "x3_quality_score" ->
      """WITH t AS (SELECT doc_id, n_chars, text,
        |    len(string_split(text,' ')) AS n FROM documents),
        |m AS (SELECT doc_id, n_chars, n,
        |  CAST(length(text) - (n - 1) AS DOUBLE) / n AS mwl,
        |  CAST(len(list_filter(string_split(text,' '),
        |    x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS DOUBLE) / n AS sr,
        |  CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
        |    / greatest(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')), 1) AS pr
        | FROM t)
        |SELECT doc_id, n_chars, n AS n_tokens, mwl AS avg_token_len,
        |  sr AS stopword_ratio, pr AS punct_ratio,
        |  0.4 * sr + 0.3 * (1.0 - pr) + 0.3 * (least(mwl, 8.0) / 8.0) AS quality_score,
        |  (0.4 * sr + 0.3 * (1.0 - pr) + 0.3 * (least(mwl, 8.0) / 8.0)) >= 0.5 AS is_quality
        |FROM m""".stripMargin,
    "x4_fingerprint" ->
      """WITH ws AS (SELECT doc_id, text, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id, text,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |h AS (SELECT doc_id, text,
        |  list_sort(list_transform(s, x -> md5('f:' || x))) AS hs FROM sh)
        |SELECT doc_id, md5(text) AS content_md5, hs[1] AS min_shingle_hash,
        |  array_to_string(hs[1:4], '|') AS bottom4_sketch
        |FROM h""".stripMargin,
    "x5_rolling_fingerprint" ->
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
        |  FROM f)
        |SELECT doc_id, len(roll) AS n_windows, list_min(roll) AS min_window_hash,
        |  len(list_distinct(roll)) AS n_distinct_windows
        |FROM r""".stripMargin,
    // Same roll CTE as x5; parallel UNNESTs zip the hash list with its
    // positions, then a doc-keyed running sum assigns chunk ids.
    "x19_cdc_chunks" ->
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
        |e AS (SELECT doc_id, UNNEST(roll) AS h,
        |  UNNEST(range(0, len(roll))) AS pos FROM r),
        |c AS (SELECT doc_id, h,
        |  CAST(SUM(CASE WHEN h % 16 = 0 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS chunk_idx
        | FROM e)
        |SELECT doc_id, chunk_idx, COUNT(*) AS n_windows,
        |  MIN(h) AS chunk_min_hash, CAST(bit_xor(h) AS BIGINT) AS chunk_xor
        |FROM c GROUP BY 1, 2""".stripMargin,
    "x20_lang_ngram_profile" ->
      """WITH ws AS (SELECT lang, string_split(text,' ') AS w FROM documents),
        |bg AS (SELECT lang,
        |  UNNEST(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))
        |    AS bigram
        | FROM ws WHERE len(w) >= 2),
        |c AS (SELECT lang, bigram, COUNT(*) AS cnt FROM bg GROUP BY 1, 2)
        |SELECT lang, bigram, cnt, rank FROM (
        |  SELECT lang, bigram, cnt,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY cnt DESC, bigram) AS INT) AS rank
        |  FROM c) WHERE rank <= 5""".stripMargin,
    // x17's decimal-grid log recipe over the per-doc char histogram.
    "x21_char_entropy" ->
      """WITH ch AS (SELECT doc_id,
        |  UNNEST(list_transform(range(1, length(text) + 1),
        |    i -> substr(text, i, 1))) AS c
        | FROM documents),
        |cnts AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY 1, 2),
        |ag AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_chars,
        |  SUM(cnt * CAST(round(ln(CAST(cnt AS DOUBLE)), 5)
        |    AS DECIMAL(18,6))) AS clog_sum
        | FROM cnts GROUP BY 1)
        |SELECT doc_id, n_chars,
        |  CAST(CAST(round(ln(CAST(n_chars AS DOUBLE)), 5) AS DECIMAL(18,6))
        |    AS DOUBLE) - CAST(clog_sum AS DOUBLE) / n_chars AS entropy_nats
        |FROM ag""".stripMargin,
    // Unigram diversity: ratios are IEEE divisions of exact longs.
    "x22_lexical_diversity" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |c AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(sum(c) AS BIGINT) AS n_tokens,
        |  count(*) AS n_types,
        |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS hapax_types,
        |  CAST(max(c) AS BIGINT) AS max_count,
        |  CAST(count(*) AS DOUBLE) / CAST(sum(c) AS BIGINT) AS ttr,
        |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) AS hapax_frac,
        |  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS BIGINT) AS dominance
        |FROM c GROUP BY doc_id""".stripMargin,
    // x20's profile machinery as a classifier: train/eval split on
    // doc_id % 3, distinct-bigram hits vs each profile, argmax with
    // lexicographic tiebreak, zero-hit docs restored as 'und'.
    "x24_langid_eval" ->
      """WITH ws AS (SELECT doc_id, lang, string_split(text,' ') AS w
        |  FROM documents),
        |bg AS (SELECT doc_id, lang,
        |  UNNEST(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))
        |    AS bigram
        | FROM ws WHERE len(w) >= 2),
        |c AS (SELECT lang AS plang, bigram, count(*) AS cnt FROM bg
        |  WHERE doc_id % 3 <> 0 GROUP BY 1, 2),
        |prof AS (SELECT plang, bigram FROM (
        |  SELECT plang, bigram, row_number() OVER (PARTITION BY plang
        |    ORDER BY cnt DESC, bigram) AS rn FROM c) t WHERE rn <= 16),
        |eb AS (SELECT DISTINCT doc_id, lang, bigram FROM bg
        |  WHERE doc_id % 3 = 0),
        |hits AS (SELECT doc_id, lang, plang, count(*) AS hits
        |  FROM eb JOIN prof ON eb.bigram = prof.bigram GROUP BY 1, 2, 3),
        |best AS (SELECT doc_id, lang, plang FROM (
        |  SELECT doc_id, lang, plang, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY hits DESC, plang) AS rn FROM hits) t WHERE rn = 1),
        |und AS (SELECT d.doc_id, d.lang, 'und' AS plang FROM documents d
        |  WHERE d.doc_id % 3 = 0
        |    AND d.doc_id NOT IN (SELECT doc_id FROM best))
        |SELECT lang, plang AS pred_lang, count(*) AS n_docs
        |FROM (SELECT * FROM best UNION ALL SELECT * FROM und) u
        |GROUP BY 1, 2""".stripMargin,
    // BPE tokenizer family: the unrolled merge-step CTE chain (bpeCtes)
    // mirrors LlmBpe.bpeTrainState step for step — overlapping pair
    // counts, argmax with (count desc, lhs, rhs) tie-break, 3-pass
    // space-padded replace rewrite (Spark UTF8String.replace and DuckDB
    // replace share left-to-right non-overlapping scan semantics).
    "x25_bpe_train" ->
      (bpeCtes(6) + "\n" +
        (1 to 6).map(i =>
            s"SELECT CAST($i AS INT) AS step, lhs, rhs, c AS pair_count FROM b$i")
          .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY step")),
    "x26_bpe_vocab" ->
      (bpeCtes(6) +
        """
          |SELECT ss[k] AS token, CAST(SUM(cnt) AS BIGINT) AS freq
          |FROM (SELECT cnt, string_split(sym,' ') AS ss FROM w6) tf,
          |     UNNEST(range(1, len(ss) + 1)) AS uf(k)
          |GROUP BY 1""".stripMargin),
    "x27_bpe_doc_stats" ->
      (bpeCtes(6) +
        """,
          |dict AS (SELECT w, CAST(len(string_split(sym,' ')) AS BIGINT)
          |    AS ntok FROM w6),
          |dw AS (SELECT doc_id, n_chars, UNNEST(string_split(text,' ')) AS w
          |  FROM documents)
          |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
          |  CAST(SUM(ntok) AS BIGINT) AS n_tokens, n_chars,
          |  CAST(n_chars AS DOUBLE) / CAST(SUM(ntok) AS BIGINT)
          |    AS chars_per_token
          |FROM dw JOIN dict USING (w)
          |WHERE len(w) > 0
          |GROUP BY doc_id, n_chars""".stripMargin),
    // KL(source‖corpus) with x17's decimal-grid log terms; only the final
    // three-term combination runs in double, left-to-right.
    "x23_source_divergence" ->
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |sw AS (SELECT source, tok, count(*) AS csw FROM t GROUP BY 1, 2),
        |w AS (SELECT tok, count(*) AS cw FROM t GROUP BY 1),
        |n AS (SELECT count(*) AS nn FROM t),
        |j AS (SELECT source, csw,
        |    csw * (CAST(round(ln(CAST(csw AS DOUBLE)), 5) AS DECIMAL(18,6))
        |         - CAST(round(ln(CAST(cw AS DOUBLE)), 5) AS DECIMAL(18,6)))
        |      AS term
        |  FROM sw JOIN w ON sw.tok = w.tok),
        |g AS (SELECT source, CAST(SUM(csw) AS BIGINT) AS n_tokens,
        |    count(*) AS n_types, SUM(term) AS term_sum
        |  FROM j GROUP BY source)
        |SELECT source, n_tokens, n_types,
        |  CAST(term_sum AS DOUBLE) / n_tokens
        |    - CAST(CAST(round(ln(CAST(n_tokens AS DOUBLE)), 5)
        |        AS DECIMAL(18,6)) AS DOUBLE)
        |    + CAST(CAST(round(ln(CAST(nn AS DOUBLE)), 5)
        |        AS DECIMAL(18,6)) AS DOUBLE) AS kl_nats
        |FROM g CROSS JOIN n""".stripMargin,
    // PMI as a pure decimal-grid sum of six L(count) terms in the same
    // association order as the Column expression; ties broken (w1, w2).
    "x29_pmi_collocations" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |uni AS (SELECT tok, count(*) AS cw FROM t GROUP BY tok),
        |n AS (SELECT count(*) AS n_total FROM t),
        |ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |bg AS (SELECT doc_id,
        |    unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS bigram
        |  FROM ws WHERE len(w) >= 2),
        |bi AS (SELECT bigram, count(*) AS cab FROM bg GROUP BY bigram
        |  HAVING count(*) >= 5),
        |b AS (SELECT count(*) AS b_total FROM bg),
        |j AS (SELECT
        |    split_part(bigram, ' ', 1) AS w1,
        |    split_part(bigram, ' ', 2) AS w2,
        |    cab FROM bi),
        |s AS (SELECT j.w1, j.w2, j.cab, a.cw AS ca, c.cw AS cb,
        |    n.n_total, b.b_total
        |  FROM j JOIN uni a ON a.tok = j.w1 JOIN uni c ON c.tok = j.w2
        |  CROSS JOIN n CROSS JOIN b),
        |p AS (SELECT w1, w2, cab, ca, cb, CAST(
        |    CAST(round(ln(CAST(cab AS DOUBLE)), 5) AS DECIMAL(18,6))
        |    - CAST(round(ln(CAST(b_total AS DOUBLE)), 5) AS DECIMAL(18,6))
        |    - CAST(round(ln(CAST(ca AS DOUBLE)), 5) AS DECIMAL(18,6))
        |    + CAST(round(ln(CAST(n_total AS DOUBLE)), 5) AS DECIMAL(18,6))
        |    - CAST(round(ln(CAST(cb AS DOUBLE)), 5) AS DECIMAL(18,6))
        |    + CAST(round(ln(CAST(n_total AS DOUBLE)), 5) AS DECIMAL(18,6))
        |  AS DOUBLE) AS pmi FROM s)
        |SELECT w1, w2, cab, ca, cb, pmi FROM p
        |ORDER BY pmi DESC, w1, w2 LIMIT 50""".stripMargin,
    // x34: Flesch reading ease — pure IEEE ±·/ in the same left-assoc
    // expression tree on both engines; decimal literals cast to DOUBLE
    // (DuckDB parses bare 206.835 as DECIMAL).
    "x35_charclass_profile" ->
      """WITH p AS (SELECT source,
        |  CAST(length(text) AS BIGINT) AS n,
        |  CAST(length(text) - length(regexp_replace(text, '[a-z]', '', 'g'))
        |    AS BIGINT) AS lo,
        |  CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
        |    AS BIGINT) AS up,
        |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
        |    AS BIGINT) AS di,
        |  CAST(length(text) - length(regexp_replace(text, ' ', '', 'g'))
        |    AS BIGINT) AS sp,
        |  CAST(length(text) - length(regexp_replace(text, '[\x00-\x1f]', '', 'g'))
        |    AS BIGINT) AS ctl,
        |  CAST(length(text) - length(regexp_replace(text, '\x{FFFD}', '', 'g'))
        |    AS BIGINT) AS rep
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n) AS BIGINT) AS n_chars,
        |  CAST(sum(lo) AS BIGINT) AS n_lower,
        |  CAST(sum(up) AS BIGINT) AS n_upper,
        |  CAST(sum(di) AS BIGINT) AS n_digit,
        |  CAST(sum(sp) AS BIGINT) AS n_space,
        |  CAST(sum(ctl) AS BIGINT) AS n_control,
        |  CAST(sum(rep) AS BIGINT) AS n_replacement,
        |  CAST(CAST(sum(lo) AS BIGINT) AS DOUBLE)
        |    / CAST(sum(n) AS BIGINT) AS lower_frac,
        |  CAST(CAST(sum(sp) AS BIGINT) AS DOUBLE)
        |    / CAST(sum(n) AS BIGINT) AS space_frac,
        |  CAST(sum(ctl) AS BIGINT) + CAST(sum(rep) AS BIGINT) > 0
        |    AS encoding_suspect
        |FROM p GROUP BY source""".stripMargin,
    "x36_vocab_coverage" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |c AS (SELECT tok, count(*) AS cnt FROM t
        |  WHERE length(tok) > 0 GROUP BY tok),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_tokens FROM c),
        |top AS (SELECT cnt,
        |    row_number() OVER (ORDER BY cnt DESC, tok) AS rank
        |  FROM c ORDER BY cnt DESC, tok LIMIT 10000),
        |n AS (SELECT unnest([100, 1000, 10000]) AS n_vocab)
        |SELECT CAST(n.n_vocab AS INT) AS n_vocab,
        |  CAST(sum(top.cnt) AS BIGINT) AS covered_tokens,
        |  tot.total_tokens,
        |  CAST(CAST(sum(top.cnt) AS BIGINT) AS DOUBLE) / tot.total_tokens
        |    AS coverage
        |FROM n JOIN top ON top.rank <= n.n_vocab CROSS JOIN tot
        |GROUP BY n.n_vocab, tot.total_tokens""".stripMargin,
    "x34_readability" ->
      """WITH ws AS (SELECT doc_id, text, string_split(text, ' ') AS w
        |  FROM documents),
        |m AS (SELECT doc_id,
        |  len(w) AS n_words,
        |  greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
        |    AS n_sentences,
        |  list_sum(list_transform(w, x ->
        |    greatest(len(regexp_extract_all(lower(x), '[aeiouy]+')), 1)))
        |    AS n_syllables
        |  FROM ws)
        |SELECT doc_id,
        |  CAST(n_words AS BIGINT) AS n_words,
        |  CAST(n_sentences AS BIGINT) AS n_sentences,
        |  CAST(n_syllables AS BIGINT) AS n_syllables,
        |  CAST(206.835 AS DOUBLE)
        |    - CAST(1.015 AS DOUBLE)
        |      * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |    - CAST(84.6 AS DOUBLE)
        |      * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
        |    AS flesch
        |FROM m""".stripMargin,
    "x33_quality_quantiles" ->
      """WITH t AS (SELECT doc_id, source, text,
        |    len(string_split(text,' ')) AS n FROM documents),
        |m AS (SELECT doc_id, source,
        |  0.4 * (CAST(len(list_filter(string_split(text,' '),
        |    x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS DOUBLE) / n)
        |  + 0.3 * (1.0 - CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
        |      / greatest(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')), 1))
        |  + 0.3 * (least(CAST(length(text) - (n - 1) AS DOUBLE) / n, 8.0) / 8.0) AS qs
        | FROM t),
        |c AS (SELECT source, count(*) AS n FROM m GROUP BY 1),
        |tg AS (SELECT source, p, CAST(ceil(p * n) AS BIGINT) AS rnk
        |  FROM c CROSS JOIN (SELECT UNNEST([0.25, 0.5, 0.75]) AS p)),
        |r AS (SELECT source, qs, row_number() OVER (PARTITION BY source
        |    ORDER BY qs, doc_id) AS rnk FROM m)
        |SELECT r.source, p, r.qs AS q_value
        |FROM r JOIN tg ON tg.source = r.source AND tg.rnk = r.rnk""".stripMargin,
    "x30_novelty" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |tok AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |intro AS (SELECT g, min(doc_id) AS introducer FROM tok GROUP BY g),
        |per AS (SELECT t.doc_id,
        |    CAST(count(*) AS BIGINT) AS n_shingles,
        |    CAST(SUM(CASE WHEN i.introducer = t.doc_id
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        |  FROM tok t JOIN intro i ON i.g = t.g GROUP BY t.doc_id)
        |SELECT doc_id, n_shingles, n_novel,
        |  CAST(n_novel AS DOUBLE) / n_shingles AS novelty
        |FROM per""".stripMargin,
    "x32_code_switch" ->
      """WITH ws AS (SELECT doc_id, lang, string_split(text,' ') AS w
        |  FROM documents),
        |bg AS (SELECT doc_id, lang,
        |  UNNEST(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))
        |    AS bigram
        | FROM ws WHERE len(w) >= 2),
        |c AS (SELECT lang AS plang, bigram, count(*) AS cnt FROM bg
        |  GROUP BY 1, 2),
        |prof AS (SELECT plang, bigram FROM (
        |  SELECT plang, bigram, row_number() OVER (PARTITION BY plang
        |    ORDER BY cnt DESC, bigram) AS rn FROM c) t WHERE rn <= 16),
        |hv AS (SELECT doc_id, 0 AS half, w[1:len(w)//2] AS hw FROM ws
        |  UNION ALL
        |  SELECT doc_id, 1, w[len(w)//2+1:len(w)] FROM ws),
        |hb AS (SELECT DISTINCT doc_id, half, bigram FROM (
        |  SELECT doc_id, half,
        |    UNNEST(list_transform(range(1, len(hw)),
        |      i -> hw[i] || ' ' || hw[i+1])) AS bigram
        |  FROM hv WHERE len(hw) >= 2) q),
        |hits AS (SELECT doc_id, half, plang, count(*) AS hits
        |  FROM hb JOIN prof ON hb.bigram = prof.bigram GROUP BY 1, 2, 3),
        |best AS (SELECT doc_id, half, plang FROM (
        |  SELECT doc_id, half, plang, row_number() OVER (
        |    PARTITION BY doc_id, half ORDER BY hits DESC, plang) AS rn
        |  FROM hits) t WHERE rn = 1),
        |f AS (SELECT doc_id, plang AS lang_front FROM best WHERE half = 0),
        |b AS (SELECT doc_id, plang AS lang_back FROM best WHERE half = 1)
        |SELECT d.doc_id, d.lang,
        |  COALESCE(f.lang_front, 'und') AS lang_front,
        |  COALESCE(b.lang_back, 'und') AS lang_back,
        |  (COALESCE(f.lang_front, 'und') <> 'und'
        |   AND COALESCE(b.lang_back, 'und') <> 'und'
        |   AND COALESCE(f.lang_front, 'und') <> COALESCE(b.lang_back, 'und'))
        |    AS switched
        |FROM documents d LEFT JOIN f ON f.doc_id = d.doc_id
        |  LEFT JOIN b ON b.doc_id = d.doc_id""".stripMargin,
    "x31_vocab_growth" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id, w FROM t WHERE length(w) > 0),
        |tm AS (SELECT doc_id // 100 AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_tokens
        |  FROM tf GROUP BY 1),
        |nt AS (SELECT first_doc // 100 AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_new_types
        |  FROM (SELECT w, min(doc_id) AS first_doc FROM tf GROUP BY w)
        |  GROUP BY 1),
        |j AS (SELECT COALESCE(tm.bucket, nt.bucket) AS bucket,
        |    COALESCE(tm.n_tokens, 0) AS n_tokens,
        |    COALESCE(nt.n_new_types, 0) AS n_new_types
        |  FROM tm FULL OUTER JOIN nt ON tm.bucket = nt.bucket)
        |SELECT bucket, n_tokens, n_new_types,
        |  CAST(sum(n_tokens) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_tokens,
        |  CAST(sum(n_new_types) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_types
        |FROM j""".stripMargin,
    "x6_text_clean" ->
      """SELECT doc_id,
        |  trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |    ' +', ' ', 'g')) AS clean_text,
        |  length(text) AS len_raw,
        |  length(trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |    ' +', ' ', 'g'))) AS len_clean,
        |  CAST(length(trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |    ' +', ' ', 'g'))) AS DOUBLE) / length(text) AS retained_ratio
        |FROM documents""".stripMargin,
    "x7_tfidf" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (SELECT doc_id, tf.term, tf.tf, df.df,
        |  tf.tf * (CAST(n_docs AS DOUBLE) / df.df) AS tfidf
        |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
        |SELECT doc_id, term, tf, df, tfidf, rank FROM (
        |  SELECT doc_id, term, tf, df, tfidf,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
        |  FROM scored) WHERE rank <= 3""".stripMargin,
    "x8_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |g AS (SELECT doc_id, w,
        |  [array_to_string(w[i:i+1],' ') for i in range(1, len(w))] AS g2,
        |  [array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)] AS g3
        | FROM t),
        |m AS (SELECT doc_id, len(w) AS n_words,
        |  CASE WHEN len(w) > 0
        |       THEN CAST(len(w) - len(list_distinct(w)) AS DOUBLE) / len(w)
        |       ELSE 0.0 END AS dup_word_frac,
        |  CASE WHEN len(g2) > 0
        |       THEN CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2)
        |       ELSE 0.0 END AS dup_bigram_frac,
        |  CASE WHEN len(g3) > 0
        |       THEN CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3)
        |       ELSE 0.0 END AS dup_trigram_frac
        | FROM g)
        |SELECT doc_id, n_words, dup_word_frac, dup_bigram_frac, dup_trigram_frac,
        |  (dup_word_frac > 0.30 OR dup_bigram_frac > 0.20
        |    OR dup_trigram_frac > 0.18) AS is_repetitive
        |FROM m""".stripMargin,
    "x9_vocab_oov" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents),
        |cnt AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
        |vocab AS (SELECT term FROM cnt ORDER BY cnt DESC, term LIMIT 16),
        |iv AS (SELECT doc_id, count(*) AS n_in FROM toks JOIN vocab USING(term) GROUP BY 1),
        |t AS (SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens FROM documents)
        |SELECT t.doc_id, n_tokens,
        |  n_tokens - COALESCE(n_in, 0) AS n_oov,
        |  CAST(n_tokens - COALESCE(n_in, 0) AS DOUBLE) / n_tokens AS oov_rate
        |FROM t LEFT JOIN iv ON t.doc_id = iv.doc_id""".stripMargin,
    "x10_bm25" ->
      """WITH n AS (SELECT count(*) AS n_docs,
        |  CAST(SUM(CAST(len(string_split(text,' ')) AS DECIMAL(38,6))) AS DOUBLE)
        |    / count(*) AS avgdl FROM documents),
        |t AS (SELECT doc_id, len(string_split(text,' ')) AS dl,
        |  unnest(string_split(text,' ')) AS term FROM documents),
        |q AS (SELECT doc_id, term, count(*) AS tf, max(dl) AS dl FROM t
        |  WHERE term IN ('data', 'query', 'fast') GROUP BY 1, 2),
        |d AS (SELECT term, count(*) AS df FROM q GROUP BY 1),
        |s AS (SELECT doc_id, q.term,
        |  (CAST(n_docs AS DOUBLE) / df) * (tf * CAST(2.2 AS DOUBLE))
        |    / (tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
        |         + CAST(0.75 AS DOUBLE) * dl / avgdl)) AS s
        |  FROM q JOIN d ON q.term = d.term CROSS JOIN n),
        |p AS (SELECT doc_id,
        |  COALESCE(max(CASE WHEN term = 'data' THEN s END), 0.0)
        |  + COALESCE(max(CASE WHEN term = 'query' THEN s END), 0.0)
        |  + COALESCE(max(CASE WHEN term = 'fast' THEN s END), 0.0) AS score
        | FROM s GROUP BY doc_id)
        |SELECT doc_id, score FROM p
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "x17_bigram_lm" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |b AS (SELECT doc_id,
        |  unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram
        |  FROM t WHERE len(w) >= 2),
        |cb AS (SELECT bigram, count(*) AS cb FROM b GROUP BY 1),
        |cw AS (SELECT split_part(bigram,' ',1) AS w1, count(*) AS cw FROM b GROUP BY 1),
        |v AS (SELECT count(*) AS vsz FROM cw),
        |lp AS (SELECT doc_id,
        |  CAST(round(ln((cb + CAST(1 AS DOUBLE)) / CAST(cw + vsz AS DOUBLE)), 5)
        |    AS DECIMAL(18,6)) AS lp
        |  FROM b JOIN cb USING (bigram)
        |  JOIN cw ON split_part(b.bigram,' ',1) = cw.w1 CROSS JOIN v)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(sum(lp) AS DOUBLE) / count(*) AS avg_logprob
        |FROM lp GROUP BY doc_id""".stripMargin,
    // x37: x17's recipe with counts trained on the doc_id % 10 <> 0
    // reference split only; unseen events stay inside add-1 smoothing
    // (LEFT JOIN + COALESCE 0 before the arithmetic).
    "x37_lm_vs_ref" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |b AS (SELECT doc_id,
        |  unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram
        |  FROM t WHERE len(w) >= 2),
        |rb AS (SELECT * FROM b WHERE doc_id % 10 <> 0),
        |cb AS (SELECT bigram, count(*) AS cb FROM rb GROUP BY 1),
        |cw AS (SELECT split_part(bigram,' ',1) AS w1, count(*) AS cw FROM rb GROUP BY 1),
        |v AS (SELECT count(*) AS vsz FROM cw),
        |lp AS (SELECT b.doc_id,
        |  CAST(round(ln((COALESCE(cb.cb, 0) + CAST(1 AS DOUBLE))
        |    / CAST(COALESCE(cw.cw, 0) + vsz AS DOUBLE)), 5)
        |    AS DECIMAL(18,6)) AS lp
        |  FROM b LEFT JOIN cb USING (bigram)
        |  LEFT JOIN cw ON split_part(b.bigram,' ',1) = cw.w1 CROSS JOIN v)
        |SELECT doc_id, doc_id % 10 <> 0 AS in_ref, count(*) AS n_bigrams,
        |  CAST(sum(lp) AS DOUBLE) / count(*) AS avg_logprob
        |FROM lp GROUP BY doc_id""".stripMargin,
    "x18_gopher_rules" ->
      """WITH t AS (SELECT doc_id, text, string_split(text,' ') AS w FROM documents),
        |m AS (SELECT doc_id,
        |  len(w) AS n_words,
        |  CAST(length(text) - (len(w) - 1) AS DOUBLE) / len(w) AS mean_word_len,
        |  CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE) / len(w) AS symbol_ratio,
        |  CAST(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE) / len(w) AS alpha_frac,
        |  CAST(1 AS DOUBLE) - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS dup_frac,
        |  len(list_intersect(list_distinct(w),
        |    ['the','a','of','and','to','in','is','that'])) AS n_stopwords
        | FROM t)
        |SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac,
        |  dup_frac, n_stopwords,
        |  n_words >= 20 AND n_words <= 80 AS rule_word_count,
        |  mean_word_len >= 4.0 AND mean_word_len <= 5.0 AS rule_word_len,
        |  symbol_ratio <= 0.1 AS rule_symbol_ratio,
        |  alpha_frac >= 0.8 AS rule_alpha_frac,
        |  dup_frac <= 0.5 AS rule_dup_frac,
        |  n_stopwords >= 2 AS rule_stopwords,
        |  n_words >= 20 AND n_words <= 80
        |    AND mean_word_len >= 4.0 AND mean_word_len <= 5.0
        |    AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8
        |    AND dup_frac <= 0.5 AND n_stopwords >= 2 AS pass
        |FROM m""".stripMargin,
    "x11_pii_redact" ->
      """WITH p AS (SELECT doc_id,
        |  text || ' contact user' || doc_id || '@mail.example.com'
        |    || ' backup admin@corp' || (doc_id % 7) || '.org'
        |    || ' from 10.' || (doc_id % 200) || '.0.' || (doc_id % 256)
        |    || ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        | FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(t, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ips,
        |  len(regexp_extract_all(t, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS n_phones,
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted_text
        |FROM p""".stripMargin,
    "x12_line_filter" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |l AS (SELECT doc_id,
        |  [w[i:i+7] for i in range(1, len(w)+1, 8)] AS lines FROM t),
        |k AS (SELECT doc_id, lines,
        |  list_filter(lines, x -> len(x) >= 5
        |    AND len(list_filter(x, y -> length(y) >= 4)) > 0) AS kept
        | FROM l)
        |SELECT doc_id, len(lines) AS n_lines, len(kept) AS n_kept,
        |  CAST(len(kept) AS DOUBLE) / len(lines) AS kept_ratio,
        |  array_to_string(list_transform(kept, x -> array_to_string(x, ' ')),
        |    ' | ') AS kept_text
        |FROM k""".stripMargin,
    "x13_char_diversity" ->
      """WITH c AS (SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS ch
        |  FROM documents),
        |g AS (SELECT doc_id, ch, count(*) AS cnt FROM c GROUP BY 1, 2),
        |a AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n,
        |  count(*) AS n_distinct_chars,
        |  CAST(sum(cnt * cnt) AS BIGINT) AS s2, max(cnt) AS mx
        | FROM g GROUP BY doc_id)
        |SELECT doc_id, n AS n_chars_counted, n_distinct_chars,
        |  CAST(s2 AS DOUBLE) / (n * n) AS collision_prob,
        |  CAST(mx AS DOUBLE) / n AS max_char_frac
        |FROM a""".stripMargin,
    "x14_url_normalize" ->
      """WITH p AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'http://' END)
        |  || source || '.Example.COM'
        |  || (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END)
        |  || '/p/' || (doc_id % 7)
        |  || '?utm_source=feed&id=' || (doc_id % 13)
        |  || (CASE WHEN doc_id % 3 = 0 THEN '&utm_campaign=x' ELSE '' END)
        |  || '#sec' AS url
        | FROM documents),
        |n AS (SELECT doc_id, url,
        |  lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
        |  regexp_replace(lower(regexp_replace(
        |    regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1),
        |    ':[0-9]+$', '')), '^www\.', '') AS host,
        |  regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path,
        |  array_to_string(list_filter(
        |    string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
        |    q -> NOT starts_with(q, 'utm_')), '&') AS nq
        | FROM p),
        |h AS (SELECT doc_id, url, scheme, host, path, nq,
        |  string_split(host, '.') AS hp FROM n)
        |SELECT doc_id, url, scheme, host,
        |  array_to_string(hp[-2:], '.') AS registered_domain,
        |  scheme || '://' || host || path
        |    || (CASE WHEN nq = '' THEN '' ELSE '?' || nq END) AS norm_url
        |FROM h""".stripMargin,
    "x16_token_zipf" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |c AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
        |top AS (SELECT tok, cnt,
        |    row_number() OVER (ORDER BY cnt DESC, tok) AS rank
        |  FROM c ORDER BY cnt DESC, tok LIMIT 100)
        |SELECT rank, tok, cnt,
        |  CAST(sum(cnt) OVER w AS BIGINT) AS cum_cnt,
        |  CAST(CAST(sum(cnt) OVER w AS BIGINT) AS DOUBLE) / total AS cum_share
        |FROM top, tot
        |WINDOW w AS (ORDER BY rank ROWS UNBOUNDED PRECEDING)""".stripMargin,
    "x15_feature_hash" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |h AS (SELECT doc_id, CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('fh:' || tok), c, 1)) <= 57
        |         THEN ascii(substr(md5('fh:' || tok), c, 1)) - 48
        |         ELSE ascii(substr(md5('fh:' || tok), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) % 64 AS bucket FROM t)
        |SELECT doc_id, bucket, COUNT(*) AS tf
        |FROM h GROUP BY doc_id, bucket""".stripMargin,
    // x40: per-source hapax-legomena report. A hapax (corpus frequency
    // exactly 1) lives in exactly one source, so the per-source hapax
    // counts partition the corpus-wide hapax set. Integers until the
    // final share division.
    "x40_hapax" ->
      """WITH toks AS (SELECT source,
        |  unnest(string_split(text, ' ')) AS term FROM documents),
        |cf AS (SELECT term, count(*) AS cf FROM toks GROUP BY 1),
        |st AS (SELECT source, term, count(*) AS n
        |  FROM toks GROUP BY 1, 2)
        |SELECT st.source, CAST(SUM(st.n) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_types,
        |  CAST(SUM(CASE WHEN cf.cf = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hapax,
        |  CAST(SUM(CASE WHEN cf.cf = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) AS hapax_share
        |FROM st JOIN cf ON cf.term = st.term GROUP BY 1""".stripMargin,
    // x41: d11's distinct-per-doc shingle chain, a per-shingle doc
    // count, and the per-source duplicate-mass fold (integers until the
    // final share).
    "x41_crossdoc_ngrams" ->
      """WITH ws AS (SELECT doc_id, source, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id, source,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |u AS (SELECT doc_id, source, unnest(s) AS sh FROM sh),
        |c AS (SELECT sh, count(*) AS nd FROM u GROUP BY sh),
        |j AS (SELECT u.doc_id, u.source, c.nd FROM u JOIN c ON u.sh = c.sh),
        |agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_shingles,
        |    CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_dup_shingles,
        |    CAST(count(DISTINCT CASE WHEN nd > 1 THEN doc_id END) AS BIGINT)
        |      AS n_docs_affected
        |  FROM j GROUP BY source),
        |nd2 AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY source)
        |SELECT nd2.source, n_docs,
        |  COALESCE(n_shingles, 0) AS n_shingles,
        |  COALESCE(n_dup_shingles, 0) AS n_dup_shingles,
        |  COALESCE(n_docs_affected, 0) AS n_docs_affected,
        |  CASE WHEN COALESCE(n_shingles, 0) > 0
        |    THEN CAST(n_dup_shingles AS DOUBLE) / CAST(n_shingles AS DOUBLE)
        |    ELSE CAST(0.0 AS DOUBLE) END AS dup_frac
        |FROM nd2 LEFT JOIN agg ON nd2.source = agg.source""".stripMargin,
  )
}
