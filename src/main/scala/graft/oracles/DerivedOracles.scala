package graft.oracles

/** String-derived oracle twins — each function rewrites a BASE oracle's
  * SQL (from the per-family objects in this package) into a derived
  * query's twin, anchored on `require`d exact substrings so an edit to
  * the base SQL fails loudly instead of silently detaching the
  * derivation (the house derived-oracle discipline; see SparkEntry's
  * oracleSql composition). Split out of SparkEntry.scala in round 12 to
  * keep every main file under 1,500 lines — text is byte-identical to
  * the pre-split functions. */
object DerivedOracles {


  /** Derive the d38 oracle from d2's: keep the shingle/minhash/band
    * chain byte-identical up to the hot-key cap, run it TWICE — once
    * verbatim (today's full corpus) and once as a whole-word-renamed
    * copy whose base table carries yesterday's split filter (the d13/
    * d20 convention) — then count per-(band, bkey) bucket populations
    * on each side and fold the full outer join into the bucket-class
    * report. The rename also renames the `band` COLUMN alias inside
    * the copy (whole-word), so the stored side re-aliases `band2 AS
    * band` when selecting. The cap CTE is NOT reused: the report
    * counts distinct buckets, which is linear without any cap. */
  private[graft] def dirtyBucketsOracle(d2: String): String = {
    val cut = "bandk AS"
    val fromAnchor = "FROM documents"
    require(d2.startsWith("WITH ") && d2.contains(cut) &&
      d2.contains(fromAnchor), "d2 oracle SQL lost the d38 anchors")
    val prefix = d2.substring(0, d2.indexOf(cut))
    val chain = prefix.stripPrefix("WITH ")
      .reverse.dropWhile(c => c == ',' || c == '\n').reverse
    val renamed = Seq("ws", "sh", "tok", "hx", "base", "mh", "band")
      .foldLeft(chain) { (sql, cte) =>
        sql.replaceAll("\\b" + cte + "\\b", cte + "2")
      }
      .replace(fromAnchor, fromAnchor + " WHERE doc_id % 10 <> 0")
    "WITH " + chain + ",\n" + renamed + ",\n" +
      """fk AS (SELECT band, bkey, count(*) AS cf FROM band GROUP BY 1, 2),
        |sk AS (SELECT band2 AS band, bkey, count(*) AS cs
        |  FROM band2 GROUP BY 1, 2),
        |ch AS (SELECT fk.cf, sk.cs FROM fk FULL OUTER JOIN sk
        |  ON sk.band = fk.band AND sk.bkey = fk.bkey)
        |SELECT CAST(count(*) AS BIGINT) AS n_buckets,
        |  CAST(SUM(CASE WHEN cf = cs THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unchanged,
        |  CAST(SUM(CASE WHEN cs IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_new,
        |  CAST(SUM(CASE WHEN cf > cs THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_grown,
        |  CAST(SUM(CASE WHEN cf < cs THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_shrunk,
        |  CAST(SUM(CASE WHEN cf IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_removed,
        |  CAST(count(*) - SUM(CASE WHEN cf = cs THEN 1 ELSE 0 END)
        |      AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS dirty_frac
        |FROM ch GROUP BY (1=1)""".stripMargin
  }

  /** Derive the c30 oracle from d8's: keep the LSH/CC keeper chain
    * byte-identical and swap the kept-count tail for the per-source
    * token-budget fold — raw vs kept docs AND tokens (len of the space
    * split, the corpus's token yardstick) with the kept-token fraction.
    * Exact integers until the one final double division. */
  private[graft] def dedupBudgetOracle(d8: String): String = {
    val anchor = "SELECT d.source, count(*) AS n_docs_kept\n" +
      "FROM documents d LEFT JOIN drops ON d.doc_id = drops.doc\n" +
      "WHERE drops.doc IS NULL\n" +
      "GROUP BY d.source"
    require(d8.endsWith(anchor), "d8 oracle SQL lost the c30 anchor")
    d8.dropRight(anchor.length) +
      """SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN drops.doc IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_kept,
        |  CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN drops.doc IS NULL
        |    THEN len(string_split(d.text, ' ')) ELSE 0 END) AS BIGINT)
        |    AS n_tokens_kept,
        |  CAST(SUM(CASE WHEN drops.doc IS NULL
        |      THEN len(string_split(d.text, ' ')) ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(len(string_split(d.text, ' '))) AS DOUBLE)
        |    AS token_frac
        |FROM documents d LEFT JOIN drops ON d.doc_id = drops.doc
        |GROUP BY d.source""".stripMargin
  }

  /** Derive the d40 oracle from d39's: keep the boundary-candidate/
    * verify chain byte-identical, turn its final per-pair report into a
    * pairs CTE, then run the d8 reach-style recursive CC and fold the
    * membership into per-chain fragment/token stats. */
  /** Derive the d41 oracle from d39's: the verified-stitch chain
    * byte-identical, then one histogram fold with the at_cap flag at the
    * engine's ChainMaxOverlap bound. */
  private[graft] def chainSaturationOracle(d39: String): String = {
    val anchor = "SELECT doc_a, doc_b, CAST(max(l) AS BIGINT) AS overlap_len\n" +
      "FROM ol GROUP BY 1, 2 HAVING max(l) >= 3"
    require(d39.startsWith("WITH t AS") && d39.endsWith(anchor),
      "d39 oracle SQL lost the d41 anchors")
    d39.dropRight(anchor.length).reverse.dropWhile(_ == '\n').reverse +
      ",\nst AS (" + anchor + ")\n" +
      s"""SELECT overlap_len, CAST(count(*) AS BIGINT) AS n_pairs,
         |  overlap_len = ${graft.operators.DedupSources.ChainMaxOverlap}
         |    AS at_cap
         |FROM st GROUP BY 1""".stripMargin
  }

  private[graft] def chainGroupsOracle(d39: String): String = {
    val anchor = "SELECT doc_a, doc_b, CAST(max(l) AS BIGINT) AS overlap_len\n" +
      "FROM ol GROUP BY 1, 2 HAVING max(l) >= 3"
    require(d39.startsWith("WITH t AS") && d39.endsWith(anchor),
      "d39 oracle SQL lost the d40 anchors")
    "WITH RECURSIVE " + d39.stripPrefix("WITH ").dropRight(anchor.length)
      .reverse.dropWhile(c => c == '\n').reverse + ",\n" +
      """p AS (SELECT doc_a, doc_b FROM ol GROUP BY 1, 2 HAVING max(l) >= 3),
        |ed2 AS (SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION SELECT doc_b, doc_a FROM p),
        |reach2(doc, lab) AS (
        |  SELECT a, a FROM ed2
        |  UNION
        |  SELECT ed2.a, reach2.lab FROM ed2 JOIN reach2 ON ed2.b = reach2.doc),
        |mem AS (SELECT doc, min(lab) AS chain_id FROM reach2 GROUP BY doc),
        |tk AS (SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT)
        |    AS nt FROM documents)
        |SELECT chain_id, CAST(count(*) AS BIGINT) AS n_fragments,
        |  CAST(SUM(tk.nt) AS BIGINT) AS n_tokens,
        |  min(mem.doc) AS first_doc, max(mem.doc) AS last_doc
        |FROM mem JOIN tk ON tk.doc_id = mem.doc GROUP BY chain_id""".stripMargin
  }

  /** Derive the g16 oracle from g9's: keep the pair/capped/cop/dir/knn/
    * und kNN-edge chain byte-identical (cut where g9's triangle work
    * starts), then run the two grid-exact feature-propagation hops —
    * neighbor mean of s_acctbal, then neighbor mean of those means. */
  private[graft] def featurePropOracle(g9: String): String = {
    val cut = "deg AS"
    val i = g9.indexOf(cut)
    require(i >= 0 && g9.startsWith("WITH "),
      "g9 oracle SQL lost the g16 anchor")
    g9.substring(0, i) +
      """nb AS (SELECT u AS node, v AS nb FROM und
        |  UNION ALL SELECT v, u FROM und),
        |f AS (SELECT s_suppkey AS node, s_acctbal AS fv FROM supplier),
        |h1 AS (SELECT nb.node, CAST(count(*) AS BIGINT) AS degree,
        |    CAST(SUM(CAST(round(f.fv * 1.0e9) AS DECIMAL(38,0))) AS DOUBLE)
        |      / 1.0e9 / count(*) AS h1
        |  FROM nb JOIN f ON nb.nb = f.node GROUP BY nb.node),
        |h2 AS (SELECT nb.node,
        |    CAST(SUM(CAST(round(h1.h1 * 1.0e9) AS DECIMAL(38,0))) AS DOUBLE)
        |      / 1.0e9 / count(*) AS h2
        |  FROM nb JOIN h1 ON nb.nb = h1.node GROUP BY nb.node)
        |SELECT h1.node, f.fv AS f, h1.degree, h1.h1 AS h1, h2.h2 AS h2
        |FROM h1 JOIN h2 ON h1.node = h2.node
        |  JOIN f ON f.node = h1.node""".stripMargin
  }

  /** Derive the c32 oracle from c30's: wrap its per-source budget
    * report (raw vs keeper token masses over the SAME keeper chain) as
    * a CTE, then apply the Muennighoff data-constrained-scaling fold —
    * epochs = T/U, one 5-decimal-grid-snapped exp (x21's ln precedent),
    * D' = U + U·15·(1 − e^((1−k)/15)) — all literals CAST to DOUBLE
    * (the g1 DuckDB-decimal-literal rule). */
  private[graft] def effectiveTokensOracle(c30: String): String = {
    val anchor = "SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,"
    val i = c30.lastIndexOf(anchor)
    require(i >= 0, "c30 oracle SQL lost the c32 anchor")
    // `base` is already a CTE of the d2 minhash chain — use c32base
    c30.substring(0, i).stripSuffix("\n") + ",\nc32base AS (\n" +
      c30.substring(i) + "),\n" +
      """e AS (SELECT source, n_docs, n_tokens, n_tokens_kept,
        |    CAST(n_tokens AS DOUBLE) / CAST(n_tokens_kept AS DOUBLE)
        |      AS epochs
        |  FROM c32base),
        |f AS (SELECT *, CAST(n_tokens_kept AS DOUBLE)
        |    + CAST(n_tokens_kept AS DOUBLE) * CAST(15.0 AS DOUBLE)
        |    * (CAST(1.0 AS DOUBLE) - CAST(CAST(round(
        |        exp((CAST(1.0 AS DOUBLE) - epochs) / CAST(15.0 AS DOUBLE)),
        |        5) AS DECIMAL(18,6)) AS DOUBLE)) AS eff
        |  FROM e)
        |SELECT source, n_docs, n_tokens AS raw_tokens,
        |  n_tokens_kept AS unique_tokens, epochs,
        |  eff AS effective_tokens,
        |  eff / CAST(n_tokens AS DOUBLE) AS efficiency
        |FROM f""".stripMargin
  }

  /** Derive the mm16 oracle from mm6's: keep the hex/phash/bands chain
    * byte-identical, then count per-(j, bv) bucket populations for the
    * full corpus and for yesterday's split — a phash is a pure function
    * of its payload, so the stored side is a FILTER of the same bands
    * CTE (no renamed second chain needed) — and fold the full outer
    * join into the d38 bucket-class report. */
  private[graft] def phashDirtyBucketsOracle(mm6: String): String = {
    val cut = "cand AS (SELECT DISTINCT a.doc_id AS doc_a"
    val i = mm6.indexOf(cut)
    require(i >= 0 && mm6.startsWith("WITH "),
      "mm6 oracle SQL lost the mm16 anchor")
    mm6.substring(0, i) +
      """fb AS (SELECT j, bv, count(*) AS cf FROM bands GROUP BY 1, 2),
        |sb AS (SELECT j, bv, count(*) AS cs FROM bands
        |  WHERE doc_id % 10 <> 0 GROUP BY 1, 2),
        |ch AS (SELECT fb.cf, sb.cs FROM fb FULL OUTER JOIN sb
        |  ON sb.j = fb.j AND sb.bv = fb.bv)
        |SELECT CAST(count(*) AS BIGINT) AS n_buckets,
        |  CAST(SUM(CASE WHEN cf = cs THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unchanged,
        |  CAST(SUM(CASE WHEN cs IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_new,
        |  CAST(SUM(CASE WHEN cf > cs THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_grown,
        |  CAST(SUM(CASE WHEN cf < cs THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_shrunk,
        |  CAST(SUM(CASE WHEN cf IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_removed,
        |  CAST(count(*) - SUM(CASE WHEN cf = cs THEN 1 ELSE 0 END)
        |      AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS dirty_frac
        |FROM ch GROUP BY (1=1)""".stripMargin
  }

  /** Derive the d35 oracle from d2's: keep the shingle/minhash/band/
    * candidate CTEs byte-identical, drop the jaccard threshold, and set
    * the estimate (matching components / 12) next to the exact value. */
  private[graft] def minhashCalibrationOracle(d2: String): String = {
    val anchor = "jac AS (SELECT doc_a, doc_b,\n" +
      "  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)\n" +
      "    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard\n" +
      "  FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b)\n" +
      "SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.7"
    require(d2.endsWith(anchor), "d2 oracle SQL lost the d35 anchor")
    d2.dropRight(anchor.length) +
      """jac AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
        |  FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b),
        |est AS (SELECT c.doc_a, c.doc_b,
        |  CAST(SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS DOUBLE) / 12
        |    AS est_jaccard
        |  FROM cand c JOIN mh a ON a.doc_id = c.doc_a
        |    JOIN mh b ON b.doc_id = c.doc_b AND b.k = a.k
        |  GROUP BY 1, 2)
        |SELECT j.doc_a, j.doc_b, e.est_jaccard,
        |  j.jaccard AS exact_jaccard,
        |  abs(e.est_jaccard - j.jaccard) AS abs_err
        |FROM jac j JOIN est e
        |  ON e.doc_a = j.doc_a AND e.doc_b = j.doc_b""".stripMargin
  }

  /** Derive the c26 oracle from c6's: keep the shingle-overlap chain and
    * swap the per-doc verdict projection for the per-source rollup. */
  private[graft] def contaminationReportOracle(c6: String): String = {
    val anchor = "SELECT d.doc_id, d.source,\n" +
      "  COALESCE(ov.shared, 0) AS n_shared,\n" +
      "  COALESCE(ov.shared, 0) >= 3 AS contaminated\n" +
      "FROM documents d LEFT JOIN ov ON d.doc_id = ov.doc_id\n" +
      "WHERE d.doc_id % 97 <> 0"
    require(c6.endsWith(anchor), "c6 oracle SQL lost the c26 anchor")
    c6.dropRight(anchor.length) +
      """SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN COALESCE(ov.shared, 0) >= 3 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_contaminated,
        |  CAST(SUM(CASE WHEN COALESCE(ov.shared, 0) >= 3 THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*) AS contamination_rate
        |FROM documents d LEFT JOIN ov ON d.doc_id = ov.doc_id
        |WHERE d.doc_id % 97 <> 0
        |GROUP BY d.source""".stripMargin
  }

  /** Derive the e17 oracle from e13's: keep the recursive chain and swap
    * the loading dump for the per-vector projection onto the two final
    * iterates (lists re-assembled in dim order; in-order dot — the e10
    * parity shape). */
  private[graft] def pcProjectOracle(e13: String): String = {
    val anchor = "SELECT 1 AS component, CAST(d AS INT) AS dim, vv AS loading,\n" +
      "  lam AS eigenvalue FROM pw WHERE it = 24\n" +
      "UNION ALL\n" +
      "SELECT 2, CAST(d AS INT), vv, lam FROM pw2 WHERE it = 24"
    require(e13.endsWith(anchor), "e13 oracle SQL lost the e17 anchor")
    e13.dropRight(anchor.length) +
      """SELECT vec_id,
        |  list_reduce(list_transform(range(1,65), i -> x[i] * v1[i]),
        |    (a,b) -> a + b) AS pc1_score,
        |  list_reduce(list_transform(range(1,65), i -> x[i] * v2[i]),
        |    (a,b) -> a + b) AS pc2_score
        |FROM (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings)
        |CROSS JOIN (SELECT list(vv ORDER BY d) AS v1 FROM pw WHERE it = 24)
        |CROSS JOIN (SELECT list(vv ORDER BY d) AS v2 FROM pw2 WHERE it = 24)""".stripMargin
  }

  /** Derive the s18 oracle from s13's: keep every CTE through `adc`
    * byte-identical, widen the top-30 candidate CTE to carry adc_d2,
    * join both pair sides back to the subspace slices for the exact
    * grid distance, and aggregate the per-query error stats. */
  private[graft] def adcErrorOracle(s13: String): String = {
    val anchor = "cand AS (SELECT query_id, neighbor_id FROM ("
    val i = s13.indexOf(anchor)
    require(i >= 0, "s13 oracle SQL lost the cand anchor for s18")
    s13.substring(0, i) +
      """cand AS (SELECT query_id, neighbor_id, adc_d2 FROM (
        |  SELECT query_id, neighbor_id, adc_d2,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY adc_d2, neighbor_id) AS r
        |  FROM adc) WHERE r <= 30),
        |exd AS (SELECT cd.query_id, cd.neighbor_id, cd.adc_d2,
        |  CAST(CAST(SUM(CAST(round(list_reduce(list_transform(range(1, 17),
        |    i -> (q.sx[i] - c.sx[i]) * (q.sx[i] - c.sx[i])), (a, b) -> a + b)
        |    * 1.0e9) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1.0e9 AS exact_d2
        |  FROM cand cd JOIN sub q ON q.vec_id = cd.query_id
        |    JOIN sub c ON c.vec_id = cd.neighbor_id AND c.s = q.s
        |  GROUP BY 1, 2, 3)
        |SELECT query_id, CAST(count(*) AS BIGINT) AS n_cands,
        |  CAST(SUM(CAST(round(abs(adc_d2 - exact_d2) * 1.0e9) AS BIGINT))
        |    AS DOUBLE) / (count(*) * 1.0e9) AS mean_abs_err,
        |  max(abs(adc_d2 - exact_d2)) AS max_abs_err
        |FROM exd GROUP BY query_id""".stripMargin
  }

  /** Derive the c27 oracle from x3's: lift the quality expression into a
    * CTE, add d1's keeper-rule duplicate flag, and aggregate dup rate
    * per score decile (floor(score·10 + 1e-9), the boundary nudge). */
  private[graft] def qualityDupOracle(x3: String): String = {
    val anchor = "SELECT doc_id, n_chars, n AS n_tokens, mwl AS avg_token_len,\n" +
      "  sr AS stopword_ratio, pr AS punct_ratio,\n" +
      "  0.4 * sr + 0.3 * (1.0 - pr) + 0.3 * (least(mwl, 8.0) / 8.0) AS quality_score,\n" +
      "  (0.4 * sr + 0.3 * (1.0 - pr) + 0.3 * (least(mwl, 8.0) / 8.0)) >= 0.5 AS is_quality\n" +
      "FROM m"
    require(x3.endsWith(anchor), "x3 oracle SQL lost the c27 anchor")
    x3.dropRight(anchor.length).stripSuffix("\n").stripSuffix(",") + ",\n" +
      """qv AS (SELECT doc_id,
        |  0.4 * sr + 0.3 * (1.0 - pr) + 0.3 * (least(mwl, 8.0) / 8.0)
        |    AS quality_score FROM m),
        |dh AS (SELECT doc_id, md5(text) AS h FROM documents),
        |kk AS (SELECT h, min(doc_id) AS keeper FROM dh GROUP BY h),
        |fl AS (SELECT dh.doc_id, dh.doc_id <> kk.keeper AS is_dup
        |  FROM dh JOIN kk USING (h))
        |SELECT CAST(floor(qv.quality_score * 10 + 1.0e-9) AS INT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN fl.is_dup THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dups,
        |  CAST(SUM(CASE WHEN fl.is_dup THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) AS dup_rate
        |FROM qv JOIN fl ON qv.doc_id = fl.doc_id
        |GROUP BY 1""".stripMargin
  }

  /** Derive the e19 oracle from e5's: lift the per-(vector, subspace)
    * winner errors into a CTE, sum them per vector on the 1e-9 grid
    * (order-free longs), and keep the deterministic top-k head. */
  private[graft] def pqWorstOracle(e5: String): String = {
    val anchor = "SELECT vec_id, CAST(s AS INT) AS subspace, code, d2 AS err2\n" +
      "FROM (SELECT vec_id, s, code, d2,\n" +
      "    row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, code)\n" +
      "      AS rn FROM df) WHERE rn = 1"
    require(e5.endsWith(anchor), "e5 oracle SQL lost the e19 anchor")
    e5.dropRight(anchor.length).stripSuffix("\n").stripSuffix(",") + ",\n" +
      """pe AS (SELECT vec_id, d2 FROM (SELECT vec_id, s, code, d2,
        |    row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, code)
        |      AS rn FROM df) WHERE rn = 1),
        |tv AS (SELECT vec_id,
        |  CAST(CAST(SUM(CAST(round(d2 * 1.0e9) AS BIGINT)) AS BIGINT)
        |    AS DOUBLE) / 1.0e9 AS distortion
        |  FROM pe GROUP BY vec_id)
        |SELECT vec_id, distortion, CAST(rank AS INT) AS rank
        |FROM (SELECT vec_id, distortion,
        |    row_number() OVER (ORDER BY distortion DESC, vec_id) AS rank
        |  FROM tv) WHERE rank <= 50""".stripMargin
  }

  /** Derive the g7 oracle from g2's: keep the unrolled LPA chain and
    * swap the final projection for the per-community mass aggregate
    * folded into Newman's Q = I/T − ΣD²/T² — all-integer masses (D²
    * as DECIMAL(38,0)), two IEEE divisions in the identical shape. */
  private[graft] def modularityOracle(g2: String): String = {
    val anchor = graft.oracles.GraphOracles.lpaFinalSelect
    val lf = graft.oracles.GraphOracles.lpaFinalTable
    require(g2.contains(anchor), "g2 oracle SQL lost the g7 anchor")
    g2.replace(anchor,
      s"""SELECT CAST(count(*) AS BIGINT) AS n_communities,
        |  CAST(SUM(ew.incident_w) AS BIGINT) AS total_w,
        |  CAST(SUM(ew.internal_w) AS BIGINT) AS internal_w,
        |  CAST(CAST(SUM(ew.internal_w) AS BIGINT) AS DOUBLE)
        |      / CAST(CAST(SUM(ew.incident_w) AS BIGINT) AS DOUBLE)
        |    - CAST(SUM(CAST(ew.incident_w AS DECIMAL(38,0))
        |          * ew.incident_w) AS DOUBLE)
        |      / (CAST(CAST(SUM(ew.incident_w) AS BIGINT) AS DOUBLE)
        |         * CAST(CAST(SUM(ew.incident_w) AS BIGINT) AS DOUBLE))
        |    AS modularity
        |FROM (SELECT ls.lab,
        |        CAST(SUM(e.w) AS BIGINT) AS incident_w,
        |        CAST(SUM(CASE WHEN ld.lab = ls.lab THEN e.w ELSE 0 END)
        |          AS BIGINT) AS internal_w
        |      FROM e JOIN $lf ls ON e.src = ls.node
        |             JOIN $lf ld ON e.dst = ld.node
        |      GROUP BY ls.lab) ew
        |GROUP BY (1=1)""".stripMargin)
  }

  /** Derive the c28 oracle from x34's: lift the per-doc readability
    * projection into a CTE VERBATIM (the flesch formula is reused, not
    * copied) and rank easy→hard within source with the progress/phase
    * windows on top. */
  private[graft] def curriculumOracle(x34: String): String = {
    val anchor = "SELECT doc_id,\n  CAST(n_words AS BIGINT) AS n_words,"
    require(x34.contains(anchor), "x34 oracle SQL lost the c28 anchor")
    val idx = x34.indexOf(anchor)
    x34.substring(0, idx).stripSuffix("\n") + ",\n" +
      "f AS (" + x34.substring(idx) + ")\n" +
      """SELECT doc_id, source, flesch, within_rank, n_in_source,
        |  CAST(within_rank - 1 AS DOUBLE) / CAST(n_in_source AS DOUBLE)
        |    AS progress,
        |  CASE WHEN CAST(within_rank - 1 AS DOUBLE)
        |      / CAST(n_in_source AS DOUBLE) < CAST(0.33 AS DOUBLE)
        |    THEN 'warmup'
        |    WHEN CAST(within_rank - 1 AS DOUBLE)
        |      / CAST(n_in_source AS DOUBLE) < CAST(0.66 AS DOUBLE)
        |    THEN 'main'
        |    ELSE 'polish' END AS phase
        |FROM (SELECT f.doc_id, d.source, f.flesch,
        |    CAST(row_number() OVER (PARTITION BY d.source
        |      ORDER BY f.flesch DESC, f.doc_id) AS BIGINT) AS within_rank,
        |    CAST(count(*) OVER (PARTITION BY d.source) AS BIGINT)
        |      AS n_in_source
        |  FROM f JOIN documents d USING (doc_id))""".stripMargin
  }

  /** Derive the x38 oracle from x27's: keep the BPE training +
    * dictionary CTEs byte-identical and swap the per-doc rollup for the
    * per-language fertility aggregate. */
  private[graft] def fertilityOracle(x27: String): String = {
    val anchor = "dw AS (SELECT doc_id, n_chars, UNNEST(string_split(text,' ')) AS w"
    require(x27.contains(anchor), "x27 oracle SQL lost the x38 anchor")
    x27.substring(0, x27.indexOf(anchor)) +
      """dw AS (SELECT doc_id, lang, UNNEST(string_split(text,' ')) AS w
        |  FROM documents)
        |SELECT lang, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(COUNT(*) AS BIGINT) AS n_words,
        |  CAST(SUM(ntok) AS BIGINT) AS n_tokens,
        |  CAST(CAST(SUM(ntok) AS BIGINT) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS tokens_per_word
        |FROM dw JOIN dict USING (w)
        |WHERE len(w) > 0
        |GROUP BY lang""".stripMargin
  }

  /** Derive the e21 oracle from e8's: lift the Gram projection into a
    * CTE and fold it into PR = tr(C)²/tr(C²) — the trace from the
    * diagonal cells, tr(C²) from all squared cells (off-diagonals
    * twice), both re-gridded before the decimal sum, one IEEE division
    * at the end. */
  private[graft] def participationRatioOracle(e8: String): String = {
    val anchor = "SELECT CAST(p.i AS INT) AS i"
    require(e8.contains(anchor), "e8 oracle SQL lost the e21 anchor")
    val idx = e8.indexOf(anchor)
    e8.substring(0, idx).stripSuffix("\n") + ",\n" +
      "g AS (" + e8.substring(idx) + ")\n" +
      """SELECT n_vectors, trace, trace_sq,
        |  CASE WHEN trace_sq > 0 THEN (trace * trace) / trace_sq
        |    ELSE CAST(0 AS DOUBLE) END AS participation_ratio
        |FROM (SELECT CAST(max(n) AS BIGINT) AS n_vectors,
        |    CAST(SUM(CASE WHEN i = j
        |        THEN CAST(round(gram * 1.0e9) AS DECIMAL(38,0))
        |        ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE) / 1.0e9
        |      AS trace,
        |    CAST(SUM(CAST(round(((gram * gram) *
        |        (CASE WHEN i = j THEN CAST(1.0 AS DOUBLE)
        |         ELSE CAST(2.0 AS DOUBLE) END)) * 1.0e9)
        |      AS DECIMAL(38,0))) AS DOUBLE) / 1.0e9 AS trace_sq
        |  FROM g GROUP BY (1=1))""".stripMargin
  }

  /** Derive the d37 oracle from d32's: swap the full-text hash for the
    * 8-word opening fingerprint (d30's syndication identity — the
    * full-hash rule is vacuous on this corpus: zero exact dups at
    * sf0.01), keep the keeper CTE, and replace the per-source dup
    * rollup with the duplicate-only rows joined to their keeper's
    * source — within/cross split per source. */
  private[graft] def dupSourceSplitOracle(d32: String): String = {
    val anchor = "j AS (SELECT x.source, x.doc_id <> f.first_doc AS is_dup"
    val hashAnchor =
      "WITH h AS (SELECT doc_id, source, md5(text) AS h FROM documents)"
    require(d32.contains(anchor) && d32.contains(hashAnchor),
      "d32 oracle SQL lost the d37 anchors")
    val headHashed = d32.replace(hashAnchor,
      """WITH h AS (SELECT doc_id, source,
        |    md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS h
        |  FROM documents)""".stripMargin)
    headHashed.substring(0, headHashed.indexOf(anchor)) +
      """d AS (SELECT x.source, fs.source AS first_source
        |  FROM h x JOIN f ON f.h = x.h
        |  JOIN h fs ON fs.doc_id = f.first_doc
        |  WHERE x.doc_id <> f.first_doc)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_dup_docs,
        |  CAST(SUM(CASE WHEN source = first_source THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_within_source,
        |  CAST(SUM(CASE WHEN source <> first_source THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_cross_source,
        |  CAST(SUM(CASE WHEN source <> first_source THEN 1 ELSE 0 END)
        |    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS cross_frac
        |FROM d GROUP BY source""".stripMargin
  }

  /** Derive the s22 oracle from s13's: inject the allow-list CTE
    * (label % 2 = 0, the s11 predicate) and semi-join it into the ADC
    * candidate aggregation — disallowed vectors never reach the ADC
    * top-k or the exact re-rank, the pre-filter semantics the Spark
    * side implements by semi-joining the stored codes table. */
  private[graft] def filteredVsIndexOracle(s13: String): String = {
    val anchor = "adc AS (SELECT cc.query_id, cc.neighbor_id,"
    val joinAnchor =
      "FROM ccand cc JOIN pasg a ON a.vec_id = cc.neighbor_id"
    require(s13.contains(anchor) && s13.contains(joinAnchor),
      "s13 oracle SQL lost the s22 anchors")
    s13.replace(anchor,
      """alw AS (SELECT vec_id FROM embeddings WHERE label % 2 = 0),
        |adc AS (SELECT cc.query_id, cc.neighbor_id,""".stripMargin)
      .replace(joinAnchor,
        joinAnchor + "\n    JOIN alw w ON w.vec_id = cc.neighbor_id")
  }

  /** Derive the x39 oracle from x37's: keep the bigram/count/score CTEs
    * byte-identical and swap the per-doc projection for the per-source
    * POOLED rollup (exact decimal sums summed, one division). */
  private[graft] def lmBySourceOracle(x37: String): String = {
    val anchor = "SELECT doc_id, doc_id % 10 <> 0 AS in_ref, count(*) AS n_bigrams,\n" +
      "  CAST(sum(lp) AS DOUBLE) / count(*) AS avg_logprob\n" +
      "FROM lp GROUP BY doc_id"
    require(x37.endsWith(anchor), "x37 oracle SQL lost the x39 anchor")
    x37.dropRight(anchor.length) +
      """SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(s.n) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(s.slp) AS DOUBLE) / CAST(CAST(SUM(s.n) AS BIGINT)
        |    AS DOUBLE) AS avg_logprob
        |FROM (SELECT doc_id, count(*) AS n, sum(lp) AS slp
        |      FROM lp GROUP BY doc_id) s
        |JOIN documents d USING (doc_id)
        |GROUP BY d.source""".stripMargin
  }

  /** Derive the e22 oracle from e13's: keep the recursive chain and swap
    * the loading dump for the one-row λ1/λ2 fold (constant-group
    * aggregates so empty in → empty out; both divisions IEEE). */
  private[graft] def spectralGapOracle(e13: String): String = {
    val anchor = "SELECT 1 AS component, CAST(d AS INT) AS dim, vv AS loading,\n" +
      "  lam AS eigenvalue FROM pw WHERE it = 24\n" +
      "UNION ALL\n" +
      "SELECT 2, CAST(d AS INT), vv, lam FROM pw2 WHERE it = 24"
    require(e13.endsWith(anchor), "e13 oracle SQL lost the e22 anchor")
    e13.dropRight(anchor.length) +
      """SELECT lambda1, lambda2,
        |  lambda1 / lambda2 AS spectral_gap,
        |  lambda1 / (lambda1 + lambda2) AS top2_share
        |FROM (SELECT max(lam) AS lambda1 FROM pw WHERE it = 24
        |      GROUP BY (1=1))
        |CROSS JOIN (SELECT max(lam) AS lambda2 FROM pw2 WHERE it = 24
        |      GROUP BY (1=1))""".stripMargin
  }

  /** Derive the mm15 oracle from mm6's: keep the signature/band/candidate
    * chain byte-identical and swap the pair projection for the Hamming-
    * distance histogram. */
  private[graft] def hammingHistogramOracle(mm6: String): String = {
    val anchor = "SELECT doc_a, doc_b, bit_count(xor(pa, pb)) AS hamming\n" +
      "FROM cand WHERE bit_count(xor(pa, pb)) <= 6"
    require(mm6.endsWith(anchor), "mm6 oracle SQL lost the mm15 anchor")
    mm6.dropRight(anchor.length) +
      """SELECT bit_count(xor(pa, pb)) AS hamming,
        |  CAST(count(*) AS BIGINT) AS n_pairs
        |FROM cand WHERE bit_count(xor(pa, pb)) <= 6
        |GROUP BY 1""".stripMargin
  }

  /** Derive the c29 oracle from c5's: keep the shingle/LSH/metric CTEs
    * byte-identical, lift the three gate predicates into per-doc flags,
    * and emit the cumulative funnel (4 arms over one constant-group
    * aggregate — empty in → empty out). */
  private[graft] def gateFunnelOracle(c5: String): String = {
    val anchor = "sel AS (SELECT doc_id, lang, n_chars FROM m\n" +
      "  WHERE (0.4 * sr + 0.3 * (1.0 - pr) + 0.3 * (least(mwl, 8.0) / 8.0)) >= 0.5\n" +
      "    AND NOT (dw > 0.30 OR d2f > 0.20 OR d3f > 0.18)\n" +
      "    AND doc_id NOT IN (SELECT doc FROM drops))\n" +
      "SELECT lang, count(*) AS n_docs,\n" +
      "  CAST(sum(n_chars) AS BIGINT) AS total_chars\n" +
      "FROM sel GROUP BY lang"
    require(c5.endsWith(anchor), "c5 oracle SQL lost the c29 anchor")
    c5.dropRight(anchor.length) +
      """fl AS (SELECT doc_id, n_chars,
        |  (0.4 * sr + 0.3 * (1.0 - pr) + 0.3 * (least(mwl, 8.0) / 8.0)) >= 0.5 AS q,
        |  NOT (dw > 0.30 OR d2f > 0.20 OR d3f > 0.18) AS r,
        |  doc_id NOT IN (SELECT doc FROM drops) AS kd
        |  FROM m),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n0,
        |  CAST(COALESCE(sum(n_chars), 0) AS BIGINT) AS c0,
        |  CAST(SUM(CASE WHEN q THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |  CAST(COALESCE(SUM(CASE WHEN q THEN n_chars END), 0) AS BIGINT) AS c1,
        |  CAST(SUM(CASE WHEN q AND r THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |  CAST(COALESCE(SUM(CASE WHEN q AND r THEN n_chars END), 0)
        |    AS BIGINT) AS c2,
        |  CAST(SUM(CASE WHEN q AND r AND kd THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n3,
        |  CAST(COALESCE(SUM(CASE WHEN q AND r AND kd THEN n_chars END), 0)
        |    AS BIGINT) AS c3
        |  FROM fl GROUP BY (1=1))
        |SELECT 1 AS stage, 'all' AS gate, n0 AS n_docs, c0 AS total_chars
        |FROM ag
        |UNION ALL SELECT 2, 'quality', n1, c1 FROM ag
        |UNION ALL SELECT 3, 'quality+repetition', n2, c2 FROM ag
        |UNION ALL SELECT 4, 'quality+repetition+dedup', n3, c3 FROM ag""".stripMargin
  }

  /** Derive the g13 oracle from g9's: the projection/knn/und chain runs
    * TWICE — once verbatim (the fresh build) and once as a renamed copy
    * whose order join carries the stored split's filter (yesterday's
    * facts) — then a full outer join on the canonical edge and the
    * kept/added/removed churn aggregate. The copy is string-derived
    * with whole-word CTE renames so an edit to g9's chain flows into
    * BOTH sides or fails the anchors loudly. */
  private[graft] def indexChurnOracle(g9: String): String = {
    val anchor = "deg AS (SELECT node,"
    val joinAnchor = "FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    require(g9.contains(anchor) && g9.contains(joinAnchor),
      "g9 oracle SQL lost the g13 anchors")
    val prefix = g9.substring(0, g9.indexOf(anchor))
    // the chain between WITH and the cut, as CTE definitions text
    require(prefix.startsWith("WITH "), "g9 oracle lost its WITH head")
    val chain = prefix.stripPrefix("WITH ").stripSuffix("\n")
      .reverse.dropWhile(c => c == ',' || c == '\n').reverse
    val renamed = Seq("pair", "capped", "cop", "dir", "knn", "und")
      .foldLeft(chain) { (sql, cte) =>
        sql.replaceAll("\\b" + cte + "\\b", cte + "2")
      }
      .replace(joinAnchor,
        joinAnchor + " AND o_orderkey % 10 <> 0")
    "WITH " + chain + ",\n" + renamed + ",\n" +
      """ch AS (SELECT f.u AS fu, o.u AS ou
        |  FROM und f FULL OUTER JOIN und2 o ON o.u = f.u AND o.v = f.v)
        |SELECT
        |  CAST(SUM(CASE WHEN fu IS NOT NULL AND ou IS NOT NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN ou IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_added,
        |  CAST(SUM(CASE WHEN fu IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_removed,
        |  CAST(SUM(CASE WHEN ou IS NULL OR fu IS NULL THEN 1 ELSE 0 END)
        |      AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS churn
        |FROM ch GROUP BY (1=1)""".stripMargin
  }

  /** Derive the s24 oracle from s13's: the k-means/assignment chain
    * runs TWICE — once verbatim (the fresh full-corpus quantizer) and
    * once as a whole-word-renamed copy whose base corpus CTE carries
    * the stored split's filter (training AND assignment both restrict,
    * exactly ivfAdcIndex over the split) — then the two cell tables
    * join on vec_id for the moved/same churn aggregate. */
  /** Derive the s25 oracle from s13's: the k-means chain (v…cent) runs
    * TWICE — verbatim and as a whole-word-renamed copy whose corpus CTE
    * carries the stored split's filter (the s24 mechanics, cut at the
    * cent/ac boundary so neither side drags the PQ tail along) — then
    * the two centroid tables join on cent_id and the in-order 64-dim
    * euclidean fold gives the per-centroid drift. Distances are
    * IEEE-exact: both engines fold identical grid-derived doubles in
    * index order. */
  private[graft] def centroidDriftOracle(s13: String): String = {
    val cut = ",\nac AS ("
    val i = s13.indexOf(cut)
    require(i >= 0, "s13 oracle lost the cent/ac boundary for s25")
    val prefix = s13.substring(0, i)
    require(prefix.startsWith("WITH "), "s13 oracle lost its WITH head")
    val chain = prefix.stripPrefix("WITH ")
    val ctes = Seq("v", "dims", "samp", "c0", "a0", "g0", "m1", "c1",
      "a1", "g1", "m2", "cent")
    ctes.foreach(n => require(chain.contains(n + " AS ("),
      s"s13 oracle lost the $n CTE for s25"))
    val renamed = ctes.foldLeft(chain) { (sql, cte) =>
      sql.replaceAll("\\b" + cte + "\\b", cte + "2")
    }
    val vAnchor = "v2 AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings)"
    require(renamed.contains(vAnchor),
      "s13 oracle lost the corpus CTE for s25")
    val split = renamed.replace(vAnchor,
      "v2 AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings" +
        "\n  WHERE vec_id % 7 <> 3)")
    "WITH " + chain + ",\n" + split + "\n" +
      """SELECT f.cent_id,
        |  sqrt(list_reduce(list_transform(range(1,65), i ->
        |    (f.cx[i] - o.cx[i]) * (f.cx[i] - o.cx[i])), (a,b) -> a + b))
        |    AS drift
        |FROM cent f JOIN cent2 o ON o.cent_id = f.cent_id""".stripMargin
  }

  private[graft] def cellChurnOracle(s13: String): String = {
    val anchor = "probes AS (SELECT vec_id AS query_id"
    val i = s13.indexOf(anchor)
    require(i >= 0, "s13 oracle SQL lost the asg anchor for s24")
    val prefix = s13.substring(0, i)
    require(prefix.startsWith("WITH "), "s13 oracle lost its WITH head")
    val chain = prefix.stripPrefix("WITH ").stripSuffix("\n")
      .reverse.dropWhile(c => c == ',' || c == '\n').reverse
    val ctes = Seq("v", "dims", "samp", "c0", "a0", "g0", "m1", "c1",
      "a1", "g1", "m2", "cent", "ac", "asg")
    ctes.foreach(n => require(chain.contains(n + " AS ("),
      s"s13 oracle lost the $n CTE for s24"))
    val renamed = ctes.foldLeft(chain) { (sql, cte) =>
      sql.replaceAll("\\b" + cte + "\\b", cte + "2")
    }
    val vAnchor = "v2 AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings)"
    require(renamed.contains(vAnchor),
      "s13 oracle lost the corpus CTE for s24")
    val split = renamed.replace(vAnchor,
      "v2 AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings" +
        "\n  WHERE vec_id % 7 <> 3)")
    "WITH " + chain + ",\n" + split + "\n" +
      """SELECT CAST(count(*) AS BIGINT) AS n_common,
        |  CAST(SUM(CASE WHEN f.cent_id = o.cent_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_same,
        |  CAST(SUM(CASE WHEN f.cent_id <> o.cent_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_moved,
        |  CAST(SUM(CASE WHEN f.cent_id <> o.cent_id THEN 1 ELSE 0 END)
        |      AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS moved_frac
        |FROM asg f JOIN asg2 o ON o.vec_id = f.vec_id
        |GROUP BY (1=1)""".stripMargin
  }

  /** Derive the s23 oracle from s22's: lift the served top-k tail into
    * a CTE, add the exact filtered brute-force side (every allowed
    * corpus vector scored per query — the s11 semantics with the s22
    * allow-list), rank both (cos DESC, neighbor_id), and aggregate the
    * per-query recall (the s17 left-join shape; queries with no exact
    * neighbor drop out — no 0/0 rows). */
  private[graft] def filteredRecallOracle(s22: String): String = {
    val anchor = "SELECT query_id, neighbor_id, cos, rank FROM (\n" +
      "  SELECT query_id, neighbor_id, cos,\n" +
      "    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank\n" +
      "  FROM fx) WHERE rank <= 10"
    require(s22.endsWith(anchor), "s22 oracle SQL lost the s23 anchor")
    s22.dropRight(anchor.length).stripSuffix("\n") + ",\n" +
      """srv AS (SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM fx) WHERE rank <= 10),
        |ex AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        |  FROM v q JOIN v c ON c.vec_id <> q.vec_id
        |  JOIN alw w ON w.vec_id = c.vec_id
        |  WHERE q.vec_id % 100 = 0),
        |exh AS (SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM ex) WHERE rank <= 10)
        |SELECT e.query_id,
        |  CAST(count(*) AS BIGINT) AS n_exact,
        |  CAST(SUM(CASE WHEN s.neighbor_id IS NOT NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
        |  CAST(SUM(CASE WHEN s.neighbor_id IS NOT NULL
        |    THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS recall
        |FROM exh e LEFT JOIN srv s
        |  ON s.query_id = e.query_id AND s.neighbor_id = e.neighbor_id
        |GROUP BY e.query_id""".stripMargin
  }

  /** Derive the g11 oracle from g9's: keep the projection/knn/und CTEs
    * byte-identical and unroll `rounds` degree-peel rounds (drop nodes
    * of degree < 2, induce, recount) — all-integer. The Spark side peels
    * to FIXPOINT; peeling past the fixpoint is a no-op (the kept set
    * stops changing), so any unroll ≥ the data's fixpoint depth matches.
    * 12 rounds is 2× the measured depth at sf0.1 (and 3× sf0.01's) —
    * GraphSpec pins the no-op-past-fixpoint algebra on a fixture, and
    * Verify asserts after every dump that the engine's LAST CHANGING
    * peel round fell within this unroll (the over-unroll invariant is
    * CHECKED per run, not assumed — ADVICE r12: a dataset whose
    * fixpoint depth lands past the unroll would otherwise converge
    * cleanly on the Spark side yet diverge from the oracle). */
  private[graft] final val kcoreUnrolledRounds = 12
  private[graft] def kcoreOracle(g9: String,
      rounds: Int = kcoreUnrolledRounds): String = {
    val anchor = "deg AS (SELECT node,"
    require(g9.contains(anchor), "g9 oracle SQL lost the g11 anchor")
    // MATERIALIZED: DuckDB inlines CTEs by default, and each round
    // references the previous one 3× — an inlined 12-round unroll
    // re-opens the base parquet 3^12 times ("Too many open files");
    // materialization makes the unroll 12 linear passes.
    def degCte(i: Int, edges: String) =
      s"""d$i AS MATERIALIZED (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM
         |  (SELECT u AS node FROM $edges UNION ALL SELECT v FROM $edges)
         |  GROUP BY node)""".stripMargin
    def peelCte(i: Int) =
      s"""e$i AS MATERIALIZED (SELECT u, v FROM ${if (i == 1) "und" else s"e${i - 1}"}
         |  WHERE u IN (SELECT node FROM d${i - 1} WHERE deg >= 2)
         |    AND v IN (SELECT node FROM d${i - 1} WHERE deg >= 2))""".stripMargin
    val peelChain = (1 to rounds)
      .map(i => peelCte(i) + ",\n" + degCte(i, s"e$i"))
      .mkString(",\n")
    g9.substring(0, g9.indexOf(anchor)) +
      degCte(0, "und") + ",\n" + peelChain + "\n" +
      s"""SELECT d0.node AS supp, d0.deg AS degree,
         |  CAST(COALESCE(kf.deg, 0) AS BIGINT) AS core_degree,
         |  kf.deg IS NOT NULL AS in_core
         |FROM d0 LEFT JOIN
         |  (SELECT node, deg FROM d$rounds WHERE deg >= 2) kf
         |  ON kf.node = d0.node""".stripMargin
  }

  /** Derive the g12 oracle from g9's: keep the projection/knn/und CTEs
    * byte-identical and swap the triangle tail for a recursive-reach
    * connected-components pass (the d7 oracle's CC idiom) plus the
    * per-component node/edge aggregates — component = min reachable
    * node id, exactly what star-contraction CC converges to. */
  private[graft] def componentsOracle(g9: String): String = {
    val head = "WITH pair AS"
    val anchor = "deg AS (SELECT node,"
    require(g9.startsWith(head) && g9.contains(anchor),
      "g9 oracle SQL lost the g12 anchors")
    "WITH RECURSIVE" +
      g9.substring("WITH".length, g9.indexOf(anchor)) +
      """ed2 AS (SELECT u AS a, v AS b FROM und
        |  UNION SELECT v, u FROM und),
        |reach(node, lab) AS (
        |  SELECT a, a FROM ed2
        |  UNION
        |  SELECT ed2.a, reach.lab FROM ed2 JOIN reach ON ed2.b = reach.node),
        |comp AS (SELECT node, min(lab) AS component FROM reach
        |  GROUP BY node),
        |cn AS (SELECT component, CAST(count(*) AS BIGINT) AS n_nodes
        |  FROM comp GROUP BY component),
        |ce AS (SELECT c.component, CAST(count(*) AS BIGINT) AS n_edges
        |  FROM und e JOIN comp c ON c.node = e.u GROUP BY c.component)
        |SELECT cn.component, cn.n_nodes, ce.n_edges
        |FROM cn JOIN ce ON ce.component = cn.component""".stripMargin
  }

  /** Derive the g10 oracle from g9's: keep the projection/knn/
    * orientation/triangle CTEs byte-identical and swap the per-node
    * projection for the constant-group transitivity fold — Σ per-node
    * triangle counts is exactly 3T and Σ C(d,2) the wedge count, so
    * transitivity = Σt/Σwedges with one IEEE division (guarded to 0.0
    * on a wedge-free graph on both engines). */
  private[graft] def transitivityOracle(g9: String): String = {
    val anchor = "SELECT deg.node AS supp"
    require(g9.contains(anchor), "g9 oracle SQL lost the g10 anchor")
    g9.substring(0, g9.indexOf(anchor)) +
      """SELECT CAST(count(*) AS BIGINT) AS n_nodes,
        |  CAST(sum(deg.degree) // 2 AS BIGINT) AS n_edges,
        |  CAST(sum((deg.degree * (deg.degree - 1)) // 2) AS BIGINT)
        |    AS n_wedges,
        |  CAST(sum(COALESCE(tc.t, 0)) // 3 AS BIGINT) AS n_triangles,
        |  CASE WHEN sum((deg.degree * (deg.degree - 1)) // 2) > 0
        |    THEN CAST(sum(COALESCE(tc.t, 0)) AS DOUBLE) /
        |      CAST(sum((deg.degree * (deg.degree - 1)) // 2) AS DOUBLE)
        |    ELSE CAST(0 AS DOUBLE) END AS transitivity
        |FROM deg LEFT JOIN tc ON tc.node = deg.node
        |GROUP BY (1=1)""".stripMargin
  }

  /** Derive the e18 oracle from e16's: lift the grid-exact per-dim
    * moment projection into a CTE and join it back to every
    * (vector, dim) element for the z-score — the identical IEEE
    * expression tree on both engines. */
  private[graft] def standardizeOracle(e16: String): String = {
    val anchor = "SELECT dim, n,\n" +
      "  (CAST(s AS DOUBLE) / 1.0e9) / n AS mean,\n" +
      "  (CAST(s2 AS DOUBLE) / 1.0e9) / n\n" +
      "    - ((CAST(s AS DOUBLE) / 1.0e9) / n)\n" +
      "      * ((CAST(s AS DOUBLE) / 1.0e9) / n) AS variance\n" +
      "FROM g"
    require(e16.endsWith(anchor), "e16 oracle SQL lost the e18 anchor")
    e16.dropRight(anchor.length).stripSuffix("\n").stripSuffix(",") + ",\n" +
      """st AS (SELECT dim,
        |  (CAST(s AS DOUBLE) / 1.0e9) / n AS mean,
        |  (CAST(s2 AS DOUBLE) / 1.0e9) / n
        |    - ((CAST(s AS DOUBLE) / 1.0e9) / n)
        |      * ((CAST(s AS DOUBLE) / 1.0e9) / n) AS variance
        |  FROM g),
        |ve AS (SELECT vec_id, d.i - 1 AS dim, x[d.i] AS v
        |  FROM (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings)
        |  CROSS JOIN d)
        |SELECT ve.vec_id, ve.dim,
        |  (ve.v - st.mean) / sqrt(st.variance + 1.0e-9) AS z
        |FROM ve JOIN st USING (dim)""".stripMargin
  }

  /** Derive the mm13 oracle from mm7's: keep the byte→frame→energy chain
    * byte-identical, lift the per-frame RMS into a CTE, take consecutive
    * deltas with a per-media LAG window, and aggregate the motion
    * profile (grid-long mean, plain-double max/cut-count — the deltas
    * are engine-exact because the RMS is). */
  private[graft] def motionProfileOracle(mm7: String): String = {
    val anchor = "SELECT media_id, frame_idx, n_samples, energy,\n" +
      "  sqrt(CAST(energy AS DOUBLE) / n_samples) AS rms\nFROM fr"
    require(mm7.endsWith(anchor), "mm7 oracle SQL lost the mm13 anchor")
    mm7.dropRight(anchor.length).stripSuffix("\n") + ",\n" +
      """rm AS (SELECT media_id, frame_idx,
        |  sqrt(CAST(energy AS DOUBLE) / n_samples) AS rms FROM fr),
        |dl AS (SELECT media_id,
        |  abs(rms - lag(rms) OVER (PARTITION BY media_id
        |    ORDER BY frame_idx)) AS delta
        |  FROM rm)
        |SELECT media_id, CAST(count(*) AS BIGINT) AS n_deltas,
        |  CAST(SUM(CAST(round(delta * 1.0e9) AS DECIMAL(38,0))) AS DOUBLE)
        |    / (count(*) * 1.0e9) AS mean_abs_delta,
        |  max(delta) AS max_abs_delta,
        |  CAST(SUM(CASE WHEN delta > CAST(40.0 AS DOUBLE) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_cuts
        |FROM dl WHERE delta IS NOT NULL GROUP BY media_id""".stripMargin
  }

  /** Derive the s21 oracle from s13's: keep every CTE through `cand`
    * byte-identical (same top-30 candidate set as s18), then compare the
    * per-subspace LUT grid term (plut, via the neighbor's stored pasg
    * code — exactly the longs the adc CTE sums) against the exact grid
    * term of the real subvectors, aggregated per subspace. */
  private[graft] def adcErrorBySubspaceOracle(s13: String): String = {
    val anchor = "fx AS (SELECT cand.query_id, cand.neighbor_id,"
    val i = s13.indexOf(anchor)
    require(i >= 0, "s13 oracle SQL lost the fx anchor for s21")
    s13.substring(0, i) +
      """sxe AS (SELECT pa.s,
        |  abs(l.g2 - CAST(round(list_reduce(list_transform(range(1, 17),
        |    i -> (q.sx[i] - n.sx[i]) * (q.sx[i] - n.sx[i])), (a, b) -> a + b)
        |    * 1.0e9) AS BIGINT)) AS err_g
        |  FROM cand cd
        |    JOIN pasg pa ON pa.vec_id = cd.neighbor_id
        |    JOIN plut l ON l.query_id = cd.query_id AND l.s = pa.s
        |      AND l.code = pa.code
        |    JOIN sub q ON q.vec_id = cd.query_id AND q.s = pa.s
        |    JOIN sub n ON n.vec_id = cd.neighbor_id AND n.s = pa.s)
        |SELECT CAST(s AS INT) AS s, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(err_g) AS DOUBLE) / (count(*) * 1.0e9) AS mean_abs_err,
        |  CAST(max(err_g) AS DOUBLE) / 1.0e9 AS max_abs_err
        |FROM sxe GROUP BY s""".stripMargin
  }

  /** Derive the s20 oracle from s13's: cut after the full-corpus `asg`
    * CTE (the probes anchor) and aggregate per-cell populations into the
    * one-row balance summary. Every aggregate is an exact integer; only
    * the final mean and imbalance divide, in the same left-assoc IEEE
    * expression tree on both engines. */
  private[graft] def cellBalanceOracle(s13: String): String = {
    val anchor = "probes AS (SELECT vec_id AS query_id"
    val i = s13.indexOf(anchor)
    require(i >= 0, "s13 oracle SQL lost the asg anchor for s20")
    s13.substring(0, i) +
      """cells AS (SELECT cent_id, count(*) AS n FROM asg GROUP BY cent_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_cells,
        |  CAST(sum(n) AS BIGINT) AS n_vecs,
        |  CAST(min(n) AS BIGINT) AS min_cell,
        |  CAST(max(n) AS BIGINT) AS max_cell,
        |  CAST(CAST(sum(n) AS BIGINT) AS DOUBLE) / count(*) AS mean_cell,
        |  CAST(count(*) AS DOUBLE) * CAST(CAST(sum(n * n) AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(sum(n) AS BIGINT) * CAST(sum(n) AS BIGINT) AS DOUBLE)
        |    AS imbalance
        |FROM cells""".stripMargin
  }

  /** Derive the s19 oracle from s13's: cut after the ccand CTE (the
    * FIRST "GROUP BY 1, 2)" — the coarseRangeOracle anchor) and count
    * candidates per query. */
  private[graft] def probeFanoutOracle(s13: String): String = {
    val anchor = "GROUP BY 1, 2)"
    val i = s13.indexOf(anchor)
    require(i >= 0, "s13 oracle SQL lost the ccand anchor for s19")
    s13.substring(0, i + anchor.length) +
      "\nSELECT query_id, CAST(count(*) AS BIGINT) AS n_candidates" +
      "\nFROM ccand GROUP BY query_id"
  }

  /** Derive the mm11 oracle from mm6's: keep the signature/band/candidate
    * chain byte-identical, lift the verified pairs into a CTE, and swap
    * the projection for the per-format participation aggregate. */
  private[graft] def formatDupRateOracle(mm6: String): String = {
    val anchor = "SELECT doc_a, doc_b, bit_count(xor(pa, pb)) AS hamming\n" +
      "FROM cand WHERE bit_count(xor(pa, pb)) <= 6"
    require(mm6.endsWith(anchor), "mm6 oracle SQL lost the mm11 anchor")
    // the dropped text leaves the CTE list ending at "...cand AS (...)\n";
    // the appended chain must re-open it with a comma
    mm6.dropRight(anchor.length).stripSuffix("\n") + ",\n" +
      """pairs AS (SELECT doc_a, doc_b FROM cand
        |  WHERE bit_count(xor(pa, pb)) <= 6),
        |dup AS (SELECT DISTINCT doc_id FROM (
        |  SELECT doc_a AS doc_id FROM pairs
        |  UNION ALL SELECT doc_b AS doc_id FROM pairs)),
        |fm AS (SELECT doc_id,
        |  ['png','jpeg','wav','mp4'][CAST(doc_id % 4 + 1 AS INT)]
        |    AS format FROM documents)
        |SELECT format, CAST(count(*) AS BIGINT) AS n_media,
        |  CAST(SUM(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dup_media,
        |  CAST(SUM(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*) AS dup_rate
        |FROM fm LEFT JOIN dup d ON fm.doc_id = d.doc_id
        |GROUP BY format""".stripMargin
  }

  /** Derive the mm12 oracle from mm3's: keep the hex-dump patch chain
    * byte-identical and swap the per-patch projection for the
    * cross-document duplicate aggregate. */
  private[graft] def duplicatePatchesOracle(mm3: String): String = {
    val anchor = "SELECT doc_id, patch_idx,\n" +
      "  CAST(length(ph) // 2 AS BIGINT) AS patch_len,\n" +
      "  md5(ph) AS patch_md5,\n" +
      "  CAST((strpos('0123456789ABCDEF', substr(ph, 1, 1)) - 1) * 16\n" +
      "    + (strpos('0123456789ABCDEF', substr(ph, 2, 1)) - 1) AS INT)\n" +
      "    AS first_byte\nFROM e"
    require(mm3.endsWith(anchor), "mm3 oracle SQL lost the mm12 anchor")
    mm3.dropRight(anchor.length) +
      """SELECT md5(ph) AS patch_md5,
        |  CAST(length(ph) // 2 AS BIGINT) AS patch_len,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_patches
        |FROM e GROUP BY md5(ph), length(ph)
        |HAVING count(DISTINCT doc_id) >= 2""".stripMargin
  }

  /** Derive the g4 oracle from g2's: keep the unrolled LPA chain and swap
    * the final projection for the per-node boundary aggregate (distinct
    * neighbor labels, external edge mass, bridge verdict). */
  private[graft] def bridgeNodesOracle(g2: String): String = {
    val anchor = graft.oracles.GraphOracles.lpaFinalSelect
    val lf = graft.oracles.GraphOracles.lpaFinalTable
    require(g2.contains(anchor), "g2 oracle SQL lost the g4 anchor")
    g2.replace(anchor,
      s"""SELECT ls.node, ls.lab AS label,
        |  CAST(count(DISTINCT ld.lab) AS BIGINT) AS n_neighbor_labels,
        |  CAST(SUM(e.w) AS BIGINT) AS w_total,
        |  CAST(SUM(CASE WHEN ld.lab <> ls.lab THEN e.w ELSE 0 END)
        |    AS BIGINT) AS w_external,
        |  CAST(SUM(CASE WHEN ld.lab <> ls.lab THEN e.w ELSE 0 END)
        |    AS DOUBLE) / CAST(SUM(e.w) AS DOUBLE) AS external_frac,
        |  count(DISTINCT ld.lab) >= 2 AS is_bridge
        |FROM e JOIN $lf ls ON e.src = ls.node
        |       JOIN $lf ld ON e.dst = ld.node
        |GROUP BY ls.node, ls.lab""".stripMargin)
  }

  /** Derive the mm10 oracle from mm7's: keep the byte→frame→energy chain
    * byte-identical and swap the per-frame projection for the per-media
    * quiet-fraction aggregate (floor 30.0, blank at ≥ 0.9). */
  /** Derive the mm14 oracle from mm7's: keep the hex→sample CTEs and
    * swap the frame aggregation for a per-media clipping aggregate over
    * the per-sample CTE `s` (|sv| ≥ 100 on the ±128 scale; verdict at
    * ≥ 5% clipped). Zero-sample media are naturally absent on both
    * engines. */
  private[graft] def clippingOracle(mm7: String): String = {
    val anchor = "fr AS (SELECT doc_id AS media_id"
    require(mm7.contains(anchor), "mm7 oracle SQL lost the mm14 anchor")
    mm7.substring(0, mm7.indexOf(anchor)) +
      """cl AS (SELECT doc_id AS media_id,
        |    CAST(count(*) AS BIGINT) AS n_samples,
        |    CAST(SUM(CASE WHEN abs(sv) >= 100 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_clipped,
        |    CAST(max(abs(sv)) AS BIGINT) AS peak
        |  FROM s GROUP BY 1)
        |SELECT media_id, n_samples, n_clipped, peak,
        |  CAST(n_clipped AS DOUBLE) / CAST(n_samples AS DOUBLE)
        |    AS clip_frac,
        |  CAST(n_clipped AS DOUBLE) / CAST(n_samples AS DOUBLE)
        |    >= CAST(0.05 AS DOUBLE) AS is_clipped
        |FROM cl""".stripMargin
  }

  private[graft] def silenceReportOracle(mm7: String): String = {
    val anchor = "SELECT media_id, frame_idx, n_samples, energy,\n" +
      "  sqrt(CAST(energy AS DOUBLE) / n_samples) AS rms\nFROM fr"
    require(mm7.endsWith(anchor), "mm7 oracle SQL lost the mm10 anchor")
    mm7.dropRight(anchor.length) +
      """SELECT media_id,
        |  CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(SUM(CASE WHEN sqrt(CAST(energy AS DOUBLE) / n_samples)
        |      < CAST(30.0 AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_quiet,
        |  CAST(SUM(CASE WHEN sqrt(CAST(energy AS DOUBLE) / n_samples)
        |      < CAST(30.0 AS DOUBLE) THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) AS quiet_frac,
        |  CAST(SUM(CASE WHEN sqrt(CAST(energy AS DOUBLE) / n_samples)
        |      < CAST(30.0 AS DOUBLE) THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) >= CAST(0.9 AS DOUBLE) AS is_blank
        |FROM fr GROUP BY media_id""".stripMargin
  }

  /** Derive the d31 oracle from d7's: keep the LSH + recursive-reach chain
    * byte-identical and swap the per-doc projection for the size
    * histogram. */
  private[graft] def clusterSizesOracle(d7: String): String = {
    val anchor = "SELECT doc AS doc_id, min(lab) AS cluster_rep,\n" +
      "  doc = min(lab) AS keep\nFROM reach GROUP BY doc"
    require(d7.endsWith(anchor), "d7 oracle SQL lost the d31 anchor")
    d7.dropRight(anchor.length) +
      """SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
        |  CAST(cluster_size * count(*) AS BIGINT) AS n_docs
        |FROM (SELECT rep, CAST(count(*) AS BIGINT) AS cluster_size
        |      FROM (SELECT doc, min(lab) AS rep FROM reach GROUP BY doc)
        |      GROUP BY rep)
        |GROUP BY cluster_size""".stripMargin
  }

  /** Derive the s17 oracle from s16's: the served set becomes a CTE, the
    * exact above-threshold set is the s4 scan over the SAME `v` CTE, and
    * the result is the per-query left-join recall aggregate (queries
    * with no exact neighbor drop out — no 0/0 rows, matching the Spark
    * side's inner-exact shape). */
  private[graft] def rangeRecallOracle(s16: String): String = {
    val anchor = "SELECT query_id, neighbor_id, cos FROM fx\n" +
      "WHERE cos >= CAST(0.3 AS DOUBLE)"
    require(s16.endsWith(anchor), "s16 oracle SQL lost the s17 anchor")
    s16.dropRight(anchor.length) +
      """, served AS (SELECT query_id, neighbor_id FROM fx
        |  WHERE cos >= CAST(0.3 AS DOUBLE)),
        |ex AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        |  FROM v q JOIN v c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id % 100 = 0),
        |exh AS (SELECT query_id, neighbor_id FROM ex
        |  WHERE cos >= CAST(0.3 AS DOUBLE))
        |SELECT e.query_id,
        |  CAST(count(*) AS BIGINT) AS n_exact,
        |  CAST(SUM(CASE WHEN s.neighbor_id IS NOT NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
        |  CAST(SUM(CASE WHEN s.neighbor_id IS NOT NULL
        |    THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS recall
        |FROM exh e LEFT JOIN served s
        |  ON s.query_id = e.query_id AND s.neighbor_id = e.neighbor_id
        |GROUP BY e.query_id""".stripMargin
  }

  /** Derive the g3 oracle from g2's: keep the whole unrolled LPA chain
    * (byte-identical CTEs) and swap the final projection for the
    * per-community node/edge-mass aggregate. */
  private[graft] def communityStatsOracle(g2: String): String = {
    val anchor = graft.oracles.GraphOracles.lpaFinalSelect
    val lf = graft.oracles.GraphOracles.lpaFinalTable
    require(g2.contains(anchor), "g2 oracle SQL lost the g3 anchor")
    g2.replace(anchor,
      s"""SELECT nn2.lab AS label, nn2.n_nodes, ew.internal_w,
        |  ew.incident_w,
        |  CAST(ew.internal_w AS DOUBLE) / CAST(ew.incident_w AS DOUBLE)
        |    AS internal_frac
        |FROM (SELECT lab, CAST(count(*) AS BIGINT) AS n_nodes
        |      FROM $lf GROUP BY lab) nn2
        |JOIN (SELECT ls.lab,
        |        CAST(SUM(e.w) AS BIGINT) AS incident_w,
        |        CAST(SUM(CASE WHEN ld.lab = ls.lab THEN e.w ELSE 0 END)
        |          AS BIGINT) AS internal_w
        |      FROM e JOIN $lf ls ON e.src = ls.node
        |             JOIN $lf ld ON e.dst = ld.node
        |      GROUP BY ls.lab) ew ON ew.lab = nn2.lab""".stripMargin)
  }

  /** Derive the s16 oracle from s13's: keep the coarse-quantizer chain
    * through `ccand` (training, assignment, probes, self-excluded cell
    * candidates — byte-identical CTEs, so the two oracles cannot drift),
    * drop the PQ/ADC/top-k tail, and score candidates with the exact
    * cosine against the s4 threshold. The ccand CTE is the FIRST
    * "GROUP BY 1, 2)" in the s13 text (the adc CTE's is later). */
  private[graft] def coarseRangeOracle(s13: String): String = {
    val anchor = "GROUP BY 1, 2)"
    val i = s13.indexOf(anchor)
    require(i >= 0, "s13 oracle SQL lost the ccand anchor for s16")
    s13.substring(0, i + anchor.length) + """,
fx AS (SELECT cc.query_id, cc.neighbor_id,
  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
 FROM ccand cc JOIN v q ON q.vec_id = cc.query_id
           JOIN v c ON c.vec_id = cc.neighbor_id)
SELECT query_id, neighbor_id, cos FROM fx
WHERE cos >= CAST(0.3 AS DOUBLE)"""
  }

  /** Derive the s15 oracle from s13's: restrict the four quantizer-TRAINING
    * surfaces (k-means sample, k-means seeds, PQ codebook seeds, PQ
    * one-Lloyd-step members) to the stored split `vec_id % 7 <> 3`, leaving
    * every post-training CTE (full-corpus assignment, probes, ADC, re-rank)
    * untouched — exactly what ivfAdcIndex-on-split + ivfAdcAppend computes.
    * Deriving instead of copying keeps the two oracles in lockstep; each
    * replace REQUIRES its anchor so a future edit to the s13 SQL cannot
    * silently detach this one. */
  private[graft] def restrictTrainingToStoredSplit(s13: String): String = {
    val edits = Seq(
      // k-means training sample (samp CTE)
      "WHERE vec_id % 5 = 0" ->
        "WHERE vec_id % 5 = 0 AND vec_id % 7 <> 3",
      // k-means seeds (c0 CTE)
      "WHERE vec_id % 50 = 0" ->
        "WHERE vec_id % 50 = 0 AND vec_id % 7 <> 3",
      // PQ codebook seeds (seeds CTE)
      "WHERE vec_id % 61 = 0 AND vec_id < 61 * 256" ->
        "WHERE vec_id % 61 = 0 AND vec_id % 7 <> 3 AND vec_id < 61 * 256",
      // PQ one-Lloyd-step members (pd0 CTE feeding pa0/pm1)
      "FROM sub u JOIN seeds se ON u.s = se.s)" ->
        "FROM sub u JOIN seeds se ON u.s = se.s WHERE u.vec_id % 7 <> 3)")
    edits.foldLeft(s13) { case (sql, (anchor, repl)) =>
      require(sql.contains(anchor),
        s"s13 oracle SQL lost the s15 anchor: $anchor")
      sql.replace(anchor, repl)
    }
  }
}
