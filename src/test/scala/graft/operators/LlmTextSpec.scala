package graft.operators

import java.security.MessageDigest

import graft.SparkSpec

import org.apache.spark.sql.functions._

class LlmTextSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("shingles: word 3-grams, distinct, empty under 3 words") {
    val out = Seq("a b c d", "x y", "p p p p")
      .toDF("text")
      .select(LlmText.shingles(col("text")).as("sh"))
      .collect().map(_.getSeq[String](0).toSeq)
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq.empty)
    assert(out(2) == Seq("p p p"), "duplicate shingles deduped")
  }

  test("tokenStats counts ws/distinct/BPE tokens and mean length") {
    val r = Seq((1L, "ab ab cde, 12"))
      .toDF("doc_id", "text")
      .transform(LlmText.tokenStats(_)).head()
    assert(r.getInt(r.fieldIndex("n_tokens")) == 4)
    assert(r.getInt(r.fieldIndex("n_distinct_tokens")) == 3)
    // BPE-ish: [ab][ab][cde][,][12]
    assert(r.getInt(r.fieldIndex("n_bpe_tokens")) == 5)
    // (13 chars - 3 separators) / 4 tokens
    assert(r.getDouble(r.fieldIndex("avg_token_len")) == 10.0 / 4)
  }

  test("langId scores stopwords and argmaxes with fixed tie-break") {
    val out = Seq(
      (1L, "the cat and the dog of a house"),
      (2L, "le chat et la maison de un chien"),
      (3L, "der hund und die katze ist ein tier"))
      .toDF("doc_id", "text")
      .transform(LlmText.langId(_))
      .collect().map(r => r.getLong(0) -> r.getString(r.fieldIndex("pred_lang")))
      .toMap
    assert(out(1L) == "en")
    assert(out(2L) == "fr")
    assert(out(3L) == "de")
  }

  test("qualityScore composes ratios with fixed arithmetic") {
    val text = "the of and in is to a that" // 8 tokens, all en stopwords
    val r = Seq((1L, text, text.length.toLong))
      .toDF("doc_id", "text", "n_chars")
      .transform(LlmText.qualityScore(_)).head()
    assert(r.getDouble(r.fieldIndex("stopword_ratio")) == 1.0)
    assert(r.getDouble(r.fieldIndex("punct_ratio")) == 0.0)
    val mwl = (text.length - 7).toDouble / 8
    val expected = 0.4 * 1.0 + 0.3 * (1.0 - 0.0) + 0.3 * (math.min(mwl, 8.0) / 8.0)
    assert(r.getDouble(r.fieldIndex("quality_score")) == expected)
    assert(r.getBoolean(r.fieldIndex("is_quality")))
  }

  test("fingerprint: content md5 matches MessageDigest; sketch is stable") {
    val text = "alpha beta gamma delta epsilon"
    val r = Seq((1L, text)).toDF("doc_id", "text")
      .transform(LlmText.fingerprint(_)).head()
    assert(r.getString(r.fieldIndex("content_md5")) == md5hex(text))
    val shingleHashes = Seq("alpha beta gamma", "beta gamma delta",
      "gamma delta epsilon").map(s => md5hex("f:" + s))
    assert(r.getString(r.fieldIndex("min_shingle_hash")) == shingleHashes.min)
    assert(r.getString(r.fieldIndex("bottom4_sketch")) ==
      shingleHashes.sorted.mkString("|"))
  }

  test("repetitionSignals: duplicate n-gram fractions and flag") {
    val out = Seq(
      (1L, "spam spam spam spam"),      // all dup words/bigrams/trigrams
      (2L, "all words fully distinct"), // nothing repeats
      (3L, "x"))                        // 1 word: no n-grams, fracs 0
      .toDF("doc_id", "text")
      .transform(LlmText.repetitionSignals(_))
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getDouble(r1.fieldIndex("dup_word_frac")) == 3.0 / 4)
    assert(r1.getDouble(r1.fieldIndex("dup_bigram_frac")) == 2.0 / 3)
    assert(r1.getDouble(r1.fieldIndex("dup_trigram_frac")) == 1.0 / 2)
    assert(r1.getBoolean(r1.fieldIndex("is_repetitive")))
    val r2 = out(2L)
    assert(r2.getDouble(r2.fieldIndex("dup_word_frac")) == 0.0)
    assert(!r2.getBoolean(r2.fieldIndex("is_repetitive")))
    val r3 = out(3L)
    assert(r3.getInt(r3.fieldIndex("n_words")) == 1)
    assert(r3.getDouble(r3.fieldIndex("dup_bigram_frac")) == 0.0)
  }

  test("vocabOov counts out-of-vocabulary tokens against the corpus top-k") {
    val out = Seq(
      (1L, "aa aa aa bb"),   // aa x3, bb x1
      (2L, "aa bb cc"),      // cc is rank 3 → OOV at vocabSize 2
      (3L, "dd dd"))         // dd x2 ties bb(2)... dd wins? see below
      .toDF("doc_id", "text")
      .transform(LlmText.vocabOov(_, vocabSize = 2))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // counts: aa=4, dd=2, bb=2, cc=1 → vocab (count desc, term asc) = {aa, bb}
    assert(out(1L) == (4L, 0L, 0.0))
    assert(out(2L) == (3L, 1L, 1.0 / 3))
    assert(out(3L) == (2L, 2L, 1.0), "dd loses the tie to bb alphabetically")
  }

  test("bm25 favors rare query terms and shorter docs") {
    val out = Seq(
      (1L, "data data data data"),          // high tf, short
      (2L, "data other words here about things and more stuff too"), // low tf, long
      (3L, "rareterm only appears here"),   // rare term → high idf
      (4L, "nothing relevant at all"))
      .toDF("doc_id", "text")
      .transform(LlmText.bm25(_, Seq("data", "rareterm"), k = 10))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val scores = out.toMap
    assert(!scores.contains(4L), "docs without query terms absent")
    assert(scores(3L) > scores(2L), "rare term (df=1) outweighs common hit")
    assert(scores(1L) > scores(2L), "higher tf + shorter doc scores higher")
    // descending, deterministic order
    assert(out.map(_._2).toSeq == out.map(_._2).sortBy(-_).toSeq)
  }

  test("tfidf ranks rare terms above common ones, top-k per doc") {
    val out = Seq(
      (1L, "common rare1 common"),
      (2L, "common rare2"),
      (3L, "common rare3"))
      .toDF("doc_id", "text")
      .transform(LlmText.tfidf(_, k = 2))
      .collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")),
        r.getInt(r.fieldIndex("rank"))) ->
        (r.getString(r.fieldIndex("term")),
          r.getLong(r.fieldIndex("tf")), r.getLong(r.fieldIndex("df")),
          r.getDouble(r.fieldIndex("tfidf"))))
      .toMap
    // doc 1: rare1 tf=1 df=1 → 3.0; common tf=2 df=3 → 2.0
    assert(out((1L, 1)) == ("rare1", 1L, 1L, 3.0))
    assert(out((1L, 2)) == ("common", 2L, 3L, 2.0))
    // doc 2: rare2 3.0 beats common 1.0
    assert(out((2L, 1))._1 == "rare2")
    assert(out((2L, 2))._1 == "common")
    assert(out.size == 6)
  }

  test("piiRedact counts and redacts emails, IPs, phones") {
    val r = Seq((42L, "write to bob@test.io or 192.168.1.1 now"))
      .toDF("doc_id", "text")
      .transform(LlmText.piiRedact(_)).head()
    // 1 email + 1 IP in the text, plus the 2 synthetic emails / 1 IP /
    // 1 phone the enrichment appends
    assert(r.getInt(r.fieldIndex("n_emails")) == 3)
    assert(r.getInt(r.fieldIndex("n_ips")) == 2)
    assert(r.getInt(r.fieldIndex("n_phones")) == 1)
    val red = r.getString(r.fieldIndex("redacted_text"))
    assert(!red.contains("@"), s"emails survived: $red")
    assert(!red.contains("192.168.1.1") && !red.contains("10."), red)
    assert(red.contains("<EMAIL>") && red.contains("<IP>") &&
      red.contains("<PHONE>"))
  }

  test("lineFilter keeps lines with enough words and one long word") {
    // line 1 (8 words) has a 4+-char word → kept; line 2 (8 short words)
    // → dropped; a 3-word doc has one under-length line → dropped
    val out = Seq(
      (1L, "alpha b c d e f g h" + " a b c d e f g h"),
      (2L, "x y z"))
      .toDF("doc_id", "text")
      .transform(LlmText.lineFilter(_))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(r.fieldIndex("n_lines")), r.getInt(r.fieldIndex("n_kept")),
          r.getString(r.fieldIndex("kept_text")))).toMap
    assert(out(1L)._1 == 2 && out(1L)._2 == 1)
    assert(out(1L)._3 == "alpha b c d e f g h")
    assert(out(2L) == ((1, 0, "")))
  }

  test("lineFilter segments in fixed windows, stable under repartition") {
    val d = Seq.tabulate(40)(i =>
      (i.toLong, Seq.tabulate(i + 1)(j => s"word$j").mkString(" ")))
      .toDF("doc_id", "text")
    val a = LlmText.lineFilter(d).collect().map(r => (r.getLong(0),
      r.getInt(1), r.getInt(2))).sortBy(_._1).toSeq
    val b = LlmText.lineFilter(d.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1).toSeq
    assert(a == b)
    // ceil(n/8) lines
    assert(a.forall { case (id, nl, _) => nl == (id + 1 + 7) / 8 })
  }

  test("charDiversity: exact integer collision stats") {
    val r = Seq((1L, "aaab")).toDF("doc_id", "text")
      .transform(LlmText.charDiversity(_)).head()
    assert(r.getLong(r.fieldIndex("n_chars_counted")) == 4)
    assert(r.getLong(r.fieldIndex("n_distinct_chars")) == 2)
    // (3² + 1²) / 4² and 3/4
    assert(r.getDouble(r.fieldIndex("collision_prob")) == 10.0 / 16.0)
    assert(r.getDouble(r.fieldIndex("max_char_frac")) == 3.0 / 4.0)
  }

  test("charDiversity native kernel is bit-equal to the explode twin") {
    val d = Seq(
      (1L, "aaab"),
      (2L, "héllo wörld héllo"),        // multibyte, repeats
      (3L, "日本語 日本語 かな"),        // CJK
      (4L, "x"),
      (5L, "a\nb\rc"))                  // line terminators skipped by '.'
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1).toSeq
    val native = rows(LlmText.charDiversity(d))
    val ref = rows(LlmText.charDiversityReference(d))
    assert(native == ref)
    // the line-terminator doc counts only a, b, c
    assert(native.find(_._1 == 5L).get._2 == 3L)
  }

  test("spanDedup flags 4-word spans shared across documents") {
    val out = Seq(
      (1L, "a b c d e"),   // windows: abcd, bcde
      (2L, "a b c d x"),   // windows: abcd, bcdx — shares abcd with doc 1
      (3L, "p q r s"),     // unique window
      (4L, "x y z"))       // under 4 words → no windows, absent
      .toDF("doc_id", "text")
      .transform(LlmText.spanDedup(_))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(r.fieldIndex("n_windows")),
          r.getLong(r.fieldIndex("n_shared_windows")),
          r.getBoolean(r.fieldIndex("is_dup_heavy")))).toMap
    assert(out(1L) == ((2L, 1L, false)))
    assert(out(2L) == ((2L, 1L, false)))
    assert(out(3L) == ((1L, 0L, false)))
    assert(!out.contains(4L))
  }

  test("removableSpans: surgical removal round-trip leaves no shared spans") {
    // Two docs embed the same 6-word boilerplate run mid-document (3
    // consecutive shared 4-word windows -> ONE maximal span each); doc 3
    // repeats a window WITHIN itself only, which must not count as shared
    // (the threshold is distinct docs, not occurrences).
    val boiler = "all rights reserved by example corp"
    val docs = Seq(
      (1L, s"alpha beta gamma $boiler delta epsilon"),
      (2L, s"one two $boiler three four five"),
      (3L, "repeat me again now repeat me again now"))
      .toDF("doc_id", "text")
    val spans = LlmText.removableSpans(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1: words 1..3 prefix, boilerplate at words 4..9. Shared windows
    // start at 4,5,6 -> span_start 4, len (6-4)+4 = 6. doc 2: prefix 2
    // words -> start 3, len 6.
    assert(spans.toSet == Set((1L, 4L, 6L), (2L, 3L, 6L)),
      s"expected one maximal span per doc, got ${spans.toSeq}")

    // surgical removal: cut exactly [span_start, span_start+span_len) words
    val spanByDoc = spans.groupBy(_._1)
    val cleaned = docs.collect().map { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val words = text.split(" ")
      val kept = spanByDoc.get(id).fold(words) { ss =>
        val cut = ss.flatMap { case (_, st, len) =>
          (st - 1) until (st - 1 + len) }.toSet // 1-based -> 0-based
        words.zipWithIndex.collect { case (w, i) if !cut(i) => w }
      }
      (id, kept.mkString(" "))
    }
    // round-trip: the cleaned corpus has ZERO cross-doc shared windows
    val after = LlmText.spanDedup(cleaned.toSeq.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        r.getLong(r.fieldIndex("n_shared_windows"))).toMap
    assert(after.values.forall(_ == 0L),
      s"removing the reported spans must kill all sharing: $after")
    // and the cut was surgical: the docs kept their unique words
    val keptText = cleaned.toMap
    assert(keptText(1L) == "alpha beta gamma delta epsilon")
    assert(keptText(2L) == "one two three four five")
  }

  test("urlNormalize lowercases, strips port/www/utm/fragment") {
    val out = Seq((0L, "t", "src0"), (1L, "t", "src1"))
      .toDF("doc_id", "text", "source")
      .transform(LlmText.urlNormalize(_))
      .collect().map(r => r.getLong(0) ->
        (r.getString(r.fieldIndex("scheme")),
          r.getString(r.fieldIndex("host")),
          r.getString(r.fieldIndex("registered_domain")),
          r.getString(r.fieldIndex("norm_url")))).toMap
    assert(out(0L) == (("https", "src0.example.com", "example.com",
      "https://src0.example.com/p/0?id=0")))
    assert(out(1L) == (("http", "src1.example.com", "example.com",
      "http://src1.example.com/p/1?id=1")))
  }

  test("scoreWithModel loads the scorer once per partition, not per row") {
    val loads = spark.sparkContext.longAccumulator("scorer-loads")
    val docs = (1L to 40L).map(i => (i, s"doc number $i"))
      .toDF("doc_id", "text").repartition(4)
    val out = LlmText.scoreWithModel(docs, () => {
      loads.add(1) // the expensive model load
      (text: String) => text.length.toDouble
    }).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.size == 40)
    assert(out(7L) == "doc number 7".length.toDouble)
    assert(loads.value == 4, s"one load per partition, got ${loads.value}")
  }

  test("tokenZipf ranks the head by count desc then token, with running share") {
    val out = LlmText.tokenZipf(
      Seq((1L, "b b b a a c"), (2L, "a b d")).toDF("doc_id", "text"), k = 3)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // counts: b=4, a=3, c=1, d=1 over 9 tokens; c beats d on the tie by
    // token order
    assert(out.toSeq == Seq(
      (1, "b", 4L, 4L, 4.0 / 9),
      (2, "a", 3L, 7L, 7.0 / 9),
      (3, "c", 1L, 8L, 8.0 / 9)))
  }

  test("featureHash: portable buckets, counts partition the token stream") {
    def bucket(tok: String): Long =
      java.lang.Long.parseLong(md5hex("fh:" + tok).take(7), 16) % 64
    val out = LlmText.featureHash(
      Seq((1L, "alpha beta alpha"), (2L, "gamma")).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // same token → same bucket, counted; distinct tokens may collide but
    // totals always partition the token stream
    val (ba, bb, bg) = (bucket("alpha"), bucket("beta"), bucket("gamma"))
    assert(out((1L, ba)) == (if (ba == bb) 3L else 2L))
    if (ba != bb) assert(out((1L, bb)) == 1L)
    assert(out((2L, bg)) == 1L)
    assert(out.keys.forall { case (_, b) => b >= 0 && b < 64 })
    assert(out.collect { case ((d, _), n) if d == 1L => n }.sum == 3L)
  }

  test("bigramLm: add-one smoothed corpus model, single-token docs excluded") {
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "z"))
      .toDF("doc_id", "text")
    val out = LlmLm.bigramLm(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // corpus bigrams: "a b"x3, "b a"x1; ctx a=3, b=1; V=2
    // p(a b)=(3+1)/(3+2)=0.8 -> round(ln,5)=-0.22314
    // p(b a)=(1+1)/(1+2)     -> round(ln,5)=-0.40547
    assert(!out.contains(3L)) // one token, no bigrams
    assert(out(2L)._1 == 1L)
    assert(math.abs(out(2L)._2 - -0.22314) < 1e-9)
    assert(out(1L)._1 == 3L)
    assert(math.abs(out(1L)._2 - (-0.22314 * 2 + -0.40547) / 3) < 1e-9)
  }

  test("bigramLmVsRef: held-out docs scored under the reference LM only") {
    // refMod=2: odd doc_ids train the LM, even ones are held out.
    // ref corpus (docs 1, 3): bigrams "a b"x2, "b a"x1; ctx a=2, b=1; V=2
    val docs = Seq((1L, "a b a"), (3L, "a b"),
      (2L, "a b"),    // held out, fully in-distribution
      (4L, "q r"))    // held out, NOTHING seen by the ref LM
      .toDF("doc_id", "text")
    val out = LlmLm.bigramLmVsRef(docs, refMod = 2).collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L)._1 && out(3L)._1 && !out(2L)._1 && !out(4L)._1)
    // in-distribution held-out doc: p(a b) = (2+1)/(2+2) → ln(0.75)
    val lnAB = math.rint(math.log(3.0 / 4.0) * 1e5) / 1e5
    assert(math.abs(out(2L)._3 - lnAB) < 1e-9, s"${out(2L)}")
    // fully-unseen doc: cb=0, UNSEEN CONTEXT cw=0 → p = 1/(0+2) — finite,
    // and strictly less likely than the in-distribution doc
    val lnQR = math.rint(math.log(1.0 / 2.0) * 1e5) / 1e5
    assert(math.abs(out(4L)._3 - lnQR) < 1e-9, s"${out(4L)}")
    assert(out(4L)._3 < out(2L)._3,
      "reference LM must rank off-distribution text below in-distribution")
    // the reference docs themselves score under their own LM (x17 math)
    assert(out(3L)._3 == out(2L)._3,
      "identical text must score identically regardless of split side")
  }

  test("lmScoreBySource pools exact sums, not per-doc means") {
    import spark.implicits._
    // refMod=2: docs 1,3 train the LM; source A holds a long doc and a
    // short one so pooled-vs-mean-of-means actually differ
    val docs = Seq(
      (1L, "a b a b a", "A"), (3L, "a b", "B"),
      (2L, "a b a b a b a b", "A"), (4L, "q r", "B"))
      .toDF("doc_id", "text", "source")
    val out = LlmLm.lmScoreBySource(docs, refMod = 2).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set("A", "B"))
    // per-doc twin: pooled source average = Σ lp_sum / Σ n over its docs
    val perDoc = LlmLm.bigramLmVsRef(docs, refMod = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    def pooled(ids: Seq[Long]): (Long, Double) = {
      val n = ids.map(perDoc(_)._1).sum
      // per-doc avg * n recovers the exact 5-dp grid sum (n is exact)
      val sum = ids.map(i => perDoc(i)._2 * perDoc(i)._1).sum
      (n, sum / n)
    }
    val (na, va) = pooled(Seq(1L, 2L))
    assert(out("A")._1 == 2L && out("A")._2 == na)
    assert(math.abs(out("A")._3 - va) < 1e-9, s"${out("A")} vs $va")
    val (nb, vb) = pooled(Seq(3L, 4L))
    assert(out("B")._2 == nb && math.abs(out("B")._3 - vb) < 1e-9)
  }

  test("gopherRules reports per-rule verdicts and the conjunction") {
    val docs = Seq(
      // 5 words, mwl=4.2, no symbols, all alpha, no dups, 2 stopwords
      (1L, "the whale is quite large"),
      (2L, "the the the the the"),      // dup_frac 0.8 → rule_dup_frac fails
      (3L, "ab cd"))                    // 2 words, 0 stopwords
      .toDF("doc_id", "text")
    val out = LlmText.gopherRules(docs,
      minWords = 3, maxWords = 10, minMwl = 1.0, maxMwl = 8.0,
      maxSymbolRatio = 0.1, minAlphaFrac = 0.8, maxDupFrac = 0.5,
      minStopwords = 1).collect()
      .map(r => r.getLong(0) -> r).toMap
    def b(id: Long, f: String) = out(id).getBoolean(out(id).fieldIndex(f))
    assert(b(1L, "pass"))
    assert(!b(2L, "rule_dup_frac") && !b(2L, "pass"))
    assert(b(2L, "rule_word_count"), "dup doc fails ONLY the dup rule gate")
    assert(!b(3L, "rule_word_count") && !b(3L, "rule_stopwords") && !b(3L, "pass"))
    assert(out(1L).getInt(out(1L).fieldIndex("n_words")) == 5)
  }

  test("charEntropy: uniform histogram hits ln(k), constant string hits 0") {
    import spark.implicits._
    val d = Seq((1L, "aabb"), (2L, "aaaa")).toDF("doc_id", "text")
    val out = LlmText.charEntropy(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // "aabb": H = ln4 − (2·ln2 + 2·ln2)/4 = ln2 (up to the 5-decimal grid)
    assert(out(1L)._1 == 4L)
    assert(math.abs(out(1L)._2 - math.log(2)) < 1e-4, out(1L).toString)
    // one distinct char: the gridded ln(n) terms cancel exactly
    assert(out(2L) == ((4L, 0.0)))
  }

  test("langNgramProfile ranks top bigrams per language") {
    import spark.implicits._
    val d = Seq(
      (1L, "the cat sat", "en"), (2L, "the cat ran", "en"),
      (3L, "le chat", "fr"))
      .toDF("doc_id", "text", "lang")
    val out = LlmText.langNgramProfile(d, k = 2).collect()
      .map(r => (r.getString(0), r.getInt(3)) ->
        (r.getString(1), r.getLong(2))).toMap
    // en bigrams: "the cat"×2, "cat sat"×1, "cat ran"×1 → top-2 =
    // ("the cat", 2), then alphabetical tiebreak ("cat ran", 1)
    assert(out(("en", 1)) == (("the cat", 2L)))
    assert(out(("en", 2)) == (("cat ran", 1L)))
    assert(out(("fr", 1)) == (("le chat", 1L)))
  }

  test("cdcChunks: content-defined boundaries survive a prefix edit") {
    import spark.implicits._
    // The defining CDC property: prepending words to a document must leave
    // the chunk signatures of the unchanged tail intact (fixed-width
    // blocking would shift every block). Compare the chunk signature SETS
    // of a long doc and the same doc with a 6-word prefix: all but O(1)
    // boundary-adjacent signatures are shared.
    val words = (0 until 400).map(i => s"w${i % 97}x$i")
    val tail = words.mkString(" ")
    val edited = "zz0 zz1 zz2 zz3 zz4 zz5 " + tail
    val out = LlmText.cdcChunks(
      Seq((1L, tail), (2L, edited)).toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0),
        (r.getLong(r.fieldIndex("n_windows")),
          r.getLong(r.fieldIndex("chunk_min_hash")),
          r.getLong(r.fieldIndex("chunk_xor")))))
    val sig1 = out.filter(_._1 == 1L).map(_._2).toSet
    val sig2 = out.filter(_._1 == 2L).map(_._2).toSet
    val shared = sig1.intersect(sig2).size
    info(s"chunks: base=${sig1.size} edited=${sig2.size} shared=$shared")
    assert(sig1.size > 10, "divisor 16 must yield many chunks on 400 words")
    assert(shared >= sig1.size - 2,
      "a prefix edit may perturb only the first chunk(s)")
  }

  test("lexicalDiversity computes TTR, hapax fraction, and dominance") {
    val docs = Seq(
      (1L, "a a a b c"),   // 5 tokens, 3 types, hapax {b,c}, max 3
      (2L, "x y"))         // all hapax, uniform
      .toDF("doc_id", "text")
    val out = LlmText.lexicalDiversity(docs).collect()
      .map(r => r.getLong(0) -> (
        r.getLong(r.fieldIndex("n_tokens")),
        r.getLong(r.fieldIndex("n_types")),
        r.getLong(r.fieldIndex("hapax_types")),
        r.getLong(r.fieldIndex("max_count")),
        r.getDouble(r.fieldIndex("ttr")),
        r.getDouble(r.fieldIndex("hapax_frac")),
        r.getDouble(r.fieldIndex("dominance")))).toMap
    assert(out(1L) == (5L, 3L, 2L, 3L, 3.0 / 5, 2.0 / 3, 3.0 / 5))
    assert(out(2L) == (2L, 2L, 2L, 1L, 1.0, 1.0, 0.5))
  }

  test("langIdEval: profiles classify held-out docs; zero hits go to und") {
    // train docs (id % 3 != 0) define the profiles; eval docs (id % 3
    // == 0) classify by hits. Language A says "aa bb", B says "xx yy".
    val docs = Seq(
      (1L, "aa bb aa bb aa bb", "A"),  // train A
      (2L, "xx yy xx yy xx yy", "B"),  // train B
      (3L, "aa bb aa bb", "A"),        // eval → hits A's profile → A
      (6L, "xx yy", "B"),              // eval → B
      (9L, "qq zz qq", "A"))           // eval, no profile hits → und
      .toDF("doc_id", "text", "lang")
    val out = LlmText.langIdEval(docs, k = 4).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("A", "A") -> 1L, ("B", "B") -> 1L, ("A", "und") -> 1L))
  }

  test("sourceDivergence: KL(source||corpus) from grid-exact log terms") {
    // corpus: a:2 b:1 c:1, N=4. Source A's words have csw == cw, so the
    // term sum is 0 and KL_A = ln(4) - ln(3) on the 5-dp grid; source B
    // is a single token: KL_B = ln(4) - ln(1) = ln(4).
    val docs = Seq(
      (1L, "a a b", "A"),
      (2L, "c", "B"))
      .toDF("doc_id", "text", "source")
    val out = LlmText.sourceDivergence(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    val l3 = 1.09861 // round(ln 3, 5)
    val l4 = 1.38629
    assert(out("A") == (3L, 2L, 0.0 / 3 - l3 + l4))
    assert(out("B") == (1L, 1L, 0.0 / 1 - 0.0 + l4))
  }

  // fixture for the BPE family: repeated single-char runs exercise the
  // documented 3-pass non-overlapping replace semantics, 'lrlr' chains a
  // pair so the multi-pass rewrite matters, 'ab' gives a clean merge path
  private def bpeDocs = Seq(
    (1L, "aaaaa", 5L),
    (2L, "lrlr lrlr ab", 12L),
    (3L, "ab ab", 5L))
    .toDF("doc_id", "text", "n_chars")

  test("bpeTrain: greedy merges with deterministic tie-break") {
    val merges = LlmBpe.bpeTrain(bpeDocs, nMerges = 6).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // overlapping pair counts: 'aaaaa' contributes (a,a) 4×; two 'lrlr'
    // words contribute (l,r) 2× each
    assert(merges.toSeq == Seq(
      (1, "a", "a", 4L), (2, "l", "r", 4L), (3, "a", "b", 3L),
      (4, "ab", "</w>", 3L), (5, "lr", "</w>", 2L), (6, "lr", "lr</w>", 2L)))
  }

  test("readability: Flesch from vowel-group syllables, hand-checked") {
    val docs = Seq(
      // 4 words; 2 sentence marks (. !); syllables: hel-lo 2 (e,o),
      // world. 1 (o), it 1, works! 1 → 5
      (1L, "Hello world. It works!"),
      // no sentence punctuation → sentence floor of 1;
      // "xyz" has no aeiouy → syllable floor of 1 per word ("y" IS a
      // vowel here, but xz... "xyz" contains y → 1 group anyway; use a
      // truly vowel-free token)
      (2L, "xz qrst"))
      .toDF("doc_id", "text")
    val out = LlmText.readability(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    val f1 = 206.835 - 1.015 * (4.0 / 2.0) - 84.6 * (5.0 / 4.0)
    assert(out(1L)._1 == 4L && out(1L)._2 == 2L && out(1L)._3 == 5L)
    assert(out(1L)._4 == f1, s"${out(1L)._4} vs $f1")
    // both floors engaged: 2 words, 1 sentence, 2 syllables (1 per word)
    val f2 = 206.835 - 1.015 * (2.0 / 1.0) - 84.6 * (2.0 / 2.0)
    assert(out(2L) == ((2L, 1L, 2L, f2)), s"${out(2L)}")
  }

  test("bpeTrainState: checkpoint cadence leaves merges and words unchanged") {
    // cross the materialize boundary twice (steps 3 and 6): the cadence is
    // a plan-depth knob for production-size vocabularies and must be
    // invisible to the arithmetic — identical merge table, identical final
    // word table vs the never-checkpointing run
    def run(every: Int) = {
      val (merges, state) = LlmBpe.bpeTrainState(bpeDocs, 7, every)
      val words = state.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      state.unpersist()
      (merges, words)
    }
    val (mPlain, wPlain) = run(1000)
    val (mCkpt, wCkpt) = run(3)
    assert(mCkpt == mPlain, s"merge table drifted:\n$mCkpt\n$mPlain")
    assert(wCkpt == wPlain, s"word table drifted:\n$wCkpt\n$wPlain")
  }

  test("bpeVocab: 3-pass replace is non-overlapping left-to-right") {
    val vocab = LlmBpe.bpeVocab(bpeDocs, nMerges = 6).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'a a a a a </w>' merged with (a,a) leaves 'aa a aa </w>': replace
    // scans left-to-right non-overlapping and the trailing space of a hit
    // is consumed, so the middle 'a' survives — the spec pins THIS
    // semantics (greedy subword-nmt would give 'aa aa a'), identical in
    // Spark's UTF8String.replace and DuckDB's replace
    assert(vocab == Map(
      "aa" -> 2L, "a" -> 1L, "</w>" -> 1L, "ab</w>" -> 3L, "lrlr</w>" -> 2L))
  }

  test("bpeDocStats: dictionary-join apply, token totals reconcile") {
    val stats = LlmBpe.bpeDocStats(bpeDocs, nMerges = 6).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    // doc 1: 'aaaaa' → [aa, a, aa, </w>] = 4 tokens
    assert(stats(1L) == (1L, 4L, 5L, 5.0 / 4))
    // doc 2: two 'lrlr' → [lrlr</w>] each, 'ab' → [ab</w>] = 3 tokens
    assert(stats(2L) == (3L, 3L, 12L, 12.0 / 3))
    assert(stats(3L) == (2L, 2L, 5L, 5.0 / 2))
    // corpus reconciliation: per-doc token totals == vocab frequency mass
    val vocabMass = LlmBpe.bpeVocab(bpeDocs, nMerges = 6)
      .agg(sum(col("freq"))).head().getLong(0)
    assert(stats.values.map(_._2).sum == vocabMass)
  }

  // plain-Scala reference BPE trainer: same word counting, pair counting,
  // tie-break, and 3-pass java.lang.String.replace rewrite — an
  // independent execution path (no Spark expressions) that must agree
  // with the engine on any corpus
  private def bpeRef(texts: Seq[String],
      nMerges: Int): Seq[(Int, String, String, Long)] = {
    val wc = texts.flatMap(_.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    var syms: Map[String, (Long, String)] = wc.map { case (w, c) =>
      w -> (c, w.toCharArray.mkString(" ") + " </w>")
    }
    val merges =
      scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (step <- 1 to nMerges) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      for ((_, (c, sym)) <- syms) {
        val parts = sym.split(" ")
        for (i <- 0 until parts.length - 1) {
          val k = (parts(i), parts(i + 1))
          pc(k) = pc.getOrElse(k, 0L) + c
        }
      }
      if (pc.nonEmpty) {
        val ((l, r), c) = pc.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head
        merges += ((step, l, r, c))
        val pat = s" $l $r "
        val rep = s" $l$r "
        syms = syms.map { case (w, (cnt, sym)) =>
          val padded = " " + sym + " "
          w -> (cnt,
            padded.replace(pat, rep).replace(pat, rep).replace(pat, rep)
              .trim)
        }
      }
    }
    merges.toSeq
  }

  test("property: bpeTrain equals the plain-Scala reference on random corpora") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    // tiny alphabet forces repeated chars and chained pairs — exactly the
    // cases where replace-scan semantics could diverge between engines
    val word = Gen.choose(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString))
    val doc = Gen.choose(3, 8).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val corpus = Gen.listOfN(5, doc)
    val prop = forAll(corpus) { texts =>
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val engine = LlmBpe.bpeTrain(df, nMerges = 4).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSeq
      Prop(engine == bpeRef(texts, 4))
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, result.status.toString)
  }

  test("bpeTrain is partition-invariant (order-independent pair counts)") {
    val base = LlmBpe.bpeTrain(bpeDocs, nMerges = 6).collect().toSeq
    for (p <- Seq(1, 3, 7)) {
      val alt = LlmBpe.bpeTrain(bpeDocs.repartition(p), nMerges = 6)
        .collect().toSeq
      assert(alt == base, s"partitions=$p drifted")
    }
  }

  test("tokenizerFertility: per-lang totals reconcile with per-doc stats") {
    import org.apache.spark.sql.functions.lit
    // doc 1 tokenizes worst (5 chars → 4 tokens of 1 word); langs split
    // the same corpus the per-doc stats run on
    val docs = bpeDocs.withColumn("lang",
      when(col("doc_id") === 1L, lit("aa")).otherwise(lit("xx")))
    val out = LlmBpe.tokenizerFertility(docs, nMerges = 6).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    // from the bpeDocStats hand values: doc1 = 1 word / 4 tokens;
    // docs 2+3 = 5 words / 5 tokens
    assert(out("aa") == ((1L, 1L, 4L, 4.0)), s"$out")
    assert(out("xx") == ((2L, 5L, 5L, 1.0)), s"$out")
    // reconciliation against the per-doc rollup
    val perDoc = LlmBpe.bpeDocStats(bpeDocs, nMerges = 6).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out("aa")._3 == perDoc(1L))
    assert(out("xx")._3 == perDoc(2L) + perDoc(3L))
  }

  test("bpeDocStatsVsDict: stored dictionary equals the retrain path") {
    // train-once artifact survives a parquet round-trip and tokenizes
    // identically to the retrain-per-call path (x27 vs x28 parity)
    val dir = java.nio.file.Files
      .createTempDirectory("bpe-dict-").toString + "/dict"
    LlmBpe.bpeDictionary(bpeDocs, nMerges = 6).write.parquet(dir)
    val stored = spark.read.parquet(dir)
    val viaDict = LlmBpe.bpeDocStatsVsDict(bpeDocs, stored).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(_._1).toSeq
    val retrain = LlmBpe.bpeDocStats(bpeDocs, nMerges = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(_._1).toSeq
    assert(viaDict == retrain)
  }

  test("pmiCollocations: planted phrase tops the head, floor excludes rare pairs") {
    // "new york" always co-occurs (6 times); filler words are frequent but
    // pair randomly; "rare gem" appears twice — below the count floor
    val corpus = Seq(
      (1L, "new york is big and the city of new york is loud"),
      (2L, "people in new york like the city and new york parks"),
      (3L, "new york has the best parks and the best food"),
      (4L, "rare gem here and the city has a rare gem too"),
      (5L, "the city and the parks and the food are good"))
      .toDF("doc_id", "text")
    val out = LlmText.pmiCollocations(corpus, k = 10, minPairCount = 5)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(5))))
    val byPair = out.toMap
    assert(byPair.contains(("new", "york")), s"planted phrase missing: $out")
    assert(byPair(("new", "york"))._1 == 5L)
    assert(!byPair.contains(("rare", "gem")),
      "pair below the count floor must not appear")
    // perfectly-associated planted phrase outranks the common-word pairs
    assert(out.head._1 == (("new", "york")), s"head is ${out.head}")
    // reference PMI on the same decimal grid
    def l5(c: Long): BigDecimal =
      BigDecimal(math.log(c.toDouble))
        .setScale(5, BigDecimal.RoundingMode.HALF_UP)
    val toks = corpus.collect().flatMap(_.getString(1).split(" "))
    val n = toks.length.toLong
    val bTot = corpus.collect()
      .map(_.getString(1).split(" ").length - 1).sum.toLong
    val ca = toks.count(_ == "new").toLong
    val cb = toks.count(_ == "york").toLong
    val expect =
      (l5(5L) - l5(bTot) - l5(ca) + l5(n) - l5(cb) + l5(n)).toDouble
    assert(byPair(("new", "york"))._2 == expect,
      s"pmi drifted: ${byPair(("new", "york"))._2} vs $expect")
  }

  test("vocabGrowth: per-bucket new types and exact running sums") {
    val corpus = Seq(
      (0L, "a b c"),        // bucket 0: 3 tokens, 3 new types
      (1L, "a b d"),        // +3 tokens, 1 new type (d)
      (2L, "a a a"),        // +3 tokens, 0 new
      (5L, "e f"))          // bucket 2 (width 2): 2 tokens, 2 new
      .toDF("doc_id", "text")
    val out = LlmText.vocabGrowth(corpus, bucketDocs = 2L).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(0L) == (6L, 4L, 6L, 4L), s"bucket 0: $out")
    assert(out(1L) == (3L, 0L, 9L, 4L))
    assert(out(2L) == (2L, 2L, 11L, 6L))
  }

  test("codeSwitch flags the half-and-half doc, not monolingual ones") {
    // two "languages" with disjoint vocabularies; profiles train on the
    // labeled corpus itself
    val en = "the cat sat on the mat and the dog ran off"
    val fr = "le chat dort sur le tapis et le chien court vite"
    val corpus = Seq(
      (1L, en, "en"), (2L, en + " again today", "en"),
      (3L, fr, "fr"), (4L, fr + " encore maintenant", "fr"),
      // half en, half fr — doc-level argmax hides it; halves disagree
      (5L, "the cat sat on the mat le chat dort sur le tapis", "en"),
      (6L, "xx", "en")) // 1 word → both halves und, never flags
      .toDF("doc_id", "text", "lang")
    val out = LlmText.codeSwitch(corpus).collect()
      .map(r => r.getLong(0) ->
        (r.getString(2), r.getString(3), r.getBoolean(4))).toMap
    assert(out(1L) == ("en", "en", false), s"$out")
    assert(out(3L) == ("fr", "fr", false))
    assert(out(5L) == ("en", "fr", true), s"mixed doc must flag: $out")
    assert(out(6L) == ("und", "und", false))
  }

  test("qualityQuantiles: exact order statistics per source") {
    // source A: 4 docs with strictly increasing quality (more stopwords);
    // ranks for p=(0.25,0.5,0.75) over n=4 are ceil(1,2,3)
    val corpus = Seq(
      (1L, "zz qq ww rr", "A"),
      (2L, "the cat runs far", "A"),
      (3L, "the cat is in the house", "A"),
      (4L, "the cat is in the house and that is a thing", "A"),
      (5L, "one lone doc here", "B"))
      .toDF("doc_id", "text", "source")
    val out = LlmText.qualityQuantiles(corpus).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val scores = corpus
      .select(col("doc_id"),
        LlmText.qualityScoreExpr(col("text")).as("qs"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val aSorted = Seq(1L, 2L, 3L, 4L).map(scores).sorted
    assert(out(("A", 0.25)) == aSorted(0), s"$out vs $aSorted")
    assert(out(("A", 0.5)) == aSorted(1))
    assert(out(("A", 0.75)) == aSorted(2))
    // a single-doc source reports its one score at every p
    assert(Seq(0.25, 0.5, 0.75).forall(p => out(("B", p)) == scores(5L)))
  }

  test("noveltyScore: first doc introduces everything, a copy introduces nothing") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),  // 3 shingles, all novel
      (2L, "alpha beta gamma delta epsilon"),  // exact copy → 0 novel
      (3L, "alpha beta gamma zeta eta theta"), // shares "alpha beta gamma"
      (4L, "xx yy"))                           // < 3 words → no row
      .toDF("doc_id", "text")
    val out = LlmText.noveltyScore(corpus).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(1L) == (3L, 3L, 1.0))
    assert(out(2L) == (3L, 0L, 0.0))
    assert(out(3L) == (4L, 3L, 0.75),
      s"doc 3: one inherited shingle, three novel: ${out(3L)}")
    assert(!out.contains(4L))
  }

  test("charClassProfile: per-source class counts and encoding flags") {
    val d = Seq(
      (1L, "Ab 12", "clean"),
      (2L, "okok", "dirty"),   // one C0 control byte
      (3L, "b�d", "dirty"))     // one replacement character
      .toDF("doc_id", "text", "source")
    val out = LlmText.charClassProfile(d).collect()
      .map(r => r.getString(0) -> r).toMap
    val c = out("clean")
    assert((c.getLong(1), c.getLong(2)) == ((1L, 5L)), s"$c")
    // "Ab 12": 1 lower, 1 upper, 2 digits, 1 space, nothing suspicious
    assert((c.getLong(3), c.getLong(4), c.getLong(5), c.getLong(6),
      c.getLong(7), c.getLong(8)) == ((1L, 1L, 2L, 1L, 0L, 0L)), s"$c")
    assert(c.getDouble(9) == 0.2 && c.getDouble(10) == 0.2, s"$c")
    assert(!c.getBoolean(11), "clean source must not be flagged")
    val x = out("dirty")
    // 2 docs, 8 chars, 6 lowercase, one control + one replacement
    assert((x.getLong(1), x.getLong(2), x.getLong(3)) == ((2L, 8L, 6L)))
    assert((x.getLong(7), x.getLong(8)) == ((1L, 1L)), s"$x")
    assert(x.getDouble(9) == 0.75 && x.getDouble(10) == 0.0, s"$x")
    assert(x.getBoolean(11), "control/replacement chars must flag")
  }

  test("vocabCoverage: cumulative token mass of the top-N vocabulary") {
    // counts a:3 b:2 c:1 (total 6) — coverage 3/6, 5/6, 6/6
    val d = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val out = LlmText.vocabCoverage(d, ns = Seq(1, 2, 3)).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1) == ((3L, 6L, 0.5)), s"$out")
    assert(out(2) == ((5L, 6L, 5.0 / 6.0)), s"$out")
    assert(out(3) == ((6L, 6L, 1.0)), s"$out")
  }

  test("vocabCoverage breaks count ties by token (deterministic head)") {
    // b and c tie at 2; with N=2 the head is {a, b} — b wins the tie
    // alphabetically, so coverage is (3+2)/7 regardless of partitioning
    val d = Seq((1L, "a a a c c b b")).toDF("doc_id", "text")
    def run(parts: Int) = LlmText.vocabCoverage(
      d.repartition(parts), ns = Seq(2)).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(3))).toSeq
    val one = run(1)
    assert(one == Seq((2, 5L, 5.0 / 7.0)), s"$one")
    assert(run(7) == one, "partitioning changed the tie-broken head")
  }

  test("crossDocNgrams: shared shingle mass counted per source, " +
    "singleton shingles don't count, short docs still counted in n_docs") {
    val docs = Seq(
      // doc 1 and 2 share the shingle "a b c" (cross-source)
      (1L, "a b c x y", "web"),
      (2L, "a b c p q", "wiki"),
      // unique content — contributes shingles but none duplicated
      (3L, "m n o r s", "web"),
      // under 3 words: zero shingles, still a doc of its source
      (4L, "hi there", "wiki"))
      .toDF("doc_id", "text", "source")
        .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
        .withColumn("n_chars",
          org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.col("text")).cast("long"))
    val out = LlmText.crossDocNgrams(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // web: docs 1+3 → 3+3 = 6 shingle occurrences, 1 duplicated ("a b c"),
    // 1 affected doc
    assert(out("web") == ((2L, 6L, 1L, 1L, 1.0 / 6.0)), s"$out")
    // wiki: doc 2 has 3 occurrences (1 dup) and doc 4 has none
    assert(out("wiki") == ((2L, 3L, 1L, 1L, 1.0 / 3.0)), s"$out")
  }
}
