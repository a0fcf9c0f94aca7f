package graft.operators

import java.security.MessageDigest

import graft.SparkSpec
import graft.operators.Multimodal.{FakeDecoder, MediaRecord}

class MultimodalSpec extends SparkSpec {

  private def md5hex(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString

  private val rec = MediaRecord(7L, Array[Byte](0, 10, 20, 30), "png", 2, 2)

  test("FakeDecoder features are exact functions of the bytes") {
    val f = FakeDecoder.decode(rec)
    assert(f.media_id == 7L)
    assert(f.n_bytes == 4L)
    assert(f.n_frames == 1L)
    assert(f.mean_byte == 15.0)
    assert(f.first_byte == 0)
  }

  test("decodeFeatures maps partitions with one decoder per partition") {
    implicit val s = spark
    import s.implicits._
    val ds = Seq(rec, rec.copy(media_id = 8L, media = Array.fill(600)(1: Byte)))
      .toDS().repartition(2)
    val out = Multimodal.decodeFeatures(ds, () => FakeDecoder)
      .collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq == Seq(7L, 8L))
    assert(out(1).n_frames == 3L) // ceil(600/256)
    assert(out(1).mean_byte == 1.0)
  }

  test("sampleFrames explodes every stride-th byte with frame index") {
    implicit val s = spark
    import s.implicits._
    val ds = Seq(MediaRecord(1L, Array[Byte](5, 6, 7, 8, 9), "wav", 0, 0)).toDS()
    val frames = Multimodal.sampleFrames(ds, stride = 2)
      .collect().map(r => (r.getInt(1), r.getInt(2))).sortBy(_._1)
    assert(frames.toSeq == Seq((0, 5), (1, 7), (2, 9)))
  }

  test("resize stride-samples the payload deterministically") {
    assert(Multimodal.resize(Array[Byte](1, 2, 3, 4, 5), 2).toSeq ==
      Seq[Byte](1, 3, 5))
    assert(Multimodal.resize(null, 2) == null)
  }

  test("decodedFeatures runs the typed decode pipeline over documents") {
    import spark.implicits._
    val docs = Seq((0L, "hello"), (1L, "x" * 300)).toDF("doc_id", "text")
    val out = Multimodal.decodedFeatures(docs)
      .collect().map(r => r.getLong(r.fieldIndex("doc_id")) ->
        (r.getString(r.fieldIndex("format")), r.getLong(r.fieldIndex("n_bytes")),
          r.getLong(r.fieldIndex("n_frames")))).toMap
    assert(out(0L) == ("png", 5L, 1L))
    assert(out(1L) == ("jpeg", 300L, 2L))
  }

  test("frameSample: documents-facing wrapper samples every stride-th byte") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghijklmnopqrstuvwxyz0123456789")) // 36 bytes
      .toDF("doc_id", "text")
    val rows = Multimodal.frameSample(docs, stride = 16).collect()
      .map(r => (r.getInt(r.fieldIndex("frame_idx")),
        r.getInt(r.fieldIndex("frame_byte")))).sortBy(_._1)
    // bytes at offsets 0, 16, 32 → 'a', 'q', '6'
    assert(rows.toSeq == Seq((0, 'a'.toInt), (1, 'q'.toInt), (2, '6'.toInt)))
  }

  test("patchExtract tiles payload bytes into fixed-size patches") {
    import spark.implicits._
    // 70 bytes at 32 bytes/patch → patches of 32, 32, 6
    val text = ("a" * 32) + ("b" * 32) + ("c" * 6)
    val docs = Seq((1L, text), (2L, "")).toDF("doc_id", "text")
    val rows = Multimodal.patchExtract(docs).collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")),
        r.getInt(r.fieldIndex("patch_idx")),
        r.getLong(r.fieldIndex("patch_len")),
        r.getInt(r.fieldIndex("first_byte"))))
      .sortBy(t => (t._1, t._2))
    // empty payload → zero patches; 70-byte payload → exactly 3
    assert(rows.map(_._1).toSeq == Seq(1L, 1L, 1L))
    assert(rows.map(_._3).toSeq == Seq(32L, 32L, 6L))
    assert(rows.map(_._4).toSeq == Seq('a'.toInt, 'b'.toInt, 'c'.toInt))
  }

  test("mediaFeatures: oracle-mirrored projection over documents") {
    import spark.implicits._
    val text = "x" * 300
    val df = Seq((2L, text)).toDF("doc_id", "text")
    val r = Multimodal.mediaFeatures(df).head()
    assert(r.getString(r.fieldIndex("format")) == "wav") // (2 % 4) + 1 → 3rd
    assert(r.getLong(r.fieldIndex("media_len")) == 300L)
    assert(r.getString(r.fieldIndex("media_md5")) == md5hex(text.getBytes("UTF-8")))
    assert(r.getString(r.fieldIndex("thumb_md5")) ==
      md5hex(("x" * 64).getBytes("UTF-8")))
    assert(r.getLong(r.fieldIndex("n_frames")) == 2L) // (300+255)/256
  }

  test("resizeThumbs: stride-4 thumbnail sizes and byte-exact md5") {
    import spark.implicits._
    val text = "abcdefghij" // 10 bytes → thumb = bytes at 0,4,8 = a,e,i
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val r = Multimodal.resizeThumbs(df).head()
    assert(r.getLong(r.fieldIndex("n_bytes")) == 10L)
    assert(r.getLong(r.fieldIndex("thumb_bytes")) == 3L)
    // the md5 runs over the CONCATENATED HEX PAIRS of the sampled bytes
    // (the cross-engine string form mm3/mm4 use), uppercase like hex()
    val hexThumb = Array('a', 'e', 'i')
      .map(c => f"${c.toInt}%02X").mkString
    assert(r.getString(r.fieldIndex("thumb_md5")) ==
      md5hex(hexThumb.getBytes("UTF-8")))
  }

  test("phashPairs finds same-payload media and skips short payloads") {
    import spark.implicits._
    // deterministic 300-byte payloads with varied adjacent gradients
    val base = (0 until 300).map(i => ('a' + (i * 7 + i / 3) % 26).toChar)
      .mkString
    val other = (0 until 300).map(i => ('a' + (i * 11 + 5) % 26).toChar)
      .mkString
    val docs = Seq(
      (1L, base),            // identical pair 1-2 → hamming 0
      (2L, base),
      (3L, other),           // different gradients
      (4L, base.take(100)))  // < 241 bytes → excluded entirely
      .toDF("doc_id", "text")
    val pairs = Multimodal.phashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) == 0)
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L),
      "short payloads never hash")
    assert(pairs.values.forall(_ <= 6))
  }

  test("phashHammingHistogram buckets the verified pairs by distance") {
    import spark.implicits._
    val base = (0 until 300).map(i => ('a' + (i * 7 + i / 3) % 26).toChar)
      .mkString
    val docs = Seq((1L, base), (2L, base), (3L, base))
      .toDF("doc_id", "text")
    // three identical payloads → C(3,2) = 3 pairs, all at hamming 0
    val hist = Multimodal.phashHammingHistogram(docs).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(hist == Map(0 -> 3L), s"$hist")
    // histogram mass equals the pair count for any fixture
    val pairs = Multimodal.phashPairs(docs).count()
    assert(hist.values.sum == pairs)
  }

  test("phashVsIndex: cross-set hits via a parquet-stored signature table") {
    import spark.implicits._
    val base = (0 until 300).map(i => ('a' + (i * 7 + i / 3) % 26).toChar)
      .mkString
    val other = (0 until 300).map(i => ('a' + (i * 11 + 5) % 26).toChar)
      .mkString
    val known = Seq((1L, base), (2L, other)).toDF("doc_id", "text")
    // incoming: an exact re-upload of known doc 1 under a fresh id, and
    // an unrelated payload
    val inc = Seq((100L, base), (101L, other.reverse))
      .toDF("doc_id", "text")
    val idx = Multimodal.phashIndex(known)
    // the index is a plain lake table: round-trip it
    val dir = java.nio.file.Files.createTempDirectory("phidx-").toString
    idx.sigs.write.parquet(s"$dir/sigs")
    val stored = Multimodal.PhashIndex(spark.read.parquet(s"$dir/sigs"))
    def run(ix: Multimodal.PhashIndex) =
      Multimodal.phashVsIndex(inc, ix).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val out = run(idx)
    assert(out == run(stored), "stored signatures must behave identically")
    assert(out.get((100L, 1L)).contains(0),
      s"re-uploaded payload found at hamming 0: $out")
    assert(!out.keySet.exists(_._1 == 101L) ||
      out.filter(_._1._1 == 101L).values.forall(_ <= 6))
  }

  test("silenceReport: quiet-frame fraction and blank verdict, hand values") {
    import spark.implicits._
    // '~' = 126 → sample -2 → rms 2 (quiet); 'a' = 97 → -31 → rms 31
    val docs = Seq(
      (1L, "~" * 70),           // both frames quiet → blank
      (2L, "a" * 70),           // rms 31 ≥ floor → never quiet
      (3L, "~" * 64 + "a" * 6)) // frame 0 quiet, frame 1 not → 0.5
      .toDF("doc_id", "text")
    val out = Multimodal.silenceReport(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out(1L) == ((2L, 2L, 1.0, true)), s"${out(1L)}")
    assert(out(2L) == ((2L, 0L, 0.0, false)), s"${out(2L)}")
    assert(out(3L) == ((2L, 1L, 0.5, false)), s"${out(3L)}")
  }

  test("frameEnergy: per-frame PCM energy, short last frame, hand value") {
    import spark.implicits._
    // 70 'a' bytes → frame 0 has 64 samples, frame 1 has 6
    val docs = Seq((1L, "a" * 70), (2L, "")).toDF("doc_id", "text")
    val out = Multimodal.frameEnergy(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val s = 'a'.toInt - 128 // -31
    assert(out((1L, 0L)) == (64L, 64L * s * s,
      math.sqrt((64L * s * s).toDouble / 64)))
    assert(out((1L, 1L)) == (6L, 6L * s * s,
      math.sqrt((6L * s * s).toDouble / 6)))
    assert(!out.keySet.exists(_._1 == 2L), "empty payload emits no frames")
  }

  test("clippingReport: full-scale pileup counted, peak tracked, verdict") {
    import spark.implicits._
    // 'a' = 97 → |s| 31 (clean); '\n' = 10 → |s| 118 ≥ 100 (clipped);
    // 'ÿ' encodes as UTF-8 0xC3 0xBF → |s| 67, 63 (clean, peak 67)
    val docs = Seq(
      (1L, "a" * 100),               // nothing at full scale
      (2L, "a" * 90 + "\n" * 10),    // 10% clipped → verdict true
      (3L, "a" * 99 + "\n"),         // 1% clipped → under the 5% bar
      (4L, ""))                      // zero samples → absent
      .toDF("doc_id", "text")
    val out = Multimodal.clippingReport(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getBoolean(5)))).toMap
    assert(out(1L) == ((100L, 0L, 31L, 0.0, false)), s"${out(1L)}")
    assert(out(2L) == ((100L, 10L, 118L, 0.1, true)), s"${out(2L)}")
    assert(out(3L) == ((100L, 1L, 118L, 0.01, false)), s"${out(3L)}")
    assert(!out.contains(4L), s"zero-sample media must be absent: $out")
  }

  test("motionProfile: constant payload is flat, a byte jump is a cut") {
    import spark.implicits._
    // doc 1: three 64-byte frames of constant 'a' → two deltas of 0, no
    // cuts; doc 2: 64 'a' then 64 'z' → one delta |rms_z - rms_a|;
    // doc 3: single frame → no delta row at all
    val docs = Seq((1L, "a" * 192), (2L, "a" * 64 + "z" * 64),
      (3L, "a" * 10)).toDF("doc_id", "text")
    val out = Multimodal.motionProfile(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))).toMap
    assert(out(1L) == ((2L, 0.0, 0.0, 0L)), s"${out.get(1L)}")
    val rmsA = math.abs('a'.toInt - 128).toDouble // constant bytes: |s|
    val rmsZ = math.abs('z'.toInt - 128).toDouble
    val jump = math.abs(rmsZ - rmsA) // |6 − 31| = 25 — below the 40 bar
    val (n2, mean2, max2, cuts2) = out(2L)
    assert(n2 == 1L && cuts2 == 0L, s"${out(2L)}")
    assert(math.abs(max2 - jump) < 1e-9 && math.abs(mean2 - jump) < 1e-9)
    assert(!out.contains(3L), "single-frame media has no motion row")
    // a real scene cut (constant 0x20 -> constant 0xFF region via chars)
    val cut = Seq((9L, " " * 64 + "~" * 64)).toDF("doc_id", "text")
    val r9 = Multimodal.motionProfile(cut, cutBar = 50.0).collect().head
    assert(r9.getLong(4) == 1L, s"$r9") // rms 96 -> 2: delta 94 > 50
  }

  test("duplicatePatches finds the exact tile shared across documents") {
    import spark.implicits._
    // docs 1 and 2 share the first 32-byte tile; their second tiles
    // differ, and doc 3 shares nothing — only the shared tile reaches
    // the minDocs gate (whole-file dedup would see three distinct files)
    val docs = Seq(
      (1L, ("a" * 32) + ("b" * 32)),
      (2L, ("a" * 32) + ("c" * 32)),
      (3L, "d" * 64))
      .toDF("doc_id", "text")
    val out = Multimodal.duplicatePatches(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // patch hash runs over the hex-pair string form (mm3's cross-engine
    // byte representation): 'a' = 0x61 → "61" * 32
    val sharedMd5 = md5hex(("61" * 32).getBytes("UTF-8"))
    assert(out.toSeq == Seq((sharedMd5, 32L, 2L, 2L)), s"${out.toSeq}")
  }

  test("duplicatePatches counts within-doc repeats once per doc") {
    import spark.implicits._
    // the tile repeats twice inside doc 1 and once in doc 2:
    // n_docs = 2 (distinct), n_patches = 3 (occurrences)
    val docs = Seq(
      (1L, ("a" * 32) + ("a" * 32)),
      (2L, ("a" * 32) + ("z" * 32)))
      .toDF("doc_id", "text")
    val out = Multimodal.duplicatePatches(docs).collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((2L, 3L)), s"${out.toSeq}")
  }

  test("formatDupRate: near-dup membership rolled up per media format") {
    import spark.implicits._
    // the phashPairs fixture: docs 1/2 identical payloads → the one
    // near-dup pair; doc 3 distinct; doc 4 too short to hash at all.
    // formats are the deterministic doc_id%4 catalog tags
    val base = (0 until 300).map(i => ('a' + (i * 7 + i / 3) % 26).toChar)
      .mkString
    val other = (0 until 300).map(i => ('a' + (i * 11 + 5) % 26).toChar)
      .mkString
    val docs = Seq(
      (1L, base), (2L, base), (3L, other), (4L, base.take(100)))
      .toDF("doc_id", "text")
    val out = Multimodal.formatDupRate(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 1 → jpeg, doc 2 → wav (both in the dup pair); doc 3 → mp4,
    // doc 4 → png (clean) — each format has exactly one item here
    assert(out("jpeg") == ((1L, 1L, 1.0)), s"$out")
    assert(out("wav") == ((1L, 1L, 1.0)), s"$out")
    assert(out("mp4") == ((1L, 0L, 0.0)), s"$out")
    assert(out("png") == ((1L, 0L, 0.0)), s"$out")
  }

  test("mixAllocation: byte-proportional budgets sum exactly to the " +
    "budget; bigger cells get proportionally more") {
    import spark.implicits._
    // doc_id % 4 picks the format; text length is the byte mass
    val docs = Seq(
      (0L, "x" * 100, "a"),   // png, 100 bytes
      (1L, "x" * 300, "a"),   // jpeg, 300 bytes
      (4L, "x" * 100, "b"))   // png, 100 bytes
      .toDF("doc_id", "text", "source")
    val out = Multimodal.mixAllocation(docs, budget = 500L).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.values.map(_._3).sum == 500L, s"$out")
    // masses 100/300/100 of 500 total → exact fifths of the budget
    assert(out(("a", "png")) == ((1L, 100L, 100L)), s"$out")
    assert(out(("a", "jpeg")) == ((1L, 300L, 300L)), s"$out")
    assert(out(("b", "png")) == ((1L, 100L, 100L)), s"$out")
  }
}
