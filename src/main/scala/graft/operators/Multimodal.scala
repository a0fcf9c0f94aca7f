package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, plus decode / feature-extract / frame-sample over them.
  *
  * The container has no image/audio codecs, so [[MediaDecoder]] is the
  * pluggable decode seam and [[FakeDecoder]] a deterministic stand-in; the
  * Spark-side contract — binary column + metadata struct, mapPartitions
  * batch shape, one decoder instance per partition (never per row) — is the
  * real, tested part. At 100 TB the binary column stays columnar in parquet,
  * scans prune to (id, meta) unless `media` is selected, and decode
  * parallelism is just input splits.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata, the multimodal analog of
    * the documents table. */
  case class MediaRecord(
      media_id: Long,
      media: Array[Byte],
      format: String,
      width: Int,
      height: Int)

  case class MediaFeatures(
      media_id: Long,
      format: String,
      n_bytes: Long,
      n_frames: Long,
      mean_byte: Double,
      first_byte: Int)

  /** Decode seam: real deployments plug a codec; one instance is created per
    * partition inside mapPartitions so native handles are reused across the
    * batch, not per record. */
  trait MediaDecoder extends Serializable {
    def decode(m: MediaRecord): MediaFeatures
  }

  /** Deterministic fake decoder (no codecs in this environment): features
    * are pure functions of the bytes so tests have exact expectations. */
  object FakeDecoder extends MediaDecoder {
    def decode(m: MediaRecord): MediaFeatures = {
      val n = m.media.length.toLong
      val sum = m.media.foldLeft(0L)((a, b) => a + (b & 0xff))
      MediaFeatures(m.media_id, m.format, n, (n + 255) / 256,
        if (n == 0) 0.0 else sum.toDouble / n,
        if (n == 0) -1 else m.media(0) & 0xff)
    }
  }

  /** Distributed decode: one decoder per partition, streaming iterator in /
    * iterator out (no per-partition materialization). */
  def decodeFeatures(ds: Dataset[MediaRecord], mk: () => MediaDecoder)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      val dec = mk()
      it.map(dec.decode)
    }
  }

  /** Frame sampling: every `stride`-th byte as a "frame" payload — the
    * plumbing shape of video frame extraction (explode to one row per
    * frame, order index attached). */
  def sampleFrames(ds: Dataset[MediaRecord], stride: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    ds.flatMap { m =>
      m.media.indices.by(stride).map(i =>
        (m.media_id, i / stride, m.media(i) & 0xff))
    }.toDF("media_id", "frame_idx", "frame_byte")
  }

  /** "Resize": stride-sampled thumbnail bytes — the byte-level stand-in for
    * image downscaling (same plumbing shape: binary in, smaller binary out,
    * pure function, no shuffle). */
  def resize(media: Array[Byte], stride: Int): Array[Byte] =
    if (media == null) null
    else media.indices.by(stride).map(media).toArray

  /** Typed decode pipeline over the documents table: text → MediaRecord
    * (utf-8 payload, deterministic fake metadata) → FakeDecoder features.
    * The mapPartitions batch shape is the real contract — swap FakeDecoder
    * for a codec-backed MediaDecoder in production. Fully oracle-checked:
    * the mm2 oracle reconstructs every byte from a hex dump
    * (nibble-by-nibble) in SQL, so the decoded features hash-match. */
  def decodedFeatures(documents: DataFrame): DataFrame = {
    implicit val spark: SparkSession = documents.sparkSession
    decodeFeatures(toMediaRecords(documents), () => FakeDecoder)
      .toDF()
      .withColumnRenamed("media_id", "doc_id")
  }

  /** Documents lifted into the typed media shape shared by the decode (mm2)
    * and frame-sample (mm4) pipelines: payload = UTF-8 bytes, format cycled
    * from doc_id — deterministic, so oracles reconstruct it byte-for-byte. */
  def toMediaRecords(documents: DataFrame): Dataset[MediaRecord] = {
    implicit val spark: SparkSession = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("doc_id"), col("text"),
        pmod(col("doc_id"), lit(4)).cast("int").as("f"))
      .as[(Long, String, Int)]
      .map { case (id, text, f) =>
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        MediaRecord(id, bytes, Seq("png", "jpeg", "wav", "mp4")(f),
          width = bytes.length, height = 1)
      }
  }

  /** Frame sampling as a driver-facing query (mm4): every `stride`-th
    * payload byte as a "frame" row — the video-pipeline explode shape
    * (media → ordered frame rows → per-frame encoder), with bounded fanout
    * n_bytes/stride and no shuffle. Oracle-exact: each sampled byte is
    * reconstructed from the hex dump in SQL. */
  def frameSample(documents: DataFrame, stride: Int = 16): DataFrame = {
    implicit val spark: SparkSession = documents.sparkSession
    sampleFrames(toMediaRecords(documents), stride)
  }

  /** Fixed-size patch extraction (mm3): the ViT-style tiling step — media
    * bytes → non-overlapping `patchBytes`-byte patches, one row per
    * (doc_id, patch_idx), each with its length, content md5, and first
    * byte. Patch slicing runs over the hex dump of the payload (2 chars per
    * byte), which keeps every step a codegen'd string expression the DuckDB
    * oracle mirrors exactly (no BLOB slicing on either engine). The last
    * patch may be short; empty payloads produce zero rows.
    *
    * 100 TB shape: a pure per-row projection + explode with bounded fanout
    * (n_bytes / patchBytes), no shuffle; downstream per-patch encoders
    * consume the exploded rows with input-split parallelism. */
  def patchExtract(documents: DataFrame, patchBytes: Int = 32): DataFrame = {
    val media = col("text").cast("binary")
    val hexPerPatch = 2 * patchBytes
    documents
      .select(col("doc_id"), hex(media).as("hx"),
        length(media).cast("long").as("n_bytes"))
      .withColumn("n_patches",
        floor((col("n_bytes") + lit(patchBytes - 1)) / lit(patchBytes))
          .cast("long"))
      .select(col("doc_id"),
        posexplode(when(col("n_patches") > 0,
          transform(sequence(lit(0L), col("n_patches") - 1),
            i => col("hx").substr((i * hexPerPatch + 1).cast("int"),
              lit(hexPerPatch))))
          .otherwise(array().cast("array<string>")))
          .as(Seq("patch_idx", "ph")))
      .select(col("doc_id"),
        col("patch_idx").cast("int").as("patch_idx"),
        floor(length(col("ph")) / 2).cast("long").as("patch_len"),
        md5(col("ph").cast("binary")).as("patch_md5"),
        conv(substring(col("ph"), 1, 2), 16, 10).cast("int").as("first_byte"))
  }

  /** Stride-resize as a driver-facing query (mm5): each payload downscaled
    * to every `stride`-th byte — the image-thumbnail / audio-downsample
    * plumbing shape (binary in, smaller binary out, pure per-row
    * projection, no shuffle; a codec-backed deployment swaps the byte
    * stride for pixel averaging behind the same columns). Emits the
    * original and thumb sizes plus the thumb's md5 so the oracle pins
    * every output byte; computed over the hex dump like mm3/mm4 so both
    * engines run identical string math. */
  def resizeThumbs(documents: DataFrame, stride: Int = 4): DataFrame = {
    val media = col("text").cast("binary")
    documents
      .select(col("doc_id"), hex(media).as("hx"),
        length(media).cast("long").as("n_bytes"))
      .withColumn("thumb_bytes",
        floor((col("n_bytes") + lit(stride - 1)) / lit(stride)).cast("long"))
      .select(col("doc_id"), col("n_bytes"), col("thumb_bytes"),
        when(col("thumb_bytes") > 0,
          md5(array_join(transform(
            sequence(lit(0L), col("thumb_bytes") - 1),
            i => col("hx").substr((i * (2 * stride) + 1).cast("int"),
              lit(2))), "").cast("binary")))
          .otherwise(lit(null).cast("string")).as("thumb_md5"))
  }

  /** Perceptual-hash near-duplicate pairs over media payloads (mm6): a
    * dHash — each bit compares ADJACENT samples of the stride-downsampled
    * payload (the [[resizeThumbs]] thumbnail), so the signature captures
    * the local gradient structure a codec-backed deployment would compute
    * over pixel rows — then banded Hamming search exactly like
    * [[Dedup.simhashPairs]] (4 × 15-bit bands over a 60-bit hash, xor +
    * bit_count verify on candidates only).
    *
    * Alignment caveat, stated honestly: on 1-D byte streams a dHash is
    * shift-SENSITIVE (an insertion re-phases every later sample), so this
    * finds same-prefix / re-encoded / truncated-tail duplicates, not
    * text-level near-dups — that's [[Dedup.minhashLsh]]'s job; for real
    * images the 2-D sampling grid restores shift robustness within a
    * row. Payloads shorter than `61·stride - 3` bytes (fewer than 61
    * samples) are excluded: their hashes have too few informative bits
    * and would flood band 3 with zeros. At corpus scale the band join
    * composes with `Dedup.capHotKeys` unchanged; here bands are
    * 15-bit over ~random gradient bits, so bucket sizes stay near
    * |docs|/2^15. Everything is hex-dump string math (mm3/mm5 precedent)
    * — both engines run the identical expression. */
  def phashPairs(documents: DataFrame, stride: Int = 4,
      maxHamming: Int = 6): DataFrame = {
    val sigs = phashSigs(documents, stride)
    Caching.withPersisted(sigs) {
      val bands = phashBands(sigs)
      bands.as("a")
        .join(bands.as("b"),
          col("a.j") === col("b.j") && col("a.bv") === col("b.bv") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.phash").as("pa"), col("b.phash").as("pb"))
        .distinct()
        .withColumn("hamming", expr("bit_count(pa ^ pb)"))
        .filter(col("hamming") <= maxHamming)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
    }
  }

  /** Near-dup distance histogram (mm15): mm6's verified pairs bucketed
    * by Hamming distance — the threshold-tuning telemetry for the phash
    * detector: a bimodal histogram (mass at 0-2 and a tail at the cap)
    * says the cutoff is safe; mass piling AT the cap says the band
    * stage is surfacing near-misses and `maxHamming` is clipping real
    * duplicates (raise it or add bands). One integer aggregate over the
    * pair table; same chain as mm6, so the two cannot drift. */
  def phashHammingHistogram(documents: DataFrame, stride: Int = 4,
      maxHamming: Int = 6): DataFrame =
    phashPairs(documents, stride, maxHamming)
      .groupBy(col("hamming"))
      .agg(count(lit(1)).as("n_pairs"))

  /** Per-document 60-bit gradient perceptual hash (doc_id, phash) —
    * the ONE copy of mm6's signature arithmetic, shared by the self-join
    * and the stored-index path so the two cannot drift. */
  private def phashSigs(documents: DataFrame, stride: Int): DataFrame = {
    val media = col("text").cast("binary")
    val hexStep = 2 * stride
    documents
      .select(col("doc_id"), hex(media).as("hx"),
        length(media).cast("long").as("n_bytes"))
      .filter(col("n_bytes") >= (60 * stride + 1))
      .withColumn("b", expr(
        s"transform(sequence(0, 60), i -> " +
          s"cast(conv(substr(hx, i * $hexStep + 1, 2), 16, 10) as int))"))
      .withColumn("phash", expr(
        "aggregate(sequence(0, 59), cast(0 as bigint), (acc, i) -> " +
          "acc | IF(element_at(b, i + 1) < element_at(b, i + 2), " +
          "shiftleft(cast(1 as bigint), i), cast(0 as bigint)))"))
      .select(col("doc_id"), col("phash"))
      .transform(Partitioning.spread(_, col("doc_id")))
  }

  /** 15-bit LSH bands of a signature frame: (doc_id, phash, j, bv). */
  private def phashBands(sigs: DataFrame): DataFrame =
    sigs
      .select(col("doc_id"), col("phash"),
        explode(sequence(lit(0), lit(3))).as("j"))
      .withColumn("bv", expr("shiftright(phash, 15 * j) & 32767"))

  /** Stored perceptual-hash index (mm9): the (doc_id, phash) signature
    * table as a plain lake artifact — the
    * [[graft.operators.Dedup.PrefixFilterIndex]] /
    * [[graft.operators.Similarity.IvfAdcIndex]] pattern applied to the
    * multimodal dedup family. Signatures are computed ONCE at build;
    * ingests never re-hash the stored corpus. */
  final case class PhashIndex(sigs: DataFrame)

  def phashIndex(documents: DataFrame, stride: Int = 4): PhashIndex =
    PhashIndex(Caching.materialize(phashSigs(documents, stride)))

  /** Phash dirty-bucket report (mm16): today's [[phashIndex]] band
    * buckets vs yesterday's build, classified unchanged / grown / new /
    * shrunk / removed with the dirty fraction — the multimodal member
    * of the dirty-bucket family ([[Dedup.dirtyBucketReport]] for LSH
    * text bands, this for phash image bands; with g13 edges and s24
    * cells, every stored index family now carries a measured staleness
    * gauge). A phash is a pure function of its payload, so under pure
    * ingest only new/grown appear; shrunk/removed surface deletions.
    * dirty_frac × bucket count sizes tonight's incremental re-pair.
    * Band explode + count per side, one full outer join at distinct-
    * bucket scale, one fold — empty inputs → empty report. */
  def phashDirtyBuckets(fresh: PhashIndex, stored: PhashIndex): DataFrame = {
    def buckets(idx: PhashIndex) = phashBands(idx.sigs)
      .groupBy(col("j"), col("bv")).agg(count(lit(1)).as("c"))
    Dedup.bucketClassFold(
      buckets(fresh).withColumnRenamed("c", "cf"),
      buckets(stored).withColumnRenamed("c", "cs"),
      Seq("j", "bv"))
  }

  /** Cross-set perceptual near-dup check (mm9): each INCOMING medium's
    * band keys probe the stored index's bands; survivors get the exact
    * 60-bit Hamming check. Per-ingest cost scales with the batch (its
    * own hash + band join), never the stored corpus size — the online
    * "have we already got this image" gate. Returns (doc_id, dup_of,
    * hamming); id spaces are the caller's (no ordering constraint —
    * incoming and stored are different namespaces). */
  def phashVsIndex(incoming: DataFrame, index: PhashIndex,
      stride: Int = 4, maxHamming: Int = 6): DataFrame = {
    val sigsI = phashSigs(incoming, stride)
    Caching.withPersisted(sigsI, index.sigs) {
      phashBands(sigsI).as("a")
        .join(phashBands(index.sigs).as("b"),
          col("a.j") === col("b.j") && col("a.bv") === col("b.bv"))
        .select(col("a.doc_id").as("doc_id"),
          col("b.doc_id").as("dup_of"),
          col("a.phash").as("pa"), col("b.phash").as("pb"))
        .distinct()
        .withColumn("hamming", expr("bit_count(pa ^ pb)"))
        .filter(col("hamming") <= maxHamming)
        .select(col("doc_id"), col("dup_of"), col("hamming"))
    }
  }

  /** Framed RMS energy (mm7): the audio-modality member of the family —
    * the payload read as unsigned 8-bit PCM centered at 128, cut into
    * fixed-size frames (last frame short), each scored by Σ s² and
    * RMS = √(energy / n) — the silence-detection / loudness-normalization
    * primitive of every audio ingest (a codec-backed deployment swaps the
    * byte read for real sample decode behind the same frame columns).
    *
    * Typed flatMap with bounded fanout n_bytes/frame, no shuffle —
    * the [[sampleFrames]] plan shape. Parity: energy is exact integer
    * arithmetic; RMS is one IEEE division and one correctly-rounded
    * `sqrt`, so both engines agree bit-for-bit. */
  def frameEnergy(documents: DataFrame, frame: Int = 64): DataFrame = {
    implicit val spark: SparkSession = documents.sparkSession
    import spark.implicits._
    toMediaRecords(documents).flatMap { m =>
      m.media.grouped(frame).zipWithIndex.map { case (bytes, idx) =>
        val e = bytes.foldLeft(0L) { (a, b) =>
          val s = (b & 0xff) - 128; a + s.toLong * s
        }
        (m.media_id, idx.toLong, bytes.length.toLong, e,
          math.sqrt(e.toDouble / bytes.length))
      }
    }.toDF("media_id", "frame_idx", "n_samples", "energy", "rms")
  }

  /** Frame-delta motion profile (mm13): per medium, the absolute RMS
    * change between CONSECUTIVE [[frameEnergy]] frames — mean, max, and
    * how many deltas exceed the scene-cut bar. The sampling-priority
    * signal a video pipeline reads next to mm10's silence gate: frames
    * where the energy jumps are scene boundaries / motion (sample them
    * for captioning), a flat profile is a static slide (sample once).
    * The per-frame RMS is engine-exact (sqrt of an exact integer ratio,
    * mm7's contract), so the deltas are too; the mean accumulates
    * round(delta·1e9) longs (order-free), max/cut-compare run on the
    * identical doubles. Media with a single frame have no delta and drop
    * out. One window pass per medium (partitioned, never global) + one
    * aggregate — bounded fanout, no cross-media shuffle. */
  def motionProfile(documents: DataFrame, frame: Int = 64,
      cutBar: Double = 40.0): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_idx"))
    val deltas = frameEnergy(documents, frame)
      .select(col("media_id"), col("frame_idx"), col("rms"))
      .select(col("media_id"),
        abs(col("rms") - lag(col("rms"), 1).over(w)).as("delta"))
      .filter(col("delta").isNotNull)
    deltas.groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_deltas"),
        (sum(round(col("delta") * lit(1.0e9))
          .cast(DecimalType(38, 0))).cast("double") /
          (count(lit(1)) * lit(1.0e9))).as("mean_abs_delta"),
        max(col("delta")).as("max_abs_delta"),
        sum(when(col("delta") > cutBar, 1L).otherwise(0L)).as("n_cuts"))
  }

  /** Silence / blank-media detector (mm10): per medium, how many of its
    * [[frameEnergy]] frames fall below the RMS floor, the quiet fraction,
    * and the blank verdict — the audio-curation gate that drops
    * dead-air clips (and, byte-read as here, near-constant payloads)
    * before they spend tokenizer/encoder budget. The frame RMS is
    * computed identically on both engines (sqrt of an exact integer
    * ratio), so the floor comparison and the fraction are engine-exact.
    * One aggregate over the frame table — bounded fanout, no shuffle
    * beyond the per-media grouping. */
  /** Audio clipping gauge (mm14): per medium, how many samples sit at or
    * beyond the clip level (|s| ≥ clipLevel on the ±128 scale), the peak
    * absolute sample, the clipped fraction, and the verdict — the
    * complement of [[silenceReport]] at the loud end: a recording whose
    * samples pile up at full scale was over-driven, and its spectral
    * features are garbage no matter how good the transcript looks.
    * One typed per-record pass (no explode — the per-sample loop stays
    * inside the task, emitting 4 longs per medium), then pure IEEE
    * divisions; the DuckDB twin aggregates mm7's per-sample CTE.
    * Media with zero samples are absent (no NaN-poison rows), matching
    * the oracle's empty range(). */
  def clippingReport(documents: DataFrame, clipLevel: Int = 100,
      clipFracBar: Double = 0.05): DataFrame = {
    implicit val spark: SparkSession = documents.sparkSession
    import spark.implicits._
    val frac = col("n_clipped").cast("double") /
      col("n_samples").cast("double")
    toMediaRecords(documents).map { m =>
      var n = 0L; var nClip = 0L; var peak = 0L
      m.media.foreach { b =>
        val a = math.abs((b & 0xff) - 128).toLong
        if (a >= clipLevel) nClip += 1
        if (a > peak) peak = a
        n += 1
      }
      (m.media_id, n, nClip, peak)
    }.toDF("media_id", "n_samples", "n_clipped", "peak")
      .filter(col("n_samples") > 0)
      .select(col("media_id"), col("n_samples"), col("n_clipped"),
        col("peak"), frac.as("clip_frac"),
        (frac >= clipFracBar).as("is_clipped"))
  }

  def silenceReport(documents: DataFrame, rmsFloor: Double = 30.0,
      blankFrac: Double = 0.9): DataFrame = {
    val quietFrac = col("n_quiet").cast("double") / col("n_frames")
    frameEnergy(documents)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("rms") < rmsFloor, 1L).otherwise(0L)).as("n_quiet"))
      .select(col("media_id"), col("n_frames"), col("n_quiet"),
        quietFrac.as("quiet_frac"),
        (quietFrac >= blankFrac).as("is_blank"))
  }

  /** Duplicate media patches (mm12): [[patchExtract]]'s tiles grouped by
    * content hash — patches whose exact bytes recur in at least `minDocs`
    * distinct documents, the sub-document dedup granularity of image
    * pipelines (shared logos, watermarks, letterboxing bars recur across
    * files whose full payloads differ; whole-file dedup never sees them).
    * Returns (patch_md5, patch_len, n_docs, n_patches).
    *
    * 100 TB shape: the explode is mm3's bounded fanout; the aggregate is
    * one map-side-combinable groupBy on the hash — the d33 boilerplate
    * regime at patch granularity. */
  def duplicatePatches(documents: DataFrame, patchBytes: Int = 32,
      minDocs: Int = 2): DataFrame =
    patchExtract(documents, patchBytes)
      .groupBy(col("patch_md5"), col("patch_len"))
      .agg(count_distinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_patches"))
      .filter(col("n_docs") >= minDocs)
      .select(col("patch_md5"), col("patch_len"), col("n_docs"),
        col("n_patches"))

  /** Per-format perceptual-duplicate rate (mm11): what fraction of each
    * media format's items participate in at least one [[phashPairs]]
    * near-dup pair — the modality-balance view of duplication (a feed
    * that re-encodes its images shows up as a high jpeg dup rate while
    * its audio stays clean; the mm8 mix table says how much of each
    * format there IS, this says how much is redundant). */
  def formatDupRate(documents: DataFrame, stride: Int = 4,
      maxHamming: Int = 6): DataFrame = {
    val fmt = element_at(typedlit(Seq("png", "jpeg", "wav", "mp4")),
      (pmod(col("doc_id"), lit(4)) + 1).cast("int"))
    val dupDocs = phashPairs(documents, stride, maxHamming)
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
      .withColumn("is_dup", lit(true))
    documents.select(col("doc_id"), fmt.as("format"))
      .join(dupDocs, Seq("doc_id"), "left_outer")
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_media"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_media"))
      .select(col("format"), col("n_media"), col("n_dup_media"),
        (col("n_dup_media").cast("double") / col("n_media")).as("dup_rate"))
  }

  /** Media-mix governance report (mm8): per (source, format), item count
    * and payload byte mass — the modality-balance table a multimodal
    * training mix is planned from (the c13 health report's media sibling).
    * One map-side-combined aggregate over catalog columns; the binary
    * payload itself is never read (`octet_length` prunes to metadata at
    * scan time in a real lake layout). */
  def mediaMix(documents: DataFrame): DataFrame =
    documents
      .select(col("source"),
        element_at(typedlit(Seq("png", "jpeg", "wav", "mp4")),
          (pmod(col("doc_id"), lit(4)) + 1).cast("int")).as("format"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"))
      .groupBy(col("source"), col("format"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"))

  /** Modality-balanced inspection budgets (mm17): split a fixed audit /
    * human-labeling budget across (source, format) cells proportional to
    * each cell's BYTE mass ([[mediaMix]]'s accounting), integerized
    * largest-remainder (ties by source then format) so the allocations
    * sum to exactly `budget` — c22's Hamilton apportionment applied to
    * the media catalog. Byte mass, not item count: inspection cost for
    * media scales with payload size (frames to look at, seconds to
    * listen to), so per-byte audit rates come out uniform — the same
    * argument c23 makes for per-token inspection of text.
    *
    * Scale shape: one catalog scan → the mm8 aggregate, then the
    * apportionment runs on the |sources×formats|-row aggregate under an
    * unpartitioned window — bounded, driver-free (c22's shape). */
  def mixAllocation(documents: DataFrame, budget: Long = 10000L): DataFrame =
    mediaMix(documents).select(
      col("source"), col("format"), col("n_items"), col("total_bytes"),
      Curation.remainderAlloc(col("total_bytes"), col("n_items"),
        budget, Seq(col("source"), col("format"))).as("alloc"))

  /** The ONE media-catalog scan the data card's media sections share (the
    * d29/d30 fingerprint-pass pattern): (doc_id, source, text-payload).
    * [[mediaMix]], [[silenceSummaryFromCatalog]] and
    * [[phashAdvisoryFromCatalog]] all run over this frame, so a card
    * render reads the payload column from the lake ONCE — persisted by
    * the caller for the duration of the sections (DataCard brackets it
    * with `Caching.withPersisted3`). */
  def mediaCatalog(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("source"), col("text"))

  /** Per-source silence/blank rates (mm10's card form): media count,
    * blank count, and mean quiet fraction — the dead-air budget line a
    * release reviews next to the media mix. One [[silenceReport]] pass
    * plus a metadata join back to the shared catalog for the source. */
  def silenceSummaryFromCatalog(cat: DataFrame, rmsFloor: Double = 30.0,
      blankFrac: Double = 0.9): DataFrame =
    silenceReport(cat, rmsFloor, blankFrac)
      .join(cat.select(col("doc_id").as("media_id"), col("source")),
        "media_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_media"),
        sum(when(col("is_blank"), 1L).otherwise(0L)).as("n_blank"),
        avg(col("quiet_frac")).as("mean_quiet_frac"))

  /** Per-source perceptual-duplicate advisory (mm6/mm9's card form):
    * media count, phash near-dup pair count (pairs attributed to the
    * FIRST doc's source), and the closest observed Hamming distance —
    * the "stored media contains re-encodes" flag next to the mix table.
    * Sources with no pairs report 0 with a null min_hamming. */
  def phashAdvisoryFromCatalog(cat: DataFrame, stride: Int = 4,
      maxHamming: Int = 6): DataFrame = {
    val bySrc = phashPairs(cat, stride, maxHamming)
      .join(cat.select(col("doc_id").as("doc_a"), col("source")), "doc_a")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_dup_pairs"),
        min(col("hamming")).as("min_hamming"))
    cat.groupBy(col("source")).agg(count(lit(1)).as("n_media"))
      .join(bySrc, Seq("source"), "left_outer")
      .select(col("source"), col("n_media"),
        coalesce(col("n_dup_pairs"), lit(0L)).as("n_dup_pairs"),
        col("min_hamming"))
  }

  /** Documents table lifted into a media catalog (deterministic fake
    * payload = UTF-8 bytes), with decode-free column-level features the
    * DuckDB oracle can mirror: byte length, content md5, char-slice
    * thumbnail md5, frame count. */
  def mediaFeatures(documents: DataFrame): DataFrame = {
    val media = col("text").cast("binary")
    val mediaLen = length(media)
    documents.select(
      col("doc_id"),
      element_at(typedlit(Seq("png", "jpeg", "wav", "mp4")),
        (pmod(col("doc_id"), lit(4)) + 1).cast("int")).as("format"),
      mediaLen.cast("long").as("media_len"),
      md5(media).as("media_md5"),
      md5(substring(col("text"), 1, 64).cast("binary")).as("thumb_md5"),
      floor((mediaLen + lit(255)) / lit(256)).cast("long").as("n_frames"))
  }
}
