package graft.streaming

import graft.core.{Envelope, ErrorCodes, GraftConf, GraftError}
import graft.errors.ErrorHeaders

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}
import org.apache.spark.sql.types.StructType

/** The two consume pipelines of the reference, re-expressed on Structured
  * Streaming, plus the stream lifecycle decorator.
  *
  * - simple: source → safe decode → branch(valid → user processor; invalid →
  *   error sink) with processing failures re-routed to the error sink
  *   (/root/reference/src/main/java/fr/barbicane/maston/topology/TopologyBuilder.java:30-50).
  *   Note the reference's simple topology has NO output topic — the user
  *   processor's side effects are the output; only errors are produced
  *   (TopologyBuilder.java:42,48).
  * - delta: source → safe decode → re-key → stateful delta/dedup → valid →
  *   output sink, errors → error sink (TopologyBuilder.java:53-90).
  *
  * Sinks are pluggable `DataFrame => Unit` writers invoked inside
  * `foreachBatch`: the branch-to-two-sinks topology needs one pass over the
  * decoded micro-batch (persist once, write both branches), which the Kafka
  * sink alone cannot express. In production both writers are
  * `df.write.format("kafka")`; tests use in-memory collectors.
  *
  * Delivery semantics: exactly-once for offsets + state, at-least-once for
  * Kafka and append sinks, idempotent upsert — the full per-component
  * contract is DELIVERY.md at the repo root.
  */
object GraftStream extends Logging {

  /** Kafka-source column layout (what spark.readStream.format("kafka")
    * produces with includeHeaders=true). MemoryStream test inputs use the
    * same shape. */
  val kafkaSourceSchema: StructType = StructType.fromDDL(
    """key binary, value binary,
      |headers array<struct<key: string, value: binary>>,
      |topic string, partition int, offset bigint, timestamp timestamp""".stripMargin)

  /** Build the Kafka streaming source for a conf — S1
    * (TopologyBuilder.java:36; offset policy SimpleAvroStreamConsumer.java:42-45). */
  def kafkaSource(spark: SparkSession, conf: GraftConf): DataFrame = {
    val base = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", conf.bootstrapServers)
      .option("subscribe", conf.topic)
      .option("startingOffsets", conf.startingOffsets)
      .option("includeHeaders", "true")
      .option("kafka.isolation.level", "read_committed")
    // First-class SASL/SSL plumbing (KafkaPropertiesBuilder.java:43-67),
    // then verbatim passthrough: Spark-level source options
    // (maxOffsetsPerTrigger, failOnDataLoss, minPartitions, …) have no
    // prefix, Kafka consumer configs are written with their `kafka.` prefix
    // by the caller — auto-prefixing would make the former unreachable.
    (conf.kafkaClientOptions ++ conf.extraSourceOptions)
      .foldLeft(base) { case (b, (k, v)) => b.option(k, v) }
      .load()
  }

  /** A Kafka sink writer for foreachBatch routing — S2. The producer
    * partitions by the `key` column, which is how the reference's re-keying
    * repartitions without an internal topic (RecordKeyProcessor.java:9).
    * Writes with the reference's durability posture
    * ([[graft.core.GraftConf.kafkaProducerOptions]]: idempotent, acks=all,
    * unbounded retries/blocking) — see that scaladoc for the documented
    * at-least-once delta vs Kafka Streams EOS. */
  def kafkaSink(conf: GraftConf, topic: String): DataFrame => Unit =
    if (conf.transactionalKafkaSink)
      kafkaTxnSink(conf, topic,
        new TransactionalKafka.ReflectiveKafkaTxnFactory(
          conf.bootstrapServers, conf.rawKafkaClientProps,
          conf.rawKafkaProducerProps))
    else
      RecordLog.producerLogging(topic, conf.enabledProducerRecordLogging) { df =>
        val base = df.selectExpr("CAST(key AS STRING) AS key", "value", "headers")
          .write.format("kafka")
          .option("kafka.bootstrap.servers", conf.bootstrapServers)
          .option("topic", topic)
          .option("includeHeaders", "true")
        (conf.kafkaProducerOptions ++ conf.kafkaClientOptions)
          .foldLeft(base) { case (b, (k, v)) => b.option(k, v) }
          .save()
      }

  /** The exactly-once topic sink body behind
    * [[graft.core.GraftConf.transactionalKafkaSink]] — see
    * [[TransactionalKafka]] for the mechanics and semantics. Public with
    * an explicit factory so specs (and alternative client stacks) can
    * substitute the producer; the batchId comes from the surrounding
    * pipeline's micro-batch context. */
  def kafkaTxnSink(conf: GraftConf, topic: String,
      factory: TransactionalKafka.TxnProducerFactory): DataFrame => Unit =
    RecordLog.producerLogging(topic, conf.enabledProducerRecordLogging) { df =>
      TransactionalKafka.write(df, conf, topic,
        TransactionalKafka.requireBatchId(), factory)
    }

  /** Marker-file commit log for micro-batch idempotence: one empty file per
    * committed batchId under `dir`, written AFTER the wrapped sink succeeds
    * (temp-create + rename — on HDFS/local the rename is atomic so a marker
    * is never visible half-written; on object stores rename is copy+delete,
    * but the marker is an EMPTY file whose existence is the whole signal,
    * so the non-atomic window can only lose the marker, never corrupt it —
    * a lost marker replays the batch, the safe direction).
    * Uses the Hadoop FileSystem API so the log lives wherever the checkpoint
    * lives (HDFS/S3/local) — the standard foreachBatch txn-table pattern.
    *
    * Retention: markers below `batchId - retainBatches` are pruned on each
    * commit (mirroring the checkpoint's own minBatchesToRetain posture) so
    * a long-running stream does not accumulate one small file per
    * micro-batch forever. Pruned markers are safe to drop because
    * Structured Streaming only ever replays the LAST uncommitted batch —
    * anything `retainBatches` behind the head can never be re-delivered
    * while this checkpoint lineage is in use. */
  final class BatchCommitLog(dir: String,
      hadoopConf: org.apache.hadoop.conf.Configuration,
      retainBatches: Int = 100) {
    private val path = new org.apache.hadoop.fs.Path(dir)
    private def fs = path.getFileSystem(hadoopConf)
    def committed(batchId: Long): Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(path, batchId.toString))
    def commit(batchId: Long): Unit = {
      fs.mkdirs(path)
      val tmp = new org.apache.hadoop.fs.Path(path, s".$batchId.tmp")
      fs.create(tmp, true).close()
      val dst = new org.apache.hadoop.fs.Path(path, batchId.toString)
      // A silently-failed rename would leave no marker and make every
      // future replay of this batch double-write with no diagnostic —
      // surface it as the batch failure it is (the sink already wrote, so
      // failing HERE keeps Spark retrying the batch until the marker
      // lands; the guard makes those retries no-op once it does). Hadoop
      // rename does not overwrite: when a retry finds the marker already
      // published, that's success — but the orphaned tmp must go, or
      // dot-files (which prune skips) accumulate across such retries.
      if (!fs.rename(tmp, dst)) {
        if (fs.exists(dst)) fs.delete(tmp, false)
        else throw new java.io.IOException(
          s"BatchCommitLog: failed to publish marker $dst")
      }
      prune(batchId)
    }
    private def prune(headBatchId: Long): Unit =
      try {
        val floor = headBatchId - retainBatches
        if (floor > 0)
          fs.listStatus(path).foreach { st =>
            val name = st.getPath.getName
            if (name.forall(_.isDigit) && name.toLong < floor)
              fs.delete(st.getPath, false)
          }
      } catch { case scala.util.control.NonFatal(_) => () } // best-effort
  }

  /** Batch-id-keyed idempotence guard: skip a micro-batch the sink has
    * already committed. After a restart, Structured Streaming replays the
    * last uncommitted-in-ITS-log batch with the SAME deterministic batchId;
    * without a sink-side record of what landed, an append sink (Kafka
    * producer, parquet append) writes those rows twice. This guard closes
    * that gap — the Spark-side counterpart of the reference's
    * read_committed + idempotent-producer stance
    * (/root/reference/src/main/java/fr/barbicane/maston/kafka/KafkaPropertiesBuilder.java:73,89-93):
    * the reference makes re-sends invisible to consumers; here re-delivered
    * BATCHES become no-ops.
    *
    * Residual window (documented in DELIVERY.md): a crash between the
    * sink's write and the marker write replays that one batch — the sink is
    * at-least-once across that window and exactly-once everywhere else. For
    * a Kafka sink the consumer-side mop-up is d1 exact dedup / read-side
    * keys; for the parquet lake sink pair with [[upsertLakeSink]] or d1.
    * Keep `commitDir` NEXT TO the streaming checkpoint (same store, same
    * lifecycle): deleting the checkpoint without the commit log would replay
    * from scratch against a log that says "all done". BatchIds are only
    * unique within ONE query's checkpoint lineage, so every pipeline must
    * own a distinct marker directory — the built-in wirings namespace it
    * as `<commitDir>/<applicationId>-<pipeline>`.
    *
    * Wired into [[simple]]/[[delta]] via [[graft.core.GraftConf.commitDir]]
    * — when set, each pipeline's whole per-batch write (both branches) is
    * guarded as one unit, so a replayed batch re-delivers to NEITHER sink.
    */
  def idempotent[F <: Dataset[_]](commitDir: String)(
      sink: F => Unit): (F, Long) => Unit = (df, batchId) => {
    val log = new BatchCommitLog(commitDir,
      df.sparkSession.sessionState.newHadoopConf())
    if (log.committed(batchId))
      logInfo(s"skipping replayed micro-batch $batchId " +
        s"(already committed in $commitDir)")
    else {
      sink(df)
      log.commit(batchId)
    }
  }

  /** Partitioned parquet lake sink: the landing pattern for a training-data
    * firehose — append-only files under `path`, directory-partitioned by
    * `partitionCols` (date/source/lang) so downstream batch curation prunes
    * partitions at the scan.
    *
    * Used inside foreachBatch, each micro-batch append is atomic per task
    * file and the streaming checkpoint makes re-delivery idempotent at the
    * batch level (a replayed batch overwrites by batchId only when the
    * caller keys files that way — the default posture here is append +
    * at-least-once, mopped up by d1 exact dedup downstream, same trade as
    * [[StreamDedup]]). Partition count = input partitions; callers
    * repartition(partitionCols) first when file-per-partition matters. */
  def parquetLakeSink(path: String,
      partitionCols: Seq[String]): DataFrame => Unit = { df =>
    val w = df.write.mode("append")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  /** Upsert lake sink: per micro-batch, merge the batch's changes into the
    * parquet table at `path`, keeping only the newest record per key
    * (ordered by `orderCols` descending, via the heap top-k operator with
    * k = 1) — a changelog stream materializes as current state, the
    * CDC-merge sink.
    *
    * Each batch rewrites table = latestPerKey(existing ∪ batch). Without a
    * transactional table format that is the honest primitive: the rewrite
    * cost is the table, not the stream, so at 100 TB this sink pairs with
    * directory partitioning (rewrite only partitions the batch touches —
    * [[graft.sources.Sources.writePartitioned]]) or a format with row-level
    * merge; the semantics here are the contract those deployments keep.
    * Batch-level replays re-merge idempotently: merging the same changes
    * twice yields the same state. */
  def upsertLakeSink(path: String,
      keyCols: Seq[String], orderCols: Seq[String]): DataFrame => Unit = {
    batch =>
      // foreachBatch frames live in a CLONED session — the custom top-k
      // strategy must be registered there, not (only) on the outer session
      val session = batch.sparkSession
      graft.functions.GraftFunctions.register(session)
      val existing =
        try session.read.parquet(path)
        catch { case _: org.apache.spark.sql.AnalysisException => null }
      val all = if (existing == null) batch else batch.unionByName(existing)
      val latest = graft.plans.TopK.perKey(
        all, keyCols.map(col),
        orderCols.map(c => col(c).desc), 1)
      // two-phase write: latest is computed FROM the old files, so the
      // overwrite must not clobber its own input mid-scan
      val tmp = path + ".staging"
      latest.write.mode("overwrite").parquet(tmp)
      session.read.parquet(tmp).write.mode("overwrite").parquet(path)
  }

  /** Decode a Kafka-shaped DataFrame into `Dataset[Envelope[T]]` with a
    * caller-supplied safe decoder (JSON: SafeJson.decode column; Avro:
    * SafeAvro.decode). `decodeFn` must never throw — return Left(error).
    */
  def decodeEnvelope[T](df: DataFrame)(
      decodeFn: Array[Byte] => Either[GraftError, T])(
      implicit enc: Encoder[Envelope[T]]): Dataset[Envelope[T]] = {
    import df.sparkSession.implicits._
    // Carry the source record's own Kafka headers through the envelope —
    // the error sink merges its diagnostics ONTO them (flush semantics,
    // KafkaErrorToHeaderBuilder.java:68-80) instead of discarding them.
    val headersCol =
      if (df.columns.contains("headers"))
        transform(col("headers"), h => struct(
          h.getField("key").as("_1"), h.getField("value").as("_2")))
      else array().cast("array<struct<_1:string,_2:binary>>")
    df.select(col("key").cast("string").as("key"), col("value"), col("topic"),
        col("partition"), col("offset"), col("timestamp"),
        headersCol.as("headers"))
      .as[(String, Array[Byte], String, Int, Long, java.sql.Timestamp,
        Seq[(String, Array[Byte])])]
      .map { case (key, raw, topic, part, off, ts, hs) =>
        decodeFn(raw) match {
          case Right(v) =>
            Envelope[T](key, Some(v), None, raw, topic, part, off, ts, hs)
          case Left(e) =>
            Envelope[T](key, None, Some(e), raw, topic, part, off, ts, hs)
        }
      }
  }

  /** Run the user's record processor over the valid side — T1
    * (TransformerBuilder.java:34-73). The processor's side effects are the
    * output; a thrown exception or returned error flips the envelope to the
    * invalid side with sourceRecord semantics (error carries no raw bytes →
    * the safe serializer will re-serialize the source record).
    */
  def processValid[T](ds: Dataset[Envelope[T]])(
      process: T => Option[GraftError])(
      implicit enc: Encoder[Envelope[T]]): Dataset[Envelope[T]] =
    ds.map { env =>
      env.value match {
        case Some(v) if env.isValid =>
          try process(v) match {
            case Some(err) => env.withError(err)
            case None      => env
          } catch {
            // NonFatal only: fatal JVM errors and task-cancellation
            // interrupts must propagate, not become error-topic records
            case scala.util.control.NonFatal(t) =>
              env.withError(GraftError.fromThrowable(t,
                ErrorCodes.FailedToProcessRecord,
                s"Failed to process record: ${t.getMessage}",
                v.getClass.getName))
          }
        case _ => env
      }
    }

  /** Project an invalid envelope to the error-sink record: key, value bytes
    * per the never-lose-a-record fallback chain (VavrSafeSerializer.java:26-41
    * — raw bytes, else re-serialized source, else empty), 11 diagnostic
    * headers (KafkaErrorToHeaderBuilder.java:39-66).
    */
  def toErrorRecords[T](
      ds: Dataset[Envelope[T]],
      applicationId: String,
      reserialize: Option[Column => Column] = None): DataFrame = {
    val df = ds.toDF()
    val err = col("error")
    val reserialized = reserialize
      .map(f => f(col("value")).cast("binary"))
      .getOrElse(lit(null).cast("binary"))
    val existing = transform(col("headers"), h => struct(
      h.getField("_1").as("key"), h.getField("_2").as("value")))
    df.filter(err.isNotNull).select(
      col("key"),
      coalesce(err.getField("rawBytes"), col("rawValue"), reserialized,
        lit(Array.emptyByteArray)).as("value"),
      ErrorHeaders.mergeOnto(existing,
        ErrorHeaders.build(applicationId, err, col("topic"), col("partition"),
          col("offset"), col("timestamp").cast("timestamp"))).as("headers"))
  }

  /** Project the valid side to Kafka sink records: string key, serialized
    * value bytes, original headers — the output-topic counterpart of
    * [[toErrorRecords]] (kafkaSink consumes exactly this shape). */
  def toOutputRecords[T](
      ds: Dataset[Envelope[T]],
      serialize: Column => Column): DataFrame =
    ds.toDF().filter(col("error").isNull).select(
      col("key"),
      serialize(col("value")).cast("binary").as("value"),
      transform(col("headers"), h => struct(
        h.getField("_1").as("key"), h.getField("_2").as("value")))
        .as("headers"))

  /** Typed twin of [[toOutputRecords]] for serializers that are Scala
    * functions rather than column expressions — the Avro wire-format encode
    * (SafeAvro.SerdePair.encodeFn) needs the 5-byte Confluent prefix that no
    * built-in column function writes. */
  def toOutputRecordsTyped[T](
      ds: Dataset[Envelope[T]],
      encodeFn: T => Array[Byte]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.filter((e: Envelope[T]) => e.isValid)
      .map(env => (env.key, encodeFn(env.value.get), env.headers))
      .toDF("key", "value", "headers")
      .select(col("key"), col("value"),
        transform(col("headers"), h => struct(
          h.getField("_1").as("key"), h.getField("_2").as("value")))
          .as("headers"))
  }

  type Column = org.apache.spark.sql.Column

  /** The simple pipeline (§3.1): decode → process → route errors.
    * One pass per micro-batch; the batch is persisted once and both branches
    * written from it — the Spark form of the reference's branch topology.
    */
  def simple[T](
      source: DataFrame,
      conf: GraftConf,
      decodeFn: Array[Byte] => Either[GraftError, T],
      process: T => Option[GraftError],
      errorSink: DataFrame => Unit)(
      implicit enc: Encoder[Envelope[T]]): StreamingQuery = {
    val writeBatch: DataFrame => Unit = { batch =>
      batch.persist()
      try {
        val decoded = RecordLog.consumerLogging(
          conf.enabledConsumerRecordLogging)(decodeEnvelope(batch)(decodeFn))
        val processed = processValid(decoded)(process)
        errorSink(toErrorRecords(processed, conf.applicationId))
      } finally batch.unpersist()
      ()
    }
    val guarded: (DataFrame, Long) => Unit =
      if (conf.commitDir.nonEmpty)
        // namespaced per pipeline: batchIds restart at 0 for EVERY query,
        // so two pipelines (or one pipeline after a fresh checkpoint)
        // sharing a bare dir would skip each other's batches
        idempotent(s"${conf.commitDir}/${conf.applicationId}-simple")(
          writeBatch)
      else (batch, _) => writeBatch(batch)
    source.writeStream
      .queryName(s"${conf.applicationId}-simple")
      .option("checkpointLocation", checkpointOrTemp(conf))
      // publish the batchId for the duration of the batch so a
      // transactional Kafka sink inside can fence replays (the sink SPI
      // stays DataFrame => Unit)
      .foreachBatch((b: DataFrame, id: Long) =>
        TransactionalKafka.withBatchId(id)(guarded(b, id)))
      .start()
  }

  /** The delta pipeline (§3.2): decode → re-key → stateful dedup → valid to
    * output sink, errors to error sink. State-store failures become
    * FAILED_TO_READ_OR_WRITE_STATE_STORE errors in the reference
    * (TransformerBuilder.java:145-154); in Spark a state-store failure fails
    * the task (retried, then fail-fast) — key-extraction failures are the
    * user-code error path we route.
    */
  def delta[T](
      source: DataFrame,
      conf: GraftConf,
      decodeFn: Array[Byte] => Either[GraftError, T],
      keyFn: T => String,
      seqFn: Envelope[T] => Long,
      isUpdated: (T, T) => Boolean,
      outputSink: DataFrame => Unit,
      errorSink: DataFrame => Unit,
      trigger: Trigger = Trigger.ProcessingTime(0L))(
      implicit enc: Encoder[Envelope[T]],
      pairEnc: Encoder[(String, Envelope[T])]): StreamingQuery = {
    import source.sparkSession.implicits._
    applyStateStoreConf(conf, source.sparkSession)
    val decoded = RecordLog.consumerLogging(
      conf.enabledConsumerRecordLogging)(decodeEnvelope(source)(decodeFn))
    // Re-key on the business key (T3); key-extraction exceptions flip the
    // envelope invalid, like the reference's catch-all (TransformerBuilder.java:145).
    val rekeyed = decoded.map { env =>
      env.value match {
        case Some(v) if env.isValid =>
          try env.copy(key = keyFn(v))
          catch {
            case scala.util.control.NonFatal(t) =>
              env.withError(GraftError.fromThrowable(t,
              ErrorCodes.FailedToReadOrWriteStateStore,
              "Something went wrong while reading or writing to state store: " +
                t.getMessage,
              v.getClass.getName))
          }
        case _ => env
      }
    }
    val valid = rekeyed.filter((e: Envelope[T]) => e.isValid)
    val invalid = rekeyed.filter((e: Envelope[T]) => e.isInvalid)
    val deduped = DeltaDedup.stream[Envelope[T], String](valid)(
      _.key, seqFn, (old, nw) => isUpdated(old.value.get, nw.value.get))
      .map { case (k, env) => env.copy(key = k) }

    // ONE streaming query, like the reference's one topology: the stateless
    // invalid branch is unioned with the stateful dedup output and routed in
    // a single foreachBatch. Two separate queries would each consume the
    // Kafka source independently — double the broker reads and two
    // divergent offset trackers.
    val writeBatch: Dataset[Envelope[T]] => Unit = { b =>
      b.persist()
      try {
        outputSink(b.filter((e: Envelope[T]) => e.isValid).toDF())
        errorSink(toErrorRecords(
          b.filter((e: Envelope[T]) => e.isInvalid), conf.applicationId))
      } finally b.unpersist()
      ()
    }
    val guarded: (Dataset[Envelope[T]], Long) => Unit =
      if (conf.commitDir.nonEmpty)
        idempotent(s"${conf.commitDir}/${conf.applicationId}-delta")(
          writeBatch)
      else (b, _) => writeBatch(b)
    deduped.union(invalid).writeStream
      .queryName(s"${conf.applicationId}-delta")
      .option("checkpointLocation", checkpointOrTemp(conf))
      // publish the batchId for the duration of the batch (see simple)
      .foreachBatch((b: Dataset[Envelope[T]], id: Long) =>
        TransactionalKafka.withBatchId(id)(guarded(b, id)))
      .trigger(trigger).start()
  }

  /** The RocksDB state-store session confs [[graft.core.GraftConf
    * .useRocksDbStateStore]] turns on — the same pair
    * [[graft.sources.Sources.recommendedConfigs]] recommends, factored
    * here so the conf flag and the recommendation can never drift. The
    * provider class is a runtime-settable SQL conf read at QUERY start,
    * so setting it just before `.start()` is race-free for that query. */
  private[graft] val RocksDbStateStoreConfigs: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
      "true")

  private def applyStateStoreConf(
      conf: GraftConf,
      spark: org.apache.spark.sql.SparkSession): Unit =
    if (conf.useRocksDbStateStore)
      RocksDbStateStoreConfigs.foreach { case (k, v) => spark.conf.set(k, v) }

  private def checkpointOrTemp(conf: GraftConf): String =
    if (conf.checkpointLocation.nonEmpty) conf.checkpointLocation
    else {
      val tmp = java.nio.file.Files.createTempDirectory("graft-ckpt-").toString
      logWarning(s"no checkpointLocation configured for " +
        s"${conf.applicationId}; using temp dir $tmp — offsets and dedup " +
        "state will NOT survive a restart (fine for tests, wrong for " +
        "production)")
      tmp
    }

  /** Lifecycle decorator — S3 (KafkaStreamsDecorator.java:24-37): log the
    * plan, fail fast on query failure (the reference kills the JVM so the
    * orchestrator reschedules, README.md:123), close on shutdown.
    */
  def startAndAwait(query: StreamingQuery, exitOnFailure: Boolean = true): Unit = {
    logInfo(s"streaming query started: ${query.name} (id=${query.id})")
    query.explain() // prints the physical plan (returns Unit)
    sys.addShutdownHook { if (query.isActive) query.stop() }
    try query.awaitTermination()
    catch {
      case t: Throwable =>
        logError(s"streaming query ${query.name} failed", t)
        if (exitOnFailure) sys.exit(1) else throw t
    }
  }

  /** Fail-fast + logging listener — S3/S4/S5 analog: logs progress (consumed
    * and produced row counts) and terminates the JVM on query failure. */
  def failFastListener(exitOnFailure: Boolean = true): StreamingQueryListener =
    new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        logInfo(s"query started: ${e.name} (${e.id})")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        logInfo(s"query progress: ${e.progress.name} rows=${e.progress.numInputRows}")
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        e.exception.foreach { ex =>
          logError(s"query ${e.id} died: $ex")
          if (exitOnFailure) sys.exit(1)
        }
    }
}
