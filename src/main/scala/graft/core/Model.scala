package graft.core

import org.apache.spark.sql.types._

/** Error descriptor carried on the invalid side of a record envelope.
  *
  * Mirrors the reference's error sum-type payload
  * (/root/reference/src/main/java/fr/barbicane/maston/error/KafkaError.java:13-24):
  * message, code, throwable (split here into class/message/stacktrace since a
  * live Throwable does not belong in a row), targetClass, optional raw bytes.
  * `rawBytes` preserves the never-lose-a-record contract: on deserialization
  * failure the original payload travels with the error.
  */
case class GraftError(
    message: String,
    code: String,
    exceptionClass: String,
    exceptionMessage: String,
    stackTrace: String,
    targetClass: String,
    rawBytes: Array[Byte])

object GraftError {
  def fromThrowable(
      t: Throwable,
      code: String,
      message: String,
      targetClass: String,
      rawBytes: Array[Byte] = null): GraftError = {
    val sw = new java.io.StringWriter()
    t.printStackTrace(new java.io.PrintWriter(sw))
    GraftError(message, code, t.getClass.getName, t.getMessage, sw.toString,
      targetClass, rawBytes)
  }

  /** Schema of the error struct when represented as a DataFrame column. */
  val schema: StructType = StructType(Seq(
    StructField("message", StringType),
    StructField("code", StringType),
    StructField("exceptionClass", StringType),
    StructField("exceptionMessage", StringType),
    StructField("stackTrace", StringType),
    StructField("targetClass", StringType),
    StructField("rawBytes", BinaryType)))
}

/** A Kafka-shaped record envelope: metadata + decoded value + optional error.
  *
  * This is the typed encoding of the reference's in-flight
  * `KStream[String, Validation[KafkaError[T], T]]`
  * (/root/reference/src/main/java/fr/barbicane/maston/topology/TopologyBuilder.java:36-37):
  * `error == None` is the valid side, `error == Some(_)` the invalid side.
  * `rawValue` carries the original bytes so the error sink can emit them
  * verbatim (VavrSafeSerializer.java:26-41 semantics).
  */
case class Envelope[T](
    key: String,
    value: Option[T],
    error: Option[GraftError],
    rawValue: Array[Byte],
    topic: String,
    partition: Int,
    offset: Long,
    timestamp: java.sql.Timestamp,
    headers: Seq[(String, Array[Byte])] = Seq.empty) {
  def isValid: Boolean = error.isEmpty
  def isInvalid: Boolean = error.nonEmpty
  def withError(e: GraftError): Envelope[T] = copy(error = Some(e))
}

/** Error codes of the reference
  * (KafkaErrorToHeaderBuilder.java:28-34). */
object ErrorCodes {
  val FailedToDeserializeRecord = "FAILED_TO_DESERIALIZE_RECORD"
  val FailedToProcessRecord = "FAILED_TO_PROCESS_RECORD"
  val FailedToReadOrWriteStateStore = "FAILED_TO_READ_OR_WRITE_STATE_STORE"
}

/** The 11 diagnostic header names written onto error-topic records
  * (KafkaErrorToHeaderBuilder.java:16-26). */
object ErrorHeaderNames {
  val ApplicationId = "error.source.application.id"
  val Timestamp = "error.source.timestamp"
  val Topic = "error.source.topic"
  val Partition = "error.source.partition"
  val Offset = "error.source.partition.offset"
  val ApplicationCode = "error.source.application.code"
  val ApplicationMessage = "error.source.application.message"
  val TargetClass = "error.source.target.class"
  val ExceptionStackTrace = "error.source.exception.stack.trace"
  val ExceptionMessage = "error.source.exception.message"
  val ExceptionClass = "error.source.exception.class"

  val all: Seq[String] = Seq(ApplicationId, Timestamp, Topic, Partition,
    Offset, ApplicationCode, ApplicationMessage, TargetClass,
    ExceptionStackTrace, ExceptionMessage, ExceptionClass)

  /** The 8 headers the reference's Connect SMT lifts to struct fields, in
    * the reference's declaration order (HeaderTo.java:73-82): target class,
    * application code/id, exception message/stacktrace, topic, application
    * message, exception class. Timestamp/partition/offset are NOT lifted. */
  val liftedByHeaderTo: Seq[String] = Seq(TargetClass, ApplicationCode,
    ApplicationId, ExceptionMessage, ExceptionStackTrace, Topic,
    ApplicationMessage, ExceptionClass)
}

/** Pipeline configuration, the Spark-side analog of the reference's
  * KafkaCommonProperties / KafkaConsumerProperties / KafkaPropertiesBuilder
  * (under src/main/java/fr/barbicane/maston/properties/). Kafka-security
  * knobs become `kafka.`-prefixed source
  * options; the "1 stream thread, die fast" philosophy becomes one
  * StreamingQuery with a fail-fast listener.
  */
case class GraftConf(
    applicationId: String,
    bootstrapServers: String = "",
    topic: String = "",
    errorTopic: String = "",
    outputTopic: String = "",
    startFromEarliest: Boolean = true,
    checkpointLocation: String = "",
    // Sink-side micro-batch commit log (GraftStream.idempotent): when set,
    // the pipelines skip replayed batches whose sink already committed —
    // the batch-level analog of the reference's idempotent-producer stance.
    // Keep it NEXT TO the checkpoint (same store, same lifecycle); empty =
    // plain at-least-once sinks.
    commitDir: String = "",
    // Persistent per-key state for the stateful pipelines, the Spark
    // analog of the reference's RocksDB KeyValueStore choice
    // (TopologyBuilder.java:66-69): when true, [[graft.streaming
    // .GraftStream.delta]] sets the RocksDB state store provider and
    // changelog checkpointing on the SESSION before starting — per-key
    // state lives off-heap/on-disk, so an unbounded business-key space
    // does not grow the executor heap. Session-wide by Spark's design:
    // every streaming query started on the session afterwards inherits
    // the provider (which is what a production deployment wants — one
    // session posture, not per-query drift).
    useRocksDbStateStore: Boolean = false,
    // Opt-in exactly-once Kafka TOPIC sink
    // (graft.streaming.TransactionalKafka): per-partition transactional
    // producers with the batchId committed atomically alongside the data
    // on a control topic, closing the reference's read_committed/EOS
    // posture (KafkaPropertiesBuilder.java:73,89-93) that the default
    // connector sink (at-least-once) leaves open. When true,
    // GraftStream.kafkaSink routes through the transactional writer.
    transactionalKafkaSink: Boolean = false,
    // Control topic for the transactional sink's committed-batch records;
    // empty = "<applicationId>.txn-commits". Make it compacted (key =
    // transactional id) on a real cluster.
    txnControlTopic: String = "",
    // FIXED partition count for the transactional sink's key-hash
    // repartition — replay dedup is per (partition, transactional.id), so
    // this must not drift between a batch's first attempt and its replay.
    // Change only at a clean stop.
    txnSinkPartitions: Int = 32,
    // Kafka security plumbing, first-class like the reference's
    // (KafkaPropertiesBuilder.java:43-67, KafkaCommonProperties.java:11-16) —
    // every production consumer of the reference sets these. Empty = unset.
    securityProtocol: String = "",
    saslMechanism: String = "",
    saslJaasConfig: String = "",
    sslEndpointIdentificationAlgorithm: String = "",
    // Schema-registry governance (KafkaPropertiesBuilder.java:44-55),
    // carried so ONE conf object configures the whole pipeline like the
    // reference's property POJOs. Live wiring:
    // graft.serde.RegistryResolver.fromConf(this) builds the HTTP resolver
    // (REST GET /schemas/ids/{id}, per-executor cache, basic auth honoring
    // basicAuthCredentialsSource = USER_INFO | URL | SASL_INHERIT) that
    // plugs into SafeAvro.decode / SafeAvro.serdePair.
    schemaRegistryUrl: String = "",
    schemaRegistryBasicAuthUserInfo: String = "",
    basicAuthCredentialsSource: String = "",
    schemaAutoRegister: Boolean = false,
    // Per-record logging interceptor analogs, off by default like the
    // reference's enable flags (KafkaPropertiesBuilder.java:77-82).
    enabledConsumerRecordLogging: Boolean = false,
    enabledProducerRecordLogging: Boolean = false,
    // Producer tuning with the reference's defaults applied when unset
    // (KafkaPropertiesBuilder.java:93-104).
    requestTimeoutMs: Option[Int] = None,
    connectionsMaxIdleMs: Option[Int] = None,
    extraSourceOptions: Map[String, String] = Map.empty) {
  def startingOffsets: String = if (startFromEarliest) "earliest" else "latest"

  /** The `kafka.`-prefixed client options derived from the security fields;
    * applied to both the source and the sink (the reference sets them on the
    * shared common properties). Unset fields are omitted entirely so Spark's
    * Kafka connector never sees an empty-string config. */
  def kafkaClientOptions: Map[String, String] =
    Seq(
      "kafka.security.protocol" -> securityProtocol,
      "kafka.sasl.mechanism" -> saslMechanism,
      "kafka.sasl.jaas.config" -> saslJaasConfig,
      "kafka.ssl.endpoint.identification.algorithm" ->
        sslEndpointIdentificationAlgorithm)
      .filter(_._2.nonEmpty).toMap ++
      requestTimeoutMs.map(v => "kafka.request.timeout.ms" -> v.toString) ++
      connectionsMaxIdleMs.map(v =>
        "kafka.connections.max.idle.ms" -> v.toString)

  /** Producer durability for the sink, mirroring the reference's
    * exactly-once-leaning defaults (KafkaPropertiesBuilder.java:73,89-104):
    * idempotent producer, acks=all, unbounded retries, block (never drop)
    * when the broker is unreachable, and the reference's timeout defaults
    * when the tuning fields are unset.
    *
    * Delivery-semantics delta vs the reference, stated here because it is a
    * real behavioral difference: Kafka Streams pairs these with a
    * transactional producer + read_committed for EOS; Spark's Kafka sink has
    * no transactional writer, so a failed micro-batch can replay — the
    * pipeline is AT-LEAST-ONCE into Kafka (idempotence only dedups broker
    * retries, not batch replays). Downstream consumers needing
    * exactly-once must dedup on the business key, e.g. with
    * [[graft.streaming.DeltaDedup]]. */
  def kafkaProducerOptions: Map[String, String] = Map(
    "kafka.enable.idempotence" -> "true",
    "kafka.acks" -> "all",
    "kafka.retries" -> Int.MaxValue.toString,
    "kafka.max.block.ms" -> Long.MaxValue.toString,
    "kafka.request.timeout.ms" ->
      requestTimeoutMs.getOrElse(300000).toString,
    "kafka.connections.max.idle.ms" ->
      connectionsMaxIdleMs.getOrElse(540000).toString)

  /** Control topic for the transactional sink, defaulted per application
    * so two apps sharing a cluster never read each other's commit
    * records. */
  def txnControlTopicOrDefault: String =
    if (txnControlTopic.nonEmpty) txnControlTopic
    else s"$applicationId.txn-commits"

  /** [[kafkaClientOptions]] with the connector's `kafka.` prefix stripped —
    * the RAW client configs a directly-constructed producer/consumer (the
    * transactional sink's reflective factory) expects. */
  def rawKafkaClientProps: Map[String, String] =
    kafkaClientOptions.map { case (k, v) =>
      k.stripPrefix("kafka.") -> v }

  /** [[kafkaProducerOptions]] with the connector prefix stripped, minus
    * the keys the transactional factory pins itself (idempotence, acks —
    * it also sets the serializers and transactional.id). Without this the
    * txn producer would run with client-DEFAULT retries/blocking while
    * the non-transactional sink gets the unbounded-retry hardening —
    * the durability posture must not depend on which sink is selected. */
  def rawKafkaProducerProps: Map[String, String] =
    (kafkaProducerOptions.map { case (k, v) =>
      k.stripPrefix("kafka.") -> v }) -- Seq("enable.idempotence", "acks")
}
