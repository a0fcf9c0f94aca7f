package graft.streaming

import graft.core.Envelope

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

/** Per-record logging, the analog of the reference's consumer/producer
  * interceptors (DefaultKafkaConsumerInterceptor.java:15-23,
  * DefaultKafkaProducerInterceptor.java:14-25): log topic/partition/key/value
  * of every consumed record and topic/key/value of every produced record,
  * behind enable flags (KafkaPropertiesBuilder.java:77-82) because at any
  * real volume this is a firehose.
  *
  * Implemented as pass-through peeks that run ON THE EXECUTORS — the same
  * placement as the reference's interceptors, which run in the client
  * threads, not a central collector. Disabled, they return the input
  * unchanged (zero plan nodes added).
  */
object RecordLog {

  // Initialized lazily on each JVM that touches it (driver or executor);
  // slf4j loggers are not serializable so the closure must not capture one.
  @transient private lazy val logger =
    org.slf4j.LoggerFactory.getLogger("graft.streaming.RecordLog")

  /** S4 analog: log every consumed record (after decode, so the value is
    * printable like the interceptor's deserialized value). */
  def consumerLogging[T](enabled: Boolean)(ds: Dataset[Envelope[T]])(
      implicit enc: Encoder[Envelope[T]]): Dataset[Envelope[T]] =
    if (!enabled) ds
    else ds.map { env =>
      logger.info("onConsume topic={} partition={} key={} value={}",
        env.topic, Int.box(env.partition), env.key,
        env.value.map(_.toString).getOrElse("<invalid>"))
      env
    }

  /** S5 analog: wrap a sink so every produced record is logged on its way
    * in. The row schema is preserved (Encoders.row), so any sink shape
    * works. */
  def producerLogging(topic: String, enabled: Boolean)(
      inner: DataFrame => Unit): DataFrame => Unit =
    if (!enabled) inner
    else df => {
      implicit val enc: Encoder[org.apache.spark.sql.Row] =
        Encoders.row(df.schema)
      val keyIdx = df.schema.fieldNames.indexOf("key")
      inner(df.map { r =>
        logger.info("onSend topic={} key={}", topic, keyText(r, keyIdx))
        r
      })
    }

  /** Printable key: binary Kafka keys decode as UTF-8 (the reference's
    * interceptor logs the string key) — String.valueOf on Array[Byte]
    * would print a JVM reference like "[B@1a2b3c". */
  private def keyText(r: org.apache.spark.sql.Row, keyIdx: Int): String =
    if (keyIdx < 0) "<none>"
    else r.get(keyIdx) match {
      case null => "<null>"
      case b: Array[Byte] => new String(b, java.nio.charset.StandardCharsets.UTF_8)
      case v => String.valueOf(v)
    }
}
