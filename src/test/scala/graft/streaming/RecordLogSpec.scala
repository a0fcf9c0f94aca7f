package graft.streaming

import graft.SparkSpec
import graft.core.{Envelope, GraftConf}

/** S4/S5 interceptor analogs: pass-through contract + the conf plumbing
  * (DefaultKafkaConsumerInterceptor.java:15-23,
  * DefaultKafkaProducerInterceptor.java:14-25,
  * KafkaPropertiesBuilder.java:43-67,77-82). */
class RecordLogSpec extends SparkSpec {
  import spark.implicits._

  private def envs = Seq(
    Envelope[String]("k1", Some("v1"), None, Array[Byte](1), "t", 0, 0L,
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
    Envelope[String]("k2", Some("v2"), None, Array[Byte](2), "t", 1, 1L,
      java.sql.Timestamp.valueOf("2024-01-01 00:00:01"))).toDS()

  test("consumerLogging disabled returns the dataset unchanged (no-op)") {
    val ds = envs
    assert(RecordLog.consumerLogging(enabled = false)(ds) eq ds)
  }

  test("consumerLogging enabled passes every record through unmodified") {
    val out = RecordLog.consumerLogging(enabled = true)(envs)
      .collect().sortBy(_.key)
    assert(out.map(e => (e.key, e.value)).toSeq ==
      Seq(("k1", Some("v1")), ("k2", Some("v2"))))
  }

  test("producerLogging enabled preserves rows and schema into the sink") {
    val df = Seq(("k1", "a"), ("k2", "b")).toDF("key", "value")
    var seen: Seq[(String, String)] = Nil
    val sink = RecordLog.producerLogging("out-topic", enabled = true) { d =>
      assert(d.schema == df.schema)
      seen = d.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    }
    sink(df)
    assert(seen.sorted == Seq("k1" -> "a", "k2" -> "b"))
  }

  test("kafkaClientOptions maps only the set security fields, kafka.-prefixed") {
    val conf = GraftConf("app",
      securityProtocol = "SASL_SSL",
      saslMechanism = "PLAIN",
      saslJaasConfig = "org.apache.kafka.common.security.plain.PlainLoginModule required;",
      requestTimeoutMs = Some(30000))
    val opts = conf.kafkaClientOptions
    assert(opts("kafka.security.protocol") == "SASL_SSL")
    assert(opts("kafka.sasl.mechanism") == "PLAIN")
    assert(opts("kafka.request.timeout.ms") == "30000")
    // unset fields are omitted, never passed as empty strings
    assert(!opts.contains("kafka.ssl.endpoint.identification.algorithm"))
    assert(!opts.contains("kafka.connections.max.idle.ms"))
  }

  test("kafkaProducerOptions carries the reference durability defaults") {
    val opts = GraftConf("app").kafkaProducerOptions
    assert(opts("kafka.enable.idempotence") == "true")
    assert(opts("kafka.acks") == "all")
    assert(opts("kafka.retries") == Int.MaxValue.toString)
    assert(opts("kafka.max.block.ms") == Long.MaxValue.toString)
    // reference timeout defaults apply when the tuning fields are unset
    // (KafkaPropertiesBuilder.java:96-104), caller values win otherwise
    assert(opts("kafka.request.timeout.ms") == "300000")
    assert(opts("kafka.connections.max.idle.ms") == "540000")
    val tuned = GraftConf("app", requestTimeoutMs = Some(30000))
    assert(tuned.kafkaProducerOptions("kafka.request.timeout.ms") == "30000")
  }
}
