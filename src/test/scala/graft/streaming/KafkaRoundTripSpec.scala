package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkSpec
import graft.core.{ErrorCodes, GraftConf, ErrorHeaderNames => H}

import org.apache.spark.sql.functions._

/** Real-broker end-to-end: produce → kafkaSource → simple pipeline →
  * kafkaSink(error topic) → consume back. The Spark analog of the
  * reference's integration suite over its compose harness
  * (SimpleVavrStreamConsumerIT.java:77-324, docker-compose.test.yml:1-34).
  *
  * Environment-gated: the build sandbox has no broker and no
  * spark-sql-kafka connector jar, so every test here `assume`s
  * `SPARK_GRAFT_KAFKA=1` and cancels cleanly otherwise. To run for real:
  *
  *   docker compose -f src/test/resources/docker-compose.kafka.yml up -d
  *   SPARK_GRAFT_KAFKA=1 sbt "testOnly graft.streaming.KafkaRoundTripSpec"
  *
  * (plus the connector package — see the compose file header).
  */
object KafkaRoundTripSpec {
  val processed = new ConcurrentLinkedQueue[String]()
}

class KafkaRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private val bootstrap =
    sys.env.getOrElse("SPARK_GRAFT_KAFKA_BOOTSTRAP", "localhost:9092")
  private def live: Boolean = sys.env.get("SPARK_GRAFT_KAFKA").contains("1")
  private val runId = java.util.UUID.randomUUID().toString.take(8)

  test("produce -> kafkaSource -> simple -> error topic -> consume back") {
    assume(live, "SPARK_GRAFT_KAFKA != 1: no broker in this environment")
    val inTopic = s"graft-it-in-$runId"
    val errTopic = s"graft-it-err-$runId"
    KafkaRoundTripSpec.processed.clear()

    // produce the fixture batch (valid, deser failure, business failure)
    Seq("k1|ok-one", "not-a-valid-payload", "k2|fail-me", "k3|ok-two")
      .toDF("value")
      .selectExpr("CAST(NULL AS STRING) AS key", "CAST(value AS BINARY) AS value")
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", inTopic)
      .save()

    val conf = GraftConf(
      applicationId = s"graft-it-$runId",
      bootstrapServers = bootstrap,
      topic = inTopic,
      errorTopic = errTopic,
      checkpointLocation = java.nio.file.Files
        .createTempDirectory("graft-it-ckpt").toString)
    val q = GraftStream.simple[Dummy](
      GraftStream.kafkaSource(spark, conf), conf, GraftStreamSpec.decodeFn,
      process = d =>
        if (d.value == "fail-me")
          Some(graft.core.GraftError("business says no",
            ErrorCodes.FailedToProcessRecord,
            "java.lang.IllegalStateException", "nope", null, "Dummy", null))
        else { KafkaRoundTripSpec.processed.add(d.value); None },
      errorSink = GraftStream.kafkaSink(conf, errTopic))
    try q.processAllAvailable() finally q.stop()

    // valid records reached the processor; nothing valid was produced
    assert(KafkaRoundTripSpec.processed.toArray.toSet ==
      Set("ok-one", "ok-two"))

    // consume the error topic back: 2 error records with diagnostics
    val errs = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", errTopic)
      .option("startingOffsets", "earliest")
      .option("includeHeaders", "true")
      .load()
      .select(col("value").cast("string").as("payload"), col("headers"))
    val lifted = graft.errors.ErrorHeaders.headersToColumns(errs).collect()
    assert(lifted.length == 2)
    val byCode = lifted.map(r =>
      r.getAs[String](H.ApplicationCode.replace('.', '_')) ->
        r.getAs[String]("payload")).toMap
    assert(byCode(ErrorCodes.FailedToDeserializeRecord) ==
      "not-a-valid-payload", "deser failure carries the original bytes")
    assert(byCode(ErrorCodes.FailedToProcessRecord) == "k2|fail-me",
      "business failure carries the source record")
  }

  test("delta over a real broker: suppression + output topic") {
    assume(live, "SPARK_GRAFT_KAFKA != 1: no broker in this environment")
    val inTopic = s"graft-it-delta-in-$runId"
    val outTopic = s"graft-it-delta-out-$runId"
    val errTopic = s"graft-it-delta-err-$runId"

    Seq("a|v1", "a|v1", "a|v2", "b|v1").zipWithIndex
      .map { case (v, i) => (i.toString, v) }
      .toDF("key", "value")
      .selectExpr("key", "CAST(value AS BINARY) AS value")
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", inTopic)
      .save()

    val conf = GraftConf(
      applicationId = s"graft-it-delta-$runId",
      bootstrapServers = bootstrap,
      topic = inTopic,
      outputTopic = outTopic,
      errorTopic = errTopic,
      checkpointLocation = java.nio.file.Files
        .createTempDirectory("graft-it-ckpt").toString)
    val q = GraftStream.delta[Dummy](
      GraftStream.kafkaSource(spark, conf), conf, GraftStreamSpec.decodeFn,
      keyFn = _.busKey,
      seqFn = _.offset,
      isUpdated = (old, nw) => old.value != nw.value,
      outputSink = df => GraftStream.kafkaSink(conf, outTopic)(
        GraftStream.toOutputRecordsTyped(
          df.as[graft.core.Envelope[Dummy]],
          (d: Dummy) => s"${d.busKey}|${d.value}".getBytes("UTF-8"))),
      errorSink = GraftStream.kafkaSink(conf, errTopic))
    try q.processAllAvailable() finally q.stop()

    val out = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", outTopic)
      .option("startingOffsets", "earliest")
      .load()
      .select(col("key").cast("string"), col("value").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    // duplicate a|v1 suppressed; update a|v2 and first b|v1 pass, re-keyed
    // to the business key
    assert(out.toSet == Set(("a", "a|v1"), ("a", "a|v2"), ("b", "b|v1")),
      s"got ${out.toSeq}")
  }

  test("transactional sink over a real broker: commits visible, EOS shape") {
    assume(live, "SPARK_GRAFT_KAFKA != 1: no broker in this environment")
    val inTopic = s"graft-it-txn-in-$runId"
    val errTopic = s"graft-it-txn-err-$runId"
    KafkaRoundTripSpec.processed.clear()

    Seq("k1|ok-one", "not-a-valid-payload", "k3|ok-two")
      .toDF("value")
      .selectExpr("CAST(NULL AS STRING) AS key", "CAST(value AS BINARY) AS value")
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", inTopic)
      .save()

    val conf = GraftConf(
      applicationId = s"graft-it-txn-$runId",
      bootstrapServers = bootstrap,
      topic = inTopic,
      errorTopic = errTopic,
      transactionalKafkaSink = true,
      txnSinkPartitions = 2,
      checkpointLocation = java.nio.file.Files
        .createTempDirectory("graft-it-ckpt").toString)
    // kafkaSink routes through the ReflectiveKafkaTxnFactory when the
    // conf flag is on — this exercises the real reflective producer +
    // control-topic consumer against the broker
    val q = GraftStream.simple[Dummy](
      GraftStream.kafkaSource(spark, conf), conf, GraftStreamSpec.decodeFn,
      process = d => { KafkaRoundTripSpec.processed.add(d.value); None },
      errorSink = GraftStream.kafkaSink(conf, errTopic))
    try q.processAllAvailable() finally q.stop()

    assert(KafkaRoundTripSpec.processed.toArray.toSet ==
      Set("ok-one", "ok-two"))
    // read_committed consumer (kafka source default here) sees exactly the
    // committed error record, once
    val errs = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", errTopic)
      .option("startingOffsets", "earliest")
      .option("kafka.isolation.level", "read_committed")
      .load()
      .select(col("value").cast("string"))
      .collect().map(_.getString(0)).toSeq
    assert(errs == Seq("not-a-valid-payload"), s"got $errs")
    // the control topic carries committed batch markers for the app
    val ctl = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", conf.txnControlTopicOrDefault)
      .option("startingOffsets", "earliest")
      .option("kafka.isolation.level", "read_committed")
      .load()
      .select(col("key").cast("string"))
      .collect().map(_.getString(0))
    assert(ctl.nonEmpty &&
      ctl.forall(_.startsWith(s"${conf.applicationId}-$errTopic-p")),
      s"control records: ${ctl.toSeq}")
  }
}
