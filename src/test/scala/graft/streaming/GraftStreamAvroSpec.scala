package graft.streaming

import java.nio.ByteBuffer
import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkSpec
import graft.core.{Envelope, ErrorCodes, GraftConf, ErrorHeaderNames => H}
import graft.serde.SafeAvro

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Avro twin of GraftStreamSpec — the golden test the reference runs over
  * Confluent-framed Avro payloads
  * (SimpleVavrStreamConsumerTopologyTest.java:75-185): D1 decode through the
  * FixedResolver (mock:// registry analog), valid records reach the
  * processor, business/deser failures land on the error sink with the
  * original wire bytes and diagnostic headers, and D2 re-encodes the output
  * path back to wire format. Includes the decimal(64,0) overflow policy
  * (dummy-avro-record.avsc:26-38 vs Spark's 38-digit cap). */
object GraftStreamAvroSpec {
  val processed = new ConcurrentLinkedQueue[String]()
  val errorRows = new ConcurrentLinkedQueue[Row]()

  // Mirror of dummy-avro-record.avsc: required string, nullable business
  // key, nullable string, nullable decimal(64,0).
  val schemaJson: String =
    """{"type":"record","name":"DummyAvroTest","namespace":"graft.gen","fields":[
      |{"name":"mandatoryStringValue","type":"string"},
      |{"name":"mandatoryBusinessStringKey","type":["null","string"],"default":null},
      |{"name":"nullableStringValue","type":["null","string"],"default":null},
      |{"name":"nullableDummyBigDecimal","type":["null",
      |  {"logicalType":"decimal","precision":64,"scale":0,"type":"bytes"}],
      | "default":null}]}""".stripMargin
  @transient lazy val schema: Schema = new Schema.Parser().parse(schemaJson)
  val SchemaId = 7
  val resolver = new SafeAvro.FixedResolver(Map(SchemaId -> schemaJson))

  case class AvroDummy(
      mandatoryStringValue: String,
      businessKey: String,
      nullableStringValue: Option[String],
      nullableDummyBigDecimal: Option[java.math.BigDecimal])

  def toRecord(d: AvroDummy): GenericRecord = {
    val r = new GenericData.Record(schema)
    r.put("mandatoryStringValue", d.mandatoryStringValue)
    r.put("mandatoryBusinessStringKey", d.businessKey)
    r.put("nullableStringValue", d.nullableStringValue.orNull)
    // normalize to the logical type's declared scale 0 — Spark's encoder
    // carries BigDecimal as (38,18), whose unscaled value would otherwise
    // inflate by 10^18 on the wire
    r.put("nullableDummyBigDecimal",
      d.nullableDummyBigDecimal
        .map(bd => ByteBuffer.wrap(bd.setScale(0).unscaledValue.toByteArray))
        .orNull)
    r
  }

  def fromRecord(rec: GenericRecord)
      : Either[graft.core.GraftError, AvroDummy] =
    (rec.get("nullableDummyBigDecimal") match {
      case null => Right(None)
      case v => SafeAvro.decimalCapped(v, 0, "AvroDummy").map(Some(_))
    }).map { dec =>
      AvroDummy(
        rec.get("mandatoryStringValue").toString,
        Option(rec.get("mandatoryBusinessStringKey")).map(_.toString).orNull,
        Option(rec.get("nullableStringValue")).map(_.toString),
        dec)
    }

  val pair: SafeAvro.SerdePair[AvroDummy] = SafeAvro.serdePair(
    resolver, schemaJson, SchemaId, "AvroDummy", fromRecord, toRecord)
}

class GraftStreamAvroSpec extends SparkSpec {
  import GraftStreamAvroSpec._
  import spark.implicits._

  private def wire(d: AvroDummy): Array[Byte] =
    SafeAvro.encode(toRecord(d), SchemaId)

  private def kafkaShaped(idx: Long, payload: Array[Byte]) =
    ("k-" + idx, payload, "avro-topic", 0, idx,
      new Timestamp(1700000000000L + idx))

  private def headers(r: Row): Map[String, String] =
    r.getSeq[Row](r.fieldIndex("headers")).map(h =>
      h.getString(0) -> new String(h.getAs[Array[Byte]](1), "UTF-8")).toMap

  test("avro simple pipeline: decode, process, error routing, decimal policy") {
    processed.clear(); errorRows.clear()
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Array[Byte], String, Int, Long, Timestamp)]
    val source = input.toDF()
      .toDF("key", "value", "topic", "partition", "offset", "timestamp")

    val ok = AvroDummy("test-111", "bk-1", None,
      Some(new java.math.BigDecimal("12345")))
    val bizFail = AvroDummy("fail-me", "bk-2", Some("x"), None)
    // 39 digits: exceeds Spark's 38-digit decimal cap → policy rejects
    val tooBig = AvroDummy("big", "bk-3", None,
      Some(new java.math.BigDecimal("1" + "0" * 38)))
    val corrupt = Array[Byte](0, 0, 0, 0) // shorter than wire prefix

    val conf = GraftConf(applicationId = "graft-avro-app")
    val q = GraftStream.simple[AvroDummy](
      source, conf, pair.decodeFn,
      process = d =>
        if (d.mandatoryStringValue == "fail-me")
          Some(graft.core.GraftError("Failed to get sub dummy from another API.",
            "HTTP_CLIENT_ERROR_TO_GET_SUB_DUMMY",
            "java.io.IOException", "dummyTestException", null, "AvroDummy", null))
        else { processed.add(d.mandatoryStringValue); None },
      errorSink = df => df.collect().foreach(errorRows.add))
    try {
      input.addData(Seq(
        kafkaShaped(0, wire(ok)),
        kafkaShaped(1, corrupt),
        kafkaShaped(2, wire(bizFail)),
        kafkaShaped(3, wire(tooBig))))
      q.processAllAvailable()
    } finally q.stop()

    // valid record decoded through the wire format and processed
    assert(processed.toArray.toSet == Set("test-111"))

    val errs = errorRows.toArray(Array.empty[Row])
    assert(errs.length == 3)

    // deser failure: original bytes to the error topic
    val deser = errs.find(r => headers(r)(H.Offset) == "1").get
    assert(headers(deser)(H.ApplicationCode) ==
      ErrorCodes.FailedToDeserializeRecord)
    assert(deser.getAs[Array[Byte]]("value").toSeq == corrupt.toSeq)

    // business failure: wire bytes preserved, reference's header assertions
    val biz = errs.find(r => headers(r)(H.Offset) == "2").get
    val bh = headers(biz)
    assert(bh(H.TargetClass) == "AvroDummy")
    assert(bh(H.ApplicationId) == "graft-avro-app")
    assert(bh(H.Topic) == "avro-topic")
    assert(bh(H.ApplicationCode) == "HTTP_CLIENT_ERROR_TO_GET_SUB_DUMMY")
    assert(bh(H.ApplicationMessage) == "Failed to get sub dummy from another API.")
    assert(bh(H.ExceptionClass) == "java.io.IOException")
    assert(bh(H.Partition) == "0")
    assert(biz.getAs[Array[Byte]]("value").toSeq == wire(bizFail).toSeq)

    // decimal overflow: routed to error, NOT truncated; raw bytes preserved
    val dec = errs.find(r => headers(r)(H.Offset) == "3").get
    assert(headers(dec)(H.ApplicationCode) ==
      ErrorCodes.FailedToDeserializeRecord)
    assert(headers(dec)(H.ApplicationMessage).contains("38-digit cap"))
    assert(dec.getAs[Array[Byte]]("value").toSeq == wire(tooBig).toSeq)
  }

  test("D2 output path re-encodes to Confluent wire format, round-trips") {
    val d = AvroDummy("out-1", "bk", Some("s"),
      Some(new java.math.BigDecimal("987654321")))
    val env = Envelope[AvroDummy]("bk", Some(d), None, wire(d), "t", 0, 0L,
      new Timestamp(0), Seq("trace.id" -> "abc".getBytes("UTF-8")))
    val out = GraftStream.toOutputRecordsTyped(Seq(env).toDS(), pair.encodeFn)
      .head()
    val bytes = out.getAs[Array[Byte]]("value")
    assert(bytes(0) == SafeAvro.MagicByte)
    assert(ByteBuffer.wrap(bytes, 1, 4).getInt == SchemaId)
    // decode back through D1: exact round trip including the decimal
    // (compareTo, not equals: the envelope ride re-scales (38,18) → scale 0)
    val back = pair.decodeFn(bytes)
    assert(back.isRight)
    val b = back.toOption.get
    assert((b.mandatoryStringValue, b.businessKey, b.nullableStringValue) ==
      (("out-1", "bk", Some("s"))))
    assert(b.nullableDummyBigDecimal.get.compareTo(
      d.nullableDummyBigDecimal.get) == 0)
    // record's own headers pass through to the sink shape
    val hs = headers(out)
    assert(hs("trace.id") == "abc")
  }

  test("decimalCapped: 38 digits exact, 39 digits rejected, non-bytes ZERO") {
    val fits = new java.math.BigDecimal("9" * 38)
    val bb = ByteBuffer.wrap(fits.unscaledValue.toByteArray)
    assert(SafeAvro.decimalCapped(bb, 0, "T") == Right(fits))
    val over = new java.math.BigDecimal("1" + "0" * 38)
    val bb2 = ByteBuffer.wrap(over.unscaledValue.toByteArray)
    val left = SafeAvro.decimalCapped(bb2, 0, "T")
    assert(left.isLeft)
    assert(left.swap.toOption.get.code == ErrorCodes.FailedToDeserializeRecord)
    // reference mapper semantics for non-bytes input
    assert(SafeAvro.decimalCapped("nope", 0, "T") ==
      Right(java.math.BigDecimal.ZERO))
  }
}
