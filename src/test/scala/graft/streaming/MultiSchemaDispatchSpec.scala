package graft.streaming

import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkSpec
import graft.core.{ErrorCodes, ErrorHeaderNames => H, GraftConf, GraftError}
import graft.serde.SafeAvro

import org.apache.avro.Schema
import org.apache.avro.generic.GenericData
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Per-record writer-schema dispatch through the simple pipeline: one
  * micro-batch mixing TWO registered schema ids (v1, and v2 carrying an
  * evolved extra field that the v1 reader drops) plus one unknown id.
  * The registry analog of the reference's mixed-topic consumption
  * (SimpleVavrStreamConsumerTopologyTest.java:71 uses a mock registry; the
  * wire format resolves the writer schema per record, not per stream).
  */
object MultiSchemaDispatchSpec {
  val processed = new ConcurrentLinkedQueue[String]()
  val errorRows = new ConcurrentLinkedQueue[Row]()

  val v1Json =
    """{"type":"record","name":"T","fields":[
      |{"name":"busKey","type":"string"},
      |{"name":"value","type":"string"}]}""".stripMargin
  val v2Json =
    """{"type":"record","name":"T","fields":[
      |{"name":"busKey","type":"string"},
      |{"name":"value","type":"string"},
      |{"name":"extra","type":"string","default":""}]}""".stripMargin

  val resolver = new SafeAvro.FixedResolver(Map(1 -> v1Json, 2 -> v2Json))

  val pair: SafeAvro.SerdePair[Dummy] = SafeAvro.serdePair[Dummy](
    resolver, v1Json, writeSchemaId = 1, targetClass = "graft.streaming.Dummy",
    fromRecord = r => Right(Dummy(r.get("busKey").toString, r.get("value").toString)),
    toRecord = { d =>
      val s = new Schema.Parser().parse(v1Json)
      val r = new GenericData.Record(s)
      r.put("busKey", d.busKey); r.put("value", d.value); r
    })

  def encodeWith(json: String, id: Int, fields: (String, String)*): Array[Byte] = {
    val s = new Schema.Parser().parse(json)
    val r = new GenericData.Record(s)
    fields.foreach { case (k, v) => r.put(k, v) }
    SafeAvro.encode(r, id)
  }
}

class MultiSchemaDispatchSpec extends SparkSpec {
  import spark.implicits._
  import MultiSchemaDispatchSpec._

  test("one batch, three writer ids: v1 and v2 decode per-record, unknown id routes to errors") {
    processed.clear(); errorRows.clear()
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Array[Byte], String, Int, Long, Timestamp)]
    val source = input.toDF()
      .toDF("key", "value", "topic", "partition", "offset", "timestamp")

    val conf = GraftConf(applicationId = "graft-multi-schema")
    val q = GraftStream.simple[Dummy](
      source, conf, pair.decodeFn,
      process = d => { processed.add(s"${d.busKey}=${d.value}"); None },
      errorSink = df => df.collect().foreach(errorRows.add))

    val unknownIdBytes = encodeWith(v1Json, 99, "busKey" -> "k3", "value" -> "lost")
    try {
      input.addData(Seq(
        ("0", encodeWith(v1Json, 1, "busKey" -> "k1", "value" -> "from-v1"),
          "in-topic", 0, 0L, new Timestamp(1700000000000L)),
        ("1", encodeWith(v2Json, 2,
          "busKey" -> "k2", "value" -> "from-v2", "extra" -> "dropped-by-reader"),
          "in-topic", 0, 1L, new Timestamp(1700000000001L)),
        ("2", unknownIdBytes, "in-topic", 0, 2L, new Timestamp(1700000000002L))))
      q.processAllAvailable()
    } finally q.stop()

    // both registered ids decoded — v2's evolved payload through the v1 reader
    assert(processed.toArray.toSet == Set("k1=from-v1", "k2=from-v2"))

    // the unknown id is the only error; raw bytes preserved, deser code set
    val errs = errorRows.toArray(Array.empty[Row])
    assert(errs.length == 1)
    val err = errs.head
    assert(err.getAs[Array[Byte]]("value").sameElements(unknownIdBytes))
    val headers = err.getSeq[Row](err.fieldIndex("headers")).map(h =>
      h.getString(0) -> new String(h.getAs[Array[Byte]](1), "UTF-8")).toMap
    assert(headers(H.ApplicationCode) == ErrorCodes.FailedToDeserializeRecord)
    assert(headers(H.ApplicationId) == "graft-multi-schema")
  }
}
