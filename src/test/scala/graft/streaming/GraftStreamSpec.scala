package graft.streaming

import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkSpec
import graft.core.{Envelope, ErrorCodes, GraftConf, ErrorHeaderNames => H, GraftError}

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Port of the reference's topology golden tests
  * (SimpleVavrStreamConsumerTopologyTest.java:75-185): valid records reach
  * the user processor and are NOT produced anywhere (side effects are the
  * output; the simple topology's only sink is the error topic); deser
  * failures and business failures land on the error sink with the original
  * payload and the diagnostic headers. */
object GraftStreamSpec {
  // Static collectors: the processor runs on executors (same JVM in local
  // mode), the sinks on the driver — object state is visible to both.
  val processed = new ConcurrentLinkedQueue[String]()
  val errorRows = new ConcurrentLinkedQueue[Row]()

  /** payload format "busKey|value"; anything else is a deser failure.
    * Lives in the (static) companion so streaming closures don't capture
    * the non-serializable suite instance. */
  def decodeFn(raw: Array[Byte]): Either[GraftError, Dummy] = {
    val s = if (raw == null) "" else new String(raw, "UTF-8")
    s.split('|') match {
      case Array(k, v) => Right(Dummy(k, v))
      case _ => Left(GraftError(
        s"Failed to deserialize record to Dummy",
        ErrorCodes.FailedToDeserializeRecord,
        "graft.streaming.FakeDeserException", s"bad payload: $s", null,
        "Dummy", raw))
    }
  }
}

case class Dummy(busKey: String, value: String)

class GraftStreamSpec extends SparkSpec {
  import spark.implicits._

  private def kafkaShaped(idx: Long, payload: String) =
    (idx.toString, payload.getBytes("UTF-8"), "in-topic", 0, idx,
      new Timestamp(1700000000000L + idx))

  test("simple pipeline: side effects for valid, errors with headers for invalid") {
    GraftStreamSpec.processed.clear()
    GraftStreamSpec.errorRows.clear()
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Array[Byte], String, Int, Long, Timestamp)]
    val source = input.toDF()
      .toDF("key", "value", "topic", "partition", "offset", "timestamp")

    val conf = GraftConf(applicationId = "graft-test-app")
    val q = GraftStream.simple[Dummy](
      source, conf, GraftStreamSpec.decodeFn,
      process = d =>
        if (d.value == "fail-me")
          Some(GraftError("business says no", ErrorCodes.FailedToProcessRecord,
            "java.lang.IllegalStateException", "nope", null, "Dummy", null))
        else { GraftStreamSpec.processed.add(d.value); None },
      errorSink = df => df.collect().foreach(GraftStreamSpec.errorRows.add))
    try {
      input.addData(Seq(
        kafkaShaped(0, "k1|ok-one"),
        kafkaShaped(1, "not-a-valid-payload"),
        kafkaShaped(2, "k2|fail-me"),
        kafkaShaped(3, "k3|ok-two")))
      q.processAllAvailable()
    } finally q.stop()

    // valid records processed, exactly once each, nothing else
    assert(GraftStreamSpec.processed.toArray.toSet == Set("ok-one", "ok-two"))

    val errs = GraftStreamSpec.errorRows.toArray(Array.empty[Row])
    assert(errs.length == 2)
    def headers(r: Row): Map[String, String] =
      r.getSeq[Row](r.fieldIndex("headers")).map(h =>
        h.getString(0) -> new String(h.getAs[Array[Byte]](1), "UTF-8")).toMap

    // deser failure: original raw bytes travel to the error sink
    val deser = errs.find(r =>
      headers(r)(H.ApplicationCode) == ErrorCodes.FailedToDeserializeRecord).get
    assert(new String(deser.getAs[Array[Byte]]("value"), "UTF-8") ==
      "not-a-valid-payload")
    assert(headers(deser)(H.ApplicationId) == "graft-test-app")
    assert(headers(deser)(H.Topic) == "in-topic")
    assert(headers(deser)(H.Offset) == "1")

    // business failure: value preserved via rawValue, app code + class set
    val biz = errs.find(r =>
      headers(r)(H.ApplicationCode) == ErrorCodes.FailedToProcessRecord).get
    assert(new String(biz.getAs[Array[Byte]]("value"), "UTF-8") == "k2|fail-me")
    assert(headers(biz)(H.ApplicationMessage) == "business says no")
    assert(headers(biz)(H.ExceptionClass) == "java.lang.IllegalStateException")
  }

  test("processValid catches processor exceptions into the error side") {
    val env = Envelope[Dummy]("k", Some(Dummy("k", "v")), None,
      "k|v".getBytes, "t", 0, 0L, new Timestamp(0))
    val out = GraftStream.processValid(Seq(env).toDS()) { _ =>
      throw new IllegalArgumentException("kaput")
    }.collect().head
    assert(out.isInvalid)
    assert(out.error.get.code == ErrorCodes.FailedToProcessRecord)
    assert(out.error.get.exceptionClass == "java.lang.IllegalArgumentException")
    // stack trace captured for the diagnostic headers
    assert(out.error.get.stackTrace.contains("IllegalArgumentException"))
  }

  test("toErrorRecords merges diagnostics onto the record's own headers") {
    import org.apache.spark.sql.Row
    val err = GraftError("m", ErrorCodes.FailedToProcessRecord,
      "java.io.IOException", "x", null, "Dummy", null)
    val env = Envelope[Dummy]("k", None, Some(err), "raw".getBytes, "t", 0, 1L,
      new Timestamp(0), Seq("trace.id" -> "abc".getBytes("UTF-8"),
        H.Topic -> "stale-topic".getBytes("UTF-8")))
    val out = GraftStream.toErrorRecords(Seq(env).toDS(), "app").head()
    val hs = out.getSeq[Row](out.fieldIndex("headers")).map(h =>
      h.getString(0) -> new String(h.getAs[Array[Byte]](1), "UTF-8")).toMap
    assert(hs("trace.id") == "abc", "user headers survive")
    assert(hs(H.Topic) == "t", "stale error header flushed and rewritten")
    assert(hs(H.ApplicationCode) == ErrorCodes.FailedToProcessRecord)
  }

  test("delta pipeline end-to-end: dedup + re-key + error routing") {
    GraftStreamSpec.errorRows.clear()
    val outRows = new ConcurrentLinkedQueue[Row]()
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Array[Byte], String, Int, Long, Timestamp)]
    val source = input.toDF()
      .toDF("key", "value", "topic", "partition", "offset", "timestamp")
    val conf = GraftConf(applicationId = "graft-delta-app")
    val q = GraftStream.delta[Dummy](
      source, conf, GraftStreamSpec.decodeFn,
      keyFn = _.busKey,
      seqFn = _.offset,
      isUpdated = (old, nw) => old.value.contains(nw.value),
      outputSink = df => df.collect().foreach(outRows.add),
      errorSink = df => df.collect().foreach(GraftStreamSpec.errorRows.add))
    try {
      input.addData(Seq(
        kafkaShaped(0, "key-1|should_pass"),
        kafkaShaped(1, "key-1|should_not_pass"),
        kafkaShaped(2, "key-1|should_pass"),
        kafkaShaped(3, "key-2|should_pass"),
        kafkaShaped(4, "key-2|should_not_pass"),
        kafkaShaped(5, "key-2|should_pass"),
        kafkaShaped(6, "garbage")))
      q.processAllAvailable()
      // both queries share the session; wait for the error branch too
      spark.streams.active.foreach(_.processAllAvailable())
    } finally spark.streams.active.foreach(_.stop())

    val emitted = outRows.toArray(Array.empty[Row])
      .map(r => (r.getString(r.fieldIndex("key")), r.getLong(r.fieldIndex("offset"))))
      .sortBy(_._2).toSeq
    assert(emitted == Seq(("key-1", 0L), ("key-1", 2L), ("key-2", 3L),
      ("key-2", 5L)), "canonical fixture: emit {0,2,3,5} with business keys")
    assert(GraftStreamSpec.errorRows.size() == 1, "garbage routed to error sink")
  }
}
