package graft.serde

import java.net.InetSocketAddress
import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.concurrent.TrieMap

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec
import graft.core.{ErrorCodes, GraftConf, GraftError, ErrorHeaderNames => H}
import graft.streaming.GraftStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Offline twin of the reference's mock:// registry tests
  * (SimpleVavrStreamConsumerTopologyTest.java:71): a local fake Confluent
  * REST server exercises resolve-hit / miss / auth-fail / caching through
  * the real HTTP resolver and the decode path, plus a mixed-schema-id batch
  * routed per-record through GraftStream.simple. */
object RegistryResolverSpec {

  /** Minimal Confluent Schema Registry fake: GET /schemas/ids/{id} and
    * POST /subjects/{subject}/versions, optional basic auth, hit counter. */
  final class FakeRegistry(
      initial: Map[Int, String],
      requireUserInfo: Option[String] = None) {
    private val mapper = new ObjectMapper()
    private val schemas = TrieMap(initial.toSeq: _*)
    private val nextId = new AtomicInteger(initial.keys.foldLeft(0)(_ max _))
    val resolveHits = new AtomicInteger(0)
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

    private def reply(ex: HttpExchange, status: Int, body: String): Unit = {
      val bytes = body.getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Type",
        "application/vnd.schemaregistry.v1+json")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }

    private def schemaBody(json: String): String = {
      val node = mapper.createObjectNode()
      node.put("schema", json)
      mapper.writeValueAsString(node)
    }

    server.createContext("/", (ex: HttpExchange) => {
      val authorized = requireUserInfo.forall { ui =>
        val expect = "Basic " + java.util.Base64.getEncoder
          .encodeToString(ui.getBytes("UTF-8"))
        Option(ex.getRequestHeaders.getFirst("Authorization")).contains(expect)
      }
      val path = ex.getRequestURI.getPath
      val ids = "/schemas/ids/(\\d+)".r
      val subj = "/subjects/([^/]+)/versions".r
      if (!authorized) reply(ex, 401, """{"error_code":401,"message":"Unauthorized"}""")
      else (ex.getRequestMethod, path) match {
        case ("GET", ids(id)) =>
          resolveHits.incrementAndGet()
          schemas.get(id.toInt) match {
            case Some(json) => reply(ex, 200, schemaBody(json))
            case None => reply(ex, 404,
              """{"error_code":40403,"message":"Schema not found"}""")
          }
        case ("POST", subj(_)) =>
          val posted = mapper.readTree(ex.getRequestBody).path("schema").asText()
          val id = nextId.incrementAndGet()
          schemas.put(id, posted)
          reply(ex, 200, s"""{"id":$id}""")
        case _ => reply(ex, 404, """{"error_code":404,"message":"not found"}""")
      }
    })
    server.start()

    def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  // Reader schema the pipeline decodes INTO; writer schemas may differ per
  // record (schema evolution) — Avro resolution reconciles them.
  val readerJson: String =
    """{"type":"record","name":"T","fields":[
      |{"name":"busKey","type":"string"},
      |{"name":"value","type":"string"}]}""".stripMargin
  // Evolved writer: extra field the reader drops on resolution.
  val writerV2Json: String =
    """{"type":"record","name":"T","fields":[
      |{"name":"busKey","type":"string"},
      |{"name":"value","type":"string"},
      |{"name":"extra","type":"long","default":0}]}""".stripMargin

  def record(schemaJson: String, fields: (String, Any)*): GenericRecord = {
    val r = new GenericData.Record(new Schema.Parser().parse(schemaJson))
    fields.foreach { case (k, v) => r.put(k, v) }
    r
  }

  // Static slots so streaming closures capture neither the suite nor the
  // server — only this object (same-JVM local mode).
  @volatile var resolver: RegistryResolver = _
  val processed = new ConcurrentLinkedQueue[String]()
  val errorRows = new ConcurrentLinkedQueue[Row]()

  final case class T(busKey: String, value: String)

  def decodeFn(raw: Array[Byte]): Either[GraftError, T] =
    SafeAvro.decode(raw, resolver, readerJson, "graft.serde.T").map(rec =>
      T(rec.get("busKey").toString, rec.get("value").toString))
}

class RegistryResolverSpec extends SparkSpec {
  import RegistryResolverSpec._
  import spark.implicits._

  test("resolve hit decodes end-to-end; miss and auth-fail go to the error side") {
    val reg = new FakeRegistry(Map(1 -> readerJson),
      requireUserInfo = Some("user:secret"))
    try {
      val ok = new RegistryResolver(reg.url, "user:secret")
      val bytes = SafeAvro.encode(record(readerJson,
        "busKey" -> "k1", "value" -> "v1"), 1)

      val hit = SafeAvro.decode(bytes, ok, readerJson, "T")
      assert(hit.isRight)
      assert(hit.toOption.get.get("value").toString == "v1")

      // unknown id → 404 → Left with raw bytes preserved, never a throw
      val unknown = SafeAvro.encode(record(readerJson,
        "busKey" -> "k", "value" -> "v"), 1)
      unknown(4) = 99 // patch the wire-format id to an unregistered one
      val miss = SafeAvro.decode(unknown, ok, readerJson, "T")
      assert(miss.isLeft)
      assert(miss.swap.toOption.get.code == ErrorCodes.FailedToDeserializeRecord)
      assert(miss.swap.toOption.get.rawBytes == unknown)

      // wrong credentials → 401 → Left through decode; direct resolve throws
      val badAuth = new RegistryResolver(reg.url, "user:wrong")
      assert(SafeAvro.decode(bytes, badAuth, readerJson, "T").isLeft)
      val thrown = intercept[IllegalStateException](badAuth.resolve(1))
      assert(thrown.getMessage.contains("HTTP 401"))
    } finally reg.stop()
  }

  test("schema ids are fetched once per JVM and shared across deserialized copies") {
    val reg = new FakeRegistry(Map(1 -> readerJson))
    try {
      val r = new RegistryResolver(reg.url)
      r.resolve(1); r.resolve(1); r.resolve(1)
      assert(reg.resolveHits.get() == 1, "per-id cache must dedup fetches")

      // Spark deserializes the closure PER TASK — the cache is JVM-global
      // so a task-deserialized copy must NOT refetch (a per-instance cache
      // here once multiplied registry load by task count)
      val bos = new java.io.ByteArrayOutputStream()
      new java.io.ObjectOutputStream(bos).writeObject(r)
      val copy = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
        .readObject().asInstanceOf[RegistryResolver]
      assert(copy.resolve(1).getName == "T")
      assert(reg.resolveHits.get() == 1,
        "deserialized copy shares the JVM-wide cache")
    } finally reg.stop()
  }

  test("failed resolutions back off: one probe per window, cause preserved") {
    val reg = new FakeRegistry(Map(1 -> readerJson))
    try {
      val r = new RegistryResolver(reg.url, failureBackoffMs = 60000L)
      val before = reg.resolveHits.get()
      val first = intercept[IllegalStateException](r.resolve(404))
      assert(first.getMessage.contains("HTTP 404"))
      // within the window: immediate rethrow, NO second HTTP round trip,
      // original failure readable in the message (error-side diagnostics)
      val again = intercept[IllegalStateException](r.resolve(404))
      assert(again.getMessage.contains("HTTP 404"))
      assert(reg.resolveHits.get() == before + 1,
        "backoff must suppress repeat probes for a failing id")
      // an expired window probes again
      val eager = new RegistryResolver(reg.url + "/", failureBackoffMs = 0L)
      intercept[IllegalStateException](eager.resolve(404))
      intercept[IllegalStateException](eager.resolve(404))
      assert(reg.resolveHits.get() == before + 3)
    } finally reg.stop()
  }

  test("fromConf honors basic.auth.credentials.source semantics") {
    val reg = new FakeRegistry(Map(1 -> readerJson),
      requireUserInfo = Some("u:p"))
    try {
      val base = GraftConf(applicationId = "a", schemaRegistryUrl = reg.url)
      val viaUserInfo = RegistryResolver.fromConf(
        base.copy(schemaRegistryBasicAuthUserInfo = "u:p"))
      assert(viaUserInfo.resolve(1).getName == "T")

      val viaUrl = RegistryResolver.fromConf(base.copy(
        schemaRegistryUrl = reg.url.replace("http://", "http://u:p@"),
        basicAuthCredentialsSource = "URL"))
      assert(viaUrl.resolve(1).getName == "T")

      val viaSasl = RegistryResolver.fromConf(base.copy(
        basicAuthCredentialsSource = "SASL_INHERIT",
        saslJaasConfig = "org.apache.kafka.common.security.plain." +
          "PlainLoginModule required username=\"u\" password=\"p\";"))
      assert(viaSasl.resolve(1).getName == "T")

      // bare (unquoted) JAAS values are legal syntax and must parse too
      val viaSaslBare = RegistryResolver.fromConf(base.copy(
        basicAuthCredentialsSource = "SASL_INHERIT",
        saslJaasConfig = "org.apache.kafka.common.security.plain." +
          "PlainLoginModule required username=u password=p;"))
      assert(viaSaslBare.resolve(1).getName == "T")

      // an unparseable JAAS string fails loudly at config time, not as a
      // silent empty-credential 401 at runtime
      intercept[IllegalArgumentException](RegistryResolver.fromConf(
        base.copy(basicAuthCredentialsSource = "SASL_INHERIT",
          saslJaasConfig = "PlainLoginModule required;")))

      // a key merely ENDING in "username"/"password" must not match: the
      // real credentials here are the later, properly-delimited options
      val viaSaslDecoy = RegistryResolver.fromConf(base.copy(
        basicAuthCredentialsSource = "SASL_INHERIT",
        saslJaasConfig = "PlainLoginModule required dbusername=\"nope\" " +
          "apppassword=\"wrong\" username=\"u\" password=\"p\";"))
      assert(viaSaslDecoy.resolve(1).getName == "T")

      intercept[IllegalArgumentException](RegistryResolver.fromConf(
        base.copy(basicAuthCredentialsSource = "BOGUS")))
    } finally reg.stop()
  }

  test("register assigns an id that resolve can fetch back") {
    val reg = new FakeRegistry(Map.empty)
    try {
      val r = RegistryResolver.fromConf(GraftConf(
        applicationId = "app", schemaRegistryUrl = reg.url))
      val id = r.register("t-value", readerJson)
      assert(id > 0)
      assert(r.resolve(id).getName == "T")
    } finally reg.stop()
  }

  test("mixed schema ids in one batch: per-record dispatch through GraftStream.simple") {
    val reg = new FakeRegistry(Map(1 -> readerJson, 2 -> writerV2Json))
    try {
      resolver = new RegistryResolver(reg.url)
      processed.clear(); errorRows.clear()
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, Array[Byte], String, Int, Long, Timestamp)]
      val source = input.toDF()
        .toDF("key", "value", "topic", "partition", "offset", "timestamp")

      val v1 = SafeAvro.encode(record(readerJson,
        "busKey" -> "a", "value" -> "from-v1"), 1)
      val v2 = SafeAvro.encode(record(writerV2Json,
        "busKey" -> "b", "value" -> "from-v2", "extra" -> 7L), 2)
      val unknown = SafeAvro.encode(record(readerJson,
        "busKey" -> "c", "value" -> "lost"), 1)
      unknown(4) = 42 // unregistered id → must route to the error side

      val q = GraftStream.simple[T](
        source, GraftConf(applicationId = "reg-app"), decodeFn,
        process = t => { processed.add(t.value); None },
        errorSink = df => df.collect().foreach(errorRows.add))
      try {
        input.addData(Seq(
          ("0", v1, "t", 0, 0L, new Timestamp(1700000000000L)),
          ("1", v2, "t", 0, 1L, new Timestamp(1700000000001L)),
          ("2", unknown, "t", 0, 2L, new Timestamp(1700000000002L))))
        q.processAllAvailable()
      } finally q.stop()

      // both known ids decode (v2 via schema resolution), each exactly once
      assert(processed.toArray.toSet == Set("from-v1", "from-v2"))
      val errs = errorRows.toArray(Array.empty[Row])
      assert(errs.length == 1)
      val headers = errs.head.getSeq[Row](errs.head.fieldIndex("headers"))
        .map(h => h.getString(0) -> new String(h.getAs[Array[Byte]](1), "UTF-8"))
        .toMap
      assert(headers(H.ApplicationCode) == ErrorCodes.FailedToDeserializeRecord)
      // never-lose-a-record: the unknown-id payload travels intact
      assert(errs.head.getAs[Array[Byte]]("value").sameElements(unknown))
    } finally reg.stop()
  }
}
