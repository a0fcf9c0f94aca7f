package graft.serde

import graft.SparkSpec
import graft.core.ErrorCodes

import org.apache.avro.Schema
import org.apache.avro.generic.GenericData

import java.nio.ByteBuffer

/** Confluent wire-format Avro serde tests — the mock:// registry analog of
  * the reference's serde tests (VavrSafeDeserializerTest.java:26-73) with
  * the 5-byte magic+schema-id prefix handling of SURVEY §7.4.4. */
class SafeAvroSpec extends SparkSpec {

  private val schemaJson =
    """{"type":"record","name":"T","fields":[
      |{"name":"busKey","type":"string"},
      |{"name":"value","type":"string"}]}""".stripMargin
  private val schema = new Schema.Parser().parse(schemaJson)
  private val resolver = new SafeAvro.FixedResolver(Map(7 -> schemaJson))

  private def record(k: String, v: String) = {
    val r = new GenericData.Record(schema)
    r.put("busKey", k)
    r.put("value", v)
    r
  }

  test("wire-format round trip: magic byte + schema id + binary avro") {
    val bytes = SafeAvro.encode(record("key-1", "should_pass"), 7)
    assert(bytes(0) == SafeAvro.MagicByte)
    assert(ByteBuffer.wrap(bytes, 1, 4).getInt == 7)
    val out = SafeAvro.decode(bytes, resolver, schemaJson, "graft.T")
    assert(out.isRight)
    val rec = out.toOption.get
    assert(rec.get("busKey").toString == "key-1")
    assert(rec.get("value").toString == "should_pass")
  }

  test("decode never throws: bad magic, short payload, unknown schema id") {
    val good = SafeAvro.encode(record("k", "v"), 7)
    val badMagic = good.clone(); badMagic(0) = 1
    for (bytes <- Seq(badMagic, Array[Byte](0, 0), null,
        SafeAvro.encode(record("k", "v"), 99))) {
      val out = SafeAvro.decode(bytes, resolver, schemaJson, "graft.T")
      assert(out.isLeft)
      val err = out.swap.toOption.get
      assert(err.code == ErrorCodes.FailedToDeserializeRecord)
      assert(err.targetClass == "graft.T")
      // never-lose-a-record: original bytes preserved on the error side
      assert(err.rawBytes == bytes)
    }
  }

  test("byteBufferToBigDecimal mirrors the reference's decimal mapper") {
    val unscaled = java.math.BigInteger.valueOf(123456)
    val bb = ByteBuffer.wrap(unscaled.toByteArray)
    val d = SafeAvro.byteBufferToBigDecimal(bb, 2)
    assert(d == new java.math.BigDecimal("1234.56"))
    // non-bytes input → ZERO (AvroByteBufferToBigDecimalMapper.java:24)
    assert(SafeAvro.byteBufferToBigDecimal("nope", 2) ==
      java.math.BigDecimal.ZERO)
    // buffer position untouched (duplicate-read)
    assert(bb.remaining() == unscaled.toByteArray.length)
  }

  test("decimal(64,0) policy: >38-digit values error-route, never truncate") {
    // SURVEY §7.4.3 / DELIVERY.md: the reference's decimal(64,0) field can
    // carry values Spark's DecimalType(38) cannot. 38 digits decode
    // exactly; 39 digits return Left with the deser code so the pipeline
    // routes the record to the error topic instead of silently corrupting.
    def bb(digits: Int): ByteBuffer = ByteBuffer.wrap(
      new java.math.BigInteger("9" * digits).toByteArray)
    val fits = SafeAvro.decimalCapped(bb(38), 0, "graft.T")
    assert(fits == Right(new java.math.BigDecimal("9" * 38)),
      "38 digits is exactly Spark's cap and must decode losslessly")
    val over = SafeAvro.decimalCapped(bb(39), 0, "graft.T")
    assert(over.isLeft, "39 digits exceeds DecimalType(38): refuse")
    val err = over.swap.toOption.get
    assert(err.code == ErrorCodes.FailedToDeserializeRecord)
    assert(err.message.contains("refusing to truncate"))
    assert(err.exceptionClass == classOf[ArithmeticException].getName)
    // scale participates in precision: 37 integer digits at scale 2 is
    // precision 39 → also refused, not rounded
    assert(SafeAvro.decimalCapped(bb(39), 2, "graft.T").isLeft)
  }
}
