package graft.serde

import graft.core.{ErrorCodes, GraftError}

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

/** Safe Avro decode with Confluent wire-format handling.
  *
  * The reference consumes Confluent-registry Avro: each payload is
  * `0x00 | 4-byte schema id | avro binary`
  * (registry config at /root/reference/src/main/java/fr/barbicane/maston/properties/KafkaPropertiesBuilder.java:43-55).
  * Spark's `from_avro` does not understand that prefix, so decode is a plain
  * Scala function suitable for `Dataset.map` / a UDF: strip the prefix,
  * decode with a writer schema resolved by id, and never throw — failures
  * become the invalid side with the raw bytes preserved
  * (VavrSafeDeserializer.java:29-39 contract).
  *
  * Schema resolution is pluggable (`SchemaResolver`); tests use a fixed map —
  * the analog of the reference's `mock://` registries
  * (SimpleVavrStreamConsumerTopologyTest.java:71).
  */
object SafeAvro {

  val MagicByte: Byte = 0x0

  /** Resolve a writer schema from a Confluent schema id. */
  trait SchemaResolver extends Serializable {
    def resolve(schemaId: Int): Schema
  }

  final class FixedResolver(schemas: Map[Int, String]) extends SchemaResolver {
    @transient private lazy val parsed: Map[Int, Schema] =
      schemas.map { case (k, v) => k -> new Schema.Parser().parse(v) }
    def resolve(schemaId: Int): Schema = parsed(schemaId)
  }

  /** Decode one Confluent-framed Avro payload to a field map, or an error. */
  def decode(
      bytes: Array[Byte],
      resolver: SchemaResolver,
      readerSchemaJson: String,
      targetClass: String): Either[GraftError, GenericRecord] =
    try {
      require(bytes != null && bytes.length > 5, "payload shorter than wire-format prefix")
      require(bytes(0) == MagicByte, s"unknown magic byte ${bytes(0)}")
      val schemaId = ByteBuffer.wrap(bytes, 1, 4).getInt
      val writer = resolver.resolve(schemaId)
      val reader = new Schema.Parser().parse(readerSchemaJson)
      val datumReader = new GenericDatumReader[GenericRecord](writer, reader)
      val decoder = DecoderFactory.get()
        .binaryDecoder(bytes, 5, bytes.length - 5, null)
      Right(datumReader.read(null, decoder))
    } catch {
      case t: Throwable =>
        Left(GraftError.fromThrowable(t, ErrorCodes.FailedToDeserializeRecord,
          s"Failed to deserialize record to $targetClass", targetClass, bytes))
    }

  /** Encode a GenericRecord back to Confluent wire format. */
  def encode(record: GenericRecord, schemaId: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(MagicByte)
    out.write(ByteBuffer.allocate(4).putInt(schemaId).array())
    val writer = new GenericDatumWriter[GenericRecord](record.getSchema)
    val encoder = EncoderFactory.get().binaryEncoder(out, null)
    writer.write(record, encoder)
    encoder.flush()
    out.toByteArray
  }

  /** Decode an Avro `bytes`/union decimal field the way the reference's
    * mapper does (AvroByteBufferToBigDecimalMapper.java:13-26): bytes →
    * unscaled BigDecimal with the logical type's scale; anything else → ZERO.
    */
  def byteBufferToBigDecimal(v: Any, scale: Int): java.math.BigDecimal = v match {
    case bb: ByteBuffer =>
      val bytes = new Array[Byte](bb.remaining())
      bb.duplicate().get(bytes)
      new java.math.BigDecimal(new java.math.BigInteger(bytes), scale)
    case _ => java.math.BigDecimal.ZERO
  }
}
