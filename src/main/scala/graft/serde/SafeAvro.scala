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

  /** Parsed-reader-schema cache, keyed by schema JSON. `decode` runs once
    * per RECORD on the executor hot path; re-parsing the identical reader
    * JSON per record would dominate decode cost at stream rates. Per-JVM
    * (object state), so each executor parses each reader schema once. */
  private val readerSchemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, Schema]()

  private def parsedReader(json: String): Schema =
    readerSchemaCache.computeIfAbsent(json,
      j => new Schema.Parser().parse(j))

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
      val reader = parsedReader(readerSchemaJson)
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

  /** Spark's DecimalType caps precision at 38 digits. */
  val SparkMaxDecimalPrecision = 38

  /** Decimal-overflow policy for Avro logical decimals whose declared
    * precision exceeds Spark's cap — e.g. the reference's `decimal(64,0)`
    * field (dummy-avro-record.avsc:26-38), which Java's unbounded BigDecimal
    * represents but a Spark row cannot.
    *
    * POLICY (documented per SURVEY §7.4.3): values that FIT in 38 digits
    * decode exactly to DecimalType(38, scale); values that need more digits
    * are NOT silently truncated or rounded — the decode returns Left and the
    * pipeline routes the record to the error topic with its raw bytes, per
    * the never-lose-a-record contract. Truncation would corrupt data
    * silently; a string-carry side channel would fork the schema. Callers
    * that genuinely need >38-digit identifiers should model them as strings
    * at the schema level.
    */
  def decimalCapped(v: Any, scale: Int,
      targetClass: String): Either[GraftError, java.math.BigDecimal] = {
    val d = byteBufferToBigDecimal(v, scale)
    if (d.precision <= SparkMaxDecimalPrecision) Right(d)
    else Left(GraftError(
      s"Decimal value exceeds Spark's ${SparkMaxDecimalPrecision}-digit cap " +
        s"(precision ${d.precision}); refusing to truncate",
      ErrorCodes.FailedToDeserializeRecord,
      classOf[ArithmeticException].getName,
      s"decimal overflow: precision ${d.precision} > $SparkMaxDecimalPrecision",
      null, targetClass, null))
  }

  /** D3 analog — the Avro member of the serde-pair builder family
    * (VavrSafeSerdesBuilder.buildForAvro, VavrSafeSerdesBuilder.java:17-23):
    * compose the never-throw decode (D1) and the wire-format encode (D2) for
    * one record type. `decodeFn` plugs straight into
    * `GraftStream.decodeEnvelope`, `encodeFn` into
    * `GraftStream.toOutputRecordsTyped` (and doubles as the sourceRecord
    * re-serializer of the error path's fallback chain).
    *
    * @param fromRecord map the GenericRecord to the pipeline's case class
    *                   (the analog of SpecificRecord codegen); a throw here
    *                   is caught into the invalid side
    * @param toRecord   inverse mapping for the output path
    */
  final case class SerdePair[T](
      decodeFn: Array[Byte] => Either[GraftError, T],
      encodeFn: T => Array[Byte])

  def serdePair[T](
      resolver: SchemaResolver,
      readerSchemaJson: String,
      writeSchemaId: Int,
      targetClass: String,
      fromRecord: GenericRecord => Either[GraftError, T],
      toRecord: T => GenericRecord): SerdePair[T] = SerdePair(
    decodeFn = bytes =>
      decode(bytes, resolver, readerSchemaJson, targetClass).flatMap { rec =>
        try fromRecord(rec).left.map(e =>
          if (e.rawBytes == null) e.copy(rawBytes = bytes) else e)
        catch {
          case t: Throwable =>
            Left(GraftError.fromThrowable(t,
              ErrorCodes.FailedToDeserializeRecord,
              s"Failed to map record to $targetClass", targetClass, bytes))
        }
      },
    encodeFn = t => encode(toRecord(t), writeSchemaId))
}
