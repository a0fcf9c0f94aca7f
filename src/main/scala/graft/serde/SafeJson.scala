package graft.serde

import graft.core.{ErrorCodes, GraftError}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Safe JSON decode/encode as pure column functions — the Spark-native form
  * of the reference's never-throw serde pair
  * (/root/reference/src/main/java/fr/barbicane/maston/serdes/VavrSafeDeserializer.java:29-39,
  * VavrSafeSerializer.java:26-52, JsonDeserializer.java:26-30).
  *
  * Decode yields `struct(value, error)`: `error == null` is the valid side of
  * the reference's `Validation`; a failed parse fills the error struct with
  * code FAILED_TO_DESERIALIZE_RECORD and keeps the raw bytes. Being plain
  * Catalyst expressions, these stay inside whole-stage codegen and are
  * pushdown-transparent.
  */
object SafeJson {

  /** Decode a binary/string JSON `value` column into `struct(value: schema,
    * error: GraftError.schema)`. Never throws: `from_json` in PERMISSIVE mode
    * yields null fields on corrupt input; we detect "every field null while
    * input non-null" via a corrupt-record column and build the error side.
    */
  def decode(value: Column, schema: StructType, targetClass: String): Column = {
    val withCorrupt = schema.add("_corrupt", StringType)
    val raw = value.cast("binary")
    val str = value.cast("string")
    val parsed = from_json(str, withCorrupt,
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt"))
    val failed = parsed.isNull || parsed.getField("_corrupt").isNotNull
    val errorStruct = struct(
      concat(lit("Failed to deserialize record to "), lit(targetClass))
        .as("message"),
      lit(ErrorCodes.FailedToDeserializeRecord).as("code"),
      lit("org.apache.spark.sql.catalyst.util.BadRecordException")
        .as("exceptionClass"),
      concat(lit("Malformed JSON: "), coalesce(str, lit("null")))
        .as("exceptionMessage"),
      lit(null).cast(StringType).as("stackTrace"),
      lit(targetClass).as("targetClass"),
      raw.as("rawBytes"))
    val valueStruct = struct(schema.fieldNames.toSeq.map(f =>
      parsed.getField(f).as(f)): _*)
    struct(
      when(failed, lit(null).cast(schema))
        .otherwise(valueStruct).as("value"),
      when(failed, errorStruct)
        .otherwise(lit(null).cast(GraftError.schema)).as("error"))
  }

  /** Encode the valid side back to bytes; on the invalid side fall back to
    * the original raw bytes, then to a re-serialized source record, then to
    * an empty payload — exactly the reference's serializer fallback chain
    * (VavrSafeSerializer.java:26-41), so headers still reach the error topic
    * even when the value is unrecoverable.
    */
  def encode(envelope: Column, rawValue: Column, sourceRecord: Column): Column = {
    val valid = envelope.getField("error").isNull
    when(valid, to_json(envelope.getField("value")).cast("binary"))
      .otherwise(coalesce(
        envelope.getField("error").getField("rawBytes"),
        rawValue,
        to_json(sourceRecord).cast("binary"),
        lit(Array.emptyByteArray)))
  }

  /** The reference's Avro-decimal fallback: a null decimal becomes ZERO
    * (AvroByteBufferToBigDecimalMapper.java:13-26 returns BigDecimal.ZERO for
    * non-bytes input). */
  def decimalOrZero(c: Column, precision: Int = 38, scale: Int = 0): Column =
    coalesce(c.cast(DecimalType(precision, scale)),
      lit(java.math.BigDecimal.ZERO).cast(DecimalType(precision, scale)))
}
