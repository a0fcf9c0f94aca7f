package graft.serde

import graft.SparkSpec
import graft.core.ErrorCodes

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Port of the reference's serde unit tests
  * (VavrSafeDeserializerTest.java:26-73, VavrSafeSerializerTest.java:37-86):
  * decode never throws, errors carry code + raw bytes; encode falls back
  * raw bytes → re-serialized source → empty. */
class SafeJsonSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("s", StringType)))

  test("decode valid json yields value side with null error") {
    val df = Seq("""{"k": 7, "s": "ok"}""").toDF("payload")
      .select(SafeJson.decode(col("payload"), schema, "graft.Dummy").as("env"))
    val row = df.select("env.value.k", "env.value.s", "env.error").head()
    assert(row.getLong(0) == 7L)
    assert(row.getString(1) == "ok")
    assert(row.isNullAt(2))
  }

  test("decode malformed json yields error side with code and raw bytes") {
    val bad = """{"k": not-json"""
    val df = Seq(bad).toDF("payload")
      .select(SafeJson.decode(col("payload"), schema, "graft.Dummy").as("env"))
    val row = df.select("env.value", "env.error.code", "env.error.targetClass",
      "env.error.rawBytes").head()
    assert(row.isNullAt(0))
    assert(row.getString(1) == ErrorCodes.FailedToDeserializeRecord)
    assert(row.getString(2) == "graft.Dummy")
    assert(new String(row.getAs[Array[Byte]](3), "UTF-8") == bad)
  }

  test("decode never throws on null input") {
    val df = Seq[Option[String]](None).toDF("payload")
      .select(SafeJson.decode(col("payload"), schema, "graft.Dummy").as("env"))
    assert(df.select("env.error.code").head().getString(0) ==
      ErrorCodes.FailedToDeserializeRecord)
  }

  test("encode: valid → json bytes; invalid → raw bytes; else source; else empty") {
    val env = SafeJson.decode(col("payload"), schema, "graft.Dummy")
    // valid path round-trips through to_json
    val valid = Seq("""{"k":1,"s":"a"}""").toDF("payload")
      .select(SafeJson.encode(env, lit(null).cast("binary"),
        lit(null).cast(schema)).as("out"))
      .head().getAs[Array[Byte]]("out")
    assert(new String(valid, "UTF-8").contains(""""k":1"""))
    // invalid with captured raw bytes emits them verbatim
    val raw = Seq("""nope""").toDF("payload")
      .select(SafeJson.encode(env, lit(null).cast("binary"),
        lit(null).cast(schema)).as("out"))
      .head().getAs[Array[Byte]]("out")
    assert(new String(raw, "UTF-8") == "nope")
    // invalid without raw bytes re-serializes the source record
    val srcStruct = struct(lit(9L).as("k"), lit("src").as("s"))
    val fromSource = Seq[Option[String]](None).toDF("payload")
      .select(SafeJson.encode(env, lit(null).cast("binary"), srcStruct).as("out"))
      .head().getAs[Array[Byte]]("out")
    assert(new String(fromSource, "UTF-8").contains(""""k":9"""))
    // nothing recoverable → empty payload, never null
    val empty = Seq[Option[String]](None).toDF("payload")
      .select(SafeJson.encode(env, lit(null).cast("binary"),
        lit(null).cast(schema)).as("out"))
      .head().getAs[Array[Byte]]("out")
    assert(empty.length == 0)
  }

  test("decimalOrZero maps null to ZERO like the reference's decimal mapper") {
    val df = Seq[Option[java.math.BigDecimal]](None).toDF("d")
      .select(SafeJson.decimalOrZero(col("d")).as("out"))
    assert(df.head().getDecimal(0).compareTo(java.math.BigDecimal.ZERO) == 0)
  }
}
