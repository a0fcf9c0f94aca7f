package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE copy of the md5 hex-nibble arithmetic every deterministic hash
  * in this library shares with the DuckDB oracle: the first 7 hex chars of
  * an md5 hex string folded into a 28-bit non-negative long via per-char
  * `ascii` arithmetic (no hex→int builtin is portable across engines).
  *
  * Keep the fold in one place: four operator families (minhash bases,
  * rolling-hash word values, sampling gates, split assignment) must stay
  * bit-identical to each other and to the oracle SQL — divergent copies
  * would break parity for only some operators, silently.
  */
object PortableHash {

  /** 28-bit value from the first 7 hex chars of an ALREADY-COMPUTED md5
    * hex column. Takes the hex, not the input: HOF lambdas have no
    * common-subexpression elimination, so callers hash in one pass and
    * fold from the (free to re-reference) lambda variable or projected
    * column in the next.
    *
    * Runs on the native [[graft.functions.HexFold7]] codegen expression
    * (one byte loop instead of a 28-node substr/ascii/CASE tree); the
    * Column-tree twin below is kept as the bit-equality reference. */
  def nibbleFold7(hx: Column): Column =
    org.apache.spark.sql.graftinternal.Bridge.column(
      graft.functions.HexFold7(
        org.apache.spark.sql.graftinternal.Bridge.expression(hx)))

  /** The portable Column-tree form of [[nibbleFold7]] — the exact
    * arithmetic the DuckDB oracle mirrors, pinned bit-equal to the native
    * expression by PortableHashSpec. */
  private[graft] def nibbleFold7Reference(hx: Column): Column = {
    def hv(c: Int): Column = {
      val a = ascii(hx.substr(lit(c), lit(1)))
      when(a <= 57, a - 48).otherwise(a - 87)
    }
    (1 to 7).map(hv).reduce((acc, v) => acc * 16 + v).cast("long")
  }

  /** The 15-char twin of [[nibbleFold7Reference]] — 60 bits, the widest
    * fold a signed BIGINT carries positive on both engines. The prefix
    * families (d26/d27/d28) and bottom-k sketches key on this width so a
    * within-document id collision is a 2⁻⁶⁰ event instead of 2⁻²⁸. */
  private[graft] def nibbleFold15Reference(hx: Column): Column = {
    def hv(c: Int): Column = {
      val a = ascii(hx.substr(lit(c), lit(1)))
      when(a <= 57, a - 48).otherwise(a - 87).cast("long")
    }
    (1 to 15).map(hv).reduce((acc, v) => acc * 16 + v)
  }

  /** Fold of md5(prefix + value-as-string) — ONE native digest+fold per
    * value ([[graft.functions.Md5Fold]]): no prefix-concat UTF8String, no
    * 32-char hex intermediate. Bit-identical to the hex-chain form the
    * oracle computes (Md5FoldSpec pins it); safe inside HOF lambdas. */
  def hash28(prefix: String, v: Column): Column = md5Fold(prefix, v, 7)

  /** 60-bit digest fold — [[hash28]] at 15 nibbles. */
  def hash60(prefix: String, v: Column): Column = md5Fold(prefix, v, 15)

  private def md5Fold(prefix: String, v: Column, nibbles: Int): Column =
    org.apache.spark.sql.graftinternal.Bridge.column(
      graft.functions.Md5Fold(
        org.apache.spark.sql.graftinternal.Bridge.expression(
          v.cast("string")),
        prefix, nibbles))

  /** The SAME fold evaluated on the driver JVM — for seeded constants
    * (e.g. the e4 random-projection sign matrix) that the oracle re-derives
    * with the SQL form of this arithmetic. Keeping it here, next to the
    * Column form, preserves the one-copy rule this object exists for. */
  def hash28Jvm(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(7), 16)
  }
}
