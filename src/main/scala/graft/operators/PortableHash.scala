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

  /** Fold of md5(prefix + value-as-string). For use in per-row Projects
    * (where codegen CSE deduplicates the md5), NOT inside HOF lambdas —
    * there, hash first and fold via [[nibbleFold7]]. */
  def hash28(prefix: String, v: Column): Column =
    nibbleFold7(md5(concat(lit(prefix), v.cast("string")).cast("binary")))

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
