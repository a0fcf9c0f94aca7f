package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** GramSum.grid is the load-bearing primitive of every grid-exact operator
  * (e8/e9/e10, s8's ADC): it must agree with the decimal HALF_UP rounding
  * Spark's and DuckDB's `round` apply to doubles — pinned here against the
  * BigDecimal reference over the magnitudes the operators produce. */
class GramSumSpec extends AnyFunSuite {

  private def reference(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  test("property: grid matches BigDecimal HALF_UP on random doubles") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    // grid inputs are products scaled by 1e9 — exercise the operator
    // range (±1e12 with fractional parts) plus exact-half neighborhoods
    val vGen = Gen.oneOf(
      Gen.choose(-1.0e12, 1.0e12),
      Gen.choose(-1000L, 1000L).map(k => k + 0.5),
      Gen.choose(-1.0, 1.0).map(_ * 1.0e9))
    val prop = forAll(vGen) { v => Prop(GramSum.grid(v) == reference(v)) }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(2000),
      prop)
    assert(result.passed, result.status.toString)
  }

  test("grid ties round away from zero, like both engines") {
    assert(GramSum.grid(2.5) == 3L)
    assert(GramSum.grid(-2.5) == -3L)
    assert(GramSum.grid(0.5) == 1L)
    assert(GramSum.grid(-0.5) == -1L)
    // the classic near-tie double: 0.49999999999999994 < 0.5
    assert(GramSum.grid(0.49999999999999994) == 0L)
    assert(GramSum.grid(-0.49999999999999994) == 0L)
  }
}
