package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The unscaled10 fast path (decide half-up from d·1e10 directly) must be
  * value-identical to the definitional BigDecimal.valueOf route at every
  * magnitude, including adversarial near-tie values. Pure JVM property
  * test — no Spark session.
  */
class FixedPointSpec extends AnyFunSuite {

  private def slow(d: Double): Long =
    java.math.BigDecimal.valueOf(d)
      .setScale(10, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  test("unscaled10 == BigDecimal route on randomized magnitudes") {
    val rnd = new java.util.Random(42)
    var i = 0
    while (i < 2000000) {
      // magnitudes from 1e-12 to ~1e8, both signs
      val mag = math.pow(10.0, rnd.nextDouble() * 20 - 12)
      val d = (rnd.nextDouble() * 2 - 1) * mag
      assert(FixedPoint.unscaled10(d).longValue() === slow(d), s"d=$d")
      i += 1
    }
  }

  test("unscaled10 == BigDecimal route on exact-tie and boundary values") {
    val cases = Seq(
      0.0, -0.0, 0.00000000005, -0.00000000005, // exact scale-10 half ties
      0.00000000015, 1.00000000005, 0.05e-9, 1.5e-10, 2.5e-10,
      123456.00000000005, -123456.00000000005,
      9.2e8 - 1, -(9.2e8 - 1), 1e-300, -1e-300, 4.9e-324,
      0.1, 0.2, 0.30000000000000004, 1.0 / 3.0, math.Pi, -math.E * 1e7)
    cases.foreach(d => assert(FixedPoint.unscaled10(d).longValue() === slow(d), s"d=$d"))
  }

  test("unscaled10 domain edges: NaN/Inf null, huge magnitude throws") {
    assert(FixedPoint.unscaled10(Double.NaN) == null)
    assert(FixedPoint.unscaled10(Double.PositiveInfinity) == null)
    intercept[ArithmeticException](FixedPoint.unscaled10(1e10))
  }
}
