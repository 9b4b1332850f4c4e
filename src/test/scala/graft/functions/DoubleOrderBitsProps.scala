package graft.functions

import org.scalacheck.Prop.{forAll, propBoolean}
import org.scalacheck.{Gen, Properties}

/** Pure-eval properties for the order-preserving IEEE key transform:
  * strict monotonicity against java.lang.Double's total order (which is
  * Spark's sort order for doubles — NaN greatest, −0.0 < +0.0), plus
  * the sign-fold law (negatives below non-negatives as plain longs).
  * The codegen path is exercised by every histogram-select percentile
  * test (RelationalSpec/PropertySpec run the radix form end to end). */
object DoubleOrderBitsProps extends Properties("DoubleOrderBits") {

  private val dGen: Gen[Double] = Gen.oneOf(
    Gen.chooseNum(-1e300, 1e300),
    Gen.chooseNum(-1.0, 1.0),
    Gen.oneOf(0.0, -0.0, Double.MinPositiveValue, -Double.MinPositiveValue,
      Double.MaxValue, Double.MinValue, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.NaN))

  property("monotone under Double.compare total order") =
    forAll(dGen, dGen) { (a, b) =>
      val cmp = java.lang.Double.compare(a, b)
      val kcmp = java.lang.Long.compare(
        DoubleOrderBitsEval.eval(a), DoubleOrderBitsEval.eval(b))
      math.signum(cmp) == math.signum(kcmp)
    }

  property("sign fold: negatives map below non-negatives") =
    forAll(dGen) { a =>
      val k = DoubleOrderBitsEval.eval(a)
      if (java.lang.Double.compare(a, -0.0) <= 0) k < 0L else k >= 0L
    }

  property("top-bits bucketing is monotone (the histogram-select law)") =
    forAll(dGen, dGen) { (a, b) =>
      val (ba, bb) = (DoubleOrderBitsEval.eval(a) >> 48,
        DoubleOrderBitsEval.eval(b) >> 48)
      java.lang.Double.compare(a, b) <= 0 ==> (ba <= bb)
    }
}
