package graft.functions

import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Properties}

import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Pure-eval properties for the native sliding-window-minima selection:
  * checked against a direct replica of the composed Spark spelling it
  * replaces — `array_distinct(transform(sequence(1, max(n−w+1, 1)),
  * p -> array_min(slice(h, p, w))))` (slice truncates at the end;
  * array_distinct keeps first occurrences). The codegen path and the
  * end-to-end pipeline are covered by WinnowSpec. */
object WinnowMinsProps extends Properties("WinnowMins") {

  private def reference(a: Array[Long], w: Int): Seq[Long] = {
    val n = a.length
    val nWin = math.max(n - w + 1, 1)
    (0 until nWin).map(p => a.slice(p, math.min(p + w, n)).min).distinct
  }

  private def native(a: Array[Long], w: Int): Seq[Long] =
    WinnowMinsEval.eval(new GenericArrayData(a), w).toLongArray().toSeq

  private val arrGen: Gen[Array[Long]] = Gen.chooseNum(1, 60).flatMap(n =>
    Gen.containerOfN[Array, Long](n, Gen.oneOf(
      Gen.chooseNum(Long.MinValue, Long.MaxValue),
      Gen.chooseNum(0L, 4L)))) // heavy-tie regime exercises the dedup

  private val wGen: Gen[Int] = Gen.chooseNum(1, 12)

  property("equals the composed slice/min/distinct spelling") =
    forAll(arrGen, wGen) { (a, w) =>
      native(a, w) == reference(a, w)
    }

  property("singleton window w=1 is the distinct array itself") =
    forAll(arrGen) { a =>
      native(a, 1) == a.toSeq.distinct
    }

  property("w >= n collapses to the single global minimum") =
    forAll(arrGen) { a =>
      native(a, a.length + Gen.chooseNum(0, 5).sample.getOrElse(0)) ==
        Seq(a.min)
    }

  // --- null-bearing arrays: the SQL-surface path must replicate the
  // composed spelling (array_min skips nulls; all-null window -> null;
  // distinct keeps one null), not NPE -------------------------------
  private def referenceN(a: Array[java.lang.Long], w: Int): Seq[java.lang.Long] = {
    val n = a.length
    val nWin = math.max(n - w + 1, 1)
    (0 until nWin).map { p =>
      val vs = a.slice(p, math.min(p + w, n)).filter(_ != null)
      if (vs.isEmpty) null.asInstanceOf[java.lang.Long]
      else java.lang.Long.valueOf(vs.map(_.longValue).min)
    }.distinct
  }

  private val nullArrGen: Gen[Array[java.lang.Long]] =
    Gen.chooseNum(1, 40).flatMap(n =>
      Gen.containerOfN[Array, java.lang.Long](n, Gen.frequency(
        3 -> Gen.chooseNum(0L, 9L).map(java.lang.Long.valueOf),
        1 -> Gen.const(null.asInstanceOf[java.lang.Long]))))

  property("null elements: equals the composed spelling's null semantics") =
    forAll(nullArrGen, wGen) { (a, w) =>
      val got = WinnowMinsEval.eval(
        new GenericArrayData(a.asInstanceOf[Array[Any]]), w)
      val out = (0 until got.numElements()).map(i =>
        if (got.isNullAt(i)) null.asInstanceOf[java.lang.Long]
        else java.lang.Long.valueOf(got.getLong(i)))
      out == referenceN(a, w)
    }
}
