package graft.functions

import java.math.BigInteger

import org.apache.commons.codec.digest.DigestUtils
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Properties}

import org.apache.spark.unsafe.types.UTF8String

/** Pure-eval properties for the native md5 window extraction: checked
  * against the reference spelling it replaces — hex-encode the digest,
  * substring the window, parse base-16 (exactly what
  * `conv(substring(md5(s), off+1, n), 16, 10)` computes). The codegen
  * path and SQL registration are covered by the DataFrame differential
  * test in FunctionsSpec. */
object Md5BitsProps extends Properties("Md5Bits") {

  private val strGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf('你', 'é', 'щ', ' ', 'a', '0')).map(_.mkString),
    Gen.const(""))

  private val windowGen: Gen[(Int, Int)] = for {
    off <- Gen.chooseNum(0, 31)
    n <- Gen.chooseNum(1, math.min(15, 32 - off))
  } yield (off, n)

  private def reference(s: String, off: Int, n: Int): Long =
    new BigInteger(DigestUtils.md5Hex(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8)).substring(off, off + n), 16)
      .longValueExact()

  property("equals hex-substring-parse reference for every window") =
    forAll(strGen, windowGen) { case (s, (off, n)) =>
      Md5BitsEval.eval(UTF8String.fromString(s), off, n) == reference(s, off, n)
    }

  property("value always fits the window: 0 <= v < 16^n") =
    forAll(strGen, windowGen) { case (s, (off, n)) =>
      val v = Md5BitsEval.eval(UTF8String.fromString(s), off, n)
      v >= 0L && (n == 15 || v < (1L << (4 * n)))
    }
}
