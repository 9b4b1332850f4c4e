package graft.functions

import java.nio.charset.StandardCharsets.UTF_8

import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Properties}

import org.apache.spark.unsafe.types.UTF8String

/** Pure-eval properties for the native one-pass dHash: checked against
  * a direct replica of the composed Spark spelling it replaces —
  * `codes[i] = ascii(substr(s, floor(i·(n−1)/60)+1, 1))`, bit j =
  * [codes[j] < codes[j+1]] — including Spark `ascii`'s signed-first-
  * BYTE semantics on multibyte characters. The codegen path and the
  * end-to-end band pipeline are covered by ImageDedupSpec. */
object DHash60Props extends Properties("DHash60") {

  /** Replica of the composed spelling: code-point substr + signed lead
    * byte + double-floor positions. */
  private def reference(s: String): Long = {
    val cps = s.codePoints().toArray
    val n = cps.length
    def code(i: Int): Int = {
      val p = math.floor(i.toDouble * (n - 1) / 60.0).toInt
      if (n == 0 || p >= n) 0
      else new String(Character.toChars(cps(math.max(p, 0)))).getBytes(UTF_8)(0).toInt
    }
    (0 until 60).map(j => if (code(j) < code(j + 1)) 1L << j else 0L).sum
  }

  private def native(s: String): Long =
    DHash60Eval.eval(UTF8String.fromString(s))

  private val asciiGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 300)
    cs <- Gen.listOfN(n, Gen.chooseNum(32, 126).map(_.toChar))
  } yield cs.mkString

  private val unicodeGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 120)
    cs <- Gen.listOfN(n, Gen.oneOf(
      Gen.chooseNum(32, 126).map(_.toChar).map(_.toString),
      Gen.oneOf("é", "ß", "中", "文", "🎈", "Ω", "ü", "ñ")))
  } yield cs.mkString

  property("equals the composed sampling spelling (ASCII)") =
    forAll(asciiGen)(s => native(s) == reference(s))

  property("equals the composed sampling spelling (multibyte)") =
    forAll(unicodeGen)(s => native(s) == reference(s))

  property("short strings (positions repeat) agree") =
    forAll(Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(33, 125).map(_.toChar)).map(_.mkString)))(
      s => native(s) == reference(s))

  property("empty string hashes to 0") = native("") == 0L

  property("constant string has no gradients") =
    forAll(Gen.chooseNum(1, 100))(n => native("a" * n) == 0L)
}
