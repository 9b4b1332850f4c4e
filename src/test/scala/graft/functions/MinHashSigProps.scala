package graft.functions

import java.math.BigInteger

import org.apache.commons.codec.digest.DigestUtils
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Properties}

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Pure-eval properties for the native in-row MinHash signature:
  * checked against the aggregate spelling it replaces — per token and
  * lane pair i, hex-encode md5("i:" + token), take windows [0, 15) and
  * [16, 31) of the hex, parse base-16, fold the per-lane minimum
  * (exactly what `min(conv(substring(md5(concat('i:', token)), 1|17,
  * 15), 16, 10)::long)` computes over the doc's distinct token set).
  * The codegen path is covered by the DataFrame differential leg in
  * LlmOpsSpec (identical-token-set signatures) and the oracle gate. */
object MinHashSigProps extends Properties("MinHashSig") {

  private val tokGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.suchThat(_.nonEmpty),
    Gen.asciiPrintableStr.suchThat(_.nonEmpty),
    Gen.listOf(Gen.oneOf('你', 'é', 'щ', 'a', '0')).map(_.mkString).suchThat(_.nonEmpty))

  private val docGen: Gen[List[String]] = Gen.nonEmptyListOf(tokGen)

  private def referenceLane(tok: String, lane: Int): Long = {
    val hex = DigestUtils.md5Hex(
      (s"${lane / 2}:" + tok).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val off = if (lane % 2 == 0) 0 else 16
    new BigInteger(hex.substring(off, off + 15), 16).longValueExact()
  }

  private def arr(toks: Seq[String]) =
    new GenericArrayData(toks.map(t => UTF8String.fromString(t)).toArray[Any])

  property("equals per-lane min of the hex-substring-parse reference") =
    forAll(docGen) { toks =>
      val got = MinHashSigEval.eval(arr(toks), 8)
      (0 until 8).forall { lane =>
        got.getLong(lane) == toks.map(referenceLane(_, lane)).min
      }
    }

  property("empty and all-null arrays yield an empty signature") = {
    MinHashSigEval.eval(new GenericArrayData(Array.empty[Any]), 8).numElements() == 0 &&
    MinHashSigEval.eval(new GenericArrayData(Array[Any](null, null)), 8).numElements() == 0
  }

  property("null elements are skipped, not hashed") =
    forAll(docGen) { toks =>
      val withNulls = new GenericArrayData(
        (null +: toks.map(t => UTF8String.fromString(t)) :+ null).toArray[Any])
      val got = MinHashSigEval.eval(withNulls, 8)
      (0 until 8).forall { lane =>
        got.getLong(lane) == toks.map(referenceLane(_, lane)).min
      }
    }
}
