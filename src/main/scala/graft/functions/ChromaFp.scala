package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Chromaprint-style per-window spectral fingerprints of a decoded
  * sample stream, in ONE byte-walk — the audio sibling of [[DHash60]]
  * (per-window DIFFERENCE features, as Chromaprint/AcoustID derive
  * their bits from band-energy changes across frequency and time).
  *
  * STUB decode contract (no audio codecs in this container, the
  * [[graft.ops.MultiModal.decodeFeatures]] stance): the "PCM samples"
  * are the payload's per-code-point values under Spark `ascii`
  * semantics — the signed FIRST BYTE of each character (identical to
  * DuckDB `unicode()` on the fixture's guaranteed-ASCII payloads; the
  * documented ASCII-payload contract of the image/video oracles).
  *
  * Geometry (fixed, mirrored literally by the oracle): windows of
  * W = 32 samples at hop H = 16, each split into 8 bands of 4 samples;
  * band energy E(t,b) = sum of the band's 4 samples. Because the band
  * width divides the hop, every E(t,b) is one of the non-overlapping
  * 4-sample partial sums b4[4t+b] — computed once, O(n) total.
  * Fingerprint of window t ≥ 1 (30 bits — Chromaprint's 2-bit
  * quantization per filter: a sign bit and a magnitude bit):
  *   bit b    (b = 0..6): E(t,b) > E(t,b+1)          — spectral sign
  *   bit 7+b  (b = 0..7): E(t,b) > E(t−1,b)          — temporal sign
  *   bit 15+b (b = 0..6): |E(t,b) − E(t,b+1)| > 16   — spectral magnitude
  *   bit 22+b (b = 0..7): |E(t,b) − E(t−1,b)| > 16   — temporal magnitude
  * The magnitude bits double the entropy (a 15-bit sign-only space
  * saturates under a df cap around a million windows — measured in
  * ScaleSmoke: the cap started dropping real pairs at 16× sf0.1);
  * 30 bits keeps expected df ~1 far past that. Window 0 emits nothing
  * (no predecessor), so payloads need n ≥ W + H = 48 samples to
  * fingerprint at all. All bits are functions of energy DIFFERENCES,
  * so the fingerprint is invariant to global (additive) gain shifts —
  * the audio analogue of dHash's brightness invariance. */
case class ChromaFp(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = ChromaFp.FnName

  override protected def nullSafeEval(input: Any): Any =
    ChromaFpEval.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      // ChromaFpEval, NOT ChromaFp: an object with a companion class
      // gets no static forwarders and Janino silently falls back to
      // interpreted projection (the Md5Bits lesson)
      s"graft.functions.ChromaFpEval.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): ChromaFp =
    copy(child = newChild)
}

/** Static-forwarder host for the codegen call — deliberately has NO
  * companion class. */
object ChromaFpEval {
  private val Window = 32
  private val Hop = 16
  private val Bands = 8
  private val BandW = 4 // = Window / Bands; divides Hop — see Scaladoc
  private val MagThresh = 16L // |ΔE| quantization bar for the magnitude bits

  def eval(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    // one byte-walk: the signed lead byte of every code point
    // (Spark `ascii` semantics — the DHash60 parity contract)
    var n = 0
    var bi = 0
    while (bi < nBytes) {
      val b = bytes(bi) & 0xFF
      bi += (if (b < 0x80) 1 else if (b < 0xE0) 2 else if (b < 0xF0) 3 else 4)
      n += 1
    }
    if (n < Window + Hop) return new GenericArrayData(Array.empty[Any])
    val leads = new Array[Int](n)
    bi = 0
    var ci = 0
    while (bi < nBytes) {
      leads(ci) = bytes(bi).toInt
      val b = bytes(bi) & 0xFF
      bi += (if (b < 0x80) 1 else if (b < 0xE0) 2 else if (b < 0xF0) 3 else 4)
      ci += 1
    }
    // non-overlapping 4-sample partial sums; E(t,b) = b4(4t + b)
    val n4 = n / BandW
    val b4 = new Array[Long](n4)
    var j = 0
    while (j < n4) {
      val base = j * BandW
      b4(j) = leads(base).toLong + leads(base + 1) + leads(base + 2) +
        leads(base + 3)
      j += 1
    }
    val nW = 1 + (n - Window) / Hop
    val out = new Array[Any](nW - 1)
    var t = 1
    while (t < nW) {
      val o = 4 * t      // this window's first band group
      val p = 4 * (t - 1) // predecessor window's first band group
      var fp = 0L
      var b = 0
      while (b < Bands - 1) {
        val d = b4(o + b) - b4(o + b + 1)
        if (d > 0) fp |= (1L << b)
        if (d > MagThresh || d < -MagThresh) fp |= (1L << (15 + b))
        b += 1
      }
      b = 0
      while (b < Bands) {
        val d = b4(o + b) - b4(p + b)
        if (d > 0) fp |= (1L << (Bands - 1 + b))
        if (d > MagThresh || d < -MagThresh) fp |= (1L << (22 + b))
        b += 1
      }
      out(t - 1) = fp
      t += 1
    }
    new GenericArrayData(out)
  }
}

object ChromaFp {
  val FnName = "chroma_fp"

  /** (identifier, info, builder) for SparkSessionExtensions.injectFunction
    * (cluster deployment; see [[graft.GraftExtensions]]). */
  def descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier(FnName),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[ChromaFp].getCanonicalName, FnName),
    (exprs: Seq[Expression]) => fromExprs(exprs))

  private def fromExprs(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 1) throw new IllegalArgumentException(
      s"$FnName expects exactly 1 argument (the decoded payload string), got ${exprs.length}")
    ChromaFp(exprs.head)
  }

  /** Register as a temp SQL function (idempotent). */
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, FnName, fromExprs)
}
