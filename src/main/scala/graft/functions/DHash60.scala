package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit dHash of a string in ONE byte-walk — the native form of the
  * composed sampling spelling in [[graft.ops.MultiModal]]:
  *
  * `codes[i] = ascii(substr(s, floor(i·(n−1)/60) + 1, 1))` for
  * i ∈ 0..60 (n = code-point length), `bit j = [codes[j] < codes[j+1]]`.
  *
  * The composed form evaluates 61 `substr` calls, each an O(n)
  * code-point scan from the start of the string — O(61·n) per payload,
  * measured 1.9 s of the 2.4 s incremental image-dedup probe at sf0.1.
  * This expression walks the UTF-8 bytes once, recording the lead byte
  * of each sampled code point as it passes — O(n), inside whole-stage
  * codegen.
  *
  * Parity contract (DHash60Props pins it over random ASCII and
  * multibyte strings): `ascii` in Spark returns the FIRST BYTE of the
  * first character as a signed int (not the code point), so the sample
  * recorded here is the signed lead byte; sample positions repeat when
  * n − 1 < 60 exactly as the floor arithmetic repeats them; the empty
  * string hashes to 0 (every sample reads as 0). The floor positions
  * are computed in long arithmetic — identical to the composed form's
  * double `floor` for any real payload (i·(n−1) ≪ 2^53).
  */
case class DHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def prettyName: String = DHash60.FnName

  override protected def nullSafeEval(input: Any): Any =
    DHash60Eval.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      // DHash60Eval, NOT DHash60: an object with a companion class gets
      // no static forwarders and Janino silently falls back to
      // interpreted projection (the Md5Bits lesson)
      s"graft.functions.DHash60Eval.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): DHash60 =
    copy(child = newChild)
}

/** Static-forwarder host for the codegen call — deliberately has NO
  * companion class. */
object DHash60Eval {
  private val Bits = 60

  def eval(s: UTF8String): Long = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    if (nBytes == 0) return 0L // all 61 samples read 0 → no gradients
    val n = s.numChars().toLong
    val samples = new Array[Int](Bits + 1)
    var si = 0        // next sample to fill
    var nextPos = 0L  // p_0 = 0
    var cp = 0L       // code-point index of the byte at bi
    var bi = 0        // byte offset of the current code point's lead byte
    while (si <= Bits && bi < nBytes) {
      while (si <= Bits && nextPos == cp) {
        // Spark `ascii` semantics: the signed FIRST BYTE of the char
        samples(si) = bytes(bi).toInt
        si += 1
        if (si <= Bits) nextPos = si * (n - 1) / Bits
      }
      val b = bytes(bi) & 0xFF
      bi += (if (b < 0x80) 1 else if (b < 0xE0) 2 else if (b < 0xF0) 3 else 4)
      cp += 1
    }
    var fp = 0L
    var j = 0
    while (j < Bits) {
      if (samples(j) < samples(j + 1)) fp |= (1L << j)
      j += 1
    }
    fp
  }
}

object DHash60 {
  val FnName = "dhash60"

  /** (identifier, info, builder) for SparkSessionExtensions.injectFunction
    * (cluster deployment; see [[graft.GraftExtensions]]). */
  def descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier(FnName),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[DHash60].getCanonicalName, FnName),
    (exprs: Seq[Expression]) => fromExprs(exprs))

  private def fromExprs(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 1) throw new IllegalArgumentException(
      s"$FnName expects exactly 1 argument (the decoded payload string), got ${exprs.length}")
    DHash60(exprs.head)
  }

  /** Register as a temp SQL function (idempotent). */
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, FnName, fromExprs)
}
