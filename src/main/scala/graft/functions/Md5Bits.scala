package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `conv(substring(md5(s), off+1, n), 16, 10) :: long`, as one native
  * codegen'd expression reading the bits straight off the digest.
  *
  * Every hash lane in the dedup/LSH pipelines is "some hex window of an
  * md5, parsed back into a long". The builtin spelling pays, per value:
  * a 32-char hex ENCODE (Md5 returns a hex UTF8String), a substring
  * copy, and a NumberConverter base-16 PARSE — three string round-trips
  * to move ≤ 60 bits that the 16 digest bytes already hold. At the
  * pipelines' volumes (5M+ shingles / (doc,token) rows at sf0.1, any
  * number at 100 TB) that churn is the dominant cost of the whole
  * signature stage. This expression digests into a thread-local buffer
  * and shifts the requested nibble window out of two big-endian longs —
  * zero allocation after the UTF-8 byte fetch.
  *
  * The VALUE is bit-identical to the builtin spelling (pinned by a
  * scalacheck property over random strings and windows), so oracles
  * keep their portable md5-hex arithmetic unchanged.
  *
  * `offNibbles` + `nNibbles` select hex chars [off, off+n) of the
  * 32-char md5 hex (0-based; the SQL substring is 1-based), n ≤ 15 so
  * the unsigned value always fits a positive long. */
case class Md5Bits(child: Expression, offNibbles: Int, nNibbles: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.simpleString}")
    else if (offNibbles < 0 || nNibbles < 1 || nNibbles > 15 || offNibbles + nNibbles > 32)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName window [$offNibbles, +$nNibbles) must lie in the 32 hex chars, n ≤ 15")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def prettyName: String = Md5Bits.FnName

  override protected def nullSafeEval(input: Any): Any =
    Md5BitsEval.eval(input.asInstanceOf[UTF8String], offNibbles, nNibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      // Md5BitsEval, NOT Md5Bits: an object with a companion class gets
      // no static forwarders, and Janino silently falls back to the
      // interpreted path on the unresolvable call (measured 2.3x SLOWER
      // than the builtin chain it replaces)
      s"graft.functions.Md5BitsEval.eval($c, $offNibbles, $nNibbles)")

  override protected def withNewChildInternal(newChild: Expression): Md5Bits =
    copy(child = newChild)
}

/** Static-forwarder host for the codegen call — deliberately has NO
  * companion class (a companion suppresses the forwarders and the
  * generated Java could not resolve the call). */
object Md5BitsEval {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Bits [off·4, (off+n)·4) of md5(s), big-endian, as an unsigned long. */
  def eval(s: UTF8String, offNibbles: Int, nNibbles: Int): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var hi = 0L
    var lo = 0L
    var i = 0
    while (i < 8) {
      hi = (hi << 8) | (d(i) & 0xffL)
      lo = (lo << 8) | (d(i + 8) & 0xffL)
      i += 1
    }
    val startBit = offNibbles * 4
    val endBit = startBit + nNibbles * 4
    val mask = (1L << (nNibbles * 4)) - 1
    if (endBit <= 64) (hi >>> (64 - endBit)) & mask
    else if (startBit >= 64) (lo >>> (128 - endBit)) & mask
    else ((hi << (endBit - 64)) | (lo >>> (128 - endBit))) & mask
  }
}

object Md5Bits {
  val FnName = "md5_bits"

  /** (identifier, info, builder) for SparkSessionExtensions.injectFunction
    * (cluster deployment; see [[graft.GraftExtensions]]). Literal int
    * arguments are required — the window is part of the plan, not data. */
  def descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier(FnName),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[Md5Bits].getCanonicalName, FnName),
    (exprs: Seq[Expression]) => fromExprs(exprs))

  private def fromExprs(exprs: Seq[Expression]): Expression = {
    def lit(e: Expression): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$FnName window arguments must be integer literals, got $other")
    }
    Md5Bits(exprs.head, lit(exprs(1)), lit(exprs(2)))
  }

  /** Register as a temp SQL function (idempotent), so ops reach it via
    * expr("md5_bits(s, off, n)"). */
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, FnName, fromExprs)
}
