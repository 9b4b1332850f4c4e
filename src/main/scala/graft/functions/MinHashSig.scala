package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** The whole per-document MinHash signature — `nLanes` 60-bit lane
  * minima over a token array — as ONE native codegen'd expression.
  *
  * The aggregate spelling ships each document's tokens through an
  * explode, evaluates `md5(concat("i:", token))` per lane pair (a hex
  * ENCODE of every digest), slices two 15-nibble windows back out with
  * `conv(substring(...), 16, 10)` (a base-16 PARSE each), and folds the
  * minima in a doc-keyed HashAggregate — an exchange plus, per token,
  * nLanes/2 hex round-trips carrying bits the 16 digest bytes already
  * hold. With the document's distinct token array computed in-row
  * (`Dedup.tokArrays`), the signature needs none of that machinery:
  * this expression digests `"i:" + token` once per lane pair per token
  * (thread-local MessageDigest, no hex, no shuffle) and keeps the 2·i /
  * 2·i+1 lane minima from each digest's two 60-bit halves — the exact
  * bit windows `conv(substring(md5_hex, 1|17, 15), 16, 10)::long`
  * selects, so the VALUE is bit-identical to the aggregate spelling
  * (scalacheck-pinned in MinHashSigProps) and every oracle keeps its
  * portable md5-hex arithmetic unchanged.
  *
  * Contract: the input array must hold ≥ 1 non-null element (producers
  * filter `size(toks) > 0`; split() never yields null elements). A NULL
  * array yields NULL; an EMPTY or all-null array yields an EMPTY array
  * — never a partial signature — so misuse is loud downstream (lane
  * getItems go null), not silently wrong. */
case class MinHashSig(child: Expression, nLanes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[ArrayType] ||
        child.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${child.dataType.simpleString}")
    else if (nLanes < 2 || nLanes % 2 != 0 || nLanes > 16)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName lane count must be even and in [2, 16], got $nLanes")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = MinHashSig.FnName

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigEval.eval(input.asInstanceOf[ArrayData], nLanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      // MinHashSigEval, NOT MinHashSig: an object with a companion class
      // gets no static forwarders and Janino silently falls back to
      // interpreted projection (the Md5Bits lesson)
      s"graft.functions.MinHashSigEval.eval($c, $nLanes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Static-forwarder host for the codegen call — deliberately has NO
  * companion class. */
object MinHashSigEval {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val Mask60 = (1L << 60) - 1

  /** Lane minima: lane 2i   = bits [0, 60)  of md5("i:" + token),
    *              lane 2i+1 = bits [64, 124) — the two windows
    * `substring(md5_hex, 1, 15)` / `substring(md5_hex, 17, 15)` select. */
  def eval(in: ArrayData, nLanes: Int): ArrayData = {
    val n = in.numElements()
    val md = digests.get()
    val mins = Array.fill(nLanes)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < nLanes / 2) {
      // ASCII prefix "i:" — concat("i:", token) is UTF-8 byte concat
      val prefix = (i.toString + ":").getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      var j = 0
      while (j < n) {
        if (!in.isNullAt(j)) {
          any = true
          md.reset()
          md.update(prefix)
          md.update(in.getUTF8String(j).getBytes)
          val d = md.digest()
          var hi = 0L
          var lo = 0L
          var b = 0
          while (b < 8) {
            hi = (hi << 8) | (d(b) & 0xffL)
            lo = (lo << 8) | (d(b + 8) & 0xffL)
            b += 1
          }
          val v0 = (hi >>> 4) & Mask60
          val v1 = (lo >>> 4) & Mask60
          if (v0 < mins(2 * i)) mins(2 * i) = v0
          if (v1 < mins(2 * i + 1)) mins(2 * i + 1) = v1
        }
        j += 1
      }
      i += 1
    }
    if (!any) new GenericArrayData(Array.emptyLongArray)
    else new GenericArrayData(mins)
  }
}

object MinHashSig {
  val FnName = "minhash_sig"

  /** (identifier, info, builder) for SparkSessionExtensions.injectFunction
    * (cluster deployment; see [[graft.GraftExtensions]]). The lane count
    * is part of the plan — a literal int is required. */
  def descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier(FnName),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[MinHashSig].getCanonicalName, FnName),
    (exprs: Seq[Expression]) => fromExprs(exprs))

  private def fromExprs(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2) throw new IllegalArgumentException(
      s"$FnName expects exactly 2 arguments (token array, INT literal lane count), got ${exprs.length}")
    val lanes = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
          org.apache.spark.sql.types.IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$FnName lane-count argument must be an INT literal, got $other")
    }
    MinHashSig(exprs.head, lanes)
  }

  /** Register as a temp SQL function (idempotent). */
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, FnName, fromExprs)
}
