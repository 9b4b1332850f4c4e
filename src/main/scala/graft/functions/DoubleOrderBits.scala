package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Order-preserving IEEE-754 bit image of a double, as one native
  * codegen'd expression: `b = doubleToLongBits(v); b < 0 ? ~b | MIN : b`
  * — the radix-sort key transform, folded so the result is
  * SIGNED-comparable: for any doubles a ≤ b (numeric order, NaN
  * greatest like Spark's sort), f(a) ≤ f(b) as plain longs. Negative
  * doubles land in [MIN, −1] (complemented so more-negative sorts
  * lower), non-negatives keep their raw bits in [0, 0x7ff8…].
  *
  * This is what lets the histogram-select percentile form
  * ([[graft.ops.Relational.exactPercentiles]]) bucket values WITHOUT a
  * prior min/max envelope scan: the top `k` bits of this key are a
  * monotone bucketing of the value line, so the per-slice histogram
  * falls out of the FIRST (and only full) pass over the data.
  *
  * Note −0.0 maps one key below +0.0: the two are equal under Spark
  * comparison but interchangeable under rank interpolation, so a tie
  * run straddling that boundary (or any bucket boundary) is harmless —
  * the same argument the sort form makes for range-partition ties. */
case class DoubleOrderBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a double argument, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def prettyName: String = DoubleOrderBits.FnName

  override protected def nullSafeEval(input: Any): Any =
    DoubleOrderBitsEval.eval(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      // Eval object, not the case class: a companion suppresses static
      // forwarders and Janino would fall back to interpreted (see
      // Md5Bits for the measured cost of that silent degrade)
      s"graft.functions.DoubleOrderBitsEval.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): DoubleOrderBits =
    copy(child = newChild)
}

/** Static-forwarder host for the codegen call (no companion class). */
object DoubleOrderBitsEval {
  def eval(v: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(v)
    if (b < 0) ~b | Long.MinValue else b
  }
}

object DoubleOrderBits {
  val FnName = "double_order_bits"

  /** (identifier, info, builder) for SparkSessionExtensions.injectFunction
    * (cluster deployment; see [[graft.GraftExtensions]]). */
  def descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier(FnName),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[DoubleOrderBits].getCanonicalName, FnName),
    (exprs: Seq[Expression]) => fromExprs(exprs))

  private def fromExprs(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 1) throw new IllegalArgumentException(
      s"$FnName expects exactly 1 argument, got ${exprs.length}")
    DoubleOrderBits(exprs.head)
  }

  /** Register as a temp SQL function (idempotent). */
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, FnName, fromExprs)
}
