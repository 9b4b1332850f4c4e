package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Σ aᵢ·bᵢ over two array<double> columns, as a native codegen'd
  * Catalyst expression.
  *
  * Why not `aggregate(zip_with(a, b, (x, y) => x*y), 0.0d, acc + x)`:
  * the higher-order-function pair allocates an intermediate product
  * array and evaluates a lambda closure per element OUTSIDE whole-stage
  * codegen — in the similarity family (brute/LSH/IVF top-k, embedding
  * near-dup) the dot product runs per candidate pair and the HOF form
  * dominated those queries. This expression is a tight fused loop inside
  * codegen: zero allocation, no closure dispatch.
  *
  * Numerics contract: the sum is folded LEFT-TO-RIGHT exactly like the
  * HOF form it replaces (((0 + a₀b₀) + a₁b₁) + …), so results are
  * bitwise identical to it — and to the DuckDB oracle's
  * `list_dot_product`, which the declared queries mirror
  * (FunctionsSpec pins the bitwise parity). Degenerate inputs ALSO
  * match the HOF form: null arguments, length-mismatched arrays
  * (zip_with pads the shorter with null → the whole fold goes null),
  * and null elements all yield NULL — enforced at runtime, so a
  * malformed or mixed-dimension corpus diverges loudly (null) instead
  * of silently truncating to the shorter array.
  */
case class DotProductDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  // the guards can return null even for non-null array inputs
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_double"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var i = 0
    var s = 0.0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0d;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductDouble =
    copy(left = newLeft, right = newRight)
}

object DotProductDouble {
  val FnName = "dot_double"

  /** (identifier, info, builder) triple for
    * SparkSessionExtensions.injectFunction — the cluster-deployment
    * registration path (see [[graft.GraftExtensions]]). */
  def descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier(FnName),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[DotProductDouble].getCanonicalName, FnName),
    (exprs: Seq[Expression]) => DotProductDouble(exprs.head, exprs(1)))

  /** Register as a temp SQL function on the session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(FnName)))
      reg.createOrReplaceTempFunction(
        FnName,
        (exprs: Seq[Expression]) => DotProductDouble(exprs.head, exprs(1)),
        "scala_udf")
  }
}
