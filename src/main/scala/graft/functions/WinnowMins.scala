package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Distinct sliding-window minima of an `array<bigint>` — the selection
  * step of winnowing fingerprints — as one native codegen'd expression.
  *
  * The composed spelling,
  * `array_distinct(transform(sequence(1, greatest(n−w+1, 1)), p ->
  * array_min(slice(h, p, w))))`, allocates a w-element slice COPY plus
  * a boxed fold per window — O(n·w) work and O(n) allocations per
  * document. This expression runs the classic monotonic-deque sliding
  * minimum: every element enters and leaves the deque once — O(n) with
  * a single scratch buffer, inside whole-stage codegen.
  *
  * VALUE parity with the composed spelling (first-occurrence order,
  * duplicates dropped) is scalacheck-pinned in WinnowMinsProps over
  * random arrays including n < w; oracles keep the portable
  * list-transform arithmetic unchanged. Contract: elements non-null
  * (the producers hash non-null grams); a NULL array yields NULL, an
  * EMPTY array yields an empty result (unreachable from
  * [[graft.ops.Dedup.winnowFingerprints]], which only feeds docs with
  * ≥ 1 gram).
  */
case class WinnowMins(child: Expression, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[ArrayType] ||
        child.dataType.asInstanceOf[ArrayType].elementType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${child.dataType.simpleString}")
    else if (w < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName window must be >= 1, got $w")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType,
    // an all-null window yields a null minimum (array_min semantics) —
    // only possible when the input can hold null elements
    containsNull = child.dataType match {
      case ArrayType(_, n) => n
      case _ => true
    })
  override def prettyName: String = WinnowMins.FnName

  override protected def nullSafeEval(input: Any): Any =
    WinnowMinsEval.eval(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      // WinnowMinsEval, NOT WinnowMins: an object with a companion class
      // gets no static forwarders and Janino silently falls back to
      // interpreted projection (the Md5Bits lesson)
      s"graft.functions.WinnowMinsEval.eval($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowMins =
    copy(child = newChild)
}

/** Static-forwarder host for the codegen call — deliberately has NO
  * companion class. */
object WinnowMinsEval {
  /** Distinct window-w minima of `in` in first-occurrence order; for
    * n < w one window covering the whole array. Null elements take the
    * composed spelling's path (array_min skips nulls; an all-null
    * window contributes a null minimum) — the SQL surface must not NPE
    * on `array(1L, NULL)`. */
  def eval(in: ArrayData, w: Int): ArrayData = {
    val n = in.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    var hasNull = false
    var ni = 0
    while (ni < n && !hasNull) { hasNull = in.isNullAt(ni); ni += 1 }
    if (hasNull) return evalWithNulls(in, w)
    val a = in.toLongArray()
    val nWin = math.max(n - w + 1, 1)
    // monotonic deque of indices; head = current window minimum
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    val mins = new Array[Long](nWin)
    var i = 0
    while (i < n) {
      while (tail > head && a(deque(tail - 1)) >= a(i)) tail -= 1
      deque(tail) = i
      tail += 1
      val winStart = i - w + 1
      if (winStart >= 0 && winStart < nWin) {
        while (deque(head) < winStart) head += 1
        mins(winStart) = a(deque(head))
      }
      i += 1
    }
    if (n < w) mins(0) = a(deque(head)) // single clamped window
    // dedup preserving first occurrence
    val seen = new java.util.HashSet[java.lang.Long](nWin * 2)
    val out = new Array[Long](nWin)
    var k = 0
    var j = 0
    while (j < nWin) {
      if (seen.add(mins(j))) { out(k) = mins(j); k += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  /** Slow path, null elements present: min over each window's non-null
    * values, null for an all-null window, distinct keeps one null —
    * exactly what slice + array_min + array_distinct compute. */
  private def evalWithNulls(in: ArrayData, w: Int): ArrayData = {
    val n = in.numElements()
    val nWin = math.max(n - w + 1, 1)
    val mins = new Array[Any](nWin)
    var p = 0
    while (p < nWin) {
      var best: java.lang.Long = null
      var i = p
      val end = math.min(p + w, n)
      while (i < end) {
        if (!in.isNullAt(i)) {
          val v = in.getLong(i)
          if (best == null || v < best) best = v
        }
        i += 1
      }
      mins(p) = best
      p += 1
    }
    val seen = new java.util.LinkedHashSet[Any]()
    mins.foreach(seen.add)
    new GenericArrayData(seen.toArray)
  }
}

object WinnowMins {
  val FnName = "winnow_mins"

  /** (identifier, info, builder) for SparkSessionExtensions.injectFunction
    * (cluster deployment; see [[graft.GraftExtensions]]). The window is
    * part of the plan — a literal int is required. */
  def descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier(FnName),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[WinnowMins].getCanonicalName, FnName),
    (exprs: Seq[Expression]) => fromExprs(exprs))

  private def fromExprs(exprs: Seq[Expression]): Expression = {
    // arity-checked up front so SQL misuse (winnow_mins(h), winnow_mins())
    // surfaces as a clean resolution message, not an IndexOutOfBounds
    if (exprs.length != 2) throw new IllegalArgumentException(
      s"$FnName expects exactly 2 arguments (hashes array, INT literal window), got ${exprs.length}")
    val w = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
          org.apache.spark.sql.types.IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$FnName window argument must be an INT literal (the window is part of the plan; " +
          s"a LONG literal or a column will not resolve), got $other")
    }
    WinnowMins(exprs.head, w)
  }

  /** Register as a temp SQL function (idempotent). */
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, FnName, fromExprs)
}
