package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE segmentation of one word under an ordered merge-rule list, as a
  * single native expression — the plan-size-stable form of the k-deep
  * `aggregate(...)` fold stack in [[graft.ops.Bpe]].
  *
  * The fold-stack spelling is semantically exact but its codegen grows
  * with every learned rule: round r of training recompiles a depth-r
  * lambda-fold expression (Janino pays per-round), and the apply side
  * compiles the full depth-k stack. This expression keeps the rules as
  * a plan-bound reference object and runs the identical replace-last
  * greedy walk in one tight loop: codegen is a single static call
  * whatever k is.
  *
  * Value parity with the composed fold stack (code-point segmentation,
  * replace-last merge semantics, rules applied in learned order) is
  * scalacheck-pinned in BpeSegmentProps; the end-to-end train/encode
  * laws live in BpeSpec and the DuckDB oracle replays the same walk.
  *
  * The SQL surface carries the rule list as a base64-encoded literal
  * (`bpe_segment(word, 'BASE64')`) — symbols come from corpus text, so
  * quoting/escaping inside the SQL literal is dodged entirely; rules
  * are joined with the U+001E record / U+001F unit separators, which
  * whitespace-tokenized symbols cannot contain. */
case class BpeSegment(child: Expression, rules: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = BpeSegment.FnName

  override protected def nullSafeEval(input: Any): Any =
    BpeSegmentEval.eval(input.asInstanceOf[UTF8String], rules.toArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // rules ride the plan as a reference object — constant-size codegen
    val rulesRef = ctx.addReferenceObj("bpeRules", rules.toArray,
      "scala.Tuple2[]")
    defineCodeGen(ctx, ev, c =>
      // BpeSegmentEval, NOT BpeSegment: an object with a companion class
      // gets no static forwarders and Janino silently falls back to
      // interpreted projection (the Md5Bits lesson)
      s"graft.functions.BpeSegmentEval.eval($c, $rulesRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegment =
    copy(child = newChild)
}

/** Static-forwarder host for the codegen call — deliberately has NO
  * companion class. */
object BpeSegmentEval {
  /** Code-point segmentation, then each rule (a, b) applied greedy
    * left-to-right as a replace-last walk — exactly the composed
    * `aggregate` fold: if the output's last symbol is `a` and the next
    * input symbol is `b`, the last symbol becomes a+b (and may merge
    * again under LATER rules, not under the same rule's continuing
    * walk — replace-last reads the merged token as `a` for the next
    * input, which IS the fold's semantics, pinned in BpeSegmentProps). */
  def eval(s: UTF8String, rules: Array[(String, String)]): ArrayData = {
    val str = s.toString
    var cur = new java.util.ArrayList[String](str.length)
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val cc = Character.charCount(cp)
      cur.add(str.substring(i, i + cc))
      i += cc
    }
    var r = 0
    while (r < rules.length) {
      val a = rules(r)._1
      val b = rules(r)._2
      val out = new java.util.ArrayList[String](cur.size)
      var j = 0
      while (j < cur.size) {
        val x = cur.get(j)
        if (!out.isEmpty && out.get(out.size - 1) == a && x == b)
          out.set(out.size - 1, a + b)
        else out.add(x)
        j += 1
      }
      cur = out
      r += 1
    }
    val arr = new Array[Any](cur.size)
    var k = 0
    while (k < cur.size) { arr(k) = UTF8String.fromString(cur.get(k)); k += 1 }
    new GenericArrayData(arr)
  }
}

object BpeSegment {
  val FnName = "bpe_segment"

  /** Encode a rule list for the SQL literal argument — LENGTH-PREFIXED
    * (round-17 ADVICE): each symbol is stored as `<len>:<chars>` and
    * read back by code-unit count, so NO character is reserved. The
    * former control-character separator scheme (U+001E/U+001F) had to
    * abort on corpus words containing those characters — which Java's
    * `\s` does not match, so whitespace tokenization lets them through
    * into merge symbols — an engine-vs-oracle divergence (crash vs.
    * result) reachable from plain corpus bytes. */
  def encodeRules(rules: Seq[(String, String)]): String =
    Base64.getEncoder.encodeToString(
      rules.map { case (a, b) => s"${a.length}:$a${b.length}:$b" }
        .mkString.getBytes(UTF_8))

  private def decodeRules(b64: String): Seq[(String, String)] =
    if (b64.isEmpty) Seq.empty
    else {
      val s = new String(Base64.getDecoder.decode(b64), UTF_8)
      val out = Seq.newBuilder[(String, String)]
      var i = 0
      def field(): String = {
        val c = s.indexOf(':', i)
        require(c > i, s"$FnName: malformed rule encoding at offset $i")
        val len = s.substring(i, c).toInt
        i = c + 1 + len
        require(i <= s.length, s"$FnName: truncated rule encoding")
        s.substring(c + 1, i)
      }
      while (i < s.length) {
        val a = field(); val b = field()
        out += ((a, b))
      }
      out.result()
    }

  /** (identifier, info, builder) for SparkSessionExtensions.injectFunction
    * (cluster deployment; see [[graft.GraftExtensions]]). */
  def descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier(FnName),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[BpeSegment].getCanonicalName, FnName),
    (exprs: Seq[Expression]) => fromExprs(exprs))

  private def fromExprs(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2) throw new IllegalArgumentException(
      s"$FnName expects exactly 2 arguments (word string, base64 rule-list " +
        s"STRING literal), got ${exprs.length}")
    val rules = exprs(1) match {
      case Literal(v: UTF8String, StringType) => decodeRules(v.toString)
      case other => throw new IllegalArgumentException(
        s"$FnName rule list must be a STRING literal (the rules are part " +
          s"of the plan), got $other")
    }
    BpeSegment(exprs.head, rules)
  }

  /** Register as a temp SQL function (idempotent). */
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, FnName, fromExprs)
}
