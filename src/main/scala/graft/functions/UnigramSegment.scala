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

/** Viterbi segmentation of one word under a weighted piece vocabulary —
  * the E-step of the SentencePiece-style unigram tokenizer
  * ([[graft.ops.Unigram]]), as a single native expression (the
  * [[BpeSegment]] convention: vocab rides the plan as a reference
  * object, codegen is one constant-size static call whatever the vocab
  * size).
  *
  * DECLARED OBJECTIVE (integer-exact, so the whole train replays
  * bit-identically in any engine — the repo's integer-nano convention
  * applied to tokenizer training, where the textbook formulation
  * maximizes Σ log p(piece), a float whose last-ulp order differs per
  * libm): choose the segmentation minimizing, lexicographically,
  *   1. the piece COUNT (the dominant term of Σ log p — every
  *      log p < 0 is bounded away from zero),
  *   2. then MAXIMIZING the summed integer piece utility (the
  *      frequency mass that ranks same-length segmentations),
  *   3. then, per DP transition, preferring the LONGEST last piece.
  * The DP is the standard forward pass over code-point positions with
  * pieces of length ≤ maxPieceLen; backtracking follows the stored
  * decisions, so the winner is unique and total. An out-of-vocabulary
  * CHARACTER (never the case for corpus words — the trainer keeps every
  * corpus code point in the vocab, the lossless guarantee) falls back
  * to a single-char piece of utility 0, so reconstruction by
  * concatenation is lossless for ANY input. */
case class UnigramSegment(child: Expression, vocab: Array[(String, Long)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = UnigramSegment.FnName

  @transient private lazy val table = UnigramSegmentEval.tableOf(vocab)

  override protected def nullSafeEval(input: Any): Any =
    UnigramSegmentEval.eval(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("unigramVocab", table,
      classOf[java.util.HashMap[String, java.lang.Long]].getName)
    defineCodeGen(ctx, ev, c =>
      // static-forwarder host object, no companion class (Md5Bits lesson)
      s"graft.functions.UnigramSegmentEval.eval($c, $tableRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}

/** Static-forwarder host for the codegen call. */
object UnigramSegmentEval {

  /** Longest piece the DP considers — must match [[graft.ops.Unigram]]'s
    * seed-candidate length and the oracle's 4-way transition window. */
  val MaxPieceLen = 4

  def tableOf(vocab: Array[(String, Long)]): java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.length * 2)
    vocab.foreach { case (p, u) => m.put(p, u) }
    m
  }

  def eval(s: UTF8String,
      vocab: java.util.HashMap[String, java.lang.Long]): ArrayData = {
    val str = s.toString
    // code-point segmentation (substr semantics shared with the oracle)
    val chars = new java.util.ArrayList[String](str.length)
    var i = 0
    while (i < str.length) {
      val cc = Character.charCount(str.codePointAt(i))
      chars.add(str.substring(i, i + cc))
      i += cc
    }
    val m = chars.size
    val dpNp = new Array[Long](m + 1)
    val dpU = new Array[Long](m + 1)
    val back = new Array[Int](m + 1) // chosen last-piece length at position p
    var p = 1
    while (p <= m) {
      var bestNp = Long.MaxValue; var bestU = Long.MinValue; var bestLen = 0
      var len = 1
      while (len <= MaxPieceLen && len <= p) {
        val sb = new java.lang.StringBuilder
        var q = p - len
        while (q < p) { sb.append(chars.get(q)); q += 1 }
        val piece = sb.toString
        val u0 = vocab.get(piece)
        // single-char OOV fallback: utility 0 (lossless for any input)
        val u: java.lang.Long = if (u0 != null) u0
          else if (len == 1) java.lang.Long.valueOf(0L) else null
        if (u != null) {
          val np = dpNp(p - len) + 1
          val tu = dpU(p - len) + u.longValue()
          // (np asc, u desc, len desc) — the declared total order
          if (np < bestNp || (np == bestNp && tu > bestU) ||
              (np == bestNp && tu == bestU && len > bestLen)) {
            bestNp = np; bestU = tu; bestLen = len
          }
        }
        len += 1
      }
      dpNp(p) = bestNp; dpU(p) = bestU; back(p) = bestLen
      p += 1
    }
    // backtrack
    val out = new java.util.ArrayList[String]()
    var pos = m
    while (pos > 0) {
      val len = back(pos)
      val sb = new java.lang.StringBuilder
      var q = pos - len
      while (q < pos) { sb.append(chars.get(q)); q += 1 }
      out.add(sb.toString)
      pos -= len
    }
    val arr = new Array[Any](out.size)
    var k = 0
    while (k < out.size) {
      arr(k) = UTF8String.fromString(out.get(out.size - 1 - k)); k += 1
    }
    new GenericArrayData(arr)
  }
}

object UnigramSegment {
  val FnName = "unigram_segment"

  /** Encode (piece, utility) vocab for the SQL literal argument — the
    * [[BpeSegment.encodeRules]] LENGTH-PREFIXED convention (round-17
    * ADVICE): each entry is `<len>:<piece><utility>;`, the piece read
    * back by code-unit count, so no character is reserved and a corpus
    * word containing U+001E/U+001F (which `\s+` tokenization lets
    * through) trains/encodes like any other instead of aborting while
    * the oracle completes. */
  def encodeVocab(vocab: Seq[(String, Long)]): String =
    Base64.getEncoder.encodeToString(
      vocab.map { case (piece, u) => s"${piece.length}:$piece$u;" }
        .mkString.getBytes(UTF_8))

  private def decodeVocab(b64: String): Array[(String, Long)] =
    if (b64.isEmpty) Array.empty
    else {
      val s = new String(Base64.getDecoder.decode(b64), UTF_8)
      val out = Array.newBuilder[(String, Long)]
      var i = 0
      while (i < s.length) {
        val c = s.indexOf(':', i)
        require(c > i, s"$FnName: malformed vocab encoding at offset $i")
        val len = s.substring(i, c).toInt
        val pieceEnd = c + 1 + len
        require(pieceEnd <= s.length, s"$FnName: truncated vocab encoding")
        val semi = s.indexOf(';', pieceEnd)
        require(semi >= pieceEnd, s"$FnName: unterminated vocab entry")
        out += ((s.substring(c + 1, pieceEnd),
          s.substring(pieceEnd, semi).toLong))
        i = semi + 1
      }
      out.result()
    }

  def descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier(FnName),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[UnigramSegment].getCanonicalName, FnName),
    (exprs: Seq[Expression]) => fromExprs(exprs))

  private def fromExprs(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2) throw new IllegalArgumentException(
      s"$FnName expects exactly 2 arguments (word string, base64 vocab " +
        s"STRING literal), got ${exprs.length}")
    val vocab = exprs(1) match {
      case Literal(v: UTF8String, StringType) => decodeVocab(v.toString)
      case other => throw new IllegalArgumentException(
        s"$FnName vocab must be a STRING literal (the model is part of " +
          s"the plan), got $other")
    }
    UnigramSegment(exprs.head, vocab)
  }

  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, FnName, fromExprs)
}
