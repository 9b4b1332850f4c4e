package graft.functions

import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Properties}

import org.apache.spark.unsafe.types.UTF8String

/** Pure-eval properties for the native BPE segmentation: checked
  * against a direct Scala replica of the composed charSymbols +
  * replace-last `aggregate` fold it replaces. The Catalyst-level
  * parity of the two spellings (both evaluated by Spark) is pinned
  * separately in BpeSpec; these properties drive randomized words and
  * rule lists through the pure eval. */
object BpeSegmentProps extends Properties("BpeSegment") {

  /** Replica of the composed fold: code-point split, then per rule a
    * replace-last walk (out.last == a && next == b → merge). */
  private def reference(w: String, rules: Seq[(String, String)]): List[String] = {
    var cur = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        out += w.substring(i, i + Character.charCount(cp))
        i += Character.charCount(cp)
      }
      out.toList
    }
    rules.foreach { case (a, b) =>
      val out = scala.collection.mutable.ListBuffer.empty[String]
      cur.foreach { x =>
        if (out.nonEmpty && out.last == a && x == b)
          out(out.length - 1) = a + b
        else out += x
      }
      cur = out.toList
    }
    cur
  }

  private def native(w: String, rules: Seq[(String, String)]): List[String] = {
    val arr = BpeSegmentEval.eval(UTF8String.fromString(w), rules.toArray)
    (0 until arr.numElements()).map(i =>
      arr.getUTF8String(i).toString).toList
  }

  private val wordGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 24)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')) // tiny alphabet → rules fire often
  } yield cs.mkString

  private val symGen: Gen[String] = Gen.oneOf(
    Gen.oneOf("a", "b", "c", "d"),
    Gen.oneOf("ab", "bc", "cd", "abc", "aa", "bb"))

  private val rulesGen: Gen[Seq[(String, String)]] = for {
    n <- Gen.chooseNum(0, 6)
    rs <- Gen.listOfN(n, Gen.zip(symGen, symGen))
  } yield rs

  property("equals the composed fold replica") =
    forAll(wordGen, rulesGen) { (w, rules) =>
      native(w, rules) == reference(w, rules)
    }

  property("no rules = code-point split; concatenation is lossless") =
    forAll(wordGen, rulesGen) { (w, rules) =>
      native(w, Nil) == w.map(_.toString).toList &&
        native(w, rules).mkString("") == w
    }

  property("multibyte words segment losslessly") =
    forAll(Gen.chooseNum(1, 8), rulesGen) { (n, rules) =>
      val w = List.fill(n)("é中🎈").mkString
      native(w, rules).mkString("") == w &&
        native(w, rules) == reference(w, rules)
    }

  property("rule-list base64 round-trips through the SQL literal") =
    forAll(rulesGen.suchThat(_.nonEmpty)) { rules =>
      // encodeRules is the SQL-surface carrier — a plan built from it
      // must see the same rule list (exercised end-to-end in BpeSpec;
      // here: encode is injective on the generated alphabet)
      val b64a = BpeSegment.encodeRules(rules)
      val b64b = BpeSegment.encodeRules(rules.reverse)
      rules == rules.reverse || b64a != b64b
    }
}
