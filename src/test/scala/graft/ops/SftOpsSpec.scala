package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** SFT/preference assembly laws: the chat serialize→parse→flatten path
  * is lossless (including JSON-hostile content), pairing respects turn
  * parity, and preference pairs rank deterministically with ties. */
class SftOpsSpec extends SparkSuite {
  import spark.implicits._

  test("chat turns: lossless round-trip incl. JSON-hostile tokens, parity pairing") {
    // 17 tokens -> 3 turns (8, 8, 1) -> 1 pair; quote/backslash/brace
    // tokens must survive to_json -> from_json byte-identically
    val hostile = Seq("a\"b", "c\\d", "{e}", "f,g", "h:i", "j[k]", "l", "m",
      "n", "o", "p", "q", "r", "s", "t", "u", "v").mkString(" ")
    val d = Seq((1L, hostile), (2L, "one two"), (3L, "")).toDF("doc_id", "text")
    val out = SftOps.chatTurnsQ(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // doc 2 (one turn) and doc 3 (empty) pair nothing; doc 1 pairs
    // exactly once: prompt = tokens 1-8, response = 9-16, verbatim
    val toks = hostile.split(" ")
    assert(out.keySet == Set((1L, 0L)))
    assert(out((1L, 0L)).getAs[String]("prompt") == toks.take(8).mkString(" "))
    assert(out((1L, 0L)).getAs[String]("response") ==
      toks.slice(8, 16).mkString(" "))
    assert(out((1L, 0L)).getAs[Long]("n_prompt_tok") == 8)
  }

  test("chat turns: multi-pair docs index densely and cover the turn stream") {
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val d = Seq((7L, words(40))).toDF("doc_id", "text") // 5 turns -> 2 pairs
    val out = SftOps.chatTurnsQ(d).collect().sortBy(_.getLong(1))
    assert(out.length == 2)
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 1L))
    assert(out(1).getAs[String]("prompt").startsWith("w17 "))
    assert(out(1).getAs[String]("response").startsWith("w25 "))
  }

  test("preference pairs: higher score chosen, ties to larger id, singletons dropped") {
    // same text -> equal scores -> chosen must be the LARGER doc_id;
    // pair (2,3): doc 3 has strictly higher stopword ratio -> chosen
    val d = Seq(
      (0L, "alpha beta gamma"), (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma delta"), (3L, "the of and epsilon"),
      (8L, "lonely singleton")).toDF("doc_id", "text")
    val out = SftOps.prefPairsQ(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(0L, 1L), "singleton pair 4 must be dropped")
    assert(out(0L).getAs[Long]("chosen_id") == 1L, "equal scores tie to larger id")
    assert(out(0L).getAs[Double]("margin") == 0.0)
    assert(out(1L).getAs[Long]("chosen_id") == 3L)
    assert(out(1L).getAs[Double]("margin") > 0.0)
  }
}
