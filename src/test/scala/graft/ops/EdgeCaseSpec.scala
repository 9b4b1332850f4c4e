package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Edge-case pins for the text/dedup operators: degenerate documents
  * must degrade gracefully, not throw or emit garbage rows. */
class EdgeCaseSpec extends SparkSuite {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("empty and whitespace-only docs: no tokens, no signature, no pairs") {
    val d = docs((1L, ""), (2L, "   "), (3L, "\t\n"), (4L, "real words here"))
    assert(Dedup.tokens(d).filter(col("doc_id") =!= 4).isEmpty)
    assert(Dedup.signatures(Dedup.tokens(d)).count() == 1)
    assert(Dedup.nearDupPairs(d).isEmpty)
    assert(Dedup.simhashPairs(d).isEmpty)
  }

  test("single-token and sub-shingle docs: ngram pipeline skips them") {
    val d = docs((1L, "one"), (2L, "two words"), (3L, "a b c d e"), (4L, "a b c d e"))
    val pairs = Dedup.ngramJaccardPairs(d).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((3L, 4L)))
    assert(pairs.head.getDouble(2) == 1.0)
  }

  test("unicode text tokenizes and hashes deterministically") {
    val d = docs((1L, "héllo wörld 你好 мир"), (2L, "HÉLLO wörld 你好 мир"))
    val toks = Dedup.tokens(d)
    // lower() folds the accented/cyrillic cases → identical token sets
    assert(toks.filter(col("doc_id") === 1).count() == 4)
    val pairs = Dedup.nearDupPairs(d, threshold = 0.99).collect()
    assert(pairs.length == 1 && pairs.head.getDouble(2) == 1.0)
  }

  test("exact dedup treats normalized-whitespace variants as duplicates") {
    val d = docs((1L, "a  b\tc"), (2L, " a b c "), (3L, "a b d"))
    val out = Dedup.exactDedup(d).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L), (3L, 1L)))
  }

  test("quality scores handle short docs without division blowups") {
    val q = TextOps.qualityScores(docs((1L, "x"), (2L, "the fox"))).collect()
    assert(q.forall(r => !r.getDouble(3).isInfinite)) // avg_tok_len
    assert(q.forall(r => r.getLong(2) >= 1))          // n_tokens
  }

  test("multimodal payload of empty text: zero bytes, empty frames") {
    val row = MultiModal.payloadFeatures(docs((1L, ""))).head()
    assert(row.getAs[Long]("n_bytes") == 0L)
    assert(row.getAs[String]("frame_0") == "")
  }
}
