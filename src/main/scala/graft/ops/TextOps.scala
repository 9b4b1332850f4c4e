package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting
  * (whitespace + BPE-ish regex), quality scoring, language-ID heuristic,
  * corpus stats. All pure column expressions (codegen'd, no UDFs), all
  * embarrassingly parallel — per-row work then one partial+final agg.
  */
object TextOps {
  /** Stopwords for the crude lang-ID / quality heuristics. */
  val EnStopwords: Seq[String] = Seq("the", "a", "an", "and", "of", "to", "in", "is", "on", "for")

  private[ops] def toks(c: Column): Column = split(lower(trim(c)), "\\s+")

  /** Whitespace token count. */
  def nTokensWs(c: Column): Column = size(toks(c))

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * non-alphanumeric non-space chars — a crude proxy for subword
    * tokenizer output length. */
  def nTokensBpe(c: Column): Column =
    regexp_count(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))

  /** Fraction of tokens that are English stopwords. */
  def stopwordRatio(c: Column): Column =
    size(filter(toks(c), t => t.isin(EnStopwords: _*))).cast("double") / nTokensWs(c)

  /** Corpus stats per language: doc count, whitespace/BPE token totals,
    * char stats. */
  def textStats(docs: DataFrame): DataFrame =
    graft.sources.Tables.fanout(docs)
      .select(col("lang"),
        nTokensWs(col("text")).cast("long").as("n_tok"),
        nTokensBpe(col("text")).cast("long").as("n_bpe"),
        length(col("text")).cast("long").as("n_chars"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("total_tokens"),
        sum("n_bpe").as("total_bpe_tokens"),
        avg("n_chars").as("avg_chars"),
        max("n_tok").as("max_tokens"))

  /** Corpus-wide heavy hitters: document frequency per token, top k —
    * the boilerplate/template detector that feeds dedup's df caps and
    * stopword lists. Scale shape: explode → two-phase distinct count
    * (map-side partial dedup, the shuffle carries (token, doc) partials,
    * never raw occurrences) → TakeOrderedAndProject for the top k (heap
    * per partition + merge of k·partitions rows — no full sort
    * anywhere). Deterministic tie-break (df desc, token asc) keeps the
    * cut line oracle-stable. */
  def topTokens(docs: DataFrame, k: Int = 20): DataFrame =
    graft.sources.Tables.fanout(docs)
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count_distinct(col("doc_id")).as("df_docs"))
      .orderBy(col("df_docs").desc, col("token").asc)
      .limit(k)

  /** Corpus-wide top-k token bigrams — n-gram extraction, the language-
    * modeling staple next to [[topTokens]]'s unigram df. Same scale
    * shape: one Generate per doc (the bigram list is built by a
    * codegen'd array transform, no self-join of token positions), a
    * partial+final count, TakeOrderedAndProject for the top k.
    * Deterministic tie-break (n desc, bigram asc) keeps the cut line
    * oracle-stable. */
  def ngramCountsQ(docs: DataFrame, k: Int = 20): DataFrame =
    graft.sources.Tables.fanout(docs)
      .select(split(lower(trim(col("text"))), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("toks")) - 2),
        i => concat_ws(" ", col("toks")(i), col("toks")(i + 1)))).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(k)

  /** Intra-document repetition scores — the Gopher-style quality
    * filters that catch degenerate/boilerplate text: fraction of the
    * most common token, and duplicate-instance fractions of 2-gram and
    * 3-gram occurrences (1 − distinct/total, 0 for docs too short to
    * form a gram). The n-gram fractions are pure per-row array
    * expressions (map-side); the token mode needs a real aggregate, so
    * one (doc, token) hash count feeds a per-doc max — the shuffle
    * carries per-token partial counts, never text — and joins back on
    * doc_id (co-partitioned with the aggregate's own exchange). `keep`
    * applies the filter thresholds (top token < 20 %, duplicate 2-gram
    * instances < 20 %). Docs with no non-empty tokens produce no row —
    * there is nothing to score (mirrored by the oracle's inner join). */
  def repetitionScores(docs: DataFrame): DataFrame = {
    val base = graft.sources.Tables.fanout(docs)
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("toks"))
    // the gram array only materializes when ≥ n tokens exist — a
    // shorter doc would build a DESCENDING sequence (the round-5
    // inverted-interval trap) and has no meaningful fraction anyway
    val mapSide = base.select(col("doc_id"),
      size(col("toks")).cast("long").as("n_tokens"),
      dupGramFrac(col("toks"), 2).as("dup_2gram_frac"),
      dupGramFrac(col("toks"), 3).as("dup_3gram_frac"))
    val topTok = base
      .select(col("doc_id"), explode(col("toks")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_c"), sum(col("c")).as("n_nonempty"))
    mapSide.join(topTok, "doc_id")
      .select(col("doc_id"), col("n_tokens"),
        (col("top_c").cast("double") / col("n_nonempty")).as("top_token_frac"),
        col("dup_2gram_frac"), col("dup_3gram_frac"))
      .withColumn("keep",
        (col("top_token_frac") < 0.2 && col("dup_2gram_frac") < 0.2).cast("long"))
  }

  /** TF-IDF term scores for a document subset against the WHOLE
    * corpus's document frequencies — the classic relevance/keyword
    * feature a text pipeline derives per document.
    *
    * Scale shape: term frequencies aggregate only the scored subset's
    * occurrences (map-side combine); document frequencies are the same
    * two-phase distinct count [[topTokens]] uses over the full corpus
    * — the shuffle carries (token, doc) partials, never raw
    * occurrences. The subset side of the scoring join is the SMALL
    * side, so it broadcasts and the corpus-wide df table streams
    * through map-side; the corpus count rides a one-row cross join (no
    * driver round-trip). Output is the full per-(doc, token) score
    * frame — ranking on a double score across engines is a last-ulp
    * hazard (libm ln differs), so top-k-per-doc is left to the caller
    * (and the oracle compares the rounded scores themselves). */
  def tfidfQ(docs: DataFrame, maxDocId: Long = 20): DataFrame = {
    val tok = graft.sources.Tables.fanout(docs)
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      .filter(col("token") =!= "")
    val tf = tok.filter(col("doc_id") < maxDocId)
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfTab = tok.groupBy(col("token"))
      .agg(count_distinct(col("doc_id")).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    broadcast(tf).join(dfTab, "token")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        (col("tf") * log(col("n_docs").cast("double") / col("df"))).as("tfidf"))
  }

  /** [[qualityScores]]' composite keep flag as a single reusable
    * per-row expression — the shared primitive that lets the composed
    * cleaning pipeline compute the verdict in ITS one per-row pass
    * without re-deriving (or re-scanning for) the feature columns.
    * Parity with the frame form is spec-pinned (CleaningSpec). */
  private[ops] def qualityKeepExpr(text: Column): Column = {
    val nTok = nTokensWs(text)
    val punct = regexp_count(lower(text), lit("[^a-z0-9\\s]"))
    val stopHits = size(filter(toks(text), t => t.isin(EnStopwords: _*)))
    (nTok.cast("long") >= 10 &&
      (punct.cast("double") / nullif(length(text), lit(0))) < 0.3 &&
      (stopHits.cast("double") / nTok) > 0.01).cast("long")
  }

  /** [[repetitionScores]]' duplicate-n-gram fraction over a token
    * array, as a reusable per-row expression (same sharing rationale as
    * [[qualityKeepExpr]]). The `when` guard keeps short docs off the
    * descending-sequence trap (round-5 note in repetitionScores). */
  private[ops] def dupGramFrac(tokArr: Column, n: Int): Column = {
    def grams = transform(sequence(lit(0), size(tokArr) - n),
      i => concat_ws(" ", slice(tokArr, i + 1, lit(n))))
    when(size(tokArr) >= n,
      lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams))
      .otherwise(lit(0.0))
  }

  /** Per-document quality score features: length, token stats, punct
    * density, stopword ratio, plus a composite keep/drop flag of the kind
    * a pretraining filter would apply. */
  def qualityScores(docs: DataFrame): DataFrame = {
    // regex-heavy per-row work — spread the single-row-group scan
    val d = graft.sources.Tables.fanout(docs)
    val nTok = nTokensWs(col("text"))
    val punct = regexp_count(lower(col("text")), lit("[^a-z0-9\\s]"))
    val stopHits = size(filter(toks(col("text")), t => t.isin(EnStopwords: _*)))
    // nTok ≥ 1 always (split of "" is [""]) so /nTok is total, but an
    // empty document has length 0 — under Spark 4's default ANSI mode a
    // bare /0 throws, so punct_ratio goes through nullif (null ratio for
    // empty docs; the oracle mirrors the nullif)
    d.select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        nTok.cast("long").as("n_tokens"),
        (length(col("text")).cast("double") / nTok).as("avg_tok_len"),
        (punct.cast("double") / nullif(length(col("text")), lit(0))).as("punct_ratio"),
        (stopHits.cast("double") / nTok).as("stopword_ratio"))
      .withColumn("keep",
        (col("n_tokens") >= 10 && col("punct_ratio") < 0.3 && col("stopword_ratio") > 0.01).cast("long"))
  }

  /** Language-ID heuristic: stopword-ratio vote for English; documents
    * below the threshold are 'unknown'. (A real impl uses char n-gram
    * profiles per language — this declares the operator surface with a
    * deterministic, oracle-checkable rule.) Compares against the table's
    * labeled lang column. */
  def langId(docs: DataFrame): DataFrame = {
    val d = graft.sources.Tables.fanout(docs)
    val stopHits = size(filter(toks(col("text")), t => t.isin(EnStopwords: _*)))
    val ratio = stopHits.cast("double") / nTokensWs(col("text"))
    d.select(col("doc_id"), col("lang"),
        when(ratio >= 0.05, lit("en")).otherwise(lit("unknown")).as("pred_lang"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
  }

  /** PII patterns for [[redactPii]] as (regex, placeholder, count
    * column), applied IN ORDER (order is part of the declared semantics
    * and mirrored in the oracle: emails first — they contain digit runs
    * a later pattern would mangle — then dotted IPs before bare digit
    * runs). Portable across Java regex and RE2. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>", "n_email"),
    ("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>", "n_ip"),
    ("\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>", "n_phone"),
    ("\\b\\d{9,}\\b", "<ID>", "n_id"))

  /** PII redaction — the scrubbing pass every training-data pipeline
    * runs before anything else sees the text. Typed placeholders per
    * category plus per-category match counts (counted on the input, so
    * the counts survive the replacement); both derive from the one
    * [[PiiPatterns]] list, so adding a category cannot desync them.
    * Pure codegen'd column expressions; embarrassingly parallel, no
    * shuffle. */
  def redactPii(df: DataFrame, textCol: String = "text"): DataFrame = {
    val redacted = PiiPatterns.foldLeft(col(textCol)) {
      case (c, (pat, tag, _)) => regexp_replace(c, pat, tag)
    }
    PiiPatterns.foldLeft(df) { case (d, (pat, _, cnt)) =>
      d.withColumn(cnt, regexp_count(col(textCol), lit(pat)).cast("long"))
    }.withColumn(textCol, redacted)
  }

  /** Top-k vocabulary with cumulative coverage — the tokenizer-design
    * readout (how many vocabulary entries cover what fraction of the
    * corpus token stream). Scale shape: one explode + partial+final
    * hash count builds the (token, n) table ONCE (tracked cache — the
    * corpus-sized explode must not run twice for the total and the
    * top-k), then the corpus total is a one-row aggregate cross-joined
    * as a scalar, the top k comes from TakeOrderedAndProject (heap, no
    * full sort), and the running coverage window orders only the k
    * surviving rows — the single-partition window is bounded by k, by
    * construction, never by vocabulary size. Deterministic tie-break
    * (n desc, token asc) keeps the cut line and the running sum
    * oracle-stable. */
  def vocabQ(docs: DataFrame, k: Int = 200): DataFrame = {
    val counts = PipelineCaches.track(
      graft.sources.Tables.fanout(docs)
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n")))
    val total = counts.agg(sum(col("n")).as("total_n"))
    // Constant partition spec: the window runs post-limit(k) so a single
    // partition is the point, but an empty partitionSpec makes WindowExec
    // log a data-loss warning on every run. total_n (one value for every
    // row — the broadcast one-row total) declares the intent; a literal
    // would be constant-folded OUT of the spec and re-empty it.
    val byCount = Window.partitionBy(col("total_n"))
      .orderBy(col("n").desc, col("token").asc)
    counts.orderBy(col("n").desc, col("token").asc).limit(k)
      .crossJoin(broadcast(total))
      .select(
        row_number().over(byCount).cast("long").as("rank"),
        col("token"), col("n"),
        round(sum(col("n")).over(byCount).cast("double") /
          col("total_n").cast("double"), 6).as("cum_share"))
  }

  /** Per-slice token entropy — the corpus-audit readout (how diverse is
    * each source's token distribution; a collapsing entropy flags
    * template/boilerplate sources before any model sees them). Shannon
    * entropy in nats via the algebraic identity
    * H = ln(n) − Σ c·ln(c) / n, which needs only per-(slice, token)
    * counts — one explode + two partial+final hash aggregates, never a
    * p·ln(p) per-row pass over probabilities. Also reports the
    * normalized form H / ln(#distinct) (1.0 = uniform; 0 for
    * single-token slices by convention — ln(1) guards the division). */
  def entropyQ(docs: DataFrame, sliceCol: String = "source"): DataFrame =
    graft.sources.Tables.fanout(docs)
      .select(col(sliceCol).as("slice"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("slice"), col("token"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("slice"))
      .agg(sum(col("c")).as("n"),
        count(lit(1)).as("n_distinct"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("clnc"))
      .select(col("slice"), col("n"), col("n_distinct"),
        round(log(col("n").cast("double")) - col("clnc") / col("n"), 6).as("entropy"),
        round(when(col("n_distinct") === 1, lit(0.0))
          .otherwise((log(col("n").cast("double")) - col("clnc") / col("n")) /
            log(col("n_distinct").cast("double"))), 6).as("norm_entropy"))

  /** Pairwise vocabulary overlap between corpus slices (sources): the
    * cross-slice contamination audit next to [[entropyQ]]'s
    * within-slice diversity. Jaccard of the slices' distinct token
    * sets, computed without ever materializing a set: the (slice,
    * token) distinct frame self-joins on token — candidate rows are
    * Σ_token C(slices_with_token, 2), bounded by |vocab| · |slices|²
    * where |slices| (sources/domains) is small by definition — then
    * one pair-keyed count and an inclusion-exclusion union against the
    * broadcast per-slice set sizes. Emits each unordered pair once
    * (slice_a < slice_b). */
  def sourceOverlapQ(docs: DataFrame, sliceCol: String = "source"): DataFrame = {
    // (slice, token) distinct is |slices|·|vocab| bounded and read three
    // times (sizes + both self-join sides) — tracked cache keeps the
    // corpus at one explode
    val st = PipelineCaches.track(
      graft.sources.Tables.fanout(docs)
        .select(col(sliceCol).as("slice"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
        .filter(col("token") =!= "")
        .distinct())
    val sizes = st.groupBy(col("slice")).agg(count(lit(1)).as("n_tok"))
    // pair counts WITHOUT a self-join (round 9): slices-per-token is
    // bounded by |slices| (small by definition), so fold each token's
    // slice set with collect_set and expand the C(s,2) ordered pairs
    // IN THE ROW — one token-keyed shuffle replaces the join's two,
    // candidate rows identical (Σ_token C(slices_with_token, 2)), and
    // the sort inside the row pins slice_a < slice_b deterministically.
    val inter = st.groupBy(col("token"))
      .agg(array_sort(collect_set(col("slice"))).as("ss"))
      .select(explode(flatten(transform(col("ss"), (a, i) =>
        transform(slice(col("ss"), i + 2, size(col("ss"))),
          b => struct(a.as("slice_a"), b.as("slice_b")))))).as("p"))
      .select(col("p.slice_a"), col("p.slice_b"))
      .groupBy(col("slice_a"), col("slice_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.withColumnRenamed("slice", "slice_a")
        .withColumnRenamed("n_tok", "n_a")), Seq("slice_a"))
      .join(broadcast(sizes.withColumnRenamed("slice", "slice_b")
        .withColumnRenamed("n_tok", "n_b")), Seq("slice_b"))
      .select(col("slice_a"), col("slice_b"), col("n_common"),
        round(col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"), 6).as("jaccard"))
  }

  /** Top-k token bigrams by pointwise mutual information — the
    * collocation detector (PMI surfaces bigrams whose parts co-occur
    * far above chance; raw counts just surface stopword pairs).
    * PMI = ln((n_ab/B) / ((n_a/N)·(n_b/N))) over adjacent-pair and
    * unigram counts; `minCount` suppresses the low-frequency PMI
    * explosion (a hapax bigram of two hapax tokens has maximal PMI).
    * Scale shape (round-9 single-pass fold): ONE tokenize + ONE
    * explode emits each position as a (tok_a, tok_b) pair — tok_b is
    * the successor, null at the last position — so every token appears
    * exactly once as tok_a. One corpus-sized hash count to the
    * vocab²-bounded pair table, from which the unigram table
    * (re-aggregate on tok_a), the bigram table (drop the null-successor
    * rows) and BOTH totals derive without touching the corpus again —
    * the previous form ran the tokenize+explode+count twice. The
    * enrichment joins are token-keyed (broadcast when small, shuffle
    * otherwise — Catalyst's call); the one-row totals broadcast;
    * TakeOrderedAndProject keeps the top k on the ROUNDED score with a
    * bigram tie-break so the cut line is oracle-stable. */
  def pmiQ(docs: DataFrame, k: Int = 50, minCount: Int = 5): DataFrame = {
    val toksF = graft.sources.Tables.fanout(docs)
      .select(split(lower(trim(col("text"))), "\\s+").as("toks"))
      .withColumn("toks", filter(col("toks"), t => t =!= ""))
    // ONE corpus aggregate computes the pair AND unigram count tables
    // via GROUPING SETS ((tok_a, tok_b), (tok_a)): Expand forks each
    // position into both levels ahead of the map-side partial agg, so
    // the corpus is tokenized, exploded and shuffled exactly once and
    // the unigram table is a FILTER on this frame — the previous form
    // re-aggregated (and re-cached) the pair table for unigrams, a
    // second shuffle + materialization per run. gid: 0 = (tok_a,
    // tok_b) level, 1 = tok_b aggregated out (the unigram level; its
    // tok_b is NULL by Expand, distinct from gid-0 rows whose tok_b is
    // the genuine null successor at a document's last position).
    // localCheckpoint, NOT cache: the derived views self-join below,
    // and the analyzer's attribute dedup defeats the CacheManager's
    // plan-match for grouping-sets subtrees (see trackCheckpointed) —
    // with cache the uni sides and totals silently re-ran the corpus
    // aggregate; the checkpoint's LogicalRDD cannot miss.
    val counts = PipelineCaches.trackCheckpointed(
      toksF.select(explode(transform(col("toks"), (t, i) =>
          struct(t.as("tok_a"),
            when(i < size(col("toks")) - 1, col("toks")(i + 1)).as("tok_b")))).as("p"))
        .select(col("p.tok_a"), col("p.tok_b"))
        .groupingSets(Seq(Seq(col("tok_a"), col("tok_b")), Seq(col("tok_a"))),
          col("tok_a"), col("tok_b"))
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .localCheckpoint())
    // vocab-bounded map-side derivations of the one materialized frame —
    // no further shuffle until the enrichment joins
    val uni = counts.filter(col("gid") === 1)
      .select(col("tok_a").as("token"), col("n").as("n_uni"))
    val bi = counts.filter(col("gid") === 0 && col("tok_b").isNotNull)
      .select(col("tok_a"), col("tok_b"), col("n").as("n_ab"))
    // both corpus totals from one scan of the cache: every token is
    // exactly one unigram row's tok_a (n_total), and pairs are exactly
    // the non-terminal positions (b_total)
    val totals = counts.agg(
      sum(when(col("gid") === 1, col("n"))).as("n_total"),
      sum(when(col("gid") === 0 && col("tok_b").isNotNull, col("n"))).as("b_total"))
    bi.filter(col("n_ab") >= minCount)
      .join(uni.select(col("token").as("tok_a"), col("n_uni").as("n_a")),
        Seq("tok_a"))
      .join(uni.select(col("token").as("tok_b"), col("n_uni").as("n_b")),
        Seq("tok_b"))
      .crossJoin(broadcast(totals))
      .select(col("tok_a"), col("tok_b"), col("n_ab"),
        round(log((col("n_ab").cast("double") / col("b_total")) /
          ((col("n_a").cast("double") / col("n_total")) *
            (col("n_b").cast("double") / col("n_total")))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("tok_a").asc, col("tok_b").asc)
      .limit(k)
  }

  /** Sliding-window document chunking — the RAG/embedding preprocessing
    * step: cut each document's token stream into overlapping windows of
    * `window` tokens every `stride` tokens (the final chunk may be
    * short; a document shorter than one window is one chunk). Pure
    * per-row array expressions and one Generate — embarrassingly
    * parallel, no shuffle, no UDF. Chunk count per doc is
    * 1 + ceil(max(n_tok − window, 0) / stride), so the last window
    * always reaches the document's end and every token is covered.
    * Output: (doc_id, chunk_id, n_tok BIGINT, chunk_text). */
  def chunkQ(docs: DataFrame, window: Int = 64, stride: Int = 48): DataFrame = {
    require(window > 0 && stride > 0, s"window/stride must be positive")
    val nTok = size(col("toks"))
    val nChunks = (lit(1) +
      ceil(greatest(nTok - window, lit(0)).cast("double") / stride).cast("int"))
    graft.sources.Tables.fanout(docs)
      .select(col("doc_id"), toks(col("text")).as("toks"))
      .withColumn("toks", filter(col("toks"), t => t =!= ""))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        least(lit(window), size(col("toks")) - col("chunk_id") * stride)
          .cast("long").as("n_tok"),
        concat_ws(" ", slice(col("toks"), col("chunk_id") * stride + 1, lit(window)))
          .as("chunk_text"))
  }

  /** Declared query (q_redact): the fixture corpus is digit-free word
    * soup, so the query first synthesizes deterministic PII per row
    * (email, dotted IP, long id, dashed phone — all pure functions of
    * doc_id, identically constructed in the oracle) and then redacts
    * it — every row exercises all four patterns and the full redacted
    * text is hash-checked, not just counted. */
  /** The deterministic PII augmentation the digit-free fixture needs
    * so every pattern fires on real rows — shared by q_redact and
    * q_entities, identically spelled in both oracles. */
  private def piiAugmented(docs: DataFrame): DataFrame =
    graft.sources.Tables.fanout(docs).select(col("doc_id"),
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com ip 10."), (col("doc_id") % 256).cast("string"),
        lit(".0."), ((col("doc_id") * 7) % 256).cast("string"),
        lit(" id "), (col("doc_id") + 100000000L).cast("string"),
        lit(" phone 555-867-5309")).as("text"))

  def redactQ(docs: DataFrame): DataFrame =
    redactPii(piiAugmented(docs))
      .select("doc_id", "text", "n_email", "n_ip", "n_phone", "n_id")

  /** Typed entity inventory (q_entities) — the audit companion to
    * [[redactQ]]: where redaction destroys identifiers, the inventory
    * EXTRACTS them and aggregates corpus-wide — (kind, entity) →
    * (n_docs, n_occurrences). n_docs > 1 is the governance readout:
    * identifiers shared across documents (a leaked credential, one
    * phone number in every scraped page footer) are exactly what a
    * delete request must chase across the corpus (the [[Tombstones]]
    * family's discovery step). Each pattern extracts independently off
    * the ORIGINAL text (no sequential-replace order sensitivity — the
    * one semantic difference from redaction, declared).
    *
    * Scale shape: ONE corpus scan — all four regexp_extract_all arrays
    * are built and exploded inside a single codegen'd projection (a
    * per-pattern union would re-scan the corpus 4×) — then one
    * (kind, entity)-keyed aggregate; distinct-doc counting shuffles
    * (kind, entity, doc_id) triples, bounded by match count. */
  /** Per-document entity rows (doc_id, kind, entity, n_occ) — the one
    * extraction pass [[entitiesQ]] aggregates and [[EntityIndex]]
    * persists (per-doc rows are additive under doc-complete batches,
    * which is what makes the inventory incrementally maintainable). */
  private[ops] def entityRows(docs: DataFrame): DataFrame = {
    val kinds = Seq("email", "ip", "phone", "id").zip(PiiPatterns.map(_._1))
    piiAugmented(docs)
      .select(col("doc_id"), explode(flatten(array(kinds.map { case (k, p) =>
        transform(regexp_extract_all(col("text"), lit(p), lit(0)),
          e => struct(lit(k).as("kind"), e.as("entity")))
      }: _*))).as("ke"))
      .select(col("doc_id"), col("ke.kind").as("kind"), col("ke.entity").as("entity"))
      .groupBy(col("doc_id"), col("kind"), col("entity"))
      .agg(count(lit(1)).as("n_occ"))
  }

  def entitiesQ(docs: DataFrame): DataFrame =
    entityRows(docs)
      .groupBy(col("kind"), col("entity"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_occ")).as("n_occurrences"))

  /** C4-style heuristic line-filter battery (q_c4_filters) — the
    * rule-based cleaning pass of the C4/RefinedWeb lineage, applied at
    * line granularity with doc-level kill rules:
    *
    *  line rules (a line survives only if ALL hold):
    *   1. ends with terminal punctuation ('.')
    *   2. has ≥ 5 words
    *   3. does not contain the token "javascript"
    *  doc rules (first match wins, checked before line counting):
    *   4. any line contains "lorem ipsum"  → drop (reason lorem_ipsum)
    *   5. any line contains '{'            → drop (reason brace)
    *   6. fewer than 3 surviving lines     → drop (reason too_few_lines)
    *
    * The fixture corpus is punctuation-free word soup, so — like
    * [[redactQ]]'s PII synthesis — the query first builds a
    * deterministic line structure per document (6-token lines; a
    * terminal '.' on 3 of every 4 lines, a "javascript" token on every
    * 11th (doc, line) key, a lorem-ipsum line on every 37th doc, a
    * brace line on every 41st doc — all pure functions of (doc_id,
    * line_id), identically constructed in the oracle), so every rule
    * fires on real rows and the full verdict frame is hash-gated.
    *
    * Scale shape: pure per-row array expressions end-to-end — one
    * tokenize, the line build, the rule filters and the verdict all
    * happen inside a single codegen'd projection; no shuffle, no UDF,
    * no aggregate. The 100 TB form is embarrassingly parallel. */
  def c4FiltersQ(docs: DataFrame): DataFrame = {
    val toksA = filter(toks(col("text")), t => t =!= "")
    val nLines = ceil(size(col("__toks")).cast("double") / 6.0).cast("int")
    // guard: sequence(0, -1) would build a DESCENDING range (the
    // round-5 inverted-interval trap) — empty docs get an empty array
    val baseLines = when(size(col("__toks")) > 0,
      transform(sequence(lit(0), nLines - 1), i => {
        val line = concat_ws(" ", slice(col("__toks"), i * 6 + 1, lit(6)))
        val withJs = when((col("doc_id") * 31 + i) % 11 === 0,
          concat(line, lit(" javascript"))).otherwise(line)
        when((col("doc_id") + i) % 4 =!= 0, concat(withJs, lit(".")))
          .otherwise(withJs)
      })).otherwise(array().cast("array<string>"))
    val withLorem = when(col("doc_id") % 37 === 0,
      concat(col("__lines"), array(lit("lorem ipsum dolor sit amet."))))
      .otherwise(col("__lines"))
    val withBrace = when(col("doc_id") % 41 === 0,
      concat(col("__lines"), array(lit("function() { return 0; }."))))
      .otherwise(col("__lines"))
    val kept = filter(col("__lines"), l =>
      l.endsWith(".") && size(split(l, " ")) >= 5 && !l.contains("javascript"))
    graft.sources.Tables.fanout(docs)
      .select(col("doc_id"), toksA.as("__toks"))
      .withColumn("__lines", baseLines).drop("__toks")
      .withColumn("__lines", withLorem)
      .withColumn("__lines", withBrace)
      .withColumn("__kept", kept)
      .select(col("doc_id"),
        size(col("__lines")).cast("long").as("n_lines"),
        size(col("__kept")).cast("long").as("n_kept_lines"),
        when(exists(col("__lines"), l => l.contains("lorem ipsum")), lit("lorem_ipsum"))
          .when(exists(col("__lines"), l => l.contains("{")), lit("brace"))
          .when(size(col("__kept")) < 3, lit("too_few_lines"))
          .otherwise(lit("keep")).as("reason"),
        col("__kept").as("__kept"))
      .withColumn("keep", (col("reason") === "keep").cast("long"))
      .withColumn("cleaned_text",
        when(col("keep") === 1L, concat_ws(" ", col("__kept"))).otherwise(lit("")))
      .drop("__kept")
  }

  /** Per-source corpus data card (q_corpus_report) — the one-page
    * summary a curation run publishes per ingested source: document and
    * character volume, language spread, token budget, and the
    * exact-duplicate count (docs whose md5(text) occurs ≥ 2 times
    * CORPUS-wide — cross-source dups count in every source holding a
    * copy, which is the number a "which sources re-host content"
    * review wants).
    *
    * Scale shape: one corpus scan computes the per-row stats and the
    * content hash; the dup count is one short-key (hash) shuffle joined
    * back on the hash, then one partial+final per-source aggregate —
    * the same two-exchange budget exact dedup pays, and nothing wider
    * than a 16-byte key ever shuffles at data scale. */
  def corpusReportQ(docs: DataFrame): DataFrame = {
    val d = graft.sources.Tables.fanout(docs)
      .select(col("source"), col("lang"),
        length(col("text")).cast("long").as("n_chars"),
        nTokensWs(col("text")).cast("long").as("n_tok"),
        md5(col("text")).as("h"))
    val dupHashes = d.groupBy(col("h")).agg(count(lit(1)).as("n_h"))
    d.join(dupHashes, "h")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_tok")).as("total_tokens"),
        sum(when(col("n_h") > 1, 1L).otherwise(0L)).as("n_exact_dup"))
  }

  /** The Gopher document-quality rule battery (q_gopher_rules — Rae et
    * al. 2021, Appendix A): the doc-LEVEL companion to the line-level
    * [[c4FiltersQ]] and the ratio-scoring [[qualityScores]]. Five
    * rules, each emitted as its own flag so a curation run can audit
    * which rule fired before trusting the combined keep:
    *   word count ∈ [50, 100 000]; mean word length ∈ [3, 10];
    *   symbol-to-word ratio ('#' + '…'-as-'...') ≤ 0.1; ≥ 80% of words
    *   contain an alphabetic character; ≥ 2 distinct stop words from
    *   the published 8-word set.
    * Every threshold is evaluated in INTEGER cross-multiplied form
    * (3n ≤ Σlen ≤ 10n, 10·symbols ≤ n, 5·alpha ≥ 4·n) — no double
    * division anywhere, so the flags are exact in any engine and the
    * zero-word degenerate fails the bounds rules instead of dividing
    * by zero.
    *
    * Pure per-row codegen over one scan — no shuffle at any corpus
    * size (same posture as [[c4FiltersQ]]). */
  def gopherRulesQ(docs: DataFrame): DataFrame = {
    val stopSet = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val tk = filter(toks(col("text")), t => t =!= "")
    val nWords = col("n_words")
    val ellipses = (length(col("text"))
      - length(call_function("replace", col("text"), lit("..."), lit("")))) / 3
    val hashes = (length(col("text"))
      - length(call_function("replace", col("text"), lit("#"), lit(""))))
    docs
      .select(col("doc_id"), col("text"), tk.as("__tk"))
      .select(col("doc_id"),
        size(col("__tk")).cast("long").as("n_words"),
        aggregate(col("__tk"), lit(0L), (a, x) => a + length(x)).as("sum_word_len"),
        (ellipses + hashes).cast("long").as("n_symbols"),
        size(filter(col("__tk"), x => regexp_like(x, lit("[a-z]"))))
          .cast("long").as("n_alpha_words"),
        size(filter(array(stopSet.map(lit): _*),
          s => array_contains(col("__tk"), s))).cast("long").as("n_stop_hits"))
      .withColumn("r_word_count",
        (nWords >= 50L && nWords <= 100000L).cast("long"))
      .withColumn("r_mean_word_len",
        (col("sum_word_len") >= lit(3L) * nWords &&
          col("sum_word_len") <= lit(10L) * nWords && nWords > 0L).cast("long"))
      .withColumn("r_symbol_ratio",
        (lit(10L) * col("n_symbols") <= nWords && nWords > 0L).cast("long"))
      .withColumn("r_alpha_words",
        (lit(5L) * col("n_alpha_words") >= lit(4L) * nWords && nWords > 0L)
          .cast("long"))
      .withColumn("r_stopwords", (col("n_stop_hits") >= 2L).cast("long"))
      .withColumn("keep",
        (col("r_word_count") + col("r_mean_word_len") + col("r_symbol_ratio")
          + col("r_alpha_words") + col("r_stopwords") === 5L).cast("long"))
  }

  /** Flesch reading-ease per document (q_readability) — the classic
    * readability score, the quality-scoring family's "how hard is this
    * prose" axis next to [[textQualityQ]]'s ratio battery (education-
    * level filtering and curriculum bucketing both key on it).
    * Declared heuristics, mirrored exactly in the oracle: sentences =
    * runs of `[.!?]` (min 1 — headlines score as one sentence);
    * syllables = vowel-group runs `[aeiouy]+` over the lowercased text
    * (the standard cheap proxy; no dictionary). Score =
    * 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words),
    * rounded to 4 dp, then banded on the ROUNDED value so the band cut
    * is oracle-stable. Wordless docs get a null score and the 'empty'
    * band. Pure per-row codegen expressions — zero shuffle, map-side
    * over the document scan at any corpus size. */
  def readabilityQ(docs: DataFrame): DataFrame = {
    val nWords = size(filter(toks(col("text")), t => t =!= "")).cast("long")
    val nSents = greatest(
      regexp_count(col("text"), lit("[.!?]+")).cast("long"), lit(1L))
    val nSyll = regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long")
    graft.sources.Tables.fanout(docs)
      .select(col("doc_id"), nWords.as("n_words"), nSents.as("n_sentences"),
        nSyll.as("n_syllables"))
      .withColumn("flesch", when(col("n_words") > 0L,
        round(lit(206.835)
          - lit(1.015) * (col("n_words").cast("double") /
            col("n_sentences").cast("double"))
          - lit(84.6) * (col("n_syllables").cast("double") /
            col("n_words").cast("double")), 4)))
      .withColumn("band",
        when(col("flesch").isNull, lit("empty"))
          .when(col("flesch") >= 70.0, lit("easy"))
          .when(col("flesch") >= 50.0, lit("standard"))
          .when(col("flesch") >= 30.0, lit("difficult"))
          .otherwise(lit("very_difficult")))
  }

  /** Zipf's-law fit per corpus slice (q_zipf) — the rank–frequency
    * power-law readout (Zipf 1949): natural corpora show
    * ln(freq) ≈ intercept + slope·ln(rank) with slope ≈ −1; a slope
    * far from −1 or a low R² flags template/boilerplate or synthetic
    * sources the same way [[entropyQ]]'s collapsing entropy does, from
    * the complementary angle (shape of the distribution, not its
    * mass). OLS via the built-in `regr_*` aggregates over
    * (ln rank, ln count) with `minCount` suppressing the hapax tail
    * (where the discrete staircase breaks the power law and the type
    * table explodes).
    *
    * Scale shape: one corpus-sized tokenize+count shuffle to the
    * (slice, type) table, then the rank window sorts ONLY that
    * vocab-bounded table per slice (never the corpus), and the regr
    * aggregates reduce it to |slices| rows. regr_slope/r2 use stable
    * co-moment updates in both engines; rounding at 6 dp absorbs the
    * partial-aggregation order variance. */
  def zipfQ(docs: DataFrame, sliceCol: String = "source",
      minCount: Int = 5): DataFrame = {
    val counts = graft.sources.Tables.fanout(docs)
      .select(col(sliceCol).as("slice"),
        explode(filter(toks(col("text")), t => t =!= "")).as("token"))
      .groupBy(col("slice"), col("token"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
    val w = Window.partitionBy(col("slice"))
      .orderBy(col("c").desc, col("token").asc)
    val lnC = log(col("c").cast("double"))
    val lnR = log(col("rnk").cast("double"))
    counts.withColumn("rnk", row_number().over(w).cast("long"))
      .groupBy(col("slice"))
      .agg(count(lit(1)).as("n_types"),
        sum(col("c")).as("n_tokens"),
        round(regr_slope(lnC, lnR), 6).as("zipf_slope"),
        round(regr_intercept(lnC, lnR), 6).as("zipf_intercept"),
        round(regr_r2(lnC, lnR), 6).as("zipf_r2"))
  }

  /** Heaps'-law vocabulary-growth curve (q_heaps) — distinct-type
    * count as a function of tokens seen, in doc_id order, at
    * `nBuckets` checkpoints: the "is more data still buying new
    * vocabulary" readout that sizes tokenizer vocabularies and flags
    * corpus exhaustion (a flattening curve) or contamination by
    * synthetic repetition (a too-flat curve from the start).
    *
    * Scale shape — the reason this emits BUCKET checkpoints, not a
    * per-doc curve: a per-doc cumulative needs a global ordered window
    * (one task holding the corpus). Instead each token row maps to a
    * doc_id-range bucket (integer arithmetic, exact in both engines),
    * new-type credit lands on the bucket of the type's FIRST doc
    * (min(doc_id) per type — one vocab-bounded aggregate), and the
    * cumulative window runs over nBuckets rows — driver-trivial by
    * construction. All counts integer, zero FP in the gate. */
  def heapsQ(docs: DataFrame, nBuckets: Int = 100): DataFrame = {
    val d = graft.sources.Tables.fanout(docs)
    val mx = d.agg(max(col("doc_id")).as("max_id"))
    def bucketOf(idCol: String): Column =
      least(expr(s"$idCol * $nBuckets div (max_id + 1)"),
        lit(nBuckets - 1L)).cast("long")
    // ONE corpus scan → one token-keyed shuffle to the vocab-bounded
    // (token, bucket) table carrying both sufficient statistics (count
    // + min doc_id); the per-bucket totals and the first-seen credit
    // are cheap re-aggregations of THAT table, never the corpus again
    val grouped = PipelineCaches.track(
      d.select(col("doc_id"),
          explode(filter(toks(col("text")), t => t =!= "")).as("token"))
        .crossJoin(broadcast(mx))
        .groupBy(col("token"), bucketOf("doc_id").as("bucket"))
        .agg(count(lit(1)).as("c"), min(col("doc_id")).as("min_id")))
    val tokPerB = grouped.groupBy(col("bucket"))
      .agg(sum(col("c")).as("n_tok"))
    val firstB = grouped.groupBy(col("token"))
      .agg(min(col("min_id")).as("first_id"))
      .crossJoin(broadcast(mx))
      .groupBy(bucketOf("first_id").as("bucket"))
      .agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tokPerB.join(firstB, Seq("bucket"), "left")
      .na.fill(0L, Seq("n_new"))
      .select(col("bucket"),
        sum(col("n_tok")).over(w).as("cum_tokens"),
        sum(col("n_new")).over(w).as("cum_vocab"))
  }

  /** KMV (k-minimum-values) sketch overlap between corpus slices
    * (q_source_overlap_kmv) — the 100 TB branch of [[sourceOverlapQ]]:
    * the exact form shuffles the full (slice, token) vocabulary and
    * expands per-token slice pairs; this one reduces each slice to a
    * k-value sketch (Bar-Yossef et al. 2002, "Counting distinct
    * elements in a data stream") and estimates distinct counts, union
    * sizes, Jaccard and intersection from the sketches alone —
    * mergeable, bounded, and computed with a MAP-SIDE-COMBINE bounded
    * aggregate (the [[graft.functions.Aggregators.TopKAgg]] buffer
    * over negated hashes), so the one shuffle carries ≤ k rows per
    * slice no matter the corpus.
    *
    * Determinism: the hash is the 52-bit md5 prefix (13 nibbles —
    * exactly representable as Double, so the bounded buffer's score
    * ordering is lossless), identical to the oracle's
    * `('0x'||substr(md5(t),1,13))::BIGINT` spelling; the sketch, and
    * hence every estimate, is a pure function of the data — the gate
    * is a plain hash match, no probabilistic bound needed. The audit
    * columns n_a_hashes/n_b_hashes count DISTINCT 52-BIT PREFIXES, not
    * distinct tokens (round-14 ADVICE: at ~2^26-token vocabularies
    * birthday collisions start deflating them — the name says what the
    * number is; the oracle computes identically either way). Estimators:
    * union_est = (k−1)·2^52 / h_k over the merged
    * bottom-k (exact when the union has < k values); jaccard_est =
    * |bottom-k(A∪B) ∩ A ∩ B| / k_used; inter_est = jaccard·union.
    * Emits each unordered pair once (slice_a < slice_b; the pair join
    * is a broadcast theta-join over |slices| sketch rows). */
  def kmvOverlapQ(docs: DataFrame, sliceCol: String = "source",
      k: Int = 256): DataFrame = {
    import graft.functions.Aggregators.{Scored, TopKAgg}
    val spark = docs.sparkSession
    graft.functions.Md5Bits.register(spark)
    val two52 = 4503599627370496.0 // 2^52: hash space for the KMV estimator
    val hashed = graft.sources.Tables.fanout(docs)
      .select(col(sliceCol).as("slice"),
        explode(filter(toks(col("text")), t => t =!= "")).as("token"))
      .select(col("slice"),
        call_function(graft.functions.Md5Bits.FnName,
          col("token"), lit(0), lit(13)).as("th"))
      .distinct()
    val bottomK = udaf(new TopKAgg(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Scored]())
    // |slices| sketch rows read by BOTH sides of the pair join — the
    // tracked cache keeps the corpus at one scan
    val sigs = PipelineCaches.track(hashed
      .groupBy(col("slice"))
      .agg(bottomK(-col("th").cast("double"), col("th")).as("topk"),
        count(lit(1)).as("n_hashes")))
      // score desc = −th desc = th asc: tags come out ascending
      .select(col("slice"), transform(col("topk"), e => e("tag")).as("sig"),
        col("n_hashes"))
    val a = sigs.select(col("slice").as("slice_a"), col("sig").as("sig_a"),
      col("n_hashes").as("n_a_hashes"))
    val b = sigs.select(col("slice").as("slice_b"), col("sig").as("sig_b"),
      col("n_hashes").as("n_b_hashes"))
    a.join(broadcast(b), col("slice_a") < col("slice_b"))
      .withColumn("merged",
        slice(array_sort(array_union(col("sig_a"), col("sig_b"))), 1, k))
      .withColumn("k_used", size(col("merged")).cast("long"))
      .withColumn("n_match",
        size(array_intersect(array_intersect(col("merged"), col("sig_a")),
          col("sig_b"))).cast("long"))
      .withColumn("union_est",
        round(when(col("k_used") < k, col("k_used").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(two52) /
            element_at(col("merged"), k).cast("double")), 3))
      .withColumn("jaccard_est",
        round(col("n_match").cast("double") / col("k_used").cast("double"), 6))
      .withColumn("inter_est",
        round(col("jaccard_est") * col("union_est"), 3))
      .select(col("slice_a"), col("slice_b"), col("n_a_hashes"),
        col("n_b_hashes"), col("k_used"), col("n_match"), col("union_est"),
        col("jaccard_est"), col("inter_est"))
  }

  /** Jensen–Shannon divergence between per-slice unigram distributions
    * (q_source_drift) — the distribution-SHIFT audit next to
    * [[sourceOverlapQ]]'s set overlap and [[entropyQ]]'s within-slice
    * diversity: JS(P,Q) = H(M) − (H(P)+H(Q))/2 with M = (P+Q)/2,
    * bounded in [0, ln 2], symmetric, finite even on disjoint support —
    * the metric data-mixing weights and crawl-drift monitors key on
    * (a source whose JS against its previous snapshot jumps changed
    * content distribution, not just vocabulary).
    *
    * Decomposition that keeps everything relational (no per-pair
    * full-outer joins): Σ_union m·ln m splits into the COMMON-token sum
    * (both counts present — exactly [[sourceOverlapQ]]'s in-row C(s,2)
    * pair expansion, carrying counts) plus per-slice one-sided tails
    * Σ_t (p/2)·ln(p/2) over ALL of each slice's tokens, corrected by
    * subtracting the common rows' one-sided terms in the same pair
    * aggregate. So: ONE token-keyed shuffle for the pair rows, one
    * slice-keyed aggregate for the (S_half, H) scalars, broadcast
    * enrichment joins — |slices|²-bounded output, corpus scanned once.
    * Pairs sharing zero vocabulary are omitted (their JS is exactly
    * ln 2 by construction — same emission rule as sourceOverlapQ).
    * Entropies via the c·ln c identity (the [[entropyQ]] precedent);
    * 6-dp rounding absorbs summation-order variance. */
  def sourceDriftQ(docs: DataFrame, sliceCol: String = "source"): DataFrame = {
    val st = PipelineCaches.track(
      graft.sources.Tables.fanout(docs)
        .select(col(sliceCol).as("slice"),
          explode(filter(toks(col("text")), t => t =!= "")).as("token"))
        .groupBy(col("slice"), col("token"))
        .agg(count(lit(1)).as("c")))
    val sizes = st.groupBy(col("slice")).agg(sum(col("c")).as("n"))
    // per-slice scalars: S_half = Σ (p/2)·ln(p/2) over the slice's own
    // tokens (the one-sided tail of the mixture sum), H = ln n − Σ c·ln c / n
    val p = col("c").cast("double") / col("n").cast("double")
    val per = st.join(broadcast(sizes), Seq("slice"))
      .groupBy(col("slice"))
      .agg(max(col("n")).as("n"),
        sum((p / 2) * log(p / 2)).as("s_half"),
        (log(max(col("n")).cast("double")) -
          sum(col("c").cast("double") * log(col("c").cast("double"))) /
            max(col("n")).cast("double")).as("h"))
    // common tokens: the sourceOverlapQ in-row pair expansion, counts
    // riding the structs (slice unique per token-group, sort is total)
    val pairs = st.groupBy(col("token"))
      .agg(array_sort(collect_list(struct(col("slice"), col("c")))).as("ss"))
      .select(explode(flatten(transform(col("ss"), (a, i) =>
        transform(slice(col("ss"), i + 2, size(col("ss"))), b =>
          struct(a("slice").as("slice_a"), b("slice").as("slice_b"),
            a("c").as("ca"), b("c").as("cb")))))).as("pr"))
      .select(col("pr.slice_a"), col("pr.slice_b"), col("pr.ca"), col("pr.cb"))
      .join(broadcast(sizes.select(col("slice").as("slice_a"),
        col("n").as("n_a"))), Seq("slice_a"))
      .join(broadcast(sizes.select(col("slice").as("slice_b"),
        col("n").as("n_b"))), Seq("slice_b"))
    val pa = col("ca").cast("double") / col("n_a").cast("double")
    val pb = col("cb").cast("double") / col("n_b").cast("double")
    val m = (pa + pb) / 2
    // per-pair: Σ [ m·ln m − (pa/2)·ln(pa/2) − (pb/2)·ln(pb/2) ] over
    // common tokens; adding back S_half_a + S_half_b yields Σ_union m·ln m
    val d = pairs
      .groupBy(col("slice_a"), col("slice_b"))
      .agg(count(lit(1)).as("n_common_types"),
        sum(m * log(m) - (pa / 2) * log(pa / 2) -
          (pb / 2) * log(pb / 2)).as("dd"))
    val js = -(col("dd") + col("s_a") + col("s_b")) -
      (col("h_a") + col("h_b")) / 2
    d.join(broadcast(per.select(col("slice").as("slice_a"),
        col("n").as("n_a"), col("s_half").as("s_a"), col("h").as("h_a"))),
        Seq("slice_a"))
      .join(broadcast(per.select(col("slice").as("slice_b"),
        col("n").as("n_b"), col("s_half").as("s_b"), col("h").as("h_b"))),
        Seq("slice_b"))
      .select(col("slice_a"), col("slice_b"), col("n_a"), col("n_b"),
        col("n_common_types"),
        round(js, 6).as("js_nats"),
        round(js / math.log(2.0), 6).as("js_bits"))
  }

  /** Consecutive-duplicate-token collapse (q_collapse_repeats) — the
    * stutter cleanup OCR/ASR-sourced corpora run before tokenization:
    * a run of k identical adjacent tokens collapses to one ("the the
    * the" → "the"), non-adjacent repeats untouched (that is
    * [[repetitionScores]]' territory). A transform, not a filter: the
    * cleaned text is the output, with before/after counts so the
    * caller can audit how much was stutter.
    *
    * Pure per-row array expressions — tokenize, keep token i iff it is
    * the first or differs from token i−1 (the index-aware lambda
    * `filter`, codegen'd), re-join. NO shuffle anywhere: the operator
    * is map-side over the document scan at any corpus size, the ideal
    * 100 TB shape. Empty/whitespace-only docs pass through with zero
    * counts. */
  def collapseRepeatsQ(docs: DataFrame): DataFrame = {
    val tokArr = filter(toks(col("text")), t => t =!= "")
    docs
      .select(col("doc_id"), tokArr.as("tk"))
      .select(col("doc_id"),
        col("tk"),
        // element_at is 1-based, so position i IS the previous token of
        // 0-based lambda index i; the greatest() guard keeps the index
        // legal at i = 0 (OR does not short-circuit in codegen — an
        // element_at(tk, 0) would throw INVALID_ARRAY_INDEX), where the
        // i === 0 arm decides anyway
        filter(col("tk"), (t, i) =>
          (i === 0) || (t =!= element_at(col("tk"), greatest(i, lit(1))))).as("kept"))
      .select(col("doc_id"),
        size(col("tk")).cast("long").as("n_tokens"),
        size(col("kept")).cast("long").as("n_kept"),
        concat_ws(" ", col("kept")).as("clean_text"))
  }
}
