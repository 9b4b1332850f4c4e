package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-split operators for training pipelines: deterministic,
  * engine-portable hash splits, and the leakage-free variant where an
  * exact-duplicate cluster never straddles splits.
  *
  * Both are pure column expressions over a 60-bit md5 hash (the same
  * portable hash idiom as the dedup family, mirrored in the oracle), so
  * a split is a property of the DATA, not of a run: any engine, any
  * partitioning, any day reproduces the identical assignment — the
  * invariant that makes held-out sets trustworthy across pipeline
  * versions. Scale shape: hashSplit is map-side only; leakFreeSplit
  * adds one shuffle on the normalized-text hash (window-min for the
  * cluster representative — no join, no second corpus scan, no
  * broadcast needed at any corpus size).
  */
object Sampling {

  /** Portable 60-bit hash of an id, salted to decouple from other md5
    * uses of the same value. */
  private def saltedHash(c: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), c.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  private def idHash(c: Column): Column = saltedHash(c, "split:")

  private def bucketToSplit(bucket: Column, trainPct: Int, validPct: Int): Column =
    when(bucket < trainPct, lit("train"))
      .when(bucket < trainPct + validPct, lit("valid"))
      .otherwise(lit("test"))

  /** (doc_id, bucket, split): deterministic hash assignment into
    * train/valid/test with the declared percentage cut lines. */
  def hashSplit(docs: DataFrame, trainPct: Int = 90, validPct: Int = 5): DataFrame =
    docs.select(col("doc_id"), pmod(idHash(col("doc_id")), lit(100)).as("bucket"))
      .withColumn("split", bucketToSplit(col("bucket"), trainPct, validPct))

  /** (doc_id, norm_hash, bucket, split), where the assignment is keyed
    * on the exact-dup CLUSTER representative (min doc_id of the
    * whitespace-normalized text group, the same normalization as
    * [[Dedup.exactDedup]]): every duplicate of a document lands in the
    * same split. Splitting by raw doc id leaks duplicated text across
    * the train/valid boundary — the classic evaluation contamination. */
  def leakFreeSplit(docs: DataFrame, trainPct: Int = 90, validPct: Int = 5): DataFrame = {
    // null text coalesces to '' BEFORE hashing: assignment must be total
    // (a null norm_hash would silently drop the doc from an equi-join,
    // and the null-text "cluster" belongs in one split like any other).
    // Cluster representative via window-min rather than groupBy+rejoin:
    // one corpus scan and one shuffle instead of two of each — at 100 TB
    // the normalization md5 over every row is the dominant map cost and
    // must not run twice.
    val hashed = docs.select(col("doc_id"),
      md5(lower(trim(regexp_replace(coalesce(col("text"), lit("")), "\\s+", " "))))
        .as("norm_hash"))
    hashed
      .withColumn("rep_id", min(col("doc_id")).over(Window.partitionBy(col("norm_hash"))))
      .select(col("doc_id"), col("norm_hash"),
        pmod(idHash(col("rep_id")), lit(100)).as("bucket"))
      .withColumn("split", bucketToSplit(col("bucket"), trainPct, validPct))
  }

  /** Declared query q_split: per-split doc and cluster counts under the
    * leak-free assignment — the summary a pipeline logs when cutting a
    * dataset. */
  def splitQ(docs: DataFrame): DataFrame =
    leakFreeSplit(docs)
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("norm_hash")).as("n_clusters"))

  /** Deterministic subsample at `fraction` ∈ [0, 1]: keep rows whose
    * salted id hash falls under the threshold. Map-side only,
    * reproducible across engines/partitionings, and MONOTONE in the
    * fraction (a 25% sample is a subset of the 50% sample under the
    * same salt) — the property that lets a pipeline grow a data mix
    * without reshuffling what it already trained on. */
  def sampleByHash(df: DataFrame, fraction: Double, idCol: String = "doc_id",
      salt: String = "mix:0:"): DataFrame = {
    // NaN fails both comparisons → caught here instead of silently
    // sampling zero rows (a NaN weight upstream would otherwise drop an
    // entire source from a training mix without a trace)
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0, 1], got $fraction")
    df.filter(pmod(saltedHash(col(idCol), salt), lit(1000000L))
      < math.round(fraction * 1e6))
  }

  /** Deterministic weighted mixture — the data-mixing step of a
    * pretraining pipeline. A weight w contributes ⌊w⌋ full copies of
    * the source (epoch multipliers: w = 2.0 means every row twice)
    * plus a deterministic fractional draw of the remainder under a
    * per-source salt; w = 0 contributes nothing. Entirely map-side
    * (no shuffle anywhere). */
  def mixture(sources: Seq[(DataFrame, Double)], idCol: String = "doc_id"): DataFrame = {
    require(sources.nonEmpty, "mixture needs at least one source")
    sources.zipWithIndex.map { case ((df, weight), i) =>
      require(weight >= 0.0 && !weight.isNaN && !weight.isInfinite,
        s"source $i: weight must be finite and >= 0, got $weight")
      val whole = weight.toInt
      val fracPart = weight - whole
      val parts = Seq.fill(whole)(df) ++
        (if (fracPart > 0) Seq(sampleByHash(df, fracPart, idCol, s"mix:$i:")) else Nil)
      if (parts.isEmpty) df.limit(0) else parts.reduce(_ unionByName _)
    }.reduce(_ unionByName _)
  }

  /** Per-stratum deterministic hash sampling — downsample over-represented
    * strata (languages, sources, quality tiers) at different rates in ONE
    * map-side pass. The hash is salted with the stratum value, so each
    * stratum's draw is an independent sequence and, like [[sampleByHash]],
    * MONOTONE per stratum: raising one stratum's fraction only adds rows,
    * never reshuffles another stratum's draw — a training mix can be
    * re-balanced incrementally. Thresholds are integers in millionths
    * (computed once on the driver), so assignment is exact integer
    * comparison in every engine. No shuffle anywhere. */
  def stratifiedSampleByHash(df: DataFrame, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      idCol: String = "doc_id"): DataFrame = {
    (fractions.values.toSeq :+ defaultFraction).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fractions must be in [0, 1], got $f"))
    // null strata coalesce to '' for BOTH the threshold lookup and the
    // hash: a null would otherwise null-propagate through the hash and
    // silently drop the row regardless of defaultFraction — assignment
    // must be total (the same rule as leakFreeSplit's null text)
    val stratum = coalesce(col(strataCol).cast("string"), lit(""))
    val thr = fractions.foldLeft(lit(math.round(defaultFraction * 1e6)): Column) {
      case (e, (k, v)) => when(stratum === k, lit(math.round(v * 1e6))).otherwise(e)
    }
    df.filter(
      pmod(saltedHash(concat(stratum, lit(":"), col(idCol).cast("string")), "strat:"),
        lit(1000000L)) < thr)
  }

  /** Declared query q_sample_stratified: per-language size summary of a
    * stratified draw (en half, de quarter, everything else 10%) — the
    * language-rebalancing step of a multilingual pretraining mix. */
  def stratifiedQ(docs: DataFrame): DataFrame =
    stratifiedSampleByHash(docs, "lang", Map("en" -> 0.5, "de" -> 0.25), 0.1)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).cast("long").as("total_chars"))

  /** Deterministic training-shard assignment: `shard` = salted id hash
    * mod nShards (balanced, reproducible), `order_key` = an independent
    * salted hash giving each shard a deterministic SHUFFLED read order —
    * training wants documents randomized, not in crawl order, and a
    * hash order is the same "random" permutation on every engine and
    * every rerun. Map-side only. */
  def assignShards(docs: DataFrame, nShards: Int = 16, idCol: String = "doc_id"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    docs
      .withColumn("shard", pmod(saltedHash(col(idCol), "shard:"), lit(nShards.toLong)))
      .withColumn("order_key", saltedHash(col(idCol), "order:"))
  }

  /** Materialize [[assignShards]] as `shard=K/` parquet directories with
    * rows stored in order_key order — the shard-writing step of a
    * training-data export. One shuffle (repartition on the shard value co-
    * locates each shard) + an in-partition sort; the partitioned write then
    * splits directories without further movement. Shards far exceed
    * executor memory at 100 TB only per-partition-sort-wise, which spills;
    * raise nShards so a shard fits a task's spill budget. */
  def writeShards(docs: DataFrame, dir: String, nShards: Int = 16,
      idCol: String = "doc_id"): Unit =
    assignShards(docs, nShards, idCol)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("order_key"))
      .write.mode("overwrite").option("partitionOverwriteMode", "static").partitionBy("shard").parquet(dir)

  /** Declared query q_shard: per-shard summary (size, boundary order
    * keys, bytes) of the deterministic assignment — what an export job
    * logs per shard, and exactly the frame [[writeShards]] materializes. */
  def shardQ(docs: DataFrame): DataFrame =
    assignShards(docs)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("order_key")).as("first_key"),
        max(col("order_key")).as("last_key"),
        sum(length(col("text"))).cast("long").as("total_chars"))

  /** Sequence packing — the concat-and-chunk step of a pretraining
    * pipeline: documents are laid out in the deterministic shard order
    * of [[assignShards]] and cut into fixed `tokenBudget` training
    * sequences; each document is assigned to the sequence (`bin`)
    * containing its START offset (GPT-style packing, where a document
    * may straddle two sequences). Per-shard prefix sums over the hash
    * order make the layout a pure property of the data — any engine
    * reproduces byte-identical packing, so sequence ids are stable
    * across reruns and engines.
    *
    * Scale shape — prefix-sum parallelism is INDEPENDENT of the shard
    * count (a per-shard window would serialize each shard's entire
    * token stream on one task): order_key is uniform on [0, 2^60) by
    * construction, so each shard's stream splits into `subSplits`
    * order-aligned slices by PURE ARITHMETIC on the key — the range
    * exchange that normally needs a sampling pass is a map-side floor
    * division here. Local prefix sums run per (shard, sub) slice
    * (parallelism = nShards × subSplits); per-slice token totals are a
    * METADATA-sized aggregate (≤ nShards·subSplits rows) whose
    * prefix-over-sub gives each slice's global start offset,
    * broadcast-joined back — the two-phase distributed prefix-sum
    * shape q_quantile uses, minus the sampling. Equal order keys land
    * in the same slice (sub is a function of the key), so the
    * (order_key, id) tie-break stays inside one window. The one
    * shuffle carries (id, shard, sub, key, tokens) — never text. */
  def packSequences(docs: DataFrame, tokenBudget: Int = 512,
      nShards: Int = 16, idCol: String = "doc_id", subSplits: Int = 0): DataFrame =
    packSequencesOn(docs,
      size(split(lower(trim(col("text"))), "\\s+")).cast("long"),
      tokenBudget, nShards, idCol, subSplits)

  /** [[packSequences]] generalized over the per-row token-count
    * expression — the seam [[graft.ops.Bpe.tokenizePackQ]] uses to
    * pack ENCODED (post-BPE) lengths instead of whitespace counts. */
  def packSequencesOn(docs: DataFrame, tokCount: Column,
      tokenBudget: Int = 512, nShards: Int = 16, idCol: String = "doc_id",
      subSplits: Int = 0): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    val spark = docs.sparkSession
    // default: ~2 slices per core across all shards, floor 1 per shard
    val k = math.max(1, if (subSplits > 0) subSplits
      else 2 * spark.sparkContext.defaultParallelism / nShards)
    val chunk = math.max(1L, (1L << 60) / k)
    val sharded = assignShards(docs, nShards, idCol)
      .withColumn("n_tok", tokCount.cast("long"))
      .withColumn("sub", floor(col("order_key") / chunk).cast("long"))
    val w = Window.partitionBy(col("shard"), col("sub"))
      .orderBy(col("order_key").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // cached because both the offsets aggregate and the final join
    // consume it — uncached, the window (and the md5 shard assignment
    // below it) would execute twice; released by the caller via
    // PipelineCaches (the same lifetime contract as exactPercentiles)
    val local = PipelineCaches.track(
      sharded.withColumn("lcum", sum(col("n_tok")).over(w)))
    // per-slice totals + prefix over sub within shard: tiny frame, so
    // the window here is metadata work; exclusive prefix (sum over
    // PRECEDING slices) is each slice's global token start
    val offs = local.groupBy(col("shard"), col("sub"))
      .agg(sum(col("n_tok")).as("stot"))
      .withColumn("soff", coalesce(sum(col("stot")).over(
        Window.partitionBy(col("shard")).orderBy(col("sub").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("shard").as("__sh"), col("sub").as("__sb"), col("soff"))
    local
      .join(broadcast(offs),
        col("shard") === col("__sh") && col("sub") === col("__sb"))
      .withColumn("start", col("soff") + col("lcum") - col("n_tok"))
      .select(col(idCol), col("shard"), col("n_tok"),
        floor(col("start") / tokenBudget.toDouble).as("bin"),
        (col("start") % tokenBudget).as("offset"))
  }

  /** Declared query q_pack: per-shard packing summary (docs, tokens,
    * sequence count, last sequence id) — what a packing job logs per
    * output shard, with every bin assignment participating in the hash
    * through the distinct-bin count. */
  def packQ(docs: DataFrame): DataFrame =
    packSequences(docs)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        count_distinct(col("bin")).as("n_seqs"),
        max(col("bin")).as("last_seq"))

  /** Declared query q_sample: size summary of the deterministic 50%
    * draw (the cross-engine-reproducible subsample a pipeline logs). */
  def sampleQ(docs: DataFrame): DataFrame =
    sampleByHash(docs, 0.5)
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).cast("long").as("total_chars"))

  /** Declared query q_mixture: per-source size summary of a weighted
    * [[mixture]] over two disjoint document sources (even ids at weight
    * 2.5 = two epochs + a deterministic half-draw; odd ids at 0.25).
    * The mixture is fully deterministic (salted hash thresholds + whole
    * epoch copies), so the oracle reproduces it exactly — the declared
    * check the weighted-mixing step of a pretraining pipeline needs. */
  def mixtureQ(docs: DataFrame): DataFrame = {
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    mixture(Seq(even -> 2.5, odd -> 0.25))
      .groupBy((col("doc_id") % 2).as("src"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).cast("long").as("total_chars"))
  }

  /** Temperature-flattened (α = 0.5) source rebalancing — the
    * multilingual alpha-sampling step (mBERT/XLM-R style): flatten the
    * per-stratum size distribution toward n^α so over-represented
    * sources stop dominating the mix. Anchored at the SMALLEST stratum
    * (kept whole): stratum s samples at rate √(n_min / n_s), giving
    * expected sizes √(n_s·n_min) = n_s^α·n_min^(1−α). The anchor form
    * needs NO normalizing sum over strata — one division and one
    * `Math.sqrt` per stratum, both IEEE-exact and correctly rounded, so
    * the driver-side fractions are bit-identical to any engine
    * replaying the same arithmetic (a Σ√n normalizer would be
    * summation-order-sensitive and break the oracle hash).
    *
    * The count collect is METADATA-sized (|strata| rows — languages or
    * sources, not documents); the draw itself is [[stratifiedSampleByHash]]
    * — map-side, per-stratum monotone, no shuffle. */
  def temperatureFractions(df: DataFrame, strataCol: String = "source"): Map[String, Double] = {
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol).cast("string")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "temperatureFractions needs a non-empty corpus")
    val nMin = counts.values.min.toDouble
    counts.map { case (k, n) => k -> math.sqrt(nMin / n) }
  }

  /** Declared query q_sample_temp: per-LANGUAGE sizes of the
    * temperature-rebalanced corpus (the stratum that is actually skewed
    * — `source` is generator-uniform, so rebalancing it would be a
    * no-op). The smallest language survives whole (rate 1); every
    * larger one lands at ≈ √(n_s·n_min) docs — English stops dominating
    * the mix. */
  def temperatureQ(docs: DataFrame): DataFrame =
    // null-stratum docs are EXCLUDED, matching temperatureFractions'
    // counts (and the oracle's inner join): without the filter,
    // stratifiedSampleByHash would coalesce a null lang onto the ''
    // stratum and sample it at a rate derived from ''-keyed counts
    // that never saw those rows
    stratifiedSampleByHash(docs.filter(col("lang").isNotNull),
        "lang", temperatureFractions(docs, "lang"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).cast("long").as("total_chars"))

  /** Declared query q_sample_k: EXACT-k deterministic sample per
    * stratum — "give me exactly 50 documents per language, the same 50
    * on any engine, any day". Rate-based draws ([[stratifiedSampleByHash]])
    * hit a target in expectation only; exact quotas need the k
    * smallest-hash rows per stratum, which is per-group top-k — ridden
    * here on the BOUNDED-BUFFER [[graft.functions.Aggregators.TopKAgg]]
    * (map-side partial top-k: the shuffle carries ≤ k·|strata| rows no
    * matter the corpus size, vs a rank-filter window sorting every
    * stratum's full row set through one exchange).
    *
    * The rank hash is 44 bits (11 md5 nibbles), exactly representable
    * in the aggregate's double score, so `-hash` as score + tag-asc
    * tie-break reproduces "order by hash asc, doc_id asc" bit-for-bit
    * in any engine — the portability invariant all sampling here
    * keeps. */
  def sampleExactKQ(docs: DataFrame, k: Int = 50): DataFrame = {
    val rank = conv(substring(md5(concat(lit("sk:"),
        col("doc_id").cast("string"))), 1, 11), 16, 10).cast("long")
    val fn = udaf(new graft.functions.Aggregators.TopKAgg(k),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[graft.functions.Aggregators.Scored]())
    graft.sources.Tables.fanout(docs)
      .filter(col("lang").isNotNull)
      .select(col("lang"), col("doc_id"), (-rank.cast("double")).as("score"))
      .groupBy(col("lang"))
      .agg(fn(col("score"), col("doc_id")).as("top"))
      .select(col("lang"), posexplode(col("top")))
      .select(col("lang"), (col("pos") + 1).cast("long").as("rnk"),
        col("col.tag").as("doc_id"))
  }

  /** Declared query q_sample_weighted: WEIGHTED exact-k per-stratum
    * sampling without replacement (Efraimidis–Spirakis A-ES) — "k docs
    * per source, longer documents proportionally more likely", the
    * quality/length-biased quota draw of a mixture build. Each row
    * draws the deterministic 44-bit hash uniform u and ranks by
    * key = ln(u)/w (w = n_chars): taking the k LARGEST keys per stratum
    * is exactly A-ES's top-k by u^(1/w) (ln is monotone), giving each
    * row inclusion probability proportional to its weight.
    *
    * Engine portability: u = (H + 0.5)/2^44 is exact in a double (a
    * 44-bit integer and a power-of-two division), so the only
    * implementation-defined step is `ln` itself (both engines are
    * ≤1-ulp libm); the key is rounded to 6 dp as DECLARED semantics —
    * the [[graft.ops.TextOps]] q_pmi rounded-score-cut convention — so
    * the cut point is a 1e-6 grid where a sub-ulp libm disagreement
    * cannot reorder rows, and grid ties break by doc_id on both
    * engines (TopKAgg's score-then-tag order IS the oracle's
    * `key DESC, doc_id ASC`). `+ 0.0` normalizes a rank-1 −0.0 key.
    *
    * Scale shape: identical to [[sampleExactKQ]] — one map-side pass,
    * the BOUNDED-BUFFER top-k aggregate, shuffle ≤ k·|strata| rows. */
  def sampleWeightedKQ(docs: DataFrame, k: Int = 10): DataFrame = {
    val h = conv(substring(md5(concat(lit("ws:"),
        col("doc_id").cast("string"))), 1, 11), 16, 10).cast("long")
    val u = (h.cast("double") + lit(0.5)) / lit(17592186044416.0) // 2^44
    val key = round(log(u) / col("n_chars").cast("double"), 6)
    val fn = udaf(new graft.functions.Aggregators.TopKAgg(k),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[graft.functions.Aggregators.Scored]())
    graft.sources.Tables.fanout(docs)
      .filter(col("source").isNotNull && col("n_chars") > 0)
      .select(col("source"), col("doc_id"), key.as("score"))
      .groupBy(col("source"))
      .agg(fn(col("score"), col("doc_id")).as("top"))
      .select(col("source"), posexplode(col("top")))
      .select(col("source"), (col("pos") + 1).cast("long").as("rnk"),
        col("col.tag").as("doc_id"),
        (col("col.score") + lit(0.0)).as("key"))
  }

  /** Quality-tier-major curriculum ordering — the training-order step
    * of a curriculum-learning pipeline: documents are ranked best-tier
    * first (tier from the stopword-ratio quality grid: ≥ 0.15 → 0,
    * ≥ 0.05 → 1, else 2), within a tier in the deterministic
    * hash-shuffled order of [[assignShards]] — so the global position
    * is a pure property of the data: any engine replays the identical
    * curriculum, and a training run can resume mid-stream by position.
    *
    * Returns per doc: tier, 0-based global `pos`, and 0-based global
    * token `start` offset (the exclusive prefix sum of n_tok in
    * curriculum order — [[tokenBudgetQ]]'s selection key).
    *
    * Scale shape — the [[packSequences]] slice discipline, keyed by
    * (tier, sub): the order hash is uniform on [0, 2^60), so each
    * tier's stream splits into order-aligned slices by PURE ARITHMETIC
    * on the key (no sampling range exchange), local rank and token
    * prefix run per slice (parallelism = 3 tiers × subSplits), slice
    * totals are a METADATA-sized aggregate whose within-tier prefix
    * gives slice offsets, and the ≤ 3 tier totals fold into ONE row of
    * conditional sums (broadcast — no global-order window anywhere).
    * The one data shuffle carries (doc_id, tier, ok, n_tok), never
    * text. */
  def curriculumRanked(docs: DataFrame, subSplits: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    val k = math.max(1, if (subSplits > 0) subSplits
      else 2 * spark.sparkContext.defaultParallelism / 3)
    val chunk = math.max(1L, (1L << 60) / k)
    val tk = split(lower(trim(col("text"))), "\\s+")
    // the ONE quality-signal definition (TextOps.stopwordRatio): the
    // curriculum tiers must not drift from the quality queries
    val ratio = TextOps.stopwordRatio(col("text"))
    val base = graft.sources.Tables.fanout(docs).select(col("doc_id"),
        saltedHash(col("doc_id"), "order:").as("ok"),
        size(tk).cast("long").as("n_tok"),
        when(ratio >= 0.15, lit(0L)).when(ratio >= 0.05, lit(1L))
          .otherwise(lit(2L)).as("tier"))
      .withColumn("sub", floor(col("ok") / chunk).cast("long"))
    val w = Window.partitionBy(col("tier"), col("sub"))
      .orderBy(col("ok").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // cached: the slice-stats aggregate and the final join both consume
    // it (same lifetime contract as packSequences — caller releases)
    val local = PipelineCaches.track(base
      .withColumn("lrn", count(lit(1)).over(w))
      .withColumn("ltok", sum(col("n_tok")).over(w)))
    // slice totals: ≤ 3·k rows — metadata; within-tier prefix windows
    // run over this tiny frame only
    val stats = local.groupBy(col("tier"), col("sub"))
      .agg(count(lit(1)).as("cnt_s"), sum(col("n_tok")).as("tok_s"))
    val inTier = Window.partitionBy(col("tier")).orderBy(col("sub").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = stats
      .withColumn("off", sum(col("cnt_s")).over(inTier) - col("cnt_s"))
      .withColumn("toff", sum(col("tok_s")).over(inTier) - col("tok_s"))
      .select(col("tier").as("__tier"), col("sub").as("__sub"),
        col("off"), col("toff"))
    // tier-level offsets as ONE row of conditional sums: tier 2's
    // offset = c0 + c1 etc. — no empty-partition-spec global window
    val tierTot = stats.agg(
      coalesce(sum(when(col("tier") === 0L, col("cnt_s"))), lit(0L)).as("c0"),
      coalesce(sum(when(col("tier") === 1L, col("cnt_s"))), lit(0L)).as("c1"),
      coalesce(sum(when(col("tier") === 0L, col("tok_s"))), lit(0L)).as("t0"),
      coalesce(sum(when(col("tier") === 1L, col("tok_s"))), lit(0L)).as("t1"))
    local
      .join(broadcast(offs),
        col("tier") === col("__tier") && col("sub") === col("__sub"))
      .crossJoin(broadcast(tierTot))
      .select(col("doc_id"), col("tier"), col("n_tok"),
        (when(col("tier") === 0L, lit(0L)).when(col("tier") === 1L, col("c0"))
          .otherwise(col("c0") + col("c1")) +
          col("off") + col("lrn") - 1L).as("pos"),
        (when(col("tier") === 0L, lit(0L)).when(col("tier") === 1L, col("t0"))
          .otherwise(col("t0") + col("t1")) +
          col("toff") + col("ltok") - col("n_tok")).as("start"))
  }

  /** Declared query q_curriculum: the per-doc curriculum assignment —
    * tier, global position, and the training step (batch index at
    * batch size 32) the document lands in. Fully deterministic, so the
    * whole frame hash-gates against the oracle's single row_number
    * spelling. */
  def curriculumQ(docs: DataFrame): DataFrame =
    curriculumRanked(docs)
      .select(col("doc_id"), col("tier"), col("pos"),
        floor(col("pos") / 32.0).cast("long").as("step"))

  /** Declared query q_token_budget: greedy data selection under a
    * total token budget — "train on the best 60% of the corpus's
    * tokens": documents are taken in curriculum order until the budget
    * is exhausted (a doc is selected iff its whole token span fits:
    * start + n_tok ≤ ⌊0.6·total⌋). The budget derives from the corpus
    * itself (one-row aggregate, broadcast scalar), so the query is
    * scale-invariant — at any corpus size the cut lands mid-corpus.
    * Emits the per-tier selection summary a curation run logs. */
  def tokenBudgetQ(docs: DataFrame): DataFrame = {
    val ranked = curriculumRanked(docs)
    val budget = ranked.agg(
      floor(sum(col("n_tok")).cast("double") * 0.6).cast("long").as("b"))
    ranked.crossJoin(broadcast(budget))
      .filter(col("start") + col("n_tok") <= col("b"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        max(col("pos")).as("last_pos"))
  }

  /** Declared query q_split_leak_audit: the evaluation-contamination
    * audit — how many NEAR-dup pairs straddle a train/valid/test
    * boundary under (a) the naive per-doc hash split and (b) the
    * NEAR-dup-cluster split (assignment keyed on the connected-
    * component label over the same pair list, singletons on their own
    * id). The cluster scheme's cross count is zero BY CONSTRUCTION —
    * the audit proves it end-to-end (components ∘ assignment ∘ pair
    * join agree), while the naive row reports the leak rate a dataset
    * card should publish before anyone trusts a held-out score.
    * ([[leakFreeSplit]]'s exact-dup scheme is not the comparator here:
    * the fixture corpus has no exact duplicates, so it would read
    * identically to the naive row — vacuous.)
    *
    * Scale shape: the pair list is the banded near-dup pipeline
    * (never all-pairs); the two assignment frames are map-side hash
    * expressions joined to the pairs on narrow doc-id keys; each audit
    * is one count/conditional-sum aggregate. The pair frame is tracked
    * (two consumers). */
  def splitLeakAuditQ(docs: DataFrame): DataFrame = {
    val pairs = PipelineCaches.track(
      Dedup.nearDupPairs(docs).select(col("doc_a"), col("doc_b")))
    val clusters = Components
      .connectedComponents(pairs, "doc_a", "doc_b")
    // ONE assignment frame carries BOTH schemes' splits, so the pair
    // list joins its two sides exactly once and a single aggregate
    // produces both audit rows (explode of a 2-struct array) — half
    // the join work of auditing the schemes separately
    val asg = docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        bucketToSplit(pmod(idHash(col("doc_id")), lit(100)), 90, 5).as("s_naive"),
        bucketToSplit(pmod(idHash(coalesce(col("cluster"), col("doc_id"))),
          lit(100)), 90, 5).as("s_cluster"))
    val a = asg.select(col("doc_id").as("doc_a"),
      col("s_naive").as("na"), col("s_cluster").as("ca"))
    val b = asg.select(col("doc_id").as("doc_b"),
      col("s_naive").as("nb"), col("s_cluster").as("cb"))
    pairs.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum((col("na") =!= col("nb")).cast("long")).as("x_naive"),
        sum((col("ca") =!= col("cb")).cast("long")).as("x_cluster"))
      .select(explode(array(
        struct(lit("naive_hash").as("scheme"), col("n_pairs"),
          col("x_naive").as("n_cross")),
        struct(lit("cluster").as("scheme"), col("n_pairs"),
          col("x_cluster").as("n_cross")))).as("r"))
      .select(col("r.scheme").as("scheme"), col("r.n_pairs").as("n_pairs"),
        col("r.n_cross").as("n_cross"),
        round(col("r.n_cross").cast("double") /
          nullif(col("r.n_pairs"), lit(0L)), 6).as("leak_rate"))
  }

  /** Declared query q_domain_cap: per-domain document cap — the
    * CommonCrawl-pipeline governance step that stops one dominant host
    * from swamping a training mix ("keep at most k docs per domain,
    * best first"). Domain is the canonical host of the doc's URL (here
    * the urlDedupQ synthesis: source host on example.com); "best" is
    * n_chars DESC with doc_id ASC tie-break — deterministic, engine-
    * portable, no hash involved.
    *
    * Scale shape: ONE aggregate on the domain key doing both jobs —
    * the BOUNDED-BUFFER top-k (shuffle ≤ k rows per domain out of every
    * map task) and the pre-cap volume count the governance report needs.
    * The rank-window spelling would exchange and sort every domain's
    * full row set; this ships k·|domains| + one count, independent of
    * corpus size, and a hot domain (the exact case the cap exists for)
    * never concentrates more than k rows on the final aggregate. */
  def domainCapQ(docs: DataFrame, k: Int = 3): DataFrame = {
    val fn = udaf(new graft.functions.Aggregators.TopKAgg(k),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[graft.functions.Aggregators.Scored]())
    // no fanout: the map side is metadata-cheap (no tokenize/md5), so
    // the plan stays scan → partial top-k → ONE domain exchange → final
    docs
      .select(concat(lower(col("source")), lit(".example.com")).as("domain"),
        col("doc_id"), col("n_chars"))
      .groupBy(col("domain"))
      .agg(fn(col("n_chars").cast("double"), col("doc_id")).as("top"),
        count(lit(1)).as("n_docs"))
      .select(col("domain"), col("n_docs"), posexplode(col("top")))
      .select(col("domain"), col("n_docs"),
        (col("pos") + 1).cast("long").as("rnk"),
        col("col.tag").as("doc_id"),
        col("col.score").cast("long").as("n_chars"))
  }

  /** Differentially-private count release (q_dp_release, Dwork 2006) —
    * the governance step AFTER inventory/forget: publish the corpus
    * data card's per-language counts with Laplace(1/ε) noise so the
    * released numbers bound any single document's influence
    * (add/remove-one sensitivity of a partition count is 1). The noise
    * draw is the inverse-CDF transform of a SEEDED md5 uniform —
    * deterministic here so the oracle replays the mechanism
    * bit-for-bit; a production release rotates the seed per
    * publication (the privacy property lives in the seed's
    * freshness, the ENGINE property under test is the
    * sensitivity-calibrated per-key mechanism). The one impl-defined
    * libm call (ln) lands on the round-6 declared grid — the
    * q_sample_weighted precedent.
    *
    * Scale shape: one partition-count aggregate (|langs| rows out),
    * then pure per-row arithmetic. Nothing else. */
  def dpReleaseQ(docs: DataFrame, epsilon: Double = 1.0,
      seed: String = "r13"): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.Md5Bits.register(spark)
    val uu = (pmod(call_function(graft.functions.Md5Bits.FnName,
      concat(lit(s"dp:$seed:"), col("lang")), lit(0), lit(15)),
      lit(1000000L)).cast("double") + 0.5) / 1000000.0
    val noise = (when(col("uu") >= 0.5, -1.0).otherwise(1.0) *
      log(lit(1.0) - lit(2.0) * abs(col("uu") - 0.5))) / epsilon
    docs.filter(col("lang").isNotNull)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .withColumn("uu", uu)
      .select(col("lang"),
        round(col("n") + noise, 6).as("released"),
        lit(epsilon).as("epsilon"))
  }
}
