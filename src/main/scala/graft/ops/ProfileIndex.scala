package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Persisted, mergeable column-profile index — the incremental form of
  * [[Relational.profileApproxQ]], and the missing maintenance story for
  * profiling at 100 TB: a corpus that ingests per micro-batch should
  * never re-scan history to re-profile; it should fold each batch into
  * per-shard DataSketches HLL sketches + exact count/min/max partials
  * and merge ON READ. Same pattern as the near-dup band index
  * ([[Dedup.writeNearDupIndex]]) and the span-frequency index: write is
  * pure-append, reads merge whatever file-sets have accumulated, and
  * the merged result is a pure function of the row multiset — append
  * order cannot change it (count/min/max are associative-commutative
  * exactly; the HLL union's estimate error stays inside the sketch's
  * published bound, spec-pinned in ProfileIndexSpec).
  *
  * Sketch encoding: DataSketches HLL accepts int/long/string/binary —
  * doubles ride their canonical string form (a bijection, so distinct
  * counts are preserved) and timestamps their epoch micros. One index
  * row per (append, shard): the shard split keeps each write's
  * aggregate partial+final over `nShards` reducers, and the read-side
  * merge touches shards-×-appends rows of KB-sized sketch state —
  * metadata-scale regardless of corpus size.
  */
object ProfileIndex {

  /** Profiled lineitem lanes — mirrors [[Relational.profileApproxQ]]. */
  private val NumCols = Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate")
  private val StrCols = Seq("l_returnflag", "l_linestatus")
  private val LgK = 12

  private def sketchable(n: String, c: Column): Column = n match {
    case "l_shipdate" => unix_micros(c.cast("timestamp"))
    case "l_quantity" | "l_extendedprice" => c.cast("string")
    case _ => c
  }

  /** Per-shard sketch rows for one batch of rows: exact n_rows /
    * non-null counts / typed min/max plus one HLL sketch per column.
    * `nShards` bounds the write's reducer fan-in; the OUTPUT is always
    * nShards rows of constant-size state. */
  private[ops] def sketchFrame(li: DataFrame, nShards: Int): DataFrame = {
    val aggs =
      Seq(count(lit(1)).as("n_rows")) ++
        (NumCols ++ StrCols).flatMap { n =>
          Seq(count(col(n)).as(s"cnt_$n"),
            hll_sketch_agg(sketchable(n, col(n)), lit(LgK)).as(s"hll_$n"),
            min(col(n)).as(s"min_$n"),
            max(col(n)).as(s"max_$n"))
        }
    li.groupBy(pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(nShards)).as("shard"))
      .agg(aggs.head, aggs.tail: _*)
  }

  // Sketch rows live under `<dir>/sketch` (v17 — the swapped table
  // must be a SUBDIR of the artifact dir so its generation siblings
  // stay inside it: BuildOnce's stale-artifact wipe removes them, and
  // the artifact root keeps its _GRAFT_BUILT marker across
  // compactions).
  private def sketchLive(dir: String) = s"${dir.stripSuffix("/")}/sketch"

  /** Append one batch's sketch rows to the index at `dir`. Pure append:
    * no read-modify-write, so concurrent batch writers never conflict
    * and a replayed batch is the only way to double-count (the caller's
    * idempotence story, same as the other persisted indexes). */
  def appendProfileSketches(li: DataFrame, dir: String, nShards: Int = 8): Unit =
    sketchFrame(li, nShards).write.mode("append")
      .parquet(DirSwap.resolve(li.sparkSession, sketchLive(dir)))

  def writeProfileSketches(li: DataFrame, dir: String, nShards: Int = 8): Unit = {
    DirSwap.reset(li.sparkSession, sketchLive(dir))
    sketchFrame(li, nShards).write.mode("overwrite").parquet(sketchLive(dir))
  }

  /** Compact the accumulated per-append file-sets back to one row per
    * shard — the maintenance half of the ingestion loop, mirroring
    * [[Dedup.compactNearDupIndex]]: a long-running ingestion appends one
    * row-set per micro-batch, and while the MERGE stays cheap (KB-sized
    * sketch rows), the file count grows without bound. Sketch states
    * union losslessly, so compaction is a pure re-aggregation: read,
    * merge per shard, rewrite via a temp dir + atomic move (the index
    * stays readable if compaction dies mid-write). */
  def compactProfileSketches(spark: SparkSession, dir: String): Unit = {
    val idx = spark.read.parquet(DirSwap.resolve(spark, sketchLive(dir)))
    val aggs =
      Seq(sum(col("n_rows")).as("n_rows")) ++
        (NumCols ++ StrCols).flatMap { n =>
          Seq(sum(col(s"cnt_$n")).as(s"cnt_$n"),
            hll_union_agg(col(s"hll_$n"), lit(false)).as(s"hll_$n"),
            min(col(s"min_$n")).as(s"min_$n"),
            max(col(s"max_$n")).as(s"max_$n"))
        }
    val merged = idx.groupBy(col("shard")).agg(aggs.head, aggs.tail: _*)
    DirSwap(spark, sketchLive(dir)) { out =>
      merged.coalesce(1).write.parquet(out)
    }
  }

  /** Merge the accumulated index into the one-row-per-column profile
    * frame (same schema as [[Relational.profileApproxQ]]): sums/min/max
    * merge exactly, cardinalities via `hll_union_agg` → estimate. The
    * whole read is metadata-scale — appends × shards rows in, one
    * single-row aggregate, no data-row scan anywhere. */
  def profileFromSketches(spark: SparkSession, dir: String): DataFrame = {
    val idx = spark.read.parquet(DirSwap.resolve(spark, sketchLive(dir)))
    val aggs =
      Seq(sum(col("n_rows")).as("n_rows")) ++
        (NumCols ++ StrCols).flatMap { n =>
          Seq(sum(col(s"cnt_$n")).as(s"cnt_$n"),
            hll_sketch_estimate(hll_union_agg(col(s"hll_$n"), lit(false))).as(s"nd_$n"),
            min(col(s"min_$n")).as(s"min_$n"),
            max(col(s"max_$n")).as(s"max_$n"))
        }
    val wide = idx.agg(aggs.head, aggs.tail: _*)
    def toNum(n: String, c: Column): Column =
      if (n == "l_shipdate") c.cast("timestamp").cast("double") else c.cast("double")
    def row(n: String, numeric: Boolean) =
      struct(lit(n).as("column_name"), col("n_rows"),
        (col("n_rows") - col(s"cnt_$n")).as("n_nulls"),
        col(s"nd_$n").as("n_distinct"),
        (if (numeric) toNum(n, col(s"min_$n")) else lit(null).cast("double")).as("min_num"),
        (if (numeric) toNum(n, col(s"max_$n")) else lit(null).cast("double")).as("max_num"),
        (if (numeric) lit(null).cast("string") else col(s"min_$n")).as("min_str"),
        (if (numeric) lit(null).cast("string") else col(s"max_$n")).as("max_str"))
    wide.select(explode(array(
      NumCols.map(n => row(n, numeric = true)) ++
        StrCols.map(n => row(n, numeric = false)): _*)).as("p"))
      .select("p.*")
  }

  /** Declared query q_profile_incr: the ingestion-shaped profile — 95 %
    * of lineitem written as the standing index, the 5 % "new batch"
    * appended, profile read from the merged sketches. Build is memoized
    * per (session, dir) so repeat calls measure the steady-state read
    * cost, not index construction (same convention as the dedup
    * indexes). Rows-only gate (HLL estimates); exactness of every
    * non-distinct lane + the cardinality error bound + append-order
    * invariance are pinned in ProfileIndexSpec. */
  def profileIncrQ(spark: SparkSession, dir: String): DataFrame = {
    val idxDir = BuildOnce.tempDirFor("profile_sketches", dir)
    BuildOnce(spark, idxDir, Seq(dir)) {
      val li = Tables.lineitem(spark, dir)
      writeProfileSketches(li.filter(col("l_orderkey") % 20 =!= 0), idxDir)
      appendProfileSketches(li.filter(col("l_orderkey") % 20 === 0), idxDir)
    }
    profileFromSketches(spark, idxDir)
  }

  /** Gate form of [[profileIncrQ]] (declared q_profile_incr): the merged
    * sketch profile joined per column with the exact melt
    * ([[Relational.profileQ]]) over the same (index ∪ append) = full
    * lineitem. Every lane the sketches carry EXACTLY (row/null counts,
    * min/max — lossless sums and extrema merges) is emitted from the
    * SKETCH side, so the driver hash gates the whole
    * append→merge→read path against an engine that recomputed them
    * from raw rows; the one genuinely approximate lane (datasketches
    * HLL cardinality, rsd ≈ 1.6 % at the default lgK = 12) becomes
    * `nd_ok` = |est − exact| ≤ 3·0.05·exact (the engine-wide sketch
    * bound, ≥ 9σ here). The exact twin is the gate's cost, not the
    * operator's — production reads [[profileFromSketches]] alone. */
  def profileIncrGated(spark: SparkSession, dir: String): DataFrame = {
    val m = profileIncrQ(spark, dir).withColumnRenamed("n_distinct", "nd_sketch")
    val exact = graft.ops.Relational.profileQ(spark, dir)
      .select(col("column_name"), col("n_distinct").as("nd_exact"))
    m.join(broadcast(exact), Seq("column_name"))
      .select(col("column_name"), col("n_rows"), col("n_nulls"),
        col("nd_exact").as("n_distinct"), col("min_num"), col("max_num"),
        col("min_str"), col("max_str"),
        (abs(col("nd_sketch").cast("double") - col("nd_exact")) <=
          lit(3 * 0.05) * col("nd_exact")).as("nd_ok"))
  }
}
