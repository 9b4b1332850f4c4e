package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's scale-oriented defaults.
  *
  * Design stance (SURVEY.md §7.0): one SparkSession-centric engine where
  * batch and streaming share the same DataFrame operator definitions. The
  * conf below is what we would ship to a 1000-executor cluster, minus the
  * cluster-manager specifics:
  *   - AQE on: runtime partition coalescing + skew-join splitting mean the
  *     static `shuffle.partitions` only needs to be an upper bound.
  *   - UTC session time zone: deterministic window/date semantics across
  *     engines (matches the DuckDB oracle).
  *   - Broadcast threshold left at default (10 MB) — dims like region/
  *     nation/supplier broadcast automatically; we additionally hint
  *     `broadcast()` where we know the dimension is small at any SF.
  */
object Engine {
  def session(master: String = "local[*]", shufflePartitions: Int = 32,
      rocksDbState: Boolean = false): SparkSession = {
    val builder = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // ANSI on is the Spark 4 default; pinned so the engine's declared
      // error semantics (fail loudly on bad casts/overflow; operators
      // that must be total guard explicitly — see TextOps/SimSearch/
      // parseCsv) don't drift with deployment defaults.
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // Large streaming state (big windows, wide Top-N key spaces) should
    // live off-heap: the RocksDB provider spills to local disk instead of
    // holding every version in executor memory. transformWithState
    // requires it; flatMapGroupsWithState benefits from it.
    if (rocksDbState) builder.config(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Apply the engine defaults to an externally created session (the
    * driver's Verify/Bench mains create their own). Safe to call on a
    * running session: all of these are runtime-mutable SQL confs. */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.ansi.enabled", "true")
    // TIMESTAMP(NANOS) parquet columns (events table) read as raw longs
    // engine-wide; Tables.events owns the ns→µs conversion. Declared here
    // rather than mutated as a side effect of the first events() call.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }
}
