package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Typed accessors for the driver-generated parquet tables
  * (TESTDATA.md / FIXTURES.md §2). Schemas are fixed by the generator;
  * we read with schema inference from the parquet footer (exact) and rely
  * on Catalyst to push filters/projections into the scan — verified in
  * RelationalSpec via `explain` (PushedFilters / ReadSchema).
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the
  * accessor indirection is the seam where that swap happens.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Fan a narrow scan out to the session's parallelism before heavy
    * per-row compute (JSON parse, tokenize + hashing, percentile
    * buffering). The test tables are ONE parquet file with ONE row
    * group each, and Spark's parquet splits are row-group-granular —
    * `files.maxPartitionBytes` can slice the byte range but every slice
    * except the one holding the row-group midpoint produces zero rows,
    * so the whole map phase serializes on a single core (measured 3-10×
    * on the parse/dedup pipelines at sf0.1). A round-robin repartition
    * of the (small) input un-starves it.
    *
    * The probe is metadata-only: `inputFiles` from the file index; when
    * the file COUNT alone is inconclusive (fewer files than cores), one
    * FileSystem stat + one parquet footer read per file. Per file the
    * number of scan tasks that actually CARRY rows is
    * min(rowGroups, byteSplits): byte splits alone over-estimate (a
    * multi-GB single-row-group file yields many `maxPartitionBytes`
    * slices, but every slice except the one holding a row-group midpoint
    * reads zero rows — the exact starvation fanout exists to fix), and
    * row groups alone over-estimate too (one split packs many small row
    * groups). Non-parquet files fall back to byte splits, which do carry
    * rows there (line-splittable formats). At production file counts the
    * probe exits on `files.length` and never reads a footer nor adds a
    * shuffle. */
  /** Per-file split estimates memoized on (path, mtime, length) — the
    * sub-core-count branch is hit by most operator builds in the
    * sandbox, and re-opening every parquet footer per query build adds
    * driver latency that scales with file count (a stat per file is
    * still paid: it is the memo key's freshness check). */
  private val splitMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), java.lang.Long]()

  def fanout(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val files = df.inputFiles
    // production file counts exit without any per-file I/O: beyond ~1k
    // files the probe's driver stats stop being free, and data at that
    // file count is either genuinely large (plenty of splits even
    // bin-packed) or maintained by the compaction paths that write
    // size-targeted files
    if (files.length >= math.max(1024, target)) return df
    val hconf = spark.sparkContext.hadoopConfiguration
    val maxPB = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    // MANY-tiny-files trap (round 10): file COUNT alone over-estimates
    // parallelism, because FilePartition BIN-PACKS small files — actual
    // scan tasks ≈ ⌈(Σbytes + nFiles·openCost) / maxPartitionBytes⌉,
    // so 256 one-row-group bucket files (openCost 4 MB) pack into ~9
    // tasks and everything downstream of the scan inherits that. The
    // effective-parallelism estimate is min(carried-row splits,
    // bin-packed task count); the early count exit is gated on the
    // packed estimate too.
    val openCost = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.openCostInBytes", "4MB"))
    var totalBytes = 0L
    val estSplits = files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val status =
        try Some(p.getFileSystem(hconf).getFileStatus(p))
        catch { case _: java.io.IOException => None }
      status match {
        // unreadable file: count it as openCost-only bytes so the
        // bin-packed estimate stays consistent with the 1-split estimate
        // (0 bytes would under-count binPacked and could trigger an
        // unnecessary repartition via the min(estSplits, binPacked) gate)
        case None => totalBytes += openCost; 1L
        case Some(st) =>
          totalBytes += st.getLen
          // byteSplits depends on the session's maxPartitionBytes, so
          // only the pure file property (row-group count) is memoized —
          // and only on SUCCESS: a transient footer-read failure falls
          // back to byteSplits for THIS call and retries next time
          // (memoizing the failure would silently freeze the fallback
          // until the file's mtime changes)
          val byteSplits = math.max(1L, (st.getLen + maxPB - 1) / maxPB)
          val key = (f, st.getModificationTime, st.getLen)
          val memod = splitMemo.get(key)
          val rowGroups =
            if (memod != null) memod.longValue()
            else
              try {
                val r = org.apache.parquet.hadoop.ParquetFileReader.open(
                  org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, hconf))
                val n = try r.getRowGroups.size().toLong finally r.close()
                if (splitMemo.size() > 65536) splitMemo.clear() // bound: rotated files
                splitMemo.put(key, n)
                n
              } catch { case _: Exception => byteSplits }
          math.min(rowGroups, byteSplits)
      }
    }.sum
    val binPacked = math.max(1L,
      (totalBytes + files.length * openCost + maxPB - 1) / maxPB)
    if (math.min(estSplits, binPacked) < target) df.repartition(target) else df
  }

  /** Generator fixtures have shipped time columns as parquet
    * TIMESTAMP(MICROS) both with and without isAdjustedToUTC; the
    * latter surfaces as TIMESTAMP_NTZ, which instant functions
    * (`unix_micros`, `unix_timestamp`) reject. The whole engine pins
    * `spark.sql.session.timeZone=UTC` (Engine.session/tune), so casting
    * NTZ→TIMESTAMP is a pure reinterpretation of the wall-clock as a
    * UTC instant — same microsecond values either way, and DuckDB reads
    * the same column as its (naive) TIMESTAMP. Normalizing at the
    * accessor keeps every downstream operator on one timestamp type. */
  private def tsUtc(df: DataFrame): DataFrame = {
    val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType)
    if (ntz.isEmpty) return df
    // The cast's zone binds at ANALYSIS time (ResolveTimeZone stamps
    // the session zone into the Cast node, and Dataset construction
    // runs the analyzer eagerly), so pinning UTC around the fold and
    // RESTORING the caller's zone afterwards yields a plan whose Cast
    // nodes carry UTC permanently — no reinterpretation shift on an
    // externally created session with a local zone, and no UTC leak
    // into the caller's own queries (the prior accessor mutated the
    // session conf and left it mutated).
    val spark = df.sparkSession
    val prior = spark.conf.getOption("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try
      ntz.foldLeft(df) {
        (d, f) => d.withColumn(f.name, col(f.name).cast(TimestampType))
      }
    finally prior.foreach(z => spark.conf.set("spark.sql.session.timeZone", z))
  }

  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = tsUtc(read(spark, dir, "orders"))
  def lineitem(spark: SparkSession, dir: String): DataFrame = tsUtc(read(spark, dir, "lineitem"))
  /** Older fixture generations wrote events.ts as parquet
    * TIMESTAMP(NANOS), which Spark's vectorized reader rejects. Read
    * nanos as long and floor-divide to microseconds (`div`, integer
    * division — a double roundtrip would lose precision at 1e18 ns).
    * DuckDB performs the identical ns→us truncation. Current fixtures
    * write TIMESTAMP(MICROS) without isAdjustedToUTC → the [[tsUtc]]
    * normalization. The nanosAsLong conf is declared in Engine.session/
    * tune; the set here only covers externally created sessions that
    * skipped both. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(spark, dir, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else tsUtc(raw)
  }
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
