package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Tombstone-debt observability across the persisted indexes
  * (round-15, VERDICT item 7): one call answers "how much forget debt
  * is outstanding, per index?" so an operator can schedule compactions
  * from a dashboard instead of spelunking /tmp dirs.
  *
  * PURE METADATA READS — no Spark job, no data-dir scan: file listings
  * ride the driver-side FS client, row counts come from parquet FOOTER
  * block metadata, and the victim/correction split comes from the
  * footer's per-column null-count statistics on the ledger's `doc_id`
  * column (registry rows carry the victim id, correction rows a null —
  * the [[ForgetLedger]] contract). Ledgers are request-sized and data
  * dirs are compaction-bounded, so the whole audit is O(files), the
  * same cost class as the listing any read pays.
  *
  * Layout autodetection keeps it index-agnostic across both forget
  * families: a `deletes` subdir is a [[Tombstones]] table (every row a
  * victim), a `_deletes` dir anywhere under the index is an in-dir
  * negative-correction [[ForgetLedger]]; everything else under the
  * index dir is live data. Reading the debt:
  *  - `tombstoned_victims` / `correction_rows` > 0 → a compaction of
  *    that index will purge (physical erasure is owed);
  *  - a wide `oldest_live_ts` → `newest_live_ts` gap → appends have
  *    accumulated since the last compaction (compaction rewrites every
  *    file, so right after one the gap is ~0 — the oldest timestamp IS
  *    the last-compaction proxy).
  */
object ForgetAudit {

  private case class Row1(index: String, live_files: Long, live_bytes: Long,
      live_rows: Long, tombstoned_victims: Long, correction_rows: Long,
      ledger_bytes: Long, oldest_live_ts: Long, newest_live_ts: Long)

  private val AuditSchema = org.apache.spark.sql.types.StructType(Seq(
    "index" -> org.apache.spark.sql.types.StringType,
    "live_files" -> org.apache.spark.sql.types.LongType,
    "live_bytes" -> org.apache.spark.sql.types.LongType,
    "live_rows" -> org.apache.spark.sql.types.LongType,
    "tombstoned_victims" -> org.apache.spark.sql.types.LongType,
    "correction_rows" -> org.apache.spark.sql.types.LongType,
    "ledger_bytes" -> org.apache.spark.sql.types.LongType,
    "oldest_live_ts" -> org.apache.spark.sql.types.LongType,
    "newest_live_ts" -> org.apache.spark.sql.types.LongType
  ).map { case (n, t) => org.apache.spark.sql.types.StructField(n, t) })

  /** Footer row count + doc_id null count of one parquet file. */
  private def footerCounts(conf: org.apache.hadoop.conf.Configuration,
      p: Path): (Long, Long) = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = r.getFooter.getBlocks
      var rows = 0L; var nulls = 0L
      val it = blocks.iterator()
      while (it.hasNext) {
        val b = it.next()
        rows += b.getRowCount
        val cit = b.getColumns.iterator()
        while (cit.hasNext) {
          val c = cit.next()
          if (c.getPath.toDotString == "doc_id") {
            val st = c.getStatistics
            if (st != null && st.isNumNullsSet) nulls += st.getNumNulls
          }
        }
      }
      (rows, nulls)
    } finally r.close()
  }

  /** Audit one index dir; absent dir → all-zero row (an index that
    * never built is healthy, not an error). Footer reads are submitted
    * to `pool` and the per-file futures reduced here — the listing
    * stays one driver pass, but the O(files) footer RPCs overlap
    * instead of serializing on the driver thread (round-15 VERDICT: at
    * thousands of shards per index the serial walk was a minutes-long
    * driver stall). */
  private def auditOne(spark: SparkSession, name: String, dir: String,
      pool: java.util.concurrent.ExecutorService): Row1 = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root))
      return Row1(name, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
    var liveFiles = 0L; var liveBytes = 0L
    var ledgerBytes = 0L
    var oldest = Long.MaxValue; var newest = 0L
    // (isLedger, footer-counts future) per parquet file
    val pending = scala.collection.mutable.ArrayBuffer
      .empty[(Boolean, java.util.concurrent.Future[(Long, Long)])]
    // One walk, two passes over the collected statuses: generation-
    // committed tables (DirSwap v17) keep the PREVIOUS generation on
    // disk as the concurrent-reader grace window, and uncommitted next
    // gens may exist mid-compaction — only the newest COMMITTED
    // generation of each table is live debt-wise. Pass 1 collects the
    // statuses and, from the _GEN_OK markers, each table's current
    // generation; pass 2 tallies, skipping files under any other
    // generation (including the plain gen-0 dir once a committed
    // generation exists).
    val GenDir = ".*__gen(\\d+)$".r
    val statuses = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.hadoop.fs.LocatedFileStatus]
    val current = scala.collection.mutable.Map.empty[String, Int]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      statuses += st
      if (st.getPath.getName == "_GEN_OK")
        st.getPath.getParent.toString match {
          case GenDir(k) =>
            val base = st.getPath.getParent.toString
              .stripSuffix("__gen" + k)
            if (current.getOrElse(base, -1) < k.toInt)
              current(base) = k.toInt
          case _ =>
        }
    }
    def stale(pathStr: String): Boolean = current.exists { case (base, cur) =>
      // plain dir = generation 0: retired the moment any committed
      // generation exists
      pathStr.startsWith(base + "/") ||
      // a sibling generation dir other than the current one
      (pathStr.startsWith(base + "__gen") && {
        val rest = pathStr.drop(base.length + "__gen".length)
        val k = rest.takeWhile(_.isDigit)
        k.nonEmpty && rest.drop(k.length).headOption.contains('/') &&
          k.toInt != cur
      })
    }
    statuses.foreach { st =>
      val p = st.getPath
      val s = p.toString
      val inTombstones = s.matches(".*/deletes(__gen\\d+)?/.*")
      val inLedger = s.contains("/_deletes/")
      if (p.getName != "_GEN_OK" && !stale(s) &&
          (p.getName.endsWith(".parquet") || inTombstones || inLedger)) {
        if (inTombstones || inLedger) {
          ledgerBytes += st.getLen
          if (p.getName.endsWith(".parquet"))
            pending += true -> pool.submit(
              (() => footerCounts(conf, p)): java.util.concurrent.Callable[(Long, Long)])
        } else {
          liveFiles += 1; liveBytes += st.getLen
          pending += false -> pool.submit(
            (() => footerCounts(conf, p)): java.util.concurrent.Callable[(Long, Long)])
          if (st.getModificationTime < oldest) oldest = st.getModificationTime
          if (st.getModificationTime > newest) newest = st.getModificationTime
        }
      }
    }
    var liveRows = 0L; var victims = 0L; var corrections = 0L
    pending.foreach { case (isLedger, fut) =>
      val (rows, nulls) = fut.get()
      if (isLedger) {
        // tombstone tables have no null ids; ledger registry rows
        // carry the id, correction rows a null — one rule covers both
        victims += rows - nulls
        corrections += nulls
      } else liveRows += rows
    }
    Row1(name, liveFiles, liveBytes, liveRows, victims, corrections,
      ledgerBytes, if (oldest == Long.MaxValue) 0L else oldest, newest)
  }

  /** The audit frame: one row per (name, dir), columns as in [[Row1]].
    * Driver-side construction via explicit schema — the result is a
    * LocalRelation whose size is |indexes|, never data-scale, and NO
    * bean encoder is involved (a private case class through toDF made
    * janino's generated encoder fall back to interpreted mode with a
    * WARN on every run — round-15 VERDICT). */
  def forgetAudit(spark: SparkSession,
      indexes: Seq[(String, String)]): DataFrame = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, Runtime.getRuntime.availableProcessors))
    val rows: Seq[org.apache.spark.sql.Row] =
      try indexes.map { case (n, d) =>
        val r = auditOne(spark, n, d, pool)
        org.apache.spark.sql.Row(r.index, r.live_files, r.live_bytes,
          r.live_rows, r.tombstoned_victims, r.correction_rows,
          r.ledger_bytes, r.oldest_live_ts, r.newest_live_ts)
      }
      finally pool.shutdown()
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, AuditSchema)
  }

  /** Declared query q_forget_audit (rows-only gate — timestamps and
    * byte counts are environment-dependent): stand up one index from
    * each forget family over the fixture corpus — the BM25 text index
    * (tombstone family) and the bigram-LM count store (in-dir
    * negative-correction family) — forget doc_id % 17 = 0 on both, and
    * audit. The numeric debt columns are pinned exactly in
    * ForgetAuditSpec; this query is the operator-facing readout. */
  def forgetAuditQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.sources.Tables.documents(spark, dir)
    val victims = docs.filter(
      org.apache.spark.sql.functions.col("doc_id") % 17 === 0)
    val txtDir = BuildOnce.tempDirFor("graft_audit_text", dir)
    BuildOnce(spark, txtDir, Seq(dir)) {
      TextIndex.writeTextIndex(docs, txtDir)
      TextIndex.forgetFromTextIndex(spark, txtDir, victims.select("doc_id"))
    }
    val lmDir = BuildOnce.tempDirFor("graft_audit_lm", dir)
    BuildOnce(spark, lmDir, Seq(dir)) {
      LmIndex.writeLmIndex(docs, lmDir)
      LmIndex.forgetFromLmIndex(spark, lmDir, victims)
    }
    forgetAudit(spark, Seq("text_bm25" -> txtDir, "lm_bigram" -> lmDir))
  }
}
