package graft.ops

import org.apache.spark.sql.SparkSession

/** Run a named build step once per (session, key) — the
  * Catalog.registerAll memo pattern shared by the declared queries that
  * build a persisted artifact (near-dup inverted file, trained IVF
  * index) before querying it: the FIRST call pays the build, repeat
  * calls measure the steady-state probe cost the production loop pays.
  * The memo is set only AFTER the build succeeds (a failure leaves it
  * unset so a retry rebuilds), the whole check+build runs under one
  * lock, and the map is weakly keyed so stopped sessions don't pin.
  */
private[graft] object BuildOnce {
  private val done =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Set[String]]

  def apply(spark: SparkSession, key: String)(build: => Unit): Unit =
    done.synchronized {
      val built = Option(done.get(spark)).getOrElse {
        val s = scala.collection.mutable.Set.empty[String]
        done.put(spark, s); s
      }
      if (!built.contains(key)) {
        build
        built.add(key)
      }
    }

  /** Deterministic per-data-dir temp path: readable sanitized prefix +
    * hash of the RAW dir string, so dirs differing only in
    * sanitized-away characters cannot collide on one artifact path
    * (the memo would then serve dir A's artifact to dir B's query). */
  def tempDirFor(prefix: String, dir: String): String = {
    val dirHash = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    new java.io.File(sys.props("java.io.tmpdir"),
      prefix + "_" + dir.replaceAll("[^A-Za-z0-9._-]", "_") + "_" + dirHash).getPath
  }
}

/** The compaction swap every persisted index shares: clear the temp
  * path, `write(tmp)` (the writer READS the live path — it stays
  * untouched until the write succeeds), then delete-live + rename. NOT
  * atomic between the last two steps: run from the ingestion loop's
  * single writer between batches (the documented discipline of every
  * compact* caller); the live data survives any failure BEFORE the
  * final delete, and the rename is `require`-guarded so a failed swap
  * surfaces instead of leaving a half-state silently. */
private[ops] object DirSwap {
  /** TEST-ONLY failpoint (FaultInjectionSpec): when set, invoked after
    * `write(tmp)` returns and BEFORE the live delete+rename — the crash
    * window between a compaction's data write and its swap, which the
    * fault-injection tests kill in to assert readers keep seeing the
    * old generation. Production code never sets it. */
  private[ops] var crashBeforeSwap: Option[String => Unit] = None

  def apply(spark: SparkSession, livePath: String)(
      write: String => Unit): Unit = {
    val live = new org.apache.hadoop.fs.Path(livePath)
    val tmp = new org.apache.hadoop.fs.Path(livePath + ".compact")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(tmp, true)
    // legacy temp suffix from before the swap was shared (ProfileIndex
    // used `.compact_tmp`): clean up any crashed-run leftover too
    fs.delete(new org.apache.hadoop.fs.Path(livePath + ".compact_tmp"), true)
    write(tmp.toString)
    crashBeforeSwap.foreach(f => f(livePath))
    fs.delete(live, true)
    require(fs.rename(tmp, live), s"compaction swap failed for $live")
  }
}
