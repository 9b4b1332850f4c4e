package graft.ops

import org.apache.spark.sql.SparkSession

/** Run a named artifact build once per artifact DIRECTORY — across
  * sessions AND across JVMs — the memo pattern shared by the declared
  * queries that build a persisted artifact (near-dup inverted file,
  * trained IVF index) before querying it: the FIRST call anywhere pays
  * the build, repeat calls measure the steady-state probe cost the
  * production loop pays.
  *
  * Two layers:
  *  - a per-session memo (the fast path — no FS touch on repeat calls
  *    inside one session);
  *  - a `_GRAFT_BUILT` completion marker INSIDE the artifact dir,
  *    stamped only after the build body returns. A fresh JVM that finds
  *    a matching marker SKIPS the rebuild outright; a dir without one
  *    (or with a stale format version) is a crashed/foreign leftover
  *    and is WIPED before the rebuild. The wipe is what makes rebuilds
  *    safe: a build body that appends or forgets over prior state
  *    (e.g. [[TextIndex.forgetFromTextIndex]]'s tombstone table) must
  *    never replay over a half-populated dir — round 13's one red query
  *    was exactly a fresh JVM re-running a forget build over a leftover
  *    dir whose tombstone table survived the data overwrite.
  *
  * The marker is underscore-prefixed, so Spark/Hadoop input listing
  * ignores it even when the artifact dir itself is read as a table
  * (the CSV/ORC/JSONL format seams). The memo is set only AFTER the
  * build succeeds (a failure leaves it unset AND the marker absent, so
  * a retry wipes and rebuilds), and the whole check+build runs under
  * one lock. Single-writer discipline across JVMs is the callers'
  * contract (the same one every index's maintenance loop documents) —
  * the bench/verify drivers never run two engines concurrently.
  */
private[graft] object BuildOnce {
  private val done =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Set[String]]

  private val MarkerName = "_GRAFT_BUILT"

  /** Bump when any persisted artifact layout changes incompatibly: a
    * new engine version then treats every old /tmp artifact as foreign
    * and rebuilds from scratch instead of misreading it. */
  private[graft] val FormatVersion = "graft-idx-v16"

  /** @param srcDirs the BUILD INPUTS — the source data dirs the build
    *   body reads. Their content summary (per-dir recursive file count,
    *   total bytes, max mtime) is folded into the completion stamp, so
    *   source parquet regenerated IN PLACE under the same path makes
    *   the marker stale and forces a wipe-and-rebuild in the next JVM —
    *   a path-only stamp would silently serve the artifact of the OLD
    *   data (the round-13 stale-auxiliary-state bug class, one level
    *   up). The summary costs one recursive listing per source dir per
    *   JVM — metadata-scale, the same cost any read's file listing
    *   pays. Within one session the memo still short-circuits: a
    *   session that already built an artifact keeps serving it (the
    *   single-writer contract says nobody rewrites sources mid-run). */
  def apply(spark: SparkSession, dir: String,
      srcDirs: Seq[String] = Nil)(build: => Unit): Unit =
    done.synchronized {
      val built = Option(done.get(spark)).getOrElse {
        val s = scala.collection.mutable.Set.empty[String]
        done.put(spark, s); s
      }
      if (!built.contains(dir)) {
        val path = new org.apache.hadoop.fs.Path(dir)
        val marker = new org.apache.hadoop.fs.Path(path, MarkerName)
        val conf = spark.sparkContext.hadoopConfiguration
        val fs = path.getFileSystem(conf)
        val want = stamp(conf, dir, srcDirs)
        if (!markerMatches(fs, marker, want)) {
          fs.delete(path, true)
          build
          val out = fs.create(marker, true)
          try out.write(want.getBytes("UTF-8")) finally out.close()
        }
        built.add(dir)
      }
    }

  private def stamp(conf: org.apache.hadoop.conf.Configuration,
      dir: String, srcDirs: Seq[String]): String =
    (FormatVersion +: dir +:
      srcDirs.map(s => s + "|" + srcSummary(conf, s))).mkString("\n")

  /** `files:bytes:md5(per-file name|len|mtime, sorted)` over a source
    * dir tree — `absent` when the dir does not exist (a build whose
    * input appears later then restamps). The per-file fold (round-15
    * ADVICE) catches an in-place regeneration that happens to preserve
    * the aggregate count/bytes/max-mtime; sorting makes the digest
    * independent of FS listing order, so two JVMs stamping the same
    * state agree. A transient listing failure gets ONE retry and then
    * PROPAGATES — it must fail the build, not stamp an absent-looking
    * summary that wipes and rebuilds a good artifact. */
  private def srcSummary(conf: org.apache.hadoop.conf.Configuration,
      srcDir: String): String = {
    def attempt(): String = {
      val p = new org.apache.hadoop.fs.Path(srcDir)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) "absent"
      else {
        var nFiles = 0L; var nBytes = 0L
        val lines = scala.collection.mutable.ArrayBuffer.empty[String]
        val it = fs.listFiles(p, true)
        while (it.hasNext) {
          val st = it.next()
          nFiles += 1; nBytes += st.getLen
          lines += s"${st.getPath.getName}|${st.getLen}|${st.getModificationTime}"
        }
        val md = java.security.MessageDigest.getInstance("MD5")
        lines.sorted.foreach(l => md.update((l + "\n").getBytes("UTF-8")))
        s"$nFiles:$nBytes:" + md.digest().map("%02x".format(_)).mkString
      }
    }
    try attempt()
    catch { case _: java.io.IOException => attempt() }
  }

  private def markerMatches(fs: org.apache.hadoop.fs.FileSystem,
      marker: org.apache.hadoop.fs.Path, want: String): Boolean =
    try {
      fs.exists(marker) && {
        val len = fs.getFileStatus(marker).getLen.toInt
        val buf = new Array[Byte](len)
        val in = fs.open(marker)
        try in.readFully(buf) finally in.close()
        new String(buf, "UTF-8") == want
      }
    } catch { case _: java.io.IOException => false }

  /** TEST-ONLY: drop the per-session memo so a re-invocation exercises
    * the cross-JVM path (marker check, wipe-and-rebuild) inside one
    * suite — the replay drill the round-13 q_forget bug needed. */
  private[graft] def resetMemo(spark: SparkSession): Unit =
    done.synchronized {
      Option(done.get(spark)).foreach(_.clear())
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
