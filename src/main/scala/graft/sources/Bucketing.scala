package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed catalog tables: the shuffle-free co-located join path.
  *
  * At 100 TB the dominant cost of a fact⋈fact equi-join is shuffling
  * both sides on the key. Writing both tables bucketed (and sorted)
  * on that key makes the sort-merge join exchange-free: each task
  * merge-joins bucket i of A with bucket i of B straight off storage.
  * This module is the deployment seam `Tables`' scaladoc points at —
  * the accessors read raw parquet in the sandbox, but a real
  * deployment registers bucketed tables once and every downstream
  * join co-locates for free (BucketingSpec pins the exchange-free
  * plan and result parity).
  *
  * Bucket count guidance: ≈ total-size / target-partition-size,
  * shared by all tables joined on the key (Spark requires equal — or
  * ratio-compatible under bucketed-scan coalescing — bucket counts).
  */
object Bucketing {

  /** Register `df` as a parquet catalog table bucketed AND sorted on
    * `key` — sorted buckets let the merge join skip its sort too.
    * Drops any prior registration AND its warehouse directory first:
    * the default in-memory catalog forgets tables across JVMs while
    * the warehouse files survive, so a bare saveAsTable in a fresh
    * session dies with LOCATION_ALREADY_EXISTS on the stale dir. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    val catalog = spark.sessionState.catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
    val defaultLoc = new org.apache.hadoop.fs.Path(
      catalog.defaultTablePath(ident))
    // resolve the registration's ACTUAL location before dropping: a
    // table registered at a custom/external LOCATION must not trigger
    // a delete of the unrelated default warehouse dir (and external
    // data is the user's, not ours — DROP TABLE already leaves it).
    // The stale-dir delete exists only for the managed-table case
    // where the in-memory catalog forgot the files across JVMs.
    val registeredLoc =
      if (catalog.tableExists(ident))
        scala.util.Try(new org.apache.hadoop.fs.Path(
          catalog.getTableMetadata(ident).location)).toOption
      else None
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    def bare(p: org.apache.hadoop.fs.Path) =
      org.apache.hadoop.fs.Path.getPathWithoutSchemeAndAuthority(p)
    if (registeredLoc.forall(l => bare(l) == bare(defaultLoc)))
      defaultLoc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(defaultLoc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Equi-join two co-bucketed tables on their bucket key. With both
    * sides bucketed on `key` the planned sort-merge join has no
    * Exchange on either side. */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  val OrdersBkt = "graft_orders_bkt"
  val LineitemBkt = "graft_lineitem_bkt"

  /** Opt-in deployment mode: register bucket-sorted copies of the two
    * fact tables on the order key (the engine's hottest fact⋈fact
    * edge). A one-time write; afterwards
    * [[graft.ops.Relational.joinInnerBucketed]] — and any other join on
    * the order key — plans the fact edge exchange-free. Bucket count:
    * match ≈ total-size / target-partition-size at the deployed scale
    * (the default suits the sandbox SFs). */
  def registerFactTables(spark: SparkSession, dir: String,
      buckets: Int = 8): Unit = {
    writeBucketed(Tables.orders(spark, dir), OrdersBkt, "o_orderkey", buckets)
    writeBucketed(Tables.lineitem(spark, dir), LineitemBkt, "l_orderkey", buckets)
  }

  // Catalog.registerAll's memo pattern: the bucketed write is a one-time
  // deployment step, so repeat calls against the SAME dir skip it and a
  // dir change re-writes (the registered tables hold the previous dir's
  // rows — a LAST-value memo, not a set: going back to an old dir must
  // also re-write). Memo set only AFTER both writes succeed. The global
  // lock covers only the map get/put; the write itself runs under a
  // PER-SESSION latch, so concurrent callers on unrelated sessions are
  // not serialized behind one session's multi-second bucketed write
  // (same-session callers do serialize — they'd race writes to the
  // same table names otherwise). Weakly keyed so stopped sessions
  // don't pin.
  private val lastDir = new java.util.WeakHashMap[
    SparkSession, java.util.concurrent.atomic.AtomicReference[(String, Int)]]

  /** Idempotent [[registerFactTables]] — the form a declared query can
    * call: first call per (session, dir, buckets) pays the bucketed
    * write, repeat calls measure the steady-state co-located join a
    * deployment runs. The bucket count is part of the memo key: a
    * repeat call asking for a different layout must re-write, not
    * silently serve the old one. */
  def ensureFactTables(spark: SparkSession, dir: String,
      buckets: Int = 8): Unit = {
    val ref = lastDir.synchronized {
      Option(lastDir.get(spark)).getOrElse {
        val r = new java.util.concurrent.atomic.AtomicReference[(String, Int)]()
        lastDir.put(spark, r); r
      }
    }
    ref.synchronized {
      if (ref.get != ((dir, buckets))) {
        registerFactTables(spark, dir, buckets)
        ref.set((dir, buckets))
      }
    }
  }
}
