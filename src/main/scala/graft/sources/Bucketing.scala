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
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
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
  // rows). Memo set only AFTER both writes succeed; whole check+write
  // under one lock; weakly keyed so stopped sessions don't pin.
  private val lastDir = new java.util.WeakHashMap[SparkSession, (String, Int)]

  /** Idempotent [[registerFactTables]] — the form a declared query can
    * call: first call per (session, dir, buckets) pays the bucketed
    * write, repeat calls measure the steady-state co-located join a
    * deployment runs. The bucket count is part of the memo key: a
    * repeat call asking for a different layout must re-write, not
    * silently serve the old one. */
  def ensureFactTables(spark: SparkSession, dir: String,
      buckets: Int = 8): Unit = lastDir.synchronized {
    if (lastDir.get(spark) != ((dir, buckets))) {
      registerFactTables(spark, dir, buckets)
      lastDir.put(spark, (dir, buckets))
    }
  }
}
