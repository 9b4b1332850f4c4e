package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Shared tombstone-table plumbing for right-to-be-forgotten delete
  * propagation across the persisted indexes ([[TextIndex]] BM25
  * postings, [[Dedup]] near-dup bands): `<dir>/deletes` holds one
  * `doc_id` per forgotten document.
  *
  * The lifecycle every index shares:
  *  - REQUEST TIME: [[fresh]] dedups the victim ids against existing
  *    tombstones (idempotence — re-forgetting must not double any
  *    correction the caller derives from the fresh set), then
  *    [[append]] lands them. Cheap: delete batches are request-sized.
  *  - READ TIME: [[minus]] anti-joins a rows frame against the
  *    broadcast tombstone set. Absence of the deletes dir is the
  *    steady state — the FS check costs no Spark job, and an index
  *    that never saw a delete keeps its exact pre-forget read plans.
  *  - COMPACTION TIME: the index's own compact rewrites without the
  *    tombstoned rows, then [[clear]]s the table — physical erasure
  *    rides the rewrite the maintenance loop already pays.
  */
private[ops] object Tombstones {

  private val Schema = StructType(Seq(StructField("doc_id", LongType)))

  private def path(dir: String) = new org.apache.hadoop.fs.Path(s"$dir/deletes")

  def read(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.schema(Schema).parquet(p.toString))
    else None
  }

  /** `rows` minus the tombstoned docs (anti-join on `key`, default
    * `doc_id` — the IVF index keys on `vec_id`); `rows` unchanged when
    * no tombstone table exists. The on-disk column is always `doc_id`
    * (the normalized victim id), whatever the index calls its key. */
  def minus(spark: SparkSession, dir: String, rows: DataFrame,
      key: String = "doc_id"): DataFrame =
    read(spark, dir).fold(rows)(del =>
      rows.join(broadcast(del.withColumnRenamed("doc_id", key)),
        Seq(key), "left_anti"))

  /** The victim ids NOT already tombstoned — distinct, normalized to
    * long. Callers derive any index-specific correction (negative
    * stats partials) from THIS set, then [[append]] it. */
  def fresh(spark: SparkSession, dir: String, victims: DataFrame,
      key: String = "doc_id"): DataFrame = {
    val v = victims.select(col(key).cast("long").as("doc_id")).distinct()
    read(spark, dir).fold(v)(del =>
      v.join(broadcast(del), Seq("doc_id"), "left_anti"))
  }

  /** TEST-ONLY failpoint (FaultInjectionSpec): fires right BEFORE the
    * tombstone append — the request-time crash window. The append is
    * the forget request's single commit point (any per-index correction
    * rides ON the appended rows, e.g. TextIndex's dl column), so the
    * law under drill is: a crash here commits NOTHING — reads are
    * bit-identical to pre-request — and a retry lands the full request
    * exactly once. Production code never sets it. */
  private[ops] var crashBeforeAppend: Option[String => Unit] = None

  def append(dir: String, freshVictims: DataFrame): Unit =
    appendRaw(s"$dir/deletes", freshVictims)

  /** Append to an EXPLICIT ledger path — the aggregate-count indexes
    * keep their forget ledger inside the data dir so one compaction
    * swap retires data and ledger together (see [[LmIndex]]). */
  def appendRaw(path: String, rows: DataFrame): Unit = {
    crashBeforeAppend.foreach(f => f(path))
    rows.coalesce(1).write.mode("append").parquet(path)
    ()
  }

  def clear(spark: SparkSession, dir: String): Unit = {
    val p = path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    ()
  }
}
