package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The EIGHTH persisted index: incremental corpus data card.
  *
  * [[TextOps.corpusReportQ]] is the batch form; a 100 TB ingestion loop
  * cannot re-scan the corpus per micro-batch to refresh its data card,
  * so this index persists the report's sufficient statistics in two
  * additive tables:
  *
  *  - `stats`: per-(source, lang) partials (n_docs, total_chars,
  *    total_tokens) — metadata-sized per batch, pure file append, the
  *    reader merges partials with one tiny aggregate;
  *  - `hashes`: per-(content-hash, source) document counts,
  *    bucket-partitioned on the hash — corpus-sized (one row per
  *    distinct (text, source) pair), appends additive, compaction
  *    collapses per-batch partials to one file per bucket.
  *
  * Everything the report needs is a sum over these, so append order
  * never matters and a report after any append sequence equals the
  * batch report over the union (ReportIndexSpec law; the declared
  * q_corpus_report_incr shares q_corpus_report's oracle text). The dup
  * count is corpus-WIDE by declared semantics, so the report's hash
  * aggregate reads the full hashes table — no pruning is possible, and
  * none is claimed; compaction keeps that read at one file per bucket.
  * Same single-writer append discipline and [[DirSwap]] compaction as
  * the other seven indexes.
  */
object ReportIndex {

  private val StatsSchema = StructType(Seq(
    StructField("source", StringType), StructField("lang", StringType),
    StructField("n_docs", LongType), StructField("total_chars", LongType),
    StructField("total_tokens", LongType)))

  private val HashSchema = StructType(Seq(
    StructField("h", StringType), StructField("source", StringType),
    StructField("c", LongType), StructField("bkt", IntegerType)))

  private def partials(docs: DataFrame, hashBuckets: Int): (DataFrame, DataFrame) = {
    val d = graft.sources.Tables.fanout(docs)
      .select(col("source"), col("lang"),
        length(col("text")).cast("long").as("n_chars"),
        TextOps.nTokensWs(col("text")).cast("long").as("n_tok"),
        md5(col("text")).as("h"))
    val stats = d.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("n_tok")).as("total_tokens"))
    val hashes = d.groupBy(col("h"), col("source"))
      .agg(count(lit(1)).as("c"))
      .withColumn("bkt",
        pmod(abs(hash(col("h"))), lit(hashBuckets)).cast("int"))
    (stats, hashes)
  }

  def writeReportIndex(docs: DataFrame, dir: String,
      hashBuckets: Int = 64): Unit = {
    require(hashBuckets > 0, s"hashBuckets must be positive, got $hashBuckets")
    val (stats, hashes) = partials(docs, hashBuckets)
    stats.coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
    hashes.repartition(col("bkt"))
      .write.mode("overwrite").partitionBy("bkt").parquet(s"$dir/hashes")
    val spark = docs.sparkSession
    spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](
        org.apache.spark.sql.Row(hashBuckets)),
      StructType(Seq(StructField("hash_buckets", IntegerType))))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  private def readBuckets(spark: SparkSession, dir: String): Int =
    spark.read.parquet(s"$dir/meta").head().getInt(0)

  /** Fold newly ingested documents in — pure additive file appends on
    * both tables (the reader re-aggregates), one file per touched
    * bucket per batch. Single-writer discipline as everywhere. */
  def appendToReportIndex(newDocs: DataFrame, dir: String): Unit = {
    val buckets = readBuckets(newDocs.sparkSession, dir)
    val (stats, hashes) = partials(newDocs, buckets)
    stats.coalesce(1).write.mode("append").parquet(s"$dir/stats")
    hashes.repartition(col("bkt"))
      .write.mode("append").partitionBy("bkt").parquet(s"$dir/hashes")
  }

  /** Collapse per-batch partials: stats to one file, hashes to one file
    * per bucket — the standard [[DirSwap]] swap per table. */
  def compactReportIndex(spark: SparkSession, dir: String): Unit = {
    DirSwap(spark, s"$dir/stats") { out =>
      spark.read.schema(StatsSchema).parquet(s"$dir/stats")
        .groupBy(col("source"), col("lang"))
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("total_chars")).as("total_chars"),
          sum(col("total_tokens")).as("total_tokens"))
        .coalesce(1).write.parquet(out)
    }
    DirSwap(spark, s"$dir/hashes") { out =>
      spark.read.schema(HashSchema).parquet(s"$dir/hashes")
        .groupBy(col("h"), col("source"), col("bkt"))
        .agg(sum(col("c")).as("c"))
        .select(col("h"), col("source"), col("c"), col("bkt"))
        .repartition(col("bkt"))
        .write.partitionBy("bkt").parquet(out)
    }
  }

  /** The data card from the index — same schema and semantics as the
    * batch [[TextOps.corpusReportQ]] over everything ever folded in. */
  def reportFromIndex(spark: SparkSession, dir: String): DataFrame = {
    val perSrc = spark.read.schema(StatsSchema).parquet(s"$dir/stats")
      .groupBy(col("source"), col("lang"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("total_chars")).as("total_chars"),
        sum(col("total_tokens")).as("total_tokens"))
      .groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("total_chars")).as("total_chars"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("total_tokens")).as("total_tokens"))
    val h = spark.read.schema(HashSchema).parquet(s"$dir/hashes")
      .groupBy(col("h"), col("source")).agg(sum(col("c")).as("c"))
    val dupH = h.groupBy(col("h")).agg(sum(col("c")).as("tc"))
      .filter(col("tc") >= 2).select("h")
    val dups = h.join(dupH, "h")
      .groupBy(col("source")).agg(sum(col("c")).as("n_exact_dup"))
    perSrc.join(dups, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("total_chars"),
        col("n_langs"), col("total_tokens"),
        coalesce(col("n_exact_dup"), lit(0L)).as("n_exact_dup"))
  }

  /** Declared query q_corpus_report_incr: corpus (doc_id % 20 ≠ 0)
    * indexed once, the delta (doc_id % 20 = 0) folded in as a
    * micro-batch append, report read from the index — which must equal
    * the batch report over ALL documents (the shared oracle text). */
  def incrementalReportQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.sources.Tables.documents(spark, dir)
    val idxDir = BuildOnce.tempDirFor("graft_report_idx", dir)
    BuildOnce(spark, idxDir, Seq(dir)) {
      writeReportIndex(docs.filter(col("doc_id") % 20 =!= 0), idxDir)
      appendToReportIndex(docs.filter(col("doc_id") % 20 === 0), idxDir)
    }
    reportFromIndex(spark, idxDir)
  }
}
