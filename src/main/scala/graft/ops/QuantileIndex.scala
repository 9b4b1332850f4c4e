package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The ELEVENTH persisted index: an additive bucket histogram serving
  * incremental quantile monitoring over the lineitem numeric lanes.
  *
  * A 100 TB ingestion loop wants "where is p50/p95 drifting?" per
  * micro-batch without re-sorting anything: the index keeps, per
  * (column, bucket), the triple (count, min, max) under the
  * order-preserving fixed-width bucketing `bucket = ⌊v / 16⌋`.
  * Every field is additive (sum / min / max), so appends are pure
  * partial-file appends and the reader folds them with one tiny
  * aggregate — the ReportIndex discipline. Division by a power of two
  * is IEEE-exact and `floor` is engine-portable, so the DuckDB oracle
  * replays the bucketing bit-identically (the reason this index does
  * NOT reuse [[graft.functions.DoubleOrderBits]]: the radix form is
  * the better in-engine histogram, but its bit arithmetic has no
  * portable SQL spelling — the declared gate needs one).
  *
  * The quantile READ brackets, it does not interpolate: for rank
  * positions ⌊p·(n−1)⌋ and ⌈p·(n−1)⌉ it locates the straddling
  * buckets in the folded histogram and reports [v_lo, v_hi] = [min of
  * the floor-rank bucket, max of the ceil-rank bucket] — a hard
  * enclosure of the exact continuous quantile (containment law pinned
  * against the exact sort in QuantileIndexSpec; the oracle replays the
  * same enclosure). The histogram is metadata-sized (value-range/16
  * buckets, ≤ a few thousand for the declared lanes), so the locate is
  * a driver walk — the same adjudicated discipline as the batch
  * histogram-select percentile locator. */
object QuantileIndex {

  val BucketWidth = 16.0
  val Lanes: Seq[String] = Seq("l_quantity", "l_extendedprice")
  val Ps: Seq[Double] = Seq(0.5, 0.95)

  private val HistSchema = StructType(Seq(
    StructField("column_name", StringType), StructField("bucket", LongType),
    StructField("c", LongType), StructField("lo", DoubleType),
    StructField("hi", DoubleType)))

  /** (column_name, bucket, c, lo, hi) partials — one melt + one
    * bounded-key aggregate, the corpus-scale work. */
  private def partials(lineitem: DataFrame): DataFrame = {
    val melted = Lanes.map(c =>
        lineitem.filter(col(c).isNotNull)
          .select(lit(c).as("column_name"), col(c).cast("double").as("v")))
      .reduce(_.unionAll(_))
    melted
      .select(col("column_name"),
        floor(col("v") / lit(BucketWidth)).cast("long").as("bucket"),
        col("v"))
      .groupBy(col("column_name"), col("bucket"))
      .agg(count(lit(1)).as("c"), min(col("v")).as("lo"),
        max(col("v")).as("hi"))
  }

  def writeQuantileIndex(lineitem: DataFrame, dir: String): Unit = {
    DirSwap.reset(lineitem.sparkSession, s"$dir/hist")
    partials(lineitem)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/hist")
  }

  /** Fold newly ingested rows in — one additive partial-file append. */
  def appendToQuantileIndex(newRows: DataFrame, dir: String): Unit =
    partials(newRows).coalesce(1).write.mode("append")
      .parquet(DirSwap.resolve(newRows.sparkSession, s"$dir/hist"))

  /** Collapse per-batch partials ([[DirSwap]]): counts sum, bounds
    * min/max. */
  def compactQuantileIndex(spark: SparkSession, dir: String): Unit =
    DirSwap(spark, s"$dir/hist") { out =>
      spark.read.schema(HistSchema)
        .parquet(DirSwap.resolve(spark, s"$dir/hist"))
        .groupBy(col("column_name"), col("bucket"))
        .agg(sum(col("c")).as("c"), min(col("lo")).as("lo"),
          max(col("hi")).as("hi"))
        .coalesce(1).write.parquet(out)
    }

  /** The quantile enclosure report from the folded histogram:
    * (column_name, p, n_rows, v_lo, v_hi). */
  def quantilesFromIndex(spark: SparkSession, dir: String): DataFrame = {
    val hist = spark.read.schema(HistSchema)
      .parquet(DirSwap.resolve(spark, s"$dir/hist"))
      .groupBy(col("column_name"), col("bucket"))
      .agg(sum(col("c")).as("c"), min(col("lo")).as("lo"),
        max(col("hi")).as("hi"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val out = for {
      cn <- Lanes
      buckets = hist.filter(_._1 == cn).sortBy(_._2)
      if buckets.nonEmpty
      n = buckets.map(_._3).sum
      p <- Ps
    } yield {
      val pos = p * (n - 1).toDouble
      val rkLo = math.floor(pos).toLong
      val rkHi = math.ceil(pos).toLong
      def bucketAt(rk: Long): (String, Long, Long, Double, Double) = {
        var cum = 0L
        buckets.find { b =>
          val in = cum <= rk && rk < cum + b._3
          cum += b._3
          in
        }.getOrElse(throw new IllegalStateException(
          s"rank $rk out of range for $cn"))
      }
      (cn, p, n, bucketAt(rkLo)._4, bucketAt(rkHi)._5)
    }
    import spark.implicits._
    out.toDF("column_name", "p", "n_rows", "v_lo", "v_hi")
  }

  /** Declared query q_quantile_incr: lineitem (l_orderkey % 20 ≠ 0)
    * indexed once, the delta (l_orderkey % 20 = 0) folded in as a
    * micro-batch append; the enclosure read from the index must equal
    * the batch replay over ALL rows (additivity — the shared oracle
    * text is the law). */
  def quantileIncrQ(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.sources.Tables.lineitem(spark, dir)
    val idxDir = BuildOnce.tempDirFor("graft_quant_idx", dir)
    BuildOnce(spark, idxDir, Seq(dir)) {
      writeQuantileIndex(li.filter(col("l_orderkey") % 20 =!= 0), idxDir)
      appendToQuantileIndex(li.filter(col("l_orderkey") % 20 === 0), idxDir)
    }
    quantilesFromIndex(spark, idxDir)
  }
}
