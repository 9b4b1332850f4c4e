package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: decompose the exact-quantile pipeline's exec cost (the
  * range-partitioned intra-group-parallel form). */
object QuantLab {
  def main(args: Array[String]): Unit = {
    val spark = Lab.session()
    val sfDir = Lab.sfDir
    def li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("g"),
        col("l_quantity").cast("double").as("v0"),
        col("l_extendedprice").cast("double").as("v1"))
    def long = li.select(col("g"),
        expr("stack(2, 0, v0, 1, v1) as (ci, v)"))
      .filter(col("v").isNotNull)
    def tagged = long.repartitionByRange(32, col("g"), col("ci"), col("v"))
      .withColumn("pid", spark_partition_id())
    def bench(name: String)(f: => Unit): Unit = Lab.bench("quantlab", name)(f)

    bench("scan_stack")(Lab.noop(long))
    bench("range_exchange")(Lab.noop(tagged))
    bench("counts_branch")(Lab.noop(
      tagged.groupBy(col("pid"), col("g"), col("ci")).agg(count(lit(1)).as("c"))))
    bench("sorted_lrn_branch")(Lab.noop(
      tagged.sortWithinPartitions(col("g"), col("ci"), col("v"))
        .withColumn("lrn0",
          monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)))))
    bench("distinct_groups")(Lab.noop(li.select(col("g")).distinct()))
    // release tracked caches per run, as Bench does — the cold-run cost
    // is what the driver's bench records
    bench("full_current") {
      Lab.noop(graft.ops.Relational.quantileQ(spark, sfDir))
      graft.ops.PipelineCaches.release(spark)
    }
    // dispatch input as quantileQ builds it: what does the planner say?
    println("[quantlab] dispatch sizeInBytes = " +
      graft.sources.Tables.lineitem(spark, sfDir)
        .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
        .queryExecution.optimizedPlan.stats.sizeInBytes)
    // head-to-head: the radix-select form forced (threshold 0)
    bench("full_by_select") {
      Lab.noop(graft.ops.Relational.exactPercentiles(
        graft.sources.Tables.lineitem(spark, sfDir)
          .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice")),
        "l_returnflag",
        Seq("l_quantity" -> Seq(0.5 -> "median_qty", 0.95 -> "p95_qty"),
          "l_extendedprice" -> Seq(0.5 -> "median_price")),
        smallInputBytes = 0L))
      graft.ops.PipelineCaches.release(spark)
    }
    // head-to-head: the sort fallback on the same JVM/machine state
    bench("full_by_sort") {
      Lab.noop(graft.ops.Relational.exactPercentilesBySort(
        graft.sources.Tables.lineitem(spark, sfDir)
          .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice")),
        "l_returnflag",
        Seq("l_quantity" -> Seq(0.5 -> "median_qty", 0.95 -> "p95_qty"),
          "l_extendedprice" -> Seq(0.5 -> "median_price"))))
      graft.ops.PipelineCaches.release(spark)
    }
    spark.stop()
  }
}
