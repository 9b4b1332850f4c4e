package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only: decompose the exact-quantile pipeline's exec cost. */
object QuantLab {
  def main(args: Array[String]): Unit = {
    val spark = Lab.session()
    val sfDir = Lab.sfDir
    def li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("g"),
        col("l_quantity").cast("double").as("v0"),
        col("l_extendedprice").cast("double").as("v1"))
    def bench(name: String)(f: => Unit): Unit = Lab.bench("quantlab", name)(f)
    val grp = Window.partitionBy(col("g"))

    bench("scan3")(Lab.noop(li))
    bench("exchange_only")(Lab.noop(li.repartition(col("g"))))
    bench("exchange_sort1")(Lab.noop(li.repartition(col("g")).sortWithinPartitions(col("v1"))))
    bench("one_ranked_window")(Lab.noop(
      li.withColumn("i1", row_number().over(grp.orderBy(col("v1"))))))
    bench("two_ranked_windows")(Lab.noop(
      li.withColumn("i0", row_number().over(grp.orderBy(col("v0"))))
        .withColumn("i1", row_number().over(grp.orderBy(col("v1"))))))
    bench("count_window_only")(Lab.noop(
      li.withColumn("c0", count(col("v0")).over(grp))
        .withColumn("c1", count(col("v1")).over(grp))
        .withColumn("m", count(lit(1)).over(grp))))
    bench("full_current")(Lab.noop(graft.ops.Relational.quantileQ(spark, sfDir)))
    spark.stop()
  }
}
