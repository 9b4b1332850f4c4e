package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch experiments for the per-query exec floor. */
object FloorLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.Engine.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    def bench(name: String)(f: => Unit): Unit = {
      (1 to 2).foreach(_ => f) // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"[floorlab] $name%-32s min=${ts.min}%8.1f ms")
    }
    def li = graft.sources.Tables.lineitem(spark, sfDir)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    bench("scan_only")(noop(li))
    bench("scan_project3")(noop(li.select("l_returnflag", "l_linestatus", "l_quantity")))
    bench("agg_plain_double")(noop(
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum("l_quantity"), avg("l_quantity"), count(lit(1)))))
    bench("agg_decimal")(noop(
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_extendedprice").cast("decimal(20,6)")).cast("double"))))
    bench("agg_full_q_agg_group")(noop(graft.ops.Relational.aggGroup(spark, sfDir)))
    bench("agg_fanout_plain")(noop(
      graft.sources.Tables.fanout(li).groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum("l_quantity"), avg("l_quantity"), count(lit(1)))))
    bench("agg_decimal18")(noop(
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,6)")).cast("double"))))
    bench("agg_decimal_12_2")(noop(
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double"))))
    bench("agg_scaled_long")(noop(
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg((sum(round(col("l_extendedprice") * 1e6).cast("long")) / 1e6).as("s"))))
    bench("agg_scaled_decimal")(noop(
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg((sum(round(col("l_extendedprice") * 1e6).cast("long").cast("decimal(20,0)"))
          .cast("double") / 1e6).as("s"))))
    bench("agg_fanout_full")(noop(
      graft.sources.Tables.fanout(li)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(20,6)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(20,6)"))
            .cast("double").as("sum_disc_price"),
          avg("l_quantity").as("avg_qty"),
          min("l_shipdate").as("min_ship"),
          max("l_shipdate").as("max_ship"),
          count(lit(1)).as("count_order"))))
    spark.stop()
  }
}
