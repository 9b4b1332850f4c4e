package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only scratch experiments for the per-query exec floor. */
object FloorLab {
  def main(args: Array[String]): Unit = {
    val spark = Lab.session()
    val sfDir = Lab.sfDir
    def li = graft.sources.Tables.lineitem(spark, sfDir)
    def bench(name: String)(f: => Unit): Unit = Lab.bench("floorlab", name)(f)

    bench("scan_only")(Lab.noop(li))
    bench("scan_project3")(Lab.noop(li.select("l_returnflag", "l_linestatus", "l_quantity")))
    bench("agg_plain_double")(Lab.noop(
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum("l_quantity"), avg("l_quantity"), count(lit(1)))))
    bench("agg_decimal")(Lab.noop(
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_extendedprice").cast("decimal(20,6)")).cast("double"))))
    // scaled-long is ~250 ms faster than any decimal form but overflows
    // int64 at 100 TB row counts — kept here as the measured bound on
    // what the decimal sum costs, not as a shippable shape
    bench("agg_scaled_long")(Lab.noop(
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg((sum(round(col("l_extendedprice") * 1e6).cast("long")) / 1e6).as("s"))))
    bench("agg_full_q_agg_group")(Lab.noop(graft.ops.Relational.aggGroup(spark, sfDir)))
    bench("agg_fanout_full")(Lab.noop(
      graft.sources.Tables.fanout(li)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(20,6)")).cast("double").as("sum_base_price"),
          avg("l_quantity").as("avg_qty"),
          count(lit(1)).as("count_order"))))
    spark.stop()
  }
}
