package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only: decompose the exact-quantile pipeline's exec cost. */
object QuantLab {
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
      (1 to 2).foreach(_ => f)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"[quantlab] $name%-32s min=${ts.min}%8.1f ms")
    }
    def li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("g"),
        col("l_quantity").cast("double").as("v0"),
        col("l_extendedprice").cast("double").as("v1"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val grp = Window.partitionBy(col("g"))

    bench("scan3")(noop(li))
    bench("exchange_only")(noop(li.repartition(col("g"))))
    bench("exchange_sort1")(noop(li.repartition(col("g")).sortWithinPartitions(col("v1"))))
    bench("one_ranked_window")(noop(
      li.withColumn("i1", row_number().over(grp.orderBy(col("v1"))))))
    bench("two_ranked_windows")(noop(
      li.withColumn("i0", row_number().over(grp.orderBy(col("v0"))))
        .withColumn("i1", row_number().over(grp.orderBy(col("v1"))))))
    bench("count_window_only")(noop(
      li.withColumn("c0", count(col("v0")).over(grp))
        .withColumn("c1", count(col("v1")).over(grp))
        .withColumn("m", count(lit(1)).over(grp))))
    bench("full_current")(noop(graft.ops.Relational.quantileQ(spark, sfDir)))
    spark.stop()
  }
}
