package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Dev-only decomposition of q_profile's cost (round-9: the melt
  * regressed 1.14 s → 1.3-1.7 s after the NTZ accessor normalization;
  * find the lane that pays). */
object ProfLab {
  def main(args: Array[String]): Unit = {
    val spark = Lab.session()
    val sfDir = Lab.sfDir
    def bench(name: String)(f: => Unit): Unit = Lab.bench("proflab", name)(f)

    bench("q_profile_full")(Lab.noop(graft.ops.Relational.profileQ(spark, sfDir)))

    val li = graft.sources.Tables.fanout(graft.sources.Tables.lineitem(spark, sfDir))
    def melt(cols: Seq[(String, Column)], asString: Boolean): DataFrame = {
      val vType = if (asString) "string" else "double"
      val melted = li.select(explode(array(cols.map { case (n, c) =>
        struct(lit(n).as("cn"), c.cast(vType).as("v"))
      }: _*)).as("m")).select(col("m.cn").as("cn"), col("m.v").as("v"))
      melted.groupBy(col("cn"), col("v")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("cn")).agg(sum(col("cnt")).as("n_rows"), count(col("v")).as("nd"))
    }
    bench("melt_num4_with_ship")(Lab.noop(melt(Seq(
      ("l_orderkey", col("l_orderkey")), ("l_quantity", col("l_quantity")),
      ("l_extendedprice", col("l_extendedprice")),
      ("l_shipdate", col("l_shipdate").cast("timestamp"))), asString = false)))
    bench("melt_num3_no_ship")(Lab.noop(melt(Seq(
      ("l_orderkey", col("l_orderkey")), ("l_quantity", col("l_quantity")),
      ("l_extendedprice", col("l_extendedprice"))), asString = false)))
    bench("melt_ship_only")(Lab.noop(melt(Seq(
      ("l_shipdate", col("l_shipdate").cast("timestamp"))), asString = false)))
    bench("melt_str2")(Lab.noop(melt(Seq(
      ("l_returnflag", col("l_returnflag")), ("l_linestatus", col("l_linestatus"))),
      asString = true)))
    // codegen-split exact profile: wide count/min/max subtrees (as the
    // sketch form) + one countDistinct subtree per column, crossJoined
    val liRaw = graft.sources.Tables.lineitem(spark, sfDir)
    val num = Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate")
    val str = Seq("l_returnflag", "l_linestatus")
    bench("split_exact") {
      def vAggs(ns: Seq[String], lead: Seq[Column]) =
        lead ++ ns.flatMap { n => Seq(
          count(col(n)).as(s"cnt_$n"), min(col(n)).as(s"min_$n"),
          max(col(n)).as(s"max_$n")) }
      def agg1(cs: Seq[Column]) = liRaw.agg(cs.head, cs.tail: _*)
      val wide = agg1(vAggs(num, Seq(count(lit(1)).as("n_rows"))))
        .crossJoin(agg1(vAggs(str, Nil)))
      val withNd = (num ++ str).foldLeft(wide) { (w, n) =>
        w.crossJoin(liRaw.agg(count_distinct(col(n)).as(s"nd_$n")))
      }
      def toNum(n: String, c: Column): Column =
        if (n == "l_shipdate") c.cast("timestamp").cast("double") else c.cast("double")
      def row(n: String, numeric: Boolean) =
        struct(lit(n).as("column_name"), col("n_rows"),
          (col("n_rows") - col(s"cnt_$n")).as("n_nulls"),
          col(s"nd_$n").as("n_distinct"),
          (if (numeric) toNum(n, col(s"min_$n")) else lit(null).cast("double")).as("min_num"),
          (if (numeric) toNum(n, col(s"max_$n")) else lit(null).cast("double")).as("max_num"),
          (if (numeric) lit(null).cast("string") else col(s"min_$n")).as("min_str"),
          (if (numeric) lit(null).cast("string") else col(s"max_$n")).as("max_str"))
      Lab.noop(withNd.select(explode(array(
        num.map(n => row(n, numeric = true)) ++
          str.map(n => row(n, numeric = false)): _*)).as("p"))
        .select("p.*"))
    }
    spark.stop()
  }
}
