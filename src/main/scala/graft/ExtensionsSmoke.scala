package graft

import org.apache.spark.sql.SparkSession

/** Standalone smoke for the cluster-deployment registration path:
  * `sbt "runMain graft.ExtensionsSmoke"` builds a session WITH
  * GraftExtensions and resolves sorted_intersect_count through the
  * analyzer with no register() call — what a user gets from
  * `--conf spark.sql.extensions=graft.GraftExtensions`. Must run in
  * its own JVM (the test suite's shared session predates any
  * extension injection). */
object ExtensionsSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-smoke")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val got = Seq((Array(1L, 2L, 5L), Array(2L, 5L, 9L)))
      .toDF("a", "b")
      .selectExpr("sorted_intersect_count(a, b) AS c")
      .as[Int].head()
    require(got == 2, s"expected 2, got $got")
    println(s"[extensions-smoke] OK sorted_intersect_count resolved natively, result=$got")
    val h = Seq("hello").toDF("s")
      .selectExpr("md5_bits(s, 0, 15)",
        "cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)")
      .head()
    require(h.getLong(0) == h.getLong(1), s"md5_bits mismatch: $h")
    println(s"[extensions-smoke] OK md5_bits resolved natively, value=${h.getLong(0)}")
    val wm = Seq(Tuple1(Array(7L, 3L, 5L, 1L, 9L))).toDF("h")
      .selectExpr("winnow_mins(h, 3) AS m")
      .head().getSeq[Long](0)
    // windows of 3: min(7,3,5)=3, min(3,5,1)=1, min(5,1,9)=1 -> [3, 1]
    require(wm == Seq(3L, 1L), s"winnow_mins mismatch: $wm")
    println(s"[extensions-smoke] OK winnow_mins resolved natively, value=$wm")
    val dp = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("x", "y")
      .selectExpr("dot_double(x, y) AS d").head().getDouble(0)
    require(dp == 11.0, s"dot_double mismatch: $dp")
    println(s"[extensions-smoke] OK dot_double resolved natively, value=$dp")
    // 48 identical samples: one window pair, all gradients flat -> [0]
    val cf = Seq("a" * 48).toDF("s")
      .selectExpr("chroma_fp(s) AS f").head().getSeq[Long](0)
    require(cf == Seq(0L), s"chroma_fp mismatch: $cf")
    println(s"[extensions-smoke] OK chroma_fp resolved natively, value=$cf")
    spark.stop()
  }
}
