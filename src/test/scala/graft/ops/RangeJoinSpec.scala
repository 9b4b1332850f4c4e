package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Binned range join: equality with the naive non-equi join (which
  * Spark plans as BNLJ) across bin widths, and the plan guarantee that
  * the binned form joins on an equi key. */
class RangeJoinSpec extends SparkSuite {

  test("law: binned range join equals naive BETWEEN join for any bin width") {
    import spark.implicits._
    val pts = Seq(0.0, 5.0, 19.99, 20.0, 39.5, 100.0, -3.0, 59.9)
      .zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
    val iv = Seq((0L, 0.0, 19.99), (1L, 10.0, 29.9), (2L, 40.0, 60.0),
      (3L, -10.0, -1.0), (4L, 55.0, 42.0) /* inverted: empty */)
      .toDF("iid", "lo", "hi")
    val naive = pts.join(iv, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    for (w <- Seq(1.0, 7.5, 20.0, 1000.0)) {
      val binned = Relational.rangeJoinBinned(pts, iv, "p", "lo", "hi", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(binned == naive, s"binWidth=$w")
    }
  }

  test("binned plan is an equi join, not BNLJ") {
    val q = Relational.rangeJoinQ(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(800))
    assert(q.count() > 0)
  }
}
