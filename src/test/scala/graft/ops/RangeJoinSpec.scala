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

  test("law: binned interval-overlap join equals naive overlap join, exactly once") {
    import spark.implicits._
    val a = Seq((0L, 0.0, 10.0), (1L, 5.0, 5.0), (2L, 20.0, 45.0),
      (3L, -8.0, -2.0), (4L, 50.0, 40.0) /* inverted: empty */)
      .toDF("aid", "a_lo", "a_hi")
    val b = Seq((0L, 9.9, 30.0), (1L, 10.0, 10.0), (2L, -3.0, 0.0),
      (3L, 44.9, 60.0), (4L, 100.0, 200.0), (5L, 3.0, 1.0) /* inverted */)
      .toDF("bid", "b_lo", "b_hi")
    // multiset compare: set equality would hide a pair matched in TWO
    // shared bins — the first-shared-bin dedup must yield each pair once.
    // The naive side must ALSO drop inverted intervals: lo > hi is an
    // EMPTY interval (declared BETWEEN semantics), yet the raw overlap
    // predicate alone would still accept it against a wide partner
    val naive = a.filter(col("a_lo") <= col("a_hi"))
      .join(b.filter(col("b_lo") <= col("b_hi")),
        col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq.sorted
    assert(naive.nonEmpty)
    for (w <- Seq(0.5, 7.0, 25.0, 1000.0)) {
      val binned = Relational.intervalOverlapJoinBinned(
          a, b, "a_lo", "a_hi", "b_lo", "b_hi", w)
        .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq.sorted
      assert(binned == naive, s"binWidth=$w: $binned vs $naive")
    }
  }

  test("q_join_interval: equi-join plan, no duplicate orders, rows > 0") {
    val q = Relational.intervalJoinQ(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(800))
    val n = q.count()
    assert(n > 0)
    assert(q.select("o_orderkey").distinct().count() == n)
  }

  test("asof tolerance law: stale matches flip to null, in-window " +
    "matches are identical to the unbounded asof") {
    import org.apache.spark.sql.functions._
    def dateOf(r: org.apache.spark.sql.Row): Option[java.time.LocalDate] =
      if (r.isNullAt(2)) None
      else Some(r.getTimestamp(2).toLocalDateTime.toLocalDate)
    val unb = Relational.asofJoin(spark, sf).collect()
      .map(r => r.getLong(0) -> (dateOf(r), r.getLong(3))).toMap
    val tol = Relational.asofJoinTolerance(spark, sf).collect()
      .map(r => r.getLong(0) -> (dateOf(r), r.getLong(3))).toMap
    assert(tol.keySet == unb.keySet, "left semantics: every event emits")
    val ts = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("ts")).collect()
      .map(r => r.getLong(0) ->
        r.getTimestamp(1).toLocalDateTime.toLocalDate).toMap
    var flipped = 0
    tol.foreach { case (id, (d, nRecent)) =>
      val (du, nu) = unb(id)
      assert(nRecent <= nu, "the window can only shrink the match count")
      (du, d) match {
        case (Some(u), Some(b)) =>
          assert(b == u, "an in-window latest must be THE latest")
        case (Some(u), None) =>
          // flipped to null: the unbounded latest was stale
          assert(u.isBefore(ts(id).minusDays(365)),
            s"event $id lost a non-stale match")
          flipped += 1
        case (None, Some(_)) => fail(s"event $id gained a match from a bound")
        case (None, None) => ()
      }
    }
    assert(flipped > 0, "fixture must exercise the staleness cut")
  }
}
