package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Bucketed-table co-located join: with both sides bucketed (and
  * sorted) on the join key, the sort-merge join must plan WITHOUT an
  * Exchange on either side — the shuffle-free fact⋈fact path that
  * carries the engine's 100 TB join posture. */
class BucketingSpec extends SparkSuite {

  test("co-bucketed sort-merge join plans with no Exchange and right results") {
    // isolated session: broadcasts off so the join is SMJ, without
    // racing other suites' plan assertions on the shared conf
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val o = Tables.orders(s, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val l = Tables.lineitem(s, sf)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Bucketing.writeBucketed(o, "bkt_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(l, "bkt_lineitem", "o_orderkey", 4)
    try {
      val joined = Bucketing.colocatedJoin(s, "bkt_orders", "bkt_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(600))
      assert(!plan.contains("Exchange"),
        "co-bucketed join must not shuffle either side:\n" + plan.take(900))

      // parity with the plain (shuffled) join on raw parquet
      val expected = o.join(l, "o_orderkey").count()
      assert(joined.count() == expected)
      assert(expected > 0)
    } finally {
      s.sql("DROP TABLE IF EXISTS bkt_orders")
      s.sql("DROP TABLE IF EXISTS bkt_lineitem")
    }
  }

  test("joinInnerBucketed: fact-edge SMJ has no Exchange beneath it; parity with joinInner") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val s = spark.newSession()
    // plain plan for subtree assertions (no AQE wrapper) and no
    // broadcast on the fact edge so the SMJ path is what's pinned
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    Bucketing.registerFactTables(s, sf, buckets = 4)
    try {
      val q = graft.ops.Relational.joinInnerBucketed(s, sf)
      val plan = q.queryExecution.executedPlan
      val factSmj = plan.collect {
        case j: SortMergeJoinExec if j.leftKeys.mkString.contains("o_orderkey") => j
      }
      assert(factSmj.nonEmpty, s"fact edge must plan as SMJ:\n${plan.toString.take(900)}")
      assert(factSmj.head.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        "bucket-sorted scans must feed the fact SMJ with no Exchange:\n" +
          factSmj.head.toString.take(900))

      val got = q.collect().map(r => (r.getString(0), math.round(r.getDouble(1)), r.getLong(2))).toSet
      val exp = graft.ops.Relational.joinInner(s, sf).collect()
        .map(r => (r.getString(0), math.round(r.getDouble(1)), r.getLong(2))).toSet
      assert(got == exp, "bucketed and raw-parquet q_join_inner must agree")
    } finally {
      s.sql(s"DROP TABLE IF EXISTS ${Bucketing.OrdersBkt}")
      s.sql(s"DROP TABLE IF EXISTS ${Bucketing.LineitemBkt}")
    }
  }

  test("aggGroupBucketed: parallel map phase (one task per bucket); parity with aggGroup") {
    val s = spark.newSession()
    Bucketing.registerFactTables(s, sf, buckets = 4)
    try {
      val q = graft.ops.Relational.aggGroupBucketed(s, sf)
      // the point of the twin: the raw fixture scan is ONE map task
      // (single row group), the bucketed scan is one per bucket — the
      // decimal partial sums run in parallel
      val scanParts = s.table(Bucketing.LineitemBkt).rdd.getNumPartitions
      assert(scanParts == 4, s"bucketed scan must parallelize: $scanParts")

      def key(r: org.apache.spark.sql.Row) =
        (r.getString(0), r.getString(1), math.round(r.getDouble(2) * 100),
          math.round(r.getDouble(3) * 100), math.round(r.getDouble(4) * 100),
          math.round(r.getDouble(5) * 1000), r.getTimestamp(6), r.getTimestamp(7),
          r.getLong(8))
      val got = q.collect().map(key).toSet
      val exp = graft.ops.Relational.aggGroup(s, sf).collect().map(key).toSet
      assert(got == exp, "bucketed and raw-parquet q_agg_group must agree")
    } finally {
      s.sql(s"DROP TABLE IF EXISTS ${Bucketing.OrdersBkt}")
      s.sql(s"DROP TABLE IF EXISTS ${Bucketing.LineitemBkt}")
    }
  }
}
