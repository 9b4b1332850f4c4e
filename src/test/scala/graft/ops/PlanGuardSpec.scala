package graft.ops

import graft.{SparkEntry, SparkSuite}

/** Plan guard-rails over EVERY declared query: physical-plan shapes that
  * must never regress, checked at planning time (no execution).
  *
  *  - No CartesianProduct anywhere: every join must ride a key or an
  *    explicit broadcast — an accidental cross product is the classic
  *    silent 100 TB killer.
  *  - BroadcastNestedLoopJoin only where DECLARED: the brute-force
  *    similarity scans intentionally broadcast a tiny probe set against
  *    the corpus (crossJoin(broadcast(probes))); anywhere else a BNLJ
  *    means a join lost its equi-condition.
  */
class PlanGuardSpec extends SparkSuite {

  // the canonical declared-BNLJ list (with per-query justifications)
  // lives in graft.PlanAllowances — shared with PlanSweepSpec so the
  // two guards can never drift again
  private val bnljAllowed = graft.PlanAllowances.bnljAllowed

  test("skew split join: hot path broadcasts by construction, cold path shuffles") {
    // isolated session (suites may run in parallel; see DedupVerifyModeSpec)
    // with auto-broadcast OFF: any BroadcastHashJoin left in the plan is
    // there because skewSplitJoin HINTED it — the guarantee that the hot
    // fact slice never shuffles cannot silently decay into a sort-merge
    // join once the dim outgrows the auto threshold
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s.implicits._
    val fact = ((0 until 5000).map(_ => ("hot", 1L)) ++
      (0 until 200).map(i => (s"k${i % 50}", 2L))).toDF("k", "v")
    val dim = ((0 until 50).map(i => (s"k$i", i)) :+ (("hot", -1))).toDF("k", "d")
    val plan = Skew.skewSplitJoin(fact, dim, "k", hotThreshold = 1000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "hot slice must ride hinted broadcasts:\n" + plan.take(800))
    // EXACTLY one shuffle join — the cold slice. The hot-side splits
    // and the hot dim join are all hinted broadcasts; a second
    // SortMergeJoin means one of those hints was lost and a hot slice
    // decayed to a shuffle (the regression this guard exists for — a
    // bare contains() check stays green through that decay because the
    // cold join supplies its SMJ and the semi-joins their BHJ).
    val smjCount = "SortMergeJoin".r.findAllIn(plan).size
    assert(smjCount == 1,
      s"expected exactly the cold-slice SortMergeJoin, found $smjCount:\n" + plan.take(800))
  }

  test("no declared query plans a cartesian product; BNLJ only where declared") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n${plan.take(500)}")
      if (!bnljAllowed(name)) {
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans an undeclared BroadcastNestedLoopJoin:\n${plan.take(500)}")
      }
    }
  }
}
