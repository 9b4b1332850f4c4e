package graft.tools

/** Dev-only microscope for the per-query fixed floor: splits each named
  * query's wall time into build (DataFrame construction + analysis),
  * plan (optimization + physical planning), and exec (noop write), min
  * of 3 each, on the Bench session config.
  * Usage: runMain graft.tools.Probe q_agg_group q_quantile [...] */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Lab.session()
    val sfDir = Lab.sfDir
    def ms[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e6)
    }
    // warmup
    Seq("q_scalar", "q_agg_group").foreach { n =>
      Lab.noop(graft.SparkEntry.queries(n)(spark, sfDir))
      spark.sharedState.cacheManager.clearCache()
    }
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val runs = (1 to 3).map { _ =>
        val (df, tBuild) = ms(fn(spark, sfDir))
        val (_, tPlan) = ms(df.queryExecution.executedPlan)
        val (_, tExec) = ms(Lab.noop(df))
        spark.sharedState.cacheManager.clearCache()
        (tBuild, tPlan, tExec)
      }
      val b = runs.map(_._1).min; val p = runs.map(_._2).min; val e = runs.map(_._3).min
      println(f"[probe] $name%-24s build=$b%7.1f ms  plan=$p%7.1f ms  exec=$e%7.1f ms")
    }
    spark.stop()
  }
}
