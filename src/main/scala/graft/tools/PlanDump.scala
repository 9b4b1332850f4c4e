package graft.tools

/** Dev-only: print the executed plan of a named query after one run. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Lab.session()
    val sfDir = Lab.sfDir
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      Lab.noop(df)
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.treeString)
      graft.ops.PipelineCaches.release(spark)
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
