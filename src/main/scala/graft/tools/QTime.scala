package graft.tools

/** Dev-only single-query timer: `runMain graft.tools.QTime q_a q_b ...`
  * times the named declared queries on SPARK_GRAFT_SF_DIR with the
  * Bench protocol (noop sink, warm 2 / min of 3, caches released
  * between runs) — the per-query feedback loop without a full Bench
  * pass. */
object QTime {
  def main(args: Array[String]): Unit = {
    val spark = Lab.session()
    val sfDir = Lab.sfDir
    val names = if (args.nonEmpty) args.toSeq else Seq("q_profile")
    for (name <- names) {
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      Lab.bench("qtime", name) {
        Lab.noop(fn(spark, sfDir))
        graft.ops.PipelineCaches.release(spark)
        spark.sharedState.cacheManager.clearCache()
      }
    }
    spark.stop()
  }
}
