package graft.tools

/** Dev-only isolation of q_dedup_near's cost (round-5 bench triage):
  * replays the exact Bench sequence (full warmup pass, then interleaved
  * passes) and prints every q_dedup_near sample, to tell JIT ramp-up
  * from genuine per-sample cost in bench context. */
object NearLab {
  def main(args: Array[String]): Unit = {
    val spark = Lab.session()
    val dir = Lab.sfDir
    def run(name: String): Unit = {
      Lab.noop(graft.SparkEntry.queries(name)(spark, dir))
      graft.ops.PipelineCaches.release(spark)
      spark.sharedState.cacheManager.clearCache()
    }
    val ordered = graft.SparkEntry.queries.keys.toSeq.sorted
    def pass(tag: String): Unit = ordered.foreach { n =>
      val t0 = System.nanoTime(); run(n)
      val s = (System.nanoTime() - t0) / 1e9
      if (n == "q_dedup_near") println(f"[nearlab] $tag $n $s%.2f s")
    }
    pass("warmup")
    (1 to 3).foreach(i => pass(s"pass$i"))
    spark.stop()
  }
}
