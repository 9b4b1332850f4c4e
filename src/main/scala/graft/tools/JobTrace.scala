package graft.tools

import org.apache.spark.scheduler._

import java.util.concurrent.ConcurrentHashMap

/** Dev-only: per-JOB attribution for one declared query — prints each
  * Spark job's wall ms, task count and driver call site, so a
  * multi-job composition's fixed job-count floor can be attributed to
  * its passes (which are inherent rounds, which are removable).
  * Usage: sbt "runMain graft.tools.JobTrace q_e2e_corpus" */
object JobTrace {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobTrace <query>")
    val spark = Lab.session()
    val sfDir = Lab.sfDir
    val starts = new ConcurrentHashMap[Int, (Long, String)]()
    val tasks = new ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicInteger]()
    val stageToJob = new ConcurrentHashMap[Int, Int]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), site))
        tasks.put(j.jobId, new java.util.concurrent.atomic.AtomicInteger(0))
        j.stageIds.foreach(s => stageToJob.put(s, j.jobId))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val j = stageToJob.get(t.stageId)
        Option(tasks.get(j)).foreach(_.incrementAndGet())
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.get(j.jobId)).foreach { case (t0, site) =>
          val ms = (System.nanoTime() - t0) / 1e6
          val nt = Option(tasks.get(j.jobId)).map(_.get).getOrElse(0)
          lines.add(f"job ${j.jobId}%3d ${ms}%8.1f ms  tasks=$nt%4d  $site")
        }
      }
    })
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm once so steady-state job shape is traced
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      graft.ops.PipelineCaches.release(spark)
      spark.sharedState.cacheManager.clearCache()
      org.apache.spark.GraftListenerDrain.drain(spark.sparkContext)
      lines.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      graft.ops.PipelineCaches.release(spark)
      spark.sharedState.cacheManager.clearCache()
      org.apache.spark.GraftListenerDrain.drain(spark.sparkContext)
      println(f"===== $name  total=$sec%.3f s =====")
      lines.forEach(l => println(l))
    }
    spark.stop()
  }
}
