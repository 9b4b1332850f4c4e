package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev-only per-query cost profiler: runs named queries (default: all)
  * through the Bench protocol's noop sink and reports, per query, the
  * wall seconds plus the COUNTED execution shape — Spark jobs, stages,
  * tasks, shuffle bytes written and spilled — via a SparkListener.
  *
  * The job count is the optimization-round lens: at the sf0.1 fixture a
  * Spark job costs ~70 ms of scheduler floor regardless of data, so a
  * query's fixed job count IS its fixture cost, and every driver
  * round-trip it names (eager count/collect, per-round train collects,
  * index builds) is also a full pass/barrier at 100 TB.
  *
  * Usage: sbt "runMain graft.ProfileJobs [q_name ...]"
  *   SPARK_GRAFT_SF_DIR selects the dataset (default sf0.1).
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    Engine.tune(spark)
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shuffleWrite = new AtomicLong(0L)
    val spillDisk = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spillDisk.addAndGet(m.diskBytesSpilled)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def runOne(name: String): Unit = {
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      graft.ops.PipelineCaches.release(spark)
      spark.sharedState.cacheManager.clearCache()
    }

    val selected =
      if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted
      else args.toSeq
    // full warmup pass (Bench protocol: steady-state numbers only)
    selected.foreach { n =>
      try runOne(n)
      catch { case e: Throwable =>
        System.err.println(s"[profjobs] warmup $n FAILED: ${e.getMessage}") }
    }
    println(f"${"query"}%-28s ${"sec"}%7s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s ${"shufMB"}%8s ${"spillMB"}%8s")
    selected.foreach { name =>
      // settle the listener bus so counts attribute to the right query
      org.apache.spark.GraftListenerDrain.drain(spark.sparkContext)
      jobs.set(0); stages.set(0); tasks.set(0)
      shuffleWrite.set(0L); spillDisk.set(0L)
      val t0 = System.nanoTime()
      val ok = try { runOne(name); true }
        catch { case e: Throwable =>
          System.err.println(s"[profjobs] $name FAILED: ${e.getMessage}"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftListenerDrain.drain(spark.sparkContext)
      if (ok) println(f"$name%-28s $sec%7.3f ${jobs.get}%5d ${stages.get}%7d ${tasks.get}%6d ${shuffleWrite.get / 1e6}%8.1f ${spillDisk.get / 1e6}%8.1f")
    }
    spark.stop()
  }
}
