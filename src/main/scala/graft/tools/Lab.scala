package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared harness for the dev-only profiling mains in this package:
  * one place for the bench session config and the warm/min-of-N timing
  * protocol, so the tools can't drift apart. */
object Lab {
  def session(): SparkSession = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // match Bench: codegen class cache big enough that interleaved
      // runs measure steady-state cost, not Janino recompilation
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    graft.Engine.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def sfDir: String = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

  /** Full materialization without result transfer — same sink Bench uses. */
  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Warm `warm` times, then report the min of `runs` timed runs (ms). */
  def bench(tag: String, name: String, warm: Int = 2, runs: Int = 3)(f: => Unit): Unit = {
    (1 to warm).foreach(_ => f)
    val ts = (1 to runs).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    println(f"[$tag] $name%-32s min=${ts.min}%8.1f ms")
  }
}
