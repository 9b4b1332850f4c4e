package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: time a subset of SparkEntry.queries at sf0.1 with the same
  * protocol as [[Bench]] (noop sink, cache clear between runs), taking
  * the min of 3 runs (one more than Bench's min-of-2 — dev runs favor a
  * steadier floor over wall time).
  * Usage: runMain graft.BenchOne q_dedup_ngram q_quantile [...]. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Engine.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    def runOne(name: String): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      t
    }
    Seq("q_scalar", "q_agg_group").foreach(runOne) // warmup
    args.foreach { name =>
      val times = (1 to 3).map(_ => runOne(name))
      println(f"[benchone] $name%-24s min=${times.min}%.3f s  runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
