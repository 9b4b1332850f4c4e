package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Results are materialized
  * through the `noop` sink — a full execution of every operator including
  * result-column computation — rather than `count()`, which lets Catalyst
  * prune the compute down to a row count and would overstate throughput.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Engine.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    def runOne(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Boolean = {
      val ok =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          true
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
            false
        }
      // ops that cache intermediates (the dedup family) would otherwise
      // serve the second timed run from the CacheManager and leak blocks
      // into later queries' memory/timings
      spark.sharedState.cacheManager.clearCache()
      ok
    }
    // JVM/codegen warmup: a few representative queries untimed, so the
    // first timed query doesn't absorb JIT + classloader + codegen-cache
    // costs (~5 s once per JVM, irrelevant at cluster scale).
    Seq("q_scalar", "q_agg_group", "q_win_tumble")
      .foreach(n => SparkEntry.queries.get(n).foreach(fn => runOne(n, fn)))
    // two timed runs per query (three when the min exceeds 1 s — the
    // expensive queries are exactly where a transient load spike or GC
    // pause distorts a 2-sample min), report the min: the queries are
    // deterministic and caches are cleared between runs, so the spread
    // is scheduler noise — min is the steady-state cost. A failed
    // query is reported as -1, never as a fast-fail "success" time.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def timed() = {
        val t0 = System.nanoTime()
        val ok = runOne(name, fn)
        (ok, (System.nanoTime() - t0) / 1e9)
      }
      var runs = (1 to 2).map(_ => timed())
      if (runs.forall(_._1) && runs.map(_._2).min > 1.0) runs = runs :+ timed()
      val t = if (runs.forall(_._1)) runs.map(_._2).min else -1.0
      name -> t
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
