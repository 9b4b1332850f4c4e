package graft.tools

import java.nio.file.{Files, Paths}

/** Dev-only single-query slice of [[graft.Verify]]: dump just the named
  * queries' results + their oracle SQL to an outDir, so
  * tools/check_oracle.py can gate one new query without re-running the
  * whole registry.
  * Usage: runMain graft.tools.VerifyOne /tmp/v1 q_semantic_dedup [...]
  * (reads SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.01) */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: VerifyOne <outDir> <query> [query...]")
    val outDir = args.head
    val names = args.tail.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Lab.session()
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      graft.ops.PipelineCaches.release(spark)
      spark.sharedState.cacheManager.clearCache()
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
