package graft.tools

/** Dev-only: probe shared-ANSI-text support (LATERAL, WITH RECURSIVE)
  * against the session's SQL parser before declaring queries on it. */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val spark = Lab.session()
    graft.sources.Catalog.registerAll(spark, Lab.sfDir)
    val lateral =
      """SELECT n_name, t.c_name, t.c_acctbal
        |FROM nation, LATERAL (
        |  SELECT c_name, c_acctbal FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t""".stripMargin
    val recursive =
      """WITH RECURSIVE chain AS (
        |  SELECT CAST(s_suppkey AS BIGINT) AS k, CAST(0 AS BIGINT) AS depth
        |  FROM supplier WHERE s_suppkey = 1
        |  UNION ALL
        |  SELECT CAST(s.s_suppkey AS BIGINT), c.depth + 1
        |  FROM supplier s JOIN chain c ON CAST(floor(s.s_suppkey / 2.0) AS BIGINT) = c.k
        |  WHERE s.s_suppkey > 1)
        |SELECT depth, count(*) AS n_nodes, min(k) AS min_key, max(k) AS max_key,
        |       sum(k) AS sum_keys
        |FROM chain GROUP BY depth""".stripMargin
    for ((n, q) <- Seq("lateral" -> lateral, "recursive" -> recursive)) {
      try {
        val df = spark.sql(q)
        val rows = df.collect()
        println(s"[probe] $n OK rows=${rows.length} head=${rows.take(3).mkString("; ")}")
        println(s"[probe] $n plan ops: " + df.queryExecution.executedPlan.toString
          .linesIterator.map(_.trim.dropWhile(!_.isLetter).takeWhile(c => c.isLetterOrDigit))
          .filter(_.nonEmpty).toSeq.distinct.mkString(","))
      } catch {
        case e: Exception => println(s"[probe] $n FAIL ${e.getClass.getSimpleName}: ${e.getMessage.take(300)}")
      }
    }
    spark.stop()
  }
}
