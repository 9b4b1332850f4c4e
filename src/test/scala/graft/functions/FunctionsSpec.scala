package graft.functions

import graft.SparkSuite
import graft.sources.Catalog

/** UDAF surface + SQL catalog: the registered typed Aggregators must
  * agree with the builtins they mirror, through the spark.sql path. */
class FunctionsSpec extends SparkSuite {

  test("count_agg / avg_agg agree with builtin count / avg via SQL") {
    Aggregators.register(spark)
    Catalog.registerAll(spark, sf)
    val rows = spark.sql(
      """SELECT l_suppkey,
        |count_agg(l_orderkey) AS c_udaf, count(*) AS c_builtin,
        |avg_agg(l_orderkey) AS a_udaf, avg(l_orderkey) AS a_builtin
        |FROM lineitem GROUP BY l_suppkey""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("c_udaf") == r.getAs[Long]("c_builtin"))
      assert(math.abs(r.getAs[Double]("a_udaf") - r.getAs[Double]("a_builtin")) < 1e-9)
    }
  }

  test("sql catalog exposes every table") {
    Catalog.registerAll(spark, sf)
    Catalog.tables.foreach { t =>
      assert(spark.sql(s"SELECT * FROM $t LIMIT 1").count() == 1, s"table $t empty")
    }
  }
}
