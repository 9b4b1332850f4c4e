package graft.sources

import org.apache.spark.sql.SparkSession

/** SQL-surface entry point: registers every test-data table as a temp
  * view so `spark.sql("...")` works over the same data the DataFrame
  * operators read. At production scale these would be catalog tables
  * (partitioned/bucketed); temp views are the local seam.
  */
object Catalog {
  val tables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def registerAll(spark: SparkSession, dir: String): Unit =
    tables.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case t => Tables.read(spark, dir, t).createOrReplaceTempView(t)
    }
}
