package graft.sources

import org.apache.spark.sql.functions.col

import graft.SparkSuite

/** Source-layer behaviors: fanout's starvation guard and Catalog's
  * registration memo. */
class TablesSpec extends SparkSuite {

  test("fanout un-starves a single-row-group table to session parallelism") {
    // the generator writes each test table as ONE file with ONE row
    // group — exactly the shape where byte-based split estimates lie
    // (slices beyond the row-group midpoint carry zero rows), so the
    // probe must still choose to repartition
    val docs = Tables.documents(spark, sf)
    assert(docs.rdd.getNumPartitions < spark.sparkContext.defaultParallelism,
      "fixture table should scan as fewer partitions than cores (else this spec is vacuous)")
    val fanned = Tables.fanout(docs)
    assert(fanned.rdd.getNumPartitions == spark.sparkContext.defaultParallelism,
      "single-row-group input must be repartitioned to the session's parallelism")
  }

  test("catalog memo: same dir skips re-registration, dir change re-points views") {
    val sf001 = "/root/testdata/sf0.001"
    val sf01 = "/root/testdata/sf0.01"
    Catalog.registerAll(spark, sf001)
    val small = spark.table("lineitem").count()
    Catalog.registerAll(spark, sf001) // memo hit: must keep views valid
    assert(spark.table("lineitem").count() == small)
    Catalog.registerAll(spark, sf01) // dir change: must RE-register
    val big = spark.table("lineitem").count()
    assert(big > small,
      s"views must follow the dir change (sf0.01=$big rows vs sf0.001=$small)")
    Catalog.registerAll(spark, sf001) // and back
    assert(spark.table("lineitem").count() == small)
  }
}
