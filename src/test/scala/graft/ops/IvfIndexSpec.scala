package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Persisted-IVF-index behaviors: the probe plan must read only the
  * probed cells' partitions, and the answer must match the in-memory
  * operator exactly (same centroids, same arithmetic, same data). */
class IvfIndexSpec extends SparkSuite {

  private def embDf = spark.read.parquet(s"$sf/embeddings.parquet")

  test("probe reads are partition-pruned and match in-memory ivfTopK") {
    val dir = Files.createTempDirectory("graft_ivf").toString
    SimSearch.writeIvfIndex(embDf, dir)

    val probes = embDf.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val fromIndex = SimSearch.ivfTopKFromIndex(spark, dir, probes)

    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("cell"),
      "probe scan must carry a cell partition filter:\n" + plan.take(700))

    def triples(df: org.apache.spark.sql.DataFrame) =
      df.select(col("probe_id").cast("long"), col("neighbor_id").cast("long"),
          col("rnk")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val mem = triples(SimSearch.ivfTopK(embDf))
    val idx = triples(fromIndex)
    assert(mem.nonEmpty)
    assert(idx == mem, s"index answer diverged: missing=${mem -- idx} extra=${idx -- mem}")
  }

  test("index layout: one directory per cell, centroids persisted") {
    val dir = Files.createTempDirectory("graft_ivf2").toString
    SimSearch.writeIvfIndex(embDf, dir, nCells = 8)
    val cellDirs = new java.io.File(s"$dir/cells").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty && cellDirs.length <= 8,
      s"expected ≤8 cell partitions, got ${cellDirs.length}")
    assert(spark.read.parquet(s"$dir/centroids").count() == 8)
  }
}
