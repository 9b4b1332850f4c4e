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

  test("append against stored centroids equals a whole-corpus rebuild; compaction collapses files") {
    val whole = Files.createTempDirectory("graft_ivf_w").toString
    val split = Files.createTempDirectory("graft_ivf_s").toString
    SimSearch.writeIvfIndex(embDf, whole)
    // same deterministic centroid sample on the 95% slice would differ —
    // build the split index from the SAME centroids the whole one used
    SimSearch.writeIvfIndexWith(embDf.filter(col("vec_id") % 20 =!= 0),
      spark.read.parquet(s"$whole/centroids"), split)
    SimSearch.appendToIvfIndex(spark, embDf.filter(col("vec_id") % 20 === 0), split)
    SimSearch.appendToIvfIndex(spark, embDf.limit(0), split) // empty append is a no-op
    val probes = embDf.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    def triples(dir: String) =
      SimSearch.ivfTopKFromIndex(spark, dir, probes)
        .select(col("probe_id").cast("long"), col("neighbor_id").cast("long"),
          col("rnk")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val before = triples(split)
    assert(before == triples(whole), "append-built index must answer like the rebuild")
    // compaction: one file per cell partition, identical answers
    def dataFiles(dir: String) = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(physicalDir(s"$dir/cells")).filter(_.getName.endsWith(".parquet"))
    }
    val filesBefore = dataFiles(split).length
    SimSearch.compactIvfIndex(spark, split)
    val cellDirs = physicalDir(s"$split/cells").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    cellDirs.foreach { d =>
      val n = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(n == 1, s"${d.getName}: $n files after compaction")
    }
    assert(dataFiles(split).length < filesBefore, "compaction must shrink the file count")
    assert(triples(split) == before, "compaction must preserve answers")
  }

  test("index layout: one directory per cell, centroids persisted") {
    val dir = Files.createTempDirectory("graft_ivf2").toString
    SimSearch.writeIvfIndex(embDf, dir, nCells = 8)
    val cellDirs = physicalDir(s"$dir/cells").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty && cellDirs.length <= 8,
      s"expected ≤8 cell partitions, got ${cellDirs.length}")
    assert(spark.read.parquet(s"$dir/centroids").count() == 8)
  }
}
