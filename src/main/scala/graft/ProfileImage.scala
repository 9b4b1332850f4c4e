package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Dev-only stage profiler for the incremental image-dedup probe. */
object ProfileImage {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    Engine.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[img] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.ops.MultiModal
    val docs = graft.sources.Tables.documents(spark, dir)
    time("warmup")(docs.count())
    // full query twice (BuildOnce already built after run 1)
    time("full q run1")(MultiModal.imageDedupIncrQ(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.sharedState.cacheManager.clearCache()
    graft.ops.PipelineCaches.release(spark)
    time("full q run2")(MultiModal.imageDedupIncrQ(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.sharedState.cacheManager.clearCache()
    graft.ops.PipelineCaches.release(spark)
    // stage decomposition
    val base = docs.filter(length(col("text")) >= 1)
      .select(col("doc_id"), col("text"))
    val idxDir = graft.ops.BuildOnce.tempDirFor("graft_image_idx", dir)
    val delta = MultiModal.withPayload(
      base.select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text").substr(lit(1),
            greatest(lit(1), floor(length(col("text")) / 2).cast("int")) - 1),
          lit("~"), col("text").substr(
            greatest(lit(1), floor(length(col("text")) / 2).cast("int")) + 1,
            length(col("text")))).as("text")))
    time("delta dHash only")(
      delta.select(col("doc_id"), MultiModal.dHash(decode(col("payload"), "UTF-8")).as("fp"))
        .write.format("noop").mode("overwrite").save())
    time("index full read count")(
      println("  idx rows=" + spark.read.parquet(s"$idxDir/bands").count()))
    time("probe only")(
      MultiModal.imageNearDupsAgainstIndex(spark, delta, idxDir)
        .write.format("noop").mode("overwrite").save())
    spark.sharedState.cacheManager.clearCache()
    graft.ops.PipelineCaches.release(spark)
    time("probe only (2nd)")(
      MultiModal.imageNearDupsAgainstIndex(spark, delta, idxDir)
        .write.format("noop").mode("overwrite").save())
    // bucket-count sensitivity of the pruned read
    Seq(32, 64).foreach { nb =>
      val d2 = s"/tmp/graft_image_idx_b$nb"
      MultiModal.writeImageIndex(MultiModal.withPayload(base), d2, bandBuckets = nb)
      time(s"probe only (buckets=$nb)")(
        MultiModal.imageNearDupsAgainstIndex(spark, delta, d2)
          .write.format("noop").mode("overwrite").save())
      spark.sharedState.cacheManager.clearCache()
      graft.ops.PipelineCaches.release(spark)
      time(s"probe 2nd  (buckets=$nb)")(
        MultiModal.imageNearDupsAgainstIndex(spark, delta, d2)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
