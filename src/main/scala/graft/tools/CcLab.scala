package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only decomposition of q_dup_clusters (round-5): init pipeline
  * cost vs per-round star cost, and the round count at sf scale. */
object CcLab {
  def main(args: Array[String]): Unit = {
    val spark = Lab.session()
    val dir = Lab.sfDir
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[cclab] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }
    // warm the md5 paths
    Lab.noop(graft.SparkEntry.queries("q_dedup_near")(spark, dir))
    graft.ops.PipelineCaches.release(spark)
    spark.sharedState.cacheManager.clearCache()

    val pairs = graft.ops.Dedup.nearDupPairs(
      graft.sources.Tables.documents(spark, dir))
    // mirrors connectedComponents' init exactly (NO distinct — the
    // operator deliberately skips it; measuring a different pipeline
    // here would misattribute the init-vs-rounds split)
    val init = t("init pairs+checkpoint") {
      pairs.select(col("doc_a").cast("long").as("x"), col("doc_b").cast("long").as("y"))
        .filter(col("x") =!= col("y"))
        .select(greatest(col("x"), col("y")).as("u"), least(col("x"), col("y")).as("v"))
        .localCheckpoint()
    }
    println(s"[cclab] edges=${init.count()}")
    val labels = t("full connectedComponents") {
      val l = graft.ops.Components.connectedComponents(pairs)
      Lab.noop(l); l
    }
    println(s"[cclab] labels=${labels.count()}")
    spark.stop()
  }
}
