package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.ops.{PipelineCaches, Sampling}

/** Dev-only sub-stage profiler for the e2e tail (BPE encode + pack):
  * inputs are CACHED and materialized before each timed operation, so
  * every number is the operation alone, not its upstream lineage —
  * the confound that made ProfileE2e's composed timings cumulative.
  * The encoder table goes through the persisted-artifact seam
  * (writeEncoder / encodedLengthsFromIndex), splitting train cost
  * from the corpus encode join.
  *
  * Usage: sbt "runMain graft.ProfileE2e2 [k1,k2,...]"
  */
object ProfileE2e2 {
  def main(args: Array[String]): Unit = {
    val ks = args.headOption.getOrElse("16,16,64").split(",").map(_.toInt)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    Engine.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    def time[A](k: Int, label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[e2eprof2] k=$k%-3d $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      r
    }
    for (k <- ks) {
      val docs = ScaleSmoke.survivableCorpus(spark, 5000L, k).cache()
      time(k, "gen+cache")(docs.count())
      val dir = s"/tmp/graft_e2eprof2_k$k"
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      time(k, "train+enc_table")(graft.ops.Bpe.writeEncoder(docs, dir, k = 6))
      val encLens = graft.ops.Bpe.encodedLengthsFromIndex(spark, dir, docs).cache()
      time(k, "encode_join")(println("  encoded=" + encLens.count()))
      time(k, "pack")(
        Sampling.packSequencesOn(encLens, col("enc_len"), 512)
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total"))
          .count())
      PipelineCaches.release(spark)
      docs.unpersist(); encLens.unpersist()
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
