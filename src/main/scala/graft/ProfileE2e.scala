package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.ops.{Dedup, PipelineCaches, Sampling}

/** Dev-only stage profiler for the e2e corpus composition over the
  * ScaleSmoke survivable corpus: times each stage of
  * [[graft.ops.Cleaning.e2eCorpusOf]] separately at the given k values
  * in ONE JVM (first k doubles as the C2 warmup the Bench protocol
  * uses), so a superlinear composition names the stage responsible.
  *
  * Usage: sbt "runMain graft.ProfileE2e [k1,k2,...]"
  */
object ProfileE2e {
  def main(args: Array[String]): Unit = {
    val ks = args.headOption.getOrElse("16,16,64").split(",").map(_.toInt)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    Engine.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    def time[A](k: Int, label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[e2eprof] k=$k%-3d $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      r
    }
    for (k <- ks) {
      val docs = ScaleSmoke.survivableCorpus(spark, 5000L, k)
      val evalPred = col("doc_id") % 10_000_000L < 50
      val corpus = docs.filter(!evalPred)
      time(k, "generate+count")(docs.count())
      val verdicts =
        graft.ops.Cleaning.cleanVerdictsOf(docs.filter(evalPred), corpus).cache()
      time(k, "clean_verdicts")(verdicts.count())
      val victims = Dedup.nearDupPairs(corpus)
        .select(col("doc_b").as("doc_id")).distinct()
      time(k, "near_dup_victims")(victims.count())
      val staged = verdicts
        .join(victims.withColumn("is_nd", lit(true)), Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chars"),
          when(col("reason").isin("keep", "contaminated") && col("is_nd"),
            lit("near_duplicate")).otherwise(col("reason")).as("reason"))
        .cache()
      val keepers = corpus.join(
        staged.filter(col("reason") === "keep").select("doc_id"),
        Seq("doc_id"), "left_semi")
      val cleaned = time(k, "substring_excise") {
        val c = Dedup.substringDedup(keepers)
          .select(col("doc_id"), col("clean_text").as("text"))
        c.count(); c
      }
      val rules = time(k, "bpe_train")(
        graft.ops.Bpe.trainMerges(graft.ops.Bpe.wordCounts(docs), 6))
      println(s"[e2eprof] k=$k rules=${rules.size}")
      val encLens = time(k, "bpe_encode") {
        val e = graft.ops.Bpe.encodedLengths(docs, cleaned, k = 6)
        e.count(); e
      }
      time(k, "pack_shard")(
        Sampling.packSequencesOn(encLens, col("enc_len"), 512)
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total"))
          .count())
      PipelineCaches.release(spark)
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
