package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only stage profiler for ngramJaccardPairs. The staged frames
  * below copy the pipeline's plans verbatim, so their cached results
  * WOULD be picked up by the end-to-end runs through the CacheManager's
  * canonicalized-plan matching — the cache is cleared before each
  * end-to-end measurement so "fresh" means fresh. */
object NgramLab {
  def main(args: Array[String]): Unit = {
    val spark = Lab.session()
    val dir = Lab.sfDir
    import graft.ops.Dedup
    val docs = graft.sources.Tables.documents(spark, dir)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ngramlab] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warmup")(docs.count())
    val n = 3; val maxDf = 50
    val docSets = graft.sources.Tables.fanout(docs)
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        array_distinct(transform(sequence(lit(0), size(col("toks")) - n),
          i => conv(substring(md5(concat_ws(" ", slice(col("toks"), i + 1, lit(n)))), 1, 15), 16, 10)
            .cast("long"))).as("shs"))
      .cache()
    time("docSets")(println("  docs=" + docSets.count()))
    val frequent = docSets.select(explode(col("shs")).as("shingle"))
      .groupBy(col("shingle")).agg(count(lit(1)).as("df_cnt"))
      .filter(col("df_cnt") > maxDf)
      .agg(collect_set(col("shingle")).as("freq"))
    time("frequent")(println("  freq rows=" + frequent.count()))
    val shSets = docSets.crossJoin(broadcast(frequent))
      .select(col("doc_id"),
        array_sort(array_except(col("shs"), coalesce(col("freq"), array()))).as("shs"))
      .cache()
    time("shSets")(println("  shSets=" + shSets.count()))
    val shf = shSets.select(col("doc_id"), explode(col("shs")).as("shingle"))
    val cand = shf.as("a").join(shf.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    time("cand")(println("  cand=" + cand.count()))
    spark.sharedState.cacheManager.clearCache()
    time("full end-to-end (fresh)")(Lab.noop(
      Dedup.ngramJaccardPairs(graft.sources.Tables.documents(spark, dir))))
    spark.sharedState.cacheManager.clearCache()
    time("full again (fresh)")(Lab.noop(
      Dedup.ngramJaccardPairs(graft.sources.Tables.documents(spark, dir))))
    spark.stop()
  }
}
