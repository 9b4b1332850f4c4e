package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: decompose the composed cleaning pipeline's exec cost. */
object CleanLab {
  def main(args: Array[String]): Unit = {
    val spark = Lab.session()
    val sfDir = Lab.sfDir
    def docs = graft.sources.Tables.documents(spark, sfDir)
    def corpus = docs.filter(col("doc_id") >= 50)
    def evalDocs = docs.filter(col("doc_id") < 50)
    def bench(name: String)(f: => Unit): Unit = Lab.bench("cleanlab", name)(f)

    bench("scan_only")(Lab.noop(corpus.select("doc_id", "lang")))
    bench("perrow_signals")(Lab.noop(
      graft.sources.Tables.fanout(corpus)
        .select(col("doc_id"), col("lang"),
          length(col("text")).cast("long").as("n_chars"),
          lit(1L).as("q_keep") /* stand-in: lab measures pass shape, not the expr */,
          lit(0.0).as("dup_2gram_frac"),
          md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))).as("norm_hash"))))
    bench("perrow_plus_sortrun")(Lab.noop(
      graft.sources.Tables.fanout(corpus)
        .select(col("doc_id"),
          sort_array(filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= ""))
            .as("s"))
        .select(col("doc_id"), aggregate(col("s"),
          struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
          (acc, x) => {
            val newRun = when(x === acc("prev"), acc("run") + 1L).otherwise(lit(1L))
            struct(x.as("prev"), newRun.as("run"),
              greatest(acc("best"), newRun).as("best"))
          },
          acc => acc("best")).as("best"))))
    bench("old_toptok_aggchain")(Lab.noop(
      graft.sources.Tables.fanout(corpus)
        .select(col("doc_id"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("c")).as("top_c"), sum(col("c")).as("n_nonempty"))))
    bench("shingle_arr_only")(Lab.noop(
      graft.sources.Tables.fanout(corpus)
        .select(col("doc_id"),
          size(graft.ops.Dedup.shingleArrayTestSeam(col("text"), 8, spark)).as("ns"))))
    bench("evalrow_only")(Lab.noop(graft.ops.Dedup.evalShingleRowTestSeam(evalDocs)))
    bench("contam_only") {
      Lab.noop(graft.ops.Dedup.contamination(corpus, evalDocs))
      graft.ops.PipelineCaches.release(spark)
    }
    bench("full_current") {
      Lab.noop(graft.ops.Cleaning.corpusCleanQ(spark, sfDir))
      graft.ops.PipelineCaches.release(spark)
    }
    spark.stop()
  }
}
