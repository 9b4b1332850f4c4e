package graft.tools

import org.apache.spark.sql.functions._

object BloomLab {
  def main(args: Array[String]): Unit = {
    val spark = Lab.session()
    val sfDir = Lab.sfDir
    def docs = graft.sources.Tables.documents(spark, sfDir)
    def corpus = docs.filter(col("doc_id") >= 50)
    def evalDocs = docs.filter(col("doc_id") < 50)
    graft.ops.BloomJoin.register(spark)
    def bench(name: String)(f: => Unit): Unit = Lab.bench("bloomlab", name)(f)
    // shingle explode only
    def sh = graft.sources.Tables.fanout(corpus)
      .select(col("doc_id"),
        graft.ops.Dedup.shingleArrayTestSeam(col("text"), 8, spark).as("shs"))
      .select(col("doc_id"), col("shs"), size(col("shs")).cast("long").as("n"))
      .select(col("doc_id"), col("n"), explode(col("shs")).as("shingle"))
    bench("explode_count")(Lab.noop(sh.groupBy(col("doc_id")).agg(count(lit(1)))))
    // the direct-generator spelling contamination uses (no staged column)
    def shDirect = graft.sources.Tables.fanout(corpus)
      .select(col("doc_id"),
        explode(graft.ops.Dedup.shingleArrayTestSeam(col("text"), 8, spark)).as("shingle"))
    bench("explode_direct_seamarr")(Lab.noop(
      shDirect.groupBy(col("doc_id")).agg(count(lit(1)))))
    // staged WITHOUT sort_array: is the sort the cost?
    def shNoSort = graft.sources.Tables.fanout(corpus)
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("toks"))
      .select(col("doc_id"), array_distinct(transform(
        sequence(lit(0), greatest(size(col("toks")) - 8, lit(-1))),
        i => conv(substring(md5(concat_ws(" ", slice(col("toks"), i + 1, lit(8)))), 1, 15), 16, 10).cast("long"))).as("shs"))
      .select(col("doc_id"), size(col("shs")).cast("long").as("n"), explode(col("shs")).as("shingle"))
    bench("explode_staged_nosort")(Lab.noop(
      shNoSort.groupBy(col("doc_id")).agg(count(lit(1)))))
    val ev = graft.ops.Dedup.contaminationQ(docs).sparkSession // noop
    def evalSet = {
      val e = evalDocs.select(col("doc_id"),
        graft.ops.Dedup.shingleArrayTestSeam(col("text"), 8, spark).as("shs"))
        .select(explode(col("shs")).as("shingle")).distinct()
      e.createOrReplaceTempView("graft_eval_shingles")
      e
    }
    evalSet.count()
    bench("bloom_subquery_only")(Lab.noop(
      spark.sql(s"SELECT ${graft.ops.BloomJoin.AggFn}(shingle, 100000L, 1600000L) FROM graft_eval_shingles")))
    bench("explode_bloom_filter_count")(Lab.noop(
      sh.filter(expr(s"${graft.ops.BloomJoin.ContainsFn}((SELECT ${graft.ops.BloomJoin.AggFn}(shingle, 100000L, 1600000L) FROM graft_eval_shingles), shingle)"))
        .groupBy(col("doc_id")).agg(count(lit(1)))))
    spark.stop()
  }
}
