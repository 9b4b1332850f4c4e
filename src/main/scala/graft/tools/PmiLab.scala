package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only decomposition of q_pmi's cost (round-9). */
object PmiLab {
  def main(args: Array[String]): Unit = {
    val spark = Lab.session()
    val docs = graft.sources.Tables.documents(spark, Lab.sfDir)
    def bench(name: String)(f: => Unit): Unit = Lab.bench("pmilab", name)(f)

    val toksF = graft.sources.Tables.fanout(docs)
      .select(split(lower(trim(col("text"))), "\\s+").as("toks"))
      .withColumn("toks", filter(col("toks"), t => t =!= ""))

    bench("tokenize_only")(Lab.noop(toksF))
    bench("uni_count")(Lab.noop(
      toksF.select(explode(col("toks")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n_uni"))))
    bench("bi_count_seq")(Lab.noop(
      toksF.filter(size(col("toks")) >= 2)
        .select(explode(transform(sequence(lit(0), size(col("toks")) - 2),
          i => struct(col("toks")(i).as("tok_a"), col("toks")(i + 1).as("tok_b")))).as("p"))
        .select(col("p.tok_a"), col("p.tok_b"))
        .groupBy(col("tok_a"), col("tok_b")).agg(count(lit(1)).as("n_ab"))))
    bench("pair_count_transform")(Lab.noop(
      toksF.select(explode(transform(col("toks"), (t, i) =>
          struct(t.as("tok_a"),
            when(i < size(col("toks")) - 1, col("toks")(i + 1)).as("tok_b")))).as("p"))
        .select(col("p.tok_a"), col("p.tok_b"))
        .groupBy(col("tok_a"), col("tok_b")).agg(count(lit(1)).as("n_ab"))))
    bench("q_pmi_full") {
      Lab.noop(graft.ops.TextOps.pmiQ(docs))
      graft.ops.PipelineCaches.release(spark)
      spark.sharedState.cacheManager.clearCache()
    }
    // staged: where do the post-pair-count milliseconds go?
    def pairsDf = toksF.select(explode(transform(col("toks"), (t, i) =>
        struct(t.as("tok_a"),
          when(i < size(col("toks")) - 1, col("toks")(i + 1)).as("tok_b")))).as("p"))
      .select(col("p.tok_a"), col("p.tok_b"))
      .groupBy(col("tok_a"), col("tok_b")).agg(count(lit(1)).as("n_ab"))
    bench("pairs_cache_materialize") {
      val p = pairsDf.cache()
      Lab.noop(p)
      p.unpersist()
    }
    bench("pairs_cached_then_uni") {
      val p = pairsDf.cache()
      Lab.noop(p)
      Lab.noop(p.groupBy(col("tok_a").as("token")).agg(sum(col("n_ab")).as("n_uni")))
      p.unpersist()
    }
    bench("pairs_cached_then_all") {
      val p = pairsDf.cache()
      val uni = p.groupBy(col("tok_a").as("token")).agg(sum(col("n_ab")).as("n_uni")).cache()
      val bi = p.filter(col("tok_b").isNotNull)
      val totals = p.agg(sum(col("n_ab")).as("n_total"),
        sum(when(col("tok_b").isNotNull, col("n_ab"))).as("b_total"))
      val out = bi.filter(col("n_ab") >= 5)
        .join(uni.withColumnRenamed("token", "tok_a").withColumnRenamed("n_uni", "n_a"), Seq("tok_a"))
        .join(uni.withColumnRenamed("token", "tok_b").withColumnRenamed("n_uni", "n_b"), Seq("tok_b"))
        .crossJoin(broadcast(totals))
        .select(col("tok_a"), col("tok_b"), col("n_ab"),
          round(log((col("n_ab").cast("double") / col("b_total")) /
            ((col("n_a").cast("double") / col("n_total")) *
              (col("n_b").cast("double") / col("n_total")))), 6).as("pmi"))
        .orderBy(col("pmi").desc, col("tok_a").asc, col("tok_b").asc)
        .limit(50)
      Lab.noop(out)
      uni.unpersist(); p.unpersist()
    }
    spark.stop()
  }
}
