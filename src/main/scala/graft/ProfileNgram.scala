package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Dev-only stage profiler for the near-dup pipelines. */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    Engine.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, dir)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warmup count")(docs.count())

    import graft.ops.Dedup
    val tok = Dedup.tokens(graft.sources.Tables.fanout(docs)).cache()
    time("tokens materialize")(println("  tok=" + tok.count()))
    val sig = Dedup.signatures(tok).cache()
    time("signatures")(println("  sig=" + sig.count()))
    val nBands = Dedup.NumHashes / Dedup.BandSize
    val bandArr = array((0 until nBands).map { b =>
      struct(lit(b).as("band"), col(s"h${Dedup.BandSize * b}").as("b0"),
        col(s"h${Dedup.BandSize * b + 1}").as("b1"))
    }: _*)
    val bands = sig.select(col("doc_id"), explode(bandArr).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"),
        col("bb.b0").as("b0"), col("bb.b1").as("b1"))
    val left = bands.withColumnRenamed("doc_id", "doc_a")
    val right = bands.withColumnRenamed("doc_id", "doc_b")
    val cand = left.join(right, Seq("band", "b0", "b1"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    time("cand distinct")(println("  cand=" + cand.count()))
    val tokSets = tok
      .select(col("doc_id"),
        conv(substring(md5(col("token")), 1, 15), 16, 10).cast("long").as("th"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("th"))).as("toks"))
    time("tokSets")(tokSets.count())
    graft.functions.SortedLongIntersectCount.register(spark)
    val out = cand
      .join(broadcast(tokSets.select(col("doc_id").as("doc_a"), col("toks").as("toks_a"))), "doc_a")
      .join(broadcast(tokSets.select(col("doc_id").as("doc_b"), col("toks").as("toks_b"))), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        // keep in sync with Dedup.nearDupPairs: the shipped pipeline uses
        // the native expression, so the profile must too
        expr("sorted_intersect_count(toks_a, toks_b)").as("n_common"),
        size(col("toks_a")).as("na"), size(col("toks_b")).as("nb"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_common").cast("double") / (col("na") + col("nb") - col("n_common"))).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
    time("verify+filter")(println("  out=" + out.count()))
    time("full end-to-end (fresh)")(
      Dedup.nearDupPairs(graft.sources.Tables.documents(spark, dir))
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
