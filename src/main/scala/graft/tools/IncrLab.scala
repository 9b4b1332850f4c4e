package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: decompose q_dedup_incr into index-write vs delta-query. */
object IncrLab {
  def main(args: Array[String]): Unit = {
    val spark = Lab.session()
    val sfDir = Lab.sfDir
    val docs = graft.sources.Tables.documents(spark, sfDir).select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 4 =!= 0)
    val delta = docs.filter(col("doc_id") % 4 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("incrlab").toString
    Lab.bench("incrlab", "write_index") {
      graft.ops.Dedup.writeNearDupIndex(corpus, s"$dir/idx")
      graft.ops.PipelineCaches.release(spark)
    }
    val nf = new java.io.File(s"$dir/idx/bands").listFiles().map(d =>
      if (d.isDirectory) d.listFiles().length else 1).sum
    println(s"[incrlab] bands file count = $nf")
    Lab.bench("incrlab", "query_delta") {
      Lab.noop(graft.ops.Dedup.nearDupsAgainstIndex(spark, delta, s"$dir/idx"))
      graft.ops.PipelineCaches.release(spark)
    }
    // build (eager: meta read + touched collect, materializes caches)
    // vs exec (the verify action)
    (1 to 3).foreach { _ =>
      val t0 = System.nanoTime()
      val q = graft.ops.Dedup.nearDupsAgainstIndex(spark, delta, s"$dir/idx")
      val t1 = System.nanoTime()
      Lab.noop(q)
      val t2 = System.nanoTime()
      graft.ops.PipelineCaches.release(spark)
      println(f"[incrlab] build=${(t1 - t0) / 1e6}%8.1f ms  exec=${(t2 - t1) / 1e6}%8.1f ms")
    }
    // decomposition of the delta-query stages
    Lab.bench("incrlab", "delta_tokens") {
      Lab.noop(graft.ops.Dedup.tokens(graft.sources.Tables.fanout(delta)))
    }
    Lab.bench("incrlab", "delta_toksets") {
      val tok = graft.ops.Dedup.tokens(graft.sources.Tables.fanout(delta))
      Lab.noop(tok.select(col("doc_id"),
          conv(substring(md5(col("token")), 1, 15), 16, 10).cast("long").as("th"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_set(col("th"))).as("toks")))
    }
    Lab.bench("incrlab", "bands_scan_only") {
      Lab.noop(spark.read.parquet(s"$dir/idx/bands"))
    }
    Lab.bench("incrlab", "index_toksets_scan") {
      Lab.noop(spark.read.parquet(s"$dir/idx/toksets"))
    }
    spark.stop()
  }
}
