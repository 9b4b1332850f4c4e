package graft.ops

import org.apache.spark.sql.functions._

import graft.tools.Lab

/** Dev-only: decompose q_dedup_fuzzy_incr (fuzzyMatchAgainstIndex) into
  * candidate generation vs edit-distance verify, with candidate counts,
  * so the expensive stage is measured before it is touched (guide §1).
  * Usage: sbt "runMain graft.ops.FuzzyLab"  (SPARK_GRAFT_SF_DIR). */
object FuzzyLab {
  def main(args: Array[String]): Unit = {
    val spark = Lab.session()
    val sfDir = Lab.sfDir
    val docs = graft.sources.Tables.documents(spark, sfDir).select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 20 =!= 0)
    val delta = docs.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("fuzzylab").toString
    Dedup.writeNearDupIndex(corpus, s"$dir/idx")
    PipelineCaches.release(spark)

    def candidates() = {
      val probeBands = PipelineCaches.track(
        Dedup.bandsOf(Dedup.signatures(Dedup.tokArrays(delta)))
          .withColumnRenamed("doc_id", "probe_id"))
      val bandBuckets = 256L
      val touched = probeBands
        .select(pmod(col("b0"), lit(bandBuckets)).as("bkt"))
        .distinct().collect().map(_.getLong(0))
      spark.read.schema(
          org.apache.spark.sql.types.StructType.fromDDL(
            "doc_id LONG, band INT, b0 LONG, b1 LONG, bkt LONG"))
        .parquet(s"${DirSwap.resolve(spark, s"$dir/idx/bands")}")
        .filter(col("bkt").isin(touched.toIndexedSeq: _*))
        .join(broadcast(probeBands), Seq("band", "b0", "b1"))
        .filter(col("probe_id") =!= col("doc_id"))
        .select(col("probe_id"), col("doc_id").as("match_id"))
        .distinct()
    }

    val nCand = candidates().count()
    PipelineCaches.release(spark)
    println(s"[fuzzylab] candidate pairs = $nCand, probes = ${delta.count()}")

    Lab.bench("fuzzylab", "candidates_only") {
      Lab.noop(candidates()); PipelineCaches.release(spark)
    }
    Lab.bench("fuzzylab", "full_lookup") {
      Lab.noop(Dedup.fuzzyMatchAgainstIndex(spark, delta, s"$dir/idx", corpus))
      PipelineCaches.release(spark)
    }
    // verify decomposition: re-spell editVerify's stages inline
    def norm(df: org.apache.spark.sql.DataFrame, idOut: String, textOut: String) =
      df.select(col("doc_id").as(idOut),
        lower(trim(regexp_replace(col("text"), "\\s+", " "))).as(textOut))
    val simThreshold = 0.8
    val maxLen = greatest(length(col("text_a")), length(col("text_b")))
    val cand = PipelineCaches.track(candidates())
    val attached = cand
      .repartition(32)
      .join(broadcast(norm(delta, "probe_id", "text_a")), "probe_id")
      .join(norm(corpus, "match_id", "text_b"), "match_id")
      .filter(abs(length(col("text_a")) - length(col("text_b")))
        <= (lit(1.0) - simThreshold) * maxLen)
    println(s"[fuzzylab] post-length-filter pairs = ${attached.count()}")
    println(s"[fuzzylab] equal-text pairs = ${attached.filter(col("text_a") === col("text_b")).count()}")
    Lab.bench("fuzzylab", "attach_and_lenfilter") {
      Lab.noop(attached)
    }
    Lab.bench("fuzzylab", "dp_cap127_flat") {
      Lab.noop(attached.select(col("probe_id"), col("match_id"),
        when(col("text_a") === col("text_b"), lit(0))
          .otherwise(levenshtein(col("text_a"), col("text_b"), 127)).as("d")))
    }
    for (cap <- Seq(8, 31, 63)) {
      Lab.bench("fuzzylab", s"dp_cap${cap}_flat") {
        Lab.noop(attached.select(col("probe_id"), col("match_id"),
          levenshtein(col("text_a"), col("text_b"), cap).as("d")))
      }
    }
    Lab.bench("fuzzylab", "control_no_dp") {
      Lab.noop(attached.select(col("probe_id"), col("match_id"),
        (length(col("text_a")) + length(col("text_b"))).as("d")))
    }
    // per-row budget cap: does the Levenshtein expression accept a
    // non-foldable threshold, and what does it cost?
    val budgeted = attached
      .withColumn("__cap",
        (ceil(maxLen * (lit(1.0) - simThreshold)) + 1).cast("int"))
      .select(col("probe_id"), col("match_id"), col("text_a"), col("text_b"),
        expr("levenshtein(text_a, text_b, __cap)").as("d"), col("__cap"))
    println(s"[fuzzylab] budgeted rows = ${budgeted.count()}")
    Lab.bench("fuzzylab", "dp_per_row_budget") { Lab.noop(budgeted) }
    // parity: per-row-budget survivors == flat-127 survivors (both
    // spelled against the final double filter)
    val survA = budgeted
      .select(col("probe_id"), col("match_id"),
        when(col("d") < 0, col("__cap") + 1).otherwise(col("d")).as("d"),
        greatest(length(col("text_a")), length(col("text_b"))).as("ml"))
      .filter(lit(1.0) - col("d").cast("double") / col("ml") >= simThreshold)
      .select("probe_id", "match_id", "d")
    val survB = attached
      .select(col("probe_id"), col("match_id"),
        levenshtein(col("text_a"), col("text_b")).as("d"),
        greatest(length(col("text_a")), length(col("text_b"))).as("ml"))
      .filter(lit(1.0) - col("d").cast("double") / col("ml") >= simThreshold)
      .select("probe_id", "match_id", "d")
    println(s"[fuzzylab] survivors budget=${survA.count()} exact=${survB.count()} diff=${survA.except(survB).count() + survB.except(survA).count()}")
    PipelineCaches.release(spark)
    spark.stop()
  }
}
