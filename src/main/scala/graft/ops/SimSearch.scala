package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Similarity search over embedding columns (ArrayType(FloatType)).
  *
  * All vector math is pure array expressions (`zip_with` + `aggregate`)
  * — element-wise double arithmetic folded left-to-right, which both
  * Spark and the DuckDB oracle evaluate in index order, so dot products
  * are bitwise reproducible across engines.
  *
  * Scale posture: brute-force top-k broadcasts the (small) probe set and
  * streams the corpus once — at 100 TB this is the map-side of a single
  * scan, and per-probe top-k is a window over probe_id (shuffle is
  * k·|probes| rows, not the corpus). The LSH-bucketed variant
  * (signBucketTopK) prunes the corpus scan to matching sign-buckets first.
  */
object SimSearch {

  /** Fold-left sum of an array<double> column. */
  private def arrSum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column = arrSum(zip_with(a, b, (x, y) => x * y))

  def l2Norm(a: Column): Column = sqrt(arrSum(transform(a, x => x * x)))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Brute-force cosine top-k: probes = vec_id < nProbes, candidates =
    * whole corpus minus self. Deterministic tie-break (sim desc, id asc). */
  def cosineTopK(spark: SparkSession, dir: String, nProbes: Int = 5, k: Int = 5): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
    val probes = emb.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("nrm").as("pn"))
    val sims = emb.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        (dot(col("v"), col("pv")) / (col("nrm") * col("pn"))).as("cos_sim"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    sims.withColumn("rnk", row_number().over(w).cast("long")).filter(col("rnk") <= k)
  }

  /** Embedding-cosine near-duplicate pairs (the vector analog of the text
    * dedup family): deterministic sign-bucket blocking (first `bits` dims)
    * → per-bucket self-join → cosine ≥ threshold. The bucketing is part of
    * the declared semantics (both engines compute the identical buckets),
    * so the result is exact-per-definition and oracle-checkable, while the
    * self-join stays per-bucket — at 100 TB the shuffle key is the bucket,
    * never all-pairs. Hot buckets split under AQE skew handling; for
    * higher recall run again with rotated sign projections and union. */
  def embedNearDup(spark: SparkSession, dir: String, bits: Int = 8,
      threshold: Double = 0.25): DataFrame = {
    val bucketExpr = concat((0 until bits).map(i =>
      when(element_at(col("v"), i + 1) > 0, lit("1")).otherwise(lit("0"))): _*)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
      .withColumn("bucket", bucketExpr)
    val a = emb.select(col("bucket"), col("vec_id").as("vec_a"),
      col("v").as("va"), col("nrm").as("na"))
    val b = emb.select(col("bucket"), col("vec_id").as("vec_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** Sign-bucket LSH variant (the scale path): bucket = sign bits of the
    * first `bits` coordinates; probes only scan candidates sharing their
    * bucket. Approximate — recall measured against cosineTopK in
    * SimilaritySpec, not against an oracle. */
  def signBucketTopK(spark: SparkSession, dir: String, nProbes: Int = 5, k: Int = 5,
      bits: Int = 8): DataFrame = {
    val bucketExpr = concat((0 until bits).map(i =>
      when(element_at(col("v"), i + 1) > 0, lit("1")).otherwise(lit("0"))): _*)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
      .withColumn("bucket", bucketExpr)
    val probes = emb.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"),
        col("nrm").as("pn"), col("bucket"))
    val sims = emb.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        (dot(col("v"), col("pv")) / (col("nrm") * col("pn"))).as("cos_sim"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    sims.withColumn("rnk", row_number().over(w).cast("long")).filter(col("rnk") <= k)
  }
}
