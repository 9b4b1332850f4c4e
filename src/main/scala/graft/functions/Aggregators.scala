package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface (SURVEY.md §2.4 "UDF surface"): the two aggregate
  * shapes the reference hand-writes, re-expressed as Spark `Aggregator`s
  * with the same acc/add/merge decomposition — which is exactly Spark's
  * partial (map-side) + final aggregation contract, so both run with
  * map-side combine like any builtin.
  *
  * These exist to declare the extension seam; the engine's own queries
  * use the builtin `count`/`avg` (codegen'd, faster). Registered SQL
  * names: `count_agg`, `avg_agg`.
  */
object Aggregators {

  /** Incremental count — the reference's CountAgg
    * (HotMediaTrack.java:148-169, HotItemAnalysis.java:116-136):
    * acc = 0L; add = acc+1; merge = acc0+acc1. */
  object CountAgg extends Aggregator[Long, Long, Long] {
    override def zero: Long = 0L
    override def reduce(acc: Long, in: Long): Long = acc + 1
    override def merge(a: Long, b: Long): Long = a + b
    override def finish(acc: Long): Long = acc
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Incremental average — the reference's dead-code AverageAgg
    * (HotItemAnalysis.java:139-160): acc = (sum, n). Deliberate semantic
    * fix (SURVEY §7.3-5): the reference's unscaled BigDecimal.divide
    * throws on non-terminating quotients; we finish in Double and return
    * NaN for the empty group instead of dividing by zero. */
  object AverageAgg extends Aggregator[Long, (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(acc: (Long, Long), in: Long): (Long, Long) =
      (acc._1 + in, acc._2 + 1)
    override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(acc: (Long, Long)): Double =
      if (acc._2 == 0) Double.NaN else acc._1.toDouble / acc._2
    override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(
      Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Register the UDAFs for spark.sql use. Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("count_agg", udaf(CountAgg))
    spark.udf.register("avg_agg", udaf(AverageAgg))
  }
}
