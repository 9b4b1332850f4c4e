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

  /** One (score, tag) candidate for [[TopKAgg]]. */
  case class Scored(score: Double, tag: Long)

  /** Per-group top-k as a BOUNDED-BUFFER aggregate — the 100 TB form of
    * "top N per group". The rank-filter spelling
    * (`row_number() over (partition by g order by s desc) <= k`) sorts
    * EVERY group's full row set through one exchange; this Aggregator's
    * add/merge contract makes Spark run it as partial (map-side) + final
    * aggregation, so each map task ships at most k rows per group — the
    * shuffle carries k·|groups| rows no matter how large the input, and
    * no per-group sort of the full data ever happens. Deterministic
    * total order: score DESC, then tag ASC on ties (tags are unique
    * keys by contract). The buffer is a sorted Vector capped at k —
    * O(k) per reduce via one positional insert. */
  class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    require(k > 0, s"k must be positive, got $k")
    // TOTAL order, or reduce/merge become partition-order-dependent:
    // `>` is not total on NaN (NaN > x and x > NaN are both false, so a
    // full buffer would keep whichever arrived first). Double.compare
    // gives SQL's ordering (NaN greatest) and is total; ±0.0 normalizes
    // first because compare distinguishes them while SQL does not —
    // without it a (+0.0, -0.0) tie would break on sign, not tag.
    private def beats(a: Scored, b: Scored): Boolean = {
      def norm(d: Double): Double = if (d == 0.0) 0.0 else d
      val c = java.lang.Double.compare(norm(a.score), norm(b.score))
      c > 0 || (c == 0 && a.tag < b.tag)
    }
    override def zero: Seq[Scored] = Vector.empty
    override def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] = {
      if (buf.size == k && !beats(x, buf.last)) return buf
      val pos = buf.indexWhere(e => beats(x, e)) match {
        case -1 => buf.size
        case p => p
      }
      val v = buf.toVector
      (v.take(pos) :+ x) ++ v.drop(pos).take(k - pos - 1)
    }
    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      b.foldLeft(a)(reduce) // b is itself sorted and <= k elements
    override def finish(r: Seq[Scored]): Seq[Scored] = r
    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Register the UDAFs for spark.sql use. Idempotent. TopKAgg is NOT
    * SQL-registered: k is a constructor parameter, so callers bind
    * their own k via `functions.udaf(new TopKAgg(k), encoder)` (see
    * [[graft.ops.Relational.topKAggQ]]) — a registration would
    * silently hardcode one k behind a generic name. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("count_agg", udaf(CountAgg))
    spark.udf.register("avg_agg", udaf(AverageAgg))
  }
}
