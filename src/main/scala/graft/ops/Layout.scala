package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional clustering so
  * that a range predicate on EITHER dimension prunes file / row-group
  * statistics after a single layout pass. Sorting by one column clusters
  * that column only; interleaving the bits of two columns into one
  * z-value and range-partitioning + sorting on it gives every file a
  * tight min/max envelope on BOTH — the standard layout trick for
  * 100 TB tables queried along more than one axis (Delta/Iceberg OPTIMIZE
  * ZORDER does exactly this).
  *
  * Everything here is pure codegen'd column arithmetic: the interleave is
  * a fixed chain of shift/mask/or terms, no UDF, no shuffle of its own.
  */
object Layout {

  /** Morton interleave of two non-negative dims clamped to `bits` bits
    * each: bit i of x lands at position 2i, bit i of y at 2i+1. The
    * fold builds a flat OR-chain of 2·bits shift/mask terms — straight-
    * line long arithmetic inside whole-stage codegen. Callers clamp x
    * and y into [0, 2^bits) first; the clamp (not a modulo) keeps the
    * curve monotone at the domain edge. */
  def zValue(x: Column, y: Column, bits: Int = 8): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** The layout pass itself: range-partition on the z-value (contiguous
    * z-ranges per output partition → per-file min/max stats are tight
    * intervals on the curve) and sort within each partition so row-group
    * stats inside a file prune too. One shuffle, no global sort barrier
    * — repartitionByRange samples boundaries and every partition sorts
    * independently. Write the result with a plain parquet write; the
    * pruning comes from the stats, not from a special sink. */
  def zorderLayout(df: DataFrame, z: Column, nPartitions: Int = 32): DataFrame =
    df.withColumn("z", z)
      .repartitionByRange(nPartitions, col("z"))
      .sortWithinPartitions(col("z"))

  /** The deployable whole-table form: bin BOTH dimensions monotonically
    * into 2^bits range buckets from their observed envelopes, interleave,
    * and lay out. Monotone binning is what makes a range predicate on the
    * RAW columns align with the z clustering — after a plain parquet
    * write of this frame, every file/row-group carries tight min/max
    * stats on both raw columns and a two-dimension box predicate skips
    * most units at scan time (LayoutSpec proves the skip on a read-back
    * through the executed plan's scan metrics). The envelope agg is one
    * metadata-sized driver round-trip — same class as the bucket-pruning
    * lists; Delta/Iceberg OPTIMIZE ZORDER computes the same per-column
    * bounds before binning. */
  def zorderByRange(df: DataFrame, x: Column, y: Column, bits: Int = 8,
      nPartitions: Int = 32): DataFrame = {
    val r = df.agg(min(x), max(x), min(y), max(y)).head()
    def d(v: Any): Double = v match {
      case null => 0.0
      case n: java.lang.Number => n.doubleValue
    }
    val nBins = (1L << bits) - 1
    // nulls explicitly to bin 0: least() SKIPS nulls (least(null, n) = n),
    // so a coalesce around it can never see the null and a null row
    // would silently cluster into the TOP bin, polluting the top z-run's
    // stats envelope
    def bin(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else when(c.isNull, lit(0L)).otherwise(
        least(floor((c.cast("double") - lit(lo)) / lit(hi - lo) * (nBins + 1)),
          lit(nBins)).cast("long"))
    zorderLayout(df,
      zValue(bin(x, d(r.get(0)), d(r.get(1))), bin(y, d(r.get(2)), d(r.get(3))), bits),
      nPartitions)
  }

  /** Declared query (q_zorder): events keyed by (user_id, value) —
    * clamp each dim to 8 bits (user_id masked; value halved and clamped,
    * both clamps mirrored in the oracle), interleave, and report
    * per-z-bucket envelopes. The buckets are FIXED top-5-bit slices of
    * the 16-bit z-value — deterministic map-side arithmetic, unlike
    * range-partition ids (whose sampled boundaries are not
    * oracle-stable) — so the output is one hash aggregate whose min/max
    * columns SHOW the clustering: each z-bucket covers a tight square
    * of the (user, value) plane, which is exactly the file-statistics
    * envelope a scan would prune against after [[zorderLayout]]. */
  def zorderStatsQ(events: DataFrame): DataFrame = {
    val x = col("user_id").bitwiseAND(lit(255L))
    // floor(double) is LONG in Spark; DuckDB's floor stays DOUBLE and
    // the oracle casts after clamping — same integer either way
    val y = least(greatest(floor(col("value") / lit(2.0)), lit(0L)), lit(255L))
    events
      .select(col("user_id"), col("value"), zValue(x, y, 8).as("z"))
      .groupBy(shiftright(col("z"), 11).as("zbucket"))
      .agg(count(lit(1)).as("n"),
        min("user_id").as("min_user"), max("user_id").as("max_user"),
        min("value").as("min_value"), max("value").as("max_value"),
        min("z").as("min_z"), max("z").as("max_z"))
  }
}
