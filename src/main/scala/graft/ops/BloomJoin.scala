package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Bloom-filter semi-join reduction — the 100 TB scan/shuffle-pruning
  * pattern: build a bloom filter of the (filtered) dimension's join
  * keys, broadcast it as a scalar, and drop fact rows that cannot match
  * BEFORE the join exchange. With a selective dim predicate the fact
  * shuffle shrinks to the matching rows plus the filter's false
  * positives; false positives are then removed by the join itself and
  * false negatives are impossible, so the result equals the plain join
  * — which is exactly what the oracle checks. Spark applies this
  * pattern automatically in some plans (runtime row-level filtering);
  * declaring it explicitly makes the reduction available to any query
  * and under the correctness gate.
  *
  * Uses Spark's own sketch expressions (`BloomFilterAggregate`,
  * `BloomFilterMightContain` — the internals behind
  * spark.sql.optimizer.runtime.bloomFilter), registered as SQL
  * functions the way graft's native expressions are.
  * `BloomFilterMightContain` requires its filter argument to be a
  * constant or scalar subquery, so the declared query is SQL-shaped:
  * the subquery plans as a one-off aggregate whose binary result ships
  * with the fact scan's predicate. The aggregate is order-insensitive
  * (bit-OR merge), so the sketch is deterministic for a given key set.
  */
object BloomJoin {
  val AggFn = "graft_bloom_agg"
  val ContainsFn = "graft_might_contain"

  def register(spark: SparkSession): Unit = {
    graft.functions.Registration.ensure(spark, AggFn,
      (exprs: Seq[Expression]) =>
        new BloomFilterAggregate(exprs.head, exprs(1), exprs(2)),
      source = "built-in")
    graft.functions.Registration.ensure(spark, ContainsFn,
      (exprs: Seq[Expression]) =>
        BloomFilterMightContain(exprs.head, exprs(1)),
      source = "built-in")
  }

  /** Declared query (q_bloom_join): lineitem ⋈ urgent orders, with the
    * fact side pre-pruned by a bloom of the urgent order keys (~20% of
    * orders → the fact shuffle input drops ~5× before the join). The
    * oracle is the PLAIN filtered join: the bloom must be invisible.
    * Sketch sizing: 100k expected keys / 800k bits ≈ 2% fpp at sf0.1 —
    * oversized estimates only waste bits, undersized ones only raise
    * fpp; neither can change the result. */
  def bloomJoinQ(spark: SparkSession, dir: String): DataFrame = {
    register(spark)
    graft.sources.Catalog.registerAll(spark, dir)
    spark.sql(s"""
      SELECT o_orderpriority, sum(l_quantity) AS total_qty,
             count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
        AND $ContainsFn(
          (SELECT $AggFn(cast(o_orderkey AS long), 100000L, 800000L)
           FROM orders WHERE o_orderpriority = '1-URGENT'),
          cast(l_orderkey AS long))
      GROUP BY o_orderpriority""")
  }
}
