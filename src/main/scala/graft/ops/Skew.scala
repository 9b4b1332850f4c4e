package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted two-phase aggregation (SURVEY §7.3-7).
  *
  * A hot grouping key concentrates its whole partition on one reducer;
  * AQE splits skewed JOIN partitions but a skewed AGGREGATE key still
  * lands on one task in the final stage. Salting splits each key into
  * `salt` sub-keys for the first (wide) aggregation, then re-combines
  * per real key — the second shuffle carries ≤ |keys| × salt rows, so
  * the hot key's work is spread across `salt` tasks.
  *
  * The salt is `hash(entire row) % salt` — deterministic (re-runnable,
  * testable) yet uniform across a key's rows; a random salt would work
  * too but breaks retry idempotence inside a stage.
  *
  * Only algebraic aggregates re-combine losslessly (sum/count/min/max);
  * that's enforced by construction here (count → sum, sum → sum).
  */
object Skew {

  /** Row-content hash alone degenerates when a hot key's rows are
    * byte-identical (the classic skew case: billions of copies of one
    * constant event) — every copy would land in ONE sub-key and the
    * mitigation would do nothing. Mixing in the partition id and the
    * intra-partition row position spreads identical rows too; the final
    * aggregate is invariant to WHICH sub-key a row lands in, so this
    * stays correct under any partitioning and re-execution. */
  private def saltCol(df: DataFrame, salt: Int): Column =
    pmod(hash(df.columns.map(col) :+ spark_partition_id()
      :+ monotonically_increasing_id(): _*), lit(salt))

  /** count(*) per key, skew-safe. Result: (key..., cnt). */
  def saltedCount(df: DataFrame, keys: Seq[String], salt: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("_salt", saltCol(df, salt))
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keyCols: _*)
      .agg(sum("_partial").as("cnt"))
  }

  /** Declared skew-mitigation query (q_skew_agg): salted sum+count of
    * lineitem quantity by return flag — 3 keys over 600 k rows at
    * sf0.1, exactly the hot-key shape where a plain final aggregate
    * serializes on one task per key. The oracle is the PLAIN group
    * aggregate: salting must be semantically invisible. l_quantity is
    * integral-valued, so the re-associated double sums are order-exact
    * and oracle-stable (a money-typed column would ride DECIMAL here,
    * as q_agg_group's sums do). */
  def skewAggQ(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    saltedSum(
      graft.sources.Tables.lineitem(spark, dir).select("l_returnflag", "l_quantity"),
      Seq("l_returnflag"), "l_quantity")

  /** sum(valueCol) + count(*) per key, skew-safe.
    * Result: (key..., total, cnt). */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
      salt: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("_salt", saltCol(df, salt))
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(keyCols: _*)
      .agg(sum("_psum").as("total"), sum("_pcnt").as("cnt"))
  }

  /** Skew-safe equi-join: the fact side salts its join key into `salt`
    * sub-keys; the dimension side is replicated once per salt value
    * (explode of a `salt`-element array — dimension rows × salt, bounded
    * and predictable), and the join runs on (key, salt). A hot fact key
    * then spreads over `salt` reducers instead of serializing on one.
    * Semantically invisible: every fact row still meets every matching
    * dimension row exactly once. Prefer AQE's runtime skew-join split
    * (enabled engine-wide) when it applies; the salted form is the
    * declarative fallback for shapes AQE cannot split (e.g. a
    * skew-joined stream, or when the skewed partition is one key). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salt: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt", saltCol(fact, salt))
    val replicatedDim = dim
      .withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Declared skew-join query (q_skew_join): lineitem ⋈ orders on the
    * order key through [[saltedJoin]], aggregated per priority so the
    * oracle is the PLAIN join+group — salting must be invisible.
    * l_quantity integral → order-exact double sums. */
  def skewJoinQ(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    saltedJoin(
      graft.sources.Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      graft.sources.Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderpriority")),
      "o_orderkey")
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("total_qty"), count(lit(1)).as("n_items"))
}
