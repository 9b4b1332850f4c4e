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

  /** Two-level skew-safe equi-join — the production shape at 100 TB.
    *
    * [[saltedJoin]] is the textbook mitigation, but it replicates the
    * ENTIRE dimension `salt` times: against a 1 B-row dimension that is
    * salt× the whole dim shuffled per join — the mitigation itself
    * becomes the bottleneck. The split form replicates nothing:
    *
    *  1. Detect hot fact keys exactly: one `count per key` aggregate.
    *     The count is algebraic, so map-side combine pre-reduces the
    *     hot key on every map task — the exchange carries one partial
    *     per (task, key), never the raw hot rows, and the reduce output
    *     is |distinct keys| fixed-width rows (an ordinary aggregate at
    *     any scale).
    *  2. Keys with ≥ `hotThreshold` fact rows form the hot set —
    *     ≤ |fact| / hotThreshold keys by construction, so with a
    *     threshold worth mitigating (≫ rows-per-reducer) the set is
    *     metadata-sized → broadcast it to split both inputs.
    *  3. Hot slice: broadcast-hash-join fact-hot against the (few-key)
    *     hot dim slice. A broadcast join never shuffles the probe side,
    *     so a hot key CANNOT serialize on one reducer — stronger than
    *     salting, with zero replication.
    *  4. Cold slice: ordinary shuffle join of the remainders — no key
    *     exceeds hotThreshold there, so no reducer is hot either.
    *
    * The union of both joins equals the plain join for ANY hot-set
    * choice (each fact row still meets exactly its matching dim rows,
    * on whichever side of the split it landed) — pinned in
    * PropertySpec; the oracle for the declared query below is the
    * plain join. Fall back to [[saltedJoin]] only when the hot dim
    * slice itself outgrows a broadcast (a many-to-many hot key, where
    * per-key dim rows are themselves huge). */
  def skewSplitJoin(fact: DataFrame, dim: DataFrame, key: String,
      hotThreshold: Long = 1000000L): DataFrame = {
    require(hotThreshold > 0, s"hotThreshold must be positive, got $hotThreshold")
    val hotKeys = broadcast(
      fact.groupBy(col(key)).agg(count(lit(1)).as("_n"))
        .filter(col("_n") >= hotThreshold).select(col(key)))
    val hotJoin = fact.join(hotKeys, Seq(key), "left_semi")
      .join(broadcast(dim.join(hotKeys, Seq(key), "left_semi")), Seq(key))
    val coldJoin = fact.join(hotKeys, Seq(key), "left_anti")
      .join(dim.join(hotKeys, Seq(key), "left_anti"), Seq(key))
    hotJoin.unionByName(coldJoin)
  }

  /** Declared skew-join query (q_skew_join): lineitem ⋈ orders on the
    * order key through [[skewSplitJoin]], aggregated per priority so
    * the oracle is the PLAIN join+group — the mitigation must be
    * invisible. The fixture's orderkeys are uniform (≤ 7 lineitems
    * each), so at sf scale the hot set is empty and the query pays
    * exactly one detection pass over the plain plan — the operator
    * adapts to OBSERVED skew rather than taxing uniform data with a
    * 16× dim replication; the hot path is exercised and pinned on a
    * synthetically skewed corpus in PropertySpec and PlanGuardSpec.
    * l_quantity integral → order-exact double sums. */
  def skewJoinQ(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    skewSplitJoin(
      graft.sources.Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      graft.sources.Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderpriority")),
      "o_orderkey", hotThreshold = 100000L)
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("total_qty"), count(lit(1)).as("n_items"))
}
