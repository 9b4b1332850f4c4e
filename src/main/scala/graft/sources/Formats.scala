package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Columnar-format interop beyond parquet: the ORC read/write seam.
  *
  * A 100 TB lake is rarely one format — ORC is the other mainstream
  * columnar layout (Hive-lineage warehouses), and Spark's reader gives
  * it the same scan-level machinery parquet gets: column pruning via
  * ReadSchema, predicate pushdown via PushedFilters (ORC row-group
  * min/max + bloom indexes), partition pruning, vectorized decode.
  * FormatsSpec pins the pushdown/pruning facts on the plan so a
  * regression to a full-scan ORC read fails loudly.
  *
  * The sandbox fixture is parquet-only, so [[orcLineitem]] materializes
  * the ORC copy once per (session, data dir) under the shared
  * [[graft.ops.BuildOnce]] memo — first call pays the conversion
  * (exactly like the bucketed-table and persisted-index queries),
  * repeat calls measure the steady-state ORC scan a deployment pays.
  */
object Formats {

  /** The lineitem table as ORC — converted once per data dir into the
    * deterministic temp location, then read back through the ORC
    * scanner. */
  def orcLineitem(spark: SparkSession, dir: String): DataFrame = {
    val orcDir = graft.ops.BuildOnce.tempDirFor("graft_orc_lineitem", dir)
    graft.ops.BuildOnce(spark, orcDir) {
      Tables.lineitem(spark, dir).write.mode("overwrite").orc(orcDir)
    }
    spark.read.orc(orcDir)
  }

  /** Declared query q_source_orc: filtered aggregate over the ORC copy
    * of lineitem — same answer as the parquet oracle by construction,
    * which is the point: the gate proves the ORC round-trip (writer →
    * reader → pruned, pushed-down scan) is value-exact. The filter and
    * the two-column projection must reach the ORC scan (pinned in
    * FormatsSpec); money sums ride the DECIMAL(20,6) intermediate. */
  def orcScanAggQ(spark: SparkSession, dir: String): DataFrame =
    orcLineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(20,6)"))
          .cast("double").as("sum_price"))
}
