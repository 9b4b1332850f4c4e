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
    graft.ops.BuildOnce(spark, orcDir, Seq(dir)) {
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

  /** The lineitem table as headered CSV — the text-format ingestion
    * seam (§2.1 #3's format, batch side). Written once per data dir,
    * read back with the EXPLICIT parquet schema: text formats carry no
    * types, so schema-on-read is the contract (an inferred read would
    * silently widen decimals/dates). */
  def csvLineitem(spark: SparkSession, dir: String): DataFrame = {
    val schema = Tables.lineitem(spark, dir).schema
    val csvDir = graft.ops.BuildOnce.tempDirFor("graft_csv_lineitem", dir)
    graft.ops.BuildOnce(spark, csvDir, Seq(dir)) {
      Tables.lineitem(spark, dir).write.mode("overwrite")
        .option("header", "true").csv(csvDir)
    }
    spark.read.schema(schema).option("header", "true").csv(csvDir)
  }

  /** Declared query q_source_csv: filtered aggregate over the CSV copy
    * — the gate proves the text round-trip (typed write → ISO
    * timestamps/decimals as strings → schema-on-read) is value-exact
    * against the parquet oracle. CSV scans cannot push predicates into
    * the format, but column pruning still reaches the parser
    * (ReadSchema pin in FormatsSpec). */
  def csvScanAggQ(spark: SparkSession, dir: String): DataFrame =
    csvLineitem(spark, dir)
      .filter(col("l_shipdate") < lit("1998-01-01"))
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(20,6)"))
          .cast("double").as("sum_qty"))

  /** The documents table as JSON-lines — the interchange format crawl
    * pipelines actually ship (one JSON object per line; embedded
    * newlines/quotes in `text` ride JSON escapes, which is exactly why
    * JSONL beats CSV for free-text corpora). Same write-once memo +
    * explicit-schema read as the other format seams. */
  def jsonlDocuments(spark: SparkSession, dir: String): DataFrame = {
    val schema = Tables.documents(spark, dir).schema
    val jDir = graft.ops.BuildOnce.tempDirFor("graft_jsonl_documents", dir)
    graft.ops.BuildOnce(spark, jDir, Seq(dir)) {
      Tables.documents(spark, dir).write.mode("overwrite").json(jDir)
    }
    spark.read.schema(schema).json(jDir)
  }

  /** Declared query q_source_jsonl: per-source corpus stats over the
    * JSONL copy — free-text round-trip exactness (every char of every
    * doc survives the escape/unescape) is the gate. */
  def jsonlStatsQ(spark: SparkSession, dir: String): DataFrame =
    jsonlDocuments(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("total_chars"),
        max(col("doc_id")).as("max_doc_id"))
}
