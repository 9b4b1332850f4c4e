package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** ORC interop: the round-trip must be value-exact vs the parquet
  * original, and the ORC scan must keep the scan-level machinery the
  * 100 TB posture depends on — predicate pushdown (PushedFilters) and
  * column pruning (ReadSchema carries only the projected columns). */
class FormatsSpec extends SparkSuite {

  test("ORC round-trip is value-exact vs parquet (full row set)") {
    val pq = Tables.lineitem(spark, sf)
    val orc = Formats.orcLineitem(spark, sf)
    assert(orc.schema == pq.schema, "schema drift through ORC")
    assert(orc.count() == pq.count())
    // exceptAll both ways = multiset equality
    assert(orc.exceptAll(pq).isEmpty && pq.exceptAll(orc).isEmpty)
  }

  test("q_source_orc agrees with the same aggregate on parquet") {
    val fromOrc = Formats.orcScanAggQ(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val fromPq = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(20,6)"))
          .cast("double").as("sum_price"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fromOrc == fromPq)
  }

  test("plan: ORC scan pushes the shipdate filter and prunes columns") {
    val plan = Formats.orcScanAggQ(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Format: ORC"), s"not an ORC scan:\n$plan")
    // the timestamp predicate reaches PushedFilters on the ORC scan
    assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(plan).isDefined,
      s"shipdate filter not pushed into the ORC scan:\n$plan")
    // ReadSchema carries only the three referenced columns
    val rs = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan)
      .map(_.group(1)).getOrElse(fail(s"no ReadSchema in:\n$plan"))
    val cols = rs.split(",").map(_.split(":")(0).trim).toSet
    assert(cols == Set("l_shipdate", "l_returnflag", "l_extendedprice"),
      s"ORC scan reads more than the projection: $cols")
  }

  test("CSV round-trip is value-exact vs parquet (full row set)") {
    val pq = Tables.lineitem(spark, sf)
    val csv = Formats.csvLineitem(spark, sf)
    assert(csv.schema == pq.schema, "schema drift through CSV schema-on-read")
    assert(csv.count() == pq.count())
    assert(csv.exceptAll(pq).isEmpty && pq.exceptAll(csv).isEmpty)
  }

  test("plan: CSV scan prunes columns to the projection (ReadSchema)") {
    val plan = Formats.csvScanAggQ(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Format: CSV"), s"not a CSV scan:\n$plan")
    val rs = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan)
      .map(_.group(1)).getOrElse(fail(s"no ReadSchema in:\n$plan"))
    val cols = rs.split(",").map(_.split(":")(0).trim).toSet
    assert(cols == Set("l_shipdate", "l_linestatus", "l_quantity"),
      s"CSV scan parses more than the projection: $cols")
  }

  test("JSONL round-trip is value-exact vs parquet — free text survives escaping") {
    val pq = Tables.documents(spark, sf)
    val js = Formats.jsonlDocuments(spark, sf)
    assert(js.schema == pq.schema, "schema drift through JSONL schema-on-read")
    assert(js.count() == pq.count())
    assert(js.exceptAll(pq).isEmpty && pq.exceptAll(js).isEmpty)
  }
}
