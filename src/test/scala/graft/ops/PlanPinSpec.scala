package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Unit tests for the [[PlanPin]] bounded-collect guard — the closure of
  * the round-12 audit hole: driver-fused queries (hybrid RRF, bitext,
  * MMR, the PQ head) return LocalRelations, so the global sweeps cannot
  * see their distributed cuts; PlanPin asserts those cut shapes at the
  * collect boundary instead. The positive paths run on every invocation
  * of the fused queries themselves (PlanSweepSpec executes all of them);
  * this spec pins that the guard REJECTS the unreduced shapes it exists
  * to catch. */
class PlanPinSpec extends SparkSuite {

  private def docs = graft.sources.Tables.documents(spark, sf)

  test("TopKCut accepts a global top-k over a scan") {
    PlanPin.assertBounded(
      docs.select(col("doc_id")).orderBy(col("doc_id")).limit(5),
      PlanPin.TopKCut, "test")
  }

  test("TopKCut rejects a raw scan collect (no cut anywhere)") {
    val e = intercept[IllegalStateException] {
      PlanPin.assertBounded(docs.select(col("doc_id")),
        PlanPin.TopKCut, "raw-scan")
    }
    assert(e.getMessage.contains("raw-scan"))
  }

  test("KeyedAggCut accepts a partial+final keyed aggregate") {
    PlanPin.assertBounded(
      docs.groupBy(col("lang")).agg(count(lit(1)).as("n")),
      PlanPin.KeyedAggCut, "test")
  }

  test("KeyedAggCut rejects a frame with no aggregate") {
    val e = intercept[IllegalStateException] {
      PlanPin.assertBounded(docs.filter(col("doc_id") > 3),
        PlanPin.KeyedAggCut, "no-agg")
    }
    assert(e.getMessage.contains("no-agg"))
  }

  test("KeyFilterCut accepts a key-filtered scan and rejects a full scan") {
    PlanPin.assertBounded(docs.filter(col("doc_id") < 10),
      PlanPin.KeyFilterCut, "test")
    intercept[IllegalStateException] {
      PlanPin.assertBounded(docs, PlanPin.KeyFilterCut, "full-scan")
    }
  }

  test("guarded fused queries still execute end-to-end") {
    // the guards run inside these calls; a shape regression throws here
    assert(SimSearch.mmrQ(graft.sources.Tables.embeddings(spark, sf)).count() > 0)
    assert(SimSearch.hybridRrfQ(spark, sf).count() > 0)
    PipelineCaches.release(spark)
  }
}
