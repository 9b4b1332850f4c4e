package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Z-order layout invariants: the interleave arithmetic against an
  * independent reference implementation, and the two properties the
  * layout pass exists for — contiguous non-overlapping z-ranges per
  * partition and in-partition sortedness (together: tight per-file
  * min/max envelopes on BOTH dimensions). */
class LayoutSpec extends SparkSuite {
  import spark.implicits._

  /** Independent reference: bit-by-bit Morton interleave. */
  private def zRef(x: Long, y: Long, bits: Int = 8): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the reference interleave, including domain edges") {
    val pts = Seq((0L, 0L), (255L, 255L), (0L, 255L), (255L, 0L),
      (1L, 2L), (170L, 85L), (149L, 245L), (128L, 127L))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == zRef(x, y), s"z($x,$y)")
    }
    // per-dimension monotonicity with the other dim fixed — the property
    // that makes single-dimension range predicates prunable on z stats
    val ys = Seq(0L, 7L, 200L)
    ys.foreach { y =>
      val zs = (0L to 255L by 17).map(x => zRef(x, y))
      assert(zs == zs.sorted, s"z not monotone in x at y=$y")
    }
  }

  test("zorderLayout: rows preserved, partitions sorted and range-disjoint") {
    val events = graft.sources.Tables.events(spark, sf)
    val x = col("user_id").bitwiseAND(lit(255L))
    val y = least(greatest(floor(col("value") / lit(2.0)), lit(0L)), lit(255L))
    val laid = Layout.zorderLayout(events, Layout.zValue(x, y), nPartitions = 8)
    assert(laid.count() == events.count())
    // each partition is internally sorted and the per-partition [min,max]
    // z-ranges do not overlap — the file-statistics contract of the layout
    val perPart = laid.select(col("z")).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val zs = it.map(_.getLong(0)).toArray
        if (zs.isEmpty) Iterator.empty
        else {
          assert(zs.sameElements(zs.sorted), s"partition $pid not sorted")
          Iterator((pid, zs.head, zs.last))
        }
      }.collect().sortBy(_._1)
    perPart.sliding(2).foreach {
      case Array((p1, _, max1), (p2, min2, _)) =>
        assert(max1 <= min2, s"z-ranges of partitions $p1 and $p2 overlap")
      case _ =>
    }
  }

  test("zorderByRange write + read-back: a two-dimension box predicate actually skips row groups") {
    // isolated session, AQE off: the executed plan must expose the raw
    // FileSourceScanExec whose numOutputRows metric counts rows
    // SURVIVING parquet row-group stats pruning — the end-to-end point
    // of the layout (files the predicate's box cannot intersect are
    // never decoded)
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val events = graft.sources.Tables.events(s, sf)
      .select(col("event_id"), col("user_id"), col("value"))
    val zDir = java.nio.file.Files.createTempDirectory("layout_z").toString
    val bDir = java.nio.file.Files.createTempDirectory("layout_b").toString
    Layout.zorderByRange(events, col("user_id"), col("value"), bits = 8, nPartitions = 8)
      .drop("z").write.mode("overwrite").parquet(zDir)
    // baseline: same data, same file count, round-robin layout — every
    // file's (user_id, value) envelope spans ~the full plane
    events.repartition(8).write.mode("overwrite").parquet(bDir)
    val pred = col("user_id").between(2L, 4L) && col("value").between(100.0, 160.0)
    def scanned(path: String): (Set[Long], Long) = {
      val df = s.read.parquet(path).filter(pred)
      val got = df.collect().map(_.getLong(0)).toSet
      val scan = df.queryExecution.executedPlan.collect {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
      }.head
      (got, scan.metrics("numOutputRows").value)
    }
    val (gotZ, rowsZ) = scanned(zDir)
    val (gotB, rowsB) = scanned(bDir)
    val expected = events.filter(pred).collect().map(_.getLong(0)).toSet
    assert(gotZ == expected && gotB == expected, "layout must never change the answer")
    // the box covers ~20% × ~18% of the plane: the z layout confines it
    // to a few files' row groups while the round-robin baseline decodes
    // every row group (its stats envelopes all intersect the box)
    // 8 files → the box straddles ~3 z-runs (375/1000 rows decoded
    // when pinned); assert the conservative half, not the exact count —
    // the property is "most units skipped", not a file-boundary pin
    assert(rowsZ * 2 <= rowsB,
      s"z-ordered scan decoded $rowsZ rows vs $rowsB unclustered — row-group skipping did not engage")
    assert(rowsZ >= expected.size.toLong, "scan metric sanity")
  }

  test("zorderStatsQ: bucket envelopes cover all events and stay in range") {
    val events = graft.sources.Tables.events(spark, sf)
    val stats = Layout.zorderStatsQ(events).cache()
    assert(stats.agg(sum("n")).head.getLong(0) == events.count())
    assert(stats.filter(col("zbucket") < 0 || col("zbucket") > 31).isEmpty)
    // the fixed top-5-bit bucketing means bucket ranges tile the curve:
    // every bucket's z-envelope stays inside its 2^11 slice
    assert(stats.filter(
      shiftright(col("min_z"), 11) =!= col("zbucket") ||
        shiftright(col("max_z"), 11) =!= col("zbucket")).isEmpty)
    stats.unpersist()
  }
}
