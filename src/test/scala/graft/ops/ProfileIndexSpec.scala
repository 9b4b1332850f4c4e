package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.Tables

/** Laws for the persisted mergeable profile index: every non-distinct
  * lane is EXACT and append-order-invariant; the HLL cardinalities stay
  * inside the sketch's published error at lgK=12 (rsd ≈ 1.6 %, asserted
  * at 5 % ≈ 3·rsd); the read path touches only sketch rows. */
class ProfileIndexSpec extends SparkSuite {

  private def tmp(): String =
    Files.createTempDirectory("profile_idx_spec").toString

  private lazy val li = Tables.lineitem(spark, sf)

  private def exactProfile: Map[String, (Long, Long, Long)] = {
    // (n_rows, n_nulls, n_distinct) per column, computed directly
    val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice",
      "l_shipdate", "l_returnflag", "l_linestatus")
    val n = li.count()
    cols.map { c =>
      val r = li.agg(count(col(c)), count_distinct(col(c))).collect()(0)
      c -> (n, n - r.getLong(0), r.getLong(1))
    }.toMap
  }

  test("split write+append equals one-shot write on every exact lane; HLL within bound") {
    val oneShot = tmp()
    val split = tmp()
    ProfileIndex.writeProfileSketches(li, oneShot)
    ProfileIndex.writeProfileSketches(li.filter(col("l_orderkey") % 3 === 0), split)
    ProfileIndex.appendProfileSketches(li.filter(col("l_orderkey") % 3 === 1), split)
    ProfileIndex.appendProfileSketches(li.filter(col("l_orderkey") % 3 === 2), split)
    def lanes(dir: String) = ProfileIndex.profileFromSketches(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)), Option(r.get(5)), Option(r.get(6)), Option(r.get(7))))
      .toMap
    val a = lanes(oneShot)
    val b = lanes(split)
    assert(a.keySet == b.keySet)
    val exact = exactProfile
    a.keySet.foreach { c =>
      // rows/nulls/min/max identical between one-shot and split builds
      assert(a(c)._1 == b(c)._1 && a(c)._2 == b(c)._2, s"$c rows/nulls")
      assert(a(c)._4 == b(c)._4 && a(c)._5 == b(c)._5 &&
        a(c)._6 == b(c)._6 && a(c)._7 == b(c)._7, s"$c min/max")
      // and exact vs the direct scan
      assert(a(c)._1 == exact(c)._1 && a(c)._2 == exact(c)._2, s"$c exact rows/nulls")
      // HLL estimates inside 3·rsd of the true distinct count, both builds
      val truth = exact(c)._3.toDouble
      Seq(a(c)._3, b(c)._3).foreach { est =>
        assert(math.abs(est - truth) <= math.max(1.0, truth * 0.05),
          s"$c distinct: est $est vs true $truth")
      }
    }
  }

  test("min/max lanes equal the direct aggregate (numeric and string)") {
    val idx = tmp()
    ProfileIndex.writeProfileSketches(li, idx)
    val prof = ProfileIndex.profileFromSketches(spark, idx)
      .collect().map(r => r.getString(0) -> r).toMap
    val d = li.agg(min("l_quantity"), max("l_quantity"),
      min("l_returnflag"), max("l_returnflag")).collect()(0)
    assert(prof("l_quantity").getDouble(4) == d.getDouble(0))
    assert(prof("l_quantity").getDouble(5) == d.getDouble(1))
    assert(prof("l_returnflag").getString(6) == d.getString(2))
    assert(prof("l_returnflag").getString(7) == d.getString(3))
  }

  test("index stays metadata-scale: rows = appends × shards, and the read plan scans no data table") {
    val idx = tmp()
    ProfileIndex.writeProfileSketches(li, idx, nShards = 4)
    ProfileIndex.appendProfileSketches(li.limit(100), idx, nShards = 4)
    val rows = spark.read.parquet(idx).count()
    assert(rows == 8, s"expected 2 appends × 4 shards, got $rows")
    val plan = ProfileIndex.profileFromSketches(spark, idx)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("lineitem"), "read path must not rescan the corpus")
  }
}
