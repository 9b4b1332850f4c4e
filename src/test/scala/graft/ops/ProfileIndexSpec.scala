package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.Tables

/** Micro-batch row shape for the streaming ingestion test — the
  * profiled lineitem lanes plus the shard-hash key. l_shipdate is
  * TimestampType after the Tables.tsUtc normalization, whose external
  * type is java.sql.Timestamp. */
case class LiBatchRow(l_orderkey: Long, l_linenumber: Int, l_quantity: Double,
    l_extendedprice: Double, l_shipdate: java.sql.Timestamp,
    l_returnflag: String, l_linestatus: String)

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

  test("compaction collapses to one row-set per shard and preserves the profile") {
    val idx = tmp()
    ProfileIndex.writeProfileSketches(li.filter(col("l_orderkey") % 3 === 0), idx, nShards = 4)
    ProfileIndex.appendProfileSketches(li.filter(col("l_orderkey") % 3 === 1), idx, nShards = 4)
    ProfileIndex.appendProfileSketches(li.filter(col("l_orderkey") % 3 === 2), idx, nShards = 4)
    def snap() = ProfileIndex.profileFromSketches(spark, idx)
      .collect().map(r => r.toSeq.toList).sortBy(_.head.toString).toSeq
    val before = snap()
    assert(spark.read.parquet(physicalDir(s"$idx/sketch").getPath).count() == 12)
    ProfileIndex.compactProfileSketches(spark, idx)
    assert(spark.read.parquet(physicalDir(s"$idx/sketch").getPath).count() == 4,
      "one row per shard after compaction")
    // DataSketches HLL union is lossless at one lgK: the compacted
    // profile is IDENTICAL, estimates included
    assert(snap() == before)
    // and the index keeps accepting appends after compaction
    ProfileIndex.appendProfileSketches(li.limit(50), idx, nShards = 4)
    assert(ProfileIndex.profileFromSketches(spark, idx)
      .filter(col("column_name") === "l_orderkey")
      .head().getLong(1) == li.count() + 50)
  }

  test("streaming ingestion: foreachBatch folds each micro-batch into the standing profile") {
    import spark.implicits._
    val idx = tmp()
    ProfileIndex.writeProfileSketches(li.filter(col("l_orderkey") % 2 === 0), idx)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[LiBatchRow](spark)
    val delta = li.filter(col("l_orderkey") % 2 === 1)
    val deltaRows = delta.select("l_orderkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_shipdate", "l_returnflag", "l_linestatus")
      .collect().map(r => LiBatchRow(r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3), r.getAs[java.sql.Timestamp](4), r.getString(5), r.getString(6)))
    val (half1, half2) = deltaRows.splitAt(deltaRows.length / 2)
    val q = stream.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        ProfileIndex.appendProfileSketches(batch, idx)
      }
      .option("checkpointLocation", tmp())
      .start()
    stream.addData(half1.toIndexedSeq)
    q.processAllAvailable()
    stream.addData(half2.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val prof = ProfileIndex.profileFromSketches(spark, idx)
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = exactProfile
    exact.keySet.foreach { c =>
      assert(prof(c).getLong(1) == exact(c)._1, s"$c rows after streaming appends")
      assert(prof(c).getLong(2) == exact(c)._2, s"$c nulls")
      val est = prof(c).getLong(3).toDouble
      assert(math.abs(est - exact(c)._3) <= math.max(1.0, exact(c)._3 * 0.05), s"$c distinct")
    }
  }

  test("rebuild-on-forget drill for the HLL lanes (SURVEY §2.5 exemption): " +
    "registers are not subtractable, so IF a per-row erasure law were ever " +
    "required the procedure is a survivor rebuild — whose readout equals a " +
    "never-saw-victims build on every lane") {
    val victims = li.filter(col("l_orderkey") % 5 === 0)
    val survivors = li.filter(col("l_orderkey") % 5 =!= 0)
    def snap(dir: String) = ProfileIndex.profileFromSketches(spark, dir)
      .collect().map(r => r.toSeq.toList).sortBy(_.head.toString).toSeq

    val dir = tmp()
    ProfileIndex.writeProfileSketches(li, dir)
    assert(victims.count() > 0)
    // the erasure procedure: one survivor rebuild over the same path
    ProfileIndex.writeProfileSketches(survivors, dir)

    val never = tmp()
    ProfileIndex.writeProfileSketches(survivors, never)
    assert(snap(dir) == snap(never),
      "rebuilt profile must equal a build that never saw the victims — " +
      "rows, nulls, min/max AND the HLL cardinality estimates")
  }

  test("index stays metadata-scale: rows = appends × shards, and the read plan scans no data table") {
    val idx = tmp()
    ProfileIndex.writeProfileSketches(li, idx, nShards = 4)
    ProfileIndex.appendProfileSketches(li.limit(100), idx, nShards = 4)
    val rows = spark.read.parquet(physicalDir(s"$idx/sketch").getPath).count()
    assert(rows == 8, s"expected 2 appends × 4 shards, got $rows")
    val plan = ProfileIndex.profileFromSketches(spark, idx)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("lineitem"), "read path must not rescan the corpus")
  }
}
