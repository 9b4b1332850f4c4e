package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.Tables

/** Product-quantization ANN laws: exact integer driver replay of the
  * whole encode→ADC→rank pipeline on synthetic vectors, determinism on
  * the real table, and the per-probe rank-shape invariants. */
class PqSpec extends SparkSuite {
  import spark.implicits._

  // deterministic 64-dim float vectors, including the codebook ids 5..12
  private def synth(n: Int) = (0L until n.toLong).map { i =>
    (i, (0 until 64).map(j =>
      (((i * 31 + j * 17) % 97).toFloat - 48f) / 48f).toArray)
  }.toDF("vec_id", "embedding")

  test("PQ top-k matches an exact integer driver replay on synthetic vectors") {
    val df = synth(40)
    val got = SimSearch.pqTopKQ(df, nProbes = 3, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toList.sorted
    PipelineCaches.release(spark)
    // replay: same codebook rule, argmax encode, nano tables, ADC sums
    val vs = (0L until 40L).map { i =>
      i -> (0 until 64).map(j =>
        ((((i * 31 + j * 17) % 97).toFloat - 48f) / 48f).toDouble).toArray
    }.toMap
    def sub(v: Array[Double], m: Int) = v.slice(m * 16, m * 16 + 16)
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    def dn(a: Array[Double], b: Array[Double]) =
      math.floor(dot(a, b) * 1000000.0).toLong
    val cells = (5L until 13L).toSeq
    def code(i: Long, m: Int): Long =
      cells.map(c => (c, dn(sub(vs(i), m), sub(vs(c), m))))
        .sortBy { case (c, d) => (-d, c) }.head._1
    val want = (0L until 3L).flatMap { p =>
      val scored = vs.keys.filter(_ != p).map { i =>
        val s = (0 until 4).map(m =>
          dn(sub(vs(p), m), sub(vs(code(i, m)), m))).sum
        (i, s)
      }.toSeq.sortBy { case (i, s) => (-s, i) }
      scored.take(4).zipWithIndex.map { case ((i, s), r) =>
        (p, i, s, (r + 1).toLong)
      }
    }.toList.sorted
    assert(got == want, s"got $got\nwant $want")
  }

  test("PQ on the real table: deterministic, rank shape per probe") {
    val a = SimSearch.pqTopKQ(Tables.embeddings(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toList.sorted
    PipelineCaches.release(spark)
    val b = SimSearch.pqTopKQ(Tables.embeddings(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toList.sorted
    PipelineCaches.release(spark)
    assert(a == b, "PQ must be bit-deterministic")
    val byProbe = a.groupBy(_._1)
    assert(byProbe.keys.toSet == (0L until 5L).toSet)
    byProbe.values.foreach { g =>
      assert(g.map(_._4).sorted == (1L to 5L).toList, "ranks must be 1..k")
      // scores non-increasing in rank; no probe as its own neighbor
      val ordered = g.sortBy(_._4)
      assert(ordered.map(_._3) == ordered.map(_._3).sorted.reverse)
      assert(g.forall(x => x._2 != x._1))
    }
  }

  test("IVFADC: cell blocking only prunes — scores identical, neighbors in probed cells") {
    val df = synth(60)
    val ivf = SimSearch.pqIvfTopKQ(df, nProbes = 3, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    PipelineCaches.release(spark)
    // driver replay of the blocking: normalized argmax cell (sim desc,
    // cell asc) over centroids 5..20; probe keeps its top-2 cells
    val vs = (0L until 60L).map { i =>
      i -> (0 until 64).map(j =>
        ((((i * 31 + j * 17) % 97).toFloat - 48f) / 48f).toDouble).toArray
    }.toMap
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    def cos(a: Long, b: Long) =
      dot(vs(a), vs(b)) / (math.sqrt(dot(vs(a), vs(a))) * math.sqrt(dot(vs(b), vs(b))))
    val cents = (5L until 21L).toSeq
    def cellOf(i: Long): Long =
      cents.map(c => (c, cos(i, c))).maxBy { case (c, s) => (s, -c) }._1
    def probeCells(p: Long): Set[Long] =
      cents.map(c => (c, cos(p, c))).sortBy { case (c, s) => (-s, c) }
        .take(2).map(_._1).toSet
    assert(ivf.nonEmpty)
    ivf.foreach { case (p, nb, _) =>
      assert(probeCells(p).contains(cellOf(nb)),
        s"neighbor $nb of probe $p must sit in a probed cell")
    }
    // blocking never changes a score: every (probe, neighbor) the IVF
    // form returns carries the SAME ADC integer the full scan computes
    val fullScores = SimSearch.pqTopKQ(df, nProbes = 3, k = 59)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    PipelineCaches.release(spark)
    ivf.foreach { case (p, nb, s) =>
      assert(fullScores((p, nb)) == s,
        s"ADC score for ($p, $nb) diverged between full and blocked scans")
    }
  }
}
