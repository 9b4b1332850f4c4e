package graft.ops

import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Properties}

/** Pure count-min-sketch laws over random token multisets — a driver
  * replica of [[CmsIndex]]'s portable md5 grid (the Catalyst path and
  * the persisted form are covered in CmsIndexSpec; these properties
  * drive the sketch MATH across random corpora):
  *  - one-sided error: estimate ≥ exact count for every token;
  *  - exactness without collisions: if a token shares no bucket in
  *    some row with any other token, its estimate is exact;
  *  - mergeability: grid(A ⊎ B) = grid(A) + grid(B) elementwise. */
object CmsProps extends Properties("CountMinSketch") {

  private val D = CmsIndex.Depth
  private val W = CmsIndex.Width

  private def bucket(tok: String, d: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"cms$d:$tok".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    (java.lang.Long.parseLong(hex, 16) % W).toInt
  }

  private def grid(counts: Map[String, Long]): Array[Array[Long]] = {
    val g = Array.fill(D)(new Array[Long](W))
    counts.foreach { case (t, n) =>
      (0 until D).foreach(d => g(d)(bucket(t, d)) += n)
    }
    g
  }

  private def estimate(g: Array[Array[Long]], tok: String): Long =
    (0 until D).map(d => g(d)(bucket(tok, d))).min

  private val corpusGen: Gen[Map[String, Long]] = for {
    n <- Gen.chooseNum(1, 40)
    toks <- Gen.listOfN(n, Gen.identifier.map(_.take(8)))
    ns <- Gen.listOfN(n, Gen.chooseNum(1L, 1000L))
  } yield toks.zip(ns).groupBy(_._1).map { case (t, g) => t -> g.map(_._2).sum }

  property("one-sided error: estimate >= exact for every token") =
    forAll(corpusGen) { counts =>
      val g = grid(counts)
      counts.forall { case (t, n) => estimate(g, t) >= n }
    }

  property("no collision in some row -> estimate exact") =
    forAll(corpusGen) { counts =>
      val g = grid(counts)
      counts.forall { case (t, n) =>
        val collisionFree = (0 until D).exists { d =>
          val b = bucket(t, d)
          counts.keys.forall(o => o == t || bucket(o, d) != b)
        }
        !collisionFree || estimate(g, t) == n
      }
    }

  property("mergeability: grid(A ++ B) = grid(A) + grid(B)") =
    forAll(corpusGen, corpusGen) { (a, b) =>
      val union = (a.keySet ++ b.keySet).map(t =>
        t -> (a.getOrElse(t, 0L) + b.getOrElse(t, 0L))).toMap
      val gu = grid(union)
      val ga = grid(a)
      val gb = grid(b)
      (0 until D).forall(d => (0 until W).forall(w =>
        gu(d)(w) == ga(d)(w) + gb(d)(w)))
    }
}
