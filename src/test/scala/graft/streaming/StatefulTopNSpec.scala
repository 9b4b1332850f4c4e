package graft.streaming

import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Properties}

import graft.model.ItemViewCount

/** Property tests for the pure core of the stateful Top-N
  * (count desc, itemId asc — the declared tie-break, SURVEY §7.3-3). */
object StatefulTopNSpec extends Properties("StatefulTopN") {

  private val itemGen = for {
    id <- Gen.choose(1L, 50L)
    cnt <- Gen.choose(1L, 100L)
  } yield ItemViewCount(id, 1000L, cnt)

  property("bounded size, ranks 1..n, ordered, contains max") =
    forAll(Gen.listOf(itemGen)) { items =>
      val got = StatefulTopN.topN(items, 3)
      val keys = got.map(r => (-r.count, r.itemId))
      got.size == math.min(3, items.size) &&
        got.map(_.rank) == (1 to got.size) &&
        keys == keys.sorted &&
        (items.isEmpty || got.head.count == items.map(_.count).max)
    }

  property("permutation invariant") =
    forAll(Gen.listOf(itemGen)) { items =>
      StatefulTopN.topN(items, 3) == StatefulTopN.topN(items.reverse, 3)
    }
}
