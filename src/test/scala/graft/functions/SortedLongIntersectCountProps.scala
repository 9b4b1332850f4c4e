package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, LongType}
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Properties}

/** Pure-expression properties for the native merge-intersect: the
  * interpreted eval path checked against Scala Set intersection over
  * arbitrary sorted long arrays (the codegen path is covered by the
  * DataFrame differential test in FunctionsSpec). */
object SortedLongIntersectCountProps extends Properties("SortedLongIntersectCount") {

  private val sortedArr: Gen[Array[Long]] =
    Gen.listOf(Gen.choose(-100L, 100L)).map(_.distinct.sorted.toArray)

  private def evalCount(a: Array[Long], b: Array[Long]): Int =
    SortedLongIntersectCount(
      Literal.create(a, ArrayType(LongType)),
      Literal.create(b, ArrayType(LongType))
    ).eval(null).asInstanceOf[Int]

  property("equals Set intersection size") = forAll(sortedArr, sortedArr) { (a, b) =>
    evalCount(a, b) == a.toSet.intersect(b.toSet).size
  }

  property("commutative") = forAll(sortedArr, sortedArr) { (a, b) =>
    evalCount(a, b) == evalCount(b, a)
  }

  property("self-intersection = size; empty = 0") = forAll(sortedArr) { a =>
    evalCount(a, a) == a.length && evalCount(a, Array.empty[Long]) == 0
  }
}
