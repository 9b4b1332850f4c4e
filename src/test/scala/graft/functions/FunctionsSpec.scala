package graft.functions

import org.apache.spark.sql.functions.{col, row_number}

import graft.SparkSuite
import graft.sources.Catalog

/** UDAF surface + SQL catalog: the registered typed Aggregators must
  * agree with the builtins they mirror, through the spark.sql path. */
class FunctionsSpec extends SparkSuite {

  test("count_agg / avg_agg agree with builtin count / avg via SQL") {
    Aggregators.register(spark)
    Catalog.registerAll(spark, sf)
    val rows = spark.sql(
      """SELECT l_suppkey,
        |count_agg(l_orderkey) AS c_udaf, count(*) AS c_builtin,
        |avg_agg(l_orderkey) AS a_udaf, avg(l_orderkey) AS a_builtin
        |FROM lineitem GROUP BY l_suppkey""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("c_udaf") == r.getAs[Long]("c_builtin"))
      assert(math.abs(r.getAs[Double]("a_udaf") - r.getAs[Double]("a_builtin")) < 1e-9)
    }
  }

  test("sorted_intersect_count matches array_intersect on random sorted arrays") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    SortedLongIntersectCount.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200) {
      def arr() = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      (arr(), arr())
    }
    val df = rows.toDF("a", "b").select(
      expr("sorted_intersect_count(a, b)").as("fast"),
      size(array_intersect(col("a"), col("b"))).as("reference"))
    assert(df.filter(col("fast") =!= col("reference")).isEmpty)
    // empty-array and disjoint edges
    val edge = Seq((Seq.empty[Long], Seq(1L, 2L)), (Seq(1L), Seq(2L)))
      .toDF("a", "b")
      .select(expr("sorted_intersect_count(a, b)").as("c")).as[Int].collect()
    assert(edge.toSeq == Seq(0, 0))
  }

  test("dot_double is bitwise-identical to the HOF fold it replaces") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    DotProductDouble.register(spark)
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200) {
      val d = 16
      (Seq.fill(d)(rnd.nextDouble() * 2 - 1), Seq.fill(d)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("a", "b").select(
      expr("dot_double(a, b)").as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("reference"))
    // exact equality on purpose: both fold left-to-right, so not a
    // single ulp may differ — that exactness is what keeps the
    // similarity queries oracle-stable
    assert(df.filter(col("fast") =!= col("reference")).isEmpty)
    // null argument and empty-array edges
    val edge = Seq((Some(Seq(1.0, 2.0)), None), (Some(Seq.empty[Double]), Some(Seq.empty[Double])))
      .toDF("a", "b")
      .select(expr("dot_double(a, b)").as("c")).collect()
    assert(edge(0).isNullAt(0) && edge(1).getDouble(0) == 0.0)
    // degenerate inputs must match the HOF (zip_with pads with null →
    // whole fold null): mismatched lengths and null elements both yield
    // NULL, never a silent truncation to the shorter array
    val deg = Seq(
      (Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](1.0, 2.0)),
      (Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](1.0, 2.0, 3.0)))
      .toDF("a", "b")
      .select(expr("dot_double(a, b)").as("fast"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as("reference")).collect()
    deg.foreach(r => assert(r.isNullAt(0) && r.isNullAt(1),
      s"degenerate input must be null in both forms: $r"))
  }

  test("GraftExtensions descriptor: name, builder, and injection wiring") {
    val (ident, info, builder) = SortedLongIntersectCount.descriptor
    assert(ident.funcName == SortedLongIntersectCount.FnName)
    assert(info.getName == SortedLongIntersectCount.FnName)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val e = builder(Seq(
      Literal.create(Array(1L, 2L), ArrayType(LongType)),
      Literal.create(Array(2L, 3L), ArrayType(LongType))))
    assert(e.isInstanceOf[SortedLongIntersectCount])
    assert(e.eval(null) == 1)
    val (wIdent, _, wBuilder) = WinnowMins.descriptor
    assert(wIdent.funcName == WinnowMins.FnName)
    val we = wBuilder(Seq(
      Literal.create(Array(3L, 1L, 2L), ArrayType(LongType)),
      Literal.create(2, org.apache.spark.sql.types.IntegerType)))
    assert(we.isInstanceOf[WinnowMins])
    assert(we.eval(null).asInstanceOf[
      org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq == Seq(1L))
    // the full injection path (a fresh session resolving the function
    // with no register() call) needs session construction — covered by
    // `sbt "runMain graft.ExtensionsSmoke"`, which this JVM's shared
    // session can't re-create; here we pin that apply() injects exactly
    // our descriptor without throwing
    new graft.GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("md5_bits codegen path matches conv(substring(md5)) on real corpus tokens") {
    Md5Bits.register(spark)
    import org.apache.spark.sql.functions._
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(lower(col("text")), "\\s+")).as("t")).limit(5000)
    for ((off, n) <- Seq((0, 15), (16, 15), (0, 8))) {
      val bad = toks.select(
          expr(s"md5_bits(t, $off, $n)").as("fast"),
          expr(s"cast(conv(substring(md5(t), ${off + 1}, $n), 16, 10) as bigint)").as("ref"))
        .filter(col("fast") =!= col("ref"))
      assert(bad.isEmpty, s"window ($off, $n) diverged")
    }
    // null in, null out — matches the builtin chain
    import spark.implicits._
    assert(Seq[String](null).toDF("t")
      .select(expr("md5_bits(t, 0, 15)")).head.isNullAt(0))
  }

  test("sql catalog exposes every table") {
    Catalog.registerAll(spark, sf)
    Catalog.tables.foreach { t =>
      assert(spark.sql(s"SELECT * FROM $t LIMIT 1").count() == 1, s"table $t empty")
    }
  }

  test("TopKAgg equals the rank-filter reference; plan is partial+final aggregate") {
    val q = graft.ops.Relational.topKAggQ(spark, sf)
    val got = q.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // rank-filter reference with the identical tie-break
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val want = graft.sources.Tables.orders(spark, sf)
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
      .select(col("o_orderpriority"), col("rnk").cast("long"),
        col("o_orderkey"), col("o_totalprice"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == want)
    // the scale claim: a PARTIAL aggregate runs before the exchange, so
    // each map task ships <= k rows per group — never the full row set
    val plan = q.queryExecution.executedPlan.toString
    // the SPECIFIC partial: a generic "partial" substring would stay
    // green on any other aggregate in the plan while TopKAgg itself
    // decayed to a complete-mode (shuffle-everything) aggregate
    assert(plan.contains("partial_topkagg"), plan.take(800))
    assert(!plan.contains("Window"), "top-k aggregate must not fall back to a window sort")
  }

  test("TopKAgg: capped insert law — any split/merge order equals global sort take-k") {
    import graft.functions.Aggregators.{Scored, TopKAgg}
    val agg = new TopKAgg(5)
    val rng = new scala.util.Random(7)
    // NaN and both zero signs ride along: the comparator must stay a
    // TOTAL order (NaN greatest, +-0.0 equal -> tag tie-break) or the
    // fold below becomes partition-order-dependent
    def score(i: Int): Double = i % 23 match {
      case 0 => Double.NaN
      case 1 => 0.0
      case 2 => -0.0
      case _ => rng.nextInt(40).toDouble
    }
    val xs = (0 until 200).map(i => Scored(score(i), rng.nextLong().abs))
    def key(s: Scored): (Double, Long) =
      // SQL's total order, negated for descending: NaN greatest, zeros equal
      (-(if (s.score == 0.0) 0.0
         else if (s.score.isNaN) Double.MaxValue * 2 else s.score), s.tag)
    val want = xs.sortBy(key).take(5)
    // single fold
    assert(xs.foldLeft(agg.zero)(agg.reduce) == want)
    // arbitrary partition into partial buffers, then merge in odd order
    val parts = xs.grouped(17).map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
    val merged = scala.util.Random.shuffle(parts.toList)
      .foldLeft(agg.zero)(agg.merge)
    assert(merged == want)
    // order-independence directly: reversed input, same answer
    assert(xs.reverse.foldLeft(agg.zero)(agg.reduce) == want)
  }
}
