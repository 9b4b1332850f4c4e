package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only decomposition of the approx-profile cost: which aggregate
  * family pays — the HLLs, the string min/max (SortAggregate fallback),
  * or the scan. Usage: runMain graft.tools.ProfileLab */
object ProfileLab {
  def main(args: Array[String]): Unit = {
    val spark = Lab.session()
    val li = graft.sources.Tables.fanout(
      graft.sources.Tables.lineitem(spark, Lab.sfDir))
    val numd = Seq(
      ("l_orderkey", col("l_orderkey").cast("double")),
      ("l_quantity", col("l_quantity").cast("double")),
      ("l_extendedprice", col("l_extendedprice").cast("double")),
      ("l_shipdate", col("l_shipdate").cast("timestamp").cast("double")))
    val strs = Seq(("l_returnflag", col("l_returnflag")),
      ("l_linestatus", col("l_linestatus")))

    Lab.bench("lab", "scan only") {
      Lab.noop(li.agg(count(lit(1))))
    }
    Lab.bench("lab", "numeric min/max/cnt only (hash)") {
      Lab.noop(li.agg(count(lit(1)), numd.flatMap { case (n, c) =>
        Seq(count(c), min(c), max(c)) }: _*))
    }
    Lab.bench("lab", "numeric + hll (hash?)") {
      Lab.noop(li.agg(count(lit(1)), numd.flatMap { case (n, c) =>
        Seq(count(c), min(c), max(c), approx_count_distinct(c, 0.02)) }: _*))
    }
    Lab.bench("lab", "string minmax only (sort)") {
      Lab.noop(li.agg(count(lit(1)), strs.flatMap { case (n, c) =>
        Seq(count(c), min(c), max(c)) }: _*))
    }
    Lab.bench("lab", "string + hll") {
      Lab.noop(li.agg(count(lit(1)), strs.flatMap { case (n, c) =>
        Seq(count(c), min(c), max(c), approx_count_distinct(c, 0.02)) }: _*))
    }
    Lab.bench("lab", "everything (current)") {
      Lab.noop(li.agg(count(lit(1)), (numd ++ strs).flatMap { case (n, c) =>
        Seq(count(c), min(c), max(c), approx_count_distinct(c, 0.02)) }: _*))
    }
    Lab.bench("lab", "hll rsd=0.05") {
      Lab.noop(li.agg(count(lit(1)), (numd ++ strs).flatMap { case (n, c) =>
        Seq(count(c), min(c), max(c), approx_count_distinct(c, 0.05)) }: _*))
    }
    // raw columns: min/max/HLL on the native type, casts AFTER the agg
    val raw = Seq(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
      col("l_shipdate"), col("l_returnflag"), col("l_linestatus"))
    Lab.bench("lab", "raw cols rsd=0.05") {
      Lab.noop(li.agg(count(lit(1)), raw.flatMap { c =>
        Seq(count(c), min(c), max(c), approx_count_distinct(c, 0.05)) }: _*))
    }
    Lab.bench("lab", "datasketches hll_sketch_agg") {
      Lab.noop(li.agg(count(lit(1)), raw.flatMap { c =>
        Seq(count(c), min(c), max(c),
          hll_sketch_estimate(hll_sketch_agg(c.cast("string")))) }: _*))
    }
    val liNoFan = graft.sources.Tables.lineitem(spark, Lab.sfDir)
    Lab.bench("lab", "no-fanout raw rsd=0.05") {
      Lab.noop(liNoFan.agg(count(lit(1)), raw.flatMap { c =>
        Seq(count(c), min(c), max(c), approx_count_distinct(c, 0.05)) }: _*))
    }
    // register-melt HLL prototype: codegen end-to-end, p=12
    val p = 12
    Lab.bench("lab", "register-melt p=12 (hll only)") {
      val cols = raw
      val melted = li.select(explode(array(cols.zipWithIndex.map { case (c, i) =>
        struct(lit(i).as("cid"), xxhash64(c).as("h"))
      }: _*)).as("m")).select(col("m.cid").as("cid"), col("m.h").as("h"))
        .filter(col("h").isNotNull)
      val regs = melted
        .select(col("cid"), shiftrightunsigned(col("h"), 64 - p).as("j"),
          shiftleft(col("h"), p).as("w"))
        .groupBy(col("cid"), col("j"))
        .agg(max(when(col("w") === 0L, lit(64 - p + 1))
          .otherwise(lit(64) - length(bin(col("w"))) + 1)).as("rho"))
      Lab.noop(regs.groupBy("cid").agg(sum(pow(lit(0.5), col("rho"))), count(lit(1))))
    }
    Lab.bench("lab", "no-fanout sketch(xxhash64)") {
      Lab.noop(liNoFan.agg(count(lit(1)), raw.flatMap { c =>
        Seq(count(c), min(c), max(c),
          hll_sketch_estimate(hll_sketch_agg(when(c.isNotNull, xxhash64(c))))) }: _*))
    }
    Lab.bench("lab", "fanout sketch(xxhash64)") {
      Lab.noop(li.agg(count(lit(1)), raw.flatMap { c =>
        Seq(count(c), min(c), max(c),
          hll_sketch_estimate(hll_sketch_agg(when(c.isNotNull, xxhash64(c))))) }: _*))
    }
    Lab.bench("lab", "no-fanout minmax only") {
      Lab.noop(liNoFan.agg(count(lit(1)), raw.flatMap { c =>
        Seq(count(c), min(c), max(c)) }: _*))
    }
    Lab.bench("lab", "no-fanout sketch lgK=10") {
      Lab.noop(liNoFan.agg(count(lit(1)), raw.flatMap { c =>
        Seq(count(c), min(c), max(c),
          hll_sketch_estimate(hll_sketch_agg(when(c.isNotNull, xxhash64(c)), 10))) }: _*))
    }
    Lab.bench("lab", "no-fanout hll(xxhash64) rsd=0.05") {
      Lab.noop(liNoFan.agg(count(lit(1)), raw.flatMap { c =>
        Seq(count(c), min(c), max(c),
          approx_count_distinct(when(c.isNotNull, xxhash64(c)), 0.05)) }: _*))
    }
    Lab.bench("lab", "no-fanout count only") {
      Lab.noop(liNoFan.agg(count(lit(1))))
    }
    val numRaw = Seq(col("l_orderkey"), col("l_quantity"),
      col("l_extendedprice"), col("l_shipdate"))
    val strRaw = Seq(col("l_returnflag"), col("l_linestatus"))
    Lab.bench("lab", "3-way split crossJoin") {
      val a = liNoFan.agg(count(lit(1)).as("n_rows"), numRaw.flatMap { c =>
        Seq(count(c), min(c), max(c)) }: _*)
      val b = liNoFan.agg(strRaw.flatMap { c =>
        Seq(count(c), min(c), max(c)) }.head, strRaw.flatMap { c =>
        Seq(count(c), min(c), max(c)) }.tail: _*)
      val h = liNoFan.agg(
        approx_count_distinct(numRaw.head, 0.05),
        (numRaw.tail ++ strRaw).map(c => approx_count_distinct(c, 0.05)): _*)
      Lab.noop(a.crossJoin(b).crossJoin(h))
    }
    Lab.bench("lab", "4-way split crossJoin") {
      val a = liNoFan.agg(count(lit(1)).as("n_rows"), numRaw.flatMap { c =>
        Seq(count(c), min(c), max(c)) }: _*)
      val b = liNoFan.agg(strRaw.flatMap { c =>
        Seq(count(c), min(c), max(c)) }.head, strRaw.flatMap { c =>
        Seq(count(c), min(c), max(c)) }.tail: _*)
      val h1 = liNoFan.agg(
        approx_count_distinct(numRaw.head, 0.05),
        numRaw.tail.map(c => approx_count_distinct(c, 0.05)): _*)
      val h2 = liNoFan.agg(
        approx_count_distinct(strRaw.head, 0.05),
        strRaw.tail.map(c => approx_count_distinct(c, 0.05)): _*)
      Lab.noop(a.crossJoin(b).crossJoin(h1).crossJoin(h2))
    }
    Lab.bench("lab", "2-way split crossJoin (num-codegen | str+hll)") {
      val a = liNoFan.agg(count(lit(1)).as("n_rows"), numRaw.flatMap { c =>
        Seq(count(c), min(c), max(c), approx_count_distinct(c, 0.05)) }: _*)
      val b = liNoFan.agg(strRaw.flatMap { c =>
        Seq(count(c), min(c), max(c), approx_count_distinct(c, 0.05)) }.head,
        strRaw.flatMap { c =>
          Seq(count(c), min(c), max(c), approx_count_distinct(c, 0.05)) }.tail: _*)
      Lab.noop(a.crossJoin(b))
    }
    spark.stop()
  }
}
