package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only micro-benchmark: the builtin md5-window spelling
  * (hex-encode + substring + base-16 parse) vs the native Md5Bits
  * expression, over the real sf token stream. */
object HashLab {
  def main(args: Array[String]): Unit = {
    val spark = Lab.session()
    graft.functions.Md5Bits.register(spark)
    val toks = graft.sources.Tables.fanout(
        graft.sources.Tables.documents(spark, Lab.sfDir))
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
      .filter(col("t") =!= "")
    println(s"[hashlab] rows=${toks.count()}")
    Lab.bench("hashlab", "conv(substring(md5))") {
      Lab.noop(toks.select(
        expr("cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)").as("h")))
    }
    Lab.bench("hashlab", "md5_bits") {
      Lab.noop(toks.select(expr("md5_bits(t, 0, 15)").as("h")))
    }
    // the signature shape: two lanes from each of 4 salted md5s
    Lab.bench("hashlab", "8 lanes via conv") {
      Lab.noop(toks.select((0 until 4).flatMap { i =>
        val m = md5(concat(lit(s"$i:"), col("t")))
        Seq(expr(s"cast(conv(substring(md5(concat('$i:', t)), 1, 15), 16, 10) as bigint)"),
          expr(s"cast(conv(substring(md5(concat('$i:', t)), 17, 15), 16, 10) as bigint)"))
      }: _*))
    }
    Lab.bench("hashlab", "8 lanes via md5_bits") {
      Lab.noop(toks.select((0 until 4).flatMap { i =>
        Seq(expr(s"md5_bits(concat('$i:', t), 0, 15)"),
          expr(s"md5_bits(concat('$i:', t), 16, 15)"))
      }: _*))
    }
    spark.stop()
  }
}
