package graft.tools

import org.apache.spark.sql.functions._

object HashLab2 {
  def main(args: Array[String]): Unit = {
    val spark = Lab.session()
    graft.functions.Md5Bits.register(spark)
    val toks = graft.sources.Tables.fanout(
        graft.sources.Tables.documents(spark, Lab.sfDir))
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
      .filter(col("t") =!= "")
    val fast = toks.select(expr("md5_bits(t, 0, 15)").as("h"))
    val ref = toks.select(
      expr("cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)").as("h"))
    println("=== fast plan ===")
    fast.explain("formatted")
    Lab.bench("hashlab2", "md5_bits", warm = 6, runs = 4)(Lab.noop(fast))
    Lab.bench("hashlab2", "conv", warm = 6, runs = 4)(Lab.noop(ref))
    // pure single-thread eval comparison, 2M calls each
    val s = org.apache.spark.unsafe.types.UTF8String.fromString("hello world token")
    def t(tag: String)(f: => Unit): Unit = {
      (1 to 2) foreach (_ => f)
      val t0 = System.nanoTime(); f
      println(f"[hashlab2] raw $tag ${(System.nanoTime() - t0) / 1e6}%.0f ms")
    }
    t("Md5Bits.eval x2M") {
      var i = 0; var acc = 0L
      while (i < 2000000) { acc ^= graft.functions.Md5BitsEval.eval(s, 0, 15); i += 1 }
      if (acc == 42) println("")
    }
    t("DigestUtils.md5Hex x2M") {
      var i = 0; var acc = 0
      while (i < 2000000) {
        acc ^= org.apache.commons.codec.digest.DigestUtils.md5Hex(s.getBytes).length; i += 1 }
      if (acc == 42) println("")
    }
    spark.stop()
  }
}
