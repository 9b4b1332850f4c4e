package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Stream-stream interval join and checkpoint recovery — the two
  * Structured Streaming behaviors a Flink user would demand parity on
  * beyond windows/state (Flink: intervalJoin; savepoints). */
class DurabilitySpec extends SparkSuite {

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("stream-stream interval join: matches within the time bound only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp)]
    val c = clicks.toDF().toDF("user_c", "ts_c").withWatermark("ts_c", "0 seconds")
    val b = buys.toDF().toDF("user_b", "ts_b").withWatermark("ts_b", "0 seconds")
    // buy attributed to a click iff within 60s AFTER the click
    val joined = c.join(b,
      col("user_c") === col("user_b") &&
        col("ts_b") >= col("ts_c") && col("ts_b") <= col("ts_c") + expr("interval 60 seconds"))
    val q = joined.select(col("user_c"), unix_timestamp(col("ts_c")).as("c_s"),
        unix_timestamp(col("ts_b")).as("b_s"))
      .writeStream.outputMode("append").format("memory").queryName("attrib").start()
    try {
      clicks.addData((1L, ts(100)), (2L, ts(100)))
      buys.addData((1L, ts(130)), (2L, ts(200))) // u1 inside 60s, u2 outside
      q.processAllAvailable()
      clicks.addData((9L, ts(1000))); buys.addData((9L, ts(2000))) // wm pusher
      q.processAllAvailable()
      val got = spark.table("attrib").as[(Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 100L, 130L)), s"got $got")
    } finally q.stop()
  }

  test("checkpoint recovery: restart resumes exactly-once from a file source") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_src").toString
    val out = Files.createTempDirectory("graft_out").toString
    val chk = Files.createTempDirectory("graft_chk").toString
    def writeFile(name: String, lines: String*): Unit =
      Files.write(java.nio.file.Paths.get(in, name),
        lines.mkString("\n").getBytes)

    def startQuery() = spark.readStream
      .schema("k STRING")
      .csv(in)
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", chk).start()

    writeFile("f1.csv", "a", "b")
    val q1 = startQuery()
    try { q1.processAllAvailable() } finally q1.stop()

    // second batch arrives while the query is DOWN; restart must pick it
    // up from the checkpoint without re-emitting f1's rows
    writeFile("f2.csv", "c")
    val q2 = startQuery()
    try { q2.processAllAvailable() } finally q2.stop()

    val got = spark.read.parquet(out).as[String].collect().sorted.toSeq
    assert(got == Seq("a", "b", "c"), s"got $got")
  }
}
