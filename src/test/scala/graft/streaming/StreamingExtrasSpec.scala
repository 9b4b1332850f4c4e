package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Streaming operators beyond the two reference jobs (SURVEY §2.4
  * "Streaming" row): session windows and watermarked stream dedup —
  * the same declarative expressions as batch, run incrementally. */
class StreamingExtrasSpec extends SparkSuite {

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("streaming session window merges within gap, splits across it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val sessions = input.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "0 seconds")
      .groupBy(session_window(col("ts"), "60 seconds"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("start_s"),
        unix_timestamp(col("session_window.end")).as("end_s"),
        col("n_events"))
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    try {
      // user 1: events at 0s, 30s, 59s chain into one session (each gap
      // < 60s); the event at 200s starts a new one. user 2: lone event.
      input.addData((1L, ts(0)), (1L, ts(30)), (1L, ts(59)), (2L, ts(10)))
      q.processAllAvailable()
      input.addData((1L, ts(200)))
      q.processAllAvailable()
      input.addData((1L, ts(1000))) // watermark pusher: closes all above
      q.processAllAvailable()

      val rows = spark.table("sessions")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(rows.contains((1L, 0L, 119L, 3L)), s"merged session, got $rows")
      assert(rows.contains((1L, 200L, 260L, 1L)))
      assert(rows.contains((2L, 10L, 70L, 1L)))
    } finally q.stop()
  }

  test("streaming dropDuplicates within watermark suppresses replays") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val deduped = input.toDF().toDF("event_id", "ts")
      .withWatermark("ts", "10 seconds")
      .dropDuplicates("event_id", "ts")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream").start()
    try {
      input.addData(("e1", ts(1)), ("e1", ts(1)), ("e2", ts(2)))
      q.processAllAvailable()
      input.addData(("e1", ts(1)), ("e3", ts(3))) // replay within watermark
      q.processAllAvailable()
      val got = spark.table("dedup_stream").select("event_id")
        .as[String].collect().sorted
      assert(got.toSeq == Seq("e1", "e2", "e3"), s"got ${got.toSeq}")
    } finally q.stop()
  }
}
