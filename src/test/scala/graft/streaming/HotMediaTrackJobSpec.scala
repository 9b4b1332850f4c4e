package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Job-A streaming semantics (FIXTURES.md §1.1): epoch-aligned
  * end-exclusive 30 s windows, unit normalization, null event_time,
  * unknown JSON fields, late-row drop under the ascending watermark. */
class HotMediaTrackJobSpec extends SparkSuite {

  private def js(appid: String, etype: Int, logTimeMs: Long,
      eventTime: Option[Long] = None, extra: String = ""): String = {
    val et = eventTime.map(t => s""""event_time": $t,""").getOrElse("")
    s"""{"appid": "$appid", "event_type": $etype, "timestamp": ${logTimeMs / 1000}, $et "log_time": $logTimeMs$extra}"""
  }

  test("tumbling window counts: boundaries, late drop, null event_time") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val out = HotMediaTrackJob.pipeline(input.toDF())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("jobA").start()
    try {
      // batch 1: two keys across the [0,30s) / [30s,60s) boundary
      input.addData(
        js("a1", 2, 10000, extra = """, "brand": "Honor", "lat": 30.4"""),
        js("a1", 2, 20000, eventTime = Some(15)),
        js("a2", 3, 29999), // last instant of [0,30s)
        js("a1", 2, 30000)) // first instant of [30s,60s)
      q.processAllAvailable()
      // batch 2: watermark pusher (closes everything ≤ 90s) + a late row
      // for the already-finalized [0,30s) window → must be dropped
      input.addData(js("a9", 1, 95000), js("a1", 2, 5000))
      q.processAllAvailable()

      val rows = spark.table("jobA")
        .select(unix_millis(col("time")).as("end"), col("appid"), col("type"), col("count"))
        .as[(Long, String, Int, Long)].collect().toSet
      assert(rows.contains((30000L, "a1", 2, 2L)), s"got $rows") // late row NOT counted
      assert(rows.contains((30000L, "a2", 3, 1L)))
      assert(rows.contains((60000L, "a1", 2, 1L)))
      // window [0,30s) emitted exactly once despite the late row
      assert(rows.count(_._1 == 30000L) == 2)
    } finally q.stop()
  }

  test("parse: projection, unit normalization, unknown fields ignored") {
    import spark.implicits._
    val raw = Seq(
      js("app", 7, 1579337998710L, eventTime = Some(1579337996L), extra = """, "junk": "x""""),
      js("app2", 1, 1000)).toDF("value")
    val got = HotMediaTrackJob.parse(raw).collect()
    val r = got.find(_.getString(0) == "app").get
    assert(r.getInt(1) == 7)
    assert(r.getLong(2) == 1579337998710L / 1000 * 1000) // sendTime = s→ms
    assert(r.getLong(3) == 1579337996000L)               // eventTime s→ms
    assert(r.getLong(4) == 1579337998710L)               // receiveTime already ms
    val r2 = got.find(_.getString(0) == "app2").get
    assert(r2.isNullAt(3), "absent event_time must stay null")
  }

  test("typed parse: Dataset[LogTrack] with Option-typed nullable field") {
    import spark.implicits._
    val raw = Seq(
      js("app", 7, 1579337998710L, eventTime = Some(1579337996L)),
      js("app2", 1, 1000)).toDF("value")
    val got = HotMediaTrackJob.parseTyped(raw).collect().sortBy(_.appid)
    assert(got.head == graft.model.LogTrack("app", 7, 1579337998000L,
      Some(1579337996000L), 1579337998710L))
    assert(got(1).eventTime.isEmpty)
  }
}
