package graft.streaming

import java.net.ServerSocket
import java.util.concurrent.CountDownLatch

import graft.SparkSuite

/** Live-transport smoke: the reference's Job A consumes a string stream
  * from a network transport (Kafka, HotMediaTrack.java:67-74). No Kafka
  * jar exists in this environment (spark-sql-kafka is absent from
  * /opt/spark/jars and coursier is offline — SURVEY §7.4-7), so this
  * spec closes the gap with the OTHER live TCP transport Spark ships:
  * the socket source. Same contract as the Kafka path — an unbounded
  * stream of JSON strings arriving over a network connection — through
  * the identical parse→window pipeline ([[HotMediaTrackJob.pipeline]]
  * is source-agnostic; the Kafka wiring differs only in the
  * options-configured source).
  */
class SocketSmokeSpec extends SparkSuite {

  test("parse→window pipeline over a live TCP socket stream emits closed windows") {
    val lines = Seq(
      """{"appid":"a1","event_type":2,"timestamp":10,"log_time":10000}""",
      """{"appid":"a1","event_type":2,"timestamp":12,"log_time":12000}""",
      """{"appid":"a2","event_type":3,"timestamp":20,"log_time":20000}""",
      """not json — dropped by the parse guard""",
      // watermark pusher: 60 s closes the [0,30 s) window in append mode
      """{"appid":"a1","event_type":2,"timestamp":60,"log_time":60000}"""
    )
    val server = new ServerSocket(0)
    val done = new CountDownLatch(1)
    @volatile var feedErr: Throwable = null
    val feeder = new Thread(() => {
      try {
        val sock = server.accept()
        val out = new java.io.PrintWriter(sock.getOutputStream, true)
        lines.foreach(out.println)
        out.flush()
        done.await() // keep the connection open until assertions finish
        sock.close()
      } catch { case t: Throwable => feedErr = t }
    })
    feeder.setDaemon(true)
    feeder.start()

    val raw = spark.readStream.format("socket")
      .option("host", "localhost").option("port", server.getLocalPort).load()
    val q = HotMediaTrackJob.pipeline(raw)
      .writeStream.outputMode("append").format("memory")
      .queryName("sock_smoke").start()
    try {
      // TCP delivery is async — poll until the closed window surfaces
      val deadline = System.currentTimeMillis() + 30000
      var rows = Array.empty[org.apache.spark.sql.Row]
      while (rows.isEmpty && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        rows = spark.sql(
          "SELECT appid, type, count FROM sock_smoke WHERE time = timestamp'1970-01-01 00:00:30'"
        ).collect()
        if (rows.isEmpty) Thread.sleep(200)
      }
      assert(feedErr == null, s"feeder failed: $feedErr")
      val got = rows.map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      assert(got == Set(("a1", 2, 2L), ("a2", 3, 1L)),
        s"window [0,30s) counts over the socket stream: ${got.mkString(", ")}")
    } finally {
      done.countDown()
      q.stop()
      server.close()
    }
  }
}
