package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Sink + source surface (SURVEY §2.4 rows "Sources"/"Sinks"): the
  * batched JDBC-shaped foreachBatch contract, the parquet streaming
  * sink, and the rate test source. */
class SinksSpec extends SparkSuite {

  test("foreachBatch sink: batched delivery, batch ids monotone (JDBC shape)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val seen = mutable.ArrayBuffer.empty[(Long, Long)] // (batchId, rowCount)
    // same shape as HotMediaTrackJob.jdbcSink: per micro-batch bulk write
    // tagged with batchId for idempotent replay — collector stands in for
    // the JDBC connection (no DB in this environment)
    val q = input.toDF().writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        seen.synchronized { seen += ((batchId, batch.count())) }
        ()
      }.start()
    try {
      input.addData("a", "b", "c"); q.processAllAvailable()
      input.addData("d"); q.processAllAvailable()
      val s = seen.synchronized(seen.toList)
      assert(s.map(_._2) == List(3L, 1L), s"got $s")
      assert(s.map(_._1) == s.map(_._1).sorted, "batch ids must be monotone")
    } finally q.stop()
  }

  test("parquet streaming sink: append output is re-readable batch data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft_pq_sink").toString
    val chk = Files.createTempDirectory("graft_pq_chk").toString
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "v")
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", chk).start()
    try {
      input.addData((1L, "x"), (2L, "y")); q.processAllAvailable()
      input.addData((3L, "z")); q.processAllAvailable()
      val back = spark.read.parquet(out)
      assert(back.count() == 3)
      assert(back.select(sum("id")).head.getLong(0) == 6L)
    } finally q.stop()
  }

  test("rate source declares the (timestamp, value) contract") {
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "5").load()
    assert(rate.isStreaming)
    assert(rate.schema.fieldNames.toSeq == Seq("timestamp", "value"))
    assert(rate.schema("value").dataType.typeName == "long")
  }
}
