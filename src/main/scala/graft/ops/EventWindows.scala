package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch forms of the two reference streaming jobs (SURVEY.md §2.1 rows
  * 10, 11, 14). The streaming forms share these exact groupBy(window(...))
  * definitions via Structured Streaming — see [[graft.streaming]].
  * Window boundaries are epoch-aligned and end-exclusive in both Flink
  * (TimeWindow.getEnd, HotMediaTrack.java:142) and Spark's `window()`;
  * we emit the window end as epoch seconds (BIGINT) so the DuckDB oracle
  * compares integers, not timestamp encodings.
  */
object EventWindows {

  /** Job-A replica (HotMediaTrack.java:88-90), batch form: count per
    * (30 s tumbling window, key). Key = event_type stands in for the
    * reference's (appid, type) composite; window end exclusive, ms→s. */
  def tumbleCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "30 seconds"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        unix_timestamp(col("window.end")).as("win_end"),
        col("event_type"), col("cnt"))

  /** Session windows (gap-based, the third window kind after tumbling and
    * sliding — absent from the reference, declared in SURVEY §2.4
    * "Streaming"): per-user sessions close after `gap` of inactivity;
    * window = [first event, last event + gap). Spark's `session_window`
    * plans a per-key sort + merge inside one aggregate (no self-join /
    * no window-function pass); the identical expression runs incrementally
    * under Structured Streaming with a watermark (StreamingExtrasSpec).
    * Gap of 12h matches the synthetic events cadence (~11h mean per-user
    * inter-arrival) so sessions actually merge. */
  def sessionCounts(events: DataFrame, gap: String = "12 hours"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"))

  /** Job-B replica (HotItemAnalysis.java:103-108), batch form:
    * filter(pv-analog) → 1 h sliding window, 5 min slide → count per
    * (window, user) → top-3 per window end with the declared deterministic
    * tie-break (count desc, user_id asc — SURVEY §7.3-3). */
  def slideTopN(events: DataFrame, n: Int = 3): DataFrame = {
    // the sliding window replicates every row into 12 panes before the
    // partial aggregate — spread the single-row-group scan first
    val counts = graft.sources.Tables.fanout(events)
      .filter(col("event_type") === "purchase")
      .groupBy(window(col("ts"), "1 hour", "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("window.end")).as("win_end"), col("user_id"), col("cnt"))
    val w = Window.partitionBy(col("win_end"))
      .orderBy(col("cnt").desc, col("user_id").asc)
    counts.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= n)
  }
}
