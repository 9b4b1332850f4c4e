package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

import graft.model.{ItemViewCount, PaneItem, RankedItem}

/** Stateful sliding-window hot-items: the faithful Spark translation of
  * the reference's window-aggregate + TopNHotItems KeyedProcessFunction
  * pair (HotItemAnalysis.java:104-108, 173-223), fused into one stateful
  * operator:
  *
  *  - pane assignment (Flink's sliding WindowAssigner) → a stateless
  *    12-way explode of each event into the panes that contain it;
  *  - per-(windowEnd) count accumulation (Flink's CountAgg ListState)
  *    → GroupState[Map[itemId → count]];
  *  - timer at windowEnd+1 (HotItemAnalysis.java:191)
  *    → GroupState.setTimeoutTimestamp; on fire: sort, take N, clear
  *    (HotItemAnalysis.java:199-222).
  *
  * Why fused: Spark's append-mode window aggregate emits a window only
  * once the watermark has passed its end — any downstream stateful
  * operator would see those rows as late and drop them. One operator
  * keyed by windowEnd gets Flink's exact state/timer semantics instead.
  *
  * Late semantics: events with ts < watermark are dropped entirely
  * (Spark's standard stateful late filter). Flink would still count a
  * borderline record into its not-yet-fired panes; with the reference's
  * ascending-timestamp watermark the two agree on all in-order input.
  *
  * Tie-break is deterministic (count desc, itemId asc) — SURVEY §7.3-3.
  *
  * Scale: state per windowEnd key is one count map, bounded by item
  * cardinality per window and cleared on firing; the pane explode is a
  * constant ×(size/slide) fan-out before the shuffle, identical to
  * Flink's sliding-window replication cost. Use the RocksDB state store
  * provider for large windows.
  */
object StatefulTopN {

  def topN(items: Seq[ItemViewCount], n: Int): Seq[RankedItem] =
    items.sortBy(i => (-i.count, i.itemId)).take(n).zipWithIndex.map {
      case (i, idx) => RankedItem(i.windowEnd, idx + 1, i.itemId, i.count)
    }

  /** Pane assignment: one row per (event, containing pane). Pane ends are
    * epoch-aligned slide multiples; every event falls in exactly
    * size/slide panes (slide divides size). */
  def panes(pv: DataFrame, sizeSec: Int = 3600, slideSec: Int = 300): Dataset[PaneItem] = {
    val spark = pv.sparkSession
    import spark.implicits._
    val nPanes = sizeSec / slideSec
    val slideMs = slideSec * 1000L
    val paneEnds = transform(sequence(lit(0), lit(nPanes - 1)), g =>
      timestamp_millis(
        (floor(col("tsMillis") / slideMs).cast("long") * slideMs)
          + lit(sizeSec * 1000L) - g.cast("long") * slideMs))
    pv.withColumn("ts", timestamp_millis(col("tsMillis")))
      .withWatermark("ts", "0 seconds")
      .select(col("ts"), explode(paneEnds).as("windowEnd"), col("itemId"))
      .as[PaneItem]
  }

  /** transformWithState form of the same operator (Spark 4's
    * arbitrary-state API — the successor to flatMapGroupsWithState and
    * the closest structural match to the reference's KeyedProcessFunction:
    * named state handles + explicitly registered event-time timers).
    * State decomposition mirrors Flink's: MapState[itemId → count] per
    * windowEnd key; one timer at windowEnd+1 (HotItemAnalysis.java:191).
    * Requires the RocksDB state store provider (the API's only backend —
    * which is also the SURVEY §7.3-7 posture for large state). */
  class TopNProcessor(n: Int)
      extends StatefulProcessor[Long, PaneItem, RankedItem] {
    @transient private var counts: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[Long, Long](
        "counts", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

    private def drain(windowEnd: Long): Iterator[RankedItem] = {
      val items = counts.iterator().map { case (id, c) =>
        ItemViewCount(id, windowEnd, c)
      }.toSeq
      counts.clear()
      topN(items, n).iterator
    }

    override def handleInputRows(key: Long, rows: Iterator[PaneItem],
        timerValues: TimerValues): Iterator[RankedItem] = {
      rows.foreach { r =>
        val c = if (counts.containsKey(r.itemId)) counts.getValue(r.itemId) else 0L
        counts.updateValue(r.itemId, c + 1L)
      }
      if (timerValues.getCurrentWatermarkInMs() >= key) drain(key) // replay: closed
      else { getHandle.registerTimer(key + 1); Iterator.empty }
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[RankedItem] =
      drain(key)
  }

  /** [[apply]] via transformWithState. Identical output contract —
    * HotItemAnalysisJobSpec asserts both forms agree. */
  def applyTws(paneItems: Dataset[PaneItem], n: Int = 3): Dataset[RankedItem] = {
    val spark = paneItems.sparkSession
    import spark.implicits._
    paneItems
      .groupByKey(_.windowEnd.getTime)
      .transformWithState(new TopNProcessor(n), TimeMode.EventTime(), OutputMode.Append())
  }

  /** The stateful operator: count per (windowEnd, itemId) in state, emit
    * the top n at windowEnd+1 event time, then clear. */
  def apply(paneItems: Dataset[PaneItem], n: Int = 3): Dataset[RankedItem] = {
    val spark = paneItems.sparkSession
    import spark.implicits._
    paneItems
      .groupByKey(_.windowEnd.getTime)
      .flatMapGroupsWithState[Map[Long, Long], RankedItem](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (windowEnd: Long, rows: Iterator[PaneItem], state: GroupState[Map[Long, Long]]) =>
          def emit(counts: Map[Long, Long]): Iterator[RankedItem] =
            topN(counts.toSeq.map { case (id, c) => ItemViewCount(id, windowEnd, c) }, n)
              .iterator
          if (state.hasTimedOut) {
            // watermark passed windowEnd → window complete: emit + clear
            val counts = state.getOption.getOrElse(Map.empty)
            state.remove()
            emit(counts)
          } else {
            val merged = rows.foldLeft(state.getOption.getOrElse(Map.empty)) {
              (acc, r) => acc + (r.itemId -> (acc.getOrElse(r.itemId, 0L) + 1L))
            }
            if (state.getCurrentWatermarkMs() >= windowEnd) {
              // replaying historical data: window already closed
              state.remove()
              emit(merged)
            } else {
              state.update(merged)
              // fire strictly after the window closes (windowEnd + 1 ms,
              // exactly HotItemAnalysis.java:191)
              state.setTimeoutTimestamp(windowEnd + 1)
              Iterator.empty
            }
          }
      }
  }
}
