package graft.model

/** Typed record schemas mirroring the reference POJOs (SURVEY.md §1.2).
  * Times are kept as epoch millis (Long) at the model layer — matching
  * the reference beans — and become TimestampType columns at the
  * operator boundary via timestamp_millis.
  */

/** LogTrack.java:15-21 — the 5-field projection of the ad-tech JSON
  * event (HotMediaTrack.java:199-205). eventTime is nullable
  * (HotMediaTrack.java:187-190). */
case class LogTrack(
    appid: String,
    `type`: Int,
    sendTime: Long,
    eventTime: Option[Long],
    receiveTime: Long)

/** UserBehavior.java:15-21 — CSV row of Job B
  * (HotItemAnalysis.java:86-92); tsMillis = timestamp*1000
  * (HotItemAnalysis.java:97). */
case class UserBehavior(
    userId: Long,
    itemId: Long,
    categoryId: Long,
    behavior: String,
    tsMillis: Long)

/** ItemViewCount.java:16-20 — windowed count (windowEnd exclusive, ms). */
case class ItemViewCount(itemId: Long, windowEnd: Long, count: Long)

/** One sliding-window pane assignment of a page-view event: the raw
  * event time `ts` (the watermark column) plus the pane's exclusive end.
  * Input row type of the stateful hot-items operator. */
case class PaneItem(ts: java.sql.Timestamp, windowEnd: java.sql.Timestamp, itemId: Long)

/** Top-N emission: one ranked row per (windowEnd, rank) —
  * the structured form of the reference's formatted string report
  * (HotItemAnalysis.java:204-219). */
case class RankedItem(windowEnd: Long, rank: Int, itemId: Long, count: Long)
