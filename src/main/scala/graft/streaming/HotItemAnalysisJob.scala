package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.RankedItem

/** Job-B replica: HotItemAnalysis (reference HotItemAnalysis.java:61-113).
  *
  * Pipeline: CSV lines → UserBehavior (HotItemAnalysis.java:83-93) →
  * event time = timestamp*1000 (:94-99) → filter behavior='pv' (:103) →
  * 1 h sliding window, 5 min slide, count per item (:104-106) →
  * per-windowEnd Top-3 (:107-108, TopNHotItems at :173-223).
  *
  * The Top-N has two declared forms (SURVEY §2.1 #14):
  *  - declarative rank-filter (batch / foreachBatch) — [[topNBatch]];
  *  - incremental stateful operator with per-key event-time timeout —
  *    [[StatefulTopN]], the faithful ListState+timer translation.
  */
object HotItemAnalysisJob {

  /** CSV line "userId,itemId,categoryId,behavior,timestamp(epoch-s)" with
    * per-field trim (HotItemAnalysis.java:84-91); ts normalized s→ms.
    * Malformed lines (wrong arity, non-numeric fields) are DROPPED —
    * declared divergence from the reference, which throws
    * NumberFormatException and kills the job (HotItemAnalysis.java:87-90);
    * under Spark 4's default ANSI mode a bare element_at/cast would do
    * the same to the streaming query, hence try_element_at + try_cast. */
  def parseCsv(lines: DataFrame): DataFrame = {
    val f = split(col("value"), ",")
    def fld(i: Int) = trim(expr(s"try_element_at(f, $i)"))
    lines.select(f.as("f"))
      .select(
        expr("try_cast(trim(try_element_at(f, 1)) AS LONG)").as("userId"),
        expr("try_cast(trim(try_element_at(f, 2)) AS LONG)").as("itemId"),
        expr("try_cast(trim(try_element_at(f, 3)) AS LONG)").as("categoryId"),
        fld(4).as("behavior"),
        (expr("try_cast(trim(try_element_at(f, 5)) AS LONG)") * 1000).as("tsMillis"))
      .filter(col("userId").isNotNull && col("itemId").isNotNull
        && col("behavior").isNotNull && col("tsMillis").isNotNull)
  }

  /** Typed view of [[parseCsv]]: Dataset[UserBehavior], the reference
    * bean's shape (UserBehavior.java:15-21). */
  def parseTyped(lines: DataFrame): Dataset[graft.model.UserBehavior] = {
    val spark = lines.sparkSession
    import spark.implicits._
    parseCsv(lines).as[graft.model.UserBehavior]
  }

  /** filter(pv) → sliding-window count per item. Returns columns
    * (itemId, windowEnd: timestamp, count) with windowEnd exclusive —
    * the ItemViewCount shape (HotItemAnalysis.java:165-169). */
  def windowCounts(behaviors: DataFrame): DataFrame =
    behaviors
      .filter(col("behavior") === "pv")
      .withColumn("ts", timestamp_millis(col("tsMillis")))
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 hour", "5 minutes"), col("itemId"))
      .agg(count(lit(1)).as("count"))
      .select(col("itemId"), col("window.end").as("windowEnd"), col("count"))

  /** Declarative Top-N per window end: rank-filter with the declared
    * deterministic tie-break (count desc, itemId asc — SURVEY §7.3-3;
    * the reference's arrival-order ties are nondeterministic under
    * parallelism, a deliberate semantic fix). */
  def topNBatch(counts: DataFrame, n: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("windowEnd"))
      .orderBy(col("count").desc, col("itemId").asc)
    counts.withColumn("rank", row_number().over(w)).filter(col("rank") <= n)
  }

  /** Full streaming pipeline with the stateful Top-N operator. */
  def pipeline(lines: DataFrame, n: Int = 3): Dataset[graft.model.RankedItem] =
    StatefulTopN(StatefulTopN.panes(parseCsv(lines).filter(col("behavior") === "pv")), n)
}
