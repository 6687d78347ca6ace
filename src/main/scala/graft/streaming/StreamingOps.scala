package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming operator surface (SURVEY.md §2.5/2.6 streaming rows),
  * built on Structured Streaming. The reference's watermark +
  * event-time window machinery (StreamExecWindowAggregate,
  * WatermarkAssignerOperator) maps directly onto
  * `withWatermark` + `window()`/`session_window()`; the stateful
  * operators that have no Spark native live in [[StatefulOps]] on
  * `flatMapGroupsWithState`.
  *
  * Every transform here takes and returns DataFrames, so it runs
  * identically on `spark.read` (batch backfill) and
  * `spark.readStream` (live) inputs — the same unified
  * batch/stream surface the reference exposes.
  */
object StreamingOps {

  /** TUMBLE window aggregate with event-time watermark
    * (StreamExecWindowAggregate + WatermarkAssigner). Late rows
    * beyond `lateness` are dropped by the watermark, state is freed
    * per closed window.
    */
  def tumbleAgg(events: DataFrame, tsCol: String, lateness: String,
      size: String, keys: String*): DataFrame = {
    val g = events.withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), size).as("w") +: keys.map(col): _*)
    g.agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("wstart") +: col("w.end").as("wend") +:
        keys.map(col) :+ col("n") :+ col("sum_value"): _*)
  }

  /** HOP (sliding) window aggregate. */
  def hopAgg(events: DataFrame, tsCol: String, lateness: String,
      size: String, slide: String, keys: String*): DataFrame = {
    val g = events.withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), size, slide).as("w") +: keys.map(col): _*)
    g.agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("wstart") +: col("w.end").as("wend") +:
        keys.map(col) :+ col("n") :+ col("sum_value"): _*)
  }

  /** SESSION window aggregate (GroupWindowAggregate SESSION —
    * native `session_window` since Spark 3.2).
    */
  def sessionAgg(events: DataFrame, tsCol: String, lateness: String,
      gap: String, keys: String*): DataFrame = {
    val g = events.withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap).as("w") +: keys.map(col): _*)
    g.agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("wstart") +: col("w.end").as("wend") +:
        keys.map(col) :+ col("n") :+ col("sum_value"): _*)
  }

  /** Streaming deduplicate keep-first within watermark
    * (StreamExecDeduplicate / RowTimeDeduplicateFunction):
    * `dropDuplicatesWithinWatermark` keeps the first row per key and
    * expires key state once the watermark passes — bounded state, the
    * exact semantics of the reference's TTL'd dedup.
    */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
      lateness: String, keys: String*): DataFrame =
    events.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Stream-stream interval join (StreamExecIntervalJoin /
    * TimeIntervalJoin): equi key + bounded time range, watermarks on
    * both sides bound the buffered state.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, lateness: String,
      lowerBound: String, upperBound: String): DataFrame = {
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) - expr(s"INTERVAL $lowerBound") &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $upperBound"))
  }
}
