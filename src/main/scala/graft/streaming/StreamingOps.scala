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
      gap: String, keys: String*): DataFrame =
    sessionAggDynamicGap(events, tsCol, lateness, lit(gap), keys: _*)

  /** SESSION window with a per-row dynamic gap (the reference's
    * SessionWindows.withDynamicGap / SessionWindowTimeGapExtractor):
    * `gapExpr` is any expression over the row yielding a duration
    * string or interval — heavy sessions can merge wider than light
    * ones. Spark's session_window accepts the gap as a Column
    * natively, so this stays a one-shuffle streaming aggregate.
    */
  def sessionAggDynamicGap(events: DataFrame, tsCol: String, lateness: String,
      gapExpr: org.apache.spark.sql.Column, keys: String*): DataFrame = {
    val g = events.withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gapExpr).as("w") +: keys.map(col): _*)
    g.agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("wstart") +: col("w.end").as("wend") +:
        keys.map(col) :+ col("n") :+ col("sum_value"): _*)
  }

  private def durationSeconds(d: String): Long = {
    val Array(n, unit) = d.trim.split("\\s+", 2)
    val v = n.toLong
    unit.toLowerCase match {
      case u if u.startsWith("second") => v
      case u if u.startsWith("minute") => v * 60
      case u if u.startsWith("hour")   => v * 3600
      case u if u.startsWith("day")    => v * 86400
      case u => sys.error(s"unsupported duration unit: $u")
    }
  }

  /** CUMULATE window aggregate, streaming (StreamExecWindowAggregate
    * with CumulativeWindowSpec / SliceAssigners): each event explodes
    * into the cumulative slices containing it (same slice algebra as
    * the batch TVF), then a tumble over a synthetic per-slice
    * event-time (slice end - 1ms) fires each slice individually as
    * the watermark passes its end — the reference's per-slice
    * incremental emission. The synthetic column leads raw event time
    * by up to `maxSize`, so its watermark delay is
    * `lateness + maxSize`: the effective frontier tracks the RAW
    * watermark and slices never close while in-lateness contributors
    * can still arrive (they may close up to one maxSize later —
    * bounded extra latency, never wrong results).
    */
  def cumulateAgg(events: DataFrame, tsCol: String, lateness: String,
      step: String, maxSize: String, keys: String*): DataFrame = {
    val stepS = durationSeconds(step)
    val maxS = durationSeconds(maxSize)
    require(maxS % stepS == 0, "maxSize must be a multiple of step")
    val slices = maxS / stepS
    val latS = durationSeconds(lateness)
    val g = events
      .withColumn("__ws",
        expr(s"timestamp_seconds(floor(unix_timestamp($tsCol) / $maxS) * $maxS)"))
      .withColumn("__j", explode(expr(
        s"""sequence(
           |  cast(floor((unix_timestamp($tsCol) - floor(unix_timestamp($tsCol) / $maxS) * $maxS) / $stepS) as int) + 1,
           |  ${slices}L)""".stripMargin)))
      .withColumn("__sts", expr(
        s"__ws + make_interval(0, 0, 0, 0, 0, 0, __j * $stepS) - interval 1 millisecond"))
      .withWatermark("__sts", s"${latS + maxS} seconds")
      .groupBy(window(col("__sts"), step).as("w") +: col("__ws") +: keys.map(col): _*)
    g.agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("__ws").as("wstart") +: col("w.end").as("wend") +:
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
      lowerBound: String, upperBound: String): DataFrame =
    intervalJoin(left, right, key, leftTs, rightTs, lateness,
      lowerBound, upperBound, "inner")

  /** Outer-typed variant — the reference's IntervalJoinOperator emits
    * the null-padded row for an unmatched outer-side element once the
    * watermark proves no in-range partner can still arrive
    * (flink-table-runtime .../join/interval/TimeIntervalJoin.java);
    * Spark's stream-stream outer join implements exactly that
    * contract natively when the join condition carries the event-time
    * bound, so this is the same one-liner with `joinType` — state on
    * both sides stays watermark-bounded.
    */
  /** Streaming window join (StreamExecWindowJoin): both sides assign
    * the same tumbling window from their own event time, then join on
    * (window, key) — rows pair only inside a shared window. Spark
    * supports the window-equality stream-stream join natively (the
    * watermark flows through `window()` so per-window join state
    * evicts once the watermark passes the window end — the same
    * state-cleanup contract the reference's window join gets from
    * window finality). joinType covers the outer variants.
    */
  def windowJoinStream(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, size: String, lateness: String,
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, lateness)
      .withColumn("w", window(col(leftTs), size))
    val r = right.withWatermark(rightTs, lateness)
      .withColumn("rw", window(col(rightTs), size))
      .withColumnRenamed(key, s"__r_$key")
    l.join(r, l("w") === r("rw") && l(key) === r(s"__r_$key"), joinType)
      .drop("rw", s"__r_$key")
  }

  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, lateness: String,
      lowerBound: String, upperBound: String, joinType: String): DataFrame = {
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) - expr(s"INTERVAL $lowerBound") &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $upperBound"),
      joinType)
  }
}
