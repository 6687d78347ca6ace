package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming OVER aggregate — event-time RANGE-bounded-preceding
  * frames over keyed state (SURVEY.md §7 hard-part 4; the reference's
  * RowTimeRangeBoundedPrecedingFunction.java, 296 LoC).
  *
  * Semantics: for each input row, emit
  * `sum(value) OVER (PARTITION BY key ORDER BY ts
  *    RANGE BETWEEN <range> PRECEDING AND CURRENT ROW)`.
  * Rows buffer in keyed state until the watermark passes their
  * timestamp (so the frame is complete), then emit in event-time
  * order; state older than (watermark - range) is evicted each
  * trigger — the same registered-timer cleanup the reference uses.
  */
object OverStream {

  case class TimedValue(key: Long, tsMillis: Long, id: Long, value: Double)
  case class OverState(rows: List[(Long, Long, Double)]) // (ts, id, value)
  case class OverEmit(key: Long, id: Long, tsMillis: Long, frameSum: Double, frameCount: Int)

  def rangeSumPreceding(ds: Dataset[TimedValue], rangeMillis: Long): Dataset[OverEmit] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: Long, rows: Iterator[TimedValue], state: GroupState[OverState]) => {
          val buffered = state.getOption.map(_.rows).getOrElse(Nil) ++
            rows.map(r => (r.tsMillis, r.id, r.value))
          val wm = state.getCurrentWatermarkMs()
          val (ready, pending) = buffered.partition(_._1 <= wm)
          val sortedAll = buffered.sortBy(r => (r._1, r._2))
          val out = ready.sortBy(r => (r._1, r._2)).map { case (ts, id, _) =>
            val frame = sortedAll.filter(r => r._1 <= ts && r._1 > ts - rangeMillis)
            OverEmit(key, id, ts, frame.map(_._3).sum, frame.size)
          }
          // retain: pending rows + emitted rows still inside a future
          // row's possible frame (ts > wm - range)
          val retained = buffered.filter(r => r._1 > wm - rangeMillis) ++
            pending.filter(r => r._1 <= wm - rangeMillis)
          state.update(OverState(retained.distinct))
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(math.max(pending.map(_._1).min, wm + 1))
          out.iterator
        })
  }
}
