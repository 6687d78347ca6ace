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
  /** `rows` = buffered (ts, id, value); `lastEmittedTs` tracks the
    * emission frontier so rows retained purely as frame context (those
    * with ts > wm - range) are never re-emitted on a later trigger —
    * the reference emits each row exactly once from its timer
    * (RowTimeRangeBoundedPrecedingFunction.java:214).
    */
  case class OverState(rows: List[(Long, Long, Double)], lastEmittedTs: Long)
  case class OverEmit(key: Long, id: Long, tsMillis: Long, frameSum: Double, frameCount: Int)

  def rangeSumPreceding(ds: Dataset[TimedValue], rangeMillis: Long): Dataset[OverEmit] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: Long, rows: Iterator[TimedValue], state: GroupState[OverState]) => {
          val prior = state.getOption.getOrElse(OverState(Nil, Long.MinValue))
          val buffered = prior.rows ++ rows.map(r => (r.tsMillis, r.id, r.value))
          val wm = state.getCurrentWatermarkMs()
          // emit rows whose frame is complete (ts <= wm) and that were
          // not already emitted on an earlier trigger (ts > frontier)
          val ready = buffered.filter(r => r._1 <= wm && r._1 > prior.lastEmittedTs)
          val sortedAll = buffered.sortBy(r => (r._1, r._2))
          val out = ready.sortBy(r => (r._1, r._2)).map { case (ts, id, _) =>
            val frame = sortedAll.filter(r => r._1 <= ts && r._1 > ts - rangeMillis)
            OverEmit(key, id, ts, frame.map(_._3).sum, frame.size)
          }
          // retain rows still inside a future row's possible frame
          // (this includes every pending row, since pending ts > wm)
          val retained = buffered.filter(r => r._1 > wm - rangeMillis)
          // frontier advances with the watermark: everything at or
          // below wm is now emitted (or late, and dropped — the
          // reference's cleanup timer drops those too)
          val frontier = math.max(prior.lastEmittedTs, wm)
          state.update(OverState(retained.distinct, frontier))
          val pendingTs = retained.filter(_._1 > wm).map(_._1)
          if (pendingTs.nonEmpty)
            state.setTimeoutTimestamp(math.max(pendingTs.min, wm + 1))
          out.iterator
        })
  }
}
