package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization — the stream-first twin of
  * [[graft.operators.EventAnalytics.sessionizeOnEvents]] (the
  * reference's session windows are stream-native:
  * StreamExecGroupWindowAggregate.java:114 assigns SessionWindows in
  * keyed state and fires on the event-time timer). Emits the SAME
  * rows as the batch gaps-and-islands pass — (user, ordinal session
  * number, event count, span seconds) — incrementally:
  *
  *  - per-key state buffers ONLY the open tail of the stream (every
  *    event still inside gap-or-lateness of the frontier); closed
  *    sessions leave state immediately, so state is bounded by
  *    gap + lateness of event time per key, never by history;
  *  - out-of-order arrivals within the watermark re-sort into place
  *    before any session they touch can close, so session membership
  *    and ordinals are exactly the batch answer;
  *  - a session closes only when the watermark passes its last event
  *    plus the gap STRICTLY — an event AT lastTs+gap merges (the
  *    batch rule breaks on `diff > gap`, not `>=`), and such an event
  *    is on-time exactly while `lastTs+gap >= watermark`;
  *  - an event-time timer at (first open session's last ts + gap)
  *    fires closure even when the key receives no further events —
  *    the reference's registerEventTimeTimer/onTimer contract.
  */
object SessionizeStream {

  case class SessionRow(user_id: Long, session_seq: Long,
      n_events: Long, duration_sec: Long)

  /** (emitted ordinals so far, open-tail buffer of (tsMicros, event_id)). */
  case class SessBuf(emitted: Long, buf: List[(Long, Long)])

  /** events must carry (user_id BIGINT, ts TIMESTAMP, event_id BIGINT);
    * lateness is the watermark delay (e.g. "10 minutes").
    *
    * Internals run at MICROSECOND grain (parquet timestamps carry µs;
    * folding to ms would floor durations differently than the batch
    * pass's `epoch_us` arithmetic and could flip a gap comparison at
    * the boundary). Spark's watermark API is ms-grained, so the
    * frontier converts as wm·1000 — a µs-level UNDER-estimate, which
    * only delays a closure by <1 ms, never closes a session early.
    */
  def sessionize(events: DataFrame, gapMinutes: Int, lateness: String): Dataset[SessionRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L
    events.selectExpr("user_id", "ts", "event_id")
      .withWatermark("ts", lateness)
      // the watermarked ts column must survive the projection (the
      // event-time timeout resolves against it); µs ride alongside
      .selectExpr("user_id", "ts", "unix_micros(ts) AS us", "event_id")
      .as[(Long, java.sql.Timestamp, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessBuf, SessionRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Long)],
            state: GroupState[SessBuf]) =>
          val prev = state.getOption.getOrElse(SessBuf(0L, Nil))
          val buf = (prev.buf ++ rows.map(r => (r._3, r._4)))
            .sortBy(identity)
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // gaps-and-islands over the sorted open tail
          val sessions = buf.foldLeft(List.empty[List[(Long, Long)]]) {
            case (acc @ (cur :: done), e) if e._1 - cur.head._1 <= gapUs =>
              (e :: cur) :: done // cur is reverse-ordered; head = last event
            case (acc, e) => List(e) :: acc
          }.map(_.reverse).reverse
          // a session can close only when the watermark is strictly past
          // lastTs+gap (an on-time event AT lastTs+gap would merge);
          // sessions are time-ordered, so closures are a prefix and the
          // ordinal counter advances exactly as the batch numbering
          val (closed, open) = sessions.span(s => s.last._1 + gapUs < wmUs)
          var emitted = prev.emitted
          val out = closed.map { s =>
            val row = SessionRow(user, emitted, s.size.toLong,
              (s.last._1 - s.head._1) / 1000000L)
            emitted += 1
            row
          }
          val rest = open.flatten
          state.update(SessBuf(emitted, rest))
          if (rest.nonEmpty)
            state.setTimeoutTimestamp((rest.map(_._1).max + gapUs) / 1000L + 1)
          out.iterator
      }
  }
}
