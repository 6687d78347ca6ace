package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming operators with no Structured Streaming native,
  * on `flatMapGroupsWithState` — the Spark analog of the reference's
  * KeyedProcessFunction + keyed state + timers
  * (flink-core KeyedProcessFunction.java:52).
  *
  * State is per key, partitioned by the stream's groupBy key — each
  * executor holds only its key range's state, which is what lets
  * these run on a 1000-executor cluster: state size scales with
  * |keys|·k, never with |events|.
  */
object StatefulOps {

  // ---- streaming TopN ------------------------------------------------

  /** Event for TopN: key, sort value, payload id. */
  case class ScoredEvent(key: Long, score: Double, id: Long)
  case class TopNState(entries: List[(Double, Long)])
  case class TopNEmit(key: Long, rank: Int, score: Double, id: Long)

  /** Incremental streaming TopN (StreamExecRank — the
    * AppendOnlyTopNFunction.java:52 strategy): keeps the best N per
    * key in state; on every update that changes the TopN, re-emits
    * the key's current ranking (update semantics, like the
    * reference's retract-then-emit).
    */
  def topNPerKey(ds: Dataset[ScoredEvent], n: Int): Dataset[TopNEmit] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, rows: Iterator[ScoredEvent], state: GroupState[TopNState]) => {
          val prev = state.getOption.map(_.entries).getOrElse(Nil)
          val merged = rows.foldLeft(prev) { (acc, e) =>
            ((e.score, e.id) :: acc)
              .sortBy { case (s, i) => (-s, i) }
              .take(n)
          }
          state.update(TopNState(merged))
          if (merged != prev)
            merged.zipWithIndex.iterator.map { case ((s, i), r) =>
              TopNEmit(key, r + 1, s, i)
            }
          else Iterator.empty
        })
  }

  // ---- streaming funnel ----------------------------------------------

  /** Funnel event: user, event-time micros, funnel stage index
    * (0-based; events outside the step sequence are filtered before
    * the operator).
    */
  case class FunnelEvent(userId: Long, tsMicros: Long, stage: Int)
  case class FunnelState(s1: Long, s2: Long, s3: Long, emitted: Int) // Long.MaxValue = unset
  case class FunnelEmit(userId: Long, depth: Int)

  /** Streaming twin of [[graft.operators.EventAnalytics.funnel]]
    * (first-touch anchored 3-step funnel): per-user state is three
    * running-min timestamps — O(1) per key however long the stream —
    * updated per event with the same strictly-after + inside-window
    * qualification the batch window expressions apply. Emits the
    * user's depth whenever it deepens (update semantics). Within a
    * micro-batch events sort by event time before folding; across
    * micro-batches arrival order must respect event time for the
    * first-touch anchor to match the batch answer exactly (the
    * [[graft.text.TextQueries.ingestStream]] convention — a
    * retroactive earlier view cannot re-anchor already-qualified
    * later stages).
    */
  def funnelStream(ds: Dataset[FunnelEvent], windowMicros: Long): Dataset[FunnelEmit] = {
    import ds.sparkSession.implicits._
    val unset = Long.MaxValue
    ds.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) => {
          var st = state.getOption.getOrElse(FunnelState(unset, unset, unset, 0))
          rows.toSeq.sortBy(e => (e.tsMicros, e.stage)).foreach { e =>
            st = e.stage match {
              case 0 if e.tsMicros < st.s1 => st.copy(s1 = e.tsMicros)
              case 1 if st.s1 != unset && e.tsMicros > st.s1 &&
                e.tsMicros <= st.s1 + windowMicros && e.tsMicros < st.s2 =>
                st.copy(s2 = e.tsMicros)
              case 2 if st.s2 != unset && e.tsMicros > st.s2 &&
                st.s1 != unset && e.tsMicros <= st.s1 + windowMicros &&
                e.tsMicros < st.s3 =>
                st.copy(s3 = e.tsMicros)
              case _ => st
            }
          }
          val depth =
            if (st.s3 != unset) 3 else if (st.s2 != unset) 2
            else if (st.s1 != unset) 1 else 0
          val out =
            if (depth > st.emitted) Iterator.single(FunnelEmit(user, depth))
            else Iterator.empty
          state.update(st.copy(emitted = math.max(depth, st.emitted)))
          out
        })
  }

  // ---- streaming as-of join -----------------------------------------

  /** Tagged union input for the as-of join: side 0 = build
    * (versioned), side 1 = probe.
    */
  case class AsOfEvent(key: Long, tsMillis: Long, side: Int, id: Long)
  case class AsOfState(versions: List[(Long, Long)], buffered: List[(Long, Long)])
  case class AsOfMatch(key: Long, probeId: Long, probeTs: Long,
      buildId: Option[Long], buildTs: Option[Long])

  /** Temporal as-of join of two keyed streams
    * (TemporalRowTimeJoinOperator.java's semantics): each probe row
    * matches the latest build row with ts <= probe ts. Probe rows are
    * buffered until the event-time watermark passes their timestamp
    * (so late build versions can still win), then emitted and
    * dropped; build versions older than the watermark keep only the
    * latest — bounded state, watermark-driven cleanup.
    */
  def asOfJoin(ds: Dataset[AsOfEvent]): Dataset[AsOfMatch] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: Long, rows: Iterator[AsOfEvent], state: GroupState[AsOfState]) => {
          val st = state.getOption.getOrElse(AsOfState(Nil, Nil))
          var versions = st.versions
          var buffered = st.buffered
          rows.foreach { e =>
            if (e.side == 0) versions = (e.tsMillis, e.id) :: versions
            else buffered = (e.tsMillis, e.id) :: buffered
          }
          val wm = state.getCurrentWatermarkMs()
          val (ready, stillBuffered) = buffered.partition(_._1 <= wm)
          val out = ready.sortBy(_._1).iterator.map { case (pts, pid) =>
            val m = versions.filter(_._1 <= pts).sortBy(v => (v._1, v._2)).lastOption
            AsOfMatch(key, pid, pts, m.map(_._2), m.map(_._1))
          }.toList
          // keep only the newest version at or below the watermark,
          // plus everything newer (a later probe may still need them)
          val (old, recent) = versions.partition(_._1 <= wm)
          val kept = recent ++ old.sortBy(v => (v._1, v._2)).lastOption.toList
          state.update(AsOfState(kept, stillBuffered))
          // without a timeout the function is only invoked for keys
          // with fresh input — arm an event-time timer so buffered
          // probes flush once the watermark passes them, exactly the
          // reference's registered-cleanup-timer pattern
          // (TemporalRowTimeJoinOperator.registerTimer)
          if (stillBuffered.nonEmpty)
            state.setTimeoutTimestamp(math.max(stillBuffered.map(_._1).min, wm + 1))
          out.iterator
        })
  }

  // ---- regular (unbounded) two-stream join with state TTL ------------

  /** Tagged input: side 0 = left, side 1 = right. */
  case class JoinEvent(key: Long, tsMillis: Long, side: Int, id: Long)
  case class JoinState(left: List[(Long, Long)], right: List[(Long, Long)])
  case class JoinEmit(key: Long, leftId: Long, rightId: Long)

  /** Regular two-stream INNER join (StreamExecJoin /
    * StreamingJoinOperator): no time condition relates the sides —
    * every left row joins every right row of its key, whenever either
    * arrives. Unbounded in principle; state is bounded by a TTL (the
    * reference's table.exec.state.ttl idle-state retention), here
    * measured against the event-time watermark: rows older than
    * wm - ttl are evicted and can no longer produce matches.
    *
    * Each arriving row emits exactly the pairs it forms with the
    * opposite side's live buffer — each pair once, like the
    * reference's associate-and-emit per input record.
    */
  def regularJoin(ds: Dataset[JoinEvent], ttlMillis: Long): Dataset[JoinEmit] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: Long, rows: Iterator[JoinEvent], state: GroupState[JoinState]) => {
          val st = state.getOption.getOrElse(JoinState(Nil, Nil))
          var left = st.left
          var right = st.right
          val wm = state.getCurrentWatermarkMs()
          val live = wm - ttlMillis
          val out = scala.collection.mutable.ListBuffer.empty[JoinEmit]
          rows.toSeq.sortBy(e => (e.tsMillis, e.side, e.id)).foreach { e =>
            if (e.side == 0) {
              right.withFilter(_._1 >= live).foreach(r => out += JoinEmit(key, e.id, r._2))
              left = (e.tsMillis, e.id) :: left
            } else {
              left.withFilter(_._1 >= live).foreach(l => out += JoinEmit(key, l._2, e.id))
              right = (e.tsMillis, e.id) :: right
            }
          }
          val kept = JoinState(left.filter(_._1 >= live), right.filter(_._1 >= live))
          if (kept.left.isEmpty && kept.right.isEmpty) state.remove()
          else {
            state.update(kept)
            // arm a TTL timer so idle keys evict without fresh input
            // (the reference's minIdleStateRetention cleanup timer)
            val oldest = (kept.left ++ kept.right).map(_._1).min
            state.setTimeoutTimestamp(math.max(oldest + ttlMillis, wm + 1))
          }
          out.iterator
        })
  }

  // ---- streaming temporal sort ---------------------------------------

  case class SortIn(tsMillis: Long, id: Long, value: Double)
  case class SortState(rows: List[(Long, Long, Double)], lastEmittedTs: Long)

  /** Streaming temporal sort (StreamExecTemporalSort /
    * RowTimeSortOperator): emit rows in event-time order (ts, then
    * id) once the watermark guarantees completeness. Like the
    * reference, the global time-sort is single-parallelism — ordering
    * across the whole stream cannot be produced by independent
    * partitions.
    */
  def temporalSortStream(ds: Dataset[SortIn]): Dataset[SortIn] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: Int, rows: Iterator[SortIn], state: GroupState[SortState]) => {
          val st = state.getOption.getOrElse(SortState(Nil, Long.MinValue))
          val buffered = st.rows ++ rows.map(r => (r.tsMillis, r.id, r.value))
          val wm = state.getCurrentWatermarkMs()
          val (ready, pending) = buffered.partition(r => r._1 <= wm && r._1 > st.lastEmittedTs)
          val out = ready.sortBy(r => (r._1, r._2)).map(r => SortIn(r._1, r._2, r._3))
          state.update(SortState(pending.filter(_._1 > wm), math.max(st.lastEmittedTs, wm)))
          if (pending.exists(_._1 > wm))
            state.setTimeoutTimestamp(math.max(pending.filter(_._1 > wm).map(_._1).min, wm + 1))
          out.iterator
        })
  }

  // ---- CEP-lite: A followed-by B within a gap ------------------------

  case class PatternEvent(key: Long, tsMillis: Long, kind: String, id: Long)
  case class PatternState(pendingA: List[(Long, Long)])
  case class PatternMatch(key: Long, aId: Long, bId: Long, aTs: Long, bTs: Long)

  /** MATCH_RECOGNIZE-lite (StreamExecMatch / CEP NFA subset): emit a
    * match whenever a `kindB` event arrives within `gapMillis` of an
    * unconsumed earlier `kindA` event of the same key — the 2-state
    * NFA with AFTER MATCH SKIP PAST LAST ROW semantics. Pending A
    * state older than the gap is pruned on every trigger.
    */
  def followedBy(ds: Dataset[PatternEvent], kindA: String, kindB: String,
      gapMillis: Long): Dataset[PatternMatch] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, rows: Iterator[PatternEvent], state: GroupState[PatternState]) => {
          var pending = state.getOption.map(_.pendingA).getOrElse(Nil)
          val out = scala.collection.mutable.ListBuffer.empty[PatternMatch]
          rows.toSeq.sortBy(e => (e.tsMillis, e.id)).foreach { e =>
            if (e.kind == kindA) pending = (e.tsMillis, e.id) :: pending
            else if (e.kind == kindB) {
              val candidates = pending
                .filter(a => a._1 <= e.tsMillis && e.tsMillis - a._1 <= gapMillis)
              candidates.sortBy(a => (a._1, a._2)).lastOption.foreach { a =>
                out += PatternMatch(key, a._2, e.id, a._1, e.tsMillis)
                pending = pending.filterNot(_ == a)
              }
            }
            // prune state older than the newest event minus gap
            pending = pending.filter(a => e.tsMillis - a._1 <= gapMillis)
          }
          state.update(PatternState(pending))
          out.iterator
        })
  }
}
