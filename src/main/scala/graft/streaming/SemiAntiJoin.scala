package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Dedicated streaming semi/anti join — the reference's
  * StreamingSemiAntiJoinOperator.java:34 (IN / EXISTS / NOT EXISTS
  * over two streams with retract handling), which round 2 only
  * approximated as a regularJoin+filter composition.
  *
  * Semantics (RowKind-aware on BOTH inputs):
  *  - a left row is "emitted" while the right side's live match count
  *    satisfies the predicate (semi: count > 0; anti: count == 0);
  *  - left arrival/retraction emits/deletes that one row;
  *  - a right-count transition 0↔1 flips EVERY stored left row:
  *    semi emits +I on 0→1 and -D on 1→0; anti the mirror image.
  *
  * The transition function [[step]] is shared verbatim between the
  * streaming operator (keyed state via flatMapGroupsWithState) and
  * the batch twin [[batchNet]] (a per-key fold whose netted output is
  * oracle-checked against NOT EXISTS SQL) — one semantics, two
  * runtimes, so the oracle check on the batch twin certifies the
  * streaming transitions too.
  *
  * Scale: state per key is the live left-id list + one right counter
  * (the reference stores the same: left records + right association
  * count). Keys partition across executors; nothing is global.
  */
object SemiAntiJoin {

  import graft.changelog.Changelog.{Insert, UpdateBefore, UpdateAfter, Delete}

  /** side 0 = left (probe), 1 = right (match set); `kind` is the
    * Changelog RowKind byte; `seq` orders events within a trigger
    * (arrival order — the reference gets this from the network stack).
    */
  case class SemiAntiEvent(key: Long, side: Int, kind: Byte, id: Long, seq: Long)
  case class SemiAntiState(leftLive: List[Long], rightCount: Long)
  case class SemiAntiEmit(key: Long, id: Long, kind: Byte)

  /** Deterministic processing order: by seq, inserts before retracts
    * of the same seq (an upsert's -U carries its predecessor's
    * coordinates — the insert must land first so counts never dip
    * negative), left before right on full ties.
    */
  private def orderKey(e: SemiAntiEvent): (Long, Int, Int, Long) =
    (e.seq, if (e.kind == UpdateBefore || e.kind == Delete) 1 else 0, e.side, e.id)

  /** One transition of the operator. Returns the new state and the
    * changelog rows this event causes downstream.
    */
  def step(anti: Boolean, st: SemiAntiState, e: SemiAntiEvent): (SemiAntiState, List[SemiAntiEmit]) = {
    val emitting = if (anti) st.rightCount == 0 else st.rightCount > 0
    if (e.side == 0) e.kind match {
      case Insert | UpdateAfter =>
        (st.copy(leftLive = e.id :: st.leftLive),
          if (emitting) List(SemiAntiEmit(e.key, e.id, Insert)) else Nil)
      case _ => // UpdateBefore | Delete: retract one stored occurrence
        (st.copy(leftLive = st.leftLive.diff(List(e.id))),
          if (emitting) List(SemiAntiEmit(e.key, e.id, Delete)) else Nil)
    } else {
      val delta = if (e.kind == Insert || e.kind == UpdateAfter) 1L else -1L
      val next = st.rightCount + delta
      val out =
        if (st.rightCount == 0L && next == 1L)
          st.leftLive.map(id => SemiAntiEmit(e.key, id, if (anti) Delete else Insert))
        else if (st.rightCount == 1L && next == 0L)
          st.leftLive.map(id => SemiAntiEmit(e.key, id, if (anti) Insert else Delete))
        else Nil
      (st.copy(rightCount = next), out)
    }
  }

  /** Streaming semi (anti = false) / anti (anti = true) join over a
    * tagged two-stream union, keyed state per join key.
    */
  def semiAntiJoin(ds: Dataset[SemiAntiEvent], anti: Boolean): Dataset[SemiAntiEmit] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, rows: Iterator[SemiAntiEvent], state: GroupState[SemiAntiState]) => {
          var st = state.getOption.getOrElse(SemiAntiState(Nil, 0L))
          val out = scala.collection.mutable.ListBuffer.empty[SemiAntiEmit]
          rows.toSeq.sortBy(orderKey).foreach { e =>
            val (ns, emits) = step(anti, st, e)
            st = ns
            out ++= emits
          }
          if (st.leftLive.isEmpty && st.rightCount == 0L) state.remove()
          else state.update(st)
          out.iterator
        })
  }

  /** Batch twin: fold a bounded changelog through the same [[step]]
    * per key, then NET the emitted changelog (signed count per left
    * row > 0) — the final EXISTS / NOT EXISTS relation. Any
    * double-emit or missed retract in the transitions breaks the net,
    * so the DuckDB oracle on this output checks the machine itself.
    */
  def batchNet(anti: Boolean, events: Dataset[SemiAntiEvent]): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    events.groupByKey(_.key)
      .flatMapGroups { (_: Long, it: Iterator[SemiAntiEvent]) =>
        var st = SemiAntiState(Nil, 0L)
        val out = scala.collection.mutable.ListBuffer.empty[SemiAntiEmit]
        it.toSeq.sortBy(orderKey).foreach { e =>
          val (ns, emits) = step(anti, st, e)
          st = ns
          out ++= emits
        }
        out.iterator
      }
      .toDF()
      .groupBy(col("key"), col("id"))
      .agg(sum(when(col("kind") === Insert, 1L).otherwise(-1L)).as("net"))
      .filter(col("net") > 0)
      .select(col("key"), col("id"))
  }
}
