package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.changelog.Changelog

/** Streaming retract-aware group aggregate — a changelog SOURCE
  * (+I/-U/+U/-D rows) feeding an update-mode aggregate, the
  * reference's defining semantic (GroupAggFunction.java:43 driven by
  * FlinkChangelogModeInferenceProgram; max/min state per
  * MaxWithRetractAggFunction.java: a value→count multiset, because a
  * deleted current-max must fall back to the next live value — a
  * signed scalar can't do that).
  *
  * Emission mirrors the reference's retract stream: every input batch
  * that touches a key re-emits its current aggregate as +U; a key
  * whose support count reaches zero emits one -D and drops its state.
  *
  * Scale: state per key is the live value multiset (bounded by
  * distinct live values, not event count); one shuffle on the group
  * key; keys partition across executors.
  */
object RetractStream {

  case class ChangeEvent(key: String, value: Long, kind: Byte)
  /** `rows` = live instances as (arrival seq, value) — the
    * instance-level state First/Last/ListAggWithRetract need (a
    * value→count map cannot say WHICH occurrence arrived first);
    * `nextSeq` is the arrival counter, `live` marks a group that has
    * emitted at least once.
    */
  case class AggState(nextSeq: Long, rows: List[(Long, Long)], live: Boolean)
  /** kind: 2 = +U (current aggregate), 3 = -D (group vanished) */
  case class AggEmit(key: String, cnt: Long, sum_value: Long,
      max_value: Long, min_value: Long, first_value: Long, last_value: Long,
      listagg: String, kind: Byte)

  def groupAggRetract(ds: Dataset[ChangeEvent]): Dataset[AggEmit] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[ChangeEvent], state: GroupState[AggState]) => {
          val st = state.getOption.getOrElse(AggState(0L, Nil, live = false))
          var seq = st.nextSeq
          var live = st.rows
          rows.foreach { e =>
            val accumulate = e.kind == Changelog.Insert || e.kind == Changelog.UpdateAfter
            if (accumulate) {
              live = (seq, e.value) :: live
              seq += 1
            } else {
              // retract ONE instance of the value — the oldest, like
              // the reference's *WithRetract functions retract from
              // their MapState bucket head
              live.filter(_._2 == e.value).sortBy(_._1).headOption match {
                case Some(victim) => live = live.filterNot(_ == victim)
                case None => // retraction for an absent value: ignore (reference logs)
              }
            }
          }
          if (live.nonEmpty) {
            state.update(AggState(seq, live, live = true))
            val values = live.map(_._2)
            Iterator.single(AggEmit(key, live.size.toLong, values.sum,
              values.max, values.min,
              live.minBy(_._1)._2, live.maxBy(_._1)._2,
              values.sorted.mkString(","), Changelog.UpdateAfter))
          } else {
            state.remove()
            if (st.live)
              Iterator.single(AggEmit(key, 0L, 0L, 0L, 0L, 0L, 0L, "", Changelog.Delete))
            else Iterator.empty
          }
        })
  }
}
