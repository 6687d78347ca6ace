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
  case class AggState(cnt: Long, sum: Long, counts: Map[Long, Long], live: Boolean)
  /** kind: 2 = +U (current aggregate), 3 = -D (group vanished) */
  case class AggEmit(key: String, cnt: Long, sum_value: Long,
      max_value: Long, min_value: Long, kind: Byte)

  def groupAggRetract(ds: Dataset[ChangeEvent]): Dataset[AggEmit] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[ChangeEvent], state: GroupState[AggState]) => {
          val st = state.getOption.getOrElse(AggState(0L, 0L, Map.empty, live = false))
          var cnt = st.cnt
          var sum = st.sum
          var counts = st.counts
          rows.foreach { e =>
            val accumulate = e.kind == Changelog.Insert || e.kind == Changelog.UpdateAfter
            if (accumulate) {
              cnt += 1; sum += e.value
              counts = counts.updated(e.value, counts.getOrElse(e.value, 0L) + 1)
            } else { // -U retract or -D delete
              cnt -= 1; sum -= e.value
              val c = counts.getOrElse(e.value, 0L) - 1
              counts = if (c <= 0) counts - e.value else counts.updated(e.value, c)
            }
          }
          if (cnt > 0) {
            state.update(AggState(cnt, sum, counts, live = true))
            Iterator.single(AggEmit(key, cnt, sum,
              counts.keysIterator.max, counts.keysIterator.min, Changelog.UpdateAfter))
          } else {
            state.remove()
            if (st.live) Iterator.single(AggEmit(key, 0L, 0L, 0L, 0L, Changelog.Delete))
            else Iterator.empty
          }
        })
  }
}
