package graft

import org.apache.spark.sql.functions._
import graft.changelog.{Changelog, ChangelogInference => CI}

/** Changelog-mode inference: adapters are inserted automatically and
  * the planned result equals the hand-built round-1 pipelines.
  */
class ChangelogInferenceSpec extends SparkSpec {

  private def events = Tables.load(spark, sfDir, "events")
    .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))

  private def upsertSrc = CI.CSource(events, CI.Upsert,
    keys = Seq("user_id"), orderCols = Seq(col("ts"), col("event_id")))

  test("upsert source -> agg -> insert-only sink plans the retract pipeline") {
    val planned = CI.plan(CI.CSink(
      CI.CAgg(upsertSrc, Seq("event_type"), Seq("value")), CI.InsertOnly))
    assert(planned.mode === CI.InsertOnly || planned.mode === CI.Retract)
    val manual = Changelog.aggregateRetract(
      Changelog.fromUpserts(events, Seq("user_id"), Seq(col("ts"), col("event_id"))),
      Seq("event_type"), Seq("value"))
    val a = planned.df.collect().map(_.toSeq).toSet
    val b = manual.collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("insert-only source -> agg plans a plain aggregate (no sign algebra)") {
    val planned = CI.plan(CI.CAgg(
      CI.CSource(events, CI.InsertOnly), Seq("event_type"), Seq("value")))
    assert(planned.mode === CI.Retract) // aggregates produce updating results
    val expect = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(planned.df.collect().map(_.toSeq).toSet === expect)
  }

  test("retract stream into an upsert sink drops UPDATE_BEFORE rows") {
    val log = Changelog.fromUpserts(events,
      Seq("user_id"), Seq(col("ts"), col("event_id")))
    val planned = CI.plan(CI.CSink(CI.CSource(log, CI.Retract), CI.Upsert))
    assert(planned.mode === CI.Upsert)
    val kinds = planned.df.select(Changelog.RowKindCol).distinct()
      .collect().map(_.getByte(0)).toSet
    assert(!kinds.contains(Changelog.UpdateBefore))
  }

  test("calc over a retract stream must keep the rowkind column") {
    val log = Changelog.fromUpserts(events,
      Seq("user_id"), Seq(col("ts"), col("event_id")))
    val bad = CI.CCalc(CI.CSource(log, CI.Retract),
      df => df.select("user_id", "value")) // drops __rowkind
    assertThrows[IllegalArgumentException](CI.plan(bad))
  }

  test("normalizeToSink equals the hand-built changelog normalize") {
    val viaPlanner = CI.normalizeToSink(upsertSrc).collect().map(_.toSeq).toSet
    val manual = Changelog.normalize(
      Changelog.fromUpserts(events, Seq("user_id"), Seq(col("ts"), col("event_id"))),
      Seq("user_id"), Seq(col("ts"), col("event_id")))
      .collect().map(_.toSeq).toSet
    assert(viaPlanner === manual)
  }

  test("impossible adaptation is rejected like the reference planner") {
    val log = Changelog.fromUpserts(events,
      Seq("user_id"), Seq(col("ts"), col("event_id")))
    assertThrows[RuntimeException](
      CI.plan(CI.CSink(CI.CSource(log, CI.Retract), CI.InsertOnly)))
  }
}
