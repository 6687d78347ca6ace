package graft.changelog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Changelog-mode inference — the operator-DSL slice of the
  * reference's FlinkChangelogModeInferenceProgram.scala (896 LoC):
  * every node declares what changelog mode it PRODUCES and what it
  * ACCEPTS, and planning walks the tree inserting the adapters the
  * reference's planner would (ChangelogNormalize in front of
  * insert-only consumers of updating streams, upsert→retract
  * derivation in front of retract-input aggregates, DropUpdateBefore
  * when the consumer doesn't need UPDATE_BEFORE rows) or rejecting
  * impossible combinations — instead of the user hand-picking
  * fromUpserts / aggregateRetract / normalize.
  *
  * Modes mirror RowKind sets (flink-core types/RowKind.java):
  *   InsertOnly = {+I}; Upsert = {+I, +U, -D} keyed last-wins;
  *   Retract = {+I, -U, +U, -D}.
  */
object ChangelogInference {

  sealed trait Mode
  case object InsertOnly extends Mode
  /** keyed last-wins rows without explicit update-before */
  case object Upsert extends Mode
  /** full retract stream (the __rowkind column convention) */
  case object Retract extends Mode

  sealed trait CNode
  /** a source with a declared mode; Upsert sources also declare their
    * key and version order (the reference's PRIMARY KEY + rowtime)
    */
  final case class CSource(df: DataFrame, mode: Mode,
      keys: Seq[String] = Nil, orderCols: Seq[Column] = Nil) extends CNode
  /** mode-preserving row-level transform (Calc) */
  final case class CCalc(child: CNode, f: DataFrame => DataFrame) extends CNode
  /** group aggregate: count + sums, retract-aware when the input
    * updates; `avgCols` additionally emit `nncnt_<c>` (live non-null
    * count — AVG's divisor under SQL semantics)
    */
  final case class CAgg(child: CNode, groupCols: Seq[String],
      sumCols: Seq[String], avgCols: Seq[String] = Nil) extends CNode
  /** group aggregate with max/min over ONE value column — plans the
    * MaxWithRetract/MinWithRetract value-multiset state when the
    * input updates (emits cnt, sum_c, max_c, min_c, and nncnt_c when
    * `withNonNullCount` — AVG's divisor)
    */
  final case class CAggMinMax(child: CNode, groupCols: Seq[String],
      valueCol: String, withNonNullCount: Boolean = false) extends CNode
  /** sink accepting only `accepts`; planning materializes/adapts */
  final case class CSink(child: CNode, accepts: Mode) extends CNode

  /** `keys`/`orderCols` thread the upsert key + version order through
    * the plan (the reference's unique-key derivation), so adapters can
    * be inserted above non-source nodes too.
    */
  final case class Planned(df: DataFrame, mode: Mode,
      keys: Seq[String] = Nil, orderCols: Seq[Column] = Nil)

  /** RowKind-set rendering of a mode — the changelogMode=[...] labels
    * the reference's EXPLAIN CHANGELOG_MODE prints per node.
    */
  def kinds(m: Mode): String = m match {
    case InsertOnly => "[I]"
    case Upsert => "[I,UA,D]"
    case Retract => "[I,UB,UA,D]"
  }

  /** Trace channel for EXPLAIN CHANGELOG_MODE: while a buffer is
    * installed, [[plan]] records each node's inferred mode and every
    * adapter it inserts. Thread-local so concurrent sessions don't
    * interleave.
    */
  private val traceTL = new ThreadLocal[scala.collection.mutable.Buffer[String]]
  private def trace(line: => String): Unit =
    Option(traceTL.get).foreach(_ += line)
  /** for the SQL front door to record decisions it makes outside
    * [[plan]] (e.g. CDC-view normalization)
    */
  private[graft] def traceLine(line: String): Unit = trace(line)
  def withTrace[T](f: => T): (T, Seq[String]) = {
    val buf = scala.collection.mutable.Buffer.empty[String]
    traceTL.set(buf)
    try { val r = f; (r, buf.toSeq) } finally traceTL.remove()
  }

  /** Infer modes bottom-up and insert adapters. Throws on
    * combinations the reference also rejects (e.g. a retract stream
    * into an insert-only sink with no key to collapse on).
    */
  def plan(node: CNode): Planned = node match {
    case CSource(df, m, keys, orderCols) =>
      trace(s"Source: changelogMode=${kinds(m)}" +
        (if (keys.nonEmpty) s", key=[${keys.mkString(", ")}]" else ""))
      Planned(df, m, keys, orderCols)

    case CCalc(child, f) =>
      val p = plan(child)
      p.mode match {
        // a calc over an upsert stream first derives the retract
        // stream (the ChangelogNormalize/retract-derivation the
        // reference plans at the source boundary): filtering RAW
        // version history would resurrect superseded versions — the
        // -U/+U pair must pass the predicate row-by-row instead
        case Upsert =>
          require(p.keys.nonEmpty, "Calc over an upsert stream needs keys to derive retractions")
          trace(s"Calc: upsert input -> retract-derivation inserted over " +
            s"key=[${p.keys.mkString(", ")}], changelogMode=${kinds(Retract)}")
          val out = f(Changelog.fromUpserts(p.df, p.keys, p.orderCols))
          require(out.columns.contains(Changelog.RowKindCol),
            s"Calc over a retract stream must keep ${Changelog.RowKindCol}")
          Planned(out, Retract)
        case mode =>
          // an updating stream's rowkind/key columns must survive a
          // Calc — the reference forbids projecting them away too
          trace(s"Calc: changelogMode=${kinds(mode)} (mode-preserving)")
          val out = f(p.df)
          if (mode == Retract)
            require(out.columns.contains(Changelog.RowKindCol),
              s"Calc over a retract stream must keep ${Changelog.RowKindCol}")
          Planned(out, mode, p.keys.filter(out.columns.contains), p.orderCols)
      }

    case CAgg(child, groupCols, sumCols, avgCols) =>
      val p = plan(child)
      p.mode match {
        case InsertOnly =>
          trace(s"GroupAggregate: insert-only input, accumulate-only state, " +
            s"changelogMode=${kinds(Retract)} (updating result)")
          val sums = sumCols.map(c => sum(col(c)).as(s"sum_$c")) ++
            avgCols.map(c => count(col(c)).as(s"nncnt_$c"))
          Planned(p.df.groupBy(groupCols.map(col): _*)
            .agg(count(lit(1)).as("cnt"), sums: _*), Retract)
        case Retract =>
          trace(s"GroupAggregate(retract-aware): consumes ${kinds(Retract)}, " +
            s"changelogMode=${kinds(Retract)}")
          Planned(Changelog.aggregateRetract(p.df, groupCols, sumCols, avgCols), Retract)
        // upsert feeding an aggregate: derive the retract stream
        // first (ChangelogNormalize + retraction in front of
        // GroupAggFunction), using the threaded key/version order
        case Upsert if p.keys.nonEmpty =>
          trace(s"GroupAggregate: upsert input -> retract-derivation inserted " +
            s"over key=[${p.keys.mkString(", ")}]; retract-aware aggregate, " +
            s"changelogMode=${kinds(Retract)}")
          val log = Changelog.fromUpserts(p.df, p.keys, p.orderCols)
          Planned(Changelog.aggregateRetract(log, groupCols, sumCols, avgCols), Retract)
        case Upsert =>
          sys.error("Upsert stream must come from a keyed CSource to aggregate")
      }

    case CAggMinMax(child, groupCols, valueCol, withNnCnt) =>
      val p = plan(child)
      p.mode match {
        case InsertOnly =>
          trace(s"GroupAggregate(min/max): insert-only input, " +
            s"changelogMode=${kinds(Retract)} (updating result)")
          val aggs = Seq(sum(col(valueCol)).as(s"sum_$valueCol"),
            max(col(valueCol)).as(s"max_$valueCol"),
            min(col(valueCol)).as(s"min_$valueCol")) ++
            (if (withNnCnt) Seq(count(col(valueCol)).as(s"nncnt_$valueCol")) else Nil)
          Planned(p.df.groupBy(groupCols.map(col): _*)
            .agg(count(lit(1)).as("cnt"), aggs: _*), Retract)
        case Retract =>
          trace(s"GroupAggregate(MaxWithRetract/MinWithRetract value-multiset " +
            s"state): consumes ${kinds(Retract)}, changelogMode=${kinds(Retract)}")
          Planned(Changelog.aggregateRetractMinMax(p.df, groupCols, valueCol, withNnCnt), Retract)
        case Upsert if p.keys.nonEmpty =>
          trace(s"GroupAggregate(min/max): upsert input -> retract-derivation " +
            s"inserted over key=[${p.keys.mkString(", ")}]; value-multiset state, " +
            s"changelogMode=${kinds(Retract)}")
          val log = Changelog.fromUpserts(p.df, p.keys, p.orderCols)
          Planned(Changelog.aggregateRetractMinMax(log, groupCols, valueCol, withNnCnt), Retract)
        case Upsert =>
          sys.error("Upsert stream must carry keys to aggregate")
      }

    case CSink(child, accepts) =>
      val p = plan(child)
      (p.mode, accepts) match {
        case (m, a) if m == a =>
          trace(s"Sink: accepts ${kinds(a)}, no adapter")
          p
        case (InsertOnly, _) =>
          trace(s"Sink: insert-only stream satisfies ${kinds(accepts)} sink, no adapter")
          p // insert-only satisfies every sink
        case (Retract, InsertOnly) =>
          // aggregates' retract output is keyed by the group columns;
          // generic retract rows need rowkind-aware normalization
          if (p.df.columns.contains(Changelog.RowKindCol))
            sys.error("retract stream into an insert-only sink needs keys " +
              "(wrap in CAgg or normalize explicitly)")
          else {
            trace(s"Sink: updating aggregate result materializes to ${kinds(InsertOnly)}")
            Planned(p.df, InsertOnly) // already materialized (agg output)
          }
        case (Upsert, InsertOnly) =>
          sys.error("upsert stream into an insert-only sink needs keys to normalize")
        case (Retract, Upsert) =>
          // the reference's DropUpdateBefore: upsert consumers don't
          // need -U rows
          if (p.df.columns.contains(Changelog.RowKindCol)) {
            trace(s"Sink: DropUpdateBefore inserted (${kinds(Retract)} -> ${kinds(Upsert)})")
            Planned(Changelog.dropUpdateBefore(p.df), Upsert)
          } else {
            trace(s"Sink: keyed stream passes as ${kinds(Upsert)}")
            Planned(p.df, Upsert)
          }
        case (m, a) => sys.error(s"cannot adapt $m stream to a $a sink")
      }
  }

  /** Convenience: plan a keyed upsert source all the way to an
    * insert-only sink — normalize to current state
    * (StreamExecChangelogNormalize).
    */
  def normalizeToSink(src: CSource): DataFrame = {
    require(src.mode == Upsert && src.keys.nonEmpty, "keyed upsert source required")
    trace(s"Source: changelogMode=${kinds(Upsert)}, key=[${src.keys.mkString(", ")}]")
    trace(s"ChangelogNormalize inserted: ${kinds(Upsert)} -> ${kinds(InsertOnly)} " +
      "(current state per key)")
    val log = Changelog.fromUpserts(src.df, src.keys, src.orderCols)
    Changelog.normalize(log, src.keys, src.orderCols)
  }
}
