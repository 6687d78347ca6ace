package graft.cep

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** MATCH_RECOGNIZE over Datasets: per-key, event-time-ordered NFA
  * matching (StreamExecMatch.java:59's batch shape; the streaming
  * twin buffers by watermark like StatefulOps.asOfJoin and runs the
  * same [[Nfa]] core on flush).
  *
  * Scale: one shuffle on the partition key; per-key rows are sorted
  * inside flatMapGroups (Spark's group iterator is already clustered
  * per key), NFA state is O(match length).
  */
object CepOps {

  /** Generic batch matcher: partition by key, order by `order`,
    * apply the pattern, map each match through `measure`.
    */
  def matchPattern[E, K: Encoder, O: Encoder](
      ds: Dataset[E], key: E => K, order: E => (Long, Long),
      steps: List[Nfa.Step[E]])(measure: (K, Map[String, List[E]]) => O): Dataset[O] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(key)(implicitly[Encoder[K]])
      .flatMapGroups { (k: K, it: Iterator[E]) =>
        val sorted = it.toIndexedSeq.sortBy(order)
        Nfa.matchAll(sorted, steps).iterator.map(m => measure(k, m))
      }
  }

  /** Full-AST matcher: alternation/grouping/reluctant quantifiers,
    * WITHIN, and AFTER MATCH skip strategies; `measure` sees the whole
    * [[Nfa.PatMatch]] (captures + row indices).
    */
  def matchPatternFull[E, K: Encoder, O: Encoder](
      ds: Dataset[E], key: E => K, order: E => (Long, Long),
      pat: Nfa.Pat[E], skip: Nfa.Skip = Nfa.SkipPastLastRow,
      within: Option[(E => Long, Long)] = None)(
      measure: (K, Nfa.PatMatch[E]) => O): Dataset[O] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(key)(implicitly[Encoder[K]])
      .flatMapGroups { (k: K, it: Iterator[E]) =>
        val sorted = it.toIndexedSeq.sortBy(order)
        Nfa.matchAllPat(sorted, pat, skip, within).iterator.map(m => measure(k, m))
      }
  }

  /** Streaming MATCH_RECOGNIZE (StreamExecMatch.java:59 event-time
    * path): per key, rows buffer until the watermark completes them,
    * then the SAME [[Nfa]] core runs over the ordered complete prefix.
    * A match is emitted only when at least one complete row exists
    * after its last row — the matcher's greedy/skip decisions are
    * then final, because later input cannot reorder before that point
    * (the reference gets the same guarantee from its watermark-sorted
    * input feeding the NFA). Consumed rows leave state per the skip
    * strategy; rows newer than the watermark stay buffered.
    */
  def matchPatternStream[E, K, O](
      ds: org.apache.spark.sql.Dataset[E], key: E => K, order: E => (Long, Long),
      tsMillis: E => Long, pat: Nfa.Pat[E], skip: Nfa.Skip = Nfa.SkipPastLastRow,
      within: Option[(E => Long, Long)] = None)(
      measure: (K, Nfa.PatMatch[E]) => O)(
      implicit ke: Encoder[K], se: Encoder[CepBuf[E]], oe: Encoder[O]): Dataset[O] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    ds.groupByKey(key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (k: K, rows: Iterator[E], state: org.apache.spark.sql.streaming.GroupState[CepBuf[E]]) => {
          val buffered = state.getOption.map(_.rows).getOrElse(List.empty[E]) ++ rows
          val wm = state.getCurrentWatermarkMs()
          val (complete, pending) = buffered.partition(tsMillis(_) <= wm)
          val sorted = complete.sortBy(order).toIndexedSeq
          val matches = Nfa.matchAllPat(sorted, pat, skip, within)
          // emit matches in discovery order until one is OPEN (its last
          // row is the newest complete row — future input may extend
          // it, and by skip-strategy precedence everything after it
          // must re-derive then)
          val emitted = scala.collection.mutable.ListBuffer.empty[Nfa.PatMatch[E]]
          var consumed = 0
          var firstOpenIdx = sorted.length
          var blockedByOpen = false
          matches.foreach { m =>
            if (!blockedByOpen) {
              if (m.end < sorted.length) { emitted += m; consumed = Nfa.resumeIndex(m, skip) }
              else { blockedByOpen = true; firstOpenIdx = m.start }
            }
          }
          val out = emitted.map(m => measure(k, m)).toList
          // WITHIN bounds state: a future match must span <= the window
          // from its first row, and it ends past the watermark, so rows
          // at or before wm - within can never join a future match —
          // evict them (unless inside the open match). Patterns with no
          // WITHIN keep unconsumed rows, the same unbounded-state
          // caveat the reference documents.
          val evictable = within match {
            case Some((_, w)) =>
              val horizon = wm - w
              val firstLive = sorted.indexWhere(r => tsMillis(r) > horizon) match {
                case -1 => sorted.length
                case i => i
              }
              math.min(firstLive, firstOpenIdx)
            case None => 0
          }
          val retained = sorted.drop(math.max(consumed, evictable)).toList ++ pending
          if (retained.isEmpty) state.remove()
          else {
            state.update(CepBuf(retained))
            val pendingTs = pending.map(tsMillis)
            if (pendingTs.nonEmpty)
              state.setTimeoutTimestamp(math.max(pendingTs.min, wm + 1))
          }
          out.iterator
        })
  }

  case class CepBuf[E](rows: List[E])

  case class Ev(user_id: Long, event_id: Long, tsMicros: Long, event_type: String)
  case class ViewRunMatch(user_id: Long, n_views: Long, first_view: Long, purchase_id: Long)
  case class ActionRunMatch(user_id: Long, n_actions: Long, n_clicks: Long,
      first_action: Long, purchase_id: Long)
  case class ViewPairMatch(user_id: Long, first_id: Long, second_id: Long)

  /** `PATTERN (V+ P)` over the events table: one-or-more consecutive
    * views immediately followed by a purchase, greedy, skip past last
    * row. MEASURES: count(V.*), first(V.event_id), P.event_id.
    */
  def viewRunsThenPurchase(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tsMicros"), // micros: full-precision ordering
        col("event_type"))
      .as[Ev]
    val steps = List(
      Nfa.Step[Ev]("V", _.event_type == "view", Nfa.Plus),
      Nfa.Step[Ev]("P", _.event_type == "purchase", Nfa.One))
    matchPattern(ev, (e: Ev) => e.user_id, (e: Ev) => (e.tsMicros, e.event_id), steps) {
      (k, m) =>
        val vs = m("V")
        ViewRunMatch(k, vs.length.toLong, vs.head.event_id, m("P").head.event_id)
    }.toDF()
  }

  private def evSet(s: SparkSession, dir: String): Dataset[Ev] = {
    import s.implicits._
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tsMicros"),
        col("event_type"))
      .as[Ev]
  }

  /** `PATTERN ((C | V)+ P)` — one-or-more clicks-or-views (alternation
    * inside a greedy quantifier) immediately followed by a purchase.
    * MEASURES: count of actions, count of clicks, first action's id,
    * the purchase id.
    */
  def actionRunsThenPurchase(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pat = Nfa.Cat[Ev](List(
      Nfa.Rep(Nfa.Alt(List(
        Nfa.Sym[Ev]("C", _.event_type == "click"),
        Nfa.Sym[Ev]("V", _.event_type == "view"))), 1, Int.MaxValue),
      Nfa.Sym[Ev]("P", _.event_type == "purchase")))
    matchPatternFull(evSet(s, dir), (e: Ev) => e.user_id,
        (e: Ev) => (e.tsMicros, e.event_id), pat) { (k, m) =>
      val cs = m.idx.getOrElse("C", Nil) zip m.caps.getOrElse("C", Nil)
      val vs = m.idx.getOrElse("V", Nil) zip m.caps.getOrElse("V", Nil)
      val first = (cs ++ vs).minBy(_._1)._2
      ActionRunMatch(k, (cs.length + vs.length).toLong, cs.length.toLong,
        first.event_id, m.caps("P").head.event_id)
    }.toDF()
  }

  /** `PATTERN (A A) AFTER MATCH SKIP TO NEXT ROW` with A = view:
    * every overlapping pair of consecutive views — the skip strategy
    * the default PAST LAST ROW cannot express (it would halve the
    * matches).
    */
  def overlappingViewPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pat = Nfa.Cat[Ev](List(
      Nfa.Sym[Ev]("A1", _.event_type == "view"),
      Nfa.Sym[Ev]("A2", _.event_type == "view")))
    matchPatternFull(evSet(s, dir), (e: Ev) => e.user_id,
        (e: Ev) => (e.tsMicros, e.event_id), pat, Nfa.SkipToNextRow) { (k, m) =>
      ViewPairMatch(k, m.caps("A1").head.event_id, m.caps("A2").head.event_id)
    }.toDF()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cep_quantified"  -> (viewRunsThenPurchase _),
    "q_cep_alternation" -> (actionRunsThenPurchase _),
    "q_cep_overlap"     -> (overlappingViewPairs _))

  /** Oracle: gaps-and-islands formulation of `PATTERN (V+ P)` —
    * maximal runs of consecutive views whose immediately-next event
    * is a purchase.
    */
  val oracle: Map[String, String] = Map(
    "q_cep_quantified" ->
      """WITH ordered AS (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER w AS rn,
        |    CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |isl AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY rn
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM ordered),
        |v AS (SELECT user_id, island, count(*) AS n_views,
        |        arg_min(event_id, rn) AS first_view, max(rn) AS last_rn
        |      FROM isl WHERE event_type = 'view' GROUP BY user_id, island),
        |p AS (SELECT user_id, event_id AS purchase_id, rn FROM isl
        |      WHERE event_type = 'purchase')
        |SELECT p.user_id, v.n_views, v.first_view, p.purchase_id
        |FROM p JOIN v ON v.user_id = p.user_id AND v.last_rn = p.rn - 1""".stripMargin,
    // islands of is-action (click OR view) — the alternation collapses
    // both symbols into one island indicator
    "q_cep_alternation" ->
      """WITH ordered AS (
        |  SELECT user_id, event_id, event_type,
        |    CASE WHEN event_type IN ('click','view') THEN 1 ELSE 0 END AS act,
        |    row_number() OVER w AS rn,
        |    CASE WHEN lag(CASE WHEN event_type IN ('click','view') THEN 1 ELSE 0 END) OVER w
        |         IS DISTINCT FROM CASE WHEN event_type IN ('click','view') THEN 1 ELSE 0 END
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |isl AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY rn
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM ordered),
        |a AS (SELECT user_id, island, count(*) AS n_actions,
        |        sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_clicks,
        |        arg_min(event_id, rn) AS first_action, max(rn) AS last_rn
        |      FROM isl WHERE act = 1 GROUP BY user_id, island),
        |p AS (SELECT user_id, event_id AS purchase_id, rn FROM isl
        |      WHERE event_type = 'purchase')
        |SELECT p.user_id, a.n_actions, a.n_clicks, a.first_action, p.purchase_id
        |FROM p JOIN a ON a.user_id = p.user_id AND a.last_rn = p.rn - 1""".stripMargin,
    // SKIP TO NEXT ROW over (view view): every adjacent view pair
    "q_cep_overlap" ->
      """SELECT user_id, event_id AS first_id, nxt_id AS second_id FROM (
        |  SELECT user_id, event_id, event_type,
        |    lead(event_type, 1) OVER w AS nxt_type,
        |    lead(event_id, 1) OVER w AS nxt_id
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |WHERE event_type = 'view' AND nxt_type = 'view'""".stripMargin)
}
