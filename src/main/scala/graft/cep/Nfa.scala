package graft.cep

/** MATCH_RECOGNIZE pattern core (SURVEY.md §2.7 MATCH_RECOGNIZE;
  * reference engine: flink-cep nfa/NFA.java, 1123 LoC, and
  * AfterMatchSkipStrategy.java).
  *
  * Round 2 scope: full pattern AST — concatenation, alternation
  * `(A | B)`, grouping, greedy and reluctant quantifiers
  * (`+ * ? {m,n}` and `+? *?`), `WITHIN` time bounds, and the four
  * AFTER MATCH skip strategies (PAST LAST ROW, TO NEXT ROW,
  * TO FIRST var, TO LAST var).
  *
  * The automaton runs per key over event-time-ordered rows via a
  * backtracking matcher in continuation-passing style; preference
  * order (greedy/reluctant, alternative order) matches SQL:2016 row
  * pattern matching. State is O(current match length) — the same
  * bound as the reference's SharedBuffer for these patterns.
  */
object Nfa {

  // ---- legacy linear-step surface (round 1), kept as a wrapper ----

  sealed trait Quant
  /** exactly one */
  case object One extends Quant
  /** one or more, greedy */
  case object Plus extends Quant
  /** zero or more, greedy */
  case object Star extends Quant
  /** between min and max, greedy */
  final case class Times(min: Int, max: Int) extends Quant

  final case class Step[E](name: String, pred: E => Boolean, quant: Quant = One)

  /** Round-1 API: linear steps, greedy, AFTER MATCH SKIP PAST LAST
    * ROW. Symbols that matched zero rows are present with Nil (the
    * old contract).
    */
  def matchAll[E](events: IndexedSeq[E], steps: List[Step[E]]): List[Map[String, List[E]]] = {
    val pat = Cat(steps.map { s =>
      val (lo, hi) = s.quant match {
        case One => (1, 1)
        case Plus => (1, Int.MaxValue)
        case Star => (0, Int.MaxValue)
        case Times(mn, mx) => (mn, mx)
      }
      if (lo == 1 && hi == 1) Sym(s.name, s.pred)
      else Rep(Sym(s.name, s.pred), lo, hi, greedy = true)
    })
    val names = steps.map(_.name)
    matchAllPat(events, pat).map { m =>
      names.map(n => n -> m.caps.getOrElse(n, Nil)).toMap
    }
  }

  // ---- pattern AST ----

  sealed trait Pat[E]
  /** one row matching `pred`, captured under `name` */
  final case class Sym[E](name: String, pred: E => Boolean) extends Pat[E]
  /** concatenation */
  final case class Cat[E](parts: List[Pat[E]]) extends Pat[E]
  /** ordered alternation — earlier choices preferred (SQL:2016) */
  final case class Alt[E](choices: List[Pat[E]]) extends Pat[E]
  /** quantifier: min..max repetitions; greedy tries more first,
    * reluctant (`+?`/`*?`) tries fewer first
    */
  final case class Rep[E](inner: Pat[E], min: Int, max: Int, greedy: Boolean = true) extends Pat[E]

  /** Pattern.notFollowedBy (flink-cep pattern/Pattern.java
    * notFollowedBy: a NOT pattern BETWEEN two neighbors — "A not
    * followed by B before C"): zero or more events, NONE satisfying
    * `pred`, matched reluctantly so the next pattern claims the first
    * event it can. A single event matching `pred` in the span kills
    * the match — exactly the reference's negative-condition
    * semantics. Like the reference, this must sit between two
    * patterns, not at the end (a trailing reluctant star matches
    * zero events and constrains nothing); skipped events capture
    * under `name` (default "__not__") for diagnostics.
    */
  def notFollowed[E](pred: E => Boolean, name: String = "__not__"): Pat[E] =
    Rep(Sym(name, (e: E) => !pred(e)), 0, Int.MaxValue, greedy = false)

  /** Relaxed contiguity (flink-cep Pattern.followedBy, vs `next`'s
    * strict contiguity which is plain concatenation here): any events
    * may sit between the neighbors — a reluctant unconditional star,
    * so the next pattern still claims the earliest event it can (the
    * reference's skip-till-next-match semantics). Skipped events
    * capture under `name` for diagnostics.
    */
  def anyGap[E](name: String = "__gap__"): Pat[E] =
    Rep(Sym(name, (_: E) => true), 0, Int.MaxValue, greedy = false)

  // ---- AFTER MATCH skip strategies (AfterMatchSkipStrategy.java) ----

  sealed trait Skip
  /** resume after the last row of the match (default) */
  case object SkipPastLastRow extends Skip
  /** resume at the row after the match's first row — overlapping matches */
  case object SkipToNextRow extends Skip
  /** resume at the first row captured by `v` */
  final case class SkipToFirst(v: String) extends Skip
  /** resume at the last row captured by `v` */
  final case class SkipToLast(v: String) extends Skip

  /** One match: [start, end) row indices, per-symbol captured rows,
    * and per-symbol captured row indices (for skip-to resolution and
    * positional measures).
    */
  final case class PatMatch[E](start: Int, end: Int,
      caps: Map[String, List[E]], idx: Map[String, List[Int]])

  private type Caps[E] = Map[String, List[(Int, E)]]

  /** The pattern variable that captured absolute row index `i` of
    * this match — CLASSIFIER() (SQL:2016; the reference defines it in
    * FlinkSqlOperatorTable). Each row is consumed by exactly one
    * symbol, so the lookup is unambiguous.
    */
  def classifier[E](m: PatMatch[E], i: Int): Option[String] =
    m.idx.collectFirst { case (v, xs) if xs.contains(i) => v }

  /** Scan-resume index after a match per the AFTER MATCH skip
    * strategy — shared by [[matchAllPat]] and the streaming matcher
    * (CepOps.matchPatternStream) so batch and stream advance
    * identically.
    */
  def resumeIndex[E](m: PatMatch[E], skip: Skip): Int = skip match {
    case SkipPastLastRow => m.end
    case SkipToNextRow => m.start + 1
    case SkipToFirst(v) => m.idx.get(v).flatMap(_.headOption).getOrElse(m.end)
    case SkipToLast(v) => m.idx.get(v).flatMap(_.lastOption).getOrElse(m.end)
  }

  /** All matches of `pat` under `skip`, with optional `within`
    * (event-time span bound: every row's ts minus the first row's ts
    * must be <= withinMillis — partial matches exceeding it are
    * pruned during the scan, like the reference's WITHIN timer).
    */
  def matchAllPat[E](events: IndexedSeq[E], pat: Pat[E],
      skip: Skip = SkipPastLastRow,
      within: Option[(E => Long, Long)] = None): List[PatMatch[E]] = {
    val out = scala.collection.mutable.ListBuffer.empty[PatMatch[E]]
    var i = 0
    while (i < events.length) {
      tryMatch(events, i, pat, within) match {
        case Some((end, caps)) if end > i =>
          val byName = caps.map { case (n, xs) => n -> xs.map(_._2) }
          val idx = caps.map { case (n, xs) => n -> xs.map(_._1) }
          val pm = PatMatch(i, end, byName, idx)
          out += pm
          val next = resumeIndex(pm, skip)
          if (next <= i)
            // the reference throws for a skip target that cannot
            // advance (AfterMatchSkipStrategy#isValid); mirror it
            throw new IllegalStateException(
              s"AFTER MATCH $skip does not advance past row $i — infinite loop")
          i = next
        case _ => // no match or zero-width (all-optional pattern): advance one
          i += 1
      }
    }
    out.toList
  }

  /** Backtracking match of `pat` at `from` in SQL:2016 preference
    * order; first success wins. Returns (exclusive end, captures).
    */
  private def tryMatch[E](events: IndexedSeq[E], from: Int, pat: Pat[E],
      within: Option[(E => Long, Long)]): Option[(Int, Caps[E])] = {

    // WITHIN prunes any branch that consumes a row too far from the
    // match's first row
    def inWindow(pos: Int): Boolean = within match {
      case None => true
      case Some((ts, w)) => ts(events(pos)) - ts(events(from)) <= w
    }

    def go(p: Pat[E], pos: Int, caps: Caps[E],
        cont: (Int, Caps[E]) => Option[(Int, Caps[E])]): Option[(Int, Caps[E])] = p match {
      case Sym(name, pred) =>
        if (pos < events.length && inWindow(pos) && pred(events(pos)))
          cont(pos + 1, caps.updated(name,
            caps.getOrElse(name, Nil) :+ ((pos, events(pos)))))
        else None
      case Cat(Nil) => cont(pos, caps)
      case Cat(h :: t) =>
        go(h, pos, caps, (p2, c2) => go(Cat(t), p2, c2, cont))
      case Alt(choices) =>
        choices.view.flatMap(c => go(c, pos, caps, cont)).headOption
      case Rep(inner, min, max, greedy) =>
        def loop(count: Int, pos: Int, caps: Caps[E]): Option[(Int, Caps[E])] = {
          def more: Option[(Int, Caps[E])] =
            if (count >= max) None
            else go(inner, pos, caps, (p2, c2) =>
              if (p2 == pos) None // zero-width inner: stop recursing
              else loop(count + 1, p2, c2))
          def stop: Option[(Int, Caps[E])] =
            if (count >= min) cont(pos, caps) else None
          if (greedy) more.orElse(stop) else stop.orElse(more)
        }
        loop(0, pos, caps)
    }

    go(pat, from, Map.empty, (end, caps) => Some((end, caps)))
  }
}
