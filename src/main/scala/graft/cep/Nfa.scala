package graft.cep

/** MATCH_RECOGNIZE pattern core (SURVEY.md §2.7 MATCH_RECOGNIZE;
  * reference engine: flink-cep nfa/NFA.java, 1123 LoC — re-scoped to
  * the subset the reference's SQL surface uses most: a linear
  * pattern of quantified steps, greedy matching, AFTER MATCH SKIP
  * PAST LAST ROW).
  *
  * The automaton runs per key over event-time-ordered rows; state is
  * a position in the step list plus captured rows, so memory is
  * O(current match length) — the same bound as the reference's
  * SharedBuffer for linear patterns.
  */
object Nfa {

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

  /** All non-overlapping greedy matches (AFTER MATCH SKIP PAST LAST
    * ROW): scan left to right; at each position try to match the full
    * pattern greedily with backtracking; on success emit the captures
    * and resume after the match's last row.
    */
  def matchAll[E](events: IndexedSeq[E], steps: List[Step[E]]): List[Map[String, List[E]]] = {
    val out = scala.collection.mutable.ListBuffer.empty[Map[String, List[E]]]
    var i = 0
    while (i < events.length) {
      tryMatch(events, i, steps) match {
        case Some((end, caps)) if end > i =>
          out += caps
          i = end
        case Some((_, caps)) => // zero-width match (all-Star pattern): advance one
          i += 1
        case None =>
          i += 1
      }
    }
    out.toList
  }

  /** Greedy backtracking match of `steps` starting at `from`.
    * Returns (exclusive end index, captures) on success.
    */
  private def tryMatch[E](events: IndexedSeq[E], from: Int,
      steps: List[Step[E]]): Option[(Int, Map[String, List[E]])] = {

    def attempt(pos: Int, remaining: List[Step[E]],
        acc: Map[String, List[E]]): Option[(Int, Map[String, List[E]])] =
      remaining match {
        case Nil => Some((pos, acc))
        case step :: rest =>
          val (lo, hi) = step.quant match {
            case One => (1, 1)
            case Plus => (1, Int.MaxValue)
            case Star => (0, Int.MaxValue)
            case Times(mn, mx) => (mn, mx)
          }
          // greedy: consume as many as possible, then backtrack down to lo
          var n = 0
          while (n < hi && pos + n < events.length && step.pred(events(pos + n))) n += 1
          var k = n
          while (k >= lo) {
            val taken = (0 until k).map(j => events(pos + j)).toList
            attempt(pos + k, rest, acc + (step.name -> taken)) match {
              case s @ Some(_) => return s
              case None => k -= 1
            }
          }
          None
      }

    attempt(from, steps, Map.empty)
  }
}
