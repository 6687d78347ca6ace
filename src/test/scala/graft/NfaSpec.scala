package graft

import graft.cep.Nfa
import graft.cep.Nfa.{Step, One, Plus, Star, Times}

/** NFA quantifier semantics (greedy, skip past last row) — the
  * expression-level analog of the reference's CEP NFA tests.
  */
class NfaSpec extends SparkSpec {

  private def steps(s: (String, Char, Nfa.Quant)*): List[Step[Char]] =
    s.map { case (n, c, q) => Step[Char](n, _ == c, q) }.toList

  test("A+ B greedy: consumes the whole run, non-overlapping") {
    val m = Nfa.matchAll("aaabaab".toIndexedSeq,
      steps(("A", 'a', Plus), ("B", 'b', One)))
    assert(m.map(x => (x("A").length, x("B").length)) === List((3, 1), (2, 1)))
  }

  test("A* allows empty prefix") {
    val m = Nfa.matchAll("ba".toIndexedSeq,
      steps(("A", 'a', Star), ("B", 'b', One)))
    assert(m.length === 1)
    assert(m.head("A").isEmpty && m.head("B") === List('b'))
  }

  test("backtracking: greedy A+ gives back rows so B can match") {
    // pattern A+ B where B also matches 'a': greedy A+ would eat all
    // a's, backtracking must release one for B
    val m = Nfa.matchAll("aaa".toIndexedSeq,
      steps(("A", 'a', Plus), ("B", 'a', One)))
    assert(m.map(x => (x("A").length, x("B").length)) === List((2, 1)))
  }

  test("Times(2,3) bounds the run") {
    val m = Nfa.matchAll("aaaab".toIndexedSeq,
      steps(("A", 'a', Times(2, 3)), ("B", 'b', One)))
    // greedy 3 a's from position 1 (first try at 0 takes a[0..2] then
    // needs b at 3 -> backtrack to 2 -> b? events(2)='a' no; min 2 ->
    // fail at 0; at 1: a[1..3] then b -> match
    assert(m.length === 1)
    assert(m.head("A").length === 3)
  }

  test("no match when required step absent") {
    assert(Nfa.matchAll("aaa".toIndexedSeq,
      steps(("A", 'a', Plus), ("B", 'b', One))).isEmpty)
  }

  // ---- round-2 AST surface: alternation, skip strategies, reluctant, WITHIN ----

  private def sym(n: String, c: Char) = Nfa.Sym[Char](n, _ == c)

  test("alternation: (A | B)+ C prefers earlier choice, captures per symbol") {
    val pat = Nfa.Cat(List(
      Nfa.Rep(Nfa.Alt(List(sym("A", 'a'), sym("B", 'b'))), 1, Int.MaxValue),
      sym("C", 'c')))
    val m = Nfa.matchAllPat("abbac".toIndexedSeq, pat)
    assert(m.length === 1)
    assert(m.head.caps("A") === List('a', 'a'))
    assert(m.head.caps("B") === List('b', 'b'))
    assert(m.head.idx("A") === List(0, 3))
  }

  test("SKIP TO NEXT ROW yields overlapping matches") {
    // pattern A A over "aaaa": PAST LAST ROW gives 2 matches, TO NEXT ROW gives 3
    val pat = Nfa.Cat(List(sym("A1", 'a'), sym("A2", 'a')))
    val past = Nfa.matchAllPat("aaaa".toIndexedSeq, pat, Nfa.SkipPastLastRow)
    val next = Nfa.matchAllPat("aaaa".toIndexedSeq, pat, Nfa.SkipToNextRow)
    assert(past.map(m => (m.start, m.end)) === List((0, 2), (2, 4)))
    assert(next.map(m => (m.start, m.end)) === List((0, 2), (1, 3), (2, 4)))
  }

  test("SKIP TO LAST var resumes at the last row of that variable") {
    // A+ B over "aabaab": SKIP TO LAST A resumes at the final 'a' of
    // the previous match, which then can't complete -> same matches as
    // PAST LAST ROW here, but the resume position is observable with
    // pattern A B over "ababab" skipping to LAST A (== start) -> throws
    val pat = Nfa.Cat(List(Nfa.Rep(sym("A", 'a'), 1, Int.MaxValue), sym("B", 'b')))
    // first match [0,3) A=[a,a] B=b; resume at idx of last A = 1 -> match [1,3)
    // A=[a] B=b; resume at last A = 1 again -> no advance -> throws like the
    // reference's AfterMatchSkipStrategy validation
    assertThrows[IllegalStateException](
      Nfa.matchAllPat("aabab".toIndexedSeq, pat, Nfa.SkipToLast("A")))
  }

  test("SKIP TO FIRST var on a non-stalling pattern") {
    // A B+ over "abba": SKIP TO FIRST B resumes at first b of the match
    val pat = Nfa.Cat(List(sym("A", 'a'), Nfa.Rep(sym("B", 'b'), 1, Int.MaxValue)))
    val m = Nfa.matchAllPat("abba".toIndexedSeq, pat, Nfa.SkipToFirst("B"))
    assert(m.map(x => (x.start, x.end)) === List((0, 3)))
  }

  test("reluctant A+? stops at the minimum that lets the rest match") {
    val greedy = Nfa.Cat(List(Nfa.Rep(sym("A", 'a'), 1, Int.MaxValue, greedy = true), sym("B", 'a')))
    val reluctant = Nfa.Cat(List(Nfa.Rep(sym("A", 'a'), 1, Int.MaxValue, greedy = false), sym("B", 'a')))
    val g = Nfa.matchAllPat("aaaa".toIndexedSeq, greedy)
    val r = Nfa.matchAllPat("aaaa".toIndexedSeq, reluctant)
    assert(g.head.caps("A").length === 3) // greedy: 3 a's + B takes the 4th
    assert(r.head.caps("A").length === 1) // reluctant: 1 a + B, twice
    assert(r.length === 2)
  }

  test("WITHIN prunes matches that span too much event time") {
    // events are (char, ts); pattern A B WITHIN 10
    case class E(c: Char, ts: Long)
    val pat = Nfa.Cat(List(
      Nfa.Sym[E]("A", _.c == 'a'), Nfa.Sym[E]("B", _.c == 'b')))
    val evs = IndexedSeq(E('a', 0), E('b', 5), E('a', 100), E('b', 200))
    val bounded = Nfa.matchAllPat(evs, pat, Nfa.SkipPastLastRow, Some(((e: E) => e.ts, 10L)))
    val unbounded = Nfa.matchAllPat(evs, pat)
    assert(unbounded.length === 2)
    assert(bounded.length === 1) // (a@100, b@200) spans 100 > 10 -> pruned
    assert(bounded.head.idx("A") === List(0))
  }

  test("notFollowedBy: a NOT pattern between neighbors kills matches with an intervening hit") {
    import Nfa._
    // pattern: 'a' notFollowedBy 'b' then 'c'
    val pat = Cat(List(
      Sym[String]("A", _ == "a"),
      notFollowed[String](_ == "b"),
      Sym[String]("C", _ == "c")))
    def firsts(evs: String*): List[(Int, Int)] =
      matchAllPat(evs.toIndexedSeq, pat).map(m => (m.start, m.end))
    assert(firsts("a", "c") === List((0, 2)))
    assert(firsts("a", "x", "c") === List((0, 3)))      // non-b events may intervene
    assert(firsts("a", "b", "c") === Nil)               // an intervening b kills it
    assert(firsts("a", "x", "b", "x", "c") === Nil)     // anywhere in the span
    assert(firsts("a", "b", "a", "c") === List((2, 4))) // later clean span still matches
  }

  test("classifier resolves the variable that consumed each row (CLASSIFIER())") {
    import Nfa._
    // alternation: the last row's classifier depends on which branch ran
    val pat = Cat(List(
      Sym[String]("A", _ == "a"),
      Alt(List(Sym[String]("B", _ == "b"), Sym[String]("C", _ == "c")))))
    val ms = matchAllPat(Vector("a", "b", "a", "c"), pat)
    assert(ms.length === 2)
    assert(classifier(ms(0), ms(0).end - 1) === Some("B"))
    assert(classifier(ms(1), ms(1).end - 1) === Some("C"))
    assert(classifier(ms(0), ms(0).start) === Some("A"))
    // an index outside the match resolves to nothing
    assert(classifier(ms(0), 99) === None)
    // quantified var: every consumed row classifies to it
    val rep = Cat(List(Sym[String]("A", _ == "a"),
      Rep(Sym[String]("B", _ == "b"), 1, Int.MaxValue)))
    val m2 = matchAllPat(Vector("a", "b", "b"), rep).head
    assert((m2.start until m2.end).map(classifier(m2, _).get) === Seq("A", "B", "B"))
  }

  test("anyGap: relaxed contiguity between neighbors (Pattern.followedBy)") {
    import Nfa._
    // strict: A directly before C; relaxed: anything between
    val strict = Cat(List(Sym[String]("A", _ == "a"), Sym[String]("C", _ == "c")))
    val relaxed = Cat(List(Sym[String]("A", _ == "a"), anyGap[String](), Sym[String]("C", _ == "c")))
    def spans(p: Pat[String], evs: String*): List[(Int, Int)] =
      matchAllPat(evs.toIndexedSeq, p).map(m => (m.start, m.end))
    assert(spans(strict, "a", "x", "c") === Nil)
    assert(spans(relaxed, "a", "x", "c") === List((0, 3)))
    // skip-till-next-match: C claims the EARLIEST c
    val m = matchAllPat(Vector("a", "x", "c", "c"), relaxed).head
    assert(m.idx("C") === List(2))
  }
}
