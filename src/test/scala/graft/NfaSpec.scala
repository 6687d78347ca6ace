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
}
