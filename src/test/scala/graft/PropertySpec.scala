package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.cep.Nfa
import graft.operators.RangeJoin

/** Property-based differentials: randomized inputs checked against an
  * INDEPENDENT implementation of the same semantics — the bucketed
  * range join against Spark's own nested-loop theta join, and the CEP
  * NFA against `java.util.regex` (leftmost + greedy + backtracking is
  * exactly the SQL:2016 row-pattern contract the reference's NFA
  * implements). Fixed-count scalacheck runs keep the suite
  * deterministic-by-budget while sweeping boundary cases (points ON
  * bucket edges, zero-width intervals, adjacent-but-not-overlapping
  * spans, quantifier min/max edges) that hand-written fixtures miss.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("property: bucketed pointInInterval equals the nested-loop theta join " +
      "for random points, intervals and bucket widths") {
    val gen = for {
      pts <- Gen.listOfN(40, Gen.chooseNum(-100L, 200L))
      ivs <- Gen.listOfN(20, for {
        lo <- Gen.chooseNum(-100L, 200L)
        span <- Gen.chooseNum(0L, 60L)
      } yield (lo, lo + span))
      w <- Gen.chooseNum(1L, 50L)
    } yield (pts, ivs, w)
    check(Prop.forAll(gen) { case (pts, ivs, w) =>
      val left = pts.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("id", "p")
      val right = ivs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("rid", "lo", "hi")
      val bucketed = RangeJoin.pointInInterval(left, "p", right, "lo", "hi", w)
        .select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      val naive = left.join(right, col("p") >= col("lo") && col("p") <= col("hi"))
        .select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      // multiset equality: the bucketed join must emit each pair once
      bucketed.sorted.toSeq == naive.sorted.toSeq
    }, n = 12)
  }

  test("property: intervalOverlap equals the nested-loop overlap join, " +
      "each pair exactly once") {
    val genSide = Gen.listOfN(20, for {
      lo <- Gen.chooseNum(-80L, 160L)
      span <- Gen.chooseNum(0L, 50L)
    } yield (lo, lo + span))
    val gen = for { a <- genSide; b <- genSide; w <- Gen.chooseNum(1L, 40L) } yield (a, b, w)
    check(Prop.forAll(gen) { case (a, b, w) =>
      val adf = a.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("aid", "alo", "ahi")
      val bdf = b.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("bid", "blo", "bhi")
      val bucketed = RangeJoin.intervalOverlap(adf, "alo", "ahi", bdf, "blo", "bhi", w)
        .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
      val naive = adf.join(bdf,
          greatest(col("alo"), col("blo")) <= least(col("ahi"), col("bhi")))
        .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
      bucketed.sorted.toSeq == naive.sorted.toSeq
    }, n = 12)
  }

  test("property: NFA leftmost-greedy matching + AFTER MATCH skip equals a " +
      "java.util.regex find loop") {
    // (pattern AST, equivalent regex) templates over the {a,b,c} alphabet
    type P = Nfa.Pat[Char]
    def sym(n: String, c: Char): P = Nfa.Sym(n, (_: Char) == c)
    val templates: List[(P, String)] = List(
      (Nfa.Cat(List(Nfa.Rep(sym("A", 'a'), 1, Int.MaxValue), sym("B", 'b'))), "a+b"),
      (Nfa.Cat(List(sym("A", 'a'), Nfa.Rep(sym("B", 'b'), 0, Int.MaxValue),
        sym("C", 'c'))), "ab*c"),
      (Nfa.Cat(List(Nfa.Alt(List(sym("A", 'a'), sym("B", 'b'))), sym("C", 'c'))),
        "[ab]c"),
      (Nfa.Cat(List(Nfa.Rep(sym("A", 'a'), 2, 3), sym("B", 'b'))), "a{2,3}b"),
      (Nfa.Cat(List(sym("A", 'a'), Nfa.Rep(sym("G", 'b'), 0, Int.MaxValue,
        greedy = false), sym("C", 'c'))), "ab*?c"))

    def regexSpans(s: String, re: String, overlapping: Boolean): List[(Int, Int)] = {
      val m = java.util.regex.Pattern.compile(re).matcher(s)
      val out = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
      var from = 0
      while (from <= s.length && m.find(from)) {
        out += ((m.start, m.end))
        from = if (overlapping) m.start + 1 else math.max(m.end, m.start + 1)
      }
      out.toList
    }

    val gen = for {
      s <- Gen.listOfN(30, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
      t <- Gen.oneOf(templates)
      overlapping <- Gen.oneOf(true, false)
    } yield (s, t, overlapping)
    check(Prop.forAll(gen) { case (s, (pat, re), overlapping) =>
      val skip = if (overlapping) Nfa.SkipToNextRow else Nfa.SkipPastLastRow
      val nfa = Nfa.matchAllPat(s.toIndexedSeq, pat, skip).map(m => (m.start, m.end))
      nfa == regexSpans(s, re, overlapping)
    }, n = 200)
  }
}
