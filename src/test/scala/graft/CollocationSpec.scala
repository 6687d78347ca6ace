package graft

import graft.text.CollocationQueries

/** PMI collocations and the Zipf rank-frequency fit on fixtures with
  * closed-form answers: the Zipf corpus is an EXACT power law
  * (freq = 12/rank), so slope/intercept/r² are -1 / ln 12 / 1 with
  * no tolerance games; the PMI fixture's single surviving bigram has
  * pmi = ln(27/7) by hand.
  */
class CollocationSpec extends SparkSpec {
  import spark.implicits._

  test("pmi: minCount floor, integer-ordered cut, hand-computed score") {
    // uni: a 3, b 3, c 1, x 1, y 1 (T=9); bigrams: ab 3, ba/bc/bx/xy 1 (B=7)
    val docs = Seq((1L, "a b a b c"), (2L, "a b x y")).toDF("doc_id", "text")
    val out = CollocationQueries.pmiCore(docs, k = 3, minCount = 2).collect()
    assert(out.length == 1) // only (a,b) clears the floor
    val r = out.head
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getLong(2) == 3L && r.getLong(3) == 3L && r.getLong(4) == 3L)
    // pmi = ln((3/7) / ((3/9)*(3/9))) = ln(27/7)
    assert(math.abs(r.getDouble(5) - math.log(27.0 / 7.0)) < 1e-9)
  }

  test("pmi: adjacency skips empty tokens the same way split-filter does") {
    val docs = Seq((1L, "a  b a  b")).toDF("doc_id", "text") // double spaces
    val out = CollocationQueries.pmiCore(docs, k = 5, minCount = 2).collect()
    // filtered tokens: a b a b -> (a,b) twice; empties never break adjacency
    assert(out.length == 1)
    assert(out.head.getLong(2) == 2L)
  }

  test("zipf: an exact freq=12/rank corpus fits slope -1, intercept ln 12, r2 1") {
    val text = (Seq.fill(12)("t1") ++ Seq.fill(6)("t2") ++
      Seq.fill(4)("t3") ++ Seq.fill(3)("t4")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val r = CollocationQueries.zipfCore(docs, topV = 100).collect().head
    assert(r.getLong(0) == 4L) // vocab smaller than topV: all terms ranked
    assert(math.abs(r.getDouble(1) - (-1.0)) < 1e-9)
    assert(math.abs(r.getDouble(2) - math.log(12.0)) < 1e-9)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-9)
  }
}
