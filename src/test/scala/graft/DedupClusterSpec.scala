package graft

import graft.text.DedupCluster

/** Connected-components clustering over candidate pair graphs. */
class DedupClusterSpec extends SparkSpec {
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    DedupCluster.connectedComponents(pairs.toDF("ida", "idb"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("transitive pairs collapse to one component") {
    // A~B and B~C but A~C never mined — the reason CC exists
    val m = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(m(1L) == 1L && m(2L) == 1L && m(3L) == 1L)
    assert(m(10L) == 10L && m(11L) == 10L)
  }

  test("long chain converges to min id (pointer-jumping path)") {
    // a 60-node path graph: plain O(diameter) hash-min would need 60
    // rounds; the jump must close it within the 25-round cap
    val chain = (0L until 59L).map(i => (i, i + 1))
    val m = cc(chain)
    assert(m.size == 60 && m.values.forall(_ == 0L))
  }

  test("reversed and shuffled edge directions give the same labels") {
    val m = cc(Seq((7L, 3L), (3L, 9L), (9L, 2L)).map { case (a, b) => (b, a) })
    assert(Set(7L, 3L, 9L, 2L).forall(m(_) == 2L))
  }

  test("pair stage emits each a<b pair exactly once with exact shared counts") {
    // r16: pairs come from two chained explodes + an a<b filter (the
    // sliced-struct comprehension was the mining bottleneck) — pin
    // that the k>2 group yields every unordered pair once, counts are
    // exact, and the output is a<b canonical.
    val shared = (0 until 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq((5L, shared), (1L, shared), (9L, shared))
      .toDF("doc_id", "text")
    val edges = DedupCluster.sharedShingleEdges(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 38 distinct 3-gram shingles shared by every pair; 3 docs -> 3
    // pairs, each emitted once, ida < idb
    assert(edges.length == 3)
    assert(edges.map(e => (e._1, e._2)).toSet == Set((1L, 5L), (1L, 9L), (5L, 9L)))
    assert(edges.forall(_._3 == 38L))
  }

  test("below-minShared overlap and over-maxDf stop-shingles yield no edges") {
    // two docs sharing exactly TWO distinct shingles (< minShared=3)
    val a = "a1 a2 a3 c1 c2 c3 c4 a4 a5 a6"
    val b = "b1 b2 b3 c1 c2 c3 c4 b4 b5 b6"
    // sixty docs sharing ONE phrase (df=60 > maxDf=50): the capped
    // collector must drop the group wholesale, not emit a truncated one
    val crowd = (0 until 60).map(i =>
      (100L + i, s"u${i}a u${i}b common alpha beta u${i}c u${i}d"))
    val docs = (Seq((1L, a), (2L, b)) ++ crowd).toDF("doc_id", "text")
    assert(DedupCluster.sharedShingleEdges(docs).count() == 0L)
  }

  test("shared-shingle mining finds planted near-dups and skips unrelated docs") {
    val base = (0 until 40).map(i => s"tok$i").mkString(" ")
    val nearDup = base.replace("tok20", "CHANGED")
    val other = (0 until 40).map(i => s"zzz$i").mkString(" ")
    val docs = Seq((0L, base), (1L, nearDup), (2L, other)).toDF("doc_id", "text")
    val edges = DedupCluster.sharedShingleEdges(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == Set((0L, 1L)))
  }
}
