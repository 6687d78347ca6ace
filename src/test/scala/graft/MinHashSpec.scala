package graft

import graft.text.MinHashDedup

/** MinHash estimator accuracy on known near-duplicates. */
class MinHashSpec extends SparkSpec {
  import spark.implicits._

  private def wordSalad(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
  }

  test("near-duplicate pair is found with high estimated jaccard; unrelated is not") {
    val base = wordSalad(1, 200)
    val nearDup = base.split(" ").toVector.updated(100, "CHANGED").mkString(" ")
    val other = wordSalad(2, 200)
    val docs = Seq((0L, base), (1L, nearDup), (2L, other)).toDF("doc_id", "text")
    val pairs = MinHashDedup.candidatePairs(docs, "doc_id", "text",
      k = 32, bands = 8, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.contains((0L, 1L)), s"expected near-dup pair, got $pairs")
    assert(pairs((0L, 1L)) > 0.7)
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((1L, 2L)))
  }

  test("identical docs estimate jaccard 1.0") {
    val d = wordSalad(3, 100)
    val docs = Seq((10L, d), (11L, d)).toDF("doc_id", "text")
    val pairs = MinHashDedup.candidatePairs(docs, "doc_id", "text").collect()
    assert(pairs.length === 1)
    assert(pairs.head.getDouble(2) === 1.0)
  }
}
