package graft

import graft.text.RetrievalQueries

/** BM25 scoring and inverted-index postings on a fixture corpus with
  * hand-computed answers. The fixture makes every doc exactly 6
  * tokens long, so dl == avgdl and a tf=1 contribution collapses to
  * the bare idf = ln((N+1)/(df+0.5)) — the scores below are exact
  * closed forms, not a re-run of the production formula.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // df: alpha 6, bravo 5, charl 4, delta 3, echoo/foxtr/golff/hotel 2.
  // Query pairing by df desc, term asc: q1={alpha,bravo},
  // q2={charl,delta}, q3={echoo,foxtr}, q4={golff,hotel}.
  private val docs = Seq(
    (1L, "alpha bravo charl delta echoo foxtr"),
    (2L, "alpha bravo charl delta echoo foxtr"),
    (3L, "alpha bravo charl delta golff hotel"),
    (4L, "alpha bravo charl golff hotel xx"),
    (5L, "alpha bravo alpha xx xx xx"),
    (6L, "alpha xx xx xx xx xx")).toDF("doc_id", "text")

  private def idf(df: Int): Double = math.log(7.0 / (df + 0.5))

  test("bm25: dl==avgdl makes tf=1 scores exact idf sums; tf saturation is rational") {
    val out = RetrievalQueries.bm25Core(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // q1 = {alpha(df 6), bravo(df 5)}
    val q1d1 = out((1, 1L))
    assert(q1d1._1 == 2L)
    assert(math.abs(q1d1._2 - (idf(6) + idf(5))) < 1e-9)
    // doc 5: alpha tf=2 saturates to idf * 2*2.2/(2+1.2), bravo tf=1
    val q1d5 = out((1, 5L))
    assert(q1d5._1 == 2L)
    assert(math.abs(q1d5._2 - (idf(6) * 4.4 / 3.2 + idf(5))) < 1e-9)
    // doc 6 matches alpha only
    val q1d6 = out((1, 6L))
    assert(q1d6._1 == 1L)
    assert(math.abs(q1d6._2 - idf(6)) < 1e-9)
    // q3 = {echoo, foxtr}: the df=2 tie quartet pairs in term order
    val q3d1 = out((3, 1L))
    assert(q3d1._1 == 2L)
    assert(math.abs(q3d1._2 - 2 * idf(2)) < 1e-9)
    assert(!out.contains((3, 3L))) // doc 3 has golff/hotel, not q3's terms
    assert(out.contains((4, 3L)))
    // every query matched something; no query id outside 1..4
    assert(out.keys.map(_._1).toSet == Set(1, 2, 3, 4))
  }

  test("bm25: the persisted tf table is the index — input tokenized once, 3 consumers hit the cache") {
    // without the persist, exchange reuse CANNOT save the scan:
    // constraint inference pushes the query-term length filter into
    // the probe's tf subtree and column pruning drops the count from
    // the df branch, so the three subtrees canonicalize differently
    // and the corpus text re-tokenizes three times
    val conf = spark.conf
    val old = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = RetrievalQueries.bm25Core(docs)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      // 3 InMemoryTableScans = probe + df + stats all read the index;
      // the only LocalTableScan/Generate left sits INSIDE the cached
      // relation's build plan, which executes once
      assert(plan.split("InMemoryTableScan").length - 1 >= 3, plan)
    } finally conf.set("spark.sql.adaptive.enabled", old)
  }

  test("postings: df band keeps interior terms, sorted doc lists, stop-dense terms cut") {
    val out = RetrievalQueries.postingsCore(docs, lo = 2, hi = 5).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(!out.contains("alpha")) // df 6 > hi: the stop-dense cut
    assert(out("bravo") == ((5L, "1,2,3,4,5")))
    assert(out("delta") == ((3L, "1,2,3")))
    assert(out("xx") == ((3L, "4,5,6"))) // postings don't length-filter
    assert(out("echoo") == ((2L, "1,2")))
    assert(out.size == 8)
  }
}
