package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Ranked retrieval over the corpus: BM25 scoring and inverted-index
  * postings — the query-side ops a curated corpus serves after
  * curation (eval-set retrieval, RAG context lookup, targeted
  * sampling by keyword). Reference scope: the engine's SQL surface
  * expresses these as join+agg pipelines (no dedicated exec node in
  * flink-table); the curation-stack framing follows classic IR
  * (Robertson & Zaragoza 2009 for BM25).
  *
  * Both operators share the 100 TB plan shape: ONE corpus-token
  * shuffle builds the (doc, term, tf) table; everything derived from
  * it — document frequencies, the query-term table, corpus stats —
  * is vocabulary-sized or smaller and rides as a broadcast. Nothing
  * downstream of the tf aggregate ever touches corpus-sized data
  * except the postings fold, whose exchange carries (term, doc_id)
  * pairs for the BANDED df slice only.
  */
object RetrievalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** (doc_id, dl, term, tf) — term frequencies with document length
    * carried through the aggregate as a functionally-dependent
    * grouping key (dl is computed map-only inside the scan's
    * projection, so no separate doc-length shuffle or join exists).
    */
  private def tfTable(docs: DataFrame): DataFrame =
    docs
      .withColumn("tk", expr("filter(split(text, ' '), x -> x <> '')"))
      .select(col("doc_id"), size(col("tk")).as("dl"),
        explode(col("tk")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** BM25 scoring of a deterministic query set against the corpus
    * (Robertson & Zaragoza 2009; k1 = 1.2, b = 0.75, the Lucene
    * defaults — idf = ln(1 + (N - df + .5)/(df + .5)), the
    * non-negative Lucene variant). The query set derives from the
    * corpus itself so the operator is reproducible at any scale
    * factor: the top 8 terms (length ≥ 4) by document frequency,
    * ties broken by term, paired in df order into 4 two-term queries
    * — an integer-only derivation, so the oracle re-derives it
    * exactly.
    *
    * Emits EVERY (query, matching doc) with its score and matched
    * term count rather than a top-k cut: the score is a double, and
    * a float-ordered rank cut would make the oracle hash hostage to
    * ulp differences between ln implementations (the [[TextQueries.tfidfTopk]]
    * lesson). A deployment composes the cut with the WindowGroupLimit
    * row_number shape proven there; the scored set itself is bounded
    * by docs-containing-query-terms, the same slice any top-k must
    * scan.
    *
    * Plan: tf table (the one corpus shuffle) ⋈ broadcast query-term
    * table (8 rows, df attached) ⋈ broadcast 1-row corpus stats,
    * then a (query, doc)-keyed sum — partial aggregation collapses
    * per-term contributions map-side.
    *
    * The tf table PERSISTS: it has three consumers (probe, document
    * frequencies, corpus stats), and without the pin Catalyst
    * specializes each subtree (constraint inference pushes the
    * query-term length filter into one copy, column pruning drops
    * the count from another — spec-demonstrated), so the corpus
    * text would be scanned and re-tokenized three times. The cached
    * tf IS the index table a retrieval deployment materializes
    * anyway ([[postings]] is its on-disk form); queries probe the
    * index, they don't re-tokenize the corpus.
    */
  def bm25(s: SparkSession, dir: String): DataFrame =
    bm25Core(t(s, dir, "documents"))

  def bm25Core(docs: DataFrame): DataFrame = {
    val tf = tfTable(docs).persist()
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // top-8 cut FIRST (TakeOrderedAndProject — map-side top-k, no
    // global exchange), then the pairing row_number runs over the
    // 8-row result: the single-partition window the plan shows holds
    // exactly 8 rows at any corpus size
    val qw = Window.orderBy(col("df").desc, col("term").asc)
    val qterms = df
      .filter(length(col("term")) >= 4)
      .orderBy(col("df").desc, col("term").asc).limit(8)
      .withColumn("rn", row_number().over(qw))
      .select((((col("rn") - 1) / 2).cast("int") + 1).as("query_id"),
        col("term"), col("df"))
    // corpus stats fold from the SAME tf table (per-doc frame first:
    // (doc_id, dl) is one doc-keyed exchange of id pairs) — a separate
    // docs-scan branch would re-read the fat text column a third time
    // at 100 TB; this way every branch hangs off the ONE token shuffle
    // and AQE's ReuseExchange runs the scan once (spec-pinned)
    val stats = tf.groupBy(col("doc_id"), col("dl")).agg(count(lit(1)))
      .agg(count(lit(1)).cast("double").as("n_docs"),
        avg(col("dl")).as("avgdl"))
    val k1 = 1.2
    val b = 0.75
    tf.join(broadcast(qterms), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib",
        col("idf") * col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_hit"), sum(col("contrib")).as("score"))
  }

  /** Inverted-index postings for the df band [lo, hi]: term → sorted
    * doc_id list. The band cap is the scale contract — postings for
    * stop-dense terms (df above `hi`) are the classic skew hazard
    * (one reducer materializes half the corpus), so a deployment
    * either drops them (done here, matching every IR stack's
    * stopword handling) or splits them into fixed-width blocks.
    * Below the cap each collect_list is bounded by `hi`, and the
    * only exchange carries (term, doc_id) pairs for the banded slice.
    * The list is emitted as a canonical comma-joined string (sorted
    * numerically BEFORE the cast to string): the gate's comparator
    * hashes scalar cells, and the string form is also what a posting
    * file on disk looks like — the ARRAY stays internal.
    */
  def postings(s: SparkSession, dir: String,
      lo: Int = 2, hi: Int = 400): DataFrame =
    postingsCore(t(s, dir, "documents"), lo, hi)

  def postingsCore(docs: DataFrame, lo: Int, hi: Int): DataFrame = {
    val tf = tfTable(docs).select(col("term"), col("doc_id"))
    tf.groupBy(col("term"))
      .agg(
        count(lit(1)).as("df"),
        array_join(
          transform(sort_array(collect_list(col("doc_id"))), _.cast("string")),
          ",").as("postings"))
      .filter(col("df").between(lo, hi))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher SIGIR'09) of
    * two rankers over the shared query set: BM25 and plain TF-IDF
    * (tf/dl · ln(N/df)) — the hybrid-retrieval shape that fuses a
    * lexical and a second scorer without score calibration, since
    * RRF consumes RANKS only: rrf = 1/(60+r_a) + 1/(60+r_b), k = 60
    * per the paper. Both rankers score exactly the docs containing a
    * query term, so the fused candidate set is one inner join.
    *
    * Determinism contract: ranks order by the score ROUNDED to a
    * 1e-6 grid (ties then by doc_id) — float sums reach the grid
    * identically across engines (the ulp-vs-rank lesson from
    * [[TextQueries.tfidfTopk]]), and every OUTPUT number (ranks, the
    * rrf sum of two small-integer reciprocals) is then exactly
    * reproducible — no raw float ordering anywhere.
    *
    * Plan: the ONE tf shuffle feeds a single probe join whose
    * aggregate computes BOTH scores in one pass; the rank windows
    * run over the scored slice (docs-with-query-terms), partitioned
    * by query — corpus-sized data never reaches a window.
    */
  def rrfFusion(s: SparkSession, dir: String, topK: Int = 10): DataFrame =
    rrfCore(t(s, dir, "documents"), topK)

  def rrfCore(docs: DataFrame, topK: Int): DataFrame = {
    val tf = tfTable(docs).persist()
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val qw = Window.orderBy(col("df").desc, col("term").asc)
    val qterms = df
      .filter(length(col("term")) >= 4)
      .orderBy(col("df").desc, col("term").asc).limit(8)
      .withColumn("rn", row_number().over(qw))
      .select((((col("rn") - 1) / 2).cast("int") + 1).as("query_id"),
        col("term"), col("df"))
    val stats = tf.groupBy(col("doc_id"), col("dl")).agg(count(lit(1)))
      .agg(count(lit(1)).cast("double").as("n_docs"),
        avg(col("dl")).as("avgdl"))
    val k1 = 1.2
    val b = 0.75
    val scored = tf.join(broadcast(qterms), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("c_bm25",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
          * col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .withColumn("c_tfidf",
        col("tf").cast("double") / col("dl") * log(col("n_docs") / col("df")))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("c_bm25")), 6).as("s_bm25"),
        round(sum(col("c_tfidf")), 6).as("s_tfidf"))
    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("s_bm25").desc, col("doc_id").asc)
    val wb = Window.partitionBy(col("query_id"))
      .orderBy(col("s_tfidf").desc, col("doc_id").asc)
    val fused = scored
      .withColumn("rank_bm25", row_number().over(wa))
      .withColumn("rank_tfidf", row_number().over(wb))
      .withColumn("rrf",
        lit(1.0) / (lit(60) + col("rank_bm25")) + lit(1.0) / (lit(60) + col("rank_tfidf")))
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
    fused.withColumn("rn", row_number().over(wc))
      .filter(col("rn") <= topK)
      .select(col("query_id"), col("doc_id"),
        col("rank_bm25"), col("rank_tfidf"), col("rrf"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_bm25" -> ((s: SparkSession, d: String) => bm25(s, d)),
    "q_retrieval_rrf" -> ((s: SparkSession, d: String) => rrfFusion(s, d)),
    "q_text_postings" -> ((s: SparkSession, d: String) => postings(s, d)))

  val oracle: Map[String, String] = Map(
    "q_text_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, u.w AS term FROM (
        |    SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |    unnest(tk) AS u(w) WHERE length(u.w) > 0),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |qterms AS (
        |  SELECT ((rn - 1) // 2 + 1)::INT AS query_id, term, df FROM (
        |    SELECT term, df, row_number() OVER (ORDER BY df DESC, term) AS rn
        |    FROM df WHERE length(term) >= 4) WHERE rn <= 8),
        |stats AS (
        |  SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl)
        |SELECT query_id, doc_id, count(*)::BIGINT AS n_hit,
        |  sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        |      * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS score
        |FROM tf JOIN qterms USING (term) JOIN dl USING (doc_id), stats
        |GROUP BY 1, 2""".stripMargin,
    // Same CTE spine as q_text_bm25 + the tfidf twin score, ranks on
    // the shared 1e-6 score grid, integer-reciprocal fusion.
    "q_retrieval_rrf" ->
      """WITH toks AS (
        |  SELECT doc_id, u.w AS term FROM (
        |    SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |    unnest(tk) AS u(w) WHERE length(u.w) > 0),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |qterms AS (
        |  SELECT ((rn - 1) // 2 + 1)::INT AS query_id, term, df FROM (
        |    SELECT term, df, row_number() OVER (ORDER BY df DESC, term) AS rn
        |    FROM df WHERE length(term) >= 4) WHERE rn <= 8),
        |stats AS (
        |  SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
        |scored AS (
        |  SELECT query_id, doc_id,
        |    round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        |        * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS s_bm25,
        |    round(sum(tf::DOUBLE / dl * ln(n_docs / df)), 6) AS s_tfidf
        |  FROM tf JOIN qterms USING (term) JOIN dl USING (doc_id), stats
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT query_id, doc_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY s_bm25 DESC, doc_id) AS rank_bm25,
        |    row_number() OVER (PARTITION BY query_id ORDER BY s_tfidf DESC, doc_id) AS rank_tfidf
        |  FROM scored),
        |fused AS (
        |  SELECT *, 1.0 / (60 + rank_bm25) + 1.0 / (60 + rank_tfidf) AS rrf
        |  FROM ranked)
        |SELECT query_id, doc_id, rank_bm25, rank_tfidf, rrf FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rn
        |  FROM fused)
        |WHERE rn <= 10""".stripMargin,
    "q_text_postings" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, u.w AS term FROM (
        |    SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |    unnest(tk) AS u(w) WHERE length(u.w) > 0)
        |SELECT term, count(*)::BIGINT AS df,
        |  array_to_string(array_agg(doc_id ORDER BY doc_id), ',') AS postings
        |FROM toks GROUP BY term HAVING count(*) BETWEEN 2 AND 400""".stripMargin)
}
