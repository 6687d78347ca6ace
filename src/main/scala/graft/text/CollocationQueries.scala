package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-statistics diagnostics: PMI collocations (Church & Hanks
  * 1990 — the classic phrase-mining statistic) and a Zipf
  * rank-frequency fit (the sanity probe every corpus report card
  * runs: natural text fits ln f ≈ a - s·ln r with s near 1; heavily
  * duplicated or TEMPLATED corpora bend away from the line).
  *
  * Both share the LM-table economics ([[TextQueries.lmPerplexity]]):
  * the corpus-sized work is the token/bigram count aggregates whose
  * exchanges carry DISTINCT grams (map-side partial agg collapses
  * the stream), and everything after runs on vocabulary-sized
  * tables cut to a bounded slice by INTEGER-ordered TakeOrdered —
  * float scores ride along but never order a cut.
  */
object CollocationQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Top-`k` adjacent-bigram collocations by count (ties by words),
    * annotated with PMI = ln((cb/B) / ((cu1/T)(cu2/T))). The
    * `minCount` floor drops the long singleton tail BEFORE the
    * unigram joins (the Zipf truncation this corpus's LM scorer
    * already uses). Unigram tables join on their natural keys —
    * vocab-sized exchanges, broadcastable under a size gate at
    * deploy time, never corpus-sized.
    */
  def pmiCollocations(s: SparkSession, dir: String,
      k: Int = 20, minCount: Int = 5): DataFrame =
    pmiCore(t(s, dir, "documents"), k, minCount)

  def pmiCore(docs: DataFrame, k: Int, minCount: Int): DataFrame = {
    val toks = docs
      .select(col("doc_id"), expr("filter(split(text, ' '), x -> x <> '')").as("tk"))
    val uni = toks.select(explode(col("tk")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val tot = uni.agg(sum(col("cu")).cast("double").as("t_tok"),
      count(lit(1)).cast("double").as("v"))
    val bg = toks.filter(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(tk) - 2), i -> struct(tk[i] AS w1, tk[i + 1] AS w2))"))
        .as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val nbg = bg.agg(sum(col("cb")).cast("double").as("b_tok"))
    bg.filter(col("cb") >= minCount)
      .orderBy(col("cb").desc, col("w1").asc, col("w2").asc).limit(k)
      .join(uni.select(col("w").as("w1"), col("cu").as("cu1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cu").as("cu2")), Seq("w2"))
      .crossJoin(broadcast(nbg)).crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("cb"), col("cu1"), col("cu2"),
        log((col("cb") / col("b_tok")) /
          ((col("cu1") / col("t_tok")) * (col("cu2") / col("t_tok")))).as("pmi"))
  }

  /** Least-squares fit of ln(freq) against ln(rank) over the top
    * `topV` terms (rank by freq desc, term asc — integer-only, so
    * the slice is engine-exact). One output row: slope, intercept,
    * r². The rank window runs AFTER the TakeOrdered cut, so its
    * single partition holds `topV` rows at any corpus size.
    */
  def zipfFit(s: SparkSession, dir: String, topV: Int = 100): DataFrame =
    zipfCore(t(s, dir, "documents"), topV)

  def zipfCore(docs: DataFrame, topV: Int): DataFrame = {
    val uni = docs
      .select(explode(expr("filter(split(text, ' '), x -> x <> '')")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
      .orderBy(col("cu").desc, col("w").asc).limit(topV)
    val ranked = uni
      .withColumn("r", row_number().over(Window.orderBy(col("cu").desc, col("w").asc)))
      .select(log(col("r").cast("double")).as("x"), log(col("cu").cast("double")).as("y"))
    ranked.agg(
      count(lit(1)).as("n_terms"),
      ((avg(col("x") * col("y")) - avg(col("x")) * avg(col("y"))) /
        (avg(col("x") * col("x")) - avg(col("x")) * avg(col("x")))).as("slope"),
      (avg(col("y")) -
        (avg(col("x") * col("y")) - avg(col("x")) * avg(col("y"))) /
          (avg(col("x") * col("x")) - avg(col("x")) * avg(col("x"))) * avg(col("x"))).as("intercept"),
      (pow(avg(col("x") * col("y")) - avg(col("x")) * avg(col("y")), 2.0) /
        ((avg(col("x") * col("x")) - avg(col("x")) * avg(col("x"))) *
          (avg(col("y") * col("y")) - avg(col("y")) * avg(col("y"))))).as("r2"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_pmi" -> ((s: SparkSession, d: String) => pmiCollocations(s, d)),
    "q_text_zipf" -> ((s: SparkSession, d: String) => zipfFit(s, d)))

  val oracle: Map[String, String] = Map(
    "q_text_pmi" ->
      """WITH toks AS (
        |  -- ordinality over the FILTERED list: adjacency must match the
        |  -- Spark side's transform over filter(split(...), x <> '')
        |  SELECT doc_id, tk[j + 1] AS w, j + 1 AS i FROM (
        |    SELECT doc_id,
        |      list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |    FROM documents),
        |    unnest(generate_series(0, len(tk) - 1)) AS t(j)),
        |uni AS (SELECT w, count(*) AS cu FROM toks GROUP BY w),
        |tot AS (SELECT sum(cu)::DOUBLE AS t_tok FROM uni),
        |bg AS (
        |  SELECT a.w AS w1, b.w AS w2, count(*) AS cb
        |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        |  GROUP BY 1, 2),
        |nbg AS (SELECT sum(cb)::DOUBLE AS b_tok FROM bg),
        |cut AS (SELECT * FROM bg WHERE cb >= 5
        |        ORDER BY cb DESC, w1, w2 LIMIT 20)
        |SELECT w1, w2, cb, u1.cu AS cu1, u2.cu AS cu2,
        |  ln((cb / b_tok) / ((u1.cu / t_tok) * (u2.cu / t_tok))) AS pmi
        |FROM cut
        |JOIN uni u1 ON u1.w = cut.w1
        |JOIN uni u2 ON u2.w = cut.w2, nbg, tot""".stripMargin,
    "q_text_zipf" ->
      """WITH uni AS (
        |  SELECT u.w AS w, count(*) AS cu FROM (
        |    SELECT string_split(text, ' ') AS tk FROM documents),
        |    unnest(tk) AS u(w) WHERE length(u.w) > 0
        |  GROUP BY 1 ORDER BY cu DESC, w LIMIT 100),
        |xy AS (
        |  SELECT ln(row_number() OVER (ORDER BY cu DESC, w)::DOUBLE) AS x,
        |         ln(cu::DOUBLE) AS y
        |  FROM uni)
        |SELECT count(*)::BIGINT AS n_terms,
        |  (avg(x*y) - avg(x)*avg(y)) / (avg(x*x) - avg(x)*avg(x)) AS slope,
        |  avg(y) - (avg(x*y) - avg(x)*avg(y)) / (avg(x*x) - avg(x)*avg(x)) * avg(x)
        |    AS intercept,
        |  pow(avg(x*y) - avg(x)*avg(y), 2)
        |    / ((avg(x*x) - avg(x)*avg(x)) * (avg(y*y) - avg(y)*avg(y))) AS r2
        |FROM xy""".stripMargin)
}
