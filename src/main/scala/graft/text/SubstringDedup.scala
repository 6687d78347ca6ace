package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Exact-substring deduplication (Lee et al. 2021, "Deduplicating
  * Training Data Makes Language Models Better" — the ExactSubstr
  * pipeline): any token run of length >= L that occurs more than once
  * ANYWHERE in the corpus is removed from every occurrence except the
  * first, even when the containing documents are otherwise unrelated.
  * This is the strongest of the dedup family — [[TextQueries.dedupExact]]
  * removes whole-document copies, [[TextQueries.dedupParagraphs]]
  * removes aligned fixed chunks, and this removes ARBITRARILY ALIGNED
  * duplicated spans (the paper's motivating case: boilerplate, quoted
  * passages, licence text at any offset).
  *
  * The paper builds a corpus-wide suffix array; a single shared suffix
  * array is exactly the shape that does NOT distribute. The dataflow
  * re-expression: every length-L sliding gram (stride 1) becomes one
  * (gram-hash, doc, pos) record, duplicated grams are found with ONE
  * hash-shuffle on the gram hash, and every occurrence after the
  * global-minimum (doc_id, pos) marks its L token positions for
  * removal. Overlapping duplicated grams dissolve into per-document
  * MERGED REMOVAL INTERVALS (bounded by document length, never by
  * corpus size), and the surviving text is rebuilt in one map-side pass over
  * the original token array. Total cost: one shuffle of ~n_tokens
  * 16-byte records + one doc-keyed aggregation of only the DUPLICATED
  * region — the same O(corpus tokens) a distributed suffix-array
  * construction pays per round, with no global order anywhere.
  *
  * Gram identity is a 60-bit md5 prefix (the repo-wide shingle-hash
  * convention): cross-engine reproducible (DuckDB derives the same
  * value) and collision-odds ~n^2/2^60 — at 10^11 grams a handful of
  * false merges of 16-token spans, the same tolerance the MinHash
  * family already accepts. Keep-first is the paper's tie rule made
  * deterministic: the minimal (doc_id, pos) occurrence survives.
  *
  * Reference lineage: the reference engine has no substring dedup —
  * this is part of the training-pipeline family the survey adds on
  * top (SURVEY.md "beyond the reference").
  */
object SubstringDedup {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** See object doc. Output per document: token count, number of
    * token positions removed, and the surviving text with every
    * duplicated-span occurrence (except the corpus-first) cut out.
    */
  def dedupSubstring(s: SparkSession, dir: String, L: Int = 16): DataFrame =
    dedupSubstringCore(t(s, dir, "documents"), L)

  /** Core over any (doc_id, text) frame — fixture-testable. */
  def dedupSubstringCore(docs: DataFrame, L: Int = 16): DataFrame = {
    val toks = docs.withColumn("tk", split(col("text"), " "))
    // One record per sliding L-gram: (gh, doc_id, p). The transform +
    // posexplode stays inside the scan's projection — no shuffle yet.
    val grams = toks
      .filter(size(col("tk")) >= L)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, size(tk) - $L),
           |  i -> cast(conv(substring(md5(cast(
           |    concat_ws(' ', slice(tk, i + 1, $L)) as binary)), 1, 15), 16, 10) as bigint))"""
          .stripMargin)))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "gh")
    // THE shuffle: cluster by gram hash; every occurrence after the
    // global-minimum (doc_id, p) is a duplicate to cut.
    val w = Window.partitionBy(col("gh")).orderBy(col("doc_id"), col("p"))
    val dupOcc = grams
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1)
    // Dissolve overlapping dup grams into per-doc MERGED INTERVALS:
    // only the L-gram START positions cross the wire (sorted fold
    // merges [p, p+L-1] spans inside the projection), not L rows per
    // dup gram — on a heavily-duplicated corpus that is the
    // difference between shuffling dup-starts and shuffling L x the
    // duplicated token volume. Bounded by doc length either way.
    val spans = dupOcc
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("p"))).as("ps"))
      .withColumn("iv", expr(
        s"""aggregate(ps, cast(array() as array<struct<s:int,e:int>>),
           |  (acc, x) -> CASE
           |    WHEN size(acc) = 0 THEN array(named_struct('s', x, 'e', x + ${L - 1}))
           |    WHEN x <= element_at(acc, -1).e + 1
           |      THEN concat(slice(acc, 1, size(acc) - 1),
           |           array(named_struct('s', element_at(acc, -1).s,
           |                 'e', greatest(element_at(acc, -1).e, x + ${L - 1}))))
           |    ELSE concat(acc, array(named_struct('s', x, 'e', x + ${L - 1}))) END)"""
          .stripMargin))
      .select(col("doc_id"), col("iv"))
    // Map-side rebuild against the original token array.
    toks
      .join(spans, Seq("doc_id"), "left")
      .withColumn("iv", coalesce(col("iv"),
        expr("cast(array() as array<struct<s:int,e:int>>)")))
      .select(col("doc_id"),
        size(col("tk")).as("n_tok"),
        expr("aggregate(iv, 0, (a, v) -> a + v.e - v.s + 1)").as("n_removed"),
        expr(
          "concat_ws(' ', filter(tk, (x, i) -> NOT exists(iv, v -> i >= v.s AND i <= v.e)))")
          .as("kept_text"))
  }

  /** The duplicated-gram STORE of a corpus: every L-gram hash that
    * occurs more than once (the grams [[dedupSubstring]] cuts). The
    * static side of the streaming twin — an ingestion pipeline
    * rebuilds it per snapshot, exactly like dedupIncremental's
    * fingerprint store.
    */
  def dupGramStore(docs: DataFrame, L: Int = 16): DataFrame =
    docs
      .withColumn("tk", split(col("text"), " "))
      .filter(size(col("tk")) >= L)
      .select(explode(expr(
        s"""transform(sequence(0, size(tk) - $L),
           |  i -> cast(conv(substring(md5(cast(
           |    concat_ws(' ', slice(tk, i + 1, $L)) as binary)), 1, 15), 16, 10) as bigint))"""
          .stripMargin)).as("gh"))
      .groupBy(col("gh")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select(col("gh"))

  /** Streaming ExactSubstr twin: arriving documents are redacted
    * against the STATIC duplicated-gram store — grams explode
    * statelessly, hit the store in a stream-static join, and the
    * per-doc span merge + rebuild runs as an update-mode aggregate
    * (keyed state = one row per redacted doc). Emits only documents
    * that matched at least one store gram; Round10OpsSpec asserts
    * stream == the equivalent batch redaction.
    */
  def dedupSubstringStream(store: DataFrame, docs: DataFrame, L: Int = 16): DataFrame = {
    val grams = docs
      .withColumn("tk", split(col("text"), " "))
      .filter(size(col("tk")) >= L)
      .select(col("doc_id"), col("text"), posexplode(expr(
        s"""transform(sequence(0, size(tk) - $L),
           |  i -> cast(conv(substring(md5(cast(
           |    concat_ws(' ', slice(tk, i + 1, $L)) as binary)), 1, 15), 16, 10) as bigint))"""
          .stripMargin)))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "gh")
    grams.join(store, Seq("gh"))
      .groupBy(col("doc_id"))
      .agg(first(col("text")).as("text"),
        sort_array(collect_list(col("p"))).as("ps"))
      .withColumn("iv", expr(
        s"""aggregate(ps, cast(array() as array<struct<s:int,e:int>>),
           |  (acc, x) -> CASE
           |    WHEN size(acc) = 0 THEN array(named_struct('s', x, 'e', x + ${L - 1}))
           |    WHEN x <= element_at(acc, -1).e + 1
           |      THEN concat(slice(acc, 1, size(acc) - 1),
           |           array(named_struct('s', element_at(acc, -1).s,
           |                 'e', greatest(element_at(acc, -1).e, x + ${L - 1}))))
           |    ELSE concat(acc, array(named_struct('s', x, 'e', x + ${L - 1}))) END)"""
          .stripMargin))
      .withColumn("tk", split(col("text"), " "))
      .select(col("doc_id"),
        expr("aggregate(iv, 0, (a, v) -> a + v.e - v.s + 1)").as("n_removed"),
        expr(
          "concat_ws(' ', filter(tk, (x, i) -> NOT exists(iv, v -> i >= v.s AND i <= v.e)))")
          .as("kept_text"))
  }

  /** Fuzzy (edit-distance-verified) near-dup pairs — the
    * RefinedWeb-style "approximately equal" check with a fully
    * cross-engine-deterministic pipeline: candidates are document
    * pairs sharing any 8-token run (the same 60-bit gram machinery
    * as [[dedupSubstring]], one L=8 sliding pass), grams whose
    * document frequency exceeds `maxDf` are dropped ENTIRELY before
    * pairing (the stop-gram cut, [[graft.text.DedupCluster]]'s
    * skew-cap convention — a boilerplate gram in 10^8 docs would
    * otherwise mint df^2/2 pairs), and each surviving pair pays one
    * THRESHOLD-BOUNDED Levenshtein verify: Spark's 3-arg
    * `levenshtein(l, r, bound)` runs the banded DP — O(bound·len)
    * per pair with early exit, returning -1 past the bound — so a
    * 100 KB × 100 KB candidate pair costs ~2·10^6 cells instead of
    * the full DP's 10^10. The DuckDB oracle keeps the unbounded DP
    * plus the same `<= maxDist` filter: identical survivors.
    * Verify cost tracks the CANDIDATE count, never the corpus;
    * candidate count tracks real duplication plus a capped
    * boilerplate tail.
    */
  def dedupFuzzy(s: SparkSession, dir: String,
      maxDist: Int = 20, maxDf: Int = 20): DataFrame = {
    val docs = t(s, dir, "documents")
    val grams = docs
      .withColumn("tk", split(col("text"), " "))
      .filter(size(col("tk")) >= 8)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(tk) - 8),
          |  i -> cast(conv(substring(md5(cast(
          |    concat_ws(' ', slice(tk, i + 1, 8)) as binary)), 1, 15), 16, 10) as bigint))"""
          .stripMargin)).as("gh"))
      .distinct()
    val rare = grams.groupBy(col("gh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("gh"))
    val blocked = grams.join(rare, Seq("gh"))
    val cands = blocked.as("a")
      .join(blocked.as("b"),
        col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    // Two verify-stage guards, both measured at the scale probe:
    // (1) Explicit width-n exchange before the verify: the candidate
    //     batch is BYTE-small but per-row EXPENSIVE (the banded DP) —
    //     exactly the case AQE's byte-based partition coalescing
    //     misjudges. It folded the candidate exchange to ONE partition
    //     and serialized the whole verify on a single core (20.6 s vs
    //     2.7 s at x4). A NUMBERED repartition is exempt from AQE
    //     coalescing, so the DP stays at full width at any scale.
    // (2) The DP must evaluate ONCE per pair: a plain
    //     withColumn("dist", lev).filter(dist >= 0) lets Catalyst
    //     substitute the alias when pushing the filter — the DP lands
    //     in the text join as a residual condition AND again in the
    //     output projection (2x the whole verify stage; 25.9 s vs
    //     16.6 s at x16). Aliases do not substitute through Generate,
    //     so exploding the 1-element array pins one evaluation.
    val n = s.conf.get("spark.sql.shuffle.partitions").toInt
    cands.repartition(n)
      .join(docs.select(col("doc_id").as("id_a"), col("text").as("ta")), Seq("id_a"))
      .join(docs.select(col("doc_id").as("id_b"), col("text").as("tb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        explode(array(levenshtein(col("ta"), col("tb"), maxDist))).as("dist"))
      .filter(col("dist") >= 0)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_substring" -> ((s: SparkSession, d: String) => dedupSubstring(s, d)),
    "q_dedup_fuzzy" -> ((s: SparkSession, d: String) => dedupFuzzy(s, d)))

  val oracle: Map[String, String] = Map(
    "q_dedup_substring" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |grams AS (
        |  SELECT doc_id, i AS p,
        |    ('0x' || substr(md5(array_to_string(tk[(i+1):(i+16)], ' ')), 1, 15))::BIGINT AS gh
        |  FROM toks, unnest(generate_series(0, len(tk) - 16)) AS t(i)
        |  WHERE len(tk) >= 16),
        |dup AS (
        |  SELECT doc_id, p,
        |    row_number() OVER (PARTITION BY gh ORDER BY doc_id, p) AS rn
        |  FROM grams),
        |rem AS (
        |  SELECT DISTINCT d.doc_id, u.rp
        |  FROM dup d, unnest(generate_series(d.p, d.p + 15)) AS u(rp)
        |  WHERE d.rn > 1),
        |ragg AS (SELECT doc_id, count(*) AS n_removed FROM rem GROUP BY doc_id),
        |pos AS (
        |  SELECT t.doc_id, u.i, t.tk[u.i] AS tok
        |  FROM toks t, unnest(generate_series(1, len(t.tk))) AS u(i)),
        |kept AS (
        |  SELECT p.doc_id, string_agg(p.tok, ' ' ORDER BY p.i) AS txt
        |  FROM pos p LEFT JOIN rem ON rem.doc_id = p.doc_id AND rem.rp = p.i - 1
        |  WHERE rem.rp IS NULL
        |  GROUP BY p.doc_id)
        |SELECT t.doc_id, len(t.tk)::INT AS n_tok,
        |  coalesce(r.n_removed, 0)::INT AS n_removed,
        |  coalesce(k.txt, '') AS kept_text
        |FROM toks t
        |LEFT JOIN ragg r USING (doc_id)
        |LEFT JOIN kept k USING (doc_id)""".stripMargin,
    "q_dedup_fuzzy" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id,
        |    ('0x' || substr(md5(array_to_string(tk[(i+1):(i+8)], ' ')), 1, 15))::BIGINT AS gh
        |  FROM toks, unnest(generate_series(0, len(tk) - 8)) AS t(i)
        |  WHERE len(tk) >= 8),
        |rare AS (SELECT gh FROM grams GROUP BY gh HAVING count(*) <= 20),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM grams a JOIN grams b ON a.gh = b.gh AND a.doc_id < b.doc_id
        |  WHERE a.gh IN (SELECT gh FROM rare))
        |SELECT c.id_a, c.id_b, levenshtein(da.text, db.text)::INT AS dist
        |FROM cand c
        |JOIN documents da ON da.doc_id = c.id_a
        |JOIN documents db ON db.doc_id = c.id_b
        |WHERE levenshtein(da.text, db.text) <= 20""".stripMargin)
}
