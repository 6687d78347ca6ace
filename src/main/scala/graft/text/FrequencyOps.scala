package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.FlinkFunctions

/** Corpus frequency mining and entropy signals.
  *
  * [[heavyHitters]] is the φ-frequent-items operator (the vocabulary/
  * stopword/boilerplate-token census a 100 TB curation pass runs
  * first): exact answers at bounded memory via the classic two-phase
  * sketch-then-recount plan — Misra–Gries summaries per partition
  * (Misra & Gries 1982; the mergeable-summaries framing is Agarwal et
  * al., PODS'12) mine a small candidate superset, an exact recount
  * over just the candidates replaces the sketch's undercounts with
  * true counts. A plain groupBy(token) is also exact but its hash
  * table grows with DISTINCT TOKENS PER PARTITION (unbounded on a
  * heavy-tailed corpus — Tungsten spills); the MG pass holds k
  * counters regardless of the tail, and the recount's exchange
  * carries only candidate tokens. The reference ships the same
  * shape for approximate distincts (HyperLogLog behind
  * APPROX_COUNT_DISTINCT); frequent-items has no engine shortcut, so
  * it composes from the public sketch literature instead.
  *
  * [[textEntropy]] scores every document's character- and token-level
  * Shannon entropy in ONE map-only projection — two codegen'd native
  * expressions ([[graft.functions.CharEntropy]] /
  * [[graft.functions.TokenEntropy]]), no explode, no shuffle: the
  * low-entropy gibberish/template gate of a quality pipeline at scan
  * speed.
  */
object FrequencyOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Misra–Gries frequent-items summary over one partition's token
    * stream: k counters; on overflow every counter decrements (an
    * arrival "cancels" k-1 others), so any token with local frequency
    * > n_p/k still holds a counter at the end. Deterministic for a
    * given iterator order, but the OUTPUT is only a candidate set —
    * callers must recount exactly (the summary's counts undercount by
    * at most n_p/k).
    */
  private[graft] def misraGries(it: Iterator[String], k: Int): Iterator[(String, Long, Long)] = {
    val counts = new java.util.HashMap[String, Long]()
    var np = 0L
    while (it.hasNext) {
      val tk = it.next()
      np += 1
      val cur = counts.get(tk)
      if (cur != 0L || counts.containsKey(tk)) counts.put(tk, cur + 1)
      else if (counts.size < k) counts.put(tk, 1L)
      else {
        // decrement-all round; drop zeroed counters
        val itr = counts.entrySet().iterator()
        while (itr.hasNext) {
          val e = itr.next()
          if (e.getValue == 1L) itr.remove() else e.setValue(e.getValue - 1)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    // (token, lower-bound count, 0) survivors plus one (null, 0, n_p)
    // totals row — null can never be a real token, so the schema stays
    // a single frame and the corpus is scanned exactly once for both
    // the candidates and the denominator.
    counts.asScala.iterator.map { case (tk, c) => (tk, c, 0L) } ++
      Iterator.single((null: String, 0L, np))
  }

  /** Exact φ-frequent tokens (every token with count·`phi` > total
    * tokens), at Misra–Gries memory bounds. Phase 1 scans the corpus
    * once, map-only: per-partition MG(k) summaries — at most k
    * survivors + 1 totals row per partition cross the wire, however
    * heavy the tail. Pigeonhole gives zero false negatives for any
    * k ≥ phi: count(t) > n/phi forces count_p(t) > n_p/phi in at
    * least one partition, and MG(k≥phi) keeps every such local
    * heavyweight. Phase 2 re-scans the corpus with the candidate set
    * broadcast (map-side semi filter) and recounts EXACTLY — the only
    * aggregate exchange carries candidate tokens, not the vocabulary.
    * The final cut is the integer compare count·phi > n: no float, no
    * sketch error in the output.
    */
  def heavyHitters(s: SparkSession, dir: String, phi: Int = 200, k: Int = 400): DataFrame = {
    import s.implicits._
    heavyHittersOn(
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tk"))
        .where(col("tk") =!= "")
        .as[String],
      phi, k)
  }

  /** Core over any token stream — see [[heavyHitters]]. */
  def heavyHittersOn(toks: org.apache.spark.sql.Dataset[String],
      phi: Int, k: Int): DataFrame = {
    require(k >= phi, s"MG width k=$k must be >= phi=$phi for the zero-false-negative bound")
    import toks.sparkSession.implicits._
    val summaries = toks
      .mapPartitions(it => misraGries(it, k))
      .toDF("tk", "lb", "np")
    // total token count from the sentinel rows: one tiny aggregate
    val totals = summaries.where(col("tk").isNull)
      .agg(sum(col("np")).as("n"))
    val cands = summaries.where(col("tk").isNotNull)
      .select(col("tk")).distinct()
    toks.toDF("tk")
      .join(broadcast(cands), Seq("tk")) // map-side candidate filter
      .groupBy(col("tk"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(totals))
      .where(col("cnt") * lit(phi.toLong) > col("n"))
      .select(col("tk"), col("cnt"))
  }

  /** Per-document character and token Shannon entropy (bits): one
    * map-only projection over two codegen'd expressions. Stateless,
    * so [[textEntropyOn]] runs unchanged on a streaming frame — the
    * quality gate applies at ingest with zero state (spec-asserted
    * batch ≡ stream in Round11OpsSpec).
    */
  def textEntropy(s: SparkSession, dir: String): DataFrame =
    textEntropyOn(t(s, dir, "documents"))

  /** [[textEntropy]] over any (doc_id, text) frame — batch or stream. */
  def textEntropyOn(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      FlinkFunctions.charEntropy(col("text")).as("char_h"),
      FlinkFunctions.tokenEntropy(col("text")).as("tok_h"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_heavy_hitters" -> ((s: SparkSession, d: String) => heavyHitters(s, d)),
    "q_text_entropy" -> (textEntropy _))

  val oracle: Map[String, String] = Map(
    // DuckDB recounts the whole vocabulary exactly; the Spark plan
    // reaches the identical set through the MG candidate superset +
    // recount, so equality here proves zero false negatives AND zero
    // false positives end to end.
    "q_heavy_hitters" ->
      """WITH tok AS (
        |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tk
        |  FROM documents),
        |tot AS (SELECT count(*) AS n FROM tok)
        |SELECT tk, count(*) AS cnt
        |FROM tok, tot
        |GROUP BY tk, n
        |HAVING count(*) * 200 > n""".stripMargin,
    "q_text_entropy" ->
      """WITH ce AS (
        |  SELECT doc_id, entropy(c) AS char_h
        |  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '[\s\S]')) AS c
        |        FROM documents)
        |  GROUP BY doc_id),
        |te AS (
        |  SELECT doc_id, entropy(tk) AS tok_h
        |  FROM (SELECT doc_id,
        |          unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tk
        |        FROM documents)
        |  GROUP BY doc_id)
        |SELECT ce.doc_id, ce.char_h, te.tok_h
        |FROM ce JOIN te ON ce.doc_id = te.doc_id""".stripMargin)
}
