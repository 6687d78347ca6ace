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

  /** Per-source distribution drift: KL(source ‖ corpus) over the
    * token unigram distributions, Laplace-smoothed with α = 0.5 over
    * the shared corpus vocabulary (Kullback & Leibler 1951; the
    * domain-shift monitor a mixed-source training pipeline watches —
    * a source whose token distribution drifts from the mix is the
    * one to re-weight or re-crawl). Reported in millinats so the
    * 2-decimal oracle rounding keeps signal.
    *
    * Scale shape: ONE corpus-token shuffle builds (source, term)
    * counts; everything after is vocabulary-bounded — corpus term
    * totals are a vocab-sized re-aggregate, source totals an
    * |sources|-row broadcast, and the smoothed cross join is
    * |sources| × |vocab| with the absent-term contribution folded in
    * CLOSED FORM (absent terms share one p₀ per source, so the sum
    * over them is p₀·Σ_absent ln(p₀/q_t) = computed from the
    * PRESENT rows and two totals — no |sources|×|vocab| expansion
    * materializes at any scale).
    */
  def sourceDriftKl(s: SparkSession, dir: String): DataFrame =
    driftKlOn(t(s, dir, "documents"))

  def driftKlOn(docs: DataFrame): DataFrame =
    driftKlOnCounts(driftCounts(docs))

  /** The (source, token, count) aggregate both drift front doors
    * share — the batch op computes it from the corpus in one token
    * shuffle; the streaming twin accumulates it as per-batch DELTAS
    * in a store and compacts on read (counts are mergeable by sum,
    * so delta-append + sum-on-read is exact).
    */
  def driftCounts(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        explode(expr("filter(split(text, ' '), x -> x <> '')")).as("tk"))
      .groupBy(col("source"), col("tk"))
      .agg(count(lit(1)).as("c_st"))

  /** KL readout over a (source, tk, c_st) count table — see
    * [[sourceDriftKl]] for the algebra and scale notes. */
  def driftKlOnCounts(stIn: DataFrame): DataFrame = {
    val st = stIn.persist()
    val corpus = st.groupBy(col("tk")).agg(sum(col("c_st")).as("c_t"))
    val totals = corpus.agg(sum(col("c_t")).as("n"),
      count(lit(1)).cast("double").as("v"))
    val srcTotals = st.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
    // Present terms contribute p·ln(p/q) directly. Absent terms all
    // share p0 = α/(n_s + αV); their Σ ln q_t term needs only the
    // corpus-wide Σ ln q_t minus the present terms' — so the plan
    // carries two scalar folds instead of a vocab×sources expand.
    val alpha = 0.5
    val qlog = corpus.crossJoin(broadcast(totals))
      .select(col("tk"), col("c_t"),
        log((col("c_t") + alpha) / (col("n") + lit(alpha) * col("v"))).as("lnq"))
    val sumLnqAll = qlog.agg(sum(col("lnq")).as("sum_lnq_all"))
    val present = st
      .join(qlog, Seq("tk"))
      .join(broadcast(srcTotals), Seq("source"))
      .crossJoin(broadcast(totals))
      .withColumn("p", (col("c_st") + alpha) / (col("n_s") + lit(alpha) * col("v")))
      .groupBy(col("source"))
      .agg(
        sum(col("p") * (log(col("p")) - col("lnq"))).as("kl_present"),
        count(lit(1)).cast("double").as("n_terms"),
        sum(col("lnq")).as("sum_lnq_present"))
    present
      .join(broadcast(srcTotals), Seq("source"))
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(sumLnqAll))
      .withColumn("p0", lit(alpha) / (col("n_s") + lit(alpha) * col("v")))
      .withColumn("kl_absent",
        (col("v") - col("n_terms")) * col("p0") * log(col("p0"))
          - col("p0") * (col("sum_lnq_all") - col("sum_lnq_present")))
      .select(col("source"),
        ((col("kl_present") + col("kl_absent")) * 1000d).as("kl_millinats"))
  }

  /** Streaming twin of [[sourceDriftKl]] — the continuous
    * domain-shift monitor: each micro-batch collapses to its
    * (source, token, count) DELTAS (one batch-sized token shuffle,
    * the same map-side partial-agg economics as the batch op) and
    * appends them to the parquet count store at `storeDir`; the KL
    * readout at any point is [[driftKlFromStore]], which compacts
    * deltas by sum and runs the identical closed-form algebra. The
    * state lives in a TABLE, not per-key executor state — like
    * [[TextQueries.ingestStreamMinhash]], the store IS the batch
    * pipeline's own artifact, and delta-append keeps each batch's
    * write O(batch vocabulary), never store-sized. Exactly-once: a
    * replayed batch re-appends its deltas — production parks the
    * append behind a transactional table format keyed by batchId
    * (the same caveat the minhash ingest documents).
    */
  def ingestStreamDrift(docs: DataFrame, storeDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("update").foreachBatch {
      (batch: DataFrame, _: Long) =>
        driftCounts(batch).write.mode("append").parquet(storeDir)
        ()
    }

  /** KL readout over an [[ingestStreamDrift]] delta store. */
  def driftKlFromStore(s: SparkSession, storeDir: String): DataFrame =
    driftKlOnCounts(s.read.parquet(storeDir)
      .groupBy(col("source"), col("tk")).agg(sum(col("c_st")).as("c_st")))

  /** Exact phase-2 recount for a [[MgStore]]'s candidates over the
    * accumulated corpus — the batch operator's recount join applied
    * to a store folded across micro-batches: map-side broadcast semi
    * filter, candidate-only aggregate exchange, integer φ cut against
    * the store's stream-long total.
    */
  def recountExact(toks: org.apache.spark.sql.Dataset[String],
      store: MgStore, phi: Int): DataFrame = {
    val cands = toks.sparkSession
      .createDataFrame(store.candidates.map(Tuple1(_)))
      .toDF("tk")
    toks.toDF("tk")
      .join(broadcast(cands), Seq("tk"))
      .groupBy(col("tk")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * lit(phi.toLong) > lit(store.total))
      .select(col("tk"), col("cnt"))
  }

  /** Count–Min frequency census with a checked accuracy contract —
    * the point-query companion to [[heavyHitters]] (MG answers "which
    * tokens are frequent"; CMS answers "how often is THIS token",
    * including non-heavy ones, from the same O(w·d) state). The
    * sketch pass is the 100 TB path: `count_min_sketch` partials are
    * mergeable counter grids that fold map-side, so ONE
    * 27 KB-per-partition summary crosses the wire and no token ever
    * shuffles. The exact side exists only as the audit: top-N tokens
    * by exact count (two-phase agg + TakeOrdered — candidate-sized,
    * never a global sort) probe the broadcast sketch through the
    * codegen'd [[graft.functions.FlinkFunctions.cmsEstimate]] and
    * emit the Cormode–Muthukrishnan contract as booleans: estimates
    * never undercount (CMS is one-sided) and overcount by at most
    * ε·N with probability ≥ δ (seeded ⇒ deterministic, so the
    * booleans are stable run to run). The oracle recomputes the exact
    * top-N and asserts literal TRUE — the same checked-sketch
    * discipline as q_agg_approx / q_agg_approx_pct.
    */
  def freqCms(s: SparkSession, dir: String, topN: Int = 20): DataFrame =
    freqCmsOn(
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tk"))
        .where(col("tk") =!= ""), topN)

  /** Core over any single-column token frame — see [[freqCms]]. */
  def freqCmsOn(toks: DataFrame, topN: Int): DataFrame = {
    val eps = 0.0005
    val sk = toks.agg(
      expr(s"count_min_sketch(tk, ${eps}D, 0.999D, 42)").as("sk"),
      count(lit(1)).as("n_total"))
    val top = toks.groupBy(col("tk")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tk").asc).limit(topN)
    top.crossJoin(broadcast(sk))
      .select(col("tk"), col("cnt"),
        graft.functions.FlinkFunctions.cmsEstimate(col("sk"), col("tk")).as("est"),
        col("n_total"))
      .select(col("tk"), col("cnt"),
        (col("est") >= col("cnt")).as("ok_lower"),
        (col("est") <= col("cnt") + ceil(lit(eps) * col("n_total"))).as("ok_upper"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_heavy_hitters" -> ((s: SparkSession, d: String) => heavyHitters(s, d)),
    "q_freq_cms" -> ((s: SparkSession, d: String) => freqCms(s, d)),
    "q_drift_kl" -> ((s: SparkSession, d: String) => sourceDriftKl(s, d)),
    "q_text_entropy" -> (textEntropy _))

  val oracle: Map[String, String] = Map(
    // DuckDB recounts the whole vocabulary exactly; the Spark plan
    // reaches the identical set through the MG candidate superset +
    // recount, so equality here proves zero false negatives AND zero
    // false positives end to end.
    // the CMS estimates are engine-private; the CONTRACT is not —
    // the exact top-N counts must match and the one-sided / ε·N
    // error gates must both be TRUE
    "q_freq_cms" ->
      """WITH tok AS (
        |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tk
        |  FROM documents)
        |SELECT tk, count(*) AS cnt, true AS ok_lower, true AS ok_upper
        |FROM tok
        |GROUP BY tk
        |ORDER BY cnt DESC, tk ASC
        |LIMIT 20""".stripMargin,
    "q_heavy_hitters" ->
      """WITH tok AS (
        |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tk
        |  FROM documents),
        |tot AS (SELECT count(*) AS n FROM tok)
        |SELECT tk, count(*) AS cnt
        |FROM tok, tot
        |GROUP BY tk, n
        |HAVING count(*) * 200 > n""".stripMargin,
    // The oracle materializes the full |sources|×|vocab| smoothed
    // grid (fine at gate scale) — agreeing with the Spark side's
    // closed-form absent-mass fold proves the algebra, not just the
    // arithmetic.
    "q_drift_kl" ->
      """WITH tok AS (
        |  SELECT source, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tk
        |  FROM documents),
        |st AS (SELECT source, tk, count(*) AS c_st FROM tok GROUP BY 1, 2),
        |corpus AS (SELECT tk, count(*) AS c_t FROM tok GROUP BY tk),
        |tot AS (SELECT sum(c_t) AS n, count(*)::DOUBLE AS v FROM corpus),
        |srct AS (SELECT source, count(*) AS n_s FROM tok GROUP BY source),
        |grid AS (
        |  SELECT s.source, c.tk, c.c_t, coalesce(st.c_st, 0) AS c_st
        |  FROM (SELECT DISTINCT source FROM documents) s
        |  CROSS JOIN corpus c
        |  LEFT JOIN st ON st.source = s.source AND st.tk = c.tk)
        |SELECT g.source,
        |  1000 * sum(
        |    ((g.c_st + 0.5) / (srct.n_s + 0.5 * tot.v))
        |    * ln(((g.c_st + 0.5) / (srct.n_s + 0.5 * tot.v))
        |         / ((g.c_t + 0.5) / (tot.n + 0.5 * tot.v)))) AS kl_millinats
        |FROM grid g JOIN srct USING (source), tot
        |GROUP BY g.source""".stripMargin,
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

/** Mergeable Misra–Gries store — the streaming heavy-hitters twin's
  * state. Each micro-batch contributes its per-partition MG(k)
  * summaries (a bounded collect: ≤ partitions × (k+1) rows); the
  * store SUMS counters and, when more than k survive, compacts by
  * subtracting the (k+1)-th largest value and dropping non-positive
  * counters — the mergeable-summaries merge rule (Agarwal et al.,
  * PODS'12), which keeps cumulative undercount ≤ n/(k+1) over the
  * WHOLE stream however many batches fold in. With k ≥ φ the same
  * pigeonhole as the batch operator gives zero false negatives, so
  * `candidates` supersets every φ-frequent token and
  * [[FrequencyOps.recountExact]] finishes the job exactly. State is
  * O(k) at all times: the reference's streaming-first stance for the
  * frequent-items census, fold-per-batch via foreachBatch.
  */
final class MgStore(val k: Int) extends Serializable {
  private val counters = scala.collection.mutable.HashMap.empty[String, Long]
  private var n = 0L
  private var lastBatch = -1L

  /** Stream-long token total (from the summaries' sentinel rows). */
  def total: Long = n
  /** Candidate superset of the φ-frequent tokens seen so far. */
  def candidates: Seq[String] = counters.keys.toSeq.sorted
  def size: Int = counters.size

  /** Fold one micro-batch: distributed MG per partition, bounded
    * driver merge — the only driver-bound data is the summary.
    * Idempotent under foreachBatch's at-least-once replay: Spark
    * re-delivers a failed micro-batch with the SAME batchId, so a
    * batch at or below the high-water mark is skipped rather than
    * double-folded (which would inflate `total` and every counter's
    * lower bound). Out-of-order ids never occur within one query;
    * a restart from checkpoint resumes at the first uncommitted id.
    */
  def fold(batch: org.apache.spark.sql.Dataset[String], batchId: Long): Unit =
    if (batchId > lastBatch) { fold(batch); lastBatch = batchId }

  /** Unguarded fold for batch-mode callers that manage their own
    * delivery (tests, one-shot folds). Streaming callers should pass
    * the foreachBatch batchId through the two-arg overload.
    */
  def fold(batch: org.apache.spark.sql.Dataset[String]): Unit =
    merge(batch.mapPartitions(it => FrequencyOps.misraGries(it, k))(
      batch.sparkSession.implicits.newProductEncoder[(String, Long, Long)])
      .collect().toSeq)

  private[graft] def merge(rows: Seq[(String, Long, Long)]): Unit = {
    rows.foreach {
      case (null, _, np) => n += np
      case (tk, lb, _)   => counters.update(tk, counters.getOrElse(tk, 0L) + lb)
    }
    if (counters.size > k) {
      val c = counters.values.toSeq.sorted(Ordering[Long].reverse)(k)
      counters.mapValuesInPlace((_, v) => v - c)
      counters.filterInPlace((_, v) => v > 0)
    }
  }
}

/** Mergeable Count–Min store — the streaming twin of
  * [[FrequencyOps.freqCms]]'s sketch pass, and [[MgStore]]'s
  * point-query companion (MG tracks WHO is frequent; CMS answers
  * HOW OFTEN for any probed token). Each micro-batch folds through
  * the same `count_min_sketch` aggregate the batch op runs —
  * partial counter grids merge map-side, ONE serialized sketch
  * (w·d longs, corpus-size-independent) reaches the driver — and
  * the store merges it by cell-wise addition
  * (`CountMinSketch.mergeInPlace`). Because CMS is a linear sketch,
  * the stream-fold is EXACTLY the batch sketch over the concatenated
  * stream (same eps/confidence/seed ⇒ same hash rows ⇒ addition
  * commutes), not merely within-error — Round13OpsSpec asserts
  * estimate-for-estimate equality. Same batchId replay guard as
  * [[MgStore]]: foreachBatch re-delivers a failed batch with the
  * same id, and double-folding a linear sketch would double its
  * counts.
  */
final class CmsStore(eps: Double = 0.0005, conf: Double = 0.999, seed: Int = 42)
    extends Serializable {
  import org.apache.spark.util.sketch.CountMinSketch
  private var sketch: CountMinSketch = null
  private var n = 0L
  private var lastBatch = -1L

  def total: Long = n

  /** Fold one micro-batch of tokens (replay-guarded). */
  def fold(toks: org.apache.spark.sql.DataFrame, batchId: Long): Unit =
    if (batchId > lastBatch) { fold(toks); lastBatch = batchId }

  /** Unguarded fold for batch-mode callers (tests, one-shot). */
  def fold(toks: org.apache.spark.sql.DataFrame): Unit = {
    val row = toks.agg(
      expr(s"count_min_sketch(tk, ${eps}D, ${conf}D, $seed)").as("sk"),
      count(lit(1)).as("n")).head()
    val batchSketch = CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](0)))
    if (sketch == null) sketch = batchSketch else sketch.mergeInPlace(batchSketch)
    n += row.getLong(1)
  }

  /** Point estimate for a token (0 before any fold). */
  def estimate(tk: String): Long =
    if (sketch == null) 0L
    else sketch.estimateCount(tk.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}

/** Mergeable HLL store — the streaming twin of
  * [[graft.operators.AggQueries.aggHllRollup]]'s sketch side, and the
  * third of the sketch-store family ([[MgStore]] frequent-items,
  * [[CmsStore]] point frequencies, this: distinct counts). Each
  * micro-batch folds through `hll_sketch_agg` (Datasketches HLL —
  * register max-folds merge map-side, ONE ~2^lgK-byte binary reaches
  * the driver per batch) and the readout UNIONS the per-batch
  * binaries through `hll_union_agg` in a tiny one-row job. Register
  * max-folds make the union's REGISTER STATE identical to a one-shot
  * sketch; the ESTIMATE may differ slightly because a freshly-built
  * sketch reads through the HIP estimator while a union reads the
  * composite estimator (the published Datasketches contract), so the
  * twin's pin is the 2·rsd accuracy bound, not bit equality. Same
  * batchId replay guard as the siblings.
  */
final class HllStore(lgK: Int = 14) extends Serializable {
  private val batches = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
  private var lastBatch = -1L

  def rsd: Double = 1.04 / math.sqrt(1 << lgK)

  /** Fold one micro-batch of a single-column frame named `k`
    * (replay-guarded). */
  def fold(keys: org.apache.spark.sql.DataFrame, batchId: Long): Unit =
    if (batchId > lastBatch) { fold(keys); lastBatch = batchId }

  /** Unguarded fold for batch-mode callers (tests, one-shot). */
  def fold(keys: org.apache.spark.sql.DataFrame): Unit =
    batches += keys.agg(expr(s"hll_sketch_agg(k, $lgK)").as("sk"))
      .head().getAs[Array[Byte]](0)

  /** Distinct-count estimate across every folded batch: union the
    * stored binaries in one |batches|-row job.
    */
  def estimate(spark: SparkSession): Long = {
    if (batches.isEmpty) return 0L
    val s = spark.implicits
    import s._
    batches.toSeq.toDF("sk")
      .agg(expr("cast(hll_sketch_estimate(hll_union_agg(sk, true)) as long)"))
      .head().getLong(0)
  }
}
