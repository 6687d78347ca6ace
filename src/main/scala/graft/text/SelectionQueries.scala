package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Data-SELECTION operators — the "which docs make the training set"
  * half of a pretraining pipeline, downstream of cleaning/dedup:
  * model-based quality scoring (the fastText-style classifier gate
  * of CCNet/LLaMA/FineWeb; also registered as the `quality_logit`
  * SQL scalar), token-budget selection (keep the best docs until a
  * token budget is spent — the DataComp/DoReMi-style curation step,
  * with a static-snapshot streaming twin), winnowing fingerprints
  * (Schleimer et al. SIGMOD'03 — the local-min fingerprint scheme
  * MOSS popularized, the third standard dedup blocker besides
  * minhash/simhash), C4/Dolma-style pre-tokenization text cleanup,
  * and the end-to-end selection-stack composition
  * ([[pipelineSelect]]).
  *
  * Every operator here is integer-exact end to end (the cleanup's
  * string output excepted — it is byte-deterministic), so the DuckDB
  * oracle matches bit for bit, and every per-doc stage is map-only —
  * the shapes that survive a 100 TB corpus unchanged.
  */
object SelectionQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------
  // Quality-classifier inference
  // ---------------------------------------------------------------

  /** Per-token weight of the hashed-bag-of-words linear model: the
    * token hashes into one of 1024 buckets (feature hashing — the
    * trick that fixes model size regardless of vocabulary, collisions
    * included by design), and the bucket carries an integer weight in
    * [-32768, 32767]. Weights here DERIVE from md5 of the bucket id —
    * a stand-in for learned parameters that keeps the whole query
    * engine-reproducible; a real model binds the same way with its
    * 2^k weights inlined or broadcast, the plan shape unchanged.
    */
  /** The whole model evaluation as Spark SQL text over a column
    * reference — the SINGLE definition shared by the DataFrame
    * operator below and the `quality_logit` SQL scalar
    * ([[graft.functions.FlinkFunctions.registerAll]] parses this and
    * grafts the call's argument in), so the two surfaces cannot
    * drift.
    */
  def logitSparkSql(ref: String): String =
    s"""aggregate(split($ref, ' '), 0L, (acc, x) -> acc +
       |  (cast(conv(substring(md5(cast(concat('qw:', cast(
       |     (cast(conv(substring(md5(cast(concat('qb:', x) as binary)),
       |        1, 4), 16, 10) as int) % 1024) as string)) as binary)),
       |     1, 4), 16, 10) as bigint) - 32768L))""".stripMargin

  /** Per-row classifier core: doc logit = sum of token weights, an
    * exact BIGINT (no float accumulation → bit-identical across
    * engines and fold orders). Stateless projection — runs unchanged
    * on a STREAMING frame, which makes the streaming twin a
    * one-liner (SelectionOpsSpec asserts batch == stream).
    */
  def qualityFlags(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"),
        expr(logitSparkSql("text")).as("logit"))
      .withColumn("keep", (col("logit") > 0L).cast("int"))

  /** The `queries()` entry: hashed-linear-model quality scoring over
    * `documents` — one map-only pass (token explode never leaves the
    * row: `aggregate` folds inside the projection), no shuffle, no
    * UDF; the model evaluation is entirely codegen'd builtins.
    */
  def qualityClassifier(s: SparkSession, dir: String): DataFrame =
    qualityFlags(t(s, dir, "documents"))

  // ---------------------------------------------------------------
  // Token-budget selection
  // ---------------------------------------------------------------

  /** Select the highest-quality documents until a token budget is
    * spent — greedily from the top quality bucket down, stopping
    * BEFORE the bucket that would overshoot (never exceeds budget;
    * bucket granularity is the documented selection unit). The
    * 100 TB shape is the same trick as curriculumBins: NO global
    * sort-by-score (the naive cumsum-over-ordered-docs is a
    * single-partition window over the corpus). Instead the per-token
    * quality score quantizes to 256 buckets, a histogram aggregates
    * (bucket, tokens) — ≤ 256 rows at ANY corpus size — the
    * cumulative fold runs on the histogram, and the per-bucket keep
    * flag broadcast-joins back onto the doc stream. All integer
    * math: score = ((logit + 32768·n_tok)·256) div (65536·n_tok) is
    * the per-token mean shifted to [0, 255] with floor division on
    * non-negative operands, identical in Spark (`div`) and DuckDB
    * (`//`).
    *
    * @param budgetPermille token budget as permille of corpus tokens
    */
  /** Per-row scoring core (stateless — quality logit + the 256-way
    * bucket quantization), shared by the batch query and the
    * streaming twin.
    */
  def scoreBuckets(docs: DataFrame): DataFrame =
    qualityFlags(docs)
      .select(col("doc_id"), col("n_tok"), col("logit"))
      .withColumn("pbucket",
        expr("((logit + 32768L * n_tok) * 256L) div (65536L * n_tok)"))

  /** The per-bucket keep/drop flag table for a corpus snapshot — the
    * static half of budget selection, shared with the streaming twin
    * ([[assignTokenBudget]]): ≤ 256 rows.
    */
  def budgetFlags(scored: DataFrame, budgetPermille: Int): DataFrame = {
    val hist = scored.groupBy(col("pbucket")).agg(sum(col("n_tok")).as("btoks"))
    // hist is a bounded intermediate (≤ 256 rows by construction —
    // pbucket ∈ [0, 255]) so the unpartitioned window is a single
    // tiny task, not a corpus sort; same accepted pattern as the
    // curriculum-bin histogram.
    val wDesc = Window.orderBy(col("pbucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum(col("btoks")).over(wDesc))
      .crossJoin(broadcast(hist.agg(sum(col("btoks")).as("total"))))
      .select(col("pbucket"),
        (col("cum") * 1000L <= col("total") * budgetPermille).cast("int").as("kept"))
  }

  /** Streaming twin of [[tokenBudgetSelect]]: the budget threshold is
    * a STATIC per-bucket flag snapshot (recomputing it per
    * micro-batch would move the cut as data arrives — the same
    * drift [[TextQueries.lengthBinMap]] avoids); arriving docs score
    * statelessly and broadcast-join the snapshot. A bucket absent
    * from the snapshot flags -1 (unknown) instead of guessing.
    * SelectionOpsSpec asserts stream == batch on the snapshot's rows.
    */
  def assignTokenBudget(docs: DataFrame, flags: DataFrame): DataFrame =
    scoreBuckets(docs)
      .join(broadcast(flags), Seq("pbucket"), "left")
      .select(col("doc_id"), col("n_tok"), col("pbucket"),
        coalesce(col("kept"), lit(-1)).as("kept"))

  def tokenBudgetSelect(s: SparkSession, dir: String,
      budgetPermille: Int = 250): DataFrame = {
    // scored feeds BOTH the histogram and the output join; without
    // materialization the md5-heavy scoring projection runs twice
    // (measured ~2x wall). The persisted frame is 4 narrow columns —
    // at cluster scale cache-or-recompute is the standard narrow-
    // projection tradeoff, and the dedupMinhash candidate cache is
    // the same convention.
    val scored = scoreBuckets(t(s, dir, "documents")).persist()
    scored.join(broadcast(budgetFlags(scored, budgetPermille)), Seq("pbucket"))
      .select(col("doc_id"), col("n_tok"), col("pbucket"), col("kept"))
  }

  // ---------------------------------------------------------------
  // Winnowing fingerprints
  // ---------------------------------------------------------------

  /** The quality scorer through the SQL front door: `quality_logit`
    * registers as a codegen'd SQL scalar (one shared definition with
    * [[qualityFlags]]), so a migrating SQL user writes the gate as a
    * WHERE clause. Oracle-checked like the DataFrame twin.
    */
  def qualitySql(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    graft.sql.GraftSql.sql(s,
      """SELECT doc_id, quality_logit(text) AS logit,
        |  cast(quality_logit(text) > 0 as int) AS keep
        |FROM documents""".stripMargin)
  }

  // ---------------------------------------------------------------
  // Text cleanup
  // ---------------------------------------------------------------

  /** Pre-tokenization text cleanup — the C4/Dolma-style scrub that
    * runs before any quality scoring: control characters become
    * spaces, Unicode replacement characters (mojibake residue) are
    * dropped, whitespace runs collapse, edges trim; per-category
    * counts ride along for corpus auditing. Pure projection
    * (codegen'd regexp_replace chain) — map-only at any scale. The
    * synthetic corpus is clean, so deterministic dirt seeds from the
    * text itself (mirrored verbatim in the oracle, the redactPii
    * convention) — the regexes must actually fire to be verified.
    */
  def cleanText(s: SparkSession, dir: String): DataFrame = {
    val seeded = t(s, dir, "documents").select(col("doc_id"),
      concat(col("text"),
        lit("\u0001 bad\u0007ctl\uFFFD  double")).as("text"))
    seeded.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit("[\\x00-\\x1f\\x7f]"), lit(0)))
        .as("n_ctrl"),
      size(regexp_extract_all(col("text"), lit("�"), lit(0)))
        .as("n_repl"),
      trim(regexp_replace(regexp_replace(regexp_replace(col("text"),
        "[\\x00-\\x1f\\x7f]", " "), "�", ""), "  +", " "))
        .as("cleaned"))
  }

  /** Winnowing document fingerprints (Schleimer et al. SIGMOD'03):
    * hash every k-gram (k=4), slide a window of w=8 consecutive
    * hashes, select each window's minimum — the selected VALUES form
    * the fingerprint set. The scheme's guarantee: any shared token
    * run of ≥ w+k-1 tokens between two documents yields at least one
    * shared fingerprint (spec-asserted with a planted shared
    * passage), while only ~2/(w+1) of all gram hashes are kept.
    * Position tie-breaking doesn't affect the VALUE set (equal
    * minima are one distinct value), so the output is engine-exact:
    * DuckDB re-derives the same md5-based 32-bit gram hashes and
    * window minima. Entirely map-only — the gram hashing, window
    * minima and distinct fold all happen inside one projection via
    * higher-order functions; no explode, no shuffle.
    */
  def winnowFingerprints(s: SparkSession, dir: String): DataFrame =
    winnowCore(t(s, dir, "documents"))

  /** Stateless winnowing core — runs unchanged on a STREAMING frame
    * (fingerprints are per-row; no state, no shuffle), spec-asserted
    * batch == stream (SelectionOpsSpec).
    */
  def winnowCore(docs: DataFrame): DataFrame =
    docs
      .withColumn("l", split(col("text"), " "))
      .filter(size(col("l")) >= 11) // k+w-1 tokens → ≥1 window
      .withColumn("hs", expr(
        """transform(sequence(0, size(l) - 4), i ->
          |  cast(conv(substring(md5(cast(
          |    concat_ws(' ', l[i], l[i+1], l[i+2], l[i+3]) as binary)),
          |    1, 8), 16, 10) as bigint))""".stripMargin))
      .withColumn("fps", expr(
        "array_distinct(transform(sequence(0, size(hs) - 8), j -> array_min(slice(hs, j + 1, 8))))"))
      .select(col("doc_id"),
        (size(col("hs")) - lit(7)).as("n_win"),
        size(col("fps")).as("n_fp"),
        array_min(col("fps")).as("fp_min"),
        array_max(col("fps")).as("fp_max"),
        aggregate(col("fps"), lit(0L), (acc, x) => acc + x).as("fp_sum"))

  // ---------------------------------------------------------------
  // DSIR importance selection
  // ---------------------------------------------------------------

  /** Data Selection with Importance Resampling (Xie et al. 2023
    * DSIR): score every corpus document by how much more likely its
    * hashed-unigram features are under a TARGET distribution (here
    * the `src0` slice — in production, Wikipedia/books) than under
    * the raw-corpus distribution, logw = Σ_tok [log p_t(b) − log
    * p_s(b)] with add-0.01 smoothing over B=1024 hash buckets; keep
    * docs that look more target-like than source-like (logw > 0).
    *
    * The scale shape: BOTH models are B-row tables built with one
    * bucket-keyed aggregate each over the token stream (partial agg
    * collapses to ≤B rows per map task before the exchange), then
    * broadcast to the per-doc scoring aggregate — the corpus
    * shuffles nothing wider than (doc_id, partial sums), identical
    * to the truncated-LM economics. The 1e-9 keep margin is the
    * classifierHashed convention: a true-zero logw needs exact
    * rational cancellation and both engines then agree within float
    * noise.
    */
  def dsirSelect(s: SparkSession, dir: String,
      buckets: Int = 1024, targetSource: String = "src0"): DataFrame = {
    val docs = t(s, dir, "documents")
    dsirScore(dsirModel(s, docs, buckets, targetSource), dsirBuckets(docs, buckets))
  }

  private def dsirBuckets(docs: DataFrame, buckets: Int): DataFrame =
    docs
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("tok"))
      .withColumn("b",
        pmod(conv(substring(md5(col("tok").cast("binary")), 1, 8), 16, 10).cast("bigint"),
          lit(buckets)))

  /** The B-row importance model built from a reference corpus — a
    * STATIC snapshot in the streaming twin (per-batch models would
    * drift the selection boundary; the tokenBudget convention).
    */
  def dsirModel(s: SparkSession, docs: DataFrame,
      buckets: Int = 1024, targetSource: String = "src0"): DataFrame = {
    val toks = dsirBuckets(docs, buckets)
    val srcCnt = toks.groupBy(col("b")).agg(count(lit(1)).as("cs"))
    val tgtCnt = toks.filter(col("source") === targetSource)
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val totals = toks.agg(
      count(lit(1)).as("ns"),
      count(when(col("source") === targetSource, 1)).as("nt"))
    s.range(buckets.toLong).select(col("id").as("b"))
      .join(srcCnt, Seq("b"), "left")
      .join(tgtCnt, Seq("b"), "left")
      .crossJoin(totals)
      .select(col("b"),
        // add-0.01, not add-1: with B ~ nt the unit prior drowns the
        // enrichment signal and every doc scores source-like (measured:
        // add-1 kept 0 of 500 docs; add-0.01 keeps 14/25 target vs
        // 93/475 off-target on this corpus)
        (log((coalesce(col("ct"), lit(0L)) + 0.01) / (col("nt") + 0.01 * buckets)) -
         log((coalesce(col("cs"), lit(0L)) + 0.01) / (col("ns") + 0.01 * buckets))).as("w"))
  }

  /** Stateless scoring half: arriving (already bucketed) tokens
    * broadcast-join the model snapshot — runs unchanged on a
    * streaming frame (Round10OpsSpec asserts batch == stream).
    */
  def dsirScore(model: DataFrame, toks: DataFrame): DataFrame =
    toks.join(broadcast(model), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("w")).as("logw"))
      .select(col("doc_id"), col("n_tok"), col("logw"),
        (col("logw") > 1e-9).as("keep"))

  /** Streaming DSIR: score an arriving doc stream against the static
    * model built from a reference corpus.
    */
  def dsirStream(s: SparkSession, refDocs: DataFrame, stream: DataFrame,
      buckets: Int = 1024, targetSource: String = "src0"): DataFrame =
    dsirScore(dsirModel(s, refDocs, buckets, targetSource),
      dsirBuckets(stream, buckets))

  // ---------------------------------------------------------------
  // Round-10 curation funnel
  // ---------------------------------------------------------------

  /** The round-10 curation FUNNEL end to end: Gopher quality gate →
    * exact-substring redaction of the survivors → DSIR importance
    * selection on the REDACTED text — each stage semantically
    * identical to its standalone operator (the pipelineE2e
    * composition discipline), reported as a 4-row (stage, docs,
    * tokens) funnel. Plan shape: the gate fuses into the scan, the
    * redaction pays its one gram-hash exchange over only the GATED
    * slice, the DSIR models aggregate the redacted token stream to
    * ≤B rows and broadcast back, and the funnel is four 1-row
    * aggregates — no stage rescans the corpus.
    */
  def pipelineCurate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val gated = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok0", size(col("toks")))
      .withColumn("awl",
        aggregate(col("toks"), lit(0), (acc, x) => acc + length(x)).cast("double")
          / col("n_tok0"))
      .withColumn("alpha_ratio",
        size(filter(col("toks"), x => x.rlike("[a-zA-Z]"))).cast("double")
          / col("n_tok0"))
      .withColumn("stop_hits",
        size(filter(col("toks"),
          x => x.isin(Seq("the", "a", "of", "and", "to").map(lit): _*).cast("boolean"))))
      .filter(col("n_tok0") >= 30 && col("awl") >= 3.0 && col("awl") <= 10.0 &&
        col("alpha_ratio") >= 0.9 && col("stop_hits") >= 1)
      .select(col("doc_id"), col("text"), col("source"))
      .persist()
    val red = SubstringDedup.dedupSubstringCore(
        gated.select(col("doc_id"), col("text")), L = 16)
      .persist()
    val dsDocs = red.select(col("doc_id"), col("kept_text").as("text"))
      .join(gated.select(col("doc_id"), col("source")), Seq("doc_id"))
    val keepers = dsirScore(dsirModel(s, dsDocs), dsirBuckets(dsDocs, 1024))
      .filter(col("keep"))
      .select(col("doc_id"))
    def row(stage: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_docs"), sum(col("nt")).cast("long").as("n_tokens"))
        .select(lit(stage).as("stage"), col("n_docs"), col("n_tokens"))
    val funnel =
      row("raw", docs.select(size(split(col("text"), " ")).as("nt")))
        .union(row("quality", gated.select(size(split(col("text"), " ")).as("nt"))))
        .union(row("substring_dedup",
          red.select((col("n_tok") - col("n_removed")).as("nt"))))
        .union(row("dsir",
          red.join(keepers, Seq("doc_id"))
            .select((col("n_tok") - col("n_removed")).as("nt"))))
    funnel
  }

  // ---------------------------------------------------------------
  // Selection-stack composition
  // ---------------------------------------------------------------

  /** The round-9 SELECTION pipeline end to end — quality gate →
    * token-budget cut over the gated docs → reshard-stable shard
    * assignment of the selected set → per-shard report — every stage
    * semantically identical to its standalone operator (the
    * pipelineE2e discipline applied to the selection stack). Plan
    * shape: the gate and scoring fuse into the scan's projection,
    * the budget histogram is one bounded aggregate broadcast back,
    * shard assignment is a per-shard window over only the SELECTED
    * slice, and the report is a tiny final aggregate — one corpus
    * scan, one bounded-histogram exchange, one selected-slice window
    * shuffle, nothing corpus-sorted.
    */
  def pipelineSelect(s: SparkSession, dir: String, nShards: Int = 8,
      budgetPermille: Int = 500): DataFrame = {
    val gated = scoreBuckets(t(s, dir, "documents"))
      .filter(col("logit") > 0L).persist()
    val selected = gated
      .join(broadcast(budgetFlags(gated, budgetPermille)), Seq("pbucket"))
      .filter(col("kept") === 1)
      .withColumn("k", md5(concat(lit("shard:"), col("doc_id").cast("string"))))
      .withColumn("shard",
        pmod(conv(substring(col("k"), 1, 4), 16, 10).cast("int"), lit(nShards)))
    selected
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_toks"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
  }

  // ---------------------------------------------------------------
  // Weighted sampling
  // ---------------------------------------------------------------

  /** Priority sampling (Duffield–Lund–Thorup, JACM 2007): a
    * weight-proportional sample of k docs WITHOUT replacement that
    * supports unbiased subset-sum estimation — the statistically
    * sound way to eyeball a 100 TB corpus's token mass from k rows.
    * Each doc draws priority u/w (u an md5-derived 60-bit uniform, w
    * the doc's token count); the k SMALLEST priorities are the
    * sample, and each sampled doc estimates its weight class as
    * max(w, tau) with tau the (k+1)-th priority — summing `est` over
    * any sampled subset is an unbiased estimator of that subset's
    * true token sum. Deterministic end to end: u is a hash, and the
    * ordering key is ONE exactly-rounded IEEE division of
    * exactly-rounded long→double casts — bit-identical in any engine,
    * so even the top-k CUT is engine-stable (the ln-based
    * Efraimidis–Spirakis key would hostage the cut to libm ulp
    * differences; u/w is the same sampling design with an
    * arithmetic-only key). Scale shape: one map-side projection +
    * TakeOrderedAndProject (per-partition heap of k+1, driver merges
    * heads — no global sort, no full shuffle); the tau window runs
    * over the k+1 collected rows only.
    */
  def prioritySample(s: SparkSession, dir: String, k: Int = 64): DataFrame =
    prioritySampleCore(t(s, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("w")), k)

  /** Core over any (doc_id, w) frame with positive integer weights. */
  def prioritySampleCore(weighted: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    val pri = weighted
      .filter(col("w") >= 1)
      .withColumn("u", expr(
        """cast(conv(substring(md5(cast(concat('ps:', cast(doc_id as string))
          |  as binary)), 1, 15), 16, 10) as bigint)""".stripMargin))
      .withColumn("prio", col("u").cast("double") / col("w").cast("double"))
    val top = pri.orderBy(col("prio").asc, col("doc_id").asc).limit(k + 1)
    val byPrio = W.orderBy(col("prio").asc, col("doc_id").asc)
    top
      .withColumn("rnk", row_number().over(byPrio))
      .withColumn("tau", max(col("prio")).over(
        byPrio.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("w"),
        greatest(col("w").cast("double"), col("tau")).as("est"))
  }

  /** Temperature-scaled source mixing weights (the mC4 / XLM-R
    * α-sampling rule, Conneau et al. 2020, α = 0.3): the corpus-share
    * vector p flattens to q ∝ p^α, boosting low-resource sources by
    * the upsample factor q/p while hot sources downweight. This is
    * the PLANNING query of a mixture pipeline — its output (one row
    * per source) parameterizes the rate sampler [[graft.text
    * .TextQueries.mixSources]] actually applies per row. Corpus-sized
    * work is one map-only token-count projection into a |sources|-row
    * aggregate; the normalizers ride a broadcast 1-row crossjoin.
    */
  def temperatureMix(s: SparkSession, dir: String, alpha: Double = 0.3): DataFrame =
    temperatureMixOn(t(s, dir, "documents"), alpha)

  def temperatureMixOn(docs: DataFrame, alpha: Double): DataFrame = {
    val perSource = docs
      .select(col("source"),
        size(expr("filter(split(text, ' '), x -> x <> '')")).cast("long").as("ntok"))
      .groupBy(col("source")).agg(sum(col("ntok")).as("n_tokens"))
    val totals = perSource.agg(sum(col("n_tokens")).cast("double").as("n_all"))
    val shared = perSource.crossJoin(broadcast(totals))
      .withColumn("p", col("n_tokens") / col("n_all"))
      .withColumn("pa", pow(col("p"), alpha))
    val z = shared.agg(sum(col("pa")).as("z"))
    shared.crossJoin(broadcast(z))
      .select(col("source"), col("n_tokens"), col("p"),
        (col("pa") / col("z")).as("q"),
        (col("pa") / col("z") / col("p")).as("upsample"))
  }

  /** Per-source quota cap — the "no single domain may dominate"
    * curation knob (C4 caps any one URL host; mC4/Dolma cap domains
    * before mixing): keep at most `cap` docs per source, preferring
    * longer docs (n_chars desc, doc_id ties) — the deterministic
    * stand-in for a quality ordering; swap the ORDER BY for
    * quality_logit to make it keep-best-N. Plans as WindowGroupLimit:
    * each map task forwards only its local top-`cap` per source, so
    * the exchange carries at most tasks×cap rows per source and no
    * source ever sorts corpus-wide — the same plan contract as
    * [[TextQueries.stratifiedSample]].
    */
  def sourceQuota(s: SparkSession, dir: String, cap: Int = 10): DataFrame =
    sourceQuotaOn(graft.Tables.load(s, dir, "documents"), cap)

  def sourceQuotaOn(docs: DataFrame, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    docs.select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
  }

  // ---------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_source_quota"       -> ((s: SparkSession, d: String) => sourceQuota(s, d)),
    "q_mix_temperature"    -> ((s: SparkSession, d: String) => temperatureMix(s, d)),
    "q_sample_weighted"    -> ((s: SparkSession, d: String) => prioritySample(s, d)),
    "q_quality_classifier" -> (qualityClassifier _),
    "q_pipeline_select"    -> ((s: SparkSession, d: String) => pipelineSelect(s, d)),
    "q_sql_quality"        -> (qualitySql _),
    "q_text_clean"         -> (cleanText _),
    "q_token_budget"       -> ((s: SparkSession, d: String) => tokenBudgetSelect(s, d)),
    "q_text_winnow"        -> (winnowFingerprints _),
    "q_dsir_select"        -> ((s: SparkSession, d: String) => dsirSelect(s, d)),
    "q_pipeline_curate"    -> ((s: SparkSession, d: String) => pipelineCurate(s, d)))

  private[text] val logitSql =
    """list_sum(list_transform(l, x ->
      |      ('0x' || substr(md5('qw:' ||
      |         (('0x' || substr(md5('qb:' || x), 1, 4))::INT % 1024)::VARCHAR),
      |         1, 4))::BIGINT - 32768))::BIGINT""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_source_quota" ->
      """SELECT doc_id, source, n_chars, rk FROM (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (
        |      PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 10""".stripMargin,
    "q_mix_temperature" ->
      """WITH per_source AS (
        |  SELECT source,
        |    sum(len(list_filter(string_split(text, ' '), x -> x <> '')))::BIGINT
        |      AS n_tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT sum(n_tokens)::DOUBLE AS n_all FROM per_source),
        |shared AS (
        |  SELECT source, n_tokens, n_tokens / n_all AS p,
        |    pow(n_tokens / n_all, 0.3) AS pa
        |  FROM per_source, tot),
        |z AS (SELECT sum(pa) AS z FROM shared)
        |SELECT source, n_tokens, p, pa / z AS q, pa / z / p AS upsample
        |FROM shared, z""".stripMargin,
    "q_sample_weighted" ->
      """WITH scored AS (
        |  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS w,
        |    ('0x' || substr(md5('ps:' || doc_id::VARCHAR), 1, 15))::BIGINT AS u
        |  FROM documents),
        |pri AS (SELECT doc_id, w, u::DOUBLE / w::DOUBLE AS prio
        |        FROM scored WHERE w >= 1),
        |top AS (SELECT * FROM pri ORDER BY prio, doc_id LIMIT 65),
        |rk AS (SELECT doc_id, w, prio,
        |         row_number() OVER (ORDER BY prio, doc_id) AS rnk,
        |         max(prio) OVER () AS tau FROM top)
        |SELECT doc_id, w, greatest(w::DOUBLE, tau) AS est FROM rk
        |WHERE rnk <= 64""".stripMargin,
    "q_pipeline_select" ->
      s"""WITH s AS (
        |  SELECT doc_id, len(l) AS n_tok, $logitSql AS logit
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)),
        |g AS (SELECT doc_id, n_tok,
        |        ((logit + 32768 * n_tok) * 256) // (65536 * n_tok) AS pbucket
        |      FROM s WHERE logit > 0),
        |h AS (SELECT pbucket, sum(n_tok) AS btoks FROM g GROUP BY pbucket),
        |c AS (SELECT pbucket,
        |        sum(btoks) OVER (ORDER BY pbucket DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |        sum(btoks) OVER () AS total
        |      FROM h),
        |sel AS (
        |  SELECT g.doc_id, g.n_tok,
        |    ('0x' || substr(md5('shard:' || g.doc_id::VARCHAR), 1, 4))::INT % 8
        |      AS shard
        |  FROM g JOIN c USING (pbucket)
        |  WHERE c.cum * 1000 <= c.total * 500)
        |SELECT shard, count(*) AS n_docs, sum(n_tok)::BIGINT AS n_toks,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM sel GROUP BY shard""".stripMargin,
    "q_sql_quality" ->
      s"""SELECT doc_id, logit, (logit > 0)::INT AS keep FROM (
        |  SELECT doc_id, $logitSql AS logit
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents))""".stripMargin,
    // chr(1)/chr(7) control chars + chr(65533) replacement char +
    // a double space, seeded identically to the Spark side
    "q_text_clean" ->
      """WITH seeded AS (
        |  SELECT doc_id,
        |    text || chr(1) || ' bad' || chr(7) || 'ctl' || chr(65533)
        |      || '  double' AS text
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(text, '[\x00-\x1f\x7f]')) AS n_ctrl,
        |  len(regexp_extract_all(text, chr(65533))) AS n_repl,
        |  trim(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[\x00-\x1f\x7f]', ' ', 'g'), chr(65533), '', 'g'),
        |    '  +', ' ', 'g')) AS cleaned
        |FROM seeded""".stripMargin,
    "q_quality_classifier" ->
      s"""SELECT doc_id, n_tok, logit, (logit > 0)::INT AS keep FROM (
        |  SELECT doc_id, len(l) AS n_tok, $logitSql AS logit
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents))""".stripMargin,
    "q_token_budget" ->
      s"""WITH s AS (
        |  SELECT doc_id, len(l) AS n_tok, $logitSql AS logit
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)),
        |b AS (SELECT doc_id, n_tok,
        |        ((logit + 32768 * n_tok) * 256) // (65536 * n_tok) AS pbucket
        |      FROM s),
        |h AS (SELECT pbucket, sum(n_tok) AS btoks FROM b GROUP BY pbucket),
        |c AS (SELECT pbucket,
        |        sum(btoks) OVER (ORDER BY pbucket DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |        sum(btoks) OVER () AS total
        |      FROM h)
        |SELECT b.doc_id, b.n_tok, b.pbucket,
        |  (c.cum * 1000 <= c.total * 250)::INT AS kept
        |FROM b JOIN c USING (pbucket)""".stripMargin,
    "q_text_winnow" ->
      """WITH g AS (
        |  SELECT doc_id, list_transform(range(1, len(l) - 2), i ->
        |    ('0x' || substr(md5(l[i]||' '||l[i+1]||' '||l[i+2]||' '||l[i+3]),
        |     1, 8))::BIGINT) AS hs
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
        |  WHERE len(l) >= 11),
        |f AS (
        |  SELECT doc_id, len(hs) - 7 AS n_win,
        |    list_distinct(list_transform(range(1, len(hs) - 6), j ->
        |      list_aggregate(hs[j:j+7], 'min'))) AS fps
        |  FROM g)
        |SELECT doc_id, n_win, len(fps) AS n_fp,
        |  list_aggregate(fps, 'min') AS fp_min,
        |  list_aggregate(fps, 'max') AS fp_max,
        |  list_sum(fps)::BIGINT AS fp_sum
        |FROM f""".stripMargin,
    "q_dsir_select" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    source,
        |    ('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024 AS b
        |  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)),
        |tot AS (
        |  SELECT count(*) AS ns,
        |    count(*) FILTER (WHERE source = 'src0') AS nt
        |  FROM toks),
        |cs AS (SELECT b, count(*) AS cs FROM toks GROUP BY b),
        |ct AS (SELECT b, count(*) AS ct FROM toks WHERE source = 'src0' GROUP BY b),
        |model AS (
        |  SELECT g.b,
        |    ln((coalesce(ct.ct, 0) + 0.01) / (tot.nt + 0.01 * 1024)) -
        |    ln((coalesce(cs.cs, 0) + 0.01) / (tot.ns + 0.01 * 1024)) AS w
        |  FROM generate_series(0, 1023) AS g(b)
        |  LEFT JOIN cs USING (b) LEFT JOIN ct USING (b), tot)
        |SELECT t.doc_id, count(*) AS n_tok, sum(m.w) AS logw,
        |  sum(m.w) > 0.000000001 AS keep
        |FROM toks t JOIN model m USING (b)
        |GROUP BY t.doc_id""".stripMargin,
    "q_pipeline_curate" ->
      """WITH gated AS (
        |  SELECT doc_id, text, source
        |  FROM (
        |    SELECT doc_id, text, source,
        |      len(string_split(text, ' ')) AS n_tok0,
        |      list_sum(list_transform(string_split(text, ' '), x -> length(x)))::DOUBLE
        |        / len(string_split(text, ' ')) AS awl,
        |      len(list_filter(string_split(text, ' '),
        |          x -> regexp_matches(x, '[a-zA-Z]')))::DOUBLE
        |        / len(string_split(text, ' ')) AS alpha_ratio,
        |      len(list_filter(string_split(text, ' '),
        |          x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS stop_hits
        |    FROM documents)
        |  WHERE n_tok0 >= 30 AND awl >= 3.0 AND awl <= 10.0
        |    AND alpha_ratio >= 0.9 AND stop_hits >= 1),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM gated),
        |grams AS (
        |  SELECT doc_id, i AS p,
        |    ('0x' || substr(md5(array_to_string(tk[(i+1):(i+16)], ' ')), 1, 15))::BIGINT AS gh
        |  FROM toks, unnest(generate_series(0, len(tk) - 16)) AS t(i)
        |  WHERE len(tk) >= 16),
        |dup AS (
        |  SELECT doc_id, p, row_number() OVER (PARTITION BY gh ORDER BY doc_id, p) AS rn
        |  FROM grams),
        |rem AS (
        |  SELECT DISTINCT d.doc_id, u.rp
        |  FROM dup d, unnest(generate_series(d.p, d.p + 15)) AS u(rp)
        |  WHERE d.rn > 1),
        |ragg AS (SELECT doc_id, count(*) AS n_removed FROM rem GROUP BY doc_id),
        |red AS (
        |  SELECT t.doc_id, len(t.tk) AS n_tok, coalesce(r.n_removed, 0) AS n_removed
        |  FROM toks t LEFT JOIN ragg r USING (doc_id)),
        |pos AS (
        |  SELECT t.doc_id, u.i, t.tk[u.i] AS tok
        |  FROM toks t, unnest(generate_series(1, len(t.tk))) AS u(i)),
        |keptt AS (
        |  SELECT p.doc_id, string_agg(p.tok, ' ' ORDER BY p.i) AS txt
        |  FROM pos p LEFT JOIN rem ON rem.doc_id = p.doc_id AND rem.rp = p.i - 1
        |  WHERE rem.rp IS NULL GROUP BY p.doc_id),
        |dsdocs AS (
        |  SELECT r.doc_id, coalesce(k.txt, '') AS text, g.source
        |  FROM red r LEFT JOIN keptt k USING (doc_id) JOIN gated g USING (doc_id)),
        |dtoks AS (
        |  SELECT doc_id, source, ('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024 AS b
        |  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok FROM dsdocs)),
        |tot AS (
        |  SELECT count(*) AS ns, count(*) FILTER (WHERE source = 'src0') AS nt FROM dtoks),
        |csx AS (SELECT b, count(*) AS cs FROM dtoks GROUP BY b),
        |ctx AS (SELECT b, count(*) AS ct FROM dtoks WHERE source = 'src0' GROUP BY b),
        |model AS (
        |  SELECT g.b,
        |    ln((coalesce(ctx.ct, 0) + 0.01) / (tot.nt + 0.01 * 1024)) -
        |    ln((coalesce(csx.cs, 0) + 0.01) / (tot.ns + 0.01 * 1024)) AS w
        |  FROM generate_series(0, 1023) AS g(b)
        |  LEFT JOIN csx USING (b) LEFT JOIN ctx USING (b), tot),
        |sc AS (
        |  SELECT t.doc_id, sum(m.w) AS logw
        |  FROM dtoks t JOIN model m USING (b) GROUP BY t.doc_id),
        |keepers AS (SELECT doc_id FROM sc WHERE logw > 0.000000001)
        |SELECT 'raw' AS stage, count(*) AS n_docs,
        |  sum(len(string_split(text, ' ')))::BIGINT AS n_tokens FROM documents
        |UNION ALL
        |SELECT 'quality', count(*), sum(len(string_split(text, ' ')))::BIGINT FROM gated
        |UNION ALL
        |SELECT 'substring_dedup', count(*), sum(n_tok - n_removed)::BIGINT FROM red
        |UNION ALL
        |SELECT 'dsir', count(*), sum(n_tok - n_removed)::BIGINT
        |FROM red JOIN keepers USING (doc_id)""".stripMargin)
}
