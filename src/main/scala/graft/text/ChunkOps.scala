package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Context-window preparation operators: overlapping chunking (the
  * RAG / long-document training splitter), hashed bag-of-words
  * linear classification (the fastText serving shape), and BPE merge
  * induction. All three are the map-heavy shapes a 100 TB corpus
  * needs: chunking is a pure per-row explode, classification is a
  * broadcast join against a model table, and BPE learning runs its
  * iterations over the VOCABULARY table (corpus-sized work happens
  * exactly once, in the word-count shuffle).
  */
object ChunkOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Overlapping fixed-size chunker: emit a chunk every `stride`
    * tokens, `chunkTok` tokens long (final chunks may be shorter).
    * Deterministic, stateless, map-only — the whole operator lives in
    * the scan's projection, so it runs at scan speed on any corpus
    * and unchanged on a stream (no state, no shuffle; spec-asserted
    * batch == stream over [[chunkCore]]).
    */
  def chunkOverlap(s: SparkSession, dir: String,
      chunkTok: Int = 64, stride: Int = 48): DataFrame =
    chunkCore(t(s, dir, "documents"), chunkTok, stride)

  /** Stateless core, shared by the batch query and the streaming twin. */
  def chunkCore(docs: DataFrame, chunkTok: Int = 64, stride: Int = 48): DataFrame =
    docs
      .withColumn("tk", split(col("text"), " "))
      .select(col("doc_id"), col("tk"),
        posexplode(expr(s"sequence(0, size(tk) - 1, $stride)")))
      .withColumnRenamed("pos", "chunk_idx").withColumnRenamed("col", "start_tok")
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        least(lit(chunkTok), size(col("tk")) - col("start_tok")).as("n_tok_chunk"),
        concat_ws(" ", expr(s"slice(tk, start_tok + 1, $chunkTok)")).as("chunk_text"))

  /** Hashed bag-of-words linear classifier — fastText's serving path
    * (Joulin et al. 2016): token -> md5 hash -> one of B weight
    * buckets, document score = sigmoid(mean bucket weight). The model
    * is a B-row WEIGHT TABLE broadcast to every executor, so scoring
    * any corpus is one explode + broadcast hash join + one doc-keyed
    * aggregate — no shuffle wider than (doc_id, partial sums). The
    * weights here are derived deterministically from the bucket id
    * (md5-seeded pseudo-model) so the oracle re-derives them; a real
    * deployment swaps in a trained table, same plan. The decision
    * threshold is 1e-9, not 0: weights are rationals with denominator
    * 2*65535, so a true-zero score can only be EXACT cancellation —
    * both engines then land within float noise of 0 and agree on the
    * label; any true-nonzero score is >= 1/131070, far above it.
    */
  def classifierHashed(s: SparkSession, dir: String, buckets: Int = 256): DataFrame =
    classifierCore(t(s, dir, "documents"), weightTable(s, buckets), buckets)

  /** The md5-seeded pseudo-model — a real deployment swaps in a
    * trained table of the same (bucket, wt) shape.
    */
  def weightTable(s: SparkSession, buckets: Int = 256): DataFrame =
    s.range(buckets.toLong).select(
      col("id").cast("int").as("bucket"),
      (conv(substring(md5(concat(lit("w:"), col("id").cast("string")).cast("binary")),
        1, 4), 16, 10).cast("double") / 65535.0 - 0.5).as("wt"))

  /** Stateless scoring core over any (doc_id, text) frame against a
    * STATIC weight table — runs unchanged on a stream (the model is a
    * snapshot, arriving docs broadcast-join it; Round10OpsSpec asserts
    * batch == stream).
    */
  def classifierCore(docs: DataFrame, weights: DataFrame, buckets: Int = 256): DataFrame = {
    val feats = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("bucket",
        pmod(conv(substring(md5(col("tok").cast("binary")), 1, 8), 16, 10).cast("bigint"),
          lit(buckets)).cast("int"))
    feats.join(broadcast(weights), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("wt")).as("raw"))
      .select(col("doc_id"), col("n_tok"),
        (lit(1.0) / (lit(1.0) + exp(-col("raw") / col("n_tok")))).as("prob"),
        (col("raw") > 1e-9).as("label"))
  }

  /** First-fit-decreasing sequence packing with a BOUNDED open-bin
    * buffer — the padding-minimizing packer (vs
    * [[TextQueries.packSequences]]' sequential chunker, which splits
    * docs across boundaries; this one keeps every doc whole and
    * minimizes pad tokens). Per shard, docs arrive longest-first and
    * first-fit into 512-token bins; at most `openBins` bins stay
    * open — when the buffer is full the tightest (least-remaining)
    * bin closes, which is what makes the state O(openBins) however
    * large the shard is (the streaming-packer trick; unbounded FFD
    * state grows with the shard). Deterministic: the shard hash, the
    * (n_tok desc, doc_id) order and first-fit are all
    * order-functions of the input — mapPartitions here is genuinely
    * imperative per-partition logic, the documented last-resort case.
    * Each partition holds whole shards (repartition by shard,
    * sort-within by (shard, len desc, id)); docs longer than the cap
    * are clamped (this corpus tops out far below 512 — a real corpus
    * runs [[chunkOverlap]] first). That end-to-end determinism is
    * what makes the oracle possible: DuckDB replays the identical
    * fold as a recursive CTE (see the `q_pack_bestfit` oracle).
    */
  def packBestFit(s: SparkSession, dir: String,
      cap: Int = 512, nShards: Int = 8, openBins: Int = 16): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
      .select(col("doc_id"),
        least(size(split(col("text"), " ")), lit(cap)).as("n_tok"))
      .withColumn("shard",
        pmod(conv(substring(md5(concat(lit("shard:"), col("doc_id").cast("string"))
          .cast("binary")), 1, 4), 16, 10).cast("int"), lit(nShards)))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("n_tok").desc, col("doc_id"))
      .select(col("doc_id"), col("n_tok"), col("shard"))
      .as[(Long, Int, Int)]
    docs.mapPartitions { it =>
      var shard = -1
      var nextBin = 0
      // open bins: (binId, usedTokens), insertion-ordered for first-fit
      var bins = Vector.empty[(Int, Int)]
      it.map { case (docId, nTok, sh) =>
        if (sh != shard) { shard = sh; nextBin = 0; bins = Vector.empty }
        val fit = bins.indexWhere { case (_, used) => used + nTok <= cap }
        val (binId, offset) =
          if (fit >= 0) {
            val (b, used) = bins(fit)
            bins = bins.updated(fit, (b, used + nTok))
            (b, used)
          } else {
            if (bins.size >= openBins) {
              // close the tightest bin — least remaining capacity
              val evict = bins.zipWithIndex.minBy { case ((_, used), i) => (cap - used, i) }._2
              bins = bins.patch(evict, Nil, 1)
            }
            val b = nextBin
            nextBin += 1
            bins = bins :+ ((b, nTok))
            (b, 0)
          }
        (docId, sh, binId, offset, nTok)
      }
    }.toDF("doc_id", "shard", "bin", "offset", "n_tok")
  }

  /** Adjacent-token pair frequencies — the selection statistic of a
    * BPE merge step, ranked. One explode + one count shuffle whose
    * keys are DISTINCT pairs (map-side partial agg collapses the
    * corpus before the exchange); ties broken lexicographically so
    * the top-k is engine-exact.
    */
  def bpePairs(s: SparkSession, dir: String, k: Int = 20): DataFrame =
    t(s, dir, "documents")
      .withColumn("tk", split(col("text"), " "))
      .filter(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(tk) - 2), i -> concat(tk[i], ' ', tk[i + 1]))"))
        .as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc("pair"))
      .limit(k)

  /** Character-level BPE merge induction (Sennrich et al. 2016) as
    * dataflow. The corpus collapses ONCE into a (word, freq) vocab
    * table (one shuffle — the only corpus-sized step at any scale);
    * each of the `nMerges` iterations then runs entirely over that
    * BOUNDED vocab: count adjacent symbol pairs weighted by word
    * freq, pick the argmax (ties broken lexicographically so the
    * merge sequence is deterministic), and splice the winning pair
    * into every word's symbol array with a left-to-right
    * non-overlapping fold (a merged symbol can never equal the merge
    * left `l` — `r` is nonempty — so the fold cannot cascade past
    * the sequential-scan semantics). Returns (rank, lhs, rhs, freq)
    * — the learned merge table in order. Spec-verified against a
    * hand-computed fixture (ChunkOpsSpec) AND oracle-checked: DuckDB
    * unrolls the same per-round argmax+splice over the vocab (the
    * graph-oracle discipline) and emits the merge table itself — see
    * [[bpeRoundsSql]] / [[bpeMergesOracle]]; the learn-then-encode
    * composition is separately oracle-checked via [[bpeEncodeOracle]].
    */
  /** Left-to-right non-overlapping merge of the pair (l, r) in the
    * `sym` array, as one SQL fold — shared by learn and encode.
    */
  /** The splice fold as a Column — exposed for the r17 tokenizer A/B
    * probe ([[graft.tools.BpeProbe]]) so it times the real expression.
    */
  private[graft] def spliceExpr(l: String, r: String): org.apache.spark.sql.Column =
    expr(spliceSql(l, r))

  /** Greedy left-to-right non-overlapping application of the whole
    * merge table to one word — the imperative twin of [[spliceSql]]
    * (one pass per merge, identical fold semantics; splitting is by
    * code point, matching Spark's `split(w, '')`). The r17 A/B
    * (tools/BpeProbe, sf0.1) measured this init-once tokenizer 1.2×
    * faster than the 8 chained interpreted `aggregate` HOFs on the
    * encode sub-plan, with 0 disagreements corpus-wide; the
    * codegen-surface tradeoff is nil because the HOF folds were
    * already interpreted, and the UDF runs only on the DISTINCT-word
    * vocab, never the corpus stream. ChunkOpsSpec pins fold ≡ udf on
    * adversarial fixtures (adjacent merges, cascades, non-ASCII).
    */
  private[graft] def applyMerges(w: String, merges: Seq[(String, String)]): Array[String] = {
    var syms = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        val n = Character.charCount(cp)
        out += w.substring(i, i + n)
        i += n
      }
      out.toArray
    }
    merges.foreach { case (l, r) =>
      if (syms.length >= 2) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (out.nonEmpty && out.last == l && syms(i) == r)
            out(out.length - 1) = l + r
          else out += syms(i)
          i += 1
        }
        syms = out.toArray
      }
    }
    syms
  }

  private def spliceSql(l: String, r: String): String = {
    def sqlLit(v: String) =
      "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    val (lS, rS) = (sqlLit(l), sqlLit(r))
    s"""aggregate(sym, cast(array() as array<string>),
       |  (acc, x) -> CASE
       |    WHEN size(acc) = 0 THEN array(x)
       |    WHEN element_at(acc, -1) = $lS AND x = $rS
       |      THEN concat(slice(acc, 1, size(acc) - 1), array(concat($lS, $rS)))
       |    ELSE concat(acc, array(x)) END)""".stripMargin
  }

  /** BPE ENCODE — apply a learned merge table to a corpus. The
    * at-scale trick: tokenization happens on the DISTINCT-word vocab
    * (each merge is one more nested map-only fold in the SAME
    * projection — no iterations, no shuffles at encode time), and the
    * (word, n_sym) result broadcasts back onto the corpus token
    * stream. A 100 TB corpus pays one explode + broadcast join + one
    * doc-keyed aggregate, exactly the classifierHashed economics —
    * the merge loop never touches corpus-sized data.
    */
  def bpeEncode(s: SparkSession, docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val vocab0 = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct()
    // init-once Scala tokenizer over the DISTINCT-word vocab (r17;
    // see [[applyMerges]] — measured 1.2× vs the chained interpreted
    // folds, identical output). The merge table (≤ nMerges tiny
    // pairs) ships in the task closure.
    val tokUdf = udf((w: String) => applyMerges(w, merges).length)
    val wordSyms = vocab0.select(col("w"), tokUdf(col("w")).as("n_sym"))
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .join(broadcast(wordSyms), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_bpe_tokens"))
  }

  def bpeLearn(s: SparkSession, docs: DataFrame, nMerges: Int = 8): DataFrame = {
    import scala.collection.mutable.ArrayBuffer
    var vocab = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(expr("filter(split(w, ''), x -> x <> '')").as("sym"), col("freq"))
      .persist()
    // materialize: iterations start from the cached vocab; the count
    // also sizes the merge loop's parallelism (r17, guide §2.2 — the
    // same input-derived clamp as the graph loops): each round is one
    // pair-count aggregate + an argmax over the BOUNDED vocab, and a
    // ~30k-word vocab scheduled across a 32-partition session pays
    // (rounds × ops × empty tasks) of pure floor. ~64k vocab rows per
    // partition; at a corpus whose vocab exceeds that the clamp is a
    // no-op by construction.
    val nVocab = vocab.count()
    val confKey = "spark.sql.shuffle.partitions"
    val sessionParts = s.conf.get(confKey)
    val parts = math.max(1L, math.min(sessionParts.toLong, nVocab / 65536L + 1L))
    s.conf.set(confKey, parts.toString)
    try {
      val merges = ArrayBuffer[(Int, String, String, Long)]()
      var done = false
      for (r <- 1 to nMerges if !done) {
        // 1-row scalar argmax over the bounded vocab — not a data collect
        val best = vocab
          .filter(size(col("sym")) >= 2)
          .select(col("freq"), explode(expr(
            "transform(sequence(0, size(sym) - 2), i -> struct(sym[i] AS l, sym[i + 1] AS r))"))
            .as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("freq")).as("pf"))
          .orderBy(desc("pf"), asc("l"), asc("r"))
          .limit(1).collect()
        if (best.isEmpty) done = true
        else {
          val (l, rr, pf) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
          merges += ((r, l, rr, pf))
          val merged = vocab
            .withColumn("sym", expr(spliceSql(l, rr)))
            .persist()
          merged.count() // pin this round; then drop the previous lineage
          vocab.unpersist()
          vocab = merged
        }
      }
      vocab.unpersist()
      import s.implicits._
      merges.toSeq.toDF("rank", "lhs", "rhs", "freq")
    } finally s.conf.set(confKey, sessionParts)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_chunk_overlap" -> ((s: SparkSession, d: String) => chunkOverlap(s, d)),
    "q_classifier_hashed" -> ((s: SparkSession, d: String) => classifierHashed(s, d)),
    "q_bpe_pairs" -> ((s: SparkSession, d: String) => bpePairs(s, d)),
    "q_bpe_merges" -> ((s: SparkSession, d: String) =>
      bpeLearn(s, Tables.load(s, d, "documents"))),
    "q_pack_bestfit" -> ((s: SparkSession, d: String) => packBestFit(s, d)),
    "q_bpe_encode" -> ((s: SparkSession, d: String) => {
      val docs = Tables.load(s, d, "documents")
      // learn-then-encode composition; the merge table is the bounded
      // iterate-broadcast every tokenizer deployment ships
      val merges = bpeLearn(s, docs).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      bpeEncode(s, docs, merges)
    }))

  /** Shared WITH-clause body for the DuckDB BPE oracles: the learn
    * loop unrolled `nMerges` rounds (the graph-oracle discipline),
    * ending at vocab v`nMerges` with per-round argmax rows b1..bN.
    * The splice fold is re-expressed as a
    * left-to-right non-overlapping string replace over a delimited
    * symbol encoding: a word's symbols render as
    * `' ' || join(sym, '  ') || ' '` (single-space sentinels, double-
    * space boundaries — symbols cannot contain spaces because words
    * come from a space split), and one merge round is
    * `replace(s, ' l  r ', ' lr ')`. SQL replace scans left to right
    * and never rescans its own output, which is exactly the fold's
    * greedy non-overlapping semantics (adjacent matches work because
    * each match consumes only ONE space of the two-space boundary);
    * the delimiters make partial-symbol matches impossible (l must
    * follow a space and precede a double space — a symbol's interior
    * has neither). Each round re-derives the weighted pair argmax
    * from the CURRENT vocab with the same (freq desc, l, r) tie rule,
    * so the oracle learns the merge table itself — no frozen
    * constants to drift when the corpus changes.
    */
  private def bpeRoundsSql(nMerges: Int): String = {
    val rounds = (1 to nMerges).map { i =>
      s"""p$i AS (
         |  SELECT tk[j + 1] AS l, tk[j + 2] AS r, sum(freq) AS pf
         |  FROM (SELECT freq,
         |          string_split(substr(s, 2, length(s) - 2), '  ') AS tk
         |        FROM v${i - 1}),
         |       unnest(generate_series(0, len(tk) - 2)) AS t(j)
         |  WHERE len(tk) >= 2
         |  GROUP BY 1, 2),
         |b$i AS (SELECT l, r, pf FROM p$i ORDER BY pf DESC, l ASC, r ASC LIMIT 1),
         |v$i AS (
         |  SELECT w, freq,
         |    replace(s, ' ' || b.l || '  ' || b.r || ' ',
         |               ' ' || b.l || b.r || ' ') AS s
         |  FROM v${i - 1}, b$i b)""".stripMargin
    }.mkString(",\n")
    s"""words AS (
       |  SELECT w, count(*) AS freq FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) > 0 GROUP BY w),
       |v0 AS (
       |  SELECT w, freq,
       |    ' ' || array_to_string(
       |      list_transform(range(1, length(w) + 1), i -> substr(w, i, 1)),
       |      '  ') || ' ' AS s
       |  FROM words),
       |$rounds""".stripMargin
  }

  /** DuckDB twin of the merge-table LEARN itself: each unrolled round's
    * 1-row argmax (b1..bN) IS a merge-table row — union them with their
    * rank. Same per-round re-derivation as the encode oracle, so there
    * are no frozen constants to drift when the corpus changes.
    */
  private def bpeMergesOracle(nMerges: Int): String = {
    val rows = (1 to nMerges).map { i =>
      s"SELECT $i::INT AS rank, l AS lhs, r AS rhs, pf::BIGINT AS freq FROM b$i"
    }.mkString("\nUNION ALL ")
    s"""WITH ${bpeRoundsSql(nMerges)}
       |$rows""".stripMargin
  }

  private def bpeEncodeOracle(nMerges: Int): String = {
    s"""WITH ${bpeRoundsSql(nMerges)},
       |enc AS (
       |  SELECT w,
       |    len(string_split(substr(s, 2, length(s) - 2), '  ')) AS n_sym
       |  FROM v$nMerges),
       |stream AS (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) > 0)
       |SELECT doc_id, count(*) AS n_words,
       |  sum(n_sym)::BIGINT AS n_bpe_tokens
       |FROM stream JOIN enc USING (w)
       |GROUP BY doc_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_bpe_encode" -> bpeEncodeOracle(8),
    "q_bpe_merges" -> bpeMergesOracle(8),
    // FFD replay as a recursive CTE: the packer is deterministic given
    // (shard hash, n_tok-desc/doc_id order, cap, openBins), so DuckDB
    // re-runs it one doc per recursion step per shard — bins carried
    // as a STRUCT(b, used)[] state list; first-fit = first index with
    // room, eviction = tightest-remaining (lowest index on ties),
    // exactly the mapPartitions fold. Upgraded rows-only → checked in
    // round 12, the same unroll discipline that upgraded the BPE pair.
    "q_pack_bestfit" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id,
        |    least(len(string_split(text, ' ')), 512)::INT AS n_tok,
        |    ('0x' || substr(md5('shard:' || doc_id::VARCHAR), 1, 4))::INT % 8 AS shard
        |  FROM documents),
        |ordered AS (
        |  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY n_tok DESC, doc_id)::INT AS rn
        |  FROM docs),
        |rec AS (
        |  SELECT shard, 0::INT AS rn,
        |    CAST([] AS STRUCT(b INTEGER, used INTEGER)[]) AS bins,
        |    0::INT AS next_bin,
        |    NULL::BIGINT AS doc_id, NULL::INT AS bin, NULL::INT AS off, NULL::INT AS n_tok
        |  FROM (SELECT DISTINCT shard FROM docs)
        |  UNION ALL
        |  SELECT r.shard, o.rn,
        |    CASE WHEN s1.fit > 0
        |      THEN list_transform(range(1, len(r.bins) + 1),
        |        i -> CASE WHEN i = s1.fit
        |          THEN {'b': r.bins[i].b, 'used': r.bins[i].used + o.n_tok}
        |          ELSE r.bins[i] END)
        |      ELSE list_append(s2.kept, {'b': r.next_bin, 'used': o.n_tok}) END,
        |    (CASE WHEN s1.fit > 0 THEN r.next_bin ELSE r.next_bin + 1 END)::INT,
        |    o.doc_id,
        |    (CASE WHEN s1.fit > 0 THEN r.bins[s1.fit].b ELSE r.next_bin END)::INT,
        |    (CASE WHEN s1.fit > 0 THEN r.bins[s1.fit].used ELSE 0 END)::INT,
        |    o.n_tok
        |  FROM rec r
        |  JOIN ordered o ON o.shard = r.shard AND o.rn = r.rn + 1,
        |  LATERAL (SELECT coalesce(list_filter(range(1, len(r.bins) + 1),
        |      i -> r.bins[i].used + o.n_tok <= 512)[1], 0)::INT AS fit) s1,
        |  LATERAL (SELECT CASE
        |      WHEN s1.fit > 0 OR len(r.bins) < 16 THEN r.bins
        |      ELSE list_transform(
        |        list_filter(range(1, len(r.bins) + 1),
        |          i -> i <> list_filter(range(1, len(r.bins) + 1),
        |                 j -> 512 - r.bins[j].used =
        |                      list_min(list_transform(r.bins, x -> 512 - x.used)))[1]),
        |        i -> r.bins[i]) END AS kept) s2
        |)
        |SELECT doc_id, shard, bin, off AS "offset", n_tok FROM rec WHERE rn > 0""".stripMargin,
    "q_chunk_overlap" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
        |SELECT doc_id,
        |  (u.s // 48)::INT AS chunk_idx,
        |  u.s::INT AS start_tok,
        |  least(64, len(tk) - u.s)::INT AS n_tok_chunk,
        |  array_to_string(tk[(u.s + 1):(u.s + 64)], ' ') AS chunk_text
        |FROM toks, unnest(generate_series(0, len(tk) - 1, 48)) AS u(s)""".stripMargin,
    "q_classifier_hashed" ->
      """WITH feats AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(tok), 1, 8))::BIGINT % 256 AS bucket
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
        |scored AS (
        |  SELECT doc_id, count(*) AS n_tok,
        |    sum(('0x' || substr(md5('w:' || bucket::VARCHAR), 1, 4))::BIGINT / 65535.0 - 0.5)
        |      AS raw
        |  FROM feats GROUP BY doc_id)
        |SELECT doc_id, n_tok,
        |  1.0 / (1.0 + exp(-raw / n_tok)) AS prob,
        |  raw > 0.000000001 AS label
        |FROM scored""".stripMargin,
    "q_bpe_pairs" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS tk FROM documents),
        |pairs AS (
        |  SELECT tk[i + 1] || ' ' || tk[i + 2] AS pair
        |  FROM toks, unnest(generate_series(0, len(tk) - 2)) AS t(i)
        |  WHERE len(tk) >= 2)
        |SELECT pair, count(*) AS freq
        |FROM pairs GROUP BY pair
        |ORDER BY freq DESC, pair ASC
        |LIMIT 20""".stripMargin)
}
