package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{FlinkFunctions => F}

/** Training-data-pipeline text operators over the `documents` table
  * (north-star ops beyond the reference's own surface): quality
  * scoring, language ID, token counting, fingerprinting and
  * deduplication. Everything is a projection or a single-shuffle
  * aggregate — the shapes that scale linearly to 100 TB of text.
  */
object TextQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val stopwords = Seq("the", "a", "of", "and", "to")

  /** Per-document quality statistics: length, token counts, mean
    * token length, stopword ratio, punctuation ratio.
    */
  def textStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        length(col("text")).as("n_char"),
        size(col("toks")).as("n_tok"),
        size(array_distinct(col("toks"))).as("nd_tok"),
        (aggregate(col("toks"), lit(0), (acc, x) => acc + length(x)).cast("double")
          / size(col("toks"))).as("avg_tok_len"),
        (size(filter(col("toks"), x => x.isin(stopwords.map(lit): _*).cast("boolean")))
          .cast("double") / size(col("toks"))).as("stop_ratio"),
        (size(regexp_extract_all(col("text"), lit("[.,!?]"), lit(0))).cast("double")
          / length(col("text"))).as("punct_ratio"))

  /** Gopher-style quality filter (Rae et al. 2021 §A1.1 — the
    * published repetition/format rules, the standard pre-training
    * quality gate): per-document rule flags + the composite keep
    * decision, each rule a codegen'd column expression so the filter
    * is one map-only pass at any corpus size. Thresholds are the
    * paper's where the synthetic corpus exercises them (min words,
    * mean word length 3-10, stopword presence, alphabetic-token
    * ratio).
    */
  def gopherQuality(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")))
      .withColumn("awl",
        aggregate(col("toks"), lit(0), (acc, x) => acc + length(x)).cast("double")
          / col("n_tok"))
      .withColumn("alpha_ratio",
        size(filter(col("toks"), x => x.rlike("[a-zA-Z]"))).cast("double")
          / col("n_tok"))
      .withColumn("stop_hits",
        size(filter(col("toks"), x => x.isin(stopwords.map(lit): _*).cast("boolean"))))
      .select(
        col("doc_id"), col("n_tok"), col("awl"), col("alpha_ratio"),
        col("stop_hits"),
        (col("n_tok") >= 30).cast("int").as("r_len"),
        (col("awl") >= 3.0 && col("awl") <= 10.0).cast("int").as("r_awl"),
        (col("alpha_ratio") >= 0.9).cast("int").as("r_alpha"),
        (col("stop_hits") >= 1).cast("int").as("r_stop"),
        (col("n_tok") >= 30 && col("awl") >= 3.0 && col("awl") <= 10.0 &&
          col("alpha_ratio") >= 0.9 && col("stop_hits") >= 1).cast("int").as("keep"))

  /** N-gram-profile language ID: score each language by marker-token
    * hits plus a CJK-codepoint check, pick the argmax
    * (deterministic tie-break by score order). On real corpora the
    * marker lists would be the usual top-k character n-grams per
    * language; the mechanism (score columns + greatest + chained
    * when) is the scalable part — one projection, no shuffle.
    */
  def langId(s: SparkSession, dir: String): DataFrame = {
    def hits(markers: Seq[String]) =
      size(filter(split(col("text"), " "),
        x => x.isin(markers.map(lit): _*).cast("boolean")))
    val enS = hits(Seq("the", "a", "of", "and"))
    val deS = hits(Seq("der", "und", "die", "das"))
    val frS = hits(Seq("le", "la", "et", "les"))
    val esS = hits(Seq("el", "los", "y", "que"))
    val zhS = size(regexp_extract_all(col("text"), lit("[\\u4e00-\\u9fff]"), lit(0)))
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        enS.as("s_en"), deS.as("s_de"), frS.as("s_fr"), esS.as("s_es"), zhS.as("s_zh"))
      .withColumn("best",
        greatest(col("s_en"), col("s_de"), col("s_fr"), col("s_es"), col("s_zh")))
      .withColumn("lang_guess",
        when(col("best") === 0, "und")
          .when(col("s_zh") === col("best"), "zh")
          .when(col("s_en") === col("best"), "en")
          .when(col("s_de") === col("best"), "de")
          .when(col("s_fr") === col("best"), "fr")
          .otherwise("es"))
      .drop("best")
  }

  /** Token counting: whitespace tokens and a BPE-ish regex
    * segmentation (letter runs / digit runs / single punctuation).
    */
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      size(split(col("text"), " ")).as("n_ws"),
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0))).as("n_bpe"))

  /** PII redaction — the scrub pass every LLM training pipeline runs
    * before tokenization: emails, international-ish phone numbers and
    * IPv4 addresses replace with typed placeholder tags; the counts
    * per category ride along for corpus auditing. Pure projection
    * (regexp_replace + regexp_extract_all, codegen'd) — scales as a
    * map-only stage, no shuffle.
    */
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\+?[0-9][0-9()\\-\\s]{6,}[0-9]"
  private val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  def redactPii(s: SparkSession, dir: String): DataFrame = {
    // the synthetic corpus carries no PII, so seed deterministic
    // addresses from doc_id (mirrored verbatim in the oracle) — the
    // regexes must actually fire to be verified
    val seeded = t(s, dir, "documents").select(col("doc_id"),
      concat(col("text"), lit(" contact user"), col("doc_id"),
        lit("@example.com or +1 (555) 01"), col("doc_id") % 100,
        lit(" at 10.0."), col("doc_id") % 256, lit(".7")).as("text"))
    seeded.select(
      col("doc_id"),
      regexp_replace(regexp_replace(regexp_replace(col("text"),
        EmailRe, "<EMAIL>"), Ipv4Re, "<IP>"), PhoneRe, "<PHONE>")
        .as("redacted"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).as("n_email"),
      size(regexp_extract_all(col("text"), lit(Ipv4Re), lit(0))).as("n_ip"))
  }

  /** Document fingerprints: rolling-hash content fingerprint +
    * SimHash signature (native codegen'd expressions — see
    * graft.functions.Fingerprint64/SimHash64). No SQL oracle (DuckDB
    * cannot fold over bytes); exact values are spec-tested in
    * TextOpsSpec.
    */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      F.fingerprint64(col("text")).as("fp64"),
      F.simhash64(col("text")).as("sh64"))

  /** Exact deduplication: group identical texts by content hash, keep
    * the lowest doc_id as canonical (hash-groupBy — one shuffle on
    * the hash, the standard exact-dedup at any scale).
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dup"))

  /** SimHash near-dup candidate pairs via multi-band blocking: the
    * 64-bit signature splits into `bands` equal slices; a pair is a
    * candidate if ANY band matches exactly (union of `bands`
    * bucket-joins, computed as one join on (band, value)). Round 1
    * blocked on a single top byte, which misses ~3/4 of Hamming-16
    * pairs; with b bands of 64/b bits a distance-d pair collides
    * unless every band contains a differing bit — recall rises
    * steeply with b (spec-tested ≥ 0.9 at d ≤ 16 with 16 bands).
    * Shuffle volume is |docs|·bands longs; no all-pairs anywhere.
    * Candidate count grows with bucket density (|docs| / 2^width per
    * band) — at larger corpora hold density constant by widening
    * bands (fewer, wider bands: the classic recall/cost dial;
    * SCALE.md measures 8.8x time at 16x docs with width fixed).
    */
  def simhashPairs(docs: DataFrame, bands: Int, maxHamming: Int): DataFrame = {
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val sigs = docs
      .select(col("doc_id"), F.simhash64(col("text")).as("sig"))
      .select(col("doc_id"), col("sig"),
        explode(array((0 until bands).map(bd =>
          struct(lit(bd).as("band"),
            shiftrightunsigned(col("sig"), bd * width).bitwiseAND(lit(mask)).as("bval"))): _*)).as("e"))
      .select(col("doc_id"), col("sig"), col("e.band").as("band"), col("e.bval").as("bval"))
    val a = sigs.select(col("band"), col("bval"), col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val b = sigs.select(col("band"), col("bval"), col("doc_id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bval"))
      .filter(col("id_a") < col("id_b"))
      // a pair colliding in several bands is emitted ONLY by the first
      // band where the signatures agree — a codegen'd when-chain over
      // the XOR instead of a dropDuplicates shuffle (higher-order
      // array functions would fall out of whole-stage codegen here)
      .filter {
        val x = col("sig_a").bitwiseXOR(col("sig_b"))
        val firstEqualBand = (0 until bands).reverse
          .foldLeft(lit(-1): org.apache.spark.sql.Column) { (acc, bd) =>
            when(shiftrightunsigned(x, bd * width).bitwiseAND(lit(mask)) === 0, lit(bd))
              .otherwise(acc)
          }
        col("band") === firstEqualBand
      }
      .select(col("id_a"), col("id_b"),
        F.hamming64(col("sig_a"), col("sig_b")).as("hd"))
      .filter(col("hd") <= maxHamming)
  }

  /** Band count for a corpus of `nDocs`, holding the expected bucket
    * density (docs per band-value, nDocs / 2^width) at or below
    * `targetDensity`. Fixed-width bands go quadratic as the corpus
    * grows — SCALE.md measured 31x wall at 16x rows with 8x8-bit
    * held constant, 1.3x with width scaled — so the width must be a
    * function of corpus size: more docs → wider bands → fewer, but
    * still O(1)-dense, buckets. Narrowest admissible width wins
    * (more bands = higher recall; width 4 ≙ 16 bands down to
    * width 32 ≙ 2 bands). By pigeonhole, b bands guarantee recall
    * 1.0 for pairs at Hamming < b; beyond that recall decays — the
    * same dial Manku et al. (WWW'07) turn at web scale (64-bit
    * simhash, d ≤ 3, 4-6 way splits).
    */
  def adaptiveSimhashBands(nDocs: Long, targetDensity: Double = 1.0): Int = {
    val width = Seq(4, 8, 16, 32)
      .find(w => nDocs / math.pow(2.0, w) <= targetDensity)
      .getOrElse(32)
    64 / width
  }

  /** Driver query: width-adaptive multi-band blocking at Hamming ≤ 16
    * — 16-bit bands at the 500-doc test corpora (Manku et al.'s
    * production 4-way split), widening as the corpus grows so
    * candidate generation stays near-linear. Oracle-checked as of
    * round 10 (the oracle re-derives signatures and bands in SQL,
    * pinned to the adaptive rule's width at the gate corpus); recall
    * is spec-tested against brute force and the width dial is
    * spec-pinned in SimRecallSpec.
    *
    * Adaptive width needs only the order of magnitude of the corpus
    * size — at 100 TB pass `knownRows` from catalog stats (ANALYZE
    * TABLE rowCount) instead of paying a counting pass; the fallback
    * counts a single pruned id column (parquet metadata count, no
    * data scan). Same convention as
    * [[graft.sim.SimilarityQueries.nearDupPairs]].
    */
  def dedupSimhash(s: SparkSession, dir: String,
      knownRows: Option[Long] = None): DataFrame = {
    val docs = t(s, dir, "documents")
    val nDocs = knownRows.getOrElse(docs.select(col("doc_id")).count())
    simhashPairs(docs, bands = adaptiveSimhashBands(nDocs), maxHamming = 16)
  }

  /** Word-3-gram Jaccard similarity of adjacent doc_id pairs —
    * SQL-expressible slice of n-gram near-dup detection, exact
    * oracle in DuckDB.
    */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    // per-doc distinct computed map-side (array_distinct before the
    // explode) — the old explode-then-distinct paid a full shuffle of
    // the shingle stream before any of the three consumers below
    val sh = t(s, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        """transform(sequence(0, size(toks) - 3),
          |  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))""".stripMargin))).as("sh"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("x")
      .join(sh.withColumn("doc_id", col("doc_id") - 1).as("y"), Seq("doc_id", "sh"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_inter"))
    sizes.as("sa")
      .join(sizes.withColumn("doc_id", col("doc_id") - 1).as("sb"), Seq("doc_id"))
      .join(inter, Seq("doc_id"), "left")
      .select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"),
        (coalesce(col("n_inter"), lit(0L)).cast("double") /
          (col("sa.n_sh") + col("sb.n_sh") - coalesce(col("n_inter"), lit(0L))))
          .as("jaccard"))
  }

  /** MinHash+LSH near-dup detection with an exact-Jaccard VERIFY
    * stage — the full production pipeline: shingle → minhash → banded
    * LSH blocking → signature-estimate prefilter (all in
    * [[MinHashDedup]]) → exact word-3-gram Jaccard recomputed for the
    * surviving candidates only. The estimate stays internal; the
    * OUTPUT carries the verified exact Jaccard, which DuckDB can
    * brute-force over the same shingle sets — so the query is
    * hash-checkable against the oracle (the trick that made
    * q_dedup_cosine oracle-checkable: blocking recall at the planted
    * near-dup similarity ~0.99 is 1 - (1-j^r)^b ≈ 1 - 4e-12, i.e.
    * deterministic-in-practice on any corpus whose true dups sit far
    * above the threshold; MinHashSpec pins recall on planted pairs).
    *
    * Scale shape: the verify join explodes shingles ONLY for docs
    * that appear in some candidate pair (broadcast semi-join on the
    * candidate id set) — at 100 TB the exact recomputation touches
    * the ~duplicate slice of the corpus, not the corpus.
    */
  def dedupMinhash(s: SparkSession, dir: String,
      threshold: Double = 0.4): DataFrame = {
    val docs = t(s, dir, "documents")
    // The candidate set is referenced twice in the verify stage
    // (doc-id semi-join and pair semi-join); persisting the few
    // surviving pairs stops the whole minhash+LSH subtree from being
    // recomputed per reference — same convention as ivfAnn's cached
    // index.
    val cands = MinHashDedup.candidatePairs(
        docs, "doc_id", "text", k = 32, bands = 8, threshold = threshold)
      .select(col("id_a"), col("id_b"))
      .persist()
    verifyExactJaccard(docs, cands, threshold)
  }

  /** Exact word-3-gram Jaccard VERIFY stage, shared by every blocking
    * front-end ([[dedupMinhash]], [[dedupSimhashVerified]]): recompute
    * the true Jaccard for candidate pairs only and keep those at or
    * above `threshold`. Cost structure: the shingle sets materialize
    * ONLY for docs appearing in some candidate pair (broadcast
    * semi-join) and stay packed as one sorted array per doc — each
    * candidate pair then intersects its two arrays in a single
    * projection. Per-PAIR work, O(|sh_a| + |sh_b|). The first
    * formulation self-joined the exploded shingle stream and
    * semi-joined candidates afterwards, which mines every co-shingled
    * pair just to discard the non-candidates — on a corpus that is
    * mostly duplicates (every doc in some cluster, shingle df ~
    * cluster size) that intermediate is |shingles|·df² and measured
    * 232x wall at 16x rows on the replica probe; the array form is
    * 16x (output-bound: the true pair count itself grows ~df²/2 per
    * cluster). `cands` should be persisted by the caller when its
    * lineage is expensive (it is referenced twice).
    */
  def verifyExactJaccard(docs: DataFrame, cands: DataFrame,
      threshold: Double): DataFrame = {
    val pairs = cands.select(col("id_a"), col("id_b")).distinct()
    val candDocs = pairs
      .select(explode(array(col("id_a"), col("id_b"))).as("doc_id")).distinct()
    // distinct word-3-gram shingles as ONE array per candidate doc —
    // no explode, no shingle shuffle. Elements are 60-bit md5 hashes,
    // not strings: a pair's join payload is BOTH members' arrays, and
    // on clique-heavy corpora that amplification (cliqueSize ·
    // arraySize per doc) dominates shuffle volume — 8-byte longs beat
    // ~25-byte strings ~3x. The oracle intersects the SAME hashes, so
    // even a collision (P ≈ |a|·|b|/2^60 per pair) is shared
    // bit-for-bit across engines.
    val shArr = docs
      .join(broadcast(candDocs), Seq("doc_id"), "left_semi")
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), array_distinct(expr(
        """transform(sequence(0, size(toks) - 3),
          |  i -> cast(conv(substring(md5(cast(
          |    concat_ws(' ', toks[i], toks[i+1], toks[i+2]) as binary)),
          |    1, 15), 16, 10) as bigint))""".stripMargin)).as("shs"))
    pairs
      .join(shArr.select(col("doc_id").as("id_a"), col("shs").as("sh_a")), Seq("id_a"))
      .join(shArr.select(col("doc_id").as("id_b"), col("shs").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("n_inter"),
        size(col("sh_a")).as("n_a"), size(col("sh_b")).as("n_b"))
      .select(col("id_a"), col("id_b"),
        (col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash blocking + exact-Jaccard verify — the same
    * estimate→verify production pipeline as [[dedupMinhash]] with the
    * OTHER standard blocker in front (Manku et al. WWW'07: 64-bit
    * simhash, multi-band collision blocking). SimHash's regime is
    * NEAR-IDENTICAL duplicates: a ~0.98+-Jaccard pair differs in a
    * couple of tokens, its signatures in a handful of bits, and band
    * collision is effectively certain (b bands are pigeonhole-exact
    * below Hamming b) — whereas at moderate similarity (0.8-0.95)
    * token-level churn moves enough vote margins that Hamming can
    * exceed the band tolerance; minhash is the blocker for that band
    * of the dial. Hence the 0.98 default here vs minhash's 0.4 — and
    * within its regime the verified output is deterministic and
    * oracle-checkable with the same brute-force SQL, pinning that the
    * blocker reaches the full near-identical pair set on this corpus.
    * The rows-only q_dedup_simhash keeps reporting the raw candidate
    * pairs + Hamming distances (engine-specific, spec-evidenced).
    */
  def dedupSimhashVerified(s: SparkSession, dir: String,
      threshold: Double = 0.98): DataFrame = {
    val docs = t(s, dir, "documents")
    // 8 bands of 8 bits with the PIGEONHOLE-CONSISTENT Hamming cut:
    // every pair below Hamming 8 is guaranteed found (some band must
    // be clean) AND kept (hd <= 7 passes the cut) — the found-set and
    // the kept-set boundaries coincide, so the cut discards only
    // chance band collisions (hd ~ 32) without touching the
    // guarantee. A >=0.98-Jaccard pair differs by a token or two —
    // single-digit signature bits (SimRecallSpec measures every such
    // pair under Hamming 8 on this corpus) — inside the guarantee.
    // Precision is the verify stage's job; the cut exists so the
    // exact-Jaccard recount runs over ~true pairs, not the ~half
    // corpus that chance collisions would drag in.
    val cands = simhashPairs(docs, bands = 8, maxHamming = 7)
      .select(col("id_a"), col("id_b"))
      .persist()
    verifyExactJaccard(docs, cands, threshold)
  }

  /** Deterministic content-hash train/val/test split (80/10/10):
    * bucket = first md5 byte of "docId:text", so the assignment is
    * reproducible across runs, engines and re-shards — the property
    * a training pipeline needs so a doc never migrates between train
    * and eval when the corpus is re-partitioned. One map-only pass;
    * md5 and the hex cast exist verbatim in DuckDB, so the oracle
    * recomputes the exact same buckets.
    */
  def hashSplit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("bucket",
        conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"), col("text"))
          .cast("binary")), 1, 2), 16, 10).cast("int"))
      .select(col("doc_id"), col("bucket"),
        when(col("bucket") < 204, "train")
          .when(col("bucket") < 230, "val")
          .otherwise("test").as("split"))

  /** Paragraph-level exact dedup (the RefinedWeb/Gopher
    * intra-corpus boilerplate cut): duplicate PASSAGES are removed
    * corpus-wide even when their containing documents differ —
    * headers, footers, licence blocks, navigation chrome. "Paragraph"
    * here is a fixed 16-token chunk (this synthetic corpus has no
    * newlines; a real corpus swaps in split-on-newline — the chunker
    * is the only substitution point). Keep-first rule: a chunk
    * survives only at its minimal (doc_id, idx) occurrence, so the
    * result is deterministic and engine-reproducible.
    *
    * Plan shape: chunk explode (map-side), keep-first as rank=1 over
    * (chunk) — WindowGroupLimit prunes to one row per chunk per map
    * task BEFORE the exchange — then one groupBy(doc) reassembles
    * surviving chunks in order. Two shuffles of the chunk stream
    * total; no corpus-wide sort anywhere.
    */
  def dedupParagraphs(s: SparkSession, dir: String, chunkTokens: Int = 16): DataFrame = {
    val chunks = t(s, dir, "documents")
      .withColumn("tk", split(col("text"), " "))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, (size(tk) - 1) div $chunkTokens),
           |  i -> concat_ws(' ', slice(tk, i * $chunkTokens + 1, $chunkTokens)))"""
          .stripMargin)))
      .withColumnRenamed("pos", "idx").withColumnRenamed("col", "chunk")
      .filter(col("chunk") =!= "")
    val w = Window.partitionBy(col("chunk")).orderBy(col("doc_id"), col("idx"))
    val kept = chunks
      .withColumn("rn", row_number().over(w))
      .withColumn("keep", (col("rn") === 1).cast("int"))
    kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("keep")).as("n_kept"),
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(CASE WHEN keep = 1 THEN struct(idx, chunk) END)), x -> x.chunk)"))
          .as("kept_text"))
  }

  /** Deterministic training-shard assignment — the WRITE side of a
    * pretraining pipeline: every doc gets a (shard, pos) slot where
    * shard = md5 bucket mod nShards and pos = rank of the doc's md5
    * key within its shard. The md5 ordering IS the global shuffle
    * (pseudo-random, engine- and rerun-reproducible — rand() gives
    * neither), realized with NO corpus-wide sort: the window is
    * PARTITIONED by shard, so each shard sorts its own 1/nShards
    * slice — at 100 TB that is the per-output-file sort every
    * sharded writer already pays, and shard count scales with the
    * cluster. A doc's slot never changes when the corpus is
    * re-partitioned (the reshard-stability property [[hashSplit]]
    * gives the train/eval split, extended to the full training
    * order).
    */
  def shardAssign(s: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val keyed = t(s, dir, "documents")
      .withColumn("k", md5(concat(lit("shard:"), col("doc_id").cast("string"))))
      .withColumn("shard",
        pmod(conv(substring(col("k"), 1, 4), 16, 10).cast("int"), lit(nShards)))
    keyed
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("k"), col("doc_id"))))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** Sequence packing: concatenate each shard's docs in doc_id order
    * and chunk the token stream into fixed 512-token training
    * sequences, reporting where every doc lands (start sequence +
    * offset, end sequence — docs may straddle a boundary, exactly
    * like pretraining packers that reset attention masks instead of
    * padding). The window is PARTITIONED BY source, so there is no
    * global sort — each shard packs independently and in parallel,
    * which is how a 100 TB corpus has to pack anyway (global document
    * order is meaningless across shards).
    */
  def packSequences(s: SparkSession, dir: String): DataFrame = {
    val cap = 512
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t(s, dir, "documents")
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .withColumn("cum", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tok"),
        (col("cum") / cap).cast("long").as("start_seq"),
        (col("cum") % cap).as("start_off"),
        ((col("cum") + col("n_tok") - 1) / cap).cast("long").as("end_seq"))
  }

  /** Repetition scoring — the other half of the Gopher quality rules
    * (Rae et al. 2021 §A1.1: "fraction of characters in the most
    * common n-gram" / "in duplicate n-grams", token-count variant
    * here): per doc, the share of 2-gram occurrences taken by the
    * most frequent 2-gram and the share of 3-gram occurrences whose
    * gram repeats. Two explode→count aggregates joined on doc_id;
    * shuffle volume is the shingle stream, same linear shape as the
    * dedup shinglers.
    */
  def repetition(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents")
      .withColumn("l", split(col("text"), " "))
      .filter(size(col("l")) >= 3)
    def grams(n: Int) = base.select(col("doc_id"), explode(expr(
      s"""transform(sequence(0, size(l) - $n),
         |  i -> concat_ws(' ', ${(0 until n).map(j => s"l[i+$j]").mkString(", ")}))"""
        .stripMargin)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
    val a2 = grams(2).groupBy(col("doc_id")).agg(
      (max(col("c")).cast("double") / sum(col("c"))).as("top2_frac"),
      sum(col("c")).as("n2"))
    val a3 = grams(3).groupBy(col("doc_id")).agg(
      (coalesce(sum(when(col("c") > 1, col("c"))), lit(0L)).cast("double")
        / sum(col("c"))).as("dup3_frac"),
      sum(col("c")).as("n3"))
    a2.join(a3, Seq("doc_id"))
      .select(col("doc_id"), col("n2"), col("top2_frac"), col("n3"), col("dup3_frac"),
        (col("top2_frac") <= 0.20).cast("int").as("r_top2"),
        (col("dup3_frac") <= 0.18).cast("int").as("r_dup3"),
        (col("top2_frac") <= 0.20 && col("dup3_frac") <= 0.18).cast("int").as("keep"))
  }

  /** Domain mixing: downsample each source to a target weight with
    * DETERMINISTIC hash-rate sampling — a doc is kept iff its md5
    * bucket falls under the source's acceptance threshold, so the
    * mixture is reproducible run-to-run and engine-to-engine (the
    * same property as [[hashSplit]]; `rand()`-based sampling can't
    * give it). Weights here cycle 1.0/0.5/0.25/0.1 by source number;
    * a real pipeline feeds its mixture table in. Map-only filter +
    * one aggregate.
    */
  /** Per-row mixing core: stateless keep/drop flag from the
    * deterministic md5 bucket — works unchanged on a STREAMING frame
    * (no state, no shuffle), which is what makes the streaming twin
    * below a one-liner.
    */
  def mixFlags(docs: DataFrame): DataFrame = docs
    .withColumn("srcn", substring(col("source"), 4, 10).cast("int"))
    .withColumn("w",
      when(col("srcn") % 4 === 0, 1.0).when(col("srcn") % 4 === 1, 0.5)
        .when(col("srcn") % 4 === 2, 0.25).otherwise(0.1))
    .withColumn("bucket",
      conv(substring(md5(concat(lit("mix:"), col("doc_id").cast("string"), lit(":"),
        col("text")).cast("binary")), 1, 2), 16, 10).cast("int"))
    .withColumn("kept", (col("bucket") < col("w") * 256).cast("int"))

  def mixSources(s: SparkSession, dir: String): DataFrame =
    mixFlags(t(s, dir, "documents"))
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("n_total"), sum(col("kept")).as("n_kept"))

  /** Streaming twin of [[mixSources]]: the keep/drop decision is a
    * per-row hash — no state — so the same [[mixFlags]] core runs on
    * a streaming frame; the per-source report becomes a streaming
    * aggregation (complete/update mode) whose running counts converge
    * to the batch report on the same rows (PipelineOpsSpec).
    * Filtering the actual mixture (`kept = 1`) is pure append mode.
    */
  def mixSourcesStream(docs: DataFrame): DataFrame =
    mixFlags(docs)
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("n_total"), sum(col("kept")).as("n_kept"))

  /** Benchmark-contamination check: flag training docs sharing any
    * word-5-gram with the held-out set (source src0 stands in for
    * the benchmark). The benchmark's distinct shingles BROADCAST —
    * eval sets are tiny next to the corpus, so the probe is a
    * map-side semi-join at any corpus size; output is per-doc
    * overlapping-gram counts.
    */
  private def grams5(df: DataFrame): DataFrame = df
    .withColumn("l", split(col("text"), " "))
    .filter(size(col("l")) >= 5)
    .select(col("doc_id"), explode(array_distinct(expr(
      """transform(sequence(0, size(l) - 5),
        |  i -> concat_ws(' ', l[i], l[i+1], l[i+2], l[i+3], l[i+4]))"""
        .stripMargin))).as("g"))

  /** Core contamination probe, shared by the batch query and the
    * streaming twin: works unchanged on a streaming `docs` frame —
    * the gram explode is stateless and the broadcast side is static,
    * so each micro-batch probes the same in-memory benchmark set
    * (stream-static join; the aggregation carries the running
    * per-doc counts).
    */
  def contaminationPairs(docs: DataFrame, benchGrams: DataFrame): DataFrame =
    grams5(docs)
      .join(broadcast(benchGrams), Seq("g"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))

  def contamination(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val bench = grams5(docs.filter(col("source") === "src0")).select("g").distinct()
    contaminationPairs(docs.filter(col("source") =!= "src0"), bench)
  }

  /** Corpus-trained bigram language-model scoring — the CCNet/KenLM
    * quality gate (Wenzek et al. 2020): documents whose token stream
    * is improbable under a corpus LM are boilerplate/noise. Here the
    * LM is the corpus's own bigram model with add-k smoothing
    * (k=0.5): P(w2|w1) = (c(w1,w2)+k) / (c(w1)+k·V). Per doc emits
    * the bigram count, mean log-probability and perplexity.
    *
    * Plan shape: two count aggregates (bigram, unigram — shuffles
    * carry distinct grams, not the token stream, thanks to partial
    * aggregation), then the doc's bigram stream equi-joins the count
    * tables on their natural keys and folds back to one row per doc.
    * V rides along as a broadcast 1-row crossjoin, never a driver
    * action. At 100 TB the model table is Zipf-truncated (count
    * floor) and broadcast instead of shuffle-joined — the join keys
    * and smoothing are unchanged, which is why the exact variant is
    * the one under oracle test.
    */
  def lmPerplexity(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("l"))
    val uni = toks.select(explode(col("l")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    val vocab = uni.agg(count(lit(1)).cast("double").as("v"))
    val bg = toks.filter(size(col("l")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(l) - 2), i -> struct(l[i] AS w1, l[i+1] AS w2))"))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val cb = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    bg.join(cb, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("logp",
        log((col("cb") + 0.5) / (col("cu") + col("v") * 0.5)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bg"), avg(col("logp")).as("avg_logp"))
      .withColumn("ppl", exp(-col("avg_logp")))
  }

  /** The 100 TB variant [[lmPerplexity]]'s scaladoc promises: the
    * model tables ZIPF-TRUNCATE at a count floor and BROADCAST, so
    * scoring is a map-side pass over the corpus — no shuffle of the
    * doc bigram stream at all (the exact variant shuffle-joins it
    * twice). Grams below the floor fall back to the smoothing mass
    * (cb→0) and unseen contexts to the floor count itself — both
    * engines compute the same coalesce, so even the truncated scores
    * are oracle-exact. At minCount=1 this reduces to [[lmPerplexity]]
    * identically.
    *
    * `minCount` is the SIZE dial, not a fixed production constant:
    * under Zipf the model shrinks roughly geometrically in the floor,
    * so a floor in the tens suffices at web scale where floor=2 (fine
    * for the test corpora) would still leave a model far beyond any
    * broadcast limit. The broadcast hint is therefore GATED, not
    * unconditional: the truncated model's row count (caller-supplied
    * `knownModelRows` from catalog stats at scale, one counting pass
    * over the already-truncated aggregates otherwise — the
    * [[dedupSimhash]]/`nearDupPairs` knownRows convention) times a
    * conservative 64-byte row width must fit `broadcastCapBytes`
    * (default mirrors Spark's 10 MB autoBroadcastJoinThreshold).
    * A model past the cap falls back to [[lmPerplexity]]-style plain
    * joins — identical scores, exchange-bound plan — instead of an
    * executor-OOMing forced broadcast. Both plan shapes are pinned in
    * PipelineOpsSpec ("broadcast hint is gated").
    */
  def lmPerplexityTruncated(s: SparkSession, dir: String, minCount: Int = 2,
      broadcastCapBytes: Long = 10L << 20,
      knownModelRows: Option[Long] = None): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("l"))
    val uni = toks.select(explode(col("l")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    val vocab = uni.agg(count(lit(1)).cast("double").as("v"))
    val bg = toks.filter(size(col("l")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(l) - 2), i -> struct(l[i] AS w1, l[i+1] AS w2))"))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val cbT = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
      .filter(col("cb") >= minCount)
    val uniT = uni.filter(col("cu") >= minCount)
    // Gate the broadcast on estimated model size: rows × 64 B
    // (two short tokens + a long + struct overhead, deliberately
    // conservative). The fallback count runs the truncated
    // aggregates once extra at gate scale; at 100 TB the caller
    // passes knownModelRows and no action fires here.
    val modelRows = knownModelRows.getOrElse(cbT.count() + uniT.count())
    val fits = modelRows * 64L <= broadcastCapBytes
    val hint = (d: DataFrame) => if (fits) broadcast(d) else d
    bg.join(hint(cbT), Seq("w1", "w2"), "left")
      .join(hint(uniT), Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("logp",
        log((coalesce(col("cb"), lit(0L)) + 0.5) /
          (coalesce(col("cu"), lit(minCount.toLong)) + col("v") * 0.5)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bg"), avg(col("logp")).as("avg_logp"))
      .withColumn("ppl", exp(-col("avg_logp")))
  }

  /** Stratified sampling: exactly `perStratum` docs per language,
    * chosen by DETERMINISTIC hash order (md5 of "samp:docId:lang") —
    * the reproducible eval-set carve-out ([[hashSplit]]'s property,
    * but with an exact per-stratum count, which rate sampling cannot
    * guarantee). The rank<=k filter over row_number plans as
    * WindowGroupLimit: each map task keeps only its local top-k per
    * stratum BEFORE the exchange, so the shuffle carries
    * O(partitions·k·strata) rows — a giant stratum never sorts
    * corpus-wide.
    */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val perStratum = 40
    val w = Window.partitionBy(col("lang")).orderBy(col("hk"), col("doc_id"))
    t(s, dir, "documents")
      .withColumn("hk", md5(concat(lit("samp:"), col("doc_id").cast("string"),
        lit(":"), col("lang")).cast("binary")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= perStratum)
      .select(col("lang"), col("doc_id"), col("rk"))
  }

  /** TF-IDF keyword extraction: top-3 terms per document. tf and df
    * come from the same (doc,term) count aggregate (df is a second
    * fold over it — the doc-term pairs shuffle once); idf is
    * smoothed sklearn-style ln((N+1)/(df+1))+1 with N a broadcast
    * 1-row crossjoin. Ranking is INTEGER-only (tf desc, df asc —
    * frequent-here and rare-elsewhere — then term) so the row_number
    * cut is reproducible across engines: ordering by the float score
    * would make the oracle hash hostage to ulp differences between
    * ln implementations. The rank filter plans as WindowGroupLimit
    * (map-side top-k before the exchange), same shape as
    * [[stratifiedSample]].
    */
  def tfidfTopk(s: SparkSession, dir: String): DataFrame = {
    val k = 3
    val docs = t(s, dir, "documents")
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val ndocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(ndocs))
      .withColumn("idf", log((col("n_docs") + 1.0) / (col("df") + 1.0)) + 1.0)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("df"),
        (col("tf") * col("idf")).as("score"))
  }

  /** Incremental dedup against a prior-snapshot fingerprint store —
    * the shape every RECURRING ingestion runs: yesterday's corpus is
    * already deduped, today's batch must reject (a) docs whose
    * content hash exists in the store and (b) intra-batch repeats,
    * keeping one canonical row. Source 'src1' stands in for the new
    * batch; everything else is the store. One distinct over the
    * store + a left join on the hash + a per-hash first-row window
    * over the batch. At production scale the store is a table
    * BUCKETED on h, so the join and the day's store update are both
    * exchange-free on the store side; the batch (small next to the
    * store) shuffles only itself.
    */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .withColumn("h", md5(col("text").cast("binary")))
    val prior = docs.filter(col("source") =!= "src1").select(col("h")).distinct()
    val batch = docs.filter(col("source") === "src1")
    val w = Window.partitionBy(col("h")).orderBy(col("doc_id"))
    batch
      .join(prior.withColumn("in_prior", lit(1)), Seq("h"), "left")
      .withColumn("dup_prior", coalesce(col("in_prior"), lit(0)))
      .withColumn("first_in_batch", (row_number().over(w) === 1).cast("int"))
      .withColumn("ingest",
        (col("dup_prior") === 0 && col("first_in_batch") === 1).cast("int"))
      .select(col("doc_id"), col("h"), col("dup_prior"),
        col("first_in_batch"), col("ingest"))
  }

  /** Incremental NEAR-dup dedup against a prior-snapshot corpus —
    * [[dedupIncremental]]'s recurring-ingestion shape upgraded from
    * exact content hashes to MinHash+LSH near-duplication (the
    * "dedup today's crawl against the existing corpus" operator):
    * the store (every source but 'src1') is already deduped; a batch
    * ('src1') doc is rejected when it is a VERIFIED near-dup of
    * (a) any store doc (`dup_prior`) or (b) any smaller-doc_id batch
    * doc (`dup_batch` — the deterministic one-pass greedy rule;
    * chained near-dup sets needing transitive closure are
    * [[DedupCluster]]'s job).
    *
    * Scale shape: signatures compute over store+batch in ONE shingle
    * pass (|docs|·k-long shuffle); the banded bucket join puts the
    * BATCH on the probe side and restricts partners to store docs or
    * smaller batch ids, so store×store pairs — the corpus-quadratic
    * bulk an unrestricted self-join would mine — never form. The
    * estimate prefilter and the exact-Jaccard verify
    * ([[verifyExactJaccard]]) then run over candidate pairs only. At
    * production scale the store's banded signatures are a
    * MATERIALIZED table bucketed on (band, band_hash) — the daily
    * probe shuffles only the batch's signatures, and the store's
    * signature table grows append-only with ingested docs.
    * Oracle: brute-force exact Jaccard batch-vs-partners (same
    * recall-≈-1 argument as q_dedup_minhash — LSH recall at the
    * corpus's true-dup similarity ~0.99 is 1-4e-12, and every
    * emitted flag is exact-verified).
    */
  def dedupIncrementalMinhash(s: SparkSession, dir: String,
      threshold: Double = 0.4, k: Int = 32, bands: Int = 8): DataFrame =
    dedupIncrementalMinhashOn(t(s, dir, "documents"), "src1", threshold, k, bands)

  /** Core over any (doc_id, text, source) frame; `batchSource` marks
    * the incoming batch, every other source is the store.
    */
  def dedupIncrementalMinhashOn(docs: DataFrame, batchSource: String,
      threshold: Double = 0.4, k: Int = 32, bands: Int = 8): DataFrame = {
    val flagged = docs.withColumn("is_batch",
      (col("source") === batchSource).cast("int"))
    val sigs = MinHashDedup.signatures(flagged, "doc_id", "text", k)
      .join(flagged.select(col("doc_id"), col("is_batch")), Seq("doc_id"))
    val banded = MinHashDedup.banded(sigs, "doc_id", k, bands)
      .join(sigs.select(col("doc_id"), col("is_batch")), Seq("doc_id"))
    val probe = banded.filter(col("is_batch") === 1)
      .select(col("band"), col("band_hash"),
        col("doc_id").as("id_b"), col("sig").as("sig_b"))
    val build = banded.select(col("band"), col("band_hash"),
      col("doc_id").as("id_a"), col("sig").as("sig_a"), col("is_batch").as("a_batch"))
    val cands = build
      .join(probe, Seq("band", "band_hash"))
      .filter(col("a_batch") === 0 || col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .withColumn("est",
        expr(s"size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) / cast($k as double)"))
      .filter(col("est") >= threshold)
      .select(col("id_a"), col("id_b"))
      .persist()
    val verified = verifyExactJaccard(docs, cands, threshold)
      .join(flagged.select(col("doc_id").as("id_a"),
        (lit(1) - col("is_batch")).as("from_store")), Seq("id_a"))
    val flags = verified.groupBy(col("id_b").as("doc_id"))
      .agg(max(col("from_store")).cast("int").as("dp"),
        max(lit(1) - col("from_store")).cast("int").as("db"))
    flagged.filter(col("is_batch") === 1).select(col("doc_id"))
      .join(flags, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("dp"), lit(0)).as("dup_prior"),
        coalesce(col("db"), lit(0)).as("dup_batch"))
      .withColumn("ingest",
        (col("dup_prior") === 0 && col("dup_batch") === 0).cast("int"))
  }

  /** Vocabulary induction + OOV-rate analysis — the tokenizer-
    * coverage question every pipeline answers before training: with a
    * top-V frequency vocabulary, what fraction of each document's
    * token occurrences falls outside it? Vocab = top 64 tokens by
    * (count desc, token asc) — an INTEGER+string ordering, so the cut
    * is reproducible across engines. The unpartitioned rank<=V plans
    * as WindowGroupLimit / TakeOrderedAndProject (each map task
    * forwards only its local top-V, the single merge sees
    * partitions·V rows, never the vocabulary);
    * the induced vocab then BROADCASTS back against the token stream
    * — vocab size is a constant, so the per-doc OOV fold is map-side
    * at any corpus size.
    */
  def vocabOov(s: SparkSession, dir: String): DataFrame = {
    val vocabSize = 64
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
      // Unpartitioned window BY DESIGN (bench logs a WindowExec
      // single-partition warning — accepted, not a latent corpus
      // sort): rank<=V plans as WindowGroupLimit or, on Spark 4,
      // TakeOrderedAndProject (LimitPushDownThroughWindow) — either
      // way each map task forwards only its local top-V and the
      // single merge sees partitions·V rows, never the vocabulary.
      // Spec-pinned in PipelineOpsSpec ("bounded-window
      // intermediates").
      .withColumn("rk", row_number().over(
        Window.orderBy(col("c").desc, col("w").asc)))
      .filter(col("rk") <= vocabSize)
      .select(col("w"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("in_vocab").isNull, 1).otherwise(0)).as("n_oov"))
      .withColumn("oov_rate", col("n_oov").cast("double") / col("n_tok"))
  }

  /** Streaming twin of [[dedupIncremental]] — continuous ingestion
    * instead of a daily batch: works unchanged on a streaming `docs`
    * frame. The content hash is a stateless projection, intra-batch
    * keep-first becomes streaming `dropDuplicates` keyed state
    * (first arrival wins, the streaming analog of the batch
    * min-doc_id window), and the store probe is a stream-static
    * LEFT ANTI join — the fingerprint store is static for the run,
    * so each micro-batch probes it without state. Emits exactly the
    * rows to ingest. Keep-first is FIRST-ARRIVAL order: in streaming
    * that is well-defined (micro-batch order); in batch mode
    * dropDuplicates keeps an arbitrary row per hash — use
    * [[dedupIncremental]]'s min-doc_id window when a deterministic
    * batch twin is needed (PipelineOpsSpec asserts the stream against
    * exactly that semantics).
    */
  def ingestStream(docs: DataFrame, priorHashes: DataFrame): DataFrame =
    docs.withColumn("h", md5(col("text").cast("binary")))
      .dropDuplicates("h")
      .join(priorHashes, Seq("h"), "left_anti")

  /** The NEAR-dup store's at-scale layout: banded LSH signatures, one
    * row per (doc, band) — materialize with
    * `bucketBy(n, "band", "band_hash")` and the daily probe's bucket
    * join plans with NO exchange on the store side (the batch alone
    * shuffles; BucketedTableSpec pins the plan shape). Append the
    * ingested docs' rows after each batch and the store stays
    * probe-ready without re-signing.
    */
  def bandedSignatures(docs: DataFrame, k: Int = 32, bands: Int = 8): DataFrame =
    MinHashDedup.banded(
      MinHashDedup.signatures(docs, "doc_id", "text", k), "doc_id", k, bands)

  /** One ingestion step of the NEAR-dup store: dedups `batchDocs`
    * (doc_id, text) against `storeDocs` and against itself via
    * [[dedupIncrementalMinhashOn]] — the per-micro-batch kernel of
    * [[ingestStreamMinhash]], also usable directly as the daily-batch
    * driver.
    */
  def ingestBatchMinhash(storeDocs: DataFrame, batchDocs: DataFrame,
      threshold: Double = 0.4, k: Int = 32, bands: Int = 8): DataFrame = {
    val u = storeDocs.select(col("doc_id"), col("text"), lit("__store").as("source"))
      .unionByName(batchDocs.select(col("doc_id"), col("text"), lit("__batch").as("source")))
    dedupIncrementalMinhashOn(u, "__batch", threshold, k, bands)
  }

  /** Streaming twin of [[dedupIncrementalMinhash]] — continuous
    * NEAR-dup ingestion against a GROWING corpus store: each
    * micro-batch dedups against the parquet store at `storeDir` AND
    * against itself, appends the ingested docs to the store, and the
    * next micro-batch probes the grown store — so a doc arriving in
    * batch 7 that is a near-dup of a doc ingested in batch 2 is
    * rejected, which the stream-static anti-join of [[ingestStream]]
    * cannot express (its store is frozen for the run). foreachBatch
    * is the right tool, not stream state: the "state" here is the
    * whole corpus's signature store — it belongs in a table,
    * exactly where the batch pipeline keeps it, not in per-key
    * executor state. Exactly-once: foreachBatch may replay a batch on
    * recovery; the append is idempotent at the doc_id level because a
    * replayed doc re-probes the same store and re-derives the same
    * flags (dup rows in the store dir after a crash mid-append are
    * possible — production uses a transactional table format; the
    * probe semantics tolerate them since ANY matching store doc
    * rejects).
    * At production scale the store holds banded SIGNATURES bucketed
    * on (band, band_hash), not raw text — this twin re-signs the
    * store each batch for fixture simplicity, the batch core's
    * documented materialization note covers the real layout.
    */
  def ingestStreamMinhash(docs: DataFrame, storeDir: String,
      threshold: Double = 0.4, k: Int = 32, bands: Int = 8)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("update").foreachBatch {
      (batch: DataFrame, _: Long) =>
        val sess = batch.sparkSession
        val store = sess.read.parquet(storeDir)
        val kept = ingestBatchMinhash(store, batch, threshold, k, bands)
          .filter(col("ingest") === 1)
          .join(batch.select(col("doc_id"), col("text")), Seq("doc_id"))
          .select(col("doc_id"), col("text"))
        kept.write.mode("append").parquet(storeDir)
    }

  /** Curriculum length-binning: assign every doc to one of 10
    * length deciles (short→long ordering is the classic curriculum
    * schedule) WITHOUT a global sort. A naive ntile() over the
    * corpus plans as a single-partition window — the anti-pattern at
    * 100 TB. Instead: the n_tok HISTOGRAM aggregates first (distinct
    * lengths, thousands of rows at any corpus size), the cumulative
    * fold and bin boundaries compute on the histogram, and the
    * bin map BROADCASTS back onto the doc stream — integer-only
    * arithmetic (cum_before·10 / total) so the deciles are exact and
    * engine-reproducible, and docs with equal length always share a
    * bin. One corpus-sized aggregate + one map-side join.
    */
  /** The decile bin map (n_tok → bin) derived from a corpus
    * snapshot — the static half of curriculum binning, shared by the
    * batch query and the streaming twin below.
    */
  def lengthBinMap(docsTok: DataFrame): DataFrame = {
    val hist = docsTok.groupBy(col("n_tok")).agg(count(lit(1)).as("cnt"))
    // Unpartitioned window BY DESIGN (bench logs a WindowExec
    // single-partition warning — accepted, not a latent corpus sort):
    // the input is the LENGTH HISTOGRAM, whose cardinality is the
    // number of distinct doc lengths — bounded by the max doc length,
    // thousands of rows at any corpus size. Spec-pinned in
    // PipelineOpsSpec ("bounded-window intermediates").
    val w = Window.orderBy(col("n_tok"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .crossJoin(broadcast(hist.agg(sum(col("cnt")).as("total"))))
      // `div`, not `/`: Spark's / is DOUBLE division even on longs, and
      // a true quotient of k-epsilon can round UP to k before the int
      // cast — the oracle's integer // would floor to k-1 at exactly
      // the bin boundaries. Integer division matches bit-for-bit.
      .select(col("n_tok"),
        least(lit(9L), expr("((cum - cnt) * 10) div total"))
          .cast("int").as("bin"))
  }

  def curriculumBins(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
    docs.join(broadcast(lengthBinMap(docs)), Seq("n_tok"))
      .select(col("doc_id"), col("n_tok"), col("bin"))
  }

  /** Streaming twin of [[curriculumBins]], run via `foreachBatch`:
    * the bin map comes from a STATIC snapshot (yesterday's histogram
    * — recomputing deciles per micro-batch would let a doc's bin
    * drift mid-run), and each arriving micro-batch left-joins it
    * map-side (broadcast). Docs whose length is absent from the
    * snapshot get bin -1 — "unbinned until the next snapshot
    * refresh" — rather than being silently dropped or mis-binned.
    * Spec-asserted equal to the batch operator when the snapshot
    * covers the stream (PipelineOpsSpec).
    */
  def assignCurriculumBins(docs: DataFrame, binMap: DataFrame): DataFrame =
    docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .join(broadcast(binMap), Seq("n_tok"), "left")
      .select(col("doc_id"), col("n_tok"),
        coalesce(col("bin"), lit(-1)).as("bin"))

  /** Corpus report card: doc counts, token volume and mean length
    * rolled up over every (lang × source) combination plus each
    * margin and the grand total — CUBE, the one-pass answer to "what
    * is in this corpus" that every curation run reports. Grouping
    * columns are never null in the data, so the standard
    * coalesce-to-'ALL' labeling is unambiguous. One Expand + one
    * two-phase aggregate; shuffle carries 4 grouping rows per input
    * row of partial state, not the corpus.
    */
  def corpusReport(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .cube(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tok"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"))
      .select(coalesce(col("lang"), lit("ALL")).as("lang"),
        coalesce(col("source"), lit("ALL")).as("source"),
        col("n_docs"), col("total_tok"), col("avg_chars"))

  /** CCNet-style text normalization — the canonicalization pass
    * BEFORE any hashing/dedup, so trivially-different encodings of
    * the same content collapse: Unicode NFC (native codegen'd
    * [[graft.functions.NfcNormalize]] — composed and decomposed
    * accents unify; Spark ships no normalizer), lowercase,
    * punctuation stripped to spaces (letters/digits/whitespace
    * survive, any script), whitespace collapsed, trimmed. Pure
    * map-only projection; the normalized hash rides along to show
    * the dedup key this feeds.
    */
  def normalizeText(s: SparkSession, dir: String): DataFrame = {
    val norm = trim(regexp_replace(regexp_replace(
      lower(F.nfcNormalize(col("text"))),
      "[^\\p{L}\\p{N}\\s]+", " "), "\\s+", " "))
    t(s, dir, "documents").select(
      col("doc_id"), norm.as("norm"),
      length(norm).as("n_norm"), md5(norm.cast("binary")).as("h_norm"))
  }

  /** End-to-end curation pipeline — the flagship composition: NFC
    * normalization → Gopher quality gate → exact dedup on the
    * NORMALIZED hash (so trivially-different encodings collapse) →
    * deterministic train/val/test split of the survivors → per-split
    * corpus report. Every stage is an already-oracle-checked operator
    * reused semantically unchanged; what this query pins is the
    * COMPOSITION — stage boundaries are plain Columns/DataFrames, so
    * normalize+quality+split all evaluate in the scan's single fused
    * pass and the only shuffles are the dedup's (map-side
    * WindowGroupLimit-pruned) hash exchange and the final 3-row
    * aggregate. That fusion is the point at 100 TB: a pipeline of
    * five "tools" costs one corpus scan + one shuffle, not five jobs.
    */
  def pipelineE2e(s: SparkSession, dir: String): DataFrame = {
    // quality gate INLINE on the same scan as normalization — joining
    // normalizeText against gopherQuality would re-scan the corpus
    // and join it back to itself on doc_id; as a filter Column the
    // gate fuses into the scan's projection (EXPLAINS.md shows ONE
    // parquet scan)
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    val awl = aggregate(toks, lit(0), (acc, x) => acc + length(x)).cast("double") / nTok
    val alphaRatio = size(filter(toks, x => x.rlike("[a-zA-Z]"))).cast("double") / nTok
    val stopHits = size(filter(toks, x => x.isin(stopwords.map(lit): _*).cast("boolean")))
    val keepCond = nTok >= 30 && awl >= 3.0 && awl <= 10.0 &&
      alphaRatio >= 0.9 && stopHits >= 1
    val normC = trim(regexp_replace(regexp_replace(
      lower(F.nfcNormalize(col("text"))),
      "[^\\p{L}\\p{N}\\s]+", " "), "\\s+", " "))
    val canon = t(s, dir, "documents")
      .filter(keepCond)
      .select(col("doc_id"), normC.as("norm"),
        md5(normC.cast("binary")).as("h_norm"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("h_norm")).orderBy(col("doc_id"))))
      .filter(col("rk") === 1)
    canon
      .withColumn("bucket",
        conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"), col("norm"))
          .cast("binary")), 1, 2), 16, 10).cast("int"))
      .withColumn("split",
        when(col("bucket") < 204, "train")
          .when(col("bucket") < 230, "val").otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("norm"), " ")).cast("long")).as("n_tok"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_e2e"     -> (pipelineE2e _),
    "q_text_normalize"   -> (normalizeText _),
    "q_curriculum_bins"  -> (curriculumBins _),
    "q_corpus_report"    -> (corpusReport _),
    "q_vocab_oov"        -> (vocabOov _),
    "q_lm_perplexity"    -> (lmPerplexity _),
    "q_lm_ppl_truncated" -> ((s: SparkSession, d: String) => lmPerplexityTruncated(s, d)),
    "q_sample_stratified" -> (stratifiedSample _),
    "q_tfidf_topk"       -> (tfidfTopk _),
    "q_dedup_incremental" -> (dedupIncremental _),
    "q_dedup_minhash_inc" -> ((s: SparkSession, d: String) => dedupIncrementalMinhash(s, d)),
    "q_dedup_bloom"      -> (BloomDedup.dedupIncrementalBloom _),
    "q_mix_sources"      -> (mixSources _),
    "q_contamination"    -> (contamination _),
    "q_dedup_minhash"    -> ((s: SparkSession, d: String) => dedupMinhash(s, d)),
    "q_dedup_simhash_v"  -> ((s: SparkSession, d: String) => dedupSimhashVerified(s, d)),
    "q_dedup_paragraph"  -> ((s: SparkSession, d: String) => dedupParagraphs(s, d)),
    "q_shard_assign"     -> ((s: SparkSession, d: String) => shardAssign(s, d)),
    "q_dedup_cc"         -> (DedupCluster.dedupCluster _),
    "q_dedup_keep_best"  -> (DedupCluster.dedupKeepBest _),
    "q_dedup_cc_edges"   -> (DedupCluster.ccEdges _),
    "q_split_hash"       -> (hashSplit _),
    "q_pack_sequences"   -> (packSequences _),
    "q_text_repetition"  -> (repetition _),
    "q_text_stats"       -> (textStats _),
    "q_text_gopher"      -> (gopherQuality _),
    "q_text_langid"      -> (langId _),
    "q_text_tokens"      -> (tokenCount _),
    "q_text_fingerprint" -> (fingerprint _),
    "q_text_redact"      -> (redactPii _),
    "q_dedup_exact"      -> (dedupExact _),
    "q_dedup_simhash"    -> ((s: SparkSession, d: String) => dedupSimhash(s, d)),
    "q_dedup_ngram"      -> (ngramJaccard _))

  val oracle: Map[String, String] = Map(
    "q_pipeline_e2e" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(
        |      lower(nfc_normalize(text)),
        |      '[^\p{L}\p{N}\s]+', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |g AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id,
        |      len(string_split(text, ' ')) AS n_tok,
        |      list_sum(list_transform(string_split(text, ' '),
        |        x -> length(x)))::DOUBLE / len(string_split(text, ' ')) AS awl,
        |      len(list_filter(string_split(text, ' '),
        |          x -> regexp_matches(x, '[a-zA-Z]')))::DOUBLE
        |        / len(string_split(text, ' ')) AS alpha_ratio,
        |      len(list_filter(string_split(text, ' '),
        |          x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS stop_hits
        |    FROM documents)
        |  WHERE n_tok >= 30 AND awl >= 3.0 AND awl <= 10.0
        |    AND alpha_ratio >= 0.9 AND stop_hits >= 1),
        |canon AS (
        |  SELECT doc_id, norm FROM (
        |    SELECT n.doc_id, n.norm, row_number() OVER (
        |      PARTITION BY md5(n.norm) ORDER BY n.doc_id) AS rk
        |    FROM n JOIN g ON n.doc_id = g.doc_id)
        |  WHERE rk = 1)
        |SELECT
        |  CASE WHEN b < 204 THEN 'train' WHEN b < 230 THEN 'val'
        |       ELSE 'test' END AS split,
        |  count(*) AS n_docs,
        |  sum(len(string_split(norm, ' ')))::BIGINT AS n_tok
        |FROM (SELECT doc_id, norm,
        |        ('0x' || substr(md5(doc_id::VARCHAR || ':' || norm), 1, 2))::INT AS b
        |      FROM canon)
        |GROUP BY 1""".stripMargin,
    "q_text_normalize" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(
        |      lower(nfc_normalize(text)),
        |      '[^\p{L}\p{N}\s]+', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id, norm, length(norm) AS n_norm, md5(norm) AS h_norm
        |FROM n""".stripMargin,
    "q_curriculum_bins" ->
      """WITH d AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tok
        |           FROM documents),
        |hist AS (SELECT n_tok, count(*) AS cnt FROM d GROUP BY n_tok),
        |tot AS (SELECT sum(cnt)::BIGINT AS total FROM hist),
        |bins AS (
        |  SELECT n_tok,
        |    least(9, (cum - cnt) * 10 // total)::INT AS bin
        |  FROM (SELECT n_tok, cnt, sum(cnt) OVER (ORDER BY n_tok
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
        |        FROM hist), tot)
        |SELECT doc_id, d.n_tok, bin FROM d JOIN bins ON d.n_tok = bins.n_tok"""
        .stripMargin,
    "q_corpus_report" ->
      """SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
        |  count(*) AS n_docs,
        |  sum(len(string_split(text, ' ')))::BIGINT AS total_tok,
        |  sum(n_chars)::DOUBLE / count(*) AS avg_chars
        |FROM documents
        |GROUP BY CUBE (lang, source)""".stripMargin,
    "q_vocab_oov" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |vocab AS (
        |  SELECT w FROM (
        |    SELECT w, row_number() OVER (ORDER BY count(*) DESC, w ASC) AS rk
        |    FROM toks GROUP BY w)
        |  WHERE rk <= 64)
        |SELECT doc_id, count(*) AS n_tok,
        |  sum(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
        |  sum(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END)::DOUBLE / count(*)
        |    AS oov_rate
        |FROM toks LEFT JOIN vocab ON toks.w = vocab.w
        |GROUP BY doc_id""".stripMargin,
    "q_lm_perplexity" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |uni AS (SELECT w1, count(*) AS cu
        |        FROM (SELECT unnest(l) AS w1 FROM toks) GROUP BY w1),
        |v AS (SELECT count(*)::DOUBLE AS v FROM uni),
        |bg AS (SELECT doc_id,
        |         unnest(list_transform(range(1, len(l)), i -> l[i]||' '||l[i+1])) AS g
        |       FROM toks WHERE len(l) >= 2),
        |cb AS (SELECT g, count(*) AS cb FROM bg GROUP BY g),
        |sc AS (SELECT doc_id, ln((cb + 0.5) / (cu + 0.5 * v.v)) AS logp
        |       FROM bg JOIN cb USING (g)
        |       JOIN uni ON uni.w1 = split_part(g, ' ', 1), v)
        |SELECT doc_id, count(*) AS n_bg, avg(logp) AS avg_logp,
        |  exp(-avg(logp)) AS ppl
        |FROM sc GROUP BY doc_id""".stripMargin,
    "q_lm_ppl_truncated" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |uni AS (SELECT w1, count(*) AS cu
        |        FROM (SELECT unnest(l) AS w1 FROM toks) GROUP BY w1),
        |v AS (SELECT count(*)::DOUBLE AS v FROM uni),
        |bg AS (SELECT doc_id,
        |         unnest(list_transform(range(1, len(l)), i -> l[i]||' '||l[i+1])) AS g
        |       FROM toks WHERE len(l) >= 2),
        |cbt AS (SELECT g, count(*) AS cb FROM bg GROUP BY g HAVING count(*) >= 2),
        |unit AS (SELECT w1, cu FROM uni WHERE cu >= 2),
        |sc AS (SELECT doc_id,
        |         ln((coalesce(cb, 0) + 0.5) / (coalesce(cu, 2) + 0.5 * v.v)) AS logp
        |       FROM bg LEFT JOIN cbt USING (g)
        |       LEFT JOIN unit ON unit.w1 = split_part(g, ' ', 1), v)
        |SELECT doc_id, count(*) AS n_bg, avg(logp) AS avg_logp,
        |  exp(-avg(logp)) AS ppl
        |FROM sc GROUP BY doc_id""".stripMargin,
    "q_sample_stratified" ->
      """SELECT lang, doc_id, rk FROM (
        |  SELECT lang, doc_id, row_number() OVER (
        |    PARTITION BY lang
        |    ORDER BY md5('samp:' || doc_id::VARCHAR || ':' || lang), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 40""".stripMargin,
    "q_tfidf_topk" ->
      """WITH tfc AS (
        |  SELECT doc_id, term, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |        FROM documents)
        |  GROUP BY doc_id, term),
        |dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY term),
        |nd AS (SELECT count(*)::DOUBLE AS n_docs FROM documents)
        |SELECT doc_id, rk, term, tf, df, score FROM (
        |  SELECT doc_id, term, tf, df,
        |    tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0) AS score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tf DESC, df ASC, term ASC) AS rk
        |  FROM tfc JOIN dfc USING (term), nd)
        |WHERE rk <= 3""".stripMargin,
    "q_dedup_incremental" ->
      """WITH d AS (SELECT doc_id, source, md5(text) AS h FROM documents),
        |prior AS (SELECT DISTINCT h FROM d WHERE source <> 'src1')
        |SELECT doc_id, h, dup_prior, first_in_batch,
        |  (dup_prior = 0 AND first_in_batch = 1)::INT AS ingest
        |FROM (
        |  SELECT doc_id, h,
        |    (h IN (SELECT h FROM prior))::INT AS dup_prior,
        |    (row_number() OVER (PARTITION BY h ORDER BY doc_id) = 1)::INT
        |      AS first_in_batch
        |  FROM d WHERE source = 'src1')""".stripMargin,
    // Brute-force exact Jaccard batch-vs-(store ∪ smaller batch ids)
    // — same recall-≈-1 argument as q_dedup_minhash's oracle: LSH
    // recall at the corpus's true-dup similarity is 1-4e-12 and every
    // emitted flag is exact-verified, so the blocked pipeline and the
    // brute force agree pair-for-pair.
    "q_dedup_minhash_inc" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        |              WHERE len(string_split(text, ' ')) >= 3),
        |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(
        |         generate_series(1, len(tk) - 2),
        |         i -> ('0x' || substr(md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]),
        |               1, 15))::BIGINT)) AS sh
        |       FROM toks),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |srcs AS (SELECT doc_id, (source = 'src1')::INT AS is_batch FROM documents),
        |inter AS (
        |  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS n_inter
        |  FROM sh x JOIN sh y ON y.sh = x.sh
        |  JOIN srcs sx ON sx.doc_id = x.doc_id
        |  JOIN srcs sy ON sy.doc_id = y.doc_id
        |  WHERE sy.is_batch = 1 AND (sx.is_batch = 0 OR x.doc_id < y.doc_id)
        |  GROUP BY 1, 2),
        |ver AS (
        |  SELECT id_a, id_b, sx.is_batch AS a_batch
        |  FROM inter
        |  JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  JOIN srcs sx ON sx.doc_id = id_a
        |  WHERE n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter) >= 0.4),
        |flags AS (
        |  SELECT id_b AS doc_id,
        |    max(1 - a_batch)::INT AS fp, max(a_batch)::INT AS fb
        |  FROM ver GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(f.fp, 0)::INT AS dup_prior,
        |  coalesce(f.fb, 0)::INT AS dup_batch,
        |  (coalesce(f.fp, 0) = 0 AND coalesce(f.fb, 0) = 0)::INT AS ingest
        |FROM documents d LEFT JOIN flags f ON f.doc_id = d.doc_id
        |WHERE d.source = 'src1'""".stripMargin,
    // The Bloom-prefiltered variant is exact BY CONSTRUCTION (no
    // false negatives; false positives only re-check against the
    // store), so its oracle is the same plain incremental-dedup SQL.
    "q_dedup_bloom" ->
      """WITH d AS (SELECT doc_id, source, md5(text) AS h FROM documents),
        |prior AS (SELECT DISTINCT h FROM d WHERE source <> 'src1')
        |SELECT doc_id, h, dup_prior, first_in_batch,
        |  (dup_prior = 0 AND first_in_batch = 1)::INT AS ingest
        |FROM (
        |  SELECT doc_id, h,
        |    (h IN (SELECT h FROM prior))::INT AS dup_prior,
        |    (row_number() OVER (PARTITION BY h ORDER BY doc_id) = 1)::INT
        |      AS first_in_batch
        |  FROM d WHERE source = 'src1')""".stripMargin,
    // same edge mining (rare word-3-grams shared >= 3), closed into
    // components with a recursive CTE instead of label propagation
    "q_dedup_cc" ->
      """WITH RECURSIVE sh AS (
        |  SELECT DISTINCT doc_id, g FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(l)-1),
        |      i -> l[i]||' '||l[i+1]||' '||l[i+2])) AS g
        |    FROM (SELECT doc_id, string_split(text,' ') AS l FROM documents)
        |    WHERE len(l) >= 3)),
        |rare AS (SELECT g FROM sh GROUP BY g HAVING count(*) <= 50),
        |shr AS (SELECT sh.doc_id, sh.g FROM sh JOIN rare USING (g)),
        |pairs AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb
        |  FROM shr a JOIN shr b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |edges AS (SELECT ida AS src, idb AS dst FROM pairs
        |          UNION ALL SELECT idb, ida FROM pairs),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT re.id, e.dst FROM reach re JOIN edges e ON e.src = re.r)
        |SELECT id AS doc_id, min(r) AS comp, (min(r) = id)::INT AS is_canonical
        |FROM reach GROUP BY id""".stripMargin,
    // Same recursive closure as q_dedup_cc, then keep-best-quality
    // per cluster (every doc labeled, singletons included) — the
    // logit expression is SelectionQueries' hashed-model scoring.
    "q_dedup_keep_best" ->
      s"""WITH RECURSIVE sh AS (
        |  SELECT DISTINCT doc_id, g FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(l)-1),
        |      i -> l[i]||' '||l[i+1]||' '||l[i+2])) AS g
        |    FROM (SELECT doc_id, string_split(text,' ') AS l FROM documents)
        |    WHERE len(l) >= 3)),
        |rare AS (SELECT g FROM sh GROUP BY g HAVING count(*) <= 50),
        |shr AS (SELECT sh.doc_id, sh.g FROM sh JOIN rare USING (g)),
        |pairs AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb
        |  FROM shr a JOIN shr b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |edges AS (SELECT ida AS src, idb AS dst FROM pairs
        |          UNION ALL SELECT idb, ida FROM pairs),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT re.id, e.dst FROM reach re JOIN edges e ON e.src = re.r),
        |cmp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
        |scored AS (
        |  SELECT doc_id, ${SelectionQueries.logitSql} AS logit
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)),
        |lab AS (
        |  SELECT d.doc_id, coalesce(cmp.comp, d.doc_id) AS comp
        |  FROM documents d LEFT JOIN cmp ON cmp.id = d.doc_id)
        |SELECT lab.doc_id, lab.comp, scored.logit,
        |  (row_number() OVER (PARTITION BY lab.comp
        |     ORDER BY scored.logit DESC, lab.doc_id) = 1)::INT AS is_kept
        |FROM lab JOIN scored USING (doc_id)""".stripMargin,
    "q_mix_sources" ->
      """SELECT source, w, count(*) AS n_total, sum(kept)::BIGINT AS n_kept
        |FROM (
        |  SELECT source,
        |    CASE substr(source, 4)::INT % 4 WHEN 0 THEN 1.0 WHEN 1 THEN 0.5
        |         WHEN 2 THEN 0.25 ELSE 0.1 END AS w,
        |    (('0x' || substr(md5('mix:' || doc_id::VARCHAR || ':' || text), 1, 2))::INT
        |      < CASE substr(source, 4)::INT % 4 WHEN 0 THEN 1.0 WHEN 1 THEN 0.5
        |             WHEN 2 THEN 0.25 ELSE 0.1 END * 256)::INT AS kept
        |  FROM documents)
        |GROUP BY source, w""".stripMargin,
    "q_contamination" ->
      """WITH g AS (
        |  SELECT doc_id, source, unnest(list_distinct(list_transform(
        |    range(1, len(l) - 3),
        |    i -> l[i]||' '||l[i+1]||' '||l[i+2]||' '||l[i+3]||' '||l[i+4]))) AS g
        |  FROM (SELECT doc_id, source, string_split(text,' ') AS l FROM documents)
        |  WHERE len(l) >= 5),
        |bench AS (SELECT DISTINCT g FROM g WHERE source = 'src0')
        |SELECT doc_id, count(*) AS n_hits
        |FROM g JOIN bench USING (g)
        |WHERE source <> 'src0'
        |GROUP BY doc_id""".stripMargin,
    "q_dedup_cc_edges" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, g FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(l)-1),
        |      i -> l[i]||' '||l[i+1]||' '||l[i+2])) AS g
        |    FROM (SELECT doc_id, string_split(text,' ') AS l FROM documents)
        |    WHERE len(l) >= 3)),
        |rare AS (SELECT g FROM sh GROUP BY g HAVING count(*) <= 50),
        |shr AS (SELECT sh.doc_id, sh.g FROM sh JOIN rare USING (g))
        |SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS shared
        |FROM shr a JOIN shr b ON a.g = b.g AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 3""".stripMargin,
    // Same brute-force verify as q_dedup_minhash: the two queries pin
    // that BOTH standard blockers (minhash-LSH, simhash bands) reach
    // the full true-pair set on this corpus.
    "q_dedup_simhash_v" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        |              WHERE len(string_split(text, ' ')) >= 3),
        |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(
        |         generate_series(1, len(tk) - 2),
        |         i -> ('0x' || substr(md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]),
        |               1, 15))::BIGINT)) AS sh
        |       FROM toks),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS n_inter
        |          FROM sh x JOIN sh y ON y.sh = x.sh AND y.doc_id > x.doc_id
        |          GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter) >= 0.98""".stripMargin,
    "q_dedup_paragraph" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |chunks AS (
        |  SELECT doc_id, i AS idx,
        |    array_to_string(tk[(i*16+1):(i*16+16)], ' ') AS chunk
        |  FROM toks, unnest(generate_series(0, (len(tk) - 1) // 16)) AS t(i)
        |  WHERE array_to_string(tk[(i*16+1):(i*16+16)], ' ') <> ''),
        |marked AS (
        |  SELECT doc_id, idx, chunk,
        |    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rn
        |  FROM chunks)
        |SELECT doc_id, count(*) AS n_chunks,
        |  sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
        |  coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY idx), '')
        |    AS kept_text
        |FROM marked GROUP BY doc_id""".stripMargin,
    "q_shard_assign" ->
      """WITH keyed AS (
        |  SELECT doc_id, md5('shard:' || doc_id::VARCHAR) AS k
        |  FROM documents)
        |SELECT doc_id,
        |  ('0x' || substr(k, 1, 4))::INT % 8 AS shard,
        |  row_number() OVER (
        |    PARTITION BY ('0x' || substr(k, 1, 4))::INT % 8
        |    ORDER BY k, doc_id) AS pos
        |FROM keyed""".stripMargin,
    "q_split_hash" ->
      """SELECT doc_id, b AS bucket,
        |  CASE WHEN b < 204 THEN 'train' WHEN b < 230 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        ('0x' || substr(md5(doc_id::VARCHAR || ':' || text), 1, 2))::INT AS b
        |      FROM documents)""".stripMargin,
    "q_pack_sequences" ->
      """WITH c AS (
        |  SELECT doc_id, source, len(string_split(text,' '))::BIGINT AS n_tok,
        |    coalesce(sum(len(string_split(text,' '))) OVER (
        |      PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum
        |  FROM documents)
        |SELECT doc_id, source, n_tok,
        |  (cum // 512)::BIGINT AS start_seq, (cum % 512)::BIGINT AS start_off,
        |  ((cum + n_tok - 1) // 512)::BIGINT AS end_seq
        |FROM c""".stripMargin,
    "q_text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS l FROM documents
        |           WHERE len(string_split(text,' ')) >= 3),
        |g2 AS (SELECT doc_id, unnest(list_transform(range(1, len(l)),
        |         i -> l[i]||' '||l[i+1])) AS g FROM t),
        |g3 AS (SELECT doc_id, unnest(list_transform(range(1, len(l)-1),
        |         i -> l[i]||' '||l[i+1]||' '||l[i+2])) AS g FROM t),
        |a2 AS (SELECT doc_id, max(c)::DOUBLE / sum(c) AS top2_frac,
        |         sum(c)::BIGINT AS n2
        |       FROM (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1,2)
        |       GROUP BY 1),
        |a3 AS (SELECT doc_id,
        |         coalesce(sum(CASE WHEN c > 1 THEN c END), 0)::DOUBLE / sum(c)
        |           AS dup3_frac,
        |         sum(c)::BIGINT AS n3
        |       FROM (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1,2)
        |       GROUP BY 1)
        |SELECT a2.doc_id, n2, top2_frac, n3, dup3_frac,
        |  (top2_frac <= 0.20)::INT AS r_top2,
        |  (dup3_frac <= 0.18)::INT AS r_dup3,
        |  (top2_frac <= 0.20 AND dup3_frac <= 0.18)::INT AS keep
        |FROM a2 JOIN a3 USING (doc_id)""".stripMargin,
    "q_text_redact" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(
        |    text || ' contact user' || doc_id || '@example.com or +1 (555) 01'
        |         || (doc_id % 100) || ' at 10.0.' || (doc_id % 256) || '.7',
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\+?[0-9][0-9()\-\s]{6,}[0-9]', '<PHONE>', 'g') AS redacted,
        |  len(regexp_extract_all(
        |    text || ' contact user' || doc_id || '@example.com or +1 (555) 01'
        |         || (doc_id % 100) || ' at 10.0.' || (doc_id % 256) || '.7',
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::INT AS n_email,
        |  len(regexp_extract_all(
        |    text || ' contact user' || doc_id || '@example.com or +1 (555) 01'
        |         || (doc_id % 100) || ' at 10.0.' || (doc_id % 256) || '.7',
        |    '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b'))::INT AS n_ip
        |FROM documents""".stripMargin,
    "q_text_gopher" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    len(string_split(text, ' ')) AS n_tok,
        |    list_sum(list_transform(string_split(text, ' '), x -> length(x)))::DOUBLE
        |      / len(string_split(text, ' ')) AS awl,
        |    len(list_filter(string_split(text, ' '),
        |        x -> regexp_matches(x, '[a-zA-Z]')))::DOUBLE
        |      / len(string_split(text, ' ')) AS alpha_ratio,
        |    len(list_filter(string_split(text, ' '),
        |        x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS stop_hits
        |  FROM documents)
        |SELECT doc_id, n_tok, awl, alpha_ratio, stop_hits,
        |  (n_tok >= 30)::INT AS r_len,
        |  (awl >= 3.0 AND awl <= 10.0)::INT AS r_awl,
        |  (alpha_ratio >= 0.9)::INT AS r_alpha,
        |  (stop_hits >= 1)::INT AS r_stop,
        |  (n_tok >= 30 AND awl >= 3.0 AND awl <= 10.0
        |   AND alpha_ratio >= 0.9 AND stop_hits >= 1)::INT AS keep
        |FROM m""".stripMargin,
    "q_text_stats" ->
      """SELECT doc_id,
        |  length(text) AS n_char,
        |  len(string_split(text, ' ')) AS n_tok,
        |  len(list_distinct(string_split(text, ' '))) AS nd_tok,
        |  list_sum(list_transform(string_split(text, ' '), x -> length(x)))::DOUBLE
        |    / len(string_split(text, ' ')) AS avg_tok_len,
        |  len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the', 'a', 'of', 'and', 'to')))::DOUBLE
        |    / len(string_split(text, ' ')) AS stop_ratio,
        |  len(regexp_extract_all(text, '[.,!?]'))::DOUBLE / length(text) AS punct_ratio
        |FROM documents""".stripMargin,
    // Simhash blocking re-derived end to end (upgraded from rows-only
    // in round 10): same FNV/vote machinery as q_text_fingerprint's
    // oracle, band split derived from count(documents) by the SAME
    // adaptive rule as adaptiveSimhashBands (first w in 4/8/16/32
    // with nDocs <= 2^w; 500 gate docs -> 4 bands of 16 bits), so the
    // oracle tracks the Spark side at any scale factor instead of
    // silently mismatching off the gate corpus. Pair emitted once per
    // any equal band (DISTINCT ≡ the plan's first-equal-band rule),
    // hd via bit_count(xor). Verified pair-for-pair (2,483 rows) vs
    // the codegen'd expressions before landing.
    "q_dedup_simhash" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tk
        |  FROM documents),
        |th AS (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(14695981039346656037::HUGEINT,
        |        list_transform(range(1, length(tk) + 1),
        |          i -> ascii(substr(tk, i, 1))::BIGINT)),
        |      (h, b) -> (((h - h % 256) + xor((h % 256)::BIGINT, b)::HUGEINT)
        |                 * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT) AS h
        |  FROM tok),
        |bits AS (
        |  SELECT doc_id, b.bit,
        |    sum(CASE WHEN (h // (2 ** b.bit)::HUGEINT) % 2 = 1 THEN 1 ELSE -1 END) AS vote
        |  FROM th, (SELECT unnest(range(0, 64)) AS bit) b
        |  GROUP BY doc_id, b.bit),
        |sigs AS (
        |  SELECT d.doc_id,
        |    coalesce((SELECT sum(CASE WHEN vote > 0 THEN (2 ** bit)::HUGEINT ELSE 0::HUGEINT END)
        |              FROM bits WHERE bits.doc_id = d.doc_id), 0::HUGEINT) AS usig
        |  FROM documents d),
        |params AS (
        |  SELECT w, 64 // w AS nb FROM (
        |    SELECT CASE WHEN n <= 16 THEN 4 WHEN n <= 256 THEN 8
        |                WHEN n <= 65536 THEN 16 ELSE 32 END AS w
        |    FROM (SELECT count(*) AS n FROM documents))),
        |bands AS (
        |  SELECT doc_id, usig, b.bd,
        |    ((usig // (2 ** (p.w * b.bd))::HUGEINT) % (2 ** p.w)::HUGEINT)::BIGINT AS bval
        |  FROM sigs, params p, (SELECT unnest(range(0, 16)) AS bd) b
        |  WHERE b.bd < p.nb),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.usig AS ua, b.usig AS ub
        |  FROM bands a JOIN bands b ON a.bd = b.bd AND a.bval = b.bval AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b,
        |  bit_count(xor(
        |    CASE WHEN ua >= 9223372036854775808::HUGEINT THEN (ua - 18446744073709551616::HUGEINT)::BIGINT ELSE ua::BIGINT END,
        |    CASE WHEN ub >= 9223372036854775808::HUGEINT THEN (ub - 18446744073709551616::HUGEINT)::BIGINT ELSE ub::BIGINT END))::INT AS hd
        |FROM pairs
        |WHERE bit_count(xor(
        |    CASE WHEN ua >= 9223372036854775808::HUGEINT THEN (ua - 18446744073709551616::HUGEINT)::BIGINT ELSE ua::BIGINT END,
        |    CASE WHEN ub >= 9223372036854775808::HUGEINT THEN (ub - 18446744073709551616::HUGEINT)::BIGINT ELSE ub::BIGINT END)) <= 16""".stripMargin,
    // FNV-1a re-derived byte-for-byte in SQL (the corpus is pure
    // ASCII, verified: 0 docs where octet_length <> length): HUGEINT
    // fold with mod-2^64 wraparound, xor emulated on the low byte
    // (b < 256), simhash votes per bit via an exact 2**bit power.
    // Upgraded from rows-only in round 10 — bit-exact vs the native
    // codegen'd Fingerprint64/SimHash64 expressions.
    "q_text_fingerprint" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(14695981039346656037::HUGEINT,
        |        list_transform(range(1, length(text) + 1),
        |          i -> ascii(substr(text, i, 1))::BIGINT)),
        |      (h, b) -> (((h - h % 256) + xor((h % 256)::BIGINT, b)::HUGEINT)
        |                 * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT) AS hf
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tk
        |  FROM documents),
        |th AS (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(14695981039346656037::HUGEINT,
        |        list_transform(range(1, length(tk) + 1),
        |          i -> ascii(substr(tk, i, 1))::BIGINT)),
        |      (h, b) -> (((h - h % 256) + xor((h % 256)::BIGINT, b)::HUGEINT)
        |                 * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT) AS h
        |  FROM tok),
        |bits AS (
        |  SELECT doc_id, b.bit,
        |    sum(CASE WHEN (h // (2 ** b.bit)::HUGEINT) % 2 = 1 THEN 1 ELSE -1 END) AS vote
        |  FROM th, (SELECT unnest(range(0, 64)) AS bit) b
        |  GROUP BY doc_id, b.bit),
        |sh AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN vote > 0 THEN (2 ** bit)::HUGEINT ELSE 0::HUGEINT END) AS hs
        |  FROM bits GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CASE WHEN fp.hf >= 9223372036854775808::HUGEINT
        |       THEN (fp.hf - 18446744073709551616::HUGEINT)::BIGINT
        |       ELSE fp.hf::BIGINT END AS fp64,
        |  CASE WHEN coalesce(sh.hs, 0::HUGEINT) >= 9223372036854775808::HUGEINT
        |       THEN (sh.hs - 18446744073709551616::HUGEINT)::BIGINT
        |       ELSE coalesce(sh.hs, 0::HUGEINT)::BIGINT END AS sh64
        |FROM documents d JOIN fp USING (doc_id) LEFT JOIN sh USING (doc_id)""".stripMargin,
    "q_text_langid" ->
      """WITH s AS (SELECT doc_id, lang,
        |  len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and'))) AS s_en,
        |  len(list_filter(string_split(text, ' '), x -> x IN ('der','und','die','das'))) AS s_de,
        |  len(list_filter(string_split(text, ' '), x -> x IN ('le','la','et','les'))) AS s_fr,
        |  len(list_filter(string_split(text, ' '), x -> x IN ('el','los','y','que'))) AS s_es,
        |  len(regexp_extract_all(text, '[一-鿿]')) AS s_zh
        |FROM documents)
        |SELECT doc_id, lang, s_en, s_de, s_fr, s_es, s_zh,
        |  CASE WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) = 0 THEN 'und'
        |       WHEN s_zh = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'zh'
        |       WHEN s_en = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'en'
        |       WHEN s_de = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'de'
        |       WHEN s_fr = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'fr'
        |       ELSE 'es' END AS lang_guess
        |FROM s""".stripMargin,
    "q_text_tokens" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_ws,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_bpe
        |FROM documents""".stripMargin,
    "q_dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_dup
        |FROM documents GROUP BY md5(text)""".stripMargin,
    // Brute-force exact Jaccard over ALL pairs — matches the Spark
    // side because LSH blocking recall at the corpus's true-dup
    // similarity (~0.99) is 1-4e-12 and every output row is verified
    // with the same exact Jaccard before emission.
    "q_dedup_minhash" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        |              WHERE len(string_split(text, ' ')) >= 3),
        |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(
        |         generate_series(1, len(tk) - 2),
        |         i -> ('0x' || substr(md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]),
        |               1, 15))::BIGINT)) AS sh
        |       FROM toks),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS n_inter
        |          FROM sh x JOIN sh y ON y.sh = x.sh AND y.doc_id > x.doc_id
        |          GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter) >= 0.4""".stripMargin,
    "q_dedup_ngram" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        |              WHERE len(string_split(text, ' ')) >= 3),
        |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(
        |         generate_series(1, len(tk) - 2),
        |         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
        |       FROM toks),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT x.doc_id, count(*) AS n_inter
        |          FROM sh x JOIN sh y ON y.doc_id = x.doc_id + 1 AND y.sh = x.sh
        |          GROUP BY x.doc_id)
        |SELECT sa.doc_id AS id_a, sa.doc_id + 1 AS id_b,
        |  coalesce(n_inter, 0)::DOUBLE / (sa.n_sh + sb.n_sh - coalesce(n_inter, 0)) AS jaccard
        |FROM sizes sa
        |JOIN sizes sb ON sb.doc_id = sa.doc_id + 1
        |LEFT JOIN inter ON inter.doc_id = sa.doc_id""".stripMargin)
}
