package graft.tools

import java.io.PrintWriter

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Writes EXPLAINS.md: the formatted physical plans of the headline
  * queries, with the scale-relevant properties called out — the
  * "is this the plan you'd want at 100 TB" evidence in one place.
  */
object DumpPlans {
  val headline: Seq[(String, String)] = Seq(
    "q_tpch_q5" -> "6-way join: dims broadcast, facts shuffle once per key, partial+final aggs",
    "q_tpch_q18" -> "agg-in-semijoin: pre-aggregated CTE drives a left-semi before the wide join",
    "q1_agg" -> "pushdown: shipdate filter + 8-column pruning reach the parquet scan",
    "q_topn" -> "rank limit pushed into the shuffle (WindowGroupLimit)",
    "q_window_topn" -> "window-scoped rank keeps the WindowGroupLimit pushdown",
    "q_asof_native" -> "custom AsOfJoinExec: EnsureRequirements inserts co-partitioning exchanges + (key,time) sorts",
    "q_dedup_simhash" -> "multi-band blocking: one equi-join on (band, value), first-band filter instead of dedup shuffle",
    "q_sim_sig_rerank" -> "signature prefilter: sigs materialize behind one exchange; cost model = one linear popcount corpus scan PER QUERY of a BOUNDED batch (nQueries=100 cap — r4's corpus-fraction query set made this O(n^2/50)), then top-C exact rerank on C=64 candidates",
    "q_sql_match_recognize" -> "MATCH_RECOGNIZE: DEFINE predicates below the single PARTITION BY exchange",
    "q_sim_ivf_ann" -> "IVF: cached sample-trained centroids broadcast; per-cell candidate join + top-k window, no all-pairs",
    "q_avro_roundtrip" -> "avro DSv2 scan: one reader per partition-sized file, column pruning into the reader",
    "q_changelog_antijoin" -> "semi/anti changelog machine: one window shuffle derives retractions, one keyed fold, net by signed count",
    "q_sql_temporal_join" -> "event-time FOR SYSTEM_TIME: SCD-2 interval view (one lead window) + equi join with range residual, no cartesian",
    "q_cdc_debezium" -> "CDC decode: from_json + conditional explode in one codegen span over the text scan, no shuffle before the signed aggregate",
    "q_sql_window_topn" -> "window TVF -> agg -> rank filter: two-phase hash agg under one (window,key) shuffle, rank pushed to WindowGroupLimit",
    "q_sql_window_join" -> "two windowed relations: each aggregates under its own shuffle, then one equi-join on (window bounds, key) reuses AQE-planned sides",
    "q_tpch_q21" -> "correlated EXISTS + NOT EXISTS: both decorrelate to one semi and one anti hash join on l_orderkey, no per-row subquery",
    "q_jdbc_roundtrip" -> "JDBC scan (JDBCRelation) feeding a broadcast join: 4 stride-partitioned reads, agg partial+final on top",
    "q_range_join" -> "key-less range join: bucket-id hash join + residual range check, no BroadcastNestedLoopJoin",
    "q_multimodal_ann" -> "media ANN via bucketed multi-probe LSH: (table,bucket) equi hash join replaces the r3 broadcast-NLJ all-pairs; per-query cost = candidate fraction",
    "q_raw_roundtrip" -> "raw format: binaryFile scan decoding one file = one record (codegen'd RawDecode); codec half runs map-only inside one WholeStageCodegen span",
    "q_pb_roundtrip" -> "protobuf wire codec: encode+decode in one codegen'd projection (subexpression-eliminated), map-only into a two-phase agg — no shuffle before the partials",
    "q_cep_classifier" -> "CLASSIFIER()/MATCH_NUMBER(): same single PARTITION BY exchange as every MATCH_RECOGNIZE plan; measures evaluate on the completed match, no extra pass",
    "q_bucketed_join" -> "co-bucketed metastore tables: the scans carry the join distribution (Bucketed: true) — zero exchanges on the join key; only the final aggregate shuffles. (Dumped with broadcast off: at sf0.01 the small side would broadcast and hide the co-located shape; at 100 TB both sides are facts and THIS is the plan)",
    "q_dedup_cosine" -> "embedding near-dup mining: (table,bucket) self-equi-join with width-adaptive buckets — candidate volume ~linear, exact cosine filter on candidates only, no all-pairs",
    "q_pb_nested" -> "protobuf composites: nested message/packed repeated/map encode+decode stay one codegen'd map-only projection — composite shapes add zero shuffles over the flat codec",
    "q_avro_registry" -> "avro-confluent envelope: registry hit once per distinct schema id per task (cached datum readers), then map-only decode into a two-phase agg",
    "q_avro_glue" -> "avro-glue envelope: version-UUID framing + per-record zlib body, decode evaluated ONCE per row (single avro_glue_decode in the plan), map-only into a two-phase agg — zlib JNI is the cost and it scales embarrassingly parallel",
    "q_dedup_cc_edges" -> "near-dup candidate mining, two shuffles total: per-doc distinct shingles map-side (no dedup shuffle), ONE groupBy(shingle) gathering doc lists through the capped collector (ObjectHashAggregate partial+final; a stop-shingle in 10^8 docs costs the same 51-slot buffer as one in 51 — the skew cap), i<j pairs explode from each list (<= df^2/2 per shingle, never corpus-quadratic), one final pair-count aggregate. These edges feed the iterative CC closure (q_dedup_cc)",
    "q_pack_sequences" -> "sequence packing: ONE window per source shard (no global sort) — each shard's token stream chunks into 512-token sequences independently, the shape a sharded 100 TB corpus packs in anyway",
    "q_split_hash" -> "deterministic md5 split: pure map-only projection in one WholeStageCodegen span — reproducible train/val/test assignment at any scale, no shuffle at all",
    "q_text_repetition" -> "repetition scoring: two explode->two-phase-agg branches (2-grams, 3-grams) joined on doc_id — shingle-stream shuffle volume, same linear shape as the dedup shinglers",
    "q_catalog_federation" -> "jdbc catalog federation: the DSv2 catalog path pushes the WHOLE aggregate into the external engine (PushedAggregates COUNT/SUM + PushedGroupByExpressions — the dump shows Derby executing the GROUP BY) — at scale the federated DB returns 25 rows, not the table",
    "q_lm_perplexity" -> "corpus bigram LM scoring: gram-count aggregates are partial+final (shuffles carry distinct grams, not the token stream), V is a broadcast 1-row crossjoin (no driver action), doc bigrams equi-join the model tables on natural keys — at 100 TB the Zipf-truncated model broadcasts instead",
    "q_sample_stratified" -> "stratified sample: rank<=k over deterministic md5 order plans as WindowGroupLimit — map-side top-k per stratum BEFORE the exchange, so a giant stratum never sorts corpus-wide",
    "q_tfidf_topk" -> "TF-IDF keywords: tf and df fold from ONE (doc,term) aggregate, integer-only rank cut via WindowGroupLimit; float score rides along but never orders — cross-engine-stable top-k",
    "q_dedup_incremental" -> "incremental dedup vs fingerprint store: store distinct + left join on h + per-hash first-row window over the batch only — with the store bucketed on h, the store side is exchange-free; the day's batch shuffles only itself",
    "q_dedup_minhash_inc" -> "incremental NEAR-dup dedup (dedup today's crawl against the corpus): one shingle pass signs store+batch, the banded LSH join keeps the BATCH on the probe side and restricts partners to store docs or smaller batch ids — store×store pairs, the corpus-quadratic bulk of an unrestricted self-join, never form; estimate prefilter + exact-Jaccard verify over candidates only; at scale the store's banded signatures are a materialized table bucketed on (band, band_hash) and the daily probe shuffles only the batch",
    "q_text_bm25" -> "BM25 ranked retrieval: ONE corpus-token shuffle builds the (doc,dl,term,tf) INDEX table (dl carried through the aggregate as a functionally-dependent key — no doc-length join), which PERSISTS because its three consumers (probe, document frequencies, corpus stats) otherwise specialize into three corpus re-tokenizations (constraint inference and column pruning defeat exchange reuse — RetrievalSpec demonstrates); the 8-term query table and 1-row stats broadcast, the (query,doc) sum partial-aggregates map-side, and no float ever orders a cut (the tfidf ulp lesson) — a deployment materializes the index as a table (the postings form) and probes it",
    "q_text_postings" -> "inverted-index postings for the df band [2,400]: the only exchange carries (term,doc_id) pairs for the banded slice; the band's upper cap is the skew contract — stop-dense terms (the one-reducer-materializes-half-the-corpus hazard) are cut before the collect_list, bounding every postings array by the cap",
    "q_text_pmi" -> "PMI collocations: unigram and adjacent-bigram count aggregates whose exchanges carry DISTINCT grams (partial agg collapses the token stream map-side), the top-k cut is INTEGER-ordered TakeOrdered (cb desc, words) BEFORE the unigram joins — so the joins and the float PMI computation touch k rows, and the unigram side stays vocab-sized (broadcastable under a size gate at deploy time)",
    "q_vocab_oov" -> "vocab induction + OOV: unpartitioned rank<=V plans as WindowGroupLimit (map tasks forward local top-V, the merge sees partitions*V rows, never the vocabulary), induced vocab broadcasts back against the token stream — map-side OOV fold at any corpus size",
    "q_curriculum_bins" -> "curriculum length-deciles without a global sort: the corpus-sized work is ONE groupBy(n_tok) aggregate; the only Window runs over the tiny length histogram, and the bin map returns as a BroadcastHashJoin — no single-partition ntile anywhere",
    "q_embed_rp" -> "Achlioptas random projection: one map-only projection stage, no shuffle, no stored matrix — the ±1 entries derive from md5(i,j) ONCE per executor JVM (VectorOps.rpProject cache) and the row body is a single whole-stage-codegen'd static call (the r8 interpreted-HOF formulation paid 1,024 md5 calls per row: 2.6 s at sf0.1 vs 0.12 s now). A 100 TB corpus projects at scan speed with zero broadcast state",
    "q_dedup_minhash" -> "MinHash+LSH with exact-Jaccard VERIFY: banded LSH blocking (shuffles carry |docs|·k signature longs, never all-pairs), then the exact recount runs ONLY over candidate docs — the broadcast semi-join restricts the shingle explode to the duplicate slice of the corpus, so verify cost scales with dup density, not corpus size; output is the verified exact Jaccard (oracle-checkable), the estimate stays internal",
    "q_dedup_simhash_v" -> "SimHash blocking + exact-Jaccard verify in the near-identical regime: 8 bands of 8 bits with the pigeonhole-consistent hd<=7 cut — every pair below Hamming 8 is BOTH guaranteed found (some band clean) and kept, so the cut discards only chance collisions (hd~32) before the verify recount; same verify-stage economics as q_dedup_minhash",
    "q_dedup_paragraph" -> "paragraph-level exact dedup (RefinedWeb/Gopher boilerplate cut): chunk explode map-side, keep-first as rank=1 over (chunk) — WindowGroupLimit forwards one row per chunk per map task BEFORE the exchange — then one groupBy(doc) reassembles survivors in order; two shuffles of the chunk stream, no corpus-wide sort",
    "q_shard_assign" -> "deterministic training-shard assignment: the md5 key IS the global shuffle (engine- and rerun-reproducible), realized shard-locally — the window partitions by shard, so each shard sorts 1/nShards of the corpus (the per-output-file sort a sharded writer already pays) and shard count scales with the cluster; no global sort",
    "q_pipeline_e2e" -> "five-stage curation pipeline (normalize → quality gate → dedup → split → report) composed from the individual operators: Catalyst fuses the map-only stages into the scan's codegen span, so the whole pipeline costs one corpus scan + the dedup shuffle + a 3-row aggregate — composition is free, not five jobs",
    "q_lm_ppl_truncated" -> "truncated-broadcast LM: the doc bigram stream never shuffles — model lookups are BroadcastHashJoins, per-doc partials collapse map-side (explode keeps a doc's bigrams co-located), so the only exchanges under the scoring side carry one row per doc; the model aggregates shuffle distinct grams only. The broadcast hint is SIZE-GATED (model rows x 64 B vs a 10 MB cap, knownModelRows from catalog stats at scale) — a model past the cap falls back to plain exchange joins instead of an executor-OOMing forced broadcast",
    "q_quality_classifier" -> "hashed-linear-model quality scoring (the fastText-style gate): the whole model evaluation — token hash → 1024-way feature bucket → integer weight → exact BIGINT fold — is ONE codegen'd projection; map-only, no shuffle, no UDF, and a learned model binds as a 2^k-entry broadcast with the identical plan shape",
    "q_token_budget" -> "token-budget selection WITHOUT a sort-by-score: the corpus-sized work is one groupBy(pbucket) aggregate (<= 256 rows by construction), the cumulative keep/drop fold runs on that bounded histogram, and per-bucket flags return as a BroadcastHashJoin — the naive ordered-cumsum is a single-partition window over the corpus, the 100 TB anti-pattern this plan avoids. The scored projection is cached (InMemoryRelation in the dump): it feeds both the histogram and the output join, and recomputing the md5-heavy scoring measured ~2x wall",
    "q_text_winnow" -> "winnowing fingerprints (Schleimer et al. SIGMOD'03): gram hashing, the w-window minima and the distinct fold all evaluate INSIDE one projection via higher-order functions — no explode, no shuffle; a 100 TB corpus fingerprints at scan speed, emitting ~2/(w+1) of gram hashes as the fingerprint set",
    "q_semdedup" -> "SemDeDup (Abbas et al. 2023): LSH-blocked cosine pair mining (width-adaptive buckets, never all-pairs) + the hash-min/pointer-jump CC closure at graph-sized parallelism + one left join back to the corpus — semantic cluster collapse for the embedding modality with the same 100 TB structure as the text-side q_dedup_cc",
    "q_dedup_bloom" -> "Bloom-prefiltered incremental dedup: the 128 KiB filter builds as ONE distributed bit_or aggregate over the store's key positions and BROADCASTS to the batch — the store-sized exact join then runs only for the maybe-dup slice (definite-new rows bypass it); no false negatives by construction, so the output (and oracle) is exactly q_dedup_incremental's",
    "q_kmeans" -> "deterministic dataflow k-means (Lloyd's): assignment is MAP-ONLY — k·d centroid literals ride in the plan and the argmin is one codegen'd struct-min expression per row, no join — and the update's only exchange carries k·d partial (cell,dim) sums per partition, never the corpus; integer quantization makes every distance an exact BIGINT, so the clustering is engine-reproducible (and oracle-checkable), which library k-means is not",
    "q_dedup_keep_best" -> "cluster keep-best: the CC closure labels only clustered docs (a tiny table next to the corpus), every doc left-joins its label, quality scores ride the same scan, and the per-cluster argmax is ONE comp-partitioned window — each doc crosses the wire once; no corpus sort, no second scan",
    "q_sim_ivf_det" -> "deterministic IVF ANN: the probe ranks cells MAP-ONLY against k·d centroid literals (array_sort over codegen'd struct distances — no centroid join), candidate volume ≈ nProbe/nCells of the corpus via one broadcast equi-join on cell, exact cosine + WindowGroupLimit top-k on candidates only",
    "q_pipeline_select" -> "selection-stack composition (quality gate → token budget → shard assign → report): gate + scoring fuse into the scan's codegen span, the budget histogram is one bounded aggregate broadcast back, and the report aggregates the SELECTED slice — one corpus scan, a <=256-row exchange, one small final agg; the cached gated frame (InMemoryRelation) is the histogram/join dual-reference, the tokenBudget convention",
    "q_dedup_substring" -> "exact-substring dedup (Lee et al. ExactSubstr as dataflow): sliding 60-bit gram hashes explode inside the scan's projection, ONE hash-shuffle window ranks global occurrences, rank>1 gram starts collect per doc (collect_list bounded by doc length) and fold into MERGED removal intervals inside one projection, and the surviving text rebuilds in a map-side lambda testing each token position against those intervals — the corpus-wide suffix array replaced by one corpus-tokens-sized exchange",
    "q_chunk_overlap" -> "overlapping chunker: the stride sequence + slice explode lives entirely in the scan's projection — map-only, zero exchanges, stream-identical; a 100 TB corpus chunks at scan speed",
    "q_classifier_hashed" -> "hashed linear classifier, the fastText SERVING join: token explode → bucket hash → BroadcastHashJoin against the 256-row weight table → one doc-keyed two-phase agg; a trained model of any 2^k size binds into the same broadcast slot with zero plan change",
    "q_bpe_pairs" -> "BPE pair statistic: adjacent-pair explode collapses map-side (partial agg carries DISTINCT pairs, not the token stream) before one exchange + TakeOrdered top-k with lexicographic ties",
    "q_graph_pagerank" -> "PageRank round: ranks equi-join the degree-pre-joined edge table, per-target sums are partial+final — two edge-sized exchanges per round, degree computed ONCE; the rank chain is lazy and LINEAR (one consumer per round) so the whole fixed-iteration loop plans as a single job, only the multiply-read edge/node tables cache",
    "q_graph_triangles" -> "degree-ordered triangle count: orientation (low-degree -> high-degree endpoint) caps every node's out-degree at O(sqrt E), so the path-enumeration join e1(u,v)⋈e2(v,w) and the closing-edge join e3(u,w) are both bounded equi hash joins — the skew-killer that survives celebrity nodes at 100 TB; the support threshold keeps edge density scale-stable before any of it runs",
    "q_dsir_select" -> "DSIR importance selection: both hashed-ngram models are <=B-row aggregates (partial agg collapses the token stream to B buckets per map task BEFORE each exchange) and the scoring side is one BroadcastHashJoin + a doc-keyed two-phase agg — the corpus never shuffles wider than (doc_id, partials), the truncated-LM economics applied to data selection",
    "q_cluster_sample" -> "cluster-balanced sampling: the k-means fit's map-only assignment feeds a cell-partitioned rank<=2 that plans as WindowGroupLimit — map tasks forward only their local top-2 per cell, so no cluster ever sorts corpus-wide; the md5 ordering is the engine-reproducible pseudo-random pick",
    "q_dedup_fuzzy" -> "fuzzy edit-distance dedup: 8-gram blocking is one gram-hash aggregate (the df<=20 stop-gram cut kills boilerplate skew BEFORE pairing), the candidate self-join runs on rare grams only, and the threshold-banded Levenshtein verify (O(maxDist·len) early-exit DP) runs behind an explicit width-n exchange — a NUMBERED repartition is exempt from AQE's byte-based coalescing, which would otherwise fold the byte-small/CPU-heavy candidate batch onto one core — with a Generate barrier pinning the DP to ONE evaluation per pair (alias substitution was pushing it into the text join AND the projection); verify cost tracks candidates, never the corpus",
    "q_graph_cc" -> "graph connected components: the co-purchase edge mining feeds the dedup family's hash-min/pointer-jump closure — iterative equi-joins at graph-sized parallelism with per-round lineage truncation; the one operator family here that is deliberately NOT one job (open-ended fixpoint loop, convergence-checked per round)",
    "q_pack_bestfit" -> "best-fit sequence packing: repartition by shard + sort-within-partitions (shard, len desc) + one mapPartitions pass holding O(openBins) state — whole docs, minimized padding, no global sort; the genuinely-imperative per-partition case where mapPartitions is the right tool",
    "q_pipeline_curate" -> "curation funnel (gate → substring redaction → DSIR): the quality gate fuses into the scan, the redaction's gram exchange covers only the GATED slice, the DSIR models collapse the redacted token stream to <=1024 rows and broadcast back, and the funnel is four 1-row aggregates — three-operator composition without a corpus rescan",
    "q_graph_degree" -> "undirected degree: one distinct on the mined edge set + one count exchange over node keys — the smallest possible graph plan, and the building block every iterative query below pre-joins ONCE instead of recomputing per round",
    "q_graph_sssp" -> "bounded-hop SSSP (level-synchronous BFS): 6 unrolled relax-and-min rounds, each one frontier⋈edges equi-join + a per-node min — two edge-bounded exchanges per round; dist persists lazily per round because each round feeds TWO consumers (the relax join and the union), yet the whole loop still plans as ONE job; the open-ended variant (ssspFixpointOnEdges) switches to per-round localCheckpoint + convergence probe and unpersists behind itself",
    "q_graph_labelprop" -> "label propagation: each round is edges⋈labels + a (node,label) count + a per-node argmax window — all edge-bounded shuffles, frequency ties broken deterministically to the smallest label; the label chain is LINEAR (one consumer per round) so the fixed 3-round run plans as one job, same shape as pagerank",
    "q_graph_ppr" -> "personalized PageRank (random-walk-with-restart): identical one-job linear-chain loop as q_graph_pagerank — two edge-sized exchanges per round, degree pre-joined once — with teleport mass concentrated on the deterministic seed node; total mass stays exactly 1 per round (no dangling nodes by construction)",
    "q_tpcds_channels" -> "TPC-DS q5/q71 shape — three channel fact slices UNION ALL'd over one shared dim: each branch is its own parquet scan with the channel predicate PUSHED (PushedFilters per branch, 3-column ReadSchema), the dim side broadcasts, and the union feeds ONE partial+final aggregate — multi-fact-table consolidation without re-shuffling per channel",
    "q_tpcds_rollup_rank" -> "TPC-DS q36/q86 rank-within-parent: the rollup's Expand + two-phase agg collapse the fact stream FIRST, so the hierarchy-partitioned rank window runs over |brands|x|types| pre-aggregated rows — the repeated-ranking stage never touches corpus-sized data",
    "q_tpcds_returns_anti" -> "TPC-DS q16 shape — semi+anti chain: both probe sides reduce to orderkey SETS before touching orders (grouped-HAVING for the multi-supplier EXISTS, distinct for the returns NOT EXISTS), so the wide fact rows cross the wire exactly once through one left-semi + one left-anti hash join",
    "q_tpcds_except_chain" -> "TPC-DS q87 EXCEPT chain: every channel slice distincts down to custkeys BEFORE the set ops, so the two EXCEPTs shuffle key sets, never fact rows; the surviving (small) set joins the customer dim for the segment rollup",
    "q_tpcds_intersect" -> "TPC-DS q38 INTERSECT chain: customers in ALL three channels — each slice distincts to custkeys first (set membership, not multiplicity), the two INTERSECTs plan as semi joins over key sets, and only the surviving intersection touches the customer dim",
    "q_tpcds_yoy" -> "TPC-DS q11/q74 YoY self-join of one per-(customer,year) aggregate: the period filters sit on a GROUPING column, so Catalyst pushes them THROUGH the aggregate to each branch's scan — each side aggregates only its own year's rows (strictly less exchange traffic than agg-everything-then-ReuseExchange), the self-join moves |customers|-sized rows however large orders grows, and the growth CUT compares exact DECIMAL sums (fold-order independent — no float-ulp flap on the filter); the double ratio is projection-only output",
    "q_tpcds_timebands" -> "TPC-DS q88 shape (eight filtered COUNTs over disjoint time bands): the published SQL cross-joins eight scalar subqueries — eight fact scans in a naive plan; here each band is a sum(CASE ...) in ONE conditional-aggregate pass, so the fact table crosses the pipeline once, partials fold map-side, and the only exchange is eight longs per partition into a 1-row result",
    "q_graph_kcore" -> "bounded k-core peel: 6 synchronous peel rounds, each ONE degree aggregate + two left-semi joins — all edge-bounded exchanges; the quantity>=45 sparsifier is PUSHED to the parquet scan so the graph shrinks at the source; each round references the prior edge frame THREE times (degree agg feeding both semi joins + the join input), so the loop runs the DedupCluster eager discipline — per-round localCheckpoint truncating lineage, superseded round unpersisted, at most two cached frames (the lazy one-job trick measured 82 s vs 3 s under this fan-out)",
    "q_layout_zorder" -> "Z-order layout audit (the OPTIMIZE ZORDER move): 1-row min/max stats broadcast back IN-PLAN (no driver action), min-max-scale each dimension to an 8-bit cell with integer div, Morton-interleave in one codegen'd shift-or-mask projection, and aggregate the zone-map table per target file — the only exchanges carry the 1-row stats and ~256 file ids; at 100 TB the same zv feeds repartitionByRange at write time so every file covers ~1/16 of BOTH key ranges and zone maps prune either predicate",
    "q_heavy_hitters" -> "exact φ-frequent tokens at Misra–Gries memory bounds: phase 1 is ONE map-only corpus scan emitting ≤k survivors + 1 totals row per partition (bounded state however heavy the tail — the thing a plain groupBy's per-partition hash table can't promise), phase 2 re-scans with the candidate set broadcast so the only aggregate exchange carries candidate tokens, never the vocabulary; the final cut is an integer compare (cnt·phi > n) — zero false negatives by pigeonhole (k ≥ phi), zero false positives by exact recount",
    "q_text_entropy" -> "per-document char + token Shannon entropy: ONE map-only projection over two codegen'd native expressions (CharEntropy/TokenEntropy — histogram built per row inside the generated code, ASCII array fast path) — no explode, no shuffle, no aggregate; the quality-gate signal at parquet scan speed",
    "q_sim_pq_ann" -> "product quantization ANN (8x4-bit codes + ADC + exact rerank): the fit loop's only exchange carries (sub,cell,dim) partials (d·k rows per partition, the bounded iterate-broadcast), ENCODE is one map-only projection with the codebooks as plan literals (128 floats -> 8 nibbles, no shuffle), and scoring reads codes map-only too — the per-query ADC distance tables re-enter the plan as literal arrays, so adist is m array lookups + a sum; the shortlist WindowGroupLimit and the broadcast-semi rerank are the only wide steps, and every number in the output is exact BIGINT",
    "q_sample_weighted" -> "priority sampling (weight-proportional k-sample + unbiased subset-sum estimator): map-only key projection, then TakeOrderedAndProject — per-partition heaps of k+1 rows, driver merges heads, NO global sort and no corpus shuffle; the tau/estimator window runs over the k+1 surviving rows only, and the ordering key is one exactly-rounded IEEE division (arithmetic-only, so even the cut is engine-stable)")

  /** Per-query session overrides applied around the dump — used where
    * the sf0.01 plan would hide the at-scale shape (e.g. a
    * broadcastable small side masking a co-located bucketed join).
    */
  val dumpConf: Map[String, Seq[(String, String)]] = Map(
    "q_bucketed_join" -> Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1"))

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "/root/repo/EXPLAINS.md"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // explicit UTF-8: the platform default charset mangles non-ASCII
    // annotation text (C/POSIX locale writes '?')
    val w = new PrintWriter(new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(out), java.nio.charset.StandardCharsets.UTF_8))
    try {
      w.println("# EXPLAINS — headline physical plans (generated by graft.tools.DumpPlans)")
      w.println()
      w.println("Regenerate: `sbt \"runMain graft.tools.DumpPlans /root/testdata/sf0.01\"`.")
      headline.foreach { case (name, why) =>
        val overrides = dumpConf.getOrElse(name, Nil)
        val saved = overrides.map { case (k, _) => k -> spark.conf.getOption(k) }
        overrides.foreach { case (k, v) => spark.conf.set(k, v) }
        try {
          val df = graft.SparkEntry.queries(name)(spark, sfDir)
          w.println(s"\n## $name\n")
          w.println(s"**Scale property:** $why\n")
          w.println("```")
          w.println(df.queryExecution.explainString(ExplainMode.fromString("formatted")).trim)
          w.println("```")
        } finally saved.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      }
    } finally w.close()
    println(s"wrote $out")
    spark.stop()
  }
}
