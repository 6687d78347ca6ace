package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{FlinkFunctions => F}

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (ARRAY<FLOAT>, 64-dim) — north-star similarity-search operators.
  *
  * Scale design: the query set is small and broadcast; the corpus
  * streams through executors once (brute force), or is blocked by a
  * random-hyperplane LSH bucket first so each query only scans its
  * bucket (the IVF/LSH scale path). Cosine is a native codegen'd
  * expression (graft.functions.CosineSimilarity) — no UDF boxing on
  * the 100 TB path.
  */
object SimilarityQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** persist() only if this canonical plan isn't already cached — a
    * repeated invocation (bench passes share one session) would
    * otherwise re-register the same plan and warn.
    */
  private def persistOnce(df: DataFrame): DataFrame =
    if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE) df
    else df.persist()

  /** Brute-force cosine top-k: every 50th vector is a query; top-5
    * neighbors (excluding self) per query by exact cosine scan.
    */
  def cosineTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val scored = t(s, dir, "embeddings")
      .join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        F.cosineSimilarity(col("q_emb"), col("embedding")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.select(col("q_id"), col("vec_id"), col("cos"),
        row_number().over(w).as("rnk"))
      .filter(col("rnk") <= 5)
  }

  /** LSH-bucketed ANN with multi-table + multi-probe (round-1 single
    * table/probe recalled only ~half of brute force's top-5):
    * `tables` independent 8-bit hyperplane families index the corpus
    * (one bucket per table per vector); each query probes its own
    * bucket PLUS every Hamming-1 neighbor bucket in each table —
    * near-miss sign flips on one hyperplane no longer lose the
    * neighbor. Corpus-side cost is `tables`× the index; query-side
    * candidates are `tables`·(nBits+1) buckets ≈ (2·9)/256 ≈ 7% of
    * the corpus — still bucketed, still scales (multi-probe LSH,
    * Lv et al., VLDB'07).
    */
  def lshAnn(s: SparkSession, dir: String, tables: Int = 2, nBits: Int = 8): DataFrame =
    lshAnnOver(t(s, dir, "embeddings"), "vec_id", "embedding",
      col("vec_id") % 50 === 0, k = 5, tables = tables, nBits = nBits)

  /** Bucket width that holds per-bucket occupancy roughly constant as
    * the corpus grows — the same dial as the width-adaptive simhash
    * bands (TextQueries.adaptiveSimhashBands): 2^bits ≈ n/target,
    * clamped to [4, 24]. With radius-2 probing the candidate fraction
    * tables·(1 + b + C(b,2))/2^b VANISHES as b grows: ~0.22 at b=10
    * (5k vectors), ~1.3e-3 at b=16 (0.5M), ~1e-6 at b=24 (100M+) —
    * the property that keeps the bucketed path sub-linear per query
    * at 100 TB while a fixed width would either flood (too narrow)
    * or miss (too wide).
    */
  def adaptiveLshBits(n: Long, targetPerBucket: Long = 8): Int =
    math.max(4, math.min(24, math.ceil(
      math.log(math.max(1L, n / targetPerBucket).toDouble) / math.log(2)).toInt))

  /** Generic bucketed multi-probe LSH ANN over ANY (id, ARRAY<FLOAT>)
    * corpus — the reusable kernel behind [[lshAnn]] (text embeddings)
    * and the multimodal media-feature ANN. The corpus↔query join is an
    * EQUI join on (table, bucket) — a broadcast/shuffled HASH join, no
    * nested-loop all-pairs anywhere in the plan — so the per-query
    * cost stays the candidate fraction (tables·(nBits+1)/2^nBits of
    * the corpus), not |corpus|.
    *
    * Output: (q_id, <idCol>, cos, rnk) with rnk <= k.
    */
  def lshAnnOver(corpus: DataFrame, idCol: String, embCol: String,
      isQuery: org.apache.spark.sql.Column, k: Int,
      tables: Int = 2, nBits: Int = 8, probeRadius: Int = 1): DataFrame = {
    // __he: the vector CENTERED on its own mean, used for hashing
    // only (cosine ranking stays on the original). Structured feature
    // vectors (e.g. all-positive thumbnail grids) share a dominant DC
    // component, so raw hyperplane signs barely vary — measured on
    // the media corpus, one 8-bit bucket held 67% of 5000 vectors and
    // the "prefilter" produced 3.4x MORE pairs than brute force.
    // Removing the per-vector mean makes the signs encode relative
    // structure; near-identical vectors still center identically, so
    // true neighbors keep colliding. (Both join sides re-read the
    // corpus — callers hand in a cheap relation, e.g. the
    // materialized feature store, so a re-read beats an exchange
    // barrier's extra stage.)
    val meanE = aggregate(col(embCol), lit(0.0d),
      (acc, x) => acc + x.cast("double")) / size(col(embCol)).cast("double")
    val emb = corpus.select(col(idCol), col(embCol))
      .withColumn("__he", transform(col(embCol), x => (x.cast("double") - meanE).cast("float")))
    val indexed = emb.select(col(idCol), col(embCol),
        explode(array((0 until tables).map(tb =>
          struct(lit(tb).as("tbl"), F.lshBucket(col("__he"), nBits, tb).as("bkt"))): _*)).as("e"))
      .select(col(idCol), col(embCol), col("e.tbl").as("tbl"), col("e.bkt").as("bkt"))
    // probe masks: every bucket within Hamming distance <= probeRadius
    // of the query's own bucket (multi-probe LSH; radius 1 = the
    // classic flip-one-bit set, radius 2 adds the C(nBits,2) pairs).
    // Generated by combination, not by filtering 2^nBits candidates —
    // adaptive widths go to 24 bits.
    val masks = (0 to probeRadius).flatMap(r =>
      (0 until nBits).combinations(r).map(_.foldLeft(0)((m, b) => m | (1 << b))))
    val probeStructs = for {
      tb <- 0 until tables
      m <- masks
    } yield {
      val base = F.lshBucket(col("__he"), nBits, tb)
      val probe = if (m == 0) base else base.bitwiseXOR(lit(m))
      struct(lit(tb).as("tbl"), probe.as("bkt"))
    }
    val q = emb.filter(isQuery)
      .select(col(idCol).as("q_id"), col(embCol).as("q_emb"),
        explode(array(probeStructs: _*)).as("e"))
      .select(col("q_id"), col("q_emb"), col("e.tbl").as("tbl"), col("e.bkt").as("bkt"))
    val scored = indexed
      .join(broadcast(q), Seq("tbl", "bkt"))
      .filter(col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol),
        F.cosineSimilarity(col("q_emb"), col(embCol)).as("cos"))
      .dropDuplicates("q_id", idCol) // same pair can surface from several probes
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col(idCol))
    scored.select(col("q_id"), col(idCol), col("cos"),
        row_number().over(w).as("rnk"))
      .filter(col("rnk") <= k)
  }

  /** Signature-prefilter ANN with exact rerank: a 512-bit
    * random-hyperplane signature per vector; per query, the corpus is
    * scanned by popcount Hamming distance (8 long XOR+popcounts vs a
    * 64-float dot — ~8× cheaper per row and 4× less I/O), the top-C
    * candidates by Hamming are reranked with exact cosine, and top-5
    * emitted. This is the ANN structure that still works when the
    * embedding space has no cluster structure for buckets to exploit
    * — measured on the test corpus (near-random vectors, top-5 cos
    * ≈ 0.33): bucketed multi-probe recall ≈ 0.28, 512-bit/top-64
    * signature rerank = 1.0. Only (q_id, vec_id, hd) shuffles for the
    * top-C selection; embeddings are re-joined for the C-sized rerank.
    *
    * Cost model: the signature scan is linear in the CORPUS per query
    * — O(|Q|·n) popcounts total. That is the intended shape (one
    * corpus pass per query batch), but only if |Q| is a BOUNDED batch:
    * round 4 defined the query set as a fixed *fraction* of the corpus
    * (`vec_id % 50`), which turns the total into O(n²/50). `nQueries`
    * caps the batch (first `nQueries` of the sampled ids), so compute
    * grows linearly with the corpus at a fixed query load — the
    * ScaleProbe row pins this.
    */
  def annSigRerank(s: SparkSession, dir: String,
      nBits: Int = 512, candidates: Int = 64, nQueries: Int = 100): DataFrame = {
    val emb = t(s, dir, "embeddings")
    // bounded query batch: every 50th id, capped at nQueries
    val isQuery = col("vec_id") % 50 === 0 && col("vec_id") < lit(50L * nQueries)
    // repartition = exchange barrier: the 512-bit signature must
    // materialize ONCE per row; without it Catalyst inlines the
    // projection into the broadcast NLJ and recomputes the signature
    // per (corpus, query) PAIR — measured 14s vs 2s at sf0.1
    val sigs = emb.select(col("vec_id"), F.lshSignature(col("embedding"), nBits).as("sig"))
      .repartition(col("vec_id"))
    val q = sigs.filter(isQuery)
      .select(col("vec_id").as("q_id"), col("sig").as("q_sig"))
    val pre = sigs
      .join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        F.hammingSig(col("q_sig"), col("sig")).as("hd"))
    val wH = Window.partitionBy(col("q_id")).orderBy(col("hd"), col("vec_id"))
    val cand = pre.select(col("q_id"), col("vec_id"), col("hd"),
        row_number().over(wH).as("hrnk"))
      .filter(col("hrnk") <= candidates)
      .select(col("q_id"), col("vec_id"))
    val qEmb = emb.filter(isQuery)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val scored = cand
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(qEmb), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        F.cosineSimilarity(col("q_emb"), col("embedding")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.select(col("q_id"), col("vec_id"), col("cos"),
        row_number().over(w).as("rnk"))
      .filter(col("rnk") <= 5)
  }

  /** IVF (inverted-file) ANN: k-means centroids partition the corpus
    * into cells (MLlib KMeans — trained once, amortized across
    * queries; at scale on a sample); each query probes its `nProbe`
    * nearest cells and exact-reranks only those candidates —
    * ~nProbe/nCells of the corpus per query. Cell assignment and
    * probing use squared-euclidean via the codegen'd dot-product
    * kernel (|q|² is constant per query, so -2q·c + |c|² ranks
    * identically). With nProbe = nCells this degenerates to exact
    * brute force — the property the spec pins.
    */
  // IVF index cache: centroids are plain data, reusable across
  // queries and sessions in this JVM — refitting k-means per query
  // invocation was round 2's scale flaw (and most of its bench cost).
  private val ivfModels = new java.util.concurrent.ConcurrentHashMap[
    (String, Int), org.apache.spark.ml.clustering.KMeansModel]()

  /** Max rows the k-means index build trains on: an iterative fit over
    * the full corpus is a non-starter at 100 TB; a bounded uniform
    * sample locates the same density modes (centroid quality depends
    * on the distribution, not the row count).
    */
  val IvfTrainCap = 100000L

  def ivfAnn(s: SparkSession, dir: String,
      nCells: Int = 16, nProbe: Int = 4, k: Int = 5): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val emb = t(s, dir, "embeddings")
      .withColumn("fv", array_to_vector(col("embedding")))
    val model = ivfModels.computeIfAbsent((dir, nCells), _ => {
      val n = emb.count() // parquet metadata count — not a scan
      val train =
        if (n > IvfTrainCap) emb.sample(withReplacement = false, IvfTrainCap.toDouble / n, seed = 42)
        else emb
      new KMeans().setK(nCells).setSeed(42)
        .setFeaturesCol("fv").setPredictionCol("cell").fit(train)
    })
    val assigned = model.transform(emb)
      .select(col("vec_id"), col("embedding"), col("cell"))
    val centroids = model.clusterCenters.zipWithIndex.map { case (v, i) =>
      (i, v.toArray.map(_.toFloat))
    }.toSeq
    val centDf = s.createDataFrame(centroids).toDF("cell", "centroid")
    val q = assigned.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val wCell = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("cell"))
    val probes = q.crossJoin(broadcast(centDf))
      .withColumn("d2",
        F.dotProduct(col("centroid"), col("centroid"))
          - lit(2.0) * F.dotProduct(col("q_emb"), col("centroid")))
      .select(col("q_id"), col("q_emb"), col("cell"),
        row_number().over(wCell).as("crnk"))
      .filter(col("crnk") <= nProbe)
      .select(col("q_id"), col("q_emb"), col("cell"))
    // each vector lives in exactly one cell and probes are distinct
    // per query, so the join cannot duplicate (q_id, vec_id) — no
    // dedup shuffle needed (unlike the multi-probe LSH path)
    val scored = assigned
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        F.cosineSimilarity(col("q_emb"), col("embedding")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.select(col("q_id"), col("vec_id"), col("cos"),
        row_number().over(w).as("rnk"))
      .filter(col("rnk") <= k)
  }

  /** Embedding-cosine near-duplicate PAIR MINING — the full dedup
    * operator (not the adjacent-id slice below): every pair of
    * corpus vectors with cosine >= threshold, found by multi-table
    * LSH blocking + an exact cosine filter. Same scale structure as
    * the dedup family: candidates come from a (table, bucket)
    * self-equi-join with width-adaptive buckets (per-bucket occupancy
    * held ~constant), so candidate volume stays ~linear in the corpus
    * while precision is exact (the cosine filter re-checks every
    * candidate). Near-identical vectors center identically, so their
    * hyperplane signs agree and they collide in every table — the
    * property SimRecallSpec pins with planted perturbed twins.
    */
  def nearDupPairs(corpus: DataFrame, idCol: String, embCol: String,
      threshold: Double, tables: Int = 4, nBitsOpt: Option[Int] = None,
      knownRows: Option[Long] = None): DataFrame = {
    val meanE = aggregate(col(embCol), lit(0.0d),
      (acc, x) => acc + x.cast("double")) / size(col(embCol)).cast("double")
    val emb = corpus.select(col(idCol), col(embCol))
    // adaptive width needs only the ORDER OF MAGNITUDE of the corpus
    // size — at 100 TB pass `knownRows` from catalog stats (ANALYZE
    // TABLE rowCount) instead of paying a counting pass; the fallback
    // counts a single pruned id column, not the vectors. (Plan-stats
    // estimates are NOT used: without CBO a GlobalLimit reports the
    // limit value, not the data — an overestimate would oversize the
    // buckets and silently lose near-dup recall.)
    val nBits = nBitsOpt.getOrElse(adaptiveLshBits(
      knownRows.getOrElse(corpus.select(col(idCol)).count())))
    // KEYS-ONLY blocking (r17, guide §2.3 "shuffle keys and metadata
    // instead of payloads"): the bucket self-join only has to DECIDE
    // which id pairs are candidates, so only (id, tbl, bkt) rows ride
    // the blocking shuffles — ~20 B/row instead of the 64-float
    // embedding the r16 plan carried through BOTH join sides AND the
    // pair-dedup exchange. The key frame persists, so the corpus scan
    // + centering + `tables`-way bucket hashing run ONCE (the r16 plan
    // ran that whole map subtree once per join side); the cache is
    // keys-not-payloads small (~4 rows × 20 B per vector), which is
    // what makes it affordable at 100 TB where caching the embeddings
    // themselves would not be.
    val keys = persistOnce(emb
      .withColumn("__he", transform(col(embCol), x => (x.cast("double") - meanE).cast("float")))
      .select(col(idCol),
        explode(array((0 until tables).map(tb =>
          struct(lit(tb).as("tbl"), F.lshBucket(col("__he"), nBits, tb).as("bkt"))): _*)).as("e"))
      .select(col(idCol), col("e.tbl").as("tbl"), col("e.bkt").as("bkt")))
    val cand = keys.select(col(idCol).as("id_a"), col("tbl"), col("bkt"))
      .join(keys.select(col(idCol).as("id_b"), col("tbl"), col("bkt")),
        Seq("tbl", "bkt"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b") // a pair may collide in several tables
    // re-attach the embeddings by id for the exact-cosine check: two
    // equi joins against the raw (id, embedding) projection — the
    // payload crosses the wire once per side, for candidate rows only
    cand
      .join(emb.select(col(idCol).as("id_a"), col(embCol).as("emb_a")), Seq("id_a"))
      .join(emb.select(col(idCol).as("id_b"), col(embCol).as("emb_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        F.cosineSimilarity(col("emb_a"), col("emb_b")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** The `queries()` entry: the synthetic corpus is near-random (no
    * true near-dups), so the dedup scenario is made concrete by
    * planting one perturbed twin (±0.1% per element — cosine ≈
    * 0.9999) for every 100th vector; the operator must surface the
    * planted pairs through the blocking.
    */
  def cosineNearDup(s: SparkSession, dir: String, threshold: Double = 0.98,
      tables: Int = 4): DataFrame =
    nearDupPairs(plantedCorpus(s, dir), "vec_id", "embedding", threshold, tables)

  /** The embeddings table plus one perturbed twin (±0.1% per element,
    * cosine ≈ 0.9999) for every 100th vector — the shared fixture of
    * the embedding-dedup queries (the synthetic vectors are
    * near-random, so true near-dups must be planted for the operators
    * to have anything to find).
    */
  def plantedCorpus(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val twins = emb.filter(col("vec_id") % 100 === 0)
      .select((col("vec_id") + 1000000000L).as("vec_id"),
        expr("transform(embedding, (x, i) -> CAST(x * (1.0d + 0.001d * sin(i + 1)) AS FLOAT))")
          .as("embedding"))
    emb.unionByName(twins)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): SEMANTIC
    * deduplication — collapse groups of embedding-space near-
    * duplicates to one canonical member each. Pair mining alone
    * ([[cosineNearDup]]) is not a dedup: A~B and B~C must keep ONE
    * document even when A~C was never mined, so the mined pairs
    * close under [[graft.text.DedupCluster.connectedComponents]]
    * (hash-min + pointer jumping, O(log d) rounds) and every corpus
    * vector reports its cluster plus whether it is the canonical
    * (min-id) member. Scale shape: LSH-blocked pair mining (never
    * all-pairs) + the CC loop at graph-sized parallelism + one
    * left join back to the corpus — the same 100 TB structure as the
    * text-side q_dedup_cc, applied to the embedding modality. The
    * paper clusters with k-means before the intra-cluster cosine
    * cut; LSH blocking plays that role here deterministically, which
    * is what keeps the whole operator oracle-checkable (DuckDB
    * brute-forces exact cosine and closes the pair graph with a
    * recursive CTE).
    */
  def semDedup(s: SparkSession, dir: String, threshold: Double = 0.98): DataFrame = {
    val corpus = plantedCorpus(s, dir)
    val pairs = nearDupPairs(corpus, "vec_id", "embedding", threshold)
      .select(col("id_a").as("ida"), col("id_b").as("idb"))
    val comps = graft.text.DedupCluster.connectedComponents(pairs)
    corpus.select(col("vec_id"))
      .join(comps, col("vec_id") === col("id"), "left")
      .select(col("vec_id"),
        coalesce(col("comp"), col("vec_id")).as("comp"),
        (coalesce(col("comp"), col("vec_id")) === col("vec_id")).cast("int")
          .as("is_canonical"))
  }

  /** Deterministic IVF ANN — the end-to-end approximate-nearest-
    * neighbor pipeline (partition → probe → exact rerank) with every
    * stage engine-reproducible, which makes the WHOLE ANN
    * oracle-checkable (few engines can hash-match an ANN query):
    * cells come from [[KMeansDataflow]]'s integer-exact Lloyd fit
    * instead of MLlib (whose RNG/float folds are engine-private —
    * that variant stays as the rows-only `q_sim_ivf_ann`), each
    * bounded query ranks cells by exact integer d2 against the k·d
    * centroid literals (map-only, ties to the lowest cell), probes
    * its `nProbe` nearest cells' members, and exact-reranks with the
    * double-math cosine. Same scale shape as [[ivfAnn]]: per-query
    * cost ≈ nProbe/nCells of the corpus, no all-pairs anywhere.
    */
  def ivfAnnDeterministic(s: SparkSession, dir: String, nCells: Int = 8,
      nProbe: Int = 2, k: Int = 5, iters: Int = 3): DataFrame = {
    val (assigned, cents) = KMeansDataflow.fit(s, dir, nCells, iters)
    val members = assigned.select(col("vec_id"), col("cell"))
    val probes = assigned.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("q"))
      .withColumn("pr",
        explode(slice(KMeansDataflow.cellRanking(cents), 1, nProbe)))
      .select(col("q_id"), col("pr.c").as("cell"))
    val emb = t(s, dir, "embeddings")
    val qEmb = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val scored = broadcast(probes)
      .join(members, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .join(emb, Seq("vec_id"))
      .join(broadcast(qEmb), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        F.cosineSimilarity(col("q_emb"), col("embedding")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.select(col("q_id"), col("vec_id"), col("cos"),
        row_number().over(w).as("rnk"))
      .filter(col("rnk") <= k)
  }

  /** Embedding-cosine near-duplicate pairs: adjacent-id pairing
    * (vec_id, vec_id+1) with exact cosine — the SQL-expressible slice
    * of embedding dedup, oracle-checked against DuckDB's
    * list_cosine_similarity.
    */
  def cosineAdjacent(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "embeddings")
      .select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = t(s, dir, "embeddings")
      .select((col("vec_id") - 1).as("id_a"), col("vec_id").as("id_b"),
        col("embedding").as("emb_b"))
    a.join(b, Seq("id_a"))
      .select(col("id_a"), col("id_b"),
        F.cosineSimilarity(col("emb_a"), col("emb_b")).as("cos"))
  }

  /** Embedding storage prep: L2 norm + per-vector int8 quantization
    * (scale 127/max|x|) — the compression pass a 100 TB embedding
    * store runs before ANN indexing (4x smaller than float32, cheap
    * SIMD distance on the int8 lattice). Pure projection, no
    * shuffle; all math forced to DOUBLE so the oracle's IEEE ops are
    * bit-identical (same discipline as the cosine queries below).
    * The quantized array joins to a string because the driver's
    * comparator hashes scalar columns.
    */
  def embedQuantize(s: SparkSession, dir: String): DataFrame =
    graft.Tables.load(s, dir, "embeddings")
      .withColumn("maxabs",
        array_max(transform(col("embedding"), y => abs(y.cast("double")))))
      .select(col("vec_id"),
        sqrt(aggregate(col("embedding"), lit(0.0d),
          (a, x) => a + x.cast("double") * x.cast("double"))).as("l2"),
        array_join(transform(col("embedding"),
          x => when(col("maxabs") === 0.0d, 0)
            .otherwise(floor(x.cast("double") * lit(127.0d) / col("maxabs")).cast("int"))),
          ",").as("q8"))

  /** Per-DIMENSION corpus standardization (the z-score pass ahead of
    * PCA / k-means / any distance that should not let one
    * high-variance dimension dominate): every embedding component
    * maps to (x - mean_d) / std_d with the moments taken over the
    * whole corpus per dimension. The cross-engine hazard is the
    * corpus-sized float SUM (fold-order dependent), so the moments
    * run over 1e-6-QUANTIZED components in plain integers: m =
    * floor(x·10^6) sums exactly in long, m² sums exactly in
    * decimal(38,0) — fold-order independent, no float→decimal cast
    * whose tie-rounding engines could disagree on — and mean/std
    * derive from the exact integer sums in double (casts, one
    * division, one sqrt: each exactly rounded, bit-identical in any
    * engine; the 1e-6 quantization bias is ~10^-5 of the data
    * scale). Scale shape: one posexplode into a (dim)-keyed
    * partial+final aggregate (the exchange carries nDims rows per
    * task, not the corpus), the 128-row moment table broadcasts
    * back, and vectors reassemble position-keyed. Components emit
    * floor(z·1000) integers joined to a string (the
    * [[randomProjection]] output discipline — the driver's
    * comparator hashes scalars).
    */
  def embedStandardize(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val dims = emb.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("d", "x")))
      .withColumn("m", floor(col("x").cast("double") * lit(1000000.0d)).cast("long"))
    val stats = dims.groupBy(col("d")).agg(
        sum(col("m")).as("sx"),
        sum(col("m").cast("decimal(19,0)") * col("m").cast("decimal(19,0)"))
          .as("sxx"),
        count(lit(1)).as("n"))
      .select(col("d"),
        (col("sx").cast("double") / col("n").cast("double")).as("mu"),
        sqrt(col("sxx").cast("double") / col("n").cast("double")
          - (col("sx").cast("double") / col("n").cast("double"))
            * (col("sx").cast("double") / col("n").cast("double"))).as("sd"))
    dims.join(broadcast(stats), Seq("d"))
      .select(col("vec_id"), col("d"),
        floor((col("x").cast("double") * lit(1000000.0d) - col("mu")) / col("sd")
          * lit(1000.0d)).cast("long").as("z"))
      .groupBy(col("vec_id"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("d"), col("z")))),
        p => p.getField("z")), ",").as("z1000"))
  }

  /** Sparse sign random projection (Achlioptas 2003, the
    * Johnson-Lindenstrauss workhorse): project every embedding to 16
    * dims with a ±1 matrix derived DETERMINISTICALLY from md5 of the
    * (input-dim, output-dim) index pair — no stored matrix, no RNG
    * state, any engine regenerates the identical projection (the
    * reproducibility property [[graft.text.TextQueries.hashSplit]]
    * relies on, applied to linear algebra). Distances are preserved
    * within JL bounds, so this is the 4x compute/storage reduction
    * pass ahead of LSH/IVF indexing.
    *
    * The matrix entries depend only on (i, j), never on the row, so
    * the md5 derivation runs ONCE per JVM ([[graft.functions
    * .VectorOps.rpProject]]'s per-executor cache) and the per-row
    * work is a single codegen'd static call doing 16 fused
    * multiply-accumulate passes — no hashing, no lambda
    * interpretation, no intermediate arrays in the hot loop (the
    * naive formulation paid 1,024 md5 calls per row; even with
    * literal sign arrays, interpreted zip_with/aggregate lambdas were
    * ~6x off scan speed). Map-only projection, no shuffle; components
    * emit as floor(v*1000) integers joined to a string —
    * float->double products are exact (24+24 < 53 mantissa bits) and
    * both engines fold the sum left-to-right, so the quantized
    * components are bit-identical to the oracle.
    */
  def randomProjection(s: SparkSession, dir: String): DataFrame =
    graft.Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), F.rpProject(col("embedding"), 16).as("proj16"))

  /** Cluster-balanced sampling — the diversity-selection step over a
    * semantic clustering (the SemDeDup/DiverseEvol family's "take a
    * few per cluster" move, which plain rate sampling cannot give):
    * the deterministic k-means assignment partitions the corpus, and
    * each cluster contributes its first `per` members in md5 order
    * (the engine-reproducible pseudo-random pick — the shardAssign
    * convention). rank<=per over a cell-partitioned window plans as
    * WindowGroupLimit: map tasks forward only their local top-per
    * rows per cell, so no cluster ever sorts corpus-wide.
    */
  def clusterSample(s: SparkSession, dir: String, per: Int = 2): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cell"))
      .orderBy(md5(concat(lit("cb:"), col("vec_id").cast("string")).cast("binary")),
        col("vec_id"))
    KMeansDataflow.kmeansAssign(s, dir)
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") <= per)
      .select(col("vec_id"), col("cell"), col("pos"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cluster_sample" -> ((s: SparkSession, d: String) => clusterSample(s, d)),
    "q_embed_rp" -> (randomProjection _),
    "q_embed_quantize" -> (embedQuantize _),
    "q_embed_standardize" -> (embedStandardize _),
    "q_sim_topk"     -> (cosineTopK _),
    "q_sim_sig_rerank" -> ((s: SparkSession, d: String) => annSigRerank(s, d)),
    "q_dedup_cosine" -> ((s: SparkSession, d: String) => cosineNearDup(s, d)),
    "q_semdedup"     -> ((s: SparkSession, d: String) => semDedup(s, d)),
    "q_kmeans"       -> ((s: SparkSession, d: String) => KMeansDataflow.kmeansAssign(s, d)),
    "q_sim_ivf_det"  -> ((s: SparkSession, d: String) => ivfAnnDeterministic(s, d)),
    "q_sim_ivf_ann"  -> ((s: SparkSession, d: String) => ivfAnn(s, d)),
    "q_sim_adjacent" -> (cosineAdjacent _))

  // DuckDB's list_cosine_similarity accumulates in FLOAT; our native
  // expression upcasts each element and accumulates in DOUBLE. The
  // ~1e-7 disagreement flipped the driver's 1e-2 rounding at .xx5
  // boundaries (round-1 hash fails). Oracle therefore computes
  // dot/norms explicitly in DOUBLE via lambdas — bit-identical math.
  private val dotD =
    "list_sum(list_transform(range(1, len(%A)+1), i -> %A[i]::DOUBLE * %B[i]::DOUBLE))"
  private val normD =
    "sqrt(list_sum(list_transform(%A, x -> x::DOUBLE * x::DOUBLE)))"
  private def cosD(a: String, b: String): String =
    dotD.replace("%A", a).replace("%B", b) +
      " / (" + normD.replace("%A", a) + " * " + normD.replace("%A", b) + ")"

  val oracle: Map[String, String] = Map(
    "q_embed_rp" ->
      """SELECT vec_id,
        |  array_to_string(list_transform(range(0, 16), j ->
        |    floor(list_sum(list_transform(range(1, len(embedding) + 1), i ->
        |      embedding[i]::DOUBLE *
        |      (CASE WHEN substr(md5('rp:' || (i-1)::VARCHAR || ':' || j::VARCHAR),
        |                  1, 1) < '8'
        |            THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END)))
        |      * 1000.0::DOUBLE)::BIGINT), ',') AS proj16
        |FROM embeddings""".stripMargin,
    "q_embed_quantize" ->
      """SELECT vec_id,
        |  sqrt(list_sum(list_transform(embedding,
        |    x -> (x::DOUBLE)*(x::DOUBLE)))) AS l2,
        |  array_to_string(list_transform(embedding,
        |    x -> CASE WHEN list_max(list_transform(embedding,
        |                 y -> abs(y::DOUBLE))) = 0 THEN 0
        |         ELSE floor((x::DOUBLE) * 127.0 / list_max(list_transform(embedding,
        |                 y -> abs(y::DOUBLE))))::INT END), ',') AS q8
        |FROM embeddings""".stripMargin,
    "q_embed_standardize" ->
      """WITH dims AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
        |         unnest(embedding) AS x
        |  FROM embeddings),
        |q AS (SELECT vec_id, d, x::DOUBLE AS x,
        |        floor(x::DOUBLE * 1000000)::BIGINT AS m FROM dims),
        |st AS (
        |  SELECT d, sum(m)::DOUBLE AS sxd,
        |         sum(m::HUGEINT * m::HUGEINT)::DOUBLE AS sxxd,
        |         count(*)::DOUBLE AS n
        |  FROM q GROUP BY d),
        |mo AS (SELECT d, sxd / n AS mu,
        |         sqrt(sxxd / n - (sxd / n) * (sxd / n)) AS sd FROM st),
        |z AS (
        |  SELECT q.vec_id, q.d,
        |    floor((q.x * 1000000 - mo.mu) / mo.sd * 1000)::BIGINT AS z
        |  FROM q JOIN mo ON q.d = mo.d)
        |SELECT vec_id, string_agg(z::VARCHAR, ',' ORDER BY d) AS z1000
        |FROM z GROUP BY vec_id""".stripMargin,
    // exact brute-force over the same planted corpus: the blocking
    // must find EVERY >= 0.98 pair (planted twins sit at ~0.99997 —
    // far from both the threshold and the driver's rounding; natural
    // pairs top out ~0.5). DuckDB's 1-based range(i) matches Spark's
    // 0-based (x, i) -> sin(i + 1) perturbation exactly.
    "q_kmeans" -> KMeansDataflow.oracleSql(),
    // The 512-bit random-hyperplane ANN pipeline re-derived END TO END
    // (upgraded from rows-only in round 10): the splitmix64 avalanche
    // runs in HUGEINT with mod-2^64 wraparound — 64-bit xor via signed
    // BIGINT xor with sign-bridging CASEs, the two wide multiplies
    // split high/low 32 bits so INT128 never overflows — then sign
    // bits fold per (vector, bit) in ascending-dim order (the same
    // sequential double sum as the codegen'd expression), hamming
    // prefilter to top-64 with (hd, vec_id) ties, exact double cosine
    // rerank. Verified bit-identical (cos maxdiff 0.0) before landing.
    "q_sim_sig_rerank" ->
      """WITH grid AS (
        |  SELECT b.bit, i.i
        |  FROM (SELECT unnest(range(0, 512)) AS bit) b,
        |       (SELECT unnest(range(1, 65)) AS i) i),
        |h0 AS (
        |  SELECT bit, i,
        |    ((bit::HUGEINT * 4294967296::HUGEINT + (i - 1)::HUGEINT
        |      + 11400714819323198485::HUGEINT) % 18446744073709551616::HUGEINT) AS z
        |  FROM grid),
        |s1 AS (
        |  SELECT bit, i,
        |    (CASE WHEN x < 0 THEN x::HUGEINT + 18446744073709551616::HUGEINT ELSE x::HUGEINT END) AS z
        |  FROM (SELECT bit, i,
        |    xor(CASE WHEN z >= 9223372036854775808::HUGEINT THEN (z - 18446744073709551616::HUGEINT)::BIGINT ELSE z::BIGINT END,
        |        CASE WHEN z // 1073741824::HUGEINT >= 9223372036854775808::HUGEINT
        |             THEN (z // 1073741824::HUGEINT - 18446744073709551616::HUGEINT)::BIGINT
        |             ELSE (z // 1073741824::HUGEINT)::BIGINT END) AS x FROM h0)),
        |m1 AS (
        |  SELECT bit, i,
        |    ((z * 484763065::HUGEINT) % 18446744073709551616::HUGEINT
        |     + ((z * 3210233709::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT)
        |    % 18446744073709551616::HUGEINT AS z
        |  FROM s1),
        |s2 AS (
        |  SELECT bit, i,
        |    (CASE WHEN x < 0 THEN x::HUGEINT + 18446744073709551616::HUGEINT ELSE x::HUGEINT END) AS z
        |  FROM (SELECT bit, i,
        |    xor(CASE WHEN z >= 9223372036854775808::HUGEINT THEN (z - 18446744073709551616::HUGEINT)::BIGINT ELSE z::BIGINT END,
        |        CASE WHEN z // 134217728::HUGEINT >= 9223372036854775808::HUGEINT
        |             THEN (z // 134217728::HUGEINT - 18446744073709551616::HUGEINT)::BIGINT
        |             ELSE (z // 134217728::HUGEINT)::BIGINT END) AS x FROM m1)),
        |m2 AS (
        |  SELECT bit, i,
        |    ((z * 321982955::HUGEINT) % 18446744073709551616::HUGEINT
        |     + ((z * 2496678331::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT)
        |    % 18446744073709551616::HUGEINT AS z
        |  FROM s2),
        |s3 AS (
        |  SELECT bit, i,
        |    (CASE WHEN x < 0 THEN x::HUGEINT + 18446744073709551616::HUGEINT ELSE x::HUGEINT END) AS z
        |  FROM (SELECT bit, i,
        |    xor(CASE WHEN z >= 9223372036854775808::HUGEINT THEN (z - 18446744073709551616::HUGEINT)::BIGINT ELSE z::BIGINT END,
        |        CASE WHEN z // 2147483648::HUGEINT >= 9223372036854775808::HUGEINT
        |             THEN (z // 2147483648::HUGEINT - 18446744073709551616::HUGEINT)::BIGINT
        |             ELSE (z // 2147483648::HUGEINT)::BIGINT END) AS x FROM m2)),
        |rf AS (
        |  SELECT bit, list(((z // 2048::HUGEINT)::DOUBLE / 9007199254740992.0 - 0.5) ORDER BY i) AS rl
        |  FROM s3 GROUP BY bit),
        |bits AS (
        |  SELECT e.vec_id, rf.bit,
        |    (list_sum(list_transform(range(1, 65), k -> e.embedding[k]::DOUBLE * rf.rl[k])) >= 0)::INT AS s
        |  FROM embeddings e, rf),
        |sigs AS (SELECT vec_id, list(s ORDER BY bit) AS sig FROM bits GROUP BY vec_id),
        |q AS (SELECT vec_id AS q_id, sig AS q_sig FROM sigs WHERE vec_id % 50 = 0 AND vec_id < 5000),
        |pre AS (
        |  SELECT q.q_id, s.vec_id,
        |    list_sum(list_transform(range(1, 513), k -> (q.q_sig[k] <> s.sig[k])::INT)) AS hd
        |  FROM sigs s, q WHERE s.vec_id <> q.q_id),
        |cand AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id ORDER BY hd, vec_id) AS hrnk
        |    FROM pre) WHERE hrnk <= 64),
        |qe AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 5000),
        |scored AS (
        |  SELECT c.q_id, c.vec_id,
        |    list_sum(list_transform(range(1, len(e.embedding) + 1),
        |      i -> qe.qv[i]::DOUBLE * e.embedding[i]::DOUBLE))
        |    / (sqrt(list_sum(list_transform(qe.qv, x -> x::DOUBLE * x::DOUBLE)))
        |       * sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))) AS cos
        |  FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id JOIN qe ON qe.q_id = c.q_id)
        |SELECT q_id, vec_id, cos, rnk FROM (
        |  SELECT q_id, vec_id, cos, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
        |  FROM scored) WHERE rnk <= 5""".stripMargin,
    // Extends the k-means chain with the md5-ordered per-cell pick.
    "q_cluster_sample" -> (KMeansDataflow.oracleCtes(8, 3) +
      """
        |SELECT vec_id, cell, pos FROM (
        |  SELECT vec_id, cell,
        |    row_number() OVER (PARTITION BY cell
        |      ORDER BY md5('cb:' || vec_id::VARCHAR), vec_id) AS pos
        |  FROM afin)
        |WHERE pos <= 2""".stripMargin),
    // Extends the k-means CTE chain: probe = per-query cell ranking
    // by the same exact integer d2, candidates = probed cells'
    // members, rerank = the double-math cosine — the whole ANN
    // pipeline hash-matched end to end.
    "q_sim_ivf_det" -> (KMeansDataflow.oracleCtes(8, 3) + "," +
      s"""
        |queries AS (SELECT vec_id AS q_id, q AS qq FROM q WHERE vec_id % 50 = 0),
        |probe AS (
        |  SELECT q_id, cell FROM (
        |    SELECT queries.q_id, c.cell,
        |      row_number() OVER (PARTITION BY queries.q_id ORDER BY
        |        list_sum(list_transform(range(1, len(qq) + 1),
        |          i -> (qq[i] - c.q[i]) * (qq[i] - c.q[i]))), c.cell) AS rn
        |    FROM queries, ${KMeansDataflow.finalCentCte(3)} c)
        |  WHERE rn <= 2),
        |cand AS (
        |  SELECT probe.q_id, afin.vec_id
        |  FROM probe JOIN afin USING (cell)
        |  WHERE afin.vec_id <> probe.q_id),
        |scored AS (
        |  SELECT cand.q_id, cand.vec_id,
        |    ${cosD("qe.embedding", "ve.embedding")} AS cos
        |  FROM cand
        |  JOIN embeddings qe ON qe.vec_id = cand.q_id
        |  JOIN embeddings ve ON ve.vec_id = cand.vec_id)
        |SELECT q_id, vec_id, cos, rnk FROM (
        |  SELECT q_id, vec_id, cos,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
        |  FROM scored)
        |WHERE rnk <= 5""".stripMargin),
    // Same planted corpus + brute-force cosine pairs as
    // q_dedup_cosine, closed into components with a recursive CTE
    // (the q_dedup_cc pattern) — every corpus vector must report the
    // identical (comp, is_canonical) as the LSH-blocked + CC plan.
    "q_semdedup" ->
      s"""WITH RECURSIVE corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000000,
        |    list_transform(range(1, len(embedding) + 1),
        |      i -> (embedding[i] * (1.0 + 0.001 * sin(i)))::FLOAT)
        |  FROM embeddings WHERE vec_id % 100 = 0),
        |pairs AS (
        |  SELECT a.vec_id AS ida, b.vec_id AS idb
        |  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        |  WHERE ${cosD("a.embedding", "b.embedding")} >= 0.98),
        |edges AS (SELECT ida AS src, idb AS dst FROM pairs
        |          UNION ALL SELECT idb, ida FROM pairs),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT re.id, e.dst FROM reach re JOIN edges e ON e.src = re.r),
        |cmp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id)
        |SELECT c.vec_id,
        |  coalesce(cmp.comp, c.vec_id) AS comp,
        |  (coalesce(cmp.comp, c.vec_id) = c.vec_id)::INT AS is_canonical
        |FROM corpus c LEFT JOIN cmp ON cmp.id = c.vec_id""".stripMargin,
    "q_dedup_cosine" ->
      s"""WITH corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000000,
        |    list_transform(range(1, len(embedding) + 1),
        |      i -> (embedding[i] * (1.0 + 0.001 * sin(i)))::FLOAT)
        |  FROM embeddings WHERE vec_id % 100 = 0)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  ${cosD("a.embedding", "b.embedding")} AS cos
        |FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        |WHERE ${cosD("a.embedding", "b.embedding")} >= 0.98""".stripMargin,
    "q_sim_topk" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
        |           FROM embeddings WHERE vec_id % 50 = 0),
        |scored AS (
        |  SELECT q_id, vec_id, ${cosD("q_emb", "embedding")} AS cos
        |  FROM embeddings CROSS JOIN q
        |  WHERE vec_id <> q_id),
        |ranked AS (
        |  SELECT q_id, vec_id, cos,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
        |  FROM scored)
        |SELECT q_id, vec_id, cos, rnk FROM ranked WHERE rnk <= 5""".stripMargin,
    "q_sim_adjacent" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  ${cosD("a.embedding", "b.embedding")} AS cos
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1""".stripMargin)
}
