package graft

import org.apache.spark.sql.functions._
import graft.functions.{FlinkFunctions => F}

/** Recall of the bucketed (scale-path) near-dup / ANN operators
  * against their exact brute-force twins — the round-1 versions
  * found ~25% (SimHash single-band) and ~48% (single-table
  * single-probe ANN); the multi-band / multi-probe versions must
  * reach ≥ 0.9.
  */
class SimRecallSpec extends SparkSpec {

  test("multi-band SimHash blocking recalls >= 0.9 of Hamming<=16 pairs") {
    val docs = Tables.load(spark, sfDir, "documents")
    val sigs = docs.select(col("doc_id"), F.simhash64(col("text")).as("sig"))
    val a = sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val b = sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b"))
    val brute = a.join(b, col("id_a") < col("id_b"))
      .filter(F.hamming64(col("sig_a"), col("sig_b")) <= 16)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 16 bands of 4 bits: a d<=16 pair collides unless all 16
    // differing bits spread across all 16 bands with none clean
    val blocked = graft.text.TextQueries.simhashPairs(docs, bands = 16, maxHamming = 16)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.subsetOf(brute), "blocking must not invent pairs")
    val recall = blocked.size.toDouble / math.max(brute.size, 1)
    assert(recall >= 0.9, s"recall $recall (${blocked.size}/${brute.size})")
  }

  test("adaptive simhash bands widen with the corpus, holding bucket density") {
    import graft.text.TextQueries.adaptiveSimhashBands
    assert(adaptiveSimhashBands(30) === 8)        // tiny: 8-bit bands
    assert(adaptiveSimhashBands(500) === 4)       // test corpora: 16-bit bands
    assert(adaptiveSimhashBands(8000) === 4)
    assert(adaptiveSimhashBands(1000000) === 2)   // web scale -> 32-bit bands
    // density never exceeds target across the dial (until the 2^32 floor)
    for (n <- Seq(100L, 1000L, 100000L, 10000000L)) {
      val b = adaptiveSimhashBands(n)
      assert(n / math.pow(2.0, 64 / b) <= 1.0, s"density blown at n=$n")
    }
  }

  test("the DuckDB oracle's band CASE mirrors adaptiveSimhashBands at every scale") {
    import graft.text.TextQueries.adaptiveSimhashBands
    // the q_dedup_simhash oracle derives its band split with this
    // CASE (TextQueries oracle SQL: n<=16 -> 4-bit ... else 32-bit);
    // pin it to the Scala rule across the whole dial so the oracle
    // can never silently diverge when the correctness battery moves
    // to a corpus of any size — including both threshold EDGES of
    // every width step
    def oracleWidth(n: Long): Int =
      if (n <= 16) 4 else if (n <= 256) 8 else if (n <= 65536) 16 else 32
    val ns = Seq(1L, 10L, 16L, 17L, 100L, 256L, 257L, 500L, 5000L,
      65536L, 65537L, 10000000L, 1000000000L)
    ns.foreach { n =>
      assert(64 / oracleWidth(n) === adaptiveSimhashBands(n),
        s"oracle and Scala band rules diverge at n=$n")
    }
  }

  test("widened 32-bit bands (the >65536-doc path) still block soundly with the " +
      "pigeonhole floor") {
    // the gate corpora all land on 16-bit bands; run the WIDE path
    // (2 x 32-bit, what a web-scale corpus selects) end to end
    val docs = Tables.load(spark, sfDir, "documents")
    val sigs = docs.select(col("doc_id"), F.simhash64(col("text")).as("sig"))
    val a = sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val b = sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b"))
    val bruteClose = a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        F.hamming64(col("sig_a"), col("sig_b")).as("hd"))
      .filter(col("hd") <= 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val wide = graft.text.TextQueries.simhashPairs(docs, bands = 2, maxHamming = 16)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteSet = bruteClose.map(t => (t._1, t._2)).toSet
    assert(wide.subsetOf(bruteSet), "wide blocking must not invent pairs")
    // pigeonhole: 2 bands guarantee every hd < 2 pair collides in a band
    val mustFind = bruteClose.filter(_._3 < 2).map(t => (t._1, t._2)).toSet
    assert(mustFind.subsetOf(wide),
      s"pigeonhole violated: ${(mustFind diff wide).take(3)}")
  }

  test("dedupSimhash knownRows hook skips the count and matches the counted path") {
    import graft.text.TextQueries
    val docs = Tables.load(spark, sfDir, "documents")
    val n = docs.count()
    // catalog-stats path (knownRows) must pick the same band width —
    // and therefore emit the identical pair set — as the counting
    // fallback; at 100 TB the caller passes ANALYZE-TABLE rowCount
    // and no count action runs at all.
    val withStats = TextQueries.dedupSimhash(spark, sfDir, knownRows = Some(n))
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val counted = TextQueries.dedupSimhash(spark, sfDir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(withStats === counted)
    // an order-of-magnitude-correct estimate keeps the same width:
    // the dial moves in powers of 2^width, not per-row
    assert(TextQueries.adaptiveSimhashBands(n) ===
      TextQueries.adaptiveSimhashBands(n + n / 4))
  }

  test("verified simhash: near-identical pairs sit inside the hd<8 pigeonhole guarantee") {
    import graft.text.TextQueries
    val docs = Tables.load(spark, sfDir, "documents")
    // brute-force exact word-3-gram Jaccard >= 0.98 (the oracle set)
    val sh = docs.withColumn("tk", split(col("text"), " "))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(tk) - 3), i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))")))
        .as("sh"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val truePairs = sh.select(col("doc_id").as("id_a"), col("sh"))
      .join(sh.select(col("doc_id").as("id_b"), col("sh")), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("ni"))
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n", "na"), Seq("id_a"))
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n", "nb"), Seq("id_b"))
      .filter(col("ni").cast("double") / (col("na") + col("nb") - col("ni")) >= 0.98)
      .select("id_a", "id_b")
    // the guarantee's premise: every such pair is under Hamming 8 —
    // so 8 bands MUST find it (pigeonhole) and hd<=7 MUST keep it
    val sigs = docs.select(col("doc_id"), F.simhash64(col("text")).as("sig"))
    val withHd = truePairs
      .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .select(F.hamming64(col("sig_a"), col("sig_b")).as("hd"))
    val maxHd = withHd.agg(coalesce(max(col("hd")), lit(0))).head().getInt(0)
    assert(maxHd < 8, s"a >=0.98-Jaccard pair at hd=$maxHd breaks the pigeonhole premise")
    // and the operator's output equals the brute-force set exactly
    val got = TextQueries.dedupSimhashVerified(spark, sfDir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = truePairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"missing ${(want -- got).take(5)}, extra ${(got -- want).take(5)}")
  }

  test("shipped adaptive config recalls ALL pairs under the pigeonhole bound") {
    // b bands guarantee recall 1.0 at Hamming < b: the 500-doc corpus
    // ships 4 bands (Manku et al.'s production setting: 64-bit
    // simhash, 4-way split, exact at d <= 3), so every d <= 3 pair
    // must be found exactly.
    val docs = Tables.load(spark, sfDir, "documents")
    val sigs = docs.select(col("doc_id"), F.simhash64(col("text")).as("sig"))
    val a = sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val b = sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b"))
    val close = a.join(b, col("id_a") < col("id_b"))
      .filter(F.hamming64(col("sig_a"), col("sig_b")) <= 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bands = graft.text.TextQueries.adaptiveSimhashBands(docs.count())
    assert(bands === 4)
    val blocked = graft.text.TextQueries.simhashPairs(docs, bands, maxHamming = 16)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(close.subsetOf(blocked),
      s"pigeonhole violated: ${(close -- blocked).take(5)} missing")
  }

  test("signature-prefilter ANN (q_sim_sig_rerank) recalls >= 0.9 of brute-force top-5") {
    val brute = graft.sim.SimilarityQueries.cosineTopK(spark, sfDir)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = graft.sim.SimilarityQueries.annSigRerank(spark, sfDir)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ann intersect brute).size.toDouble / math.max(brute.size, 1)
    assert(recall >= 0.9, s"recall $recall (${(ann intersect brute).size}/${brute.size})")
  }

  test("cosine near-dup mining recalls planted perturbed twins (q_dedup_cosine)") {
    import org.apache.spark.sql.DataFrame
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val twins = emb.filter(col("vec_id") % 100 === 0)
      .select((col("vec_id") + 1000000000L).as("vec_id"),
        expr("transform(embedding, (x, i) -> CAST(x * (1.0d + 0.001d * sin(i + 1)) AS FLOAT))")
          .as("embedding"))
    val corpus: DataFrame = emb.unionByName(twins)
    val planted = emb.filter(col("vec_id") % 100 === 0)
      .collect().map(_.getLong(0)).map(v => (v, v + 1000000000L)).toSet
    assert(planted.nonEmpty)
    val found = graft.sim.SimilarityQueries
      .nearDupPairs(corpus, "vec_id", "embedding", threshold = 0.98)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // recall on the planted twins
    val recall = (found intersect planted).size.toDouble / planted.size
    assert(recall >= 0.9, s"recall $recall (${(found intersect planted).size}/${planted.size})")
    // precision is exact by construction: every emitted pair really
    // crosses the threshold (brute-force check over the found set)
    val brute = corpus.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
      .join(corpus.select(col("vec_id").as("id_b"), col("embedding").as("emb_b")),
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.FlinkFunctions.cosineSimilarity(col("emb_a"), col("emb_b")).as("cos"))
      .filter(col("cos") >= 0.98)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.subsetOf(brute), "blocking invented a pair below the threshold")
  }

  test("IVF ANN with nProbe = nCells degenerates to exact brute force") {
    val brute = graft.sim.SimilarityQueries.cosineTopK(spark, sfDir)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = graft.sim.SimilarityQueries.ivfAnn(spark, sfDir, nCells = 8, nProbe = 8)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === brute, "probing every cell must equal exhaustive search")
  }

  test("IVF ANN partial probing trades recall for a bounded candidate fraction") {
    val brute = graft.sim.SimilarityQueries.cosineTopK(spark, sfDir)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val part = graft.sim.SimilarityQueries.ivfAnn(spark, sfDir, nCells = 8, nProbe = 4)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (part intersect brute).size.toDouble / brute.size
    // half the cells probed: recall must beat the random-fraction floor
    assert(recall >= 0.4, s"recall $recall")
    assert(part.size === brute.size, "still top-5 per query")
  }

  test("multimodal ANN (bucketed LSH) recalls >= 0.9 of brute-force top-3") {
    import graft.multimodal.MultimodalOps
    import org.apache.spark.sql.expressions.Window
    val feats = MultimodalOps.extractFeatures(
      MultimodalOps.mediaFixture(spark, sfDir), dim = 16).toDF()
    val q = feats.filter(col("media_id") % 100 === 0)
      .select(col("media_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("media_id"))
    val brute = feats.join(broadcast(q), col("media_id") =!= col("q_id"))
      .select(col("q_id"), col("media_id"),
        F.cosineSimilarity(col("q_emb"), col("embedding")).as("cos"))
      .select(col("q_id"), col("media_id"), row_number().over(w).as("rnk"))
      .filter(col("rnk") <= 3)
      .select("q_id", "media_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = graft.operators.MiscQueries.multimodalAnn(spark, sfDir)
      .select("q_id", "media_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ann intersect brute).size.toDouble / math.max(brute.size, 1)
    assert(recall >= 0.9, s"recall $recall (${(ann intersect brute).size}/${brute.size})")
  }

  test("bucketed multi-table multi-probe ANN yields full top-5 candidate sets") {
    // the bucketed path is the variant for corpora WITH cluster
    // structure; on this near-random corpus its recall is inherently
    // low (~0.3 measured), but multi-table + Hamming-1 probing must at
    // least fill every query's candidate set (round 1 returned 24/50
    // rows from a single table+probe)
    val ann = graft.sim.SimilarityQueries.lshAnn(spark, sfDir).collect()
    assert(ann.length === 50, s"expected 10 queries x 5 rows, got ${ann.length}")
  }
}
