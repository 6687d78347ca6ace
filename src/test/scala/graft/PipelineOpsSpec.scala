package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.text.{DedupCluster, TextQueries}

/** Round-8 pipeline operators: streaming contamination twin, packing
  * math, mixing determinism, reliable-checkpoint CC path.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming contamination equals the batch probe on the same docs") {
    val benchDocs = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val benchGrams = benchDocs
      .withColumn("l", split(col("text"), " "))
      .select(explode(expr(
        """transform(sequence(0, size(l) - 5),
          |  i -> concat_ws(' ', l[i], l[i+1], l[i+2], l[i+3], l[i+4]))""".stripMargin)).as("g"))
      .distinct()
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"), // contains 2 bench 5-grams
      (2L, "one two three four five six"),             // clean
      (3L, "zz alpha beta gamma delta epsilon"))       // 1 bench 5-gram
      .toDF("doc_id", "text")
    val expected = TextQueries.contaminationPairs(docs, benchGrams)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val input = MemoryStream[(Long, String)](77, spark, None)
    val q = TextQueries.contaminationPairs(input.toDF().toDF("doc_id", "text"), benchGrams)
      .writeStream.outputMode("complete").format("memory")
      .queryName("contam_stream").start()
    try {
      input.addData((1L, "alpha beta gamma delta epsilon zeta eta"), (2L, "one two three four five six"))
      q.processAllAvailable()
      input.addData((3L, "zz alpha beta gamma delta epsilon"))
      q.processAllAvailable()
      val got = spark.table("contam_stream")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"stream $got vs batch $expected")
      assert(expected.keySet == Set(1L, 3L) && expected(1L) == 2L && expected(3L) == 1L)
    } finally q.stop()
  }

  test("streaming incremental dedup equals the deterministic batch ingest set") {
    // prior-snapshot store: hashes of two known texts
    val prior = Seq("dup one", "dup two").toDF("text")
      .select(md5(col("text").cast("binary")).as("h"))
    val batch = Seq(
      (10L, "fresh alpha"),   // new content -> ingest
      (11L, "dup one"),       // in store -> reject
      (12L, "fresh alpha"),   // intra-stream repeat -> reject
      (13L, "fresh beta"))    // new content -> ingest
      .toDF("doc_id", "text")
      .repartition(7) // scramble partition/arrival order: the twin must not depend on it
    // Deterministic batch twin = dedupIncremental's min-doc_id
    // keep-first semantics (a batch dropDuplicates would keep an
    // ARBITRARY row per hash — partition/arrival-order dependent).
    // The stream below feeds doc 10 in an earlier micro-batch than
    // its repeat 12, so streaming first-arrival == min-doc_id here.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h")).orderBy(col("doc_id"))
    val expected = batch
      .withColumn("h", md5(col("text").cast("binary")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .join(prior, Seq("h"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(expected == Set(10L, 13L))

    val input = MemoryStream[(Long, String)](78, spark, None)
    val q = TextQueries.ingestStream(input.toDF().toDF("doc_id", "text"), prior)
      .writeStream.outputMode("append").format("memory")
      .queryName("ingest_stream").start()
    try {
      input.addData((10L, "fresh alpha"), (11L, "dup one"))
      q.processAllAvailable()
      // repeat arrives in a LATER micro-batch: dropDuplicates state
      // must remember the first arrival across batches
      input.addData((12L, "fresh alpha"), (13L, "fresh beta"))
      q.processAllAvailable()
      val got = spark.table("ingest_stream")
        .select("doc_id").as[Long].collect().toSet
      assert(got == expected, s"stream $got vs batch $expected")
    } finally q.stop()
  }

  test("truncated-broadcast LM at minCount=1 reduces to the exact model") {
    val exact = TextQueries.lmPerplexity(spark, sfDir)
      .select("doc_id", "avg_logp").as[(Long, Double)].collect().toMap
    val t1 = TextQueries.lmPerplexityTruncated(spark, sfDir, minCount = 1)
      .select("doc_id", "avg_logp").as[(Long, Double)].collect().toMap
    assert(exact.keySet == t1.keySet)
    exact.foreach { case (k, v) => assert(math.abs(v - t1(k)) < 1e-9) }
    // at the production floor the scores shift (smoothing mass absorbs
    // rare grams) but stay finite and the model stays discriminative:
    // not all docs collapse to one score
    val t2 = TextQueries.lmPerplexityTruncated(spark, sfDir, minCount = 2)
      .select("avg_logp").as[Double].collect()
    assert(t2.forall(v => !v.isNaN && !v.isInfinite))
    assert(t2.distinct.length > t2.length / 2)
  }

  test("truncated-LM broadcast hint is gated on estimated model size") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    def hints(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect { case h: ResolvedHint => h }.size
    // tiny gate corpus under the default 10 MB cap: model tables
    // broadcast (2 hints) + the always-broadcast 1-row vocab = 3
    val on = TextQueries.lmPerplexityTruncated(spark, sfDir)
    assert(hints(on) == 3, s"expected gated-on hints, got ${hints(on)}")
    // cap 0 = the 100 TB too-big-model path: only the vocab hint
    // survives; the model tables fall back to plain (exchange) joins
    val off = TextQueries.lmPerplexityTruncated(spark, sfDir, broadcastCapBytes = 0L)
    assert(hints(off) == 1, s"expected gated-off hints, got ${hints(off)}")
    // knownModelRows is trusted verbatim (catalog-stats path): a huge
    // claimed model gates the hint off with no counting action
    val stats = TextQueries.lmPerplexityTruncated(spark, sfDir,
      knownModelRows = Some(1L << 40))
    assert(hints(stats) == 1)
    // both plan shapes score identically
    val a = on.select("doc_id", "avg_logp").as[(Long, Double)].collect().toMap
    val b = off.select("doc_id", "avg_logp").as[(Long, Double)].collect().toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-9) }
  }

  test("sequence packing math matches a per-shard reference fold") {
    val out = TextQueries.packSequences(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    out.groupBy(_._2).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (_, _, nTok, startSeq, startOff, endSeq) =>
        assert(startSeq == cum / 512 && startOff == cum % 512)
        assert(endSeq == (cum + nTok - 1) / 512)
        cum += nTok
      }
    }
  }

  test("hash mixing is deterministic and respects per-source weights") {
    val a = TextQueries.mixSources(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    val b = TextQueries.mixSources(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(a.sorted.sameElements(b.sorted))
    a.foreach { case (src, w, total, kept) =>
      assert(kept <= total)
      val n = src.drop(3).toInt
      val expW = Seq(1.0, 0.5, 0.25, 0.1)(n % 4)
      assert(w == expW, s"$src weight $w != $expW")
      if (w == 1.0) assert(kept == total)
    }
  }

  test("streaming mix report converges to the batch report on the same rows") {
    val rows = Seq(
      (1L, "aa bb cc", "src0"), (2L, "dd ee", "src0"),
      (3L, "ff gg hh ii", "src1"), (4L, "jj kk", "src1"),
      (5L, "ll mm nn", "src2"), (6L, "oo pp qq rr", "src3"))
    val expected = TextQueries.mixSourcesStream(
        rows.toDF("doc_id", "text", "source"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSet

    val input = MemoryStream[(Long, String, String)](79, spark, None)
    val q = TextQueries.mixSourcesStream(input.toDF().toDF("doc_id", "text", "source"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("mix_stream").start()
    try {
      input.addData(rows.take(3).map { case (a, b, c) => (a, b, c) }: _*)
      q.processAllAvailable()
      input.addData(rows.drop(3).map { case (a, b, c) => (a, b, c) }: _*)
      q.processAllAvailable()
      val got = spark.table("mix_stream")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == expected, s"stream $got vs batch $expected")
    } finally q.stop()
  }

  test("foreachBatch curriculum binning over a static bin map equals the batch operator") {
    val corpus = Seq(
      (1L, "a"), (2L, "a b"), (3L, "a b c"), (4L, "a b c d"),
      (5L, "a b c d e"), (6L, "a b"), (7L, "a b c d e f"), (8L, "a"))
      .toDF("doc_id", "text")
    val binMap = TextQueries.lengthBinMap(
      corpus.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok")))
      .persist()
    val expected = TextQueries.assignCurriculumBins(corpus, binMap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // the snapshot-covered stream must reproduce the batch assignment
    val got = scala.collection.concurrent.TrieMap.empty[(Long, Long, Int), Unit]
    val input = MemoryStream[(Long, String)](80, spark, None)
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        TextQueries.assignCurriculumBins(batch, binMap)
          .collect().foreach(r => got.put((r.getLong(0), r.getLong(1), r.getInt(2)), ()))
      }.start()
    try {
      input.addData((1L, "a"), (2L, "a b"), (3L, "a b c"), (4L, "a b c d"))
      q.processAllAvailable()
      input.addData((5L, "a b c d e"), (6L, "a b"), (7L, "a b c d e f"), (8L, "a"))
      q.processAllAvailable()
      assert(got.keySet.toSet == expected, s"stream ${got.keySet} vs batch $expected")
    } finally q.stop()
    // a length OUTSIDE the snapshot is flagged -1, never mis-binned
    val unseen = TextQueries.assignCurriculumBins(
      Seq((99L, "a b c d e f g h i j")).toDF("doc_id", "text"), binMap)
      .collect().head
    assert(unseen.getInt(2) == -1)
  }

  test("bounded-window intermediates: the two unpartitioned windows never see the corpus") {
    // vocabOov: the global rank<=V window must plan as WindowGroupLimit
    // — each map task forwards only its local top-V, so the single
    // partition materializes partitions·V rows, not the vocabulary.
    // (LimitPushDownThroughWindow may rewrite rank<=V into
    // TakeOrderedAndProject — same property, per-task local top-V.)
    val vocabPlan = TextQueries.vocabOov(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(vocabPlan.contains("WindowGroupLimit")
        || vocabPlan.contains("TakeOrderedAndProject"),
      "vocab top-V must be pruned map-side before the exchange")
    // curriculumBins: the cumulative window's input is the length
    // HISTOGRAM — cardinality = distinct doc lengths, a tiny fraction
    // of the corpus (and bounded by max doc length regardless of
    // corpus size).
    val docs = Tables.load(spark, sfDir, "documents")
    val nDocs = docs.count()
    val distinctLengths = docs
      .select(size(split(col("text"), " ")).as("n_tok")).distinct().count()
    assert(distinctLengths < nDocs / 2,
      s"histogram ($distinctLengths) should be far smaller than the corpus ($nDocs)")
    val maxLen = docs.select(max(size(split(col("text"), " ")))).first().getInt(0)
    assert(distinctLengths <= maxLen)
  }

  test("connected components with a reliable checkpoint dir") {
    val dir = java.nio.file.Files.createTempDirectory("cc_ckpt").toString
    val m = DedupCluster.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("ida", "idb"),
      checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("incremental minhash dedup flags store near-dups, batch near-dups and fresh docs") {
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep green forest tonight"
    val fresh = "completely different content with novel words arranged in " +
      "an entirely new and unrelated order for this test document"
    val docs = Seq(
      (1L, base, "store"),                 // the already-ingested corpus
      (2L, "another stored document about ships sailing across the wide " +
        "open ocean under a pale winter sky this morning", "store"),
      (10L, base + " extra", "batch"),     // near-dup of store doc 1 -> dup_prior
      (11L, fresh, "batch"),               // novel -> ingest
      (12L, fresh + " appended", "batch"), // near-dup of SMALLER batch id 11 -> dup_batch
      (13L, "tiny doc", "batch"))          // < 3 tokens: no shingles -> ingest
      .toDF("doc_id", "text", "source")
      .repartition(5) // flags must not depend on partition layout
    val got = TextQueries.dedupIncrementalMinhashOn(docs, "batch")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(got == Map(
      10L -> ((1, 0, 0)),
      11L -> ((0, 0, 1)),
      12L -> ((0, 1, 0)),
      13L -> ((0, 0, 1))), s"got $got")
  }

  test("streaming minhash ingest rejects near-dups of docs ingested in EARLIER micro-batches") {
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep green forest tonight"
    val fresh = "completely different content with novel words arranged in " +
      "an entirely new and unrelated order for this test document"
    val other = "yet another body of text whose tokens overlap with nothing " +
      "else appearing anywhere in this particular fixture corpus"
    val storeDir = java.nio.file.Files.createTempDirectory("mh_store").toString
    Seq((1L, base)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(storeDir)

    val input = MemoryStream[(Long, String)](79, spark, None)
    val q = TextQueries.ingestStreamMinhash(
        input.toDF().toDF("doc_id", "text"), storeDir).start()
    try {
      // batch 1: near-dup of the SEEDED store doc rejected, fresh kept
      input.addData((10L, base + " extra"), (11L, fresh))
      q.processAllAvailable()
      // batch 2: near-dup of doc 11 — ingested one micro-batch AGO,
      // visible only because the store grew — rejected; novel kept
      input.addData((12L, fresh + " appended"), (13L, other))
      q.processAllAvailable()
      val ids = spark.read.parquet(storeDir)
        .select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 11L, 13L), s"store holds $ids")
    } finally q.stop()
  }

  test("incremental minhash dedup is a no-op on an all-fresh batch") {
    val docs = Seq(
      (1L, "one stored document full of very ordinary words in a line", "store"),
      (20L, "a genuinely fresh batch document with its own vocabulary here", "batch"),
      (21L, "and a second unrelated batch item containing other tokens entirely", "batch"))
      .toDF("doc_id", "text", "source")
    val got = TextQueries.dedupIncrementalMinhashOn(docs, "batch")
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(got == Map(20L -> 1, 21L -> 1), s"got $got")
  }
}
