package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.text.{ChunkOps, SubstringDedup}
import graft.graph.GraphQueries

/** Round-10 operators: exact-substring dedup (Lee et al. ExactSubstr),
  * overlapping chunker (+streaming twin), hashed linear classifier,
  * BPE merge induction, and the graph family (degree/PageRank/
  * triangles) on fixture graphs with hand-computed answers.
  */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  // 18 shared tokens planted at different offsets in doc 1 and doc 2.
  private val passage = (1 to 18).map(i => s"p$i").mkString(" ")

  test("substring dedup removes the later occurrence of a shared span, keeps the first") {
    val docs = Seq(
      (1L, s"a1 a2 a3 $passage z1 z2"),
      (2L, s"b1 $passage y1 y2 y3 y4"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12 c13 c14 c15 c16 c17"))
      .toDF("doc_id", "text")
    val out = SubstringDedup.dedupSubstringCore(docs, L = 16)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1 is the minimal occurrence — untouched
    assert(out(1L).getInt(2) == 0)
    assert(out(1L).getString(3) == s"a1 a2 a3 $passage z1 z2")
    // doc 2 loses exactly the 18 shared tokens (3 overlapping 16-grams
    // dissolve into one 18-token span), surrounding text survives
    assert(out(2L).getInt(2) == 18)
    assert(out(2L).getString(3) == "b1 y1 y2 y3 y4")
    // doc 3 shares nothing and is shorter than L+1 grams' worth of dups
    assert(out(3L).getInt(2) == 0)
    assert(out(3L).getString(3).startsWith("c1 c2"))
  }

  test("substring dedup is position-exact: a doc duplicating its own span keeps one copy") {
    val docs = Seq((7L, s"$passage m1 m2 $passage")).toDF("doc_id", "text")
    val r = SubstringDedup.dedupSubstringCore(docs, L = 16).collect()(0)
    assert(r.getInt(2) == 18) // second occurrence removed
    assert(r.getString(3) == s"$passage m1 m2")
  }

  test("streaming substring redaction against a static gram store equals batch") {
    val corpus = Seq((1L, s"a1 a2 $passage b1"), (2L, s"c1 $passage d1 d2"))
      .toDF("doc_id", "text")
    val store = SubstringDedup.dupGramStore(corpus)
    val arriving = Seq(
      (10L, s"x1 x2 $passage y1"),          // contains the stored passage
      (11L, "nothing shared with the corpus here at all zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8 zz9"))
    val expected = SubstringDedup
      .dedupSubstringStream(store, arriving.toDF("doc_id", "text"))
      .collect().map(_.toSeq).toSet
    // batch sanity first: doc 10 loses exactly the 18-token passage
    assert(expected == Set(Seq(10L, 18, "x1 x2 y1")))
    val input = MemoryStream[(Long, String)](94, spark, None)
    val q = SubstringDedup
      .dedupSubstringStream(store, input.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("update").format("memory")
      .queryName("substr_stream").start()
    try {
      input.addData(arriving: _*)
      q.processAllAvailable()
      assert(spark.table("substr_stream").collect().map(_.toSeq).toSet == expected)
    } finally q.stop()
  }

  test("fuzzy dedup verifies blocked pairs by edit distance; stop-grams mint no pairs") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val boiler = (1 to 8).map(i => s"bp$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("fuzzy").toString
    val docs =
      Seq((1L, s"$shared tail one"), (2L, s"$shared tail two")) ++ // near-identical pair
      Seq((3L, "totally different content with no shared runs at all x1 x2 x3")) ++
      // 25 docs sharing ONLY a df=25 boilerplate gram (> maxDf=20):
      // the stop-gram cut must drop it, so they pair with nothing
      (100L to 124L).map(i => (i, s"$boiler unique$i " + (1 to 9).map(j => s"u${i}_$j").mkString(" ")))
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SubstringDedup.dedupFuzzy(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq((1L, 2L, 3)))  // one edit: "one" -> "two" is 3 substitutions
  }

  test("overlapping chunker covers every token with the documented stride geometry") {
    val text = (1 to 100).map(i => s"t$i").mkString(" ")
    val docs = Seq((5L, text)).toDF("doc_id", "text")
    val rows = ChunkOps.chunkCore(docs, chunkTok = 64, stride = 48)
      .orderBy("chunk_idx").collect()
    assert(rows.map(_.getInt(2)).toSeq == Seq(0, 48, 96))   // start_tok
    assert(rows.map(_.getInt(3)).toSeq == Seq(64, 52, 4))   // n_tok_chunk
    // chunk 0 and 1 overlap on tokens 49..64 (16 tokens)
    val c0 = rows(0).getString(4).split(" ")
    val c1 = rows(1).getString(4).split(" ")
    assert(c0.takeRight(16).toSeq == c1.take(16).toSeq)
    // the tail chunk repeats chunk 1's last 4 tokens (t97..t100)
    assert(rows(2).getString(4).split(" ").toSeq == c1.takeRight(4).toSeq)
  }

  test("chunker runs unchanged on a stream (stateless map-only twin)") {
    val docs = Seq((1L, "a b c d e"), (2L, (1 to 70).map("w" + _).mkString(" ")))
    val expected = ChunkOps.chunkCore(docs.toDF("doc_id", "text"))
      .collect().map(_.toSeq).toSet
    val input = MemoryStream[(Long, String)](91, spark, None)
    val q = ChunkOps.chunkCore(input.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory")
      .queryName("chunk_stream").start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("chunk_stream").collect().map(_.toSeq).toSet
      assert(got == expected)
    } finally q.stop()
  }

  test("hashed classifier matches an independent md5 derivation for a one-token doc") {
    val docs = Seq((1L, "hello")).toDF("doc_id", "text")
    // independent derivation with java.security, no Spark functions
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val bucket = (java.lang.Long.parseLong(md5hex("hello").take(8), 16) % 256).toInt
    val wt = java.lang.Long.parseLong(md5hex(s"w:$bucket").take(4), 16).toDouble / 65535.0 - 0.5
    val feats = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("bucket",
        pmod(conv(substring(md5(col("tok").cast("binary")), 1, 8), 16, 10).cast("bigint"),
          lit(256)).cast("int"))
    assert(feats.collect()(0).getInt(2) == bucket)
    // run the real operator against a temp parquet dir shaped like testdata
    val dir = java.nio.file.Files.createTempDirectory("clf").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ChunkOps.classifierHashed(spark, dir).collect()(0)
    val expProb = 1.0 / (1.0 + math.exp(-wt))
    assert(math.abs(out.getDouble(2) - expProb) < 1e-12)
    assert(out.getBoolean(3) == (wt > 1e-9))
  }

  test("best-fit packer: first-fit-decreasing with whole docs, hand-computed bins") {
    def doc(id: Long, n: Int) = (id, (1 to n).map(i => s"t$i").mkString(" "))
    val dir = java.nio.file.Files.createTempDirectory("ffd").toString
    Seq(doc(1, 300), doc(2, 300), doc(3, 212), doc(4, 212), doc(5, 100))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ChunkOps.packBestFit(spark, dir, cap = 512, nShards = 1)
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3))).toMap
    // FFD: 300->bin0, 300->bin1, 212 fills bin0, 212 fills bin1, 100->bin2
    assert(out == Map(1L -> ((0, 0)), 2L -> ((1, 0)),
      3L -> ((0, 300)), 4L -> ((1, 300)), 5L -> ((2, 0))))
  }

  test("best-fit packer: bounded open-bin buffer evicts the tightest bin") {
    def doc(id: Long, n: Int) = (id, (1 to n).map(i => s"t$i").mkString(" "))
    val dir = java.nio.file.Files.createTempDirectory("ffd1").toString
    Seq(doc(1, 6), doc(2, 5), doc(3, 4), doc(4, 3))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ChunkOps.packBestFit(spark, dir, cap = 10, nShards = 1, openBins = 1)
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3))).toMap
    // 6->bin0; 5 can't fit, bin0 evicted, ->bin1; 4 fits bin1 at 5; 3 -> bin2
    assert(out == Map(1L -> ((0, 0)), 2L -> ((1, 0)), 3L -> ((1, 5)), 4L -> ((2, 0))))
  }

  test("BPE learns the classic merge sequence on a hand-computed vocab") {
    val docs = Seq((1L, "ab ab ab abc")).toDF("doc_id", "text")
    val merges = ChunkOps.bpeLearn(spark, docs, nMerges = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // pair (a,b) freq 4 merges first; then (ab,c) freq 1; then nothing
    assert(merges.toSeq == Seq((1, "a", "b", 4L), (2, "ab", "c", 1L)))
  }

  test("BPE merge splice is left-to-right non-overlapping") {
    // "aaaa" with merge (a,a): -> [aa, aa], not [aa, a, a] or cascade [aaaa]
    val docs = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val merges = ChunkOps.bpeLearn(spark, docs, nMerges = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: pairs of "aaaa" = (a,a) x3 weighted by freq 2 -> 6
    assert(merges(0) == ((1, "a", "a", 6L)))
    // round 2: symbols are [aa, aa] per word -> pair (aa,aa) freq 2
    assert(merges(1) == ((2, "aa", "aa", 2L)))
  }

  test("BPE encode applies the learned merge table at vocab level") {
    val learnDocs = Seq((1L, "ab ab ab abc")).toDF("doc_id", "text")
    val merges = ChunkOps.bpeLearn(spark, learnDocs)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges == Seq(("a", "b"), ("ab", "c")))
    val encodeDocs = Seq((9L, "ab ab abc x")).toDF("doc_id", "text")
    val out = ChunkOps.bpeEncode(spark, encodeDocs, merges).collect()(0)
    // "ab"->[ab] (1 sym), "abc"->[abc] (1), "x"->[x] (1): 4 words, 4 bpe tokens
    assert(out.getLong(1) == 4L && out.getLong(2) == 4L)
    // without merges the same doc costs 2+2+3+1 = 8 symbols
    val raw = ChunkOps.bpeEncode(spark, encodeDocs, Seq.empty).collect()(0)
    assert(raw.getLong(2) == 8L)
  }

  test("BPE scala tokenizer matches the expression splice fold symbol-for-symbol") {
    // r17: bpeEncode switched from 8 chained aggregate-HOF folds to the
    // init-once applyMerges tokenizer — this pins the two semantics
    // equal on the adversarial shapes: adjacent matches (greedy
    // non-overlap), cascading merges (merged symbol feeds a later
    // merge), no-op merges, and a non-ASCII (surrogate-pair) word.
    val merges = Seq(("a", "a"), ("aa", "b"), ("x", "y"), ("m", "er"))
    val words = Seq("aaaa", "aaaab", "aab", "baaab", "xyxy", "mmer",
      "q", "ab", "𝄞a𝄞", "banana")
    val wdf = words.map(Tuple1(_)).toDF("w")
      .withColumn("sym", expr("filter(split(w, ''), x -> x <> '')"))
    val folded = merges.foldLeft(wdf) { case (v, (l, r)) =>
      v.withColumn("sym", ChunkOps.spliceExpr(l, r))
    }.collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    words.foreach { w =>
      assert(ChunkOps.applyMerges(w, merges).toList == folded(w),
        s"tokenizer diverged on '$w'")
    }
    // hand-checked anchors: greedy non-overlap and the cascade
    assert(ChunkOps.applyMerges("aaaa", merges).toList == List("aa", "aa"))
    assert(ChunkOps.applyMerges("aab", merges).toList == List("aab"))
  }

  test("curation funnel is monotone: each stage keeps a subset of the previous") {
    val rows = graft.text.SelectionQueries.pipelineCurate(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set("raw", "quality", "substring_dedup", "dsir"))
    assert(rows("raw")._1 >= rows("quality")._1)
    assert(rows("quality")._1 == rows("substring_dedup")._1) // redaction drops tokens, not docs
    assert(rows("substring_dedup")._1 >= rows("dsir")._1)
    assert(rows("quality")._2 >= rows("substring_dedup")._2)  // tokens only shrink
    assert(rows("raw")._1 > 0 && rows("dsir")._2 >= 0)
  }

  test("DSIR ranks target-like docs above off-distribution docs") {
    val dir = java.nio.file.Files.createTempDirectory("dsir").toString
    Seq((1L, "alpha alpha alpha", "src0"),
        (2L, "alpha alpha beta", "src1"),
        (3L, "gamma gamma gamma", "src1"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val w = graft.text.SelectionQueries.dsirSelect(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1L) > w(2L))  // pure target token beats mixed
    assert(w(2L) > w(3L))  // mixed beats never-in-target
  }

  test("cluster-balanced sample takes at most `per` members per cell") {
    val out = graft.sim.SimilarityQueries.clusterSample(spark, sfDir).collect()
    val perCell = out.groupBy(_.getInt(1)).view.mapValues(_.length)
    assert(perCell.values.forall(_ <= 2))
    assert(out.map(_.getInt(2)).forall(p => p == 1 || p == 2))
    assert(out.nonEmpty)
  }

  test("hashed classifier scores a stream identically to batch (static weight table)") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"), (3L, "zeta"))
    val weights = ChunkOps.weightTable(spark)
    val expected = ChunkOps.classifierCore(docs.toDF("doc_id", "text"), weights)
      .collect().map(_.toSeq).toSet
    val input = MemoryStream[(Long, String)](92, spark, None)
    val q = ChunkOps.classifierCore(input.toDF().toDF("doc_id", "text"), weights)
      .writeStream.outputMode("complete").format("memory")
      .queryName("clf_stream").start()
    try {
      input.addData(docs.take(2): _*)
      q.processAllAvailable()
      input.addData(docs.drop(2): _*)
      q.processAllAvailable()
      assert(spark.table("clf_stream").collect().map(_.toSeq).toSet == expected)
    } finally q.stop()
  }

  test("DSIR scores a stream identically to batch against the static model snapshot") {
    val ref = Seq((1L, "alpha alpha beta", "src0"), (2L, "gamma gamma delta", "src1"),
        (3L, "alpha gamma", "src1"))
      .toDF("doc_id", "text", "source")
    val arriving = Seq((10L, "alpha alpha", "srcX"), (11L, "gamma delta", "srcX"))
    val expected = graft.text.SelectionQueries
      .dsirStream(spark, ref, arriving.toDF("doc_id", "text", "source"))
      .collect().map(_.toSeq).toSet
    val input = MemoryStream[(Long, String, String)](93, spark, None)
    val q = graft.text.SelectionQueries
      .dsirStream(spark, ref, input.toDF().toDF("doc_id", "text", "source"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("dsir_stream").start()
    try {
      input.addData(arriving: _*)
      q.processAllAvailable()
      assert(spark.table("dsir_stream").collect().map(_.toSeq).toSet == expected)
    } finally q.stop()
  }

  test("PageRank one round on a path graph matches the hand computation") {
    val e0 = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = GraphQueries.pageRankOnEdges(e0, iters = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(1L) - 0.575) < 1e-9)  // 0.15 + 0.85 * (1/2)
    assert(math.abs(r(2L) - 1.85) < 1e-9)   // 0.15 + 0.85 * (1 + 1)
    assert(math.abs(r(3L) - 0.575) < 1e-9)
  }

  test("personalized PageRank restarts at the seed and conserves unit mass") {
    val e0 = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r1 = GraphQueries.pprOnEdges(e0, iters = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // seed=1: p0 = (1,0,0); p1(1)=0.15, p1(2)=0.85*(1/1)=0.85, p1(3)=0
    assert(math.abs(r1(1L) - 0.15) < 1e-9)
    assert(math.abs(r1(2L) - 0.85) < 1e-9)
    assert(math.abs(r1(3L) - 0.0) < 1e-9)
    val r5 = GraphQueries.pprOnEdges(e0, iters = 5).collect().map(_.getDouble(1))
    assert(math.abs(r5.sum - 1.0) < 1e-9) // restart-to-seed keeps unit mass
  }

  test("PageRank conserves total mass on a regular graph") {
    // 4-cycle: every node keeps rank exactly 1.0 at every iteration
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val r = GraphQueries.pageRankOnEdges(e0, iters = 5)
      .collect().map(x => x.getDouble(1))
    assert(r.forall(v => math.abs(v - 1.0) < 1e-9))
  }

  test("SSSP computes hop distances from the minimum node; the hop bound prunes") {
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val d = GraphQueries.ssspOnEdges(e0, maxHops = 6)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
    val d2 = GraphQueries.ssspOnEdges(e0, maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d2 == Map(1L -> 0, 2L -> 1, 3L -> 2)) // node 4 beyond the bound
  }

  test("fixpoint SSSP converges to the bounded-hop result past the diameter") {
    // chain of 5 (diameter 4) plus a disconnected pair {10,11}: the
    // fixpoint loop must stop on its own and never reach 10/11
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L)).toDF("src", "dst")
    val fp = GraphQueries.ssspFixpointOnEdges(e0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    val bounded = GraphQueries.ssspOnEdges(e0, maxHops = 6)
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(fp == bounded)
    // int-typed edge frame satisfies the generic contract (Number seed)
    val eInt = Seq((1, 2), (2, 3)).toDF("src", "dst")
    val fpInt = GraphQueries.ssspFixpointOnEdges(eInt)
      .collect().map(r => r.getAs[Number](0).longValue() -> r.getLong(1)).toMap
    assert(fpInt == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("label propagation separates two bridged triangles into two communities") {
    // triangles {1,2,3} and {4,5,6} with bridge (3,4); 3 synchronous
    // rounds of most-frequent-neighbor-label (ties to smallest) —
    // hand-traced: 1,2,3 -> label 1 and 4,5,6 -> label 3
    val e0 = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
      .toDF("src", "dst")
    val l = GraphQueries.labelPropOnEdges(e0, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("graph CC labels every co-purchase node with its component's min id") {
    val out = GraphQueries.connectedComp(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(out.nonEmpty)
    assert(out.forall { case (node, comp) => comp <= node })
    // component labels are themselves member nodes
    val nodes = out.map(_._1).toSet
    assert(out.map(_._2).toSet.subsetOf(nodes))
  }

  test("degree-ordered triangle count is exact on a fixture graph") {
    // triangles {1,2,3} and {2,3,4}; edge (4,5) closes nothing
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val out = GraphQueries.trianglesOnEdges(e).collect()(0)
    assert(out.getLong(0) == 5L)  // n_nodes
    assert(out.getLong(1) == 6L)  // n_edges
    assert(out.getLong(2) == 2L)  // n_triangles
  }
}
