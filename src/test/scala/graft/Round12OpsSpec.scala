package graft

import org.apache.spark.sql.functions._

import graft.text.{FrequencyOps, MgStore}

/** Round-12 operators: the streaming heavy-hitters twin. */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming heavy hitters: per-batch MG summaries folded into a mergeable " +
      "store + exact recount == the batch operator") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // planted heavy-tailed stream: the heavies arrive SPREAD ACROSS
    // batches (no single batch shows their full weight) and the cold
    // tail churns different tokens every batch, forcing store
    // compactions between folds
    val b1 = Seq.fill(120)("aaa") ++ Seq.fill(30)("bbb") ++
      (1 to 200).map(i => s"cold_a$i")
    val b2 = Seq.fill(100)("bbb") ++ Seq.fill(80)("aaa") ++
      (1 to 200).map(i => s"cold_b$i")
    val b3 = Seq.fill(100)("aaa") ++ Seq.fill(60)("ccc") ++
      (1 to 110).map(i => s"cold_c$i")
    val phi = 10
    val k = 20

    val store = new MgStore(k)
    val input = MemoryStream[String](91, spark, None)
    val q = input.toDS().writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[String], id: Long) =>
        store.fold(df, id)
        // at-least-once replay of the SAME batchId (what foreachBatch
        // delivers after a mid-batch failure) must be a no-op
        store.fold(df, id)
        ()
      }.start()
    try {
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b)
        q.processAllAvailable()
      }
    } finally q.stop()

    val all = (b1 ++ b2 ++ b3)
    assert(store.total === all.size.toLong, "sentinel totals must sum the stream")
    assert(store.size <= k, "compaction must hold the store at k counters")

    val allDs = all.toDS().repartition(5)
    val streamed = FrequencyOps.recountExact(allDs, store, phi)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val batch = FrequencyOps.heavyHittersOn(allDs, phi, k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val n = all.size
    val brute = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter { case (_, c) => c * phi > n }
    assert(streamed === brute, s"stream-fold diverged from brute force (n=$n)")
    assert(streamed === batch, "stream-fold twin must equal the batch operator")
  }

  test("streaming drift monitor: per-batch count deltas folded into the store " +
      "read out the SAME KL as the batch operator") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft_drift_store").toString + "/st"
    // three sources with deliberately different token mixes, arriving
    // interleaved across batches so no single batch sees a source whole
    val b1 = Seq(("web", "the cat sat on the mat"), ("lab", "alpha beta gamma alpha"))
    val b2 = Seq(("web", "the dog sat on the log"), ("ref", "the the the alpha"))
    val b3 = Seq(("lab", "beta beta gamma delta"), ("web", "cat dog mat log"))

    val input = MemoryStream[(String, String)](92, spark, None)
    val q = FrequencyOps.ingestStreamDrift(
      input.toDS().toDF("source", "text"), storeDir).start()
    try {
      Seq(b1, b2, b3).foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()

    val streamed = FrequencyOps.driftKlFromStore(spark, storeDir)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val batch = FrequencyOps.driftKlOn((b1 ++ b2 ++ b3).toDF("source", "text"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(streamed.keySet === Set("web", "lab", "ref"))
    assert(batch.keySet === streamed.keySet)
    streamed.foreach { case (src, kl) =>
      assert(math.abs(kl - batch(src)) < 1e-9,
        s"$src: stream-fold $kl vs batch ${batch(src)}")
    }
    // the store holds per-batch deltas; compaction must be exact, so
    // a token split across batches ("the": 4 web + 3 ref arrivals)
    // reads back its true total
    val the = spark.read.parquet(storeDir)
      .filter(col("tk") === "the").groupBy(col("source"))
      .agg(sum(col("c_st")).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(the === Map("web" -> 4L, "ref" -> 3L))
  }

  test("property: packBestFit equals an independent in-JVM FFD fold on a " +
      "randomized corpus (lengths 1..600, cap-clamp edge included)") {
    import graft.text.ChunkOps
    // synthetic corpus: seeded lengths spanning the 512-token clamp
    val rnd = new scala.util.Random(42)
    val docs = (1L to 300L).map { id =>
      val n = 1 + rnd.nextInt(600)
      (id, Seq.fill(n)("w").mkString(" "), "en", "synthetic", n.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_pack_prop").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val got = ChunkOps.packBestFit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toSet

    // independent reference: same shard hash (md5 first-4-hex % 8),
    // same (len desc, id) order, same first-fit + tightest-evict fold
    def shardOf(id: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"shard:$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      Integer.parseInt(hex.substring(0, 4), 16) % 8
    }
    val cap = 512; val openBins = 16
    val expected = docs.map { case (id, _, _, _, n) =>
      (id, math.min(n, cap.toLong).toInt, shardOf(id))
    }.groupBy(_._3).flatMap { case (sh, ds) =>
      var bins = Vector.empty[(Int, Int)]
      var nextBin = 0
      ds.sortBy { case (id, n, _) => (-n, id) }.map { case (id, n, _) =>
        val fit = bins.indexWhere { case (_, used) => used + n <= cap }
        val (b, off) =
          if (fit >= 0) {
            val (bid, used) = bins(fit)
            bins = bins.updated(fit, (bid, used + n)); (bid, used)
          } else {
            if (bins.size >= openBins) {
              val evict = bins.zipWithIndex
                .minBy { case ((_, used), i) => (cap - used, i) }._2
              bins = bins.patch(evict, Nil, 1)
            }
            val bid = nextBin; nextBin += 1
            bins = bins :+ ((bid, n)); (bid, 0)
          }
        (id, sh, b, off, n)
      }
    }.toSet
    assert(got === expected,
      s"packer diverged from the reference fold: ${(got diff expected).take(3)} / ${(expected diff got).take(3)}")
  }

  test("MgStore merge rule: counters sum, compaction subtracts the (k+1)-th " +
      "largest and never drops a φ-heavy token") {
    val store = new MgStore(3)
    // two summary folds whose union exceeds k=3: compaction must fire
    store.merge(Seq(("hot", 50L, 0L), ("w1", 3L, 0L), (null, 0L, 60L)))
    store.merge(Seq(("hot", 40L, 0L), ("w2", 2L, 0L), ("w3", 2L, 0L), (null, 0L, 50L)))
    assert(store.total === 110L)
    assert(store.size <= 3)
    // hot has true weight >= 90 out of 110; any k=3 merge keeps it
    assert(store.candidates.contains("hot"))
  }
}
