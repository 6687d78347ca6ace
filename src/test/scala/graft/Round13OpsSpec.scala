package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.streaming.{RollingFileSink, UpsertSink}

/** Round-13 operators: the SINK half of the exactly-once contract.
  * DatagenSourceSpec pins the source side (restored offsets seed the
  * frontier); these tests kill a foreachBatch sink mid-epoch and
  * assert the restart re-commits the interrupted epoch idempotently —
  * the reference's Sink/Committer two-phase commit
  * (flink-core connector/sink2/Sink.java:47) on Spark terms.
  */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  /** Crash injected AFTER the sink body ran but BEFORE Spark commits
    * the batch's offsets — the exact window where foreachBatch
    * degrades to at-least-once and re-delivers the epoch on restart.
    */
  @volatile private var failNext = false

  private def crashPoint(): Unit =
    if (failNext) {
      failNext = false
      throw new RuntimeException("injected crash after sink write, before offset commit")
    }

  test("upsert sink: an epoch that crashes after its merge re-commits " +
      "idempotently on restart (no duplicate, no lost row)") {
    val base = java.nio.file.Files.createTempDirectory("graft_eos_upsert").toString
    val in = s"$base/in"; val state = s"$base/state"; val ckpt = s"$base/ckpt"
    new java.io.File(in).mkdirs()
    val schema = StructType.fromDDL("k BIGINT, seq BIGINT, v STRING")

    def start() = spark.readStream.schema(schema).parquet(in)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, id: Long) =>
        UpsertSink.mergePartitioned(Seq("k"), "seq", state, numBuckets = 4)(df, id)
        crashPoint()
      }.start()

    Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("k", "seq", "v")
      .write.mode("append").parquet(in)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // epoch 1: an update + a new key; the merge APPLIES, then the
    // query dies before the offset commit
    Seq((1L, 2L, "a2"), (3L, 1L, "c")).toDF("k", "seq", "v")
      .write.mode("append").parquet(in)
    failNext = true
    val q2 = start()
    intercept[Exception] { q2.processAllAvailable() }
    q2.stop()

    // restart from the checkpoint: the SAME epoch re-delivers and the
    // keep-latest merge must absorb the replay
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    val rows = UpsertSink.readPartitioned(spark, state).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("seq"), r.getAs[String]("v")))
    assert(rows.length === rows.map(_._1).distinct.length,
      s"replay duplicated keys: ${rows.toSeq}")
    assert(rows.toSet === Set((1L, 2L, "a2"), (2L, 1L, "b"), (3L, 1L, "c")),
      s"replay lost or corrupted rows: ${rows.toSeq}")
  }

  test("rolling sink tx: a committed epoch's re-delivery is a no-op, and a " +
      "partial publish (crash mid-rename) rolls back before republish") {
    val base = java.nio.file.Files.createTempDirectory("graft_eos_roll").toString
    val out = s"$base/out"
    val df0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    RollingFileSink.rollingTx(out, "parquet", 128L << 20)(df0, 0L)
    // post-commit re-delivery of the SAME epoch: the marker short-circuits
    RollingFileSink.rollingTx(out, "parquet", 128L << 20)(df0, 0L)
    assert(spark.read.parquet(out).count() === 2,
      "re-delivered committed epoch appended duplicates")

    // crash mid-publish of epoch 1: one b1- file landed, no marker —
    // the replay must sweep it before republishing
    val staleDir = s"$base/stale"
    Seq((98L, "stale"), (99L, "stale")).toDF("id", "v")
      .coalesce(1).write.parquet(staleDir)
    val part = new java.io.File(staleDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(out, "b1-" + part.getName).toPath)
    assert(spark.read.parquet(out).count() === 4, "stale partial-publish file not visible")
    RollingFileSink.rollingTx(out, "parquet", 128L << 20)(
      Seq((3L, "c")).toDF("id", "v"), 1L)
    val all = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(all === Set((1L, "a"), (2L, "b"), (3L, "c")),
      s"partial publish not rolled back: $all")
  }

  test("streaming sessionization twin: out-of-order planted stream folded " +
      "through watermarked keyed state == the batch gaps-and-islands pass") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.SessionizeStream

    def ts(hms: String): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(s"2024-03-01 $hms")
    // gap 1 minute; u1 has two sessions (3 events / 2 events), u2 three
    // single-event sessions; arrivals are OUT OF ORDER across batches
    // but inside the 10-minute lateness
    val real = Seq(
      (1L, ts("10:00:00"), 101L), (1L, ts("10:00:30"), 102L),
      (1L, ts("10:00:50"), 103L), (1L, ts("10:05:00"), 104L),
      (1L, ts("10:05:20"), 105L),
      (2L, ts("10:00:10"), 201L), (2L, ts("10:07:00"), 202L),
      (2L, ts("10:16:30"), 203L))
    val batches = Seq(
      Seq((1L, ts("10:00:00"), 101L), (2L, ts("10:07:00"), 202L),
        (1L, ts("10:05:20"), 105L)),
      Seq((1L, ts("10:00:50"), 103L), (1L, ts("10:05:00"), 104L),
        (2L, ts("10:00:10"), 201L)),
      Seq((1L, ts("10:00:30"), 102L), (2L, ts("10:16:30"), 203L)),
      // watermark flush: a far-future event advances the frontier...
      Seq((999L, java.sql.Timestamp.valueOf("2024-03-02 10:00:00"), 901L)),
      // ...and a second batch lets the event-time timers fire
      Seq((999L, java.sql.Timestamp.valueOf("2024-03-02 10:00:01"), 902L)))

    val input = MemoryStream[(Long, java.sql.Timestamp, Long)](131, spark, None)
    val streamed = SessionizeStream.sessionize(
      input.toDF().toDF("user_id", "ts", "event_id"),
      gapMinutes = 1, lateness = "10 minutes")
    val q = streamed.writeStream.outputMode("append")
      .format("memory").queryName("r13_sessions").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val got = spark.table("r13_sessions")
      .filter(col("user_id") =!= 999L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = graft.operators.EventAnalytics.sessionizeOnEvents(
        real.toDF("user_id", "ts", "event_id"), gapMinutes = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(batch.nonEmpty && batch.exists(_._3 > 1), s"weak fixture: $batch")
    assert(got === batch,
      s"stream sessions diverged from batch:\n stream=$got\n batch=$batch")
  }

  test("rolling sink tx end-to-end: a streaming query killed between commit " +
      "and offset-commit restarts without duplicating the epoch") {
    val base = java.nio.file.Files.createTempDirectory("graft_eos_roll_e2e").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    new java.io.File(in).mkdirs()
    val schema = StructType.fromDDL("id BIGINT, v STRING")

    def start() = spark.readStream.schema(schema).parquet(in)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, id: Long) =>
        RollingFileSink.rollingTx(out, "parquet", 128L << 20)(df, id)
        crashPoint()
      }.start()

    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.mode("append").parquet(in)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    Seq((3L, "c"), (4L, "d")).toDF("id", "v").write.mode("append").parquet(in)
    failNext = true
    val q2 = start()
    intercept[Exception] { q2.processAllAvailable() }
    q2.stop()

    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(got === Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")),
      s"append sink replay broke exactly-once: $got")
  }

  test("cms_estimate: probe hash == insert hash (one-sided over the " +
      "WHOLE vocabulary), eps*N overcount bound on the heavy head, " +
      "SQL name registered, plan stays codegen'd") {
    // adversarial vocab: empty-adjacent, unicode, shared prefixes —
    // anything where a probe-side hash mismatch would show as est <
    // exact (CMS can never undercount when hashes agree)
    val words = Seq("a", "aa", "ab", "é", "token", "token2", "の", "-", "x" * 100)
    val rows = words.zipWithIndex.flatMap { case (w, i) => Seq.fill(i * 7 + 1)(w) }
    val toks = rows.toDF("tk")
    val n = rows.size.toLong
    val withEst = toks
      .crossJoin(broadcast(toks.agg(
        expr("count_min_sketch(tk, 0.0005D, 0.999D, 42)").as("sk"))))
      .groupBy(col("tk"), col("sk")).agg(count(lit(1)).as("cnt"))
      .select(col("tk"), col("cnt"),
        graft.functions.FlinkFunctions.cmsEstimate(col("sk"), col("tk")).as("est"))
    val got = withEst.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty && got.forall { case (_, cnt, est) => est >= cnt },
      s"CMS undercounted — probe hash diverges from insert hash: ${got.mkString(",")}")
    assert(got.forall { case (_, cnt, est) => est <= cnt + math.ceil(0.0005 * n).toLong },
      s"CMS overcount above eps*N: ${got.mkString(",")}")
    // SQL-surface twin returns the identical estimates
    graft.functions.FlinkFunctions.registerAll(spark)
    withEst.select(col("tk"), col("est")).createOrReplaceTempView("cms_scala")
    toks.createOrReplaceTempView("cms_toks")
    val sqlDiff = spark.sql(
      """SELECT t.tk FROM
        |  (SELECT tk, cms_estimate(
        |     (SELECT count_min_sketch(tk, 0.0005D, 0.999D, 42) FROM cms_toks), tk) AS est
        |   FROM (SELECT DISTINCT tk FROM cms_toks)) t
        |JOIN cms_scala s ON s.tk = t.tk AND s.est <> t.est""".stripMargin).count()
    assert(sqlDiff === 0L, "SQL-name cms_estimate diverged from the Column API")
    // the probe projection must live inside whole-stage codegen —
    // CmsEstimate defineCodeGen's into a static call, never a fallback
    val plan = withEst.queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), s"probe fell out of codegen:\n$plan")
  }

  test("CmsStore: stream-fold across micro-batches EQUALS the batch " +
      "sketch over the concatenated stream (linear sketch), and a " +
      "replayed batchId is a no-op") {
    import graft.text.CmsStore
    val b1 = Seq("a", "b", "a", "c").toDF("tk")
    val b2 = Seq("b", "b", "d", "a").toDF("tk")
    val b3 = Seq("e", "a", "a", "b").toDF("tk")
    val all = b1.union(b2).union(b3)

    val stream = new CmsStore()
    stream.fold(b1, 0L); stream.fold(b2, 1L); stream.fold(b3, 2L)
    // at-least-once replay of the last batch: same id, must not double-fold
    stream.fold(b3, 2L)
    val batch = new CmsStore()
    batch.fold(all)

    assert(stream.total === batch.total)
    val vocab = Seq("a", "b", "c", "d", "e", "absent")
    vocab.foreach { tk =>
      assert(stream.estimate(tk) === batch.estimate(tk),
        s"linear-sketch merge diverged from one-shot sketch on '$tk'")
    }
    // exactness on this tiny vocab: estimates are >= true counts and
    // the absent token stays within the eps*N overcount bound
    val exact = Map("a" -> 5L, "b" -> 4L, "c" -> 1L, "d" -> 1L, "e" -> 1L, "absent" -> 0L)
    vocab.foreach { tk => assert(stream.estimate(tk) >= exact(tk)) }
    assert(stream.estimate("absent") <= math.ceil(0.0005 * stream.total).toLong)
  }

  test("HllStore: per-batch sketch folds union to a distinct count " +
      "within 2*rsd of exact across batches; replayed batchId is a no-op") {
    import graft.text.HllStore
    // three batches with overlap: distinct union = 1..1500
    val b1 = spark.range(1, 1001).toDF("k")
    val b2 = spark.range(500, 1301).toDF("k")
    val b3 = spark.range(1200, 1501).toDF("k")
    val store = new HllStore()
    store.fold(b1, 0L); store.fold(b2, 1L); store.fold(b3, 2L)
    store.fold(b3, 2L) // at-least-once replay must not double-fold
    val est = store.estimate(spark)
    val exact = 1500L
    assert(math.abs(est - exact) <= 2 * store.rsd * exact,
      s"union estimate $est outside 2*rsd of $exact")
  }

  test("sketch-table pattern: per-group HLL binaries round-trip parquet " +
      "STORAGE and still union to the right global distinct") {
    // the warehouse flow: materialize per-group sketches once, answer
    // any group combination later without touching the fact again
    val dir = java.nio.file.Files.createTempDirectory("graft_sk_table").toString
    val fact = spark.range(1, 5001).toDF("k")
      .withColumn("grp", col("k") % 7)
    fact.groupBy(col("grp"))
      .agg(expr("hll_sketch_agg(k, 14)").as("sk"))
      .write.mode("overwrite").parquet(dir)
    val est = spark.read.parquet(dir)
      .agg(expr("cast(hll_sketch_estimate(hll_union_agg(sk, true)) as long)"))
      .head().getLong(0)
    val exact = 5000L
    val rsd = 1.04 / math.sqrt(1 << 14)
    assert(math.abs(est - exact) <= 2 * rsd * exact,
      s"stored-sketch union estimate $est outside 2*rsd of $exact")
    // a partial combination (3 of 7 groups) answers from the same table
    val est3 = spark.read.parquet(dir).where(col("grp") < 3)
      .agg(expr("cast(hll_sketch_estimate(hll_union_agg(sk, true)) as long)"))
      .head().getLong(0)
    val exact3 = fact.where(col("grp") < 3).select("k").distinct().count()
    assert(math.abs(est3 - exact3) <= 2 * rsd * exact3,
      s"partial-rollup estimate $est3 outside 2*rsd of $exact3")
  }
}
