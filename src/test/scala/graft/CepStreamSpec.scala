package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.cep.{CepOps, Nfa}

/** top-level so the encoders need no outer instance */
case class StreamEv(user_id: Long, event_id: Long, tsMillis: Long, event_type: String)
case class CepStreamMatch(user_id: Long, n_views: Long, purchase_id: Long)

/** Streaming MATCH_RECOGNIZE: the full NFA over a watermarked keyed
  * stream — matches emit once the watermark proves them final, state
  * drops consumed rows.
  */
class CepStreamSpec extends SparkSpec {
  import spark.implicits._
  import graft.{CepStreamMatch => M}

  private val pat = Nfa.Cat[StreamEv](List(
    Nfa.Rep(Nfa.Sym[StreamEv]("V", _.event_type == "view"), 1, Int.MaxValue),
    Nfa.Sym[StreamEv]("P", _.event_type == "purchase")))

  test("greedy V+ P emits once the watermark finalizes the match") {
    val input = MemoryStream[StreamEv](51, spark, None)
    val withWm = input.toDF()
      .withColumn("eventTime", timestamp_millis($"tsMillis"))
      .withWatermark("eventTime", "0 seconds")
      .as[StreamEv]
    val out = CepOps.matchPatternStream(withWm,
      (e: StreamEv) => e.user_id, (e: StreamEv) => (e.tsMillis, e.event_id),
      (e: StreamEv) => e.tsMillis, pat) { (k: Long, m: Nfa.PatMatch[StreamEv]) =>
      M(k, m.caps("V").length.toLong, m.caps("P").head.event_id)
    }
    val q = out.writeStream.format("memory").queryName("cep_stream")
      .outputMode("append").start()
    try {
      def rows() = spark.table("cep_stream").as[M].collect().toList

      // views then purchase, but watermark hasn't passed the purchase:
      // nothing emits (the match's last row is the newest complete row)
      input.addData(
        StreamEv(1, 1, 1000, "view"), StreamEv(1, 2, 2000, "view"), StreamEv(1, 3, 3000, "purchase"))
      q.processAllAvailable()
      input.addData(StreamEv(2, 9, 10000, "click")) // wm -> 3s; match still open-ended
      q.processAllAvailable()
      // a later complete row for key 1 proves the match final
      input.addData(StreamEv(1, 4, 20000, "click"))
      q.processAllAvailable()
      input.addData(StreamEv(2, 10, 30000, "click")) // wm -> 20s
      q.processAllAvailable()
      input.addData(StreamEv(2, 11, 31000, "click")) // wm -> 30s; key-1 timer fires
      q.processAllAvailable()
      assert(rows() === List(M(1, 2, 3)), rows().toString)

      // consumed rows left state: a second run matches independently
      // (events stay above the current watermark of 31s)
      input.addData(StreamEv(1, 5, 40000, "view"), StreamEv(1, 6, 41000, "purchase"),
        StreamEv(1, 7, 42000, "click"))
      q.processAllAvailable()
      input.addData(StreamEv(2, 12, 50000, "click")) // wm -> 42s; finalize
      q.processAllAvailable()
      input.addData(StreamEv(2, 13, 60000, "click")) // one more nudge for the timer
      q.processAllAvailable()
      assert(rows().toSet === Set(M(1, 2, 3), M(1, 1, 6)), rows().toString)
    } finally q.stop()
  }

  test("a partial match spanning micro-batch boundaries survives in the keyed " +
      "store and matches exactly the batch NFA over the concatenated stream") {
    val input = MemoryStream[StreamEv](53, spark, None)
    val withWm = input.toDF()
      .withColumn("eventTime", timestamp_millis($"tsMillis"))
      .withWatermark("eventTime", "0 seconds")
      .as[StreamEv]
    val out = CepOps.matchPatternStream(withWm,
      (e: StreamEv) => e.user_id, (e: StreamEv) => (e.tsMillis, e.event_id),
      (e: StreamEv) => e.tsMillis, pat) { (k: Long, m: Nfa.PatMatch[StreamEv]) =>
      M(k, m.caps("V").length.toLong, m.caps("P").head.event_id)
    }
    val q = out.writeStream.format("memory").queryName("cep_split")
      .outputMode("append").start()
    // the V+ P pattern splits across THREE micro-batches for key 1
    // (views in two batches, the purchase in a third) and across TWO
    // for key 3 with an idle batch in between — the reference persists
    // NFA partial matches in keyed state (CepOperator.java:82); here
    // the CepBuf store must carry the open prefix between batches
    val all = Seq(
      StreamEv(1, 1, 1000, "view"), StreamEv(1, 2, 2000, "view"),
      StreamEv(1, 3, 3000, "view"), StreamEv(1, 4, 4000, "purchase"),
      StreamEv(1, 5, 5000, "click"),
      StreamEv(3, 31, 1500, "view"), StreamEv(3, 32, 6000, "purchase"),
      StreamEv(3, 33, 7000, "click"))
    try {
      input.addData(StreamEv(1, 1, 1000, "view"), StreamEv(3, 31, 1500, "view"))
      q.processAllAvailable()
      input.addData(StreamEv(1, 2, 2000, "view"), StreamEv(1, 3, 3000, "view"))
      q.processAllAvailable()
      input.addData(StreamEv(1, 4, 4000, "purchase"), StreamEv(1, 5, 5000, "click"))
      q.processAllAvailable()
      input.addData(StreamEv(3, 32, 6000, "purchase"), StreamEv(3, 33, 7000, "click"))
      q.processAllAvailable()
      // advance the watermark + fire the event-time timers
      input.addData(StreamEv(2, 90, 60000, "click"))
      q.processAllAvailable()
      input.addData(StreamEv(2, 91, 61000, "click"))
      q.processAllAvailable()
      val streamed = spark.table("cep_split").as[M].collect().toSet
      val batch = CepOps.matchPatternFull(all.toDS(),
        (e: StreamEv) => e.user_id, (e: StreamEv) => (e.tsMillis, e.event_id),
        pat) { (k: Long, m: Nfa.PatMatch[StreamEv]) =>
        M(k, m.caps("V").length.toLong, m.caps("P").head.event_id)
      }.collect().toSet
      assert(batch === Set(M(1, 3, 4), M(3, 1, 32)), s"unexpected batch matches: $batch")
      assert(streamed === batch,
        s"cross-batch partial match diverged: stream=$streamed batch=$batch")
    } finally q.stop()
  }

  test("WITHIN prunes stale matches and bounds state across watermark advances") {
    val input = MemoryStream[StreamEv](52, spark, None)
    val withWm = input.toDF()
      .withColumn("eventTime", timestamp_millis($"tsMillis"))
      .withWatermark("eventTime", "0 seconds")
      .as[StreamEv]
    val pat2 = Nfa.Cat[StreamEv](List(
      Nfa.Sym[StreamEv]("V", _.event_type == "view"),
      Nfa.Sym[StreamEv]("P", _.event_type == "purchase")))
    val out = CepOps.matchPatternStream(withWm,
      (e: StreamEv) => e.user_id, (e: StreamEv) => (e.tsMillis, e.event_id),
      (e: StreamEv) => e.tsMillis, pat2, Nfa.SkipPastLastRow,
      within = Some(((e: StreamEv) => e.tsMillis, 5000L))) {
      (k: Long, m: Nfa.PatMatch[StreamEv]) =>
        M(k, 1L, m.caps("P").head.event_id)
    }
    val q = out.writeStream.format("memory").queryName("cep_within")
      .outputMode("append").start()
    try {
      def rows() = spark.table("cep_within").as[M].collect().toList
      // a view whose purchase arrives a minute later: outside WITHIN,
      // must never match (and the stale view is evicted from state)
      input.addData(StreamEv(1, 1, 1000, "view"))
      q.processAllAvailable()
      input.addData(StreamEv(2, 9, 30000, "click")) // wm advances past 1s + within
      q.processAllAvailable()
      input.addData(StreamEv(1, 2, 60000, "purchase"))
      q.processAllAvailable()
      input.addData(StreamEv(2, 10, 90000, "click"))
      q.processAllAvailable()
      assert(rows().isEmpty, rows().toString)
      // a pair inside the window still matches after the eviction
      input.addData(StreamEv(1, 3, 100000, "view"), StreamEv(1, 4, 101000, "purchase"),
        StreamEv(1, 5, 102000, "click"))
      q.processAllAvailable()
      input.addData(StreamEv(2, 11, 150000, "click"))
      q.processAllAvailable()
      input.addData(StreamEv(2, 12, 200000, "click"))
      q.processAllAvailable()
      assert(rows() === List(M(1, 1, 4)), rows().toString)
    } finally q.stop()
  }
}
