package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.Tables

/** Streaming operators promoted to ORACLE-CHECKED battery rows — the
  * stream==batch twins that lived only in ScalaTest specs through
  * round 14 (StarStore q3, NetSpendStore q93, SessionizeStream, the
  * CEP NFA) now run the stream TO COMPLETION inside a battery query
  * and return the final frame, so the DuckDB oracle hashes the
  * streaming answer exactly like any batch query. This puts the
  * reference's stream-first claim (its batch TPC-DS gate executes
  * stream exec nodes — StreamExecGroupAggregate.java:81,
  * StreamExecJoin.java:71, StreamExecMatch.java:59) under the same
  * hard gate as the batch tier.
  *
  * Harness shape: MemoryStream feeds deterministic micro-batches (id
  * RANGES for the generated star — no driver materialization of fact
  * rows; the real `events` table rows for sessionize/CEP, bounded by
  * |events| at battery scale — the production source would be Kafka,
  * and per-batch state stays dim-bounded regardless of feed). Each
  * query stops its stream before returning, so battery runs never
  * leak a running query.
  */
object StreamOracleQueries {

  private val streamIds = new java.util.concurrent.atomic.AtomicInteger(7100)

  /** Run `body` (a whole stream-to-completion harness) with the
    * session's shuffle parallelism sized to the BOUNDED feed instead
    * of the session default. Stateful micro-batch operators pay a
    * fixed per-batch floor of (shuffle partitions × stateful ops)
    * state-store tasks + delta files + commits, and these harness
    * feeds are |events|-bounded — at the battery's 32 session
    * partitions that floor costs a multiple of the actual fold work
    * per batch (r16 same-position A/B: the 8 rows 60.8 s → 25.6 s
    * isolated, where the floor compounds with cold streaming-stack
    * JIT; inside a fully-warmed battery the floor is smaller and the
    * clamp measures flat-to-mildly-better, never worse —
    * OPTIMIZATION_r16.md "honesty note"). One partition per ~64k fed
    * rows keeps every batch's state tasks busy; at production (Kafka)
    * scale rows/64k exceeds
    * any session default and this clamp is a no-op, so the setting
    * stays scale-adaptive, not local-tuned. Override with
    * spark.graft.stream.statePartitions. Restored in finally — the
    * session is shared with whatever query runs next (Verify runs the
    * whole battery on one session).
    */
  /** Sequential-battery assumption (ADVICE r16): the session conf is
    * mutated for the duration of `body` and restored in finally —
    * safe because every harness here (Bench/Verify/tests) runs
    * queries sequentially on its session; a concurrent caller would
    * race the save/restore. Nesting with the identical save/restore
    * pattern in DedupCluster.connectedComponents composes because the
    * inner restore reinstates the outer clamp.
    */
  private def withFeedSizedState[T](s: SparkSession, nRows: Long)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    val parts = s.conf.getOption("spark.graft.stream.statePartitions")
      .map(_.toInt)
      .getOrElse(math.max(1L, math.min(old.toLong, nRows / 65536L + 1L)).toInt)
    s.conf.set(key, parts.toString)
    try body finally s.conf.set(key, old)
  }

  /** q3 star aggregate streamed over three uneven, out-of-order
    * micro-batches of line ids; the replay-guarded StarStore folds
    * dim-bounded partials and its readout IS the query result. */
  def streamQ3(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = TpcdsGen.nSales(s, dir)
    val store = new TpcdsStream.StarStore
    withFeedSizedState(s, n) {
      val input = MemoryStream[Long](streamIds.getAndIncrement(), s, None)
      val q = input.toDS().writeStream.outputMode("append")
        .foreachBatch { (df: Dataset[Long], id: Long) =>
          store.fold(TpcdsStream.collectPartial(TpcdsStream.q3Partial(df.toDF())), id)
          ()
        }.start()
      try {
        val third = n / 3
        Seq(2 * third + 1 to n, 1L to third, third + 1 to 2 * third)
          .foreach { b => input.addData(b); q.processAllAvailable() }
      } finally q.stop()
    }
    store.toRows.toDF("d_year", "i_brand_id", "i_brand", "sum_agg")
  }

  /** q93 net spend streamed with every return arriving one micro-batch
    * AFTER its sale — the NetSpendStore retracts already-emitted
    * per-customer totals (-U/+U changelog) and its final state equals
    * the batch left-join aggregate. */
  def streamQ93(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = TpcdsGen.nSales(s, dir)
    val store = new TpcdsStream.NetSpendStore
    withFeedSizedState(s, n) {
      val input = MemoryStream[(Long, Boolean)](streamIds.getAndIncrement(), s, None)
      val q = input.toDS().writeStream.outputMode("append")
        .foreachBatch { (df: Dataset[(Long, Boolean)], id: Long) =>
          val sales = df.filter(!_._2).map(_._1).toDF("id")
          val rets = df.filter(_._2).map(_._1).toDF("id")
          store.fold(TpcdsStream.collectDeltas(TpcdsStream.q93Partial(sales, rets)), id)
          ()
        }.start()
      try {
        val half = n / 2
        val b1 = (1L to half).map((_, false))
        val b2 = (half + 1 to n).map((_, false)) ++
          (1L to half).filter(_ % 13 == 0).map((_, true))
        val b3 = (half + 1 to n).filter(_ % 13 == 0).map((_, true))
        Seq(b1, b2, b3).foreach { b => input.addData(b); q.processAllAvailable() }
      } finally q.stop()
    }
    store.toRows.toDF("ss_customer_sk", "sumsales")
  }

  /** The real `events` table streamed through the watermarked keyed
    * sessionizer (open-tail state + event-time timers); a far-future
    * sentinel user advances the watermark so every session closes, and
    * the emitted rows equal the batch gaps-and-islands pass. */
  def streamSessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
      .selectExpr("user_id", "ts", "event_id")
      .orderBy("ts", "event_id")
      .collect() // bounded: |events| at battery sf; the MemoryStream harness feed
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val maxMs = ev.map(_._2.getTime).max
    def sentinel(offsetMs: Long, id: Long) =
      Seq((-1L, new java.sql.Timestamp(maxMs + offsetMs), id))
    val slice = math.max(1, ev.length / 3)
    // ts-sorted contiguous batches: with any positive lateness the
    // watermark can never overtake a yet-unfed event, so the run is
    // deterministic; two sentinel batches let the event-time timers
    // close the final open sessions
    val batches = ev.grouped(slice).map(_.toSeq).toSeq ++
      Seq(sentinel(86400000L, -1L), sentinel(86400001L, -2L))
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[graft.streaming.SessionizeStream.SessionRow]
    withFeedSizedState(s, ev.length.toLong) {
      val input =
        MemoryStream[(Long, java.sql.Timestamp, Long)](streamIds.getAndIncrement(), s, None)
      val out = graft.streaming.SessionizeStream.sessionize(
        input.toDF().toDF("user_id", "ts", "event_id"),
        gapMinutes = 30, lateness = "10 minutes")
      val q = out.writeStream.outputMode("append")
        .foreachBatch {
          (df: Dataset[graft.streaming.SessionizeStream.SessionRow], _: Long) =>
            buf ++= df.collect(); ()
        }.start()
      try batches.foreach { b => input.addData(b); q.processAllAvailable() }
      finally q.stop()
    }
    buf.filter(_.user_id >= 0).toSeq
      .toDF("user_id", "session_seq", "n_events", "duration_sec")
  }

  /** The real `events` table streamed through the CEP NFA
    * (`PATTERN (V+ P)` — the q_cep_quantified text): partial matches
    * persist in keyed state across micro-batches; a per-user trailing
    * sentinel click plus watermark advance finalizes every match
    * (greedy V+ stays open until a later complete row proves no
    * further view can extend it). */
  def streamCep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.cep.{CepOps, Nfa}
    import CepOps.Ev
    val ev = Tables.load(s, dir, "events")
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS tsMicros", "event_type")
      .orderBy("tsMicros", "event_id")
      .collect() // bounded: |events| at battery sf; the MemoryStream harness feed
      .map(r => Ev(r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val maxUs = ev.map(_.tsMicros).max
    val users = ev.map(_.user_id).distinct.sorted
    // one trailing non-matching row per key: a greedy-V+ match whose
    // purchase is the user's LAST event finalizes only when a later
    // complete row exists for that key
    val perKeyTail = users.zipWithIndex.map { case (u, i) =>
      Ev(u, -1L - i, maxUs + 86400000000L + i, "click")
    }.toSeq
    def sentinel(offsetUs: Long, id: Long) =
      Seq(Ev(-1L, id, maxUs + offsetUs, "click"))
    val slice = math.max(1, ev.length / 3)
    val batches = ev.grouped(slice).map(_.toSeq).toSeq ++
      Seq(perKeyTail,
        sentinel(172800000000L, -900001L), sentinel(172800001000L, -900002L))
    val pat = Nfa.Cat[Ev](List(
      Nfa.Rep(Nfa.Sym[Ev]("V", _.event_type == "view"), 1, Int.MaxValue),
      Nfa.Sym[Ev]("P", _.event_type == "purchase")))
    val buf = scala.collection.mutable.ArrayBuffer.empty[CepOps.ViewRunMatch]
    withFeedSizedState(s, ev.length.toLong) {
      val input = MemoryStream[Ev](streamIds.getAndIncrement(), s, None)
      val withWm = input.toDF()
        .withColumn("eventTime", timestamp_micros(col("tsMicros")))
        .withWatermark("eventTime", "10 seconds")
        .as[Ev]
      val out = CepOps.matchPatternStream(withWm,
        (e: Ev) => e.user_id, (e: Ev) => (e.tsMicros, e.event_id),
        (e: Ev) => e.tsMicros / 1000L, pat) { (k: Long, m: Nfa.PatMatch[Ev]) =>
        val vs = m.caps("V")
        CepOps.ViewRunMatch(k, vs.length.toLong, vs.head.event_id,
          m.caps("P").head.event_id)
      }
      val q = out.writeStream.outputMode("append")
        .foreachBatch { (df: Dataset[CepOps.ViewRunMatch], _: Long) =>
          buf ++= df.collect(); ()
        }.start()
      try batches.foreach { b => input.addData(b); q.processAllAvailable() }
      finally q.stop()
    }
    buf.filter(_.user_id >= 0).toSeq
      .toDF("user_id", "n_views", "first_view", "purchase_id")
  }

  /** Streaming TopN run to completion: orders stream through the
    * keyed AppendOnlyTopN operator (update semantics — a key re-emits
    * its full current ranking whenever it changes); a replay-guarded
    * driver store keeps each key's LATEST ranking, which after the
    * final batch equals the batch `row_number() <= 3` answer. */
  def streamTopN(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.streaming.StatefulOps
    val rows = Tables.load(s, dir, "orders")
      .selectExpr("o_custkey", "o_totalprice", "o_orderkey")
      .orderBy("o_orderkey")
      .collect() // bounded: |orders| at battery sf; the MemoryStream harness feed
      .map(r => StatefulOps.ScoredEvent(r.getLong(0), r.getDouble(1), r.getLong(2)))
    val store = scala.collection.mutable.Map.empty[Long, Seq[StatefulOps.TopNEmit]]
    var seenBatch = -1L
    withFeedSizedState(s, rows.length.toLong) {
      val input = MemoryStream[StatefulOps.ScoredEvent](streamIds.getAndIncrement(), s, None)
      val out = StatefulOps.topNPerKey(input.toDS(), 3)
      val q = out.writeStream.outputMode("append")
        .foreachBatch { (df: Dataset[StatefulOps.TopNEmit], id: Long) =>
          if (id > seenBatch) { // at-least-once replay guard
            seenBatch = id
            df.collect().groupBy(_.key)
              .foreach { case (k, es) => store(k) = es.sortBy(_.rank).toSeq }
          }
          ()
        }.start()
      try rows.grouped(math.max(1, rows.length / 3)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      } finally q.stop()
    }
    store.valuesIterator.flatten.toSeq
      .map(e => (e.key, e.id, e.score, e.rank))
      .toDF("o_custkey", "o_orderkey", "o_totalprice", "rn")
  }

  /** Streaming temporal as-of join run to completion: clicks are the
    * versioned build side, purchases the probe side, fed ts-sorted in
    * contiguous micro-batches (the watermark can never overtake an
    * unfed earlier row); two far-future sentinel builds advance the
    * watermark so every buffered probe flushes through its event-time
    * timer. Timestamps ride the tsMillis field at MICROsecond scale —
    * the operator only compares them to each other and to the
    * watermark, which the eventTime column is built on the same
    * scale. */
  def streamAsOf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.streaming.StatefulOps
    val ev = Tables.load(s, dir, "events")
      .where(col("event_type").isin("purchase", "click"))
      .selectExpr("user_id", "unix_micros(ts) AS tsus", "event_id",
        "CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side")
      .orderBy("tsus", "event_id")
      .collect() // bounded: |events| at battery sf; the MemoryStream harness feed
      .map(r => StatefulOps.AsOfEvent(r.getLong(0), r.getLong(1), r.getInt(3), r.getLong(2)))
    val maxUs = ev.map(_.tsMillis).max
    def sentinel(off: Long, id: Long) =
      Seq(StatefulOps.AsOfEvent(-1L, maxUs + off, 0, id))
    val batches = ev.grouped(math.max(1, ev.length / 3)).map(_.toSeq).toSeq ++
      Seq(sentinel(86400000000L, -1L), sentinel(86400001000L, -2L))
    val buf = scala.collection.mutable.ArrayBuffer.empty[StatefulOps.AsOfMatch]
    withFeedSizedState(s, ev.length.toLong) {
      val input = MemoryStream[StatefulOps.AsOfEvent](streamIds.getAndIncrement(), s, None)
      val withWm = input.toDF()
        .withColumn("eventTime", timestamp_millis(col("tsMillis")))
        .withWatermark("eventTime", "0 seconds")
        .as[StatefulOps.AsOfEvent]
      val q = StatefulOps.asOfJoin(withWm).writeStream.outputMode("append")
        .foreachBatch { (df: Dataset[StatefulOps.AsOfMatch], _: Long) =>
          buf ++= df.collect(); ()
        }.start()
      try batches.foreach { b => input.addData(b); q.processAllAvailable() }
      finally q.stop()
    }
    buf.filter(_.key >= 0).toSeq
      .map(m => (m.probeId, m.key, m.probeTs, m.buildId, m.buildTs))
      .toDF("pid", "user_id", "ptsus", "cid", "ctsus")
      .select(col("pid"), col("user_id"),
        timestamp_micros(col("ptsus")).as("pts"), col("cid"),
        timestamp_micros(col("ctsus")).as("cts"))
  }

  /** Stream-stream interval join run to completion: purchases and
    * views as two MemoryStreams with synchronized ts-sorted batches;
    * Spark's native stream-stream inner join with the event-time
    * range condition buffers both sides under the watermark and the
    * emitted matches equal the batch interval join. */
  def streamIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
      .selectExpr("user_id", "ts", "event_id", "event_type")
      .where(col("event_type").isin("purchase", "view"))
      .orderBy("ts", "event_id")
      .collect() // bounded: |events| at battery sf; the MemoryStream harness feed
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val maxMs = ev.map(_._2.getTime).max
    def adv(off: Long, key: Long) =
      Seq((key, new java.sql.Timestamp(maxMs + off), -1L))
    val ps = ev.filter(_._4 == "purchase").map(e => (e._1, e._2, e._3))
    val vs = ev.filter(_._4 == "view").map(e => (e._1, e._2, e._3))
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    withFeedSizedState(s, ev.length.toLong) {
      val pIn = MemoryStream[(Long, java.sql.Timestamp, Long)](streamIds.getAndIncrement(), s, None)
      val vIn = MemoryStream[(Long, java.sql.Timestamp, Long)](streamIds.getAndIncrement(), s, None)
      val joined = graft.streaming.StreamingOps.intervalJoin(
        pIn.toDF().toDF("user_id", "pts", "pid"),
        vIn.toDF().toDF("vuser", "vts", "vid").withColumnRenamed("vuser", "user_id"),
        "user_id", "pts", "vts", "10 minutes", "'10' MINUTE", "'0' MINUTE", "inner")
      val q = joined.select(col("pid"), col("vid")).as[(Long, Long)]
        .writeStream.outputMode("append")
        .foreachBatch { (df: Dataset[(Long, Long)], _: Long) =>
          buf ++= df.collect(); ()
        }.start()
      val slice = math.max(1, math.max(ps.length, vs.length) / 3)
      val pBatches = ps.grouped(slice).map(_.toSeq).toSeq
      val vBatches = vs.grouped(slice).map(_.toSeq).toSeq
      try {
        (0 until math.max(pBatches.length, vBatches.length)).foreach { i =>
          pIn.addData(pBatches.lift(i).getOrElse(Seq.empty))
          vIn.addData(vBatches.lift(i).getOrElse(Seq.empty))
          q.processAllAvailable()
        }
        // advance both watermarks far past the bound (distinct sentinel
        // keys so the advance rows can never pair with each other)
        Seq((86400000L, -11L, -12L), (86400001L, -13L, -14L)).foreach {
          case (off, kp, kv) =>
            pIn.addData(adv(off, kp)); vIn.addData(adv(off, kv))
            q.processAllAvailable()
        }
      } finally q.stop()
    }
    buf.filter { case (p, v) => p >= 0 && v >= 0 }.toSeq.toDF("pid", "vid")
  }

  /** The keyed streaming funnel run to completion: events feed the
    * O(1)-per-key running-min state machine ts-sorted (the documented
    * arrival contract for the first-touch anchor); a replay-guarded
    * driver map keeps each user's deepest emitted stage, and the final
    * histogram over ALL fed users (never-emitting users are depth 0,
    * exactly the batch per_user rows with no qualifying step) equals
    * the batch three-layer window funnel. */
  def streamFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.streaming.StatefulOps
    val ev = Tables.load(s, dir, "events")
      .selectExpr("user_id", "unix_micros(ts) AS tsus", "event_id", "event_type")
      .orderBy("tsus", "event_id")
      .collect() // bounded: |events| at battery sf; the MemoryStream harness feed
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    val users = ev.map(_._1).distinct
    val stages = Map("view" -> 0, "click" -> 1, "purchase" -> 2)
    val feed = ev.flatMap { case (u, ts, t) =>
      stages.get(t).map(StatefulOps.FunnelEvent(u, ts, _))
    }
    val depth = scala.collection.mutable.Map.empty[Long, Int]
    var seenBatch = -1L
    withFeedSizedState(s, feed.length.toLong) {
      val input = MemoryStream[StatefulOps.FunnelEvent](streamIds.getAndIncrement(), s, None)
      val out = StatefulOps.funnelStream(input.toDS(), 86400000000L)
      val q = out.writeStream.outputMode("append")
        .foreachBatch { (df: Dataset[StatefulOps.FunnelEmit], id: Long) =>
          if (id > seenBatch) { // at-least-once replay guard
            seenBatch = id
            df.collect().foreach(e =>
              depth(e.userId) = math.max(depth.getOrElse(e.userId, 0), e.depth))
          }
          ()
        }.start()
      try feed.grouped(math.max(1, feed.length / 3)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      } finally q.stop()
    }
    users.map(u => depth.getOrElse(u, 0))
      .groupBy(identity).toSeq
      .map { case (d, us) => (d, us.length.toLong) }
      .toDF("depth", "users")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_q3" -> (streamQ3 _),
    "q_stream_q93" -> (streamQ93 _),
    "q_stream_sessionize" -> (streamSessionize _),
    "q_stream_cep" -> (streamCep _),
    "q_stream_topn" -> (streamTopN _),
    "q_stream_asof" -> (streamAsOf _),
    "q_stream_interval" -> (streamIntervalJoin _),
    "q_stream_funnel" -> (streamFunnel _))

  /** Each streaming row is oracled by ITS BATCH TWIN's SQL — the
    * stream==batch property the specs pin becomes a hash-checked
    * correctness row. */
  def oracle: Map[String, String] = Map(
    "q_stream_q3" -> TpcdsGen.oracle("q_tpcdsgen_q3"),
    "q_stream_q93" -> TpcdsGen.oracle("q_tpcdsgen_q93"),
    "q_stream_sessionize" -> EventAnalytics.oracle("q_sessionize"),
    "q_stream_cep" -> graft.cep.CepOps.oracle("q_cep_quantified"),
    "q_stream_topn" -> WindowQueries.oracle("q_topn"),
    "q_stream_asof" -> TvfQueries.oracle("q_asof_join"),
    "q_stream_interval" -> TvfQueries.oracle("q_interval_join"),
    "q_stream_funnel" -> EventAnalytics.oracle("q_funnel"))
}
