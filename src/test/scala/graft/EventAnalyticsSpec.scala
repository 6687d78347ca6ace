package graft

import org.apache.spark.sql.functions._
import graft.operators.EventAnalytics
import graft.text.FrequencyOps

/** Event-analytics battery (windowed funnel, cohort retention, MAD
  * outliers) and the KL drift closed form, on fixtures with
  * hand-computed answers.
  */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L // seconds

  private def ev(rows: Seq[(Long, Long, String)]) =
    rows.zipWithIndex
      .map { case ((u, sec, ty), i) => (u, sec, ty, i.toLong) }
      .toDF("user_id", "sec", "event_type", "event_id")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"),
        col("event_type"), col("event_id"))

  test("funnel: depth per user honors order, strictness, and the first-touch window") {
    val events = ev(Seq(
      // u1: full chain inside 24h -> 3
      (1L, 0L, "view"), (1L, 1 * H, "click"), (1L, 2 * H, "purchase"),
      // u2: click falls outside the 24h window -> 1
      (2L, 0L, "view"), (2L, 25 * H, "click"),
      // u3: click/purchase BEFORE the first view don't count -> 1
      (3L, 0L, "click"), (3L, 1 * H, "purchase"), (3L, 2 * H, "view"),
      // u4: no funnel events at all -> 0
      (4L, 0L, "error"),
      // u5: purchase outside the window ANCHORED AT THE VIEW -> 2
      (5L, 0L, "view"), (5L, 1 * H, "click"), (5L, 26 * H, "purchase"),
      // u6: earliest view anchors even when a later view exists -> 2
      (6L, 10 * H, "view"), (6L, 0L, "view"), (6L, 1 * H, "click")))
    val got = EventAnalytics
      .funnelOnEvents(events, Seq("view", "click", "purchase"), windowHours = 24)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(3 -> 1L, 2 -> 2L, 1 -> 2L, 0 -> 1L))
  }

  test("streaming funnel twin: per-user depths converge to the batch answer") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.{FunnelEvent, FunnelEmit}
    val raw = Seq(
      (1L, 0L, "view"), (1L, 1 * H, "click"), (1L, 2 * H, "purchase"),
      (2L, 0L, "view"), (2L, 25 * H, "click"),
      (3L, 0L, "click"), (3L, 1 * H, "purchase"), (3L, 2 * H, "view"),
      (4L, 0L, "error"),
      (5L, 0L, "view"), (5L, 1 * H, "click"), (5L, 26 * H, "purchase"),
      (6L, 0L, "view"), (6L, 1 * H, "click"))
    val batchDepths = EventAnalytics
      .funnelOnEvents(ev(raw), Seq("view", "click", "purchase"), windowHours = 24)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val stages = Map("view" -> 0, "click" -> 1, "purchase" -> 2)
    val fev = raw.collect { case (u, sec, ty) if stages.contains(ty) =>
      FunnelEvent(u, sec * 1000000L, stages(ty))
    }
    val (early, late) = fev.partition(_.tsMicros <= 2 * H * 1000000L)
    val input = MemoryStream[FunnelEvent](91, spark, None)
    val q = StatefulOps.funnelStream(input.toDS(), windowMicros = 24L * 3600 * 1000000)
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_stream").start()
    try {
      input.addData(early.sortBy(_.tsMicros)); q.processAllAvailable()
      input.addData(late.sortBy(_.tsMicros)); q.processAllAvailable()
      val got = spark.table("funnel_stream").as[FunnelEmit].collect()
        .groupBy(_.userId).map { case (u, es) => u -> es.map(_.depth).max }
      // streaming emits per-user max depth; batch reports the depth
      // histogram — compare user-by-user for depth >= 1
      val batchPerUser = Map(1L -> 3, 2L -> 1, 3L -> 1, 5L -> 2, 6L -> 2)
      assert(got == batchPerUser)
      // and the histogram view of the stream matches the batch query
      val hist = batchPerUser.values.groupBy(identity).map { case (d, xs) => d -> xs.size.toLong }
      assert(batchDepths.filter(_._1 > 0) == hist)
    } finally q.stop()
  }

  test("cohort retention: calendar-week cohorts x epoch-week offsets") {
    val day = 86400L
    val jan1 = 1704067200L // 2024-01-01 (a Monday) 00:00 UTC
    val events = ev(Seq(
      (1L, jan1, "view"), (1L, jan1 + 8 * day, "view"),
      // first touch Wed Jan 10 -> cohort week Mon Jan 8
      (2L, jan1 + 9 * day, "view"),
      (2L, jan1 + 9 * day + 6 * day + 23 * H, "view"), // +6d23h -> wk 0
      (2L, jan1 + 16 * day, "view"))) // +7d -> wk 1
    val got = EventAnalytics.cohortOnEvents(events)
      .collect()
      .map(r => (r.getTimestamp(0).toInstant.toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("2024-01-01T00:00:00Z", 0) -> 1L, ("2024-01-01T00:00:00Z", 1) -> 1L,
      ("2024-01-08T00:00:00Z", 0) -> 1L, ("2024-01-08T00:00:00Z", 1) -> 1L))
  }

  test("MAD outliers: only the planted tail point crosses the modified z cut") {
    val events = Seq(
      (1L, "a", 0.0), (2L, "a", 1.0), (3L, "a", 2.0), (4L, "a", 3.0),
      (5L, "a", 1000.0),
      (6L, "b", 5.0), (7L, "b", 6.0), (8L, "b", 7.0))
      .toDF("event_id", "event_type", "value")
    val got = EventAnalytics.madOnEvents(events, cut = 3.5).collect()
    // type a: med 2, MAD 1 -> z(1000) = 998/1.4826 = 673.1; all others < 3.5
    // type b: med 6, MAD 1 -> max z = 1/1.4826 = 0.67
    assert(got.map(_.getLong(0)).toSeq == Seq(5L))
    assert(math.abs(got.head.getDouble(3) - 998.0 / 1.4826) < 1e-9)
  }

  test("sessionize: 30-minute gaps break sessions; spans and counts are exact") {
    val events = ev(Seq(
      (1L, 0L, "a"), (1L, 600L, "b"),          // session 0: 2 events, 600 s
      (1L, 600L + 2401L, "c"),                 // 40:01 gap -> session 1
      (2L, 0L, "a"),                           // lone event -> one session
      (3L, 0L, "a"), (3L, 1800L, "b")))        // exactly 30:00 -> NOT a break
    val got = EventAnalytics.sessionizeOnEvents(events, gapMinutes = 30)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      (1L, 0L) -> (2L, 600L), (1L, 1L) -> (1L, 0L),
      (2L, 0L) -> (1L, 0L),
      (3L, 0L) -> (2L, 1800L)))
  }

  test("session concurrency: sessions credit every hour they touch") {
    val events = ev(Seq(
      (1L, 45 * 60L, "a"), (1L, 70 * 60L, "a"),   // 25-min gap: ONE session h0..h1
      (2L, 60 * 60L, "a"),                          // u2 session inside h1
      (1L, 4 * H, "a")))                            // u1 second session in h4
    val got = EventAnalytics.concurrencyOnEvents(events, gapMinutes = 30)
      .collect()
      .map(r => r.getTimestamp(0).toInstant.toString -> r.getLong(1)).toMap
    assert(got == Map(
      "1970-01-01T00:00:00Z" -> 1L,
      "1970-01-01T01:00:00Z" -> 2L,
      "1970-01-01T04:00:00Z" -> 1L))
  }

  test("transition matrix: session gaps cut edges; rows normalize per source type") {
    val events = ev(Seq(
      (1L, 0L, "a"), (1L, 60L, "b"),           // a -> b
      (1L, 60L + 2000L, "c"),                  // gap > 30 min: b -> c suppressed
      (2L, 0L, "a"), (2L, 30L, "a"),           // a -> a
      (2L, 60L, "b")))                         // a -> b (second)
    val got = EventAnalytics.transitionsOnEvents(events, gapMinutes = 30)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(
      ("a", "b") -> (2L, 2.0 / 3), ("a", "a") -> (1L, 1.0 / 3)))
  }

  test("experiment lift: arms re-derive from JVM md5 and the Welch t is closed-form") {
    val users = (1L to 40L)
    val events = users.map(u => (u, "buy", u.toDouble))
      .toDF("user_id", "event_type", "value")
      .withColumnRenamed("user_id", "user_id")
    def arm(u: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) < 8) "A" else "B"
    }
    val a = users.filter(arm(_) == "A").map(_.toDouble)
    val b = users.filter(arm(_) == "B").map(_.toDouble)
    def meanOf(xs: Seq[Double]) = xs.sum / xs.size
    def varOf(xs: Seq[Double]) = {
      val m = meanOf(xs); xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    val lift = meanOf(b) - meanOf(a)
    val t = lift / math.sqrt(varOf(a) / a.size + varOf(b) / b.size)
    val row = EventAnalytics.liftOnEvents(events).collect().head
    assert(row.getLong(1) == a.size && row.getLong(2) == b.size)
    assert(math.abs(row.getDouble(5) - lift) < 1e-9)
    assert(math.abs(row.getDouble(6) - t) < 1e-9)
  }

  test("gap fill: absent hours appear as zeros and the MA window never shrinks") {
    val events = ev(Seq(
      (1L, 0L, "a"), (1L, 0L, "a"),      // hour 0: 2 events
      (1L, 3 * H + 60L, "a"),            // hour 3: 1 event; hours 1,2 gap
      (2L, 2 * H, "b")))                 // b only in hour 2
    val got = EventAnalytics.gapFillOnEvents(events).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toInstant.toString) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // spine spans hour 0..3 for BOTH types
    assert(got.size == 8)
    assert(got(("a", "1970-01-01T01:00:00Z"))._1 == 0L)
    assert(got(("a", "1970-01-01T00:00:00Z")) == (2L, 2.0))
    // trailing 24-row frame at hour 3 covers hours 0..3 -> (2+0+0+1)/4
    assert(got(("a", "1970-01-01T03:00:00Z")) == (1L, 0.75))
    assert(got(("b", "1970-01-01T02:00:00Z"))._1 == 1L)
    assert(got(("b", "1970-01-01T03:00:00Z")) == (0L, 0.25))
  }

  test("KL drift closed form equals the brute-force smoothed sum") {
    val docs = Seq(
      (1L, "x x y", "A"), (2L, "x z", "B"))
      .toDF("doc_id", "text", "source")
    val got = FrequencyOps.driftKlOn(docs)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // corpus: x3 y1 z1, n=5, V=3; alpha=0.5
    def kl(counts: Map[String, Long], ns: Long): Double = {
      val q = Map("x" -> 3L, "y" -> 1L, "z" -> 1L)
      q.keys.map { t =>
        val p = (counts.getOrElse(t, 0L) + 0.5) / (ns + 0.5 * 3)
        val qq = (q(t) + 0.5) / (5 + 0.5 * 3)
        p * math.log(p / qq)
      }.sum * 1000
    }
    assert(math.abs(got("A") - kl(Map("x" -> 2L, "y" -> 1L), 3)) < 1e-9)
    assert(math.abs(got("B") - kl(Map("x" -> 1L, "z" -> 1L), 2)) < 1e-9)
  }

  test("RRF fusion: ranks are dense per query and the fused score is the reciprocal sum") {
    val out = graft.text.RetrievalQueries
      .rrfCore(Tables.load(spark, sfDir, "documents"), topK = 10)
      .collect()
    assert(out.nonEmpty)
    val perQuery = out.groupBy(_.getInt(0))
    perQuery.foreach { case (_, rows) =>
      assert(rows.length <= 10)
      // fused value recomputes exactly from the two integer ranks
      rows.foreach { r =>
        val expect = 1.0 / (60 + r.getInt(2)) + 1.0 / (60 + r.getInt(3))
        assert(r.getDouble(4) == expect)
      }
      // the kept rows are the top-k by (rrf desc, doc_id): verify the
      // cut boundary is monotone within the returned set
      val rrfs = rows.sortBy(r => (-r.getDouble(4), r.getLong(1))).map(_.getDouble(4))
      assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b })
    }
  }
}
