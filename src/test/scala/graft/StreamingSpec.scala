package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{StatefulOps, StreamingOps}

/** Structured Streaming harness tests (analog of the reference's
  * runtime/harness operator tests): drive MemoryStream batches with
  * controlled event times and assert per-batch state/output.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private var qn = 0
  private def nextName(): String = { qn += 1; s"graft_stream_$qn" }

  test("tumbling window agg with watermark drops late data") {
    val input = MemoryStream[(Timestamp, Long, Double)](1, spark, None)
    val events = input.toDF().toDF("ts", "user_id", "value")
    val agg = StreamingOps.tumbleAgg(events, "ts", "5 minutes", "10 minutes", "user_id")
    val name = nextName()
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData((ts(1), 1L, 1.0), (ts(4), 1L, 2.0), (ts(11), 1L, 3.0))
      q.processAllAvailable()
      // advance watermark past 10:10 + 5min lateness => window [10:00,10:10) closes
      input.addData((ts(21), 2L, 9.0))
      q.processAllAvailable()
      // this event is behind the watermark (10:16) => dropped
      input.addData((ts(2), 1L, 100.0))
      q.processAllAvailable()
      input.addData((ts(40), 2L, 1.0))
      q.processAllAvailable()
      val rows = spark.table(name)
        .select("wstart", "user_id", "n", "sum_value").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows.contains(("2024-01-01 10:00:00.0", 1L, 2L, 3.0)),
        s"closed window missing or late row leaked: $rows")
      assert(!rows.exists { case (_, _, _, s) => s == 103.0 },
        "late data behind watermark must be dropped")
    } finally q.stop()
  }

  test("streaming CUMULATE fires each slice incrementally and drops late rows") {
    val input = MemoryStream[(Timestamp, Long, Double)](21, spark, None)
    val events = input.toDF().toDF("ts", "user_id", "value")
    val agg = StreamingOps.cumulateAgg(events, "ts", "5 minutes",
      "10 minutes", "30 minutes", "user_id")
    val name = nextName()
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // 10:01 and 10:04 land in slice 1; 10:11 in slice 2 of [10:00,10:30)
      input.addData((ts(1), 1L, 1.0), (ts(4), 1L, 2.0), (ts(11), 1L, 3.0))
      q.processAllAvailable()
      // an 11:31 event pushes the effective raw frontier past 10:30 —
      // all three cumulative slices of the 10:00 window close
      input.addData((Timestamp.valueOf("2024-01-01 11:31:00"), 2L, 9.0))
      q.processAllAvailable()
      // behind the frontier: dropped, never re-opens a closed slice
      input.addData((ts(2), 1L, 100.0))
      q.processAllAvailable()
      val rows = spark.table(name)
        .select("wstart", "wend", "user_id", "n", "sum_value").collect()
        .map(r => (r.getTimestamp(0).toString, r.getTimestamp(1).toString,
          r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
      val ws = "2024-01-01 10:00:00.0"
      assert(rows === Set(
        (ws, "2024-01-01 10:10:00.0", 1L, 2L, 3.0),
        (ws, "2024-01-01 10:20:00.0", 1L, 3L, 6.0),
        (ws, "2024-01-01 10:30:00.0", 1L, 3L, 6.0)),
        s"cumulative slices wrong: $rows")
    } finally q.stop()
  }

  test("session window agg merges within gap") {
    val input = MemoryStream[(Timestamp, Long, Double)](2, spark, None)
    val events = input.toDF().toDF("ts", "user_id", "value")
    val agg = StreamingOps.sessionAgg(events, "ts", "0 seconds", "10 minutes", "user_id")
    val name = nextName()
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData((ts(0), 1L, 1.0), (ts(5), 1L, 2.0), (ts(30), 1L, 4.0))
      q.processAllAvailable()
      input.addData((ts(59), 9L, 0.0)) // push watermark, close sessions
      q.processAllAvailable()
      val rows = spark.table(name)
        .filter($"user_id" === 1L)
        .select("wstart", "wend", "n", "sum_value").collect()
        .map(r => (r.getTimestamp(0).toString, r.getTimestamp(1).toString,
          r.getLong(2), r.getDouble(3))).toSet
      assert(rows === Set(
        ("2024-01-01 10:00:00.0", "2024-01-01 10:15:00.0", 2L, 3.0),
        ("2024-01-01 10:30:00.0", "2024-01-01 10:40:00.0", 1L, 4.0)), rows.toString)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups by key") {
    val input = MemoryStream[(Timestamp, Long, Double)](3, spark, None)
    val events = input.toDF().toDF("ts", "user_id", "value")
    val dedup = StreamingOps.dedupWithinWatermark(events, "ts", "30 minutes", "user_id")
    val name = nextName()
    val q = dedup.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData((ts(1), 1L, 1.0), (ts(2), 1L, 2.0), (ts(3), 2L, 3.0))
      q.processAllAvailable()
      val n = spark.table(name).count()
      assert(n === 2, s"expected 2 distinct users, got $n")
    } finally q.stop()
  }

  test("stateful TopN re-emits ranking on improvement") {
    val input = MemoryStream[StatefulOps.ScoredEvent](4, spark, None)
    val top = StatefulOps.topNPerKey(input.toDS(), 2)
    val name = nextName()
    val q = top.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData(StatefulOps.ScoredEvent(1, 10.0, 100))
      q.processAllAvailable()
      input.addData(StatefulOps.ScoredEvent(1, 5.0, 101))   // enters at rank 2
      q.processAllAvailable()
      input.addData(StatefulOps.ScoredEvent(1, 7.0, 102))   // displaces 101
      q.processAllAvailable()
      input.addData(StatefulOps.ScoredEvent(1, 1.0, 103))   // below topN => no emit
      q.processAllAvailable()
      val batches = spark.table(name).as[StatefulOps.TopNEmit].collect()
      val finalTop = batches.takeRight(2).map(e => (e.rank, e.id)).toSet
      assert(finalTop === Set((1, 100L), (2, 102L)), batches.mkString(","))
    } finally q.stop()
  }

  test("streaming as-of join matches latest version at or before probe") {
    val input = MemoryStream[StatefulOps.AsOfEvent](5, spark, None)
    val tagged = input.toDF()
      .withColumn("eventTime", timestamp_millis($"tsMillis"))
      .withWatermark("eventTime", "0 seconds")
      .as[StatefulOps.AsOfEvent]
    val joined = StatefulOps.asOfJoin(tagged)
    val name = nextName()
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // build versions at t=1000, 3000; probe at t=2500
      input.addData(
        StatefulOps.AsOfEvent(1, 1000, 0, 11),
        StatefulOps.AsOfEvent(1, 3000, 0, 13),
        StatefulOps.AsOfEvent(1, 2500, 1, 99))
      q.processAllAvailable()
      // advance watermark beyond 2500 so the probe emits
      input.addData(StatefulOps.AsOfEvent(2, 10000, 0, 0))
      q.processAllAvailable()
      input.addData(StatefulOps.AsOfEvent(2, 20000, 0, 0))
      q.processAllAvailable()
      val rows = spark.table(name).as[StatefulOps.AsOfMatch].collect()
      val m = rows.find(_.probeId == 99).getOrElse(fail(s"probe not emitted: ${rows.mkString}"))
      assert(m.buildId === Some(11L), s"wrong version: $m")
    } finally q.stop()
  }

  test("CEP followed-by matches within gap only") {
    val input = MemoryStream[StatefulOps.PatternEvent](6, spark, None)
    val matches = StatefulOps.followedBy(input.toDS(), "view", "purchase", gapMillis = 5000)
    val name = nextName()
    val q = matches.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData(
        StatefulOps.PatternEvent(1, 1000, "view", 1),
        StatefulOps.PatternEvent(1, 3000, "purchase", 2), // within 5s => match
        StatefulOps.PatternEvent(2, 1000, "view", 3))
      q.processAllAvailable()
      input.addData(
        StatefulOps.PatternEvent(2, 90000, "purchase", 4)) // 89s later => no match
      q.processAllAvailable()
      val rows = spark.table(name).as[StatefulOps.PatternMatch].collect()
      assert(rows.map(m => (m.key, m.aId, m.bId)).toSet === Set((1L, 1L, 2L)), rows.mkString(","))
    } finally q.stop()
  }

  test("session window with dynamic per-row gap (SessionWindows.withDynamicGap)") {
    val input = MemoryStream[(Timestamp, Long, Double)](31, spark, None)
    val events = input.toDF().toDF("ts", "user_id", "value")
    // purchases (value >= 5) hold sessions open 10 min, others 2 min
    val agg = StreamingOps.sessionAggDynamicGap(events, "ts", "20 minutes",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("value") >= 5, "10 minutes")
        .otherwise("2 minutes"),
      "user_id")
    val name = nextName()
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // user 1: small events at 10:01 and 10:04 — 2-min gap splits them;
      // user 2: big event at 10:01 then event at 10:08 — 10-min gap merges
      input.addData((ts(1), 1L, 1.0), (ts(4), 1L, 1.0),
        (ts(1), 2L, 9.0), (ts(8), 2L, 1.0))
      q.processAllAvailable()
      input.addData((ts(59), 9L, 1.0)) // advance watermark, close sessions
      q.processAllAvailable()
      val rows = spark.table(name).select("user_id", "n").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toList
      assert(rows.count(_._1 == 1L) === 2, s"user 1 must split: $rows")
      assert(rows.filter(_._1 == 2L) === List((2L, 2L)), s"user 2 must merge: $rows")
    } finally q.stop()
  }

  test("LEFT OUTER interval join: matched pairs emit in-range, the " +
      "unmatched left row emits null-padded once the watermark proves " +
      "no partner can arrive (IntervalJoinOperator outer contract)") {
    val lIn = MemoryStream[(Timestamp, Long, String)](91, spark, None)
    val rIn = MemoryStream[(Timestamp, Long, String)](92, spark, None)
    val purchases = lIn.toDF().toDF("pts", "user_id", "pid")
    val views = rIn.toDF().toDF("vts", "vuser", "vid")
      .withColumnRenamed("vuser", "user_id")
    val joined = StreamingOps.intervalJoin(
      purchases, views, "user_id", "pts", "vts", "5 minutes",
      "'2' MINUTE", "'0' MINUTE", "leftOuter")
    val name = nextName()
    val q = joined.select("pid", "vid").writeStream.format("memory")
      .queryName(name).outputMode("append").start()
    try {
      // user 1's purchase at 10:05 has a view 1 min earlier (match);
      // user 2's purchase at 10:05 has NO view within [-2m, 0]
      lIn.addData((ts(5), 1L, "p1"), (ts(5), 2L, "p2"))
      rIn.addData((ts(4), 1L, "v1"), (ts(20), 2L, "v-late"))
      q.processAllAvailable()
      // push both watermarks far past the bound so p2 finalizes
      lIn.addData((ts(59), 9L, "p-adv"))
      rIn.addData((ts(59), 9L, "v-adv"))
      q.processAllAvailable()
      lIn.addData((Timestamp.valueOf("2024-01-01 12:00:00"), 8L, "p-adv2"))
      rIn.addData((Timestamp.valueOf("2024-01-01 12:00:00"), 8L, "v-adv2"))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
        .map(r => (r.getString(0), Option(r.getString(1)))).toSet
      assert(rows.contains(("p1", Some("v1"))), s"in-range match lost: $rows")
      assert(rows.contains(("p2", None)),
        s"unmatched left row must emit null-padded after the watermark: $rows")
      assert(!rows.exists { case (p, v) => p == "p2" && v.isDefined },
        s"out-of-range view must not match: $rows")
    } finally q.stop()
  }

  test("streaming window join pairs rows only inside a shared tumbling " +
      "window (StreamExecWindowJoin semantics)") {
    val lIn = MemoryStream[(Timestamp, Long, String)](93, spark, None)
    val rIn = MemoryStream[(Timestamp, Long, String)](94, spark, None)
    val l = lIn.toDF().toDF("lts", "user_id", "lid")
    val r = rIn.toDF().toDF("rts", "user_id", "rid")
    val joined = StreamingOps.windowJoinStream(
      l, r, "user_id", "lts", "rts", "5 minutes", "5 minutes")
    val name = nextName()
    val q = joined.select("lid", "rid").writeStream.format("memory")
      .queryName(name).outputMode("append").start()
    try {
      // user 1: both sides in window [10:00,10:05) => pair;
      // user 2: left in [10:00,10:05), right in [10:05,10:10) => no pair
      lIn.addData((ts(1), 1L, "l1"), (ts(2), 2L, "l2"))
      rIn.addData((ts(3), 1L, "r1"), (ts(6), 2L, "r2"))
      q.processAllAvailable()
      lIn.addData((ts(59), 9L, "l-adv")); rIn.addData((ts(59), 8L, "r-adv"))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
        .map(r0 => (r0.getString(0), r0.getString(1))).toSet
      assert(rows === Set(("l1", "r1")),
        s"window join must pair same-window rows only: $rows")
    } finally q.stop()
  }

  test("LEFT OUTER streaming window join null-pads an unmatched left " +
      "row once its window is watermark-final") {
    val lIn = MemoryStream[(Timestamp, Long, String)](95, spark, None)
    val rIn = MemoryStream[(Timestamp, Long, String)](96, spark, None)
    val l = lIn.toDF().toDF("lts", "user_id", "lid")
    val r = rIn.toDF().toDF("rts", "user_id", "rid")
    val joined = StreamingOps.windowJoinStream(
      l, r, "user_id", "lts", "rts", "5 minutes", "5 minutes", "leftOuter")
    val name = nextName()
    val q = joined.select("lid", "rid").writeStream.format("memory")
      .queryName(name).outputMode("append").start()
    try {
      // user 1 pairs in [10:00,10:05); user 2 has no right-side row
      lIn.addData((ts(1), 1L, "l1"), (ts(2), 2L, "l2"))
      rIn.addData((ts(3), 1L, "r1"))
      q.processAllAvailable()
      lIn.addData((ts(59), 9L, "l-adv")); rIn.addData((ts(59), 8L, "r-adv"))
      q.processAllAvailable()
      lIn.addData((Timestamp.valueOf("2024-01-01 12:00:00"), 7L, "l-adv2"))
      rIn.addData((Timestamp.valueOf("2024-01-01 12:00:00"), 6L, "r-adv2"))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
        .map(r0 => (r0.getString(0), Option(r0.getString(1)))).toSet
      assert(rows.contains(("l1", Some("r1"))), s"match lost: $rows")
      assert(rows.contains(("l2", None)),
        s"unmatched left row must null-pad once the window is final: $rows")
    } finally q.stop()
  }
}
