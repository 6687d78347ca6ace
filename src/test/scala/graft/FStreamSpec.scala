package graft

import graft.datastream.FStream

/** DataStream-facade semantics (map/filter/keyBy/reduce/process). */
class FStreamSpec extends SparkSpec {
  import spark.implicits._

  test("map/filter/keyBy/reduce behave like the reference DataStream ops") {
    val s = FStream(spark.range(1, 11).as[Long])
    val out = s.map(_ * 2).filter(_ % 4 == 0)
      .keyBy(_ % 3)
      .reduce(_ + _)
      .collect().toMap
    // values 4,8,12,16,20 keyed by %3: 4->1, 8->2, 12->0, 16->1, 20->2
    assert(out === Map(0L -> 12L, 1L -> 20L, 2L -> 28L))
  }

  test("countWindow(n) closes a window every n elements, buffers the tail") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(String, Long)](81, spark, None)
    val q = FStream(input.toDS()).keyBy(_._1)
      .countWindowReduce(2)((a, b) => (a._1, a._2 + b._2))
      .writeStream.format("memory").queryName("count_win").outputMode("append").start()
    try {
      input.addData(("a", 1L), ("a", 2L), ("a", 3L), ("b", 10L))
      q.processAllAvailable()
      // a: [1,2] closes -> 3; a:[3] and b:[10] buffered
      val s1 = spark.table("count_win").as[(String, (String, Long))].collect()
        .map { case (k, v) => (k, v._2) }.toSet
      assert(s1 === Set(("a", 3L)))
      input.addData(("b", 20L), ("a", 4L))
      q.processAllAvailable()
      // b: [10,20] -> 30; a: [3,4] -> 7
      val s2 = spark.table("count_win").as[(String, (String, Long))].collect()
        .map { case (k, v) => (k, v._2) }.toSet
      assert(s2 === Set(("a", 3L), ("a", 7L), ("b", 30L)))
    } finally q.stop()
  }

  test("watermark idleness: a silent source stops stalling the union's windows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    val active = MemoryStream[(java.sql.Timestamp, String)](82, spark, None)
    val silent = MemoryStream[(java.sql.Timestamp, String)](83, spark, None)
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // the active side uses a plain watermark; the silent side declares
    // idleness, so after ~2s of silence its watermark follows wall
    // clock instead of pinning the global min at epoch
    val a = FStream(active.toDS().toDF("ts", "src").as[(java.sql.Timestamp, String)])
      .assignWatermark("ts", "1 second")
    val b = FStream(silent.toDS().toDF("ts", "src").as[(java.sql.Timestamp, String)])
      .assignWatermark("ts", "1 second", idleness = "2 seconds")
    val windows = a.union(b).ds.toDF("ts", "src")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("n"))
    val q = windows.writeStream.format("memory").queryName("idle_win")
      .outputMode("append").start()
    try {
      active.addData((ts("2024-01-01 10:00:00"), "a"), (ts("2024-01-01 10:30:00"), "a"),
        (ts("2024-01-01 11:30:00"), "a")) // pushes the active watermark past 11:00
      q.processAllAvailable()
      // append-mode windows fire only once the GLOBAL (min) watermark
      // passes window end; the silent source would hold it at epoch
      // forever without idleness. Poll: heartbeats tick 1/s, and the
      // watermark takes effect one micro-batch after the tick.
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      def fired() = spark.table("idle_win").count() >= 1
      while (!fired() && System.nanoTime() < deadline) {
        Thread.sleep(500)
        q.processAllAvailable()
      }
      assert(fired(), "10:00 window never fired despite the idle source")
      val got = spark.table("idle_win")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSet
      assert(got.contains(("2024-01-01 10:00:00.0", 2L)), got.toString)
      // no synthetic heartbeat rows leaked into the aggregation
      assert(spark.table("idle_win")
        .filter(col("wstart") > lit(ts("2025-01-01 00:00:00"))).count() === 0)
    } finally q.stop()
  }

  test("flatMapGroups emits multiple rows per key (UDTAG shape)") {
    val s = FStream(Seq(("a", 1), ("a", 2), ("b", 5)).toDS())
    val out = s.keyBy(_._1)
      .flatMapGroups((k, it) => it.map(v => s"$k:${v._2}").toList.sorted)
      .collect().toSet
    assert(out === Set("a:1", "a:2", "b:5"))
  }

  test("connect + keyed co-process shares state across the two inputs") {
    // stream A: (key, amount); stream B: (key, limit) — emit amounts
    // only when the key's most recent limit allows them
    val amounts = FStream(Seq(("k1", 5L), ("k1", 50L), ("k2", 7L)).toDS())
    val limits = FStream(Seq(("k1", 10L)).toDS())
    val out = amounts.connect(limits)
      .keyBy(_._1, _._1)
      .process[Long, (String, Long)]() { (key, it, state) =>
        val rows = it.toSeq
        rows.collect { case graft.datastream.CoRecord(_, Some((_, lim))) => lim }
          .foreach(l => state.update(l))
        val lim = state.getOption.getOrElse(Long.MaxValue)
        rows.collect {
          case graft.datastream.CoRecord(Some((k, amt)), _) if amt <= lim => (k, amt)
        }.iterator
      }
      .collect().toSet
    assert(out === Set(("k1", 5L), ("k2", 7L)))
  }

  test("withBroadcast applies the control stream to every element") {
    val data = FStream(spark.range(1, 6).as[Long])
    val control = Seq(2L, 3L).toDS()
    val out = data.withBroadcast(control)((v, rules) => v * rules.sum)
      .ds.collect().toSet
    assert(out === Set(5L, 10L, 15L, 20L, 25L))
  }

  test("side outputs split one pass into main and side streams") {
    val s = FStream(spark.range(1, 7).as[Long])
    val (evens, odds) = s.sideOutput[Long, String](v =>
      if (v % 2 == 0) Left(v) else Right(s"odd-$v"))
    assert(evens.ds.collect().toSet === Set(2L, 4L, 6L))
    assert(odds.ds.collect().toSet === Set("odd-1", "odd-3", "odd-5"))
  }

  test("coGroup sees both inputs' iterators per key") {
    val a = FStream(Seq(("x", 1), ("x", 2), ("y", 3)).toDS())
    val b = FStream(Seq(("x", 10), ("z", 30)).toDS())
    val out = a.coGroup(b)(_._1, _._1) { (k, as, bs) =>
      Iterator.single((k, as.map(_._2).sum, bs.map(_._2).sum))
    }.ds.collect().toSet
    assert(out === Set(("x", 3, 10), ("y", 3, 0), ("z", 0, 30)))
  }

  test("asyncMap ordered preserves input order; unordered emits the slow head late " +
      "(AsyncDataStream orderedWait/unorderedWait)") {
    import scala.concurrent.Future
    // ONE partition so emission order is observable; element 1 is slow.
    // The delegate is a self-contained lambda (the global EC is a
    // static module access, nothing non-serializable is captured)
    val src = FStream(spark.createDataset(Seq(1L, 2L, 3L, 4L, 5L, 6L)).coalesce(1))
    val delayed: Long => Future[Long] = v =>
      Future { if (v == 1L) Thread.sleep(300); v * 10 }(
        scala.concurrent.ExecutionContext.global)

    val ordered = src.asyncMap(capacity = 4, timeoutMillis = 10000, ordered = true)(delayed)
      .ds.collect().toSeq
    assert(ordered === Seq(10L, 20L, 30L, 40L, 50L, 60L),
      "ordered mode must emit in input order despite the slow head")

    // Deterministic fast-before-slow, no wall-clock race: element 1's
    // future can only complete once f(5) has been CALLED — and with
    // capacity 4, launching element 5 requires a window slot freed by
    // a fast element's emission. So the first emitted element is a
    // fast one by construction, on any scheduler.
    val gated: Long => Future[Long] = v =>
      if (v == 5L) { AsyncGate.launch5.countDown(); Future.successful(50L) }
      else Future {
        if (v == 1L) AsyncGate.launch5.await(10, java.util.concurrent.TimeUnit.SECONDS)
        v * 10
      }(scala.concurrent.ExecutionContext.global)
    val unordered = src.asyncMap(capacity = 4, timeoutMillis = 10000, ordered = false)(gated)
      .ds.collect().toSeq
    assert(unordered.toSet === Set(10L, 20L, 30L, 40L, 50L, 60L))
    assert(unordered.head !== 10L,
      s"unordered mode must emit a fast element before the gated head: $unordered")

    // in-flight never exceeds capacity: a capacity-1 window is strictly
    // sequential, so total wall >= the slow element's delay and order holds
    val seq1 = src.asyncMap(capacity = 1, timeoutMillis = 10000, ordered = false)(delayed)
      .ds.collect().toSeq
    assert(seq1 === Seq(10L, 20L, 30L, 40L, 50L, 60L),
      "capacity 1 serializes even the unordered mode")
  }

  test("asyncMap timer runs from LAUNCH: a queued ordered element never gets " +
      "capacity x timeout, a hung unordered future fails mid-window") {
    import scala.concurrent.Future

    // ordered: three 0/400/900ms elements launch together (capacity 3);
    // element 3's 600ms budget expires at launch+600 < its 900ms
    // completion, even though only ~200ms of AWAIT time lands on it —
    // the per-await accounting this pins against would let it pass
    val src3 = FStream(spark.createDataset(Seq(0L, 400L, 900L)).coalesce(1))
    // EC referenced INSIDE the lambda (static module access) so the
    // shipped closure captures nothing non-serializable
    val sleeper: Long => Future[Long] = ms =>
      Future { Thread.sleep(ms); ms }(scala.concurrent.ExecutionContext.global)
    val exOrd = intercept[Exception] {
      src3.asyncMap(capacity = 3, timeoutMillis = 600, ordered = true)(sleeper)
        .ds.collect()
    }
    def chain(e: Throwable): Seq[Throwable] =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(exOrd).exists(_.isInstanceOf[java.util.concurrent.TimeoutException]),
      s"expected a launch-anchored timeout, got: $exOrd")

    // unordered: a 10s-hung element among instant ones must fail the
    // task at ITS deadline, not survive while neighbors complete
    val src6 = FStream(spark.createDataset(Seq(10000L, 0L, 0L, 0L, 0L, 0L)).coalesce(1))
    val exUno = intercept[Exception] {
      src6.asyncMap(capacity = 4, timeoutMillis = 300, ordered = false)(sleeper)
        .ds.collect()
    }
    assert(chain(exUno).exists(_.isInstanceOf[java.util.concurrent.TimeoutException]),
      s"expected a launch-anchored timeout, got: $exUno")
  }
}

/** Static gate for the asyncMap determinism test: a lambda shipped to
  * the (local) executor reaches it as a module access, nothing
  * non-serializable is captured.
  */
object AsyncGate {
  val launch5 = new java.util.concurrent.CountDownLatch(1)
}
