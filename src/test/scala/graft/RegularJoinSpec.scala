package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{JoinEvent, SortIn}

/** Regular (unbounded) two-stream join with state TTL, and streaming
  * temporal sort.
  */
class RegularJoinSpec extends SparkSpec {
  import spark.implicits._

  test("regular join emits each cross-side pair once; TTL evicts old state") {
    val input = MemoryStream[JoinEvent](31, spark, None)
    val withWm = input.toDF()
      .withColumn("eventTime", timestamp_millis($"tsMillis"))
      .withWatermark("eventTime", "0 seconds")
      .as[JoinEvent]
    val out = StatefulOps.regularJoin(withWm, ttlMillis = 60000)
    val q = out.writeStream.format("memory").queryName("regular_join")
      .outputMode("append").start()
    try {
      def rows() = spark.table("regular_join").as[StatefulOps.JoinEmit]
        .collect().toSet
      // same-batch both sides, plus a later left joining buffered right
      input.addData(
        JoinEvent(1, 1000, 0, 100), JoinEvent(1, 2000, 1, 200),
        JoinEvent(2, 1000, 0, 300))
      q.processAllAvailable()
      assert(rows() === Set(StatefulOps.JoinEmit(1, 100, 200)))
      input.addData(JoinEvent(1, 3000, 0, 101)) // joins buffered right 200
      q.processAllAvailable()
      assert(rows() === Set(
        StatefulOps.JoinEmit(1, 100, 200), StatefulOps.JoinEmit(1, 101, 200)))
      // advance watermark far past TTL, then a fresh right must NOT
      // match the expired lefts
      input.addData(JoinEvent(3, 500000, 0, 999))
      q.processAllAvailable()
      input.addData(JoinEvent(1, 500000, 1, 201))
      q.processAllAvailable()
      assert(!rows().exists(_.rightId == 201), rows().toString)
    } finally q.stop()
  }

  test("temporal sort emits globally event-time-ordered rows") {
    val input = MemoryStream[SortIn](32, spark, None)
    val withWm = input.toDF()
      .withColumn("eventTime", timestamp_millis($"tsMillis"))
      .withWatermark("eventTime", "0 seconds")
      .as[SortIn]
    val out = StatefulOps.temporalSortStream(withWm)
    val q = out.writeStream.format("memory").queryName("temporal_sort")
      .outputMode("append").start()
    try {
      input.addData(SortIn(5000, 2, 1.0), SortIn(1000, 1, 2.0), SortIn(9000, 3, 3.0))
      q.processAllAvailable()
      input.addData(SortIn(20000, 4, 4.0)) // wm -> 20s, flushes 1,2,3
      q.processAllAvailable()
      input.addData(SortIn(30000, 5, 5.0)) // wm -> 30s, flushes 4
      q.processAllAvailable()
      val ids = spark.table("temporal_sort").as[SortIn].collect().map(_.id).toList
      assert(ids.take(4) === List(1L, 2L, 3L, 4L), ids.toString)
    } finally q.stop()
  }
}
