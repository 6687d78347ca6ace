package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.OverStream

/** Streaming OVER aggregate: range-bounded-preceding frames emitted
  * once the watermark completes them.
  */
class OverStreamSpec extends SparkSpec {
  import spark.implicits._

  test("range frame sums exactly the preceding window per row") {
    val input = MemoryStream[OverStream.TimedValue](11, spark, None)
    val withWm = input.toDF()
      .withColumn("eventTime", timestamp_millis($"tsMillis"))
      .withWatermark("eventTime", "0 seconds")
      .as[OverStream.TimedValue]
    val out = OverStream.rangeSumPreceding(withWm, rangeMillis = 10000)
    val q = out.writeStream.format("memory").queryName("over_stream")
      .outputMode("append").start()
    try {
      input.addData(
        OverStream.TimedValue(1, 1000, 1, 1.0),
        OverStream.TimedValue(1, 5000, 2, 2.0),
        OverStream.TimedValue(1, 12000, 3, 4.0),  // frame: (2000,12000] -> rows 2,3
        OverStream.TimedValue(1, 30000, 4, 8.0))  // frame: only itself
      q.processAllAvailable()
      input.addData(OverStream.TimedValue(2, 60000, 9, 0.0)) // advance watermark
      q.processAllAvailable()
      input.addData(OverStream.TimedValue(2, 90000, 10, 0.0))
      q.processAllAvailable()
      val rows = spark.table("over_stream").as[OverStream.OverEmit]
        .collect().filter(_.key == 1).map(e => e.id -> e.frameSum).toMap
      assert(rows === Map(1L -> 1.0, 2L -> 3.0, 3L -> 6.0, 4L -> 8.0), rows.toString)
    } finally q.stop()
  }

  test("rows retained as frame context are not re-emitted on a later trigger") {
    // Round-1 bug: with a wide range, an emitted row stays buffered as
    // frame context (ts > wm - range); fresh same-key input then put it
    // back in the ready partition and it emitted twice.
    val input = MemoryStream[OverStream.TimedValue](12, spark, None)
    val withWm = input.toDF()
      .withColumn("eventTime", timestamp_millis($"tsMillis"))
      .withWatermark("eventTime", "0 seconds")
      .as[OverStream.TimedValue]
    val out = OverStream.rangeSumPreceding(withWm, rangeMillis = 60000)
    val q = out.writeStream.format("memory").queryName("over_stream2")
      .outputMode("append").start()
    try {
      input.addData(OverStream.TimedValue(1, 30000, 1, 1.0))
      q.processAllAvailable()
      input.addData(OverStream.TimedValue(2, 60000, 9, 0.0)) // wm -> 60s; emits id=1 (still retained: 30s > 60s-60s)
      q.processAllAvailable()
      // fresh key-1 input after the watermark passed the retained row:
      // id=1 must NOT re-emit; id=2's frame (10s,70s] includes id=1
      input.addData(OverStream.TimedValue(1, 70000, 2, 2.0))
      q.processAllAvailable()
      input.addData(OverStream.TimedValue(2, 200000, 10, 0.0)) // wm -> 200s; emits id=2
      q.processAllAvailable()
      val rows = spark.table("over_stream2").as[OverStream.OverEmit]
        .collect().filter(_.key == 1).toSeq
      assert(rows.count(_.id == 1) === 1, s"id=1 emitted ${rows.count(_.id == 1)} times: $rows")
      val id2 = rows.filter(_.id == 2)
      assert(id2.size === 1 && id2.head.frameSum === 3.0, rows.toString)
    } finally q.stop()
  }
}
