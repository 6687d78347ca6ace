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
}
