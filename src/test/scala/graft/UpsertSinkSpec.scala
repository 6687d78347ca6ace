package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.UpsertSink

/** Upsert materialization across micro-batches: later rows win,
  * state survives between batches.
  */
class UpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch merge keeps latest row per key across batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString + "/state"
    val input = MemoryStream[(Long, Long, String)](21, spark, None)
    val df = input.toDF().toDF("k", "seq", "v")
    val q = df.writeStream
      .foreachBatch(UpsertSink.merge(Seq("k"), "seq", dir) _)
      .start()
    try {
      input.addData((1L, 1L, "a"), (2L, 1L, "b"))
      q.processAllAvailable()
      input.addData((1L, 2L, "a2"), (3L, 1L, "c"))
      q.processAllAvailable()
      val state = spark.read.parquet(dir).collect()
        .map(r => (r.getLong(0), r.getString(2))).toMap
      assert(state === Map(1L -> "a2", 2L -> "b", 3L -> "c"), state.toString)
    } finally q.stop()
  }
}
