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

  test("partitioned merge rewrites only buckets touched by the batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_p").toString + "/state"
    val input = MemoryStream[(Long, Long, String)](22, spark, None)
    val df = input.toDF().toDF("k", "seq", "v")
    val q = df.writeStream
      .foreachBatch(UpsertSink.mergePartitioned(Seq("k"), "seq", dir, numBuckets = 8) _)
      .start()
    try {
      // seed many keys so several buckets exist
      input.addData((1L to 40L).map(k => (k, 1L, s"v$k")): _*)
      q.processAllAvailable()
      def filesByBucket(): Map[String, Map[String, (Long, Long)]] = {
        val base = new java.io.File(dir)
        base.listFiles().filter(_.getName.startsWith("__part=")).map { d =>
          d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => f.getName -> (f.length(), f.lastModified())).toMap
        }.toMap
      }
      val before = filesByBucket()
      assert(before.size > 1, s"expected several buckets, got ${before.keys}")
      // update exactly one key; only its bucket may change
      input.addData((1L, 2L, "v1-updated"))
      q.processAllAvailable()
      val after = filesByBucket()
      val touched = before.keys.filter(b => before(b) != after.getOrElse(b, Map.empty))
      assert(touched.size === 1, s"buckets rewritten: $touched")
      val state = UpsertSink.readPartitioned(spark, dir).collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toMap
      assert(state(1L) === "v1-updated")
      assert(state.size === 40)
      assert(state(40L) === "v40")
    } finally q.stop()
  }
}
