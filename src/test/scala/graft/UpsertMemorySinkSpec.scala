package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.sources.UpsertMemoryStore

/** DSv2 streaming write SPI: upsert-by-key semantics with tombstone
  * deletes, per-epoch commit (the upsert-kafka sink contract).
  */
class UpsertMemorySinkSpec extends SparkSpec {
  import spark.implicits._

  test("streaming write upserts by key and deletes on all-null values") {
    UpsertMemoryStore.clear("spec")
    val input = MemoryStream[(String, Option[Long])](41, spark, None)
    val df = input.toDF().toDF("k", "v")
    val q = df.writeStream
      .format("graft.sources.UpsertMemorySink")
      .option("store", "spec")
      .option("keyColumn", "k")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_ums").toString)
      .start()
    try {
      input.addData(("a", Some(1L)), ("b", Some(2L)))
      q.processAllAvailable()
      input.addData(("a", Some(10L)))          // upsert
      q.processAllAvailable()
      input.addData(("b", None: Option[Long])) // tombstone delete
      q.processAllAvailable()
      val store = UpsertMemoryStore.store("spec")
      assert(store.get("a") === Some(Seq(10L)))
      assert(store.get("b") === None)
      assert(store.size === 1)
    } finally q.stop()
  }
}
