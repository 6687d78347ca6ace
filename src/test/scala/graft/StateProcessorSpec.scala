package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.state.StateProcessor

case class CountState(n: Long)

object StateProcessorFns {
  val countFn: (String, Iterator[(String, Int)], GroupState[CountState]) => (String, Long) =
    (k, it, st) => {
      val n = st.getOption.map(_.n).getOrElse(0L) + it.size
      st.update(CountState(n))
      (k, n)
    }
}

/** State-processor API tests: offline checkpoint reads (the
  * reference's SavepointReader) and initial-state bootstrap
  * (SavepointWriter/StateBootstrapTransformation).
  */
class StateProcessorSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val dir = new java.io.File(s"/tmp/graft_state_spec/$tag")
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(del)
      f.delete()
    }
    if (dir.exists()) del(dir)
    dir.getAbsolutePath
  }


  test("keyed state of a stopped job reads offline as a DataFrame " +
      "(SavepointReader.readKeyedState)") {
    val ckpt = freshDir("read_ckpt")
    val input = MemoryStream[(String, Int)](101, spark, None)
    val counts = input.toDS().groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(StateProcessorFns.countFn)
    val q = counts.writeStream.format("memory").queryName("sp_read")
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try {
      input.addData(("a", 1), ("a", 2), ("b", 3))
      q.processAllAvailable()
      input.addData(("a", 4))
      q.processAllAvailable()
    } finally q.stop()
    // the job is DOWN; its state reads as data (one row per key)
    val state = StateProcessor.keyedState(spark, ckpt)
    val byKey = state.selectExpr("key.value AS k", "value.groupState.n AS n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey === Map("a" -> 3L, "b" -> 1L))
  }

  test("earlier batch versions are addressable (savepoint history)") {
    val ckpt = freshDir("versions_ckpt")
    val input = MemoryStream[(String, Int)](102, spark, None)
    val counts = input.toDS().groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(StateProcessorFns.countFn)
    val q = counts.writeStream.format("memory").queryName("sp_versions")
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try {
      input.addData(("a", 1))
      q.processAllAvailable()
      input.addData(("a", 1), ("a", 1))
      q.processAllAvailable()
    } finally q.stop()
    def nAt(batch: Option[Long]): Long =
      StateProcessor.keyedState(spark, ckpt, batchId = batch)
        .selectExpr("value.groupState.n").collect().map(_.getLong(0)).sum
    assert(nAt(Some(0L)) === 1L) // after the first micro-batch
    assert(nAt(None) === 3L)     // latest committed
  }

  test("state-metadata lists the stateful operator (SavepointMetadata)") {
    val ckpt = freshDir("meta_ckpt")
    val input = MemoryStream[(String, Int)](103, spark, None)
    val counts = input.toDS().groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(StateProcessorFns.countFn)
    val q = counts.writeStream.format("memory").queryName("sp_meta")
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try {
      input.addData(("a", 1))
      q.processAllAvailable()
    } finally q.stop()
    val meta = StateProcessor.metadata(spark, ckpt)
      .selectExpr("operatorId", "operatorName", "numPartitions").collect()
    assert(meta.map(_.getLong(0)).contains(0L))
    assert(meta.map(_.getString(1)).mkString(",").nonEmpty)
    assert(meta.map(_.getInt(2)).forall(_ > 0))
  }

  test("bootstrap: a new job starts from seeded state and an old job's " +
      "read state round-trips as a seed (SavepointWriter loop)") {
    // phase 1: run + stop a job, read its state offline
    val ckpt = freshDir("boot_ckpt")
    val in1 = MemoryStream[(String, Int)](104, spark, None)
    val c1 = in1.toDS().groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(StateProcessorFns.countFn)
    val q1 = c1.writeStream.format("memory").queryName("sp_boot1")
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try {
      in1.addData(("a", 1), ("a", 1), ("b", 1))
      q1.processAllAvailable()
    } finally q1.stop()
    val seed = StateProcessor.keyedState(spark, ckpt)
      .selectExpr("key.value", "value.groupState.n")
      .as[(String, Long)].map { case (k, n) => (k, CountState(n)) }
    // phase 2: a brand-new job (fresh checkpoint) continues the counts
    val in2 = MemoryStream[(String, Int)](105, spark, None)
    val c2 = StateProcessor.withInitialState(
      in2.toDS().groupByKey(_._1), seed)(StateProcessorFns.countFn)
    val q2 = c2.writeStream.format("memory").queryName("sp_boot2")
      .outputMode("update")
      .option("checkpointLocation", freshDir("boot_ckpt2")).start()
    try {
      in2.addData(("a", 1), ("c", 1))
      q2.processAllAvailable()
    } finally q2.stop()
    val out = spark.table("sp_boot2").as[(String, Long)].collect().toMap
    // a continues from the old job's 2, c starts fresh; b (seeded, no
    // new data) emits its restored count in the first batch — the same
    // first-batch re-emission a Flink job restored from a bootstrapped
    // savepoint shows on its changelog sink
    assert(out === Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
  }

  test("windowed streaming aggregate state reads offline (EvictingWindowSavepointReader analog)") {
    import java.sql.Timestamp
    import org.apache.spark.sql.functions._
    val ckpt = freshDir("window_ckpt")
    val input = MemoryStream[(Timestamp, String, Double)](106, spark, None)
    val agg = input.toDF().toDF("ts", "k", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val q = agg.writeStream.format("memory").queryName("sp_window")
      .outputMode("update").option("checkpointLocation", ckpt).start()
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    try {
      input.addData((t(1), "a", 1.0), (t(2), "a", 2.0), (t(6), "b", 5.0))
      q.processAllAvailable()
    } finally q.stop()
    // the window-agg operator's keyed state: one row per (window, key)
    val state = StateProcessor.keyedState(spark, ckpt)
    // the value struct carries the INTERNAL aggregation buffer
    // (count/sum), not the output aliases — state is pre-merge data
    val rows = state.selectExpr("key.k", "value.count", "value.sum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows === Set(("a", 2L, 3.0), ("b", 1L, 5.0)))
    // the metadata names the window-aggregate operator
    val ops = StateProcessor.metadata(spark, ckpt)
      .selectExpr("operatorName").collect().map(_.getString(0))
    assert(ops.exists(_.toLowerCase.contains("statestoresave")), ops.mkString(","))
  }
}
