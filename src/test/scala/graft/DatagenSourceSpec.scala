package graft

import org.apache.spark.sql.functions._

/** DSv2 datagen source: determinism, parallelism, schema. */
class DatagenSourceSpec extends SparkSpec {

  private def gen(parts: Int, rows: Int) =
    spark.read.format("graft.sources.DatagenSource")
      .option("partitions", parts).option("rowsPerPartition", rows).load()

  test("produces partitions x rows deterministic rows") {
    val a = gen(4, 100)
    assert(a.count() === 400)
    assert(a.select("id").distinct().count() === 400)
    val s1 = a.agg(sum("value")).first().getDouble(0)
    val s2 = gen(4, 100).agg(sum("value")).first().getDouble(0)
    assert(s1 === s2)
  }

  test("schema and value ranges") {
    val df = gen(2, 50)
    assert(df.schema.fieldNames.toSeq === Seq("id", "ts", "key", "value"))
    assert(df.filter(col("value") < 0 || col("value") > 100).count() === 0)
    assert(df.select("key").distinct().count() === 4)
  }

  test("micro-batch stream emits deterministic rows across triggers") {
    val stream = spark.readStream.format("graft.sources.DatagenSource")
      .option("partitions", 2).option("rowsPerPartition", 50)
      .option("maxRows", 300).load()
    val q = stream.writeStream.format("memory").queryName("gen_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val df = spark.table("gen_stream")
      assert(df.count() === 300, s"stream must drain exactly maxRows rows")
      assert(df.select("id").distinct().count() === 300, "ids must be unique")
      assert(df.groupBy("key").count().count() === 4)
    } finally q.stop()
  }

  test("watermark alignment caps a fast split at the combined min frontier + drift " +
      "(WatermarkAlignmentParams semantics)") {
    // split 0 produces 10x faster; 1 row = 1 s of event time per split
    def run(drift: Option[Long]): Seq[(Long, Long, Long)] = {
      val frontiers = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      val reader = spark.readStream.format("graft.sources.DatagenSource")
        .option("splitRates", "50,5").option("maxRowsPerSplit", 100)
      val stream = drift.map(d =>
        reader.option("alignment.max-drift-seconds", d)).getOrElse(reader).load()
      var fast = -1L; var slow = -1L
      val q = stream.writeStream.outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
          // per-split frontier = max event-second emitted so far
          // (id encodes the split: split * 1e9 + rowIdx = seconds)
          val rows = df.select("id").collect().map(_.getLong(0))
          if (rows.nonEmpty) {
            val f = rows.filter(_ < 1000000000L)
            val sl = rows.filter(_ >= 1000000000L).map(_ - 1000000000L)
            if (f.nonEmpty) fast = math.max(fast, f.max)
            if (sl.nonEmpty) slow = math.max(slow, sl.max)
            frontiers.synchronized { frontiers += ((batchId, fast, slow)) }
          }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      frontiers.toSeq
    }

    val aligned = run(Some(10L))
    // every micro-batch: the fast split's frontier stays within
    // drift of the slow one (the coordinator cap), yet both finish
    assert(aligned.nonEmpty)
    aligned.foreach { case (b, f, s) =>
      assert(f - s <= 10L, s"batch $b: fast frontier $f ran ${f - s}s ahead (> drift 10)")
    }
    val (_, fFinal, sFinal) = aligned.last
    assert(fFinal === 99L && sFinal === 99L, "both splits must drain to maxRowsPerSplit")

    // without alignment the same source skews far past 10 s
    val free = run(None)
    assert(free.exists { case (_, f, s) => f - s > 10L },
      "unaligned run must show the fast split running away")
  }

  test("restart against the checkpoint re-emits nothing: the frontier seeds from " +
      "the committed offset, not zero") {
    // both datagen streams keep their frontier in driver-side state;
    // recovery must seed it from deserializeOffset or the committed
    // offset retreats and re-advancing ranges duplicate output
    val base = java.nio.file.Files.createTempDirectory("graft_datagen_ckpt").toString
    def run(ckpt: String, reader: org.apache.spark.sql.streaming.DataStreamReader,
        ids: scala.collection.mutable.ArrayBuffer[Long]): Unit = {
      val q = reader.load().writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val got = df.select("id").collect().map(_.getLong(0))
          ids.synchronized { ids ++= got }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }

    // aligned (vector-offset) stream
    val alignedIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    def alignedReader = spark.readStream.format("graft.sources.DatagenSource")
      .option("splitRates", "50,5").option("maxRowsPerSplit", 100)
    run(s"$base/aligned", alignedReader, alignedIds)
    assert(alignedIds.size === 200 && alignedIds.distinct.size === 200)
    run(s"$base/aligned", alignedReader, alignedIds) // fresh stream, same checkpoint
    assert(alignedIds.size === 200,
      s"aligned restart re-emitted ${alignedIds.size - 200} committed rows")

    // scalar-offset stream
    val scalarIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    def scalarReader = spark.readStream.format("graft.sources.DatagenSource")
      .option("partitions", 2).option("rowsPerPartition", 50).option("maxRows", 300)
    run(s"$base/scalar", scalarReader, scalarIds)
    assert(scalarIds.size === 300 && scalarIds.distinct.size === 300)
    run(s"$base/scalar", scalarReader, scalarIds)
    assert(scalarIds.size === 300,
      s"scalar restart re-emitted ${scalarIds.size - 300} committed rows")
  }

  test("aggregates over generated event time") {
    val n = gen(2, 200)
      .groupBy(window(col("ts"), "1 minute"), col("key"))
      .agg(count(lit(1)))
      .count()
    assert(n > 0)
  }

  test("DDL datagen honors the per-field generator options (DataGenTableSourceFactory)") {
    import graft.catalog.GraftCatalog
    GraftCatalog.executeDdl(spark,
      """CREATE TABLE gen_t (
        |  id BIGINT, price DOUBLE, name STRING, flag BOOLEAN
        |) WITH ('connector' = 'datagen', 'number-of-rows' = '50',
        |  'fields.id.kind' = 'sequence', 'fields.id.start' = '100',
        |  'fields.price.min' = '5', 'fields.price.max' = '10',
        |  'fields.name.length' = '7')""".stripMargin)
    try {
      val rows = spark.table("gen_t").collect()
      assert(rows.length === 50)
      // sequence: exact consecutive values from start
      assert(rows.map(_.getLong(0)).sorted.toSeq === (100L to 149L))
      // random numeric: inside the declared bounds
      assert(rows.forall(r => r.getDouble(1) >= 5.0 && r.getDouble(1) < 10.0 + 1e-9))
      // string length honored
      assert(rows.forall(_.getString(2).length === 7))
      // deterministic: a second read generates identical data
      val again = spark.table("gen_t").collect()
      assert(again.map(_.toSeq).toSeq === rows.map(_.toSeq).toSeq)
      // streaming twin drives the same generators off the rate source
      val q = GraftCatalog.streamOf(spark, "gen_t")
        .writeStream.format("memory").queryName("gen_ddl_stream")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        Thread.sleep(1200)
        q.processAllAvailable()
        val got = spark.table("gen_ddl_stream")
        assert(got.columns.toSeq === Seq("id", "price", "name", "flag"))
        assert(got.count() > 0)
      } finally q.stop()
    } finally GraftCatalog.executeDdl(spark, "DROP TABLE gen_t")
  }

  test("bounded sequence exhausts the source at its end (reference termination)") {
    import graft.catalog.GraftCatalog
    GraftCatalog.executeDdl(spark,
      """CREATE TABLE gen_seq (id BIGINT, v DOUBLE)
        |WITH ('connector' = 'datagen', 'number-of-rows' = '1000',
        |  'fields.id.kind' = 'sequence', 'fields.id.start' = '5',
        |  'fields.id.end' = '14')""".stripMargin)
    try {
      val ids = spark.table("gen_seq").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids === (5L to 14L), s"sequence must stop at end: $ids")
      // datagen is source-only
      import spark.implicits._
      val e = intercept[IllegalArgumentException] {
        GraftCatalog.insertInto(spark, "gen_seq",
          Seq((1L, 1.0)).toDF("id", "v"), overwrite = false)
      }
      assert(e.getMessage.contains("source-only"))
      // sequence on a non-numeric type fails loudly
      val bad = intercept[RuntimeException] {
        GraftCatalog.executeDdl(spark,
          """CREATE TABLE gen_seq_bad (flag BOOLEAN)
            |WITH ('connector' = 'datagen', 'fields.flag.kind' = 'sequence')""".stripMargin)
      }
      assert(bad.getMessage.contains("unsupported kind"))
    } finally GraftCatalog.executeDdl(spark, "DROP TABLE gen_seq")
  }

  test("bounded sequence terminates in the STREAMING twin too") {
    import graft.catalog.GraftCatalog
    GraftCatalog.executeDdl(spark,
      """CREATE TABLE gen_seq_s (id BIGINT)
        |WITH ('connector' = 'datagen', 'rows-per-second' = '1000',
        |  'fields.id.kind' = 'sequence', 'fields.id.start' = '5',
        |  'fields.id.end' = '14')""".stripMargin)
    try {
      val q = GraftCatalog.streamOf(spark, "gen_seq_s")
        .writeStream.format("memory").queryName("gen_seq_stream")
        .outputMode("append").start()
      try {
        // let the rate source run well past 10 rows' worth of ticks
        q.processAllAvailable()
        Thread.sleep(1500)
        q.processAllAvailable()
        val ids = spark.table("gen_seq_stream").collect().map(_.getLong(0)).sorted.toSeq
        // the stream must never emit past 'end' — same cap as batch
        assert(ids.forall(i => i >= 5L && i <= 14L),
          s"stream emitted past the sequence end: $ids")
        assert(ids.distinct === ids, s"stream repeated sequence values: $ids")
      } finally q.stop()
    } finally GraftCatalog.executeDdl(spark, "DROP TABLE gen_seq_s")
  }

  test("random integer range wider than Long.MaxValue is rejected loudly") {
    import graft.catalog.GraftCatalog
    val e = intercept[RuntimeException] {
      GraftCatalog.executeDdl(spark,
        s"""CREATE TABLE gen_wide (id BIGINT)
           |WITH ('connector' = 'datagen',
           |  'fields.id.min' = '${Long.MinValue}',
           |  'fields.id.max' = '${Long.MaxValue}')""".stripMargin)
      spark.table("gen_wide").collect()
    }
    assert(e.getMessage.contains("wider than Long.MaxValue"))
    GraftCatalog.executeDdl(spark, "DROP TABLE IF EXISTS gen_wide")
  }

  test("DDL datagen rejects unsupported kinds loudly") {
    import graft.catalog.GraftCatalog
    val e = intercept[RuntimeException] {
      GraftCatalog.executeDdl(spark,
        """CREATE TABLE gen_bad (id BIGINT)
          |WITH ('connector' = 'datagen', 'fields.id.kind' = 'gaussian')""".stripMargin)
      spark.table("gen_bad").collect()
    }
    assert(e.getMessage.contains("unsupported kind"))
    GraftCatalog.executeDdl(spark, "DROP TABLE IF EXISTS gen_bad")
  }
}
