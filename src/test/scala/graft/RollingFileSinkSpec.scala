package graft

import org.apache.spark.sql.functions._
import graft.streaming.RollingFileSink

/** Streaming file sink: rolling policy + small-file compaction. */
class RollingFileSinkSpec extends SparkSpec {
  import spark.implicits._

  private def dataFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk)
      else if (!f.getName.startsWith("_") && !f.getName.startsWith(".")) Seq(f)
      else Nil
    walk(new java.io.File(dir))
  }

  test("rolling write sizes output files to the batch, not the shuffle width") {
    val base = java.nio.file.Files.createTempDirectory("graft_roll").toString
    // a trickle batch must write ONE file even though the session's
    // shuffle width is 4+
    val trickle = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    RollingFileSink.writeRolled(trickle, s"$base/t", "parquet",
      targetFileBytes = 128L << 20)
    assert(dataFiles(s"$base/t").length === 1)
    // a fat batch against a tiny target must roll into several files
    val fat = spark.range(0, 20000).select(col("id").as("k"),
      concat(lit("payload-"), col("id")).as("v"))
    RollingFileSink.writeRolled(fat, s"$base/fat", "parquet",
      targetFileBytes = 64 << 10)
    assert(dataFiles(s"$base/fat").length > 1)
  }

  test("compaction merges small files, preserves rows exactly, keeps partition dirs") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val path = s"$base/events"
    // 6 trickle appends x 2 partition values -> 12 small files
    (1 to 6).foreach { i =>
      Seq((i.toLong, "x", s"v$i"), (i.toLong, "y", s"v$i"))
        .toDF("k", "p", "v")
        .write.mode("append").partitionBy("p").parquet(path)
    }
    val before = dataFiles(path)
    assert(before.length >= 12)
    val rowsBefore = spark.read.parquet(path)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq.sorted
    val report = RollingFileSink.compact(spark, path, "parquet",
      targetFileBytes = 64 << 20, partitionKeys = Seq("p"))
    assert(report.filesBefore === before.length)
    assert(report.filesAfter < report.filesBefore,
      s"compaction did not reduce files: $report")
    val after = dataFiles(path)
    assert(after.length === report.filesAfter)
    // per-partition compaction: both partition dirs survive with one
    // file each (12 small files fit one 64MB bin per dir)
    assert(after.length === 2)
    assert(after.map(_.getParentFile.getName).toSet === Set("p=x", "p=y"))
    val rowsAfter = spark.read.parquet(path)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq.sorted
    assert(rowsAfter === rowsBefore, "compaction changed row content")
    // partition pruning still works on the compacted layout
    assert(spark.read.parquet(path).filter(col("p") === "x").count() === 6)
  }

  test("csv with header survives rolled writes and compaction (options + schema threaded)") {
    val base = java.nio.file.Files.createTempDirectory("graft_csvroll").toString
    val path = s"$base/c"
    val opts = Map("header" -> "true")
    val schema = org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, v STRING")
    // three trickle appends, each with a header line
    (1 to 3).foreach { i =>
      RollingFileSink.writeRolled(Seq((i.toLong, s"v$i")).toDF("k", "v"),
        path, "csv", targetFileBytes = 64 << 20, formatOptions = opts)
    }
    def readAll() = spark.read.options(opts).schema(schema).csv(path)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    val expected = Seq((1L, "v1"), (2L, "v2"), (3L, "v3"))
    assert(readAll() === expected, "rolled csv append lost rows (header mishandled)")
    val report = RollingFileSink.compact(spark, path, "csv",
      targetFileBytes = 64 << 20, formatOptions = opts, fileSchema = Some(schema))
    assert(report.filesAfter < report.filesBefore)
    // compaction must neither fold header lines into data nor drop rows
    assert(readAll() === expected, "compaction corrupted csv content")
  }

  test("a hot partition value splits across several files when the batch is fat") {
    val base = java.nio.file.Files.createTempDirectory("graft_salt").toString
    val path = s"$base/hot"
    // one partition value owns every row; a fat batch vs a tiny
    // target must still spread across writers (salted repartition)
    val fat = spark.range(0, 20000).select(col("id").as("k"),
      lit("hot").as("p"), concat(lit("payload-"), col("id")).as("v"))
    RollingFileSink.writeRolled(fat, path, "parquet",
      targetFileBytes = 64 << 10, partitionKeys = Seq("p"))
    val files = dataFiles(path)
    assert(files.map(_.getParentFile.getName).toSet === Set("p=hot"))
    assert(files.length > 1,
      s"hot partition wrote ${files.length} file(s) — salt not applied")
    // content intact
    assert(spark.read.parquet(path).count() === 20000)
  }

  test("files at or above the target are left alone") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact2").toString
    val path = s"$base/t"
    (1 to 3).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("k", "v").write.mode("append").parquet(path)
    }
    val sizes = dataFiles(path).map(_.length)
    // target below every file size -> nothing is "small" -> no rewrite
    val report = RollingFileSink.compact(spark, path, "parquet",
      targetFileBytes = sizes.min - 1)
    assert(report.filesAfter === report.filesBefore)
  }

  test("DDL-wired rolling sink: streaming appends roll and auto-compact per table options") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.catalog.GraftCatalog
    val base = java.nio.file.Files.createTempDirectory("graft_roll_ddl").toString
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE roll_sink (k BIGINT, p STRING, v STRING)
         |PARTITIONED BY (p) WITH (
         |  'connector' = 'filesystem', 'path' = '$base/t', 'format' = 'parquet',
         |  'sink.rolling-policy.file-size' = '32mb',
         |  'auto-compaction' = 'true', 'compaction.every' = '2')""".stripMargin)
    val input = MemoryStream[(Long, String, String)](84, spark, None)
    val q = input.toDS().toDF("k", "p", "v")
      .writeStream.outputMode("append")
      .foreachBatch(GraftCatalog.rollingSink("roll_sink"))
      .start()
    try {
      // 3 micro-batches; batch 2 triggers the compaction pass
      (1 to 3).foreach { i =>
        input.addData((i.toLong, "x", s"v$i"), (i.toLong, "y", s"v$i"))
        q.processAllAvailable()
      }
      val got = spark.read.parquet(s"$base/t").select("k", "p", "v")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got === (1 to 3).flatMap(i =>
        Seq((i.toLong, "x", s"v$i"), (i.toLong, "y", s"v$i"))).toSet)
      // batches 0..2 appended 2 files each per partition value at most,
      // and the batch-2 compaction folded the small ones: strictly
      // fewer files than the 6 uncompacted appends would leave
      assert(dataFiles(s"$base/t").length < 6)
    } finally q.stop()
    GraftCatalog.executeDdl(spark, "DROP TABLE roll_sink")
  }
}
