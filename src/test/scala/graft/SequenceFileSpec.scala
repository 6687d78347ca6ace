package graft

import org.apache.spark.sql.functions._

import graft.catalog.GraftCatalog

/** Hadoop SequenceFile DDL format (flink-sequence-file analog): K/V
  * round-trip through CREATE TABLE + INSERT OVERWRITE + read-back,
  * Writable type mapping, and the loud schema/append rejections.
  */
class SequenceFileSpec extends SparkSpec {

  private def fresh(tag: String): String = {
    val dir = new java.io.File(s"/tmp/graft_seqfile/$tag")
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(del)
      f.delete()
    }
    if (dir.exists()) del(dir)
    dir.getAbsolutePath
  }

  test("Text/Text pairs round-trip through the DDL table") {
    val path = fresh("text")
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE seq_t (k STRING, v STRING)
         |WITH ('connector' = 'filesystem', 'path' = '$path',
         |      'format' = 'sequence-file')""".stripMargin)
    try {
      GraftCatalog.insertInto(spark, "seq_t",
        Tables.load(spark, sfDir, "nation")
          .select(col("n_name").as("k"),
            col("n_nationkey").cast("string").as("v")),
        overwrite = true)
      val got = spark.table("seq_t").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      val want = Tables.load(spark, sfDir, "nation").collect()
        .map(r => (r.getString(r.fieldIndex("n_name")),
          String.valueOf(r.get(r.fieldIndex("n_nationkey"))))).toSet
      assert(got === want && got.nonEmpty)
      // the files really are SequenceFiles ("SEQ" magic)
      val part = new java.io.File(path).listFiles
        .filter(_.getName.startsWith("part-")).head
      val head = new Array[Byte](3)
      val in = new java.io.FileInputStream(part)
      try in.read(head) finally in.close()
      assert(new String(head, "US-ASCII") === "SEQ")
      // append is a whole-directory commit — rejected with reason
      import spark.implicits._
      val e = intercept[IllegalArgumentException] {
        GraftCatalog.insertInto(spark, "seq_t",
          Seq(("x", "y")).toDF("k", "v"), overwrite = false)
      }
      assert(e.getMessage.contains("append is not supported"))
    } finally GraftCatalog.executeDdl(spark, "DROP TABLE seq_t")
  }

  test("LongWritable keys and BytesWritable values map to BIGINT/BINARY") {
    val path = fresh("binary")
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE seq_b (k BIGINT, v BINARY)
         |WITH ('connector' = 'filesystem', 'path' = '$path',
         |      'format' = 'sequence-file')""".stripMargin)
    try {
      import spark.implicits._
      GraftCatalog.insertInto(spark, "seq_b",
        Seq((1L, Array[Byte](1, 2, 3)), (2L, Array.emptyByteArray))
          .toDF("k", "v"),
        overwrite = true)
      val got = spark.table("seq_b").collect()
        .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toSet
      assert(got === Set((1L, Seq[Byte](1, 2, 3)), (2L, Seq.empty[Byte])))
    } finally GraftCatalog.executeDdl(spark, "DROP TABLE seq_b")
  }

  test("'compression' writes a block-compressed SequenceFile that reads back identically") {
    val path = fresh("gz")
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE seq_gz (k STRING, v STRING)
         |WITH ('connector' = 'filesystem', 'path' = '$path',
         |      'format' = 'sequence-file', 'compression' = 'gzip')""".stripMargin)
    try {
      import spark.implicits._
      val rows = (1 to 100).map(i => (s"k$i", "v" * 50))
      GraftCatalog.insertInto(spark, "seq_gz", rows.toDF("k", "v"), overwrite = true)
      assert(spark.table("seq_gz").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet === rows.toSet)
      // the container header names the codec
      val part = new java.io.File(path).listFiles
        .filter(_.getName.startsWith("part-")).head
      val head = new Array[Byte](256)
      val in = new java.io.FileInputStream(part)
      try in.read(head) finally in.close()
      assert(new String(head, "ISO-8859-1").contains("GzipCodec"),
        "expected the codec name in the SequenceFile header")
      // unknown codec names fail loudly
      GraftCatalog.executeDdl(spark,
        s"""CREATE TABLE seq_badc (k STRING, v STRING)
           |WITH ('connector' = 'filesystem', 'path' = '$path/bad',
           |      'format' = 'sequence-file', 'compression' = 'zstd9')""".stripMargin)
      val e = intercept[RuntimeException] {
        GraftCatalog.insertInto(spark, "seq_badc",
          Seq(("a", "b")).toDF("k", "v"), overwrite = true)
      }
      assert(e.getMessage.contains("not a bundled Hadoop codec"))
      GraftCatalog.executeDdl(spark, "DROP TABLE seq_badc")
    } finally GraftCatalog.executeDdl(spark, "DROP TABLE seq_gz")
  }

  test("non-pair schemas and unmappable types fail loudly") {
    val e = intercept[IllegalArgumentException] {
      GraftCatalog.executeDdl(spark,
        """CREATE TABLE seq_bad (a STRING, b STRING, c STRING)
          |WITH ('connector' = 'filesystem', 'path' = '/tmp/graft_seqfile/bad',
          |      'format' = 'sequence-file')""".stripMargin)
      spark.table("seq_bad").collect()
    }
    assert(e.getMessage.contains("exactly 2"))
    GraftCatalog.executeDdl(spark, "DROP TABLE IF EXISTS seq_bad")
    val e2 = intercept[RuntimeException] {
      GraftCatalog.executeDdl(spark,
        """CREATE TABLE seq_bad2 (a STRING, b DOUBLE)
          |WITH ('connector' = 'filesystem', 'path' = '/tmp/graft_seqfile/bad2',
          |      'format' = 'sequence-file')""".stripMargin)
      spark.table("seq_bad2").collect()
    }
    assert(e2.getMessage.contains("Writable"))
    GraftCatalog.executeDdl(spark, "DROP TABLE IF EXISTS seq_bad2")
  }
}
