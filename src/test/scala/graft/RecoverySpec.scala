package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Stop/restart recovery — the reference's savepoint-resume loop on
  * Spark terms: a streaming query's checkpoint IS its savepoint, so a
  * restart against the same checkpoint must (a) not reprocess input
  * consumed before the stop, (b) pick up input that arrived while
  * down, (c) restore operator state (running aggregation) exactly.
  */
class RecoverySpec extends SparkSpec {

  test("file-source pipeline resumes from its checkpoint exactly-once after a restart") {
    val base = java.nio.file.Files.createTempDirectory("graft_recover").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    new java.io.File(in).mkdirs()
    import spark.implicits._
    val schema = StructType.fromDDL("id BIGINT, v STRING")

    def start() = spark.readStream.schema(schema).parquet(in)
      .withColumn("vlen", length(col("v")))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    Seq((1L, "a"), (2L, "bb")).toDF("id", "v").write.mode("append").parquet(in)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).count() === 2)

    // input lands while the query is DOWN; the restart must consume
    // exactly the delta — no reprocessing of files 1-2
    Seq((3L, "ccc")).toDF("id", "v").write.mode("append").parquet(in)
    val q2 = start()
    try {
      q2.processAllAvailable()
      val rows = spark.read.parquet(out)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      assert(rows === Set((1L, "a", 1), (2L, "bb", 2), (3L, "ccc", 3)),
        s"restart broke exactly-once: $rows")
    } finally q2.stop()
  }

  test("stateful aggregation state survives the restart (complete-mode counts)") {
    val base = java.nio.file.Files.createTempDirectory("graft_recover2").toString
    val in = s"$base/in"; val ckpt = s"$base/ckpt"
    new java.io.File(in).mkdirs()
    import spark.implicits._
    val schema = StructType.fromDDL("k STRING, n BIGINT")

    def start(sinkName: String) = spark.readStream.schema(schema).parquet(in)
      .groupBy(col("k")).agg(sum(col("n")).as("total"))
      .writeStream.format("memory").queryName(sinkName)
      .option("checkpointLocation", ckpt).outputMode("complete").start()

    Seq(("a", 1L), ("a", 2L), ("b", 10L)).toDF("k", "n")
      .write.mode("append").parquet(in)
    val q1 = start("rec_agg_1")
    try q1.processAllAvailable() finally q1.stop()

    Seq(("a", 4L)).toDF("k", "n").write.mode("append").parquet(in)
    val q2 = start("rec_agg_2")
    try {
      q2.processAllAvailable()
      // the restored aggregation must carry the pre-restart sums:
      // a = 1+2 (+4 after restart) = 7, b = 10 — NOT just the delta
      val got = spark.table("rec_agg_2").collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got === Map("a" -> 7L, "b" -> 10L), got.toString)
    } finally q2.stop()
  }
}
