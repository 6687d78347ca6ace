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

  test("aggregates over generated event time") {
    val n = gen(2, 200)
      .groupBy(window(col("ts"), "1 minute"), col("key"))
      .agg(count(lit(1)))
      .count()
    assert(n > 0)
  }
}
