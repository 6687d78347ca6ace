package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.GraftCatalog
import graft.sources.{KafkaTableFactory, RawCodec, RawFormat}
import graft.sources.KafkaTableFactory.{FakeWire, SparkKafkaWire}

/** Raw format (flink-format-raw): codec primitives, the DDL
  * filesystem table (one file = one record), and the kafka value/key
  * integration over a fake wire.
  */
class RawFormatSpec extends SparkSpec {

  test("codec: every supported type round-trips, both endiannesses") {
    for (big <- Seq(true, false)) {
      assert(RawCodec.decodeLong(RawCodec.encodeLong(-987654321012345L, big), big)
        === -987654321012345L)
      assert(RawCodec.decodeInt(RawCodec.encodeInt(-42, big), big) === -42)
      assert(RawCodec.decodeShort(RawCodec.encodeShort(31000, big), big) === 31000)
      assert(RawCodec.decodeFloat(RawCodec.encodeFloat(3.5f, big), big) === 3.5f)
      assert(RawCodec.decodeDouble(RawCodec.encodeDouble(-2.25e100, big), big)
        === -2.25e100)
    }
    assert(RawCodec.decodeByte(RawCodec.encodeByte(-7)) === -7.toByte)
    assert(RawCodec.decodeBoolean(RawCodec.encodeBoolean(true)))
    assert(!RawCodec.decodeBoolean(RawCodec.encodeBoolean(false)))
    assert(RawCodec.decodeString(
      RawCodec.encodeString(org.apache.spark.unsafe.types.UTF8String
        .fromString("héllo ↯"), "UTF-8"), "UTF-8").toString === "héllo ↯")
    // big-endian int 1 is 00 00 00 01
    assert(RawCodec.encodeInt(1, true).toSeq === Seq[Byte](0, 0, 0, 1))
    assert(RawCodec.encodeInt(1, false).toSeq === Seq[Byte](1, 0, 0, 0))
  }

  test("codec: wrong payload width fails loudly, like the reference deserializer") {
    val e = intercept[IllegalArgumentException](
      RawCodec.decodeLong(Array[Byte](1, 2, 3), big = true))
    assert(e.getMessage.contains("8 bytes"))
  }

  test("expressions: encode/decode identity holds under codegen over a real column") {
    val o = RawFormat.options(Map.empty)
    val li = Tables.load(spark, sfDir, "lineitem").limit(500)
    val n = li.select(
        RawFormat.decode(RawFormat.encode(col("l_orderkey"), o), LongType, o).as("rk"),
        col("l_orderkey"))
      .filter(col("rk") === col("l_orderkey")).count()
    assert(n === 500)
  }

  test("little-endian option decodes reversed bytes") {
    val o = RawFormat.options(Map("raw.endianness" -> "little-endian"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Array[Byte](1, 0, 0, 0)))),
      StructType(Seq(StructField("b", BinaryType))))
    assert(df.select(RawFormat.decode(col("b"), IntegerType, o).as("v"))
      .first().getInt(0) === 1)
    intercept[IllegalArgumentException](
      RawFormat.options(Map("raw.endianness" -> "middle-endian")))
  }

  test("schema validation: exactly one physical column of a supported type") {
    val two = StructType.fromDDL("a INT, b STRING")
    val e = intercept[IllegalArgumentException](RawFormat.singleField(two, "t"))
    assert(e.getMessage.contains("exactly one"))
    val arr = StructType.fromDDL("a ARRAY<INT>")
    val e2 = intercept[IllegalArgumentException](RawFormat.singleField(arr, "t"))
    assert(e2.getMessage.contains("does not support"))
  }

  test("filesystem raw DDL table: one file = one record; INSERT rejected") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rawspec").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "a.bin"), "alpha".getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "b.bin"), "βeta".getBytes("UTF-8"))
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE raw_spec_t (body STRING)
         |WITH ('connector' = 'filesystem', 'path' = '$dir',
         |  'format' = 'raw')""".stripMargin)
    assert(spark.table("raw_spec_t").collect().map(_.getString(0)).sorted.toSeq
      === Seq("alpha", "βeta"))
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      GraftCatalog.insertInto(spark, "raw_spec_t",
        Seq("x").toDF("body"), overwrite = false)
    }
    assert(e.getMessage.contains("one record per"))
    GraftCatalog.executeDdl(spark, "DROP TABLE raw_spec_t")
  }

  private def recordsDf(rows: Seq[(Array[Byte], Array[Byte], Int, Long)]) = {
    val data = rows.map { case (k, v, p, o) =>
      Row(k, v, "t", p, o, new java.sql.Timestamp(1700000000000L + o), 0)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data), KafkaTableFactory.RecordSchema)
  }

  test("kafka value format raw: payload bytes become the single column") {
    val log = recordsDf(Seq(
      (null, RawCodec.encodeLong(7L, big = true), 0, 0L),
      (null, RawCodec.encodeLong(-3L, big = true), 0, 1L)))
    GraftCatalog.setKafkaWire(new FakeWire(() => log))
    try {
      GraftCatalog.executeDdl(spark,
        """CREATE TABLE k_raw (v BIGINT)
          |WITH ('connector' = 'kafka', 'topic' = 't',
          |  'properties.bootstrap.servers' = 'broker:9092',
          |  'format' = 'raw')""".stripMargin)
      assert(spark.table("k_raw").collect().map(_.getLong(0)).sorted.toSeq
        === Seq(-3L, 7L))
      GraftCatalog.executeDdl(spark, "DROP TABLE k_raw")
    } finally GraftCatalog.setKafkaWire(SparkKafkaWire)
  }

  test("upsert-kafka with raw key + json value: tombstone deletes through the raw key") {
    val log = recordsDf(Seq(
      (RawCodec.encodeLong(1L, big = true), """{"v":"a0"}""".getBytes("UTF-8"), 0, 0L),
      (RawCodec.encodeLong(2L, big = true), """{"v":"b0"}""".getBytes("UTF-8"), 0, 1L),
      (RawCodec.encodeLong(1L, big = true), null, 0, 2L))) // tombstone id=1
    GraftCatalog.setKafkaWire(new FakeWire(() => log))
    try {
      GraftCatalog.executeDdl(spark,
        """CREATE TABLE k_rawkey (id BIGINT, v STRING, PRIMARY KEY (id) NOT ENFORCED)
          |WITH ('connector' = 'upsert-kafka', 'topic' = 't',
          |  'properties.bootstrap.servers' = 'broker:9092',
          |  'key.format' = 'raw', 'value.format' = 'json')""".stripMargin)
      assert(spark.table("k_rawkey").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet === Set((2L, "b0")))
      GraftCatalog.executeDdl(spark, "DROP TABLE k_rawkey")
    } finally GraftCatalog.setKafkaWire(SparkKafkaWire)
  }
}
