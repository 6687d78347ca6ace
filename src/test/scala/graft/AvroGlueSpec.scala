package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{AvroGlueCodec, AvroGlueFormat, FakeGlueRegistry}

/** AWS Glue schema-registry envelope: framing bytes, zlib body,
  * round-trip, evolution, corrupt-payload rejection.
  */
class AvroGlueSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  private def opts(name: String, comp: String = "NONE") = Map(
    "avro-glue.registry" -> s"fake://$name", "avro-glue.compression" -> comp)

  test("wire framing: header version 3, compression byte, UUID round-trips") {
    val id = java.util.UUID.fromString("12345678-9abc-def0-1122-334455667788")
    val body = Array[Byte](1, 2, 3, 4, 5)
    val plain = AvroGlueCodec.frame(id, body, zlib = false)
    assert(plain(0) == 3 && plain(1) == 0 && plain.length == 23)
    val (gotId, gotBody) = AvroGlueCodec.unframe(plain)
    assert(gotId == id && gotBody.toSeq == body.toSeq)
    val z = AvroGlueCodec.frame(id, Array.fill[Byte](1000)(7), zlib = true)
    assert(z(1) == 5 && z.length < 1018) // compressed smaller than raw
    val (zid, zbody) = AvroGlueCodec.unframe(z)
    assert(zid == id && zbody.length == 1000 && zbody.forall(_ == 7))
  }

  test("encode-decode round-trip, plain and zlib") {
    for (comp <- Seq("NONE", "ZLIB")) {
      val o = opts(s"rt-$comp", comp)
      val df = Seq((1L, "a", 0.5), (2L, "b", 1.5)).toDF("id", "name", "score")
      val out = df
        .select(AvroGlueFormat.encode(struct(col("id"), col("name"), col("score")),
          schema, o, "t1").as("p"))
        .select(AvroGlueFormat.decode(col("p"), schema, o).as("m"))
        .select("m.id", "m.name", "m.score")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(out == Set((1L, "a", 0.5), (2L, "b", 1.5)), s"comp=$comp")
    }
  }

  test("schema evolution: reader with extra defaulted field, writer extra dropped") {
    val o = opts("evolve")
    val writerSchema = schema
    val readerSchema = StructType(Seq(
      StructField("id", LongType), StructField("score", DoubleType),
      StructField("extra", StringType))) // not written -> null default
    val out = Seq((9L, "x", 2.5)).toDF("id", "name", "score")
      .select(AvroGlueFormat.encode(struct(col("id"), col("name"), col("score")),
        writerSchema, o, "t2").as("p"))
      .select(AvroGlueFormat.decode(col("p"), readerSchema, o).as("m"))
      .select("m.id", "m.score", "m.extra")
      .collect().head
    assert(out.getLong(0) == 9L && out.getDouble(1) == 2.5 && out.isNullAt(2))
  }

  test("corrupt payloads fail loudly; unknown version id names the registry") {
    val o = opts("bad")
    def decodeBytes(b: Array[Byte]) =
      Seq(Tuple1(b)).toDF("p")
        .select(AvroGlueFormat.decode(col("p"), schema, o).as("m"))
        .collect()
    val e1 = intercept[Exception](decodeBytes(Array[Byte](9, 0, 1)))
    assert(e1.getMessage != null)
    val e2 = intercept[Exception](decodeBytes(
      Array[Byte](3, 0) ++ Array.fill[Byte](16)(0x11) ++ Array[Byte](1)))
    assert(e2.getMessage.contains("glue registry") ||
      e2.getCause != null && e2.getCause.getMessage.contains("glue registry"))
    FakeGlueRegistry.clear("fake://bad")
  }

  test("kafka value format avro-glue round-trips through the DDL table") {
    import graft.catalog.GraftCatalog
    import graft.sources.{AvroGlueEncode, KafkaTableFactory}
    import graft.sources.KafkaTableFactory.{FakeWire, SparkKafkaWire}
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.Row
    import org.apache.spark.unsafe.types.UTF8String
    val url = "fake://glue-kafka-spec"
    val kschema = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    val enc = AvroGlueEncode(
      org.apache.spark.sql.graft.ColumnBridge.expression(lit(1)),
      kschema, url, "t", zlib = true)
    def payload(id: Long, v: String): Array[Byte] =
      enc.nullSafeEval(new GenericInternalRow(
        Array[Any](id, UTF8String.fromString(v)))).asInstanceOf[Array[Byte]]
    val data = Seq((null: Array[Byte], payload(1L, "a"), 0, 0L),
      (null: Array[Byte], payload(2L, "b"), 0, 1L))
    val log = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map { case (k, v, p, o) =>
        Row(k, v, "t", p, o, new java.sql.Timestamp(1700000000000L + o), 0)
      }), KafkaTableFactory.RecordSchema)
    GraftCatalog.setKafkaWire(new FakeWire(() => log))
    try {
      GraftCatalog.executeDdl(spark,
        s"""CREATE TABLE k_glue (id BIGINT, v STRING)
           |WITH ('connector' = 'kafka', 'topic' = 't',
           |  'properties.bootstrap.servers' = 'broker:9092',
           |  'format' = 'avro-glue',
           |  'avro-glue.registry' = '$url',
           |  'avro-glue.compression' = 'ZLIB')""".stripMargin)
      assert(spark.table("k_glue").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet === Set((1L, "a"), (2L, "b")))
      GraftCatalog.executeDdl(spark, "DROP TABLE k_glue")
    } finally GraftCatalog.setKafkaWire(SparkKafkaWire)
  }

  test("http endpoints are rejected with a reasoned message") {
    val e = intercept[Exception] {
      Seq(Tuple1(Array[Byte](3, 0) ++ Array.fill[Byte](16)(0x22))).toDF("p")
        .select(AvroGlueFormat.decode(col("p"), schema,
          Map("avro-glue.registry" -> "https://glue.example.com")).as("m"))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("environmental residue")))
  }
}
