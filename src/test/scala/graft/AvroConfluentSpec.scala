package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.GraftCatalog
import graft.sources.{AvroConfluentCodec, AvroConfluentFormat, AvroFormat,
  FakeRegistry, FakeRegistryClient, KafkaTableFactory, RegistryClients}
import graft.sources.KafkaTableFactory.{FakeWire, SparkKafkaWire}

/** Confluent Schema Registry avro envelope (jar-less
  * flink-avro-confluent-registry analog): 5-byte magic+id framing,
  * registry-resolved writer schemas, avro schema-resolution evolution,
  * and the kafka value format over a fake wire + fake registry.
  */
class AvroConfluentSpec extends SparkSpec {

  private val url = "fake://avro-confluent-spec"


  test("envelope framing: magic 0x00 + int32 BE schema id") {
    val body = Array[Byte](1, 2, 3)
    val framed = AvroConfluentCodec.frame(0x01020304, body)
    assert(framed.toSeq === Seq[Byte](0x00, 0x01, 0x02, 0x03, 0x04, 1, 2, 3))
    assert(AvroConfluentCodec.schemaId(framed) === 0x01020304)
    // wrong magic byte fails loudly, not as garbage rows
    val bad = framed.clone(); bad(0) = 0x7f
    val e = intercept[IllegalArgumentException](AvroConfluentCodec.schemaId(bad))
    assert(e.getMessage.contains("magic"))
    intercept[IllegalArgumentException](
      AvroConfluentCodec.schemaId(Array[Byte](0x00, 0x00)))
  }

  test("registry client: global ids per schema text, subject tracking, fake:// only") {
    val c = FakeRegistryClient(url)
    val s1 = AvroFormat.toAvroSchema(StructType.fromDDL("a BIGINT")).toString
    val s2 = AvroFormat.toAvroSchema(StructType.fromDDL("b STRING")).toString
    val id1 = c.register("t-value", s1)
    assert(c.register("t-value", s1) === id1) // idempotent
    assert(c.register("other-value", s1) === id1) // global per schema text
    assert(c.register("t-key", s2) !== id1)
    assert(c.schemaById(id1) === s1)
    assert(c.latestId("t-value") === Some(id1))
    assert(c.latestId("never-registered") === None)
    intercept[IllegalArgumentException](c.schemaById(9999))
    // http(s):// binds the real REST client (construction is lazy —
    // no socket until a call; SchemaRegistryHttpSpec drives the wire);
    // anything else still fails loudly
    assert(RegistryClients.forUrl("http://registry:8081")
      .isInstanceOf[graft.sources.HttpRegistryClient])
    val e = intercept[RuntimeException](
      RegistryClients.forUrl("bogus://registry"))
    assert(e.getMessage.contains("fake://"))
  }

  test("encode/decode round-trip through column expressions over lineitem") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("p", DoubleType),
      StructField("rf", StringType), StructField("ship", TimestampType)))
    val opts = Map("avro-confluent.url" -> url)
    val li = Tables.load(spark, sfDir, "lineitem").limit(300)
    val n = li.select(
        AvroConfluentFormat.decode(AvroConfluentFormat.encode(
          struct(col("l_orderkey").cast("long").as("k"),
            col("l_extendedprice").cast("double").as("p"),
            col("l_returnflag").as("rf"),
            col("l_shipdate").cast("timestamp").as("ship")),
          schema, opts, "", "t"), schema, opts).as("m"),
        col("l_orderkey"), col("l_extendedprice"), col("l_returnflag"),
        col("l_shipdate"))
      .filter(col("m.k") === col("l_orderkey") &&
        col("m.p") === col("l_extendedprice").cast("double") &&
        col("m.rf") === col("l_returnflag") &&
        col("m.ship") === col("l_shipdate").cast("timestamp"))
      .count()
    assert(n === 300)
  }

  test("schema evolution: reader drops writer-only fields and defaults missing ones") {
    // writer framed payloads with (a, b, c); the reader declares
    // (b, d) — b carries through resolution, d fills its null default
    val writerStruct = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("c", DoubleType)))
    val readerStruct = StructType(Seq(
      StructField("b", StringType), StructField("d", LongType)))
    val opts = Map("avro-confluent.url" -> url)
    import spark.implicits._
    val got = Seq((1L, "x", 0.5), (2L, "y", 1.5)).toDF("a", "b", "c")
      .select(AvroConfluentFormat.encode(
        struct(col("a"), col("b"), col("c")), writerStruct, opts, "", "evo").as("payload"))
      .select(AvroConfluentFormat.decode(col("payload"), readerStruct, opts).as("m"))
      .select(col("m.b"), col("m.d"))
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getLong(1)))
      .toSet
    assert(got === Set(("x", null), ("y", null)))
  }

  test("kafka value format avro-confluent decodes records through the DDL table") {
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    val avroSchema = AvroFormat.toAvroSchema(schema)
    val opts = Map("avro-confluent.url" -> url)
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    // frame payloads exactly as a Confluent producer would: register,
    // then magic+id+binary body
    val enc = graft.sources.AvroConfluentEncode(
      org.apache.spark.sql.graft.ColumnBridge.expression(lit(1)), schema, url, "t-value")
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
        s"""CREATE TABLE k_avro (id BIGINT, v STRING)
           |WITH ('connector' = 'kafka', 'topic' = 't',
           |  'properties.bootstrap.servers' = 'broker:9092',
           |  'format' = 'avro-confluent',
           |  'avro-confluent.url' = '$url')""".stripMargin)
      assert(spark.table("k_avro").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet === Set((1L, "a"), (2L, "b")))
      GraftCatalog.executeDdl(spark, "DROP TABLE k_avro")
    } finally GraftCatalog.setKafkaWire(SparkKafkaWire)
  }

  test("a foreign writer's record name resolves via reader alias") {
    import org.apache.avro.{Schema => ASchema}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.io.EncoderFactory
    // a producer that names its record com.acme.Event (not our
    // graft.avro.row) — same fields
    val writerSchema = new ASchema.Parser().parse(
      """{"type":"record","name":"Event","namespace":"com.acme","fields":[
        |{"name":"id","type":"long"},{"name":"v","type":["null","string"],"default":null}
        |]}""".stripMargin)
    val c = FakeRegistryClient(url)
    val id = c.register("foreign-value", writerSchema.toString)
    val rec = new GenericData.Record(writerSchema)
    rec.put(0, Long.box(42L)); rec.put(1, "zz")
    val out = new java.io.ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](writerSchema).write(rec, enc)
    enc.flush()
    val payload = AvroConfluentCodec.frame(id, out.toByteArray)
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    import spark.implicits._
    val got = Seq(payload).toDF("p")
      .select(AvroConfluentFormat.decode(col("p"), schema,
        Map("avro-confluent.url" -> url)).as("m"))
      .select(col("m.id"), col("m.v")).collect()
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((42L, "zz")))
  }

  test("upsert-kafka with avro-confluent key+value: last write wins, tombstone keys decode from the key envelope") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val keySchema = StructType(Seq(StructField("id", LongType)))
    val valSchema = StructType(Seq(StructField("v", StringType)))
    val kEnc = graft.sources.AvroConfluentEncode(
      org.apache.spark.sql.graft.ColumnBridge.expression(lit(1)), keySchema, url, "u-key")
    val vEnc = graft.sources.AvroConfluentEncode(
      org.apache.spark.sql.graft.ColumnBridge.expression(lit(1)), valSchema, url, "u-value")
    def k(id: Long) = kEnc.nullSafeEval(
      new GenericInternalRow(Array[Any](id))).asInstanceOf[Array[Byte]]
    def v(s0: String) = vEnc.nullSafeEval(new GenericInternalRow(
      Array[Any](UTF8String.fromString(s0)))).asInstanceOf[Array[Byte]]
    val data = Seq(
      (k(1L), v("a0"), 0, 0L), (k(2L), v("b0"), 0, 1L),
      (k(1L), v("a1"), 0, 2L), (k(1L), null: Array[Byte], 0, 3L)) // tombstone
    val log = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map { case (kk, vv, p, o) =>
        Row(kk, vv, "u", p, o, new java.sql.Timestamp(1700000000000L + o), 0)
      }), KafkaTableFactory.RecordSchema)
    GraftCatalog.setKafkaWire(new FakeWire(() => log))
    try {
      GraftCatalog.executeDdl(spark,
        s"""CREATE TABLE k_avro_up (id BIGINT, v STRING, PRIMARY KEY (id) NOT ENFORCED)
           |WITH ('connector' = 'upsert-kafka', 'topic' = 'u',
           |  'properties.bootstrap.servers' = 'broker:9092',
           |  'key.format' = 'avro-confluent', 'value.format' = 'avro-confluent',
           |  'avro-confluent.url' = '$url')""".stripMargin)
      // id=1 updated then tombstoned (key decoded from the ENVELOPE,
      // the value is null), id=2 live
      val got = spark.table("k_avro_up")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === Set((2L, "b0")))
      GraftCatalog.executeDdl(spark, "DROP TABLE k_avro_up")
    } finally GraftCatalog.setKafkaWire(SparkKafkaWire)
  }

  test("a foreign writer's NESTED record names resolve too (real debezium envelope shape)") {
    import org.apache.avro.{Schema => ASchema}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.io.EncoderFactory
    // what an actual Debezium producer registers: envelope named
    // dbserver1.inventory.customers.Envelope with before/after of a
    // nested record named Value — nothing matches our graft.avro names
    val writerSchema = new ASchema.Parser().parse(
      """{"type":"record","name":"Envelope","namespace":"dbserver1.inventory.customers",
        |"fields":[
        |{"name":"before","type":["null",{"type":"record","name":"Value","fields":[
        |  {"name":"id","type":"long"},{"name":"v","type":["null","string"],"default":null}]}],"default":null},
        |{"name":"after","type":["null","Value"],"default":null},
        |{"name":"op","type":["null","string"],"default":null}
        |]}""".stripMargin)
    val c = FakeRegistryClient(url)
    val id = c.register("nested-foreign", writerSchema.toString)
    val valueSchema = writerSchema.getField("before").schema().getTypes.get(1)
    val after = new GenericData.Record(valueSchema)
    after.put(0, Long.box(7L)); after.put(1, "nested")
    val rec = new GenericData.Record(writerSchema)
    rec.put("before", null); rec.put("after", after); rec.put("op", "c")
    val out = new java.io.ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](writerSchema).write(rec, enc)
    enc.flush()
    val payload = AvroConfluentCodec.frame(id, out.toByteArray)
    val physical = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    val envelope = StructType(Seq(
      StructField("before", physical), StructField("after", physical),
      StructField("op", StringType)))
    import spark.implicits._
    val got = Seq(payload).toDF("p")
      .select(AvroConfluentFormat.decode(col("p"), envelope,
        Map("avro-confluent.url" -> url)).as("m"))
      .select(col("m.after.id"), col("m.after.v"), col("m.op"), col("m.before"))
      .collect().head
    assert(got.getLong(0) === 7L)
    assert(got.getString(1) === "nested")
    assert(got.getString(2) === "c")
    assert(got.isNullAt(3))
  }

  test("debezium-avro-confluent: the avro-encoded changelog envelope routes to +I/-U/+U/-D") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val physical = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    val envelope = StructType(Seq(
      StructField("before", physical), StructField("after", physical),
      StructField("op", StringType)))
    val enc = graft.sources.AvroConfluentEncode(
      org.apache.spark.sql.graft.ColumnBridge.expression(lit(1)), envelope, url, "dbz-value")
    def img(id: Long, v: String) =
      new GenericInternalRow(Array[Any](id, UTF8String.fromString(v)))
    def rec(before: GenericInternalRow, after: GenericInternalRow, op: String) =
      enc.nullSafeEval(new GenericInternalRow(Array[Any](before, after,
        UTF8String.fromString(op)))).asInstanceOf[Array[Byte]]
    val data = Seq(
      (null: Array[Byte], rec(null, img(1L, "a"), "c"), 0, 0L),
      (null: Array[Byte], rec(img(1L, "a"), img(1L, "a2"), "u"), 0, 1L),
      (null: Array[Byte], rec(img(1L, "a2"), null, "d"), 0, 2L),
      (null: Array[Byte], null, 0, 3L)) // kafka tombstone: skipped
    val log = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map { case (k, v, p, o) =>
        Row(k, v, "dbz", p, o, new java.sql.Timestamp(1700000000000L + o), 0)
      }), KafkaTableFactory.RecordSchema)
    GraftCatalog.setKafkaWire(new FakeWire(() => log))
    try {
      GraftCatalog.executeDdl(spark,
        s"""CREATE TABLE k_dbz_avro (id BIGINT, v STRING)
           |WITH ('connector' = 'kafka', 'topic' = 'dbz',
           |  'properties.bootstrap.servers' = 'broker:9092',
           |  'format' = 'debezium-avro-confluent',
           |  'avro-confluent.url' = '$url')""".stripMargin)
      import graft.changelog.Changelog
      val got = spark.table("k_dbz_avro")
        .collect().map(r => (r.getByte(r.fieldIndex(Changelog.RowKindCol)),
          r.getLong(0), r.getString(1))).toSet
      assert(got === Set(
        (Changelog.Insert, 1L, "a"),
        (Changelog.UpdateBefore, 1L, "a"), (Changelog.UpdateAfter, 1L, "a2"),
        (Changelog.Delete, 1L, "a2")))
      // the format registers as a changelog declaration (normalize path)
      assert(GraftCatalog.cdcOf("k_dbz_avro").isDefined)
      GraftCatalog.executeDdl(spark, "DROP TABLE k_dbz_avro")
      // the 'value.format' spelling registers identically
      GraftCatalog.executeDdl(spark,
        s"""CREATE TABLE k_dbz_avro2 (id BIGINT, v STRING)
           |WITH ('connector' = 'kafka', 'topic' = 'dbz',
           |  'properties.bootstrap.servers' = 'broker:9092',
           |  'value.format' = 'debezium-avro-confluent',
           |  'avro-confluent.url' = '$url')""".stripMargin)
      assert(GraftCatalog.cdcOf("k_dbz_avro2").isDefined)
      GraftCatalog.executeDdl(spark, "DROP TABLE k_dbz_avro2")
    } finally GraftCatalog.setKafkaWire(SparkKafkaWire)
    // upsert-kafka + a changelog value format is rejected like the reference
    val t = KafkaTableFactory.translate(Map(
      "connector" -> "upsert-kafka", "topic" -> "dbz",
      "properties.bootstrap.servers" -> "broker:9092",
      "key.format" -> "json", "key.fields" -> "id",
      "value.format" -> "debezium-avro-confluent", "avro-confluent.url" -> url))
    val e = intercept[IllegalArgumentException](
      KafkaTableFactory.decode(spark.emptyDataFrame, physical, t))
    assert(e.getMessage.contains("insert-only"))
  }

  test("debezium-avro-confluent write half round-trips through the decoder") {
    import graft.changelog.Changelog
    val physical = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    val t = KafkaTableFactory.translate(Map(
      "connector" -> "kafka", "topic" -> "dbz-w",
      "properties.bootstrap.servers" -> "broker:9092",
      "format" -> "debezium-avro-confluent", "avro-confluent.url" -> url))
    import spark.implicits._
    // a changelog: insert, update (as -U/+U), delete
    val changelog = Seq(
      (1L, "a", Changelog.Insert), (1L, "a", Changelog.UpdateBefore),
      (1L, "a2", Changelog.UpdateAfter), (2L, "b", Changelog.Delete))
      .toDF("id", "v", Changelog.RowKindCol)
    val records = KafkaTableFactory.encode(changelog, physical, t)
    val asLog = records.select(col("key"), col("value"), lit("dbz-w").as("topic"),
      lit(0).as("partition"), monotonically_increasing_id().as("offset"),
      lit(new java.sql.Timestamp(1L)).as("timestamp"), lit(0).as("timestampType"))
    val decoded = KafkaTableFactory.decode(asLog, physical, t)
      .collect().map(r => (r.getByte(r.fieldIndex(Changelog.RowKindCol)),
        r.getLong(0), r.getString(1))).toSet
    // +I/+U become op c → +I; -U/-D become op d → -D (the json CDC
    // write half's documented delete+create update contract)
    assert(decoded === Set(
      (Changelog.Insert, 1L, "a"), (Changelog.Insert, 1L, "a2"),
      (Changelog.Delete, 1L, "a"), (Changelog.Delete, 2L, "b")))
  }

  test("kafka encode half frames every record with the registered id") {
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    val t = KafkaTableFactory.translate(Map(
      "connector" -> "kafka", "topic" -> "enc-t",
      "properties.bootstrap.servers" -> "broker:9092",
      "format" -> "avro-confluent", "avro-confluent.url" -> url))
    import spark.implicits._
    val encoded = KafkaTableFactory.encode(
      Seq((5L, "z")).toDF("id", "v"), schema, t).collect()
    assert(encoded.length === 1)
    val bytes = encoded.head.getAs[Array[Byte]]("value")
    val id = AvroConfluentCodec.schemaId(bytes)
    // the registry holds the schema this payload claims
    assert(FakeRegistryClient(url).schemaById(id).contains("\"id\""))
    // and the payload decodes back through the registry
    val decoded = KafkaTableFactory.decode(
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row(null, bytes, "enc-t", 0, 0L, new java.sql.Timestamp(1L), 0))),
        KafkaTableFactory.RecordSchema), schema, t).collect()
    assert(decoded.map(r => (r.getLong(0), r.getString(1))).toSet === Set((5L, "z")))
  }
}
