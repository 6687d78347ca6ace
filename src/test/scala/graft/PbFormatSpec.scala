package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.GraftCatalog
import graft.sources.{KafkaTableFactory, PbCodec, PbFieldSpec, PbFormat}
import graft.sources.KafkaTableFactory.{FakeWire, SparkKafkaWire}

/** Protobuf wire-format codec (jar-less flink-protobuf analog):
  * golden bytes from the published encoding spec, proto3 defaults,
  * unknown-field skipping, negative varints, and the kafka value
  * format over a fake wire.
  */
class PbFormatSpec extends SparkSpec {

  private def row(vs: Any*) =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vs.toArray)

  test("golden bytes match the published encoding examples") {
    // protobuf.dev encoding guide: message Test1 { int32 a = 1; }
    // with a = 150 encodes as 08 96 01
    val int1 = Array(PbFieldSpec(1, IntegerType))
    assert(PbCodec.encode(row(150), int1).toSeq ===
      Seq[Byte](0x08, 0x96.toByte, 0x01))
    // message Test2 { string b = 2; } with b = "testing":
    // 12 07 74 65 73 74 69 6e 67
    val str2 = Array(PbFieldSpec(2, StringType))
    assert(PbCodec.encode(
      row(org.apache.spark.unsafe.types.UTF8String.fromString("testing")), str2).toSeq
      === Seq[Byte](0x12, 0x07, 0x74, 0x65, 0x73, 0x74, 0x69, 0x6e, 0x67))
  }

  test("negative int32 sign-extends to ten varint bytes, like the spec") {
    val specs = Array(PbFieldSpec(1, IntegerType))
    val enc = PbCodec.encode(row(-2), specs)
    assert(enc.length === 11) // 1 tag byte + 10 varint bytes
    assert(PbCodec.decode(enc, specs).getInt(0) === -2)
  }

  test("every supported type round-trips; absent fields read proto3 defaults") {
    val specs = Array(
      PbFieldSpec(1, LongType), PbFieldSpec(2, IntegerType),
      PbFieldSpec(3, DoubleType), PbFieldSpec(4, FloatType),
      PbFieldSpec(5, BooleanType), PbFieldSpec(6, StringType),
      PbFieldSpec(7, BinaryType))
    val u = org.apache.spark.unsafe.types.UTF8String.fromString("héllo")
    val enc = PbCodec.encode(
      row(-9876543210L, 42, 2.5d, -1.5f, true, u, Array[Byte](9, 8)), specs)
    val dec = PbCodec.decode(enc, specs)
    assert(dec.getLong(0) === -9876543210L)
    assert(dec.getInt(1) === 42)
    assert(dec.getDouble(2) === 2.5d)
    assert(dec.getFloat(3) === -1.5f)
    assert(dec.getBoolean(4))
    assert(dec.getUTF8String(5).toString === "héllo")
    assert(dec.getBinary(6).toSeq === Seq[Byte](9, 8))
    // null fields are omitted on the wire and decode as proto3 defaults
    val enc2 = PbCodec.encode(row(null, null, null, null, null, null, null), specs)
    assert(enc2.length === 0)
    val dec2 = PbCodec.decode(enc2, specs)
    assert(dec2.getLong(0) === 0L && dec2.getInt(1) === 0)
    assert(dec2.getDouble(2) === 0.0d && !dec2.getBoolean(4))
    assert(dec2.getUTF8String(5).toString === "")
  }

  test("a narrower reader skips unknown fields by wire type (forward compat)") {
    val writer = Array(
      PbFieldSpec(1, LongType), PbFieldSpec(2, StringType),
      PbFieldSpec(3, DoubleType), PbFieldSpec(4, FloatType))
    val reader = Array(PbFieldSpec(1, LongType)) // drops 2 (len-delim), 3 (fixed64), 4 (fixed32)
    val enc = PbCodec.encode(
      row(7L, org.apache.spark.unsafe.types.UTF8String.fromString("zzz"), 1.5d, 2.5f),
      writer)
    assert(PbCodec.decode(enc, reader).getLong(0) === 7L)
  }

  test("field-number overrides and validation") {
    val schema = StructType.fromDDL("a BIGINT, b STRING")
    val specs = PbCodec.fieldSpecs(schema, Map("protobuf.field-numbers" -> "3, 7"))
    assert(specs.map(_.number).toSeq === Seq(3, 7))
    intercept[IllegalArgumentException](
      PbCodec.fieldSpecs(schema, Map("protobuf.field-numbers" -> "1")))
    intercept[IllegalArgumentException](
      PbCodec.fieldSpecs(schema, Map("protobuf.field-numbers" -> "2, 2")))
    // shapes proto cannot express directly (wrapper-message rule)
    intercept[IllegalArgumentException](
      PbCodec.validate(StructType.fromDDL("a ARRAY<ARRAY<INT>>"), "t"))
    intercept[IllegalArgumentException](
      PbCodec.validate(StructType.fromDDL("a MAP<DOUBLE, INT>"), "t"))
    intercept[IllegalArgumentException](
      PbCodec.validate(StructType.fromDDL("a MAP<STRING, ARRAY<INT>>"), "t"))
  }

  test("nested message golden bytes (encoding guide Test3)") {
    // message Test3 { Test1 c = 3; } with c.a = 150 → 1a 03 08 96 01
    val specs = Array(PbFieldSpec(3,
      StructType(Seq(StructField("a", IntegerType))),
      Array(PbFieldSpec(1, IntegerType))))
    val enc = PbCodec.encode(row(row(150)), specs)
    assert(enc.toSeq === Seq[Byte](0x1a, 0x03, 0x08, 0x96.toByte, 0x01))
    val dec = PbCodec.decode(enc, specs)
    assert(dec.getStruct(0, 1).getInt(0) === 150)
    // absent nested message decodes as null (proto3 'not set')
    assert(PbCodec.decode(Array.emptyByteArray, specs).isNullAt(0))
    // a corrupt nested length that overruns the slice fails LOUDLY
    // instead of silently reading the sibling fields' bytes
    val outer = Array(PbFieldSpec(3,
      StructType(Seq(StructField("s", StringType))),
      Array(PbFieldSpec(1, StringType))), PbFieldSpec(4, LongType))
    // field 3: submessage claiming an inner string of 200 bytes
    val corrupt = Array[Byte](0x1a, 0x04, 0x0a, 200.toByte, 0x01, 0x00, 0x20, 0x07)
    val e = intercept[IllegalArgumentException](PbCodec.decode(corrupt, outer))
    assert(e.getMessage.contains("overruns"))
  }

  test("packed repeated golden bytes (encoding guide Test4) + unpacked accepted") {
    // message Test4 { repeated int32 d = 4; } with d = [3, 270, 86942]
    // → 22 06 03 8e 02 9e a7 05 (proto3 packed default)
    val specs = Array(PbFieldSpec(4, ArrayType(IntegerType)))
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](3, 270, 86942))
    val enc = PbCodec.encode(row(arr), specs)
    assert(enc.toSeq === Seq[Byte](0x22, 0x06, 0x03, 0x8e.toByte, 0x02,
      0x9e.toByte, 0xa7.toByte, 0x05))
    assert(PbCodec.decode(enc, specs).getArray(0).toIntArray().toSeq === Seq(3, 270, 86942))
    // the spec requires parsers to accept the UNPACKED form too:
    // three '20 <varint>' records with the same field number
    val unpacked = Array[Byte](0x20, 0x03, 0x20, 0x8e.toByte, 0x02,
      0x20, 0x9e.toByte, 0xa7.toByte, 0x05)
    assert(PbCodec.decode(unpacked, specs).getArray(0).toIntArray().toSeq ===
      Seq(3, 270, 86942))
    // absent repeated decodes as EMPTY (proto3), not null
    val empty = PbCodec.decode(Array.emptyByteArray, specs)
    assert(!empty.isNullAt(0) && empty.getArray(0).numElements() === 0)
    // packed booleans: [true, false, true] under field 4 → 22 03 01 00 01
    val bSpecs = Array(PbFieldSpec(4, ArrayType(BooleanType)))
    val bEnc = PbCodec.encode(row(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](true, false, true))), bSpecs)
    assert(bEnc.toSeq === Seq[Byte](0x22, 0x03, 0x01, 0x00, 0x01))
    assert(PbCodec.decode(bEnc, bSpecs).getArray(0).toBooleanArray().toSeq ===
      Seq(true, false, true))
    // packed doubles round-trip through fixed64 runs
    val dSpecs = Array(PbFieldSpec(5, ArrayType(DoubleType)))
    val dEnc = PbCodec.encode(row(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](1.5d, -2.25d))), dSpecs)
    assert(PbCodec.decode(dEnc, dSpecs).getArray(0).toDoubleArray().toSeq ===
      Seq(1.5d, -2.25d))
  }

  test("map fields use the published entry encoding; duplicate keys last-wins") {
    // map<string,int32> g = 7 with {"k": 1} → entry {1:"k", 2:1} =
    // 0a 01 6b 10 01, framed 3a 05 ...
    val mt = MapType(StringType, IntegerType)
    val specs = PbCodec.fieldSpecs(StructType(Seq(StructField("g", mt))), Map.empty)
      .map(s => s.copy(number = 7))
    val u = org.apache.spark.unsafe.types.UTF8String.fromString _
    val m = org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      Array[Any](u("k")), Array[Any](1))
    val enc = PbCodec.encode(row(m), specs)
    assert(enc.toSeq === Seq[Byte](0x3a, 0x05, 0x0a, 0x01, 0x6b, 0x10, 0x01))
    val dec = PbCodec.decode(enc, specs).getMap(0)
    assert(dec.numElements() === 1)
    assert(dec.keyArray().getUTF8String(0).toString === "k")
    assert(dec.valueArray().getInt(0) === 1)
    // two entries with the same key: the LAST value wins
    val dup = enc ++ Array[Byte](0x3a, 0x05, 0x0a, 0x01, 0x6b, 0x10, 0x09)
    val dm = PbCodec.decode(dup, specs).getMap(0)
    assert(dm.numElements() === 1 && dm.valueArray().getInt(0) === 9)
    // absent map decodes as EMPTY
    assert(PbCodec.decode(Array.emptyByteArray, specs).getMap(0).numElements() === 0)
    // a null map VALUE encodes as an entry without field 2 → reads
    // back as the value type's proto3 default
    val mNull = org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      Array[Any](u("n")), Array[Any](null))
    val dn = PbCodec.decode(PbCodec.encode(row(mNull), specs), specs).getMap(0)
    assert(dn.numElements() === 1 && dn.valueArray().getInt(0) === 0)
    // null REPEATED elements have no wire form — rejected loudly
    val rSpec = Array(PbFieldSpec(1, ArrayType(IntegerType)))
    val withNull = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](1, null, 3))
    val e = intercept[RuntimeException](PbCodec.encode(row(withNull), rSpec))
    assert(e.getMessage.contains("null array elements"))
  }

  test("nested/repeated/map round-trip through codegen'd column expressions") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("addr", StructType(Seq(
        StructField("city", StringType), StructField("zip", IntegerType)))),
      StructField("tags", ArrayType(StringType)),
      StructField("scores", ArrayType(DoubleType)),
      StructField("items", ArrayType(StructType(Seq(
        StructField("sku", StringType), StructField("qty", LongType))))),
      StructField("attrs", MapType(StringType, LongType))))
    import org.apache.spark.sql.functions.{array, map, struct, lit}
    val src = Tables.load(spark, sfDir, "lineitem").limit(200)
      .select(
        col("l_orderkey").cast("long").as("id"),
        struct(col("l_returnflag").as("city"),
          col("l_linenumber").cast("int").as("zip")).as("addr"),
        array(col("l_returnflag"), col("l_linestatus")).as("tags"),
        array(col("l_quantity").cast("double"),
          col("l_extendedprice").cast("double")).as("scores"),
        array(struct(col("l_linestatus").as("sku"),
          col("l_linenumber").cast("long").as("qty"))).as("items"),
        map(lit("flag"), col("l_orderkey").cast("long"),
          lit("line"), col("l_linenumber").cast("long")).as("attrs"))
    val back = src.select(PbFormat.decode(
        PbFormat.encode(struct(src.columns.map(col).toSeq: _*), schema, Map.empty),
        schema, Map.empty).as("m"), col("id"), col("addr"), col("tags"),
        col("scores"), col("items"), col("attrs"))
    val n = back.filter(
        col("m.id") === col("id") && col("m.addr") === col("addr") &&
        col("m.tags") === col("tags") && col("m.scores") === col("scores") &&
        col("m.items") === col("items") &&
        col("m.attrs")("flag") === col("attrs")("flag") &&
        col("m.attrs")("line") === col("attrs")("line"))
      .count()
    assert(n === 200)
  }

  test("expressions: encode/decode identity under codegen over lineitem") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("rf", StringType)))
    val li = Tables.load(spark, sfDir, "lineitem").limit(300)
    val n = li.select(
        PbFormat.decode(PbFormat.encode(
          struct(col("l_orderkey").cast("long").as("k"), col("l_returnflag").as("rf")),
          schema, Map.empty), schema, Map.empty).as("m"),
        col("l_orderkey"), col("l_returnflag"))
      .filter(col("m.k") === col("l_orderkey") && col("m.rf") === col("l_returnflag"))
      .count()
    assert(n === 300)
  }

  test("kafka value format protobuf decodes records through the DDL table") {
    val specs = Array(PbFieldSpec(1, LongType), PbFieldSpec(2, StringType))
    def pb(id: Long, v: String) = PbCodec.encode(
      row(id, org.apache.spark.unsafe.types.UTF8String.fromString(v)), specs)
    val data = Seq((null: Array[Byte], pb(1L, "a"), 0, 0L),
      (null: Array[Byte], pb(2L, "b"), 0, 1L))
    val log = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map { case (k, v, p, o) =>
        Row(k, v, "t", p, o, new java.sql.Timestamp(1700000000000L + o), 0)
      }), KafkaTableFactory.RecordSchema)
    GraftCatalog.setKafkaWire(new FakeWire(() => log))
    try {
      GraftCatalog.executeDdl(spark,
        """CREATE TABLE k_pb (id BIGINT, v STRING)
          |WITH ('connector' = 'kafka', 'topic' = 't',
          |  'properties.bootstrap.servers' = 'broker:9092',
          |  'format' = 'protobuf')""".stripMargin)
      assert(spark.table("k_pb").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet === Set((1L, "a"), (2L, "b")))
      GraftCatalog.executeDdl(spark, "DROP TABLE k_pb")
    } finally GraftCatalog.setKafkaWire(SparkKafkaWire)
  }

  test("kafka DDL table decodes COMPOSITE protobuf columns (ROW/ARRAY/MAP)") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("addr", StructType(Seq(
        StructField("city", StringType), StructField("zip", IntegerType)))),
      StructField("tags", ArrayType(StringType)),
      StructField("attrs", MapType(StringType, LongType))))
    val specs = PbCodec.fieldSpecs(schema, Map.empty)
    val u = org.apache.spark.unsafe.types.UTF8String.fromString _
    def payload(id: Long, city: String, zip: Int, tags: Seq[String],
        attrs: Map[String, Long]): Array[Byte] =
      PbCodec.encode(row(id, row(u(city), zip),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          tags.map(u(_): Any).toArray),
        org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
          attrs.keys.map(u(_): Any).toArray, attrs.values.map(Long.box(_): Any).toArray)),
        specs)
    val data = Seq(
      (null: Array[Byte], payload(1L, "oslo", 1234, Seq("x", "y"), Map("k" -> 7L)), 0, 0L),
      (null: Array[Byte], payload(2L, "pune", 9, Nil, Map.empty[String, Long]), 0, 1L))
    val log = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map { case (k, v, p, o) =>
        Row(k, v, "t", p, o, new java.sql.Timestamp(1700000000000L + o), 0)
      }), KafkaTableFactory.RecordSchema)
    GraftCatalog.setKafkaWire(new FakeWire(() => log))
    try {
      GraftCatalog.executeDdl(spark,
        """CREATE TABLE k_pb_nested (
          |  id BIGINT,
          |  addr ROW<city STRING, zip INT>,
          |  tags ARRAY<STRING>,
          |  attrs MAP<STRING, BIGINT>
          |) WITH ('connector' = 'kafka', 'topic' = 't',
          |  'properties.bootstrap.servers' = 'broker:9092',
          |  'format' = 'protobuf')""".stripMargin)
      val got = spark.table("k_pb_nested").orderBy("id").collect()
      assert(got.length === 2)
      assert(got(0).getAs[Row]("addr").getString(0) === "oslo")
      assert(got(0).getAs[Row]("addr").getInt(1) === 1234)
      assert(got(0).getAs[scala.collection.Seq[String]]("tags").toSeq === Seq("x", "y"))
      assert(got(0).getAs[scala.collection.Map[String, Long]]("attrs").toMap === Map("k" -> 7L))
      // absent composites decode to proto3 defaults: empty, not null
      assert(got(1).getAs[scala.collection.Seq[String]]("tags").isEmpty)
      assert(got(1).getAs[scala.collection.Map[String, Long]]("attrs").isEmpty)
      GraftCatalog.executeDdl(spark, "DROP TABLE k_pb_nested")
    } finally GraftCatalog.setKafkaWire(SparkKafkaWire)
  }
}
