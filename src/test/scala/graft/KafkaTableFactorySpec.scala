package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.sources.KafkaTableFactory
import graft.sources.KafkaTableFactory._
import graft.catalog.GraftCatalog

/** Kafka table factory: everything but the socket. Option-surface
  * translation, startup modes, key/value decode, upsert
  * materialization with tombstones, DDL + SQL integration over a
  * fake wire.
  */
class KafkaTableFactorySpec extends SparkSpec {

  private val baseOpts = Map(
    "connector" -> "kafka", "topic" -> "orders",
    "properties.bootstrap.servers" -> "broker:9092", "format" -> "json")

  test("option translation: topics, properties passthrough, startup modes") {
    val t = KafkaTableFactory.translate(baseOpts ++ Map(
      "properties.group.id" -> "g1", "scan.startup.mode" -> "earliest-offset"))
    assert(t.sparkOptions("kafka.bootstrap.servers") === "broker:9092")
    assert(t.sparkOptions("subscribe") === "orders")
    assert(t.sparkOptions("kafka.group.id") === "g1")
    assert(t.sparkOptions("startingOffsets") === "earliest")
    assert(KafkaTableFactory.translate(baseOpts + ("scan.startup.mode" -> "latest-offset"))
      .sparkOptions("startingOffsets") === "latest")
    assert(KafkaTableFactory.translate(baseOpts - "topic" + ("topic-pattern" -> "orders-.*"))
      .sparkOptions("subscribePattern") === "orders-.*")
    val ts = KafkaTableFactory.translate(baseOpts ++ Map("scan.startup.mode" -> "timestamp",
      "scan.startup.timestamp-millis" -> "1700000000000"))
    assert(ts.sparkOptions("startingTimestamp") === "1700000000000")
    val so = KafkaTableFactory.translate(baseOpts ++ Map("scan.startup.mode" -> "specific-offsets",
      "scan.startup.specific-offsets" -> "partition:0,offset:42;partition:1,offset:300"))
    assert(so.sparkOptions("startingOffsets") === """{"orders": {"0": 42, "1": 300}}""")
    // format-option passthrough matches explicit prefixes, not
    // substrings: 'scan.raw.x' must NOT leak into the format maps
    val fo = KafkaTableFactory.translate(baseOpts ++ Map(
      "json.ignore-parse-errors" -> "true", "key.raw.charset" -> "UTF-8",
      "value.csv.field-delimiter" -> ";", "scan.raw.x" -> "leak",
      "sink.json.y" -> "leak")).formatOptions
    assert(fo.keySet === Set("json.ignore-parse-errors", "key.raw.charset",
      "value.csv.field-delimiter"), s"leaked: $fo")
  }

  test("rejected combinations match the reference factory") {
    intercept[RuntimeException](KafkaTableFactory.translate(baseOpts - "topic"))
    intercept[RuntimeException](KafkaTableFactory.translate(baseOpts + ("topic-pattern" -> "x.*")))
    intercept[RuntimeException](KafkaTableFactory.translate(baseOpts - "properties.bootstrap.servers"))
    intercept[RuntimeException](KafkaTableFactory.translate(baseOpts - "format"))
    val g = intercept[RuntimeException](
      KafkaTableFactory.translate(baseOpts + ("scan.startup.mode" -> "group-offsets")))
    assert(g.getMessage.contains("group-offsets"))
    intercept[RuntimeException](
      KafkaTableFactory.translate(baseOpts + ("value.fields-include" -> "EXCEPT_KEY")))
  }

  private def recordsDf(rows: Seq[(Array[Byte], Array[Byte], Int, Long)]) = {
    val data = rows.map { case (k, v, p, o) =>
      Row(k, v, "orders", p, o, new java.sql.Timestamp(1700000000000L + o), 0)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data), KafkaTableFactory.RecordSchema)
  }

  private def js(s: String) = s.getBytes("UTF-8")

  test("json decode over a fake wire, specific-offsets honored") {
    val log = recordsDf(Seq(
      (null, js("""{"id":1,"v":"a"}"""), 0, 0L),
      (null, js("""{"id":2,"v":"b"}"""), 0, 1L),
      (null, js("""{"id":3,"v":"c"}"""), 1, 0L)))
    val t = KafkaTableFactory.translate(baseOpts ++ Map("scan.startup.mode" -> "specific-offsets",
      "scan.startup.specific-offsets" -> "partition:0,offset:1;partition:1,offset:0"))
    val wire = new FakeWire(() => log)
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v STRING")
    val got = KafkaTableFactory.decode(wire.read(spark, t), schema, t)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((2L, "b"), (3L, "c"))) // partition 0 starts at offset 1
  }

  test("upsert-kafka: key fields from the key, last write wins, tombstone deletes") {
    // key json carries id; value carries v (EXCEPT_KEY default);
    // id=1 updated twice then tombstoned; id=2 live; id=3 updated
    val log = recordsDf(Seq(
      (js("""{"id":1}"""), js("""{"v":"a0"}"""), 0, 0L),
      (js("""{"id":2}"""), js("""{"v":"b0"}"""), 0, 1L),
      (js("""{"id":1}"""), js("""{"v":"a1"}"""), 0, 2L),
      (js("""{"id":3}"""), js("""{"v":"c0"}"""), 1, 0L),
      (js("""{"id":1}"""), null, 0, 3L), // tombstone
      (js("""{"id":3}"""), js("""{"v":"c1"}"""), 1, 1L)))
    GraftCatalog.setKafkaWire(new FakeWire(() => log))
    try {
      GraftCatalog.executeDdl(spark,
        """CREATE TABLE k_state (id BIGINT, v STRING, PRIMARY KEY (id) NOT ENFORCED)
          |WITH ('connector' = 'upsert-kafka', 'topic' = 'orders',
          |  'properties.bootstrap.servers' = 'broker:9092',
          |  'key.format' = 'json', 'value.format' = 'json')""".stripMargin)
      val got = spark.table("k_state")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === Set((2L, "b0"), (3L, "c1")))
      // SQL over the materialized state composes normally
      assert(graft.sql.GraftSql.sql(spark,
        "SELECT count(*) AS n FROM k_state WHERE v LIKE 'c%'").first().getLong(0) === 1L)
      // the producer wire is the documented residue
      import spark.implicits._
      val e = intercept[RuntimeException] {
        GraftCatalog.insertInto(spark, "k_state",
          Seq((9L, "x")).toDF("id", "v"), overwrite = false)
      }
      assert(e.getMessage.contains("broker-only residue"))
      GraftCatalog.executeDdl(spark, "DROP TABLE k_state")
    } finally GraftCatalog.setKafkaWire(SparkKafkaWire)
  }

  test("upsert-kafka + value.fields-include=ALL: tombstone keys decode from the key json") {
    // ALL mode: live values carry every column (key duplicated), but a
    // tombstone's value is null — the -D row's key MUST come from the
    // record key or the delete silently no-ops (round-4 bug).
    val log = recordsDf(Seq(
      (js("""{"id":1}"""), js("""{"id":1,"v":"a0"}"""), 0, 0L),
      (js("""{"id":2}"""), js("""{"id":2,"v":"b0"}"""), 0, 1L),
      (js("""{"id":1}"""), js("""{"id":1,"v":"a1"}"""), 0, 2L),
      (js("""{"id":1}"""), null, 0, 3L))) // tombstone: id=1 must vanish
    GraftCatalog.setKafkaWire(new FakeWire(() => log))
    try {
      GraftCatalog.executeDdl(spark,
        """CREATE TABLE k_all (id BIGINT, v STRING, PRIMARY KEY (id) NOT ENFORCED)
          |WITH ('connector' = 'upsert-kafka', 'topic' = 'orders',
          |  'properties.bootstrap.servers' = 'broker:9092',
          |  'key.format' = 'json', 'value.format' = 'json',
          |  'value.fields-include' = 'ALL')""".stripMargin)
      val got = spark.table("k_all")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === Set((2L, "b0")))
      GraftCatalog.executeDdl(spark, "DROP TABLE k_all")
    } finally GraftCatalog.setKafkaWire(SparkKafkaWire)
  }

  test("csv value format decodes delimited payloads (flink-csv option names)") {
    val log = recordsDf(Seq(
      (null, "1;a".getBytes("UTF-8"), 0, 0L),
      (null, "2;b".getBytes("UTF-8"), 0, 1L)))
    val t = KafkaTableFactory.translate(baseOpts ++ Map(
      "format" -> "csv", "csv.field-delimiter" -> ";"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v STRING")
    val got = KafkaTableFactory.decode(new FakeWire(() => log).read(spark, t), schema, t)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "a"), (2L, "b")))
    // malformed records FAIL by default (the reference's
    // ignore-parse-errors = false); opting in tolerates them
    val bad = recordsDf(Seq((null, "not-a-number;x".getBytes("UTF-8"), 0, 0L)))
    intercept[org.apache.spark.SparkException] {
      KafkaTableFactory.decode(new FakeWire(() => bad).read(spark, t), schema, t)
        .collect()
    }
    val tolerant = KafkaTableFactory.translate(baseOpts ++ Map(
      "format" -> "csv", "csv.field-delimiter" -> ";",
      "csv.ignore-parse-errors" -> "true"))
    val rows = KafkaTableFactory.decode(
      new FakeWire(() => bad).read(spark, tolerant), schema, tolerant).collect()
    assert(rows.length === 1 && rows.head.isNullAt(0))
  }

  test("encode half round-trips through decode + materializeUpsert (producer minus the socket)") {
    import graft.changelog.Changelog
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v STRING")
    val t = KafkaTableFactory.translate(Map(
      "connector" -> "upsert-kafka", "topic" -> "orders",
      "properties.bootstrap.servers" -> "broker:9092",
      "key.format" -> "json", "value.format" -> "json",
      "key.fields" -> "id"))
    // changelog: a inserted then updated; b inserted then deleted
    val changes = Seq(
      (1L, "a0", Changelog.Insert), (2L, "b0", Changelog.Insert),
      (1L, "a1", Changelog.UpdateAfter), (2L, null, Changelog.Delete))
      .toDF("id", "v", Changelog.RowKindCol)
    val encoded = KafkaTableFactory.encode(changes, schema, t)
    // a tombstone is a null VALUE with the key still populated
    val tomb = encoded.filter(col("value").isNull).collect()
    assert(tomb.length === 1)
    assert(new String(tomb.head.getAs[Array[Byte]]("key"), "UTF-8").contains("\"id\":2"))
    // wrap as kafka records in produce order and run the consumer side
    val recs = encoded.rdd.zipWithIndex().map { case (r, i) =>
      Row(r.getAs[Array[Byte]]("key"), r.getAs[Array[Byte]]("value"),
        "orders", 0, i, new java.sql.Timestamp(1700000000000L + i), 0)
    }
    val log = spark.createDataFrame(recs, KafkaTableFactory.RecordSchema)
    val state = KafkaTableFactory.materializeUpsert(
      KafkaTableFactory.decode(log, schema, t), Seq("id"), schema)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(state === Set((1L, "a1")))
  }

  test("encode/decode symmetry for csv, raw and protobuf value formats") {
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v STRING")
    val data = Seq((1L, "a"), (2L, "b;b")).toDF("id", "v")
    for (fmt <- Seq("json", "csv", "protobuf")) {
      val t = KafkaTableFactory.translate(baseOpts + ("format" -> fmt))
      val encoded = KafkaTableFactory.encode(data, schema, t)
      val log = spark.createDataFrame(
        encoded.rdd.zipWithIndex().map { case (r, i) =>
          Row(r.getAs[Array[Byte]]("key"), r.getAs[Array[Byte]]("value"),
            "orders", 0, i, new java.sql.Timestamp(1700000000000L + i), 0)
        }, KafkaTableFactory.RecordSchema)
      val got = KafkaTableFactory.decode(log, schema, t)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === Set((1L, "a"), (2L, "b;b")), s"format $fmt broke the round trip")
    }
    // csv with a non-default delimiter: encode must honor the same
    // options as decode or the round trip breaks
    val td = KafkaTableFactory.translate(baseOpts ++ Map(
      "format" -> "csv", "csv.field-delimiter" -> ";"))
    val encD = KafkaTableFactory.encode(data, schema, td)
    val logD = spark.createDataFrame(
      encD.rdd.zipWithIndex().map { case (r, i) =>
        Row(r.getAs[Array[Byte]]("key"), r.getAs[Array[Byte]]("value"),
          "orders", 0, i, new java.sql.Timestamp(1700000000000L + i), 0)
      }, KafkaTableFactory.RecordSchema)
    assert(KafkaTableFactory.decode(logD, schema, td)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      === Set((1L, "a"), (2L, "b;b")))
    // raw: single column passthrough
    val tr = KafkaTableFactory.translate(baseOpts + ("format" -> "raw"))
    val single = org.apache.spark.sql.types.StructType.fromDDL("v STRING")
    val enc = KafkaTableFactory.encode(Seq("x", "yz").toDF("v"), single, tr)
    val log = spark.createDataFrame(
      enc.rdd.zipWithIndex().map { case (r, i) =>
        Row(r.getAs[Array[Byte]]("key"), r.getAs[Array[Byte]]("value"),
          "orders", 0, i, new java.sql.Timestamp(1700000000000L + i), 0)
      }, KafkaTableFactory.RecordSchema)
    assert(KafkaTableFactory.decode(log, single, tr)
      .collect().map(_.getString(0)).toSet === Set("x", "yz"))
  }

  test("unimplemented value formats fail loudly on plain topics too") {
    val t = KafkaTableFactory.translate(baseOpts + ("format" -> "avro"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v STRING")
    val e = intercept[IllegalArgumentException](
      KafkaTableFactory.decode(recordsDf(Nil), schema, t))
    assert(e.getMessage.contains("avro"))
  }

  test("plain kafka DDL table decodes records; streaming twin yields the record stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val log = recordsDf(Seq(
      (null, js("""{"id":1,"v":"a"}"""), 0, 0L),
      (null, js("""{"id":2,"v":"b"}"""), 0, 1L)))
    val stream = MemoryStream[(Long, String)](85, spark, None)
    val streamRecords = () => stream.toDF()
      .select(lit(null).cast("binary").as("key"),
        to_json(struct(col("_1").as("id"), col("_2").as("v"))).cast("binary").as("value"),
        lit("orders").as("topic"), lit(0).as("partition"),
        col("_1").as("offset"),
        lit(new java.sql.Timestamp(1700000000000L)).as("timestamp"),
        lit(0).as("timestampType"))
    GraftCatalog.setKafkaWire(new FakeWire(() => log, streamRecords))
    try {
      GraftCatalog.executeDdl(spark,
        """CREATE TABLE k_plain (id BIGINT, v STRING)
          |WITH ('connector' = 'kafka', 'topic' = 'orders',
          |  'properties.bootstrap.servers' = 'broker:9092', 'format' = 'json')""".stripMargin)
      assert(spark.table("k_plain").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet === Set((1L, "a"), (2L, "b")))
      val q = GraftCatalog.streamOf(spark, "k_plain")
        .writeStream.format("memory").queryName("k_stream").outputMode("append").start()
      try {
        stream.addData((10L, "x"), (11L, "y"))
        q.processAllAvailable()
        assert(spark.table("k_stream").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSet === Set((10L, "x"), (11L, "y")))
      } finally q.stop()
      GraftCatalog.executeDdl(spark, "DROP TABLE k_plain")
    } finally GraftCatalog.setKafkaWire(SparkKafkaWire)
  }
}
