package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.changelog.Changelog

/** Kafka table factory — the option surface and decode pipeline of
  * the reference's KafkaDynamicTableFactory / UpsertKafkaDynamicTableFactory
  * (flink-connectors/flink-connector-kafka/.../table/), translated to
  * the Spark structured-streaming kafka source's option names.
  *
  * The container ships neither a broker nor the spark-sql-kafka jar,
  * so the WIRE is pluggable: [[SparkKafkaWire]] is the production
  * implementation (hands the translated options to
  * `spark.read/readStream.format("kafka")` — exactly one line per
  * path), and specs install a [[FakeWire]] over an in-memory record
  * log with the kafka record schema. Everything else — option
  * validation and translation, startup-mode mapping, key/value JSON
  * decode, EXCEPT_KEY/ALL field routing, upsert materialization with
  * tombstone deletes — is the real factory and is spec-tested. The
  * only untested residue is the socket itself.
  *
  * Deliberate residue: 'scan.startup.mode' = 'group-offsets' is
  * rejected — Spark's kafka source manages offsets through its own
  * checkpoints and cannot resume from a consumer group's committed
  * offsets; the reference's other four startup modes translate 1:1.
  */
object KafkaTableFactory {

  /** The kafka record relation both wires produce: the Spark kafka
    * source's fixed read schema.
    */
  val RecordSchema: StructType = StructType(Seq(
    StructField("key", BinaryType), StructField("value", BinaryType),
    StructField("topic", StringType), StructField("partition", IntegerType),
    StructField("offset", LongType), StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  final case class Translated(
      sparkOptions: Map[String, String], // for format("kafka")
      valueFormat: String,
      keyFormat: Option[String],
      keyFields: Seq[String],
      valueFieldsInclude: String, // ALL | EXCEPT_KEY
      upsert: Boolean,
      formatOptions: Map[String, String] = Map.empty) // raw.*/json.* passthrough

  /** Option translation (KafkaConnectorOptionsUtil): Flink option
    * keys in, Spark kafka source option keys out. Fails loudly on
    * the combinations the reference rejects.
    */
  def translate(options: Map[String, String]): Translated = {
    val connector = options.getOrElse("connector", "kafka")
    val upsert = connector == "upsert-kafka"
    val bootstrap = options.getOrElse("properties.bootstrap.servers",
      sys.error("kafka table needs 'properties.bootstrap.servers'"))
    val topic = options.get("topic")
    val pattern = options.get("topic-pattern")
    require(topic.isDefined != pattern.isDefined,
      "kafka table needs exactly one of 'topic' / 'topic-pattern'")
    require(!(upsert && pattern.isDefined),
      "upsert-kafka needs a concrete 'topic' (it materializes the whole log)")

    val base = Map("kafka.bootstrap.servers" -> bootstrap) ++
      topic.map("subscribe" -> _) ++ pattern.map("subscribePattern" -> _) ++
      // remaining properties.* pass through to the client verbatim
      options.collect {
        case (k, v) if k.startsWith("properties.") &&
            k != "properties.bootstrap.servers" =>
          s"kafka.${k.stripPrefix("properties.")}" -> v
      }

    // startup modes (KafkaConnectorOptions.SCAN_STARTUP_MODE)
    val startup = options.get("scan.startup.mode") match {
      case _ if upsert =>
        // upsert-kafka always reads the full log to materialize state
        Map("startingOffsets" -> "earliest")
      case None | Some("earliest-offset") => Map("startingOffsets" -> "earliest")
      case Some("latest-offset") => Map("startingOffsets" -> "latest")
      case Some("timestamp") =>
        Map("startingTimestamp" -> options.getOrElse("scan.startup.timestamp-millis",
          sys.error("'scan.startup.mode'='timestamp' needs 'scan.startup.timestamp-millis'")))
      case Some("specific-offsets") =>
        val spec = options.getOrElse("scan.startup.specific-offsets",
          sys.error("'scan.startup.mode'='specific-offsets' needs 'scan.startup.specific-offsets'"))
        val t = topic.getOrElse(sys.error("specific-offsets needs a concrete 'topic'"))
        // "partition:0,offset:42;partition:1,offset:300" →
        // {"<topic>":{"0":42,"1":300}}
        val parts = spec.split(";").map(_.trim).filter(_.nonEmpty).map { p =>
          val kv = p.split(",").map(_.trim.split(":", 2))
          val m = kv.map(a => a(0).toLowerCase -> a(1)).toMap
          s""""${m("partition")}": ${m("offset")}"""
        }
        Map("startingOffsets" -> s"""{"$t": {${parts.mkString(", ")}}}""")
      case Some("group-offsets") =>
        sys.error("'scan.startup.mode'='group-offsets' does not translate: the Spark " +
          "kafka source resumes from its own checkpointed offsets, not the group's")
      case Some(other) => sys.error(s"unknown scan.startup.mode '$other'")
    }

    val valueFormat = options.get("value.format").orElse(options.get("format"))
      .getOrElse(sys.error("kafka table needs 'format' (or 'value.format')"))
    val keyFormat = options.get("key.format")
    val keyFields = options.get("key.fields")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    require(keyFormat.isEmpty || keyFields.nonEmpty || upsert,
      "'key.format' needs 'key.fields'")
    if (upsert) require(keyFormat.isDefined,
      "upsert-kafka needs 'key.format' (the key carries the PRIMARY KEY fields)")
    val include = options.getOrElse("value.fields-include",
      if (upsert) "EXCEPT_KEY" else "ALL").toUpperCase(java.util.Locale.ROOT)
    require(Set("ALL", "EXCEPT_KEY").contains(include),
      s"value.fields-include must be ALL or EXCEPT_KEY, got '$include'")
    require(include == "ALL" || keyFields.nonEmpty,
      "'value.fields-include' = 'EXCEPT_KEY' needs 'key.fields'")
    require(include == "ALL" || keyFormat.isDefined,
      "'value.fields-include' = 'EXCEPT_KEY' needs 'key.format' (the key carries those fields)")

    // per-format option passthrough: a key belongs to a format iff,
    // after the optional key./value. side prefix, it starts with that
    // format's name — 'key.raw.charset', 'value.json.fail-on-missing-
    // field', bare 'csv.field-delimiter'. Substring matching would
    // leak unrelated keys that merely embed the format name (e.g. a
    // hypothetical 'scan.raw.x') into the format maps
    val fmtPrefixes = Seq("raw.", "json.", "csv.", "protobuf.", "avro-confluent.",
      "avro-glue.")
    Translated(base ++ startup, valueFormat, keyFormat, keyFields, include, upsert,
      options.filter { case (k, _) =>
        val unsided = k.stripPrefix("key.").stripPrefix("value.")
        fmtPrefixes.exists(unsided.startsWith)
      })
  }

  /** The socket abstraction: produce the kafka record relation for
    * the translated options.
    */
  trait Wire {
    def read(spark: SparkSession, t: Translated): DataFrame
    def readStream(spark: SparkSession, t: Translated): DataFrame
  }

  /** Production wire: Spark's kafka source (needs the
    * spark-sql-kafka-0-10 jar on the classpath and a reachable
    * broker — neither exists in this container, the documented
    * broker-only residue).
    */
  object SparkKafkaWire extends Wire {
    def read(spark: SparkSession, t: Translated): DataFrame =
      t.sparkOptions.foldLeft(spark.read.format("kafka"))((r, kv) =>
        r.option(kv._1, kv._2)).load()
    def readStream(spark: SparkSession, t: Translated): DataFrame =
      t.sparkOptions.foldLeft(spark.readStream.format("kafka"))((r, kv) =>
        r.option(kv._1, kv._2)).load()
  }

  /** Spec wire: an in-memory record log with [[RecordSchema]]. Honors
    * startingOffsets filtering (earliest = all, specific-offsets =
    * per-partition lower bounds) so startup-mode translation is
    * exercised end to end.
    */
  final class FakeWire(log: () => DataFrame, stream: () => DataFrame = () => null)
      extends Wire {
    def read(spark: SparkSession, t: Translated): DataFrame = {
      val df = log()
      t.sparkOptions.get("startingOffsets") match {
        case None | Some("earliest") | Some("latest") => df
        case Some(json) => // {"topic":{"0":42,...}} → offset >= bound per partition
          val bounds = """"(\d+)":\s*(\d+)""".r.findAllMatchIn(json)
            .map(m => m.group(1).toInt -> m.group(2).toLong).toSeq
          bounds.foldLeft(df.filter(lit(false)))((acc, b) =>
            acc.unionByName(df.filter(col("partition") === b._1 && col("offset") >= b._2)))
      }
    }
    def readStream(spark: SparkSession, t: Translated): DataFrame = stream()
  }

  /** Decode a kafka record relation to the declared row shape.
    * json value format: `from_json` over the value-side columns; raw
    * value format: the single value-side column decoded straight from
    * the payload bytes ([[RawFormat]]). key.fields decode from the key
    * (its own json/raw format) when a key format is declared.
    * upsert-kafka: a null value is a tombstone → -D row with the key
    * fields populated; live rows carry +I and the (partition, offset)
    * pair rides along as __part/__offset so a keep-last
    * materialization orders correctly per key.
    */
  /** debezium-avro-confluent value format (flink-formats/
    * flink-avro-confluent-registry/debezium/
    * DebeziumAvroDeserializationSchema.java): the debezium
    * before/after/op envelope, avro-confluent encoded instead of
    * json. The envelope decodes through the registry once per record,
    * then the same op routing as debezium-json: c/r → +I(after),
    * u → -U(before) +U(after), d → -D(before); null kafka values
    * (tombstones) are skipped like the json twin's empty lines;
    * missing images or unknown ops are strict errors (the reference
    * NPEs into its corrupt path).
    */
  private def decodeDebeziumAvro(records: DataFrame, physical: StructType,
      t: Translated): DataFrame = {
    import graft.changelog.Changelog
    val envelope = StructType(Seq(
      StructField("before", physical), StructField("after", physical),
      StructField("op", StringType)))
    val rowT = ArrayType(StructType(physical.fields :+
      StructField(Changelog.RowKindCol, ByteType, nullable = false)))
    def rowOf(img: Column, kind: Byte): Column =
      struct(physical.fieldNames.toSeq.map(f => img.getField(f).as(f)) :+
        lit(kind).as(Changelog.RowKindCol): _*)
    val parsed = records.filter(col("value").isNotNull)
      .withColumn("__j",
        AvroConfluentFormat.decode(col("value"), envelope, t.formatOptions, "value."))
    val before = col("__j").getField("before")
    val after = col("__j").getField("after")
    val op = col("__j").getField("op")
    val onError = raise_error(concat(
      lit("corrupt or incomplete debezium-avro record (op="),
      coalesce(op, lit("null")),
      lit("): updates/deletes need the before image — set REPLICA IDENTITY FULL")))
      .cast(rowT)
    val rows =
      when(op.isin("c", "r") && after.isNotNull, array(rowOf(after, Changelog.Insert)))
        .when(op === "u" && before.isNotNull && after.isNotNull,
          array(rowOf(before, Changelog.UpdateBefore),
            rowOf(after, Changelog.UpdateAfter)))
        .when(op === "d" && before.isNotNull, array(rowOf(before, Changelog.Delete)))
        .otherwise(onError)
    parsed.select(explode(rows).as("__r")).select(col("__r.*"))
  }

  /** The Confluent TopicNameStrategy base: the concrete topic — or,
    * with an explicit 'avro-confluent.subject' override in play, any
    * placeholder (the override wins inside
    * [[AvroConfluentFormat.subject]]). A topic-PATTERN table without
    * an override has nothing to derive a subject from.
    */
  private def confluentSubjectBase(t: Translated, prefix: String): String =
    t.sparkOptions.get("subscribe")
      .orElse(t.formatOptions.get(s"${prefix}avro-confluent.subject")
        .orElse(t.formatOptions.get("avro-confluent.subject")).map(_ => "unused"))
      .getOrElse(sys.error(
        "avro-confluent encode: a topic-pattern table has no concrete " +
          "topic for the TopicNameStrategy subject — declare " +
          "'avro-confluent.subject' or use a single 'topic'"))

  /** Side-resolved avro-glue options: `key./value.`-prefixed keys win
    * over bare ones, flattened back to the names [[AvroGlueFormat]]
    * reads.
    */
  private def glueOptions(opts: Map[String, String], prefix: String): Map[String, String] =
    Seq("avro-glue.registry", "avro-glue.compression").flatMap { k =>
      opts.get(s"$prefix$k").orElse(opts.get(k)).map(k -> _)
    }.toMap

  /** Glue schema name: explicit 'avro-glue.schema-name' override, else
    * the AWS default naming strategy — the transport (topic) name,
    * `-key`-suffixed on the key side.
    */
  private def glueSchemaName(t: Translated, prefix: String): String =
    t.formatOptions.get(s"${prefix}avro-glue.schema-name")
      .orElse(t.formatOptions.get("avro-glue.schema-name"))
      .orElse(t.sparkOptions.get("subscribe")
        .map(tp => if (prefix == "key.") s"$tp-key" else tp))
      .getOrElse(sys.error(
        "avro-glue encode: a topic-pattern table has no concrete topic " +
          "for the schema name — declare 'avro-glue.schema-name' or use " +
          "a single 'topic'"))

  /** Write half of debezium-avro-confluent
    * (DebeziumAvroSerializationSchema.java): the same per-row mapping
    * as the json CDC write half — +I/+U emit op 'c' with the after
    * image, -U/-D emit op 'd' with the before image (a single row
    * carries one image, so an update round-trips as delete+create,
    * exactly the json twin's documented contract). Append-only input
    * (no __rowkind) is all inserts.
    */
  private def debeziumAvroValue(rows: DataFrame, physical: StructType,
      t: Translated): Column = {
    import graft.changelog.Changelog
    val envelope = StructType(Seq(
      StructField("before", physical), StructField("after", physical),
      StructField("op", StringType)))
    val img = struct(physical.fieldNames.toSeq.map(col): _*)
    val isDelete =
      if (rows.columns.contains(Changelog.RowKindCol))
        col(Changelog.RowKindCol).isin(Changelog.UpdateBefore, Changelog.Delete)
      else lit(false)
    val env = struct(
      when(isDelete, img).otherwise(lit(null).cast(physical)).as("before"),
      when(!isDelete, img).otherwise(lit(null).cast(physical)).as("after"),
      when(isDelete, lit("d")).otherwise(lit("c")).as("op"))
    AvroConfluentFormat.encode(env, envelope, t.formatOptions, "value.",
      confluentSubjectBase(t, "value."))
  }

  def decode(records: DataFrame, physical: StructType, t: Translated): DataFrame = {
    if (t.valueFormat == "debezium-avro-confluent") {
      require(!t.upsert,
        "debezium-avro-confluent is a changelog format — upsert-kafka needs an " +
          "insert-only value format (the reference rejects this pairing too)")
      return decodeDebeziumAvro(records, physical, t)
    }
    val implemented = Set("json", "csv", "raw", "protobuf", "avro-confluent",
      "avro-glue")
    require(implemented.contains(t.valueFormat),
      s"kafka value format '${t.valueFormat}' is not implemented " +
        s"(${implemented.mkString("/")} are)")
    t.keyFormat.foreach(kf => require(implemented.contains(kf),
      s"kafka key format '$kf' is not implemented (${implemented.mkString("/")} are)"))
    def csvOptions(prefix: String) = csvFormatOptions(t, prefix)
    val keyFields = t.keyFields
    val valueFields =
      if (t.valueFieldsInclude == "ALL") physical.fields.toSeq
      else physical.fields.toSeq.filterNot(f => keyFields.contains(f.name))
    val valueSchema = StructType(valueFields)
    val keySchema = StructType(physical.fields.filter(f => keyFields.contains(f.name)))
    // per-side field accessors: .getField over one from_json struct
    // (json) or the payload decoded to the side's single column (raw)
    val vj: Column = t.valueFormat match {
      case "json" => from_json(col("value").cast("string"), valueSchema)
      case "csv" =>
        from_csv(col("value").cast("string"), valueSchema, csvOptions("value."))
      case "raw" =>
        val f = RawFormat.singleField(valueSchema, "the kafka value side")
        struct(RawFormat.decode(col("value"), f.dataType,
          RawFormat.options(t.formatOptions, "value.")).as(f.name))
      case "protobuf" =>
        PbFormat.decode(col("value"), valueSchema, t.formatOptions, "value.")
      case "avro-confluent" =>
        AvroConfluentFormat.decode(col("value"), valueSchema, t.formatOptions, "value.")
      case "avro-glue" =>
        AvroGlueFormat.decode(col("value"), valueSchema,
          glueOptions(t.formatOptions, "value."))
    }
    val kj: Column = t.keyFormat match {
      case _ if keyFields.isEmpty => lit(null)
      case Some("raw") =>
        val f = RawFormat.singleField(keySchema, "the kafka key side")
        struct(RawFormat.decode(col("key"), f.dataType,
          RawFormat.options(t.formatOptions, "key.")).as(f.name))
      case Some("protobuf") =>
        PbFormat.decode(col("key"), keySchema, t.formatOptions, "key.")
      case Some("avro-confluent") =>
        AvroConfluentFormat.decode(col("key"), keySchema, t.formatOptions, "key.")
      case Some("avro-glue") =>
        AvroGlueFormat.decode(col("key"), keySchema,
          glueOptions(t.formatOptions, "key."))
      case Some("csv") =>
        from_csv(col("key").cast("string"), keySchema, csvOptions("key."))
      case _ => from_json(col("key").cast("string"), keySchema)
    }
    // plain topics with ALL read key fields from the VALUE (the value
    // carries every column, key fields duplicated); EXCEPT_KEY routes
    // them through the key format. upsert topics ALWAYS decode key
    // fields from the record key — a tombstone's value is null, so the
    // key is the only place the -D row's identity lives (the
    // reference's DynamicKafkaDeserializationSchema.emitRow populates
    // key positions from the decoded key even in ALL mode).
    def field(f: StructField): Column =
      if (keyFields.contains(f.name) && t.keyFormat.isDefined &&
          (t.upsert || t.valueFieldsInclude == "EXCEPT_KEY"))
        kj.getField(f.name).as(f.name)
      else vj.getField(f.name).as(f.name)
    if (!t.upsert)
      // a null value on a plain (non-upsert) topic is a tombstone with
      // no row semantics — skipped, like the reference's json decode
      records.filter(col("value").isNotNull)
        .select(physical.fields.map(field).toSeq: _*)
    else {
      // tombstone: null kafka value deletes the key
      val kind = when(col("value").isNull, lit(Changelog.Delete))
        .otherwise(lit(Changelog.Insert))
      records.select(physical.fields.map { f =>
        if (keyFields.contains(f.name)) field(f)
        else when(col("value").isNull, lit(null).cast(f.dataType))
          .otherwise(vj.getField(f.name)).as(f.name)
      }.toSeq :+ kind.as(Changelog.RowKindCol) :+
        col("partition").as("__part") :+ col("offset").as("__offset"): _*)
    }
  }

  /** flink-csv option names → Spark csv reader/writer options. The
    * reference FAILS on malformed records unless
    * 'csv.ignore-parse-errors' = 'true' — so the mode defaults to
    * FAILFAST here too (Spark's own default, PERMISSIVE, would
    * silently null corrupt rows).
    */
  private def csvFormatOptions(t: Translated, prefix: String): Map[String, String] = {
    def get(k: String) = t.formatOptions.get(prefix + k)
      .orElse(t.formatOptions.get(k))
    Map("mode" -> (if (get("csv.ignore-parse-errors").contains("true"))
      "PERMISSIVE" else "FAILFAST")) ++
      get("csv.field-delimiter").map("sep" -> _) ++
      get("csv.quote-character").map("quote" -> _) ++
      get("csv.escape-character").map("escape" -> _) ++
      get("csv.null-literal").map("nullValue" -> _)
  }

  /** The write half (the reference's DynamicKafkaRecordSerializationSchema):
    * rows → (key BINARY, value BINARY) kafka records. Key fields
    * serialize with the key format; the value carries every column
    * (ALL) or the non-key columns (EXCEPT_KEY). upsert-kafka encodes
    * -U/-D rows as TOMBSTONES (null value, key populated) and +I/+U
    * as live records — exactly what [[decode]] + [[materializeUpsert]]
    * consume, so the round trip is spec-checkable without a broker.
    * Only the producer socket itself stays environmental residue.
    */
  def encode(rows: DataFrame, physical: StructType, t: Translated): DataFrame = {
    val implemented = Set("json", "csv", "raw", "protobuf", "avro-confluent",
      "debezium-avro-confluent")
    require(implemented.contains(t.valueFormat),
      s"kafka value format '${t.valueFormat}' is not implemented " +
        s"(${implemented.mkString("/")} are)")
    require(t.valueFormat != "debezium-avro-confluent" || !t.upsert,
      "debezium-avro-confluent is a changelog format — upsert-kafka needs an " +
        "insert-only value format (the reference rejects this pairing too)")
    // the changelog envelope is a VALUE format only — keys stay plain
    val keyImplemented = implemented - "debezium-avro-confluent"
    t.keyFormat.foreach(kf => require(keyImplemented.contains(kf),
      s"kafka key format '$kf' is not implemented (${keyImplemented.mkString("/")} are)"))
    val keyFields = t.keyFields
    val valueFields =
      if (t.valueFieldsInclude == "ALL") physical.fields.toSeq
      else physical.fields.toSeq.filterNot(f => keyFields.contains(f.name))
    val valueSchema = StructType(valueFields)
    val keySchema = StructType(physical.fields.filter(f => keyFields.contains(f.name)))
    def serialize(fmt: String, schema: StructType, prefix: String): Column = {
      val payload = struct(schema.fieldNames.toSeq.map(col): _*)
      fmt match {
        case "json" => to_json(payload).cast("binary")
        case "csv" =>
          // same options as the decode side or the round trip breaks
          // on any non-default delimiter/quote configuration
          import scala.jdk.CollectionConverters._
          to_csv(payload, (csvFormatOptions(t, prefix) - "mode").asJava).cast("binary")
        case "raw" =>
          val f = RawFormat.singleField(schema, s"the kafka $prefix side")
          RawFormat.encode(col(f.name), RawFormat.options(t.formatOptions, prefix))
        case "protobuf" =>
          PbFormat.encode(payload, schema, t.formatOptions, prefix)
        case "avro-confluent" =>
          AvroConfluentFormat.encode(payload, schema, t.formatOptions, prefix,
            confluentSubjectBase(t, prefix))
        case "avro-glue" =>
          AvroGlueFormat.encode(payload, schema,
            glueOptions(t.formatOptions, prefix), glueSchemaName(t, prefix))
      }
    }
    val keyCol: Column = t.keyFormat match {
      case Some(kf) if keyFields.nonEmpty => serialize(kf, keySchema, "key.")
      case _ => lit(null).cast("binary")
    }
    val valueCol =
      if (t.valueFormat == "debezium-avro-confluent")
        // the envelope carries EVERY physical column (before/after
        // images are full rows); key fields still encode through the
        // declared key format so per-key partitioning order holds
        debeziumAvroValue(rows, physical, t)
      else serialize(t.valueFormat, valueSchema, "value.")
    val kindCol = graft.changelog.Changelog.RowKindCol
    val value =
      if (t.upsert && rows.columns.contains(kindCol))
        // retractions are tombstones; the key alone identifies them
        when(col(kindCol).isin(graft.changelog.Changelog.UpdateBefore,
          graft.changelog.Changelog.Delete), lit(null).cast("binary"))
          .otherwise(valueCol)
      else valueCol
    rows.select(keyCol.as("key"), value.as("value"))
  }

  /** Materialize an upsert-kafka changelog to current state: keep the
    * last record per key in (partition, offset) order, drop keys
    * whose last record is a tombstone — the reference's upsert-kafka
    * source semantics (ChangelogNormalize over the keyed log). One
    * shuffle on the key.
    */
  def materializeUpsert(decoded: DataFrame, keys: Seq[String],
      physical: StructType): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__part").desc_nulls_last, col("__offset").desc_nulls_last)
    decoded
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(Changelog.RowKindCol) =!= Changelog.Delete)
      .select(physical.fieldNames.map(col).toSeq: _*)
  }
}
