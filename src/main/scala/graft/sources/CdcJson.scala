package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.changelog.Changelog

/** CDC changelog-format decoders — all four flink-json changelog
  * formats (DebeziumJsonDeserializationSchema.java:130-182,
  * CanalJsonDeserializationSchema.java:225-291,
  * MaxwellJsonDeserializationSchema.java:128-170,
  * OggJsonDeserializationSchema.java:166-196): JSON-encoded change
  * events become `__rowkind` changelog rows that feed the changelog
  * tier (normalize / retract aggregation / SQL inference) directly.
  *
  * Spark-first shape: `from_json` + a conditional rows-array +
  * `explode` — one distributed projection pass inside whole-stage
  * codegen, no shuffle until the consumer aggregates, so a 100 TB CDC
  * dump decodes at scan speed.
  *
  * Error contract matches the reference: strict mode (default) raises
  * on corrupt records, unknown ops, and null before-images on
  * update/delete (the REPLICA IDENTITY case); ignore-parse-errors
  * silently drops exactly those records. Empty lines are Kafka
  * tombstones and always skipped.
  */
object CdcJson {

  private def kindField = StructField(Changelog.RowKindCol, ByteType, nullable = false)

  /** debezium-json: `{"before":{...},"after":{...},"op":"c|r|u|d"}`.
    * c/r emit +I(after); u emits -U(before), +U(after); d emits
    * -D(before). With `schemaInclude` the envelope nests under
    * `payload` (Kafka Connect `value.converter.schemas.enable`).
    */
  def debezium(lines: DataFrame, physical: StructType, lineCol: String = "value",
      schemaInclude: Boolean = false, ignoreParseErrors: Boolean = false,
      timestampFormat: Option[String] = None,
      metaCols: Seq[(String, String, DataType)] = Nil): DataFrame =
    beforeAfterFormat(lines, physical, lineCol,
      wrap = if (schemaInclude) Some("payload") else None,
      beforeField = "before", afterField = "after", opField = "op",
      insertOps = Seq("c", "r"), updateOp = "u", deleteOp = "d",
      label = "debezium", insertLabel = "insert/read",
      replicaHint = " (set REPLICA IDENTITY FULL)",
      ignoreParseErrors = ignoreParseErrors, timestampFormat = timestampFormat,
      metaCols = metaCols)

  /** ogg-json (Oracle GoldenGate): `{"before":{...},"after":{...},
    * "op_type":"I|U|D"}` — the debezium shape with renamed fields and
    * single-letter ops (OggJsonDeserializationSchema.java:166-196).
    * I emits +I(after); U emits -U(before), +U(after); D emits
    * -D(before); any other op_type (incl. the declared-but-unhandled
    * "T" truncate) is an error in strict mode, dropped otherwise.
    */
  def ogg(lines: DataFrame, physical: StructType, lineCol: String = "value",
      ignoreParseErrors: Boolean = false,
      timestampFormat: Option[String] = None): DataFrame =
    beforeAfterFormat(lines, physical, lineCol, wrap = None,
      beforeField = "before", afterField = "after", opField = "op_type",
      insertOps = Seq("I"), updateOp = "U", deleteOp = "D",
      label = "ogg", insertLabel = "insert",
      replicaHint = " (GoldenGate must log full before images)",
      ignoreParseErrors = ignoreParseErrors, timestampFormat = timestampFormat)

  /** Shared core for the before/after-envelope formats: one
    * `from_json` projection, a conditional rows-array, `explode`.
    */
  /** Envelope metadata a debezium table can declare as METADATA
    * columns (DebeziumJsonDecodingFormat.ReadableMetadata): the keys
    * here parse the extra envelope fields (`ts_ms`, `source`) and
    * project them next to each decoded row, so per-row change
    * provenance survives the explode.
    */
  private def envelopeMetaExpr(j: Column, key: String): Column = key match {
    case "ingestion-timestamp" => timestamp_millis(j.getField("ts_ms"))
    case "source.timestamp" => timestamp_millis(j.getField("source").getField("ts_ms"))
    case "source.database" => j.getField("source").getField("db")
    case "source.table" => j.getField("source").getField("table")
    case other => sys.error(s"unknown debezium metadata key: $other")
  }

  private def beforeAfterFormat(lines: DataFrame, physical: StructType,
      lineCol: String, wrap: Option[String],
      beforeField: String, afterField: String, opField: String,
      insertOps: Seq[String], updateOp: String, deleteOp: String,
      label: String, insertLabel: String, replicaHint: String,
      ignoreParseErrors: Boolean,
      timestampFormat: Option[String],
      metaCols: Seq[(String, String, DataType)] = Nil): DataFrame = {
    // envelope metadata fields parse only when declared — the payload
    // decode is unchanged otherwise
    val metaFields =
      if (metaCols.isEmpty) Nil
      else Seq(StructField("ts_ms", LongType),
        StructField("source", StructType(Seq(
          StructField("db", StringType), StructField("table", StringType),
          StructField("ts_ms", LongType)))))
    val envelope = StructType(Seq(
      StructField(beforeField, physical), StructField(afterField, physical),
      StructField(opField, StringType)) ++ metaFields)
    val parseSchema = wrap.fold(envelope: StructType)(w =>
      StructType(Seq(StructField(w, envelope))))
    val jsonOpts = timestampFormat.map("timestampFormat" -> _).toMap
    val rowT = ArrayType(StructType(physical.fields :+ kindField))
    def rowOf(img: Column, kind: Byte): Column =
      struct(physical.fieldNames.toSeq.map(f => img.getField(f).as(f)) :+
        lit(kind).as(Changelog.RowKindCol): _*)

    val parsedRoot = from_json(col(lineCol), parseSchema, jsonOpts)
    val parsed = lines
      .filter(length(col(lineCol)) > 0) // tombstones
      .withColumn("__j", wrap.fold(parsedRoot)(w => parsedRoot.getField(w)))
    val before = col("__j").getField(beforeField)
    val after = col("__j").getField(afterField)
    val op = col("__j").getField(opField)
    // corrupt JSON parses to a null envelope -> op null -> error path;
    // a null before on update/delete is the reference's REPLICA
    // IDENTITY error, and a null after on insert its
    // NPE-turned-IOException
    val onError: Column =
      if (ignoreParseErrors) array().cast(rowT)
      else raise_error(concat(
        when(op.isin(updateOp, deleteOp) && before.isNull,
          lit(s"""null "$beforeField" in a $label update/delete$replicaHint: """))
          .when(op === updateOp && after.isNull,
            lit(s"""null "$afterField" in a $label update: """))
          .when(op.isin(insertOps: _*),
            lit(s"""null "$afterField" in a $label $insertLabel: """))
          .otherwise(lit(s"corrupt or unknown-op $label record: ")),
        col(lineCol))).cast(rowT)
    // an update needs BOTH images — a null after would otherwise emit
    // an all-null +U row (the reference NPEs into its corrupt path)
    val rows =
      when(op.isin(insertOps: _*) && after.isNotNull,
        array(rowOf(after, Changelog.Insert)))
        .when(op === updateOp && before.isNotNull && after.isNotNull,
          array(rowOf(before, Changelog.UpdateBefore),
            rowOf(after, Changelog.UpdateAfter)))
        .when(op === deleteOp && before.isNotNull,
          array(rowOf(before, Changelog.Delete)))
        .otherwise(onError)
    val metaExprs = metaCols.map { case (n, k, dt) =>
      envelopeMetaExpr(col("__j"), k).cast(dt).as(n) }
    parsed.select(explode(rows).as("__r") +: metaExprs: _*)
      .select(col("__r.*") +: metaCols.map(m => col(m._1)): _*)
  }

  /** maxwell-json: `{"data":{...},"old":{...},"type":"insert|update|
    * delete"}` (MaxwellJsonDeserializationSchema.java:128-170). `data`
    * carries the row image; on update `old` holds ONLY the changed
    * fields' previous values — the before-image merges them over
    * `data` (key present with explicit null means "changed to null",
    * absent means unchanged; same partial-old contract as canal but
    * on a single object, not an array). insert emits +I(data); update
    * -U(merged), +U(data); delete -D(data). `old` decodes as a map so
    * key presence survives; values cast from their JSON text, flat
    * rows like the reference.
    */
  def maxwell(lines: DataFrame, physical: StructType, lineCol: String = "value",
      ignoreParseErrors: Boolean = false,
      timestampFormat: Option[String] = None): DataFrame = {
    val envelope = StructType(Seq(
      StructField("data", physical),
      StructField("old", MapType(StringType, StringType)),
      StructField("type", StringType)))
    val jsonOpts = timestampFormat.map("timestampFormat" -> _).toMap
    val rowT = ArrayType(StructType(physical.fields :+ kindField))

    val parsed = lines
      .filter(length(col(lineCol)) > 0)
      .withColumn("__j", from_json(col(lineCol), envelope, jsonOpts))
    val data = col("__j").getField("data")
    val oldMap = col("__j").getField("old")
    val t = col("__j").getField("type")
    def rowOf(kind: Byte): Column =
      struct(physical.fieldNames.toSeq.map(f => data.getField(f).as(f)) :+
        lit(kind).as(Changelog.RowKindCol): _*)
    val mergedBefore = struct(physical.fields.toSeq.map { sf =>
      when(map_contains_key(oldMap, lit(sf.name)),
        element_at(oldMap, lit(sf.name)).cast(sf.dataType))
        .otherwise(data.getField(sf.name)).as(sf.name)
    } :+ lit(Changelog.UpdateBefore).as(Changelog.RowKindCol): _*)
    // a null data on any op is corrupt (the reference NPEs building
    // the row); a null old on update is its findValue NPE — maxwell
    // always writes old on updates
    val onError: Column =
      if (ignoreParseErrors) array().cast(rowT)
      else raise_error(concat(
        when(t === "update" && data.isNotNull,
          lit("""null "old" in a maxwell update: """))
          .otherwise(lit("corrupt or unknown-type maxwell record: ")),
        col(lineCol))).cast(rowT)
    val rows =
      when(t === "insert" && data.isNotNull, array(rowOf(Changelog.Insert)))
        .when(t === "update" && data.isNotNull && oldMap.isNotNull,
          array(mergedBefore, rowOf(Changelog.UpdateAfter)))
        .when(t === "delete" && data.isNotNull, array(rowOf(Changelog.Delete)))
        .otherwise(onError)
    parsed.select(explode(rows).as("__r")).select(col("__r.*"))
  }

  /** canal-json: `{"data":[{...}],"old":[{...}],"type":"INSERT|
    * UPDATE|DELETE|CREATE"}`. `data` carries the new rows; on UPDATE
    * `old[i]` carries ONLY the changed fields of row i — the
    * before-image merges them over `data[i]` (reference lines
    * 252-260; a key present with an explicit null means "changed to
    * null", an absent key means unchanged). CREATE is a DDL event and
    * is skipped. `old` is decoded as a map so key presence survives
    * (from_json into the physical struct could not distinguish
    * absent from null); values cast from their JSON text, so nested
    * column types are out of scope like the reference's flat rows.
    */
  def canal(lines: DataFrame, physical: StructType, lineCol: String = "value",
      ignoreParseErrors: Boolean = false,
      timestampFormat: Option[String] = None): DataFrame = {
    val envelope = StructType(Seq(
      StructField("data", ArrayType(physical)),
      StructField("old", ArrayType(MapType(StringType, StringType))),
      StructField("type", StringType)))
    val jsonOpts = timestampFormat.map("timestampFormat" -> _).toMap
    val rowT = ArrayType(StructType(physical.fields :+ kindField))
    val dataT = ArrayType(physical)

    val parsed = lines
      .filter(length(col(lineCol)) > 0)
      .withColumn("__j", from_json(col(lineCol), envelope, jsonOpts))
    val t = col("__j").getField("type")
    val data = col("__j").getField("data")
    // validation lives INSIDE the generator input: posexplode drops
    // null arrays, so a strict-mode error expression placed anywhere
    // else would be pruned before it could raise
    val dataOrErr =
      when(t === "CREATE", lit(null).cast(dataT)) // DDL event: skip
        .when(t.isin("INSERT", "UPDATE", "DELETE") && data.isNotNull, data)
        .otherwise(
          if (ignoreParseErrors) lit(null).cast(dataT)
          else raise_error(concat(
            lit("corrupt or unknown-type canal record: "), col(lineCol)))
            .cast(dataT))
    val exploded = parsed.select(col(lineCol), t.as("__t"),
      col("__j").getField("old").as("__old"),
      posexplode(dataOrErr).as(Seq("__pos", "__after")))

    def afterField(f: String) = col("__after").getField(f)
    def rowOf(kind: Byte): Column =
      struct(physical.fieldNames.toSeq.map(f => afterField(f).as(f)) :+
        lit(kind).as(Changelog.RowKindCol): _*)
    // old[i]: element_at is guarded by the size check so ANSI's
    // strict index never fires on ragged arrays
    val oldMap = when(col("__old").isNotNull && size(col("__old")) > col("__pos"),
      element_at(col("__old"), col("__pos") + 1))
    val mergedBefore = struct(physical.fields.toSeq.map { sf =>
      when(map_contains_key(oldMap, lit(sf.name)),
        element_at(oldMap, lit(sf.name)).cast(sf.dataType))
        .otherwise(afterField(sf.name)).as(sf.name)
    } :+ lit(Changelog.UpdateBefore).as(Changelog.RowKindCol): _*)
    val updateRows =
      if (ignoreParseErrors)
        when(oldMap.isNotNull, array(mergedBefore, rowOf(Changelog.UpdateAfter)))
          .otherwise(array().cast(rowT))
      else
        when(oldMap.isNotNull, array(mergedBefore, rowOf(Changelog.UpdateAfter)))
          .otherwise(raise_error(concat(
            lit("null \"old\" in a canal UPDATE record: "), col(lineCol)))
            .cast(rowT))
    val rows =
      when(col("__t") === "INSERT", array(rowOf(Changelog.Insert)))
        .when(col("__t") === "UPDATE", updateRows)
        .when(col("__t") === "DELETE", array(rowOf(Changelog.Delete)))
    // a null element inside "data" is corrupt (the reference NPEs
    // converting it): strict raises, ignore drops the element
    val elemErr: Column =
      if (ignoreParseErrors) array().cast(rowT)
      else raise_error(concat(
        lit("null row in canal \"data\": "), col(lineCol))).cast(rowT)
    val guarded = when(col("__after").isNull, elemErr).otherwise(rows)
    exploded.select(explode(guarded).as("__r")).select(col("__r.*"))
  }
}
