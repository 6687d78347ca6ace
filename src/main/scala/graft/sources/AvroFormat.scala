package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema => ASchema}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Avro container-file format built directly on avro-core (the jar
  * Spark ships; the spark-avro connector module is absent in this
  * container) — the formats-row analog of the reference's
  * flink-formats/flink-avro, which is the same composition: avro-core
  * + connector glue (AvroRowDataDeserializationSchema → here a DSv2
  * TableProvider/Scan/PartitionReader; AvroWriterFactory → here a
  * per-partition DataFileWriter).
  *
  * Scale notes: the writer emits one file per input partition, and
  * the reader splits each file finer by seeking avro sync markers
  * (byte-range splits, see `planInputPartitions` below) — read
  * parallelism is bounded below by write parallelism and scales with
  * file size. Column pruning pushes into the DECODER: the pruned
  * reader schema makes avro-core byte-skip unrequested fields, so
  * they are never allocated, let alone converted.
  *
  * Schema evolution (the long-lived-dataset contract, same rules as
  * the reference's flink-avro reader-schema resolution): each file
  * resolves its embedded writer schema against the DDL-declared
  * table schema — added nullable columns read as null from old
  * files, int→long / float→double / string↔bytes promotions widen
  * old narrow files to the current DDL, and narrowing or a
  * non-nullable evolved column fails loudly at open, not per row.
  */
object AvroFormat {

  /** Spark → Avro schema (nullable fields become union(null, T);
    * timestamps use the timestamp-micros logical type, the same
    * micros precision Spark carries internally). Nested records are
    * named after their field with the ENCLOSING record's full name as
    * namespace — path-qualified, so same-named struct fields at
    * different nesting levels never collide on an avro full name.
    */
  def toAvroSchema(st: StructType, name: String = "row",
      namespace: String = "graft.avro"): ASchema = {
    val fields = st.fields.map { f =>
      val base = f.dataType match {
        case LongType    => ASchema.create(ASchema.Type.LONG)
        case IntegerType => ASchema.create(ASchema.Type.INT)
        case DoubleType  => ASchema.create(ASchema.Type.DOUBLE)
        case FloatType   => ASchema.create(ASchema.Type.FLOAT)
        case BooleanType => ASchema.create(ASchema.Type.BOOLEAN)
        case StringType  => ASchema.create(ASchema.Type.STRING)
        case BinaryType  => ASchema.create(ASchema.Type.BYTES)
        case TimestampType =>
          LogicalTypes.timestampMicros().addToSchema(ASchema.create(ASchema.Type.LONG))
        // the debezium-avro envelope's before/after images need this
        case st: StructType => toAvroSchema(st, f.name, s"$namespace.$name")
        case other => sys.error(s"avro format: unsupported type $other")
      }
      val s =
        if (f.nullable) ASchema.createUnion(ASchema.create(ASchema.Type.NULL), base)
        else base
      new ASchema.Field(f.name, s, null, if (f.nullable) ASchema.Field.NULL_DEFAULT_VALUE else null)
    }
    ASchema.createRecord(name, null, namespace, false, util.Arrays.asList(fields: _*))
  }

  /** The container-file surface is FLAT (its writer/reader convert
    * scalar values only) — nested records belong to the confluent
    * codec. Called before any filesystem mutation so an unsupported
    * schema cannot destroy existing table data mid-write.
    */
  def validateFlat(st: StructType, what: String): Unit =
    st.fields.foreach(f => require(!f.dataType.isInstanceOf[StructType],
      s"avro container format on $what: nested ROW column '${f.name}' is not " +
        "supported by the file writer/reader (flat columns only; the " +
        "avro-confluent codec handles nested records)"))

  /** One reader-side avro field for a Spark column (the same type
    * mapping as [[toAvroSchema]], factored so the per-file resolved
    * reader schema below can reuse it).
    */
  private[sources] def toAvroField(f: StructField): ASchema.Field = {
    val base = f.dataType match {
      case LongType    => ASchema.create(ASchema.Type.LONG)
      case IntegerType => ASchema.create(ASchema.Type.INT)
      case DoubleType  => ASchema.create(ASchema.Type.DOUBLE)
      case FloatType   => ASchema.create(ASchema.Type.FLOAT)
      case BooleanType => ASchema.create(ASchema.Type.BOOLEAN)
      case StringType  => ASchema.create(ASchema.Type.STRING)
      case BinaryType  => ASchema.create(ASchema.Type.BYTES)
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(ASchema.create(ASchema.Type.LONG))
      case other => sys.error(s"avro format: unsupported type $other")
    }
    val s =
      if (f.nullable) ASchema.createUnion(ASchema.create(ASchema.Type.NULL), base)
      else base
    new ASchema.Field(f.name, s, null,
      if (f.nullable) ASchema.Field.NULL_DEFAULT_VALUE else null)
  }

  /** The RESOLVED reader schema for one file: the writer record's full
    * name (so avro's schema-resolution name check passes against any
    * writer) carrying the TABLE's columns and types. Handing this to
    * the datum reader makes avro-core apply the published resolution
    * rules at DECODE time:
    *
    *  - pruning: writer fields absent here are byte-SKIPPED, never
    *    materialized (deeper than the previous convert-then-drop);
    *  - evolution: a table column a v1 file lacks reads as its null
    *    default (the column must be nullable — enforced loudly here,
    *    not as a per-row NPE mid-scan);
    *  - promotion: writer int→long, float→double, string↔bytes widen
    *    per the avro spec, so old narrow files serve a widened DDL;
    *    narrowing fails loudly at resolution, not silently per row.
    *
    * The reference's flink-avro performs the identical composition —
    * AvroDeserializationSchema resolves writer-vs-reader schemas so
    * long-lived topics/dirs evolve without rewrites.
    */
  private[sources] def resolvedReaderSchema(
      writer: ASchema, required: StructType): ASchema = {
    val fields = required.fields.map { f =>
      if (writer.getField(f.name) == null)
        require(f.nullable, s"avro schema evolution: column '${f.name}' is " +
          s"missing from writer schema '${writer.getFullName}' and is NOT " +
          "nullable — evolved columns need a null default")
      toAvroField(f)
    }
    ASchema.createRecord(writer.getName, null, writer.getNamespace, false,
      util.Arrays.asList(fields: _*))
  }

  /** Avro → Spark schema (the reader's inference path). */
  def toSparkSchema(schema: ASchema): StructType = {
    def field(f: ASchema.Field): StructField = {
      val (s, nullable) =
        if (f.schema().getType == ASchema.Type.UNION) {
          val nonNull = f.schema().getTypes.asScala.filter(_.getType != ASchema.Type.NULL)
          (nonNull.head, true)
        } else (f.schema(), false)
      val dt = s.getType match {
        case ASchema.Type.LONG =>
          // timestamp-millis maps too — the reader scales it to the
          // micros Spark stores (foreign writers use either precision)
          if (s.getLogicalType != null &&
              (s.getLogicalType.getName == "timestamp-micros" ||
                s.getLogicalType.getName == "timestamp-millis")) TimestampType
          else LongType
        case ASchema.Type.INT     => IntegerType
        case ASchema.Type.DOUBLE  => DoubleType
        case ASchema.Type.FLOAT   => FloatType
        case ASchema.Type.BOOLEAN => BooleanType
        case ASchema.Type.STRING  => StringType
        case ASchema.Type.BYTES   => BinaryType
        case ASchema.Type.RECORD  => toSparkSchema(s)
        case other => sys.error(s"avro format: unsupported avro type $other")
      }
      StructField(f.name(), dt, nullable)
    }
    StructType(schema.getFields.asScala.map(field).toArray)
  }

  /** Write the DataFrame as avro container files, one file per input
    * partition (distributed — each task streams its partition through
    * a DataFileWriter; nothing funnels through the driver). An empty
    * frame still writes one empty schema-bearing file so the relation
    * round-trips (the read side infers from the embedded schema).
    */
  def write(df: DataFrame, dir: String): Unit = writeImpl(df, dir, append = false)

  /** Append: new files land next to the existing ones (a UUID batch
    * stamp per append call, and `create(overwrite = false)` so even a
    * stamp collision fails loudly instead of silently replacing
    * another job's file) — the INSERT INTO path for avro-format DDL
    * tables.
    */
  def append(df: DataFrame, dir: String): Unit = writeImpl(df, dir, append = true)

  private def writeImpl(df: DataFrame, dir: String, append: Boolean): Unit = {
    val schema = df.schema
    validateFlat(schema, "write")
    val avroJson = toAvroSchema(schema).toString
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    if (!append && fs.exists(dirPath)) fs.delete(dirPath, true)
    fs.mkdirs(dirPath)
    locally { // schema-only marker file; 0 rows must stay readable
      val aSchema = new ASchema.Parser().parse(avroJson)
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](aSchema))
      w.create(aSchema, fs.create(new Path(dirPath, "part-schema.avro"), true))
      w.close()
    }
    val stamp = if (append) s"-${java.util.UUID.randomUUID()}" else ""
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val aSchema = new ASchema.Parser().parse(avroJson)
        val taskFs = new Path(dir).getFileSystem(new Configuration())
        val out = taskFs.create(new Path(dir, f"part$stamp-$pid%05d.avro"), !append)
        val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](aSchema))
        writer.create(aSchema, out)
        try {
          it.foreach { row =>
            val rec = new GenericData.Record(aSchema)
            var i = 0
            while (i < schema.length) {
              if (!row.isNullAt(i)) rec.put(i, toAvroValue(schema(i).dataType, row, i))
              i += 1
            }
            writer.append(rec)
          }
        } finally writer.close()
      }
    }
  }

  private def toAvroValue(dt: DataType, row: Row, i: Int): AnyRef = dt match {
    case LongType    => Long.box(row.getLong(i))
    case IntegerType => Int.box(row.getInt(i))
    case DoubleType  => Double.box(row.getDouble(i))
    case FloatType   => Float.box(row.getFloat(i))
    case BooleanType => Boolean.box(row.getBoolean(i))
    case StringType  => row.getString(i)
    case BinaryType  => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
    case TimestampType =>
      val ts = row.getTimestamp(i)
      // floorDiv: plain / truncates toward zero and corrupts pre-1970
      // fractional-second timestamps by one second
      Long.box(Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L)
    case other => sys.error(s"avro format: unsupported type $other")
  }
}

/** DSv2 read side: `spark.read.format("graft.sources.AvroSource")
  * .load(dir)` — schema inferred from the first file's embedded avro
  * schema, one InputPartition per file, column pruning pushed down.
  */
class AvroSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  // one LIST per load: inferSchema and getTable run on the same
  // provider instance, so the directory listing — INCLUDING file
  // lengths, which split planning needs — is fetched once (an object
  // store pays one round-trip, not one per file per plan)
  private val listCache =
    scala.collection.mutable.Map.empty[String, Seq[(String, Long)]]

  private def listFiles(options: CaseInsensitiveStringMap): Seq[(String, Long)] = {
    val dir = Option(options.get("path")).getOrElse(sys.error("avro source needs a path"))
    listCache.synchronized {
      listCache.getOrElseUpdate(dir, {
        val p = new Path(dir)
        val fs = p.getFileSystem(new Configuration())
        fs.listStatus(p).filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
          .map(s => (s.getPath.toString, s.getLen)).sortBy(_._1).toSeq
      })
    }
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val first = listFiles(options).headOption
      .getOrElse(sys.error("no .avro files at path"))._1
    val p = new Path(first)
    val in = p.getFileSystem(new Configuration()).open(p)
    val stream = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
    try {
      val st = AvroFormat.toSparkSchema(stream.getSchema)
      // reject up front what the per-row converter cannot read — a
      // per-task failure mid-scan would be the alternative
      AvroFormat.validateFlat(st, s"read of $first")
      st
    } finally stream.close()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val splitSize = opts.getLong("splitSize", 128L * 1024 * 1024)
    require(splitSize > 0, s"splitSize must be positive, got $splitSize")
    // declared (external-metadata) schemas bypass inferSchema, so the
    // flat-surface check must run here too — loudly at plan time
    AvroFormat.validateFlat(schema, "declared schema")
    // the schema-only marker exists so empty relations stay readable;
    // it never needs a scan task
    val files = listFiles(opts).filterNot(_._1.endsWith("part-schema.avro"))
    new AvroTable(files, schema, splitSize)
  }
}

private class AvroTable(files: Seq[(String, Long)], tableSchema: StructType, splitSize: Long)
    extends Table with SupportsRead {
  override def name(): String = s"avro(${files.length} files)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: StructType = tableSchema
      override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = required
        override def toBatch: Batch = new Batch {
          // files larger than splitSize break into byte ranges; the
          // reader seeks to the first avro sync marker past the range
          // start and reads whole blocks until it passes the range
          // end — the same block-level split the reference's
          // flink-avro / avro-mapred input format performs, so one
          // giant file still scans in parallel
          override def planInputPartitions(): Array[InputPartition] =
            files.flatMap { case (f, len) =>
              // end is the true file length, never Long.MaxValue —
              // DataFileReader.pastSync adds SYNC_SIZE to it and
              // would overflow negative (= everything "past")
              if (len <= splitSize) Seq(AvroFilePartition(f, 0L, len))
              else (0L until len by splitSize).map(start =>
                AvroFilePartition(f, start, math.min(start + splitSize, len)))
            }.map(p => p: InputPartition).toArray
          override def createReaderFactory(): PartitionReaderFactory = {
            val requiredSchema = required
            new PartitionReaderFactory {
              override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
                val fp = p.asInstanceOf[AvroFilePartition]
                new AvroFileReader(fp.file, fp.start, fp.end, requiredSchema)
              }
            }
          }
        }
      }
    }
}

private case class AvroFilePartition(file: String, start: Long, end: Long)
    extends InputPartition

private class AvroFileReader(file: String, start: Long, end: Long,
    required: StructType)
    extends PartitionReader[InternalRow] {
  private val names: Array[String] = required.fieldNames
  private val types: Array[DataType] = required.fields.map(_.dataType)
  private val stream = {
    val in = new org.apache.avro.mapred.FsInput(new Path(file), new Configuration())
    try {
      val datumReader = new GenericDatumReader[GenericRecord]()
      val r = new org.apache.avro.file.DataFileReader[GenericRecord](in, datumReader)
      // hand avro-core the resolved reader schema (pruned columns +
      // evolution defaults + type promotion) — resolution then runs at
      // decode: skipped fields never allocate, promoted values arrive
      // already widened to the reader type
      datumReader.setExpected(AvroFormat.resolvedReaderSchema(r.getSchema, required))
      // seek to the first sync point at-or-after `start`; blocks whose
      // sync precedes `end` belong to this split (avro's standard
      // split contract — each block is read by exactly one range)
      if (start > 0) r.sync(start)
      r
    } catch {
      // a corrupt/truncated file must not leak the opened input
      case e: Throwable => in.close(); throw e
    }
  }
  private var rec: GenericRecord = _

  // micros multiplier per field: foreign files may carry
  // timestamp-millis; Spark stores micros
  private val tsScale: Array[Long] = names.indices.map { i =>
    if (types(i) != TimestampType) 1L
    else {
      // null = evolved column absent from this file's writer schema
      // (reads as the null default; no scaling applies)
      val f = stream.getSchema.getField(names(i))
      if (f == null) 1L
      else {
        val s =
          if (f.schema().getType == ASchema.Type.UNION)
            f.schema().getTypes.asScala.find(_.getType != ASchema.Type.NULL).get
          else f.schema()
        if (s.getLogicalType != null && s.getLogicalType.getName == "timestamp-millis") 1000L
        else 1L
      }
    }
  }.toArray

  override def next(): Boolean = {
    if (!stream.hasNext || stream.pastSync(end)) false
    else { rec = stream.next(rec); true }
  }

  override def get(): InternalRow = {
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(names.length)
    var i = 0
    while (i < names.length) {
      val v = rec.get(names(i))
      if (v == null) row.setNullAt(i)
      else types(i) match {
        case LongType => row.setLong(i, v.asInstanceOf[java.lang.Long])
        case TimestampType =>
          row.setLong(i, v.asInstanceOf[java.lang.Long] * tsScale(i))
        case IntegerType => row.setInt(i, v.asInstanceOf[java.lang.Integer])
        case DoubleType  => row.setDouble(i, v.asInstanceOf[java.lang.Double])
        case FloatType   => row.setFloat(i, v.asInstanceOf[java.lang.Float])
        case BooleanType => row.setBoolean(i, v.asInstanceOf[java.lang.Boolean])
        case StringType  => row.update(i, UTF8String.fromString(v.toString))
        case BinaryType  =>
          val bb = v.asInstanceOf[java.nio.ByteBuffer]
          val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr)
          row.update(i, arr)
        case other => sys.error(s"avro reader: unsupported type $other")
      }
      i += 1
    }
    row
  }

  override def close(): Unit = stream.close()
}
