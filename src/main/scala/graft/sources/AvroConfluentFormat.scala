package graft.sources

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.avro.{Schema => ASchema}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Confluent Schema Registry avro envelope — the reference ships
  * flink-formats/flink-avro-confluent-registry
  * (RegistryAvroDeserializationSchema.java reads a magic byte + a
  * 4-byte big-endian schema id, resolves the WRITER schema from the
  * registry, then avro-decodes the rest of the payload with
  * writer/reader schema resolution; AvroRowDataSerializationSchema +
  * RegistryAvroSerializationSchema do the inverse, registering the
  * schema under `<topic>-value` / `<topic>-key` and prepending the
  * assigned id).
  *
  * The registry SERVICE is environmental (no network in this
  * container), so the client is a trait with an in-process fake —
  * the same pattern as [[KafkaTableFactory.FakeWire]]: the envelope
  * codec, id caching, writer-schema resolution and subject naming
  * are all real and exercised; only the HTTP hop is residue. Use a
  * `fake://<name>` registry url to address a named in-process
  * registry; `http(s)://` urls fail loudly.
  *
  * Schema evolution contract (avro resolution): a writer field the
  * reader lacks is dropped; a reader field the writer lacks fills
  * its default (null for the nullable fields [[AvroFormat.toAvroSchema]]
  * declares); matching fields may be reordered. Record names must
  * match — payloads framed by this encoder use the same
  * "graft.avro.row" name the reader expects.
  */
trait SchemaRegistry extends Serializable {
  /** The avro schema JSON registered under this global id. */
  def schemaById(id: Int): String
  /** Register (idempotently) and return the schema's global id. */
  def register(subject: String, schemaJson: String): Int
}

/** In-process registry store, keyed by `fake://name` url so
  * independent tests don't share state. Confluent semantics: ids are
  * GLOBAL per distinct schema text (re-registering the same schema
  * under any subject returns the same id); subjects track their
  * latest schema.
  */
object FakeRegistry {
  final class State {
    val byId = new ConcurrentHashMap[Int, String]()
    val idBySchema = new ConcurrentHashMap[String, Integer]()
    val bySubject = new ConcurrentHashMap[String, Integer]()
    val nextId = new AtomicInteger(0)
  }
  private val byUrl = new ConcurrentHashMap[String, State]()
  def state(url: String): State =
    byUrl.computeIfAbsent(url, _ => new State)
  def clear(url: String): Unit = byUrl.remove(url)
}

final case class FakeRegistryClient(url: String) extends SchemaRegistry {
  private def s = FakeRegistry.state(url)
  def schemaById(id: Int): String = {
    val r = s.byId.get(id)
    require(r != null, s"schema registry $url: no schema with id $id")
    r
  }
  def register(subject: String, schemaJson: String): Int = {
    val id = s.idBySchema.computeIfAbsent(schemaJson,
      _ => Int.box(s.nextId.incrementAndGet()))
    s.byId.put(id, schemaJson)
    s.bySubject.put(subject, id)
    id
  }
  /** Latest schema id registered under a subject (the Confluent
    * `GET /subjects/<s>/versions/latest` lookup).
    */
  def latestId(subject: String): Option[Int] =
    Option(s.bySubject.get(subject)).map(_.intValue())
}

/** Real HTTP client for the PUBLIC Confluent Schema Registry REST
  * API (docs.confluent.io/platform/current/schema-registry/develop/
  * api.html): `GET /schemas/ids/{id}` to resolve a writer schema,
  * `POST /subjects/{subject}/versions` to register. Bodies are the
  * published `{"schema": "<json-escaped avro schema>"}` envelope with
  * the v1 content type; Jackson (on Spark's classpath) handles the
  * escaping. The client is consulted once per distinct schema id per
  * expression (the decode path caches readers), so the HTTP hop is
  * O(distinct schemas), never per record.
  *
  * SchemaRegistryHttpSpec drives this client against an in-process
  * JDK HttpServer speaking the same API — the full wire path runs in
  * this container; a production registry only changes the url.
  */
final case class HttpRegistryClient(url: String) extends SchemaRegistry {
  @transient private lazy val http = java.net.http.HttpClient.newHttpClient()
  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()
  private def base = url.stripSuffix("/")

  def schemaById(id: Int): String = {
    val resp = http.send(
      java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"$base/schemas/ids/$id"))
        .header("Accept", "application/vnd.schemaregistry.v1+json").GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200,
      s"schema registry $url: GET /schemas/ids/$id -> ${resp.statusCode()} ${resp.body()}")
    val node = mapper.readTree(resp.body())
    require(node.has("schema"), s"schema registry $url: no 'schema' in ${resp.body()}")
    node.get("schema").asText()
  }

  def register(subject: String, schemaJson: String): Int = {
    val body = mapper.createObjectNode()
    body.put("schema", schemaJson)
    val resp = http.send(
      java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"$base/subjects/$subject/versions"))
        .header("Content-Type", "application/vnd.schemaregistry.v1+json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(body)))
        .build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200,
      s"schema registry $url: POST /subjects/$subject/versions -> " +
        s"${resp.statusCode()} ${resp.body()}")
    val node = mapper.readTree(resp.body())
    require(node.has("id"), s"schema registry $url: no 'id' in ${resp.body()}")
    node.get("id").asInt()
  }
}

object RegistryClients {
  def forUrl(url: String): SchemaRegistry =
    if (url.startsWith("fake://")) FakeRegistryClient(url)
    else if (url.startsWith("http://") || url.startsWith("https://"))
      HttpRegistryClient(url)
    else sys.error(
      s"avro-confluent registry '$url': use http(s):// for a Schema " +
        "Registry service or fake://<name> for an in-process registry")
}

object AvroConfluentCodec {

  val Magic: Byte = 0x00

  /** magic(1) + schema id (int32 BE) + avro binary body. */
  def frame(id: Int, body: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](5 + body.length)
    out(0) = Magic
    out(1) = (id >>> 24).toByte; out(2) = (id >>> 16).toByte
    out(3) = (id >>> 8).toByte; out(4) = id.toByte
    System.arraycopy(body, 0, out, 5, body.length)
    out
  }

  def schemaId(b: Array[Byte]): Int = {
    require(b.length >= 5, s"avro-confluent payload too short (${b.length} bytes)")
    require(b(0) == Magic,
      f"avro-confluent payload: unknown magic byte 0x${b(0)}%02x (expected 0x00)")
    ((b(1) & 0xff) << 24) | ((b(2) & 0xff) << 16) | ((b(3) & 0xff) << 8) | (b(4) & 0xff)
  }

  /** GenericRecord (in reader-schema field order = `schema` order) →
    * InternalRow.
    */
  def toRow(rec: GenericRecord, schema: StructType): InternalRow = {
    val vals = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      val v = rec.get(i)
      vals(i) =
        if (v == null) null
        else schema.fields(i).dataType match {
          case StringType => UTF8String.fromString(v.toString)
          case BinaryType =>
            val bb = v.asInstanceOf[java.nio.ByteBuffer]
            val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
          case TimestampType => v.asInstanceOf[java.lang.Long].longValue() // micros
          case st: StructType => toRow(v.asInstanceOf[GenericRecord], st)
          case _ => v
        }
      i += 1
    }
    new GenericInternalRow(vals)
  }

  /** InternalRow → GenericRecord under `avroSchema` (field order =
    * `schema` order; Spark internal timestamp micros map straight to
    * timestamp-micros).
    */
  def fromRow(row: InternalRow, schema: StructType, avroSchema: ASchema): GenericRecord = {
    val rec = new GenericData.Record(avroSchema)
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        val v: AnyRef = schema.fields(i).dataType match {
          case LongType | TimestampType => Long.box(row.getLong(i))
          case IntegerType => Int.box(row.getInt(i))
          case DoubleType => Double.box(row.getDouble(i))
          case FloatType => Float.box(row.getFloat(i))
          case BooleanType => Boolean.box(row.getBoolean(i))
          case StringType => row.getUTF8String(i).toString
          case BinaryType => java.nio.ByteBuffer.wrap(row.getBinary(i))
          case st: StructType =>
            // the avro field schema, unwrapped from the nullable union
            val fs = avroSchema.getFields.get(i).schema()
            val sub =
              if (fs.getType == ASchema.Type.UNION) {
                import scala.jdk.CollectionConverters._
                fs.getTypes.asScala.find(_.getType != ASchema.Type.NULL).get
              } else fs
            fromRow(row.getStruct(i, st.length), st, sub)
          case other => sys.error(s"avro-confluent format does not support type ${other.sql}")
        }
        rec.put(i, v)
      }
      i += 1
    }
    rec
  }

  /** Walk reader and writer schemas in parallel (fields matched by
    * name, nullable unions unwrapped) and alias every reader record
    * whose full name differs from the writer's — avro resolution
    * rejects record pairs whose names neither match nor alias.
    */
  def aliasToWriter(reader: ASchema, writer: ASchema): Unit = {
    import scala.jdk.CollectionConverters._
    def nonNull(s: ASchema): ASchema =
      if (s.getType == ASchema.Type.UNION)
        s.getTypes.asScala.find(_.getType != ASchema.Type.NULL).getOrElse(s)
      else s
    val r = nonNull(reader); val w = nonNull(writer)
    if (r.getType == ASchema.Type.RECORD && w.getType == ASchema.Type.RECORD) {
      if (r.getFullName != w.getFullName)
        // explicit "" keeps a namespace-less writer name unqualified
        // (null would default to the READER's namespace)
        r.addAlias(w.getName, Option(w.getNamespace).getOrElse(""))
      r.getFields.asScala.foreach { rf =>
        Option(w.getField(rf.name())).foreach(wf =>
          aliasToWriter(rf.schema(), wf.schema()))
      }
    }
  }

  def validate(schema: StructType, what: String): Unit =
    schema.fields.foreach(f => f.dataType match {
      case st: StructType => validate(st, what) // nested record
      case t => require(Set[DataType](LongType, IntegerType,
          DoubleType, FloatType, BooleanType, StringType, BinaryType,
          TimestampType).contains(t),
        s"avro-confluent format on $what does not support type ${t.sql}")
    })
}

/** Decode an avro-confluent envelope column to a STRUCT of the
  * declared fields. Per-id datum readers are cached across rows —
  * the registry is consulted once per distinct writer schema id, not
  * per record (the reference caches identically in its
  * SchemaCoderProvider). CodegenFallback: the avro datum reader is
  * the per-record cost either way.
  */
case class AvroConfluentDecode(child: Expression, schema: StructType, url: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = schema
  override def nullIntolerant: Boolean = true
  @transient private lazy val client = RegistryClients.forUrl(url)
  @transient private lazy val readerSchema = AvroFormat.toAvroSchema(schema)
  @transient private lazy val readers =
    new java.util.HashMap[Int, GenericDatumReader[GenericRecord]]()
  // decoder + record reused across rows (the avro factory takes them
  // as reuse arguments for exactly this) — the expression instance is
  // per-task, so no sharing across threads
  @transient private var decoderReuse: org.apache.avro.io.BinaryDecoder = _
  @transient private var recordReuse: GenericRecord = _
  override def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    val id = AvroConfluentCodec.schemaId(b)
    var r = readers.get(id)
    if (r == null) {
      val writer = new ASchema.Parser().parse(client.schemaById(id))
      // avro resolution matches records by FULL NAME: a foreign
      // producer names its records (top-level AND nested — a debezium
      // envelope's before/after images are records too) whatever its
      // schema says, so alias the reader's records to the writer's
      // names recursively (fresh reader schema per distinct writer —
      // addAlias mutates)
      val rs = AvroFormat.toAvroSchema(schema)
      AvroConfluentCodec.aliasToWriter(rs, writer)
      r = new GenericDatumReader[GenericRecord](writer, rs)
      readers.put(id, r)
    }
    decoderReuse = DecoderFactory.get().binaryDecoder(b, 5, b.length - 5, decoderReuse)
    recordReuse = r.read(recordReuse, decoderReuse)
    AvroConfluentCodec.toRow(recordReuse, schema)
  }
  override protected def withNewChildInternal(c: Expression): AvroConfluentDecode =
    copy(child = c)
  override def prettyName: String = "avro_confluent_decode"
}

/** Encode a STRUCT column to an avro-confluent envelope: the schema
  * registers under `subject` on first use (per task) and every
  * payload carries the assigned id.
  */
case class AvroConfluentEncode(child: Expression, schema: StructType, url: String,
    subject: String) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  @transient private lazy val avroSchema = AvroFormat.toAvroSchema(schema)
  @transient private lazy val id =
    RegistryClients.forUrl(url).register(subject, avroSchema.toString)
  @transient private lazy val writer = new GenericDatumWriter[GenericRecord](avroSchema)
  // buffer + encoder reused across rows (reset, not reallocated) —
  // per-task instance, single-threaded
  @transient private lazy val out = new java.io.ByteArrayOutputStream(64)
  @transient private var encoderReuse: org.apache.avro.io.BinaryEncoder = _
  override def nullSafeEval(v: Any): Any = {
    val rec = AvroConfluentCodec.fromRow(v.asInstanceOf[InternalRow], schema, avroSchema)
    out.reset()
    encoderReuse = EncoderFactory.get().binaryEncoder(out, encoderReuse)
    writer.write(rec, encoderReuse)
    encoderReuse.flush()
    AvroConfluentCodec.frame(id, out.toByteArray)
  }
  override protected def withNewChildInternal(c: Expression): AvroConfluentEncode =
    copy(child = c)
  override def prettyName: String = "avro_confluent_encode"
}

object AvroConfluentFormat {

  /** `avro-confluent.url` (flink's option name), side-prefixed keys
    * win over bare ones.
    */
  def registryUrl(opts: Map[String, String], prefix: String): String =
    opts.get(s"${prefix}avro-confluent.url").orElse(opts.get("avro-confluent.url"))
      .getOrElse(sys.error("avro-confluent format needs 'avro-confluent.url'"))

  /** Subject override (`avro-confluent.subject`), else the Confluent
    * TopicNameStrategy default `<topic>-value` / `<topic>-key`.
    */
  def subject(opts: Map[String, String], prefix: String, topic: String): String =
    opts.get(s"${prefix}avro-confluent.subject")
      .orElse(opts.get("avro-confluent.subject"))
      .getOrElse(s"$topic-${if (prefix == "key.") "key" else "value"}")

  def decode(payload: Column, schema: StructType, opts: Map[String, String],
      prefix: String = ""): Column = {
    AvroConfluentCodec.validate(schema, "decode")
    ColumnBridge.column(AvroConfluentDecode(ColumnBridge.expression(payload),
      schema, registryUrl(opts, prefix)))
  }

  def encode(row: Column, schema: StructType, opts: Map[String, String],
      prefix: String = "", topic: String = ""): Column = {
    AvroConfluentCodec.validate(schema, "encode")
    ColumnBridge.column(AvroConfluentEncode(ColumnBridge.expression(row),
      schema, registryUrl(opts, prefix), subject(opts, prefix, topic)))
  }
}
