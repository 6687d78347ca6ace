package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static codec behind the raw format's codegen'd expressions: one
  * kafka/file byte payload <-> one typed value. Numeric widths are
  * exact — a BIGINT payload must be 8 bytes, like the reference's
  * deserializer, so a mis-declared schema fails loudly instead of
  * decoding garbage.
  */
object RawCodec {

  private def buf(b: Array[Byte], width: Int, big: Boolean, what: String): ByteBuffer = {
    require(b.length == width,
      s"raw format: $what payload must be $width bytes, got ${b.length}")
    ByteBuffer.wrap(b).order(
      if (big) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
  }

  def decodeBoolean(b: Array[Byte]): Boolean = {
    require(b.length == 1, s"raw format: BOOLEAN payload must be 1 byte, got ${b.length}")
    b(0) != 0
  }
  def decodeByte(b: Array[Byte]): Byte = {
    require(b.length == 1, s"raw format: TINYINT payload must be 1 byte, got ${b.length}")
    b(0)
  }
  def decodeShort(b: Array[Byte], big: Boolean): Short = buf(b, 2, big, "SMALLINT").getShort
  def decodeInt(b: Array[Byte], big: Boolean): Int = buf(b, 4, big, "INT").getInt
  def decodeLong(b: Array[Byte], big: Boolean): Long = buf(b, 8, big, "BIGINT").getLong
  def decodeFloat(b: Array[Byte], big: Boolean): Float = buf(b, 4, big, "FLOAT").getFloat
  def decodeDouble(b: Array[Byte], big: Boolean): Double = buf(b, 8, big, "DOUBLE").getDouble
  def decodeString(b: Array[Byte], charset: String): UTF8String =
    if (charset == "UTF-8") UTF8String.fromBytes(b)
    else UTF8String.fromString(new String(b, charset))

  private def alloc(width: Int, big: Boolean): ByteBuffer =
    ByteBuffer.allocate(width).order(
      if (big) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)

  def encodeBoolean(v: Boolean): Array[Byte] = Array(if (v) 1.toByte else 0.toByte)
  def encodeByte(v: Byte): Array[Byte] = Array(v)
  def encodeShort(v: Short, big: Boolean): Array[Byte] = alloc(2, big).putShort(v).array()
  def encodeInt(v: Int, big: Boolean): Array[Byte] = alloc(4, big).putInt(v).array()
  def encodeLong(v: Long, big: Boolean): Array[Byte] = alloc(8, big).putLong(v).array()
  def encodeFloat(v: Float, big: Boolean): Array[Byte] = alloc(4, big).putFloat(v).array()
  def encodeDouble(v: Double, big: Boolean): Array[Byte] = alloc(8, big).putDouble(v).array()
  def encodeString(v: UTF8String, charset: String): Array[Byte] =
    if (charset == "UTF-8") v.getBytes
    else v.toString.getBytes(charset)
}

/** Decode a raw-format binary payload to `targetType` — the read half
  * of the reference's raw format (flink-formats/flink-format-raw
  * RawFormatDeserializationSchema.java): a single physical column,
  * configurable endianness for numerics and charset for strings.
  * Codegen'd static calls, no UDF boxing.
  */
case class RawDecode(child: Expression, targetType: DataType,
    bigEndian: Boolean, charset: String) extends UnaryExpression {
  override def dataType: DataType = targetType
  override def nullIntolerant: Boolean = true

  private def call(c: String): String = targetType match {
    case StringType => s"""graft.sources.RawCodec.decodeString($c, "$charset")"""
    case BooleanType => s"graft.sources.RawCodec.decodeBoolean($c)"
    case ByteType => s"graft.sources.RawCodec.decodeByte($c)"
    case ShortType => s"graft.sources.RawCodec.decodeShort($c, $bigEndian)"
    case IntegerType => s"graft.sources.RawCodec.decodeInt($c, $bigEndian)"
    case LongType => s"graft.sources.RawCodec.decodeLong($c, $bigEndian)"
    case FloatType => s"graft.sources.RawCodec.decodeFloat($c, $bigEndian)"
    case DoubleType => s"graft.sources.RawCodec.decodeDouble($c, $bigEndian)"
    case BinaryType => c
    case other => sys.error(s"raw format does not support type $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    targetType match {
      case StringType => RawCodec.decodeString(b, charset)
      case BooleanType => RawCodec.decodeBoolean(b)
      case ByteType => RawCodec.decodeByte(b)
      case ShortType => RawCodec.decodeShort(b, bigEndian)
      case IntegerType => RawCodec.decodeInt(b, bigEndian)
      case LongType => RawCodec.decodeLong(b, bigEndian)
      case FloatType => RawCodec.decodeFloat(b, bigEndian)
      case DoubleType => RawCodec.decodeDouble(b, bigEndian)
      case BinaryType => b
      case other => sys.error(s"raw format does not support type $other")
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, call)
  override protected def withNewChildInternal(c: Expression): RawDecode = copy(child = c)
  override def prettyName: String = "raw_decode"
}

/** Encode a typed value to the raw format's binary payload — the
  * write half (RawFormatSerializationSchema.java).
  */
case class RawEncode(child: Expression, bigEndian: Boolean, charset: String)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  private def call(c: String): String = child.dataType match {
    case StringType => s"""graft.sources.RawCodec.encodeString($c, "$charset")"""
    case BooleanType => s"graft.sources.RawCodec.encodeBoolean($c)"
    case ByteType => s"graft.sources.RawCodec.encodeByte($c)"
    case ShortType => s"graft.sources.RawCodec.encodeShort($c, $bigEndian)"
    case IntegerType => s"graft.sources.RawCodec.encodeInt($c, $bigEndian)"
    case LongType => s"graft.sources.RawCodec.encodeLong($c, $bigEndian)"
    case FloatType => s"graft.sources.RawCodec.encodeFloat($c, $bigEndian)"
    case DoubleType => s"graft.sources.RawCodec.encodeDouble($c, $bigEndian)"
    case BinaryType => c
    case other => sys.error(s"raw format does not support type $other")
  }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => RawCodec.encodeString(v.asInstanceOf[UTF8String], charset)
    case BooleanType => RawCodec.encodeBoolean(v.asInstanceOf[Boolean])
    case ByteType => RawCodec.encodeByte(v.asInstanceOf[Byte])
    case ShortType => RawCodec.encodeShort(v.asInstanceOf[Short], bigEndian)
    case IntegerType => RawCodec.encodeInt(v.asInstanceOf[Int], bigEndian)
    case LongType => RawCodec.encodeLong(v.asInstanceOf[Long], bigEndian)
    case FloatType => RawCodec.encodeFloat(v.asInstanceOf[Float], bigEndian)
    case DoubleType => RawCodec.encodeDouble(v.asInstanceOf[Double], bigEndian)
    case BinaryType => v
    case other => sys.error(s"raw format does not support type $other")
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, call)
  override protected def withNewChildInternal(c: Expression): RawEncode = copy(child = c)
  override def prettyName: String = "raw_encode"
}

/** The raw format (flink-formats/flink-format-raw RawFormatFactory):
  * a single physical column mapped 1:1 onto the payload bytes of a
  * kafka record or a binary file. Options mirror the reference:
  * `raw.endianness` = big-endian (default) | little-endian for
  * numeric types, `raw.charset` = UTF-8 (default) for strings. The
  * declared schema must have exactly one physical column of a
  * supported type — multi-column schemas are rejected at translate
  * time, like the factory's validation.
  */
object RawFormat {

  val SupportedTypes: Set[DataType] = Set(StringType, BinaryType, BooleanType,
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)

  final case class RawOptions(bigEndian: Boolean, charset: String)

  def options(opts: Map[String, String], prefix: String = ""): RawOptions = {
    // 'value.raw.endianness' when declared via 'value.format', plain
    // 'raw.endianness' when declared via 'format' — same fallback the
    // reference's key/value format option forwarding performs
    def get(k: String, dflt: String) =
      opts.getOrElse(prefix + k, opts.getOrElse(k, dflt))
    val endian = get("raw.endianness", "big-endian")
    require(Set("big-endian", "little-endian").contains(endian),
      s"raw.endianness must be big-endian or little-endian, got '$endian'")
    RawOptions(endian == "big-endian", get("raw.charset", "UTF-8"))
  }

  /** The single physical field a raw schema is allowed to carry. */
  def singleField(schema: StructType, what: String): StructField = {
    require(schema.fields.length == 1,
      s"raw format on $what needs exactly one physical column, got " +
        s"${schema.fields.length} (${schema.fieldNames.mkString(", ")})")
    val f = schema.fields.head
    require(SupportedTypes.contains(f.dataType),
      s"raw format on $what does not support type ${f.dataType.sql}")
    f
  }

  def decode(payload: Column, dt: DataType, o: RawOptions): Column =
    ColumnBridge.column(RawDecode(ColumnBridge.expression(payload), dt, o.bigEndian, o.charset))
  def encode(value: Column, o: RawOptions): Column =
    ColumnBridge.column(RawEncode(ColumnBridge.expression(value), o.bigEndian, o.charset))
}
