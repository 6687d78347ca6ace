package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hand-rolled protobuf WIRE-format codec — the reference ships
  * flink-formats/flink-protobuf (PbRowDataDeserializationSchema.java)
  * on protobuf-java; this container has no standalone protobuf-java
  * jar (only copies shaded into the ORC jars — an internal namespace,
  * not an API), so the codec implements the public wire format
  * directly (https://protobuf.dev/programming-guides/encoding/):
  * varint (wire type 0) for int32/int64/bool, fixed64 (1) for double,
  * fixed32 (5) for float, length-delimited (2) for string/bytes.
  *
  * Descriptor source: the reference derives the message layout from a
  * compiled class ('protobuf.message-class-name'); without a jar to
  * load classes from, this factory derives it from the DDL schema —
  * column i maps to field number i+1, overridable with
  * 'protobuf.field-numbers' = '1,2,4'. proto3 value semantics: encode
  * omits null fields; decode initializes every field to its proto3
  * default (0 / "" / false) and fills what the payload carries;
  * unknown field numbers are skipped by wire type, so readers with a
  * narrower schema than the writer still decode (the proto forward-
  * compat contract). Nested/repeated messages are out of scope —
  * documented residue, flat rows only.
  */
/** One column's wire mapping — top-level so generated Java code can
  * name the array type directly.
  */
final case class PbFieldSpec(number: Int, dataType: DataType)

/** A message layout with per-row lookup structures precomputed ONCE —
  * the decode hot path must not rebuild a number→index map per row
  * (600k rows × 4 fields made that the whole query cost). Referenced
  * from generated code via addReferenceObj; the lazy vals rebuild
  * after deserialization on each executor.
  */
final class PbMsg(val specs: Array[PbFieldSpec]) extends Serializable {
  /** field number → column index, -1 = unknown (skip by wire type) */
  @transient lazy val numToIdx: Array[Int] = {
    val a = Array.fill(specs.map(_.number).max + 1)(-1)
    specs.zipWithIndex.foreach { case (sp, i) => a(sp.number) = i }
    a
  }
  /** proto3 default values, cloned into each decoded row */
  @transient lazy val defaults: Array[Any] = specs.map { sp =>
    (sp.dataType match {
      case LongType => 0L
      case IntegerType => 0
      case BooleanType => false
      case DoubleType => 0.0d
      case FloatType => 0.0f
      case StringType => UTF8String.EMPTY_UTF8
      case BinaryType => Array.emptyByteArray
      case other => sys.error(s"protobuf format does not support type $other")
    }): Any
  }
}

object PbCodec {

  /** Column-position → field-number mapping from the table options. */
  def fieldSpecs(schema: StructType, opts: Map[String, String],
      prefix: String = ""): Array[PbFieldSpec] = {
    val nums = opts.get(s"${prefix}protobuf.field-numbers")
      .orElse(opts.get("protobuf.field-numbers"))
      .map(_.split(",").map(_.trim.toInt))
      .getOrElse(Array.tabulate(schema.length)(_ + 1))
    require(nums.length == schema.length,
      s"protobuf.field-numbers has ${nums.length} entries for ${schema.length} columns")
    require(nums.forall(_ >= 1) && nums.distinct.length == nums.length,
      s"protobuf field numbers must be distinct and >= 1, got ${nums.mkString(",")}")
    // the wire format allows numbers up to 2^29-1, but the decode
    // lookup is a dense number→index array — an unbounded number
    // would allocate gigabytes per task. 1e6 covers every real
    // message at a 4 MB lookup worst case; fail loudly beyond it
    require(nums.forall(_ <= 1000000),
      s"protobuf field numbers above 1000000 are not supported by this " +
        s"factory (dense decode lookup), got ${nums.max}")
    nums.lazyZip(schema.fields).map((n, f) => PbFieldSpec(n, f.dataType)).toArray
  }

  def validate(schema: StructType, what: String): Unit =
    schema.fields.foreach(f => require(SupportedTypes.contains(f.dataType),
      s"protobuf format on $what does not support type ${f.dataType.sql}"))

  val SupportedTypes: Set[DataType] = Set(LongType, IntegerType, DoubleType,
    FloatType, BooleanType, StringType, BinaryType)

  // ---- wire primitives ------------------------------------------------

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  /** Encode one InternalRow to a protobuf message payload. */
  def encode(row: InternalRow, specs: Array[PbFieldSpec]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    var i = 0
    while (i < specs.length) {
      if (!row.isNullAt(i)) {
        val s = specs(i)
        s.dataType match {
          case LongType =>
            writeVarint(out, (s.number.toLong << 3) | 0); writeVarint(out, row.getLong(i))
          case IntegerType =>
            // int32: negative values sign-extend to 10 bytes, per spec
            writeVarint(out, (s.number.toLong << 3) | 0); writeVarint(out, row.getInt(i).toLong)
          case BooleanType =>
            writeVarint(out, (s.number.toLong << 3) | 0)
            writeVarint(out, if (row.getBoolean(i)) 1L else 0L)
          case DoubleType =>
            writeVarint(out, (s.number.toLong << 3) | 1)
            val bits = java.lang.Double.doubleToLongBits(row.getDouble(i))
            var k = 0
            while (k < 8) { out.write(((bits >>> (8 * k)) & 0xff).toInt); k += 1 }
          case FloatType =>
            writeVarint(out, (s.number.toLong << 3) | 5)
            val bits = java.lang.Float.floatToIntBits(row.getFloat(i))
            var k = 0
            while (k < 4) { out.write(((bits >>> (8 * k)) & 0xff).toInt); k += 1 }
          case StringType =>
            val b = row.getUTF8String(i).getBytes
            writeVarint(out, (s.number.toLong << 3) | 2); writeVarint(out, b.length.toLong)
            out.write(b, 0, b.length)
          case BinaryType =>
            val b = row.getBinary(i)
            writeVarint(out, (s.number.toLong << 3) | 2); writeVarint(out, b.length.toLong)
            out.write(b, 0, b.length)
          case other => sys.error(s"protobuf format does not support type $other")
        }
      }
      i += 1
    }
    out.toByteArray
  }

  /** Spec/test convenience: per-call PbMsg wrap. */
  def decode(b: Array[Byte], specs: Array[PbFieldSpec]): InternalRow =
    decode(b, new PbMsg(specs))

  /** Decode a protobuf message payload to an InternalRow with proto3
    * default values for absent fields. Hot path: no per-row
    * allocation beyond the row itself.
    */
  def decode(b: Array[Byte], msg: PbMsg): InternalRow = {
    val specs = msg.specs
    val numToIdx = msg.numToIdx
    val row = new GenericInternalRow(msg.defaults.clone())
    var pos = 0
    def varint(): Long = {
      var shift = 0; var v = 0L
      while ({ val x = b(pos); pos += 1; v |= (x & 0x7fL) << shift; shift += 7
        (x & 0x80) != 0 }) ()
      v
    }
    while (pos < b.length) {
      val tag = varint()
      val number = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      val idx0 = if (number < numToIdx.length) numToIdx(number) else -1
      idx0 match {
        case idx if idx >= 0 =>
          val dt = specs(idx).dataType
          wire match {
            case 0 =>
              val v = varint()
              dt match {
                case LongType => row.update(idx, v)
                case IntegerType => row.update(idx, v.toInt)
                case BooleanType => row.update(idx, v != 0L)
                case other => sys.error(
                  s"protobuf field $number: varint payload for declared type ${other.sql}")
              }
            case 1 =>
              var bits = 0L; var k = 0
              while (k < 8) { bits |= (b(pos + k) & 0xffL) << (8 * k); k += 1 }
              pos += 8
              dt match {
                case DoubleType => row.update(idx, java.lang.Double.longBitsToDouble(bits))
                case other => sys.error(
                  s"protobuf field $number: fixed64 payload for declared type ${other.sql}")
              }
            case 5 =>
              var bits = 0; var k = 0
              while (k < 4) { bits |= (b(pos + k) & 0xff) << (8 * k); k += 1 }
              pos += 4
              dt match {
                case FloatType => row.update(idx, java.lang.Float.intBitsToFloat(bits))
                case other => sys.error(
                  s"protobuf field $number: fixed32 payload for declared type ${other.sql}")
              }
            case 2 =>
              val len = varint().toInt
              dt match {
                case StringType => row.update(idx, UTF8String.fromBytes(b, pos, len))
                case BinaryType => row.update(idx, java.util.Arrays.copyOfRange(b, pos, pos + len))
                case other => sys.error(
                  s"protobuf field $number: length-delimited payload for declared type ${other.sql}")
              }
              pos += len
            case w => sys.error(s"protobuf: unsupported wire type $w at field $number")
          }
        case _ => // unknown field: skip by wire type (forward compat)
          wire match {
            case 0 => varint()
            case 1 => pos += 8
            case 5 => pos += 4
            case 2 => pos += varint().toInt
            case w => sys.error(s"protobuf: unsupported wire type $w in unknown field $number")
          }
      }
    }
    row
  }
}

/** Decode a protobuf payload column to a STRUCT of the declared
  * fields. Codegen'd via a schema reference object — the specs array
  * rides along the generated class, no per-row setup.
  */
case class PbDecode(child: Expression, schema: StructType,
    specs: Array[PbFieldSpec]) extends UnaryExpression {
  @transient private lazy val msg = new PbMsg(specs)
  override def dataType: DataType = schema
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    PbCodec.decode(v.asInstanceOf[Array[Byte]], msg)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pbMsg", msg, "graft.sources.PbMsg")
    defineCodeGen(ctx, ev, c => s"graft.sources.PbCodec.decode($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): PbDecode = copy(child = c)
  override def prettyName: String = "pb_decode"
}

/** Encode a STRUCT column to a protobuf payload. */
case class PbEncode(child: Expression, specs: Array[PbFieldSpec])
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    PbCodec.encode(v.asInstanceOf[InternalRow], specs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pbSpecs", specs, "graft.sources.PbFieldSpec[]")
    defineCodeGen(ctx, ev, c => s"graft.sources.PbCodec.encode($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): PbEncode = copy(child = c)
  override def prettyName: String = "pb_encode"
}

object PbFormat {
  def decode(payload: Column, schema: StructType, opts: Map[String, String],
      prefix: String = ""): Column = {
    PbCodec.validate(schema, "decode")
    ColumnBridge.column(PbDecode(ColumnBridge.expression(payload), schema,
      PbCodec.fieldSpecs(schema, opts, prefix)))
  }
  def encode(row: Column, schema: StructType, opts: Map[String, String],
      prefix: String = ""): Column = {
    PbCodec.validate(schema, "encode")
    ColumnBridge.column(PbEncode(ColumnBridge.expression(row),
      PbCodec.fieldSpecs(schema, opts, prefix)))
  }
}
