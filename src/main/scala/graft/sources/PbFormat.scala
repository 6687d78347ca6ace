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
  * compat contract).
  *
  * Composite types (flink-protobuf PbCodegenDeserializeFactory.java
  * dispatches the same three shapes):
  *  - STRUCT column  → nested message (len-delimited submessage);
  *    nested field numbers are positional (i+1) within each level.
  *  - ARRAY column   → repeated field; numeric/bool elements encode
  *    PACKED (proto3 default, one len-delimited run), strings/bytes/
  *    messages encode as one record per element; decode accepts both
  *    packed and unpacked, as the spec requires of all parsers.
  *  - MAP column     → the published map encoding: repeated entry
  *    messages with key = field 1, value = field 2.
  */
/** One column's wire mapping — top-level so generated Java code can
  * name the array type directly. `children` describes a nested
  * message's fields (for ARRAY of struct: the ELEMENT's fields; for
  * MAP: key as field 1, value as field 2).
  */
final case class PbFieldSpec(number: Int, dataType: DataType,
    children: Array[PbFieldSpec] = Array.empty)

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
  /** proto3 default values, cloned into each decoded row. Composite
    * defaults (empty array/map) are immutable and safely SHARED
    * across rows — only the outer array is cloned per row.
    */
  @transient lazy val defaults: Array[Any] = specs.map { sp =>
    (sp.dataType match {
      case LongType => 0L
      case IntegerType => 0
      case BooleanType => false
      case DoubleType => 0.0d
      case FloatType => 0.0f
      case StringType => UTF8String.EMPTY_UTF8
      case BinaryType => Array.emptyByteArray
      case _: ArrayType => new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
      case _: MapType => org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
        Array.empty[Any], Array.empty[Any])
      case _: StructType => null // proto3: absent message field = not set
      case other => sys.error(s"protobuf format does not support type $other")
    }): Any
  }
  /** Per-field submessage layout (struct fields / array element
    * struct fields / map entry), null for scalar fields.
    */
  @transient lazy val childMsgs: Array[PbMsg] = specs.map { sp =>
    if (sp.children.nonEmpty) new PbMsg(sp.children) else null
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
    nums.lazyZip(schema.fields).map((n, f) =>
      PbFieldSpec(n, f.dataType, childSpecs(f.dataType))).toArray
  }

  /** Nested layouts are positional (field i → number i+1) at every
    * level below the top; maps use the fixed entry layout key=1,
    * value=2 from the encoding guide.
    */
  private def childSpecs(dt: DataType): Array[PbFieldSpec] = dt match {
    case st: StructType =>
      st.fields.zipWithIndex.map { case (f, i) =>
        PbFieldSpec(i + 1, f.dataType, childSpecs(f.dataType)) }
    case ArrayType(et, _) => childSpecs(et)
    case MapType(kt, vt, _) =>
      Array(PbFieldSpec(1, kt, childSpecs(kt)), PbFieldSpec(2, vt, childSpecs(vt)))
    case _ => Array.empty
  }

  def validate(schema: StructType, what: String): Unit =
    schema.fields.foreach(f => validateType(f.dataType, what))

  private def validateType(dt: DataType, what: String): Unit = dt match {
    case st: StructType => st.fields.foreach(f => validateType(f.dataType, what))
    case ArrayType(et, _) =>
      // protobuf has no repeated-of-repeated / repeated-of-map — the
      // proto language requires an intermediate message, so mirror
      // that shape in the DDL (ARRAY<STRUCT<...>>)
      require(!et.isInstanceOf[ArrayType] && !et.isInstanceOf[MapType],
        s"protobuf format on $what: ARRAY of ${et.sql} is not expressible in " +
          "protobuf — wrap the element in a STRUCT (proto's wrapper-message rule)")
      validateType(et, what)
    case MapType(kt, vt, _) =>
      // proto map keys: integral/bool/string only (no float/bytes)
      require(Set[DataType](LongType, IntegerType, BooleanType, StringType).contains(kt),
        s"protobuf format on $what: map key type ${kt.sql} is not a valid " +
          "proto map key (integral, bool or string)")
      require(!vt.isInstanceOf[ArrayType] && !vt.isInstanceOf[MapType],
        s"protobuf format on $what: map value ${vt.sql} is not expressible in " +
          "protobuf — wrap it in a STRUCT (proto's wrapper-message rule)")
      validateType(vt, what)
    case t => require(SupportedTypes.contains(t),
      s"protobuf format on $what does not support type ${t.sql}")
  }

  val SupportedTypes: Set[DataType] = Set(LongType, IntegerType, DoubleType,
    FloatType, BooleanType, StringType, BinaryType)

  // ---- wire primitives ------------------------------------------------

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def writeFixed64(out: java.io.ByteArrayOutputStream, bits: Long): Unit = {
    var k = 0
    while (k < 8) { out.write(((bits >>> (8 * k)) & 0xff).toInt); k += 1 }
  }
  private def writeFixed32(out: java.io.ByteArrayOutputStream, bits: Int): Unit = {
    var k = 0
    while (k < 4) { out.write(((bits >>> (8 * k)) & 0xff).toInt); k += 1 }
  }
  private def writeLenDelim(out: java.io.ByteArrayOutputStream, number: Int,
      b: Array[Byte]): Unit = {
    writeVarint(out, (number.toLong << 3) | 2)
    writeVarint(out, b.length.toLong)
    out.write(b, 0, b.length)
  }

  /** Per-thread reusable buffers, one per NESTING DEPTH (a nested
    * message encodes into the buffer one level down, then length-
    * prefixes into its parent via writeTo — no per-field byte[]):
    * the composite encode path allocated ~5 streams per row before,
    * the dominant cost of the composite bench query. Codegen
    * evaluates expressions on the task thread, so ThreadLocal is the
    * right scope.
    */
  private val scratch =
    new ThreadLocal[java.util.ArrayList[java.io.ByteArrayOutputStream]] {
      override def initialValue() =
        new java.util.ArrayList[java.io.ByteArrayOutputStream]()
    }
  private def borrow(depth: Int): java.io.ByteArrayOutputStream = {
    val pool = scratch.get()
    while (pool.size() <= depth)
      pool.add(new java.io.ByteArrayOutputStream(64))
    val b = pool.get(depth)
    b.reset()
    b
  }
  /** tag + length + the child buffer's bytes, copied straight out. */
  private def writeLenDelimBuf(out: java.io.ByteArrayOutputStream, number: Int,
      buf: java.io.ByteArrayOutputStream): Unit = {
    writeVarint(out, (number.toLong << 3) | 2)
    writeVarint(out, buf.size.toLong)
    buf.writeTo(out)
  }

  import org.apache.spark.sql.catalyst.expressions.SpecializedGetters

  /** One scalar element's bare payload (no tag) — shared by the
    * singular, packed-repeated and map-entry paths. `g` is either an
    * InternalRow or an ArrayData (both are SpecializedGetters).
    */
  private def writeBare(out: java.io.ByteArrayOutputStream, dt: DataType,
      g: SpecializedGetters, i: Int): Unit = dt match {
    case LongType => writeVarint(out, g.getLong(i))
    // int32: negative values sign-extend to 10 bytes, per spec
    case IntegerType => writeVarint(out, g.getInt(i).toLong)
    case BooleanType => writeVarint(out, if (g.getBoolean(i)) 1L else 0L)
    case DoubleType => writeFixed64(out, java.lang.Double.doubleToLongBits(g.getDouble(i)))
    case FloatType => writeFixed32(out, java.lang.Float.floatToIntBits(g.getFloat(i)))
    case other => sys.error(s"protobuf: no bare scalar encoding for type $other")
  }

  /** One tagged field (scalar, nested message, repeated or map).
    * `depth` indexes the scratch pool — each nesting level writes
    * into its own reusable buffer.
    */
  private def writeField(out: java.io.ByteArrayOutputStream, s: PbFieldSpec,
      g: SpecializedGetters, i: Int, depth: Int): Unit = s.dataType match {
    case LongType | IntegerType | BooleanType =>
      writeVarint(out, (s.number.toLong << 3) | 0); writeBare(out, s.dataType, g, i)
    case DoubleType =>
      writeVarint(out, (s.number.toLong << 3) | 1); writeBare(out, s.dataType, g, i)
    case FloatType =>
      writeVarint(out, (s.number.toLong << 3) | 5); writeBare(out, s.dataType, g, i)
    case StringType => writeLenDelim(out, s.number, g.getUTF8String(i).getBytes)
    case BinaryType => writeLenDelim(out, s.number, g.getBinary(i))
    case st: StructType => // nested message
      val buf = borrow(depth + 1)
      encodeInto(buf, g.getStruct(i, st.length), s.children, depth + 1)
      writeLenDelimBuf(out, s.number, buf)
    case ArrayType(et, _) =>
      val arr = g.getArray(i)
      val n = arr.numElements()
      // proto repeated fields have no null-element representation —
      // a silent skip would shift positions, so reject loudly
      var nn = 0
      while (nn < n) {
        if (arr.isNullAt(nn)) sys.error(
          s"protobuf repeated field ${s.number}: null array elements are not " +
            "encodable (proto repeated fields hold values only) — filter them out")
        nn += 1
      }
      et match {
        case LongType | IntegerType | BooleanType | DoubleType | FloatType =>
          // packed (proto3 default): one len-delimited run; empty
          // repeated emits nothing at all
          if (n > 0) {
            val buf = borrow(depth + 1)
            var k = 0
            while (k < n) { writeBare(buf, et, arr, k); k += 1 }
            writeLenDelimBuf(out, s.number, buf)
          }
        case StringType =>
          var k = 0
          while (k < n) { writeLenDelim(out, s.number, arr.getUTF8String(k).getBytes); k += 1 }
        case BinaryType =>
          var k = 0
          while (k < n) { writeLenDelim(out, s.number, arr.getBinary(k)); k += 1 }
        case est: StructType =>
          var k = 0
          while (k < n) {
            val buf = borrow(depth + 1)
            encodeInto(buf, arr.getStruct(k, est.length), s.children, depth + 1)
            writeLenDelimBuf(out, s.number, buf)
            k += 1
          }
        case other => sys.error(s"protobuf format does not support ARRAY of $other")
      }
    case MapType(_, _, _) =>
      // repeated entry messages {1: key, 2: value}
      val m = g.getMap(i)
      val keys = m.keyArray(); val vals = m.valueArray()
      var k = 0
      while (k < m.numElements()) {
        val entry = borrow(depth + 1)
        writeField(entry, s.children(0), keys, k, depth + 1)
        if (!vals.isNullAt(k)) writeField(entry, s.children(1), vals, k, depth + 1)
        writeLenDelimBuf(out, s.number, entry)
        k += 1
      }
    case other => sys.error(s"protobuf format does not support type $other")
  }

  private def encodeInto(out: java.io.ByteArrayOutputStream, row: InternalRow,
      specs: Array[PbFieldSpec], depth: Int): Unit = {
    var i = 0
    while (i < specs.length) {
      if (!row.isNullAt(i)) writeField(out, specs(i), row, i, depth)
      i += 1
    }
  }

  /** Pool entries larger than this are dropped after the encode —
    * ByteArrayOutputStream never shrinks on reset(), and executor
    * task threads are long-lived, so one multi-MB message would
    * otherwise pin its size per thread for the life of the JVM.
    */
  private val ShrinkThreshold = 1 << 20

  /** Encode one InternalRow to a protobuf message payload. */
  def encode(row: InternalRow, specs: Array[PbFieldSpec]): Array[Byte] = {
    val out = borrow(0)
    encodeInto(out, row, specs, 0)
    val bytes = out.toByteArray
    // nested buffers are bounded by the whole message, so the total
    // size decides for all of them
    if (bytes.length > ShrinkThreshold) scratch.get().clear()
    bytes
  }

  /** Spec/test convenience: per-call PbMsg wrap. */
  def decode(b: Array[Byte], specs: Array[PbFieldSpec]): InternalRow =
    decode(b, new PbMsg(specs))

  /** Decode a protobuf message payload to an InternalRow with proto3
    * default values for absent fields. Hot path: no per-row
    * allocation beyond the row itself.
    */
  def decode(b: Array[Byte], msg: PbMsg): InternalRow =
    decodeRange(b, 0, b.length, msg)

  /** Range decode — nested messages and map entries decode IN PLACE
    * on (from, until) slices of the enclosing payload; copying each
    * submessage out (the first implementation) cost one allocation +
    * memcpy per nested field per row and showed up as ~2x on the
    * composite bench query.
    */
  def decodeRange(b: Array[Byte], from: Int, until: Int, msg: PbMsg): InternalRow = {
    val specs = msg.specs
    val numToIdx = msg.numToIdx
    val row = new GenericInternalRow(msg.defaults.clone())
    // repeated/map accumulators, allocated only when such a field
    // actually appears on the wire — the scalar hot path stays
    // allocation-free beyond the row
    var lists: Array[java.util.ArrayList[Any]] = null
    def listAt(idx: Int): java.util.ArrayList[Any] = {
      if (lists == null) lists = new Array[java.util.ArrayList[Any]](specs.length)
      if (lists(idx) == null) lists(idx) = new java.util.ArrayList[Any]()
      lists(idx)
    }
    var pos = from
    def varint(): Long = {
      var shift = 0; var v = 0L
      while ({ val x = b(pos); pos += 1; v |= (x & 0x7fL) << shift; shift += 7
        (x & 0x80) != 0 }) ()
      v
    }
    def fixed64(): Long = {
      var bits = 0L; var k = 0
      while (k < 8) { bits |= (b(pos + k) & 0xffL) << (8 * k); k += 1 }
      pos += 8; bits
    }
    def fixed32(): Int = {
      var bits = 0; var k = 0
      while (k < 4) { bits |= (b(pos + k) & 0xff) << (8 * k); k += 1 }
      pos += 4; bits
    }
    // every sized read validates against the SLICE bound: a corrupt
    // length in a nested payload must fail loudly, not silently read
    // the sibling fields' bytes (the flat decoder got this for free
    // from the array end)
    def need(n: Int, number: Int): Unit =
      require(n >= 0 && pos + n <= until,
        s"protobuf field $number: length $n overruns the message bounds " +
          s"($pos + $n > $until) — corrupt payload")
    def boxVarint(dt: DataType, v: Long, number: Int): Any = dt match {
      case LongType => v
      case IntegerType => v.toInt
      case BooleanType => v != 0L
      case other => sys.error(
        s"protobuf field $number: varint payload for declared type ${other.sql}")
    }
    def subMessage(idx: Int, len: Int, number: Int): InternalRow = {
      need(len, number)
      val sub = decodeRange(b, pos, pos + len, msg.childMsgs(idx))
      pos += len
      sub
    }
    while (pos < until) {
      val tag = varint()
      val number = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      val idx0 = if (number < numToIdx.length) numToIdx(number) else -1
      idx0 match {
        case idx if idx >= 0 =>
          specs(idx).dataType match {
            case ArrayType(et, _) => (et, wire) match {
              // packed run (proto3 default for numerics) — and the
              // unpacked one-record-per-element form the spec requires
              // every parser to accept interchangeably
              case (LongType | IntegerType | BooleanType, 0) =>
                listAt(idx).add(boxVarint(et, varint(), number))
              case (LongType | IntegerType | BooleanType, 2) =>
                val len = varint().toInt
                need(len, number)
                val end = pos + len
                val l = listAt(idx)
                while (pos < end) l.add(boxVarint(et, varint(), number))
              case (DoubleType, 1) =>
                listAt(idx).add(java.lang.Double.longBitsToDouble(fixed64()))
              case (DoubleType, 2) =>
                val len = varint().toInt
                need(len, number)
                val end = pos + len
                val l = listAt(idx)
                while (pos < end) l.add(java.lang.Double.longBitsToDouble(fixed64()))
              case (FloatType, 5) =>
                listAt(idx).add(java.lang.Float.intBitsToFloat(fixed32()))
              case (FloatType, 2) =>
                val len = varint().toInt
                need(len, number)
                val end = pos + len
                val l = listAt(idx)
                while (pos < end) l.add(java.lang.Float.intBitsToFloat(fixed32()))
              case (StringType, 2) =>
                val len = varint().toInt
                need(len, number)
                listAt(idx).add(UTF8String.fromBytes(b, pos, len)); pos += len
              case (BinaryType, 2) =>
                val len = varint().toInt
                need(len, number)
                listAt(idx).add(java.util.Arrays.copyOfRange(b, pos, pos + len)); pos += len
              case (_: StructType, 2) =>
                listAt(idx).add(subMessage(idx, varint().toInt, number))
              case (o, w) => sys.error(
                s"protobuf field $number: wire type $w for repeated ${o.sql}")
            }
            case _: StructType =>
              if (wire != 2) sys.error(
                s"protobuf field $number: wire type $wire for a nested message")
              // last-one-wins on repeated occurrences of a singular
              // message, per the spec's merge rule for this factory's
              // non-merging reader
              row.update(idx, subMessage(idx, varint().toInt, number))
            case MapType(_, _, _) =>
              if (wire != 2) sys.error(
                s"protobuf field $number: wire type $wire for a map entry")
              listAt(idx).add(subMessage(idx, varint().toInt, number))
            case dt => wire match {
              case 0 => row.update(idx, boxVarint(dt, varint(), number))
              case 1 =>
                dt match {
                  case DoubleType => row.update(idx, java.lang.Double.longBitsToDouble(fixed64()))
                  case other => sys.error(
                    s"protobuf field $number: fixed64 payload for declared type ${other.sql}")
                }
              case 5 =>
                dt match {
                  case FloatType => row.update(idx, java.lang.Float.intBitsToFloat(fixed32()))
                  case other => sys.error(
                    s"protobuf field $number: fixed32 payload for declared type ${other.sql}")
                }
              case 2 =>
                val len = varint().toInt
                need(len, number)
                dt match {
                  case StringType => row.update(idx, UTF8String.fromBytes(b, pos, len))
                  case BinaryType => row.update(idx, java.util.Arrays.copyOfRange(b, pos, pos + len))
                  case other => sys.error(
                    s"protobuf field $number: length-delimited payload for declared type ${other.sql}")
                }
                pos += len
              case w => sys.error(s"protobuf: unsupported wire type $w at field $number")
            }
          }
        case _ => // unknown field: skip by wire type (forward compat)
          wire match {
            case 0 => varint()
            case 1 => pos += 8
            case 5 => pos += 4
            case 2 => val len = varint().toInt; need(len, number); pos += len
            case w => sys.error(s"protobuf: unsupported wire type $w in unknown field $number")
          }
      }
    }
    if (lists != null) {
      var i = 0
      while (i < specs.length) {
        if (lists(i) != null) specs(i).dataType match {
          case _: ArrayType =>
            row.update(i, new org.apache.spark.sql.catalyst.util.GenericArrayData(
              lists(i).toArray))
          case MapType(_, _, _) =>
            // last entry wins on duplicate keys, per the map encoding
            val kDt = specs(i).children(0).dataType
            val vDt = specs(i).children(1).dataType
            val seen = new java.util.LinkedHashMap[Any, Any]()
            lists(i).forEach { e =>
              val entry = e.asInstanceOf[InternalRow]
              seen.put(entry.get(0, kDt), entry.get(1, vDt))
            }
            val keys = new Array[Any](seen.size); val vals = new Array[Any](seen.size)
            var k = 0
            seen.forEach { (key, v) => keys(k) = key; vals(k) = v; k += 1 }
            row.update(i, org.apache.spark.sql.catalyst.util.ArrayBasedMapData(keys, vals))
          case _ => ()
        }
        i += 1
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
