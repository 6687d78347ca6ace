package graft.sources

import java.util

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Upsert streaming sink over the full DSv2 write SPI — the
  * upsert-kafka sink contract (flink-connector-kafka
  * upsert mode + SinkUpsertMaterializer semantics) rebuilt against an
  * in-JVM store since the environment has no brokers: rows upsert by
  * key, a row whose non-key columns are all null is a tombstone
  * delete. The SPI path is the real thing — TableProvider →
  * SupportsWrite → WriteBuilder → StreamingWrite →
  * StreamingDataWriterFactory → DataWriter, with per-epoch
  * commit/abort: writers buffer and ship rows in commit messages;
  * the store only mutates in StreamingWrite.commit, so a failed
  * epoch leaves state untouched (exactly-once per epoch, like the
  * reference's two-phase sinks).
  *
  * Options: `store` (store name), `keyColumn` (default first column).
  */
class UpsertMemorySink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    sys.error("upsert-memory sink requires an input schema (write-only)")
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new UpsertMemoryTable(schema,
      opts.getOrDefault("store", "default"),
      Option(opts.get("keyColumn")).getOrElse(schema.fieldNames.head))
  }
}

/** JVM-global keyed state, one map per named store. */
object UpsertMemoryStore {
  private val stores = TrieMap.empty[String, TrieMap[Any, Seq[Any]]]
  def store(name: String): TrieMap[Any, Seq[Any]] =
    stores.getOrElseUpdate(name, TrieMap.empty)
  def clear(name: String): Unit = {
    stores.remove(name)
    // drop the committed-epoch markers too, or a fresh query reusing
    // the store name (epochs restarting at 0) would no-op every commit
    committed.keys.filter(_._1 == name).foreach(committed.remove)
  }
  /** committed epochs per store, for idempotent epoch replay */
  private[sources] val committed = TrieMap.empty[(String, Long), Boolean]
}

private class UpsertMemoryTable(schema0: StructType, storeName: String, keyCol: String)
    extends Table with SupportsWrite {
  override def name(): String = s"upsert-memory($storeName, key=$keyCol)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite =
          new UpsertMemoryStreamingWrite(info.schema(), storeName, keyCol)
      }
    }
}

/** One buffered row shipped driver-side at commit time. */
private case class UpsertBatch(rows: Seq[(Any, Seq[Any], Boolean)])
    extends WriterCommitMessage // (key, values, isDelete)

private class UpsertMemoryStreamingWrite(schema: StructType, storeName: String, keyCol: String)
    extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    UpsertMemoryWriterFactory(schema, keyCol)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    // idempotent on epoch replay (the driver may retry a batch)
    if (UpsertMemoryStore.committed.putIfAbsent((storeName, epochId), true).isEmpty) {
      val store = UpsertMemoryStore.store(storeName)
      messages.foreach {
        case UpsertBatch(rows) => rows.foreach {
          case (k, _, true) => store.remove(k)
          case (k, vs, false) => store.put(k, vs)
        }
        case _ =>
      }
      // replays only re-deliver recent epochs; bound the marker set
      UpsertMemoryStore.committed.remove((storeName, epochId - 1000))
    }
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

/** standalone case class so only (schema, keyCol) ship to executors */
private case class UpsertMemoryWriterFactory(schema: StructType, keyCol: String)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new UpsertMemoryWriter(schema, keyCol)
}

private class UpsertMemoryWriter(schema: StructType, keyCol: String)
    extends DataWriter[InternalRow] {
  private val keyIdx = schema.fieldIndex(keyCol)
  private val buf = scala.collection.mutable.ListBuffer.empty[(Any, Seq[Any], Boolean)]

  private def jvmValue(row: InternalRow, i: Int): Any =
    if (row.isNullAt(i)) null
    else schema.fields(i).dataType match {
      case StringType => row.getUTF8String(i).toString
      case LongType => row.getLong(i)
      case IntegerType => row.getInt(i)
      case DoubleType => row.getDouble(i)
      case BooleanType => row.getBoolean(i)
      case TimestampType => row.getLong(i)
      case dt => row.get(i, dt)
    }

  override def write(row: InternalRow): Unit = {
    val key = jvmValue(row, keyIdx)
    val others = schema.fields.indices.filter(_ != keyIdx)
    val values = others.map(i => jvmValue(row, i))
    val isDelete = others.nonEmpty && values.forall(_ == null)
    buf += ((key, values, isDelete))
  }
  override def commit(): WriterCommitMessage = UpsertBatch(buf.toList)
  override def abort(): Unit = buf.clear()
  override def close(): Unit = ()
}
