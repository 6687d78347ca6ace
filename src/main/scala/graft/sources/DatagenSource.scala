package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic data-generator source — the Spark DSv2 rebuild of
  * the reference's datagen connector
  * (flink-table-api-java-bridge DataGenTableSourceFactory; Source SPI
  * flink-core api/connector/source/Source.java:33 → TableProvider /
  * ScanBuilder / Batch / PartitionReader here).
  *
  * Options: `partitions` (parallel splits ≈ SplitEnumerator output),
  * `rowsPerPartition`, `seed`. Every (seed, partition, row) triple
  * yields the same row on any cluster size — reproducible test data
  * at any scale, generated in parallel with no driver involvement.
  *
  * Usage: spark.read.format("graft.sources.DatagenSource")
  *   .option("partitions", 8).option("rowsPerPartition", 1000).load()
  */
class DatagenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DatagenSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new DatagenTable(
      opts.getInt("partitions", 4),
      opts.getLong("rowsPerPartition", 1000L),
      opts.getLong("seed", 42L))
  }
}

object DatagenSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** splitmix64 — deterministic per-row randomness. */
  def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

private class DatagenTable(partitions: Int, rowsPerPartition: Long, seed: Long)
    extends Table with SupportsRead {
  override def name(): String = s"datagen($partitions x $rowsPerPartition, seed=$seed)"
  override def schema(): StructType = DatagenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = DatagenSource.schema
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            (0 until partitions).map(i =>
              DatagenPartition(i, rowsPerPartition, seed): InputPartition).toArray
          override def createReaderFactory(): PartitionReaderFactory =
            new PartitionReaderFactory {
              override def createReader(p: InputPartition): PartitionReader[InternalRow] =
                new DatagenReader(p.asInstanceOf[DatagenPartition])
            }
        }
      }
    }
}

private case class DatagenPartition(idx: Int, rows: Long, seed: Long)
    extends InputPartition

private class DatagenReader(p: DatagenPartition)
    extends PartitionReader[InternalRow] {
  private var i = -1L
  private val keys = Array("alpha", "beta", "gamma", "delta").map(UTF8String.fromString)
  private val baseMicros = 1704067200000000L // 2024-01-01T00:00:00Z

  override def next(): Boolean = { i += 1; i < p.rows }

  override def get(): InternalRow = {
    val id = p.idx * p.rows + i
    val h = DatagenSource.mix(p.seed ^ id)
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(4)
    row.setLong(0, id)
    row.setLong(1, baseMicros + id * 1000000L) // 1s cadence event time
    row.update(2, keys(math.floorMod(h, keys.length.toLong).toInt))
    row.setDouble(3, (h >>> 11).toDouble / (1L << 53).toDouble * 100.0)
    row
  }

  override def close(): Unit = ()
}
