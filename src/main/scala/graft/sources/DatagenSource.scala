package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
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
      opts.getLong("seed", 42L),
      opts.getLong("maxRows", Long.MaxValue),
      Option(opts.get("splitRates"))
        .map(_.split(",").map(_.trim.toLong).toSeq),
      opts.getLong("alignment.max-drift-seconds", Long.MaxValue),
      opts.getLong("maxRowsPerSplit", Long.MaxValue))
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

private class DatagenTable(partitions: Int, rowsPerPartition: Long, seed: Long, maxRows: Long,
    splitRates: Option[Seq[Long]] = None, maxDriftSeconds: Long = Long.MaxValue,
    maxRowsPerSplit: Long = Long.MaxValue)
    extends Table with SupportsRead {
  override def name(): String = s"datagen($partitions x $rowsPerPartition, seed=$seed)"
  override def schema(): StructType = DatagenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
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
        // unbounded micro-batch stream: each trigger advances the
        // global row offset by partitions × rowsPerPartition
        // (rowsPerPartition acts as rows-per-trigger-per-split,
        // like the reference datagen's rows-per-second)
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          splitRates match {
            case Some(rates) =>
              new AlignedDatagenStream(rates, maxDriftSeconds, maxRowsPerSplit, seed)
            case None =>
              new DatagenMicroBatchStream(partitions, rowsPerPartition, seed, maxRows)
          }
      }
    }
}

private case class DatagenOffset(n: Long) extends Offset {
  override def json(): String = s"""{"n":$n}"""
}

/** Micro-batch stream over the same deterministic row space: offsets
  * are global row counts; each trigger emits the next
  * partitions × rowsPerPartition rows split evenly across readers
  * (StreamExecTableSourceScan's unbounded-scan analog).
  */
private class DatagenMicroBatchStream(partitions: Int, rowsPerTrigger: Long, seed: Long,
    maxRows: Long)
    extends MicroBatchStream with SupportsAdmissionControl {
  private var latest = 0L

  override def initialOffset(): Offset = DatagenOffset(0L)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  // Recovery contract: the frontier counter is driver-side state, so
  // a restarted query would otherwise re-count from zero, hand back
  // end offsets BEHIND the committed start, commit that retreated
  // offset, and re-emit committed rows once the counter re-advances
  // (observed: 145 duplicate rows in DatagenSourceSpec before this).
  // SupportsAdmissionControl is the fix Spark designed for exactly
  // this: latestOffset(start, _) receives the restored start offset
  // BEFORE the first post-restart advance, so the counter seeds from
  // it and the frontier never retreats.
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    Option(start).foreach(o => latest = math.max(latest, offsetN(o)))
    // bounded by maxRows so drain-style queries (processAllAvailable)
    // terminate; unbounded when the option is unset
    latest = math.min(latest + partitions * rowsPerTrigger, maxRows)
    DatagenOffset(latest)
  }
  override def latestOffset(): Offset = latestOffset(null, getDefaultReadLimit)
  private def offsetN(o: Offset): Long = o match {
    case d: DatagenOffset => d.n
    case other => """\d+""".r.findFirstIn(other.json()).get.toLong
  }
  override def deserializeOffset(json: String): Offset = {
    val n = """\d+""".r.findFirstIn(json).get.toLong
    latest = math.max(latest, n) // belt-and-braces with latestOffset(start, _)
    DatagenOffset(n)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[DatagenOffset].n
    val e = end.asInstanceOf[DatagenOffset].n
    val total = e - s
    if (total <= 0) Array.empty
    else {
      val per = (total + partitions - 1) / partitions
      (0 until partitions).flatMap { i =>
        val from = s + i * per
        val until = math.min(from + per, e)
        if (from < until) Some(DatagenRangePartition(from, until, seed): InputPartition)
        else None
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new DatagenRangeReader(p.asInstanceOf[DatagenRangePartition])
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Watermark ALIGNMENT across skewed splits — the reference's
  * split-level alignment (flink-core api/common/eventtime/
  * WatermarkAlignmentParams.java:30 `maxAllowedWatermarkDrift`;
  * flink-runtime source/coordinator/SourceCoordinator.java:168
  * `announceCombinedWatermark`: maxAllowedWatermark = combined MIN
  * watermark + drift, splits ahead of it pause until the laggard
  * catches up).
  *
  * Each split has its own rows-per-trigger rate (`splitRates`) and
  * its own event-time frontier (1 s cadence per row within a split,
  * so the frontier in SECONDS equals the row count). Per trigger a
  * split may advance at most to `min(all frontiers) + maxDrift` —
  * the coordinator cap — so a 10× faster split cannot run away from
  * the group, which is what bounds downstream watermark skew (and
  * with it late-data drops and join/agg state) when one kafka
  * partition or backfill split is much faster than another.
  *
  * Why the cap is enforced at the OFFSET level: Spark has no
  * pause-split RPC, but the micro-batch offset vector IS the split
  * frontier set — capping a split's next offset is exactly
  * "pause until the combined watermark moves".
  */
private class AlignedDatagenStream(rates: Seq[Long], maxDriftSeconds: Long,
    maxRowsPerSplit: Long, seed: Long)
    extends MicroBatchStream with SupportsAdmissionControl {
  require(rates.nonEmpty && rates.forall(_ > 0), s"splitRates must be positive: $rates")
  private var counts: Seq[Long] = Seq.fill(rates.size)(0L)

  override def initialOffset(): Offset = DatagenVectorOffset(Seq.fill(rates.size)(0L))
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  // Recovery: same contract as DatagenMicroBatchStream — the
  // per-split frontier vector is driver-side state, and a restart
  // must seed it from the restored start offset (element-wise, never
  // retreat) BEFORE the first advance, or the alignment cap computes
  // off a zeroed min-frontier and re-advancing ranges re-emit
  // committed rows. latestOffset(start, _) is where Spark hands the
  // restored offset over.
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    Option(start).foreach(o => seedFrom(offsetVector(o)))
    // the combined (minimum) frontier BEFORE this trigger — the same
    // one-cycle-stale view the reference's periodic announce uses
    val minFrontier = counts.min
    val cap =
      if (maxDriftSeconds == Long.MaxValue) Long.MaxValue
      else minFrontier + maxDriftSeconds // 1 row == 1 s of event time
    counts = counts.zip(rates).map { case (c, r) =>
      // never retreat: a split already past the cap holds, not rewinds
      math.max(c, math.min(math.min(c + r, maxRowsPerSplit), cap))
    }
    DatagenVectorOffset(counts)
  }
  override def latestOffset(): Offset = latestOffset(null, getDefaultReadLimit)

  private def offsetVector(o: Offset): Seq[Long] = o match {
    case v: DatagenVectorOffset => v.counts
    case other => """\d+""".r.findAllIn(other.json()).map(_.toLong).toSeq
  }
  private def seedFrom(v: Seq[Long]): Unit = {
    require(v.size == rates.size,
      s"checkpointed offset has ${v.size} splits, source has ${rates.size} — " +
        "splitRates changed across a restart")
    counts = counts.zip(v).map { case (c, n) => math.max(c, n) }
  }

  override def deserializeOffset(json: String): Offset = {
    val v = """\d+""".r.findAllIn(json).map(_.toLong).toSeq
    seedFrom(v) // belt-and-braces with latestOffset(start, _)
    DatagenVectorOffset(v)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[DatagenVectorOffset].counts
    val e = end.asInstanceOf[DatagenVectorOffset].counts
    s.indices.flatMap { i =>
      if (s(i) < e(i)) Some(AlignedSplitPartition(i, s(i), e(i), seed): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new AlignedSplitReader(p.asInstanceOf[AlignedSplitPartition])
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private case class DatagenVectorOffset(counts: Seq[Long]) extends Offset {
  override def json(): String = counts.mkString("""{"c":[""", ",", "]}")
}

private case class AlignedSplitPartition(split: Int, from: Long, until: Long, seed: Long)
    extends InputPartition

private class AlignedSplitReader(p: AlignedSplitPartition)
    extends PartitionReader[InternalRow] {
  private var rowIdx = p.from - 1
  private val keys = Array("alpha", "beta", "gamma", "delta").map(UTF8String.fromString)
  private val baseMicros = 1704067200000000L

  override def next(): Boolean = { rowIdx += 1; rowIdx < p.until }
  override def get(): InternalRow = {
    // ids are unique across splits; event time advances 1 s per row
    // WITHIN a split, so per-split frontiers genuinely skew when the
    // rates differ
    val id = p.split * 1000000000L + rowIdx
    val h = DatagenSource.mix(p.seed ^ id)
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(4)
    row.setLong(0, id)
    row.setLong(1, baseMicros + rowIdx * 1000000L)
    row.update(2, keys(math.floorMod(h, keys.length.toLong).toInt))
    row.setDouble(3, (h >>> 11).toDouble / (1L << 53).toDouble * 100.0)
    row
  }
  override def close(): Unit = ()
}

private case class DatagenRangePartition(from: Long, until: Long, seed: Long)
    extends InputPartition

private class DatagenRangeReader(p: DatagenRangePartition)
    extends PartitionReader[InternalRow] {
  private var id = p.from - 1
  private val keys = Array("alpha", "beta", "gamma", "delta").map(UTF8String.fromString)
  private val baseMicros = 1704067200000000L

  override def next(): Boolean = { id += 1; id < p.until }
  override def get(): InternalRow = {
    val h = DatagenSource.mix(p.seed ^ id)
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(4)
    row.setLong(0, id)
    row.setLong(1, baseMicros + id * 1000000L)
    row.update(2, keys(math.floorMod(h, keys.length.toLong).toInt))
    row.setDouble(3, (h >>> 11).toDouble / (1L << 53).toDouble * 100.0)
    row
  }
  override def close(): Unit = ()
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
