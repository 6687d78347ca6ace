package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming file sink with rolling + small-file compaction — the
  * reference's FileSink rolling policies
  * (flink-connector-files FileSink.java,
  * DefaultRollingPolicy.withMaxPartSize) and its compaction
  * coordinator (FileCompactStrategy: merge small pending files before
  * they accumulate). A long-running streaming job appending a few
  * rows per micro-batch otherwise produces one tiny file per
  * partition per batch, and at 100 TB the resulting file-count
  * explosion kills both the namenode listing and every downstream
  * scan's task-planning.
  *
  * Spark-first shape:
  *  - ROLLING: each micro-batch sizes its own output — the batch's
  *    plan-estimated bytes divided by the target file size picks the
  *    number of output files (repartition before write), so a fat
  *    batch rolls into several target-sized files and a trickle batch
  *    writes exactly one instead of `spark.sql.shuffle.partitions`
  *    shards.
  *  - COMPACTION: every `compactEvery` batches, each leaf (partition)
  *    directory greedily bins its sub-target files up to the target
  *    size and rewrites every bin with more than one file as a single
  *    file. The rewrite reads exactly the bin's files, writes to a
  *    staging dir, moves the result in, then deletes the originals —
  *    a reader racing the swap can briefly see a row twice (the same
  *    non-transactional window the reference closes by compacting
  *    before the checkpoint commit), but never misses one. Bins
  *    compact concurrently; each bin is one distributed read + one
  *    single-task write of ~target size.
  */
object RollingFileSink {

  /** "128MB" / "64 kb" / "1073741824" → bytes (the reference's
    * MemorySize spellings used by sink.rolling-policy.file-size).
    */
  def parseSize(s: String): Long = {
    val m = """(?i)^\s*(\d+)\s*(b|kb|mb|gb)?\s*$""".r
    s.trim match {
      case m(n, unit) =>
        val mult = Option(unit).map(_.toLowerCase) match {
          case None | Some("b") => 1L
          case Some("kb") => 1L << 10
          case Some("mb") => 1L << 20
          case Some("gb") => 1L << 30
          case _ => 1L
        }
        n.toLong * mult
      case other => sys.error(s"unparseable size: '$other'")
    }
  }

  /** foreachBatch body: `stream.writeStream.foreachBatch(
    * RollingFileSink.rolling(path, "parquet", 128 << 20, keys) _)`.
    * `formatOptions` are Spark reader/writer options (csv header,
    * timestamp formats …) applied to the rolled write AND both sides
    * of compaction; `fileSchema` pins the compaction read to the
    * declared file schema (no inference drift) — both required for
    * non-self-describing formats like csv.
    */
  def rolling(path: String, format: String, targetFileBytes: Long,
      partitionKeys: Seq[String] = Nil, compactEvery: Int = 10,
      formatOptions: Map[String, String] = Map.empty,
      fileSchema: Option[org.apache.spark.sql.types.StructType] = None)(
      batch: DataFrame, batchId: Long): Unit = {
    writeRolled(batch, path, format, targetFileBytes, partitionKeys, formatOptions)
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      compact(batch.sparkSession, path, format, targetFileBytes, partitionKeys,
        formatOptions, fileSchema)
  }

  /** Exactly-once rolled append — the two-phase commit the reference
    * expresses as Sink/Committer (flink-core connector/sink2/Sink.java:47:
    * writers emit committables, a committer finalizes them exactly
    * once on checkpoint): foreachBatch is at-least-once, so a batch
    * that crashes anywhere between its write and Spark's offset
    * commit is RE-DELIVERED with the same batchId, and the plain
    * [[rolling]] append would duplicate every row. Protocol, crash-
    * safe at every step boundary:
    *
    *  1. committed marker `_commits/<batchId>` exists → the epoch
    *     already published fully → no-op (post-commit replay).
    *  2. else roll back any partial attempt of THIS epoch: delete
    *     the staging dir and every published file carrying the
    *     epoch's deterministic `b<batchId>-` name prefix (a crash
    *     mid-publish leaves some files moved; the prefix makes the
    *     partial publish reversible without touching other epochs).
    *  3. write the rolled batch to `_staging-<batchId>` (underscore
    *     prefix: invisible to readers), then publish by renaming
    *     each staged data file into the target under the epoch
    *     prefix, preserving partition subdirs.
    *  4. create the marker — the commit point.
    *
    * Readers of the target never see a row twice or zero times once
    * the marker exists; an uncommitted epoch's rows may be partially
    * visible mid-crash but are swept by the replay before republish.
    * Compaction is deliberately NOT run inside the transactional
    * body (it rewrites OTHER epochs' committed files; a crash there
    * must not be entangled with this epoch's rollback) — run
    * [[compact]] as a maintenance pass, the reference's
    * compact-before-checkpoint stance.
    */
  def rollingTx(path: String, format: String, targetFileBytes: Long,
      partitionKeys: Seq[String] = Nil,
      formatOptions: Map[String, String] = Map.empty)(
      batch: DataFrame, batchId: Long): Unit = {
    val conf = batch.sparkSession.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val marker = new Path(root, s"_commits/$batchId")
    if (fs.exists(marker)) return
    val staging = new Path(root, s"_staging-$batchId")
    fs.delete(staging, true)
    val prefix = s"b$batchId-"
    if (fs.exists(root)) deletePrefixed(fs, root, prefix)
    writeRolled(batch, staging.toString, format, targetFileBytes,
      partitionKeys, formatOptions)
    publish(fs, staging, root, prefix)
    fs.delete(staging, true)
    fs.mkdirs(marker.getParent)
    fs.create(marker, true).close()
  }

  /** Remove every data file under `root` (recursively, through
    * partition dirs) whose name carries the epoch prefix.
    */
  private def deletePrefixed(fs: FileSystem, root: Path, prefix: String): Unit =
    fs.listStatus(root).filter(s => isDataFile(s.getPath)).foreach { s =>
      if (s.isDirectory) deletePrefixed(fs, s.getPath, prefix)
      else if (s.getPath.getName.startsWith(prefix)) fs.delete(s.getPath, false)
    }

  /** Move staged data files into the target under the epoch prefix,
    * mirroring partition subdirectories.
    */
  private def publish(fs: FileSystem, from: Path, to: Path, prefix: String): Unit = {
    fs.mkdirs(to)
    fs.listStatus(from).filter(s => isDataFile(s.getPath)).foreach { s =>
      if (s.isDirectory) publish(fs, s.getPath, new Path(to, s.getPath.getName), prefix)
      else fs.rename(s.getPath, new Path(to, prefix + s.getPath.getName))
    }
  }

  /** One rolled append: output file count from the batch's estimated
    * size, never fewer than 1.
    */
  def writeRolled(batch: DataFrame, path: String, format: String,
      targetFileBytes: Long, partitionKeys: Seq[String] = Nil,
      formatOptions: Map[String, String] = Map.empty): Unit = {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val estBytes = batch.queryExecution.optimizedPlan.stats.sizeInBytes
    // stats can be the unknown-size default (Long.MaxValue) on
    // foreachBatch plans — cap at the input partition count: more
    // output files than input partitions never helps file sizing
    val cap = BigInt(math.max(batch.rdd.getNumPartitions, 1))
    val nFiles = ((estBytes + targetFileBytes - 1) / targetFileBytes)
      .min(cap).max(BigInt(1)).toInt
    val sized =
      if (partitionKeys.nonEmpty && nFiles > 1) {
        // keys alone would put every row of a hot partition VALUE on
        // one writer task regardless of nFiles; a row-hash salt
        // splits fat values across up to nFiles target-sized files.
        // Trickle batches (nFiles = 1) skip the salt — no extra
        // small files — and compaction folds any over-split remains.
        val salt = pmod(xxhash64(batch.columns.map(col).toSeq: _*), lit(nFiles))
        batch.repartition(nFiles, partitionKeys.map(col) :+ salt: _*)
      } else if (partitionKeys.nonEmpty)
        batch.repartition(nFiles, partitionKeys.map(col): _*)
      else batch.repartition(nFiles)
    val w = sized.write.mode("append").format(format).options(formatOptions)
    (if (partitionKeys.nonEmpty) w.partitionBy(partitionKeys: _*) else w).save(path)
  }

  final case class CompactionReport(leafDirs: Int, filesBefore: Int, filesAfter: Int)

  private def isDataFile(p: Path): Boolean = {
    val n = p.getName
    !n.startsWith("_") && !n.startsWith(".")
  }

  /** Leaf directories that hold data files (partition dirs for a
    * partitioned layout, the root otherwise).
    */
  private def leafDirs(fs: FileSystem, root: Path): Seq[Path] = {
    val st = fs.listStatus(root).filter(s => isDataFile(s.getPath))
    val dirs = st.filter(_.isDirectory)
    if (dirs.isEmpty) Seq(root)
    else dirs.toSeq.flatMap(d => leafDirs(fs, d.getPath))
  }

  /** Compact one sink directory tree: per leaf dir, greedily bin
    * files smaller than the target up to `targetFileBytes` and
    * rewrite each multi-file bin as one file. Returns before/after
    * counts so callers (and specs) can see the effect.
    */
  def compact(spark: SparkSession, path: String, format: String,
      targetFileBytes: Long, partitionKeys: Seq[String] = Nil,
      formatOptions: Map[String, String] = Map.empty,
      fileSchema: Option[org.apache.spark.sql.types.StructType] = None): CompactionReport = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return CompactionReport(0, 0, 0)
    val leaves = leafDirs(fs, root)
    var before = 0
    var after = 0
    leaves.foreach { dir =>
      val files = fs.listStatus(dir).filter(s => s.isFile && isDataFile(s.getPath))
      before += files.length
      after += files.length
      // greedy first-fit binning of the sub-target files, largest first
      val small = files.filter(_.getLen < targetFileBytes)
        .sortBy(-_.getLen)
      val bins = scala.collection.mutable.ListBuffer.empty[
        (scala.collection.mutable.ListBuffer[org.apache.hadoop.fs.FileStatus], Long)]
      small.foreach { f =>
        bins.zipWithIndex.find(_._1._2 + f.getLen <= targetFileBytes) match {
          case Some((bin, i)) => bin._1 += f; bins(i) = (bin._1, bin._2 + f.getLen)
          case None => bins += ((scala.collection.mutable.ListBuffer(f), f.getLen))
        }
      }
      bins.map(_._1.toSeq).filter(_.length > 1).foreach { bin =>
        val staging = new Path(dir, s".compact-${java.util.UUID.randomUUID}")
        // read EXACTLY the bin's files; one ~target-sized output task.
        // The declared file schema + format options ride along so a
        // csv rewrite keeps its header/types instead of re-inferring
        val reader = spark.read.format(format).options(formatOptions)
        fileSchema.map(reader.schema).getOrElse(reader)
          .load(bin.map(_.getPath.toString): _*)
          .coalesce(1).write.format(format).options(formatOptions)
          .save(staging.toString)
        val produced = fs.listStatus(staging)
          .filter(s => s.isFile && isDataFile(s.getPath))
        // move in, then delete originals — a racing reader may see a
        // row twice mid-swap, never zero times
        produced.foreach { p =>
          fs.rename(p.getPath, new Path(dir, s"compacted-${p.getPath.getName}"))
        }
        fs.delete(staging, true)
        bin.foreach(f => fs.delete(f.getPath, false))
        after += produced.length - bin.length
      }
    }
    CompactionReport(leaves.length, before, after)
  }
}
