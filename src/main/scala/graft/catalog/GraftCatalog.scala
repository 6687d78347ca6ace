package graft.catalog

import scala.util.matching.Regex

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** DDL catalog layer (SURVEY.md §7.1 layer 2 — the reference's
  * `CREATE TABLE ... WITH ('connector'=...)` surface backed by
  * GenericInMemoryCatalog): parses the reference's DDL dialect and
  * registers the table as a temp view over the matching Spark
  * source.
  *
  * Connectors: `filesystem` (formats parquet/csv/json/orc/avro +
  * the four CDC changelog formats, with PARTITIONED BY layouts),
  * `jdbc` (graft.sources.JdbcConnector, proven against embedded
  * Derby), `datagen` (graft.sources.DatagenSource).
  * `print`/`blackhole` sinks map to Spark's `console`/`noop` at
  * write time and need no catalog entry.
  */
object GraftCatalog {

  private val CreateTable: Regex =
    """(?is)CREATE\s+TABLE\s+(\w+)\s*\((.*)\)\s*WITH\s*\((.*)\)\s*""".r
  // PARTITIONED BY between the column list and WITH — the reference's
  // filesystem-connector partitioned tables (parserImpls.ftl:1145).
  // Tried before CreateTable so the greedy column group can't swallow
  // the partition clause.
  private val CreateTablePartitioned: Regex =
    """(?is)CREATE\s+TABLE\s+(\w+)\s*\((.*)\)\s*PARTITIONED\s+BY\s*\(([^)]*)\)\s*WITH\s*\((.*)\)\s*""".r
  private val CreateTableLike: Regex =
    """(?is)CREATE\s+TABLE\s+(\w+)\s+LIKE\s+(\w+)\s*(?:WITH\s*\((.*)\))?\s*""".r
  private val DropTable: Regex =
    """(?is)DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(\w+)\s*""".r
  // sql-client ALTER statements (the reference's SqlAlterTableOptions /
  // SqlAlterTableRename)
  private val AlterTableSet: Regex =
    """(?is)ALTER\s+TABLE\s+(\w+)\s+SET\s*\((.*)\)\s*""".r
  private val AlterTableRename: Regex =
    """(?is)ALTER\s+TABLE\s+(\w+)\s+RENAME\s+TO\s+(\w+)\s*""".r
  // FLIP-273 schema evolution (SqlAlterTableAdd / SqlAlterTableModify)
  // + option RESET (SqlAlterTableReset) + filesystem COMPACT
  // (SqlAlterTableCompact); ADD/MODIFY accept the parenthesized list
  // or a single bare definition, like the reference parser
  // partition DDL (SqlAddPartitions / SqlDropPartitions): directory
  // lifecycle on the partitioned filesystem layout — must match
  // BEFORE the schema-ADD shapes below
  private val AlterTableAddPartitions: Regex =
    """(?is)ALTER\s+TABLE\s+(\w+)\s+ADD\s+(IF\s+NOT\s+EXISTS\s+)?(PARTITION\s*\(.*)""".r
  private val AlterTableDropPartitions: Regex =
    """(?is)ALTER\s+TABLE\s+(\w+)\s+DROP\s+(IF\s+EXISTS\s+)?(PARTITION\s*\(.*)""".r
  private val AlterTableAdd: Regex =
    """(?is)ALTER\s+TABLE\s+(\w+)\s+ADD\s*\((.*)\)\s*""".r
  private val AlterTableAddOne: Regex =
    """(?is)ALTER\s+TABLE\s+(\w+)\s+ADD\s+([^(].*)""".r
  private val AlterTableModify: Regex =
    """(?is)ALTER\s+TABLE\s+(\w+)\s+MODIFY\s*\((.*)\)\s*""".r
  private val AlterTableModifyOne: Regex =
    """(?is)ALTER\s+TABLE\s+(\w+)\s+MODIFY\s+([^(].*)""".r
  private val AlterTableReset: Regex =
    """(?is)ALTER\s+TABLE\s+(\w+)\s+RESET\s*\((.*)\)\s*""".r
  private val AlterTableCompact: Regex =
    """(?is)ALTER\s+TABLE\s+(\w+)\s+COMPACT\s*""".r

  import graft.operators.ConstraintEnforcer.LengthConstraint

  /** NOT NULL + CHAR/VARCHAR length constraints parsed from DDL,
    * applied at write time by [[enforced]] (the reference plans its
    * ConstraintEnforcer in front of every sink — CommonExecSink).
    */
  final case class TableConstraints(notNull: Seq[String], lengths: Seq[LengthConstraint])

  private val tableConstraints =
    scala.collection.concurrent.TrieMap.empty[String, TableConstraints]

  /** writable filesystem tables: name → (path, format, options) */
  final case class SinkInfo(path: String, format: String, options: Map[String, String])
  private val tableSinks =
    scala.collection.concurrent.TrieMap.empty[String, SinkInfo]

  def sinkOf(table: String): Option[SinkInfo] = tableSinks.get(table)

  /** Event-time metadata from DDL — the reference's watermark clause
    * (parserImpls.ftl `WATERMARK FOR ts AS ts - INTERVAL ...`, planned
    * as StreamExecWatermarkAssigner.java:62) and computed columns
    * (`cost AS price * 1.1`). Both are virtual: applied as a
    * projection / `withWatermark` over the physical source, never
    * stored. Round 2 parsed-and-skipped these — a user's first
    * streaming CREATE TABLE silently lost its watermark (VERDICT r2
    * missing #1).
    */
  final case class EventTimeMeta(computed: Seq[(String, String)],
      watermark: Option[(String, String)]) {
    def isEmpty: Boolean = computed.isEmpty && watermark.isEmpty
  }
  private val tableMeta =
    scala.collection.concurrent.TrieMap.empty[String, EventTimeMeta]
  private val tableSchemas =
    scala.collection.concurrent.TrieMap.empty[String, StructType]

  def metaOf(table: String): EventTimeMeta =
    tableMeta.getOrElse(table, EventTimeMeta(Nil, None))

  /** METADATA columns from DDL (`col TYPE METADATA [FROM 'key']
    * [VIRTUAL]` — the reference's SupportsReadingMetadata surface,
    * parserImpls.ftl metadata clause): connector-provided values
    * projected next to the payload. Filesystem tables read Spark's
    * hidden `_metadata` struct (file path/name/size/mod-time);
    * debezium tables read envelope fields (ingestion/source
    * timestamps, source db/table). All are read-only here — like the
    * reference's VIRTUAL columns they leave the physical schema and
    * are never INSERT targets (the filesystem/file-meta backing has
    * no writable-metadata analog, so VIRTUAL is accepted and implied).
    */
  final case class MetaCol(name: String, dataType: org.apache.spark.sql.types.DataType,
      key: String, virtual: Boolean)
  private val tableMetaCols =
    scala.collection.concurrent.TrieMap.empty[String, Seq[MetaCol]]

  def metaColsOf(table: String): Seq[MetaCol] =
    tableMetaCols.getOrElse(table, Nil)

  /** Registration generation per table name: bumped by CREATE/ALTER/
    * DROP/RENAME so caches keyed on a table's declaration (e.g. the
    * SQL front door's OPTIONS-hint views) invalidate when the
    * declaration changes instead of serving a stale snapshot.
    */
  private val tableGenerations =
    scala.collection.concurrent.TrieMap.empty[String, Long]

  def generationOf(table: String): Long = tableGenerations.getOrElse(table, 0L)

  private def bumpGeneration(table: String): Unit =
    tableGenerations.updateWith(table) {
      case Some(g) => Some(g + 1)
      case None => Some(1L)
    }

  /** The kafka socket implementation (graft.sources.KafkaTableFactory
    * .Wire): production default reads Spark's kafka source; specs
    * install a FakeWire so the factory, translation and decode run
    * end to end without a broker.
    */
  @volatile private var kafkaWire: graft.sources.KafkaTableFactory.Wire =
    graft.sources.KafkaTableFactory.SparkKafkaWire

  def setKafkaWire(w: graft.sources.KafkaTableFactory.Wire): Unit = kafkaWire = w

  /** Metadata keys the filesystem connector serves, mapped onto
    * Spark's `_metadata` struct (FileFormat metadata columns) — the
    * same four keys the reference's filesystem table exposes.
    */
  private val fileMetaKeys: Map[String, String] = Map(
    "file.path" -> "file_path",
    "file.name" -> "file_name",
    "file.size" -> "file_size",
    "file.modification-time" -> "file_modification_time")

  /** debezium envelope metadata keys → decoded-envelope expression
    * (DebeziumJsonDecodingFormat.ReadableMetadata).
    */
  private[graft] val debeziumMetaKeys =
    Set("ingestion-timestamp", "source.timestamp", "source.database", "source.table")

  /** Upsert-table declaration: `PRIMARY KEY (...) NOT ENFORCED` +
    * `'changelog-mode' = 'upsert'` in WITH — the filesystem analog of
    * the reference's upsert-kafka table. `'version-by'` names the
    * column(s) ordering versions per key (what the Kafka offset
    * provides there). Queries over such a table route through
    * ChangelogInference in the SQL front door.
    */
  final case class UpsertSpec(keys: Seq[String], versionCols: Seq[String])
  private val tableUpsert =
    scala.collection.concurrent.TrieMap.empty[String, UpsertSpec]

  /** PRIMARY KEY columns per table (independent of changelog mode —
    * for the jdbc connector the key alone switches the sink between
    * append and upsert writes, like the reference's
    * JdbcDynamicTableSink).
    */
  private val tablePrimaryKeys =
    scala.collection.concurrent.TrieMap.empty[String, Seq[String]]

  def primaryKeyOf(table: String): Seq[String] =
    tablePrimaryKeys.getOrElse(table, Nil)

  /** PARTITIONED BY columns per filesystem table — INSERTs write one
    * directory per value (Spark's partitionBy, the reference's
    * FileSystemTableSink partition grouping) and reads prune
    * untouched directories (PartitionFilters).
    */
  private val tablePartitionKeys =
    scala.collection.concurrent.TrieMap.empty[String, Seq[String]]

  def partitionKeysOf(table: String): Seq[String] =
    tablePartitionKeys.getOrElse(table, Nil)

  /** Case-insensitive and quote-stripping, like Spark's own relation
    * resolution — `USER_STATE` or a backtick-quoted reference must
    * resolve to the same declaration, or the SQL front door's
    * changelog planning silently misses it.
    */
  private def specLookup(registry: scala.collection.concurrent.TrieMap[String, UpsertSpec],
      table: String): Option[UpsertSpec] = {
    val clean = table.stripPrefix("`").stripSuffix("`")
      .stripPrefix("\"").stripSuffix("\"")
    registry.get(clean).orElse(
      registry.collectFirst { case (k, v) if k.equalsIgnoreCase(clean) => v })
  }

  def upsertOf(table: String): Option[UpsertSpec] = specLookup(tableUpsert, table)

  /** CDC-format tables (`'format' = 'debezium-json' | 'canal-json' |
    * 'maxwell-json' | 'ogg-json'`):
    * the decoded view is a RETRACT changelog (explicit __rowkind), so
    * SQL over it routes through ChangelogInference like upsert tables
    * do — but with the rowkinds already materialized by the format.
    * keys/versionCols come from PRIMARY KEY + 'version-by' and are
    * needed only by the normalize path (non-aggregate query shapes).
    */
  private val tableCdc =
    scala.collection.concurrent.TrieMap.empty[String, UpsertSpec]

  def cdcOf(table: String): Option[UpsertSpec] = specLookup(tableCdc, table)

  private val cdcFormats =
    Set("debezium-json", "canal-json", "maxwell-json", "ogg-json")

  /** Views created through the SQL front door's dialect CREATE VIEW —
    * tracked so SHOW VIEWS can list them (Spark's catalog does not
    * distinguish a dialect view from any other temp view).
    */
  private val viewRegistry =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def registerView(name: String): Unit =
    viewRegistry.put(name.toLowerCase(java.util.Locale.ROOT), name)

  def dropViewMeta(name: String): Boolean =
    viewRegistry.remove(name.toLowerCase(java.util.Locale.ROOT)).isDefined

  def viewNames: Seq[String] = viewRegistry.values.toSeq.sorted

  /** Jars added through ADD JAR (the reference's SqlAddJar /
    * SqlShowJars / SqlRemoveJar sql-client resource surface), in
    * insertion order. REMOVE JAR drops the catalog entry only —
    * classes a query already loaded stay on the JVM classpath, the
    * same post-use semantics the reference's client has.
    */
  private val jarRegistry = new java.util.concurrent.CopyOnWriteArrayList[String]()

  def registerJar(path: String): Unit =
    if (!jarRegistry.contains(path)) jarRegistry.add(path)

  def removeJar(path: String): Boolean = jarRegistry.remove(path)

  def jars: Seq[String] = {
    import scala.jdk.CollectionConverters._
    jarRegistry.asScala.toSeq
  }

  /** Per-(table, column) statistics recorded by ANALYZE TABLE: the
    * reference computes these into the catalog for the planner
    * (row counts feeding join-reorder/broadcast decisions); here
    * Spark's file-size estimation already drives broadcast planning,
    * the recorded row count also feeds join planning through the injected StatsBroadcastJoin rule (relations Spark cannot size broadcast after ANALYZE).
    */
  case class ColumnStats(ndv: Long, nullCount: Long, min: String, max: String)
  case class TableStats(rowCount: Long, columns: Map[String, ColumnStats])

  private val tableStats =
    scala.collection.concurrent.TrieMap.empty[String, TableStats]
  // keyed by the CANONICALIZED leaf relation: optimizer rules run
  // after EliminateSubqueryAliases has stripped view names, so the
  // StatsBroadcastJoin lookup must match the relation itself.
  // LRU-bounded: each entry can pin a LogicalRDD (and its RDD), so a
  // long-lived driver ANALYZE-ing many distinct views must not
  // accumulate unbounded plan references — 512 live ANALYZE'd leaves
  // is far past any real session, and eviction only costs a re-ANALYZE
  private val MaxPlanStats = 512
  private val planStats = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, (String, TableStats)](
        64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[
            org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, (String, TableStats)])
          : Boolean = size() > MaxPlanStats
    })
  private def planStatsDropTable(key: String): Unit = planStats.synchronized {
    planStats.values().removeIf { case (n, _) => n == key }
  }

  def recordStats(table: String, stats: TableStats,
      leaf: Option[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] = None): Unit = {
    val key = table.toLowerCase(java.util.Locale.ROOT)
    tableStats.put(key, stats)
    // drop stale leaf keys for this table before (re-)recording, so a
    // re-ANALYZE (or a stats override without a leaf) never leaves an
    // old row count reachable through the plan-keyed lookup
    planStatsDropTable(key)
    leaf.foreach(l => planStats.put(l.canonicalized, (key, stats)))
  }

  def statsOf(table: String): Option[TableStats] =
    tableStats.get(table.toLowerCase(java.util.Locale.ROOT))

  def statsOfLeaf(
      leaf: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Option[TableStats] =
    Option(planStats.get(leaf.canonicalized)).map(_._2)

  def clearStats(table: String): Unit = {
    val key = table.toLowerCase(java.util.Locale.ROOT)
    tableStats.remove(key)
    planStatsDropTable(key)
  }

  /** Project a file table's declared METADATA columns from Spark's
    * hidden `_metadata` struct — appended after the physical columns,
    * before computed columns/watermark. CDC metadata is injected by
    * the decoder instead (the envelope is gone after decode).
    */
  private def applyFileMetaCols(table: String, df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    metaColsOf(table).foldLeft(df) { (d, mc) =>
      d.withColumn(mc.name, col(s"_metadata.${fileMetaKeys(mc.key)}").cast(mc.dataType))
    }
  }

  /** Reader for a partitioned file-table layout. csv files carry no
    * column NAMES when csv.header=false (and only strings even with
    * one), so the declared non-partition schema applies explicitly —
    * without it the load comes back as _c0.._cN and the declared-name
    * projection throws at registration (round-3 ADVICE, csv was
    * DDL-allowed but only parquet was gate-tested). Partition columns
    * come from directory names; the caller's select restores their
    * declared types.
    */
  /** Load a partitioned layout and project the declared columns.
    * Self-describing formats keep footer INFERENCE + cast (a physical
    * BIGINT under a declared INT narrows on read — forcing the
    * declared schema onto the vectorized parquet reader would throw,
    * Spark 4 converts widening-only); the declared data schema
    * applies only when there is nothing to infer from (a layout of
    * only empty partition directories: fresh CREATE, ADD PARTITION
    * before rows land, DROP of the last populated partition).
    * Partition columns missing entirely (no directories) complete as
    * typed nulls — the relation is empty there anyway.
    */
  private def loadPartitionedView(spark: SparkSession, table: String, fmt: String,
      options: Map[String, String], declared: StructType, path: String): DataFrame = {
    val partKeys = partitionKeysOf(table)
    def reader(withSchema: Boolean) = {
      val r = spark.read.format(fmt)
      // csv files carry no column names/types — the declared
      // non-partition schema always applies there (round-3 ADVICE)
      val r1 = if (fmt == "csv" || withSchema)
        r.schema(StructType(declared.fields.filterNot(f => partKeys.contains(f.name))))
      else r
      if (fmt == "csv") r1.options(csvSparkOptions(options, write = false))
      else r1
    }
    val loaded =
      try reader(withSchema = false).load(path)
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          reader(withSchema = true).load(path)
      }
    loaded.select(declared.fields.map(f =>
      if (loaded.columns.contains(f.name))
        org.apache.spark.sql.functions.col(f.name).cast(f.dataType)
      else org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name))
      .toSeq ++
      metaColsOf(table).map(mc => org.apache.spark.sql.functions
        .col(s"_metadata.${fileMetaKeys(mc.key)}").cast(mc.dataType).as(mc.name)): _*)
  }

  /** One decode contract for batch and streaming reads of a CDC
    * table — option names and dispatch live here only.
    */
  private def decodeCdc(raw: DataFrame, fmt: String, schema: StructType,
      options: Map[String, String],
      metaCols: Seq[MetaCol] = Nil): DataFrame = {
    val ignore = options.get(s"$fmt.ignore-parse-errors").contains("true")
    val tsFmt = options.get(s"$fmt.timestamp-format")
    require(metaCols.isEmpty || fmt == "debezium-json",
      s"METADATA columns are only decoded for debezium-json, not $fmt")
    fmt match {
      case "debezium-json" =>
        graft.sources.CdcJson.debezium(raw, schema,
          schemaInclude = options.get("debezium-json.schema-include").contains("true"),
          ignoreParseErrors = ignore, timestampFormat = tsFmt,
          metaCols = metaCols.map(mc => (mc.name, mc.key, mc.dataType)))
      case "canal-json" =>
        graft.sources.CdcJson.canal(raw, schema,
          ignoreParseErrors = ignore, timestampFormat = tsFmt)
      case "maxwell-json" =>
        graft.sources.CdcJson.maxwell(raw, schema,
          ignoreParseErrors = ignore, timestampFormat = tsFmt)
      case "ogg-json" =>
        graft.sources.CdcJson.ogg(raw, schema,
          ignoreParseErrors = ignore, timestampFormat = tsFmt)
    }
  }

  /** Apply a table's DDL-declared computed columns and watermark to a
    * DataFrame with its physical schema — used on the registered view,
    * on [[streamOf]], and directly by tests driving a MemoryStream as
    * the table's streaming twin. On a batch child the watermark node
    * is eliminated by Catalyst (EliminateEventTimeWatermark), so the
    * same transform serves both modes.
    */
  def applyEventTime(table: String, df: DataFrame): DataFrame = {
    val meta = metaOf(table)
    val withComputed = meta.computed.foldLeft(df) { case (d, (n, e)) =>
      d.withColumn(n, org.apache.spark.sql.functions.expr(e))
    }
    meta.watermark match {
      case Some((col, delay)) => withComputed.withWatermark(col, delay)
      case None => withComputed
    }
  }

  /** Streaming twin of a DDL-registered filesystem table: a file
    * stream over the table's path with the declared schema, computed
    * columns, and watermark applied — the event-time entry point the
    * reference gives every streaming CREATE TABLE.
    */
  def streamOf(spark: SparkSession, table: String): DataFrame = {
    val sink = sinkOf(table).getOrElse(
      sys.error(s"table '$table' is not a filesystem table"))
    val schema = tableSchemas.getOrElse(table,
      sys.error(s"table '$table' has no declared schema"))
    // CDC formats stream as text files decoded per micro-batch — the
    // streaming twin of the reference's Kafka+debezium/canal source
    // (the decode is a stateless projection, so it composes with any
    // downstream stateful operator)
    // kafka streaming twin: the decoded record stream (for upsert
    // tables this is the +I/-D changelog — the right shape to feed
    // the changelog tier; batch registration materializes instead)
    if (sink.format == "kafka") {
      import graft.sources.KafkaTableFactory
      val t = KafkaTableFactory.translate(sink.options)
      return applyEventTime(table,
        KafkaTableFactory.decode(kafkaWire.readStream(spark, t), schema, t))
    }
    if (cdcFormats.contains(sink.format))
      return applyEventTime(table,
        decodeCdc(spark.readStream.text(sink.path), sink.format, schema, sink.options,
          metaColsOf(table)))
    // datagen streaming twin: the rate source drives the same
    // per-field generator expressions ('rows-per-second', like the
    // reference's unbounded datagen)
    if (sink.format == "datagen") {
      val seed = sink.options.getOrElse("seed", "42").toLong
      // the reference's default rate
      val rps = sink.options.getOrElse("rows-per-second", "10000")
      val rate = spark.readStream.format("rate").option("rowsPerSecond", rps).load()
      // a bounded sequence terminates in streaming too (the reference's
      // sequence generator is exhausted at 'end'): the rate source's
      // `value` is the row index, so rows past the cap are filtered —
      // the stream idles (emits nothing) once exhausted, matching the
      // batch twin's row count exactly
      val bounded = graft.sources.DatagenFields.rowCap(schema, sink.options) match {
        case Some(cap) => rate.where(org.apache.spark.sql.functions.col("value") < cap)
        case None      => rate
      }
      return applyEventTime(table,
        bounded.select(graft.sources.DatagenFields.columns(
          schema, sink.options, seed, org.apache.spark.sql.functions.col("value")): _*))
    }
    val reader = spark.readStream.format(sink.format).schema(schema)
    val r2 = if (sink.format == "csv")
      reader.options(csvSparkOptions(sink.options, write = false)) else reader
    applyEventTime(table, applyFileMetaCols(table, r2.load(sink.path)))
  }

  /** Append or overwrite rows into a DDL-registered filesystem table
    * (the write half of the connector, used by INSERT INTO): enforces
    * the table's declared constraints, writes, and refreshes the view.
    */
  def insertInto(spark: SparkSession, table: String, rows: DataFrame,
      overwrite: Boolean, staticPartition: Map[String, String] = Map.empty): Unit = {
    val sink = sinkOf(table).getOrElse(
      sys.error(s"table '$table' is not a writable filesystem table"))
    require(sink.format != "kafka",
      s"INSERT INTO kafka table '$table': the producer wire is not implemented " +
        "(no broker/client in this environment — broker-only residue)")
    require(staticPartition.isEmpty || sink.format != "jdbc" &&
        !cdcFormats.contains(sink.format),
      s"INSERT ... PARTITION targets a partitioned filesystem table, not $table")
    if (cdcFormats.contains(sink.format))
      return insertIntoCdc(spark, table, rows, overwrite, sink)
    if (sink.format == "jdbc")
      return insertIntoJdbc(spark, table, rows, overwrite, sink)
    require(sink.format != "datagen",
      s"INSERT INTO datagen table '$table': datagen is a source-only connector")
    require(sink.format != "raw",
      s"INSERT INTO raw table '$table': the raw file mapping is one record per " +
        "file — a batch INSERT would explode into per-row files; write blob " +
        "corpora with a dedicated blob writer and read them through the raw table")
    if (sink.format == "bucketed") {
      require(staticPartition.isEmpty,
        s"INSERT ... PARTITION does not apply to bucketed table $table")
      val n = sink.options("buckets").toInt
      val cols = sink.options("bucket-by").split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val fmt = sink.options.getOrElse("format", "parquet")
      val target = StructType(spark.table(table).schema)
      require(rows.schema.length == target.length,
        s"INSERT INTO $table: query has ${rows.schema.length} columns, " +
          s"table has ${target.length}")
      val aligned = rows.toDF(target.fieldNames.toSeq: _*)
        .select(target.fields.map(f =>
          org.apache.spark.sql.functions.col(f.name).cast(f.dataType)).toSeq: _*)
      // append through saveAsTable so the writer lays out the bucket
      // files (insertInto would ignore the bucket spec)
      enforced(table, aligned).write.format(fmt)
        .mode(if (overwrite) "overwrite" else "append")
        .bucketBy(n, cols.head, cols.tail: _*)
        .sortBy(cols.head, cols.tail: _*)
        .saveAsTable(table)
      return
    }
    // SQL INSERT maps columns by POSITION: align names and types to
    // the target schema so mixed-name files can't silently null out.
    // Computed columns are virtual (re-derived on read) — they are
    // not insert targets, matching the reference. Static partition
    // columns (INSERT ... PARTITION (p='x')) are not insert targets
    // either — their literal fills in after alignment.
    val partKeys = partitionKeysOf(table)
    require(staticPartition.keySet.subsetOf(partKeys.toSet),
      s"PARTITION clause columns ${staticPartition.keySet.mkString(", ")} must be " +
        s"partition keys of $table (${partKeys.mkString(", ")})")
    val virtual = metaOf(table).computed.map(_._1).toSet ++
      metaColsOf(table).map(_.name) // metadata is read-only, never an INSERT target
    val target = StructType(spark.table(table).schema.filterNot(f => virtual(f.name)))
    val dynamic = StructType(target.filterNot(f => staticPartition.contains(f.name)))
    require(rows.schema.length == dynamic.length,
      s"INSERT INTO $table: query has ${rows.schema.length} columns, " +
        s"table expects ${dynamic.length} (after static partition columns)")
    val aligned0 = rows.toDF(dynamic.fieldNames.toSeq: _*)
    val aligned = aligned0.select(target.fields.map { f =>
      staticPartition.get(f.name) match {
        case Some(v) => org.apache.spark.sql.functions.lit(v).cast(f.dataType).as(f.name)
        case None => org.apache.spark.sql.functions.col(f.name).cast(f.dataType)
      }
    }.toSeq: _*)
    val checked = enforced(table, aligned)
    if (sink.format == "sequence-file") {
      graft.sources.SequenceFileFormat.write(checked, sink.path, overwrite,
        sink.options.get("sequence-file.compression")
          .orElse(sink.options.get("compression")))
    } else if (sink.format == "avro") {
      if (overwrite) graft.sources.AvroFormat.write(checked, sink.path)
      else graft.sources.AvroFormat.append(checked, sink.path)
    } else {
      val writer = checked.write
        .mode(if (overwrite) "overwrite" else "append")
        .format(sink.format)
      // partitioned tables write one directory per partition value
      // (FileSystemTableSink's partition grouping) — downstream scans
      // with a partition predicate prune whole directories
      val keys = partitionKeysOf(table)
      // a static-partition OVERWRITE replaces only the named
      // partition (the reference's INSERT OVERWRITE ... PARTITION):
      // dynamic overwrite mode rewrites just the directories this
      // write touches
      val wp0 = if (keys.nonEmpty) writer.partitionBy(keys: _*) else writer
      val wp = if (staticPartition.nonEmpty)
        wp0.option("partitionOverwriteMode", "dynamic") else wp0
      val w2 = if (sink.format == "csv")
        wp.options(csvSparkOptions(sink.options, write = true)) else wp
      // 'compression' (or '<format>.compression') — the flink-compress
      // analog: text formats write .gz/.bz2/... files (Spark reads
      // them back transparently), parquet/orc switch their internal
      // block codec. Validation is Spark's: an unknown codec name
      // fails the write loudly
      val w3 = sink.options.get(s"${sink.format}.compression")
        .orElse(sink.options.get("compression"))
        .map(c => w2.option("compression", c)).getOrElse(w2)
      w3.save(sink.path)
    }
    // refresh the registered view so subsequent reads see the write
    // (computed columns/watermark re-applied over the physical files)
    val refreshed =
      if (sink.format == "avro")
        spark.read.format("graft.sources.AvroSource").load(sink.path)
      else if (sink.format == "sequence-file")
        graft.sources.SequenceFileFormat.read(spark, sink.path,
          tableSchemas.getOrElse(table, target))
      else if (partitionKeysOf(table).nonEmpty)
        loadPartitionedView(spark, table, sink.format, sink.options,
          tableSchemas.getOrElse(table, target), sink.path)
      else {
        val reader = spark.read.format(sink.format)
        val r2 = if (sink.format == "csv")
          reader.options(csvSparkOptions(sink.options, write = false))
            .schema(tableSchemas.getOrElse(table, target))
          else reader
        applyFileMetaCols(table, r2.load(sink.path))
      }
    applyEventTime(table, refreshed).createOrReplaceTempView(table)
  }

  /** The write half of the jdbc connector: position-align + enforce
    * constraints like the filesystem path, then hand off to
    * JdbcConnector.write — upsert when the DDL declared a PRIMARY
    * KEY, append otherwise (JdbcDynamicTableSink's mode rule). No
    * view refresh needed: the registered view is a JDBCRelation that
    * re-queries the DB at every action.
    */
  private def insertIntoJdbc(spark: SparkSession, table: String, rows: DataFrame,
      overwrite: Boolean, sink: SinkInfo): Unit = {
    // a changelog INSERT (rows carrying __rowkind) applies deletes as
    // DELETEs — the reference's JDBC sink consuming a retract stream
    val kindCol = graft.changelog.Changelog.RowKindCol
    if (rows.columns.contains(kindCol)) {
      require(!overwrite, "changelog INSERT into jdbc cannot be OVERWRITE")
      // position-align the payload to the table schema (kind rides by
      // name) — SQL INSERT maps columns by POSITION here like
      // everywhere else, and declared types apply before the wire
      val target = StructType(spark.table(table).schema)
      val payload = rows.columns.filterNot(_ == kindCol).toSeq
      require(payload.length == target.length,
        s"INSERT INTO $table: query has ${payload.length} payload columns, " +
          s"table has ${target.length}")
      val aligned = rows.select(payload.zip(target.fields).map { case (c, f) =>
        org.apache.spark.sql.functions.col(c).cast(f.dataType).as(f.name)
      } :+ org.apache.spark.sql.functions.col(kindCol): _*)
      return graft.sources.JdbcConnector.writeChangelog(
        enforced(table, aligned), sink.options, primaryKeyOf(table))
    }
    val virtual = metaOf(table).computed.map(_._1).toSet
    val target = StructType(spark.table(table).schema.filterNot(f => virtual(f.name)))
    require(rows.schema.length == target.length,
      s"INSERT INTO $table: query has ${rows.schema.length} columns, table has ${target.length}")
    val aligned = rows.toDF(target.fieldNames.toSeq: _*)
      .select(target.fields.map(f =>
        org.apache.spark.sql.functions.col(f.name).cast(f.dataType)).toSeq: _*)
    graft.sources.JdbcConnector.write(enforced(table, aligned), sink.options,
      primaryKeyOf(table), overwrite)
  }

  /** The write half of the CDC formats (the reference's
    * DebeziumJsonSerializationSchema:79-90 /
    * CanalJsonSerializationSchema:93-98): +I/+U rows encode as op
    * "c"/INSERT with the after image, -U/-D as op "d"/DELETE with the
    * before image — the two-op round-trippable subset the reference
    * serializes (no "old" field). Input rows may carry `__rowkind`
    * (a changelog write); without it every row is an insert.
    */
  private def insertIntoCdc(spark: SparkSession, table: String, rows: DataFrame,
      overwrite: Boolean, sink: SinkInfo): Unit = {
    import org.apache.spark.sql.functions._
    val kindCol = graft.changelog.Changelog.RowKindCol
    val physical = tableSchemas.getOrElse(table,
      sys.error(s"CDC table $table needs declared columns to encode"))
    val hasKind = rows.columns.contains(kindCol)
    val payloadCols = rows.columns.filterNot(_ == kindCol).toSeq
    require(payloadCols.length == physical.length,
      s"INSERT INTO $table: query has ${payloadCols.length} payload columns, " +
        s"table has ${physical.length}")
    // position-align payload to the declared schema (kind rides along
    // by name), then enforce the table's constraints on the payload
    val aligned = rows.select(payloadCols.zip(physical.fields).map {
      case (c, f) => col(c).cast(f.dataType).as(f.name)
    } ++ (if (hasKind) Seq(col(kindCol)) else Nil): _*)
    val checked = enforced(table, aligned)
    val C = graft.changelog.Changelog
    val kind = if (hasKind) col(kindCol) else lit(C.Insert)
    val isUpsert = kind.isin(C.Insert, C.UpdateAfter)
    // a NULL or out-of-range kind must never silently encode as a
    // delete (data loss on the next read) — reject loudly, matching
    // the decoder's strict-mode contract
    val isRetract = when(kind.isin(C.UpdateBefore, C.Delete), lit(true))
      .otherwise(raise_error(concat(
        lit(s"invalid $kindCol value for CDC encode: "), kind.cast("string"))))
    // to_json omits null fields, so the absent image (before on c,
    // after on d) simply isn't written — the decoder reads absent as
    // null, matching the reference's envelope
    val payload = struct(physical.fieldNames.toSeq.map(col): _*)
    val tsOpts = sink.options.get(s"${sink.format}.timestamp-format")
      .map("timestampFormat" -> _).toMap
    // a schema-include table decodes {"payload": envelope} — the
    // writer must produce what the table's own decoder expects
    val schemaInclude = sink.format == "debezium-json" &&
      sink.options.get("debezium-json.schema-include").contains("true")
    def envelope(e: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      if (schemaInclude) to_json(struct(e.as("payload")), tsOpts) else to_json(e, tsOpts)
    val line = sink.format match {
      case "debezium-json" =>
        when(isUpsert, envelope(struct(payload.as("after"), lit("c").as("op"))))
          .when(isRetract, envelope(struct(payload.as("before"), lit("d").as("op"))))
      case "ogg-json" => // before/after images, I/D ops (OggJsonSerializationSchema.java:88-102)
        when(isUpsert, to_json(struct(payload.as("after"), lit("I").as("op_type")), tsOpts))
          .when(isRetract, to_json(struct(payload.as("before"), lit("D").as("op_type")), tsOpts))
      case "maxwell-json" => // data always carries the row (MaxwellJsonSerializationSchema.java:77-95)
        to_json(struct(payload.as("data"),
          when(isUpsert, lit("insert"))
            .when(isRetract, lit("delete")).as("type")), tsOpts)
      case _ => // canal-json
        to_json(struct(array(payload).as("data"),
          when(isUpsert, lit("INSERT"))
            .when(isRetract, lit("DELETE")).as("type")), tsOpts)
    }
    checked.select(line.as("value"))
      .write.mode(if (overwrite) "overwrite" else "append").text(sink.path)
    // rebuild the decoded changelog view over the refreshed files
    register(spark, table, tableOptions.getOrElse(table, sink.options))
  }

  /** Streaming file-sink writer for a DDL table — the reference's
    * FileSink rolling + auto-compaction surface as table options:
    * 'sink.rolling-policy.file-size' (target part size, default
    * 128MB), 'auto-compaction' = 'true' to compact small files every
    * 'compaction.every' batches (default 10). Use as
    * `stream.writeStream.foreachBatch(GraftCatalog.rollingSink(t))`.
    */
  /** The flink-csv option surface mapped onto Spark's CSV reader/
    * writer options: `csv.header`, `csv.field-delimiter`,
    * `csv.quote-character` / `csv.disable-quote-character` (mutually
    * exclusive, like the reference factory), `csv.escape-character`,
    * `csv.null-literal`, and on the READ side `csv.ignore-parse-errors`
    * (→ DROPMALFORMED) and `csv.allow-comments` (→ '#' comment lines,
    * the reference's fixed comment marker). Out of scope with reason:
    * `csv.array-element-delimiter` — Spark's CSV source has no array
    * columns to delimit (the reference flattens arrays into one cell).
    */
  private[graft] def csvSparkOptions(
      options: Map[String, String], write: Boolean): Map[String, String] = {
    require(!(options.get("csv.disable-quote-character").exists(_.toBoolean) &&
        options.contains("csv.quote-character")),
      "csv.disable-quote-character and csv.quote-character are mutually exclusive")
    val m = scala.collection.mutable.LinkedHashMap[String, String](
      "header" -> options.getOrElse("csv.header", "false"))
    options.get("csv.field-delimiter").foreach(m("sep") = _)
    // NUL is univocity's disable sentinel: turns quoting off on
    // both the parser and the writer
    if (options.get("csv.disable-quote-character").exists(_.toBoolean))
      m("quote") = "\u0000"
    options.get("csv.quote-character").foreach(m("quote") = _)
    options.get("csv.escape-character").foreach(m("escape") = _)
    options.get("csv.null-literal").foreach(m("nullValue") = _)
    if (!write) {
      if (options.get("csv.ignore-parse-errors").exists(_.toBoolean))
        m("mode") = "DROPMALFORMED"
      if (options.get("csv.allow-comments").exists(_.toBoolean))
        m("comment") = "#"
    }
    m.toMap
  }

  /** Spark reader/writer options for a table's file format (the csv
    * surface above; parquet/orc/json need none) plus the file-side
    * schema (declared columns minus the partition keys, which live in
    * directory names) — what the rolling sink and compaction must
    * carry so non-self-describing formats survive a rewrite.
    */
  private def fileFormatOptions(table: String, sink: SinkInfo): Map[String, String] =
    if (sink.format == "csv") csvSparkOptions(sink.options, write = true)
    else Map.empty

  private def fileSchemaOf(table: String): Option[StructType] =
    tableSchemas.get(table).map { declared =>
      val parts = partitionKeysOf(table).toSet
      StructType(declared.filterNot(f => parts(f.name)))
    }

  def rollingSink(table: String): (DataFrame, Long) => Unit = {
    val sink = sinkOf(table).getOrElse(
      sys.error(s"table '$table' is not a filesystem table"))
    require(Set("parquet", "csv", "json", "orc").contains(sink.format),
      s"rolling file sink supports native file formats, not '${sink.format}'")
    val target = sink.options.get("sink.rolling-policy.file-size")
      .map(graft.streaming.RollingFileSink.parseSize).getOrElse(128L << 20)
    val every =
      if (sink.options.get("auto-compaction").contains("true"))
        sink.options.get("compaction.every").map(_.toInt).getOrElse(10)
      else 0
    graft.streaming.RollingFileSink.rolling(
      sink.path, sink.format, target, partitionKeysOf(table), every,
      fileFormatOptions(table, sink), fileSchemaOf(table))
  }

  /** One compaction pass over a DDL file table's directory tree
    * (per-partition for PARTITIONED BY tables).
    */
  def compactTable(spark: SparkSession, table: String)
      : graft.streaming.RollingFileSink.CompactionReport = {
    val sink = sinkOf(table).getOrElse(
      sys.error(s"table '$table' is not a filesystem table"))
    require(Set("parquet", "csv", "json", "orc").contains(sink.format),
      s"compaction supports native file formats, not '${sink.format}'")
    val target = sink.options.get("sink.rolling-policy.file-size")
      .map(graft.streaming.RollingFileSink.parseSize).getOrElse(128L << 20)
    graft.streaming.RollingFileSink.compact(
      spark, sink.path, sink.format, target, partitionKeysOf(table),
      fileFormatOptions(table, sink), fileSchemaOf(table))
  }

  def constraintsOf(table: String): TableConstraints =
    tableConstraints.getOrElse(table, TableConstraints(Nil, Nil))

  /** Apply the table's DDL constraints to a DataFrame bound for its
    * sink (ERROR on nulls, TRIM_PAD on lengths — the reference's
    * defaults are ERROR/ERROR; pass modes explicitly to override).
    */
  def enforced(table: String, df: org.apache.spark.sql.DataFrame,
      notNullMode: graft.operators.ConstraintEnforcer.NotNullMode =
        graft.operators.ConstraintEnforcer.ErrorOnNull,
      lengthMode: graft.operators.ConstraintEnforcer.LengthMode =
        graft.operators.ConstraintEnforcer.TrimPad): org.apache.spark.sql.DataFrame = {
    val tc = constraintsOf(table)
    graft.operators.ConstraintEnforcer.enforce(df, tc.notNull, notNullMode, tc.lengths, lengthMode)
  }

  private val CharType: Regex = """(?i)(VAR)?CHAR\s*\(\s*(\d+)\s*\)""".r

  /** Flink type spellings → Spark DDL types; recurses into
    * ARRAY<...> / MAP<...> / ROW<...> (→ STRUCT<...>) generics.
    */
  private def mapType(t: String): String = {
    val trimmed = t.trim
    val up = trimmed.toUpperCase
    val generic = """(?is)^(ARRAY|MAP|ROW|MULTISET)\s*<(.*)>$""".r
    trimmed match {
      case generic(outer, inner) =>
        val parts = splitTopLevel(inner)
        outer.toUpperCase match {
          case "ARRAY" | "MULTISET" => s"ARRAY<${mapType(parts.head)}>"
          case "MAP" => s"MAP<${mapType(parts(0))}, ${mapType(parts(1))}>"
          case "ROW" =>
            // ROW<name TYPE, ...> → STRUCT<name: TYPE, ...>
            val fields = parts.map { f =>
              val Array(n, ft) = f.trim.split("\\s+", 2)
              s"$n: ${mapType(ft)}"
            }
            s"STRUCT<${fields.mkString(", ")}>"
        }
      case _ => up match {
        case s if s.startsWith("VARCHAR") || s.startsWith("CHAR") => "STRING"
        case s if s.startsWith("TIMESTAMP_LTZ") => "TIMESTAMP"
        case s if s.startsWith("TIMESTAMP") => "TIMESTAMP"
        case "INT" | "INTEGER" => "INT"
        case s => s
      }
    }
  }

  /** Split on commas at generic-nesting depth 0 ('<>' and parens). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    val cur = new java.lang.StringBuilder
    s.foreach {
      case c @ ('<' | '(') => depth += 1; cur.append(c)
      case c @ ('>' | ')') => depth -= 1; cur.append(c)
      case ',' if depth == 0 => out += cur.toString; cur.setLength(0)
      case c => cur.append(c)
    }
    if (cur.length > 0) out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** WITH-clause option parsing, shared by every statement that
    * takes one ('k' = 'v', keys lowercased).
    */
  private[graft] def parseOptions(s: String): Map[String, String] =
    """'([^']*)'\s*=\s*'([^']*)'""".r.findAllMatchIn(s)
      .map(m => m.group(1).toLowerCase -> m.group(2)).toMap

  private val WatermarkDef: Regex =
    """(?is)^WATERMARK\s+FOR\s+(\w+)\s+AS\s+(.+)$""".r
  private val BoundedDelay: Regex =
    """(?is)^\s*(\w+)\s*-\s*INTERVAL\s*'([\d.]+)'\s*(\w+)\s*$""".r
  private val ComputedDef: Regex = """(?is)^(\w+)\s+AS\s+(.+)$""".r

  /** `ts - INTERVAL '5' SECOND` → the "5 second" delay withWatermark
    * wants; a bare `ts` means strictly-ascending (0 delay). Anything
    * else is outside the bounded-out-of-orderness shape the reference
    * plans (WatermarkStrategy bounded/ascending) — reject loudly
    * rather than silently dropping the watermark.
    */
  private def watermarkDelay(col: String, e: String): String = e.trim match {
    case BoundedDelay(c, n, unit) if c.equalsIgnoreCase(col) => s"$n $unit"
    case bare if bare.equalsIgnoreCase(col) => "0 seconds"
    // SOURCE_WATERMARK(): "the connector supplies the watermark"
    // (parserImpls.ftl / BuiltInFunctionDefinitions SOURCE_WATERMARK);
    // file/micro-batch sources have no out-of-band watermark channel,
    // so the closest faithful mapping is the ascending strategy on the
    // declared rowtime column
    case sw if sw.equalsIgnoreCase("SOURCE_WATERMARK()") => "0 seconds"
    case other => sys.error(s"unsupported watermark expression: $other")
  }

  private val PrimaryKeyDef: Regex =
    """(?is)^PRIMARY\s+KEY\s*\(([^)]*)\)\s*(?:NOT\s+ENFORCED)?\s*$""".r

  private val MetadataMod: Regex =
    """(?is)^\s*METADATA(?:\s+FROM\s+'([^']+)')?(\s+VIRTUAL)?\s*$""".r

  private def parseSchema(cols: String)
      : (StructType, TableConstraints, EventTimeMeta, Seq[String], Seq[MetaCol]) = {
    // commas split at generic-nesting depth 0, so ROW<a INT, b INT>
    // and MAP<STRING, INT> column types survive
    val all = splitTopLevel(cols)
    // WATERMARK FOR / computed-column / PRIMARY KEY defs are virtual —
    // they leave the physical schema and come back as metadata
    var watermark: Option[(String, String)] = None
    var primaryKey: Seq[String] = Nil
    val computed = Seq.newBuilder[(String, String)]
    val defs = all.filter {
      case WatermarkDef(col, e) =>
        watermark = Some((col, watermarkDelay(col, e))); false
      case PrimaryKeyDef(ks) =>
        primaryKey = ks.split(",").map(_.trim).filter(_.nonEmpty).toSeq; false
      case ComputedDef(name, e)
          if !name.equalsIgnoreCase("WATERMARK") && !e.trim.isEmpty =>
        computed += (name -> e.trim); false
      case _ => true
    }
    val meta = EventTimeMeta(computed.result(), watermark)
    val notNull = Seq.newBuilder[String]
    val lengths = Seq.newBuilder[LengthConstraint]
    val metaCols = Seq.newBuilder[MetaCol]
    val fields = defs.flatMap { c =>
      val parts = c.split("\\s+", 2)
      val (name, typeAndRest) = (parts(0), parts(1))
      // split the TYPE text from trailing modifiers at generic depth 0,
      // so VARCHAR(n)/NOT NULL INSIDE ARRAY/MAP/ROW generics never
      // register top-level constraints on the complex column
      val typeEnd = {
        var depth = 0
        var i = 0
        while (i < typeAndRest.length &&
            (depth > 0 || !typeAndRest.charAt(i).isWhitespace)) {
          typeAndRest.charAt(i) match {
            case '<' | '(' => depth += 1
            case '>' | ')' => depth -= 1
            case _ =>
          }
          i += 1
        }
        i
      }
      val typeOnly = typeAndRest.substring(0, typeEnd)
      val modifiers = typeAndRest.substring(typeEnd)
      modifiers match {
        // METADATA columns are virtual: they leave the physical
        // schema and come back as a connector-metadata projection
        case MetadataMod(keyOrNull, virtualOrNull) =>
          val dt = StructType.fromDDL(s"__m ${mapType(typeOnly)}").head.dataType
          metaCols += MetaCol(name, dt,
            Option(keyOrNull).getOrElse(name), virtualOrNull != null)
          None
        case _ =>
          if (modifiers.toUpperCase.contains("NOT NULL")) notNull += name
          if (!typeOnly.contains("<"))
            CharType.findFirstMatchIn(typeOnly).foreach { m =>
              lengths += LengthConstraint(name, m.group(2).toInt, pad = m.group(1) == null)
            }
          Some(s"$name ${mapType(typeOnly)}")
      }
    }
    (StructType.fromDDL(fields.mkString(", ")),
      TableConstraints(notNull.result(), lengths.result()), meta, primaryKey,
      metaCols.result())
  }

  private val tableOptions =
    scala.collection.concurrent.TrieMap.empty[String, Map[String, String]]

  /** Re-render a stored "<n> <unit>" watermark delay as the DDL
    * clause the parser accepts (`INTERVAL '<n>' <UNIT>`), so SHOW
    * CREATE TABLE output is executable DDL; the ascending case
    * ("0 seconds" from a bare column) renders bare again.
    */
  private def watermarkClause(c: String, delay: String): String =
    delay.split(" ", 2) match {
      case Array("0", _) => s"WATERMARK FOR $c AS $c"
      case Array(n, unit) =>
        s"WATERMARK FOR $c AS $c - INTERVAL '$n' ${unit.toUpperCase(java.util.Locale.ROOT)}"
      case _ => s"WATERMARK FOR $c AS $c"
    }

  private def ddlTypeOf(tc: TableConstraints,
      f: org.apache.spark.sql.types.StructField): String =
    tc.lengths.find(_.column == f.name) match {
      case Some(lc) if lc.pad => s"CHAR(${lc.length})"
      case Some(lc) => s"VARCHAR(${lc.length})"
      case None => f.dataType.sql
    }

  /** SHOW CREATE TABLE — reconstruct the connector DDL from the
    * registries (schema with CHAR/VARCHAR lengths and NOT NULL,
    * computed columns, watermark with its normalized delay, PRIMARY
    * KEY from the upsert/CDC spec, WITH options sorted by key). The
    * sql-client introspection surface.
    */
  def showCreateTable(name: String): String = {
    val opts = tableOptions.getOrElse(name,
      sys.error(s"table '$name' was not declared through connector DDL"))
    val tc = constraintsOf(name)
    val meta = metaOf(name)
    val computedNames = meta.computed.map(_._1).toSet
    val colLines = tableSchemas.get(name).toSeq.flatMap(
      _.fields.toSeq.filterNot(f => computedNames(f.name)).map { f =>
        s"  ${f.name} ${ddlTypeOf(tc, f)}" +
          (if (tc.notNull.contains(f.name)) " NOT NULL" else "")
      })
    val computedLines = meta.computed.map { case (n, e) => s"  $n AS $e" }
    val metaColLines = metaColsOf(name).map { mc =>
      s"  ${mc.name} ${mc.dataType.sql} METADATA" +
        (if (mc.key != mc.name) s" FROM '${mc.key}'" else "") +
        (if (mc.virtual) " VIRTUAL" else "")
    }
    val wmLines = meta.watermark.toSeq.map { case (c, d) =>
      s"  ${watermarkClause(c, d)}" }
    val pkLine = upsertOf(name).orElse(cdcOf(name)).filter(_.keys.nonEmpty)
      .map(sp => s"  PRIMARY KEY (${sp.keys.mkString(", ")}) NOT ENFORCED").toSeq
    val withClause = opts.toSeq.sortBy(_._1)
      .map { case (k, v) => s"'$k' = '$v'" }.mkString(",\n  ")
    val partClause = partitionKeysOf(name) match {
      case Nil => ""
      case ks => s" PARTITIONED BY (${ks.mkString(", ")})"
    }
    s"CREATE TABLE $name (\n" +
      (colLines ++ computedLines ++ metaColLines ++ wmLines ++ pkLine).mkString(",\n") +
      s"\n)$partClause WITH (\n  $withClause\n)"
  }

  /** DESCRIBE — one row per column (name, type, null, key, extras,
    * watermark), the reference sql-client's table shape. Computed
    * columns read their derived type off the registered view.
    */
  def describeTable(spark: SparkSession, name: String): org.apache.spark.sql.DataFrame = {
    val schema = tableSchemas.getOrElse(name,
      sys.error(s"table '$name' was not declared through connector DDL"))
    val tc = constraintsOf(name)
    val meta = metaOf(name)
    val keys = upsertOf(name).orElse(cdcOf(name)).map(_.keys).getOrElse(Nil)
    val viewTypes = scala.util.Try(spark.table(name).schema).toOption
      .map(_.fields.map(f => f.name -> f.dataType.sql).toMap).getOrElse(Map.empty)
    def wmOf(c: String) = meta.watermark.collect {
      case (`c`, d) => watermarkClause(c, d).stripPrefix(s"WATERMARK FOR $c AS ") }
      .getOrElse("")
    def keyOf(c: String) =
      if (keys.contains(c)) s"PRI(${keys.mkString(", ")})" else ""
    val physical = schema.fields.toSeq.map { f =>
      // primary-key columns are NOT NULL by definition, like the
      // reference's DESCRIBE output
      (f.name, ddlTypeOf(tc, f),
        !tc.notNull.contains(f.name) && !keys.contains(f.name),
        keyOf(f.name), "", wmOf(f.name))
    }
    val computed = meta.computed.map { case (n, e) =>
      (n, viewTypes.getOrElse(n, ""), true, keyOf(n), s"AS $e", wmOf(n))
    }
    val metadata = metaColsOf(name).map { mc =>
      (mc.name, mc.dataType.sql, true, keyOf(mc.name),
        s"METADATA FROM '${mc.key}'" + (if (mc.virtual) " VIRTUAL" else ""), wmOf(mc.name))
    }
    import spark.implicits._
    (physical ++ computed ++ metadata)
      .toDF("name", "type", "null", "key", "extras", "watermark")
  }

  /** Was this name declared through the connector DDL? (drives DROP
    * TABLE routing — Spark-native tables stay with spark.sql)
    */
  def isRegistered(table: String): Boolean = tableOptions.contains(table)

  /** Execute DDL: CREATE TABLE (+LIKE), DROP TABLE. The table becomes
    * a temp view readable by name in spark.sql / GraftSql.
    */
  def executeDdl(spark: SparkSession, ddl: String): Unit = ddl match {
    case CreateTablePartitioned(name, cols, parts, opts) =>
      val keys = parts.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      require(keys.nonEmpty, s"PARTITIONED BY on $name needs at least one column")
      // only Spark-native file formats lay out partition directories;
      // avro (own container writer) and CDC formats would silently
      // write flat — reject at DDL time instead
      val fmt = parseOptions(opts).getOrElse("format", "parquet")
      require(Set("parquet", "csv", "json", "orc").contains(fmt),
        s"PARTITIONED BY is not supported for format '$fmt'")
      tablePartitionKeys.put(name, keys)
      createTable(spark, name, cols, opts)

    case CreateTable(name, cols, opts) =>
      createTable(spark, name, cols, opts)

    // CREATE TABLE a LIKE b [WITH (...)] — schema, constraints,
    // event-time metadata and upsert spec copy from the base table;
    // WITH options override/extend the base's (the common slice of
    // the reference's LIKE clause with OVERWRITING OPTIONS)
    case CreateTableLike(name, base, optsOrNull) =>
      val baseOpts = tableOptions.getOrElse(base,
        sys.error(s"CREATE TABLE ... LIKE: unknown base table '$base'"))
      val merged = baseOpts ++ Option(optsOrNull).map(parseOptions).getOrElse(Map.empty)
      tableSchemas.get(base).foreach(tableSchemas.put(name, _))
      tableConstraints.get(base).foreach(tableConstraints.put(name, _))
      tableMeta.get(base).foreach(tableMeta.put(name, _))
      tableUpsert.get(base).foreach(tableUpsert.put(name, _))
      tableCdc.get(base).foreach(tableCdc.put(name, _))
      tablePrimaryKeys.get(base).foreach(tablePrimaryKeys.put(name, _))
      tablePartitionKeys.get(base).foreach(tablePartitionKeys.put(name, _))
      tableMetaCols.get(base).foreach(tableMetaCols.put(name, _))
      tableOptions.put(name, merged)
      bumpGeneration(name)
      register(spark, name, merged)

    case DropTable(name) =>
      spark.catalog.dropTempView(name)
      // bucketed tables live in the session metastore, not a temp view
      if (tableSinks.get(name).exists(_.format == "bucketed"))
        spark.sql(s"DROP TABLE IF EXISTS `$name`")
      Seq(tableSinks, tableConstraints, tableSchemas, tableMeta, tableUpsert,
        tableCdc, tableOptions, tablePrimaryKeys, tablePartitionKeys, tableMetaCols)
        .foreach(_.remove(name))
      // a dropped table's ANALYZE stats must not keep feeding the
      // planner (or pinning the analyzed leaf plan)
      clearStats(name)
      bumpGeneration(name)

    // ALTER TABLE t SET ('k' = 'v', ...) — merge option overrides and
    // re-register the view over the updated source (the reference's
    // SqlAlterTableOptions applied through the catalog)
    case AlterTableSet(name, opts) =>
      val base = tableOptions.getOrElse(name,
        sys.error(s"ALTER TABLE: unknown table '$name'"))
      val merged = base ++ parseOptions(opts)
      tableOptions.put(name, merged)
      bumpGeneration(name)
      register(spark, name, merged)

    // ALTER TABLE t ADD (col TYPE | computed AS expr | WATERMARK FOR |
    // PRIMARY KEY) — FLIP-273 schema evolution. Existing files simply
    // lack the new physical columns, so they read as NULL (the
    // declared schema drives the scan); metadata-only, like the
    // reference's catalog ALTER.
    // ALTER TABLE t ADD/DROP [IF (NOT) EXISTS] PARTITION (k=v[,...])
    // [, PARTITION ...] — the reference's SqlAddPartitions/
    // SqlDropPartitions against the filesystem layout: a partition IS
    // its k=v directory, so ADD creates it (visible to SHOW
    // PARTITIONS, scanned once rows land) and DROP removes it and its
    // data, then the view re-registers so readers see the change
    case AlterTableAddPartitions(name, ifNotExists, specText) =>
      alterPartitions(spark, name, specText, add = true, lenient = ifNotExists != null)
    case AlterTableDropPartitions(name, ifExists, specText) =>
      alterPartitions(spark, name, specText, add = false, lenient = ifExists != null)

    case AlterTableAdd(name, defs) => alterSchema(spark, name, defs, modify = false)
    case AlterTableAddOne(name, definition) =>
      alterSchema(spark, name, definition, modify = false)

    // ALTER TABLE t MODIFY (col TYPE ...) — redeclare existing columns
    case AlterTableModify(name, defs) => alterSchema(spark, name, defs, modify = true)
    case AlterTableModifyOne(name, definition) =>
      alterSchema(spark, name, definition, modify = true)

    // ALTER TABLE t RESET ('k' [, ...]) — drop option overrides back
    // to defaults and re-register (SqlAlterTableReset)
    case AlterTableReset(name, keys) =>
      val base = tableOptions.getOrElse(name,
        sys.error(s"ALTER TABLE: unknown table '$name'"))
      val drop = keys.split(",").map(_.trim.stripPrefix("'").stripSuffix("'"))
        .filter(_.nonEmpty)
      require(!drop.contains("connector"),
        "ALTER TABLE RESET cannot reset 'connector' (the reference rejects it too)")
      val merged = base -- drop
      tableOptions.put(name, merged)
      bumpGeneration(name)
      register(spark, name, merged)

    // ALTER TABLE t COMPACT — the filesystem connector's small-file
    // compaction statement (SqlAlterTableCompact → our greedy-bin
    // compactTable, same machinery as the rolling sink's auto pass)
    case AlterTableCompact(name) =>
      compactTable(spark, name)
      register(spark, name, tableOptions.getOrElse(name,
        sys.error(s"ALTER TABLE: unknown table '$name'")))

    // ALTER TABLE t RENAME TO t2 — every registry entry moves with it
    case AlterTableRename(name, newName) =>
      require(tableOptions.contains(name), s"ALTER TABLE: unknown table '$name'")
      require(!tableOptions.contains(newName),
        s"ALTER TABLE: target name '$newName' already exists")
      Seq(tableSinks, tableConstraints, tableSchemas, tableMeta, tableUpsert,
        tableCdc, tableOptions, tablePrimaryKeys, tablePartitionKeys,
        tableMetaCols).foreach { reg =>
        reg.remove(name).foreach(v =>
          reg.asInstanceOf[scala.collection.concurrent.TrieMap[String, Any]]
            .put(newName, v))
      }
      spark.catalog.dropTempView(name)
      bumpGeneration(name)
      bumpGeneration(newName)
      register(spark, newName, tableOptions(newName))

    case other => sys.error(s"unsupported DDL: $other")
  }

  /** ADD/MODIFY column defs: physical columns extend/redeclare the
    * schema; computed columns, WATERMARK and PRIMARY KEY defs merge
    * into the virtual metadata — then the view re-registers.
    */
  /** ADD/DROP PARTITION over the partitioned filesystem layout: each
    * PARTITION (k=v[,...]) group maps to its k=v directory chain
    * under the table root. `lenient` is IF [NOT] EXISTS.
    */
  private def alterPartitions(spark: SparkSession, name: String, specText: String,
      add: Boolean, lenient: Boolean): Unit = {
    val keys = tablePartitionKeys.getOrElse(name,
      sys.error(s"ALTER TABLE ${if (add) "ADD" else "DROP"} PARTITION: " +
        s"table '$name' is not partitioned"))
    val sink = tableSinks.getOrElse(name,
      sys.error(s"ALTER TABLE PARTITION: table '$name' has no filesystem path"))
    val specs = """(?is)PARTITION\s*\(([^)]*)\)""".r
      .findAllMatchIn(specText).map(_.group(1)).toSeq
    require(specs.nonEmpty, "expected PARTITION (key = value [, ...])")
    val conf = spark.sessionState.newHadoopConf()
    specs.foreach { s =>
      val kv = s.split(",").map(_.trim).filter(_.nonEmpty).map { p =>
        val parts = p.split("=", 2)
        require(parts.length == 2, s"partition spec expects key = value, got '$p'")
        parts(0).trim.toLowerCase(java.util.Locale.ROOT) ->
          parts(1).trim.stripPrefix("'").stripSuffix("'")
      }.toMap
      require(kv.keySet == keys.map(_.toLowerCase(java.util.Locale.ROOT)).toSet,
        s"partition spec (${kv.keys.mkString(", ")}) must name exactly the " +
          s"partition keys (${keys.mkString(", ")})")
      // Spark's writer escapes special characters in partition paths
      // (':' → %3A etc., ExternalCatalogUtils.escapePathName) — build
      // the directory the same way or ADD/DROP would miss the data
      // the writer actually laid down
      val dir = keys.foldLeft(new org.apache.hadoop.fs.Path(sink.path))((p, k) =>
        new org.apache.hadoop.fs.Path(p,
          org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .getPartitionPathString(k, kv(k.toLowerCase(java.util.Locale.ROOT)))))
      val fs = dir.getFileSystem(conf)
      if (add) {
        if (fs.exists(dir)) require(lenient,
          s"ALTER TABLE ADD PARTITION: partition already exists: $dir " +
            "(use IF NOT EXISTS)")
        else fs.mkdirs(dir)
      } else {
        if (!fs.exists(dir)) require(lenient,
          s"ALTER TABLE DROP PARTITION: partition does not exist: $dir " +
            "(use IF EXISTS)")
        else fs.delete(dir, true)
      }
    }
    bumpGeneration(name)
    register(spark, name, tableOptions.getOrElse(name,
      sys.error(s"ALTER TABLE PARTITION: unknown table '$name'")))
  }

  private def alterSchema(spark: SparkSession, name: String, defs: String,
      modify: Boolean): Unit = {
    require(tableOptions.contains(name), s"ALTER TABLE: unknown table '$name'")
    // bucketed metastore relations own their schema — a registry-only
    // update would silently never reach the table (register() defers
    // to the metastore); reject instead of no-opping
    require(!tableSinks.get(name).exists(_.format == "bucketed"),
      s"ALTER TABLE ADD/MODIFY on bucketed table '$name' is not supported " +
        "(the metastore owns its schema; recreate the table)")
    val (newCols, tc, meta, pk, metaCols) = parseSchema(defs)
    require(metaCols.isEmpty,
      s"ALTER TABLE on $name: METADATA columns must be declared at CREATE time")
    val schema = tableSchemas.getOrElse(name, StructType(Nil))
    val updated =
      if (modify) newCols.fields.foldLeft(schema) { (st, f) =>
        require(st.fieldNames.contains(f.name),
          s"ALTER TABLE MODIFY: unknown column '${f.name}' on $name")
        StructType(st.map(x => if (x.name == f.name) f else x))
      } else {
        newCols.fields.foreach(f => require(!schema.fieldNames.contains(f.name),
          s"ALTER TABLE ADD: column '${f.name}' already exists on $name"))
        StructType(schema.fields ++ newCols.fields)
      }
    if (updated.nonEmpty) tableSchemas.put(name, updated)
    if (!meta.isEmpty) {
      val base = tableMeta.getOrElse(name, EventTimeMeta(Nil, None))
      tableMeta.put(name, EventTimeMeta(
        base.computed.filterNot(c => meta.computed.exists(_._1 == c._1)) ++ meta.computed,
        meta.watermark.orElse(base.watermark)))
    }
    if (pk.nonEmpty) tablePrimaryKeys.put(name, pk)
    if (tc.notNull.nonEmpty || tc.lengths.nonEmpty) {
      val base = constraintsOf(name)
      tableConstraints.put(name, TableConstraints(
        (base.notNull ++ tc.notNull).distinct,
        base.lengths.filterNot(l => tc.lengths.exists(_.column == l.column)) ++ tc.lengths))
    }
    bumpGeneration(name)
    register(spark, name, tableOptions(name))
  }

  private def createTable(spark: SparkSession, name: String, cols: String,
      opts: String): Unit = {
      val options = parseOptions(opts)
      val parsed = if (cols.trim.nonEmpty) Some(parseSchema(cols)) else None
      parsed.foreach { case (schema, tc, meta, pk, metaCols) =>
        tableConstraints.put(name, tc)
        tableSchemas.put(name, schema)
        tableMeta.put(name, meta)
        if (metaCols.nonEmpty) {
          val fmt = options.getOrElse("format", "parquet")
          val connector = options.getOrElse("connector", "")
          require(connector == "filesystem",
            s"METADATA columns on $name: connector '$connector' exposes no metadata " +
              "(supported: filesystem file formats, debezium-json)")
          val validKeys =
            if (fmt == "debezium-json") debeziumMetaKeys
            else if (Set("parquet", "csv", "json", "orc").contains(fmt)) fileMetaKeys.keySet
            else sys.error(s"METADATA columns on $name: format '$fmt' exposes no metadata")
          metaCols.foreach(mc => require(validKeys.contains(mc.key),
            s"METADATA column ${mc.name} on $name: unknown key '${mc.key}' for " +
              s"format '$fmt' (supported: ${validKeys.toSeq.sorted.mkString(", ")})"))
          tableMetaCols.put(name, metaCols)
        }
        if (pk.nonEmpty) tablePrimaryKeys.put(name, pk)
        if (options.get("changelog-mode").contains("upsert")) {
          require(pk.nonEmpty, s"upsert table $name needs a PRIMARY KEY")
          val vcols = options.get("version-by")
            .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
            .getOrElse(sys.error(s"upsert table $name needs 'version-by' " +
              "(the filesystem analog of the Kafka offset order)"))
          tableUpsert.put(name, UpsertSpec(pk, vcols))
        }
        // a CDC format IS the changelog declaration — no changelog-mode
        // option needed; keys/version order feed the normalize path.
        // debezium-avro-confluent is the kafka-carried avro twin of
        // debezium-json — same changelog contract; kafka tables may
        // spell the format 'value.format' too (the factory accepts
        // both), so check both keys
        val declaredFmts = Seq(options.getOrElse("format", ""),
          options.getOrElse("value.format", ""))
        if (declaredFmts.exists(f => cdcFormats.contains(f) ||
            f == "debezium-avro-confluent")) {
          val vcols = options.get("version-by")
            .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
            .getOrElse(Nil)
          tableCdc.put(name, UpsertSpec(pk, vcols))
        }
      }
      tableOptions.put(name, options)
      bumpGeneration(name)
      register(spark, name, options)
  }

  private def register(spark: SparkSession, name: String,
      options: Map[String, String]): Unit = {
    val df: DataFrame = options.getOrElse("connector",
        sys.error("missing 'connector' option")) match {
      // bucketed filesystem tables ('buckets' + 'bucket-by'): the
      // co-located-join layout — both sides of a join bucketed on the
      // key with the same count read pre-partitioned, so the join
      // plans WITHOUT a shuffle exchange (and, with sort-by, without
      // a sort). At 100 TB this turns every repeated fact-fact join
      // on the bucket key into a zero-shuffle merge. Bucket metadata
      // lives only in the session metastore, so this branch uses
      // saveAsTable instead of raw paths.
      case "filesystem" if options.contains("buckets") =>
        val n = options("buckets").toInt
        val cols = options.getOrElse("bucket-by",
            sys.error(s"bucketed table $name needs 'bucket-by'"))
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val fmt = options.getOrElse("format", "parquet")
        if (!spark.catalog.tableExists(name)) {
          // the in-memory metastore dies with the JVM but the
          // warehouse DIRECTORY survives — an unknown table whose
          // location exists is an orphan from a previous session;
          // clear it or saveAsTable throws LOCATION_ALREADY_EXISTS.
          // The location is DATABASE-QUALIFIED (warehouse/<db>.db/<t>
          // off 'default') — deleting warehouse/<t> blindly would hit
          // default.<t>'s live data when the session sits in another
          // database, and miss the actual orphan
          val db = spark.catalog.currentDatabase
          val dirName = name.toLowerCase(java.util.Locale.ROOT)
          val loc = new org.apache.hadoop.fs.Path(
            spark.conf.get("spark.sql.warehouse.dir"),
            if (db == "default") dirName else s"$db.db/$dirName")
          val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
          if (fs.exists(loc)) {
            // the orphan rationale above only holds for the in-memory
            // metastore; with a persistent metastore (hive) an unknown
            // table name + existing location may be ANOTHER session's
            // live bucketed data — refuse rather than destroy it
            val impl = spark.conf.get("spark.sql.catalogImplementation", "in-memory")
            require(impl == "in-memory",
              s"bucketed table $name: location $loc already exists and the " +
                s"catalog is '$impl' (persistent) — the data may belong to a " +
                "live table in another session; drop that table or clear the " +
                "location explicitly before CREATE")
            fs.delete(loc, true)
          }
          val schema = tableSchemas.getOrElse(name,
            sys.error(s"bucketed table $name needs explicit columns"))
          spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
            .write.format(fmt)
            .bucketBy(n, cols.head, cols.tail: _*)
            .sortBy(cols.head, cols.tail: _*)
            .saveAsTable(name)
        }
        tableSinks.put(name, SinkInfo(name, "bucketed", options))
        // the metastore relation IS the source — no temp view on top
        // (a view would still carry the bucket spec, but the metastore
        // name must stay authoritative for INSERT and re-registration)
        return
      case "filesystem" =>
        val fmt = options.getOrElse("format", "parquet")
        val path = options("path")
        // pair-schema formats validate at CREATE — the empty-init
        // branch below never reaches the format reader, so a bad
        // schema would otherwise only surface at first INSERT
        if (fmt == "sequence-file")
          tableSchemas.get(name).foreach(graft.sources.SequenceFileFormat.validate)
        tableSinks.put(name, SinkInfo(path, fmt, options))
        // Hadoop FS check so URI paths (file://, hdfs://, s3://) work
        val hPath = new org.apache.hadoop.fs.Path(path)
        val exists = hPath.getFileSystem(spark.sessionState.newHadoopConf()).exists(hPath)
        if (!exists) { // a pure sink table may not exist yet (Flink allows it)
          val declared = tableSchemas.getOrElse(name,
            sys.error(s"new sink table $name needs a schema"))
          // CDC views carry the decoded rowkind column
          val withKind = if (cdcFormats.contains(fmt))
            declared.add(graft.changelog.Changelog.RowKindCol,
              org.apache.spark.sql.types.ByteType, nullable = false)
          else declared
          // metadata columns exist in the view schema even before any
          // file does (they read as null only in this empty state)
          val schema = metaColsOf(name).foldLeft(withKind)((st, mc) =>
            st.add(mc.name, mc.dataType, nullable = true))
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        }
        else if (cdcFormats.contains(fmt)) {
          // CDC formats decode newline-delimited JSON change events
          // into a __rowkind changelog view
          val schema = tableSchemas.getOrElse(name,
            sys.error(s"$fmt table $name needs explicit columns"))
          decodeCdc(spark.read.text(path), fmt, schema, options, metaColsOf(name))
        }
        else if (fmt == "avro") { // graft's own container-file format
          val r = spark.read.format("graft.sources.AvroSource")
          // the DDL-declared schema wins, like the csv/parquet branches
          tableSchemas.get(name).map(r.schema).getOrElse(r).load(path)
        }
        else if (fmt == "sequence-file") {
          // Hadoop SequenceFile K/V pairs (flink-sequence-file)
          val declared = tableSchemas.getOrElse(name,
            sys.error(s"sequence-file table $name needs explicit columns"))
          graft.sources.SequenceFileFormat.read(spark, path, declared)
        }
        else if (fmt == "raw") {
          // raw format over files: one FILE is one record (the blob
          // corpus shape — Spark's binaryFile source parallelizes
          // across files); the single declared column decodes straight
          // from the payload bytes. Kafka carries the per-record
          // variant of the same format (KafkaTableFactory.decode).
          val declared = tableSchemas.getOrElse(name,
            sys.error(s"raw table $name needs explicit columns"))
          val f = graft.sources.RawFormat.singleField(declared, s"table $name")
          val o = graft.sources.RawFormat.options(options)
          spark.read.format("binaryFile").load(path)
            .select(graft.sources.RawFormat
              .decode(org.apache.spark.sql.functions.col("content"), f.dataType, o)
              .as(f.name))
        }
        else if (partitionKeysOf(name).nonEmpty) {
          // partitioned layout: partition columns live in directory
          // names — read with discovery and restore the DECLARED
          // column order and types (loadPartitionedView)
          val declared = tableSchemas.getOrElse(name,
            sys.error(s"partitioned table $name needs explicit columns"))
          loadPartitionedView(spark, name, fmt, options, declared, path)
        }
        else {
          val reader = spark.read.format(fmt)
          val withSchema =
            tableSchemas.get(name).map(reader.schema).getOrElse(reader)
          val r2 = if (fmt == "csv")
            withSchema.options(csvSparkOptions(options, write = false))
          else withSchema
          applyFileMetaCols(name, r2.load(path))
        }
      // the reference's flink-connector-jdbc surface, proven against
      // embedded Derby (no DB server in the container); the backing
      // table auto-creates from the declared schema if absent
      case "jdbc" =>
        tableSinks.put(name, SinkInfo(options("url"), "jdbc", options))
        tableSchemas.get(name).foreach { schema =>
          val lengths = tableConstraints.get(name)
            .map(_.lengths.map(lc => lc.column -> lc.length).toMap)
            .getOrElse(Map.empty)
          graft.sources.JdbcConnector.ensureTable(options, schema,
            primaryKeyOf(name), lengths)
        }
        graft.sources.JdbcConnector.read(spark, options)
      case "datagen" =>
        tableSchemas.get(name) match {
          case Some(schema) =>
            // DECLARED schema: the reference's per-field generator
            // surface (fields.<f>.kind/min/max/start/end/length) as
            // column expressions over spark.range — declarative,
            // codegen'd, partition-parallel
            // 'number-of-rows' (the reference's option) or the legacy
            // partitions × rowsPerPartition pair; a bounded SEQUENCE
            // field exhausts the source at its own cap, like the
            // reference's sequence generator
            val parts = options.getOrElse("partitions", "4").toInt
            val n0 = options.get("number-of-rows").map(_.toLong).getOrElse(
              parts.toLong * options.getOrElse("rowsperpartition", "1000").toLong)
            val n = graft.sources.DatagenFields.rowCap(schema, options)
              .fold(n0)(math.min(n0, _))
            val seed = options.getOrElse("seed", "42").toLong
            // validate the generator options BEFORE touching the sink
            // registry — a bad CREATE must not leave a phantom table
            val cols = graft.sources.DatagenFields.columns(
              schema, options, seed, org.apache.spark.sql.functions.col("id"))
            tableSinks.put(name, SinkInfo("datagen", "datagen", options))
            spark.range(0, n, 1, parts).select(cols: _*)
          case None => // legacy fixed-schema DSv2 source
            spark.read.format("graft.sources.DatagenSource")
              .option("partitions", options.getOrElse("partitions", "4"))
              .option("rowsPerPartition", options.getOrElse("rowsperpartition", "1000"))
              .option("seed", options.getOrElse("seed", "42"))
              .load()
        }
      // kafka / upsert-kafka (KafkaDynamicTableFactory /
      // UpsertKafkaDynamicTableFactory): option translation + decode
      // live in KafkaTableFactory; the socket is the pluggable wire
      case "kafka" | "upsert-kafka" =>
        import graft.sources.KafkaTableFactory
        val schema = tableSchemas.getOrElse(name,
          sys.error(s"kafka table $name needs explicit columns"))
        val pk = primaryKeyOf(name)
        // upsert-kafka: the PRIMARY KEY fields ride in the record key
        // (key.fields defaults to the declared key, like the reference)
        val opts =
          if (options.getOrElse("connector", "") == "upsert-kafka" &&
              !options.contains("key.fields") && pk.nonEmpty)
            options + ("key.fields" -> pk.mkString(","))
          else options
        val t = KafkaTableFactory.translate(opts)
        if (t.upsert) require(pk.nonEmpty,
          s"upsert-kafka table $name needs a PRIMARY KEY")
        tableSinks.put(name, SinkInfo(
          opts.getOrElse("topic", opts.getOrElse("topic-pattern", "")), "kafka", opts))
        val decoded = KafkaTableFactory.decode(kafkaWire.read(spark, t), schema, t)
        if (t.upsert) KafkaTableFactory.materializeUpsert(decoded, pk, schema)
        else decoded
      case other => sys.error(s"unsupported connector: $other")
    }
    // computed columns + watermark ride on top of the physical source
    applyEventTime(name, df).createOrReplaceTempView(name)
  }
}
