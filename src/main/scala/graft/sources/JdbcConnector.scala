package graft.sources

import java.sql.{Connection, DriverManager, PreparedStatement}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.streaming.LookupJoin.LookupFunction

/** JDBC connector — the reference's flink-connector-jdbc surface
  * (JdbcDynamicTableFactory options `url`/`table-name`/`driver`/
  * `username`/`password`, `scan.partition.*`, `sink.buffer-flush
  * .max-rows`, JdbcRowDataLookupFunction for LookupTableSource)
  * re-expressed on Spark's JDBC DataSource for the scan half and
  * batched PreparedStatements for the sink half.
  *
  * The container has no external DB server, so the wire is proven
  * against embedded Derby (`org.apache.derby.jdbc.EmbeddedDriver`,
  * shipped in /opt/spark/jars) — the same JDBC surface a networked
  * url would use; nothing below is Derby-specific except the
  * type-name mapping in [[sqlTypeOf]].
  *
  * Scale stance: the scan half delegates to Spark's JDBCRelation, so
  * `scan.partition.column/num/lower-bound/upper-bound` shard the read
  * across executors exactly like the reference's
  * JdbcNumericBetweenParametersProvider, and Catalyst pushes filters
  * into the generated WHERE. The sink half writes per partition with
  * batches of `sink.buffer-flush.max-rows` (default 100, like the
  * reference) — no driver-side materialization anywhere.
  */
object JdbcConnector {

  private val DefaultDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  /** Spark JDBC option map from the reference's option names. */
  private def sparkOpts(options: Map[String, String]): Map[String, String] = {
    val base = Map(
      "url" -> options.getOrElse("url", sys.error("jdbc table needs 'url'")),
      "dbtable" -> options.getOrElse("table-name", sys.error("jdbc table needs 'table-name'")),
      "driver" -> options.getOrElse("driver", DefaultDriver))
    val auth = Seq("username" -> "user", "password" -> "password").flatMap {
      case (flink, spark) => options.get(flink).map(spark -> _)
    }
    // scan.partition.* → Spark's partitioned JDBC read (the analog of
    // the reference's parallel NumericBetweenParametersProvider scan)
    val parts = Seq(
      "scan.partition.column" -> "partitionColumn",
      "scan.partition.num" -> "numPartitions",
      "scan.partition.lower-bound" -> "lowerBound",
      "scan.partition.upper-bound" -> "upperBound").flatMap {
      case (flink, spark) => options.get(flink).map(spark -> _)
    }
    base ++ auth ++ parts
  }

  def read(spark: SparkSession, options: Map[String, String]): DataFrame =
    spark.read.format("jdbc").options(sparkOpts(options)).load()

  private def connect(options: Map[String, String]): Connection = {
    Class.forName(options.getOrElse("driver", DefaultDriver))
    val props = new java.util.Properties()
    options.get("username").foreach(props.setProperty("user", _))
    options.get("password").foreach(props.setProperty("password", _))
    DriverManager.getConnection(options("url"), props)
  }

  /** Spark type → portable SQL type name (reference:
    * AbstractDialect#getUpsertStatement relies on the same fixed
    * mapping in JdbcTypeUtil). VARCHAR sizes come from the DDL's
    * declared CHAR/VARCHAR lengths when present; the 4k default keeps
    * keys indexable (Derby cannot put a PRIMARY KEY on a LOB, which
    * is also why the writer does not use Spark's CLOB-mapping
    * dialect).
    */
  private def sqlTypeOf(dt: DataType, length: Option[Int]): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case ShortType => "SMALLINT"
    case ByteType => "SMALLINT"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case _: TimestampType => "TIMESTAMP"
    case _: TimestampNTZType => "TIMESTAMP"
    case BinaryType => "BLOB"
    case StringType => s"VARCHAR(${length.getOrElse(4000)})"
    case other => sys.error(s"jdbc connector: unsupported column type $other")
  }

  /** CREATE the backing table if absent (the reference requires the
    * table to pre-exist in the DB; this is the DDL-side convenience
    * that makes a fresh `CREATE TABLE ... WITH ('connector'='jdbc')`
    * usable as a sink immediately, like its filesystem tables).
    */
  def ensureTable(options: Map[String, String], schema: StructType,
      primaryKey: Seq[String], lengths: Map[String, Int] = Map.empty): Unit = {
    val table = options("table-name")
    val conn = connect(options)
    try {
      val meta = conn.getMetaData
      // probe EVERY case-fold: Derby folds unquoted identifiers up,
      // Postgres folds down, and a probe that only checks one misses
      // the existing table and re-CREATEs into an error on every
      // re-registration (round-3 ADVICE)
      def probe(name: String): Boolean = {
        val rs = meta.getTables(null, null, name, null)
        try rs.next() finally rs.close()
      }
      val exists = probe(table) ||
        probe(table.toUpperCase(java.util.Locale.ROOT)) ||
        probe(table.toLowerCase(java.util.Locale.ROOT))
      if (!exists) {
        val cols = schema.fields.map { f =>
          val notNull = if (primaryKey.contains(f.name)) " NOT NULL" else ""
          s"${f.name} ${sqlTypeOf(f.dataType, lengths.get(f.name))}$notNull"
        }
        val pk = if (primaryKey.nonEmpty)
          s", PRIMARY KEY (${primaryKey.mkString(", ")})" else ""
        val stmt = conn.createStatement()
        // belt over braces: if another session created it between the
        // probe and here, tolerate the duplicate-table failure
        // (SQLState X0Y32 on Derby, 42P07 on Postgres)
        try stmt.executeUpdate(s"CREATE TABLE $table (${cols.mkString(", ")}$pk)")
        catch {
          case e: java.sql.SQLException
              if Set("X0Y32", "42P07").contains(e.getSQLState) => ()
        }
        finally stmt.close()
      }
    } finally conn.close()
  }

  private def bind(ps: PreparedStatement, i: Int, v: Any): Unit = v match {
    case null => ps.setObject(i, null)
    case b: Array[Byte] => ps.setBytes(i, b)
    case d: java.math.BigDecimal => ps.setBigDecimal(i, d)
    case d: scala.math.BigDecimal => ps.setBigDecimal(i, d.bigDecimal)
    case t: java.time.LocalDateTime => ps.setTimestamp(i, java.sql.Timestamp.valueOf(t))
    case t: java.time.Instant => ps.setTimestamp(i, java.sql.Timestamp.from(t))
    case d: java.time.LocalDate => ps.setDate(i, java.sql.Date.valueOf(d))
    case other => ps.setObject(i, other)
  }

  /** Sink half. Without a primary key: batched INSERT (the
    * reference's append-only JdbcOutputFormat). With one: per-batch
    * UPDATE-then-INSERT — rows whose UPDATE matched nothing are
    * re-batched as INSERTs — which is exactly the reference's
    * InsertOrUpdateJdbcExecutor strategy for dialects without a
    * native upsert clause. `overwrite` truncates first (INSERT
    * OVERWRITE semantics).
    *
    * Executors open their own connections (foreachPartition), so a
    * networked url scales writes horizontally; batches flush every
    * `sink.buffer-flush.max-rows` rows like the reference's
    * JdbcBatchingOutputFormat.
    */
  def write(df: DataFrame, options: Map[String, String],
      primaryKey: Seq[String], overwrite: Boolean): Unit = {
    val table = options("table-name")
    val schema = df.schema
    val batchSize = options.getOrElse("sink.buffer-flush.max-rows", "100").toInt
    if (overwrite) {
      val conn = connect(options)
      try {
        val stmt = conn.createStatement()
        try stmt.executeUpdate(s"DELETE FROM $table") finally stmt.close()
      } finally conn.close()
    }
    val cols = schema.fieldNames.toSeq
    val insertSql = s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    val nonKey = cols.filterNot(primaryKey.contains)
    val upsert = primaryKey.nonEmpty && nonKey.nonEmpty && !overwrite
    val updateSql = if (upsert)
      s"UPDATE $table SET ${nonKey.map(c => s"$c = ?").mkString(", ")} " +
        s"WHERE ${primaryKey.map(c => s"$c = ?").mkString(" AND ")}"
    else insertSql
    val opts = options // closure-serializable copy
    df.foreachPartition { (it: Iterator[Row]) =>
      val conn = connect(opts)
      conn.setAutoCommit(false)
      try {
        val ins = conn.prepareStatement(insertSql)
        val upd = if (upsert) conn.prepareStatement(updateSql) else ins
        try {
          val pending = new scala.collection.mutable.ArrayBuffer[Row](batchSize)
          def flush(): Unit = if (pending.nonEmpty) {
            if (upsert) {
              // keep-last per key within the batch (see writeChangelog)
              val byKey = new java.util.LinkedHashMap[Seq[Any], Row]()
              pending.foreach(r =>
                byKey.put(primaryKey.map(c => r.get(schema.fieldIndex(c))), r))
              pending.clear()
              pending ++= scala.jdk.CollectionConverters
                .CollectionHasAsScala(byKey.values).asScala
              pending.foreach { row =>
                nonKey.zipWithIndex.foreach { case (c, i) =>
                  bind(upd, i + 1, row.get(schema.fieldIndex(c))) }
                primaryKey.zipWithIndex.foreach { case (c, i) =>
                  bind(upd, nonKey.length + i + 1, row.get(schema.fieldIndex(c))) }
                upd.addBatch()
              }
              val counts = upd.executeBatch()
              val misses = pending.indices.filter(i =>
                updateMissed(counts(i), upd, { () =>
                  val row = pending(i)
                  nonKey.zipWithIndex.foreach { case (c, j) =>
                    bind(upd, j + 1, row.get(schema.fieldIndex(c))) }
                  primaryKey.zipWithIndex.foreach { case (c, j) =>
                    bind(upd, nonKey.length + j + 1, row.get(schema.fieldIndex(c))) }
                }))
              misses.foreach { i =>
                val row = pending(i)
                cols.zipWithIndex.foreach { case (c, j) =>
                  bind(ins, j + 1, row.get(schema.fieldIndex(c))) }
                ins.addBatch()
              }
              if (misses.nonEmpty) ins.executeBatch()
            } else {
              pending.foreach { row =>
                cols.zipWithIndex.foreach { case (c, j) =>
                  bind(ins, j + 1, row.get(schema.fieldIndex(c))) }
                ins.addBatch()
              }
              ins.executeBatch()
            }
            conn.commit()
            pending.clear()
          }
          it.foreach { row =>
            pending += row
            if (pending.size >= batchSize) flush()
          }
          flush()
        } finally { if (upsert) upd.close(); ins.close() }
        // Derby refuses to close a connection with an open transaction
        // — statement preparation alone opens one under autoCommit=false
        conn.commit()
      } finally {
        // best-effort: roll back whatever a failure left open so close
        // cannot throw and mask the original exception
        try conn.rollback() catch { case _: java.sql.SQLException => () }
        conn.close()
      }
    }
  }


  /** Did a batched UPDATE miss (matched zero rows)? Drivers may
    * return Statement.SUCCESS_NO_INFO (-2) from executeBatch (MySQL
    * rewriteBatchedStatements, Oracle batching) — then the truth is
    * recovered by re-binding and running that row's UPDATE alone.
    */
  private def updateMissed(count: Int, upd: PreparedStatement,
      rebind: () => Unit): Boolean =
    if (count == java.sql.Statement.SUCCESS_NO_INFO) {
      rebind(); upd.executeUpdate() == 0
    } else count == 0

  /** Changelog write (the reference's JdbcOutputFormat consuming a
    * retract/upsert stream: +I/+U upsert the row, -D DELETEs by key,
    * -U is the before-image and carries no action). Rows apply in
    * partition order with batches flushed on every kind flip, so a
    * delete never overtakes the insert it retracts within a batch.
    */
  def writeChangelog(df: DataFrame, options: Map[String, String],
      primaryKey: Seq[String]): Unit = {
    require(primaryKey.nonEmpty, "changelog writes into JDBC need a PRIMARY KEY")
    val kindCol = graft.changelog.Changelog.RowKindCol
    require(df.columns.contains(kindCol), s"changelog write expects $kindCol")
    val schema = StructType(df.schema.filterNot(_.name == kindCol))
    val cols = schema.fieldNames.toSeq
    val nonKey = cols.filterNot(primaryKey.contains)
    val table = options("table-name")
    val batchSize = options.getOrElse("sink.buffer-flush.max-rows", "100").toInt
    val insertSql = s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    val updateSql = if (nonKey.nonEmpty)
      s"UPDATE $table SET ${nonKey.map(c => s"$c = ?").mkString(", ")} " +
        s"WHERE ${primaryKey.map(c => s"$c = ?").mkString(" AND ")}"
    else insertSql
    val deleteSql =
      s"DELETE FROM $table WHERE ${primaryKey.map(c => s"$c = ?").mkString(" AND ")}"
    val opts = options
    // primitive copies — the Changelog object itself must not ride
    // the closure (not serializable)
    val kDelete = graft.changelog.Changelog.Delete
    val kUpdateBefore = graft.changelog.Changelog.UpdateBefore
    df.foreachPartition { (it: Iterator[Row]) =>
      val conn = connect(opts)
      conn.setAutoCommit(false)
      try {
        val ins = conn.prepareStatement(insertSql)
        val upd = if (nonKey.nonEmpty) conn.prepareStatement(updateSql) else ins
        val del = conn.prepareStatement(deleteSql)
        try {
          var pendingKind: Byte = -1
          var pending = 0
          val upserts = new scala.collection.mutable.ArrayBuffer[Row](batchSize)
          def flushUpserts(rows0: Seq[Row]): Unit = {
            // within one batch the same key may appear twice (+I then
            // +U): keep only the LAST action per key — the reference's
            // upsert buffer reduction (TableJdbcUpsertOutputFormat) —
            // or the UPDATE-then-INSERT pass double-inserts the key
            val byKey = new java.util.LinkedHashMap[Seq[Any], Row]()
            rows0.foreach(r => byKey.put(primaryKey.map(c => r.get(r.fieldIndex(c))), r))
            val rows = scala.jdk.CollectionConverters
              .CollectionHasAsScala(byKey.values).asScala.toSeq
            // UPDATE-then-INSERT, like write()
            if (nonKey.nonEmpty) {
              rows.foreach { row =>
                nonKey.zipWithIndex.foreach { case (c, i) =>
                  bind(upd, i + 1, row.get(row.fieldIndex(c))) }
                primaryKey.zipWithIndex.foreach { case (c, i) =>
                  bind(upd, nonKey.length + i + 1, row.get(row.fieldIndex(c))) }
                upd.addBatch()
              }
              val counts = upd.executeBatch()
              val misses = rows.indices.filter(i =>
                updateMissed(counts(i), upd, { () =>
                  val row = rows(i)
                  nonKey.zipWithIndex.foreach { case (c, j) =>
                    bind(upd, j + 1, row.get(row.fieldIndex(c))) }
                  primaryKey.zipWithIndex.foreach { case (c, j) =>
                    bind(upd, nonKey.length + j + 1, row.get(row.fieldIndex(c))) }
                }))
              misses.foreach { i =>
                cols.zipWithIndex.foreach { case (c, j) =>
                  bind(ins, j + 1, rows(i).get(rows(i).fieldIndex(c))) }
                ins.addBatch()
              }
              if (misses.nonEmpty) ins.executeBatch()
            } else {
              rows.foreach { row =>
                cols.zipWithIndex.foreach { case (c, j) =>
                  bind(ins, j + 1, row.get(row.fieldIndex(c))) }
                ins.addBatch()
              }
              ins.executeBatch()
            }
          }
          def flush(): Unit = if (upserts.nonEmpty || pending > 0) {
            if (pendingKind == kDelete) { del.executeBatch(); pending = 0 }
            else if (upserts.nonEmpty) { flushUpserts(upserts.toSeq); upserts.clear() }
            conn.commit()
          }
          it.foreach { row =>
            val kind = row.getByte(row.fieldIndex(kindCol))
            if (kind != kUpdateBefore) { // -U carries no action
              val action: Byte = if (kind == kDelete) kDelete else 0: Byte
              if (pendingKind != -1 && action != pendingKind) flush()
              pendingKind = action
              if (action == kDelete) {
                primaryKey.zipWithIndex.foreach { case (c, i) =>
                  bind(del, i + 1, row.get(row.fieldIndex(c))) }
                del.addBatch()
                pending += 1
                if (pending >= batchSize) flush()
              } else {
                upserts += row
                if (upserts.size >= batchSize) flush()
              }
            }
          }
          flush()
        } finally { if (nonKey.nonEmpty) upd.close(); ins.close(); del.close() }
        // Derby refuses to close a connection with an open transaction
        // — statement preparation alone opens one under autoCommit=false
        conn.commit()
      } finally {
        // best-effort: roll back whatever a failure left open so close
        // cannot throw and mask the original exception
        try conn.rollback() catch { case _: java.sql.SQLException => () }
        conn.close()
      }
    }
  }

  /** Streaming sink half (the reference's JdbcSink /
    * GenericJdbcSinkFunction in a streaming job): each micro-batch
    * flows through [[write]] inside foreachBatch. With a PRIMARY KEY
    * the per-batch upsert makes redelivered batches idempotent —
    * at-least-once delivery + idempotent writes ≈ the reference's
    * exactly-once-to-upsert-sink story (JdbcOutputFormat flush on
    * checkpoint). Returns the started query.
    */
  def writeStream(ds: DataFrame, options: Map[String, String],
      primaryKey: Seq[String], checkpointLocation: String,
      queryName: String = "jdbc_sink"): org.apache.spark.sql.streaming.StreamingQuery =
    ds.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointLocation)
      .outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        write(batch, options, primaryKey, overwrite = false)
      }
      .start()

  /** Per-record JDBC lookup (the reference's
    * JdbcRowDataLookupFunction): one prepared `SELECT ... WHERE key =
    * ?` per task, rows come back as column-name → value maps. Wrap in
    * LookupJoin.CachingLookup / FullCachingLookup / RetryingLookup
    * for the cache/retry stack — identical composition to the
    * reference's CachingLookupFunction over the JDBC delegate.
    */
  final class JdbcLookup(options: Map[String, String], keyColumn: String,
      projection: Seq[String]) extends LookupFunction[Any, Map[String, Any]] {
    @transient private var conn: Connection = _
    @transient private var ps: PreparedStatement = _
    private def stmt(): PreparedStatement = {
      if (ps == null) {
        conn = connect(options)
        ps = conn.prepareStatement(
          s"SELECT ${projection.mkString(", ")} FROM ${options("table-name")} " +
            s"WHERE $keyColumn = ?")
        // inside a Spark task, tie the connection's life to the task:
        // without this every task instance leaked one connection for
        // the executor's lifetime (round-3 ADVICE; the reference
        // closes in FunctionContext.close())
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => close()))
      }
      ps
    }
    override def close(): Unit = this.synchronized {
      if (ps != null) { try ps.close() catch { case _: Exception => () }; ps = null }
      if (conn != null) { try conn.close() catch { case _: Exception => () }; conn = null }
    }
    override def lookup(key: Any): Seq[Map[String, Any]] = this.synchronized {
      val s = stmt()
      bind(s, 1, key)
      val rs = s.executeQuery()
      try {
        val out = Seq.newBuilder[Map[String, Any]]
        while (rs.next())
          out += projection.map(c => c -> rs.getObject(c)).toMap
        out.result()
      } finally rs.close()
    }
  }

  /** Full-snapshot loader for LookupJoin.FullCachingLookup — the
    * reference's LookupFullCache backed by a JDBC ScanRuntimeProvider
    * (periodic whole-dimension reload, zero per-record DB traffic).
    */
  def fullLoader(options: Map[String, String], keyColumn: String,
      projection: Seq[String]): () => Map[Any, Seq[Map[String, Any]]] = () => {
    val conn = connect(options)
    try {
      val stmt = conn.createStatement()
      try {
        val rs = stmt.executeQuery(
          s"SELECT ${(keyColumn +: projection).distinct.mkString(", ")} " +
            s"FROM ${options("table-name")}")
        try {
          val out = scala.collection.mutable.Map
            .empty[Any, List[Map[String, Any]]].withDefaultValue(Nil)
          while (rs.next()) {
            val k = rs.getObject(keyColumn)
            out(k) = out(k) :+ projection.map(c => c -> rs.getObject(c)).toMap
          }
          out.toMap
        } finally rs.close()
      } finally stmt.close()
    } finally conn.close()
  }
}
