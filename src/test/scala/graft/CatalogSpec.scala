package graft

import graft.catalog.GraftCatalog

/** Reference-dialect DDL → Spark temp views. */
class CatalogSpec extends SparkSpec {

  test("filesystem connector DDL registers a queryable table") {
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE li_ddl (
         |  l_orderkey BIGINT,
         |  l_quantity DOUBLE,
         |  l_returnflag VARCHAR(1),
         |  l_shipdate TIMESTAMP(3)
         |) WITH (
         |  'connector' = 'filesystem',
         |  'path' = '$sfDir/lineitem.parquet',
         |  'format' = 'parquet'
         |)""".stripMargin)
    val n = spark.sql("SELECT count(*) FROM li_ddl WHERE l_quantity > 0").first().getLong(0)
    assert(n > 0)
    assert(spark.table("li_ddl").schema.fieldNames.toSeq ===
      Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"))
  }

  test("datagen connector DDL generates deterministic rows") {
    GraftCatalog.executeDdl(spark,
      """CREATE TABLE gen_ddl (id BIGINT, ts TIMESTAMP, key STRING, value DOUBLE)
        |WITH ('connector' = 'datagen', 'partitions' = '2', 'rowsPerPartition' = '10')""".stripMargin)
    assert(spark.table("gen_ddl").count() === 20)
  }

  test("csv and json filesystem connectors round-trip the nation table") {
    val src = Tables.load(spark, sfDir, "nation")
    val base = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    src.write.option("header", "true").csv(s"$base/nation_csv")
    src.write.json(s"$base/nation_json")
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE nation_csv (
         |  n_nationkey BIGINT, n_name VARCHAR(25), n_regionkey BIGINT, n_comment VARCHAR(152)
         |) WITH ('connector' = 'filesystem', 'path' = '$base/nation_csv',
         |        'format' = 'csv', 'csv.header' = 'true')""".stripMargin)
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE nation_json (
         |  n_nationkey BIGINT, n_name VARCHAR(25), n_regionkey BIGINT, n_comment VARCHAR(152)
         |) WITH ('connector' = 'filesystem', 'path' = '$base/nation_json',
         |        'format' = 'json')""".stripMargin)
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("CAST(n_nationkey AS BIGINT)", "n_name").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    val expect = keyed(src)
    for (t <- Seq("nation_csv", "nation_json"))
      assert(keyed(spark.table(t)) === expect, t)
  }

  test("flink-csv option surface: field-delimiter, null-literal, quote round-trip; " +
      "ignore-parse-errors + allow-comments on read") {
    val base = java.nio.file.Files.createTempDirectory("graft_csvopts").toString
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE semi_csv (id BIGINT, name STRING, note STRING)
         |WITH ('connector' = 'filesystem', 'path' = '$base/semi',
         |      'format' = 'csv', 'csv.field-delimiter' = ';',
         |      'csv.null-literal' = 'NIL', 'csv.quote-character' = '|')""".stripMargin)
    import spark.implicits._
    GraftCatalog.insertInto(spark, "semi_csv",
      Seq((1L, "alpha", null.asInstanceOf[String]), (2L, "be;ta", "x"))
        .toDF("id", "name", "note"), overwrite = true)
    // the files on disk really use ';', 'NIL' and '|'-quoting
    val txt = new java.io.File(s"$base/semi").listFiles
      .filter(_.getName.endsWith(".csv"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines()).mkString("\n")
    assert(txt.contains("NIL"), s"null-literal must serialize: $txt")
    assert(txt.contains("|be;ta|"), s"embedded delimiter must be |-quoted: $txt")
    val back = spark.table("semi_csv").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(back === Set((1L, "alpha", None), (2L, "be;ta", Some("x"))))

    // read-side: malformed rows drop under ignore-parse-errors, '#' lines skip
    val dirty = new java.io.File(s"$base/dirty"); dirty.mkdirs()
    val w = new java.io.PrintWriter(s"$base/dirty/part-0.csv")
    w.println("# comment line"); w.println("1;ok"); w.println("not_a_number;bad")
    w.println("2;fine"); w.close()
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE dirty_csv (id BIGINT, name STRING)
         |WITH ('connector' = 'filesystem', 'path' = '$base/dirty',
         |      'format' = 'csv', 'csv.field-delimiter' = ';',
         |      'csv.ignore-parse-errors' = 'true', 'csv.allow-comments' = 'true')""".stripMargin)
    val got = spark.table("dirty_csv").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "ok"), (2L, "fine")))

    // disable-quote + quote-character together is a loud config error
    intercept[IllegalArgumentException] {
      GraftCatalog.csvSparkOptions(
        Map("csv.quote-character" -> "'", "csv.disable-quote-character" -> "true"),
        write = false)
    }
  }

  test("'compression' option: gzip csv writes .gz files that read back transparently (flink-compress analog)") {
    val src = Tables.load(spark, sfDir, "nation")
    val base = java.nio.file.Files.createTempDirectory("graft_gz").toString
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE nation_gz (
         |  n_nationkey BIGINT, n_name VARCHAR(25), n_regionkey BIGINT
         |) WITH ('connector' = 'filesystem', 'path' = '$base/nation_gz',
         |        'format' = 'csv', 'csv.header' = 'true',
         |        'compression' = 'gzip')""".stripMargin)
    GraftCatalog.insertInto(spark, "nation_gz",
      src.select("n_nationkey", "n_name", "n_regionkey"), overwrite = true)
    // the files on disk really are gzip members
    val files = new java.io.File(s"$base/nation_gz").listFiles
      .filter(_.getName.endsWith(".csv.gz"))
    assert(files.nonEmpty, "expected .csv.gz output files")
    val head = new Array[Byte](2)
    val in = new java.io.FileInputStream(files.head)
    try { in.read(head) } finally in.close()
    assert(head(0) === 0x1f.toByte && head(1) === 0x8b.toByte, "gzip magic")
    // and the table reads them back transparently
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("CAST(n_nationkey AS BIGINT)", "n_name").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(keyed(spark.table("nation_gz")) ===
      keyed(src.select("n_nationkey", "n_name", "n_regionkey")))
    GraftCatalog.executeDdl(spark, "DROP TABLE nation_gz")
  }

  test("orc filesystem connector round-trips through INSERT INTO") {
    val src = Tables.load(spark, sfDir, "nation")
    val base = java.nio.file.Files.createTempDirectory("graft_orc").toString
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE nation_orc (
         |  n_nationkey BIGINT, n_name VARCHAR(25), n_regionkey BIGINT
         |) WITH ('connector' = 'filesystem', 'path' = '$base/nation_orc',
         |        'format' = 'orc')""".stripMargin)
    // write through the catalog's INSERT path, read through the view
    GraftCatalog.insertInto(spark,
      "nation_orc", src.select("n_nationkey", "n_name", "n_regionkey"),
      overwrite = true)
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("CAST(n_nationkey AS BIGINT)", "n_name").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(keyed(spark.table("nation_orc")) === keyed(src))
    // append doubles the row count (distinct files, same rows)
    GraftCatalog.insertInto(spark,
      "nation_orc", src.select("n_nationkey", "n_name", "n_regionkey"),
      overwrite = false)
    assert(spark.table("nation_orc").count() === 2 * src.count())
  }

  test("METADATA columns: file.* keys project from Spark's _metadata struct") {
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE nation_meta (
         |  n_nationkey BIGINT, n_name VARCHAR(25), n_regionkey BIGINT, n_comment VARCHAR(152),
         |  fpath STRING METADATA FROM 'file.path' VIRTUAL,
         |  fname STRING METADATA FROM 'file.name' VIRTUAL,
         |  fsize BIGINT METADATA FROM 'file.size' VIRTUAL,
         |  mtime TIMESTAMP(3) METADATA FROM 'file.modification-time' VIRTUAL
         |) WITH ('connector' = 'filesystem', 'path' = '$sfDir/nation.parquet',
         |        'format' = 'parquet')""".stripMargin)
    // metadata columns are NOT part of the physical payload schema
    assert(spark.table("nation_meta").schema.fieldNames.toSeq ===
      Seq("n_nationkey", "n_name", "n_regionkey", "n_comment",
        "fpath", "fname", "fsize", "mtime"))
    val rows = spark.sql(
      "SELECT fpath, fname, fsize, mtime FROM nation_meta").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0).contains("nation.parquet"), "file.path")
      assert(r.getString(1).endsWith(".parquet"), "file.name")
      assert(r.getLong(2) > 0, "file.size")
      assert(r.getTimestamp(3) != null, "file.modification-time")
    }
    // SHOW CREATE TABLE round-trips the clause; DESCRIBE lists the key
    val ddl = GraftCatalog.showCreateTable("nation_meta")
    assert(ddl.contains("fsize BIGINT METADATA FROM 'file.size' VIRTUAL"), ddl)
    val desc = GraftCatalog.describeTable(spark, "nation_meta")
      .filter("name = 'fname'").select("extras").first().getString(0)
    assert(desc === "METADATA FROM 'file.name' VIRTUAL")
    GraftCatalog.executeDdl(spark, "DROP TABLE nation_meta")
  }

  test("METADATA columns: key defaults to the column name; bad keys/formats rejected") {
    // 'file.size' spelled as the column name via FROM-less shorthand
    // is invalid for files (key would be 'fsize') — must reject
    val bad = intercept[RuntimeException] {
      GraftCatalog.executeDdl(spark,
        s"""CREATE TABLE m_bad (x BIGINT, fsize BIGINT METADATA)
           |WITH ('connector' = 'filesystem', 'path' = '$sfDir/nation.parquet',
           |      'format' = 'parquet')""".stripMargin)
    }
    assert(bad.getMessage.contains("unknown key 'fsize'"))
    val badConn = intercept[RuntimeException] {
      GraftCatalog.executeDdl(spark,
        """CREATE TABLE m_bad2 (x BIGINT, fsize BIGINT METADATA FROM 'file.size')
          |WITH ('connector' = 'datagen')""".stripMargin)
    }
    assert(badConn.getMessage.contains("exposes no metadata"))
  }

  test("METADATA columns are read-only: INSERT targets only payload columns") {
    val base = java.nio.file.Files.createTempDirectory("graft_meta_ins").toString
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE ins_meta (
         |  k BIGINT, v STRING,
         |  fname STRING METADATA FROM 'file.name' VIRTUAL
         |) WITH ('connector' = 'filesystem', 'path' = '$base/t', 'format' = 'parquet')""".stripMargin)
    import spark.implicits._
    GraftCatalog.insertInto(spark, "ins_meta",
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), overwrite = false)
    val got = spark.sql("SELECT k, v, fname FROM ins_meta ORDER BY k").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((1L, "a"), (2L, "b")))
    got.foreach(r => assert(r.getString(2).endsWith(".parquet")))
    GraftCatalog.executeDdl(spark, "DROP TABLE ins_meta")
  }

  test("METADATA columns: debezium envelope timestamps and source table") {
    val base = java.nio.file.Files.createTempDirectory("graft_meta_dbz").toString
    val lines = Seq(
      """{"before":null,"after":{"id":1,"name":"a"},"op":"c","ts_ms":1700000001000,"source":{"db":"shop","table":"users","ts_ms":1700000000500}}""",
      """{"before":{"id":1,"name":"a"},"after":{"id":1,"name":"b"},"op":"u","ts_ms":1700000002000,"source":{"db":"shop","table":"users","ts_ms":1700000001500}}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$base/lines.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE dbz_meta (
         |  id BIGINT, name STRING,
         |  ingest_ts TIMESTAMP(3) METADATA FROM 'ingestion-timestamp' VIRTUAL,
         |  src_ts TIMESTAMP(3) METADATA FROM 'source.timestamp' VIRTUAL,
         |  src_table STRING METADATA FROM 'source.table' VIRTUAL
         |) WITH ('connector' = 'filesystem', 'path' = '$base',
         |        'format' = 'debezium-json')""".stripMargin)
    val rows = spark.sql(
      """SELECT id, name, __rowkind, ingest_ts, src_ts, src_table
        |FROM dbz_meta ORDER BY ingest_ts, __rowkind""".stripMargin).collect()
    // c -> 1 row, u -> 2 rows (-U, +U); metadata rides on every one
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getTimestamp(3) != null && r.getTimestamp(4) != null)
      assert(r.getTimestamp(3).after(r.getTimestamp(4)), "ingest after source")
      assert(r.getString(5) === "users")
    }
    assert(rows.head.getTimestamp(3).getTime === 1700000001000L)
    GraftCatalog.executeDdl(spark, "DROP TABLE dbz_meta")
  }

  test("DDL parses nested ARRAY/MAP/ROW column types") {
    val base = java.nio.file.Files.createTempDirectory("graft_nested").toString
    spark.sql(
      """SELECT 1L AS id, array(1, 2) AS xs, map('a', 1) AS m,
        |  named_struct('a', 1, 'b', 'x') AS r""".stripMargin)
      .write.parquet(s"$base/nested")
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE nested_ddl (
         |  id BIGINT,
         |  xs ARRAY<INT>,
         |  m MAP<VARCHAR(1), INT>,
         |  r ROW<a INT, b VARCHAR(5)>
         |) WITH ('connector' = 'filesystem', 'path' = '$base/nested',
         |        'format' = 'parquet')""".stripMargin)
    val schema = spark.table("nested_ddl").schema
    assert(schema("xs").dataType.typeName === "array")
    assert(schema("m").dataType.typeName === "map")
    assert(schema("r").dataType.typeName === "struct")
    val row = spark.table("nested_ddl").first()
    assert(row.getAs[Seq[Int]]("xs") === Seq(1, 2))
  }

  // ---- sink constraint enforcement (ConstraintEnforcer.java) ----

  import org.apache.spark.sql.functions._
  import graft.operators.ConstraintEnforcer
  import graft.operators.ConstraintEnforcer._

  test("DDL records NOT NULL and CHAR-length constraints") {
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE con_ddl (
         |  id BIGINT NOT NULL,
         |  code CHAR(5),
         |  name VARCHAR(8)
         |) WITH ('connector' = 'filesystem',
         |        'path' = '$sfDir/nation.parquet', 'format' = 'parquet')""".stripMargin)
    val tc = GraftCatalog.constraintsOf("con_ddl")
    assert(tc.notNull === Seq("id"))
    assert(tc.lengths === Seq(
      LengthConstraint("code", 5, pad = true),
      LengthConstraint("name", 8, pad = false)))
  }

  test("NOT NULL enforcement: ERROR raises, DROP filters") {
    import spark.implicits._
    val df = Seq((Some(1L), "x"), (None: Option[Long], "y")).toDF("id", "v")
    val dropped = ConstraintEnforcer.enforce(df, notNull = Seq("id"), notNullMode = DropRow)
    assert(dropped.count() === 1)
    val err = intercept[Exception](
      ConstraintEnforcer.enforce(df, notNull = Seq("id"), notNullMode = ErrorOnNull).collect())
    assert(err.getMessage.contains("NOT NULL") ||
      Option(err.getCause).exists(_.getMessage.contains("NOT NULL")))
  }

  test("CHAR-length enforcement: TRIM_PAD pads CHAR, trims both; ERROR raises") {
    import spark.implicits._
    val df = Seq(("ab", "toolongvalue"), ("abcdefgh", "ok")).toDF("code", "name")
    val fixed = ConstraintEnforcer.enforce(df,
      lengths = Seq(LengthConstraint("code", 5, pad = true), LengthConstraint("name", 8, pad = false)),
      lengthMode = TrimPad)
      .collect().map(r => (r.getString(0), r.getString(1))).toList
    assert(fixed === List(("ab   ", "toolongv"), ("abcde", "ok")))
    val err = intercept[Exception](
      ConstraintEnforcer.enforce(df,
        lengths = Seq(LengthConstraint("name", 8, pad = false)),
        lengthMode = ErrorOnOversize).collect())
    assert(err.getMessage.contains("VARCHAR") ||
      Option(err.getCause).exists(_.getMessage.contains("VARCHAR")))
  }

  test("DDL computed column materializes on the registered view") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_cc").toString
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "price")
      .write.parquet(s"$base/priced")
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE priced (
         |  id BIGINT, price DOUBLE,
         |  cost AS price * 2
         |) WITH ('connector' = 'filesystem', 'path' = '$base/priced',
         |        'format' = 'parquet')""".stripMargin)
    val rows = spark.sql("SELECT id, cost FROM priced ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(rows === List((1L, 20.0), (2L, 40.0)))
  }

  test("CREATE TABLE LIKE copies schema/constraints/options; DROP TABLE unregisters") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_like").toString
    Seq((1L, "x"), (2L, "y")).toDF("id", "name").write.parquet(s"$base/orig")
    Seq((7L, "z")).toDF("id", "name").write.parquet(s"$base/other")
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE like_base (
         |  id BIGINT NOT NULL, name VARCHAR(10)
         |) WITH ('connector' = 'filesystem', 'path' = '$base/orig',
         |        'format' = 'parquet')""".stripMargin)
    // LIKE with a path override: same declared shape, different files
    GraftCatalog.executeDdl(spark,
      s"CREATE TABLE like_derived LIKE like_base WITH ('path' = '$base/other')")
    assert(spark.table("like_derived").collect().map(_.getLong(0)).toSeq === Seq(7L))
    assert(spark.table("like_derived").schema === spark.table("like_base").schema)
    assert(GraftCatalog.constraintsOf("like_derived").notNull === Seq("id"))
    GraftCatalog.executeDdl(spark, "DROP TABLE like_derived")
    assert(!GraftCatalog.isRegistered("like_derived"))
    assert(intercept[Exception](spark.table("like_derived").count()) != null)
    assert(GraftCatalog.isRegistered("like_base"), "dropping the derived must not touch the base")
  }

  test("DDL WATERMARK drives late-row drop in a streaming agg over the table") {
    import java.sql.Timestamp
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def ts(minute: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")
    val base = java.nio.file.Files.createTempDirectory("graft_wm").toString
    val dir = s"$base/clicks"
    def emit(rows: (Long, Timestamp, Double)*): Unit =
      rows.toSeq.toDF("user_id", "ts", "price")
        .coalesce(1).write.mode("append").parquet(dir)
    emit((1L, ts(1), 1.0), (1L, ts(4), 2.0))
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE clicks (
         |  user_id BIGINT,
         |  ts TIMESTAMP(3),
         |  price DOUBLE,
         |  cost AS price * 2,
         |  WATERMARK FOR ts AS ts - INTERVAL '5' MINUTE
         |) WITH ('connector' = 'filesystem', 'path' = '$dir',
         |        'format' = 'parquet')""".stripMargin)
    // the streaming twin carries the declared watermark + computed col
    val agg = GraftCatalog.streamOf(spark, "clicks")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("cost")).as("sum_cost"))
      .select(col("window.start").as("ws"), col("n"), col("sum_cost"))
    val q = agg.writeStream.format("memory").queryName("ddl_wm_agg")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // watermark -> 10:16, closes window [10:00, 10:10)
      emit((2L, ts(21), 9.0))
      q.processAllAvailable()
      // behind the watermark: silently dropped, exactly like the
      // reference's WatermarkAssigner + late-data semantics
      emit((1L, ts(2), 100.0))
      q.processAllAvailable()
      // advance further so [10:20, 10:30) also closes
      emit((2L, ts(40), 1.0))
      q.processAllAvailable()
      val rows = spark.table("ddl_wm_agg")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains(("2024-01-01 10:00:00.0", 2L, 6.0)),
        s"window [10:00,10:10) must close with the 2 on-time rows (cost=2*price): $rows")
      assert(!rows.exists(_._3 > 200.0), s"late row leaked into a window: $rows")
      assert(rows.contains(("2024-01-01 10:20:00.0", 1L, 18.0)), s"rows: $rows")
    } finally q.stop()
  }

  test("PARTITIONED BY: directory-per-value writes, pruned reads, declared column order") {
    val path = "/tmp/graft_part_spec/ev_part"
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(del)
      f.delete()
    }
    if (new java.io.File(path).exists()) del(new java.io.File(path))
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE ev_part (
         |  event_id BIGINT,
         |  value DOUBLE,
         |  event_type VARCHAR(10)
         |) PARTITIONED BY (event_type) WITH (
         |  'connector' = 'filesystem', 'path' = '$path', 'format' = 'parquet')""".stripMargin)
    graft.sql.GraftSql.sql(spark,
      s"INSERT INTO ev_part SELECT event_id, value, event_type FROM " +
        s"parquet.`$sfDir/events.parquet`")
    // one directory per partition value
    val dirs = new java.io.File(path).listFiles.filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("event_type=")))
    // declared column order and types survive the read-back
    assert(spark.table("ev_part").schema.fieldNames.toSeq ===
      Seq("event_id", "value", "event_type"))
    // a filter on the partition column prunes directories, not rows
    val plan = spark.sql(
      "SELECT count(*) FROM ev_part WHERE event_type = 'click'")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      s"expected partition pruning in:\n$plan")
    // and the counts agree with the source
    val got = spark.sql("SELECT count(*) FROM ev_part WHERE event_type = 'click'")
      .first().getLong(0)
    val want = spark.read.parquet(s"$sfDir/events.parquet")
      .filter("event_type = 'click'").count()
    assert(got === want)
    // SHOW CREATE TABLE round-trips the clause
    assert(GraftCatalog.showCreateTable("ev_part").contains("PARTITIONED BY (event_type)"))
  }

  test("ALTER TABLE ADD/DROP PARTITION: directory lifecycle (SqlAddPartitions)") {
    val path = "/tmp/graft_part_spec/alter_part"
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(del)
      f.delete()
    }
    if (new java.io.File(path).exists()) del(new java.io.File(path))
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE ap_t (
         |  id BIGINT, tag VARCHAR(8)
         |) PARTITIONED BY (tag) WITH (
         |  'connector' = 'filesystem', 'path' = '$path', 'format' = 'parquet')""".stripMargin)
    try {
      graft.sql.GraftSql.sql(spark,
        "INSERT INTO ap_t PARTITION (tag = 'red') SELECT 1")
      // ADD creates the directory — visible to SHOW PARTITIONS
      GraftCatalog.executeDdl(spark, "ALTER TABLE ap_t ADD PARTITION (tag = 'blue')")
      val parts = graft.sql.GraftSql.sql(spark, "SHOW PARTITIONS ap_t")
        .collect().map(_.getString(0)).toSet
      assert(parts === Set("tag=red", "tag=blue"), parts)
      // multiple specs in one statement, IF NOT EXISTS tolerated
      GraftCatalog.executeDdl(spark,
        "ALTER TABLE ap_t ADD IF NOT EXISTS PARTITION (tag = 'blue'), PARTITION (tag = 'green')")
      assert(graft.sql.GraftSql.sql(spark, "SHOW PARTITIONS ap_t")
        .collect().map(_.getString(0)).toSet === Set("tag=red", "tag=blue", "tag=green"))
      // without IF NOT EXISTS an existing partition is an error
      intercept[IllegalArgumentException](GraftCatalog.executeDdl(spark,
        "ALTER TABLE ap_t ADD PARTITION (tag = 'red')"))
      // DROP removes the directory AND its data; readers see it gone
      GraftCatalog.executeDdl(spark, "ALTER TABLE ap_t DROP PARTITION (tag = 'red')")
      assert(spark.table("ap_t").count() === 0)
      assert(graft.sql.GraftSql.sql(spark, "SHOW PARTITIONS ap_t")
        .collect().map(_.getString(0)).toSet === Set("tag=blue", "tag=green"))
      intercept[IllegalArgumentException](GraftCatalog.executeDdl(spark,
        "ALTER TABLE ap_t DROP PARTITION (tag = 'red')"))
      GraftCatalog.executeDdl(spark,
        "ALTER TABLE ap_t DROP IF EXISTS PARTITION (tag = 'red')") // tolerated
      // a spec naming a non-partition column fails loudly
      intercept[IllegalArgumentException](GraftCatalog.executeDdl(spark,
        "ALTER TABLE ap_t ADD PARTITION (id = '1')"))
      // a non-partitioned table rejects partition DDL
      intercept[RuntimeException](GraftCatalog.executeDdl(spark,
        "ALTER TABLE ap_np ADD PARTITION (tag = 'x')"))
      // special characters follow Spark's writer escaping (':' →
      // %3A): DROP must hit the directory the writer actually made
      graft.sql.GraftSql.sql(spark,
        "INSERT INTO ap_t PARTITION (tag = 'a:b') SELECT 9")
      assert(spark.table("ap_t").where("tag = 'a:b'").count() === 1)
      // SHOW PARTITIONS renders the UNESCAPED value (dir is tag=a%3Ab)
      assert(graft.sql.GraftSql.sql(spark, "SHOW PARTITIONS ap_t")
        .collect().map(_.getString(0)).toSet.contains("tag=a:b"))
      GraftCatalog.executeDdl(spark, "ALTER TABLE ap_t DROP PARTITION (tag = 'a:b')")
      assert(spark.table("ap_t").where("tag = 'a:b'").count() === 0)
    } finally GraftCatalog.executeDdl(spark, "DROP TABLE ap_t")
  }

  test("INSERT ... PARTITION: static assignment fills the column; OVERWRITE replaces only that partition") {
    val path = "/tmp/graft_part_spec/static_part"
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(del)
      f.delete()
    }
    if (new java.io.File(path).exists()) del(new java.io.File(path))
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE st_part (
         |  id BIGINT, v DOUBLE, tag VARCHAR(8)
         |) PARTITIONED BY (tag) WITH (
         |  'connector' = 'filesystem', 'path' = '$path', 'format' = 'parquet')""".stripMargin)
    // static inserts: query supplies only the dynamic columns
    graft.sql.GraftSql.sql(spark,
      "INSERT INTO st_part PARTITION (tag = 'red') SELECT 1, 10.0")
    graft.sql.GraftSql.sql(spark,
      "INSERT INTO st_part PARTITION (tag = 'blue') SELECT 2, 20.0")
    val all = spark.table("st_part").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(all === Set((1L, 10.0, "red"), (2L, 20.0, "blue")))
    // static-partition OVERWRITE rewrites ONLY the named partition
    graft.sql.GraftSql.sql(spark,
      "INSERT OVERWRITE st_part PARTITION (tag = 'red') SELECT 3, 30.0")
    val after = spark.table("st_part").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(after === Set((3L, 30.0, "red"), (2L, 20.0, "blue")),
      "blue partition must survive a red-partition overwrite")
    // a PARTITION clause on a non-partition column fails loudly
    intercept[IllegalArgumentException] {
      graft.sql.GraftSql.sql(spark,
        "INSERT INTO st_part PARTITION (v = '1.0') SELECT 4, 'x'")
    }
  }

  test("PARTITIONED BY csv with header=false round-trips (declared schema applies)") {
    val base = java.nio.file.Files.createTempDirectory("graft_part_csv").toString
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE part_csv (k BIGINT, v STRING, p STRING)
         |PARTITIONED BY (p) WITH (
         |  'connector' = 'filesystem', 'path' = '$base/t', 'format' = 'csv')""".stripMargin)
    import spark.implicits._
    GraftCatalog.insertInto(spark, "part_csv",
      Seq((1L, "a", "x"), (2L, "b", "y")).toDF("k", "v", "p"), overwrite = false)
    val got = spark.table("part_csv").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set((1L, "a", "x"), (2L, "b", "y")))
    // declared column order and types survive the headerless files
    assert(spark.table("part_csv").schema.map(f => (f.name, f.dataType.sql)).toSeq ===
      Seq(("k", "BIGINT"), ("v", "STRING"), ("p", "STRING")))
    GraftCatalog.executeDdl(spark, "DROP TABLE part_csv")
  }

  test("PARTITIONED BY rejects formats without a partitioned layout") {
    intercept[IllegalArgumentException] {
      GraftCatalog.executeDdl(spark,
        """CREATE TABLE bad_part (id BIGINT, tag VARCHAR(8))
          |PARTITIONED BY (tag) WITH (
          |  'connector' = 'filesystem', 'path' = '/tmp/graft_part_spec/bad',
          |  'format' = 'avro')""".stripMargin)
    }
  }

  test("SHOW PARTITIONS lists directory partitions; ALTER TABLE SET/RENAME update the catalog") {
    val path = "/tmp/graft_part_spec/alter_part"
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(del)
      f.delete()
    }
    if (new java.io.File(path).exists()) del(new java.io.File(path))
    graft.sql.GraftSql.sql(spark,
      s"""CREATE TABLE alt_part (
         |  id BIGINT, tag VARCHAR(8)
         |) PARTITIONED BY (tag) WITH (
         |  'connector' = 'filesystem', 'path' = '$path', 'format' = 'parquet')""".stripMargin)
    graft.sql.GraftSql.sql(spark, "INSERT INTO alt_part PARTITION (tag = 'red') SELECT 1")
    graft.sql.GraftSql.sql(spark, "INSERT INTO alt_part PARTITION (tag = 'blue') SELECT 2")
    val parts = graft.sql.GraftSql.sql(spark, "SHOW PARTITIONS alt_part")
      .collect().map(_.getString(0)).toSeq
    assert(parts === Seq("tag=blue", "tag=red"))
    // ALTER ... SET merges option overrides (visible in SHOW CREATE TABLE)
    graft.sql.GraftSql.sql(spark, "ALTER TABLE alt_part SET ('custom.opt' = '42')")
    assert(GraftCatalog.showCreateTable("alt_part").contains("'custom.opt' = '42'"))
    // ALTER ... RENAME moves every registry entry
    graft.sql.GraftSql.sql(spark, "ALTER TABLE alt_part RENAME TO alt_part2")
    assert(!GraftCatalog.isRegistered("alt_part"))
    assert(GraftCatalog.partitionKeysOf("alt_part2") === Seq("tag"))
    assert(spark.table("alt_part2").count() === 2L)
    assert(graft.sql.GraftSql.sql(spark, "SHOW PARTITIONS alt_part2")
      .collect().map(_.getString(0)).toSeq === Seq("tag=blue", "tag=red"))
  }

  test("WATERMARK FOR ts AS SOURCE_WATERMARK() maps to the ascending strategy") {
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE src_wm (
         |  event_id BIGINT, ts TIMESTAMP(3), value DOUBLE,
         |  WATERMARK FOR ts AS SOURCE_WATERMARK()
         |) WITH ('connector' = 'filesystem', 'path' = '$sfDir/events.parquet',
         |        'format' = 'parquet')""".stripMargin)
    assert(GraftCatalog.metaOf("src_wm").watermark === Some(("ts", "0 seconds")))
  }

  test("ALTER TABLE ADD/MODIFY/RESET/COMPACT (FLIP-273 + filesystem compact)") {
    import graft.catalog.GraftCatalog
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_alter").toString
    import spark.implicits._
    // several tiny appends -> small files for COMPACT to fold
    (1 to 4).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v")
        .write.mode("append").parquet(s"$base/t")
    }
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE alter_t (id BIGINT, v STRING)
         |WITH ('connector' = 'filesystem', 'path' = '$base/t',
         |  'format' = 'parquet', 'sink.rolling-policy.file-size' = '64MB')""".stripMargin)
    try {
      // ADD: new physical column reads NULL from existing files; a
      // computed column derives immediately
      GraftCatalog.executeDdl(spark,
        "ALTER TABLE alter_t ADD (score DOUBLE, vlen AS char_length(v))")
      val df = spark.table("alter_t")
      assert(df.columns.toSeq === Seq("id", "v", "score", "vlen"))
      assert(df.filter(col("score").isNull).count() === 4)
      assert(df.filter(col("vlen") === 2).count() === 4)
      // single bare definition, no parens
      GraftCatalog.executeDdl(spark, "ALTER TABLE alter_t ADD note STRING")
      assert(spark.table("alter_t").columns.contains("note"))
      // duplicate ADD rejected
      val dup = intercept[IllegalArgumentException](
        GraftCatalog.executeDdl(spark, "ALTER TABLE alter_t ADD (v STRING)"))
      assert(dup.getMessage.contains("already exists"))
      // MODIFY redeclares the type (metadata-only)
      GraftCatalog.executeDdl(spark, "ALTER TABLE alter_t MODIFY (score FLOAT)")
      assert(spark.table("alter_t").schema("score").dataType
        === org.apache.spark.sql.types.FloatType)
      intercept[IllegalArgumentException](
        GraftCatalog.executeDdl(spark, "ALTER TABLE alter_t MODIFY (nope INT)"))
      // RESET drops an option override; connector is protected
      GraftCatalog.executeDdl(spark,
        "ALTER TABLE alter_t RESET ('sink.rolling-policy.file-size')")
      intercept[IllegalArgumentException](
        GraftCatalog.executeDdl(spark, "ALTER TABLE alter_t RESET ('connector')"))
      // COMPACT folds the 4 tiny files and preserves rows
      val before = new java.io.File(s"$base/t").listFiles
        .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      assert(before === 4)
      GraftCatalog.executeDdl(spark, "ALTER TABLE alter_t COMPACT")
      val after = new java.io.File(s"$base/t").listFiles
        .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      assert(after < before, s"$after vs $before")
      assert(spark.table("alter_t").select("id", "v").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
        === (1 to 4).map(i => (i.toLong, s"v$i")).toSet)
    } finally GraftCatalog.executeDdl(spark, "DROP TABLE alter_t")
  }
}
