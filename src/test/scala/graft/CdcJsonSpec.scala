package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.changelog.Changelog
import graft.sources.CdcJson

/** CDC changelog-format decoders vs the reference's SerDe semantics
  * (DebeziumJsonSerDeSchemaTest / CanalJsonSerDeSchemaTest shapes):
  * op routing, before/after images, canal's partial-old merge, DDL
  * skip, strict vs ignore-parse-errors, tombstones.
  */
class CdcJsonSpec extends SparkSpec {
  import spark.implicits._

  private val physical = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("weight", DoubleType)))

  private def linesDf(lines: String*): DataFrame = lines.toDF("value")

  private def rowsOf(df: DataFrame): Seq[(Long, String, Option[Double], Byte)] =
    df.collect().toSeq.map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)),
      r.getByte(3)))

  test("debezium: c/u/d ops emit +I, -U/+U, -D with the right images") {
    val out = CdcJson.debezium(linesDf(
      """{"before":null,"after":{"id":1,"name":"scooter","weight":3.14},"op":"c"}""",
      """{"before":{"id":1,"name":"scooter","weight":3.14},"after":{"id":1,"name":"scooter","weight":5.18},"op":"u"}""",
      """{"before":{"id":1,"name":"scooter","weight":5.18},"after":null,"op":"d"}""",
      "", // tombstone: skipped
      """{"before":null,"after":{"id":2,"name":"spare tire","weight":22.2},"op":"r"}"""),
      physical)
    assert(rowsOf(out).toSet === Set(
      (1L, "scooter", Some(3.14), Changelog.Insert),
      (1L, "scooter", Some(3.14), Changelog.UpdateBefore),
      (1L, "scooter", Some(5.18), Changelog.UpdateAfter),
      (1L, "scooter", Some(5.18), Changelog.Delete),
      (2L, "spare tire", Some(22.2), Changelog.Insert)))
  }

  test("debezium: schema-include nests the envelope under payload") {
    val out = CdcJson.debezium(linesDf(
      """{"schema":{"ignored":true},"payload":{"before":null,"after":{"id":7,"name":"x","weight":1.0},"op":"c"}}"""),
      physical, schemaInclude = true)
    assert(rowsOf(out) === Seq((7L, "x", Some(1.0), Changelog.Insert)))
  }

  test("debezium: strict mode raises on unknown op and on null before (REPLICA IDENTITY)") {
    val unknown = CdcJson.debezium(linesDf(
      """{"before":null,"after":{"id":1,"name":"a","weight":1.0},"op":"z"}"""), physical)
    val e1 = intercept[Exception](unknown.collect())
    assert(e1.getMessage.contains("debezium"), e1.getMessage)
    val nullBefore = CdcJson.debezium(linesDf(
      """{"before":null,"after":{"id":1,"name":"a","weight":1.0},"op":"u"}"""), physical)
    val e2 = intercept[Exception](nullBefore.collect())
    assert(e2.getMessage.contains("REPLICA IDENTITY"), e2.getMessage)
    // a null after on c/r must not leak an all-null +I row
    val nullAfter = CdcJson.debezium(linesDf(
      """{"before":null,"after":null,"op":"c"}"""), physical)
    val e3 = intercept[Exception](nullAfter.collect())
    assert(e3.getMessage.contains("\"after\""), e3.getMessage)
    // a null after on u must not leak an all-null +U row either
    val nullAfterU = CdcJson.debezium(linesDf(
      """{"before":{"id":1,"name":"a","weight":1.0},"after":null,"op":"u"}"""), physical)
    val e4 = intercept[Exception](nullAfterU.collect())
    assert(e4.getMessage.contains("\"after\"") && e4.getMessage.contains("update"),
      e4.getMessage)
    // ...and ignore mode drops the whole event, emitting neither image
    val droppedU = CdcJson.debezium(linesDf(
      """{"before":{"id":1,"name":"a","weight":1.0},"after":null,"op":"u"}""",
      """{"before":null,"after":{"id":2,"name":"b","weight":2.0},"op":"c"}"""),
      physical, ignoreParseErrors = true)
    assert(rowsOf(droppedU) === Seq((2L, "b", Some(2.0), Changelog.Insert)))
  }

  test("debezium: ignore-parse-errors drops corrupt/unknown records, keeps good ones") {
    val out = CdcJson.debezium(linesDf(
      "this is not json",
      """{"before":null,"after":{"id":1,"name":"a","weight":1.0},"op":"z"}""",
      """{"before":null,"after":{"id":1,"name":"a","weight":1.0},"op":"u"}""",
      """{"before":null,"after":{"id":2,"name":"b","weight":2.0},"op":"c"}"""),
      physical, ignoreParseErrors = true)
    assert(rowsOf(out) === Seq((2L, "b", Some(2.0), Changelog.Insert)))
  }

  test("canal: INSERT/UPDATE/DELETE with multi-row data arrays; CREATE (DDL) skipped") {
    val out = CdcJson.canal(linesDf(
      """{"data":[{"id":1,"name":"a","weight":1.0},{"id":2,"name":"b","weight":2.0}],"old":null,"type":"INSERT"}""",
      """{"data":null,"old":null,"type":"CREATE"}""",
      """{"data":[{"id":2,"name":"b","weight":2.0}],"old":null,"type":"DELETE"}"""),
      physical)
    assert(rowsOf(out).toSet === Set(
      (1L, "a", Some(1.0), Changelog.Insert),
      (2L, "b", Some(2.0), Changelog.Insert),
      (2L, "b", Some(2.0), Changelog.Delete)))
  }

  test("canal: UPDATE before-image merges only the changed fields from old") {
    // old[0] carries weight ONLY -> before keeps after's id/name but
    // old's weight (reference lines 252-260); old[1] carries an
    // explicit null name -> "changed to null", so before.name is null
    val out = CdcJson.canal(linesDf(
      """{"data":[{"id":1,"name":"a","weight":9.9},{"id":2,"name":"bb","weight":2.0}],""" +
        """"old":[{"weight":"1.5"},{"name":null}],"type":"UPDATE"}"""),
      physical)
    assert(rowsOf(out).toSet === Set(
      (1L, "a", Some(1.5), Changelog.UpdateBefore),
      (1L, "a", Some(9.9), Changelog.UpdateAfter),
      (2L, null, Some(2.0), Changelog.UpdateBefore),
      (2L, "bb", Some(2.0), Changelog.UpdateAfter)))
  }

  test("canal: strict mode raises on unknown type and null old in UPDATE; ignore drops") {
    val unknown = CdcJson.canal(linesDf(
      """{"data":[{"id":1,"name":"a","weight":1.0}],"old":null,"type":"UPSERT"}"""), physical)
    val e1 = intercept[Exception](unknown.collect())
    assert(e1.getMessage.contains("canal"), e1.getMessage)
    val nullOld = CdcJson.canal(linesDf(
      """{"data":[{"id":1,"name":"a","weight":1.0}],"old":null,"type":"UPDATE"}"""), physical)
    val e2 = intercept[Exception](nullOld.collect())
    assert(e2.getMessage.contains("UPDATE"), e2.getMessage)
    // a null element inside data must not leak an all-null row
    val nullElem = CdcJson.canal(linesDf(
      """{"data":[null],"old":null,"type":"INSERT"}"""), physical)
    val e3 = intercept[Exception](nullElem.collect())
    assert(e3.getMessage.contains("null row"), e3.getMessage)
    val out = CdcJson.canal(linesDf(
      "garbage",
      """{"data":[{"id":1,"name":"a","weight":1.0}],"old":null,"type":"UPSERT"}""",
      """{"data":[null],"old":null,"type":"INSERT"}""",
      """{"data":[{"id":3,"name":"c","weight":3.0}],"old":null,"type":"INSERT"}"""),
      physical, ignoreParseErrors = true)
    assert(rowsOf(out) === Seq((3L, "c", Some(3.0), Changelog.Insert)))
  }

  test("maxwell: insert/update/delete route; update merges old over data") {
    // old carries only the changed fields' previous values: weight on
    // row 1; an explicit null name on row 4 means "changed to null"
    val out = CdcJson.maxwell(linesDf(
      """{"data":{"id":1,"name":"a","weight":1.0},"old":null,"type":"insert"}""",
      """{"data":{"id":1,"name":"a","weight":9.9},"old":{"weight":"1.0"},"type":"update"}""",
      """{"data":{"id":4,"name":"dd","weight":4.0},"old":{"name":null},"type":"update"}""",
      "", // tombstone
      """{"data":{"id":1,"name":"a","weight":9.9},"old":null,"type":"delete"}"""),
      physical)
    assert(rowsOf(out).toSet === Set(
      (1L, "a", Some(1.0), Changelog.Insert),
      (1L, "a", Some(1.0), Changelog.UpdateBefore),
      (1L, "a", Some(9.9), Changelog.UpdateAfter),
      (4L, null, Some(4.0), Changelog.UpdateBefore),
      (4L, "dd", Some(4.0), Changelog.UpdateAfter),
      (1L, "a", Some(9.9), Changelog.Delete)))
  }

  test("maxwell: strict raises on bootstrap/unknown type and null old in update; ignore drops") {
    val unknown = CdcJson.maxwell(linesDf(
      """{"data":{"id":1,"name":"a","weight":1.0},"old":null,"type":"bootstrap-insert"}"""),
      physical)
    val e1 = intercept[Exception](unknown.collect())
    assert(e1.getMessage.contains("maxwell"), e1.getMessage)
    val nullOld = CdcJson.maxwell(linesDf(
      """{"data":{"id":1,"name":"a","weight":1.0},"old":null,"type":"update"}"""),
      physical)
    val e2 = intercept[Exception](nullOld.collect())
    assert(e2.getMessage.contains("\"old\""), e2.getMessage)
    val out = CdcJson.maxwell(linesDf(
      "garbage",
      """{"data":{"id":1,"name":"a","weight":1.0},"old":null,"type":"bootstrap-insert"}""",
      """{"data":{"id":3,"name":"c","weight":3.0},"old":null,"type":"insert"}"""),
      physical, ignoreParseErrors = true)
    assert(rowsOf(out) === Seq((3L, "c", Some(3.0), Changelog.Insert)))
  }

  test("ogg: I/U/D ops emit +I, -U/+U, -D; strict errors match the reference") {
    val out = CdcJson.ogg(linesDf(
      """{"before":null,"after":{"id":1,"name":"a","weight":1.0},"op_type":"I"}""",
      """{"before":{"id":1,"name":"a","weight":1.0},"after":{"id":1,"name":"a","weight":2.0},"op_type":"U"}""",
      """{"before":{"id":1,"name":"a","weight":2.0},"after":null,"op_type":"D"}"""),
      physical)
    assert(rowsOf(out).toSet === Set(
      (1L, "a", Some(1.0), Changelog.Insert),
      (1L, "a", Some(1.0), Changelog.UpdateBefore),
      (1L, "a", Some(2.0), Changelog.UpdateAfter),
      (1L, "a", Some(2.0), Changelog.Delete)))
    // truncate is declared but unhandled in the reference -> unknown op
    val trunc = CdcJson.ogg(linesDf(
      """{"before":null,"after":null,"op_type":"T"}"""), physical)
    val e1 = intercept[Exception](trunc.collect())
    assert(e1.getMessage.contains("ogg"), e1.getMessage)
    val nullBefore = CdcJson.ogg(linesDf(
      """{"before":null,"after":{"id":1,"name":"a","weight":1.0},"op_type":"U"}"""),
      physical)
    val e2 = intercept[Exception](nullBefore.collect())
    assert(e2.getMessage.contains("before"), e2.getMessage)
    val dropped = CdcJson.ogg(linesDf(
      """{"before":null,"after":null,"op_type":"T"}""",
      """{"before":null,"after":{"id":2,"name":"b","weight":2.0},"op_type":"I"}"""),
      physical, ignoreParseErrors = true)
    assert(rowsOf(dropped) === Seq((2L, "b", Some(2.0), Changelog.Insert)))
  }

  test("normalize: a delete at the same version as the row it deletes wins the tie") {
    val log = Seq(
      (1L, 10L, "live", Changelog.Insert),
      (2L, 10L, "dead", Changelog.Insert),
      // CDC delete carries the deleted row's own version columns
      (2L, 10L, "dead", Changelog.Delete))
      .toDF("id", "ver", "payload", Changelog.RowKindCol)
      .withColumn(Changelog.RowKindCol,
        org.apache.spark.sql.functions.col(Changelog.RowKindCol).cast("byte"))
    val cur = Changelog.normalize(log, Seq("id"),
      Seq(org.apache.spark.sql.functions.col("ver")))
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(cur === Set((1L, "live")))
  }

  test("CDC table streams: debezium file stream decodes into the retract aggregate") {
    import org.apache.spark.sql.functions.col
    import graft.catalog.GraftCatalog
    import graft.streaming.RetractStream
    val base = java.nio.file.Files.createTempDirectory("graft_cdcstream").toString
    val dir = s"$base/lines"
    new java.io.File(dir).mkdirs()
    def emit(name: String, lines: String*): Unit = {
      val w = new java.io.PrintWriter(new java.io.OutputStreamWriter(
        new java.io.FileOutputStream(new java.io.File(dir, name)), "UTF-8"))
      try lines.foreach(w.println) finally w.close()
    }
    emit("b0.json",
      """{"before":null,"after":{"id":1,"grp":"a","amount":10},"op":"c"}""",
      """{"before":null,"after":{"id":2,"grp":"a","amount":5},"op":"c"}""")
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE cdc_stream_t (
         |  id BIGINT, grp VARCHAR(5), amount BIGINT,
         |  PRIMARY KEY (id) NOT ENFORCED
         |) WITH ('connector' = 'filesystem', 'path' = '$dir',
         |        'format' = 'debezium-json', 'version-by' = 'id')""".stripMargin)
    val events = GraftCatalog.streamOf(spark, "cdc_stream_t")
      .select(col("grp").as("key"), col("amount").as("value"),
        col(Changelog.RowKindCol).as("kind"))
      .as[RetractStream.ChangeEvent]
    val q = RetractStream.groupAggRetract(events).writeStream.format("memory")
      .queryName("cdc_stream_agg").outputMode("update").start()
    try {
      q.processAllAvailable()
      def emissions = spark.table("cdc_stream_agg").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getByte(8))).toSeq
      assert(emissions.contains(("a", 2L, 15L, Changelog.UpdateAfter)),
        s"initial batch must aggregate both inserts: $emissions")
      // id 2 moves a -> b: -U cancels it in a, +U opens b
      emit("b1.json",
        """{"before":{"id":2,"grp":"a","amount":5},"after":{"id":2,"grp":"b","amount":7},"op":"u"}""")
      q.processAllAvailable()
      assert(emissions.contains(("a", 1L, 10L, Changelog.UpdateAfter)) &&
        emissions.contains(("b", 1L, 7L, Changelog.UpdateAfter)), s"got $emissions")
      // deleting id 1 empties group a -> one -D emission
      emit("b2.json",
        """{"before":{"id":1,"grp":"a","amount":10},"after":null,"op":"d"}""")
      q.processAllAvailable()
      assert(emissions.exists(e => e._1 == "a" && e._4 == Changelog.Delete),
        s"group a must retract with -D when its support reaches zero: $emissions")
    } finally q.stop()
  }

  test("FOR SYSTEM_TIME AS OF over a CDC table: versions valid until update or delete") {
    import spark.implicits._
    import graft.catalog.GraftCatalog
    import graft.sql.GraftSql
    val base = java.nio.file.Files.createTempDirectory("graft_cdctemp").toString
    val dir = s"$base/lines"
    new java.io.File(dir).mkdirs()
    val w = new java.io.PrintWriter(new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(new java.io.File(dir, "b0.json")), "UTF-8"))
    // id 1: x@10 -> y@20 -> deleted@30 (the delete event carries ITS
    // OWN position in the version column, offset/ts_ms style);
    // id 2: p@5, never deleted
    try Seq(
      """{"before":null,"after":{"id":1,"ver":10,"name":"x"},"op":"c"}""",
      """{"before":{"id":1,"ver":10,"name":"x"},"after":{"id":1,"ver":20,"name":"y"},"op":"u"}""",
      """{"before":{"id":1,"ver":30,"name":"y"},"after":null,"op":"d"}""",
      """{"before":null,"after":{"id":2,"ver":5,"name":"p"},"op":"c"}""")
      .foreach(w.println) finally w.close()
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE cdc_vers (
         |  id BIGINT, ver BIGINT, name VARCHAR(5),
         |  PRIMARY KEY (id) NOT ENFORCED
         |) WITH ('connector' = 'filesystem', 'path' = '$dir',
         |        'format' = 'debezium-json', 'version-by' = 'ver')""".stripMargin)
    Seq((1L, 15L), (1L, 25L), (1L, 35L), (2L, 100L)).toDF("pid", "pver")
      .createOrReplaceTempView("cdc_probes")
    val out = GraftSql.sql(spark,
      """SELECT p.pid, p.pver, v.name FROM cdc_probes p
        |JOIN cdc_vers FOR SYSTEM_TIME AS OF p.pver AS v
        |  ON v.id = p.pid""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // 15 -> x (valid [10,20)), 25 -> y ([20,30)), 35 -> nothing
    // (deleted at 30), 100 -> p (open validity)
    assert(out === Set((1L, 15L, "x"), (1L, 25L, "y"), (2L, 100L, "p")), s"got $out")
  }

  test("INSERT INTO a CDC table encodes the changelog write half and round-trips") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.catalog.GraftCatalog
    import graft.sql.GraftSql
    graft.Tables.registerAll(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("graft_cdcwrite").toString
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE cdc_out (
         |  id BIGINT, name VARCHAR(8),
         |  PRIMARY KEY (id) NOT ENFORCED
         |) WITH ('connector' = 'filesystem', 'path' = '$base/lines',
         |        'format' = 'canal-json', 'version-by' = 'id')""".stripMargin)
    // plain INSERT: every row encodes as a canal INSERT batch
    GraftSql.sql(spark,
      "INSERT INTO cdc_out SELECT n_nationkey, substring(n_name, 1, 8) FROM nation WHERE n_nationkey < 3")
    val kinds = spark.table("cdc_out").select(col(Changelog.RowKindCol))
      .collect().map(_.getByte(0)).toSet
    assert(kinds === Set(Changelog.Insert), s"got $kinds")
    assert(spark.table("cdc_out").count() === 3)
    // changelog write: a -D row encodes as canal DELETE; the decoded
    // current state (normalize via the SQL front door) drops the key
    val del = Seq((1L, "x")).toDF("id", "name")
      .withColumn(Changelog.RowKindCol, org.apache.spark.sql.functions.lit(Changelog.Delete))
    GraftCatalog.insertInto(spark, "cdc_out", del, overwrite = false)
    val cur = GraftSql.sql(spark, "SELECT id FROM cdc_out")
      .collect().map(_.getLong(0)).toSet
    assert(cur === Set(0L, 2L), s"deleted key must vanish from current state: $cur")
    // file content is real canal json
    val text = spark.read.text(s"$base/lines").collect().map(_.getString(0))
    assert(text.exists(_.contains("\"type\":\"INSERT\"")) &&
      text.exists(_.contains("\"type\":\"DELETE\"")), text.mkString("\n"))
    // a corrupted kind column must raise, never silently encode DELETE
    val bad = Seq((9L, "z")).toDF("id", "name")
      .withColumn(Changelog.RowKindCol, org.apache.spark.sql.functions.lit(7).cast("byte"))
    val err = intercept[Exception](
      GraftCatalog.insertInto(spark, "cdc_out", bad, overwrite = false))
    assert(err.getMessage.contains("invalid"), err.getMessage)
    // schema-include tables write what their own decoder expects
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE cdc_out_si (
         |  id BIGINT, name VARCHAR(8),
         |  PRIMARY KEY (id) NOT ENFORCED
         |) WITH ('connector' = 'filesystem', 'path' = '$base/si',
         |        'format' = 'debezium-json', 'version-by' = 'id',
         |        'debezium-json.schema-include' = 'true')""".stripMargin)
    GraftSql.sql(spark,
      "INSERT INTO cdc_out_si SELECT n_nationkey, substring(n_name, 1, 8) FROM nation WHERE n_nationkey < 2")
    assert(spark.table("cdc_out_si").count() === 2,
      "schema-include write must round-trip through the payload-nested decoder")
    // maxwell and ogg tables round-trip through their own encoders
    for ((fmt, tbl) <- Seq("maxwell-json" -> "cdc_out_mx", "ogg-json" -> "cdc_out_ogg")) {
      GraftCatalog.executeDdl(spark,
        s"""CREATE TABLE $tbl (
           |  id BIGINT, name VARCHAR(8),
           |  PRIMARY KEY (id) NOT ENFORCED
           |) WITH ('connector' = 'filesystem', 'path' = '$base/$tbl',
           |        'format' = '$fmt', 'version-by' = 'id')""".stripMargin)
      GraftSql.sql(spark,
        s"INSERT INTO $tbl SELECT n_nationkey, substring(n_name, 1, 8) FROM nation WHERE n_nationkey < 3")
      GraftCatalog.insertInto(spark, tbl, del, overwrite = false)
      val curF = GraftSql.sql(spark, s"SELECT id FROM $tbl")
        .collect().map(_.getLong(0)).toSet
      assert(curF === Set(0L, 2L), s"$fmt: deleted key must vanish, got $curF")
    }
  }

  test("decoded changelog feeds retract aggregation end-to-end") {
    val out = CdcJson.debezium(linesDf(
      """{"before":null,"after":{"id":1,"name":"g1","weight":10.0},"op":"c"}""",
      """{"before":{"id":1,"name":"g1","weight":10.0},"after":{"id":1,"name":"g2","weight":10.0},"op":"u"}""",
      """{"before":null,"after":{"id":2,"name":"g2","weight":5.0},"op":"c"}""",
      """{"before":{"id":2,"name":"g2","weight":5.0},"after":null,"op":"d"}"""),
      physical)
    val agg = Changelog.aggregateRetract(out, Seq("name"), Seq("weight"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // id 1 moved g1 -> g2 (g1 nets to zero support and vanishes);
    // id 2 was inserted then deleted (g2 keeps only id 1's row)
    assert(agg === Set(("g2", 1L, 10.0)))
  }
}
