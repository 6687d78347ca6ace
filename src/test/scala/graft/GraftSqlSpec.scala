package graft

import org.apache.spark.sql.functions._
import graft.sql.GraftSql

/** Flink-SQL-surface rewrites produce the same results as the DSL
  * operators.
  */
class GraftSqlSpec extends SparkSpec {

  private def prep(): Unit = Tables.registerAll(spark, sfDir)

  test("TUMBLE TVF text matches DSL tumble") {
    prep()
    val viaSql = GraftSql.sql(spark,
      """SELECT window_start, window_end, event_type, count(*) AS n, sum(value) AS sum_value
        |FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        |GROUP BY window_start, window_end, event_type""".stripMargin)
    val viaDsl = operators.TvfQueries.tumble(spark, sfDir)
    assert(viaSql.count() === viaDsl.count())
    assert(viaSql.exceptAll(viaDsl.toDF(viaSql.columns: _*)).count() === 0)
  }

  test("HOP TVF text matches DSL hop (slide 30m, size 1h)") {
    prep()
    val viaSql = GraftSql.sql(spark,
      """SELECT window_start, window_end, event_type, count(*) AS n, sum(value) AS sum_value
        |FROM TABLE(HOP(TABLE events, DESCRIPTOR(ts), INTERVAL '30' MINUTE, INTERVAL '1' HOUR))
        |GROUP BY window_start, window_end, event_type""".stripMargin)
    val viaDsl = operators.TvfQueries.hop(spark, sfDir)
    assert(viaSql.exceptAll(viaDsl.toDF(viaSql.columns: _*)).count() === 0)
    assert(viaSql.count() === viaDsl.count())
  }

  test("CUMULATE TVF text matches DSL cumulate (step 15m, max 1h)") {
    prep()
    val viaSql = GraftSql.sql(spark,
      """SELECT window_start, window_end, count(*) AS n, sum(value) AS sum_value
        |FROM TABLE(CUMULATE(TABLE events, DESCRIPTOR(ts), INTERVAL '15' MINUTE, INTERVAL '1' HOUR))
        |GROUP BY window_start, window_end""".stripMargin)
    val viaDsl = operators.TvfQueries.cumulate(spark, sfDir)
    assert(viaSql.count() === viaDsl.count())
    assert(viaSql.exceptAll(viaDsl.toDF(viaSql.columns: _*)).count() === 0)
  }

  test("FOR SYSTEM_TIME AS OF proctime erases to snapshot join") {
    prep()
    val df = GraftSql.sql(spark,
      """SELECT s_suppkey, n_name
        |FROM supplier JOIN nation FOR SYSTEM_TIME AS OF now() ON s_nationkey = n_nationkey""".stripMargin)
    assert(df.count() === Tables.load(spark, sfDir, "supplier").count())
  }

  test("flink-only function names work in SQL text") {
    val r = GraftSql.sql(spark,
      "SELECT split_index('a-b-c', '-', 0) AS s, hamming64(7, 4) AS h").first()
    assert(r.getString(0) === "a")
    assert(r.getInt(1) === 2)
  }

  // ---- round-2: tokenizer-based pre-parser (aliased / nested TVF calls) ----

  test("aliased TVF call: TABLE(TUMBLE(...)) AS w with qualified refs") {
    prep()
    val viaSql = GraftSql.sql(spark,
      """SELECT w.window_start, w.window_end, count(*) AS n
        |FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR)) AS w
        |GROUP BY w.window_start, w.window_end""".stripMargin)
    val expect = operators.TvfQueries.tumble(spark, sfDir)
      .groupBy(col("wstart"), col("wend")).agg(sum("n").as("n"))
    assert(viaSql.count() === expect.count())
  }

  test("nested TVF source: TUMBLE over a parenthesized subquery") {
    prep()
    val viaSql = GraftSql.sql(spark,
      """SELECT window_start, count(*) AS n
        |FROM TABLE(TUMBLE(TABLE (SELECT * FROM events WHERE event_type = 'view'),
        |                  DESCRIPTOR(ts), INTERVAL '1' HOUR))
        |GROUP BY window_start""".stripMargin)
    val expect = GraftSql.sql(spark,
      """SELECT window_start, count(*) AS n
        |FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        |WHERE event_type = 'view'
        |GROUP BY window_start""".stripMargin)
    assert(viaSql.exceptAll(expect).count() === 0)
    assert(viaSql.count() === expect.count())
  }

  test("SESSION TVF rewrites onto session_window grouping") {
    prep()
    val viaSql = GraftSql.sql(spark,
      """SELECT window_start AS wstart, window_end AS wend, user_id,
        |  count(*) AS n, sum(value) AS sum_value
        |FROM TABLE(SESSION(TABLE events PARTITION BY user_id, DESCRIPTOR(ts), INTERVAL '10' MINUTE))
        |GROUP BY window_start, window_end, user_id""".stripMargin)
    val viaDsl = operators.TvfQueries.session(spark, sfDir)
    assert(viaSql.count() === viaDsl.count())
    assert(viaSql.exceptAll(viaDsl.toDF(viaSql.columns: _*)).count() === 0)
  }

  test("MATCH_RECOGNIZE SQL matches the DSL CEP query") {
    prep()
    val viaSql = GraftSql.sql(spark,
      """SELECT * FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES COUNT(V.*) AS n_views, FIRST(V.event_id) AS first_view,
        |           P.event_id AS purchase_id
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (V+ P)
        |  DEFINE V AS event_type = 'view', P AS event_type = 'purchase'
        |)""".stripMargin)
    val viaDsl = graft.cep.CepOps.viewRunsThenPurchase(spark, sfDir)
    assert(viaSql.count() === viaDsl.count())
    assert(viaSql.exceptAll(viaDsl.toDF(viaSql.columns: _*)).count() === 0)
  }

  test("CREATE TABLE + INSERT INTO pipeline through the SQL front door") {
    prep()
    val base = java.nio.file.Files.createTempDirectory("graft_ins").toString
    GraftSql.sql(spark,
      s"""CREATE TABLE top_nations (
         |  n_nationkey BIGINT NOT NULL, n_name VARCHAR(25)
         |) WITH ('connector' = 'filesystem', 'path' = '$base/top_nations',
         |        'format' = 'parquet')""".stripMargin)
    assert(spark.table("top_nations").count() === 0) // empty sink table
    GraftSql.sql(spark,
      """INSERT INTO top_nations
        |SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name
        |FROM nation WHERE n_nationkey < 5""".stripMargin)
    assert(spark.table("top_nations").count() === 5)
    GraftSql.sql(spark,
      """INSERT INTO top_nations
        |SELECT CAST(n_nationkey AS BIGINT), n_name FROM nation WHERE n_nationkey = 7""".stripMargin)
    assert(spark.table("top_nations").count() === 6) // append
    GraftSql.sql(spark,
      """INSERT OVERWRITE top_nations
        |SELECT CAST(n_nationkey AS BIGINT), n_name FROM nation WHERE n_nationkey >= 20""".stripMargin)
    assert(spark.table("top_nations").count() === 5) // replaced
  }

  test("CREATE VIEW with dialect body and STATEMENT SET multi-insert") {
    prep()
    val base = java.nio.file.Files.createTempDirectory("graft_stmtset").toString
    GraftSql.sql(spark,
      """CREATE VIEW hourly_counts AS
        |SELECT window_start, count(*) AS n
        |FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        |GROUP BY window_start""".stripMargin)
    assert(spark.table("hourly_counts").count() > 0)
    GraftSql.sql(spark,
      s"""CREATE TABLE sink_a (n_nationkey BIGINT, n_name VARCHAR(25))
         |WITH ('connector' = 'filesystem', 'path' = '$base/a', 'format' = 'parquet')""".stripMargin)
    GraftSql.sql(spark,
      s"""CREATE TABLE sink_b (n_nationkey BIGINT, n_name VARCHAR(25))
         |WITH ('connector' = 'filesystem', 'path' = '$base/b', 'format' = 'parquet')""".stripMargin)
    GraftSql.sql(spark,
      """EXECUTE STATEMENT SET BEGIN
        |  INSERT INTO sink_a SELECT CAST(n_nationkey AS BIGINT), n_name FROM nation WHERE n_nationkey < 3;
        |  INSERT INTO sink_b SELECT CAST(n_nationkey AS BIGINT), n_name FROM nation WHERE n_nationkey >= 20;
        |END""".stripMargin)
    assert(spark.table("sink_a").count() === 3)
    assert(spark.table("sink_b").count() === 5)
  }

  test("FOR SYSTEM_TIME AS OF an event-time column joins the version valid then") {
    import java.sql.Timestamp
    import spark.implicits._
    prep()
    def t(s: String) = Timestamp.valueOf(s)
    val base = java.nio.file.Files.createTempDirectory("graft_tj").toString
    // user 1 versions: 10 at 10:00, 20 at 10:30; user 2: 5 at 10:15
    Seq((1L, t("2024-01-01 10:00:00"), 10.0),
        (1L, t("2024-01-01 10:30:00"), 20.0),
        (2L, t("2024-01-01 10:15:00"), 5.0))
      .toDF("k", "vts", "v").write.parquet(s"$base/vt")
    GraftSql.sql(spark,
      s"""CREATE TABLE vt (
         |  k BIGINT, vts TIMESTAMP(3), v DOUBLE,
         |  PRIMARY KEY (k) NOT ENFORCED
         |) WITH ('connector' = 'filesystem', 'path' = '$base/vt',
         |        'format' = 'parquet', 'changelog-mode' = 'upsert',
         |        'version-by' = 'vts')""".stripMargin)
    Seq((100L, 1L, t("2024-01-01 10:10:00")),  // before the 10:30 update -> 10
        (101L, 1L, t("2024-01-01 10:30:00")),  // exactly at the update -> 20
        (102L, 2L, t("2024-01-01 10:00:00")))  // before user 2 exists -> no row
      .toDF("id", "k", "ts").createOrReplaceTempView("probes")
    val out = GraftSql.sql(spark,
      """SELECT p.id, v.v AS state
        |FROM probes p
        |JOIN vt FOR SYSTEM_TIME AS OF p.ts AS v ON v.k = p.k
        |WHERE p.id < 1000""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(out === Set((100L, 10.0), (101L, 20.0)),
      "event-time temporal join must pick the version valid at the probe time")
    // PROCTIME()-style AS OF: erasure + upsert normalization = a
    // lookup join against CURRENT state, the reference's proctime
    // temporal join semantics (user 1's current version is 20)
    val snap = GraftSql.sql(spark,
      """SELECT p.id, v.v AS state
        |FROM probes p JOIN vt FOR SYSTEM_TIME AS OF PROCTIME() AS v ON v.k = p.k""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(snap === Set((100L, 20.0), (101L, 20.0), (102L, 5.0)),
      "proctime AS OF must read the CURRENT version per key")
  }

  test("temporal join in a CTE; alias-less table-qualified ON; side-effect-free EXPLAIN") {
    import java.sql.Timestamp
    import spark.implicits._
    prep()
    def t(s: String) = Timestamp.valueOf(s)
    val base = java.nio.file.Files.createTempDirectory("graft_tj2").toString
    Seq((1L, t("2024-01-01 10:00:00"), 10.0), (1L, t("2024-01-01 10:30:00"), 20.0))
      .toDF("k", "vts", "v").write.parquet(s"$base/vt2")
    GraftSql.sql(spark,
      s"""CREATE TABLE vt2 (
         |  k BIGINT, vts TIMESTAMP(3), v DOUBLE, PRIMARY KEY (k) NOT ENFORCED
         |) WITH ('connector' = 'filesystem', 'path' = '$base/vt2',
         |        'format' = 'parquet', 'changelog-mode' = 'upsert',
         |        'version-by' = 'vts')""".stripMargin)
    Seq((100L, 1L, t("2024-01-01 10:10:00")), (101L, 1L, t("2024-01-01 10:40:00")))
      .toDF("id", "k", "ts").createOrReplaceTempView("probes2")
    // the join lives inside a CTE: the ON-span scanner must stop at
    // the CTE's close paren, not swallow the outer SELECT
    val cte = GraftSql.sql(spark,
      """WITH j AS (
        |  SELECT p.id, v.v AS state
        |  FROM probes2 p JOIN vt2 FOR SYSTEM_TIME AS OF p.ts AS v ON v.k = p.k)
        |SELECT id, state FROM j ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(cte === List((100L, 10.0), (101L, 20.0)))
    // no alias: ON columns qualified by the TABLE name must still bind
    val bare = GraftSql.sql(spark,
      """SELECT p.id, vt2.v AS state
        |FROM probes2 p JOIN vt2 FOR SYSTEM_TIME AS OF p.ts ON vt2.k = p.k""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(bare === Set((100L, 10.0), (101L, 20.0)))
    // EXPLAIN of an INSERT shows a plan but writes NOTHING
    GraftSql.sql(spark,
      s"""CREATE TABLE ex_sink (id BIGINT, state DOUBLE)
         |WITH ('connector' = 'filesystem', 'path' = '$base/ex_sink',
         |      'format' = 'parquet')""".stripMargin)
    val plan = GraftSql.sql(spark,
      "EXPLAIN INSERT INTO ex_sink SELECT k, v FROM vt2").first().getString(0)
    assert(plan.contains("== Physical Plan =="))
    assert(spark.table("ex_sink").count() === 0, "EXPLAIN must not execute the INSERT")
    // a LIKE predicate inside CTAS stays with Spark, not the DDL path
    GraftSql.sql(spark,
      "CREATE TABLE ctas_like AS SELECT n_name FROM nation WHERE n_name LIKE 'NATION_1%'")
    assert(spark.table("ctas_like").count() > 0)
    spark.sql("DROP TABLE ctas_like")
  }

  test("SQL over a DDL upsert table gets changelog adapters with no DSL calls") {
    import spark.implicits._
    prep()
    val base = java.nio.file.Files.createTempDirectory("graft_upsql").toString
    // version history: user 1 moves a->b (amount 10->20), user 2 stays a,
    // user 3 moves b->a->c (5->7->9)
    Seq(
      (1L, 1000L, "a", 10.0), (1L, 2000L, "b", 20.0),
      (2L, 1000L, "a", 5.0),
      (3L, 1000L, "b", 5.0), (3L, 2000L, "a", 7.0), (3L, 3000L, "c", 9.0))
      .toDF("user_id", "version", "status", "amount")
      .write.parquet(s"$base/user_state")
    GraftSql.sql(spark,
      s"""CREATE TABLE user_state (
         |  user_id BIGINT, version BIGINT, status VARCHAR(10), amount DOUBLE,
         |  PRIMARY KEY (user_id) NOT ENFORCED
         |) WITH ('connector' = 'filesystem', 'path' = '$base/user_state',
         |        'format' = 'parquet', 'changelog-mode' = 'upsert',
         |        'version-by' = 'version')""".stripMargin)
    // calc shape -> ChangelogNormalize inserted: current state only,
    // not the 6-row raw history
    val cur = GraftSql.sql(spark,
      "SELECT user_id, status, amount FROM user_state WHERE amount > 0")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(cur === Set((1L, "b", 20.0), (2L, "a", 5.0), (3L, "c", 9.0)))
    // agg shape -> retract-derivation + retract-aware aggregate:
    // superseded versions must not count (naive-over-history would
    // report a:3 rows / sum 22)
    val agg = GraftSql.sql(spark,
      """SELECT status, count(*) AS cnt, sum(amount) AS total
        |FROM user_state GROUP BY status""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(agg === Set(("b", 1L, 20.0), ("a", 1L, 5.0), ("c", 1L, 9.0)))
    // a filter over the changelog applies per version row: user 1's
    // CURRENT row is b/20, so status='a' nets that user away entirely
    val filtered = GraftSql.sql(spark,
      """SELECT status, count(*) AS cnt, sum(amount) AS total
        |FROM user_state WHERE status = 'a' GROUP BY status""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(filtered === Set(("a", 1L, 5.0)),
      "retracted versions must not resurrect through a filter")
    // JOIN / subquery / aliased shapes take the normalize-view path —
    // they must see current state, never the raw 6-row history
    val joined = GraftSql.sql(spark,
      """SELECT u.user_id, u.status, n.n_name FROM user_state u
        |JOIN nation n ON n.n_nationkey = u.user_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(joined === Set((1L, "b"), (2L, "a"), (3L, "c")),
      "a JOIN over an upsert table must read current state")
    val sub = GraftSql.sql(spark,
      "SELECT count(*) AS n FROM (SELECT * FROM user_state) t").first().getLong(0)
    assert(sub === 3L, "a subquery over an upsert table must read current state")
    val aliased = GraftSql.sql(spark,
      "SELECT u.user_id, u.amount FROM user_state u WHERE u.amount > 6")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(aliased === Set((1L, 20.0), (3L, 9.0)),
      "aliased/qualified predicates must resolve on the normalized view")
    // a comma join cannot be normalized positionally — it must fail
    // loudly, never silently serve raw version history
    val err = intercept[Exception](GraftSql.sql(spark,
      "SELECT * FROM nation, user_state WHERE user_id = n_nationkey"))
    assert(err.getMessage.contains("JOIN"), err.getMessage)
    // AVG/MIN/MAX plan the value-multiset retract state: user 1's
    // superseded a/10 and user 3's superseded a/7 are dead values —
    // a naive history aggregate would report max(a) = 10
    val mm = GraftSql.sql(spark,
      """SELECT status, count(*) AS c, avg(amount) AS av,
        |  max(amount) AS mx, min(amount) AS mn
        |FROM user_state GROUP BY status""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(mm === Set(("a", 1L, 5.0, 5.0, 5.0), ("b", 1L, 20.0, 20.0, 20.0),
      ("c", 1L, 9.0, 9.0, 9.0)), s"dead versions inflated an aggregate: $mm")
    // case-variant references resolve to the same upsert declaration
    val caseVar = GraftSql.sql(spark, "SELECT user_id, status FROM USER_STATE")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(caseVar === Set((1L, "b"), (2L, "a"), (3L, "c")),
      "USER_STATE must hit the same changelog planning as user_state")
    // a COLUMN merely named like the table must never trip the guard
    Seq(("row1", "some_value")).toDF("a", "user_state")
      .createOrReplaceTempView("audit_t")
    val colName = GraftSql.sql(spark,
      "SELECT user_state FROM audit_t WHERE user_state = 'some_value'")
    assert(colName.count() === 1)
  }

  test("AVG over an upsert table divides by count(non-null), not count(*)") {
    import spark.implicits._
    prep()
    val base = java.nio.file.Files.createTempDirectory("graft_upsnull").toString
    // user 2's current amount is NULL (supersedes a non-null 99.0);
    // user 3 has ONLY a null amount — its group's avg must be NULL
    Seq(
      (1L, 1000L, "a", Option(10.0)),
      (2L, 500L, "a", Option(99.0)), (2L, 1000L, "a", None),
      (3L, 1000L, "b", None))
      .toDF("user_id", "version", "status", "amount")
      .write.parquet(s"$base/t")
    GraftSql.sql(spark,
      s"""CREATE TABLE null_state (
         |  user_id BIGINT, version BIGINT, status VARCHAR(10), amount DOUBLE,
         |  PRIMARY KEY (user_id) NOT ENFORCED
         |) WITH ('connector' = 'filesystem', 'path' = '$base/t',
         |        'format' = 'parquet', 'changelog-mode' = 'upsert',
         |        'version-by' = 'version')""".stripMargin)
    // CAgg path (no min/max): live a-rows are {10.0, NULL} -> avg 10.0
    // (sum/cnt(*) would report 5.0); all-null group b -> NULL, not 0/0
    val av = GraftSql.sql(spark,
      "SELECT status, count(*) AS c, avg(amount) AS av FROM null_state GROUP BY status")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(av === Set(("a", 2L, Some(10.0)), ("b", 1L, None)), s"got $av")
    // CAggMinMax path (value-multiset state) must use the same divisor
    val mm = GraftSql.sql(spark,
      """SELECT status, count(*) AS c, avg(amount) AS av, max(amount) AS mx
        |FROM null_state GROUP BY status""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    assert(mm === Set(("a", 2L, Some(10.0), Some(10.0)), ("b", 1L, None, None)),
      s"got $mm")
  }

  test("window TVFs accept the optional offset argument") {
    prep()
    // HOP(slide 30m, size 1h, offset 10m): starts land on :10 / :40
    val out = GraftSql.sql(spark,
      """SELECT window_start, count(*) AS n
        |FROM TABLE(HOP(TABLE events, DESCRIPTOR(ts),
        |  INTERVAL '30' MINUTE, INTERVAL '1' HOUR, INTERVAL '10' MINUTE))
        |GROUP BY window_start""".stripMargin)
    val mins = out.collect().map(_.getTimestamp(0).toLocalDateTime.getMinute).toSet
    assert(mins.nonEmpty && mins.subsetOf(Set(10, 40)),
      s"offset hop windows must start at :10/:40, got minutes $mins")
    // CUMULATE(step 30m, max 1h, offset 20m): window_start on :20
    val cu = GraftSql.sql(spark,
      """SELECT window_start, count(*) AS n
        |FROM TABLE(CUMULATE(TABLE events, DESCRIPTOR(ts),
        |  INTERVAL '30' MINUTE, INTERVAL '1' HOUR, INTERVAL '20' MINUTE))
        |GROUP BY window_start""".stripMargin)
    val cuMins = cu.collect().map(_.getTimestamp(0).toLocalDateTime.getMinute).toSet
    assert(cuMins.nonEmpty && cuMins === Set(20),
      s"offset cumulate grid must start at :20, got minutes $cuMins")
  }

  test("SHOW TABLES / SHOW CREATE TABLE / DESCRIBE reflect connector DDL metadata") {
    import spark.implicits._
    prep()
    val base = java.nio.file.Files.createTempDirectory("graft_intro").toString
    Seq((1L, "a", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 5.0))
      .toDF("id", "name", "ts", "price").write.parquet(s"$base/t")
    GraftSql.sql(spark,
      s"""CREATE TABLE intro_t (
         |  id BIGINT NOT NULL, name VARCHAR(10), ts TIMESTAMP(3), price DOUBLE,
         |  cost AS price * 2,
         |  WATERMARK FOR ts AS ts - INTERVAL '5' MINUTE,
         |  PRIMARY KEY (id) NOT ENFORCED
         |) WITH ('connector' = 'filesystem', 'path' = '$base/t',
         |        'format' = 'parquet', 'changelog-mode' = 'upsert',
         |        'version-by' = 'ts')""".stripMargin)
    val tables = GraftSql.sql(spark, "SHOW TABLES").collect().map(_.getString(0))
    assert(tables.contains("intro_t"))
    val ddl = GraftSql.sql(spark, "SHOW CREATE TABLE intro_t").first().getString(0)
    for (frag <- Seq("CREATE TABLE intro_t", "id BIGINT NOT NULL",
        "name VARCHAR(10)", "cost AS price * 2", "WATERMARK FOR ts",
        "PRIMARY KEY (id) NOT ENFORCED", "'format' = 'parquet'"))
      assert(ddl.contains(frag), s"missing <$frag> in:\n$ddl")
    val desc = GraftSql.sql(spark, "DESCRIBE intro_t")
    assert(desc.columns.toSeq === Seq("name", "type", "null", "key", "extras", "watermark"))
    val byName = desc.collect().map(r => r.getString(0) -> r).toMap
    assert(byName("id").getString(1) === "BIGINT" && !byName("id").getBoolean(2))
    assert(byName("id").getString(3).startsWith("PRI"))
    assert(byName("name").getString(1) === "VARCHAR(10)")
    assert(byName("cost").getString(4) === "AS price * 2")
    assert(byName("cost").getString(1) === "DOUBLE", "computed type reads off the view")
    assert(byName("ts").getString(5).nonEmpty, "watermark column shows its expression")
    // a Spark-native relation falls back to the native DESCRIBE
    assert(GraftSql.sql(spark, "DESC nation").count() > 0)
  }

  test("SHOW VIEWS / SHOW COLUMNS / SHOW FUNCTIONS / ANALYZE TABLE / DROP VIEW") {
    prep()
    GraftSql.sql(spark,
      "CREATE VIEW intro_v AS SELECT n_nationkey, n_name FROM nation")
    val views = GraftSql.sql(spark, "SHOW VIEWS").collect().map(_.getString(0))
    assert(views.contains("intro_v"), views.mkString(","))
    // SHOW COLUMNS = the DESCRIBE row set, LIKE-filterable
    val cols = GraftSql.sql(spark, "SHOW COLUMNS FROM nation")
      .collect().map(_.getString(0))
    assert(cols.contains("n_nationkey") && cols.contains("n_name"))
    val liked = GraftSql.sql(spark, "SHOW COLUMNS FROM nation LIKE 'n_n%'")
      .collect().map(_.getString(0))
    assert(liked.toSet === Set("n_nationkey", "n_name"), liked.mkString(","))
    val notLiked = GraftSql.sql(spark, "SHOW COLUMNS FROM nation NOT LIKE 'n_n%'")
      .collect().map(_.getString(0))
    assert(!notLiked.exists(_.startsWith("n_n")) && notLiked.nonEmpty)
    // registered Flink-name functions list alongside the builtins
    val fns = GraftSql.sql(spark, "SHOW FUNCTIONS").collect().map(_.getString(0))
    assert(fns.contains("split_index") && fns.contains("is_alpha") &&
      fns.contains("abs"))
    // ANALYZE computes and records stats
    val st = GraftSql.sql(spark,
      "ANALYZE TABLE nation COMPUTE STATISTICS FOR COLUMNS n_nationkey, n_regionkey")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(st("n_nationkey").getLong(1) === 25L)  // row_count
    assert(math.abs(st("n_nationkey").getLong(2) - 25L) <= 1, "ndv within HLL rsd")
    assert(st("n_regionkey").getLong(2) === 5L)
    assert(st("n_nationkey").getLong(3) === 0L)   // null_count
    assert(st("n_nationkey").getString(4) === "0" && st("n_nationkey").getString(5) === "24")
    val rec = graft.catalog.GraftCatalog.statsOf("nation").get
    assert(rec.rowCount === 25L && rec.columns("n_regionkey").ndv === 5L)
    // FOR ALL COLUMNS covers every column; bare form records row count
    assert(GraftSql.sql(spark,
      "ANALYZE TABLE region COMPUTE STATISTICS FOR ALL COLUMNS").count() >= 2)
    assert(GraftSql.sql(spark,
      "ANALYZE TABLE region COMPUTE STATISTICS").first().getLong(1) === 5L)
    GraftSql.sql(spark, "DROP VIEW intro_v")
    assert(!GraftSql.sql(spark, "SHOW VIEWS").collect().map(_.getString(0))
      .contains("intro_v"))
  }

  test("avro-format DDL table: CREATE, INSERT INTO append, INSERT OVERWRITE") {
    prep()
    val base = java.nio.file.Files.createTempDirectory("graft_avroddl").toString
    GraftSql.sql(spark,
      s"""CREATE TABLE av_nations (n_nationkey BIGINT, n_name VARCHAR(25))
         |WITH ('connector' = 'filesystem', 'path' = '$base/av',
         |      'format' = 'avro')""".stripMargin)
    assert(spark.table("av_nations").count() === 0)
    GraftSql.sql(spark,
      """INSERT INTO av_nations
        |SELECT CAST(n_nationkey AS BIGINT), n_name FROM nation WHERE n_nationkey < 3""".stripMargin)
    assert(spark.table("av_nations").count() === 3)
    GraftSql.sql(spark,
      """INSERT INTO av_nations
        |SELECT CAST(n_nationkey AS BIGINT), n_name FROM nation WHERE n_nationkey = 7""".stripMargin)
    assert(spark.table("av_nations").count() === 4) // append kept prior files
    GraftSql.sql(spark,
      """INSERT OVERWRITE av_nations
        |SELECT CAST(n_nationkey AS BIGINT), n_name FROM nation WHERE n_nationkey >= 20""".stripMargin)
    val rows = spark.table("av_nations").collect()
    assert(rows.length === 5)
    assert(rows.map(_.getLong(0)).toSet === Set(20L, 21L, 22L, 23L, 24L))
  }

  test("EXPLAIN and EXPLAIN PLAN FOR return the physical plan of the dialect body") {
    prep()
    val plan = GraftSql.sql(spark,
      "EXPLAIN SELECT n_name FROM nation WHERE n_nationkey < 5").first().getString(0)
    assert(plan.contains("== Physical Plan =="), plan.take(200))
    val tvf = GraftSql.sql(spark,
      """EXPLAIN PLAN FOR SELECT window_start, count(*) AS n
        |FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        |GROUP BY window_start""".stripMargin).first().getString(0)
    assert(tvf.contains("== Physical Plan ==") && tvf.contains("HashAggregate"),
      tvf.take(300))
  }

  test("LATERAL TABLE rewrites to LATERAL VIEW: inner, outer, generator passthrough") {
    import spark.implicits._
    prep()
    Seq((1L, "a b"), (2L, "")).toDF("id", "s").createOrReplaceTempView("lt_src")
    // inner correlate: empty split yields one empty-string token row
    val inner = GraftSql.sql(spark,
      "SELECT id, w FROM lt_src, LATERAL TABLE(split(s, ' ')) AS T(w)")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(inner === Set((1L, "a"), (1L, "b"), (2L, "")))
    // outer correlate keeps rows whose generator yields nothing
    Seq((1L, Seq("x")), (2L, Seq.empty[String])).toDF("id", "arr")
      .createOrReplaceTempView("lt_arr")
    val outer = GraftSql.sql(spark,
      "SELECT id, w FROM lt_arr LEFT JOIN LATERAL TABLE(explode(arr)) AS T(w) ON TRUE")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(outer === Set((1L, Some("x")), (2L, None)))
    // posexplode passes through with both output columns
    val pos = GraftSql.sql(spark,
      "SELECT id, p, w FROM lt_arr, LATERAL TABLE(posexplode(arr)) AS T(p, w)")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(pos === Set((1L, 0, "x")))
  }

  test("temporal table function: LATERAL TABLE(rates(ts)) joins the version valid at ts") {
    import spark.implicits._
    prep()
    val base = java.nio.file.Files.createTempDirectory("graft_ttf").toString
    Seq(("EUR", 1.1, 1000L), ("EUR", 1.2, 2000L), ("USD", 1.0, 1000L))
      .toDF("currency", "rate", "rts").write.parquet(s"$base/rates_hist")
    GraftSql.sql(spark,
      s"""CREATE TABLE rates_hist (
         |  currency VARCHAR(3), rate DOUBLE, rts BIGINT,
         |  PRIMARY KEY (currency) NOT ENFORCED
         |) WITH ('connector' = 'filesystem', 'path' = '$base/rates_hist',
         |        'format' = 'parquet', 'changelog-mode' = 'upsert',
         |        'version-by' = 'rts')""".stripMargin)
    GraftSql.createTemporalTableFunction(spark, "rates", "rates_hist")
    Seq((1L, "EUR", 1500L, 10.0), (2L, "EUR", 2500L, 10.0), (3L, "USD", 1500L, 10.0))
      .toDF("o_id", "o_currency", "o_ts", "amount")
      .createOrReplaceTempView("ttf_orders")
    val out = GraftSql.sql(spark,
      """SELECT o_id, amount * r.rate AS converted
        |FROM ttf_orders, LATERAL TABLE(rates(o_ts)) AS r
        |WHERE r.currency = o_currency""".stripMargin)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSet
    // order 1 at ts=1500 sees EUR@1.1; order 2 at 2500 sees EUR@1.2
    assert(out === Set((1L, 11.0), (2L, 12.0), (3L, 10.0)))
    // alias-less form binds through the table name
    val bare = GraftSql.sql(spark,
      """SELECT o_id, amount * rates_hist.rate AS converted
        |FROM ttf_orders, LATERAL TABLE(rates(o_ts))
        |WHERE rates_hist.currency = o_currency""".stripMargin).count()
    assert(bare === 3L)
  }

  test("CREATE FUNCTION ... AS '<class>' registers a Catalyst expression by reflection") {
    prep()
    GraftSql.sql(spark,
      "CREATE TEMPORARY FUNCTION my_fp AS 'graft.functions.Fingerprint64'")
    val r = spark.sql(
      "SELECT my_fp('abc') AS a, fingerprint64('abc') AS b").first()
    assert(r.getLong(0) === r.getLong(1))
    // binary-arity class resolves through the same builder
    GraftSql.sql(spark,
      "CREATE FUNCTION my_cos AS 'graft.functions.CosineSimilarity'")
    val c = spark.sql(
      """SELECT my_cos(cast(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |              cast(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS c""".stripMargin)
      .first().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-9)
    // a non-Expression class is rejected loudly
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "CREATE FUNCTION bad AS 'java.lang.String'")
    }
    GraftSql.sql(spark, "DROP FUNCTION my_fp")
    intercept[Exception] { spark.sql("SELECT my_fp('x')").collect() }
  }

  test("OPTIONS hint applies per-query dynamic table options") {
    import spark.implicits._
    prep()
    val base = java.nio.file.Files.createTempDirectory("graft_hint").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .coalesce(1).write.option("header", "true").csv(s"$base/hinted")
    // the DDL declares headerless csv: the header line reads as a data
    // row (id unparseable -> NULL)
    GraftSql.sql(spark,
      s"""CREATE TABLE hinted_csv (id BIGINT, s VARCHAR(10))
         |WITH ('connector' = 'filesystem', 'path' = '$base/hinted',
         |      'format' = 'csv', 'csv.header' = 'false')""".stripMargin)
    val raw = GraftSql.sql(spark, "SELECT * FROM hinted_csv").collect()
    assert(raw.length === 3 && raw.exists(_.isNullAt(0)))
    // per-query override: same table, header honored, clean rows
    val hinted = GraftSql.sql(spark,
      "SELECT id, s FROM hinted_csv /*+ OPTIONS('csv.header' = 'true') */ WHERE id > 0")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(hinted === Set((1L, "a"), (2L, "b")))
    // the original registration is untouched
    assert(GraftSql.sql(spark, "SELECT * FROM hinted_csv").count() === 3)
    // qualified columns bind through an explicit alias after the hint
    val aliased = GraftSql.sql(spark,
      "SELECT h.s FROM hinted_csv /*+ OPTIONS('csv.header' = 'true') */ AS h WHERE h.id = 2")
      .first().getString(0)
    assert(aliased === "b")
    // ... and through the bare (no-AS) alias form
    val bare = GraftSql.sql(spark,
      "SELECT b.s FROM hinted_csv /*+ OPTIONS('csv.header' = 'true') */ b WHERE b.id = 1")
      .first().getString(0)
    assert(bare === "a")
    // repeated executions reuse one synthetic registration (no leak)
    val before = spark.catalog.listTables().count()
    (1 to 3).foreach(_ => GraftSql.sql(spark,
      "SELECT id FROM hinted_csv /*+ OPTIONS('csv.header' = 'true') */").count())
    assert(spark.catalog.listTables().count() === before)
    // re-CREATE of the base table invalidates the hinted snapshot:
    // the same hint text must see the NEW schema, not the cached one
    GraftSql.sql(spark, "DROP TABLE hinted_csv")
    Seq((5L, "z", 9.5)).toDF("id", "s", "score")
      .coalesce(1).write.option("header", "true").csv(s"$base/hinted2")
    GraftSql.sql(spark,
      s"""CREATE TABLE hinted_csv (id BIGINT, s VARCHAR(10), score DOUBLE)
         |WITH ('connector' = 'filesystem', 'path' = '$base/hinted2',
         |      'format' = 'csv', 'csv.header' = 'false')""".stripMargin)
    val again = GraftSql.sql(spark,
      "SELECT id, s, score FROM hinted_csv /*+ OPTIONS('csv.header' = 'true') */ WHERE id > 0")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(again === Set((5L, "z", 9.5)))
  }

  test("CTAS: CREATE TABLE ... WITH (...) AS SELECT derives schema and loads rows") {
    prep()
    val base = java.nio.file.Files.createTempDirectory("graft_ctas").toString
    val out = GraftSql.sql(spark,
      s"""CREATE TABLE ctas_nation WITH (
         |  'connector' = 'filesystem', 'path' = '$base/ctas_nation',
         |  'format' = 'parquet')
         |AS SELECT n_nationkey, upper(n_name) AS nm FROM nation WHERE n_nationkey < 5""".stripMargin)
    assert(out.count() === 5)
    // registered like any DDL table: queryable, introspectable, writable
    assert(GraftSql.sql(spark, "SELECT count(*) AS n FROM ctas_nation").first().getLong(0) === 5)
    assert(graft.catalog.GraftCatalog.showCreateTable("ctas_nation").contains("nm"))
    GraftSql.sql(spark, "INSERT INTO ctas_nation SELECT n_nationkey, n_name FROM nation WHERE n_nationkey = 7")
    assert(spark.table("ctas_nation").count() === 6)
  }

  test("COMPILE PLAN / EXECUTE PLAN: round-trip into a fresh session, pinned DDL wins") {
    prep()
    val base = java.nio.file.Files.createTempDirectory("graft_plan").toString
    GraftSql.sql(spark,
      s"""CREATE TABLE plan_src (
         |  l_orderkey BIGINT, l_quantity DOUBLE,
         |  l_returnflag VARCHAR(1), l_shipdate TIMESTAMP(3)
         |) WITH ('connector' = 'filesystem', 'path' = '$sfDir/lineitem.parquet',
         |        'format' = 'parquet')""".stripMargin)
    GraftSql.sql(spark,
      s"""CREATE TABLE plan_sink (wstart TIMESTAMP(3), n BIGINT)
         |WITH ('connector' = 'filesystem', 'path' = '$base/sink',
         |      'format' = 'parquet')""".stripMargin)
    val stmt =
      """INSERT INTO plan_sink
        |SELECT window_start AS wstart, count(*) AS n
        |FROM TABLE(TUMBLE(TABLE plan_src, DESCRIPTOR(l_shipdate), INTERVAL '30' DAY))
        |GROUP BY window_start""".stripMargin
    GraftSql.sql(spark, s"COMPILE PLAN '$base/p.json' FOR $stmt")
    // the plan file pins the dialect resolution + the DDL closure
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/p.json")), "UTF-8")
    assert(json.contains("plan_src") && json.contains("plan_sink"))
    assert(json.contains("window(")) // the rewritten TVF
    // compiling over an existing file fails; IF NOT EXISTS skips
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark, s"COMPILE PLAN '$base/p.json' FOR $stmt")
    }
    GraftSql.sql(spark, s"COMPILE PLAN IF NOT EXISTS '$base/p.json' FOR $stmt")
    // OVERWRITE replaces the existing file (the escape hatch the
    // exists-error names); mixing it with IF NOT EXISTS is rejected
    val before = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$base/p.json"))
    GraftSql.sql(spark, s"COMPILE PLAN OVERWRITE '$base/p.json' FOR $stmt")
    assert(java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$base/p.json")).compareTo(before) >= 0)
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark, s"COMPILE PLAN OVERWRITE IF NOT EXISTS '$base/p.json' FOR $stmt")
    }
    // expected result, computed directly (before any drift below)
    val expect = GraftSql.sql(spark,
      """SELECT window_start AS wstart, count(*) AS n
        |FROM TABLE(TUMBLE(TABLE plan_src, DESCRIPTOR(l_shipdate), INTERVAL '30' DAY))
        |GROUP BY window_start""".stripMargin)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    assert(expect.nonEmpty)
    // drift the live catalog AFTER compiling: the pinned declarations
    // must win at execute time (plan-stability contract)
    GraftSql.sql(spark, "DROP TABLE plan_src")
    // a fresh session has no temp views at all — EXECUTE PLAN must
    // re-register everything it needs from the plan file
    val s2 = spark.newSession()
    graft.functions.FlinkFunctions.registerAll(s2)
    val out = GraftSql.sql(s2, s"EXECUTE PLAN '$base/p.json'")
    assert(out.collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet === expect)
    // and the sink table is registered + populated in the new session
    assert(s2.table("plan_sink").count() === expect.size)
    GraftSql.sql(s2, "DROP TABLE plan_sink")
  }

  test("COMPILE AND EXECUTE PLAN writes the file and runs the statement") {
    prep()
    val base = java.nio.file.Files.createTempDirectory("graft_plan2").toString
    GraftSql.sql(spark,
      s"""CREATE TABLE plan2_sink (event_type STRING, n BIGINT)
         |WITH ('connector' = 'filesystem', 'path' = '$base/sink',
         |      'format' = 'parquet')""".stripMargin)
    GraftSql.sql(spark,
      s"""COMPILE AND EXECUTE PLAN '$base/q.json' FOR
         |INSERT INTO plan2_sink
         |SELECT event_type, count(*) AS n FROM events GROUP BY event_type""".stripMargin)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/q.json")))
    assert(spark.table("plan2_sink").count() > 0)
    GraftSql.sql(spark, "DROP TABLE plan2_sink")
  }

  test("SET / RESET map Flink config keys onto Spark confs") {
    prep()
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    GraftSql.sql(spark, "SET 'table.optimizer.join.broadcast-threshold' = '12345'")
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") === "12345")
    GraftSql.sql(spark, "RESET 'table.optimizer.join.broadcast-threshold'")
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") !== "12345")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
    // unknown keys pass through verbatim
    GraftSql.sql(spark, "SET 'pipeline.name' = 'graft-job'")
    assert(spark.conf.get("pipeline.name") === "graft-job")
    // bare SET lists the configuration
    assert(GraftSql.sql(spark, "SET").columns.toSeq === Seq("key", "value"))
  }

  test("SHOW JOBS / STOP JOB manage the session's streaming queries (SqlStopJob)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val stream = MemoryStream[Long](491, spark, None)
    val q = stream.toDF().writeStream.format("memory")
      .queryName("jobs_spec_q").outputMode("append").start()
    try {
      stream.addData(1L, 2L)
      val jobs = GraftSql.sql(spark, "SHOW JOBS").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      assert(jobs.exists(j => j._2 == "jobs_spec_q" && j._3 == "RUNNING"),
        s"missing job in ${jobs.toSeq}")
      // DRAIN processes pending input before the stop
      val out = GraftSql.sql(spark, "STOP JOB 'jobs_spec_q' WITH DRAIN").first()
      assert(out.getString(1) === "STOPPED")
      assert(!q.isActive)
      assert(spark.table("jobs_spec_q").count() === 2) // drained
      val e = intercept[RuntimeException](
        GraftSql.sql(spark, "STOP JOB 'jobs_spec_q'"))
      assert(e.getMessage.contains("no active job"))
    } finally if (q.isActive) q.stop()
  }

  test("EXPLAIN ESTIMATED_COST / JSON_EXECUTION_PLAN details (ExplainDetail enum)") {
    prep()
    val cost = GraftSql.sql(spark,
      "EXPLAIN ESTIMATED_COST SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey")
      .first().getString(0)
    assert(cost.contains("Statistics(sizeInBytes"), s"no per-node stats in:\n$cost")
    assert(cost.contains("== Physical Plan =="))
    val js = GraftSql.sql(spark,
      "EXPLAIN JSON_EXECUTION_PLAN SELECT n_name FROM nation WHERE n_regionkey = 1")
      .first().getString(0)
    assert(js.contains("== JSON Execution Plan =="))
    assert(js.contains("\"class\""), s"not a plan JSON:\n${js.take(200)}")
    // combined details, comma-separated like the reference
    val both = GraftSql.sql(spark,
      "EXPLAIN ESTIMATED_COST, CHANGELOG_MODE SELECT n_name FROM nation")
      .first().getString(0)
    assert(both.contains("== Changelog Mode ==") && both.contains("Statistics(sizeInBytes"))
  }

  test("EXPLAIN CHANGELOG_MODE surfaces inference decisions and adapters") {
    import spark.implicits._
    prep()
    val base = java.nio.file.Files.createTempDirectory("graft_exmode").toString
    Seq((1L, 1000L, "a", 10.0), (1L, 2000L, "b", 20.0))
      .toDF("user_id", "version", "status", "amount")
      .write.parquet(s"$base/ex_upsert")
    GraftSql.sql(spark,
      s"""CREATE TABLE ex_upsert (
         |  user_id BIGINT, version BIGINT, status VARCHAR(10), amount DOUBLE,
         |  PRIMARY KEY (user_id) NOT ENFORCED
         |) WITH ('connector' = 'filesystem', 'path' = '$base/ex_upsert',
         |        'format' = 'parquet', 'changelog-mode' = 'upsert',
         |        'version-by' = 'version')""".stripMargin)
    val out = GraftSql.sql(spark,
      """EXPLAIN CHANGELOG_MODE
        |SELECT status, count(*) AS cnt, sum(amount) AS total
        |FROM ex_upsert GROUP BY status""".stripMargin).first().getString(0)
    assert(out.contains("== Changelog Mode =="))
    assert(out.contains("changelogMode=[I,UA,D]"), s"upsert source mode missing in:\n$out")
    assert(out.contains("retract-derivation inserted"), s"adapter line missing in:\n$out")
    assert(out.contains("== Physical Plan =="))
    // EXPLAIN must stay side-effect free and detail-less EXPLAIN unchanged
    val plain = GraftSql.sql(spark,
      "EXPLAIN CHANGELOG_MODE SELECT n_name FROM nation").first().getString(0)
    assert(plain.contains("append-only pipeline"))
    // normalize-view path (calc shape) reports ChangelogNormalize
    val calc = GraftSql.sql(spark,
      "EXPLAIN CHANGELOG_MODE SELECT user_id, status FROM ex_upsert WHERE amount > 0")
      .first().getString(0)
    assert(calc.contains("retract-derivation") || calc.contains("ChangelogNormalize"),
      s"calc-shape adapter missing in:\n$calc")
  }

  test("STATEMENT SET: a ';' inside a string literal is not a statement boundary") {
    prep()
    val base = java.nio.file.Files.createTempDirectory("graft_stmtsemi").toString
    GraftSql.sql(spark,
      s"""CREATE TABLE sink_semi (tag VARCHAR(30), n_name VARCHAR(25))
         |WITH ('connector' = 'filesystem', 'path' = '$base/semi', 'format' = 'parquet')""".stripMargin)
    GraftSql.sql(spark,
      """EXECUTE STATEMENT SET BEGIN
        |  INSERT INTO sink_semi SELECT 'a;b' AS tag, n_name FROM nation WHERE n_nationkey < 2;
        |  INSERT INTO sink_semi SELECT concat('x;', 'y;z'), n_name FROM nation WHERE n_nationkey = 5;
        |END""".stripMargin)
    val rows = spark.table("sink_semi").collect()
    assert(rows.length === 3)
    assert(rows.map(_.getString(0)).toSet === Set("a;b", "x;y;z"))
  }

  test("bare multi-row variable measure takes the LAST mapped row (SQL:2016)") {
    prep()
    val df = GraftSql.sql(spark,
      """SELECT * FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  MEASURES V.event_id AS bare_v, LAST(V.event_id) AS last_v,
        |           FIRST(V.event_id) AS first_v
        |  PATTERN (V+ P)
        |  DEFINE V AS event_type = 'view', P AS event_type = 'purchase')""".stripMargin)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) == r.getLong(2)), "bare var must equal LAST")
    assert(rows.exists(r => r.getLong(1) != r.getLong(3)), "multi-row runs must exist")
  }

  test("MATCH_RECOGNIZE with alternation, WITHIN and SKIP TO NEXT ROW parses and runs") {
    prep()
    val df = GraftSql.sql(spark,
      """SELECT * FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES COUNT(A.*) AS n_actions, LAST(P.ts) AS purchase_ts
        |  AFTER MATCH SKIP TO NEXT ROW
        |  PATTERN ((A | B)+ P) WITHIN INTERVAL '1' HOUR
        |  DEFINE A AS event_type = 'click', B AS event_type = 'view',
        |         P AS event_type = 'purchase'
        |)""".stripMargin)
    assert(df.columns.toSeq === Seq("user_id", "n_actions", "purchase_ts"))
    assert(df.count() > 0)
  }

  test("module system: LOAD/UNLOAD MODULE, USE MODULES order decides " +
      "shadowed-name resolution, SHOW [FULL] MODULES") {
    def one(q: String) = GraftSql.sql(spark, q).collect()
    try {
      // default: graft first => Flink signature wins the shadow names
      assert(one("SHOW MODULES").map(_.getString(0)).toSeq === Seq("graft", "core"))
      assert(one("SELECT to_timestamp_ltz(0, 0) AS t")
        .head.getTimestamp(0).toInstant.toEpochMilli === 0L)
      // core first => the Spark builtin (string signature) wins
      one("USE MODULES core, graft")
      assert(one("SELECT to_timestamp_ltz('2024-01-02 03:04:05') AS t")
        .head.getTimestamp(0) != null)
      // graft names that shadow nothing stay resolvable either way
      assert(one("SELECT fingerprint64('x') AS f").head.getLong(0) ===
        one("SELECT fingerprint64('x') AS f").head.getLong(0))
      // unload graft: flink-only names unresolvable, builtins intact
      one("UNLOAD MODULE graft")
      val full = one("SHOW FULL MODULES").map(r => (r.getString(0), r.getBoolean(1)))
      assert(full.toSeq === Seq(("core", true)))
      intercept[Exception] { one("SELECT fingerprint64('x')") }
      assert(one("SELECT cot(1.0) AS c").head.getDouble(0) > 0.6) // builtin cot
      // reload appends graft to the END of the used order => core
      // still wins the shadows (the reference's LOAD append contract)
      one("LOAD MODULE graft")
      assert(one("SHOW MODULES").map(_.getString(0)).toSeq === Seq("core", "graft"))
      assert(one("SELECT fingerprint64('x') AS f").nonEmpty)
      assert(one("SELECT to_timestamp_ltz('2024-01-02 03:04:05') AS t")
        .head.getTimestamp(0) != null)
      intercept[Exception] { one("LOAD MODULE graft") }   // already loaded
      intercept[Exception] { one("UNLOAD MODULE core") }  // declared deviation
      intercept[Exception] { one("USE MODULES nosuch, core") }
    } finally one("USE MODULES graft, core") // restore default semantics
  }
}
