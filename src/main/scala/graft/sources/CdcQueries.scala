package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

import graft.Tables
import graft.sql.GraftSql

/** CDC-format driver queries: the events table replayed as
  * debezium-json / canal-json change streams (each event is the
  * user's new current row; users with `user_id % 7 = 0` end deleted),
  * declared through connector DDL and queried in plain SQL. The
  * oracle states keep-last-then-aggregate over the original events —
  * so the decode (+I/-U/+U/-D routing, canal's partial-old merge) AND
  * the downstream retract planning are hash-checked end to end.
  */
object CdcQueries {

  private def key(dir: String) = dir.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Microsecond timestamp format for fixture serialization — the
    * to_json/from_json default truncates to millis, which would
    * silently degrade the 'version-by' = 'ts,event_id' order (and
    * diverge from the full-precision oracle) on sub-millisecond data.
    */
  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
  private val tsOpts = Map("timestampFormat" -> TsFmt)

  private def eventsWithPrev(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("user_id"))))
      .withColumn("__prev", lag(struct(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value")), 1).over(w))
  }

  private def payload: Column =
    struct(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))

  /** events replayed as debezium envelopes: first event per user is
    * op c, later ones op u (before = previous version), and users
    * with user_id % 7 = 0 get a final op d. Written once per sf dir
    * behind a _SUCCESS marker.
    */
  private def debeziumFixture(s: SparkSession, dir: String): String = {
    val path = s"/tmp/graft_cdc_dbz/${key(dir)}/lines"
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      val ev = eventsWithPrev(s, dir)
      val cu = ev.select(to_json(struct(
        col("__prev").as("before"), payload.as("after"),
        when(col("__rn") === 1, lit("c")).otherwise(lit("u")).as("op")), tsOpts).as("value"))
      val dels = ev.filter(col("__rn") === col("__n") && col("user_id") % 7 === 0)
        .select(to_json(struct(payload.as("before"), lit("d").as("op")), tsOpts).as("value"))
      cu.unionByName(dels).write.mode("overwrite").text(path)
    }
    path
  }

  /** The partial-`old` map of a CDC update event: ONLY the changed
    * fields' previous values (ts/event_id always change; event_type/
    * value conditionally, with null-safe change detection — a
    * NULL<->value transition is a change too, or the decoder would
    * reconstruct a wrong before). Shared by the canal (array-of-maps)
    * and maxwell (single-map) fixtures.
    */
  private def oldMapOf: Column = {
    val emptyMap = map().cast(MapType(StringType, StringType))
    def ent(cond: Column, k: String, v: Column): Column =
      when(cond, map(lit(k), v)).otherwise(emptyMap)
    val prev = (f: String) => col("__prev").getField(f)
    map_concat(
      ent(lit(true), "ts", date_format(prev("ts"), TsFmt)),
      ent(lit(true), "event_id", prev("event_id").cast("string")),
      ent(!(prev("event_type") <=> col("event_type")), "event_type", prev("event_type")),
      ent(!(prev("value") <=> col("value")), "value", prev("value").cast("string")))
  }

  /** events replayed as canal envelopes: INSERT / UPDATE / DELETE
    * with `old` carrying ONLY the changed fields (user_id never
    * changes, so the decoder must copy it from `data`), plus one
    * CREATE DDL line the decoder must skip.
    */
  private def canalFixture(s: SparkSession, dir: String): String = {
    val path = s"/tmp/graft_cdc_canal/${key(dir)}/lines"
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      val oldMap = oldMapOf
      val ev = eventsWithPrev(s, dir)
      val ins = ev.filter(col("__rn") === 1).select(to_json(struct(
        array(payload).as("data"), lit("INSERT").as("type")), tsOpts).as("value"))
      val upd = ev.filter(col("__rn") > 1).select(to_json(struct(
        array(payload).as("data"), array(oldMap).as("old"),
        lit("UPDATE").as("type")), tsOpts).as("value"))
      val dels = ev.filter(col("__rn") === col("__n") && col("user_id") % 7 === 0)
        .select(to_json(struct(array(payload).as("data"),
          lit("DELETE").as("type")), tsOpts).as("value"))
      val ddl = s.createDataset(Seq("""{"data":null,"old":null,"type":"CREATE"}"""))(
        org.apache.spark.sql.Encoders.STRING).toDF("value")
      ins.unionByName(upd).unionByName(dels).unionByName(ddl)
        .write.mode("overwrite").text(path)
    }
    path
  }

  /** events replayed as maxwell envelopes: single-object data with
    * `old` carrying ONLY the changed fields' previous values — the
    * single-object twin of the canal partial-old merge.
    */
  private def maxwellFixture(s: SparkSession, dir: String): String = {
    val path = s"/tmp/graft_cdc_maxwell/${key(dir)}/lines"
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      val oldMap = oldMapOf
      val ev = eventsWithPrev(s, dir)
      val ins = ev.filter(col("__rn") === 1).select(to_json(struct(
        payload.as("data"), lit("insert").as("type")), tsOpts).as("value"))
      val upd = ev.filter(col("__rn") > 1).select(to_json(struct(
        payload.as("data"), oldMap.as("old"),
        lit("update").as("type")), tsOpts).as("value"))
      val dels = ev.filter(col("__rn") === col("__n") && col("user_id") % 7 === 0)
        .select(to_json(struct(payload.as("data"),
          lit("delete").as("type")), tsOpts).as("value"))
      ins.unionByName(upd).unionByName(dels).write.mode("overwrite").text(path)
    }
    path
  }

  /** events replayed as GoldenGate envelopes: before/after images
    * with I/U/D op_type — the ogg twin of the debezium fixture.
    */
  private def oggFixture(s: SparkSession, dir: String): String = {
    val path = s"/tmp/graft_cdc_ogg/${key(dir)}/lines"
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      val ev = eventsWithPrev(s, dir)
      val cu = ev.select(to_json(struct(
        col("__prev").as("before"), payload.as("after"),
        when(col("__rn") === 1, lit("I")).otherwise(lit("U")).as("op_type")), tsOpts).as("value"))
      val dels = ev.filter(col("__rn") === col("__n") && col("user_id") % 7 === 0)
        .select(to_json(struct(payload.as("before"), lit("D").as("op_type")), tsOpts).as("value"))
      cu.unionByName(dels).write.mode("overwrite").text(path)
    }
    path
  }

  private def declare(s: SparkSession, name: String, fmt: String, path: String): Unit =
    GraftSql.sql(s,
      s"""CREATE TABLE $name (
         |  user_id BIGINT, ts TIMESTAMP(3), event_id BIGINT,
         |  event_type VARCHAR(20), value DOUBLE,
         |  PRIMARY KEY (user_id) NOT ENFORCED
         |) WITH ('connector' = 'filesystem', 'path' = '$path',
         |        'format' = '$fmt', 'version-by' = 'ts,event_id',
         |        '$fmt.timestamp-format' = '$TsFmt')""".stripMargin)

  /** GROUP BY over the debezium stream: superseded versions and
    * deleted users must not count — plain SQL, adapters planned by
    * the front door (CSource in Retract mode feeding the signed
    * aggregate).
    */
  def cdcDebezium(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    declare(s, "cdc_user_state", "debezium-json", debeziumFixture(s, dir))
    GraftSql.sql(s,
      """SELECT event_type, count(*) AS cnt, sum(value) AS sum_value
        |FROM cdc_user_state GROUP BY event_type""".stripMargin)
  }

  /** AVG/MAX over the canal stream: exercises the partial-old merge
    * (before-images reconstructed from changed fields) and the
    * value-multiset retract state behind the minmax planning.
    */
  def cdcCanal(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    declare(s, "cdc_canal_state", "canal-json", canalFixture(s, dir))
    GraftSql.sql(s,
      """SELECT event_type, count(*) AS cnt, avg(value) AS avg_value,
        |  max(value) AS max_value
        |FROM cdc_canal_state GROUP BY event_type""".stripMargin)
  }

  /** Non-aggregate shape over the debezium stream: the front door
    * substitutes a ChangelogNormalize view (keys + version-by from
    * the DDL), so the query reads current state — deletes removed,
    * the delete's version tie broken by rowkind.
    */
  def cdcNormalize(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    declare(s, "cdc_user_state", "debezium-json", debeziumFixture(s, dir))
    GraftSql.sql(s,
      """SELECT user_id, event_id, event_type, value
        |FROM cdc_user_state WHERE event_type = 'purchase'""".stripMargin)
  }

  /** MIN/SUM over the maxwell stream: the single-object partial-old
    * merge reconstructs before-images that the signed aggregate and
    * the value-multiset min state must net out exactly.
    */
  def cdcMaxwell(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    declare(s, "cdc_maxwell_state", "maxwell-json", maxwellFixture(s, dir))
    GraftSql.sql(s,
      """SELECT event_type, count(*) AS cnt, min(value) AS min_value,
        |  sum(value) AS sum_value
        |FROM cdc_maxwell_state GROUP BY event_type""".stripMargin)
  }

  /** Non-aggregate shape over the ogg stream: ChangelogNormalize view
    * over I/U/D ops — current state with deletes removed.
    */
  def cdcOgg(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    declare(s, "cdc_ogg_state", "ogg-json", oggFixture(s, dir))
    GraftSql.sql(s,
      """SELECT user_id, event_id, event_type, value
        |FROM cdc_ogg_state WHERE value > 100""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cdc_debezium"  -> (cdcDebezium _),
    "q_cdc_canal"     -> (cdcCanal _),
    "q_cdc_maxwell"   -> (cdcMaxwell _),
    "q_cdc_ogg"       -> (cdcOgg _),
    "q_cdc_normalize" -> (cdcNormalize _))

  // keep-last per user minus deleted users, then aggregate — what the
  // decoded changelog must net out to
  val oracle: Map[String, String] = Map(
    "q_cdc_debezium" ->
      """SELECT event_type, count(*) AS cnt, sum(value) AS sum_value
        |FROM (SELECT user_id, event_type, value, row_number() OVER (
        |        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 AND user_id % 7 <> 0 GROUP BY event_type""".stripMargin,
    "q_cdc_canal" ->
      """SELECT event_type, count(*) AS cnt, avg(value) AS avg_value,
        |  max(value) AS max_value
        |FROM (SELECT user_id, event_type, value, row_number() OVER (
        |        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 AND user_id % 7 <> 0 GROUP BY event_type""".stripMargin,
    "q_cdc_maxwell" ->
      """SELECT event_type, count(*) AS cnt, min(value) AS min_value,
        |  sum(value) AS sum_value
        |FROM (SELECT user_id, event_type, value, row_number() OVER (
        |        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 AND user_id % 7 <> 0 GROUP BY event_type""".stripMargin,
    "q_cdc_ogg" ->
      """SELECT user_id, event_id, event_type, value
        |FROM (SELECT user_id, event_id, event_type, value, row_number() OVER (
        |        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 AND user_id % 7 <> 0 AND value > 100""".stripMargin,
    "q_cdc_normalize" ->
      """SELECT user_id, event_id, event_type, value
        |FROM (SELECT user_id, event_id, event_type, value, row_number() OVER (
        |        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 AND user_id % 7 <> 0 AND event_type = 'purchase'""".stripMargin)
}
