package graft.changelog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Changelog-tier queries. The events table is interpreted as an
  * upsert history keyed by user_id (each event = the user's new
  * current row). Semantic gate: retract-aggregating the DERIVED
  * changelog must equal directly aggregating the FINAL state — which
  * is exactly what the DuckDB oracle computes, so the oracle checks
  * the retraction algebra end-to-end.
  */
object ChangelogQueries {

  private def base(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))

  def changelogAgg(s: SparkSession, dir: String): DataFrame = {
    val log = Changelog.fromUpserts(base(s, dir),
      keys = Seq("user_id"), orderCols = Seq(col("ts"), col("event_id")))
    Changelog.aggregateRetract(log, Seq("event_type"), Seq("value"))
  }

  def changelogNormalize(s: SparkSession, dir: String): DataFrame = {
    val log = Changelog.fromUpserts(base(s, dir),
      keys = Seq("user_id"), orderCols = Seq(col("ts"), col("event_id")))
    Changelog.normalize(log, Seq("user_id"), Seq(col("ts"), col("event_id")))
  }

  /** Max/min under retraction: the derived changelog (with its -U
    * rows) must yield the same max/min as the final state — the batch
    * twin of MaxWithRetractAggFunction (a deleted max falls back to
    * the next live value).
    */
  def changelogMaxRetract(s: SparkSession, dir: String): DataFrame = {
    val log = Changelog.fromUpserts(base(s, dir),
      keys = Seq("user_id"), orderCols = Seq(col("ts"), col("event_id")))
    Changelog.aggregateRetractMinMax(log, Seq("event_type"), "value")
  }

  /** ListAgg under retraction: the per-type list of live user_ids —
    * retracted users must vanish from the list, moved users must
    * appear under their final type only.
    */
  def changelogListAgg(s: SparkSession, dir: String): DataFrame = {
    val log = Changelog.fromUpserts(base(s, dir),
      keys = Seq("user_id"), orderCols = Seq(col("ts"), col("event_id")))
    Changelog.aggregateRetractListAgg(log, Seq("event_type"), "user_id")
  }

  /** NOT EXISTS over a live changelog, run through the dedicated
    * semi/anti transition machine (StreamingSemiAntiJoinOperator):
    * customers with no CURRENT purchase — users toggle in and out of
    * the match set as their upsert history replays (+I purchase
    * grows it, -U purchase shrinks it), so the netted operator output
    * exercises every emit/retract path; the oracle states the final
    * relation directly (NOT EXISTS on last-event-is-purchase).
    */
  def changelogAntiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.streaming.SemiAntiJoin
    import graft.streaming.SemiAntiJoin.SemiAntiEvent
    val cust = Tables.load(s, dir, "customer")
    // left: every customer, plain inserts, before all right traffic
    val left = cust.select(
      col("c_custkey").as("key"), lit(0).as("side"),
      lit(Changelog.Insert).as("kind"), col("c_custkey").as("id"),
      lit(Long.MinValue).as("seq")).as[SemiAntiEvent]
    // right: the purchase slice of the per-user upsert changelog
    // (seq from millis + event_id: unique per row at test scales)
    val log = Changelog.fromUpserts(base(s, dir),
      keys = Seq("user_id"), orderCols = Seq(col("ts"), col("event_id")))
    val right = log.filter(col("event_type") === "purchase").select(
      col("user_id").as("key"), lit(1).as("side"),
      col(Changelog.RowKindCol).as("kind"), lit(0L).as("id"),
      (unix_millis(col("ts")) * 1000000L + col("event_id") % 1000000L).as("seq"))
      .as[SemiAntiEvent]
    SemiAntiJoin.batchNet(anti = true, left.unionByName(right))
      .join(cust, col("id") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_changelog_antijoin"   -> (changelogAntiJoin _),
    "q_changelog_agg"        -> (changelogAgg _),
    "q_changelog_normalize"  -> (changelogNormalize _),
    "q_changelog_maxretract" -> (changelogMaxRetract _),
    "q_changelog_listagg"    -> (changelogListAgg _))

  val oracle: Map[String, String] = Map(
    // the anti-join machine's netted output == NOT EXISTS on final state
    "q_changelog_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM (
        |    SELECT user_id, event_type,
        |      row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events) e
        |  WHERE rn = 1 AND e.user_id = c_custkey
        |    AND e.event_type = 'purchase')""".stripMargin,
    // retract-agg over the changelog == aggregate of final state
    "q_changelog_agg" ->
      """SELECT event_type, count(*) AS cnt, sum(value) AS sum_value
        |FROM (SELECT user_id, event_type, value,
        |        row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1 GROUP BY event_type""".stripMargin,
    "q_changelog_normalize" ->
      """SELECT user_id, ts, event_id, event_type, value
        |FROM (SELECT user_id, ts, event_id, event_type, value,
        |        row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1""".stripMargin,
    "q_changelog_maxretract" ->
      """SELECT event_type, count(*) AS cnt, sum(value) AS sum_value,
        |  max(value) AS max_value, min(value) AS min_value
        |FROM (SELECT user_id, event_type, value,
        |        row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1 GROUP BY event_type""".stripMargin,
    "q_changelog_listagg" ->
      """SELECT event_type,
        |  string_agg(user_id::VARCHAR, ',' ORDER BY user_id) AS listagg_user_id
        |FROM (SELECT user_id, event_type,
        |        row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1 GROUP BY event_type""".stripMargin)
}
