package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Window table-valued functions and time joins, run in batch mode
  * (SURVEY.md §2.5, §2.3 streaming rows): TUMBLE / HOP / CUMULATE
  * (StreamExecWindowTableFunction, SliceAssigners.java:61,77,94),
  * SESSION (FlinkSqlOperatorTable.java:984), interval join
  * (StreamExecIntervalJoin.java:82) and temporal as-of join
  * (StreamExecTemporalJoin.java:77). The same plans run as
  * Structured Streaming with `readStream` + `withWatermark` —
  * see graft.streaming.
  *
  * Scale: tumble/hop/cumulate are single-shuffle aggregations on
  * (window, key); hop/cumulate multiply rows by their slice count
  * BEFORE the partial aggregate, so the shuffle still carries only
  * group rows. Session windows shuffle once on the session key.
  */
object TvfQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** TUMBLE(ts, 1 hour) per event_type. */
  def tumble(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("wstart"), col("w.end").as("wend"),
        col("event_type"), col("n"), col("sum_value"))

  /** HOP(ts, slide 30 min, size 1 hour) per event_type. */
  def hop(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("wstart"), col("w.end").as("wend"),
        col("event_type"), col("n"), col("sum_value"))

  /** CUMULATE(ts, step 15 min, max 1 hour) — no Spark native: an
    * event at slice i of its hour belongs to every cumulative window
    * ending at slice j > i (SliceAssigners.java:94's expanding
    * windows). Implemented as an explode over the slice indices the
    * row participates in, then a plain hash aggregate.
    */
  def cumulate(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("ts"), col("value"), date_trunc("hour", col("ts")).as("wstart"))
      .withColumn("slice",
        floor((unix_timestamp(col("ts")) - unix_timestamp(col("wstart"))) / 900).cast("int"))
      .select(col("wstart"), col("value"),
        explode(sequence(col("slice") + 1, lit(4))).as("j"))
      .withColumn("wend", expr("wstart + make_interval(0, 0, 0, 0, 0, j * 15, 0)"))
      .groupBy(col("wstart"), col("wend"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** SESSION(ts, gap 10 min) per user (session_window is native since
    * Spark 3.2; merge semantics match the reference's session
    * assigner: a gap >= 10 min starts a new session).
    */
  def session(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("wstart"), col("w.end").as("wend"),
        col("user_id"), col("n"), col("sum_value"))

  /** Interval join: views within [purchase.ts - 10 min, purchase.ts]
    * for the same user (TimeIntervalJoin.java's bounded time-range
    * condition). Planned as an equi join on user_id with the range
    * as a residual predicate — no row explosion beyond true matches.
    */
  def intervalJoin(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("ts").as("pts"))
    val v = e.filter(col("event_type") === "view")
      .select(col("event_id").as("vid"), col("user_id").as("v_user"), col("ts").as("vts"))
    p.join(v,
        col("user_id") === col("v_user") &&
        col("vts") >= col("pts") - expr("INTERVAL '10' MINUTE") &&
        col("vts") <= col("pts"))
      .select(col("pid"), col("vid"))
  }

  /** LEFT OUTER interval join — purchases with no view inside the
    * window still emit, null-padded (the reference's
    * IntervalJoinOperator outer emission, TimeIntervalJoin.java).
    * Same equi-key hash join with the range residual; the join type
    * alone changes. A narrow tighter window (2 minutes) so unmatched
    * rows actually exist at gate scale.
    */
  def intervalJoinLeft(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("ts").as("pts"))
    val v = e.filter(col("event_type") === "view")
      .select(col("event_id").as("vid"), col("user_id").as("v_user"), col("ts").as("vts"))
    p.join(v,
        col("user_id") === col("v_user") &&
        col("vts") >= col("pts") - expr("INTERVAL '2' MINUTE") &&
        col("vts") <= col("pts"), "left")
      .select(col("pid"), col("vid"))
  }

  /** Temporal as-of join: latest click at or before each purchase per
    * user — see [[AsOfJoin]] for the sort-based algorithm.
    */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val p = e.filter(col("event_type") === "purchase")
    val c = e.filter(col("event_type") === "click")
    AsOfJoin.asOf(
        probe = p, build = c, key = "user_id", time = "ts",
        probeCols = Map("event_id" -> "pid"),
        buildCols = Map("event_id" -> "cid", "ts" -> "cts"))
      .select(col("pid"), col("__k").as("user_id"), col("__t").as("pts"),
        col("cid"), col("cts"))
  }

  /** The same as-of join through the native Catalyst operator
    * (graft.plans.AsOfJoinNative: logical node + strategy +
    * AsOfJoinExec with declared distribution/ordering) — one merge
    * pass per co-partitioned pair instead of the composed
    * window-over-union plan.
    */
  def asofJoinNative(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("ts").as("pts"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("b_user"), col("event_id").as("cid"), col("ts").as("cts"))
    graft.plans.AsOfJoinNative.asOf(p, c, "user_id", "pts", "b_user", "cts")
      .select(col("pid"), col("user_id"), col("pts"), col("cid"), col("cts"))
  }

  /** MATCH_RECOGNIZE-lite (StreamExecMatch.java:59): the adjacency
    * pattern `view purchase` per user in event-time order, expressed
    * with lead() — the batch shape of a 2-state NFA.
    */
  def cepPattern(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        lead(col("event_type"), 1).over(w).as("nxt_type"),
        lead(col("event_id"), 1).over(w).as("nxt_id"))
      .filter(col("event_type") === "view" && col("nxt_type") === "purchase")
      .select(col("user_id"), col("event_id").as("view_id"), col("nxt_id").as("purchase_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tvf_tumble"    -> (tumble _),
    "q_tvf_hop"       -> (hop _),
    "q_tvf_cumulate"  -> (cumulate _),
    "q_tvf_session"   -> (session _),
    "q_interval_join" -> (intervalJoin _),
    "q_interval_join_left" -> (intervalJoinLeft _),
    "q_asof_join"     -> (asofJoin _),
    "q_asof_native"   -> (asofJoinNative _),
    "q_cep_pattern"   -> (cepPattern _))

  val oracle: Map[String, String] = Map(
    "q_tvf_tumble" ->
      """SELECT date_trunc('hour', ts) AS wstart,
        |  date_trunc('hour', ts) + INTERVAL '1 hour' AS wend,
        |  event_type, count(*) AS n, sum(value) AS sum_value
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    "q_tvf_hop" ->
      """SELECT time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes' AS wstart,
        |  time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes' + INTERVAL '1 hour' AS wend,
        |  event_type, count(*) AS n, sum(value) AS sum_value
        |FROM events CROSS JOIN (VALUES (0), (1)) AS o(k)
        |GROUP BY 1, 2, 3""".stripMargin,
    "q_tvf_cumulate" ->
      """SELECT date_trunc('hour', ts) AS wstart,
        |  date_trunc('hour', ts) + j * INTERVAL '15 minutes' AS wend,
        |  count(*) AS n, sum(value) AS sum_value
        |FROM events CROSS JOIN (VALUES (1), (2), (3), (4)) AS o(j)
        |WHERE ts < date_trunc('hour', ts) + j * INTERVAL '15 minutes'
        |GROUP BY 1, 2""".stripMargin,
    "q_tvf_session" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w >= INTERVAL '10 minutes'
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT min(ts) AS wstart, max(ts) + INTERVAL '10 minutes' AS wend,
        |  user_id, count(*) AS n, sum(value) AS sum_value
        |FROM sessions GROUP BY user_id, sid""".stripMargin,
    "q_interval_join" ->
      """SELECT p.event_id AS pid, v.event_id AS vid
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id
        | AND v.ts >= p.ts - INTERVAL '10 minutes' AND v.ts <= p.ts""".stripMargin,
    "q_interval_join_left" ->
      """SELECT p.event_id AS pid, v.event_id AS vid
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id
        | AND v.ts >= p.ts - INTERVAL '2 minutes' AND v.ts <= p.ts""".stripMargin,
    "q_asof_join" ->
      """SELECT p.event_id AS pid, p.user_id, p.ts AS pts,
        |  c.event_id AS cid, c.ts AS cts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,
    "q_asof_native" ->
      """SELECT p.event_id AS pid, p.user_id, p.ts AS pts,
        |  c.event_id AS cid, c.ts AS cts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,
    "q_cep_pattern" ->
      """SELECT user_id, event_id AS view_id, nxt_id AS purchase_id FROM (
        |  SELECT user_id, event_id, event_type,
        |    lead(event_type, 1) OVER w AS nxt_type,
        |    lead(event_id, 1) OVER w AS nxt_id
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |WHERE event_type = 'view' AND nxt_type = 'purchase'""".stripMargin)
}
