package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Driver queries exercised through the SQL front door — the text a
  * user of the reference would actually type (Flink SQL dialect),
  * parsed by [[GraftSql]]/[[MatchRecognizeSql]] and executed on the
  * same operators the DSL queries use. Each has a DuckDB oracle, so
  * the SQL path itself is hash-checked, not just the operators.
  */
object SqlQueries {

  /** One-time parquet snapshot of the events table (selected columns)
    * under /tmp, keyed by the sanitized sf-dir path (collision-free,
    * unlike a hashCode). Reuse is gated on the `_SUCCESS` marker so a
    * crashed partial write is redone rather than served forever.
    */
  private def eventsHistoryOnce(s: SparkSession, dir: String, tag: String,
      cols: Seq[String]): String = {
    val key = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    val path = s"/tmp/graft_$tag/$key/hist"
    if (!new java.io.File(path, "_SUCCESS").exists())
      Tables.load(s, dir, "events")
        .selectExpr(cols: _*)
        .write.mode("overwrite").parquet(path)
    path
  }

  /** Declare an upsert table over `path` keyed by user_id and
    * versioned by (ts, event_id) — the shared DDL scaffold of the
    * temporal-join and upsert-agg SQL queries.
    */
  private def declareUpsertTable(s: SparkSession, name: String,
      columnsDdl: String, path: String): Unit =
    GraftSql.sql(s,
      s"""CREATE TABLE $name (
         |  $columnsDdl,
         |  PRIMARY KEY (user_id) NOT ENFORCED
         |) WITH ('connector' = 'filesystem', 'path' = '$path',
         |        'format' = 'parquet', 'changelog-mode' = 'upsert',
         |        'version-by' = 'ts,event_id')""".stripMargin)

  /** MATCH_RECOGNIZE in SQL:2016 syntax — same semantics as
    * q_cep_quantified (PATTERN (V+ P), greedy, skip past last row).
    */
  def matchRecognizeSql(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    GraftSql.sql(s,
      """SELECT * FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES
        |    COUNT(V.*) AS n_views,
        |    FIRST(V.event_id) AS first_view,
        |    P.event_id AS purchase_id
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (V+ P)
        |  DEFINE
        |    V AS event_type = 'view',
        |    P AS event_type = 'purchase'
        |) AS mr""".stripMargin)
  }

  /** CLASSIFIER() + MATCH_NUMBER() measures (FlinkSqlOperatorTable's
    * niladic row-pattern functions): a view followed by either a
    * purchase (B) or an error (C) — the alternation makes
    * CLASSIFIER() carry real information (which branch matched the
    * last row), and MATCH_NUMBER() numbers matches sequentially per
    * partition. Event types are disjoint, so fixed-length matches
    * cannot overlap and the oracle can enumerate them with a
    * self-join on adjacent row numbers.
    */
  def cepClassifierSql(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    GraftSql.sql(s,
      """SELECT * FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES
        |    MATCH_NUMBER() AS mn,
        |    CLASSIFIER() AS cls,
        |    A.event_id AS start_id,
        |    B.event_id AS b_id,
        |    C.event_id AS c_id
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A (B | C))
        |  DEFINE
        |    A AS event_type = 'view',
        |    B AS event_type = 'purchase',
        |    C AS event_type = 'error'
        |) AS mr""".stripMargin)
  }

  /** SESSION window TVF in SQL — rewritten onto Spark's
    * session_window grouping by the pre-parser.
    */
  def sessionSql(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    GraftSql.sql(s,
      """SELECT window_start AS wstart, window_end AS wend, user_id,
        |  count(*) AS n, sum(value) AS sum_value
        |FROM TABLE(SESSION(TABLE events PARTITION BY user_id, DESCRIPTOR(ts), INTERVAL '10' MINUTE))
        |GROUP BY window_start, window_end, user_id""".stripMargin)
  }

  /** TUMBLE TVF with the optional offset argument — windows shift by
    * 20 minutes off the hour grid (Spark `window()`'s startTime;
    * the reference's `TUMBLE(..., size, offset)` 4th operand).
    */
  def tumbleOffsetSql(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    GraftSql.sql(s,
      """SELECT window_start AS wstart, window_end AS wend, event_type,
        |  count(*) AS n, sum(value) AS sum_value
        |FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR, INTERVAL '20' MINUTE))
        |GROUP BY window_start, window_end, event_type""".stripMargin)
  }

  /** Event-time temporal join in SQL (`FOR SYSTEM_TIME AS OF p.ts`
    * against a DDL-declared versioned table): each purchase reads the
    * user's state version valid AT its event time — rewritten by
    * [[GraftSql.rewriteTemporalJoins]] into the SCD-2 interval join,
    * oracle-checked against DuckDB's lead-window formulation.
    */
  def temporalJoinSql(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    // the version table: the full event history per user, versioned
    // by (ts, event_id) — written once per sf dir
    val path = eventsHistoryOnce(s, dir, "tempjoin",
      Seq("user_id", "ts", "event_id", "value"))
    declareUpsertTable(s, "user_versions",
      "user_id BIGINT, ts TIMESTAMP(3), event_id BIGINT, value DOUBLE", path)
    GraftSql.sql(s,
      """SELECT p.event_id, p.ts, v.event_id AS state_event, v.value AS state_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN user_versions FOR SYSTEM_TIME AS OF p.ts AS v
        |  ON v.user_id = p.user_id""".stripMargin)
  }

  /** Plain GROUP BY with COUNT/AVG/MAX/MIN over a DDL-declared upsert
    * table: [[UpsertSqlInference]] plans retract-derivation plus the
    * value-multiset max/min state (MaxWithRetractAggFunction
    * semantics) with no DSL calls — superseded versions of a user's
    * row must not inflate any of the aggregates. The oracle states
    * current-state-then-aggregate directly.
    */
  def upsertAggSql(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    // upsert history: every event is the user's new current row,
    // versioned by (ts, event_id) — written once per sf dir
    val path = eventsHistoryOnce(s, dir, "upsertagg",
      Seq("user_id", "ts", "event_id", "event_type", "value"))
    declareUpsertTable(s, "user_state_hist",
      "user_id BIGINT, ts TIMESTAMP(3), event_id BIGINT,\n  event_type VARCHAR(20), value DOUBLE",
      path)
    GraftSql.sql(s,
      """SELECT event_type, count(*) AS cnt, avg(value) AS avg_value,
        |  max(value) AS max_value, min(value) AS min_value
        |FROM user_state_hist GROUP BY event_type""".stripMargin)
  }

  /** Window Top-N (the reference's canonical TVF follow-up: window
    * agg → ROW_NUMBER over (window_start, window_end) → rank filter,
    * WindowRankOperator semantics): top event types per hour by
    * count, ties broken deterministically by name.
    */
  def windowTopnSql(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    GraftSql.sql(s,
      """SELECT window_start, window_end, event_type, cnt, rn
        |FROM (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY window_start, window_end
        |    ORDER BY cnt DESC, event_type) AS rn
        |  FROM (
        |    SELECT window_start, window_end, event_type, count(*) AS cnt
        |    FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        |    GROUP BY window_start, window_end, event_type))
        |WHERE rn <= 3""".stripMargin)
  }

  /** Window join (two windowed relations equi-joined on window bounds
    * + key, WindowJoinOperator semantics): per hour and user, join
    * purchase counts with view counts — two TVF occurrences in one
    * statement exercise repeated splicing.
    */
  def windowJoinSql(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    GraftSql.sql(s,
      """SELECT p.window_start, p.window_end, p.user_id,
        |  p.n_purchases, v.n_views
        |FROM (SELECT window_start, window_end, user_id, count(*) AS n_purchases
        |      FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        |      WHERE event_type = 'purchase'
        |      GROUP BY window_start, window_end, user_id) p
        |JOIN (SELECT window_start, window_end, user_id, count(*) AS n_views
        |      FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        |      WHERE event_type = 'view'
        |      GROUP BY window_start, window_end, user_id) v
        |ON p.window_start = v.window_start AND p.window_end = v.window_end
        |  AND p.user_id = v.user_id""".stripMargin)
  }

  /** Window deduplication (ROW_NUMBER = 1 per (window, key) ordered
    * by time, WindowDeduplicateOperator semantics): each user's first
    * event per hour.
    */
  def windowDedupSql(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    GraftSql.sql(s,
      """SELECT window_start, window_end, user_id, event_id, ts
        |FROM (SELECT *, ROW_NUMBER() OVER (
        |        PARTITION BY window_start, window_end, user_id
        |        ORDER BY ts, event_id) AS rn
        |      FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR)))
        |WHERE rn = 1""".stripMargin)
  }

  /** Correlate in SQL — the reference's table-function join
    * (`FROM t, LATERAL TABLE(f(x)) AS T(c)`), rewritten to LATERAL
    * VIEW by the front door. split() is not a Spark generator, so
    * the rewrite wraps it in explode — the UNNEST-equivalent path.
    */
  def lateralTableSql(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    GraftSql.sql(s,
      """SELECT doc_id, word, n_chars
        |FROM documents, LATERAL TABLE(split(text, ' ')) AS T(word)
        |WHERE lang = 'en'""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_lateral"         -> (lateralTableSql _),
    "q_sql_match_recognize" -> (matchRecognizeSql _),
    "q_cep_classifier"      -> (cepClassifierSql _),
    "q_sql_temporal_join"   -> (temporalJoinSql _),
    "q_sql_upsert_agg"      -> (upsertAggSql _),
    "q_sql_tumble_offset"   -> (tumbleOffsetSql _),
    "q_sql_window_topn"     -> (windowTopnSql _),
    "q_sql_window_join"     -> (windowJoinSql _),
    "q_sql_window_dedup"    -> (windowDedupSql _),
    "q_sql_session"         -> (sessionSql _))

  val oracle: Map[String, String] = Map(
    "q_sql_lateral" ->
      """SELECT doc_id, unnest(string_split(text, ' ')) AS word, n_chars
        |FROM documents WHERE lang = 'en'""".stripMargin,
    "q_sql_window_topn" ->
      """SELECT window_start, window_end, event_type, cnt, rn
        |FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY window_start, window_end
        |    ORDER BY cnt DESC, event_type) AS rn
        |  FROM (
        |    SELECT date_trunc('hour', ts) AS window_start,
        |      date_trunc('hour', ts) + INTERVAL '1 hour' AS window_end,
        |      event_type, count(*)::BIGINT AS cnt
        |    FROM events GROUP BY 1, 2, 3))
        |WHERE rn <= 3""".stripMargin,
    "q_sql_window_join" ->
      """SELECT p.window_start, p.window_end, p.user_id,
        |  p.n_purchases, v.n_views
        |FROM (SELECT date_trunc('hour', ts) AS window_start,
        |        date_trunc('hour', ts) + INTERVAL '1 hour' AS window_end,
        |        user_id, count(*)::BIGINT AS n_purchases
        |      FROM events WHERE event_type = 'purchase'
        |      GROUP BY 1, 2, 3) p
        |JOIN (SELECT date_trunc('hour', ts) AS window_start,
        |        user_id, count(*)::BIGINT AS n_views
        |      FROM events WHERE event_type = 'view'
        |      GROUP BY 1, 2) v
        |ON p.window_start = v.window_start AND p.user_id = v.user_id""".stripMargin,
    "q_sql_window_dedup" ->
      """SELECT window_start, window_end, user_id, event_id, ts
        |FROM (SELECT date_trunc('hour', ts) AS window_start,
        |        date_trunc('hour', ts) + INTERVAL '1 hour' AS window_end,
        |        user_id, event_id, ts, row_number() OVER (
        |          PARTITION BY date_trunc('hour', ts), user_id
        |          ORDER BY ts, event_id) AS rn
        |      FROM events)
        |WHERE rn = 1""".stripMargin,
    "q_sql_tumble_offset" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts, INTERVAL '20 minutes') AS wstart,
        |  time_bucket(INTERVAL '1 hour', ts, INTERVAL '20 minutes')
        |    + INTERVAL '1 hour' AS wend,
        |  event_type, count(*) AS n, sum(value) AS sum_value
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    // keep-last current state per user, then aggregate — what the
    // retract pipeline must net out to
    "q_sql_upsert_agg" ->
      """WITH cur AS (
        |  SELECT event_type, value FROM (
        |    SELECT event_type, value, row_number() OVER (
        |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events) t WHERE rn = 1)
        |SELECT event_type, count(*) AS cnt, avg(value) AS avg_value,
        |  max(value) AS max_value, min(value) AS min_value
        |FROM cur GROUP BY event_type""".stripMargin,
    // SCD-2 interval formulation of the event-time temporal join:
    // the version valid AT the probe's timestamp
    "q_sql_temporal_join" ->
      """WITH v AS (SELECT user_id, ts, event_id, value,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM events)
        |SELECT p.event_id, p.ts, v.event_id AS state_event, v.value AS state_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN v ON v.user_id = p.user_id AND v.ts <= p.ts
        |  AND (v.valid_to IS NULL OR p.ts < v.valid_to)""".stripMargin,
    // adjacent-pair enumeration: disjoint event types mean a
    // length-2 match can never overlap another, so every (view,
    // purchase|error) adjacency IS a match under any skip strategy;
    // MATCH_NUMBER() = sequential numbering per partition
    "q_cep_classifier" ->
      """WITH ordered AS (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |pairs AS (
        |  SELECT a.user_id, a.event_id AS start_id,
        |    CASE WHEN b.event_type = 'purchase' THEN 'B' ELSE 'C' END AS cls,
        |    CASE WHEN b.event_type = 'purchase' THEN b.event_id END AS b_id,
        |    CASE WHEN b.event_type = 'error' THEN b.event_id END AS c_id,
        |    a.rn
        |  FROM ordered a JOIN ordered b
        |    ON b.user_id = a.user_id AND b.rn = a.rn + 1
        |  WHERE a.event_type = 'view' AND b.event_type IN ('purchase', 'error'))
        |SELECT user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY rn)::BIGINT AS mn,
        |  cls, start_id, b_id, c_id
        |FROM pairs""".stripMargin,
    // identical gaps-and-islands formulation as the DSL twin queries —
    // the SQL text must land on the same result set
    "q_sql_match_recognize" ->
      """WITH ordered AS (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER w AS rn,
        |    CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |isl AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY rn
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM ordered),
        |v AS (SELECT user_id, island, count(*) AS n_views,
        |        arg_min(event_id, rn) AS first_view, max(rn) AS last_rn
        |      FROM isl WHERE event_type = 'view' GROUP BY user_id, island),
        |p AS (SELECT user_id, event_id AS purchase_id, rn FROM isl
        |      WHERE event_type = 'purchase')
        |SELECT p.user_id, v.n_views, v.first_view, p.purchase_id
        |FROM p JOIN v ON v.user_id = p.user_id AND v.last_rn = p.rn - 1""".stripMargin,
    "q_sql_session" ->
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
        |FROM sessions GROUP BY user_id, sid""".stripMargin)
}
