package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Product/event analytics over the event stream — the conversion
  * funnel, cohort retention, and robust outlier batteries every
  * warehouse's behavioral layer ships (the reference expresses these
  * as SQL-surface window/agg pipelines over its event tables rather
  * than dedicated exec nodes; the funnel-step semantics follow the
  * windowed-funnel operator popularized by ClickHouse/Amplitude, the
  * robust z-score is Iglewicz & Hoaglin 1993).
  *
  * Scale shapes, in order: the funnel is ONE user-partitioned
  * sort-window pass (three layered running-mins reuse a single
  * exchange+sort — Spark plans identical window specs into one
  * Window chain) followed by a user-keyed max and a tiny depth
  * count; cohort retention is one user-keyed first-touch aggregate
  * re-joined to the stream (AQE broadcasts the user-sized side at
  * gate scale, a plain user-keyed shuffle join beyond the threshold
  * — both correct) and one (cohort, week)-keyed count; the MAD
  * battery is two percentile aggregates whose outputs are
  * |event_type|-row broadcasts, so the corpus crosses the wire only
  * for its own scan.
  */
object EventAnalytics {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Windowed conversion funnel (first-touch anchored): for the step
    * sequence view → click → purchase, the deepest stage each user
    * reaches where every later step happens strictly after the
    * previous one and inside `windowHours` of the user's FIRST
    * stage-1 event. First-touch anchoring (the earliest view opens
    * the only window) is the deterministic variant — "any chain"
    * funnels are order-sensitive under ties; here every per-row
    * value is a running min over (ts, event_id) order, so the result
    * is a pure function of the event set.
    *
    * One user-partitioned sort carries all three layers: s1 is the
    * running min of stage-1 times, s2 the running min of stage-2
    * times qualified against s1, s3 likewise against s2 — each layer
    * reads the previous layer's column on the SAME row, so the three
    * Window operators share one exchange and one sort. Output is the
    * depth histogram (5 rows at most), so everything after the
    * per-user max is driver-trivial.
    */
  def funnel(s: SparkSession, dir: String, windowHours: Int = 24): DataFrame =
    funnelOnEvents(t(s, dir, "events"), Seq("view", "click", "purchase"), windowHours)

  /** Core over any (user_id, ts, event_type, event_id) frame. */
  def funnelOnEvents(ev: DataFrame, steps: Seq[String], windowHours: Int): DataFrame = {
    require(steps.size == 3, "fixed 3-step funnel (the oracle unrolls the layers)")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val horizon = expr(s"INTERVAL $windowHours HOURS")
    val staged = ev
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
      .withColumn("s1", min(when(col("event_type") === steps(0), col("ts"))).over(w))
      .withColumn("s2", min(when(col("event_type") === steps(1) &&
        col("ts") > col("s1") && col("ts") <= col("s1") + horizon, col("ts"))).over(w))
      .withColumn("s3", min(when(col("event_type") === steps(2) &&
        col("ts") > col("s2") && col("ts") <= col("s1") + horizon, col("ts"))).over(w))
      .withColumn("stage",
        when(col("s3").isNotNull, 3).when(col("s2").isNotNull, 2)
          .when(col("s1").isNotNull, 1).otherwise(0))
    staged
      .groupBy(col("user_id")).agg(max(col("stage")).as("depth"))
      .groupBy(col("depth")).agg(count(lit(1)).as("users"))
  }

  /** Cohort retention: users bucketed by the ISO week of their first
    * event (the cohort), activity counted per (cohort, whole weeks
    * since first touch). The week offset divides raw epoch seconds —
    * a calendar-free contract both engines compute bit-identically —
    * while the cohort label itself is calendar week (date_trunc), the
    * axis a retention chart wants.
    */
  def cohortRetention(s: SparkSession, dir: String): DataFrame =
    cohortOnEvents(t(s, dir, "events"))

  def cohortOnEvents(ev: DataFrame): DataFrame = {
    val first = ev.groupBy(col("user_id")).agg(min(col("ts")).as("first_ts"))
    ev.join(first, Seq("user_id"))
      .select(
        date_trunc("week", col("first_ts")).as("cohort_week"),
        floor((col("ts").cast("double") - col("first_ts").cast("double")) / 604800d)
          .cast("int").as("wk"),
        col("user_id"))
      .groupBy(col("cohort_week"), col("wk"))
      .agg(countDistinct(col("user_id")).as("active_users"))
  }

  /** Robust outliers via the modified z-score (Iglewicz & Hoaglin
    * 1993): per event_type, |x − median| / (1.4826 · MAD) > 3.5 flags
    * the tails a mean/stddev gate misses when the tails themselves
    * corrupt the mean. Exact interpolated percentiles (the
    * [[AggQueries]] percentile battery pinned Spark `percentile` ≡
    * DuckDB `quantile_cont`); both stat tables are |event_type|-row
    * broadcasts, so the plan is two stat aggregates plus one
    * broadcast-joined filter scan — the corpus never shuffles.
    */
  def madOutliers(s: SparkSession, dir: String, cut: Double = 3.5): DataFrame =
    madOnEvents(t(s, dir, "events"), cut)

  def madOnEvents(ev: DataFrame, cut: Double): DataFrame = {
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val mad = ev.join(broadcast(med), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(first(col("med")).as("med"),
        expr("percentile(abs(value - med), 0.5)").as("mad"))
    ev.join(broadcast(mad), Seq("event_type"))
      .withColumn("z", abs(col("value") - col("med")) / (lit(1.4826) * col("mad")))
      .filter(col("z") > cut)
      .select(col("event_id"), col("event_type"), col("value"), col("z"))
  }

  /** Sessionization as gaps-and-islands: a session breaks after
    * `gapMinutes` of inactivity (the batch twin of the streaming
    * session window — [[graft.streaming.StreamingOps]] holds the
    * incremental variant; this is the definition a warehouse runs
    * over history). Per-session output: ordinal, span, event count.
    *
    * Both window layers (the lag that flags a break, the running sum
    * that numbers sessions) share ONE (user)-partitioned (ts,
    * event_id) sort — Spark chains same-spec Window operators behind
    * a single exchange — and the session roll-up re-uses the same
    * user-keyed partitioning, so the event stream crosses the wire
    * once.
    */
  def sessionize(s: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame =
    sessionizeOnEvents(t(s, dir, "events"), gapMinutes)

  def sessionizeOnEvents(ev: DataFrame, gapMinutes: Int): DataFrame = {
    val order = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val runsum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("brk",
        when(col("ts").cast("double") - lag(col("ts"), 1).over(order).cast("double")
          > gapMinutes * 60d, 1L).otherwise(lit(0L)))
      .withColumn("session_seq", sum(col("brk")).over(runsum))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        // integer microsecond floor-div: engines disagree on
        // double->long rounding, never on BIGINT division
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          .divide(lit(1000000L)).cast("long").as("duration_sec"))
  }

  /** Hourly session concurrency (interval occupancy): how many
    * sessions were live in each hour — the capacity-planning series
    * behind "peak concurrent users". Sessions come from the same
    * gaps-and-islands pass as [[sessionize]]; each session then
    * EXPLODES to the hours it touches (bounded by session length —
    * the classic sweep-line needs a global time order, which is a
    * one-partition hazard at scale; the hour-grain explode is the
    * distributed form) and one (hour) count folds occupancy. The
    * explode factor is |session hours|, bounded by the gap rule
    * (a session outlives its last event by at most the gap), so
    * shuffle volume stays proportional to session time, not events².
    */
  def sessionConcurrency(s: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame =
    concurrencyOnEvents(t(s, dir, "events"), gapMinutes)

  def concurrencyOnEvents(ev: DataFrame, gapMinutes: Int): DataFrame = {
    val order = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val runsum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("brk",
        when(col("ts").cast("double") - lag(col("ts"), 1).over(order).cast("double")
          > gapMinutes * 60d, 1L).otherwise(lit(0L)))
      .withColumn("session_seq", sum(col("brk")).over(runsum))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
      .groupBy(col("hour")).agg(count(lit(1)).as("live_sessions"))
  }

  /** First-order next-event transition counts + probabilities (the
    * Markov chain a product-analytics "user flow" view draws): lead
    * over each user's (ts, event_id) order pairs every event with its
    * successor, transitions broken at session gaps (same 30-minute
    * rule as [[sessionize]]) so overnight returns don't mint edges.
    * The probability normalizer is a window over the transition
    * matrix itself — |event_types|² rows, nothing corpus-sized.
    */
  def transitionMatrix(s: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame =
    transitionsOnEvents(t(s, dir, "events"), gapMinutes)

  def transitionsOnEvents(ev: DataFrame, gapMinutes: Int): DataFrame = {
    val order = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = ev.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(order))
      .withColumn("gap_ok",
        lead(col("ts"), 1).over(order).cast("double") - col("ts").cast("double")
          <= gapMinutes * 60d)
      .filter(col("next_type").isNotNull && col("gap_ok"))
    val norm = Window.partitionBy(col("event_type"))
    pairs.groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") / sum(col("n")).over(norm))
  }

  /** A/B experiment readout with a deterministic hash assignment
    * (md5 of the user id — the split is reproducible from the data
    * alone, the [[graft.text.TextQueries.hashSplit]] property) and a
    * Welch t statistic per event_type (unequal variances — arms are
    * never balanced in observational splits). One conditional-sum
    * aggregate pass over the events; every output is closed-form, so
    * the oracle re-derives the whole readout.
    */
  def experimentLift(s: SparkSession, dir: String): DataFrame =
    liftOnEvents(t(s, dir, "events"))

  def liftOnEvents(ev: DataFrame): DataFrame = {
    val armed = ev.withColumn("arm",
      when(substring(md5(col("user_id").cast("string").cast("binary")), 1, 1)
        .isin("0", "1", "2", "3", "4", "5", "6", "7"), "A").otherwise("B"))
    armed.groupBy(col("event_type"))
      .agg(
        count(when(col("arm") === "A", 1)).as("n_a"),
        count(when(col("arm") === "B", 1)).as("n_b"),
        avg(when(col("arm") === "A", col("value"))).as("mean_a"),
        avg(when(col("arm") === "B", col("value"))).as("mean_b"),
        var_samp(when(col("arm") === "A", col("value"))).as("var_a"),
        var_samp(when(col("arm") === "B", col("value"))).as("var_b"))
      .withColumn("lift", col("mean_b") - col("mean_a"))
      .withColumn("t_welch",
        col("lift") / sqrt(col("var_a") / col("n_a") + col("var_b") / col("n_b")))
      .select(col("event_type"), col("n_a"), col("n_b"),
        col("mean_a"), col("mean_b"), col("lift"), col("t_welch"))
  }

  /** Hourly event counts gap-filled against a generated calendar
    * spine, plus a trailing 24-slot moving average — the time-series
    * densification every monitoring/forecasting pipeline needs
    * (an absent hour must be an explicit zero or the moving window
    * silently shrinks). The corpus is scanned ONCE into the hourly
    * aggregate; the spine derives from that aggregate's min/max (a
    * 1-row broadcast), so the generated (type × hour) grid is
    * time-range-bounded and never touches the fact table again. The
    * moving average windows over the filled series — |types|·|hours|
    * rows, partitioned by type.
    */
  def gapFill(s: SparkSession, dir: String): DataFrame =
    gapFillOnEvents(t(s, dir, "events"))

  def gapFillOnEvents(ev: DataFrame): DataFrame = {
    val hourly = ev
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .groupBy(col("event_type"), col("hour")).agg(count(lit(1)).as("n"))
      .persist()
    val span = hourly.agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
    val spine = span
      .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("hour"))
      .crossJoin(hourly.select(col("event_type")).distinct())
    val filled = spine.join(hourly, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour"),
        coalesce(col("n"), lit(0L)).as("n_events"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-23, Window.currentRow)
    filled.withColumn("ma_24h", avg(col("n_events")).over(w))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_timeseries_fill" -> ((s: SparkSession, d: String) => gapFill(s, d)),
    "q_funnel" -> ((s: SparkSession, d: String) => funnel(s, d)),
    "q_cohort_retention" -> ((s: SparkSession, d: String) => cohortRetention(s, d)),
    "q_outlier_mad" -> ((s: SparkSession, d: String) => madOutliers(s, d)),
    "q_sessionize" -> ((s: SparkSession, d: String) => sessionize(s, d)),
    "q_session_concurrency" -> ((s: SparkSession, d: String) => sessionConcurrency(s, d)),
    "q_transition_matrix" -> ((s: SparkSession, d: String) => transitionMatrix(s, d)),
    "q_experiment_lift" -> ((s: SparkSession, d: String) => experimentLift(s, d)))

  val oracle: Map[String, String] = Map(
    // Layered running-mins over one (user, ts, event_id)-ordered
    // window — the same three-layer chain the DataFrame builds; ROWS
    // frames spelled out because DuckDB's bare ORDER BY default is
    // RANGE (ties would collapse).
    "q_funnel" ->
      """WITH l1 AS (
        |  SELECT user_id, ts, event_type, event_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s1
        |  FROM events),
        |l2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > s1
        |                     AND ts <= s1 + INTERVAL '24 hours' THEN ts END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s2
        |  FROM l1),
        |l3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > s2
        |                     AND ts <= s1 + INTERVAL '24 hours' THEN ts END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s3
        |  FROM l2),
        |per_user AS (
        |  SELECT user_id,
        |    max(CASE WHEN s3 IS NOT NULL THEN 3 WHEN s2 IS NOT NULL THEN 2
        |             WHEN s1 IS NOT NULL THEN 1 ELSE 0 END) AS depth
        |  FROM l3 GROUP BY user_id)
        |SELECT depth, count(*) AS users FROM per_user GROUP BY depth""".stripMargin,
    "q_cohort_retention" ->
      """WITH first_touch AS (
        |  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id)
        |SELECT date_trunc('week', first_ts) AS cohort_week,
        |  floor((epoch(ts) - epoch(first_ts)) / 604800)::INT AS wk,
        |  count(DISTINCT user_id) AS active_users
        |FROM events JOIN first_touch USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "q_outlier_mad" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY event_type),
        |mad AS (
        |  SELECT event_type, any_value(med) AS med,
        |    quantile_cont(abs(value - med), 0.5) AS mad
        |  FROM events JOIN med USING (event_type) GROUP BY event_type)
        |SELECT event_id, event_type, value,
        |  abs(value - med) / (1.4826 * mad) AS z
        |FROM events JOIN mad USING (event_type)
        |WHERE abs(value - med) / (1.4826 * mad) > 3.5""".stripMargin,
    "q_timeseries_fill" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT min(hour) AS lo, max(hour) AS hi FROM hourly),
        |spine AS (
        |  SELECT t.event_type, g.hour
        |  FROM (SELECT DISTINCT event_type FROM hourly) t
        |  CROSS JOIN (
        |    SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
        |    FROM span) g),
        |filled AS (
        |  SELECT s.event_type, s.hour, coalesce(h.n, 0) AS n_events
        |  FROM spine s LEFT JOIN hourly h USING (event_type, hour))
        |SELECT event_type, hour, n_events,
        |  avg(n_events) OVER (PARTITION BY event_type ORDER BY hour
        |    ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS ma_24h
        |FROM filled""".stripMargin,
    // ROWS frame spelled out on the running sum (DuckDB's bare ORDER
    // BY default is RANGE; timestamp ties would merge break flags).
    "q_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |numbered AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS duration_sec
        |FROM numbered GROUP BY user_id, session_seq""".stripMargin,
    "q_session_concurrency" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |numbered AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM flagged),
        |sessions AS (
        |  SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
        |  FROM numbered GROUP BY user_id, session_seq),
        |hours AS (
        |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        |  FROM sessions)
        |SELECT hour, count(*) AS live_sessions FROM hours GROUP BY hour""".stripMargin,
    "q_transition_matrix" ->
      """WITH pairs AS (
        |  SELECT event_type,
        |    lead(event_type) OVER w AS next_type,
        |    epoch(lead(ts) OVER w) - epoch(ts) AS gap
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |cnt AS (
        |  SELECT event_type, next_type, count(*) AS n FROM pairs
        |  WHERE next_type IS NOT NULL AND gap <= 1800
        |  GROUP BY 1, 2)
        |SELECT event_type, next_type, n,
        |  n::DOUBLE / sum(n) OVER (PARTITION BY event_type) AS p
        |FROM cnt""".stripMargin,
    "q_experiment_lift" ->
      """WITH armed AS (
        |  SELECT event_type, value,
        |    CASE WHEN substr(md5(user_id::VARCHAR), 1, 1) IN
        |      ('0','1','2','3','4','5','6','7') THEN 'A' ELSE 'B' END AS arm
        |  FROM events),
        |stats AS (
        |  SELECT event_type,
        |    count(*) FILTER (arm = 'A') AS n_a,
        |    count(*) FILTER (arm = 'B') AS n_b,
        |    avg(value) FILTER (arm = 'A') AS mean_a,
        |    avg(value) FILTER (arm = 'B') AS mean_b,
        |    var_samp(value) FILTER (arm = 'A') AS var_a,
        |    var_samp(value) FILTER (arm = 'B') AS var_b
        |  FROM armed GROUP BY event_type)
        |SELECT event_type, n_a, n_b, mean_a, mean_b,
        |  mean_b - mean_a AS lift,
        |  (mean_b - mean_a) / sqrt(var_a / n_a + var_b / n_b) AS t_welch
        |FROM stats""".stripMargin)
}
