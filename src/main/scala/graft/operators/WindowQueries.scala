package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** OVER (analytic) windows, rank/TopN and deduplication
  * (SURVEY.md §2.6; BatchExecOverAggregate.java:79,
  * BatchExecRank.java:46, StreamExecDeduplicate.java:85).
  *
  * All window specs order by a unique key suffix so ROW_NUMBER /
  * NTILE / frame contents are deterministic across engines. At scale
  * each `Window.partitionBy` is one shuffle on the partition key;
  * TopN pushes the rank filter below the final projection so the
  * post-filter output is k·|groups| rows.
  */
object WindowQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def overRank(s: SparkSession, dir: String): DataFrame = {
    val wRank = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
    val wUniq = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
    t(s, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_quantity"),
        rank().over(wRank).as("rnk"),
        dense_rank().over(wRank).as("drnk"),
        percent_rank().over(wRank).as("prnk"),
        cume_dist().over(wRank).as("cd"),
        row_number().over(wUniq).as("rn"),
        ntile(4).over(wUniq).as("nt"))
  }

  /** Full frame-spec coverage: ROWS sliding, running (unbounded
    * preceding), whole-partition, and RANGE frames over a numeric and
    * a temporal ORDER BY (BatchExecOverAggregate's over/frame/ set).
    */
  def overFrames(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS sum3,
        |  sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_sum,
        |  avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
        |    RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_range,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL '90' DAY PRECEDING AND CURRENT ROW) AS n_90d
        |FROM orders""".stripMargin)
  }

  def overLeadLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        first(col("o_orderkey")).over(w).as("first_ok"),
        last(col("o_orderkey")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).as("last_ok"))
  }

  /** TopN per group — the batch shape of the reference's 4 streaming
    * TopN strategies (AppendOnlyTopNFunction.java:52 etc.): rank below
    * a filter, so Spark's WindowGroupLimit pushes the limit into the
    * shuffle at scale.
    */
  def topN(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
  }

  /** Deduplicate keep-first by (key, time) —
    * RowTimeDeduplicateFunction.java:31 batch semantics.
    */
  def dedupFirst(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        row_number().over(w).as("rn"))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Window TopN — rank INSIDE a window TVF
    * (StreamExecWindowRank.java:77): top-3 events by value per
    * (1h tumble window, event_type). The rank's partition key includes
    * window_start, so the WindowGroupLimit pushdown still applies and
    * per-window state is bounded.
    */
  def windowTopN(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("wstart"), col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    t(s, dir, "events")
      .withColumn("wstart", window(col("ts"), "1 hour").getField("start"))
      .select(col("wstart"), col("event_type"), col("event_id"), col("value"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
  }

  /** Window deduplicate — keep-first per (window, key)
    * (StreamExecWindowDeduplicate.java:69): the earliest event per
    * (1h tumble window, user).
    */
  def windowDedup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("wstart"), col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("wstart", window(col("ts"), "1 hour").getField("start"))
      .select(col("wstart"), col("user_id"), col("event_id"), col("ts"),
        row_number().over(w).as("rn"))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Forward-looking OVER frames: CURRENT ROW .. n FOLLOWING and
    * UNBOUNDED FOLLOWING (the frame directions q_over_frames'
    * PRECEDING battery doesn't cover).
    */
  def overFollowing(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders").select(
      col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
      sum(col("o_totalprice")).over(w.rowsBetween(Window.currentRow, 2)).as("sum_fwd3"),
      sum(col("o_totalprice")).over(
        w.rowsBetween(Window.currentRow, Window.unboundedFollowing)).as("sum_rest"),
      count(lit(1)).over(
        w.rowsBetween(1, Window.unboundedFollowing)).as("n_after"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_over_rank"     -> (overRank _),
    "q_over_follow"   -> (overFollowing _),
    "q_over_frames"   -> (overFrames _),
    "q_over_leadlag"  -> (overLeadLag _),
    "q_topn"          -> (topN _),
    "q_dedup_first"   -> (dedupFirst _),
    "q_window_topn"   -> (windowTopN _),
    "q_window_dedup"  -> (windowDedup _))

  val oracle: Map[String, String] = Map(
    "q_over_rank" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
        |  rank() OVER w1 AS rnk,
        |  dense_rank() OVER w1 AS drnk,
        |  percent_rank() OVER w1 AS prnk,
        |  cume_dist() OVER w1 AS cd,
        |  row_number() OVER w2 AS rn,
        |  ntile(4) OVER w2 AS nt
        |FROM lineitem
        |WINDOW w1 AS (PARTITION BY l_returnflag ORDER BY l_quantity),
        |       w2 AS (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber)""".stripMargin,
    "q_over_frames" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS sum3,
        |  sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_sum,
        |  avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
        |    RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_range,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL '90 days' PRECEDING AND CURRENT ROW) AS n_90d
        |FROM orders""".stripMargin,
    "q_over_leadlag" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  first_value(o_orderkey) OVER w AS first_ok,
        |  last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "q_dedup_first" ->
      """SELECT user_id, event_id, ts, event_type FROM (
        |  SELECT user_id, event_id, ts, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,
    "q_over_follow" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS sum_fwd3,
        |  sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS sum_rest,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS n_after
        |FROM orders""".stripMargin,
    "q_window_topn" ->
      """SELECT wstart, event_type, event_id, value, rn FROM (
        |  SELECT date_trunc('hour', ts) AS wstart, event_type, event_id, value,
        |    row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
        |      ORDER BY value DESC, event_id) AS rn
        |  FROM events) WHERE rn <= 3""".stripMargin,
    "q_window_dedup" ->
      """SELECT wstart, user_id, event_id, ts FROM (
        |  SELECT date_trunc('hour', ts) AS wstart, user_id, event_id, ts,
        |    row_number() OVER (PARTITION BY date_trunc('hour', ts), user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin)
}
